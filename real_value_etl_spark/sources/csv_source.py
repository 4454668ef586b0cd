"""Platform CSV sources.

Reference: one boto3 get_object + pd.read_csv per platform file
(src/etl/extraction.py:17-112 — four identical subclasses) pulling the whole
object through the driver. Spark-first replacement: one parametrized
`spark.read.csv` against local paths or s3a:// URIs — distributed reads,
header handling, and missing-partition tolerance via a catalog check
(sources/resolver.py) rather than a NoSuchKey catch.

All columns are read as STRING (the transformers own type coercion with
null-on-failure semantics, matching pandas errors='coerce'; SURVEY §1.3).
A file-order column is injected for deterministic keep-first dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.transformers import ROW_ORDER_COL


def read_platform_csv(
    spark: SparkSession,
    path: str,
    limit: int | None = None,
    multiline: bool = False,
) -> DataFrame | None:
    """Read one platform snapshot CSV (local path or s3a:// URI).

    Returns None when the path doesn't exist — the reference tolerates a
    missing platform file (extraction.py:50-53 NoSuchKey -> None) and the
    pipeline skips that platform (datapipeline.py:85-91).
    `limit` mirrors test-mode nrows=5000 (datapipeline.py:93-108).

    `multiline` (quoted embedded newlines) is OPT-IN: it forces one split
    per file — a 10 GB snapshot becomes a single task — so the default is
    the splittable line-oriented parser; enable it only for sources whose
    free-text columns actually embed newlines.

    Read-TIME missing-file tolerance (the reference's per-object NoSuchKey
    -> None, extraction.py:44-53) is covered end-to-end: a path missing at
    planning returns None here, and a file deleted BETWEEN listing and
    task execution is skipped by `ignoreMissingFiles` instead of failing
    the job — on an object store serving a live bucket, list-then-read
    races are routine, not exceptional.
    """
    try:
        reader = (
            spark.read.option("header", True)
            .option("escape", '"')
            .option("inferSchema", False)  # strings in, expressions coerce
            .option("ignoreMissingFiles", True)
        )
        if multiline:
            reader = reader.option("multiLine", True)
        df = reader.csv(path)
        df.schema  # force analysis so a missing path surfaces here
    except Exception as e:  # AnalysisException: PATH_NOT_FOUND
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    if limit is not None:
        df = df.limit(limit)
    # File order id for keep-first dedup determinism: increasing within each
    # file split, and splits are ordered — good enough to reproduce pandas'
    # keep='first' on single-snapshot reads.
    return df.withColumn(ROW_ORDER_COL, F.monotonically_increasing_id())
