"""JSONL (newline-delimited JSON) source + sink — the interchange format
LLM corpus pipelines actually exchange (one document object per line).

The reference has no JSON source (its only inputs are platform CSVs,
src/etl/extraction.py:17-112); this extends the source surface for the
north-star document pipeline. Spark-first: `spark.read.json` is splittable
line-per-record, so a 100 TB corpus of .jsonl(.gz per-file) shards
parallelizes across executors with no driver involvement.

Semantics:
- An explicit schema is required for production reads (schema inference is
  a full extra pass over the data — unacceptable at scale, and it lets a
  single malformed shard silently change column types).
- PERMISSIVE mode with a `_corrupt_record` column mirrors the engine's
  null-on-failure coercion policy: bad lines become one quarantined column,
  never a failed job; `badRecordsQuarantine` splits them out so the clean
  frame drops the column entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def jsonl_schema_with_corrupt(schema: T.StructType) -> T.StructType:
    """The user schema plus the PERMISSIVE-mode corrupt-record column."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    limit: int | None = None,
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema.

    Malformed lines land in `_corrupt_record` with every schema column
    null (PERMISSIVE), matching the engine's coerce-don't-crash policy.
    """
    df = (
        spark.read.schema(jsonl_schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if limit is not None:
        df = df.limit(limit)
    return df


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_full_rows).

    The quarantine frame keeps ALL columns: since Spark 2.3 a query over a
    raw JSON source may not reference only the corrupt-record column
    (SPARK-21610) — full rows keep every downstream action legal without
    forcing a cache, and the raw line is in `_corrupt_record`.
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    partitions: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a DataFrame as JSONL shards.

    `partitions` controls shard count/size (the JSONL analogue of the
    reference sink's 50k-row chunking, loading.py:38-46); compression
    ('gzip'/'zstd') applies per shard so each stays independently readable
    and splittable as a unit of work.
    """
    if partitions is not None:
        df = df.repartition(partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
