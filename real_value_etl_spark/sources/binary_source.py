"""Binary-file source: opaque multimodal payloads read straight from a
directory tree (images / audio / video blobs) via Spark's built-in
``binaryFile`` format.

SURVEY.md §2.12 maps multimodal columns to ``BinaryType`` +
``spark.read.format('binaryFile')``; this module is that ingestion edge.
Each file becomes one row (path, modificationTime, length, content) — the
content column is the same opaque payload shape operators/multimodal.py
consumes, so decode/resize/feature kernels run unchanged on rows that came
from real files instead of synthesized columns.

Scale notes: the source lists and reads files in parallel across executors
(no driver-side listing loop); pathGlobFilter prunes by extension BEFORE
any bytes are read, and metadata-only queries (count, size stats) read just
the file status, not the content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of opaque files: one row per file with
    (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def as_multimodal(df: DataFrame, id_from_name: bool = True) -> DataFrame:
    """Adapt a binaryFile frame to the multimodal operator contract:
    (doc_id, payload, meta). The doc id derives from the file name's
    numeric stem (upload pipelines name blobs by content/sequence id);
    non-numeric names get a null id and are filtered by the caller's
    quarantine policy."""
    stem = F.regexp_extract(F.element_at(F.split(F.col("path"), "/"), -1),
                            r"(\d+)", 1)
    doc_id = F.when(stem != "", stem.cast("long")).otherwise(F.lit(None))
    return df.select(
        (doc_id if id_from_name else F.monotonically_increasing_id()).alias(
            "doc_id"
        ),
        F.col("content").alias("payload"),
        F.struct(
            F.col("length").cast("int").alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
