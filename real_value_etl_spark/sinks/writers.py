"""Sinks for the unified table.

Reference: ClickHouseLoader (src/etl/loading.py:14-53) — TRUNCATE then
~50k-row chunked inserts (non-atomic, SURVEY §1.4.9) — and CSVLoader
(loading.py:56-75) for test mode.

Spark-first:
- parquet/csv writers for local + test use;
- a JDBC writer shape for ClickHouse with the atomicity fix: load into a
  staging table then swap, instead of truncate-then-insert. Gated behind an
  import/availability check since no JDBC driver ships in this container.
- chunk size control == partition count (`repartition`), not driver-side
  np.array_split: each executor partition inserts independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Test-mode CSV sink (reference loading.py:56-75). Arrays/JSON columns
    are serialized to JSON strings first (CSV has no nested types)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    df.select(*cols).write.mode(mode).option("header", True).csv(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout (e.g. platform=/date=): queries that
    filter on the partition columns read ONLY matching directories
    (Catalyst PartitionFilters — verified by tests/test_plans.py). This is
    the 100 TB layout for the reference's (platform, snapshot-date)
    catalog (SURVEY §1.1.2)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: joins/aggregations on `bucket_col`
    between co-bucketed tables skip the shuffle entirely (Exchange elided —
    the bucketing IS the pre-shuffle). Use for repeatedly-joined fact
    tables (lineitem.orderkey x orders.orderkey)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def staging_swap_statements(table: str) -> tuple[str, str]:
    """Staging-table name + atomic swap DDL for a two-phase overwrite.

    The load writes ONLY to `<table>__staging`; the target table keeps
    serving the previous snapshot until the single EXCHANGE statement
    commits — at no observable point is the target empty or partial. This
    is the atomicity fix for the reference's TRUNCATE-then-chunked-insert
    (reference src/etl/loading.py:36, SURVEY §1.4.9), where readers see
    0..partial rows for the whole insert window. The same two-phase shape
    is integration-tested against DuckDB (tests/test_operators.py::
    test_staging_swap_has_no_empty_table_window) since no ClickHouse
    server or JDBC jar ships in this container."""
    staging = f"{table}__staging"
    return staging, f"EXCHANGE TABLES {staging} AND {table}"


def write_clickhouse_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    user: str,
    password: str,
    batch_rows: int = 50_000,
    staging_swap: bool = True,
) -> None:
    """ClickHouse sink via JDBC (requires clickhouse-jdbc on the classpath;
    raises RuntimeError otherwise — this container ships no JDBC driver).

    `batch_rows` mirrors the reference's 50k insert chunks
    (loading.py:38-46); `staging_swap=True` writes to `<table>__staging`
    and issues an EXCHANGE TABLES, fixing the reference's non-atomic
    truncate-then-insert (loading.py:36; SURVEY §1.4.9). The swap statement
    must be run by the caller's ClickHouse client; this function writes the
    staging table and returns the DDL to execute.
    """
    staging, swap_ddl = staging_swap_statements(table)
    target = staging if staging_swap else table
    try:
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", target)
            .option("user", user)
            .option("password", password)
            .option("batchsize", batch_rows)
            .option("truncate", not staging_swap)
            .mode("overwrite")
            .save()
        )
    except Exception as exc:  # pragma: no cover - no driver in container
        raise RuntimeError(
            "ClickHouse JDBC driver unavailable; add clickhouse-jdbc to "
            "spark.jars to enable this sink"
        ) from exc
    if staging_swap:  # pragma: no cover
        return swap_ddl


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (built-in columnar alternative to parquet; same pushdown/
    pruning story through the native OrcFileFormat)."""
    df.write.mode(mode).orc(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Overwrite ONLY the partitions present in `df`, leaving sibling
    partitions untouched (spark.sql.sources.partitionOverwriteMode=dynamic)
    — the incremental daily-snapshot refresh pattern: rewriting one
    platform=/date= partition of a 100 TB lake must not truncate the rest,
    which is exactly what static overwrite (and the reference's TRUNCATE,
    loading.py:36) would do."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet_dir(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and swap it into place.

    The small-file problem is THE operational failure mode of long-running
    ingestion at scale (every micro-batch / hourly load appends a few tiny
    files until the NameNode/footer-read overhead dominates scan time).
    Compaction uses `coalesce`, a NARROW repartitioning — existing files are
    read and concatenated without a shuffle — so the rewrite streams at I/O
    speed. The rewrite lands in a staging directory first and is renamed
    into place (rename is atomic on HDFS/local posix; on S3 a production
    deployment swaps a table-format pointer instead).

    Returns {"files_before", "files_after", "bytes", "rows"}.
    """
    import glob as _glob
    import math
    import os
    import shutil

    files = _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    rows = df.count()
    tmp = path.rstrip("/") + "__compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__precompact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total,
        "rows": rows,
    }


def write_range_clustered_parquet(
    df: DataFrame, path: str, cluster_cols: list[str], num_files: int
) -> None:
    """Range-clustered parquet write: repartitionByRange on the cluster
    columns + sortWithinPartitions, so each output file covers a DISJOINT
    value range and carries tight parquet min/max column statistics.

    This is what makes data skipping real at 100 TB: a reader filtering on
    the cluster column prunes whole files/row-groups from its statistics
    without touching the data (the same footer stats DuckDB/Trino/Spark all
    honor). Unclustered writes scatter every value range across every file,
    making min/max stats useless. The range exchange samples the column to
    build balanced bounds — skew in the cluster key does not skew files."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(bucket_cols: list, bits: int = 16):
    """Morton (Z-order) interleave of pre-bucketed int columns (each in
    [0, 2^bits)): bit j of column i lands at position j*ncols + i. A pure
    codegen expression — bits*ncols shift-or terms, no UDF."""
    from pyspark.sql import functions as F

    ncols = len(bucket_cols)
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * ncols + i)
    return key


def write_zorder_clustered_parquet(
    df: DataFrame, path: str, cluster_cols: list[str], num_files: int,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet write: rows are sorted along a Morton
    curve over ALL cluster columns, so every file's min/max stats are
    narrow in EVERY clustered dimension — a filter on any one of them
    prunes files. Single-column range clustering narrows only its own
    column (a filter on the second column scans everything); Z-order
    trades a little per-column tightness for pruning power on each
    dimension (the lakehouse OPTIMIZE ZORDER BY capability).

    Columns are min/max-scaled to 2^bits buckets (one tiny agg computes
    the bounds, broadcast back); the keyed write is a range repartition +
    within-partition sort, same as write_range_clustered_parquet."""
    from pyspark.sql import functions as F

    aggs = []
    for c in cluster_cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))
    buckets = []
    for c in cluster_cols:
        mn = F.col(f"__mn_{c}").cast("double")
        span = F.col(f"__mx_{c}").cast("double") - mn + F.lit(1.0)
        b = F.floor(
            (F.col(c).cast("double") - mn) / span * F.lit(float(1 << bits))
        ).cast("long")
        buckets.append(F.least(F.greatest(b, F.lit(0)), F.lit((1 << bits) - 1)))
    keyed = scaled.withColumn("__zkey", zorder_key(buckets, bits)).drop(
        *[f"__mn_{c}" for c in cluster_cols],
        *[f"__mx_{c}" for c in cluster_cols],
    )
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
