"""Merge-by-key upsert (SCD type 1) — the incremental-refresh primitive the
reference's full-refresh loader lacks (its TRUNCATE+insert reloads the whole
table per run, src/etl/loading.py:31-46; at 100 TB only applying the delta
is viable).

Semantics: ``upsert_by_key(current, updates, keys, order_by)`` returns one
row per key — the row with the greatest ``order_by`` across both inputs
(ties break toward ``updates``). New keys insert, existing keys take the
newest version.

Scale design: unionByName (narrow) + ONE row_number window shuffle on the
key — same cost as a single groupBy. No join, no broadcast requirement;
with both sides bucketed by key the shuffle disappears entirely. This is
the same plan Delta/Iceberg MERGE compiles to for SCD-1 when the whole
partition is rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_by_key(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: str | list[str],
) -> DataFrame:
    """Latest-version-wins merge of ``updates`` into ``current``.

    Both frames must share a schema (unionByName fills missing columns with
    null). For rows equal on every ``order_by`` column the updates side
    wins; include a unique column in ``order_by`` for full determinism.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols], F.desc("__src")
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
