"""One-pass table profiling (data-quality stats for every column).

The reference eyeballs data quality via ad-hoc pandas `.info()` /
`.isna()` passes during development (reference src/etl/transforming.py
dropna blocks encode the conclusions); there is no first-class profiler.
A 100 TB pipeline needs the stats computed by the engine, in ONE scan:
per-column non-null counts and exact distinct cardinalities, emitted as a
long-format (column_name, stat...) table that downstream quality gates
can join against.

Plan shape: a single global aggregate computes `count(*)` plus
`count(col)` / `count(distinct col)` for every column; Catalyst plans the
multi-distinct agg as one Expand (|cols|+1 row multiplier) over one scan
— no per-column rescans. The wide 1-row result is then unpivoted with
`stack` (narrow, no shuffle). At extreme column counts or cardinalities,
swap `countDistinct` for `approx_count_distinct` (HLL++, fixed-size
sketch, no Expand blowup) — same code path, looser stat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile of `cols`: (column_name, n_rows, n_non_null,
    n_distinct), computed in one scan."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __nn_{c}, __nd_{c}" for c in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_non_null, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_non_null", "n_distinct")
