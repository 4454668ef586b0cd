"""Driver contract for the spark-graft builder (PySpark target).

All queries live in ``real_value_etl_spark.queries.*`` and self-register
into ``REGISTRY`` (name -> QuerySpec(fn, oracle_sql)). This module just
exposes the registry in the driver's shape, so Spark code and oracle SQL
can never drift apart by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the query modules populates the registry.
from real_value_etl_spark.queries import all_queries  # noqa: F401
from real_value_etl_spark.queries.registry import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: shipping-priority top-k (3-way join +
    exact-decimal aggregation + ordered limit)."""
    return REGISTRY["q3_shipping_priority"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
