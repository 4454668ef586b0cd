"""Round-9 gates and operator tests.

Lead item: the DecimalType-output lint (VERDICT r8 ask #1). The r8 driver
window recorded the first hash-red ever — `q_weighted_median` exposed a
DECIMAL(18,2) output whose integral values stringify "506627.00" on the
Spark side but reach the driver's canonicalizer as float "506627.0" from
DuckDB's pandas conversion. Values were bit-equal; the representation
differed. The repo convention (exact decimal aggregation internally, CAST
AS DOUBLE for output — queries/relational.py:16) now has a mechanical
gate: NO registered query may expose DecimalType anywhere in its output
schema, including nested inside arrays/structs/maps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from real_value_etl_spark.queries.all_queries import REGISTRY


def _decimal_paths(dt: T.DataType, path: str) -> list[str]:
    """All paths inside `dt` that are DecimalType (recursive)."""
    if isinstance(dt, T.DecimalType):
        return [path]
    if isinstance(dt, T.StructType):
        out: list[str] = []
        for f in dt.fields:
            out += _decimal_paths(f.dataType, f"{path}.{f.name}")
        return out
    if isinstance(dt, T.ArrayType):
        return _decimal_paths(dt.elementType, path + "[]")
    if isinstance(dt, T.MapType):
        return _decimal_paths(dt.keyType, path + "<key>") + _decimal_paths(
            dt.valueType, path + "<value>"
        )
    return []


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_decimal_output_columns(spark, sf_dir, name):
    """Driver-hash safety: DecimalType output stringifies with trailing
    zeros ("506627.00") while the oracle side arrives as float64
    ("506627.0") — equal values, different hash. Exact decimal math stays
    INSIDE the plan; outputs must be double/bigint/string."""
    schema = REGISTRY[name].fn(spark, sf_dir).schema
    offending = _decimal_paths(T.StructType(schema.fields), "")
    assert not offending, (
        f"{name}: DecimalType in output schema at {offending} — cast to "
        "DOUBLE (or BIGINT if provably integral) on BOTH engines; see "
        "queries/relational.py:16 and the r8 q_weighted_median driver-red"
    )
