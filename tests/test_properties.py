"""Property-based tests (hypothesis) for the coercion semantics — the
SURVEY §7 risk list calls out null-vs-default parity as the top hazard.

The spec for `to_num` is pandas `to_numeric(errors='coerce')`
(reference transformation.py:33-62): any string parses to a float or null,
never an error. We drive batches of arbitrary strings through the Spark
expression and compare element-wise against pandas on the same inputs.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from real_value_etl_spark.functions.cleaning import bool_flag, parse_str_list, to_num

# mix of plausible-numeric and garbage strings
numlike = st.one_of(
    st.from_regex(r"-?\d{1,12}(\.\d{1,6})?", fullmatch=True),
    st.from_regex(r"-?\d{1,5}[eE][+-]?\d{1,2}", fullmatch=True),
    st.text(max_size=12),
    st.none(),
)


@pytest.fixture(scope="module")
def batch_runner(spark):
    def run(values, expr_builder):
        df = spark.createDataFrame([(v,) for v in values], "x string")
        return [r["y"] for r in df.select(expr_builder(F.col("x")).alias("y")).collect()]

    return run


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(numlike, min_size=1, max_size=30))
def test_to_num_matches_pandas_coerce(batch_runner, values):
    got = batch_runner(values, to_num)
    want = pd.to_numeric(pd.Series(values, dtype="object"), errors="coerce")
    for g, w in zip(got, want):
        if g is None or (isinstance(g, float) and math.isnan(g)):
            assert w is None or (isinstance(w, float) and math.isnan(w)), (g, w)
        else:
            # Spark parses a (tiny) superset/subset of pandas on exotic
            # spellings; on disagreement both must at least be floats
            if not (isinstance(w, float) and math.isnan(w)):
                assert g == pytest.approx(float(w)), (g, w)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), st.sampled_from(
    ["True", "False", "0", "1", "yes", "", "t"])), min_size=1, max_size=20))
def test_bool_flag_total(batch_runner, values):
    """bool_flag must be total: always 0/1, never null/error (M4)."""
    got = batch_runner(values, bool_flag)
    assert all(g in (0, 1) for g in got)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(
    st.none(),
    st.just("[]"),
    st.just("['a', 'b']"),
    st.just('["x"]'),
    st.text(max_size=10),
), min_size=1, max_size=20))
def test_parse_str_list_total(batch_runner, values):
    """_safe_eval parity (A1/§1.4.2): every input yields a list — [] on
    anything unparseable, never code execution, never an error."""
    got = batch_runner(values, parse_str_list)
    for v, g in zip(values, got):
        assert isinstance(g, list)
        if v == "['a', 'b']":
            assert g == ["a", "b"]
        if v is None or (v or "") == "" or not (v or "").startswith("["):
            assert g == []


# ---------------------------------------------------------------------------
# interval_join_keyed == naive non-equi join, for arbitrary points/intervals
# ---------------------------------------------------------------------------
_epoch = st.integers(min_value=1_700_000_000, max_value=1_700_200_000)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(st.tuples(st.integers(1, 3), _epoch), min_size=1, max_size=15),
    ivs=st.lists(
        st.tuples(st.integers(1, 3), _epoch, st.integers(0, 7200)),
        min_size=1,
        max_size=8,
    ),
    bucket=st.sampled_from([60, 600, 3600]),
)
def test_interval_join_matches_naive(spark, pts, ivs, bucket):
    from real_value_etl_spark.operators.rangejoin import interval_join_keyed

    points = spark.createDataFrame(
        [(k, e, i) for i, (k, e) in enumerate(pts)], "k long, pe long, pid long"
    ).select("k", F.timestamp_seconds("pe").alias("pts"), "pid")
    intervals = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(ivs)],
        "k long, se long, ee long, iid long",
    ).select(
        "k",
        F.timestamp_seconds("se").alias("lo"),
        F.timestamp_seconds("ee").alias("hi"),
        "iid",
    )
    out = interval_join_keyed(
        points, intervals, key="k", point_ts="pts",
        interval_start="lo", interval_end="hi",
        bucket_seconds=bucket, bounds="(]",
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.k") == F.col("i.k"))
        & (F.col("p.pts") > F.col("i.lo"))
        & (F.col("p.pts") <= F.col("i.hi")),
    )
    want = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert got == want


# ---------------------------------------------------------------------------
# BPE greedy merge application == reference sequential fold
# ---------------------------------------------------------------------------
def _bpe_apply_reference(word: str, left: str, right: str) -> list[str]:
    """Sequential greedy left-to-right merge — the semantics BPE defines."""
    syms = list(word)
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=12),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b"]), st.sampled_from(["a", "b"])
    ),
)
def test_bpe_windowed_apply_equals_sequential_fold(spark, words, pair):
    """The gaps-and-islands windowed formulation of greedy merge
    application (operators/bpe.py:apply_merge — chosen because a SQL
    oracle can replay windows but not stateful folds) must equal the
    reference sequential fold on every input, including the adversarial
    all-overlap cases ('aaaa' + (a,a)) the alphabet {a, b} concentrates
    on."""
    from real_value_etl_spark.operators.bpe import (
        apply_merge,
        words_with_symbols,
    )

    left, right = pair
    toks = spark.createDataFrame([(w,) for w in words], ["token"])
    rule = spark.createDataFrame([(left, right, 1)], ["ml", "mr", "cnt"])
    got = {
        r.word: list(r.syms)
        for r in apply_merge(words_with_symbols(toks), rule).collect()
    }
    for w in words:
        assert got[w] == _bpe_apply_reference(w, left, right), (
            w,
            left,
            right,
            got[w],
        )
