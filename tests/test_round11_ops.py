"""Targeted invariants for the round-11 additions, beyond the oracle-parity
hash gate: each test recomputes the operator's defining property from the
raw parquet independently (pure Python / DuckDB), so a both-engines-wrong
implementation cannot hide behind an agreeing oracle."""

from __future__ import annotations

import duckdb
import pytest

from real_value_etl_spark.queries.all_queries import REGISTRY


def test_benford_cells_exact(spark, sf_dir):
    """9 spine-complete cells, counts conserve the total, the scaled
    deviation matches an independent integer recomputation, and the
    chi2 contribution equals dev^2/(S*n*p) within one double rounding."""
    from real_value_etl_spark.queries.stats import BENFORD_P9, BENFORD_S

    rows = {r["digit"]: r for r in REGISTRY["q_benford_audit"].fn(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, 10))
    n = next(iter(rows.values()))["n_orders"]
    assert sum(r["n_obs"] for r in rows.values()) == n
    obs = duckdb.connect().execute(
        f"""SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS d, COUNT(*)
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    want = {d: c for d, c in obs}
    for d in range(1, 10):
        r = rows[d]
        assert r["n_obs"] == want.get(d, 0)
        dev = BENFORD_S * r["n_obs"] - n * BENFORD_P9[d - 1]
        assert r["dev_scaled"] == dev
        exact = (dev * dev) / (BENFORD_S * n * BENFORD_P9[d - 1])
        assert r["chi2_contrib"] == pytest.approx(exact, rel=1e-12)
        assert r["benford_p"] == BENFORD_P9[d - 1] / BENFORD_S


def test_allan_variance_matches_pure_python(spark, sf_dir):
    """The reported statistic equals a pure-Python replay over the
    zero-filled hourly series for every event type."""
    rows = REGISTRY["events_allan_variance"].fn(spark, sf_dir).collect()
    assert rows
    hc = duckdb.connect().execute(
        f"""SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT),
                   COUNT(*)
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for t, h, c in hc:
        series.setdefault(t, {})[h] = c
    for r in rows:
        s = series[r["event_type"]]
        lo, hi = min(s), max(s)
        cs = [s.get(h, 0) for h in range(lo, hi + 1, 3600)]
        assert r["n_hours"] == len(cs)
        ssd = sum((b - a) ** 2 for a, b in zip(cs, cs[1:]))
        assert r["sum_sq_diff"] == ssd
        assert r["allan_var"] == ssd / (2 * (len(cs) - 1))


def test_quartile_motifs_window_accounting(spark, sf_dir):
    """Motif windows conserve: per type, sum(n_windows) == n_hours - 2;
    the alphabet stays within a..d; and every quartile class is hit by
    construction (symbols are not all identical on real traffic)."""
    mot = REGISTRY["events_quartile_motifs"].fn(spark, sf_dir).collect()
    assert mot
    av = {
        r["event_type"]: r["n_hours"]
        for r in REGISTRY["events_allan_variance"].fn(spark, sf_dir).collect()
    }
    per: dict[str, int] = {}
    letters = set()
    for r in mot:
        assert len(r["motif"]) == 3
        letters.update(r["motif"])
        per[r["event_type"]] = per.get(r["event_type"], 0) + r["n_windows"]
    assert letters <= set("abcd")
    for t, total in per.items():
        assert total == av[t] - 2
