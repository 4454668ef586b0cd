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


def test_flac_streaminfo_fields_from_bytes(spark, sf_dir):
    """Every recovered field matches an independent recomputation from
    the raw parquet (duckdb octet_length), and the packed-word fields
    obey the spec's bit budgets."""
    from real_value_etl_spark.queries.feature_ops import (
        FLAC_BPS,
        FLAC_RATES,
        FLAC_SAMPLES_PER_BYTE,
    )

    rows = REGISTRY["multimodal_flac_streaminfo"].fn(spark, sf_dir).collect()
    assert rows
    blen = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, octet_length(encode(text)) "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    for r in rows:
        i = r["doc_id"]
        assert r["magic_ok"] and r["is_last_block"] and r["md5_zero"]
        assert r["block_type"] == 0 and r["block_len"] == 34
        assert r["sample_rate"] == FLAC_RATES[i % 4] < (1 << 20)
        assert r["channels"] == i % 2 + 1 <= 8
        assert r["bits_per_sample"] == FLAC_BPS[i % 4] <= 32
        want_total = (blen[i] * FLAC_SAMPLES_PER_BYTE) % (1 << 36)
        assert r["total_samples"] == want_total
        assert r["min_blocksize"] == 4096
        assert r["max_blocksize"] == 4096 + (i % 8) * 256
        assert r["duration_s"] == want_total / r["sample_rate"]


def test_ogg_lacing_table_accounting(spark, sf_dir):
    """The lacing-table fold conserves: payload_len == byte length of
    the capped text, n_segments == floor(L/255)+1, exactly one packet
    terminates, and the length equation holds on every row."""
    rows = REGISTRY["multimodal_ogg_page_walk"].fn(spark, sf_dir).collect()
    assert rows
    blen = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, octet_length(encode(substr(text, 1, 4000))) "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    for r in rows:
        length = blen[r["doc_id"]]
        assert r["capture_ok"] and r["length_ok"]
        assert r["payload_len"] == length
        assert r["n_segments"] == length // 255 + 1
        assert r["n_full_segments"] == length // 255
        assert r["n_packets_done"] == 1
        assert r["packet_spans_segments"] == (length >= 255)


def test_zip_pointer_chase_round_trip(spark, sf_dir):
    """The backward walk recovers a consistent archive on every row:
    both signature copies verified, CD and local names identical, the
    stored bytes equal the source text, and the EOCD arithmetic closes
    (cd_offset + cd_size + 22 + comment_len == file size)."""
    rows = REGISTRY["multimodal_zip_eocd_walk"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["eocd_found"] and r["sig_chain_ok"]
        assert r["names_match"] and r["data_ok"] and r["sizes_ok"]
        assert r["fname"] == f"doc{r['doc_id']}.txt"
        assert r["n_entries"] == 1
        assert r["cd_size"] == 46 + len(r["fname"])
        assert r["comment_len"] == r["doc_id"] % 40
