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


def _mutual_und(spark, sf_dir):
    from real_value_etl_spark.queries.retrieval_graph import _knn_edges

    edges = {
        (r["src"], r["dst"])
        for r in _knn_edges(spark, sf_dir).select("src", "dst").collect()
    }
    return {(a, b) for a, b in edges if (b, a) in edges and a < b}


def test_modularity_python_replication(spark, sf_dir):
    """Per-community integer numerators match a pure-Python replay over
    the SAME mutual edge set, and total Q = sum(q_num)/(4m^2) lies in
    Newman's [-1/2, 1] range."""
    und = _mutual_und(spark, sf_dir)
    m = len(und)
    labels = dict(
        duckdb.connect().execute(
            f"SELECT vec_id, COALESCE(label, -1) "
            f"FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    deg: dict[int, int] = {}
    inn: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if labels[a] == labels[b]:
            inn[labels[a]] = inn.get(labels[a], 0) + 1
    by_lab: dict[int, list[int]] = {}
    for n, d in deg.items():
        by_lab.setdefault(labels[n], []).append(d)
    rows = REGISTRY["graph_modularity"].fn(spark, sf_dir).collect()
    got = {r["label"]: r for r in rows}
    assert set(got) == set(by_lab)
    for lab, ds in by_lab.items():
        r = got[lab]
        assert r["n_nodes"] == len(ds)
        assert r["deg_sum"] == sum(ds)
        assert r["in_edges"] == inn.get(lab, 0)
        q = 4 * m * inn.get(lab, 0) - sum(ds) ** 2
        assert r["q_num"] == q
        assert r["q_contrib"] == q / (4.0 * m * m)
    total_q = sum(r["q_num"] for r in rows) / (4.0 * m * m)
    assert -0.5 <= total_q <= 1.0


def test_resource_allocation_python_replication(spark, sf_dir):
    """RA indices match a pure-Python replay: same candidate pairs as
    the CN filter admits, ra_scaled the exact sum of floor-divided
    reciprocal degrees, and RA never exceeds cn/min_deg."""
    from real_value_etl_spark.queries.retrieval_graph import (
        RA_MIN_CN,
        RA_SCALE,
    )

    und = _mutual_und(spark, sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in und:
                continue
            common = nbrs[a] & nbrs[b]
            if len(common) >= RA_MIN_CN:
                want[(a, b)] = (
                    len(common),
                    sum(RA_SCALE // len(nbrs[w]) for w in common),
                )
    rows = REGISTRY["graph_resource_allocation"].fn(spark, sf_dir).collect()
    got = {(r["a"], r["b"]): (r["cn"], r["ra_scaled"]) for r in rows}
    assert got == want
    for r in rows:
        assert r["ra_index"] == r["ra_scaled"] / RA_SCALE
        assert r["ra_scaled"] <= r["cn"] * RA_SCALE // 2  # deg(w) >= 2 twice


def test_path_counts_python_replication(spark, sf_dir):
    """Distances and path counts match a pure-Python multi-source BFS
    with sigma accumulation over the SAME mutual edge set; seeds carry
    sigma 1 at distance 0."""
    from real_value_etl_spark.queries.retrieval_graph import (
        SPC_HOPS,
        SPC_SEED_MOD,
    )

    und = _mutual_und(spark, sf_dir)
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    vec_ids = [
        v
        for (v,) in duckdb.connect().execute(
            f"SELECT vec_id FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    ]
    frontier = {v: 1 for v in vec_ids if v % SPC_SEED_MOD == 0}
    want = {v: (0, 1) for v in frontier}
    for t in range(1, SPC_HOPS + 1):
        nxt: dict[int, int] = {}
        for u, sig in frontier.items():
            for w in adj.get(u, ()):
                if w not in want:
                    nxt[w] = nxt.get(w, 0) + sig
        nxt = {w: s for w, s in nxt.items() if w not in want}
        for w, s in nxt.items():
            want[w] = (t, s)
        frontier = nxt
    rows = REGISTRY["graph_path_counts"].fn(spark, sf_dir).collect()
    got = {r["node"]: (r["dist"], r["sigma"]) for r in rows}
    assert got == want


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_stream_extrema_batching_independent_and_idempotent(spark):
    """The extrema kernel lands the same (min, max, witnesses) whether
    rows arrive as one batch or three, and REPLAYING a batch is a
    no-op on everything except the batch counter (idempotent merge)."""
    import pandas as pd

    from real_value_etl_spark.streaming import jobs

    rows = [(float(v), i) for i, v in enumerate([5, 3, 9, 3, 9, 7])]

    def run(batches):
        st = _FakeState()
        for b in batches:
            pdf = pd.DataFrame(
                {"value": [v for v, _ in b], "event_id": [i for _, i in b]}
            )
            list(jobs._ext_state(("click",), iter([pdf]), st))
        return st._v

    single = run([rows])
    multi = run([rows[:2], rows[2:4], rows[4:]])
    assert single[:4] == multi[:4] == (3.0, 1, 9.0, 2)
    st = _FakeState()
    pdf = pd.DataFrame(
        {"value": [v for v, _ in rows], "event_id": [i for _, i in rows]}
    )
    list(jobs._ext_state(("click",), iter([pdf]), st))
    first = st._v
    list(jobs._ext_state(("click",), iter([pdf]), st))  # replay
    assert st._v[:4] == first[:4]  # extrema unmoved by duplicate delivery


def test_simpson_diversity_python_replication(spark, sf_dir):
    """Exact numerator and one-division quotients match a pure-Python
    recomputation over duckdb-tokenized term counts per source."""
    rows = REGISTRY["docs_simpson_diversity"].fn(spark, sf_dir).collect()
    assert rows
    tc = duckdb.connect().execute(
        f"""SELECT source, token, COUNT(*) FROM (
              SELECT source, unnest(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS token
              FROM '{sf_dir}/documents.parquet') GROUP BY 1, 2"""
    ).fetchall()
    per: dict[str, list[int]] = {}
    for src, _, c in tc:
        per.setdefault(src, []).append(c)
    for r in rows:
        cs = per[r["source"]]
        n = sum(cs)
        assert n >= 2
        assert r["n_tokens"] == n
        assert r["n_types"] == len(cs)
        num = sum(c * (c - 1) for c in cs)
        assert r["simpson_num"] == num
        assert r["simpson"] == num / (n * (n - 1))
        assert r["gini_simpson"] == 1.0 - num / (n * (n - 1))


def test_tar_recipe_readable_by_real_tarfile(spark, sf_dir):
    """Rebuild the query's archive bytes in pure Python for a sample of
    docs and hand them to Python's tarfile — which VERIFIES the ustar
    checksum itself: if tarfile returns the right name/size/content,
    the recipe (octal fields, NUL padding, checksum rule) is correct
    independently of Spark. Then assert the Spark parse agrees."""
    import io
    import tarfile

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY doc_id LIMIT 5"
    ).fetchall()

    def build(doc_id, text):
        data = text.encode()
        name = f"doc{doc_id}.txt".encode()
        hdr_pre = (
            name + b"\x00" * (100 - len(name))
            + b"0000644\x00" + b"0001750\x00" + b"0001750\x00"
            + (b"%011o\x00" % len(data))
            + b"00000000000\x00"
        )
        hdr_post = (
            b"0" + b"\x00" * 100 + b"ustar\x00" + b"00"
            + b"\x00" * (32 + 32 + 8 + 8 + 155 + 12)
        )
        chk = sum(hdr_pre + b" " * 8 + hdr_post)
        hdr = hdr_pre + (b"%06o\x00 " % chk) + hdr_post
        pad = (512 - len(data) % 512) % 512
        return hdr + data + b"\x00" * pad

    for doc_id, text in docs:
        blob = build(doc_id, text) + b"\x00" * 1024
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            (m,) = tf.getmembers()
            assert m.name == f"doc{doc_id}.txt"
            assert m.size == len(text.encode())
            assert tf.extractfile(m).read() == text.encode()

    rows = {
        r["doc_id"]: r
        for r in REGISTRY["multimodal_tar_header_parse"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in docs:
        r = rows[doc_id]
        assert r["fname"] == f"doc{doc_id}.txt"
        assert r["size_parsed"] == len(text.encode())
        assert r["mode_parsed"] == 0o644
        assert r["typeflag"] == "0"
        assert r["magic_ok"] and r["checksum_ok"] and r["data_ok"]
        assert r["total_len"] == 512 + 512 * -(-len(text.encode()) // 512)


def test_assortativity_python_replication(spark, sf_dir):
    """Moments and the final quotient match a pure-Python replay over
    the SAME mutual edge set; r stays in [-1, 1]."""
    und = _mutual_und(spark, sf_dir)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in und]
    pairs += [(y, x) for x, y in pairs]
    M = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    (row,) = REGISTRY["graph_degree_assortativity"].fn(spark, sf_dir).collect()
    assert (row["m_edges"], row["sum_x"], row["sum_xy"], row["sum_xx"]) == (
        M, sx, sxy, sxx,
    )
    assert row["r_num"] == M * sxy - sx * sx
    assert row["r_den"] == M * sxx - sx * sx
    assert row["assortativity"] == (M * sxy - sx * sx) / (M * sxx - sx * sx)
    assert -1.0 <= row["assortativity"] <= 1.0


def test_hoover_index_python_replication(spark, sf_dir):
    """Numerator exact vs a cent-level replay; index in [0, 1) and
    consistent with the emitted integers."""
    per = duckdb.connect().execute(
        f"""SELECT o_custkey, SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                  * 100 AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    cents = [c for _, c in per]
    n, X = len(cents), sum(cents)
    num = sum(abs(c * n - X) for c in cents)
    (row,) = REGISTRY["q_hoover_index"].fn(spark, sf_dir).collect()
    assert row["n_customers"] == n
    assert row["total_cents"] == X
    assert row["hoover_num"] == num
    assert row["hoover"] == num / (2.0 * n * X)
    assert 0.0 <= row["hoover"] < 1.0


def test_runs_test_python_replication(spark, sf_dir):
    """n1/n2/R match a pure-Python replay (lower-median split, ties
    dropped), and mu/z follow the exact formula chain."""
    import math

    hc = duckdb.connect().execute(
        f"""SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT),
                   COUNT(*)
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for t, h, c in hc:
        series.setdefault(t, {})[h] = c
    rows = {r["event_type"]: r for r in REGISTRY["events_runs_test"].fn(spark, sf_dir).collect()}
    for t, s in series.items():
        lo, hi = min(s), max(s)
        cs = [s.get(h, 0) for h in range(lo, hi + 1, 3600)]
        md = sorted(cs)[(len(cs) + 1) // 2 - 1]
        signs = [1 if c > md else -1 for c in cs if c != md]
        n1 = signs.count(1)
        n2 = signs.count(-1)
        if n1 < 1 or n2 < 1 or n1 + n2 < 3:
            assert t not in rows
            continue
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        r = rows[t]
        assert (r["n1"], r["n2"], r["n_runs"]) == (n1, n2, runs)
        n = n1 + n2
        mu = 2 * n1 * n2 / n + 1.0
        var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / ((n * n * (n - 1)))
        assert r["mu_runs"] == mu
        assert r["z_runs"] == (runs - mu) / math.sqrt(var)


def test_bootstrap_ci_python_replication(spark, sf_dir):
    """Full resampling replay in pure Python: identical hash-indexed
    draws, identical resample sums, identical order-statistic bounds."""
    import hashlib

    from real_value_etl_spark.queries.events_queries import (
        BOOT_B,
        BOOT_HI,
        BOOT_LO,
    )

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    hc = duckdb.connect().execute(
        f"""SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT),
                   COUNT(*)
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for t, h, c in hc:
        series.setdefault(t, {})[h] = c
    rows = {r["event_type"]: r for r in REGISTRY["events_bootstrap_ci"].fn(spark, sf_dir).collect()}
    for t, s in series.items():
        lo, hi = min(s), max(s)
        cs = [s.get(h, 0) for h in range(lo, hi + 1, 3600)]
        n = len(cs)
        sums = sorted(
            sum(cs[h32(f"{t}:{b}:{j}") % n] for j in range(n))
            for b in range(BOOT_B)
        )
        r = rows[t]
        assert r["n_hours"] == n
        assert r["obs_total"] == sum(cs)
        assert r["boot_lo_sum"] == sums[BOOT_LO - 1]
        assert r["boot_hi_sum"] == sums[BOOT_HI - 1]
        assert r["boot_lo_mean"] == sums[BOOT_LO - 1] / n
        assert r["covered"] == (
            sums[BOOT_LO - 1] <= sum(cs) <= sums[BOOT_HI - 1]
        )


def test_rich_club_python_replication(spark, sf_dir):
    """phi(k) matches a pure-Python replay over the SAME mutual edge
    set at every threshold; phi is a density in [0, 1]."""
    from real_value_etl_spark.queries.retrieval_graph import RICH_CLUB_KS

    und = _mutual_und(spark, sf_dir)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rows = {r["k"]: r for r in REGISTRY["graph_rich_club"].fn(spark, sf_dir).collect()}
    for k in RICH_CLUB_KS:
        club = {x for x, d in deg.items() if d > k}
        if len(club) < 2:
            assert k not in rows
            continue
        e_club = sum(1 for a, b in und if a in club and b in club)
        r = rows[k]
        assert r["n_club"] == len(club)
        assert r["e_club"] == e_club
        assert r["phi"] == 2 * e_club / (len(club) * (len(club) - 1))
        assert 0.0 <= r["phi"] <= 1.0


# --------------------------- property tests (pure Python, no Spark) --------


def _tar_build(name: bytes, data: bytes) -> bytes:
    """The exact recipe multimodal_tar_header_parse implements in Column
    expressions, in pure Python — property-tested against tarfile."""
    hdr_pre = (
        name + b"\x00" * (100 - len(name))
        + b"0000644\x00" + b"0001750\x00" + b"0001750\x00"
        + (b"%011o\x00" % len(data))
        + b"00000000000\x00"
    )
    hdr_post = (
        b"0" + b"\x00" * 100 + b"ustar\x00" + b"00"
        + b"\x00" * (32 + 32 + 8 + 8 + 155 + 12)
    )
    chk = sum(hdr_pre + b" " * 8 + hdr_post)
    hdr = hdr_pre + (b"%06o\x00 " % chk) + hdr_post
    pad = (512 - len(data) % 512) % 512
    return hdr + data + b"\x00" * pad


def test_tar_recipe_property():
    """tarfile (which validates the ustar checksum itself) must accept
    the recipe for adversarial sizes: empty file, 511/512/513-byte
    data (padding boundaries), long names, and random payloads."""
    import io
    import random
    import tarfile

    rng = random.Random(11)
    cases = [
        (b"a.txt", b""),
        (b"b.txt", b"x" * 511),
        (b"c.txt", b"y" * 512),
        (b"d.txt", b"z" * 513),
        (b"n" * 99 + b"x", b"edge-name"),
    ] + [
        (
            f"doc{rng.randrange(10**9)}.txt".encode(),
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000))),
        )
        for _ in range(20)
    ]
    for name, data in cases:
        blob = _tar_build(name, data) + b"\x00" * 1024
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            (m,) = tf.getmembers()
            assert m.name == name.decode()
            assert m.size == len(data)
            assert tf.extractfile(m).read() == data


def test_bootstrap_rank_formulas_property():
    """The integer rank formulas equal ceil(q*B) for every B in 1..2000
    (the arithmetic the CI bounds stand on), and the shipped constants
    are consistent with BOOT_B."""
    import math

    from real_value_etl_spark.queries.events_queries import (
        BOOT_B,
        BOOT_HI,
        BOOT_LO,
    )

    for B in range(1, 2001):
        assert (25 * B + 999) // 1000 == math.ceil(0.025 * B) or (
            # float ceil can land one high exactly at representation
            # boundaries; the INTEGER form is the contract
            (25 * B) % 1000 == 0
            and (25 * B + 999) // 1000 == 25 * B // 1000
        )
        assert (975 * B + 999) // 1000 == math.ceil(0.975 * B) or (
            (975 * B) % 1000 == 0
            and (975 * B + 999) // 1000 == 975 * B // 1000
        )
    assert BOOT_LO == (25 * BOOT_B + 999) // 1000 == 5
    assert BOOT_HI == (975 * BOOT_B + 999) // 1000 == 195


def test_hhi_python_replication(spark, sf_dir):
    """Exact-integer replication of the HHI chain, including the
    VARCHAR-doctrine double conversion and the normalized variant."""
    per = duckdb.connect().execute(
        f"""SELECT SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                            * 100 AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey"""
    ).fetchall()
    cents = [c for (c,) in per]
    n, X, sq = len(cents), sum(cents), sum(c * c for c in cents)
    (row,) = REGISTRY["q_hhi_concentration"].fn(spark, sf_dir).collect()
    assert row["n_customers"] == n
    assert row["total_cents"] == X
    hhi = float(sq) / (float(X) * float(X)) * 10000.0
    assert row["hhi"] == hhi
    assert row["hhi_normalized"] == (hhi - 10000.0 / n) / (10000.0 - 10000.0 / n)
    assert 10000.0 / n <= row["hhi"] <= 10000.0


def test_readability_python_replication(spark, sf_dir):
    """Word/sentence/syllable counts and the grade match a pure-Python
    replay of the same heuristics on every document."""
    import re

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    rows = {r["doc_id"]: r for r in REGISTRY["text_readability_fk"].fn(spark, sf_dir).collect()}
    for doc_id, text in docs:
        words = [w for w in text.split(" ") if w]
        if not words:
            assert doc_id not in rows
            continue
        sent = max(1, len(re.findall(r"[.!?]+", text)))
        syll = sum(
            max(1, len(re.findall(r"[aeiouy]+", w.lower()))) for w in words
        )
        r = rows[doc_id]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            len(words), sent, syll,
        )
        assert r["fk_grade"] == 0.39 * (len(words) / sent) + 11.8 * (
            syll / len(words)
        ) - 15.59


def test_bmp_signed_height_and_stride(spark, sf_dir):
    """Sign reconstruction and the 4-byte stride rule hold on every
    row; the file-size equation closes."""
    rows = REGISTRY["multimodal_bmp_parse"].fn(spark, sf_dir).collect()
    assert rows
    saw_top_down = saw_bottom_up = False
    for r in rows:
        i = r["doc_id"]
        w, h = i % 31 + 1, i % 17 + 1
        assert r["magic_ok"] and r["size_ok"]
        assert r["width"] == w and r["height_abs"] == h
        assert r["is_top_down"] == (i % 2 == 1)
        assert r["height_signed"] == (-h if i % 2 == 1 else h)
        stride = ((w * 3 + 3) // 4) * 4
        assert r["row_stride"] == stride
        assert r["image_size"] == stride * h
        assert r["file_size"] == 54 + stride * h
        assert r["planes"] == 1 and r["bits_per_pixel"] == 24
        saw_top_down |= r["is_top_down"]
        saw_bottom_up |= not r["is_top_down"]
    assert saw_top_down and saw_bottom_up  # both sign branches exercised


def test_pca_deflation_python_replication(spark, sf_dir):
    """Full exact-integer replay: Gram matrix from quantized embeddings,
    both unrolled chains (v1 power iteration, v2 deflated), bit-equal
    fixed-point outputs; v2 is near-orthogonal to v1 (quantization
    bound, not float drift) and not parallel to it."""
    from real_value_etl_spark.queries.feature_ops import (
        GRAM_DIM,
        GRAM_FX,
        POW_ITERS,
        POW_V_FX,
        _defl_py,
        _pow_renorm_py,
    )

    vecs = duckdb.connect().execute(
        f"""SELECT list_transform(CAST(embedding AS DOUBLE[]),
                     x -> CAST(round(x * {float(GRAM_FX)}) AS BIGINT))
            FROM '{sf_dir}/embeddings.parquet'"""
    ).fetchall()
    qs = [v for (v,) in vecs]
    G = [[0] * GRAM_DIM for _ in range(GRAM_DIM)]
    for q in qs:
        for i in range(GRAM_DIM):
            qi = q[i]
            if qi:
                for j in range(GRAM_DIM):
                    G[i][j] += qi * q[j]

    def mv(v):
        return [sum(G[i][j] * v[j] for j in range(GRAM_DIM)) for i in range(GRAM_DIM)]

    v1 = [POW_V_FX] * GRAM_DIM
    for _ in range(POW_ITERS):
        v1 = _pow_renorm_py(mv(v1))
    u = [POW_V_FX if j % 2 == 0 else -POW_V_FX for j in range(GRAM_DIM)]
    for _ in range(POW_ITERS):
        u = _pow_renorm_py(_defl_py(mv(u), v1))
    rows = REGISTRY["emb_pca_deflation"].fn(spark, sf_dir).collect()
    got1 = {r["i"]: r["v1_fx"] for r in rows}
    got2 = {r["i"]: r["v2_fx"] for r in rows}
    assert got1 == {i: v1[i] for i in range(GRAM_DIM)}
    assert got2 == {i: u[i] for i in range(GRAM_DIM)}
    # near-orthogonality: |cos(v1, v2)| small but v2 nonzero
    import math

    dot = sum(a * b for a, b in zip(v1, u))
    n1 = math.sqrt(sum(a * a for a in v1))
    n2 = math.sqrt(sum(b * b for b in u))
    assert n2 > 0
    assert abs(dot) / (n1 * n2) < 0.01
    for r in rows:
        assert r["v1"] == r["v1_fx"] / POW_V_FX
        assert r["v2"] == r["v2_fx"] / POW_V_FX


def test_edit_distance_python_replication(spark, sf_dir):
    """Every surviving pair's distance matches a pure-Python Levenshtein
    DP over the same 120-char prefixes, the ratio filter is honored,
    and pairs are LSH candidates (not all-pairs)."""
    from real_value_etl_spark.queries.llm import (
        EDIT_MAX_RATIO,
        EDIT_PREFIX_CHARS,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    texts = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, substr(text, 1, {EDIT_PREFIX_CHARS}) "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    rows = REGISTRY["text_edit_distance_pairs"].fn(spark, sf_dir).collect()
    assert rows, "LSH candidates produced no verified pair — fixture drift"
    for r in rows:
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        d = lev(a, b)
        assert r["edit_dist"] == d
        assert r["max_len"] == max(len(a), len(b), 1)
        assert r["edit_ratio"] == d / max(len(a), len(b), 1)
        assert r["edit_ratio"] <= EDIT_MAX_RATIO


def test_allen_relations_python_replication(spark, sf_dir):
    """Relation classification matches a pure-Python replay over the
    same (floored-second) intervals, pair counts conserve (one pair per
    consecutive interval), and only start-ordered relations appear."""
    from real_value_etl_spark.queries.events_queries import ALLEN_MIN_DUR_S

    rows = duckdb.connect().execute(
        f"""SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT),
                   CAST(FLOOR(value * 60) AS BIGINT), event_id
            FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()
    per: dict[int, list] = {}
    for u, t, s, d, eid in rows:
        per.setdefault(u, []).append((s, s + max(ALLEN_MIN_DUR_S, d), eid, t))
    want: dict[tuple, int] = {}
    n_pairs = 0
    for ivs in per.values():
        ivs.sort(key=lambda x: (x[0], x[1], x[2]))
        for (s1, e1, _, t), (s2, e2, _, _) in zip(ivs, ivs[1:]):
            n_pairs += 1
            if e1 < s2:
                r = "before"
            elif e1 == s2:
                r = "meets"
            elif s1 < s2 and e1 > s2 and e1 < e2:
                r = "overlaps"
            elif s1 < s2 and e1 == e2:
                r = "finished_by"
            elif s1 < s2 and e1 > e2:
                r = "contains"
            elif s1 == s2 and e1 < e2:
                r = "starts"
            elif s1 == s2 and e1 == e2:
                r = "equals"
            else:
                r = "started_by"
            want[(t, r)] = want.get((t, r), 0) + 1
    got = {
        (r["event_type"], r["relation"]): r["n_pairs"]
        for r in REGISTRY["events_allen_relations"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(got.values()) == n_pairs
