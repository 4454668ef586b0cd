"""Targeted invariants for the round-12 additions, beyond the oracle-parity
hash gate: each test recomputes the operator's defining property from the
raw parquet independently (pure Python / DuckDB), so a both-engines-wrong
implementation cannot hide behind an agreeing oracle."""

from __future__ import annotations

import math

import duckdb
import pytest

from real_value_etl_spark.queries.all_queries import REGISTRY


def _duck(sf_dir, sql):
    return duckdb.connect().execute(sql.replace("$SF", sf_dir)).fetchall()


def test_ks_two_sample_matches_pure_python(spark, sf_dir):
    """D, its witness, and both sample sizes match a from-scratch ECDF
    walk over the raw order values."""
    row = REGISTRY["q_ks_two_sample"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_totalprice, o_orderpriority IN ('1-URGENT','2-HIGH') "
        "FROM '$SF/orders.parquet'",
    )
    hi = sorted(v for v, h in vals if h)
    lo = sorted(v for v, h in vals if not h)
    n1, n2 = len(hi), len(lo)
    assert (row["n_hi"], row["n_lo"]) == (n1, n2)
    values = sorted({v for v, _ in vals})
    import bisect

    best, witness = -1, None
    for v in values:
        ca = bisect.bisect_right(hi, v)
        cb = bisect.bisect_right(lo, v)
        d = abs(ca * n2 - cb * n1)
        if d > best or (d == best and v < witness):
            best, witness = d, v
    assert row["d_scaled"] == best
    assert row["witness_value"] == witness
    assert row["ks_d"] == pytest.approx(best / (n1 * n2), rel=1e-15)
    assert row["ks_z"] == pytest.approx(
        best / (n1 * n2) * math.sqrt(n1 * n2 / (n1 + n2)), rel=1e-12
    )


def test_mann_whitney_matches_rank_recomputation(spark, sf_dir):
    """2*R1, U, the tie term, AUC, and z match an average-rank
    recomputation over the raw prices (pure Python, no engine)."""
    row = REGISTRY["q_mann_whitney"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT l_extendedprice, l_linestatus FROM '$SF/lineitem.parquet'",
    )
    ranked = sorted(vals)
    # average ranks, doubled to stay integral under ties
    r1x2 = 0
    i, n = 0, len(ranked)
    tie_term = 0
    while i < n:
        j = i
        while j < n and ranked[j][0] == ranked[i][0]:
            j += 1
        t = j - i
        tie_term += t * t * t - t
        # doubled average rank of positions i+1 .. j (1-based): (i+1 + j)
        dar = i + 1 + j
        for k in range(i, j):
            if ranked[k][1] == "O":
                r1x2 += dar
        i = j
    n1 = sum(1 for _, s in vals if s == "O")
    n2 = n - n1
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["r1_x2"] == r1x2
    u1x2 = 2 * n1 * n2 + n1 * (n1 + 1) - r1x2
    assert row["u1_x2"] == u1x2
    assert row["tie_term"] == tie_term
    assert row["auc_u"] == pytest.approx(u1x2 / (2 * n1 * n2), rel=1e-15)
    var = n1 * n2 * (n * (n + 1) * (n - 1) - tie_term) / (12 * n * (n - 1))
    assert row["z_u"] == pytest.approx(
        (u1x2 - n1 * n2) / (2 * math.sqrt(var)), rel=1e-12
    )


def test_cramers_v_matches_contingency_recomputation(spark, sf_dir):
    """chi2/n and V match a from-scratch contingency recomputation,
    and the spine is complete (|levels_p| * |levels_s| cells folded)."""
    row = REGISTRY["q_cramers_v"].fn(spark, sf_dir).collect()[0]
    cells = _duck(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus, COUNT(*) "
        "FROM '$SF/orders.parquet' GROUP BY 1, 2",
    )
    obs = {(p, s): c for p, s, c in cells}
    ps = sorted({p for p, _, _ in cells})
    ss = sorted({s for _, s, _ in cells})
    n = sum(obs.values())
    r = {p: sum(c for (pp, _), c in obs.items() if pp == p) for p in ps}
    c = {s: sum(cc for (_, sss), cc in obs.items() if sss == s) for s in ss}
    chi2_over_n = 0.0
    for p in ps:  # same (p, s) fold order as both engines
        for s in ss:
            dev = n * obs.get((p, s), 0) - r[p] * c[s]
            chi2_over_n += (dev * dev) / (n * n * r[p] * c[s])
    assert (row["n_priority_levels"], row["n_status_levels"]) == (
        len(ps),
        len(ss),
    )
    assert row["dof"] == (len(ps) - 1) * (len(ss) - 1)
    assert row["n_orders"] == n
    assert row["chi2_over_n"] == pytest.approx(chi2_over_n, rel=1e-12)
    assert row["cramers_v"] == pytest.approx(
        math.sqrt(chi2_over_n / (min(len(ps), len(ss)) - 1)), rel=1e-12
    )


def _hourly_series(sf_dir):
    rows = _duck(
        sf_dir,
        "SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT), "
        "COUNT(*) FROM '$SF/events.parquet' GROUP BY 1, 2",
    )
    series: dict[str, dict[int, int]] = {}
    for t, h, c in rows:
        series.setdefault(t, {})[h] = c
    return {
        t: [(h, s.get(h, 0)) for h in range(min(s), max(s) + 1, 3600)]
        for t, s in series.items()
    }


def test_theil_sen_matches_pure_python(spark, sf_dir):
    """The reported median slope (and its witness fraction) equals a
    pure-Python replay of the pairwise-slope median per type."""
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_theil_sen"].fn(spark, sf_dir).collect()
    }
    for t, sv in _hourly_series(sf_dir).items():
        pairs = []
        for a in range(len(sv)):
            for b in range(a + 1, len(sv)):
                num = sv[b][1] - sv[a][1]
                den = (sv[b][0] - sv[a][0]) // 3600
                pairs.append((num / den, num, den, sv[a][0]))
        pairs.sort()
        m = len(pairs)
        med = pairs[(m + 1) // 2 - 1]
        r = got[t]
        assert r["n_hours"] == len(sv)
        assert r["n_pairs"] == m
        assert (r["slope_num"], r["slope_den"]) == (med[1], med[2])
        assert r["ts_slope_per_hour"] == med[0]


def test_kendall_tau_matches_pure_python(spark, sf_dir):
    """Concordance counts conserve C(m,2) and tau-b equals the
    pure-Python replay for every type pair."""
    rows = REGISTRY["events_kendall_tau"].fn(spark, sf_dir).collect()
    assert rows
    series = {t: dict(sv) for t, sv in _hourly_series(sf_dir).items()}
    for r in rows:
        sa, sb = series[r["type_a"]], series[r["type_b"]]
        hs = sorted(set(sa) & set(sb))
        assert r["n_hours_common"] == len(hs)
        x = [sa[h] for h in hs]
        y = [sb[h] for h in hs]
        nc = nd = tx = ty = txy = 0
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                dx = (x[j] > x[i]) - (x[j] < x[i])
                dy = (y[j] > y[i]) - (y[j] < y[i])
                if dx * dy == 1:
                    nc += 1
                elif dx * dy == -1:
                    nd += 1
                elif dx == 0 and dy == 0:
                    txy += 1
                elif dx == 0:
                    tx += 1
                else:
                    ty += 1
        m = len(hs)
        assert nc + nd + tx + ty + txy == m * (m - 1) // 2
        assert (r["nc"], r["nd"]) == (nc, nd)
        assert (r["n_tie_x"], r["n_tie_y"], r["n_tie_both"]) == (tx, ty, txy)
        assert r["tau_b"] == pytest.approx(
            (nc - nd) / math.sqrt((nc + nd + tx) * (nc + nd + ty)), rel=1e-12
        )


def _mutual_adj(spark, sf_dir):
    """Undirected adjacency of the mutual-kNN graph, rebuilt from the
    already-driver-verified sim_knn_graph edge list."""
    edges = REGISTRY["sim_knn_graph"].fn(spark, sf_dir).collect()
    adj: dict[int, set[int]] = {}
    for e in edges:
        if e["mutual"]:
            adj.setdefault(e["src"], set()).add(e["dst"])
            adj.setdefault(e["dst"], set()).add(e["src"])
    return adj


def test_katz_centrality_matches_walk_counts(spark, sf_dir):
    """katz_scaled equals 64*deg + 8*p2 + p3 with p_k true walk counts
    recomputed by pure-Python neighborhood sums."""
    adj = _mutual_adj(spark, sf_dir)
    rows = REGISTRY["graph_katz_centrality"].fn(spark, sf_dir).collect()
    assert rows and len(rows) == len(adj)
    p1 = {n: len(ns) for n, ns in adj.items()}
    p2 = {n: sum(p1[m] for m in adj[n]) for n in adj}
    p3 = {n: sum(p2[m] for m in adj[n]) for n in adj}
    for r in rows:
        n = r["node"]
        assert r["deg"] == p1[n]
        assert r["paths2"] == p2[n]
        assert r["paths3"] == p3[n]
        scaled = 64 * p1[n] + 8 * p2[n] + p3[n]
        assert r["katz_scaled"] == scaled
        assert r["katz"] == scaled / 512


def test_double_sweep_matches_pure_bfs(spark, sf_dir):
    """Root choice, both bounded eccentricities, reach counts, and the
    far-node choice all match a pure-Python double sweep."""
    adj = _mutual_adj(spark, sf_dir)
    row = REGISTRY["graph_double_sweep"].fn(spark, sf_dir).collect()[0]

    def bfs(seed, hops=5):
        dist = {seed: 0}
        frontier = [seed]
        for d in range(1, hops + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        return dist

    root = min(adj, key=lambda n: (-len(adj[n]), n))
    assert row["root_node"] == root
    da = bfs(root)
    assert row["ecc_root"] == max(da.values())
    assert row["n_reached_root"] == len(da)
    far = min(da, key=lambda n: (-da[n], n))
    assert row["far_node"] == far
    db = bfs(far)
    assert row["ecc_far"] == max(db.values())
    assert row["n_reached_far"] == len(db)
    # the double-sweep invariant: the second eccentricity dominates
    assert row["ecc_far"] >= row["ecc_root"] - 0  # lower bound witness


def test_suffix_lcp_dedup_matches_pure_python(spark, sf_dir):
    """The full top-k bucket report matches a pure-Python suffix walk:
    same buckets, counts, doc counts, and adjacent-LCP maxima."""
    from real_value_etl_spark.queries.llm import SFX_MIN, SFX_TOPK, SFX_VIEW

    rows = REGISTRY["text_suffix_lcp_dedup"].fn(spark, sf_dir).collect()
    assert rows
    docs = _duck(sf_dir, "SELECT doc_id, text FROM '$SF/documents.parquet'")
    sufs = []  # (bucket, sfx, doc_id, pos)
    for doc_id, text in docs:
        ws = [w for w in text.split(" ") if w != ""]
        for i in range(len(ws)):
            sfx = " ".join(ws[i:])[:SFX_VIEW]
            if len(sfx) >= SFX_MIN:
                sufs.append((sfx[:SFX_MIN], sfx, doc_id, i + 1))
    buckets: dict[str, list] = {}
    for b, sfx, d, p in sufs:
        buckets.setdefault(b, []).append((sfx, d, p))
    stats = []
    for b, entries in buckets.items():
        entries.sort()
        n_docs = len({d for _, d, _ in entries})
        if n_docs < 2:
            continue
        max_lcp = None
        for (pa, _, _), (pb, _, _) in zip(entries, entries[1:]):
            ext = 0
            for d in range(1, SFX_VIEW - SFX_MIN + 1):
                if pa[SFX_MIN : SFX_MIN + d] == pb[SFX_MIN : SFX_MIN + d]:
                    ext = max(ext, d)
            lcp = min(SFX_MIN + ext, len(pa), len(pb))
            max_lcp = lcp if max_lcp is None else max(max_lcp, lcp)
        stats.append((-n_docs, -len(entries), b, max_lcp))
    stats.sort()
    want = stats[:SFX_TOPK]
    got = [
        (-r["n_docs"], -r["n_occurrences"], r["dup_prefix"], r["max_lcp"])
        for r in rows
    ]
    assert got == want


def test_stream_moments_matches_exact_power_sums(spark, sf_dir):
    """Drained streaming state equals exact big-int power sums over the
    raw values — including s4, which exceeds 2^53 already at sf0.001
    (so a double-typed state would silently lose exactness; int64
    overflows at larger scales — the reason the state is string-typed)
    — and the derived moments match the identical double expressions."""
    rows = REGISTRY["stream_moments"].fn(spark, sf_dir).collect()
    assert rows
    raw = _duck(
        sf_dir,
        "SELECT event_type, CAST(floor(value * 100) AS BIGINT) "
        "FROM '$SF/events.parquet' WHERE value IS NOT NULL",
    )
    sums: dict[str, list[int]] = {}
    for t, c in raw:
        s = sums.setdefault(t, [0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += c
        s[2] += c * c
        s[3] += c**3
        s[4] += c**4
    assert any(s[4] > 2**53 for s in sums.values())  # double exactness breaks
    for r in rows:
        n, s1, s2, s3, s4 = sums[r["event_type"]]
        assert r["n_values"] == n
        assert r["sum_cents"] == s1
        assert (r["s2_str"], r["s3_str"], r["s4_str"]) == (
            str(s2),
            str(s3),
            str(s4),
        )
        nd, s1d, s2d, s3d, s4d = (
            float(n),
            float(s1),
            float(s2),
            float(s3),
            float(s4),
        )
        m2 = (nd * s2d - s1d * s1d) / (nd * nd)
        m3 = (nd * nd * s3d - 3.0 * nd * s1d * s2d + 2.0 * s1d * s1d * s1d) / (
            nd * nd * nd
        )
        m4 = (
            nd * nd * nd * s4d
            - 4.0 * nd * nd * s1d * s3d
            + 6.0 * nd * s1d * s1d * s2d
            - 3.0 * s1d * s1d * s1d * s1d
        ) / (nd * nd * nd * nd)
        assert r["mean_value"] == pytest.approx(s1 / n / 100.0, rel=1e-12)
        assert r["var_pop_cents2"] == pytest.approx(m2, rel=1e-9)
        assert r["skewness"] == pytest.approx(m3 / (m2 * math.sqrt(m2)), rel=1e-6)
        assert r["kurtosis_excess"] == pytest.approx(
            m4 / (m2 * m2) - 3.0, rel=1e-6
        )


def _build_gif(doc_id: int) -> bytes:
    """Independent byte-level replica of the GIF build recipe."""
    w, h = doc_id % 317 + 4, doc_id % 211 + 3
    n = doc_id % 3
    n_ext, n_frames = doc_id % 3, doc_id % 4 + 1
    fw, fh = doc_id % 29 + 1, doc_id % 13 + 1
    out = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF0 + n, 0, 0])
    out += bytes([doc_id % 251]) * (3 * (1 << (n + 1)))
    ext = bytes([0x21, 0xF9, 0x04, doc_id % 8]) + (doc_id % 1000).to_bytes(
        2, "little"
    ) + bytes([0, 0])
    out += ext * n_ext
    data = bytes([(doc_id * 7 + 13) % 256]) * (fw * fh)
    chain = b""
    rest = data
    while len(rest) > 255:
        chain += bytes([255]) + rest[:255]
        rest = rest[255:]
    chain += bytes([len(rest)]) + rest + b"\x00"
    frame = (
        bytes([0x2C, 0, 0, 0, 0])
        + fw.to_bytes(2, "little")
        + fh.to_bytes(2, "little")
        + bytes([0, 2])
        + chain
    )
    out += frame * n_frames
    return out + b"\x3b"


def _walk_gif(b: bytes):
    """Generic GIF block walker (recipe-agnostic)."""
    assert b[:6] == b"GIF89a"
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    pk = b[10]
    gct_entries = 1 << ((pk & 7) + 1)
    off = 13 + (3 * gct_entries if pk & 0x80 else 0)
    n_ext = n_frames = data_bytes = 0
    lw = lh = 0
    trailer = False
    while off < len(b):
        intro = b[off]
        if intro == 0x3B:
            trailer = True
            off += 1
            break
        if intro == 0x21:
            cpos = off + 2
        elif intro == 0x2C:
            lw = int.from_bytes(b[off + 5 : off + 7], "little")
            lh = int.from_bytes(b[off + 7 : off + 9], "little")
            cpos = off + 11
        else:  # pragma: no cover - malformed
            raise AssertionError(f"bad introducer {intro:#x}")
        dl = 0
        while True:
            ln = b[cpos]
            cpos += 1
            if ln == 0:
                break
            dl += ln
            cpos += ln
        if intro == 0x21:
            n_ext += 1
        else:
            n_frames += 1
            data_bytes += dl
        off = cpos
    return dict(
        width=w, height=h, gct_entries=gct_entries, n_extensions=n_ext,
        n_frames=n_frames, lzw_data_bytes=data_bytes, last_frame_w=lw,
        last_frame_h=lh, trailer_ok=trailer, total_len=off,
    )


def test_gif_frame_walk_matches_independent_walker(spark, sf_dir):
    """Every emitted field matches a generic pure-Python GIF walker run
    over an independently rebuilt byte stream."""
    rows = REGISTRY["multimodal_gif_frame_walk"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        b = _build_gif(r["doc_id"])
        want = _walk_gif(b)
        assert r["magic_ok"] and r["gct_flag"] and r["length_ok"]
        for k, v in want.items():
            assert r[k] == v, (r["doc_id"], k, r[k], v)
        assert len(b) == r["total_len"]


def test_friedman_matches_pure_python(spark, sf_dir):
    """Per-type doubled rank sums, A4, the squared-deviation sum, and
    the tie-corrected statistic all match a pure-Python blocked-rank
    replay over the zero-filled (day, type) grid."""
    rows = REGISTRY["events_friedman_test"].fn(spark, sf_dir).collect()
    assert rows
    raw = _duck(
        sf_dir,
        "SELECT event_type, CAST(epoch(date_trunc('day', ts)) AS BIGINT), "
        "COUNT(*) FROM '$SF/events.parquet' GROUP BY 1, 2",
    )
    grid: dict[tuple, int] = {(t, d): c for t, d, c in raw}
    types = sorted({t for t, _, _ in raw})
    ds = [d for _, d, _ in raw]
    days = list(range(min(ds), max(ds) + 1, 86400))
    b, k = len(days), len(types)
    r2sum = {t: 0 for t in types}
    a4 = 0
    for d in days:
        cs = {t: grid.get((t, d), 0) for t in types}
        for t in types:
            r2 = (
                2 * sum(1 for o in types if cs[o] < cs[t])
                + sum(1 for o in types if cs[o] == cs[t])
                + 1
            )
            r2sum[t] += r2
            a4 += r2 * r2
    ssq = sum((r2sum[t] - b * (k + 1)) ** 2 for t in types)
    c4 = b * k * (k + 1) * (k + 1)
    for r in rows:
        assert (r["n_days"], r["n_types"]) == (b, k)
        assert r["r2_sum"] == r2sum[r["event_type"]]
        assert r["mean_rank"] == pytest.approx(
            r2sum[r["event_type"]] / (2 * b), rel=1e-15
        )
        assert r["a4"] == a4
        assert r["sum_sq_dev"] == ssq
        assert r["dof"] == k - 1
        assert r["chi2_friedman"] == pytest.approx(
            (k - 1) * ssq / (a4 - c4), rel=1e-12
        )


def test_kcenter_matches_greedy_replay(spark, sf_dir):
    """Center choices and radii match a pure-Python Gonzalez greedy."""
    rows = sorted(
        REGISTRY["sim_kcenter_seeds"].fn(spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    embs = {
        vid: v
        for vid, v in _duck(
            sf_dir,
            "SELECT vec_id, CAST(embedding AS DOUBLE[]) "
            "FROM '$SF/embeddings.parquet'",
        )
    }

    def cos(a, b):
        dp = 0.0
        for x, y in zip(a, b):
            dp += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dp / (na * nb)

    seed = min(embs)
    dist = {i: 1.0 - cos(v, embs[seed]) for i, v in embs.items()}
    picks = [(0, seed, None)]
    for step in range(1, len(rows)):
        far = min(dist, key=lambda i: (-dist[i], i))
        picks.append((step, far, dist[far]))
        for i, v in embs.items():
            dist[i] = min(dist[i], 1.0 - cos(v, embs[far]))
    for r, (step, cid, radius) in zip(rows, picks):
        assert (r["step"], r["center_id"]) == (step, cid)
        if radius is None:
            assert r["radius"] is None
        else:
            assert r["radius"] == pytest.approx(radius, rel=1e-9)
        assert r["final_radius"] == pytest.approx(max(dist.values()), rel=1e-9)
    # greedy invariant: radii are non-increasing
    radii = [p[2] for p in picks[1:]]
    assert all(x >= y for x, y in zip(radii, radii[1:]))


def test_edge_jaccard_matches_set_replay(spark, sf_dir):
    """Every edge's common-neighbor count and Jaccard match Python set
    arithmetic over the mutual adjacency."""
    adj = _mutual_adj(spark, sf_dir)
    rows = REGISTRY["graph_edge_jaccard"].fn(spark, sf_dir).collect()
    n_edges = sum(len(v) for v in adj.values()) // 2
    assert len(rows) == n_edges
    for r in rows:
        a, b = r["a"], r["b"]
        assert b in adj[a] and a < b
        common = len(adj[a] & adj[b])
        assert r["n_common"] == common
        assert (r["deg_a"], r["deg_b"]) == (len(adj[a]), len(adj[b]))
        assert r["edge_jaccard"] == pytest.approx(
            common / (len(adj[a]) + len(adj[b]) - common), rel=1e-12
        )


def _build_ico(doc_id: int) -> bytes:
    """Independent byte-level replica of the ICO build recipe."""
    cnt = doc_id % 3 + 1
    entries = []
    for i in range(cnt):
        w = (doc_id + 7 * i) % 29 + 1
        h = (doc_id + 13 * i) % 17 + 1
        entries.append((w, h))
    out = b"\x00\x00\x01\x00" + cnt.to_bytes(2, "little")
    imgs = b""
    off = 6 + 16 * cnt
    fill = bytes([(doc_id * 11 + 5) % 256])
    for w, h in entries:
        xor, andb = 4 * w * h, 4 * h
        size = 40 + xor + andb
        out += bytes([w, h, 0, 0]) + (1).to_bytes(2, "little")
        out += (32).to_bytes(2, "little")
        out += size.to_bytes(4, "little") + off.to_bytes(4, "little")
        dib = (
            (40).to_bytes(4, "little")
            + w.to_bytes(4, "little")
            + (2 * h).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (32).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + (xor + andb).to_bytes(4, "little")
            + b"\x00" * 16
            + fill * xor
            + b"\x00" * andb
        )
        imgs += dib
        off += size
    return out + imgs


def test_ico_parse_matches_independent_walker(spark, sf_dir):
    """Every field matches a generic directory walk over independently
    rebuilt bytes, including the offset chain and doubled heights."""
    rows = REGISTRY["multimodal_ico_parse"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        b = _build_ico(r["doc_id"])
        assert b[:4] == b"\x00\x00\x01\x00" and r["magic_ok"]
        cnt = int.from_bytes(b[4:6], "little")
        assert r["n_entries"] == cnt
        expect = 6 + 16 * cnt
        tx = ta = 0
        lw = lh = None
        for i in range(cnt):
            e = 6 + 16 * i
            w, h = b[e], b[e + 1]
            size = int.from_bytes(b[e + 8 : e + 12], "little")
            off = int.from_bytes(b[e + 12 : e + 16], "little")
            assert off == expect  # the chase the query verifies
            bi_w = int.from_bytes(b[off + 4 : off + 8], "little")
            bi_h = int.from_bytes(b[off + 8 : off + 12], "little")
            assert bi_w == w and bi_h == 2 * h
            stride = ((bi_w + 31) // 32) * 4
            tx += 4 * bi_w * h
            ta += stride * h
            assert size == 40 + 4 * bi_w * h + stride * h
            expect = off + size
            lw, lh = w, h
        assert (r["total_xor_bytes"], r["total_and_bytes"]) == (tx, ta)
        assert (r["last_w"], r["last_h"]) == (lw, lh)
        assert r["offsets_ok"] and r["heights_doubled_ok"] and r["sizes_ok"]
        assert r["total_len"] == len(b) and r["length_ok"]


def test_welch_t_matches_pure_python(spark, sf_dir):
    """Group moments, t, and the Welch-Satterthwaite dof match an
    exact-integer recomputation over the raw cents."""
    row = REGISTRY["q_welch_t_test"].fn(spark, sf_dir).collect()[0]
    from decimal import Decimal

    vals = _duck(
        sf_dir,
        "SELECT o_totalprice, o_orderpriority IN ('1-URGENT','2-HIGH') "
        "FROM '$SF/orders.parquet'",
    )
    g = {True: [], False: []}
    for v, hi in vals:
        g[hi].append(int(Decimal(str(v)) * 100))
    n1, n2 = len(g[True]), len(g[False])
    s1, s2 = sum(g[True]), sum(g[False])
    q1 = sum(c * c for c in g[True])
    q2 = sum(c * c for c in g[False])
    assert (row["n_hi"], row["n_lo"]) == (n1, n2)
    v1 = (n1 * q1 - s1 * s1) / (n1 * (n1 - 1))
    v2 = (n2 * q2 - s2 * s2) / (n2 * (n2 - 1))
    assert row["mean_hi"] == pytest.approx(s1 / n1 / 100, rel=1e-12)
    assert row["mean_lo"] == pytest.approx(s2 / n2 / 100, rel=1e-12)
    assert row["var_hi_cents2"] == pytest.approx(v1, rel=1e-9)
    assert row["var_lo_cents2"] == pytest.approx(v2, rel=1e-9)
    se2 = v1 / n1 + v2 / n2
    assert row["t_welch"] == pytest.approx(
        (s1 / n1 - s2 / n2) / math.sqrt(se2), rel=1e-9
    )
    assert row["dof_welch"] == pytest.approx(
        se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)),
        rel=1e-9,
    )


def test_tv_distance_matches_pure_python(spark, sf_dir):
    """The exact TV numerator and the distance match a from-scratch
    unigram recount, and TV respects its [0, 1) bound."""
    rows = REGISTRY["docs_tv_distance"].fn(spark, sf_dir).collect()
    assert rows
    docs = _duck(sf_dir, "SELECT source, text FROM '$SF/documents.parquet'")
    per: dict[str, dict[str, int]] = {}
    corpus: dict[str, int] = {}
    for src, text in docs:
        d = per.setdefault(src, {})
        for t in (w for w in text.split(" ") if w != ""):
            d[t] = d.get(t, 0) + 1
            corpus[t] = corpus.get(t, 0) + 1
    n_c = sum(corpus.values())
    for r in rows:
        d = per[r["source"]]
        n_s = sum(d.values())
        assert r["n_tokens_source"] == n_s
        assert r["n_tokens_corpus"] == n_c
        assert r["n_vocab_seen"] == len(d)
        num = sum(
            abs(c_st * n_c - corpus[t] * n_s) for t, c_st in d.items()
        )
        num += n_s * (n_c - sum(corpus[t] for t in d))
        assert r["tv_num"] == num
        tv = num / (2 * n_s * n_c)
        assert r["tv_distance"] == pytest.approx(tv, rel=1e-12)
        assert 0.0 <= tv < 1.0


def test_png_crc32_matches_zlib(spark, sf_dir):
    """Every emitted CRC equals zlib.crc32 over independently rebuilt
    chunk bytes — a third implementation neither engine shares — and
    the stored-vs-recomputed flags all hold."""
    import zlib

    rows = REGISTRY["multimodal_png_crc32"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["sig_ok"] and r["length_ok"]
        assert r["ihdr_len"] == 13
        w, h = r["width"], r["height"]
        assert (w, h) == (r["doc_id"] % 317 + 1, r["doc_id"] % 211 + 1)
        ihdr = (
            b"IHDR"
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        assert r["ihdr_crc"] == zlib.crc32(ihdr) and r["ihdr_crc_ok"]
        text = b"tEXt" + b"doc\x00id=" + str(r["doc_id"]).encode()
        assert r["text_len"] == 7 + len(str(r["doc_id"]))
        assert r["text_crc"] == zlib.crc32(text) and r["text_crc_ok"]
        assert r["iend_crc"] == zlib.crc32(b"IEND") == 0xAE426082
        assert r["iend_crc_ok"]


def test_granger_matches_pure_ols(spark, sf_dir):
    """RSS of both nested models and the F statistic match a pure-Python
    least-squares replay (normal equations solved with exact ints then
    floats) for every ordered type pair."""
    rows = REGISTRY["events_granger_lag1"].fn(spark, sf_dir).collect()
    assert rows
    series = {t: dict(sv) for t, sv in _hourly_series(sf_dir).items()}
    seen = 0
    for r in rows:
        sx = series[r["type_cause"]]
        sy = series[r["type_effect"]]
        hs = sorted(set(sx) & set(sy))
        y = [sy[h] for h in hs][1:]
        u = [sy[h] for h in hs][:-1]
        v = [sx[h] for h in hs][:-1]
        m = len(y)
        assert r["n_obs"] == m
        Sy, Su, Sv = sum(y), sum(u), sum(v)
        syy = sum(a * a for a in y)
        suu = sum(a * a for a in u)
        svv = sum(a * a for a in v)
        syu = sum(a * b for a, b in zip(y, u))
        syv = sum(a * b for a, b in zip(y, v))
        suv = sum(a * b for a, b in zip(u, v))
        cyy = float(m * syy - Sy * Sy)
        cuu = float(m * suu - Su * Su)
        cvv = float(m * svv - Sv * Sv)
        cyu = float(m * syu - Sy * Su)
        cyv = float(m * syv - Sy * Sv)
        cuv = float(m * suv - Su * Sv)
        det = cuu * cvv - cuv * cuv
        assert cuu > 0 and det > 0
        rss_r = (cyy - cyu * cyu / cuu) / m
        rss_u = (
            cyy
            - (cyu * cyu * cvv - 2.0 * cyu * cyv * cuv + cyv * cyv * cuu)
            / det
        ) / m
        assert r["rss_r"] == pytest.approx(rss_r, rel=1e-9)
        assert r["rss_u"] == pytest.approx(rss_u, rel=1e-9)
        assert r["f_granger"] == pytest.approx(
            (rss_r - rss_u) * (m - 3.0) / rss_u, rel=1e-6
        )
        # nested models: the augmented fit can never be worse
        assert rss_u <= rss_r + 1e-9
        seen += 1
    assert seen == len(rows)


def test_ljung_box_matches_pure_python(spark, sf_dir):
    """c0*n^2, every rho_k, and Q match a pure-Python classical-ACF
    replay over the zero-filled hourly series."""
    rows = REGISTRY["events_ljung_box"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        sv = _hourly_series(sf_dir)[r["event_type"]]
        xs = [c for _, c in sv]
        n, s1 = len(xs), sum(xs)
        y = [n * x - s1 for x in xs]
        c0 = sum(v * v for v in y)
        assert (r["n_hours"], r["c0n2"]) == (n, c0)
        q = 0.0
        for k in range(1, 7):
            ck = sum(y[t] * y[t - k] for t in range(k, n))
            rho = ck / c0
            assert r[f"rho_{k}"] == pytest.approx(rho, rel=1e-12)
            q += rho * rho / (n - k)
        assert r["q_ljung_box"] == pytest.approx(n * (n + 2) * q, rel=1e-9)


def _build_avi(doc_id: int) -> bytes:
    """Independent byte-level replica of the AVI build recipe."""
    n = doc_id % 4 + 1
    fill = bytes([(doc_id * 13 + 7) % 256])
    chunks = b""
    entries = b""
    off = 0
    for i in range(n):
        sz = (doc_id + 31 * i) % 97 + 1
        pad = sz % 2
        chunks += b"00dc" + sz.to_bytes(4, "little") + fill * sz + b"\x00" * pad
        flags = 0x10 if i % 2 == 0 else 0
        entries += (
            b"00dc"
            + flags.to_bytes(4, "little")
            + off.to_bytes(4, "little")
            + sz.to_bytes(4, "little")
        )
        off += 8 + sz + pad
    movi = b"movi" + chunks
    idx = b"idx1" + (16 * n).to_bytes(4, "little") + entries
    riff_size = 4 + 8 + len(movi) + len(idx)
    return (
        b"RIFF"
        + riff_size.to_bytes(4, "little")
        + b"AVI "
        + b"LIST"
        + len(movi).to_bytes(4, "little")
        + movi
        + idx
    )


def test_avi_idx1_matches_independent_walker(spark, sf_dir):
    """Every field matches a generic RIFF walker (with the even-padding
    rule) over independently rebuilt bytes; the idx1 cross-check holds."""
    rows = REGISTRY["multimodal_avi_idx1_walk"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        b = _build_avi(r["doc_id"])
        assert b[:4] == b"RIFF" and b[8:12] == b"AVI " and r["riff_ok"]
        assert int.from_bytes(b[4:8], "little") == len(b) - 8
        assert r["riff_size_ok"] and r["avi_ok"] and r["movi_ok"]
        list_size = int.from_bytes(b[16:20], "little")
        pos = 24  # first chunk (0-based)
        walked = []
        data = pads = 0
        while pos < 20 + list_size:
            assert b[pos : pos + 4] == b"00dc"
            sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
            walked.append((pos - 24, sz))
            data += sz
            pads += sz % 2
            pos += 8 + sz + (sz % 2)
        assert r["n_chunks"] == len(walked)
        assert (r["data_bytes"], r["pad_bytes"]) == (data, pads)
        assert b[pos : pos + 4] == b"idx1" and r["idx1_ok"]
        n_idx = int.from_bytes(b[pos + 4 : pos + 8], "little") // 16
        assert r["n_idx_entries"] == n_idx == len(walked)
        kf = 0
        for i in range(n_idx):
            e = pos + 8 + 16 * i
            flags = int.from_bytes(b[e + 4 : e + 8], "little")
            eoff = int.from_bytes(b[e + 8 : e + 12], "little")
            esz = int.from_bytes(b[e + 12 : e + 16], "little")
            assert (eoff, esz) == walked[i]
            kf += 1 if flags & 0x10 else 0
        assert r["n_keyframes"] == kf == (len(walked) + 1) // 2
        assert r["offsets_ok"] and r["sizes_ok"]
        assert r["total_len"] == len(b) and r["length_ok"]
