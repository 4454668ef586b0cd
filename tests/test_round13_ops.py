"""Targeted invariants for the round-13 additions, beyond the oracle-parity
hash gate: each test recomputes the operator's defining property from the
raw parquet independently (pure Python / scipy-free closed forms), so a
both-engines-wrong implementation cannot hide behind an agreeing oracle."""

from __future__ import annotations

import math

import duckdb

from real_value_etl_spark.queries.all_queries import REGISTRY


def _duck(sf_dir, sql):
    return duckdb.connect().execute(sql.replace("$SF", sf_dir)).fetchall()


def _midranks(values):
    """value -> average rank (1-based) over the full list, ties averaged."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_kruskal_wallis_matches_pure_python(spark, sf_dir):
    """H (raw + tie-adjusted) matches a from-scratch midrank computation
    over the raw order values."""
    row = REGISTRY["q_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_totalprice, o_orderpriority FROM '$SF/orders.parquet'",
    )
    ranks = _midranks([v for v, _ in vals])
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    n = len(vals)
    rsum = {p: 0.0 for p in prios}
    cnt = {p: 0 for p in prios}
    for v, p in vals:
        rsum[p] += ranks[v]
        cnt[p] += 1
    h = 12.0 / (n * (n + 1)) * sum(
        rsum[p] ** 2 / cnt[p] for p in prios
    ) - 3.0 * (n + 1)
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(v for v, _ in vals).values())
    h_adj = h / (1.0 - tie / (n**3 - n))
    assert row["n"] == n
    assert row["tie_term"] == tie
    for i, p in enumerate(prios, 1):
        assert row[f"n{i}"] == cnt[p]
        assert row[f"r{i}_x2"] == round(2 * rsum[p])
    assert math.isclose(row["h_raw"], h, rel_tol=1e-9)
    assert math.isclose(row["h_adj"], h_adj, rel_tol=1e-9)


def test_spearman_matches_pure_python(spark, sf_dir):
    """rho equals Pearson correlation of midranks computed from scratch."""
    row = REGISTRY["q_spearman_rho"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT l_quantity, l_extendedprice FROM '$SF/lineitem.parquet'",
    )
    rx = _midranks([x for x, _ in vals])
    ry = _midranks([y for _, y in vals])
    xs = [rx[x] for x, _ in vals]
    ys = [ry[y] for _, y in vals]
    n = len(vals)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    vx = sum((a - mx) ** 2 for a in xs)
    vy = sum((b - my) ** 2 for b in ys)
    rho = cov / math.sqrt(vx * vy)
    assert row["n"] == n
    assert math.isclose(row["rho_spearman"], rho, rel_tol=1e-9)


def test_jarque_bera_matches_pure_python(spark, sf_dir):
    """Per-group skewness / excess kurtosis / JB match the population-
    moment definitions computed directly."""
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["q_jarque_bera"].fn(spark, sf_dir).collect()
    }
    vals = _duck(
        sf_dir,
        "SELECT l_returnflag, CAST(l_quantity * 100 AS BIGINT) "
        "FROM '$SF/lineitem.parquet'",
    )
    by = {}
    for g, x in vals:
        by.setdefault(g, []).append(x)
    for g, xs in by.items():
        n = len(xs)
        mean = sum(xs) / n
        m2 = sum((x - mean) ** 2 for x in xs) / n
        m3 = sum((x - mean) ** 3 for x in xs) / n
        m4 = sum((x - mean) ** 4 for x in xs) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
        r = rows[g]
        assert r["n"] == n
        assert math.isclose(r["var_pop"], m2 / 1e4, rel_tol=1e-9)
        assert math.isclose(r["skewness"], skew, rel_tol=1e-6)
        assert math.isclose(r["kurtosis_ex"], kurt, rel_tol=1e-6)
        assert math.isclose(r["jb_stat"], jb, rel_tol=1e-6)


def test_cliffs_delta_matches_brute_force(spark, sf_dir):
    """gt/lt/eq pair counts equal the brute-force O(n1*n2) dominance
    matrix (sf0.001 is small enough), and delta = (gt-lt)/(n1*n2);
    consistency with Mann-Whitney's rank-biserial identity implied."""
    row = REGISTRY["q_cliffs_delta"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_totalprice, o_orderpriority IN ('1-URGENT','2-HIGH') "
        "FROM '$SF/orders.parquet'",
    )
    hi = sorted(v for v, h in vals if h)
    lo = sorted(v for v, h in vals if not h)
    import bisect

    gt = sum(bisect.bisect_left(lo, v) for v in hi)
    le = sum(bisect.bisect_right(lo, v) for v in hi)
    eq = le - gt
    lt = len(hi) * len(lo) - le
    assert (row["n1"], row["n2"]) == (len(hi), len(lo))
    assert (row["gt_pairs"], row["lt_pairs"], row["eq_pairs"]) == (
        gt,
        lt,
        eq,
    )
    assert math.isclose(
        row["cliffs_delta"], (gt - lt) / (len(hi) * len(lo)), rel_tol=1e-12
    )


def test_mcnemar_cells_partition_customers(spark, sf_dir):
    """The 2x2 cells partition the customer-with-orders set; the stat
    matches (b-c)^2/(b+c) recomputed from independently derived cells."""
    row = REGISTRY["q_mcnemar"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        """SELECT o_custkey,
                  MAX(CASE WHEN o_orderdate < DATE '1995-06-17' AND
                       o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END),
                  MAX(CASE WHEN o_orderdate >= DATE '1995-06-17' AND
                       o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END)
           FROM '$SF/orders.parquet' GROUP BY 1""",
    )
    a = sum(1 for _, h1, h2 in vals if h1 and h2)
    b = sum(1 for _, h1, h2 in vals if h1 and not h2)
    c = sum(1 for _, h1, h2 in vals if not h1 and h2)
    d = sum(1 for _, h1, h2 in vals if not h1 and not h2)
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    assert a + b + c + d == len(vals)
    assert math.isclose(
        row["mcnemar_chi2"], (b - c) ** 2 / (b + c), rel_tol=1e-12
    )
    assert math.isclose(
        row["mcnemar_cc"], (abs(b - c) - 1) ** 2 / (b + c), rel_tol=1e-12
    )


def test_cochran_q_matches_pure_python(spark, sf_dir):
    """Q matches the textbook formula over an independently built
    user x type first-active-day incidence matrix with saturated rows
    dropped."""
    row = REGISTRY["events_cochran_q"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        """WITH fd AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
                       FROM '$SF/events.parquet' GROUP BY 1)
           SELECT DISTINCT e.user_id, e.event_type
           FROM '$SF/events.parquet' e JOIN fd ON fd.user_id = e.user_id
           WHERE CAST(e.ts AS DATE) = fd.d0""",
    )
    k = len(
        _duck(sf_dir, "SELECT DISTINCT event_type FROM '$SF/events.parquet'")
    )
    rows_by_user = {}
    for u, t in vals:
        rows_by_user.setdefault(u, set()).add(t)
    keep = {u: ts for u, ts in rows_by_user.items() if len(ts) < k}
    col = {}
    for ts in keep.values():
        for t in ts:
            col[t] = col.get(t, 0) + 1
    T = sum(col.values())
    num = (k - 1) * (k * sum(c * c for c in col.values()) - T * T)
    den = k * T - sum(len(ts) ** 2 for ts in keep.values())
    assert row["k"] == k
    assert row["n_users"] == len(keep)
    assert row["total_marks"] == T
    if den == 0:
        assert row["q_cochran"] is None
    else:
        assert math.isclose(row["q_cochran"], num / den, rel_tol=1e-9)


def test_yule_k_matches_pure_python(spark, sf_dir):
    """K, the spectrum heads, and totals match a Counter-based
    recomputation over whitespace tokens."""
    from collections import Counter

    row = REGISTRY["text_yule_k"].fn(spark, sf_dir).collect()[0]
    docs = _duck(sf_dir, "SELECT text FROM '$SF/documents.parquet'")
    cnt = Counter(
        t for (text,) in docs for t in text.split(" ") if t != ""
    )
    n = sum(cnt.values())
    assert row["n_tokens"] == n
    assert row["n_types"] == len(cnt)
    assert row["v1_hapax"] == sum(1 for c in cnt.values() if c == 1)
    assert row["v2_dis"] == sum(1 for c in cnt.values() if c == 2)
    k = 1e4 * (sum(c * c for c in cnt.values()) - n) / (n * n)
    assert math.isclose(row["yule_k"], k, rel_tol=1e-12)


def test_burrows_delta_matches_pure_python(spark, sf_dir):
    """Every pair's Delta matches a from-scratch fixed-point z-score
    computation (top-F selection, floor scaling, zero-variance drop,
    mean-cancellation identity)."""
    from collections import Counter

    from real_value_etl_spark.queries.llm import BURROWS_F, BURROWS_SCALE

    rows = REGISTRY["text_burrows_delta"].fn(spark, sf_dir).collect()
    docs = _duck(
        sf_dir, "SELECT source, text FROM '$SF/documents.parquet'"
    )
    corpus = Counter()
    per_src = {}
    tot_src = {}
    for src, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        corpus.update(toks)
        per_src.setdefault(src, Counter()).update(toks)
        tot_src[src] = tot_src.get(src, 0) + len(toks)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:BURROWS_F]
    words = [w for w, _ in top]
    sources = sorted(per_src)
    S = len(sources)
    fi = {
        (s, w): per_src[s][w] * BURROWS_SCALE // tot_src[s]
        for s in sources
        for w in words
    }
    keep_words = []
    vw = {}
    for w in words:
        sf_ = sum(fi[(s, w)] for s in sources)
        sf2 = sum(fi[(s, w)] ** 2 for s in sources)
        v = S * sf2 - sf_ * sf_
        if v > 0:
            keep_words.append(w)
            vw[w] = v
    got = {(r["src_a"], r["src_b"]): r for r in rows}
    assert len(got) == S * (S - 1) // 2
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            terms = [
                abs(fi[(a, w)] - fi[(b, w)]) / math.sqrt(vw[w])
                for w in sorted(keep_words)
            ]
            want = S * sum(terms) / len(keep_words)
            r = got[(a, b)]
            assert r["n_features"] == len(keep_words)
            assert math.isclose(r["burrows_delta"], want, rel_tol=1e-9)


def test_ols_matches_pure_python(spark, sf_dir):
    """Per-group slope/intercept/r2 equal the closed-form least-squares
    fit over exactly cent-scaled pairs."""
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["q_ols_price_on_qty"].fn(spark, sf_dir).collect()
    }
    vals = _duck(
        sf_dir,
        "SELECT l_returnflag, CAST(l_quantity * 100 AS BIGINT), "
        "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT) "
        "FROM '$SF/lineitem.parquet'",
    )
    by = {}
    for g, x, y in vals:
        by.setdefault(g, []).append((x, y))
    for g, xy in by.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxx = sum(x * x for x, _ in xy)
        syy = sum(y * y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        r = rows[g]
        assert r["n"] == n
        assert math.isclose(r["slope"], num / denx, rel_tol=1e-12)
        assert math.isclose(
            r["intercept_dollars"],
            (sy - num / denx * sx) / n / 100.0,
            rel_tol=1e-9,
        )
        assert math.isclose(
            r["r2"], num * num / (denx * deny), rel_tol=1e-12
        )


def test_bipartite_squares_matches_brute_force(spark, sf_dir):
    """Top-k supplier pairs and square counts equal a brute-force
    common-neighborhood scan; the degree cap is not binding at fixture
    scale (capped == exact)."""
    from itertools import combinations

    from real_value_etl_spark.queries.graph import SQ_DEG_CAP, SQ_TOPK

    rows = REGISTRY["graph_bipartite_squares"].fn(spark, sf_dir).collect()
    edges = _duck(
        sf_dir,
        """SELECT DISTINCT o_custkey, l_suppkey
           FROM '$SF/orders.parquet'
           JOIN '$SF/lineitem.parquet' ON l_orderkey = o_orderkey""",
    )
    by_cust = {}
    for c, s in edges:
        by_cust.setdefault(c, set()).add(s)
    assert max(len(v) for v in by_cust.values()) <= SQ_DEG_CAP
    pair_m = {}
    for sups in by_cust.values():
        for s1, s2 in combinations(sorted(sups), 2):
            pair_m[(s1, s2)] = pair_m.get((s1, s2), 0) + 1
    want = sorted(
        pair_m.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:SQ_TOPK]
    assert len(rows) == min(SQ_TOPK, len(pair_m))
    for r, ((s1, s2), m) in zip(rows, want):
        assert (r["s1"], r["s2"], r["common_customers"]) == (s1, s2, m)
        assert r["squares"] == m * (m - 1) // 2


def _gzip_build_python(doc_id: int, text: str) -> tuple[bytes, bytes]:
    """Independent rebuild of the gzip recipe; returns (payload, data)."""
    import zlib

    dlen = doc_id % 37 + 12
    cap = doc_id % 5 + 7
    data = text.ljust(49)[:dlen].encode()
    has_extra, has_name, has_comment = (
        doc_id % 2 == 0,
        doc_id % 3 != 0,
        doc_id % 5 == 0,
    )
    flg = 4 * has_extra + 8 * has_name + 16 * has_comment
    mtime = (doc_id * 37) % 2**31
    out = bytes([0x1F, 0x8B, 8, flg]) + mtime.to_bytes(4, "little")
    out += bytes([0, 255])
    if has_extra:
        xlen = doc_id % 7 + 4
        out += xlen.to_bytes(2, "little") + b"\xab" * xlen
    if has_name:
        out += f"doc{doc_id}.txt".encode() + b"\x00"
    if has_comment:
        out += b"c" * (doc_id % 6 + 1) + b"\x00"
    for i in range(0, dlen, cap):
        chunk = data[i : i + cap]
        final = i + len(chunk) == dlen
        out += bytes([int(final)])
        out += len(chunk).to_bytes(2, "little")
        out += (65535 - len(chunk)).to_bytes(2, "little")
        out += chunk
    out += zlib.crc32(data).to_bytes(4, "little")
    out += (dlen % 2**32).to_bytes(4, "little")
    return out, data


def test_gzip_codec_decompresses_with_stdlib(spark, sf_dir):
    """The recipe's bytes ARE valid gzip: Python's gzip module (a third
    implementation) decompresses the independent rebuild to the source
    data; the query's parsed fields match an independent Python walker
    over the same bytes."""
    import gzip as gz

    rows = (
        REGISTRY["multimodal_gzip_member_parse"].fn(spark, sf_dir).collect()
    )
    docs = dict(
        _duck(sf_dir, "SELECT doc_id, text FROM '$SF/documents.parquet'")
    )
    assert len(rows) == len(docs)
    for r in rows:
        payload, data = _gzip_build_python(r["doc_id"], docs[r["doc_id"]])
        assert gz.decompress(payload) == data
        # independent walker
        flg = payload[3]
        off = 10
        xlen = 0
        if flg & 4:
            xlen = int.from_bytes(payload[10:12], "little")
            off = 12 + xlen
        fname = ""
        if flg & 8:
            end = payload.index(0, off)
            fname = payload[off:end].decode()
            off = end + 1
        clen = 0
        if flg & 16:
            end = payload.index(0, off)
            clen = end - off
            off = end + 1
        n_blocks = 0
        raw = b""
        while True:
            hdr = payload[off]
            blen = int.from_bytes(payload[off + 1 : off + 3], "little")
            nlen = int.from_bytes(payload[off + 3 : off + 5], "little")
            assert blen + nlen == 65535
            raw += payload[off + 5 : off + 5 + blen]
            off += 5 + blen
            n_blocks += 1
            if hdr & 1:
                break
        assert r["magic_ok"] and r["method_ok"]
        assert r["flg"] == flg
        assert r["xlen"] == xlen
        assert r["fname"] == fname
        assert r["comment_len"] == clen
        assert r["n_blocks"] == n_blocks
        assert r["sum_len"] == len(raw) == len(data)
        assert r["nlen_ok"] and r["chain_complete"]
        assert r["crc_ok"] and r["isize_ok"] and r["data_ok"]
        assert r["total_len"] == len(payload) == off + 8


def test_midi_codec_matches_python_walker(spark, sf_dir):
    """The query's chunk walk and varint decode match an independent
    Python SMF walker (real continuation-bit varint decoder) over
    independently rebuilt bytes."""
    rows = (
        REGISTRY["multimodal_midi_track_walk"].fn(spark, sf_dir).collect()
    )
    for r in rows:
        doc_id = r["doc_id"]
        ntrks = doc_id % 4 + 1
        payload = b"MThd" + (6).to_bytes(4, "big")
        payload += (1).to_bytes(2, "big") + ntrks.to_bytes(2, "big")
        payload += (480).to_bytes(2, "big")
        deltas = []
        for t in range(1, ntrks + 1):
            delta = (doc_id * 31 + t * 97) % 2**21
            deltas.append(delta)
            # big-end-first 7-bit varint
            groups = []
            v = delta
            while True:
                groups.append(v & 127)
                v >>= 7
                if v == 0:
                    break
            body = bytes(
                g | 128 for g in reversed(groups[1:])
            ) + bytes([groups[0]])
            body += bytes.fromhex("903C64") + bytes.fromhex("00FF2F00")
            payload += b"MTrk" + len(body).to_bytes(4, "big") + body
        # independent walk
        assert payload[:4] == b"MThd"
        off = 14
        walked = 0
        first_delta = None
        sum_deltas = 0
        while off < len(payload):
            assert payload[off : off + 4] == b"MTrk"
            blen = int.from_bytes(payload[off + 4 : off + 8], "big")
            # real varint decode
            v, i = 0, off + 8
            while True:
                b = payload[i]
                v = (v << 7) | (b & 127)
                i += 1
                if not (b & 128):
                    break
            if first_delta is None:
                first_delta = v
            sum_deltas += v
            assert payload[off + 8 + blen - 4 : off + 8 + blen] == (
                bytes.fromhex("00FF2F00")
            )
            off += 8 + blen
            walked += 1
        assert r["mthd_ok"] and r["sigs_ok"] and r["eot_ok"]
        assert (r["hdr_len"], r["fmt"], r["division"]) == (6, 1, 480)
        assert r["ntrks"] == r["tracks_walked"] == walked == ntrks
        assert r["first_delta"] == first_delta == deltas[0]
        assert r["sum_deltas"] == sum_deltas == sum(deltas)
        assert r["total_len"] == len(payload) and r["length_ok"]


def test_cramer_von_mises_matches_pure_python(spark, sf_dir):
    """U and T match a naive midrank computation (sorted lists + own
    indices), independently of the closed-form tie-block collapse."""
    row = REGISTRY["q_cramer_von_mises"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_totalprice, o_orderpriority IN ('1-URGENT','2-HIGH') "
        "FROM '$SF/orders.parquet'",
    )
    ranks = _midranks([v for v, _ in vals])
    hi = sorted(v for v, h in vals if h)
    lo = sorted(v for v, h in vals if not h)
    n, m = len(hi), len(lo)
    s1 = sum((ranks[v] - (i + 1)) ** 2 for i, v in enumerate(hi))
    s2 = sum((ranks[v] - (j + 1)) ** 2 for j, v in enumerate(lo))
    u = n * s1 + m * s2
    t = u / (n * m * (n + m)) - (4 * m * n - 1) / (6 * (m + n))
    assert (row["n"], row["m"]) == (n, m)
    assert math.isclose(row["u_stat"], u, rel_tol=1e-12)
    assert math.isclose(row["t_cvm"], t, rel_tol=1e-9)


def test_jonckheere_matches_brute_force(spark, sf_dir):
    """2*JT equals the brute-force sum of pairwise dominance counts
    over the ordered group pairs; mean/z match the textbook null
    moments."""
    row = REGISTRY["q_jonckheere_terpstra"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_totalprice, o_orderpriority FROM '$SF/orders.parquet'",
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    groups = {p: sorted(v for v, g in vals if g == p) for p in prios}
    import bisect

    jt2 = 0
    for gi in range(5):
        for hi_ in range(gi + 1, 5):
            a, b = groups[prios[gi]], groups[prios[hi_]]
            for x in b:
                lt = bisect.bisect_left(a, x)
                eq = bisect.bisect_right(a, x) - lt
                jt2 += 2 * lt + eq
    n = len(vals)
    ns = [len(groups[p]) for p in prios]
    mean = (n * n - sum(x * x for x in ns)) / 4
    var = (
        n * n * (2 * n + 3) - sum(x * x * (2 * x + 3) for x in ns)
    ) / 72
    assert row["jt_x2"] == jt2
    assert row["n"] == n
    assert math.isclose(row["jt_mean"], mean, rel_tol=1e-12)
    assert math.isclose(
        row["z_jt"], (jt2 / 2 - mean) / math.sqrt(var), rel_tol=1e-9
    )


def test_hurst_rs_matches_pure_python(spark, sf_dir):
    """Per-(type, scale) block counts and average R/S match a direct
    recomputation over the zero-filled hourly series."""
    from real_value_etl_spark.queries.events_queries import HURST_SCALES

    rows = {
        (r["event_type"], r["scale"]): r
        for r in REGISTRY["events_hurst_rs"].fn(spark, sf_dir).collect()
    }
    hc = _duck(
        sf_dir,
        """SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT),
                  COUNT(*) FROM '$SF/events.parquet' GROUP BY 1, 2""",
    )
    series = {}
    for et, h, c in hc:
        series.setdefault(et, {})[h] = c
    for et, hmap in series.items():
        lo, hi = min(hmap), max(hmap)
        xs = [hmap.get(h, 0) for h in range(lo, hi + 1, 3600)]
        for scale in HURST_SCALES:
            rs_vals = []
            for b0 in range(0, len(xs) - scale + 1, scale):
                blk = xs[b0 : b0 + scale]
                if len(blk) < scale:
                    continue
                s1 = sum(blk)
                s2 = sum(x * x for x in blk)
                var_num = scale * s2 - s1 * s1
                if var_num <= 0:
                    continue
                ys, acc = [], 0
                for x in blk:
                    acc += scale * x - s1
                    ys.append(acc)
                r_scaled = max(ys) - min(ys)
                rs_vals.append(r_scaled / math.sqrt(var_num))
            key = (et, scale)
            if not rs_vals:
                assert key not in rows
                continue
            r = rows[key]
            assert r["n_blocks"] == len(rs_vals)
            assert math.isclose(
                r["avg_rs"], sum(rs_vals) / len(rs_vals), rel_tol=1e-9
            )


def test_elf_codec_matches_python_walker(spark, sf_dir):
    """The query's two-level name chase and section walk match an
    independent Python ELF64 walker over independently rebuilt bytes."""
    rows = (
        REGISTRY["multimodal_elf_section_walk"].fn(spark, sf_dir).collect()
    )
    docs = dict(
        _duck(sf_dir, "SELECT doc_id, text FROM '$SF/documents.parquet'")
    )
    for r in rows:
        doc_id = r["doc_id"]
        text = docs[doc_id].ljust(80)[:80]
        k = doc_id % 3 + 1
        sizes = [(doc_id + i * 7) % 19 + 5 for i in range(1, k + 1)]
        strtab = b"\x00"
        name_offs = []
        for i in range(1, k + 1):
            name_offs.append(len(strtab))
            strtab += f".s{i}".encode() + b"\x00"
        sh_name_str = len(strtab)
        strtab += b".shstrtab\x00"
        blobs, offs, consumed = b"", [], 0
        for sz in sizes:
            offs.append(64 + len(strtab) + len(blobs))
            blobs += text[consumed : consumed + sz].encode()
            consumed += sz
        shoff = 64 + len(strtab) + len(blobs)
        entry = (doc_id * 4096) % 2**32 + 0x400000

        def ent(nm, ty, off, sz):
            return (
                nm.to_bytes(4, "little") + ty.to_bytes(4, "little")
                + b"\x00" * 16 + off.to_bytes(8, "little")
                + sz.to_bytes(8, "little") + b"\x00" * 8
                + (1).to_bytes(8, "little") + b"\x00" * 8
            )

        sht = b"\x00" * 64
        for i in range(k):
            sht += ent(name_offs[i], 1, offs[i], sizes[i])
        sht += ent(sh_name_str, 3, 64, len(strtab))
        ehdr = bytes.fromhex("7F454C46020101") + b"\x00" * 9
        ehdr += (2).to_bytes(2, "little") + (62).to_bytes(2, "little")
        ehdr += (1).to_bytes(4, "little") + entry.to_bytes(8, "little")
        ehdr += b"\x00" * 8 + shoff.to_bytes(8, "little")
        ehdr += b"\x00" * 4 + (64).to_bytes(2, "little") + b"\x00" * 4
        ehdr += (64).to_bytes(2, "little")
        ehdr += (k + 2).to_bytes(2, "little")
        ehdr += (k + 1).to_bytes(2, "little")
        payload = ehdr + strtab + blobs + sht
        # independent walker
        assert payload[:4] == b"\x7fELF"
        shoff_p = int.from_bytes(payload[40:48], "little")
        shnum_p = int.from_bytes(payload[60:62], "little")
        ndx = int.from_bytes(payload[62:64], "little")
        se = shoff_p + ndx * 64
        stroff = int.from_bytes(payload[se + 24 : se + 32], "little")
        strsz = int.from_bytes(payload[se + 32 : se + 40], "little")
        names = []
        sum_sz = 0
        for i in range(1, shnum_p):
            e0 = shoff_p + i * 64
            nm = int.from_bytes(payload[e0 : e0 + 4], "little")
            ty = int.from_bytes(payload[e0 + 4 : e0 + 8], "little")
            off = int.from_bytes(payload[e0 + 24 : e0 + 32], "little")
            sz = int.from_bytes(payload[e0 + 32 : e0 + 40], "little")
            end = payload.index(0, stroff + nm)
            names.append(payload[stroff + nm : end].decode())
            if ty == 1:
                sum_sz += sz
                assert payload[off : off + sz] in text.encode()
        assert r["magic_ok"] and r["class64_ok"] and r["le_ok"]
        assert (r["e_type"], r["e_machine"], r["e_entry"]) == (
            2, 62, entry,
        )
        assert r["shnum"] == shnum_p == k + 2
        assert r["shstrndx"] == ndx == k + 1
        assert r["section_names"] == ",".join(names)
        assert r["sum_data_sizes"] == sum_sz == sum(sizes)
        assert r["strtab_size"] == strsz == len(strtab)
        assert r["null_entry_ok"] and r["strtab_type_ok"]
        assert r["contiguous_ok"] and r["data_ok"]
        assert r["total_len"] == len(payload)


def test_ams_f2_state_batching_independent_and_exact(spark, sf_dir):
    """The AMS kernel lands the same counters whether fed one batch or
    many (pure addition), and the query's drained sketch equals a
    hashlib replay of the signed sums; estimate = mean z^2."""
    import hashlib

    import pandas as pd

    from real_value_etl_spark.streaming import jobs

    def sgn(r, u):
        h = int(hashlib.md5(f"{r}#{u}".encode()).hexdigest()[:8], 16)
        return 1 - 2 * (h % 2)

    class FakeState:
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

    rows = [(i % jobs.AMS_R, 1 if i % 3 else -1) for i in range(60)]

    def run(batches):
        st = FakeState()
        for b in batches:
            pdf = pd.DataFrame(
                {"r": [r for r, _ in b], "sgn": [s for _, s in b]}
            )
            list(jobs._ams_state(("click",), iter([pdf]), st))
        return st._v[0]

    one = run([rows])
    two = run([rows[:17], rows[17:]])
    assert one == two

    # full-query cross-check vs hashlib
    got = {
        r["event_type"]: r
        for r in REGISTRY["stream_ams_f2"].fn(spark, sf_dir).collect()
    }
    cnt = {}
    for et, u, c in _duck(
        sf_dir,
        "SELECT event_type, user_id, COUNT(*) FROM '$SF/events.parquet' "
        "GROUP BY 1, 2",
    ):
        cnt.setdefault(et, {})[u] = c
    for et, users in cnt.items():
        zz = 0
        for r_ in range(jobs.AMS_R):
            z = sum(sgn(r_, u) * c for u, c in users.items())
            zz += z * z
        f2 = sum(c * c for c in users.values())
        row = got[et]
        assert row["rows_r"] == jobs.AMS_R
        assert row["sum_z2"] == zz
        assert row["f2_exact"] == f2
        assert math.isclose(row["f2_est"], zz / jobs.AMS_R, rel_tol=1e-12)


def test_ordinal_patterns_matches_pure_python(spark, sf_dir):
    """Pattern census equals a direct Python triple scan; impossible
    codes (1, 6) never occur; shares sum to 1 per type."""
    rows = REGISTRY["events_ordinal_patterns"].fn(spark, sf_dir).collect()
    hc = _duck(
        sf_dir,
        """SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT),
                  COUNT(*) FROM '$SF/events.parquet' GROUP BY 1, 2""",
    )
    series = {}
    for et, h, c in hc:
        series.setdefault(et, {})[h] = c
    want = {}
    for et, hmap in series.items():
        lo, hi = min(hmap), max(hmap)
        xs = [hmap.get(h, 0) for h in range(lo, hi + 1, 3600)]
        for i in range(len(xs) - 2):
            a, b, c = xs[i], xs[i + 1], xs[i + 2]
            code = 4 * (a > b) + 2 * (b > c) + (a > c)
            want[(et, code)] = want.get((et, code), 0) + 1
    got = {(r["event_type"], r["code"]): r["cnt"] for r in rows}
    assert got == want
    assert all(code not in (1, 6) for _, code in got)
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], 0.0)
        by_type[r["event_type"]] += r["share"]
    assert all(math.isclose(s, 1.0, rel_tol=1e-9) for s in by_type.values())


def test_extreme_studentized_matches_pure_python(spark, sf_dir):
    """G and the witness match a direct scan over cent-exact prices."""
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["q_extreme_studentized"].fn(spark, sf_dir).collect()
    }
    vals = _duck(
        sf_dir,
        "SELECT l_returnflag, l_orderkey, "
        "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT) "
        "FROM '$SF/lineitem.parquet'",
    )
    by = {}
    for g, k, x in vals:
        by.setdefault(g, []).append((k, x))
    for g, kx in by.items():
        n = len(kx)
        s1 = sum(x for _, x in kx)
        s2 = sum(x * x for _, x in kx)
        best = max(kx, key=lambda t: (abs(n * t[1] - s1), -t[0]))
        sd = math.sqrt((n * s2 - s1 * s1) / (n * n))
        gstat = abs(n * best[1] - s1) / n / sd
        r = rows[g]
        assert r["n"] == n
        assert r["witness_orderkey"] == best[0]
        assert math.isclose(r["witness_price"], best[1] / 100.0, rel_tol=1e-12)
        assert math.isclose(r["g_stat"], gstat, rel_tol=1e-9)


def _km_subjects(sf_dir):
    """Independent subject construction: (cohort, evt, duration_h)."""
    rows = _duck(
        sf_dir,
        """SELECT user_id, ts, event_type FROM '$SF/events.parquet'""",
    )
    tmax = max(ts for _, ts, _ in rows)
    first_signup = {}
    for u, ts, et in rows:
        if et == "signup" and (u not in first_signup or ts < first_signup[u]):
            first_signup[u] = ts
    first_purchase = {}
    for u, ts, et in rows:
        t0 = first_signup.get(u)
        if (
            et == "purchase"
            and t0 is not None
            and t0 < ts <= t0 + __import__("datetime").timedelta(hours=168)
        ):
            if u not in first_purchase or ts < first_purchase[u]:
                first_purchase[u] = ts
    subj = []
    for u, t0 in first_signup.items():
        cohort = "am" if t0.hour < 12 else "pm"
        if u in first_purchase:
            dur = int((first_purchase[u] - t0).total_seconds() // 3600)
            subj.append((cohort, 1, dur))
        else:
            dur = min(168, int((tmax - t0).total_seconds() // 3600))
            subj.append((cohort, 0, dur))
    return subj


def test_kaplan_meier_matches_pure_python(spark, sf_dir):
    """Risk sets, hazards, and the survival product match a from-scratch
    KM walk with the deaths-before-censors convention."""
    rows = REGISTRY["events_kaplan_meier"].fn(spark, sf_dir).collect()
    subj = _km_subjects(sf_dir)
    times = sorted({d for _, _, d in subj})
    n_risk = len(subj)
    surv = 1.0
    want = {}
    for t in times:
        d = sum(1 for _, e, dd in subj if e == 1 and dd == t)
        c = sum(1 for _, e, dd in subj if e == 0 and dd == t)
        if d > 0:
            surv *= 1.0 - d / n_risk
            want[t] = (d, c, n_risk, d / n_risk, surv)
        else:
            # no-event times still shrink the risk set but emit no step;
            # the query's fold multiplies a factor of exactly 1.0 there
            pass
        n_risk -= d + c
    got = {r["duration_h"]: r for r in rows}
    assert set(got) == set(want)
    for t, (d, c, nr, hz, sv) in want.items():
        r = got[t]
        assert (r["n_events"], r["n_censored"], r["n_risk"]) == (d, c, nr)
        assert math.isclose(r["hazard"], hz, rel_tol=1e-12)
        assert math.isclose(r["survival"], sv, rel_tol=1e-9)
    # survival is nonincreasing and within (0, 1]
    sv = [r["survival"] for r in sorted(rows, key=lambda r: r["duration_h"])]
    assert all(a >= b for a, b in zip(sv, sv[1:]))
    assert all(0.0 <= x <= 1.0 for x in sv)


def test_logrank_matches_pure_python(spark, sf_dir):
    """O/E/V/z match a from-scratch log-rank walk over pooled event
    times."""
    row = REGISTRY["events_logrank_test"].fn(spark, sf_dir).collect()[0]
    subj = _km_subjects(sf_dir)
    n1 = sum(1 for g, _, _ in subj if g == "am")
    n2 = len(subj) - n1
    times = sorted({d for _, _, d in subj})
    r1, r2 = n1, n2
    o1 = 0
    e1 = 0.0
    v = 0.0
    for t in times:
        d1 = sum(1 for g, e, dd in subj if g == "am" and e and dd == t)
        d2 = sum(1 for g, e, dd in subj if g == "pm" and e and dd == t)
        out1 = sum(1 for g, _, dd in subj if g == "am" and dd == t)
        out2 = sum(1 for g, _, dd in subj if g == "pm" and dd == t)
        d, n = d1 + d2, r1 + r2
        if d > 0 and n > 1:
            o1 += d1
            e1 += d * r1 / n
            v += d * (r1 / n) * (r2 / n) * (n - d) / (n - 1)
        r1 -= out1
        r2 -= out2
    assert (row["n_am"], row["n_pm"]) == (n1, n2)
    assert row["observed_am"] == o1
    assert math.isclose(row["expected_am"], e1, rel_tol=1e-9)
    assert math.isclose(row["variance"], v, rel_tol=1e-9)
    assert math.isclose(
        row["z_logrank"], (o1 - e1) / math.sqrt(v), rel_tol=1e-9
    )


def test_webp_codec_matches_python_walker(spark, sf_dir):
    """Bit fields and RIFF geometry match an independent Python rebuild
    + bit-twiddling walker."""
    rows = (
        REGISTRY["multimodal_webp_vp8l_parse"].fn(spark, sf_dir).collect()
    )
    for r in rows:
        doc_id = r["doc_id"]
        w = (doc_id * 2654435761) % 16384 + 1
        h = (doc_id * 40503) % 16384 + 1
        alpha = doc_id % 2
        fill = doc_id % 23 + 4
        chunk_size = 5 + fill
        packed = (w - 1) | ((h - 1) << 14) | (alpha << 28)
        body = b"\x2f" + packed.to_bytes(4, "little") + b"\x5a" * fill
        chunk = b"VP8L" + chunk_size.to_bytes(4, "little") + body
        if chunk_size % 2:
            chunk += b"\x00"
        payload = (
            b"RIFF"
            + (4 + len(chunk)).to_bytes(4, "little")
            + b"WEBP"
            + chunk
        )
        u32 = int.from_bytes(payload[21:25], "little")
        assert r["riff_ok"] and r["webp_ok"] and r["vp8l_ok"] and r["sig_ok"]
        assert r["width"] == (u32 & 0x3FFF) + 1 == w
        assert r["height"] == ((u32 >> 14) & 0x3FFF) + 1 == h
        assert r["alpha_hint"] == (u32 >> 28 & 1) == alpha
        assert r["version"] == (u32 >> 29) == 0
        assert r["chunk_size"] == chunk_size
        assert r["padded"] == bool(chunk_size % 2)
        assert r["riff_size_ok"]
        assert r["total_len"] == len(payload) == 20 + chunk_size + (
            chunk_size % 2
        )


def test_anova_matches_pure_python(spark, sf_dir):
    """SS_between / SS_within / F match the definitional group-mean
    decomposition over exact cents."""
    row = REGISTRY["q_anova_oneway"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_orderpriority, "
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) "
        "FROM '$SF/orders.parquet'",
    )
    by = {}
    for g, x in vals:
        by.setdefault(g, []).append(x)
    n = len(vals)
    grand = sum(x for _, x in vals) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2 for xs in by.values())
    ssw = sum(
        sum((x - sum(xs) / len(xs)) ** 2 for x in xs) for xs in by.values()
    )
    f = (ssb / 4) / (ssw / (n - 5))
    assert row["n"] == n
    assert math.isclose(row["ss_between"], ssb / 1e4, rel_tol=1e-9)
    assert math.isclose(row["ss_within"], ssw / 1e4, rel_tol=1e-9)
    assert math.isclose(row["f_stat"], f, rel_tol=1e-9)


def test_levene_matches_pure_python(spark, sf_dir):
    """W matches the Brown-Forsythe statistic with exact per-group
    medians (statistics.median on ints gives the same half-integer)."""
    import statistics

    row = REGISTRY["q_levene_test"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_orderpriority, "
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) "
        "FROM '$SF/orders.parquet'",
    )
    by = {}
    for g, x in vals:
        by.setdefault(g, []).append(x)
    z_by = {
        g: [abs(2 * x - round(2 * statistics.median(xs))) for x in xs]
        for g, xs in by.items()
    }
    n = sum(len(z) for z in z_by.values())
    grand = sum(sum(z) for z in z_by.values()) / n
    ssb = sum(
        len(z) * (sum(z) / len(z) - grand) ** 2 for z in z_by.values()
    )
    ssw = sum(
        sum((v - sum(z) / len(z)) ** 2 for v in z) for z in z_by.values()
    )
    w = (ssb / 4) / (ssw / (n - 5))
    assert row["n"] == n
    assert math.isclose(row["w_stat"], w, rel_tol=1e-9)


def test_ebml_codec_matches_python_walker(spark, sf_dir):
    """The CLZ vint walk matches an independent Python EBML decoder
    over independently rebuilt bytes, non-minimal widths included."""
    rows = (
        REGISTRY["multimodal_ebml_vint_walk"].fn(spark, sf_dir).collect()
    )
    for r in rows:
        doc_id = r["doc_id"]
        nc = doc_id % 3 + 2
        mw = doc_id % 2 + 2

        def vint(v, w):
            out = bytearray(w)
            out[0] = (0x80 >> (w - 1)) | (v >> (8 * (w - 1)))
            for i in range(1, w):
                out[i] = (v >> (8 * (w - 1 - i))) & 255
            return bytes(out)

        body = b""
        nonmin = 0
        for k in range(1, nc + 1):
            wk = (doc_id + k) % 3 + 1
            sk = (doc_id * 7 + k * 13) % 100 + 5
            if wk > 1 and sk < 127:
                nonmin += 1
            body += bytes([0x80 + k]) + vint(sk, wk)
            body += bytes([0x40 + k]) * sk
        payload = bytes.fromhex("1A45DFA3") + vint(len(body), mw) + body

        # independent decoder
        def rd_vint(buf, pos):
            b0 = buf[pos]
            w = 1 if b0 >= 128 else 2 if b0 >= 64 else 3 if b0 >= 32 else 4
            v = b0 - (0x80 >> (w - 1))
            for i in range(1, w):
                v = v * 256 + buf[pos + i]
            return v, w

        assert payload[:4] == bytes.fromhex("1A45DFA3")
        msize, mwidth = rd_vint(payload, 4)
        off = 4 + mwidth
        kids, sizes = 0, 0
        while off < 4 + mwidth + msize:
            assert payload[off] >= 128
            sz, w = rd_vint(payload, off + 1)
            off += 1 + w + sz
            kids += 1
            sizes += sz
        assert r["master_id_ok"] and r["ids_ok"] and r["body_consistent"]
        assert r["master_size"] == msize == len(body)
        assert r["master_size_width"] == mwidth == mw
        assert r["n_children"] == kids == nc
        assert r["sum_child_sizes"] == sizes
        assert r["nonminimal_vints"] == nonmin
        assert r["total_len"] == len(payload)


def test_rouge2_matches_pure_python(spark, sf_dir):
    """Multiset bigram overlap, P/R/F1 match a Counter recomputation
    over the same qualifying pair set (exact Jaccard >= 0.5)."""
    from collections import Counter

    rows = REGISTRY["docs_rouge2_pairs"].fn(spark, sf_dir).collect()
    docs = dict(
        _duck(sf_dir, "SELECT doc_id, text FROM '$SF/documents.parquet'")
    )
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in docs.items()}
    sh = {
        d: {
            " ".join(ts[i : i + 3])
            for i in range(len(ts) - 2)
        }
        for d, ts in toks.items()
    }
    bg = {
        d: Counter(
            " ".join(ts[i : i + 2]) for i in range(len(ts) - 1)
        )
        for d, ts in toks.items()
    }
    want_pairs = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                want_pairs.add((a, b))
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    # every truly-qualifying pair with nonzero bigram overlap appears
    for a, b in want_pairs:
        ov = sum((bg[a] & bg[b]).values())
        if ov == 0:
            assert (a, b) not in got  # inner join drops zero-overlap
            continue
        r = got[(a, b)]
        na, nb = sum(bg[a].values()), sum(bg[b].values())
        assert r["bigram_overlap"] == ov
        assert (r["n_bigrams_a"], r["n_bigrams_b"]) == (na, nb)
        assert math.isclose(r["rouge2_p"], ov / na, rel_tol=1e-12)
        assert math.isclose(r["rouge2_r"], ov / nb, rel_tol=1e-12)
        assert math.isclose(
            r["rouge2_f"], 2 * ov / (na + nb), rel_tol=1e-12
        )
    assert set(got) <= want_pairs


def test_interevent_burstiness_matches_pure_python(spark, sf_dir):
    """Top-k B statistics match a from-scratch gap scan with the
    (ts, event_id) tie order."""
    rows = (
        REGISTRY["events_interevent_burstiness"].fn(spark, sf_dir).collect()
    )
    ev = _duck(
        sf_dir,
        "SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT), event_id "
        "FROM '$SF/events.parquet' ORDER BY user_id, ts, event_id",
    )
    by = {}
    for u, t, _ in ev:
        by.setdefault(u, []).append(t)
    stats = []
    for u, ts in by.items():
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if len(gaps) < 5:
            continue
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        sq = math.sqrt(n * s2 - s1 * s1)
        stats.append((u, n, s1 / n, (sq - s1) / (sq + s1)))
    stats.sort(key=lambda t: (-t[3], t[0]))
    want = stats[:20]
    assert len(rows) == min(20, len(stats))
    for r, (u, n, mg, b) in zip(rows, want):
        assert (r["user_id"], r["n_gaps"]) == (u, n)
        assert math.isclose(r["mean_gap_s"], mg, rel_tol=1e-12)
        assert math.isclose(r["b_stat"], b, rel_tol=1e-9)


def test_permutation_test_matches_pure_python(spark, sf_dir):
    """Observed diff, the hash-relabeled null distribution, and z match
    a hashlib recomputation."""
    import hashlib

    row = REGISTRY["q_permutation_test"].fn(spark, sf_dir).collect()[0]
    vals = _duck(
        sf_dir,
        "SELECT o_orderkey, "
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT), "
        "o_orderpriority IN ('1-URGENT','2-HIGH') "
        "FROM '$SF/orders.parquet'",
    )
    st = sum(x for _, x, _ in vals)
    nt = len(vals)
    s_hi = sum(x for _, x, h in vals if h)
    n_hi = sum(1 for _, _, h in vals if h)
    d_obs = s_hi / n_hi - (st - s_hi) / (nt - n_hi)
    dks = []
    for k in range(1, 33):
        s0 = n0 = 0
        for key, x, _ in vals:
            h = int(
                hashlib.md5(f"{k}|{key}".encode()).hexdigest()[:8], 16
            )
            if h % 2 == 0:
                s0 += x
                n0 += 1
        dks.append(s0 / n0 - (st - s0) / (nt - n0))
    nm = sum(dks) / 32
    sd = math.sqrt(sum(d * d for d in dks) / 32 - nm * nm)
    assert (row["n_hi"], row["n_lo"]) == (n_hi, nt - n_hi)
    assert math.isclose(row["d_obs_dollars"], d_obs / 100, rel_tol=1e-9)
    assert math.isclose(
        row["null_mean_dollars"], nm / 100, rel_tol=1e-6
    )
    assert math.isclose(row["null_sd_dollars"], sd / 100, rel_tol=1e-6)
    assert math.isclose(
        row["z_perm"], (d_obs - nm) / sd, rel_tol=1e-6
    )


def test_bson_codec_matches_python_walker(spark, sf_dir):
    """Type-tag dispatch walk matches an independent Python BSON
    decoder over independently rebuilt bytes (rotated element order)."""
    rows = (
        REGISTRY["multimodal_bson_doc_walk"].fn(spark, sf_dir).collect()
    )
    for r in rows:
        doc_id = r["doc_id"]
        rot = doc_id % 4

        def elem(ty, name, value):
            return bytes([ty]) + name.encode() + b"\x00" + value

        name_val = f"doc{doc_id}".encode()
        elems = [
            elem(0x12, "id", (doc_id * 7).to_bytes(8, "little")),
            elem(0x08, "flag", bytes([doc_id % 2])),
            elem(
                0x02,
                "name",
                (len(name_val) + 1).to_bytes(4, "little")
                + name_val
                + b"\x00",
            ),
            elem(0x10, "n", (doc_id % 1000).to_bytes(4, "little")),
        ]
        body = b"".join(elems[(rot + i) % 4] for i in range(4))
        total = 4 + len(body) + 1
        payload = total.to_bytes(4, "little") + body + b"\x00"
        # independent walker
        assert int.from_bytes(payload[:4], "little") == total == len(payload)
        off = 4
        got = {}
        while payload[off] != 0:
            ty = payload[off]
            end = payload.index(0, off + 1)
            nm = payload[off + 1 : end].decode()
            vp = end + 1
            if ty == 0x12:
                got[nm] = int.from_bytes(payload[vp : vp + 8], "little")
                vp += 8
            elif ty == 0x08:
                got[nm] = bool(payload[vp])
                vp += 1
            elif ty == 0x10:
                got[nm] = int.from_bytes(payload[vp : vp + 4], "little")
                vp += 4
            else:
                sl = int.from_bytes(payload[vp : vp + 4], "little")
                got[nm] = payload[vp + 4 : vp + 4 + sl - 1].decode()
                vp += 4 + sl
            off = vp
        assert off == total - 1
        assert r["total_len"] == total and r["len_ok"]
        assert r["terminator_ok"] and r["n_elements"] == 4
        assert r["id_parsed"] == got["id"] == doc_id * 7
        assert r["flag_parsed"] == got["flag"] == bool(doc_id % 2)
        assert r["name_parsed"] == got["name"] == f"doc{doc_id}"
        assert r["n_parsed"] == got["n"] == doc_id % 1000
        assert r["rot"] == rot


def test_jt_packing_guard_fires(spark):
    """The Jonckheere packing-bound guard raises loudly when any group
    exceeds the packed-field capacity (same doctrine as the Kadane
    guard: a silent overflow would corrupt BOTH engines identically)."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        *[F.lit(v).alias(f"n{i}") for i, v in enumerate(
            [5, 12, 3, 1, 2], 1
        )]
    )
    guard = F.expr(
        "CASE WHEN greatest(n1, n2, n3, n4, n5) >= 10 THEN "
        "CAST(raise_error('packing bound exceeded') AS BIGINT) "
        "ELSE 0 END"
    )
    with pytest.raises(Exception, match="packing bound exceeded"):
        df.select(guard.alias("g")).collect()
    ok = spark.range(1).select(
        *[F.lit(v).alias(f"n{i}") for i, v in enumerate(
            [5, 9, 3, 1, 2], 1
        )]
    )
    assert ok.select(guard.alias("g")).collect()[0]["g"] == 0
