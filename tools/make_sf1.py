"""Build a local sf1 cost-scaling fixture (10x sf0.1) for the bench's
scale rehearsal (VERDICT r4 ask #3).

The driver provides sf0.1 as the largest testdata; the 100 TB design
claims are argued from plan shape. One measured decade of scaling makes
them empirical, so this tool synthesizes a 10x corpus for the three
tables the heavyweight headline queries read, with transformations chosen
so PER-TILE structure is preserved EXACTLY and CROSS-TILE similarity
drops to the background level — i.e. output sizes and candidate-pair
densities scale linearly, the way a naturally 10x corpus would, instead
of exploding quadratically the way naive row duplication would:

- documents: 10 tiles; tile t rewrites every word w -> "w_t{t}" — a
  bijective renaming into a tile-private vocabulary. Within a tile every
  content-based similarity (jaccard, shingles, tf-idf cosine, BPE
  statistics) is preserved bit-for-bit; across tiles similarity is
  exactly zero and, crucially, the shingle SPACE grows 10x with the
  corpus — the Heaps'-law behavior of a naturally 10x corpus. (A first
  cut used a vocabulary PERMUTATION per tile instead; that keeps the
  word vocabulary CLOSED, so at 10x the 3-shingle space saturates —
  median shingle df jumped 9 -> 88 — which models a pathological
  corpus, not a bigger one: posting lists lengthen ~10x and every
  posting-list-join cost grows ~100x. Disjoint vocabularies keep
  per-shingle df distributions identical to sf0.1, so candidate counts
  scale linearly, matching open-vocabulary reality.)
- embeddings: 10 tiles; tile t applies a tile-seeded random ORTHOGONAL
  rotation (QR of a seeded Gaussian). Rotations preserve all intra-tile
  distances/cosines exactly (kNN structure per tile = sf0.1) and
  decorrelate tiles.
- lineitem: 10 tiles with orderkey/partkey/suppkey shifted per tile —
  ten disjoint copies of the purchase graph: node count 10x, degree
  distribution unchanged, exactly how a 10x-supplier world looks to
  PageRank.

The remaining seven tables are copied unscaled (no heavy query reads
them; they keep the directory loadable by any registry query).

Deterministic (fixed seeds), cached behind a marker file. Output lives
under the repo (gitignored) so the fixture survives until the driver's
bench run.
"""

from __future__ import annotations

import os
import shutil

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(_REPO, ".bench_sf1")
TILES = 10
# key strides: one above the sf0.1 maxima (orderkey 149_999, partkey
# 19_999, suppkey 999, doc_id/vec_id < 10_000)
ORDER_STRIDE = 150_000
PART_STRIDE = 20_000
SUPP_STRIDE = 1_000
ID_STRIDE = 10_000

UNSCALED = ("region", "nation", "customer", "supplier", "part", "orders")
USER_STRIDE = 2_000  # above the sf0.1 max user_id (1500)
EVENT_ID_STRIDE = 1_000_000  # above the sf0.1 max event_id


def _build_events(dst: str, tiles: int) -> None:
    """10x events: ids and users shifted per tile, timestamps kept — ten
    disjoint user populations over the same wall-clock span, so per-user
    timelines (session structure, per-key window sizes) are EXACTLY the
    sf0.1 ones and event-time operators see linear growth."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute(
        f"""
        COPY (
          SELECT event_id + t.t * {EVENT_ID_STRIDE} AS event_id,
                 ts,
                 user_id + t.t * {USER_STRIDE} AS user_id,
                 event_type, value, props
          FROM '{SRC}/events.parquet', range({tiles}) t(t)
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def _build_documents(dst: str, tiles: int) -> None:
    import pandas as pd

    df = pd.read_parquet(f"{SRC}/documents.parquet")
    parts = []
    for t in range(tiles):
        tile = df.copy()
        tile["doc_id"] = tile["doc_id"] + t * ID_STRIDE
        if t > 0:
            suffix = f"_t{t}"
            tile["text"] = [
                " ".join(w + suffix for w in txt.split()) for txt in tile["text"]
            ]
            tile["n_chars"] = tile["text"].str.len()
        parts.append(tile)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{dst}/documents.parquet", index=False
    )


def _build_embeddings(dst: str, tiles: int) -> None:
    import numpy as np
    import pandas as pd

    df = pd.read_parquet(f"{SRC}/embeddings.parquet")
    base = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    dim = base.shape[1]
    parts = []
    for t in range(tiles):
        tile = df.copy()
        tile["vec_id"] = tile["vec_id"] + t * ID_STRIDE
        if t > 0:
            rng = np.random.default_rng(2_000 + t)
            q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
            q *= np.sign(np.diag(r))  # deterministic sign convention
            rotated = (base @ q).astype(np.float32)
            tile["embedding"] = [row.tolist() for row in rotated]
        parts.append(tile)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{dst}/embeddings.parquet", index=False
    )


def _build_lineitem(dst: str, tiles: int) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + t.t * {ORDER_STRIDE} AS l_orderkey,
                 l_partkey  + t.t * {PART_STRIDE}  AS l_partkey,
                 l_suppkey  + t.t * {SUPP_STRIDE}  AS l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet', range({tiles}) t(t)
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def ensure_tiled(tiles: int, dst: str) -> str:
    """Build (once, cached) and return a tiled fixture directory.
    The marker is versioned: bump it when a _build_* transform changes so
    stale fixtures rebuild (v2: events scaled per-tile, r6)."""
    marker = os.path.join(dst, ".done_v2")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    _build_documents(dst, tiles)
    _build_embeddings(dst, tiles)
    _build_lineitem(dst, tiles)
    _build_events(dst, tiles)
    for t in UNSCALED:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    open(marker, "w").close()
    return dst


def ensure_sf1() -> str:
    """The bench's sf1 fixture (10 tiles)."""
    return ensure_tiled(TILES, DST)


# ---------------------------------------------------------------------------
# Zipf-skewed events tile (VERDICT r5 ask #7): the 100 TB hazard the
# uniform tiles don't cover is KEY skew. This fixture rebuilds events at
# 10x with user_id drawn log-uniformly — P(user = k) proportional to 1/k,
# i.e. Zipf(s=1) over the 1500-user universe — so the heaviest user owns
# ~1/ln(1500) = 13-14% of ALL events (~140k rows in one window/join
# partition) instead of 1/1500. Deterministic: the per-row uniform comes
# from hash(event_id), not rand(). Timestamps keep the sf0.1 range, so a
# hot user's timeline is dense (few long sessions — the worst case for
# per-user session windows and for the (user, session) attribution join).
# ---------------------------------------------------------------------------
EVENT_STRIDE = 1_000_000  # above the sf0.1 max event_id
SKEW_DST = os.path.join(_REPO, ".bench_sf1skew")
SKEW_USERS = 1_500


def _build_events_skewed(dst: str, tiles: int) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # u in [0,1) from a 30-bit slice of the deterministic row hash;
    # CAST(N^u AS BIGINT) in DuckDB rounds-to-nearest (not floor), so the map
    # to [1, N] shifts mass marginally across integer boundaries vs exact
    # floor(N^u); still log-uniform ~ Zipf(1) and capped by least() below.
    # (Kept as-is deliberately: changing the SQL would regenerate the cached
    # fixture and invalidate the recorded skew-rehearsal numbers.)
    con.execute(
        f"""
        COPY (
          SELECT event_id + t.t * {EVENT_STRIDE} AS event_id,
                 ts,
                 CAST(least(power({SKEW_USERS},
                       (hash(event_id + t.t * {EVENT_STRIDE}) % 1073741824)
                         / 1073741824.0),
                     {SKEW_USERS}) AS BIGINT) AS user_id,
                 event_type, value, props
          FROM '{SRC}/events.parquet', range({tiles}) t(t)
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def ensure_sf1_skew() -> str:
    """Build (once, cached) the Zipf-events fixture directory; every
    other table is the unscaled sf0.1 copy so any registry query loads."""
    marker = os.path.join(SKEW_DST, ".done")
    if os.path.exists(marker):
        return SKEW_DST
    shutil.rmtree(SKEW_DST, ignore_errors=True)
    os.makedirs(SKEW_DST, exist_ok=True)
    _build_events_skewed(SKEW_DST, TILES)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{SKEW_DST}/{t}.parquet")
    open(marker, "w").close()
    return SKEW_DST


def ensure_sf10() -> str:
    """A second decade (100 tiles, ~1.5 GB) for one-off exponent checks —
    too slow for the per-round bench, used by tools/scaling_probe.py."""
    return ensure_tiled(100, os.path.join(_REPO, ".bench_sf10"))


if __name__ == "__main__":
    import sys

    print(ensure_sf10() if "--sf10" in sys.argv else ensure_sf1())
