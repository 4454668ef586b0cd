"""Retrieval-graph and sketch operators: kNN graph construction,
leakage-safe splitting, count-min frequency sketching, and containment
(asymmetric near-dup) detection.

These extend the LLM-pipeline surface (SURVEY.md §2.12 north-star; no
reference analogue) with the graph/sketch shapes a training-data platform
runs between dedup and training:

- sim_knn_graph — the k-nearest-neighbor graph over the embedding corpus
  (cluster-blocked, mutual edges flagged): the input to graph-based
  semantic clustering, diversity sampling, and label propagation.
- docs_leakage_safe_split — train/val/test assignment where every
  near-dup CLUSTER lands in one split (split by the cluster
  representative's hash, not the document's): the fix for eval
  contamination that per-document hashing cannot give.
- text_countmin_freq — Count-Min frequency sketch with deterministic
  portable hashes: the bounded-memory token-frequency estimator, and —
  because every hash is the shared md5-prefix hash — the sketch itself is
  hash-checkable against the oracle, like text_kmv_distinct.
- docs_containment — asymmetric containment |A∩B|/|A| over banded-LSH
  candidates: catches quotes/subsets/truncated copies whose Jaccard is
  tiny because the union is dominated by the longer document.

Oracle conventions follow queries/llm.py: shared constants and SQL
builders from functions/text.py / functions/vectors.py, integer
arithmetic where possible, single pinned expressions for every double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V
from ..operators import dedup as D
from ..operators import similarity as S
from .llm import (
    IVF_CENTROID_MOD,
    JACCARD_THRESHOLD,
    _JACCARD_TAIL_SQL,
    _SHINGLE_IDX_CTE,
)
from .registry import register, table

# ---------------------------------------------------------------------------
# kNN graph over embeddings (cluster-blocked, mutual edges flagged)
# ---------------------------------------------------------------------------
KNN_GRAPH_K = 5


def _knn_graph_oracle() -> str:
    cos_vc = V.cosine_sql("e.v", "c.cv")
    cos_ab = V.cosine_sql("a.v", "b.v")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e
              WHERE vec_id % {IVF_CENTROID_MOD} = 0),
    assigned AS (
      SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_vc} DESC, c.cid) AS r
        FROM e, cents c
      ) WHERE r = 1
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst, {cos_ab} AS sim
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
    ),
    edges AS (
      SELECT src, dst, sim, rnk FROM (
        SELECT src, dst, sim,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY sim DESC, dst) AS rnk
        FROM scored
      ) WHERE rnk <= {KNN_GRAPH_K}
    )
    SELECT e.src, e.dst, e.sim, e.rnk,
           (m.src IS NOT NULL) AS mutual
    FROM edges e
    LEFT JOIN edges m ON m.src = e.dst AND m.dst = e.src
    """


@register(
    "sim_knn_graph",
    oracle=_knn_graph_oracle(),
    tags=("similarity", "llm", "graph", "ann"),
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor graph over the embedding corpus, the substrate
    for graph-based semantic clustering / diversity sampling / label
    propagation. Candidates are CLUSTER-BLOCKED (IVF assignment to the
    seeded centroids, neighbors searched within a vector's own cluster
    only), so the pair join is |cluster|^2 per cluster, never corpus^2 —
    at 100 TB the assignment is written bucketed by cluster_id and each
    cluster's block joins co-located. Edges carry the exact cosine, the
    per-source rank, and the MUTUAL flag (both endpoints in each other's
    top-k — the standard edge filter that drops hub-induced asymmetric
    edges before community detection). Mutuality is a self equi-join of
    the edge list on (src=dst, dst=src): O(n*k) rows, keyed both sides.
    """
    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % IVF_CENTROID_MOD == 0)
    assigned = S.ivf_assign(emb, cents)
    a = assigned.select(
        F.col("vec_id").alias("src"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "cluster_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("dst"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        "cluster_id",
    )
    scored = (
        a.join(b, "cluster_id")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            (V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    edges = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_GRAPH_K)
    )
    rev = edges.select(
        F.col("src").alias("m_src"), F.col("dst").alias("m_dst")
    )
    return (
        edges.join(
            rev,
            (F.col("m_src") == F.col("dst")) & (F.col("m_dst") == F.col("src")),
            "left",
        )
        .select(
            "src",
            "dst",
            "sim",
            "rnk",
            F.col("m_src").isNotNull().alias("mutual"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe split: near-dup clusters assigned to ONE split
# ---------------------------------------------------------------------------
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90  # [80, 90) = val, [90, 100) = test


def _leakage_split_oracle() -> str:
    bucket = (
        "CAST(('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 100"
    )
    return f"""
    WITH RECURSIVE {_SHINGLE_IDX_CTE}, {_JACCARD_TAIL_SQL},
    pairs_t AS (SELECT doc_a, doc_b FROM jac WHERE jac >= {JACCARD_THRESHOLD}),
    e2 AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs_t
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs_t
    ),
    reach(src, node) AS (
      SELECT a, a FROM e2
      UNION
      SELECT r.src, e.b FROM reach r JOIN e2 e ON e.a = r.node
    ),
    comp AS (SELECT src AS node, MIN(node) AS component FROM reach GROUP BY src),
    withc AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, component,
           CASE WHEN {bucket} < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN {bucket} < {SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM withc
    """


@register(
    "docs_leakage_safe_split",
    oracle=_leakage_split_oracle(),
    tags=("llm", "sampling", "split", "dedup", "iterative"),
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: documents are grouped into near-dup CLUSTERS (connected
    components over the exact-Jaccard pair graph), and the split bucket
    is the hash of the CLUSTER id, not the document id — every member of
    a cluster lands in the same split by construction. Per-document
    hash splitting (docs_train_test_split) puts ~37% of near-dup pairs
    astride the train/eval boundary (1 - 0.8² - 0.1² - 0.1²); this is
    the standard fix. Docs in no pair are their own singleton cluster
    (left join + coalesce). Plan: the pair graph and min-label
    propagation reuse the dedup machinery (all shuffles keyed on doc id
    or shingle); the final assignment is one broadcast-join of the
    cluster map onto the corpus + a map-only hash bucket."""
    d = table(spark, sf_dir, "documents")
    from ..operators.components import connected_components

    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", JACCARD_THRESHOLD)
    comp = connected_components(pairs.select("doc_a", "doc_b"))
    withc = d.select("doc_id").join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("component").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    return withc.select(
        "doc_id",
        "component",
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (deterministic, hash-checkable)
# ---------------------------------------------------------------------------
CMS_W = 512  # counters per row
CMS_D = 4  # hash rows
CMS_TOPN = 20  # candidates whose estimates are evaluated


def _cms_oracle() -> str:
    toks = T.tokens_sql("text")

    def bucket(d: int) -> str:
        salted = "('" + str(d) + "|' || token)"
        return f"{T.portable_hash32_sql(salted)} % {CMS_W}"

    sketch_rows = "\n      UNION ALL ".join(
        f"SELECT {d} AS depth, {bucket(d)} AS bucket, token FROM tok"
        for d in range(CMS_D)
    )
    cand_rows = "\n      UNION ALL ".join(
        f"SELECT token, n_exact, {d} AS depth, {bucket(d)} AS bucket FROM cand"
        for d in range(CMS_D)
    )
    return f"""
    WITH tok AS (
      SELECT unnest({toks}) AS token FROM documents
    ),
    hashed AS ({sketch_rows}),
    sketch AS (
      SELECT depth, bucket, COUNT(*) AS cnt
      FROM hashed GROUP BY depth, bucket
    ),
    exact AS (
      SELECT token, COUNT(*) AS n_exact FROM tok GROUP BY token
    ),
    cand AS (
      SELECT token, n_exact FROM (
        SELECT token, n_exact,
               ROW_NUMBER() OVER (ORDER BY n_exact DESC, token) AS r
        FROM exact
      ) WHERE r <= {CMS_TOPN}
    ),
    probes AS ({cand_rows})
    SELECT p.token, ANY_VALUE(p.n_exact) AS n_exact,
           MIN(s.cnt) AS n_est,
           MIN(s.cnt) - ANY_VALUE(p.n_exact) AS overcount
    FROM probes p JOIN sketch s
      ON s.depth = p.depth AND s.bucket = p.bucket
    GROUP BY p.token
    """


@register(
    "text_countmin_freq",
    oracle=_cms_oracle(),
    tags=("llm", "text", "sketch"),
)
def text_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the token stream: {CMS_D} hash
    rows x {CMS_W} counters, estimate = min over rows of the counter each
    hash lands in (always >= the true count — one-sided error). Because
    every hash is the shared deterministic md5-prefix hash (salted per
    row), the sketch — not just its answers — is reproducible on any
    engine/partitioning, so this "approximate" operator is exactly
    verifiable, like text_kmv_distinct. Output: the top-{CMS_TOPN} exact
    tokens with their estimates and overcounts (the sketch's measured
    collision error on this corpus). Scale: the sketch is a fixed
    {CMS_D}x{CMS_W} table built by one map-side-combined groupBy over
    the exploded stream (the {CMS_D}x expansion happens AFTER the narrow
    explode, inside the same stage); estimation joins the
    broadcast-sized sketch. Memory is O(d*w) regardless of corpus size —
    the point of the sketch."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
    bucket = lambda dd: (  # noqa: E731
        T.portable_hash32(F.concat(F.lit(f"{dd}|"), F.col("token"))) % CMS_W
    )
    hashed = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dd).alias("depth"), bucket(dd).alias("bucket")
                    )
                    for dd in range(CMS_D)
                ]
            )
        ).alias("db")
    ).select(F.col("db.depth").alias("depth"), F.col("db.bucket").alias("bucket"))
    sketch = hashed.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))
    exact = tok.groupBy("token").agg(F.count("*").alias("n_exact"))
    wtop = Window.orderBy(F.desc("n_exact"), F.asc("token"))
    cand = (
        exact.withColumn("r", F.row_number().over(wtop))
        .filter(F.col("r") <= CMS_TOPN)
        .drop("r")
    )
    probes = cand.select(
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dd).alias("depth"), bucket(dd).alias("bucket")
                    )
                    for dd in range(CMS_D)
                ]
            )
        ).alias("db"),
    ).select(
        "token",
        "n_exact",
        F.col("db.depth").alias("depth"),
        F.col("db.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("token")
        .agg(
            F.any_value("n_exact").alias("n_exact"),
            F.min("cnt").alias("n_est"),
            (F.min("cnt") - F.any_value("n_exact")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Containment (asymmetric near-dup) over LSH candidates
# ---------------------------------------------------------------------------
CONTAIN_THRESHOLD = 0.7


def _containment_oracle() -> str:
    sig_cols = ",\n         ".join(
        f"min({T.minhash_sql('h', i)}) AS mh{i}" for i in range(T.MINHASH_K)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT did, {b} AS band, {key} AS bkey FROM sig".format(
            b=b,
            key="CAST(mh{0} AS VARCHAR) || '_' || CAST(mh{1} AS VARCHAR)".format(
                b * T.LSH_ROWS, b * T.LSH_ROWS + 1
            ),
        )
        for b in range(T.LSH_BANDS)
    )
    return f"""
    WITH {_SHINGLE_IDX_CTE},
    hashes AS (SELECT did, {T.portable_hash32_sql('sh')} AS h FROM idx),
    sig AS (SELECT did, {sig_cols} FROM hashes GROUP BY did),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT x.did AS doc_a, y.did AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bkey = y.bkey AND x.did < y.did
    ),
    sizes AS (SELECT did, COUNT(*) AS n FROM idx GROUP BY did),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN idx a ON a.did = c.doc_a
      JOIN idx b ON b.did = c.doc_b AND b.sh = a.sh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE) / na.n AS cont_a,
           CAST(i.inter AS DOUBLE) / nb.n AS cont_b
    FROM inter i
    JOIN sizes na ON na.did = i.doc_a
    JOIN sizes nb ON nb.did = i.doc_b
    WHERE GREATEST(CAST(i.inter AS DOUBLE) / na.n,
                   CAST(i.inter AS DOUBLE) / nb.n) >= {CONTAIN_THRESHOLD}
    """


@register(
    "docs_containment",
    oracle=_containment_oracle(),
    tags=("dedup", "llm", "containment"),
)
def docs_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (|A∩B|/|A|, |A∩B|/|B|) over banded
    MinHash-LSH candidates, kept where either side >= {CONTAIN_THRESHOLD}.
    The quote/subset detector: a short document embedded in a long one has
    near-zero Jaccard (union dominated by the long doc) but containment
    ~1.0 on the short side — symmetric dedup never flags it. Same LSH
    candidate machinery and set-at-a-time array_intersect verify as the
    Jaccard paths (operators/dedup.py:containment_pairs)."""
    return D.containment_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", CONTAIN_THRESHOLD
    )
