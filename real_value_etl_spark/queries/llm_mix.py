"""Corpus-mix engineering operators: sub-word tokenization accounting,
deterministic source resampling, boilerplate stripping, cross-lingual
vocabulary overlap, and per-source distribution drift.

These extend the LLM-pipeline surface (SURVEY.md §2.12) with the steps a
pretraining-mix owner runs between "raw filtered corpus" and "final token
budget": how many sub-word tokens a tokenizer would really produce (BPE-ish
regex, not whitespace), which sources get up/down-sampled and by how much,
what boilerplate repeats verbatim across documents, and how far each
source's unigram distribution drifts from the corpus.

Oracle conventions (same as queries/llm.py): every computed double is a
single pinned expression (divisions, one ordered left-fold for sums — no
engine-ordered SUM over doubles, no transcendental functions), integer
aggregates cast to BIGINT (DuckDB HUGEINT renders as float in pandas), and
array-valued results serialized before output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from .registry import register, table

# GPT-2-style coarse pre-tokenizer: a leading-space word, number, or
# punctuation run per token. The subset used is identical in Java regex
# (Spark) and RE2 (DuckDB).
BPE_PAT = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

RESAMPLE_BASE_MILLIS = 200
RESAMPLE_SPAN_MILLIS = 800

BOILER_CHUNK = 5
BOILER_MIN_COUNT = 2

# portable md5-prefix hash: ALWAYS the shared helpers (functions/text.py
# portable_hash32 / portable_hash32_sql) — a private copy here could drift
# from the oracle side of every other query that hashes.


# ---------------------------------------------------------------------------
# Sub-word (BPE-ish) token accounting
# ---------------------------------------------------------------------------
@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({T.tokens_sql("text")}) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS BIGINT)
             AS n_bpe,
           CASE WHEN len(regexp_extract_all(text, '{BPE_PAT}')) > 0
                THEN CAST(n_chars AS DOUBLE)
                     / len(regexp_extract_all(text, '{BPE_PAT}'))
                ELSE NULL END AS chars_per_bpe
    FROM documents
    """,
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting with a BPE-ish regex pre-tokenizer (the
    GPT-2 pattern family) next to the whitespace count: the ratio
    chars-per-subword is the number a token-budget planner actually needs
    (whitespace counts under-estimate BPE output 1.3-1.5x on English).
    Pure codegen: regexp_extract_all + size, no UDF.

    The ratio is guarded for token-less (empty/whitespace-only) documents:
    under Spark 4 ANSI mode a bare division raises DIVIDE_BY_ZERO while
    DuckDB's IEEE division yields inf — NULL on both sides is the only
    portable answer."""
    d = table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PAT), 0)
    return d.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("long").alias("n_ws"),
        F.size(bpe).cast("long").alias("n_bpe"),
        F.when(
            F.size(bpe) > 0, F.col("n_chars").cast("double") / F.size(bpe)
        ).alias("chars_per_bpe"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-source resampling (mix re-weighting)
# ---------------------------------------------------------------------------
@register(
    "docs_source_resample",
    oracle=f"""
    WITH weighted AS (
      SELECT source,
             {T.tokens_sql("text")} AS ts,
             {RESAMPLE_BASE_MILLIS}
               + {T.portable_hash32_sql("source")} % {RESAMPLE_SPAN_MILLIS}
               AS weight_millis,
             {T.portable_hash32_sql("CAST(doc_id AS VARCHAR)")} % 1000
               AS bucket
      FROM documents
    )
    SELECT source,
           ANY_VALUE(weight_millis) AS weight_millis,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN bucket < weight_millis THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN bucket < weight_millis THEN len(ts) ELSE 0 END)
                AS BIGINT) AS kept_tokens
    FROM weighted GROUP BY source
    """,
    tags=("llm", "sampling", "mix"),
)
def docs_source_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix re-weighting: each source gets a sampling rate (here derived
    from a hash so the demo is self-contained; in production the rates
    come from the mix spec) and documents are kept by a deterministic
    hash-mod acceptance test — the same doc survives on every engine, any
    cluster size, any partitioning, which is what makes a token budget
    reproducible. One narrow pass + one aggregation; no shuffle of the
    text itself."""
    d = table(spark, sf_dir, "documents")
    ts = T.tokens(F.col("text"))
    w = (
        F.lit(RESAMPLE_BASE_MILLIS)
        + T.portable_hash32(F.col("source")) % RESAMPLE_SPAN_MILLIS
    )
    bucket = T.portable_hash32(F.col("doc_id").cast("string")) % 1000
    kept = bucket < w
    return (
        d.select(
            "source",
            w.alias("weight_millis"),
            F.size(ts).alias("n_tok"),
            kept.alias("kept"),
        )
        .groupBy("source")
        .agg(
            F.any_value("weight_millis").alias("weight_millis"),
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate stripping (corpus-wide repeated fixed chunks)
# ---------------------------------------------------------------------------
@register(
    "docs_boilerplate_strip",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {T.tokens_sql("text")} AS ts FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             array_to_string(ts[(i * {BOILER_CHUNK} + 1):
                                ((i + 1) * {BOILER_CHUNK})], ' ') AS chunk
      FROM (
        SELECT doc_id, ts,
               unnest(range(0, len(ts) // {BOILER_CHUNK})) AS i
        FROM toks
      )
    ),
    freq AS (
      SELECT chunk, COUNT(*) AS cnt FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.cnt >= {BOILER_MIN_COUNT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN f.cnt >= {BOILER_MIN_COUNT} THEN 0
                         ELSE {BOILER_CHUNK} END) AS BIGINT) AS tokens_kept
    FROM chunks c JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
    tags=("llm", "dedup", "boilerplate"),
)
def docs_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style boilerplate removal at chunk granularity: documents
    are cut into fixed 5-token chunks (stride = chunk, no overlap — unlike
    the stride-1 spans of docs_repeated_spans), chunks repeated anywhere
    in the corpus are dropped, and each doc reports how many tokens
    survive. The repeated-chunk table is the ONLY shuffled relation, and
    it aggregates to (#distinct chunks) rows map-side first — the 100 TB
    shape of every dedup in this repo."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("ts"))
    chunk_of = F.explode(
        F.transform(
            F.sequence(
                F.lit(0), F.floor(F.size("ts") / BOILER_CHUNK).cast("int") - 1
            ),
            lambda i: F.array_join(
                F.slice(F.col("ts"), (i * BOILER_CHUNK + 1).cast("int"),
                        BOILER_CHUNK),
                " ",
            ),
        )
    )
    chunks = toks.filter(F.size("ts") >= BOILER_CHUNK).select(
        "doc_id", chunk_of.alias("chunk")
    )
    freq = chunks.groupBy("chunk").agg(F.count("*").alias("cnt"))
    boiler = F.col("cnt") >= BOILER_MIN_COUNT
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(boiler, 1).otherwise(0)).cast("long").alias(
                "n_boiler"
            ),
            F.sum(F.when(boiler, 0).otherwise(BOILER_CHUNK))
            .cast("long")
            .alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-lingual vocabulary overlap
# ---------------------------------------------------------------------------
@register(
    "lang_vocab_overlap",
    oracle=f"""
    WITH vocab AS (
      SELECT DISTINCT lang, unnest({T.tokens_sql("text")}) AS tok
      FROM documents
    ),
    sizes AS (SELECT lang, COUNT(*) AS n FROM vocab GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT i.lang_a, i.lang_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jac
    FROM inter i
    JOIN sizes sa ON sa.lang = i.lang_a
    JOIN sizes sb ON sb.lang = i.lang_b
    """,
    tags=("llm", "text", "langid"),
)
def lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every language pair — the sanity check
    behind language-ID quality (a mislabeled corpus shows up as an
    anomalously high overlap between two 'different' languages). The
    distinct (lang, token) vocabulary is tiny relative to the corpus; the
    pair join runs on it, never on the token stream."""
    d = table(spark, sf_dir, "documents")
    vocab = (
        d.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    sizes = vocab.groupBy("lang").agg(F.count("*").alias("n"))
    a = vocab.select(F.col("lang").alias("lang_a"), "tok")
    b = vocab.select(F.col("lang").alias("lang_b"), "tok")
    inter = (
        a.join(b, ["tok"])
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jac"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source unigram drift from the corpus distribution (chi-square)
# ---------------------------------------------------------------------------
@register(
    "docs_source_divergence",
    oracle=f"""
    WITH ex AS (
      SELECT source, unnest({T.tokens_sql("text")}) AS tok FROM documents
    ),
    st AS (SELECT source, tok, COUNT(*) AS c_st FROM ex GROUP BY source, tok),
    s_tot AS (SELECT source, COUNT(*) AS n_s FROM ex GROUP BY source),
    t_tot AS (SELECT tok, COUNT(*) AS c_t FROM ex GROUP BY tok),
    corpus AS (SELECT COUNT(*) AS n_c FROM ex),
    terms AS (
      SELECT st.source, st.tok,
             (CAST(st.c_st AS DOUBLE) / s_tot.n_s
                - CAST(t_tot.c_t AS DOUBLE) / corpus.n_c)
             * (CAST(st.c_st AS DOUBLE) / s_tot.n_s
                - CAST(t_tot.c_t AS DOUBLE) / corpus.n_c)
             / (CAST(t_tot.c_t AS DOUBLE) / corpus.n_c) AS term
      FROM st
      JOIN s_tot USING (source) JOIN t_tot USING (tok) CROSS JOIN corpus
    )
    SELECT source,
           COUNT(*) AS n_distinct_tokens,
           list_reduce(
             list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY tok)),
             (acc, x) -> acc + x) AS chi2
    FROM terms GROUP BY source
    """,
    tags=("llm", "stats", "mix"),
)
def docs_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How far each source's unigram distribution drifts from the corpus,
    as a chi-square statistic over the source's observed vocabulary —
    the signal mix owners watch when one source starts dominating or
    degenerating. Chi-square instead of KL keeps every double operation
    rational (divisions and one multiply — no log, whose last-ulp
    behavior differs across libm builds), and the per-source sum is a
    token-ordered left fold, so the result is bit-identical on any engine
    and any partitioning. Model tables are token-keyed aggregates that
    broadcast back onto the stream at scale."""
    d = table(spark, sf_dir, "documents")
    ex = d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    st = ex.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    s_tot = ex.groupBy("source").agg(F.count("*").alias("n_s"))
    t_tot = ex.groupBy("tok").agg(F.count("*").alias("c_t"))
    corpus = ex.agg(F.count("*").alias("n_c"))
    p_s = F.col("c_st").cast("double") / F.col("n_s")
    p_c = F.col("c_t").cast("double") / F.col("n_c")
    terms = (
        st.join(F.broadcast(s_tot), "source")
        .join(t_tot, "tok")
        .crossJoin(F.broadcast(corpus))
        .select(
            "source",
            "tok",
            ((p_s - p_c) * (p_s - p_c) / p_c).alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.count("*").alias("n_distinct_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroids (element-wise mean, drift monitoring)
# ---------------------------------------------------------------------------
@register(
    "emb_label_centroids",
    oracle="""
    WITH ex AS (
      SELECT label, vec_id, i, v[i] AS val FROM (
        SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
      )
    )
    SELECT label, i AS pos,
           COUNT(*) AS n_vecs,
           list_reduce(
             list_prepend(CAST(0 AS DOUBLE), list(val ORDER BY vec_id)),
             (acc, x) -> acc + x) / COUNT(*) AS centroid_val
    FROM ex GROUP BY label, i
    """,
    tags=("llm", "similarity", "vector", "agg"),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, element-wise: the drift monitor a
    retrieval/training pipeline runs per ingest batch (a moving centroid
    means the upstream encoder or corpus changed). Long-format output
    (label, dim, mean) — one narrow posexplode then ONE hash aggregation
    on (label, dim); the mean is a vec_id-ordered fold over each group so
    the double sum is order-pinned and bit-identical on any engine or
    partitioning (built-in AVG would be partition-order-dependent)."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "p", "val"
        ),
    ).select("label", "vec_id", (F.col("p") + 1).alias("pos"), "val")
    return ex.groupBy("label", "pos").agg(
        F.count("*").alias("n_vecs"),
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                F.lit(0.0),
                lambda acc, s: acc + s["val"],
            )
            / F.count("*")
        ).alias("centroid_val"),
    )


# ---------------------------------------------------------------------------
# Pairwise-distance histogram (dedup/ANN threshold calibration)
# ---------------------------------------------------------------------------
DIST_SAMPLE_N = 64
DIST_BUCKET_PER_UNIT = 4  # quarter-width distance buckets


@register(
    "sim_pair_distance_hist",
    oracle=f"""
    WITH sample AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings ORDER BY vec_id LIMIT {DIST_SAMPLE_N}
    ),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, len(a.v) + 1),
                                i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))),
               (x, y) -> x + y) AS dist2
      FROM sample a JOIN sample b ON a.vec_id < b.vec_id
    )
    SELECT CAST(FLOOR(sqrt(dist2) * {DIST_BUCKET_PER_UNIT}) AS BIGINT)
             AS bucket,
           COUNT(*) AS n_pairs
    FROM pairs GROUP BY 1
    """,
    tags=("llm", "similarity", "vector", "diagnostics"),
)
def sim_pair_distance_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-distance histogram over a BOUNDED deterministic sample
    (the {DIST_SAMPLE_N} lowest vec_ids): the calibration plot every
    dedup/ANN threshold decision starts from — where the distance mass
    sits tells you what cosine/Jaccard cutoff separates near-dups from
    neighbors. The sample is fixed-size by construction (ORDER BY id
    LIMIT k), so the all-pairs step is k^2/2 pairs against a BROADCAST
    side at any corpus scale — this is the sanctioned bounded-broadcast
    pattern, never a corpus x corpus product. Each distance is one
    dim-ordered fold (bit-identical across engines); sqrt is
    IEEE-correctly-rounded, so bucket boundaries match exactly."""
    emb = table(spark, sf_dir, "embeddings")
    sample = (
        emb.orderBy("vec_id")
        .limit(DIST_SAMPLE_N)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    a = sample.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = sample.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    dist2 = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        dist2.alias("dist2")
    )
    return pairs.select(
        F.floor(F.sqrt(F.col("dist2")) * F.lit(DIST_BUCKET_PER_UNIT)).alias(
            "bucket"
        )
    ).groupBy("bucket").agg(F.count("*").alias("n_pairs"))


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (the multilingual token-budget audit)
# ---------------------------------------------------------------------------
@register(
    "text_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len({T.tokens_sql("text")}) AS n_ws,
             len(regexp_extract_all(text, '{BPE_PAT}')) AS n_bpe,
             n_chars
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS words,
           CAST(SUM(n_bpe) AS BIGINT) AS subwords,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws) AS fertility,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe) AS chars_per_subword
    FROM per_doc GROUP BY lang
    """,
    tags=("llm", "text", "tokenizer", "lang"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — subword tokens per whitespace
    word, plus chars per subword: the multilingual-budget audit run before
    fixing a data mix (a language with 2x fertility consumes 2x the token
    budget per word, and a mix balanced on document counts silently
    under-trains it). One narrow projection (regex token counts are
    Catalyst codegen, no UDF) feeding a 5-group aggregate; integer sums
    shuffle, the two ratios are single double divisions at the end —
    bit-identical both engines."""
    d = table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PAT), 0)
    per = d.select(
        "lang",
        F.size(T.tokens(F.col("text"))).alias("n_ws"),
        F.size(bpe).alias("n_bpe"),
        "n_chars",
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws").cast("long").alias("words"),
        F.sum("n_bpe").cast("long").alias("subwords"),
        F.sum("n_chars").cast("long").alias("chars"),
        (F.sum("n_bpe").cast("double") / F.sum("n_ws")).alias("fertility"),
        (F.sum("n_chars").cast("double") / F.sum("n_bpe")).alias(
            "chars_per_subword"
        ),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection: hashed n-gram likelihood ratios
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 256  # hashed-unigram feature buckets
DSIR_K = 1 << 20  # fixed-point scale for the quantized likelihood ratio
DSIR_KEEP_DIV = 5  # keep the top 1/5 of docs by per-token ratio
DSIR_TARGET_SOURCE = "src0"  # the curated "target distribution" corpus


@register(
    "docs_dsir_select",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({T.tokens_sql("text")}) AS token
      FROM documents
    ),
    bt AS (
      SELECT doc_id, source,
             {T.portable_hash32_sql("token")} % {DSIR_BUCKETS} AS b
      FROM tok
    ),
    cr AS (SELECT b, COUNT(*) AS c_r FROM bt GROUP BY b),
    ct AS (SELECT b, COUNT(*) AS c_t FROM bt
           WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b),
    q AS (
      SELECT cr.b,
             ((COALESCE(ct.c_t, 0) + 1) * {DSIR_K}) // (cr.c_r + 1) AS q
      FROM cr LEFT JOIN ct ON cr.b = ct.b
    ),
    scores AS (
      SELECT bt.doc_id,
             COUNT(*) AS n_tokens,
             SUM(q.q) AS dsir_score
      FROM bt JOIN q ON bt.b = q.b
      GROUP BY bt.doc_id
    ),
    per_doc AS (
      SELECT d.doc_id,
             CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(COALESCE(s.dsir_score, 0) AS BIGINT) AS dsir_score,
             CASE WHEN COALESCE(s.n_tokens, 0) > 0
                  THEN s.dsir_score // s.n_tokens END AS avg_q
      FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY avg_q DESC NULLS LAST, doc_id)
               AS sel_rank,
             COUNT(*) OVER () AS total
      FROM per_doc
    )
    SELECT doc_id, n_tokens, dsir_score,
           CAST(avg_q AS BIGINT) AS avg_q,
           CAST(sel_rank AS BIGINT) AS sel_rank,
           sel_rank <= total // {DSIR_KEEP_DIV} AS selected
    FROM ranked
    """,
    tags=("llm", "sampling", "mix", "quality"),
)
def docs_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (importance resampling on hashed n-gram
    features, Xie et al. 2023): score every document by how much more
    likely its tokens are under a curated TARGET corpus than under the
    raw corpus, then keep the top fraction — the standard pretraining
    data-selection shape when you have a small high-quality reference
    (here: the `src0` source) and a large raw pool.

    Engine-portable by construction: features are hashed-unigram buckets
    (the portable md5 hash, 256 buckets), the per-bucket likelihood
    ratio is QUANTIZED to fixed-point integers — q(b) = div((c_target+1)
    * 2^20, (c_raw+1)), Laplace-smoothed — and a document's score is the
    integer SUM of its tokens' q values, so every comparison the
    selection makes is exact integer arithmetic (no logs, no float
    accumulation order): the result hash-matches DuckDB bit-for-bit.

    Scale shape: token explode -> two 256-key aggregations (map-side
    partial combine; the ratio table is 256 rows, broadcast) -> per-doc
    sum (one doc_id shuffle) -> the two-phase global rank
    (operators/scan.py:global_row_number — range exchange over DOC rows
    only, no single-partition sort) with the kept count derived from the
    broadcast total. No stage touches more than O(tokens) rows, and the
    quadratic-free rank survives any corpus size."""
    d = table(spark, sf_dir, "documents")
    from ..operators.scan import global_row_number

    tok = d.select(
        "doc_id", "source", F.explode(T.tokens(F.col("text"))).alias("token")
    )
    bt = tok.select(
        "doc_id",
        "source",
        (T.portable_hash32(F.col("token")) % DSIR_BUCKETS).alias("b"),
    )
    cr = bt.groupBy("b").agg(F.count("*").alias("c_r"))
    ct = (
        bt.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("b")
        .agg(F.count("*").alias("c_t"))
    )
    q = cr.join(ct, "b", "left").select(
        "b",
        F.call_function(
            "div",
            (F.coalesce(F.col("c_t"), F.lit(0)) + 1) * F.lit(DSIR_K),
            F.col("c_r") + 1,
        ).alias("q"),
    )
    scores = (
        bt.join(F.broadcast(q), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("q").alias("dsir_score"))
    )
    per_doc = (
        d.select("doc_id")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.coalesce(F.col("dsir_score"), F.lit(0)).cast("long").alias(
                "dsir_score"
            ),
            F.when(
                F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                F.call_function("div", F.col("dsir_score"), F.col("n_tokens")),
            ).alias("avg_q"),
        )
    )
    ranked = global_row_number(
        per_doc,
        [F.col("avg_q").desc_nulls_last(), F.col("doc_id").asc()],
        "sel_rank",
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "dsir_score",
        F.col("avg_q").cast("long").alias("avg_q"),
        F.col("sel_rank").cast("long").alias("sel_rank"),
        (
            F.col("sel_rank")
            <= F.call_function(
                "div", F.col("__n").cast("long"), F.lit(DSIR_KEEP_DIV).cast("long")
            )
        ).alias("selected"),
    )


# ---------------------------------------------------------------------------
# Greedy coverage-maximization selection (submodular data selection)
# ---------------------------------------------------------------------------
COV_K = 10  # greedy steps
COV_K_MAX = 1000  # hard bound on the driver loop (one 1-row collect/step)


def _greedy_coverage_oracle() -> str:
    from ..functions import text as T

    head = f"""
    WITH tok AS MATERIALIZED (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest({T.tokens_sql("text")}) AS tok FROM documents
      )
    )"""
    stages = []
    prev_cov = None
    prev_picked = []
    for i in range(1, COV_K + 1):
        not_cov = (
            f"LEFT JOIN cov{i - 1} c ON c.tok = t.tok" if prev_cov else ""
        )
        cov_null = "AND c.tok IS NULL" if prev_cov else ""
        exclude = (
            "WHERE t.doc_id NOT IN (SELECT doc_id FROM picked{})".format(i - 1)
            if prev_picked
            else ""
        )
        gains = f"""
    gains{i} AS MATERIALIZED (
      SELECT d.doc_id,
             CAST(COALESCE(g.gain, 0) AS BIGINT) AS gain
      FROM (SELECT DISTINCT doc_id FROM tok
            {("WHERE doc_id NOT IN (SELECT doc_id FROM picked" + str(i - 1) + ")") if prev_picked else ""}) d
      LEFT JOIN (
        SELECT t.doc_id, COUNT(*) AS gain
        FROM tok t {not_cov}
        WHERE TRUE {cov_null}
        {"AND t.doc_id NOT IN (SELECT doc_id FROM picked" + str(i - 1) + ")" if prev_picked else ""}
        GROUP BY t.doc_id
      ) g ON g.doc_id = d.doc_id
    ),
    win{i} AS MATERIALIZED (
      SELECT {i} AS step, doc_id, gain FROM gains{i}
      ORDER BY gain DESC, doc_id LIMIT 1
    ),
    cov{i} AS MATERIALIZED (
      SELECT DISTINCT tok FROM (
        {"SELECT tok FROM cov" + str(i - 1) + " UNION ALL " if prev_cov else ""}
        SELECT t.tok FROM tok t JOIN win{i} w ON w.doc_id = t.doc_id
      )
    ),
    picked{i} AS MATERIALIZED (
      {"SELECT doc_id FROM picked" + str(i - 1) + " UNION ALL " if prev_picked else ""}
      SELECT doc_id FROM win{i}
    )"""
        stages.append(gains)
        prev_cov = f"cov{i}"
        prev_picked.append(i)
    wins = "\n      UNION ALL ".join(
        f"SELECT w.step, w.doc_id, w.gain, (SELECT COUNT(*) FROM cov{i}) AS covered_total FROM win{i} w"
        for i in range(1, COV_K + 1)
    )
    return (
        head
        + ","
        + ",".join(stages)
        + f"""
    SELECT CAST(step AS BIGINT) AS step, doc_id, gain,
           CAST(covered_total AS BIGINT) AS covered_total
    FROM ({wins})"""
    )


@register(
    "docs_greedy_coverage",
    oracle=_greedy_coverage_oracle(),
    tags=("llm", "selection", "iterative"),
)
def docs_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy coverage-maximization selection (the submodular
    facility-location baseline of data-pruning literature): pick
    {COV_K} documents, each maximizing the count of vocabulary tokens
    NOT yet covered by earlier picks — the 1-1/e-approximate optimum for
    monotone submodular coverage. Purely integer gains with (gain DESC,
    doc_id) tie-break make every step deterministic; the oracle unrolls
    all {COV_K} stages as CTEs.

    Plan shape: the distinct (doc, token) index builds once and
    persists; each step is one ANTI-join against the covered-token set
    (node-bounded, grows to at most the vocabulary) + one count agg +
    a top-1 TakeOrdered — only the single winning row reaches the
    driver per step, and the covered set is rebuilt as a DataFrame
    union (localCheckpoint-ed so the 10-step lineage stays flat). The
    already-picked docs are excluded by a BROADCAST anti-join against a
    k-row picked-ids frame (r7 verdict ask #6) — never an `isin`
    literal list, so the pattern stays executor-side and safe to copy
    at larger k; `COV_K_MAX` asserts the driver-loop bound (one 1-row
    collect per step, exactly like k-means' k). At 100 TB gains compute
    fully parallel per step."""
    if COV_K > COV_K_MAX:
        raise ValueError(
            f"greedy coverage is a k-bounded driver loop: k={COV_K} exceeds "
            f"COV_K_MAX={COV_K_MAX} (one collect per step)"
        )
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .distinct()
        .persist()
    )
    picked_df = None  # k-row frame of picked doc_ids, broadcast each step
    covered = None
    out_rows = []
    for step in range(1, COV_K + 1):
        base = tok
        if picked_df is not None:
            base = base.join(F.broadcast(picked_df), "doc_id", "left_anti")
        fresh = (
            base.join(covered, "tok", "left_anti") if covered is not None else base
        )
        gains = fresh.groupBy("doc_id").agg(F.count("*").alias("gain"))
        # docs whose every token is covered drop out of `gains`; they are
        # still pickable at gain 0 — surface them with a left join from
        # the unpicked-doc universe
        universe = tok.select("doc_id").distinct()
        if picked_df is not None:
            universe = universe.join(F.broadcast(picked_df), "doc_id", "left_anti")
        full = universe.join(gains, "doc_id", "left").select(
            "doc_id", F.coalesce("gain", F.lit(0)).cast("long").alias("gain")
        )
        win = (
            full.orderBy(F.desc("gain"), F.asc("doc_id")).limit(1).collect()[0]
        )
        win_df = spark.createDataFrame([(int(win["doc_id"]),)], "doc_id long")
        picked_df = (
            win_df if picked_df is None else picked_df.unionAll(win_df)
        )
        new_tokens = tok.filter(F.col("doc_id") == win["doc_id"]).select("tok")
        covered = (
            new_tokens
            if covered is None
            else covered.unionAll(new_tokens).distinct()
        ).localCheckpoint(eager=True)
        out_rows.append(
            (step, win["doc_id"], win["gain"], covered.count())
        )
    tok.unpersist()
    return spark.createDataFrame(
        out_rows, "step long, doc_id long, gain long, covered_total long"
    )


# ---------------------------------------------------------------------------
# Simpson / Gini-Simpson lexical diversity per source (exact rational)
# ---------------------------------------------------------------------------
@register(
    "docs_simpson_diversity",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({T.tokens_sql("text")}) AS token FROM documents
    ),
    tc AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num
      FROM tc GROUP BY source
    )
    SELECT source, n_tokens, n_types, simpson_num,
           CAST(simpson_num AS DOUBLE) / (n_tokens * (n_tokens - 1))
             AS simpson,
           1.0 - CAST(simpson_num AS DOUBLE) / (n_tokens * (n_tokens - 1))
             AS gini_simpson
    FROM agg WHERE n_tokens >= 2
    """,
    tags=("llm", "text", "stats"),
)
def docs_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON LEXICAL DIVERSITY per source: the probability that two
    tokens drawn without replacement are the same type, sum n_i(n_i-1)
    / (N(N-1)) over the source's term counts — the ecology diversity
    index applied to vocabulary, and the right repetitiveness screen
    next to docs_vocab_growth's Heaps curve (a template-spam source
    scores high Simpson / low Gini-Simpson long before its vocab curve
    flattens). Unlike Shannon entropy, Simpson is a RATIONAL function
    of the counts — the numerator sum n_i(n_i-1) is an exact BIGINT
    (bounded by N^2: fine through ~3e9 tokens/source, widen to
    DECIMAL beyond) and the diversity is ONE pinned double division;
    the Gini-Simpson complement reuses the same rounded quotient, so
    no log and no float accumulation ever crosses an engine boundary.
    Single-token sources are excluded (the index is undefined at
    N < 2).

    Scale shape: tokenize-explode into ONE map-side-combinable
    (source, token) count, then a source-sized rollup — the same
    two-stage shape as text_term_frequency, nothing data-sized after
    the first aggregate. Reference basis: SURVEY.md §2.12 text family
    (absent in reference)."""
    d = table(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    agg = tc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("simpson_num"),
    )
    simpson = F.col("simpson_num").cast("double") / (
        F.col("n_tokens") * (F.col("n_tokens") - 1)
    )
    return agg.filter(F.col("n_tokens") >= 2).select(
        "source",
        "n_tokens",
        "n_types",
        "simpson_num",
        simpson.alias("simpson"),
        (F.lit(1.0) - simpson).alias("gini_simpson"),
    )


# ---------------------------------------------------------------------------
# Flesch-Kincaid readability grade (log-free: vowel-group syllable heuristic)
# ---------------------------------------------------------------------------
@register(
    "text_readability_fk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {T.tokens_sql("text")} AS ts,
             GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
               AS n_sentences
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ts) AS BIGINT) AS n_words,
             CAST(n_sentences AS BIGINT) AS n_sentences,
             CAST(list_sum(list_transform(ts,
                    w -> GREATEST(1, len(regexp_extract_all(lower(w),
                                                            '[aeiouy]+')))))
                  AS BIGINT) AS n_syllables
      FROM t WHERE len(ts) >= 1
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
             - 15.59 AS fk_grade
    FROM m
    """,
    tags=("llm", "text", "quality"),
)
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH-KINCAID GRADE LEVEL per document — the classic
    readability filter (CCNet and most pretraining-quality stacks keep
    a readability band; pathologically low grades are boilerplate/
    lists, pathologically high are OCR junk or run-ons). Syllables use
    the standard VOWEL-GROUP heuristic (each maximal [aeiouy]+ run is
    one syllable, minimum 1 per word) — a fixed regex both engines
    evaluate identically, keeping the whole statistic log-free and
    sqrt-free: counts are exact integers and the grade is the
    published linear form 0.39*(words/sentence) + 11.8*(syllables/
    word) - 15.59, two pinned divisions and a literal combination with
    IDENTICAL expression shape on both engines. Sentence count clamps
    to >= 1 (terminal-punctuation-free docs are one sentence), empty
    docs are excluded.

    Scale shape: map-only — tokenization, two regexp counts and the
    per-token fold all run inside the row's projection; no shuffle
    exists in the plan at any scale. Reference basis: SURVEY.md §2.12
    text-quality family (absent in reference)."""
    d = table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n_sent = F.greatest(
        F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    ).cast("long")
    n_syll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1), F.regexp_count(F.lower(w), F.lit(r"[aeiouy]+"))
        ).cast("long"),
    )
    m = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ).filter(F.col("n_words") >= 1)
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(0.39)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            + F.lit(11.8)
            * (F.col("n_syllables").cast("double") / F.col("n_words"))
            - F.lit(15.59)
        ).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# Total-variation distance of each source's unigram mix from the corpus —
# the EXACT-integer companion to docs_source_divergence's chi-square
# ---------------------------------------------------------------------------
@register(
    "docs_tv_distance",
    oracle=f"""
    WITH ex AS (
      SELECT source, unnest({T.tokens_sql("text")}) AS tok FROM documents
    ),
    st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
           FROM ex GROUP BY source, tok),
    s_tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
              FROM ex GROUP BY source),
    t_tot AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_t
              FROM ex GROUP BY tok),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_c FROM ex),
    seen AS (
      SELECT st.source,
             SUM(abs(CAST(st.c_st AS HUGEINT) * c.n_c
                     - CAST(t.c_t AS HUGEINT) * s.n_s)) AS num_seen,
             CAST(SUM(t.c_t) AS BIGINT) AS ct_seen,
             CAST(COUNT(*) AS BIGINT) AS n_vocab_seen
      FROM st
      JOIN s_tot s USING (source) JOIN t_tot t USING (tok)
      CROSS JOIN corpus c
      GROUP BY st.source
    )
    SELECT s.source,
           s.n_vocab_seen,
           st2.n_s AS n_tokens_source,
           c.n_c AS n_tokens_corpus,
           CAST(s.num_seen
                + CAST(st2.n_s AS HUGEINT) * (c.n_c - s.ct_seen)
                AS BIGINT) AS tv_num,
           CAST(CAST(s.num_seen
                     + CAST(st2.n_s AS HUGEINT) * (c.n_c - s.ct_seen)
                     AS VARCHAR) AS DOUBLE)
             / (2.0 * (CAST(st2.n_s AS DOUBLE) * c.n_c)) AS tv_distance
    FROM seen s
    JOIN s_tot st2 USING (source)
    CROSS JOIN corpus c
    """,
    tags=("llm", "stats", "mix"),
)
def docs_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOTAL-VARIATION distance of each source's unigram distribution
    from the corpus mix — the EXACT-integer companion to
    docs_source_divergence's chi-square: TV = (1/2) sum_tok
    |p_s(tok) - p_c(tok)| is the worst-case probability gap any
    downstream sampler can exploit, and over common denominators it
    is a pure integer: sum over the source's vocabulary of
    |c_st*n_c - c_t*n_s|, plus n_s*(n_c - sum c_t) for every corpus
    token the source never emits (each contributes its full corpus
    mass). tv_num is that exact HUGEINT/DECIMAL numerator (emitted
    BIGINT — exact through ~10^9-token corpora per the benford bound
    class, widen beyond); the single double division by 2*n_s*n_c
    goes through the VARCHAR render. No ordered fold needed — unlike
    the chi-square, the sum is of integers, so partitioning cannot
    reorder doubles.

    Scale shape: token-keyed aggregates (map-side combinable), one
    token-keyed join of the source-vocab frame against the corpus
    totals, one source-keyed reduce; the 1-row corpus count
    broadcasts. Reference basis: SURVEY.md §2.12 mix family (absent
    in reference)."""
    d = table(spark, sf_dir, "documents")
    ex = d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    st = ex.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    s_tot = ex.groupBy("source").agg(F.count("*").alias("n_s"))
    t_tot = ex.groupBy("tok").agg(F.count("*").alias("c_t"))
    corpus = ex.agg(F.count("*").alias("n_c"))
    seen = (
        st.join(F.broadcast(s_tot), "source")
        .join(t_tot, "tok")
        .crossJoin(F.broadcast(corpus))
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(
                    F.col("c_st").cast("decimal(38,0)") * F.col("n_c")
                    - F.col("c_t").cast("decimal(38,0)") * F.col("n_s")
                )
            ).alias("num_seen"),
            F.sum("c_t").alias("ct_seen"),
            F.count("*").alias("n_vocab_seen"),
        )
    )
    num = (
        F.col("num_seen")
        + F.col("n_s").cast("decimal(38,0)")
        * (F.col("n_c") - F.col("ct_seen"))
    )
    return (
        seen.join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(corpus))
        .select(
            "source",
            "n_vocab_seen",
            F.col("n_s").alias("n_tokens_source"),
            F.col("n_c").alias("n_tokens_corpus"),
            num.cast("long").alias("tv_num"),
            (
                num.cast("decimal(38,0)").cast("string").cast("double")
                / (
                    F.lit(2.0)
                    * (F.col("n_s").cast("double") * F.col("n_c"))
                )
            ).alias("tv_distance"),
        )
    )
