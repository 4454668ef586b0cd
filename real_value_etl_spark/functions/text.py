"""Text-analysis column functions, portable across Spark and the DuckDB oracle.

Every function here has two halves kept in lock-step:
- a Spark `Column` expression builder (JVM-side, whole-stage codegen — no
  Python UDFs anywhere on this path);
- a DuckDB SQL snippet builder (``*_sql``) using the *same* constants and the
  same arithmetic, so driver value-hash comparison is bit-exact.

The portable token hash is the first 8 hex digits of md5 interpreted as an
unsigned 32-bit integer — md5 is byte-identical across engines, and the
32-bit value fits losslessly in an int64 in both.

The reference has no text-analysis surface (SURVEY.md §2.12 — these are the
north-star LLM-pipeline operators); design is Spark-first: tokenize/hash/
minhash are array expressions evaluated inside codegen, aggregations are
hash-aggregates with map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared constants (single source of truth for Spark AND oracle SQL) ----

# Mersenne prime 2^61-1; with a < 2^28 and h < 2^32, a*h + b < 2^61 — no
# int64 overflow in either engine.
# Smallest prime above 2^32. P must sit just above the 32-bit hash range:
# with the previous P = 2^61-1, A[i]*h + B[i] (max ~1.3e18) NEVER reached
# P, so the mod never wrapped and every "permutation" was a monotone
# transform of the same argmin shingle — all 16 signature slots were
# perfectly correlated (LSH degenerated to single-hash collisions and
# silently lost recall; tests/test_round3_ops.py pins the fix). With P
# just above the hash range, A[i]*h wraps ~A[i] times and the 16 minima
# come from genuinely different shingles. A[i]*h + B[i] <= ~1.27e18 still
# fits int64 exactly in both engines.
MINHASH_P = 4294967311
# Deterministic coefficient pairs for the k=16 minhash permutations
# h_i(x) = (A[i]*x + B[i]) mod P. Odd multipliers, fixed seeds.
MINHASH_A = [
    15485863, 32452843, 49979687, 67867967, 86028121, 104395301,
    122949823, 141650939, 160481183, 179424673, 198491317, 217645177,
    236887691, 256203161, 275604541, 295075147,
]
MINHASH_B = [
    179426549, 198491317, 217645199, 236887699, 256203221, 275604547,
    295075153, 314606891, 334214459, 353868013, 373587883, 393342739,
    413158511, 433024223, 452930459, 472882027,
]
MINHASH_K = 16
LSH_BANDS = 8
LSH_ROWS = 2  # 8 bands x 2 rows = 16 signature slots

# Rolling-fingerprint parameters: P31 keeps acc < 2^31 so acc*B < 2^51.
FP_BASE = 1000003
FP_MOD = (1 << 31) - 1

# Tiny per-language function-word lists for the n-gram/stopword language
# heuristic (public-knowledge wordlists, trimmed).
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "zh": ["de5", "shi4", "zai4", "le5", "he2", "you3"],
}


# --------------------------- Spark column builders -------------------------


def tokens(col: Column) -> Column:
    """Ordered whitespace tokens with empties removed (split keeps order)."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles ('w1 w2 w3') from an ALREADY-MATERIALIZED
    token array column. Pass a plain column reference, not an inline
    tokens(...) expression — Catalyst inlines lambda arguments, so an inline
    split would be re-evaluated per element_at (quadratic per row).
    """
    # guard: sequence(1, x) DESCENDS for x<1, so short docs need an explicit
    # empty result (oracle mirror: end-exclusive range() is naturally empty)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        )
    )).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Single-expression form (convenient but re-splits per element_at —
    prefer a two-step projection via shingles_from_tokens on hot paths)."""
    return shingles_from_tokens(tokens(col), n)


def portable_hash32(col: Column) -> Column:
    """Unsigned 32-bit hash from the md5 hex prefix; equals the DuckDB side
    ``CAST('0x' || substring(md5(x),1,8) AS BIGINT)`` bit-for-bit."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_expr(h: Column, i: int) -> Column:
    """i-th permuted hash of an already-hashed token column."""
    return (F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    token stream, ``fp = fold(tokens, 0, (acc, t) -> (acc*B + h(t)) % M)``."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + portable_hash32(t)) % FP_MOD,
    )


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    """(lang, hit-count) heuristic scores: distinct-token overlap with each
    language's function-word list."""
    toks = distinct_tokens(col)
    return [
        (
            lang,
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))),
        )
        for lang, words in LANG_STOPWORDS.items()
    ]


# --------------------------- DuckDB SQL builders ---------------------------
# (mirror snippets; interpolated into oracle strings so constants can't drift)


def tokens_sql(col: str = "text") -> str:
    return f"list_filter(string_split({col}, ' '), x -> x <> '')"


def distinct_tokens_sql(col: str = "text") -> str:
    return f"list_distinct({tokens_sql(col)})"


def shingles_sql(col: str = "text", n: int = 3) -> str:
    parts = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return (
        f"list_distinct([{parts} for i in range(1, greatest(len(ts)-{n - 2}, 1))])"
    )  # expects alias ts = tokens_sql(col) in scope


def portable_hash32_sql(col: str) -> str:
    return f"CAST(('0x' || substring(md5({col}), 1, 8)) AS BIGINT)"


def minhash_sql(h: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {h} + {MINHASH_B[i]}) % {MINHASH_P})"


def rolling_fingerprint_sql(col: str = "text") -> str:
    return (
        f"CASE WHEN len({tokens_sql(col)}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tokens_sql(col)}, t -> {portable_hash32_sql('t')})), "
        f"(acc, h) -> (acc * {FP_BASE} + h) % {FP_MOD}) END"
    )
