"""PII redaction: regex-based scrubbing of emails / phone numbers from text
columns (SURVEY.md §2.12 north-star family — no reference analogue; the
reference's only text ops are concat/regex-extract, transformation.py:36-38,
:371-384).

A standard pre-training-corpus step: detect and mask personally identifiable
substrings before a document enters a training mix. Patterns are anchored
constants shared by the Spark expressions and the DuckDB oracle generator so
the two sides cannot drift; every pattern is valid in BOTH Java regex (Spark)
and RE2 (DuckDB) — no lookarounds, no backrefs.

Scale: pure codegen'd `regexp_replace`/`regexp_count` expressions — per-row,
no shuffle, no UDF; a scrub pass over 100 TB is embarrassingly parallel and
pipelines into whatever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (kind, pattern, replacement) — order matters: applied left to right.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,4}", "<email>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<phone>"),
)


def scrub(col: Column) -> Column:
    """Mask every PII match in `col` (all patterns, all occurrences)."""
    for _, pat, rep in PII_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    return col


def pii_counts(col: Column) -> list[tuple[str, Column]]:
    """Per-kind match counts (computed BEFORE scrubbing)."""
    return [(kind, F.regexp_count(col, F.lit(pat))) for kind, pat, _ in PII_PATTERNS]


def scrub_sql(expr: str) -> str:
    """DuckDB expression applying the same scrub to a SQL expression."""
    for _, pat, rep in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def pii_counts_sql(expr: str) -> list[tuple[str, str]]:
    """DuckDB per-kind match-count expressions."""
    return [
        (kind, f"len(regexp_extract_all({expr}, '{pat}'))")
        for kind, pat, _ in PII_PATTERNS
    ]
