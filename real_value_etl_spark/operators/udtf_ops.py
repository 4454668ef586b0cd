"""Python UDTF extension point (table-valued functions, Spark 4).

SURVEY.md §2.10: the reference's extension surface is row-wise pandas
apply; this engine's sanctioned extension points are Arrow-batched Pandas
UDFs (operators/multimodal.py), applyInPandasWithState (streaming/jobs.py)
and — for one-row-to-many-rows shapes that are not expressible as a column
expression + explode — the Python UDTF below.

UDTFs run on executors per-partition like any generator; use them ONLY
when the built-in explode/posexplode/inline family cannot express the
expansion (here: a greedy stateful text splitter whose chunk boundaries
depend on accumulated length — inherently sequential per row, trivially
parallel across rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf


@udtf(returnType="span_idx int, start_tok int, n_toks int, piece string")
class GreedyTokenSpans:
    """Split a document into maximal spans of <= max_toks whitespace tokens
    WITHOUT breaking tokens — the greedy packing a fixed-context tokenizer
    feed uses. Yields (span_idx, start_tok, n_toks, piece)."""

    def eval(self, text: str, max_toks: int):  # noqa: D102
        if text is None:
            return
        toks = [t for t in text.split(" ") if t != ""]
        idx = 0
        for start in range(0, len(toks), max_toks):
            piece = toks[start : start + max_toks]
            yield idx, start + 1, len(piece), " ".join(piece)
            idx += 1


def split_spans(df: DataFrame, text_col: str, max_toks: int) -> DataFrame:
    """Lateral-join every row of `df` with its UDTF spans."""
    return df.lateralJoin(
        GreedyTokenSpans(F.col(text_col).outer(), lit(max_toks))
    )
