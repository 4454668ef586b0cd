"""Sequence packing: greedy bin-packing of documents into fixed token
budgets — the step that turns a filtered corpus into dense fixed-length
training batches (padding waste is the metric it minimizes).

Greedy packing is inherently sequential (each placement depends on the
running fill), so it cannot be a window expression; the scalable form is
PARTITION-LOCAL packing: documents are hash-assigned to workers, each
worker packs its own docs in deterministic (doc id) order via an
Arrow-batched applyInPandas kernel. Bins never cross workers, so the job
parallelizes to any corpus size at the cost of at most one underfull bin
per worker — negligible waste at scale (workers ~ thousands of bins).

Determinism: the worker assignment is the portable md5-based hash (same
value on any engine/run) and packing order inside a worker is doc id —
the same corpus always packs into the same bins.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, worker long, bin_seq long, bin_id long"
)

# bin_id = worker * _BIN_STRIDE + bin_seq: globally unique without any
# cross-worker coordination
_BIN_STRIDE = 1 << 32


def pack_greedy(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    n_workers: int = 64,
) -> DataFrame:
    """Pack rows into bins of <= `budget` total `size_col` (a row larger
    than the budget gets a bin of its own). Returns one row per input row
    with its (worker, bin_seq, bin_id) assignment."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seqs = []
        seq = 0
        used = 0
        for sz in pdf[size_col]:
            sz = int(sz)
            if used > 0 and used + sz > budget:
                seq += 1
                used = 0
            seqs.append(seq)
            used += sz
        out = pd.DataFrame(
            {
                "doc_id": pdf[id_col].astype("int64"),
                "n_tokens": pdf[size_col].astype("int64"),
                "worker": pdf["__worker"].astype("int64"),
                "bin_seq": pd.Series(seqs, dtype="int64"),
            }
        )
        out["bin_id"] = out["worker"] * _BIN_STRIDE + out["bin_seq"]
        return out

    worker = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_workers),
    )
    return (
        df.select(F.col(id_col), F.col(size_col), worker.alias("__worker"))
        .groupBy("__worker")
        .applyInPandas(_pack, schema=_OUT_SCHEMA)
    )
