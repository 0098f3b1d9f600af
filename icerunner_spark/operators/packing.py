"""Sequence packing: bin documents into fixed token-budget training
sequences (the "packing" step of an LLM data pipeline).

Not in the reference (icerunner has no corpus tooling); SURVEY.md §2.C
scale extension. The classic formulation is first-fit-decreasing (FFD)
bin packing, which is inherently sequential — so the corpus is first
scattered into deterministic hash buckets (embarrassingly parallel,
one ``applyInPandas`` group per bucket) and FFD runs vectorized inside
each bucket. Packing quality is per-bucket FFD (≤ 11/9·OPT + 1 bins);
cross-bucket waste is at most one partial sequence per bucket, which is
negligible when buckets hold thousands of documents. At 100 TB the
bucket count scales with the cluster (buckets ≈ executors × 4) and no
single task ever sees more than corpus/n_buckets rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

PACKING_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("seq_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("offset", LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    *,
    budget: int = 512,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every document to a (bucket, seq_id, offset) training slot.

    First-fit-decreasing per hash bucket: documents sorted by
    (n_tokens DESC, id ASC) — the id tiebreak makes the packing
    deterministic — each placed into the first open sequence with room.
    Documents longer than ``budget`` get a dedicated sequence (the
    caller truncates or splits them; flagging beats silent data loss).
    Output columns: bucket, seq_id, doc_id, n_tokens, offset — enough
    to materialize packed sequences with a later join + sort.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []  # current token fill per open sequence
        seq_ids, offsets = [], []
        for tok in pdf["n_tokens"].to_numpy():
            placed = False
            if tok <= budget:
                for s, fill in enumerate(fills):
                    if fill + tok <= budget:
                        seq_ids.append(s)
                        offsets.append(fill)
                        fills[s] = fill + tok
                        placed = True
                        break
            if not placed:  # oversized doc, or no open sequence fits
                seq_ids.append(len(fills))
                offsets.append(0)
                fills.append(tok)
        pdf = pdf.assign(seq_id=seq_ids, offset=offsets)
        return pdf[["bucket", "seq_id", "doc_id", "n_tokens", "offset"]]

    prepared = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("bucket"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
    )
    return prepared.groupBy("bucket").applyInPandas(pack, PACKING_SCHEMA)
