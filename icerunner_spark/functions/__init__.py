"""Column-level helper functions (pure pyspark.sql.functions compositions).

Everything here stays JVM-side (whole-stage codegen) — no Python UDFs in
the hot path. These are the building blocks for the similarity / dedup /
text operators.
"""

from icerunner_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from icerunner_spark.functions.text import (
    char_ngrams,
    fingerprint64,
    token_count,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_normalize",
    "char_ngrams",
    "fingerprint64",
    "token_count",
    "tokens",
]
