"""Skew mitigation for power-law join keys (SURVEY.md §2.B "Joins" scale
note; the reference has no distribution concept at all — single-process
DuckDB behind icerunner.py:200-207).

AQE's skew-join splitting (on in this engine's session defaults) handles
most runtime skew by splitting oversized sort-merge partitions. Salting
is the explicit fallback for the cases AQE can't fix: a single key too
hot for any split to help (every split still joins against the full
right-side partition), shuffled-hash joins, or pre-AQE-final stages
feeding window functions partitioned by the hot key.

Mechanics: the skewed (big) side scatters each row into one of
``n_salts`` sub-keys via a deterministic hash of a per-row column; the
small side replicates ``n_salts``-fold so every sub-key finds its match.
The hot key's rows now land on ``n_salts`` tasks instead of one. Cost:
|small| x n_salts replication — keep the replicated side the dimension
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    salt_by: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to power-law skew in ``skewed[on]``.

    ``salt_by`` must be a (near-)unique column of the skewed side — its
    hash spreads the hot key's rows evenly and deterministically (no RNG:
    same input, same placement, retry-safe). The small side is replicated
    once per salt, so the join key becomes (on..., salt) and no task sees
    more than ~1/n_salts of any key's rows."""
    on = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_by).cast("string")), F.lit(n_salts))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, on + [_SALT], how).drop(_SALT)


def capped_topk_per_key(
    df: DataFrame,
    key: str | list[str],
    order_by: list,
    k: int,
    *,
    salt_by: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact top-k rows per key, robust to hot keys (the two-phase cap
    `per_source_caps` documents): phase 1 ranks within (key, salt) and
    keeps k rows per salt — a hot key's rows spread over n_salts tasks,
    so no single task ever sorts a whole mega-key — phase 2 ranks the
    ≤ k·n_salts survivors per key exactly. Identical output to the
    single-phase window (any global top-k row is also top-k within its
    salt partition; pytest pins the equality), with per-task work bounded
    by max(|key|/n_salts, k·n_salts) instead of |key|.

    ``order_by`` must totally order rows (include a unique tiebreaker) —
    same requirement the single-phase form has for determinism. The rank
    column is exposed as ``rk``."""
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.xxhash64(F.col(salt_by).cast("string")), F.lit(n_salts))
    w1 = Window.partitionBy(*keys, _SALT).orderBy(*order_by)
    pre = (
        df.withColumn(_SALT, salt)
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= k)
        .drop("__rk1", _SALT)
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return pre.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)
