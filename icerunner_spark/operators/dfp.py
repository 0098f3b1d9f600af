"""Dynamic file pruning: dim-driven fact-file skipping for star joins.

The classic 100 TB star-join failure is scanning the whole fact table to
join a dim side that a selective filter already shrank to a sliver: the
fact scan is O(table) even though only O(matching files) could ever find
a join partner. Engines fix this below the optimizer — Delta's dynamic
file pruning and Iceberg's runtime filtering push the *dim side's join
keys* into the fact table's file planning. The reference has no planner
at all (everything delegates to DuckDB, icerunner.py:200-207), so this
is a §2.C-style scale extension, not parity.

Spark-first composition: the dim side's distinct join keys are ALREADY
bounded driver-side data whenever DFP applies (if the dim side is big,
no file skip can help the fact side), so we collect at most
``max_keys + 1`` of them — one bounded job — and turn them into the
snapshot format's planning predicates:

- ``len(keys) <= max_keys`` → an ``in`` predicate: per-file min/max
  bounds AND per-file bloom sidecars (``write.bloom.columns``) both
  skip; this is the needle path — point-ish dims read O(1) fact files.
- more keys than that → fall back to the dim's [min, max] range — two
  values over the wire regardless of dim size; skipping still wins
  whenever ingest order correlates with the key (time/key-ordered
  commits), which is the common 100 TB layout.

Soundness: pruning only ever drops files whose bounds/bloom PROVE no
key matches, and the residual Catalyst filter plus the join itself keep
results exact, so the composition is a pure IO optimization. Only
inner/semi flavors are offered — pruning the fact side is unsound for
outer joins that must keep unmatched fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_JOIN_KINDS = {"inner", "semi", "left_semi", "leftsemi"}


def dim_join_predicates(
    dim_df: DataFrame,
    dim_key: str,
    fact_key: str,
    *,
    max_keys: int = 1000,
) -> list[tuple]:
    """The ``scan(where=...)`` conjuncts a dim side implies for the fact
    side's file planning. One bounded Spark job: at most ``max_keys + 1``
    distinct keys cross to the driver; past that, only the dim's
    [min, max] (a single 1-row aggregate) does. Null dim keys are
    dropped — they can never equi-join."""
    dkeys = (
        dim_df.select(F.col(dim_key).alias("__dfp_k"))
        .where(F.col("__dfp_k").isNotNull())
        .distinct()
    )
    sample = [r[0] for r in dkeys.limit(max_keys + 1).collect()]
    if len(sample) <= max_keys:
        return [(fact_key, "in", sorted(sample))]
    lo, hi = dkeys.agg(F.min("__dfp_k"), F.max("__dfp_k")).first()
    return [(fact_key, ">=", lo), (fact_key, "<=", hi)]


def dynamic_pruned_join(
    fact_table,
    fact_key: str,
    dim_df: DataFrame,
    dim_key: str,
    *,
    how: str = "inner",
    max_keys: int = 1000,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Join a snapshot-format fact table to a (filtered) dim DataFrame,
    planning the fact scan through the dim's join keys so non-matching
    fact files are never read. ``fact_table`` is an ``IceTable``;
    min/max manifest stats prune always, bloom sidecars additionally
    prune the ``in`` path when the table writes them. The join strategy
    itself is left to Catalyst/AQE — the dim side is NOT force-broadcast
    (it may still be SF-proportional; AQE broadcasts it exactly when it
    is actually small)."""
    if how not in _JOIN_KINDS:
        raise ValueError(
            f"dynamic_pruned_join supports {sorted(_JOIN_KINDS)}, not {how!r}:"
            " fact-side pruning is unsound for outer joins"
        )
    preds = dim_join_predicates(dim_df, dim_key, fact_key, max_keys=max_keys)
    pruned = fact_table.scan(snapshot_id=snapshot_id, where=preds)
    cond = pruned[fact_key] == dim_df[dim_key]
    return pruned.join(
        dim_df, on=cond, how="left_semi" if how in ("semi", "leftsemi") else how
    )
