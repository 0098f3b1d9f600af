"""AS-OF join: for each left row, attach the latest right row whose time is
at-or-before the left row's time, per key.

Catalyst has no native ASOF operator (SURVEY.md §2.B "AS-OF join" — DuckDB
has one; the reference reaches it through its SQL passthrough). The
standard scalable emulation used here:

1. union the two inputs with a side marker (right rows sort before left
   rows at equal timestamps, so "at-or-before" includes ties);
2. one shuffle: partition by key, in-partition sort by (time, side);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding window
   carries the latest right-side values forward;
4. keep left rows.

Cost: exactly one shuffle + one sort — the same asymptotic profile as a
native merge-based ASOF join, with no row multiplication (unlike a range
self-join which can go quadratic on hot keys). Safe at 100 TB provided the
key space distributes; for a single global key, pre-salt by time-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
) -> DataFrame:
    """ASOF-join ``right_values`` columns from ``right`` onto ``left``.

    direction='backward': latest right.time <= left.time (default, like
    pandas.merge_asof / DuckDB ``ON l.t >= r.t``).
    direction='forward': earliest right.time >= left.time.

    Right rows must be unique per (key, time) for a deterministic result —
    pre-aggregate if they are not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    key, ts = "__asof_key", "__asof_ts"
    side = "__asof_side"  # 0 = right (sorts first on ties), 1 = left

    # A right value name colliding with a left column (or the markers) would
    # make l_marked/r_marked select two same-named columns — ambiguous-column
    # failures or silently wrong null-carrying. Fail loudly instead.
    clash = set(right_values) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_values collide with left columns: {sorted(clash)}; "
            "alias them on the right side before the asof join"
        )
    reserved = {key, ts, side}
    bad = reserved & (set(left.columns) | set(right_values))
    if bad:
        raise ValueError(f"column names {sorted(bad)} are reserved by asof_join")

    lcols = [c for c in left.columns]
    l_marked = left.select(
        F.col(left_on).alias(key),
        F.col(left_time).alias(ts),
        F.lit(1).alias(side),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(v) for v in right_values],
    )
    r_marked = right.select(
        F.col(right_on).alias(key),
        F.col(right_time).alias(ts),
        F.lit(0).alias(side),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(v) for v in right_values],
    )
    unioned = l_marked.unionByName(r_marked)

    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.asc(ts), F.asc(side))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [F.last(v, ignorenulls=True).over(w).alias(v) for v in right_values]
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.asc(ts), F.desc(side))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = [F.first(v, ignorenulls=True).over(w).alias(v) for v in right_values]

    out = unioned.select(key, ts, side, *lcols, *carried).filter(F.col(side) == 1)
    return out.select(*lcols, *right_values)
