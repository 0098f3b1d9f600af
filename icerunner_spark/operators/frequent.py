"""Exact frequent-items (heavy hitters) over domains too large to
shuffle (SURVEY.md §2.C sketch family).

The one-pass formulation — ``groupBy(key).count()`` — shuffles the
ENTIRE key domain; at 100 TB a token/URL/entity domain can be billions
of keys, most of them singletons that exist only to be discarded by the
frequency threshold. The classical two-pass scheme bounds the shuffle by
the answer size instead:

1. **Candidate pass, zero shuffle.** Each partition counts its own keys
   (Arrow-batched ``mapInPandas``; a ``collections.Counter`` per
   partition, never per row) and emits only the keys that are locally
   ``threshold``-frequent. By the averaging argument, any key whose
   GLOBAL frequency fraction is >= threshold must be locally
   >= threshold-frequent in at least one partition — so the union of
   local emissions is a guaranteed superset of the true answer. Each
   partition emits at most floor(1/threshold) keys, so the candidate
   set is <= partitions/threshold rows no matter how large the domain.
2. **Exact pass.** A broadcast semi-join restricts the data to candidate
   keys only, and a hash aggregate (map-side combinable, tiny domain)
   produces exact global counts; the final filter re-applies the
   threshold against the exact total, which removes the false positives
   pass 1 admits. Output is EXACT — the sketch only bounds the shuffle,
   never the answer (same contract as the reference's exact operators).

The reference has no frequent-items surface; this is the standard
lossy-counting/Misra-Gries-family construction from the published
heavy-hitters literature re-expressed as two Spark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    df: DataFrame,
    key_col: str,
    *,
    threshold: float,
) -> DataFrame:
    """All values of ``key_col`` whose share of the column's non-null
    rows is >= ``threshold`` (0 < threshold <= 1), with exact counts and
    fractions. Returns (item, cnt, frac) — exact, in two passes with the
    candidate shuffle bounded by partitions/threshold."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    src = df.select(F.col(key_col).alias("item")).filter(
        F.col("item").isNotNull()
    )

    item_type = src.schema["item"].dataType.simpleString()

    # NaN cannot ride the sketch path: Spark groups NaN as EQUAL
    # (NaN = NaN is true in Spark SQL), but Python Counter keys compare
    # unequal across distinct float('nan') objects (fragmenting every
    # NaN row into its own bucket), and Arrow converts a pandas NaN back
    # to NULL on the mapInPandas return — the candidate would arrive as
    # None and the semi-join would never match. NaN is ONE key, so it is
    # counted EXACTLY in the same narrow aggregate that computes the
    # total, and unioned in declaratively when it clears the threshold.
    is_float = item_type in ("float", "double")

    def local_frequent(batches):
        from collections import Counter

        import pandas as pd

        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            # value_counts is vectorized and (dropna=True) skips the
            # NaNs the Spark-side exact count owns; NaN rows still
            # count toward n — the local threshold stays the global one
            for k, c in pdf["item"].value_counts().items():
                counts[k] += int(c)
            n += len(pdf)
        if n:
            cut = threshold * n
            keep = [k for k, c in counts.items() if c >= cut]
            if keep:
                yield pd.DataFrame({"item": keep})

    candidates = src.mapInPandas(
        local_frequent, schema=f"item {item_type}"
    ).distinct()

    total = src.agg(
        F.count(F.lit(1)).alias("__n"),
        (
            F.sum(F.isnan("item").cast("long")) if is_float else F.lit(0)
        ).alias("__n_nan"),
    )
    exact = (
        src.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 1.0 >= F.lit(threshold) * F.col("__n"))
    )
    out = exact.select(
        "item",
        "cnt",
        F.round(F.col("cnt") / F.col("__n"), 6).alias("frac"),
    )
    if is_float:
        nan_row = total.filter(
            F.col("__n_nan") * 1.0 >= F.lit(threshold) * F.col("__n")
        ).select(
            F.lit(float("nan")).cast(item_type).alias("item"),
            F.col("__n_nan").alias("cnt"),
            F.round(F.col("__n_nan") / F.col("__n"), 6).alias("frac"),
        )
        out = out.unionByName(nan_row)
    return out
