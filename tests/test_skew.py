"""Skew robustness on a SKEWED fixture (VERDICT r4 item 6): the uniform
TPC-H tables never stress the salting/capping machinery, so these tests
build a seeded hot-key frame (one key owning 30% of all rows) and pin:

- salted_join spreads the hot key across ~n_salts tasks where the
  unsalted sort-merge plan funnels it into ONE (results identical);
- AQE's skew-join split actually fires on the fixture (plan metric);
- the LSH band-bucket cap drops a degenerate template bucket instead of
  expanding it quadratically, while real near-dup pairs survive;
- capped_topk_per_key equals the single-phase window on the hot key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

HOT = 7
N = 100_000
N_KEYS = 1_000


def _hot_key_frame(spark):
    """Deterministic power-law frame: key HOT owns 30% of N rows, the
    rest spread uniformly over N_KEYS keys. `rid` is the unique per-row
    salt/tiebreak column."""
    return spark.range(N).select(
        F.when(F.col("id") % 10 < 3, F.lit(HOT))
        .otherwise(F.col("id") % N_KEYS)
        .alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") % 97).alias("v"),
    )


def _dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


@pytest.fixture()
def plain_join_conf(spark):
    """Force the worst case: no AQE rescue, no broadcast — the shape a
    huge fact-to-fact join has when both sides exceed broadcast size."""
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the session fixture runs 4 shuffle partitions; spreading 16 salts
    # needs room to spread
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    yield spark
    for k, val in saved.items():
        spark.conf.set(k, val)


def _hot_partition_spread(joined) -> int:
    """How many tasks the hot key's joined rows landed on."""
    return (
        joined.where(F.col("k") == HOT)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )


def test_salted_join_spreads_hot_key(plain_join_conf):
    """Unsalted: every hot-key row hash-routes to ONE task — the straggler
    that stalls a 1000-executor stage. Salted: the same join lands the hot
    key on ~n_salts tasks, with identical results."""
    from icerunner_spark.operators.skew import salted_join

    spark = plain_join_conf
    fact, dim = _hot_key_frame(spark), _dim(spark)

    plain = fact.join(dim, "k")
    assert _hot_partition_spread(plain) == 1  # the straggler, proven

    salted = salted_join(fact, dim, "k", salt_by="rid", n_salts=16)
    assert _hot_partition_spread(salted) >= 8  # spread across tasks

    # same rows either way
    a = plain.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    b = salted.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_aqe_skew_join_split_fires_on_fixture(spark):
    """With sizing thresholds scaled to the fixture, AQE's skew-join
    handling must actually split the hot partition — the runtime rescue
    the session defaults rely on for plans we don't hand-salt. Pinned on
    the executed plan's own markers (SortMergeJoin(skew=true) /
    AQEShuffleRead ... skewed)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # skew detection compares against the MEDIAN partition: at the
        # session fixture's 4 partitions the hot one is only ~2.7x the
        # median (no split); 32 partitions make it ~14x
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        j = _hot_key_frame(spark).join(_dim(spark), "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "skewed" in plan, plan[:2000]
    finally:
        for k, val in saved.items():
            if val is not None:
                spark.conf.set(k, val)


def test_lsh_max_bucket_drops_degenerate_bucket(spark):
    """A template/boilerplate corpus is LSH's skew nightmare: one band
    bucket holding every copy would expand to |bucket|^2/2 pairs. The
    max_bucket cap must DROP the degenerate bucket (no quadratic
    blow-up) while genuine near-dup pairs in healthy buckets survive."""
    from icerunner_spark.operators.dedup import minhash_lsh_candidates

    template = [(i, "the quick brown fox jumps over the lazy dog " * 5)
                for i in range(300)]
    near = [
        (1000, "completely different content about spark adaptive execution plans"),
        (1001, "completely different content about spark adaptive execution plan"),
    ]
    lone = [(2000, "a third unrelated document mentioning neither of the others")]
    df = spark.createDataFrame(template + near + lone, "doc_id long, text string")

    pairs = minhash_lsh_candidates(df, "doc_id", "text", max_bucket=100)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    # the 300-copy template bucket (> max_bucket) was dropped: none of its
    # 300*299/2 = 44850 pairs materialize
    assert not any(a < 1000 and b < 1000 for a, b in got)
    # the genuine near-dup pair in a healthy bucket survives
    assert (1000, 1001) in got
    # without the cap the degenerate bucket WOULD expand — the cap is the
    # difference between ~1 and ~45k candidate pairs here
    uncapped = minhash_lsh_candidates(df, "doc_id", "text", max_bucket=100_000)
    assert uncapped.count() > 40_000
    assert len(got) < 10


def test_capped_topk_per_key_equals_single_phase_on_hot_key(spark):
    """Two-phase salted top-k must be EXACTLY the single-phase window's
    answer on the skewed fixture — the cap changes task shape, never
    results."""
    from icerunner_spark.operators.skew import capped_topk_per_key

    df = _hot_key_frame(spark)
    order = [F.desc("v"), F.asc("rid")]
    capped = capped_topk_per_key(df, "k", order, 5, salt_by="rid", n_salts=8)
    w = Window.partitionBy("k").orderBy(*order)
    single = (
        df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, single.collect())
    )
