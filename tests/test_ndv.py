"""Per-file HLL NDV sketches (write.ndv.columns): metadata-cost distinct
counts that union across commits, fall back to scanning only uncovered
files, and survive renames."""

from __future__ import annotations

from pyspark.sql import functions as F

from icerunner_spark.table import IceTable


def _df(spark, n=20_000, mod=5_000):
    return spark.range(n).select(
        (F.col("id") % mod).alias("k"),
        F.concat(F.lit("u-"), F.col("id") % 777).alias("s"),
        F.col("id").alias("v"),
    )


def test_ndv_union_across_commits(spark, warehouse):
    df = _df(spark)
    t = IceTable(spark, warehouse + "/t")
    t.create(
        df.filter(F.col("v") % 2 == 0),
        properties={"write.ndv.columns": "k,s"},
    )
    # second commit repeats most k values: union must converge to the
    # true distinct count, never sum per-file counts
    t.append(df.filter(F.col("v") % 2 == 1))
    est = t.approx_ndv("k")
    assert abs(est - 5_000) / 5_000 < 0.05
    est_s = t.approx_ndv("s")
    assert abs(est_s - 777) / 777 < 0.05


def test_ndv_scan_fallback_for_uncovered_files(spark, warehouse):
    df = _df(spark, n=6_000, mod=1_000)
    t = IceTable(spark, warehouse + "/f")
    t.create(df.filter(F.col("v") < 3_000))  # no sketches staged
    t.set_properties({"write.ndv.columns": "k"})
    t.append(df.filter(F.col("v") >= 3_000))  # sketched
    est = t.approx_ndv("k")
    assert abs(est - 1_000) / 1_000 < 0.05


def test_ndv_survives_rename_and_empty_table(spark, warehouse):
    df = _df(spark, n=4_000, mod=800)
    t = IceTable(spark, warehouse + "/r")
    t.create(df, properties={"write.ndv.columns": "k"})
    t.rename_column("k", "key_id")
    est = t.approx_ndv("key_id")
    assert abs(est - 800) / 800 < 0.05

    t2 = IceTable(spark, warehouse + "/e")
    t2.create(df.filter(F.lit(False)), properties={"write.ndv.columns": "k"})
    assert t2.approx_ndv("k") == 0
