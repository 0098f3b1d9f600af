"""Incremental materialized aggregate views: every refresh must equal a
full recompute of the base, while only ever reading the changelog delta
and committing one upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icerunner_spark.matview import IncrementalAggView
from icerunner_spark.sources.testdata import load_table
from icerunner_spark.table import IceTable


def _recompute(base: IceTable, keys, sums):
    agg = [F.count(F.lit(1)).cast("long").alias("row_count")]
    for o, e in sums.items():
        agg.append(F.sum(F.expr(e)).alias(o))
    return base.scan().groupBy(*keys).agg(*agg)


def _round(v):
    # incremental double sums associate differently than a full
    # recompute; equality holds to FP noise (~1e-8 relative)
    return round(v, 3) if isinstance(v, float) else v


def _rows(df, keys):
    return sorted(
        (
            (
                [r[k] for k in keys],
                r["row_count"],
                *[_round(r[c]) for c in df.columns if c not in keys and c != "row_count"],
            )
            for r in df.collect()
        ),
        key=repr,  # None group keys sort too
    )


def _assert_matches(view: IncrementalAggView, sums):
    got = _rows(view.read(), view.keys)
    want = _rows(_recompute(view.base, view.keys, sums), view.keys)
    assert got == want


def test_incremental_refresh_matches_full_recompute(spark, warehouse):
    orders = load_table(spark, "orders", "/root/testdata/sf0.001").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = IceTable(spark, warehouse + "/orders")
    base.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    sums = {"total_price": "o_totalprice", "cust_sum": "o_custkey"}
    view = IncrementalAggView(
        base, warehouse + "/orders_by_status", ["o_orderstatus"], sums
    )
    view.create()
    _assert_matches(view, sums)

    # append + merge-on-read delete, then ONE refresh over both
    base.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    base.delete_where("o_orderkey % 7 = 0", mode="merge-on-read")
    n_before = len(view.mv.snapshots())
    snap = view.refresh()
    assert snap is not None and snap.operation == "merge"
    # atomic: exactly one commit moved the view, cursor rides it
    assert len(view.mv.snapshots()) == n_before + 1
    assert view.cursor() == base.current_snapshot().snapshot_id
    _assert_matches(view, sums)

    # no-op refresh publishes nothing
    assert view.refresh() is None
    assert len(view.mv.snapshots()) == n_before + 1

    # a second change cycle refreshes incrementally again
    base.append(orders.filter(F.col("o_orderkey") % 3 == 2))
    base.delete_where("o_custkey % 11 = 0", mode="merge-on-read")
    view.refresh()
    _assert_matches(view, sums)


def test_null_group_keys_and_null_sum_semantics(spark, warehouse):
    df = spark.createDataFrame(
        [
            ("a", 1.0), ("a", None), ("b", None), ("b", None),
            (None, 5.0), (None, 2.0), ("gone", 9.0),
        ],
        "k string, v double",
    )
    base = IceTable(spark, warehouse + "/t")
    base.create(df)
    sums = {"v_sum": "v"}
    view = IncrementalAggView(base, warehouse + "/mv", ["k"], sums)
    view.create()
    _assert_matches(view, sums)

    # delete the only non-null 'a' value -> SUM must go back to NULL;
    # delete ALL 'gone' rows -> group disappears (tombstone filtered);
    # touch the NULL key group -> null-safe upsert must UPDATE, not
    # duplicate, the existing NULL-key row
    base.delete_where("v = 1.0 OR k = 'gone'", mode="merge-on-read")
    base.append(spark.createDataFrame([(None, 3.0)], "k string, v double"))
    view.refresh()
    _assert_matches(view, sums)
    got = {tuple([r["k"]]): (r["row_count"], r["v_sum"]) for r in view.read().collect()}
    assert got[("a",)] == (1, None)
    assert ("gone",) not in got
    assert got[(None,)] == (3, 10.0)
    # exactly one physical row per group key in the materialization
    mv_rows = view.mv.scan().groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in mv_rows)


def test_overwrite_forces_full_refresh(spark, warehouse):
    df = spark.createDataFrame([("x", 1), ("y", 2)], "k string, v int")
    base = IceTable(spark, warehouse + "/t")
    base.create(df)
    sums = {"v_sum": "v"}
    view = IncrementalAggView(base, warehouse + "/mv", ["k"], sums)
    view.create()

    base.overwrite(spark.createDataFrame([("x", 10), ("z", 7)], "k string, v int"))
    with pytest.raises(ValueError, match="overwrite|rollback"):
        view.refresh()
    view.full_refresh()
    _assert_matches(view, sums)
    assert view.cursor() == base.current_snapshot().snapshot_id
    # incremental maintenance resumes from the rebuilt cursor
    base.append(spark.createDataFrame([("z", 3)], "k string, v int"))
    view.refresh()
    _assert_matches(view, sums)
