"""Physical-plan assertions (icerunner_spark/plans): the scale properties
the 100 TB design depends on must hold in the actual Catalyst plans —
filter pushdown into parquet scans, column pruning, broadcast joins for
dims, codegen coverage. A regression here is a performance bug even when
results stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from icerunner_spark import queries as q
from icerunner_spark.plans import plan_report
from icerunner_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.01"


def _report(spark, name):
    return plan_report(q.queries()[name](spark, SF))


def test_q6_filters_pushed_and_columns_pruned(spark):
    r = _report(spark, "q6_revenue_forecast")
    scan = r.scan_for("lineitem.parquet")
    assert scan is not None
    # all four predicates reach the scan
    pushed = " ".join(scan.pushed_filters)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    # 16-column fact table, 4-column read
    assert set(scan.read_columns) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
    }
    assert r.joins == []


def test_q3_broadcasts_dims(spark):
    r = _report(spark, "q3_shipping_priority")
    # customer (filtered dim) and orders side must broadcast — no
    # sort-merge join anywhere in this plan at these sizes
    assert r.join_strategies == {"BroadcastHashJoin"}
    cust = r.scan_for("customer.parquet")
    assert cust is not None and len(cust.read_columns) == 2
    assert any("c_mktsegment" in f for f in cust.pushed_filters)


def test_q5_five_way_join_all_broadcast(spark):
    r = _report(spark, "q5_region_revenue")
    assert r.join_strategies == {"BroadcastHashJoin"}
    assert len(r.joins) == 5
    # the fact scan reads only join keys + money columns
    li = r.scan_for("lineitem.parquet")
    assert li is not None and len(li.read_columns) <= 4


def test_semi_join_stays_semi(spark):
    r = _report(spark, "semi_join_customers_with_open_orders")
    assert "LeftSemi" in r.text or "left_semi" in r.text.lower()


def test_dedup_fingerprint_single_shuffle(spark):
    """Exact dedup = one hash-agg shuffle on the 8-byte fingerprint; the
    document text column must not be read past the projection."""
    r = _report(spark, "dedup_exact_fingerprint")
    assert r.n_exchanges <= 1, r.text
    scan = r.scan_for("documents.parquet")
    assert scan is not None
    assert "doc_id" in scan.read_columns and "text" in scan.read_columns
    assert "source" not in scan.read_columns  # pruned


def test_codegen_covers_agg_queries(spark):
    # codegen ids only appear in the AQE *final* plan, so execute first
    for name in ("q1_pricing_summary", "q6_revenue_forecast"):
        r = plan_report(q.queries()[name](spark, SF), execute=True)
        assert r.codegen_stages >= 1, f"{name} has no codegen span"


def test_projection_prunes_to_scan(spark):
    """A 2-column projection over the 16-column lineitem must scan 2."""
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    r = plan_report(li)
    scan = r.scan_for("lineitem.parquet")
    assert scan is not None
    assert set(scan.read_columns) == {"l_orderkey", "l_quantity"}


def test_limit_does_not_full_scan(spark):
    df = load_table(spark, "lineitem", SF).limit(5)
    r = plan_report(df)
    assert "GlobalLimit" in r.text or "CollectLimit" in r.text


def test_broadcast_hint_respected(spark):
    small = load_table(spark, "nation", SF)
    big = load_table(spark, "customer", SF)
    j = big.join(F.broadcast(small), big.c_nationkey == small.n_nationkey)
    r = plan_report(j)
    assert "BroadcastHashJoin" in r.join_strategies


def test_partition_pruning_on_date_layout(spark, tmp_path):
    """Date-partitioned layout (sources/layout.py): a one-day filter must
    prune to that day's partition at planning time."""
    from icerunner_spark.sources.layout import (
        read_partitioned,
        with_date_partition,
        write_partitioned,
    )

    events = load_table(spark, "events", SF)
    path = str(tmp_path / "events_by_date")
    write_partitioned(
        with_date_partition(events, "ts"), path, partition_by=["p_date"]
    )
    day = read_partitioned(spark, path).filter(F.col("p_date") == "2024-01-05")
    r = plan_report(day)
    # partition filter present, and NOT as a pushed data filter
    assert "PartitionFilters" in r.text
    assert "p_date" in r.text.split("PartitionFilters", 1)[1].split("\n")[0]
    # correctness of the pruned read
    expect = events.filter(F.to_date("ts") == "2024-01-05").count()
    assert day.count() == expect and expect > 0


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with no
    Exchange on either side — the co-located-join layout for 100 TB
    facts (sources/layout.py write_bucketed)."""
    from icerunner_spark.sources.layout import write_bucketed

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    write_bucketed(
        cust, "cust_bkt", bucket_by=["c_custkey"], n_buckets=8,
        sort_by=["c_custkey"], path=str(tmp_path / "cust_bkt"),
    )
    write_bucketed(
        orders, "ord_bkt", bucket_by=["o_custkey"], n_buckets=8,
        sort_by=["o_custkey"], path=str(tmp_path / "ord_bkt"),
    )
    try:
        c = spark.table("cust_bkt").hint("merge")
        o = spark.table("ord_bkt").hint("merge")
        j = c.join(o, c.c_custkey == o.o_custkey).select(
            "c_custkey", "o_orderkey", "o_totalprice"
        )
        r = plan_report(j)
        assert "SortMergeJoin" in r.join_strategies
        assert r.n_exchanges == 0, f"bucketed join still shuffles:\n{r.text}"
        # sanity: the join actually returns the equi-join cardinality
        expect = cust.join(orders, cust.c_custkey == orders.o_custkey).count()
        assert j.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS cust_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_sql_udfs_inline_and_match_column_builders(spark):
    """Spark 4 SQL UDFs (functions/sql_udfs.py) are expression macros:
    Catalyst inlines the bodies (no Python eval operator in the plan),
    and every ice_* function computes bit-identically to the
    functions/text.py / functions/vector.py Column builder it mirrors."""
    import pyspark.sql.functions as F

    from icerunner_spark.functions.sql_udfs import register_sql_functions
    from icerunner_spark.functions.text import (
        fingerprint64,
        md5_bucket,
        redact_pii,
        token_count,
    )
    from icerunner_spark.functions.vector import cosine_similarity
    from icerunner_spark.sources.testdata import load_table

    register_sql_functions(spark)
    d = load_table(spark, "documents", "/root/testdata/sf0.001")
    d.createOrReplaceTempView("plans_docs")
    got = spark.sql(
        "SELECT doc_id, ice_token_count(text) AS n, "
        "ice_fingerprint64(text) AS fp, ice_redact_pii(text) AS red, "
        "ice_md5_bucket(CAST(doc_id AS STRING), 's') AS b "
        "FROM plans_docs"
    )
    assert "BatchEvalPython" not in got._jdf.queryExecution().executedPlan().toString()
    want = d.select(
        "doc_id",
        token_count("text").alias("n"),
        fingerprint64("text").alias("fp"),
        redact_pii("text").alias("red"),
        md5_bucket(F.col("doc_id"), "s").alias("b"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    e.select(F.col("embedding").cast("array<double>").alias("v")).limit(
        50
    ).createOrReplaceTempView("plans_vecs")
    got = spark.sql(
        "SELECT ice_cos_sim(v, reverse(v)) AS c FROM plans_vecs"
    ).collect()
    want = (
        spark.table("plans_vecs")
        .select(cosine_similarity(F.col("v"), F.reverse(F.col("v"))).alias("c"))
        .collect()
    )
    assert [r["c"] for r in got] == [r["c"] for r in want]


def test_decontam_semantic_no_pair_frame(spark):
    """decontam_semantic_overlap must score + argmax inside ONE
    Arrow-batched stage: no Window over a pair frame (the r5 defect), no
    exchange at ANY cardinality (the corpus never reshuffles; the eval
    side is a collected closure matrix), no join — the executed plan is
    scan -> MapInPandas -> filter. History: r6's map-side max(struct)
    was shuffle-optimal but paid ~26 us/pair in expression folds; the r7
    sf1 probe measured 362 s where the matmul takes ~1 s."""
    df = q.queries()["decontam_semantic_overlap"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    # row-at-a-time Python remains banned here like everywhere else
    assert "BatchEvalPython" not in plan, plan
