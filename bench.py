"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed to completion (results drained to the driver, like
the reference's serve path materializes results, icerunner.py:278-279) and
timed individually after one warm-up run of a trivial query to amortize
session startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icerunner_spark import queries as q  # noqa: E402
from icerunner_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q10_returned_items",
    "distinct_agg_lineitem",
    "window_topk_orders_per_customer",
    "window_running_revenue",
    "rollup_order_status",
    "grouping_sets_orders",
    "percentiles_lineitem",
    "topk_expensive_orders",
    "json_events_extract",
    "map_functions_events",
    "asof_join_events_to_orders",
    "range_join_event_bands",
    "window_tumbling_events",
    "session_window_events",
    "similarity_bruteforce_topk",
    "similarity_knn_join",
    "similarity_pq_topk",
    "similarity_ann_ivf",
    "dedup_minhash_lsh",
    "text_token_stats",
    "lang_id_documents",
    "dedup_exact_documents",
    "multimodal_byte_features",
    "grouped_user_trends",
    "approx_distinct_parts",
    "pivot_revenue_by_status",
    "stream_join_view_purchases",
    "pii_redact_documents",
    "corpus_clean_pipeline",
    "unigram_logprob_quality",
    "token_budget_mixture",
    # r5 additions tracked round-over-round: recursion, the view layer,
    # metadata-derived row lineage, and full-clause MERGE (MOR)
    "recursive_cte_hierarchy",
    "catalog_view_query",
    "row_lineage_scan",
    "merge_into_clauses",
    # r5b additions: metadata-only aggregates, distributed k-means,
    # semantic decontamination, and the CDC-maintained BM25 index
    "metadata_agg_pushdown",
    "kmeans_cluster_profile",
    "decontam_semantic_overlap",
    "incremental_bm25_index",
]


def _maintenance_ops(spark, sf_dir: str) -> dict[str, float]:
    """Table-format maintenance benchmarks (VERDICT r4 item 7): the r4+
    engine work — merge-on-read upsert/delete, delete-applied scans,
    bin-pack compaction, the CDC continuous-clean pass — timed at the
    bench SF so their cost tracks round over round alongside the query
    headline. Each op runs ONCE (they mutate table state; min-of-2 would
    time a different operation the second time). Setup (table creation)
    is excluded from the timings."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from icerunner_spark.operators.incremental import dedup_maintenance_pass
    from icerunner_spark.sources.testdata import load_table
    from icerunner_spark.table import IceTable

    ops: dict[str, float] = {}
    base = tempfile.mkdtemp(prefix="icebench-maint-")

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        ops[name] = round(time.perf_counter() - t0, 4)

    try:
        orders = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        upd = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        t = IceTable(spark, os.path.join(base, "orders_mor"))
        t.create(orders)
        # MOR upsert of ~1% of rows: one snapshot = delete file + appends,
        # O(changed rows) IO — the production CDC-apply path
        timed(
            "maint_merge_mor",
            lambda: t.merge(upd, ["o_orderkey"], mode="merge-on-read"),
        )
        # scan with the positional-delete anti-join active
        timed("maint_scan_with_deletes", lambda: t.scan().count())
        # MOR delete of another slice
        timed(
            "maint_delete_mor",
            lambda: t.delete_where("o_orderkey % 97 = 0", mode="merge-on-read"),
        )
        # consolidate the pending positional delete files (merge + delete
        # above attached several) into one sorted file — metadata +
        # O(delete rows), data untouched (r5)
        timed("maint_rewrite_pos_deletes", lambda: t.rewrite_position_deletes())
        # bin-pack: rewrite ONLY the dirty files, clear the deletes
        timed(
            "maint_compact_binpack",
            lambda: t.compact(mode="bin-pack", target_file_rows=2_000_000),
        )
        # sort-clustered rewrite: the O(table) background pass that turns
        # manifest stats into a range index (query-side win is tracked by
        # clustered_compact_scan's inline pins)
        timed(
            "maint_compact_sorted",
            lambda: t.compact(target_file_rows=2_000_000, sort_by=["o_orderkey"]),
        )
        # MOR UPDATE of ~1% of rows (r5): positional delete + updated append
        timed(
            "maint_update_mor",
            lambda: t.update_where(
                "o_orderkey % 101 = 0",
                {"o_totalprice": "o_totalprice * 1.5"},
                mode="merge-on-read",
            ),
        )
        # register an external parquet export at metadata cost (r5)
        ext = os.path.join(base, "external_export")
        orders.limit(50_000).write.mode("overwrite").parquet(ext)
        ext_files = sorted(
            os.path.join(ext, f) for f in os.listdir(ext) if f.endswith(".parquet")
        )
        timed("maint_add_files", lambda: t.add_files(ext_files))
        # copy-on-write twin of the same upsert, for the cost contrast
        t2 = IceTable(spark, os.path.join(base, "orders_cow"))
        t2.create(orders)
        timed(
            "maint_merge_cow",
            lambda: t2.merge(upd, ["o_orderkey"], mode="copy-on-write"),
        )
        # steady-state continuous-clean pass: CDC delta dedup + MOR delete
        docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
        half = docs.agg(F.expr("cast(max(doc_id) / 2 as bigint)")).first()[0]
        t3 = IceTable(spark, os.path.join(base, "corpus"))
        t3.create(docs.filter(F.lit(False)))
        cursor = t3.current_snapshot().snapshot_id
        t3.append(docs.filter(F.col("doc_id") <= half))
        _, cursor = dedup_maintenance_pass(t3, cursor)  # warm state, untimed
        t3.append(docs.filter(F.col("doc_id") > half))
        state = {"cursor": cursor}

        def _pass():
            _, state["cursor"] = dedup_maintenance_pass(t3, state["cursor"])

        timed("maint_dedup_pass", _pass)
        # bloom-indexed append (r5): the write-side cost of building
        # per-file equality-skipping bitmaps (one extra hash pass over
        # the indexed column, zero shuffle)
        t4 = IceTable(spark, os.path.join(base, "orders_bloom"))
        t4.create(
            orders.filter(F.lit(False)),
            properties={"write.bloom.columns": "o_orderkey"},
        )
        timed("maint_bloom_append", lambda: t4.append(orders))
        # incremental materialized-view refresh (r5): advance a GROUP BY
        # materialization over a ~2% changelog delta — cost must track
        # the delta, not the base table
        from icerunner_spark.matview import IncrementalAggView

        t5 = IceTable(spark, os.path.join(base, "orders_mv"))
        t5.create(orders)
        mv = IncrementalAggView(
            t5,
            os.path.join(base, "orders_mv_view"),
            ["o_orderstatus"],
            {"total_price": "CAST(o_totalprice AS DECIMAL(12,2))"},
        )
        mv.create()
        t5.append(upd.limit(1000))
        t5.delete_where("o_orderkey % 103 = 0", mode="merge-on-read")
        timed("maint_mv_refresh", lambda: mv.refresh())
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return ops


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)
    spark = get_spark(app_name="icerunner_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    # warm-up: JVM/codegen/parquet-footer caches
    registry["q6_revenue_forecast"](spark, sf_dir).collect()

    # Each query is timed standalone, min of two runs: this box shows
    # stochastic 2-5x slowdowns (CPU-quota throttling) that hit whole
    # queries at random — min-of-2 reports the machine's actual capability
    # instead of scheduler luck. Cache is cleared between runs so the
    # second run re-executes the full pipeline (no carried intermediates,
    # e.g. minhash signatures), and storage-memory pressure from query k
    # never bills a GC storm to query k+1.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            # heavy queries get a third trial: the throttling spikes
            # this box shows scale with query length, so min-of-2 is
            # noisier exactly where a regression signal matters most
            if trial == 1 and best < 2.0:
                break
        timings[name] = round(best, 4)

    timings.update(_maintenance_ops(spark, sf_dir))

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
