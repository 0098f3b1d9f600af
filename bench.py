"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the full JSON artifact line first ({"metric", "value", "unit",
"queries": {name: sec, ...}, "sf", "recall", "noise"}), then a compact
summary line LAST that always fits the driver's 2000-char tail capture —
r6's artifact was unparseable because the grown one-line JSON outran the
tail window. The last line carries the headline plus as many per-query
entries as fit the tail budget, most-expensive first ("queries" +
"queries_omitted"; r11 verdict item 1 — the driver's per-query compare
reads the parsed last line, and the complete map cannot fit: its names
alone exceed the window). The full artifact is also written to
bench_full.json next to this file.

Measurement protocol (fixed, round-over-round comparable):
- one warm-up query amortizes JVM/codegen/parquet-footer startup;
- EVERY headline entry runs exactly 3 trials and reports the MEDIAN
  (r5 postmortem: min-of-2-or-3 mixed statistics made ±0.3 s
  environment drift indistinguishable from real regressions);
- the cache is cleared between trials so each re-executes the full
  pipeline and storage pressure from query k never bills query k+1;
- per-query relative spread ((max-min)/median) is summarized in
  "noise" {median_spread, p90_spread, max_spread} — a round-over-round
  delta smaller than the printed spread is drift, not regression;
- maintenance ops mutate table state so they run ONCE (timing a second
  trial would time a different operation) and are excluded from the
  noise summary;
- approximate-ANN entries also report recall@10 against the
  brute-force baseline on the same probe ("recall" key, floors pinned
  in tests/test_operators.py) so a speedup that silently costs
  accuracy is visible in the same artifact. "queries" stays
  name->seconds because the driver parses that shape.

Each query is executed to completion (results drained to the driver, like
the reference's serve path materializes results, icerunner.py:278-279).
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
    # r7 additions: real image/audio/video decode through the
    # pure-numpy codecs
    "multimodal_decode_stats",
    "multimodal_resize_stats",
    "multimodal_audio_stats",
    "multimodal_video_stats",
    # r8 addition: Iceberg v2 metadata export + import round trip
    "iceberg_export_roundtrip",
    "iceberg_eq_delete_import",
    # r9 additions: TF-IDF keyword extraction, watermarked streaming
    # dedup, one-pass closed-form ridge fit, fixed-point PageRank
    "tfidf_top_terms",
    "stream_dedup_watermark",
    "ridge_quality_fit",
    "pagerank_order_graph",
    # r9 additions: exact Jaccard with prefix-filtered candidates,
    # trailing-window EWMA + z-score anomaly flags, predicate-pushdown
    # Iceberg import over deflate-codec metadata
    "neardup_prefix_filter",
    "ewma_anomaly_events",
    "iceberg_pruned_import",
    # r9: exact two-pass heavy hitters (answer-bounded shuffle),
    # import-side Iceberg CDC
    "frequent_tokens_documents",
    "iceberg_changes_import",
    # late r9: URL canonicalization dedup, temperature mixing,
    # perceptual image/audio fingerprint dedup, z-order 2-D pruning
    "url_canonical_dedup",
    "temperature_sampled_mixture",
    "image_dhash_neardup",
    "audio_fingerprint_neardup",
    "zorder_compact_scan",
    "iceberg_eq_delete_export",
    # r9: hard-negative mining for contrastive retrieval training,
    # cross-source duplication forensics
    "hard_negative_mining",
    "source_overlap_matrix",
    # r10 (r9 verdict item 8): the 14 most expensive previously
    # unbenched registry names, selected by a one-trial timing sweep of
    # 46 uncovered candidates at sf0.1 (tools: /tmp sweep, recorded in
    # BASELINE.md). The sweep immediately paid for itself:
    # dedup_cluster_resolution measured 187 s — connected_components
    # re-ran the uncached exact-Jaccard pair pipeline every label
    # round; fixed to 26 s by checkpointing the edge set once.
    "dedup_cluster_resolution",
    "incremental_neardup_cdc",
    "neardup_ngram_jaccard",
    "bpe_train_merges",
    "incremental_mv_refresh",
    "flight_federated_join",
    "semantic_dedup_resolution",
    "bpe_encode_documents",
    "dedup_simhash",
    "segment_dedup_reassemble",
    "exact_substring_spans",
    "stream_exactly_once_ingest",
    "q18_large_volume_customers",
    "bigram_logprob_quality",
    # r10 additions: corpus-QA operators
    "zipf_token_fit",
    "psi_source_drift",
    "per_source_percentile_filter",
    "decontam_eval_containment",
    "embedding_outlier_zscore",
]

# Entries whose FIRST invocation performs one-time environment setup that
# outlives the query (an in-process Flight server cached per process).
# They get one untimed pre-warm run so the 3 timed trials measure the
# query, not the bootstrap (r10 verdict item 8).
PREWARM = {"flight_federated_join"}


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
        # r9 policy steps, timed through run_maintenance itself so the
        # cost includes the trigger evaluation: TTL row retention (MOR
        # delete of an expired slice) and backlog-triggered z-order
        # re-clustering (O(table) rewrite)
        import datetime as _dt

        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        t6 = IceTable(spark, os.path.join(base, "events_ttl"))
        ev = load_table(spark, "events", sf_dir).select(
            "event_id", "user_id", "value"
        ).withColumn(
            # ~3% expired: event_id % 31 == 0 rows get a 30-day-old stamp
            "ts",
            F.when(
                F.col("event_id") % 31 == 0,
                F.lit(now - _dt.timedelta(days=30)),
            ).otherwise(F.lit(now)),
        )
        t6.create(ev, properties={
            "maintenance.ttl.column": "ts",
            "maintenance.ttl.max-age-ms": str(7 * 86400 * 1000),
        })
        timed("maint_ttl_delete", lambda: t6.run_maintenance())
        t7 = IceTable(spark, os.path.join(base, "orders_zorder"))
        t7.create(orders.repartition(8), properties={
            "maintenance.cluster.columns": "o_orderkey,o_custkey",
            "maintenance.cluster.strategy": "zorder",
            "maintenance.cluster.min-new-files": "4",
        })
        timed("maint_compact_cluster", lambda: t7.run_maintenance())
        # r10 (r9 verdict item 6): every benched export now round-trips
        # through the full conformance validator INCLUDING the Apache
        # Avro JAVA reference decoder — the foreign wire-format check is
        # part of the default drive, its cost is a recorded entry, and a
        # wire drift fails the bench loudly instead of hiding behind an
        # opt-in flag. The exported table carries MOR deletes, so delete
        # manifests are part of the cross-decoded tree.
        import importlib.util as _ilu

        from icerunner_spark.iceberg_export import export_iceberg

        _spec = _ilu.spec_from_file_location(
            "iceberg_validate",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tools",
                "iceberg_validate.py",
            ),
        )
        _iv = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_iv)
        exp_dir = os.path.join(base, "orders_mor_export")
        timed("maint_export_iceberg", lambda: export_iceberg(t, exp_dir))

        def _validate_java():
            rep = _iv.validate(exp_dir)
            _iv.java_avro_crosscheck(exp_dir, rep)
            d = rep.as_dict()
            if not d["ok"]:
                raise RuntimeError(
                    f"iceberg validate failed: {d['errors'][:3]}"
                )

        timed("maint_validate_java_avro", _validate_java)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return ops


def _ann_recall(spark, sf_dir: str, registry) -> dict[str, float]:
    """recall@10 of each approximate-ANN headline entry against the exact
    brute-force ranking, as the MEAN OVER 5 PROBE VECTORS with the
    registry parameters (n_probe=8, rerank=96) — the same methodology as
    the pytest pins (tests/test_operators.py: 5 probes, mean >= 0.6), so
    bench recall and pin are comparable (r6 verdict: a single-probe bench
    recall was not). The 0.6 floor is asserted HERE too, so a recall
    regression fails the bench loudly instead of shipping a fast-but-wrong
    number. incremental_ann_maintenance deletes a key slice before its
    probe, so its truth set is brute force over that final state (probe
    runs at full n_probe => expected 1.0)."""
    from pyspark.sql import functions as F

    from icerunner_spark.functions.vector import cosine_similarity
    from icerunner_spark.operators.similarity import cosine_topk, ivf_topk, pq_topk
    from icerunner_spark.queries import _ivf_index, _pq_index
    from icerunner_spark.sources.testdata import load_table

    e_full = load_table(spark, "embeddings", sf_dir)
    ivf_recalls: list[float] = []
    pq_recalls: list[float] = []
    for qid in range(5):
        row = e_full.filter(F.col("vec_id") == qid).select("embedding").first()
        qv = [float(x) for x in row["embedding"]]
        cand = e_full.filter(F.col("vec_id") != qid)
        exact = {r["vec_id"] for r in cosine_topk(cand, qv, k=10).collect()}
        ivf = {
            r["vec_id"]
            for r in ivf_topk(
                cand, qv, k=10, n_centroids=16, n_probe=8,
                centroids=_ivf_index(spark, sf_dir),
            ).collect()
        }
        pq = {
            r["vec_id"]
            for r in pq_topk(
                cand, qv, k=10, rerank=96, codebooks=_pq_index(spark, sf_dir)
            ).collect()
        }
        denom = max(len(exact), 1)
        ivf_recalls.append(len(ivf & exact) / denom)
        pq_recalls.append(len(pq & exact) / denom)
    rec: dict[str, float] = {
        "similarity_ann_ivf": round(sum(ivf_recalls) / 5, 4),
        "similarity_pq_topk": round(sum(pq_recalls) / 5, 4),
    }

    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    qvec = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    # the probe vector itself stays in the index (only vec_id > 0
    # multiples of 7 are deleted), so the truth set keeps vec_id 0 too
    final_state = e.filter(
        ~((F.col("vec_id") % 7 == 0) & (F.col("vec_id") > 0))
    )
    truth = {
        r["vec_id"]
        for r in final_state.crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    got = {
        r["vec_id"]
        for r in registry["incremental_ann_maintenance"](spark, sf_dir).collect()
    }
    rec["incremental_ann_maintenance"] = round(
        len(got & truth) / max(len(truth), 1), 4
    )
    return rec


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)
    spark = get_spark(app_name="icerunner_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    # warm-up: JVM/codegen/parquet-footer caches
    registry["q6_revenue_forecast"](spark, sf_dir).collect()

    # median-of-3 for every entry; per-query spread feeds the noise
    # summary (protocol rationale in the module docstring)
    timings: dict[str, float] = {}
    spreads: list[float] = []
    spread_by_name: dict[str, float] = {}
    for name in HEADLINE:
        if name in PREWARM:
            # one untimed run: these entries perform one-time environment
            # setup on first invocation (a live in-process Flight server,
            # cached per process) that is client-cache state, not query
            # cost — r10's max_spread 5.7 on flight_federated_join was
            # entirely trial 1's server bootstrap against a 0.8 s
            # median, drowning the signal the spread exists to carry
            registry[name](spark, sf_dir).collect()
            spark.catalog.clearCache()
        trials: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).collect()
            trials.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        trials.sort()
        median = trials[1]
        timings[name] = round(median, 4)
        sp = (trials[-1] - trials[0]) / median if median > 0 else 0.0
        spreads.append(sp)
        spread_by_name[name] = sp

    timings.update(_maintenance_ops(spark, sf_dir))
    recall = _ann_recall(spark, sf_dir, registry)

    spreads.sort()
    noise = {
        "stat": "median_of_3",
        "median_spread": round(spreads[len(spreads) // 2], 4),
        "p90_spread": round(spreads[int(len(spreads) * 0.9)], 4),
        "max_spread": round(spreads[-1], 4),
        # name the bimodal outlier so a high max_spread is actionable
        # from the artifact alone (r10: an anonymous 6.8 told nothing)
        "max_spread_query": max(spread_by_name, key=spread_by_name.get),
    }

    # recall floor (r6 verdict item 2): a regression must fail LOUDLY
    # but still emit the parseable artifact — a dead bench is a round
    # with no perf record (the r6 postmortem), so the violation rides
    # the JSON and the exit code, not an exception before the print.
    violations = {
        n: r
        for n, r in recall.items()
        if n in ("similarity_ann_ivf", "similarity_pq_topk") and r < 0.6
    }

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "recall": recall,
        "noise": noise,
    }
    if violations:
        full["recall_violation"] = violations
    # Tail-safe output protocol (r6 postmortem: the one-line JSON outgrew
    # the driver's 2000-char tail capture, truncating the FRONT of the
    # line — BENCH_r06 recorded "parsed": null). The full artifact is
    # written to bench_full.json and printed first (greppable, may be
    # front-truncated in the tail); the LAST line is a compact summary
    # guaranteed to fit the tail window, so the driver always gets a
    # parseable headline + recall + noise.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_full.json"), "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass  # read-only checkout: stdout lines below still carry everything
    print(json.dumps(full, separators=(",", ":")))
    compact = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "recall": recall,
        "noise": noise,
        "queries_detail": "bench_full.json + previous stdout line",
    }
    if violations:
        compact["recall_violation"] = violations
    # r12 (r11 verdict item 1): the driver's per-query round-over-round
    # comparison and scaling analysis read "queries" from the PARSED last
    # line, which PERF_r11 showed empty (n_common: 0) because the full
    # map only ever reached bench_full.json / the front-truncated first
    # line. The complete 102-entry map is ~3.3 kB — the names alone are
    # 2.1 kB, so it can NEVER fit the 2000-char tail window. The last
    # line therefore carries the MOST EXPENSIVE entries, greedily packed
    # in descending median seconds until the line reaches the tail
    # budget, plus "queries_omitted" = how many (cheap) entries did not
    # fit. Purely additive: every entry keeps its name and value in the
    # full artifact (first line + bench_full.json); nothing is removed
    # or renamed.
    tail_budget = 1950  # the driver keeps the last 2000 chars of stdout
    fitted: dict[str, float] = {}
    for name in sorted(timings, key=lambda k: timings[k], reverse=True):
        trial = dict(compact)
        trial["queries"] = {**fitted, name: timings[name]}
        trial["queries_omitted"] = len(timings) - len(trial["queries"])
        if len(json.dumps(trial, separators=(",", ":"))) > tail_budget:
            break
        fitted = trial["queries"]
    compact["queries"] = fitted
    compact["queries_omitted"] = len(timings) - len(fitted)
    print(json.dumps(compact, separators=(",", ":")))
    if violations:
        sys.exit(
            f"ANN recall below the 0.6 floor (pins in "
            f"tests/test_operators.py): {violations}"
        )


if __name__ == "__main__":
    main()
