"""sf0.1 -> sf1 scale probe (r6 verdict item 1, carried from r5).

Runs the heavy headline queries at BOTH scales under the pinned bench
protocol (one warm-up, median-of-3, cache cleared between trials) and
reports the per-query scaling exponent

    alpha = log(t_sf1 / t_sf01) / log(10)

alpha ~ 1.0 is linear scaling; at local[32] with fixed overheads,
sub-linear values are common for queries dominated by per-query constant
cost (commit overhead, plan time, small dims). Anything >= ~1.1 (i.e.
> ~12x wall for 10x data) needs a named plan reason or a fix — the
threshold the verdict set.

Prereq: python tools/make_scale_fixtures.py  (writes .scale/sf1)
Usage:  python tools/scale_probe.py [query ...]   (default: PROBE list)
Output: one JSON line + SCALE_PROBE.json with per-scale medians,
        spreads, and exponents.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icerunner_spark import queries as q  # noqa: E402
from icerunner_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
_SCALE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)
SF1 = os.path.join(_SCALE_ROOT, "sf1")


def probe_scales() -> list[tuple[str, str]]:
    """(dir, label) per scale the probe runs: the driver's sf0.1 plus
    every generated .scale/sf* fixture — so the recall floor and the
    exponent fits are keyed to whatever scales exist, not hard-coded to
    the (sf0.1, sf1) pair (r8 verdict item 8: when sf2+ fixtures land,
    the 0.6 floor must ride them automatically)."""
    scales = [(SF01, "sf0.1")]
    if os.path.isdir(_SCALE_ROOT):
        for name in sorted(os.listdir(_SCALE_ROOT)):
            path = os.path.join(_SCALE_ROOT, name)
            if name.startswith("sf") and os.path.isdir(path):
                scales.append((path, name))
    # numeric order (lexicographic would put sf10 before sf2)
    scales.sort(key=lambda s: float(s[1][2:]))
    return scales

# the 8 most expensive r7 headline entries + the three the verdict named
# (corpus_clean_pipeline, dedup_minhash_lsh, decontam_semantic_overlap) +
# scan/window/join/event representatives + the span operator (pair-graph
# shape, heaviest non-headline)
PROBE = [
    "incremental_bm25_index",
    "corpus_clean_pipeline",
    "decontam_semantic_overlap",
    "dedup_minhash_lsh",
    "kmeans_cluster_profile",
    "merge_into_clauses",
    "metadata_agg_pushdown",
    "similarity_knn_join",
    "percentiles_lineitem",
    "q1_pricing_summary",
    "q5_region_revenue",
    "q10_returned_items",
    "asof_join_events_to_orders",
    "window_running_revenue",
    "exact_substring_spans",
    # r7 addition: the exact all-pairs cosine (block matmul — the probe
    # caught its fold-per-pair predecessor at ~128 s on sf1)
    "embedding_cosine_neardup",
    # r9 additions: iterative graph scoring (per-iteration shuffle over
    # an edge set that grows with SF) and TF-IDF (token explode + vocab
    # exchange) — the two new entries with scale-sensitive exchanges
    "pagerank_order_graph",
    "tfidf_top_terms",
    # late-r9 additions that scale with table size: URL dedup (orders-
    # scaled codegen agg), temperature mixing (documents window),
    # z-order compaction (O(table) rewrite — its exponent SHOULD be ~1,
    # the probe pins it doesn't go superlinear); the dHash/audio
    # fingerprint queries are 60-blob-bounded by construction, nothing
    # to probe
    "url_canonical_dedup",
    "temperature_sampled_mixture",
    "zorder_compact_scan",
    # r9: hard-negative mining — gram explode + df join + pair
    # aggregation are all corpus-proportional exchanges; the df_max
    # bound should keep the pair stage sub-linear, the probe checks
    "hard_negative_mining",
    # r9: source overlap — the gram+source distinct is the corpus-
    # proportional exchange; the self-join output is sources^2-bounded
    "source_overlap_matrix",
    # r11: two-phase histogram rank (r10 verdict item 3) — the only
    # corpus-proportional exchange is the (source, n_tokens) histogram
    # aggregate; the probe pins that the de-windowed form scales
    "per_source_percentile_filter",
    # r11 (r10 verdict item 5): the composed near-dup resolution with
    # its prefix-filtered default pair stage — three-point exponent on
    # the standard (df-constant) fixtures; the df-SKEWED behavior is
    # tools/skew_probe.py's separate two-scale measurement
    "dedup_cluster_resolution",
]


def median_n(fn, n: int = 3) -> tuple[float, float]:
    import gc

    trials = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        trials.append(time.perf_counter() - t0)
        # release the PREVIOUS trial's eager-localCheckpoint blocks before
        # timing the next one: checkpointed RDD blocks are freed on Python
        # frame GC, so a long probe session otherwise accumulates every
        # prior trial's blocks in the block manager — measured at sf2
        # (r11): dedup_cluster_resolution drew a stable 112 s when probed
        # AFTER 14 prior heavy trials in one session vs 72-90 s in a
        # fresh process; gc between trials removes the cross-trial bias
        # the exponent fit would otherwise read as superlinearity. The
        # gc runs OUTSIDE the timed window (bench.py is untouched — its
        # round-over-round protocol is frozen).
        gc.collect()
    trials.sort()
    med = trials[len(trials) // 2]
    return med, (trials[-1] - trials[0]) / med if med > 0 else 0.0


def median3(fn) -> tuple[float, float]:
    return median_n(fn, 3)


def _recall_both_scales(spark, registry) -> tuple[dict, dict]:
    """ivf/pq/incremental recall at every probe scale + floor
    violations (keyed per-scale, whatever scales exist)."""
    import bench as _bench

    recall: dict[str, dict] = {}
    for sf_dir, key in probe_scales():
        recall[key] = _bench._ann_recall(spark, sf_dir, registry)
        print(f"{key:6s} ann recall: {recall[key]}", file=sys.stderr)
    violations = {
        f"{key}:{n}": r
        for key, rs in recall.items()
        for n, r in rs.items()
        if n in ("similarity_ann_ivf", "similarity_pq_topk") and r < 0.6
    }
    return recall, violations


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--recall-only"]
    recall_only = "--recall-only" in sys.argv[1:]
    names = args or PROBE
    if not os.path.isdir(SF1):
        sys.exit("run tools/make_scale_fixtures.py first")
    spark = get_spark(app_name="icerunner_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(here, "SCALE_PROBE.json")
    if recall_only:
        # refresh just the recall section of the existing artifact
        # (parameter changes shouldn't force the 2x16-query timing pass)
        recall, violations = _recall_both_scales(spark, registry)
        with open(art) as fh:
            result = json.load(fh)
        result["ann_recall"] = recall
        result["recall_floor"] = 0.6
        result.pop("recall_violation", None)
        if violations:
            result["recall_violation"] = violations
        with open(art, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps({"ann_recall": recall}, separators=(",", ":")))
        if violations:
            sys.exit(1)
        return
    import math

    out: dict[str, dict] = {}
    for sf_dir, key in probe_scales():
        registry["q6_revenue_forecast"](spark, sf_dir).collect()  # warm-up
        for name in names:
            # per-QUERY warm-up (r8 verdict item 4): the global q6 pass
            # warms the session, not this query's plan/codegen/broadcast
            # paths — without it trial 1 carries the cold-start cost and
            # the printed spread dwarfs the median for sub-second
            # entries (decontam_semantic_overlap: spread 11.7 vs median
            # 0.92 in r8), making the exponent untrustworthy as evidence
            registry[name](spark, sf_dir).collect()
            spark.catalog.clearCache()
            trial = lambda n=name, d=sf_dir: (  # noqa: E731
                registry[n](spark, d).collect(),
                spark.catalog.clearCache(),
            )
            med, spread = median3(trial)
            trials = 3
            if spread > 0.5:
                # noisy entry (r8 verdict item 4): the spread dwarfs
                # the median, so the exponent built on it is not
                # evidence — raise the repeat count so the MEDIAN is
                # trustworthy even when the query is genuinely bimodal
                # (GC / shuffle-fetch variance); the spread stays
                # honest over all 7 trials
                med, spread = median_n(trial, 7)
                trials = 7
            out.setdefault(name, {})[key] = round(med, 4)
            out[name][key + "_spread"] = round(spread, 4)
            out[name][key + "_trials"] = trials
            print(
                f"{key:6s} {name:32s} {med:8.3f}s "
                f"(spread {spread:.2f}, n={trials})",
                file=sys.stderr,
            )

    # exponent fit over the extreme scales present (log-log slope);
    # with the default fixtures that is exactly the old sf0.1 -> sf1
    # log10 ratio, but it generalizes when sf2+ fixtures land
    labels = [k for _d, k in probe_scales()]
    lo_k, hi_k = labels[0], labels[-1]
    sf_ratio = float(hi_k[2:]) / float(lo_k[2:])
    for name, d in out.items():
        d["exponent"] = round(
            math.log(d[hi_k] / d[lo_k]) / math.log(sf_ratio), 3
        )

    # ANN recall at BOTH scales (r7 verdict item 7): recall typically
    # DROPS with corpus size at fixed n_probe/rerank, so the 0.6 floor
    # must ride the probe, not just the sf0.1 bench. Reuses bench.py's
    # exact methodology (mean over 5 probe vectors, registry params).
    recall: dict[str, dict] = {}
    violations: dict[str, float] = {}
    if not args:  # full probe runs only; skip for targeted reruns
        recall, violations = _recall_both_scales(spark, registry)

    result = {
        "metric": "scale_probe_exponent",
        "queries": out,
        "sf_pair": [float(lo_k[2:]), float(hi_k[2:])],
        "worst": max(out, key=lambda n: out[n]["exponent"]),
        "ann_recall": recall,
        "recall_floor": 0.6,
    }
    if violations:
        result["recall_violation"] = violations
    if args and os.path.exists(art):
        # targeted rerun: merge into the full artifact instead of
        # clobbering the other queries' rows and the recall section
        with open(art) as fh:
            prev = json.load(fh)
        prev["queries"].update(result["queries"])
        prev["worst"] = max(
            prev["queries"], key=lambda n: prev["queries"][n]["exponent"]
        )
        result = prev
    with open(art, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, separators=(",", ":")))
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
