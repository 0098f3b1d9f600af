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
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")

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
]


def median3(fn) -> tuple[float, float]:
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        trials.append(time.perf_counter() - t0)
    trials.sort()
    med = trials[1]
    return med, (trials[-1] - trials[0]) / med if med > 0 else 0.0


def _recall_both_scales(spark, registry) -> tuple[dict, dict]:
    """ivf/pq/incremental recall at both scales + floor violations."""
    import bench as _bench

    recall: dict[str, dict] = {}
    for sf_dir, key in ((SF01, "sf0.1"), (SF1, "sf1")):
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
    for sf_dir, key in ((SF01, "sf0.1"), (SF1, "sf1")):
        registry["q6_revenue_forecast"](spark, sf_dir).collect()  # warm-up
        for name in names:
            med, spread = median3(
                lambda n=name, d=sf_dir: (
                    registry[n](spark, d).collect(),
                    spark.catalog.clearCache(),
                )
            )
            out.setdefault(name, {})[key] = round(med, 4)
            out[name][key + "_spread"] = round(spread, 4)
            print(f"{key:6s} {name:32s} {med:8.3f}s (spread {spread:.2f})",
                  file=sys.stderr)

    for name, d in out.items():
        d["exponent"] = round(math.log10(d["sf1"] / d["sf0.1"]), 3)

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
        "sf_pair": [0.1, 1.0],
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
