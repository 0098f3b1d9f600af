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


def main() -> None:
    names = sys.argv[1:] or PROBE
    if not os.path.isdir(SF1):
        sys.exit("run tools/make_scale_fixtures.py first")
    spark = get_spark(app_name="icerunner_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
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
    result = {
        "metric": "scale_probe_exponent",
        "queries": out,
        "sf_pair": [0.1, 1.0],
        "worst": max(out, key=lambda n: out[n]["exponent"]),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALE_PROBE.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
