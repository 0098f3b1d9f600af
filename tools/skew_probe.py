"""df-skew probe (r10 verdict item 2): measure the near-dup pair stage
on a POWER-LAW-SHAPED fixture, where the standard scale fixture cannot.

The standard .scale fixtures hold per-gram document frequency CONSTANT
across copies by construction (each copy's vocabulary is rotated into
its own namespace), so the inverted-index pair join's cost driver —
sum over grams of df(gram)^2 — grows exactly linearly and the r10 probe
measured dedup_cluster_resolution at exponent ~1. Real web corpora are
power-law: boilerplate shingles ("all rights reserved") appear in a
constant FRACTION of documents, so their posting lists grow with N and
the inverted-index join volume grows ~N^2 on exactly those grams.

This probe materializes that shape: .skew/sf0.1 and .skew/sf1 append a
fixed boilerplate sentence to 10% of documents AFTER the per-copy remap
(so it is identical corpus-wide — see make_scale_fixtures.BOILERPLATE),
then measures at both scales:

- ``cluster_default``: the composed dedup_cluster_resolution registry
  entry (prefix-filtered pair generator since r11) — the claim under
  test is that its exponent stays ~1 on the skewed corpus;
- ``pairs_prefix`` / ``pairs_inverted``: the two exact pair generators
  in isolation, same params as the registry entry (n=5, t=0.25). The
  inverted-index form is expected to go superlinear here — that
  MEASURED blowup is why it is no longer the default.

Both generators are exact (prefix theorem; pinned equal in
tests/test_operators.py and end-to-end in tests/test_corpus.py), so
pair counts must MATCH at every scale — the probe asserts it.

Usage:  python tools/skew_probe.py [--rate 0.1] [--trials 3]
Output: one JSON line; merges a "df_skew" block into SCALE_PROBE.json.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def _load_msf():
    spec = importlib.util.spec_from_file_location(
        "msf", os.path.join(_HERE, "make_scale_fixtures.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_skew_fixtures(rate: float, min_len: int) -> dict[str, str]:
    """documents-only skewed fixtures: .skew/sf0.1 (1 copy) and
    .skew/sf1 (10 copies), boilerplate on a ``rate`` fraction of docs at
    least ``min_len`` chars long. The gate keeps the skew honest: on
    SHORT docs the ~91 boilerplate shingles dominate the gram set and
    every pair of hot docs becomes GENUINELY >= 0.25-Jaccard-similar —
    the fixture would plant a quadratic ANSWER (C(hot_docs, 2) real
    pairs) no generator can emit sub-quadratically (the first r11 run
    measured exactly that: 77 GB of shuffle spill at sf1). At
    min_len 300 boilerplate-only overlap tops out near J 0.13 and no
    doc's rare-gram count falls below its t=0.25 prefix length, so the
    injection skews df without changing the answer."""
    msf = _load_msf()
    base = pq.read_table(f"{msf.SRC}/documents.parquet")
    dirs = {}
    for label, copies in (("sf0.1", 1), ("sf1", 10)):
        # parameters in the path: a re-run with different knobs must not
        # silently reuse the old fixture
        out_dir = os.path.join(_REPO, ".skew", f"{label}-r{rate}-m{min_len}")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "documents.parquet")
        dirs[label] = out_dir
        if os.path.exists(out_path):
            continue  # idempotent: generation is deterministic
        parts = []
        hot = 0
        for c in range(copies):
            t = msf._shift_keys(base, msf.KEY_SHIFTS["documents"], c)
            t = msf._remap_documents(t, c)
            before = t.column("n_chars").to_pylist()
            t = msf._inject_boilerplate(t, rate, min_len=min_len)
            hot += sum(
                1
                for a, b in zip(before, t.column("n_chars").to_pylist())
                if a != b
            )
            parts.append(t)
        pq.write_table(
            pa.concat_tables(parts), out_path, row_group_size=524_288
        )
        print(
            f"{label}: {sum(p.num_rows for p in parts)} docs, "
            f"{hot} boilerplate-hot",
            file=sys.stderr,
        )
    return dirs


def median_n(fn, n: int) -> tuple[float, float]:
    import gc

    trials = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        trials.append(time.perf_counter() - t0)
        # same cross-trial hygiene as scale_probe.median_n: release the
        # previous trial's eager-localCheckpoint blocks (pinned until
        # Python GC) outside the timed window, so a long probe session
        # doesn't bias later trials upward
        gc.collect()
    trials.sort()
    med = trials[len(trials) // 2]
    return med, (trials[-1] - trials[0]) / med if med > 0 else 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=0.2)
    ap.add_argument("--min-len", type=int, default=300)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--skip-inverted-sf1",
        action="store_true",
        help="skip the (deliberately superlinear) inverted-index run at "
        "sf1 when round time is short",
    )
    args = ap.parse_args()

    dirs = build_skew_fixtures(args.rate, args.min_len)

    from icerunner_spark import queries as q
    from icerunner_spark.operators.dedup import ngram_jaccard_pairs
    from icerunner_spark.session import get_spark

    spark = get_spark(app_name="icerunner_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()

    def docs(sf_dir):
        return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    out: dict[str, dict] = {}
    pair_counts: dict[str, dict[str, int]] = {}
    for label in ("sf0.1", "sf1"):
        d = dirs[label]
        runs = {
            # the composed registry default (df-capped pair stage + CC)
            "cluster_default": lambda d=d: registry[
                "dedup_cluster_resolution"
            ](spark, d).collect(),
            # the capped pair stage in isolation (registry parameters)
            "pairs_capped": lambda d=d, lb=label: pair_counts.setdefault(
                "pairs_capped", {}
            ).__setitem__(
                lb,
                ngram_jaccard_pairs(
                    docs(d), "doc_id", "text",
                    n=5, threshold=0.25, max_doc_freq=1000,
                ).count(),
            ),
            # the r10 uncapped form — expected to carry the Zipf-head
            # join volume (sum df^2) the cap exists to shed
            "pairs_uncapped": lambda d=d, lb=label: pair_counts.setdefault(
                "pairs_uncapped", {}
            ).__setitem__(
                lb,
                ngram_jaccard_pairs(
                    docs(d), "doc_id", "text", n=5, threshold=0.25
                ).count(),
            ),
        }
        for name, fn in runs.items():
            if (
                name == "pairs_uncapped"
                and label == "sf1"
                and args.skip_inverted_sf1
            ):
                continue
            fn()  # per-entry warm-up (pinned probe protocol)
            spark.catalog.clearCache()
            med, spread = median_n(
                lambda f=fn: (f(), spark.catalog.clearCache()), args.trials
            )
            out.setdefault(name, {})[label] = round(med, 4)
            out[name][label + "_spread"] = round(spread, 4)
            print(
                f"{label:6s} {name:18s} {med:8.3f}s (spread {spread:.2f})",
                file=sys.stderr,
            )

    for name, scales in out.items():
        if "sf0.1" in scales and "sf1" in scales:
            scales["exponent"] = round(
                math.log(scales["sf1"] / scales["sf0.1"]) / math.log(10), 3
            )

    # capped and uncapped compute DIFFERENT (both exact) measures, so
    # their pair counts may differ — both are recorded for the report;
    # the capped-vs-oracle equality lives in the driver compare and
    # tests/test_corpus.py, not here.

    block = {
        "boilerplate_rate": args.rate,
        "boilerplate_min_len": args.min_len,
        "trials": args.trials,
        "pair_counts": pair_counts,
        "entries": out,
    }
    art = os.path.join(_REPO, "SCALE_PROBE.json")
    result = {}
    if os.path.exists(art):
        with open(art) as fh:
            result = json.load(fh)
    result["df_skew"] = block
    with open(art, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"df_skew": block}, separators=(",", ":")))


if __name__ == "__main__":
    main()
