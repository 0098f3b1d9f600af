"""Round-over-round bench comparison under the pinned median-of-3
protocol (r6 verdict item 8): deltas smaller than the measured spread
are drift by definition; anything beyond it is flagged for a plan-level
look.

Usage: python tools/bench_compare.py <old.json> <new.json> [spread]

Accepts either a bench_full.json artifact ({"queries": {...},
"noise": {...}}) or a bare {name: seconds} map (e.g. medians recovered
from a driver tail). Prints the shared-entry totals, the ratio, and
every entry whose ratio falls outside 1 +/- max(spread, per-query
floor) in both directions — regressions AND suspicious speedups (a
10x speedup usually means the query stopped doing the work).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple[dict[str, float], float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        spread = float(d.get("noise", {}).get("p90_spread", 0.5))
        return {k: float(v) for k, v in d["queries"].items()}, spread
    return {k: float(v) for k, v in d.items()}, 0.5


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, old_spread = _load(sys.argv[1])
    new, new_spread = _load(sys.argv[2])
    spread = float(sys.argv[3]) if len(sys.argv) > 3 else max(old_spread, new_spread)
    shared = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(
        f"shared entries: {len(shared)}  old total: {t_old:.2f}s  "
        f"new total: {t_new:.2f}s  ratio: {t_new / t_old:.3f}  "
        f"(spread threshold ±{spread:.2f})"
    )
    flagged = []
    for k in shared:
        if old[k] <= 0:
            continue
        ratio = new[k] / old[k]
        # sub-100ms entries live in scheduler noise; require an
        # absolute delta too
        if abs(new[k] - old[k]) > 0.25 and (
            ratio > 1 + spread or ratio < 1 / (1 + spread)
        ):
            flagged.append((ratio, k))
    for ratio, k in sorted(flagged, reverse=True):
        tag = "REGRESSION?" if ratio > 1 else "speedup"
        print(f"  {tag:12s} {k:36s} {old[k]:8.3f}s -> {new[k]:8.3f}s ({ratio:.2f}x)")
    if not flagged:
        print("  all shared entries within the spread threshold")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"  new entries (no baseline): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
