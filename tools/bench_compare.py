"""Round-over-round bench comparison under the pinned median-of-3
protocol (r6 verdict item 8): deltas smaller than the measured spread
are drift by definition; anything beyond it is flagged for a plan-level
look.

Usage: python tools/bench_compare.py <old.json> <new.json> [spread]

Accepts any of (r7 verdict item 6 added the third, r8 item 2 the fourth):
- a bench_full.json artifact ({"queries": {...}, "noise": {...}});
- a bare {name: seconds} map (e.g. medians recovered from a driver tail);
- a BENCH_r{N}.json driver artifact ({"rc", "tail", "parsed"}) — the only
  per-round files that persist; per-query medians are recovered from the
  2000-char tail capture, whose per-query JSON line may be front-truncated
  (the first name:seconds pair is then cut mid-name and dropped);
- a SCALE_PROBE.json artifact ({"metric": "scale_probe_exponent",
  "queries": {name: {"sf0.1": s, "sf0.1_spread": x, ...}}}) — its sf0.1
  medians are the same quantity the bench measures, so comparing the two
  artifacts from ONE round is a methodology consistency check: both are
  median-of-3 at sf0.1, and a delta beyond the union of their measured
  spreads means one of the harnesses is mis-measuring (different session
  state, missing cache clear, changed fixture), not that the query
  changed speed.

Prints the shared-entry totals, the ratio, and every entry whose ratio
falls outside 1 +/- max(global spread, the entry's own measured spreads)
in both directions — regressions AND suspicious speedups (a 10x speedup
usually means the query stopped doing the work).
"""

from __future__ import annotations

import json
import re
import sys

_TAIL_PAIR = re.compile(r'"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)')


def _medians_from_tail(tail: str) -> tuple[dict[str, float], float | None]:
    """Recover {query: median seconds} from a driver tail capture.

    The driver keeps the LAST 2000 chars of bench.py stdout, so the
    per-query JSON line ({"metric": "...", "queries": {...}, "sf": ...,
    "noise": {...}}) is usually front-truncated and won't json-parse;
    the final summary line always parses and carries the noise block.
    """
    meds: dict[str, float] = {}
    spread: float | None = None
    for line in tail.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            # Truncated per-query line: the medians live between the
            # (possibly cut-off) start and the '},"sf":' that closes
            # the queries map; everything after is recall/noise.
            seg = line.split('},"sf":', 1)[0]
            if '"queries":{' in seg:
                seg = seg.split('"queries":{', 1)[1]
            elif not line.startswith("{"):
                # The first pair is cut at an arbitrary offset (mid-name,
                # mid-number, or cleanly); discard up to the first comma
                # so a deceptively-complete-looking fragment can't slip in.
                seg = seg.split(",", 1)[1] if "," in seg else ""
            meds.update(
                {k: float(v) for k, v in _TAIL_PAIR.findall(seg)}
            )
            continue
        if isinstance(obj.get("queries"), dict):
            meds.update({k: float(v) for k, v in obj["queries"].items()})
        if isinstance(obj.get("noise"), dict):
            spread = float(obj["noise"].get("p90_spread", 0.5))
    return meds, spread


def _load(path: str) -> tuple[dict[str, float], float, dict[str, float]]:
    """-> (medians, global spread, per-query spreads where measured)."""
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("tail"), str):  # BENCH_r{N}.json driver artifact
        meds, spread = _medians_from_tail(d["tail"])
        if not meds:
            sys.exit(f"{path}: driver artifact tail has no per-query medians")
        return meds, spread if spread is not None else 0.5, {}
    if d.get("metric") == "scale_probe_exponent":
        meds = {
            k: float(v["sf0.1"])
            for k, v in d["queries"].items()
            if "sf0.1" in v
        }
        per = {
            k: float(v.get("sf0.1_spread", 0.0))
            for k, v in d["queries"].items()
        }
        return meds, 0.5, per
    if "queries" in d:
        spread = float(d.get("noise", {}).get("p90_spread", 0.5))
        return {k: float(v) for k, v in d["queries"].items()}, spread, {}
    return {k: float(v) for k, v in d.items()}, 0.5, {}


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, old_spread, old_per = _load(sys.argv[1])
    new, new_spread, new_per = _load(sys.argv[2])
    spread = float(sys.argv[3]) if len(sys.argv) > 3 else max(old_spread, new_spread)
    shared = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(
        f"shared entries: {len(shared)}  old total: {t_old:.2f}s  "
        f"new total: {t_new:.2f}s  ratio: {t_new / t_old:.3f}  "
        f"(spread threshold ±{spread:.2f}, widened per-entry by its "
        f"own measured spread where available)"
    )
    flagged = []
    for k in shared:
        if old[k] <= 0:
            continue
        ratio = new[k] / old[k]
        thr = max(spread, old_per.get(k, 0.0), new_per.get(k, 0.0))
        # sub-100ms entries live in scheduler noise; require an
        # absolute delta too
        if abs(new[k] - old[k]) > 0.25 and (
            ratio > 1 + thr or ratio < 1 / (1 + thr)
        ):
            flagged.append((ratio, k))
    for ratio, k in sorted(flagged, reverse=True):
        tag = "INCONSISTENT?" if ratio > 1 else "speedup"
        print(f"  {tag:13s} {k:36s} {old[k]:8.3f}s -> {new[k]:8.3f}s ({ratio:.2f}x)")
    if not flagged:
        print("  all shared entries within the spread threshold")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"  new entries (no baseline): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
