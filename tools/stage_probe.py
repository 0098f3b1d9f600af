"""Stage-level decomposition of one registry query (guide §7.1 without
the browser): run the query once with the UI enabled, then read per-stage
metrics from the local REST API and print them sorted by executor time.

Usage: python tools/stage_probe.py NAME [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icerunner_spark import queries as q  # noqa: E402
from icerunner_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="stage_probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    registry["q6_revenue_forecast"](spark, args.sf_dir).collect()  # warm-up

    spark.sparkContext.setJobDescription(args.name)
    registry[args.name](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    app_id = spark.sparkContext.applicationId
    base = f"http://127.0.0.1:4099/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = []
    for s in stages:
        rows.append(
            (
                s.get("executorRunTime", 0),
                s["stageId"],
                s.get("numCompleteTasks", s.get("numTasks", 0)),
                s.get("inputBytes", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                s.get("outputRecords", 0) or s.get("outputBytes", 0),
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total executorRunTime {total/1000:.1f}s over {len(rows)} stages")
    print(f"{'run_ms':>9} {'stage':>5} {'tasks':>5} {'input':>10} {'shR':>10} {'shW':>10}  name")
    for r in rows[:40]:
        print(
            f"{r[0]:9d} {r[1]:5d} {r[2]:5d} {r[3]:10d} {r[4]:10d} {r[5]:10d}  {r[7]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
