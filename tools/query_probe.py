"""Per-query isolation probe for the optimization rounds (guide §1).

For each requested registry query: capture ``explain("formatted")`` to
``plans/<tag>/<name>_<suffix>.txt`` and time N noop-sink executions
(``df.write.format("noop")`` — computes every column of every row,
guide §1.4) so the computation is measured without the collect/driver
transfer the bench intentionally includes. Jobs are labelled via
``setJobDescription`` (guide §1.5).

Usage:
    python tools/query_probe.py NAME [NAME ...] [--suffix before]
        [--trials 3] [--sf-dir /root/testdata/sf0.1] [--no-plan]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icerunner_spark import queries as q  # noqa: E402
from icerunner_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--plans-dir", default=None)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = args.plans_dir or os.path.join(here, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="query_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    # one warm-up amortizes JVM/codegen startup, same as bench.py
    registry["q6_revenue_forecast"](spark, args.sf_dir).collect()

    for name in args.names:
        fn = registry[name]
        df = fn(spark, args.sf_dir)
        if not args.no_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
        trials = []
        for i in range(args.trials):
            spark.sparkContext.setJobDescription(f"{name} trial {i}")
            t0 = time.perf_counter()
            # fresh build each trial: query functions may create demo tables
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        trials.sort()
        print(
            f"{name}: median {trials[len(trials) // 2]:.3f}s "
            f"(min {trials[0]:.3f}, max {trials[-1]:.3f}, n={len(trials)})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
