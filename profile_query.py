"""Isolated per-query measurement + plan capture (optimization-round
instrument; guide §1).

Usage:
    python profile_query.py NAME [NAME ...] [--reps N] [--plan DIR]

Spins ONE session (same conf as bench.py), warms the JVM + page cache
the way bench.py does, then for each named registry query runs one
untimed warm-up execution followed by --reps timed noop-forced
executions, and prints per-query median/min/max. With --plan DIR the
final DataFrame's explain("formatted") is also written to
DIR/<name>.txt. Median-of-reps in one quiet process is the comparison
number for before/after claims; full bench runs on this host swing
20%+ run-to-run (OPTIMIZATION_r15.md, "Host noise").
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from djangoadmin_postgresql_2_elasticseach_spark import registry
from djangoadmin_postgresql_2_elasticseach_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None)
    ap.add_argument("--no-warmup-run", action="store_true",
                    help="time the first execution too (cold-shape check)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.cleaner.referenceTracking": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_testdata

    for df in load_testdata(spark, sf_dir).values():
        df.count()

    for name in args.names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        n_runs = args.reps if args.no_warmup_run else args.reps + 1
        for i in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if args.no_warmup_run or i > 0:
                times.append(dt)
            else:
                cold = dt
        med = statistics.median(times)
        print(
            f"{name:34s} median {med:7.3f}  min {min(times):7.3f}  "
            f"max {max(times):7.3f}  (first {cold:7.3f})"
            if not args.no_warmup_run
            else f"{name:34s} median {med:7.3f}  min {min(times):7.3f}  max {max(times):7.3f}",
            flush=True,
        )
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as fh:
                fh.write(plan)


if __name__ == "__main__":
    main()
