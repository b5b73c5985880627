"""Per-query profiler for the headline bench slots (guide §1).

For each named query (or every HEADLINE slot) at $SPARK_GRAFT_SF_DIR:
  - t_build : Python DataFrame construction (py4j analysis chatter)
  - t_plan  : Catalyst optimization + physical planning (explain cost)
  - t_exec  : noop-sink execution, median of N (plan already optimized)
plus per-job stage metrics from the status tracker (task counts and
executor run times per stage) so shuffle-heavy stages are attributable.

Usage: python scripts/profile_bench.py [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_cdk_pipelines_datalake_etl_spark.plans.registry import build_registry
from aws_cdk_pipelines_datalake_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = build_registry()

    names = sys.argv[1:]
    if not names:
        import bench

        names = bench.HEADLINE

    # warm inputs + codegen exactly like bench.py
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        TESTDATA_TABLES,
        load_table,
    )

    for t in TESTDATA_TABLES:
        try:
            load_table(spark, sf_dir, t).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            registry[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass

    out = {}
    for name in names:
        fn = registry[name].fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0

        t0 = time.time()
        # force optimization + physical planning without executing
        df._jdf.queryExecution().executedPlan()
        t_plan = time.time() - t0

        execs = []
        for _ in range(reps):
            # fresh DataFrame each rep, same as bench (planning re-paid)
            t0 = time.time()
            d2 = fn(spark, sf_dir)
            d2.write.format("noop").mode("overwrite").save()
            execs.append(time.time() - t0)
        out[name] = {
            "build_s": round(t_build, 3),
            "plan_s": round(t_plan, 3),
            "e2e_median_s": round(statistics.median(execs), 3),
            "e2e_min_s": round(min(execs), 3),
            "exec_only_est_s": round(
                statistics.median(execs) - t_build - t_plan, 3
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print("TOTAL", json.dumps({
        "build": round(sum(v["build_s"] for v in out.values()), 2),
        "plan": round(sum(v["plan_s"] for v in out.values()), 2),
        "e2e_median": round(sum(v["e2e_median_s"] for v in out.values()), 2),
    }))


if __name__ == "__main__":
    main()
