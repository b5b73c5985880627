"""Per-operator 10x scale probe: times registry queries at two scale
factors (default sf0.1 and the gitignored .scale/sf1 built by
scripts/gen_scale_data.py) with bench.py's exact methodology (table +
codegen warmup, noop sink, best-of-2) and prints one JSON line with
per-query ratios — the evidence behind SCALE.md's measured tables.

Usage: python scripts/probe_scale_ops.py query [query ...]
Env: PROBE_BASE_DIR (default /root/testdata/sf0.1),
     PROBE_BIG_DIR (default .scale/sf1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_cdk_pipelines_datalake_etl_spark.plans.registry import build_registry
from aws_cdk_pipelines_datalake_etl_spark.session import get_spark


def _warm(spark, registry, names, warm_dir):
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        TESTDATA_TABLES,
        load_table,
    )

    for t in TESTDATA_TABLES:
        try:
            load_table(spark, warm_dir, t).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass
    for n in names:
        try:
            registry[n].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass


def _time(spark, registry, names, sf_dir):
    out = {}
    for n in names:
        best = None
        for i in range(2):
            t0 = time.time()
            registry[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = round(time.time() - t0, 3)
            print(
                f"# {n} @ {sf_dir} run{i + 1}: {took}s",
                file=sys.stderr,
                flush=True,
            )
            best = took if best is None else min(best, took)
        out[n] = best
    return out


def main() -> None:
    names = sys.argv[1:]
    assert names, "pass registry query names"
    base = os.environ.get("PROBE_BASE_DIR", "/root/testdata/sf0.1")
    big = os.environ.get("PROBE_BIG_DIR", ".scale/sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="probe-scale", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = build_registry()
    _warm(spark, registry, names, "/root/testdata/sf0.001")
    small = _time(spark, registry, names, base)
    # warm the big dir's tables too (first-touch I/O out of the timing)
    _warm(spark, registry, names, big)
    bigt = _time(spark, registry, names, big)
    print(
        json.dumps(
            {
                "metric": "per_op_scaling_10x",
                "base_dir": base,
                "big_dir": big,
                "base": small,
                "big": bigt,
                "ratio": {
                    n: round(bigt[n] / small[n], 2) if small[n] else None
                    for n in names
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
