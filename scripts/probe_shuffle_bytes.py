"""Shuffle-byte probe: runs named registry queries in ONE session with
the UI status store enabled and reports, per query, the total shuffle
WRITE bytes and records of the stages each run created (REST
/api/v1/applications/<id>/stages, delta between runs).  Bytes — unlike
wall time — are deterministic under in-session ordering, so one
session is sound here (the timing probes stay isolated per the r11
methodology).

Usage: python scripts/probe_shuffle_bytes.py query [query ...]
Env: PROBE_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Evidence consumer: SCALE.md (e.g. the block-dedup 128-bit-key
variant's byte reduction, VERDICT r11 #8).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_cdk_pipelines_datalake_etl_spark.plans.registry import build_registry
from aws_cdk_pipelines_datalake_etl_spark.session import get_spark


def _stages(ui: str) -> dict[int, tuple[int, int]]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    out = {}
    for s in json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    ):
        out[(s["stageId"], s["attemptId"])] = (
            s.get("shuffleWriteBytes", 0),
            s.get("shuffleWriteRecords", 0),
        )
    return out


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: probe_shuffle_bytes.py query [query ...]")
    sf_dir = os.environ.get("PROBE_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="shuffle-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    ui = "http://localhost:4047"
    registry = build_registry()
    results = {}
    for n in names:
        before = _stages(ui)
        t0 = time.time()
        registry[n].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        took = round(time.time() - t0, 3)
        time.sleep(1.0)  # let the status store settle
        after = _stages(ui)
        new = [v for k, v in after.items() if k not in before]
        results[n] = {
            "shuffle_write_bytes": sum(b for b, _ in new),
            "shuffle_write_records": sum(r for _, r in new),
            "n_stages": len(new),
            "wall_s": took,
        }
        print(f"# {n}: {results[n]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
