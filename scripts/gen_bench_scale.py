"""Run the full headline bench at sf0.1 AND at the 10x replica
(.scale/sf1, built by scripts/gen_scale_data.py) and assemble the
BENCH_SCALE artifact.

Usage: python scripts/gen_bench_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SCALE.json"
    )
    big_dir = os.environ.get(
        "PROBE_BIG_DIR", os.path.join(REPO, ".scale/sf1")
    )
    small = run_bench(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    big = run_bench(big_dir)
    ratios = {
        q: round(big["queries"][q] / small["queries"][q], 2)
        for q in small["queries"]
        if q in big["queries"] and small["queries"][q]
    }
    doc = {
        "metric": "headline_queries_scaling_10x",
        "unit": "sec",
        "method": (
            "10x shape-preserving replication of sf0.1 into disjoint key "
            "shards (scripts/gen_scale_data.py; docs shingle-salted per "
            "copy, embeddings perturbed), same bench.py best-of-2 "
            "methodology as BENCH_r03+"
        ),
        "sf0.1": small,
        "sf1": big,
        "scaling_factor_10x_data": ratios,
        "total_scaling": round(big["value"] / small["value"], 2),
        "max_query_scaling": max(ratios.values()),
        "all_queries_subs_linear": all(r < 10 for r in ratios.values()),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(
        json.dumps(
            {
                "total_scaling": doc["total_scaling"],
                "max_query_scaling": doc["max_query_scaling"],
                "out": out_path,
            }
        )
    )


if __name__ == "__main__":
    main()
