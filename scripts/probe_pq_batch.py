"""Scale probe: ADC with a LARGE query batch (the case the literal
distance tables can't survive — VERDICT r4 "What's wrong" #3).

Times ``pq_adc_topk(tables="broadcast")`` at nq in {50, 1000} over the
sf0.1 embeddings, plus the literal form at nq=50 for context (the
literal form at nq=1000 would inline 1000 * m * ksub array literals
into one projection — the exact plan-size cliff the broadcast form
removes, so it is deliberately NOT run at 1000).

Prints one JSON line; recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_cdk_pipelines_datalake_etl_spark.operators import pq  # noqa: E402
from aws_cdk_pipelines_datalake_etl_spark.session import get_spark  # noqa: E402
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (  # noqa: E402
    load_table,
)


def main() -> None:
    sf_dir = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="probe-pq-batch",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()  # materialize cache
    books = pq.train_pq_codebooks(emb, m=16, ksub=16)
    codes = pq.pq_encode(emb, books).cache()
    codes.count()

    def run(tables: str, nq: int) -> float:
        queries = emb.limit(nq)
        t0 = time.monotonic()
        pq.pq_adc_topk(codes, books, queries, k=5, tables=tables).count()
        return round(time.monotonic() - t0, 3)

    out = {
        "metric": "pq_adc_query_batch_seconds",
        "sf_dir": sf_dir,
        "corpus_vectors": n,
        "literal_nq50": run("literal", 50),
        "broadcast_nq50": run("broadcast", 50),
        "broadcast_nq1000": run("broadcast", 1000),
    }
    out["broadcast_scaling_20x_queries"] = (
        round(out["broadcast_nq1000"] / out["broadcast_nq50"], 2)
        if out["broadcast_nq50"]
        else None
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
