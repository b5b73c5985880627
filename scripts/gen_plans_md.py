"""Regenerate PLANS.md: the actual physical plans of representative
queries, with the scale-relevant properties called out — verifiable
evidence that the plans are the ones SCALE.md claims.

Usage: python scripts/gen_plans_md.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.01")

# query -> the plan properties a reviewer should look for
SHOWCASE = {
    "q01_pricing_summary": (
        "partial_sum/partial_count BEFORE the Exchange (map-side combine); "
        "PushedFilters on l_shipdate; pruned ReadSchema"
    ),
    "q06_broadcast_dim_join": (
        "BroadcastHashJoin with BroadcastExchange on the dim side only — "
        "the fact side never shuffles"
    ),
    "q25_exists_correlated": (
        "EXISTS/NOT EXISTS decorrelated to SortMergeJoin LeftSemi + "
        "BroadcastHashJoin LeftAnti — no per-row subquery re-execution"
    ),
    "q24_grouping_sets": (
        "one Expand node feeding ONE Exchange — grouping sets do not "
        "multiply shuffles"
    ),
    "q34_window_navigation": (
        "lag/lead/ntile/first_value share a single Window node over one "
        "Exchange+Sort — the partitioning is reused across functions"
    ),
    "q29_pandas_udf_score": (
        "ArrowEvalPython (vectorized Arrow batches), not BatchEvalPython "
        "(row-at-a-time pickle)"
    ),
    "udaf_mad": (
        "grouped-agg pandas UDF: ArrowAggregatePython after exactly one "
        "hash Exchange — same shuffle shape as a builtin aggregate"
    ),
    "sketch_distinct_rollup": (
        "two ObjectHashAggregate pairs, each partial->final: the raw scan "
        "partial-aggregates hll_sketch_agg map-side, and the rollup merge "
        "partial-aggregates hll_union_agg — nothing holistic anywhere"
    ),
    "q03_filter_project": (
        "PushedFilters: [IsNotNull, GreaterThan/LessThan ...] reach the "
        "parquet scan; ReadSchema carries only the projected columns"
    ),
    "bucketed_join": (
        "SortMergeJoin with ZERO Exchange nodes: both sides are bucketed "
        "on the join key, so co-location is free (SelectedBucketsCount)"
    ),
    "sim_quantize_embeddings": (
        "zero Exchange, zero Python nodes: the int8 quantization is a pure "
        "codegen'd array-expression scan — 100 TB at scan speed"
    ),
    "text_contamination": (
        "BroadcastExchange on the (small) eval shingle set + BroadcastHashJoin: "
        "the corpus side never shuffles before the tiny pair aggregation"
    ),
    "cdc_table_diff": (
        "one full-outer SortMergeJoin on the key over md5 row fingerprints — "
        "the reconciliation costs exactly one co-partitioning of each side"
    ),
    "dedup_bloom_prefilter": (
        "the bitmap probe is a BroadcastHashJoin (bitmap words broadcast, "
        "zero corpus shuffle at probe time); the exact anti-join's left "
        "side is only the bloom-positive keys"
    ),
    "corpus_epoch_shuffle": (
        "every windowspecdefinition is partitioned by _bucket — the global "
        "permutation is assembled from bucketed ranks + broadcast offsets, "
        "never a single-partition window"
    ),
    "dedup_winnow_fingerprints": (
        "k-gram hashing is a codegen'd Generate+Project (sequence explode "
        "+ element_at/concat_ws/md5 — no higher-order lambdas); the "
        "rightmost-min selection is 6 lag/lead columns over ONE Window "
        "(single Exchange in the plan) + a scalar filter"
    ),
    "sim_ivfpq_bcast_full": (
        "the ADC distance tables are broadcast DATA, not plan literals: "
        "BroadcastHashJoin on (centroid_id, j, code) after posexplode of "
        "the code arrays, partial-sum HashAggregate in the join stage — "
        "plan size constant in the query-batch size"
    ),
    "web_url_normalize": (
        "zero Exchange, zero Python: URL canonicalization + registered "
        "domain are one codegen'd regexp/array Project over the scan — "
        "crawl-scale normalization at scan speed"
    ),
    "dedup_substring_spans": (
        "linear substring-span pass, round-9 COMPLEMENT scheme: Generate "
        "(gram explode) then ONE gram-key Exchange into a constant-state "
        "HashAggregate (min/max/count, map-side partials) — positions "
        "never re-shuffle; single-doc grams (min==max) flow straight "
        "into a tiny doc-keyed sum and n_dup = n_grams - singles; the "
        "r8 dup-gram marking JOIN is gone entirely"
    ),
    "q69_suppliers_who_kept_waiting": (
        "both correlated branches decorrelated: EXISTS -> LeftSemi, "
        "NOT EXISTS (two outer references) -> LeftAnti with the date "
        "predicate in the join condition — no per-row subquery re-execution"
    ),
    "retrieval_bm25_topk": (
        "the query-term table rides a BroadcastExchange into every probe "
        "join — the corpus-sized inverted index never reshuffles; ranking "
        "windows are partitioned by query id (no global sort)"
    ),
    "lm_perplexity_cutpoints": (
        "the scale form of equal-depth bucketing: ONE partial-aggregating "
        "percentile pass (single-partition exchange of one partial row per "
        "task, not of the corpus), boundaries broadcast, labels applied as "
        "a row-local aggregate expression — NO Window, NO Sort of the "
        "scored rows (the ntile twin would sort everything in one task)"
    ),
    "retrieval_rrf_fusion": (
        "fusion touches only top-k tables: union + one hash Exchange on "
        "(query, doc) + per-query windows — corpus-independent cost; "
        "partials are integer nano-units (no float sum anywhere)"
    ),
    "tokenizer_bpe_encode": (
        "encoding adds NO Exchange: ArrowEvalPython applies the broadcast "
        "merge table row-locally; the only shuffle in the whole entry is "
        "the training word-count aggregation"
    ),
    "corpus_packed_ids": (
        "tokenize->pack: ArrowEvalPython (broadcast merge+vocab tables) "
        "feeds ONE per-shard Window (16-way Exchange, never single-"
        "partition) then a per-(doc x overlapped-sequence) Generate — "
        "row-local slice fan-out, no per-token rows — and one hash "
        "Exchange reassembling sequences; intermediate volume is "
        "O(total_tokens + n_docs) regardless of budget"
    ),
    "text_pack_sequences": (
        "packing is two bounded shuffles: ONE 16-way per-shard Window "
        "(never single-partition), a Generate fanning each doc to only "
        "its overlapped sequences (no per-token rows), and one hash "
        "Exchange reassembling sequences via sort_array+flatten — "
        "intermediate volume O(total_tokens + n_docs) at any budget"
    ),
    "text_langid_nb": (
        "NB language ID, round-9 single-exchange plan: the trigram model "
        "rides a BroadcastExchange into a LEFT BroadcastHashJoin on the "
        "exploded occurrences (corpus side never shuffles before the "
        "aggregation), ONE doc-keyed HashAggregate computes all 14 "
        "per-language matched sums as pivoted conditional sums (map-side "
        "partials), and argmax + smoothing denominators + top-2 margin "
        "are a row-local array_sort over integer literals — NO grid "
        "join, NO SortMergeJoin, NO Window, NO Python anywhere"
    ),
    "corpus_quality_scores": (
        "the oracle-backed classifier scoring path: hashed features are "
        "one explode + (doc, slot) HashAggregate; the one-step-GD weight "
        "table is slot-keyed integer gradient sums (map-side partials) "
        "with the only float op a correctly-rounded IEEE divide; scoring "
        "is a BroadcastHashJoin of the weight table into one doc-keyed "
        "integer-dot-product aggregate — bounded control data only, "
        "no collect of anything corpus-sized"
    ),
    "corpus_dsir_weights": (
        "DSIR importance weights (round-9 session 2): unigram+bigram "
        "occurrences are a Generate+Project fan-out of the materialized "
        "token array (the HOF-inlining lesson), ONE (doc, slot) "
        "HashAggregate builds the feature table, the <=4096-row bucket "
        "model is the only collect (bounded control data), and scoring "
        "is a BroadcastHashJoin of the lambda table into one doc-keyed "
        "bigint aggregate — nothing corpus-sized is collected, no "
        "Window, no Python"
    ),
    "text_span_corruption": (
        "blocked T5 span corruption: a SINGLE narrow projection — no "
        "Exchange, no Generate, no Python; the per-window span starts "
        "are materialized once per document (one md5 per window) and "
        "the position walk is hash-free array lookups inside "
        "whole-stage-codegen'd higher-order functions"
    ),
    "corpus_training_set_v3": (
        "the select->FIM->pack capstone: the DSIR weight flow feeds a "
        "TakeOrderedAndProject top-200 (per-partition heads, no global "
        "sort), FIM is a row-local array projection over the joined "
        "survivors, and packing is the standard two bounded shuffles "
        "(16-way shard Window + sequence-reassembly HashAggregate) — "
        "one broadcast-size selection list is the only cross-stage "
        "control data"
    ),
    "dedup_block_units": (
        "exact unit dedup (round 11): one Generate (block fan-out of the "
        "staged words column), ONE unit-keyed HashAggregate keeping a "
        "min-struct winner per distinct unit (map-side partials — the "
        "duplicate mass crosses the shuffle once and there is NO "
        "join-back against the exploded stream), one doc-keyed "
        "reassembly aggregate, one doc-keyed coverage join"
    ),
    "text_ul2_mixture": (
        "UL2 mixture (round 11): three FILTERED branches of the same "
        "scan (hash-route predicate pushed to each), each a pure "
        "row-local array projection (the span-corruption machinery — "
        "no explode, no shuffle, no Python), unioned — total work is "
        "one pass over the corpus"
    ),
    "sample_doremi_weights": (
        "DoReMi weights (round 11): one token explode feeds the "
        "vocabulary HashAggregate and the source-keyed micro-nat sums "
        "(map-side partials); the multiplicative-weights loop runs on "
        "the collected n_sources-row table (bounded control data), and "
        "every cross-row reduction inside it is an integer sum/min"
    ),
    "corpus_training_set_v4": (
        "the round-11 capstone: block-dedup output staged ONCE (eager "
        "localCheckpoint) for its three consumers; DoReMi alphas from "
        "the bounded per-source table; per-source budget sampling via "
        "the composite-bucket grouped rank (offsets broadcast, NO "
        "per-source global window); UL2 branches row-local over the "
        "staged sample — nothing corpus-sized moves twice"
    ),
}


def main() -> None:
    from aws_cdk_pipelines_datalake_etl_spark import get_spark
    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan
    from aws_cdk_pipelines_datalake_etl_spark.plans.registry import build_registry

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()

    out = [
        "# PLANS — physical plans of representative queries (generated)",
        "",
        "Produced by `python scripts/gen_plans_md.py` at sf0.01; regenerate",
        "after plan-affecting changes.  Each section names the property that",
        "matters at 100 TB; `tests/test_plan_quality.py` asserts these",
        "properties so they survive refactors.",
        "",
    ]
    for name, note in SHOWCASE.items():
        plan = formatted_plan(reg[name].fn(spark, SF_DIR))
        # strip the volatile plan-id / file-path noise for a stable diff
        plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
        plan = re.sub(r"\[file:[^\]]+\]", "[testdata]", plan)
        out += [f"## {name}", "", f"**Look for:** {note}", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}: {len(SHOWCASE)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
