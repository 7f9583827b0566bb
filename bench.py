#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>}

Each query is forced end-to-end with a noop sink (full compute, no
collect/serialize overhead). Session startup is excluded; per-query
times are a single measured run after one tiny warm-up query to JIT
the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_only_importer_prototype_spark import queries as q  # noqa: E402
from clickhouse_only_importer_prototype_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "region_rollup",
    "rollup_region_nation",
    "priority_quantiles",
    "window_topk_orders",
    "segment_distinct_stats",
    "union_all_slices",
    "anti_join_idle_customers",
    "intersect_except_customers",
    "events_json_extract",
    "pivot_concat_values",
    "melt_unpivot_part",
    "surrogate_ids",
    "long_to_values_rebuild",
    "events_hourly",
    "events_sessionize",
    "events_pivot_counts",
    "events_sliding_counts",
    "events_asof_join",
    "events_interval_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "winnow_fingerprint",
    "corpus_curation",
    "text_repetition",
    "text_redact_pii",
    "top_trigrams",
    "ann_cosine_topk",
    "embedding_neardup",
    "minhash_lsh_candidates",
    "dedup_clusters",
    "simhash_signatures",
    "dedup_simhash_pairs",
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_ivf",
    "multimodal_meta",
    "multimodal_frame_plan",
    "multimodal_features",
    "train_val_test_split",
    "corpus_hash_sample",
    "sequence_packing",
    "embedding_quantize",
    "training_manifest",
    "multimodal_resize",
    "decontamination_hits",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cips-bench")
    registry = q.queries()

    # warm-up: JIT/codegen + FS metadata, not measured
    q.q6_forecast_revenue(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        # each query stands alone: operators may persist internal frames,
        # and accumulated caches would skew later queries' timings
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
