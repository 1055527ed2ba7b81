#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "headline_suite", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

Each query is materialized with a noop sink (full execution, no driver
transfer). Baseline context (BASELINE.md): the reference's Task4 pipeline
ran ≈3,400 rows/s on 417k rows; `events_rows_per_sec` here is the comparable
figure for our full classify+window+count pipeline over `events`.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamming_processing_pyspark_spark.registry import build_queries
from streamming_processing_pyspark_spark.session import get_spark
from streamming_processing_pyspark_spark.tables import DEFAULT_SF_DIR, load_table

HEADLINE = [
    # reference-surface queries
    "hourly_counts_by_key",
    "geofence_hourly_counts",
    "trending",
    # relational
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "running_order_totals",
    # text / dedup / similarity
    "word_counts",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")
    queries = build_queries()

    # warm the JVM/codegen once so per-query numbers measure the queries
    load_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    events_rows = load_table(spark, sf_dir, "events").count()
    pipeline_sec = timings["geofence_hourly_counts"]
    print(
        json.dumps(
            {
                "metric": "headline_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "events_rows_per_sec": round(events_rows / pipeline_sec)
                if pipeline_sec
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
