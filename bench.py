"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (no driver collect
cost, no result truncation), timed end-to-end including planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "e03_time_bucket",
    "e05_topk",
    "e07_join_left_group",
    "e10_gap_detect",
    "e15_collect_list",
    "d2_latest_state",
    "dd1_exact_dedup",
    "dd2_ngram_jaccard_topk",
    "dd3_minhash_lsh",
    "t2_quality_score",
    "t3_lang_id",
    "s1_cosine_topk",
    "s3_embedding_dup_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from era_parser_spark.queries import load_all
    from era_parser_spark.session import get_spark

    queries, _ = load_all()
    spark = get_spark(app_name="era_parser_spark_bench")

    # Warm the JVM/codegen paths once so per-query times measure the engine,
    # not first-call class loading.
    queries["e05_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
