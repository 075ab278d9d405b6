"""Whole-registry physical-plan lint: catch the join anti-pattern class
BEFORE it costs a round.

History this codifies (CLAUDE.md / docs/PLANS.md): a non-equi join
condition (`a <= b`) silently plans as BroadcastNestedLoopJoin — a
broadcast of a WHOLE side — and a missing join condition plans as
CartesianProduct; both look fine at sf0.01 and melt at scale (the r03
grid-join incident).  Intentional BNLJs exist (a single-row collected
struct/array side broadcast onto the corpus: ivf_assign's centroid row,
knn_join's query row, winnowing's threshold row...), so BNLJ is
allowlisted PER ENTRY while CartesianProduct is never acceptable.

Usage: python tools/plan_lint.py [sf_dir]
  exit 1 if any entry plans a CartesianProduct, or a BNLJ appears in an
  entry outside the allowlist (new intentional single-row broadcasts
  must be added there, with the justification pattern).

The same check runs in tests/test_plan_audit.py::test_registry_plan_lint
so the gate is part of the suite, not just a tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# Entries whose BroadcastNestedLoopJoin is a deliberate single-row (or
# provably tiny collected-artifact) broadcast side.  Every addition needs
# a justification comment.
BNLJ_ALLOWLIST = {
    # single collected-array/struct row broadcast onto the corpus:
    "s1_cosine_topk",          # query vector row
    "s2_ann_ivf_topk",         # centroid array row
    "s5_knn_join",             # collected query-set row
    "s9_label_centroids",      # centroid array row
    "s11_ivf_pq_search",       # PQ codebook row
    "s11b_ivf_pq_residual",    # PQ codebook row
    "s11c_ivf_pq_rerank",      # PQ codebook row
    "s13_ann_knn_join",        # probe-map row
    "s14_sq8_topk",            # SQ8 scale row
    "s12_mmr_diversify",       # pool rows (bounded by pool_k)
    "dd7_decontaminate",       # bench shingle-set row
    "dd14_bloom_decontaminate",  # 32 KB Bloom bitset row
    "p12_curation_v2",         # composes dd14's Bloom row
    "s10_pq_codes",            # PQ codebook row
    "x6_range_join",           # 3-row literal band table (bands ARE a BNLJ)
    "dd8_semdedup",            # hash-cell centroid row
    "dd17_semantic_decontaminate",  # bench matrix row
    "dd18_semdedup_kmeans",    # trained centroid row
    "s16_kmeans_lloyd",        # trained centroid row
    "s17_kcenter_greedy",      # center list row
    "s18_kmeans_kcenter_init",  # seed list row
    "st13_stream_cluster_counts",  # broadcast trained model
    "wn1_winnowing_overlap",   # 1-row threshold aggregate
    "t6_term_salience",        # 1-row corpus-totals aggregate
    "t17_bigram_lm_score",     # 1-row vocab aggregate
    "t17b_bigram_lm_train_score",  # 1-row trained-model aggregate
    "t21_perplexity_buckets",  # 1-row bucket-bounds aggregate
    "t22_bm25_topk",           # 1-row corpus-stats + query row
    "t25_ngram_novelty",       # 1-row prior-corpus gram set
    "t26_hash_embed",          # idf map row
    "mm6_video_scene_cuts",    # 1-row threshold aggregate
    "mm7_keyframes",           # 1-row threshold aggregate
    "p5_temperature_mix",      # 1-row source-totals aggregate
    "p7_global_order",         # rangepartition sampling row
    "p9_split_assign",         # split-bounds row
    "p11_weighted_sample",     # 1-row threshold aggregate
    "p15_curation_v3",         # composes dd17's bench row
    "p16_dsir_importance",     # trained ratio map row
    "p17_source_drift_chi2",   # baseline histogram row
    "p18_budget_waterfill",    # per-source level row
    "p19_curation_v4",         # composes s16/dd18 centroid rows
    "x5_percentiles",          # 1-row percentile-bounds aggregate
    "x7_systematic_sample",    # 1-row stride aggregate
    "x8_approx_stats",         # 1-row sketch aggregate
    "x12_kmv_distinct",        # 1-row KMV set
    "x14_equidepth_histogram",  # 1-row bounds aggregate
    "x27_kmv_intersection",    # 1-row KMV sets
    "x33_hll_distinct",        # 1-row register set
    "e19_empty_guard",         # 1-row empty-check aggregate
    "q1_pricing_summary",      # 1-row date-bound aggregate
}


def lint(spark, queries: dict, sf_dir: str) -> list[str]:
    problems: list[str] = []
    for name in sorted(queries):
        # Streaming entries run a full (bounded) streaming job when built
        # and return the sink result frame; lint whatever plan they expose
        # for CartesianProduct / row-at-a-time python the same as batch
        # entries, but skip the BNLJ check (their batch-training stages
        # legitimately broadcast tiny collected artifacts, and the result
        # frame's join shape is not the streaming plan).  Keying the skip
        # on BNLJ_ALLOWLIST membership silently exempted non-allowlisted
        # st entries from ALL checks (round-8 advice).
        streaming = name.startswith("st")
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - lint must report, not die
            problems.append(f"{name}: plan build failed: {type(exc).__name__}: {exc}")
            continue
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct in physical plan")
        if (
            "BroadcastNestedLoopJoin" in plan
            and not streaming
            and name not in BNLJ_ALLOWLIST
        ):
            problems.append(
                f"{name}: BroadcastNestedLoopJoin outside the allowlist "
                "(non-equi join condition? add to BNLJ_ALLOWLIST only if the "
                "broadcast side is a provably tiny collected artifact)"
            )
        if "BatchEvalPython" in plan:
            # row-at-a-time python UDF — the 10-100x-slower non-Arrow
            # path; every python kernel here must be pandas_udf /
            # mapInPandas / applyInPandas (ArrowEvalPython, MapInPandas,
            # FlatMapGroupsInPandas nodes).  No allowlist on purpose.
            problems.append(f"{name}: row-at-a-time BatchEvalPython in plan")
        spark.catalog.clearCache()
    return problems


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    problems = lint(spark, m.queries(), sf_dir)
    for p in problems:
        print(p)
    print(f"{'FAIL' if problems else 'CLEAN'}: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
