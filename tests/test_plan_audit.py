"""Plan-property regression tests: the physical plans documented in
docs/PLANS.md are invariants, not happy accidents.  If a refactor loses a
pushdown or turns a broadcast into a shuffle, these fail.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def queries():
    from era_parser_spark.queries import load_all

    q, _ = load_all()
    return q


def test_filter_and_projection_pushdown(spark, queries):
    from era_parser_spark.plans import pushed_filters, read_schema_columns

    df = queries["e01_filter_project"](spark, SF_MED)
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters and "l_discount" in filters
    (cols,) = read_schema_columns(df)
    # scan must read only the referenced columns, not the 11-column table
    assert cols == {
        "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate",
    }


def test_q3_broadcasts_dimensions(spark, queries):
    from era_parser_spark.plans import broadcast_join_count, plan_summary

    df = queries["q3_shipping_priority"](spark, SF_MED)
    assert broadcast_join_count(df) >= 1  # customer side must broadcast
    assert plan_summary(df)["sort_merge_joins"] <= 1


def test_q5_star_join_all_broadcast(spark, queries):
    from era_parser_spark.plans import broadcast_join_count

    df = queries["q5_local_supplier_volume"](spark, SF_MED)
    # supplier, customer, nation, region sides all broadcast
    assert broadcast_join_count(df) >= 4


def test_topk_avoids_global_sort(spark, queries):
    from era_parser_spark.plans import uses_take_ordered

    assert uses_take_ordered(queries["e05_topk"](spark, SF_MED))


def test_q1_partial_aggregation(spark, queries):
    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["q1_pricing_summary"](spark, SF_MED))
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2


def test_range_join_is_broadcast_nested_loop(spark, queries):
    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["x6_range_join"](spark, SF_MED))
    assert "BroadcastNestedLoopJoin" in plan


def test_month_partition_pruning(spark, tmp_path):
    """Partitioned warehouse writes must prune on month filters."""
    from pyspark.sql import functions as F

    from era_parser_spark.plans import formatted_plan
    from era_parser_spark.queries.registry import table
    from era_parser_spark.sinks.writers import write_parquet

    ev = table(spark, SF_MED, "events").select(
        "event_id", F.col("ts").alias("timestamp_utc"), "value"
    )
    out = str(tmp_path / "part_events")
    write_parquet(ev, out, partition_by_month=True)
    back = spark.read.parquet(out).filter(F.col("month") == "2024-01")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "month" in plan.split("PartitionFilters")[1][:200]

def test_gap_detect_window_is_bucketed(spark, queries):
    """e10's lag window must hash-partition on the range bucket, never
    run the full relation through one SinglePartition window task."""
    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["e10_gap_detect"](spark, SF_MED))
    assert "hashpartitioning(__lag_bucket" in plan
    # the only SinglePartition window allowed is the tiny per-bucket
    # boundary carry (input: one row per bucket)
    main, _, carry = plan.partition("Exchange SinglePartition")
    assert "__lag_bucket" in main


def test_all_pairs_grid_is_equi_join(spark, queries):
    """s3's triangular block grid must be an equi-join on the cell key.
    A non-equi grid join plans as BroadcastNestedLoopJoin — i.e. the whole
    blocked corpus broadcast to every task, the full-matrix anti-pattern
    this operator exists to avoid."""
    df = queries["s3_embedding_dup_pairs"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan


def test_frame_sample_no_shuffle(spark, queries):
    """mm2 is a projection + explode over one scan: no Exchange anywhere."""
    df = queries["mm2_frame_sample"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located fact-fact join: two tables bucketed on the join key join
    with zero shuffle — the write-once-shuffle-never layout for 100 TB
    fact joins (blocks x transactions on slot)."""
    from pyspark.sql import functions as F

    from era_parser_spark.sinks.writers import write_bucketed

    left = spark.range(0, 10_000).select(
        F.col("id").alias("slot"), (F.col("id") * 2).alias("gas_used")
    )
    right = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("slot"), F.col("id").alias("tx_id")
    )
    write_bucketed(left, "ba_blocks", "slot", num_buckets=8)
    write_bucketed(right, "ba_txs", "slot", num_buckets=8)
    try:
        joined = (
            spark.table("ba_blocks")
            .join(spark.table("ba_txs"), "slot")
            .groupBy("slot")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # disable broadcast so the join strategy is decided by layout alone
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # neither join input re-shuffles: the bucket layout satisfies the
        # join's distribution requirement on both sides
        assert "Exchange hashpartitioning(slot" not in join_part
        assert joined.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS ba_blocks")
        spark.sql("DROP TABLE IF EXISTS ba_txs")


def test_salted_join_replicates_and_never_broadcasts(spark, queries):
    """x10: the build side must appear exploded over the salt sequence, the
    join must key on (custkey, __salt), and no broadcast may sneak in —
    a broadcast would bypass the hot-key spreading entirely."""
    from era_parser_spark.plans import formatted_plan

    import re

    df = queries["x10_salted_skew_join"](spark, SF_MED)
    # 8-way replication: the optimizer constant-folds sequence(0,7) into an
    # opaque array literal, so read the analyzed plan for the intent
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "explode(sequence(0, 7" in analyzed
    plan = formatted_plan(df)
    assert re.search(r"Left keys \[2\]: \[custkey#\d+L?, __salt", plan)
    assert re.search(r"Right keys \[2\]: \[custkey#\d+L?, __salt", plan)
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in exec_plan
    assert "ShuffledHashJoin" in exec_plan or "SortMergeJoin" in exec_plan


def test_term_salience_single_scan(spark, queries):
    """t6: df must come from a window over the tf table, not an
    aggregate-and-join back — the join formulation makes Catalyst scan and
    explode the corpus twice."""
    plan = queries["t6_term_salience"](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert plan.count("Generate explode") == 1
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle


def test_sequence_packing_caches_counted_projection(spark, queries):
    """p2: both prefix-sum branches must read the cached (id, count, bucket)
    projection — an uncached plan re-tokenizes the whole corpus per branch."""
    plan = queries["p2_sequence_packing"](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
    # both branches read the cache (the FileScan string still appears once
    # inside the InMemoryRelation definition; it executes only to fill it)
    assert plan.count("InMemoryTableScan") >= 2


def test_shared_branches_are_cached(spark, queries):
    """Entries whose expensive subtree feeds 2+ plan branches must read a
    cache, not recompute: dd4 (pandas-UDF fingerprints x2 join sides),
    p1 (enrichment -> dedup groupBy + survivor join), dd7 (shingle index ->
    size aggregate + join side, per corpus)."""
    for name, min_cached in (("dd4_simhash", 2), ("p1_curation_pipeline", 2),
                             ("dd7_decontamination", 4)):
        plan = queries[name](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= min_cached, name


def test_repetition_ratio_no_shuffle(spark, queries):
    """t7 is per-row higher-order expressions over one scan: no Exchange,
    no Python, one FileScan."""
    plan = queries["t7_repetition_ratio"](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1
    assert "Python" not in plan and "MapInPandas" not in plan


def test_semdedup_pairs_are_equi_join_on_cell(spark, queries):
    """dd8: candidate pairs must come from an equi-join on centroid_id (the
    cluster bound is the whole point — a global pair join is quadratic),
    and the assignment projection must be cached (it feeds both pair sides
    plus the anti-join; uncached each branch re-runs scan + argmin)."""
    import re

    df = queries["dd8_semdedup"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert plan.count("InMemoryTableScan") >= 3
    # the pair join keys on centroid_id (any shuffle/broadcast hash variant)
    assert re.search(r"(SortMergeJoin|HashJoin).{0,120}centroid_id", plan, re.S)


def test_knn_join_two_phase_topk(spark, queries):
    """s5: per-partition Arrow top-k then a tiny merge — never a global
    Window over the n_queries x n scored set, and the only nested-loop
    join is the single-row broadcast of the collapsed query side."""
    df = queries["s5_knn_join"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Window" not in plan  # top-k is not a row_number window
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row query side


def test_rarity_score_single_scan(spark, queries):
    """t8: like t6, df must be a count window OVER the tf table — one
    FileScan, one explode; never a re-tokenizing aggregate-and-join."""
    plan = queries["t8_rarity_score"](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert plan.count("Generate explode") == 1


def test_srp_pairs_all_equi_or_broadcast(spark, queries):
    """s6's bucket self-join and vector rejoin must stay equi-joins (the
    all-pairs BNLJ trap); the final top-20 must be TakeOrdered."""
    from era_parser_spark.plans import formatted_plan, uses_take_ordered

    df = queries["s6_srp_lsh_pairs"](spark, SF_MED)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert uses_take_ordered(df)


def test_temperature_mix_corpus_never_shuffles(spark, queries):
    """p5: rates come from a tiny agg; the corpus branch is scan ->
    broadcast join -> filter.  Every scan is pruned to <= 2 columns and
    the corpus rows never enter a hash Exchange."""
    import re

    from era_parser_spark.plans import formatted_plan, read_schema_columns

    df = queries["p5_temperature_mix"](spark, SF_MED)
    scans = read_schema_columns(df)
    # exactly two corpus scans (inherent two-pass: rates, then filter) —
    # a third appears if the min-rate derivation forks the counts subtree
    assert len(scans) == 2 and all(len(s) <= 2 for s in scans)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # the per-stratum count agg + the tiny single-partition rate window
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_scd2_single_exchange_two_windows(spark, queries):
    """x11: both windows partition on user_id — Catalyst must plan ONE
    Exchange + ONE Sort reused across change-point and lead windows."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["x11_scd2_intervals"](spark, SF_MED))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2


def test_boilerplate_strip_two_scans_no_join_back(spark, queries):
    """t9: exactly two tokenize scans (hot-count + rewrite — recompute,
    never a corpus-scale cache) and NO third scan from a join-back; the
    hot set joins broadcast."""
    from era_parser_spark.plans import formatted_plan, read_schema_columns

    df = queries["t9_boilerplate_strip"](spark, SF_MED)
    assert len(read_schema_columns(df)) == 2
    assert "BroadcastHashJoin" in formatted_plan(df)


def test_kmv_single_scan_no_window(spark, queries):
    """x12: one scan, two map-side-combinable aggregates, and no Window
    (the naive rank-k formulation would sort each group's full distinct
    set in one task)."""
    import re

    from era_parser_spark.plans import formatted_plan, read_schema_columns

    df = queries["x12_kmv_distinct"](spark, SF_MED)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_pii_redact_single_scan_no_exchange(spark, queries):
    """t10 is pure codegen regexp expressions over one pruned scan."""
    import re

    from era_parser_spark.plans import formatted_plan, read_schema_columns

    df = queries["t10_pii_redact"](spark, SF_MED)
    plan = formatted_plan(df)
    assert "Exchange" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    (cols,) = read_schema_columns(df)
    assert cols == {"doc_id", "text"}


def test_domain_filter_broadcast_verdict_pushed_blocklist(spark, queries):
    """p6: corpus rows never hash-exchange — the only Exchange carries the
    tiny post-partial-agg stats; the verdict joins back as a broadcast and
    the blocklist literal is pushed down to the corpus parquet scan."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["p6_domain_filter"](spark, SF_MED))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "Not(EqualTo(source,src7))" in plan  # blocklist at the scan


def test_zorder_stats_single_exchange(spark, queries):
    """x15: one codegen projection (bit math) + one aggregate."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["x15_zorder_layout"](spark, SF_MED))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan


def test_zorder_layout_is_one_range_partitioning(spark):
    """The layout writer costs exactly the range-partition shuffle."""
    import re

    from era_parser_spark.operators.layout import zorder_layout
    from era_parser_spark.plans import formatted_plan
    from era_parser_spark.queries.registry import table

    df = zorder_layout(
        table(spark, SF_MED, "lineitem"), ["l_partkey", "l_suppkey"], num_files=4
    )
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "rangepartitioning" in plan and "hashpartitioning" not in plan


def test_shared_spans_caches_gram_index_single_scan(spark, queries):
    """dd10: the hashed gram index feeds three branches (hot agg + both
    self-join sides) — it must be cached so the tokenize + lead-window
    pass runs once (FileScan strings recur inside each InMemoryTableScan's
    cached-relation print, so count the cache reads, like dd8's audit)."""
    df = queries["dd10_shared_spans"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3


def test_global_order_no_corpus_single_partition_window(spark, queries):
    """p7: the only Exchange SinglePartition feeds the tiny per-bucket
    offsets window; corpus rows hash-shuffle once on the bucket key."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["p7_curriculum_order"](spark, SF_MED))
    # exactly one SinglePartition exchange — the one feeding the tiny
    # offsets window (its input is the post-aggregate per-bucket counts)
    assert plan.count("SinglePartition") == 1
    # the corpus side reaches its local-rank window via a bucket hash
    # exchange, not the single partition
    assert re.search(r"hashpartitioning\(__gbucket", plan)
    # both branches read the cached projection, not a second file scan
    assert plan.count("InMemoryTableScan") >= 2


def test_asof_nearest_single_shuffle_shared_sort(spark, queries):
    """x18: the backward and forward windows must share one user_id
    Exchange + Sort — a second shuffle would double the join cost."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["x18_asof_nearest"](spark, SF_MED))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1


def test_round6_zero_shuffle_projections(spark, queries):
    """p9 (split assign) and t16 (URL stats) are pure per-row codegen —
    zero Exchange, zero Python, single scan."""
    import re

    from era_parser_spark.plans import formatted_plan

    for name in ("p9_split_assign", "t16_url_stats"):
        plan = formatted_plan(queries[name](spark, SF_MED))
        assert not re.search(r"\(\d+\) Exchange", plan), name
        assert "Python" not in plan and "MapInPandas" not in plan, name
        # one scan node (formatted mode prints each node's detail header
        # exactly once as "(n) Scan parquet")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, name


def test_tfidf_pairs_equi_join_no_cartesian(spark, queries):
    """dd13: the pair dot must come from an equi-join on the term column
    (the inverted index) — a Cartesian or nested-loop pair plan would be
    the corpus-quadratic failure mode."""
    import re

    plan = queries["dd13_tfidf_cosine_pairs"](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan
    # equi-join on the term key (any hash-join variant; AQE broadcasts the
    # small sf0.01 index, a cluster-scale run shuffles it — both fine)
    assert re.search(r"(SortMergeJoin|HashJoin).{0,200}__t", plan, re.S)
    # top-k rides TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_line_dedup_shuffles_on_md5_key(spark, queries):
    """t15: the first-occurrence aggregate and the winner join both key on
    the 32-byte md5 column, and reassembly partitions by doc — no
    Cartesian, no full-line-text join keys."""
    plan = queries["t15_line_dedup"](spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "__k" in plan  # the md5 key exists in the physical plan


def test_scene_cuts_payload_stays_on_scan(spark, queries):
    """mm6: Arrow-batched kernel directly over the scan — payload bytes
    must never cross an Exchange before the Python stage."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["mm6_scene_cuts"](spark, SF_MED))
    assert "MapInPandas" in plan
    head = plan.split("MapInPandas")[0]
    # the only plan text before the kernel is scan+projection, no shuffle
    assert not re.search(r"\(\d+\) Exchange", head)


def test_bloom_decontaminate_train_side_never_shuffles(spark, queries):
    """dd14: the training corpus is screened by a broadcast Bloom probe —
    the ONLY row shuffle is the per-doc count aggregate.  The benchmark
    filter collapses to one broadcast row; no sort-merge join, no
    shingle-keyed exchange of the train side."""
    df = queries["dd14_bloom_decontaminate"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row words broadcast
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    # train side shuffles once on doc_id; the remaining exchanges (bit/w)
    # belong to the tiny benchmark-side filter build — never on shingle,
    # which would mean the dd7-style inverted-index join came back
    assert exchanges.count("doc_id") == 1
    assert set(exchanges) <= {"doc_id", "bit", "w"}


# ---------------------------------------------------------------------------
# round-7 plans
# ---------------------------------------------------------------------------


def test_dd9_default_uses_pair_bounded_verify(spark):
    """fuzzy_dedup's exact default must verify candidates with the
    pair-bounded array_intersect plan, NOT the inverted-index self-join
    (the round-6 sum(df^2) blowup — docs/PLANS.md round 7).  The CC stage
    checkpoints (truncating lineage), so audit the verify stage itself:
    lsh_exact_pairs_bounded IS what the default dispatches to."""
    from era_parser_spark.operators.dedup import lsh_exact_pairs_bounded
    from era_parser_spark.plans import formatted_plan
    from era_parser_spark.queries.registry import table

    docs = table(spark, SF_MED, "documents")
    plan = formatted_plan(
        lsh_exact_pairs_bounded(docs, "doc_id", "text", threshold=0.5)
    )
    assert "array_intersect" in plan
    assert "collect_set" in plan  # per-doc shingle-hash set aggregation


def test_s11_all_joins_broadcast(spark, queries):
    """IVF-PQ search never shuffle-joins: routing is a broadcast semi
    join, codebook/ADC ride one-row broadcasts, scoring is per-row map
    lookups (element_at)."""
    from era_parser_spark.plans import formatted_plan, plan_summary

    df = queries["s11_ivf_pq_search"](spark, SF_MED)
    assert plan_summary(df)["sort_merge_joins"] == 0
    plan = formatted_plan(df)
    assert "map_from_entries" in plan and "element_at" in plan


def test_dd13b_pair_bounded_scoring_no_cartesian(spark, queries):
    """dd13b: candidates come from an equi-join on the rare-term key and
    scoring is per-pair map aggregation — no cartesian/unkeyed join
    anywhere, and the full-vector maps appear in the plan."""
    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["dd13b_tfidf_pairs_bounded"](spark, SF_MED))
    assert "CartesianProduct" not in plan
    assert "map_from_entries" in plan


def test_t19_model_broadcasts(spark, queries):
    """t19's vocabulary-bounded model must broadcast onto the corpus
    token stream (never shuffle the corpus by token against it)."""
    from era_parser_spark.plans import broadcast_join_count

    assert broadcast_join_count(queries["t19_quality_classifier"](spark, SF_MED)) >= 1


def test_s11c_rerank_fetch_is_broadcast(spark, queries):
    """IVFADC+R: the exact-distance re-rank joins the tiny shortlist back
    to the corpus as a BROADCAST hash join (the corpus never shuffles for
    the fetch), and the whole pipeline stays sort-merge-join-free."""
    from era_parser_spark.plans import (
        broadcast_join_count,
        plan_summary,
    )

    df = queries["s11c_ivf_pq_rerank"](spark, SF_MED)
    assert plan_summary(df)["sort_merge_joins"] == 0
    assert broadcast_join_count(df) >= 2  # semi probe + shortlist fetch


def test_t20_gopher_rules_zero_shuffle(spark, queries):
    """t20 is a pure per-row codegen projection over materialized
    token/line arrays — zero Exchange, zero Python, single scan."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["t20_gopher_rules"](spark, SF_MED))
    assert not re.search(r"\(\d+\) Exchange", plan)
    assert "Python" not in plan and "MapInPandas" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_p11_weighted_sample_no_exchange(spark, queries):
    """p11's selection is a global top-n over per-row codegen scores:
    TakeOrderedAndProject (per-partition partial top-n), zero Exchange,
    zero Python — the corpus never shuffles."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["p11_weighted_sample"](spark, SF_MED))
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"\(\d+\) Exchange", plan)
    assert "Python" not in plan and "MapInPandas" not in plan


def test_t21_bucket_join_broadcasts_thresholds(spark, queries):
    """t21: the corpus gets its bucket from a |langs|-row broadcast
    threshold join — never a shuffle keyed on lang — and only the
    bounded sample slice goes through the rank window."""
    from era_parser_spark.plans import broadcast_join_count, formatted_plan

    df = queries["t21_perplexity_buckets"](spark, SF_MED)
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in formatted_plan(df)


def test_p12_pipeline_no_interstage_id_joins(spark, queries):
    """p12 chains its three stages inline: the Gopher gate is a codegen
    filter at the scan (keep_cols passthrough — no id-keyed re-join of
    the corpus), the Bloom screen's only row shuffle is the per-doc hit
    aggregate, and the split is a codegen CASE.  No sort-merge join
    anywhere; the only hash exchanges are the doc_id aggregate and the
    tiny benchmark-side filter build."""
    import re

    df = queries["p12_curation_v2"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row words broadcast
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges.count("doc_id") == 1
    assert set(exchanges) <= {"doc_id", "bit", "w"}


def test_mm7_single_energy_scan_window_only(spark, queries):
    """mm7 is deliberately window-only (no groupBy+join back): the
    mapInPandas energy scan must appear exactly ONCE in the executed
    plan — a stats-join formulation would re-run it per branch."""
    import re

    from era_parser_spark.plans import formatted_plan

    plan = formatted_plan(queries["mm7_scene_keyframes"](spark, SF_MED))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "SortMergeJoin" not in plan


def test_s13_batch_ann_join_all_broadcast(spark, queries):
    """s13: the corpus is scanned for assignment once and candidates
    come from a BROADCAST probe join; scoring is map lookups against
    one broadcast ADC map — no sort-merge join anywhere."""
    from era_parser_spark.plans import formatted_plan, plan_summary

    df = queries["s13_ann_knn_join"](spark, SF_MED)
    assert plan_summary(df)["sort_merge_joins"] == 0
    plan = formatted_plan(df)
    assert "map_from_entries" in plan and "element_at" in plan


def test_window_funnel_single_user_exchange(spark, queries):
    """x30: both running-max windows AND the final per-user aggregate
    reuse ONE user_id hash exchange — a k-step funnel must stay one
    shuffle, not one per level."""
    import re

    df = queries["x30_window_funnel"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges == ["user_id"]
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_retention_cohorts_no_first_seen_join(spark, queries):
    """x31: cohort day comes from a partition-only window min, not a
    join against a first-seen dim — no join operator, one scan, and
    only the user window + (cohort, offset) distinct-agg exchanges."""
    import re

    df = queries["x31_retention_cohorts"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges.count("user_id") == 1 and len(exchanges) == 2
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert "Join" not in plan


def test_gopher_repetition_single_gram_exchange(spark, queries):
    """t29: the gram rows (the big frame) shuffle exactly ONCE — the
    explicit (id, n) repartition serves the count window, the argmax
    window, and the per-(id, n) aggregate; the only other exchange is
    the tiny per-doc join."""
    import re

    df = queries["t29_gopher_repetition"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    gram_ex = [e for e in exchanges if "__n#" in e and "__g#" not in e]
    assert len(gram_ex) == 1 and len(exchanges) == 2
    assert not any("__g#" in e for e in exchanges)  # grams never re-keyed


def test_hash_embed_two_exchanges_no_join(spark, queries):
    """t26: the per-doc sentinel union means NO join operator and
    exactly two long-only exchanges ((id,bucket) then (id)); the
    sentinel's second scan is pruned to the id column alone (the
    first formulation's join-back shuffled the dense vectors — a
    third exchange)."""
    import re

    from era_parser_spark.plans import read_schema_columns

    df = queries["t26_hash_embed"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "Join" not in plan
    scans = read_schema_columns(df)
    assert len(scans) == 2 and {"doc_id"} in scans  # sentinel scan id-only


def test_mad_outliers_all_broadcast_type_keyed(spark, queries):
    """x40: corpus rows exchange ONLY on event_type (three ranking-window
    exchanges: med's appears under both d consumers, plus mad's), the
    tiny per-type median/MAD frames ride back as broadcasts (3 BHJ, no
    SortMergeJoin), and all four scans are pruned to the 3-column
    quantized projection — the documented multi-scan trade (production
    stages the projection once)."""
    import re

    df = queries["x40_mad_outliers"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges == ["event_type"] * 3
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 3
    assert len(re.findall(r"FileScan parquet", plan)) == 4
    for m in re.findall(r"ReadSchema: (\S+)", plan):
        assert m.startswith("struct<event_id:bigint,event_type:string,value:double>")


def test_kcore_per_wave_semi_joins_node_keyed(spark, queries):
    """x39: every join in the peel is a node-keyed LeftSemi (degree
    gate), no SortMergeJoin or cartesian anywhere; the returned frame
    aggregates the final checkpointed wave."""
    df = queries["x39_kcore"](spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_registry_plan_lint(spark):
    """Whole-registry join lint (tools/plan_lint.py): no entry may plan a
    CartesianProduct, and BroadcastNestedLoopJoin only where the
    broadcast side is a provably tiny collected artifact (allowlisted
    with justification).  This is the automatic gate for the non-equi
    join trap class (CLAUDE.md): `a <= b` conditions silently plan as a
    whole-side broadcast and melt at scale."""
    import __spark_entry__ as m
    from tools.plan_lint import lint

    problems = lint(spark, m.queries(), "/root/testdata/sf0.001")
    assert problems == [], "\n".join(problems)


def test_curation_v5_v6_gate_staged_once(spark, queries):
    """p20/p21 (round 11): the gated survivor projection is STAGED
    (localCheckpoint) between the gopher gate and the downstream
    consumers, so the gate's codegen scan runs ONCE — the returned plan
    reads the checkpoint (Scan ExistingRDD) and never re-plans the
    documents parquet scan (it used to re-run ~6x, once per fuzzy_dedup
    branch)."""
    for name in ("p20_curation_v5", "p21_curation_v6"):
        plan = (
            queries[name](spark, SF_MED)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ExistingRDD" in plan, name
        assert plan.count("FileScan parquet") == 0, name
