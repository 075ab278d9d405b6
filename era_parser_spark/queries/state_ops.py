"""SURVEY §2.D state-management relational operators, phrased over the
synthetic tables.  The real era-state implementations live in
era_parser_spark/state/; these registry entries prove the same relational
semantics against the DuckDB oracle.

  d1: anti-join incremental planning  (era_state_manager.py:350-377 analog)
  d2: latest-state argmax view        (sql/002_performance_optimizations:20-37)
  d5: ReplacingMergeTree-style dedup  (sql/001 engine declarations)
  d6: status summary                  (era_state_manager.py:398-426)
  d7: coalesce(max(...), 0)           (era_state_manager.py:170-186)
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from era_parser_spark.queries.exprs import dsum, sql_dsum
from era_parser_spark.queries.registry import register, table


@register(
    "d1_anti_join_pending",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def d1_anti_join_pending(spark, sf_dir):
    # D1: "skip completed" planning = left anti join of available vs done.
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "d2_latest_state",
    oracle="""
    SELECT user_id, event_id, event_type, ts FROM (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def d2_latest_state(spark, sf_dir):
    # D2: per-key argmax on a version column (the era_status "latest" view).
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@register(
    "d5_dedup_replacing",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def d5_dedup_replacing(spark, sf_dir):
    # D5: ReplacingMergeTree semantics — keep the latest version per key.
    # Exposed as a reusable op in operators/dedup.py (dedup_latest).
    from era_parser_spark.operators.dedup import dedup_latest

    ev = table(spark, sf_dir, "events")
    return dedup_latest(
        ev, keys=["user_id", "event_type"], order_cols=[F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_type", "event_id", "ts", "value")


@register(
    "d6_status_summary",
    oracle=f"""
    SELECT o_orderstatus AS status, count(*) AS cnt,
           {sql_dsum('o_totalprice')} AS total_amount
    FROM orders GROUP BY o_orderstatus
    """,
)
def d6_status_summary(spark, sf_dir):
    # D6: GROUP BY status: count + sum(total_records) analog.
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("total_amount"))
    )


@register(
    "d7_coalesce_max",
    oracle="""
    SELECT n_name, count(s_suppkey) AS n_suppliers,
           coalesce(max(s_acctbal), 0.0) AS max_bal
    FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def d7_coalesce_max(spark, sf_dir):
    # D7: COALESCE(MAX(retry_count), 0) analog over a sparse left join.
    nation = table(spark, sf_dir, "nation")
    supp = table(spark, sf_dir, "supplier")
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.coalesce(F.max("s_acctbal"), F.lit(0.0)).alias("max_bal"),
        )
    )
