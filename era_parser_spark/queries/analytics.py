"""SURVEY §2.E analytical operator families (E1-E20), phrased generically
over the driver's synthetic tables (see FIXTURES.md "Mapping" section).

Each family mirrors a documented reference query (docs/CLICKHOUSE.md in
/root/reference) — e.g. e10_gap_detect is the "missing slots" query
(CLICKHOUSE.md:501-509), e12_pct_of_total is CLICKHOUSE.md:513-522.

Scale notes: aggregations rely on Spark's map-side partial aggregation; the
only global-ordering window (e10) is documented as range-repartitionable at
scale (lag only needs the previous row, so boundary rows can be exchanged);
LIMIT queries always carry total orderings so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from era_parser_spark.operators.sequence import gap_rows
from era_parser_spark.queries.exprs import davg, dec, dsum, sql_davg, sql_dsum
from era_parser_spark.queries.registry import register, table


@register(
    "e01_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
      AND l_discount > 0.05
    """,
)
def e01_filter_project(spark, sf_dir):
    # E1: predicate + projection; both are pushed to the parquet scan.
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "e02_group_agg",
    oracle=f"""
    SELECT c_nationkey, count(*) AS cnt,
           {sql_davg('c_acctbal')} AS avg_bal,
           min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def e02_group_agg(spark, sf_dir):
    # E2: hash aggregate with count/avg/min/max (CLICKHOUSE.md:477-488 shape).
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            davg("c_acctbal").alias("avg_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "e03_time_bucket",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS cnt,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY date_trunc('day', ts)
    """,
)
def e03_time_bucket(spark, sf_dir):
    # E3: toStartOfDay-style time bucketing (CLICKHOUSE.md:385-394).
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("total_value"))
    )


@register(
    "e04_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS uniq_users, count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def e04_count_distinct(spark, sf_dir):
    # E4: exact count-distinct; at 100 TB swap in approx_count_distinct.
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("uniq_users"), F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "e05_topk",
    oracle="""
    SELECT user_id, count(*) AS cnt FROM events
    GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20
    """,
)
def e05_topk(spark, sf_dir):
    # E5: top-k by group — Spark plans TakeOrderedAndProject (no full sort).
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(20)
    )


@register(
    "e06_having",
    oracle=f"""
    SELECT o_custkey, count(*) AS cnt, {sql_dsum('o_totalprice')} AS total_spent
    FROM orders GROUP BY o_custkey HAVING count(*) >= 15
    """,
)
def e06_having(spark, sf_dir):
    # E6: HAVING = post-aggregation filter (CLICKHOUSE.md:467-473).
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("total_spent"))
        .filter(F.col("cnt") >= 15)
    )


@register(
    "e07_join_left_group",
    oracle=f"""
    SELECT o_orderpriority,
           count(DISTINCT o_orderkey) AS n_orders,
           count(l_orderkey) AS n_lineitems,
           {sql_dsum('l_extendedprice')} AS revenue
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def e07_join_left_group(spark, sf_dir):
    # E7: left equi-join + aggregate (CLICKHOUSE.md:784-794 shape).
    # Plan: pre-aggregate lineitem per orderkey BEFORE the join — the join
    # then moves one row per order instead of one per lineitem, and the
    # count-distinct (which would force an expand over the joined fact
    # rows) becomes a plain count.  Same result set, same oracle.
    orders = table(spark, sf_dir, "orders")
    li_per_order = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("li_cnt"),
            F.sum(dec("l_extendedprice")).alias("li_rev"),
        )
    )
    return (
        orders.join(li_per_order, orders.o_orderkey == li_per_order.l_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.coalesce("li_cnt", F.lit(0))).alias("n_lineitems"),
            F.sum("li_rev").cast("double").alias("revenue"),
        )
    )


@register(
    "e08_full_outer",
    oracle="""
    WITH a AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                      count(*) AS clicks
               FROM events WHERE event_type = 'click' GROUP BY 1),
         b AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                      count(*) AS views
               FROM events WHERE event_type = 'view' GROUP BY 1)
    SELECT coalesce(a.day, b.day) AS day, a.clicks AS clicks, b.views AS views
    FROM a FULL OUTER JOIN b ON a.day = b.day
    """,
)
def e08_full_outer(spark, sf_dir):
    # E8: full outer join of conformed aggregates (CLICKHOUSE.md:798-809).
    ev = table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("clicks"))
    )
    b = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("views"))
    )
    return a.join(b, a.day == b.day, "full_outer").select(
        F.coalesce(a.day, b.day).alias("day"), "clicks", "views"
    )


@register(
    "e09_union_conform",
    oracle=f"""
    WITH u AS (
      SELECT 'orders' AS kind, o_orderkey AS id, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT 'lineitem' AS kind, l_orderkey AS id, l_extendedprice AS amount FROM lineitem
    )
    SELECT kind, count(*) AS cnt, count(DISTINCT id) AS uniq_ids,
           {sql_dsum('amount')} AS total_amount
    FROM u GROUP BY kind
    """,
)
def e09_union_conform(spark, sf_dir):
    # E9: UNION ALL of conformed selects (CLICKHOUSE.md:425-459).
    orders = table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("kind"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("kind"),
        F.col("l_orderkey").alias("id"),
        F.col("l_extendedprice").alias("amount"),
    )
    return (
        orders.unionByName(li)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("id").alias("uniq_ids"),
            dsum("amount").alias("total_amount"),
        )
    )


@register(
    "e10_gap_detect",
    oracle="""
    SELECT prev_event_id, event_id, event_id - prev_event_id - 1 AS gap
    FROM (
      SELECT event_id, lag(event_id) OVER (ORDER BY event_id) AS prev_event_id
      FROM events WHERE event_type = 'purchase'
    )
    WHERE event_id - prev_event_id - 1 > 0
    """,
)
def e10_gap_detect(spark, sf_dir):
    # E10: missing-slot gap detection via lag (CLICKHOUSE.md:501-509),
    # computed with the distributed lag operator: bucketed parallel window
    # + broadcast boundary carry instead of a single-partition global sort
    # (operators/sequence.py). Result is identical to lag() OVER (ORDER BY).
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
    )
    return gap_rows(
        ev, "event_id", bucket_width=4096, prev_col="prev_event_id", gap_col="gap"
    ).select("prev_event_id", "event_id", "gap")


@register(
    "e11_window_over_all",
    oracle="""
    SELECT day, cnt, avg(cnt) OVER () AS avg_daily,
           cnt / avg(cnt) OVER () AS ratio_to_avg
    FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS cnt
          FROM events GROUP BY 1)
    """,
)
def e11_window_over_all(spark, sf_dir):
    # E11: avg(...) OVER () — whole-relation window (CLICKHOUSE.md:545-551).
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy()
    return daily.select(
        "day",
        "cnt",
        F.avg("cnt").over(w).alias("avg_daily"),
        (F.col("cnt") / F.avg("cnt").over(w)).alias("ratio_to_avg"),
    )


@register(
    "e12_pct_of_total",
    oracle="""
    SELECT event_type, cnt, cnt * 100.0 / sum(cnt) OVER () AS pct
    FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type)
    """,
)
def e12_pct_of_total(spark, sf_dir):
    # E12: percent-of-total via scalar subquery -> window (CLICKHOUSE.md:513-522).
    grouped = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return grouped.select(
        "event_type",
        "cnt",
        (F.col("cnt") * 100.0 / F.sum("cnt").over(W.partitionBy())).alias("pct"),
    )


@register(
    "e13_case_classify",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 30000 THEN 'small'
                WHEN o_totalprice < 100000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS cnt, {sql_dsum('o_totalprice')} AS total
    FROM orders GROUP BY 1
    """,
)
def e13_case_classify(spark, sf_dir):
    # E13: CASE classification (CLICKHOUSE.md:676-693 slashing-type shape).
    bucket = (
        F.when(F.col("o_totalprice") < 30000, "small")
        .when(F.col("o_totalprice") < 100000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return (
        table(spark, sf_dir, "orders")
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("total"))
    )


@register(
    "e14_json_extract",
    oracle="""
    SELECT event_type, count(*) AS cnt, CAST(sum(k_val) AS BIGINT) AS k_sum
    FROM (SELECT event_type,
                 CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val
          FROM events)
    WHERE k_val > 50 GROUP BY event_type
    """,
)
def e14_json_extract(spark, sf_dir):
    # E14: JSON field extraction + predicate (CLICKHOUSE.md:703-710 shape).
    ev = table(spark, sf_dir, "events").withColumn(
        "k_val", F.get_json_object("props", "$.k").cast("bigint")
    )
    return (
        ev.filter(F.col("k_val") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("k_val").alias("k_sum"))
    )


@register(
    "e15_collect_list",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
           count(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def e15_collect_list(spark, sf_dir):
    # E15: groupArray-style collection (CLICKHOUSE.md:736-744), rendered as a
    # sorted joined string so the value-hash is order-insensitive.
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "e16_stddev",
    oracle=f"""
    SELECT day, n, mean_value,
           sqrt(greatest(mean_sq - mean_value * mean_value, 0.0)) AS stddev_value
    FROM (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
             {sql_dsum('value')} / count(*) AS mean_value,
             CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               / count(*) AS mean_sq
      FROM events GROUP BY 1
    )
    """,
)
def e16_stddev(spark, sf_dir):
    # E16: stddevPop per day (CLICKHOUSE.md:641-649).  Computed from exact
    # decimal sums so Spark and the oracle agree bit-for-bit.
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (dsum("value") / F.count(F.lit(1))).alias("mean_value"),
            (F.sum(dec("value") * dec("value")).cast("double") / F.count(F.lit(1))).alias(
                "mean_sq"
            ),
        )
    )
    return daily.select(
        "day",
        "n",
        "mean_value",
        F.sqrt(
            F.greatest(F.col("mean_sq") - F.col("mean_value") * F.col("mean_value"), F.lit(0.0))
        ).alias("stddev_value"),
    )


@register(
    "e17_derived_metric",
    oracle="""
    SELECT o_orderpriority,
           avg(datediff('day', o_orderdate, l_shipdate)) AS avg_ship_delay,
           min(datediff('day', o_orderdate, l_shipdate)) AS min_ship_delay,
           max(datediff('day', o_orderdate, l_shipdate)) AS max_ship_delay
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def e17_derived_metric(spark, sf_dir):
    # E17: derived-metric aggregate — inclusion-delay analog
    # (CLICKHOUSE.md:603-613: avg(slot - attestation_slot)).
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.avg(delay).alias("avg_ship_delay"),
            F.min(delay).alias("min_ship_delay"),
            F.max(delay).alias("max_ship_delay"),
        )
    )


@register(
    "e18_string_cast",
    oracle="""
    SELECT c_nationkey, count(*) AS cnt, CAST(sum(cust_num) AS BIGINT) AS custnum_sum
    FROM (SELECT c_nationkey,
                 CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT) AS cust_num
          FROM customer WHERE c_name IS NOT NULL AND c_name <> '')
    GROUP BY c_nationkey
    """,
)
def e18_string_cast(spark, sf_dir):
    # E18/E19: string->numeric cast with empty-guard (CLICKHOUSE.md:796-797).
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_name").isNotNull() & (F.col("c_name") != "")
    )
    return (
        cust.withColumn(
            "cust_num", F.regexp_extract("c_name", r"Customer#([0-9]+)", 1).cast("bigint")
        )
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("cust_num").alias("custnum_sum"))
    )


@register(
    "e19_empty_guard",
    oracle="""
    SELECT prio_num, count(*) AS cnt
    FROM (SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num
          FROM orders
          WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> '')
    GROUP BY prio_num
    """,
)
def e19_empty_guard(spark, sf_dir):
    # E19: conditional-empty guard + parse (CLICKHOUSE.md:797).
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull() & (F.col("o_orderpriority") != "")
    )
    return (
        orders.withColumn("prio_num", F.split("o_orderpriority", "-").getItem(0).cast("int"))
        .groupBy("prio_num")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "e20_health_union",
    oracle="""
    SELECT 'orders' AS tbl, count(*) AS n_rows, max(o_orderdate) AS max_ts FROM orders
    UNION ALL
    SELECT 'lineitem' AS tbl, count(*) AS n_rows, max(l_shipdate) AS max_ts FROM lineitem
    UNION ALL
    SELECT 'events' AS tbl, count(*) AS n_rows, max(ts) AS max_ts FROM events
    """,
)
def e20_health_union(spark, sf_dir):
    # E20: multi-table freshness/health union (CLICKHOUSE.md:884-905).
    def health(name, ts_col):
        return (
            table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n_rows"), F.max(ts_col).alias("max_ts"))
            .select(F.lit(name).alias("tbl"), "n_rows", "max_ts")
        )

    return (
        health("orders", "o_orderdate")
        .unionByName(health("lineitem", "l_shipdate"))
        .unionByName(health("events", "ts"))
    )
