"""Headline TPC-H-style queries (SURVEY §2.E families E2/E5/E7/E17).

These exercise the engine's core relational path: wide aggregation with
map-side partial aggregates (q1), a 3-table selective join with top-k (q3),
and a 6-table star join where every dimension side is broadcastable (q5).

Scale notes (100 TB): q1 is a pure scan+partial-agg — linear, no shuffle of
raw rows, only the tiny grouped state.  q3/q5 join fact tables on their
natural keys; the dimension sides (customer/supplier/nation/region) are
broadcast so the lineitem scan never shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from era_parser_spark.queries.exprs import DEC, DEC2, dec, dec2, sql_davg, sql_dsum
from era_parser_spark.queries.registry import register, table

# All money/rate inputs enter at scale 2, so the (12,2)x(13,2) product is
# exact at scale 4 and the (18,4) re-cast is value-exact (no rounding in
# either engine — see exprs.py on DuckDB's truncating decimal casts).
_ONE2 = "CAST(1 AS DECIMAL(12,2))"
_DISC = (
    f"CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    f" * ({_ONE2} - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))"
)


def _disc_price():
    """Exact-decimal l_extendedprice * (1 - l_discount), scale 4, exact."""
    return (dec2("l_extendedprice") * (F.lit(1).cast(DEC2) - dec2("l_discount"))).cast(DEC)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           CAST(sum({_DISC}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({_DISC} * ({_ONE2} + CAST(l_tax AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = _disc_price()
    # (18,4) x (13,2) -> (32,6): exact, and the scale-6 sum stays < 2^53.
    charge = disc_price * (F.lit(1).cast(DEC2) + dec2("l_tax"))

    # Integer fast path: the per-row decimal quantization is unchanged
    # (same HALF_UP rounding as the oracle's casts), but accumulation
    # happens on the decimals' UNSCALED long values — plain codegen long
    # adds instead of Decimal-object aggregation buffers (~2x on the agg;
    # the win grows with group count at scale).  The final /10^scale is
    # one correctly-rounded double division of an exactly-converted sum
    # (< 2^53 per the exprs.py magnitude contract), bit-identical to the
    # decimal path — verified value-identical at sf0.1 and oracle-green.
    def usum(dcol, scale: int):
        return F.sum((dcol * F.lit(10**scale)).cast("long")) / F.lit(float(10**scale))

    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        usum(dec("l_quantity"), 4).alias("sum_qty"),
        usum(dec("l_extendedprice"), 4).alias("sum_base_price"),
        usum(disc_price, 4).alias("sum_disc_price"),
        usum(charge, 6).alias("sum_charge"),
        (usum(dec("l_quantity"), 4) / cnt).cast("double").alias("avg_qty"),
        (usum(dec("l_extendedprice"), 4) / cnt).cast("double").alias("avg_price"),
        (usum(dec("l_discount"), 4) / cnt).cast("double").alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_DISC}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(sum({_DISC}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )
