"""distributed_lag / gap_rows: equivalence with the global-window lag."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from era_parser_spark.operators.sequence import distributed_lag, gap_rows


def _global_lag(df, col):
    return df.withColumn("prev", F.lag(col).over(W.orderBy(col)))


def test_matches_global_lag_across_empty_buckets(spark):
    # buckets (width 10): 0, 2, 3 non-empty; 1 empty — carry must skip it
    vals = [0, 3, 9, 25, 26, 31, 39, 300]
    df = spark.createDataFrame([(v,) for v in vals], "x bigint").repartition(4)
    got = sorted((r.x, r.prev) for r in distributed_lag(df, "x", 10).collect())
    exp = sorted((r.x, r.prev) for r in _global_lag(df, "x").collect())
    assert got == exp


def test_gap_rows_finds_every_gap(spark):
    slots = [0, 1, 2, 5, 6, 10_000, 10_001, 50_000]
    df = spark.createDataFrame([(s,) for s in slots], "slot bigint")
    rows = {
        (r.slot, r.prev, r.gap)
        for r in gap_rows(df, "slot", bucket_width=8192).collect()
    }
    assert rows == {(5, 2, 2), (10_000, 6, 9993), (50_000, 10_001, 39998)}


def test_single_bucket_and_single_row(spark):
    one = spark.createDataFrame([(7,)], "x bigint")
    assert [(r.x, r.prev) for r in distributed_lag(one, "x", 100).collect()] == [(7, None)]
    dense = spark.createDataFrame([(i,) for i in range(50)], "x bigint")
    assert gap_rows(dense, "x", bucket_width=7).count() == 0
