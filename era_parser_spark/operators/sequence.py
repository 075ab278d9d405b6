"""Scale-safe sequence operators: distributed lag / gap detection.

A bare ``lag(x) OVER (ORDER BY x)`` forces every row through ONE task
(Spark plans it as a SinglePartition window exchange), which is the
reference's missing-slots query shape (CLICKHOUSE.md:501-509) and fine
on one node but serial at 100 TB. ``distributed_lag`` computes the
identical result in three parallel steps:

1. bucket every row by ``floor(order_col / bucket_width)`` — a plain
   hash shuffle on the bucket id, so ~(range/width) tasks run the
   window in parallel;
2. ``lag`` within each bucket (window partitioned by bucket);
3. fill each bucket's first row (local lag = NULL) with the previous
   non-empty bucket's max — a per-bucket aggregate (one row per
   bucket, map-side combined) whose own lag window is single-partition
   but over only ~range/width rows, then broadcast back.

Empty buckets are handled for free: they simply don't appear in the
boundary table, so ``lag`` over it skips straight to the previous
non-empty bucket. Equal order values within a bucket keep Spark's
usual tie behavior (gap detection uses unique ids, where the result is
exactly the global-window answer).

Pick ``bucket_width`` so the boundary table stays small (one row per
bucket): width 8192 over beacon slots = one bucket per era; at 100 TB
of events a width of ~1e6 keeps the boundary side well under a
megabyte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_BUCKET = "__lag_bucket"
_CARRY = "__lag_carry"


def distributed_lag(
    df: DataFrame,
    order_col: str,
    bucket_width: int = 8192,
    out_col: str = "prev",
) -> DataFrame:
    """Append ``out_col`` = global ``lag(order_col) OVER (ORDER BY order_col)``
    without a single-partition window over the full relation.

    The source is scanned twice (rows + per-bucket max); both scans
    prune to ``order_col``'s columns and the second is a map-side
    combined aggregate, so this is cheaper than materializing one
    global sort.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    bucketed = df.withColumn(
        _BUCKET, F.floor(F.col(order_col) / F.lit(bucket_width))
    )
    local = bucketed.withColumn(
        out_col, F.lag(order_col).over(W.partitionBy(_BUCKET).orderBy(order_col))
    )
    bounds = bucketed.groupBy(_BUCKET).agg(F.max(order_col).alias("__bmax"))
    carry = bounds.select(
        F.col(_BUCKET),
        F.lag("__bmax").over(W.orderBy(_BUCKET)).alias(_CARRY),
    )
    return (
        local.join(F.broadcast(carry), _BUCKET, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col(_CARRY)))
        .drop(_BUCKET, _CARRY)
    )


def gap_rows(
    df: DataFrame,
    order_col: str,
    bucket_width: int = 8192,
    prev_col: str = "prev",
    gap_col: str = "gap",
) -> DataFrame:
    """Rows whose predecessor in ``order_col`` is more than 1 behind:
    the distributed form of the reference's missing-slots query
    (CLICKHOUSE.md:501-509)."""
    return (
        distributed_lag(df, order_col, bucket_width, out_col=prev_col)
        .withColumn(gap_col, F.col(order_col) - F.col(prev_col) - F.lit(1))
        .filter(F.col(gap_col) > 0)
    )
