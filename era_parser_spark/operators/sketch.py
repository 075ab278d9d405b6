"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark's built-in approx_count_distinct (HyperLogLog++) is
implementation-defined, so its estimates can only be rows-only checked
(x8).  KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") is just as mergeable and one-pass, but its state — the k smallest
hash values — is a pure function of the input set, so the ESTIMATE itself
is reproducible bit-for-bit in plain SQL: an oracle-exact sketch.

Estimator: with h uniform on [0, 2^60) and kth = the k-th smallest
distinct hash, E[distinct] ~ (k-1) * 2^60 / kth; groups with fewer than k
distinct values report their exact count (the sketch IS the set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POW60 = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
    buckets: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, n_tracked, kth_min,
    est_distinct).

    Hash: the 60-bit md5 int (positive in a signed BIGINT in any engine —
    the dd4b trick).  The k smallest per group are found in two all-JVM
    phases so no single task ever materializes a group's full distinct
    set:

    1. per (group, h % buckets) salt cell: sort_array(collect_set)[:k] —
       collect_set dedups (map-side too), so this is the ONLY shuffle and
       it carries partial hash sets, not rows; a value that is globally
       top-k smallest is top-k within its cell, so the union of cell
       top-ks contains the answer; per-cell memory is ~distinct/buckets
       (size `buckets` for the corpus, the same salting lever as x10);
    2. merge: explode the <= buckets*k survivors per group and take the k
       smallest — tiny.

    (k-1)*2^60 is exact in a double for k <= ~2^9 and kth < 2^60 is
    exactly representable, so the final division is one correctly-rounded
    IEEE op — the estimate matches SQL bit-for-bit.
    """
    from era_parser_spark.operators.dedup import md5_60bit

    h = md5_60bit(F.col(value_col).cast("string")).alias("__h")
    cells = (
        df.select(F.col(group_col), h)
        .groupBy(group_col, F.pmod(F.col("__h"), F.lit(buckets)).alias("__c"))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__ks"))
    )
    merged = (
        cells.select(F.col(group_col), F.explode("__ks").alias("__h"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("__ks"))
    )
    m = F.size("__ks")
    kth = F.element_at("__ks", m)
    num = float((k - 1) * _POW60)
    return merged.select(
        F.col(group_col),
        m.cast("long").alias("n_tracked"),
        kth.alias("kth_min"),
        F.when(m < k, m.cast("double"))
        .otherwise(F.lit(num) / kth.cast("double"))
        .alias("est_distinct"),
    )
