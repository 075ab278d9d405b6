"""Skew-aware join/aggregation helpers.

AQE's skew-join handling (on by default in session.py) covers sort-merge
cases at runtime; these explicit operators cover the planned cases:

* salted_join — the classic hot-key fix when the build side is too big to
  broadcast: the probe side's key is salted N ways, the build side is
  replicated N ways, so one hot key spreads over N tasks instead of one.
* top_hot_keys — cheap skew diagnosis (sampled key histogram).

At 100 TB the decision tree is: broadcast if the dim fits (< ~1 GB);
else AQE skew join; else explicit salting for known-pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
    join_hint: str | None = None,
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated.

    Result equals probe.join(build, key, how) for inner/left joins with a
    unique-keyed build side; each of the probe's hot-key rows lands in one
    of `salt_factor` shuffle partitions instead of one.

    `join_hint` ("shuffle_hash" / "merge") pins the build side's join
    strategy.  Salting targets the build-too-big-to-broadcast regime; on a
    small test corpus Catalyst would happily broadcast the replicated build
    and silently bypass the very mechanism under test, so tests and demo
    entries pass a hint to get the production-shaped plan.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (build side must be unique-keyed)")
    salted_probe = probe.withColumn(
        SALT, (F.xxhash64(F.monotonically_increasing_id()) % salt_factor).cast("int")
    ).withColumn(SALT, F.abs(SALT))
    replicated_build = build.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    if join_hint is not None:
        replicated_build = replicated_build.hint(join_hint)
    out = salted_probe.join(replicated_build, [key, SALT], how)
    return out.drop(SALT)


def top_hot_keys(df: DataFrame, key: str, n: int = 10, fraction: float = 0.1) -> DataFrame:
    """Sampled key histogram — decide whether salting is warranted."""
    return (
        df.sample(fraction=fraction, seed=42)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("sampled_rows"))
        .orderBy(F.desc("sampled_rows"), key)
        .limit(n)
    )
