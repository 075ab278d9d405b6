"""Query registry: named DataFrame builders + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 that we claim as implemented registers here;
``__spark_entry__.py`` re-exports the two dicts for the driver's correctness
gate.  Callables take ``(spark, sf_dir)`` and return a DataFrame; the oracle
SQL runs in DuckDB over the same parquet files (views pre-registered by the
driver).

Determinism rules (so the order-insensitive value-hash matches DuckDB):
  * every computed column is aliased identically on both sides;
  * aggregates over doubles go through DECIMAL(18,4) so the sum is exact and
    order-independent, then cast back to DOUBLE (see exprs.dsum/davg);
  * row-level double arithmetic is left raw — IEEE ops are bit-identical;
  * every LIMIT carries a total tie-breaking ORDER BY.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query builder, optionally with its DuckDB oracle SQL.

    Builders are wrapped to ship the package to executors first, so queries
    that carry Python UDF closures (simhash, mapInPandas feature extractors)
    work regardless of the driver's working directory.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from era_parser_spark.shipping import ensure_package_shipped

            ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Columns written as parquet TIMESTAMP(NANOS) — Spark can't scan those
# natively, so we read them as raw nanos (legacy flag) and truncate to µs,
# matching how DuckDB surfaces them to Python (datetime is µs-precision).
_NANOS_TS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in _NANOS_TS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS.get(name, ()):
        field = df.schema[col]
        if field.dataType.simpleString() == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_all():
    """Import every query module so registration side effects run."""
    from era_parser_spark.queries import (  # noqa: F401
        analytics,
        dedup,
        extended,
        pipeline,
        similarity,
        state_ops,
        streaming_q,
        text,
        tpch,
    )
    return QUERIES, ORACLES
