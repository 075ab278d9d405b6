"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001
queries()     -> {name: (spark, sf_dir) -> DataFrame} for SURVEY.md §2 ops
oracle_sql()  -> {name: ANSI SQL} DuckDB twins (omitted => rows-only check)

Implementation lives in era_parser_spark/queries/ — each module registers
its builders + oracle SQL in a shared registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from era_parser_spark.queries import load_all  # noqa: E402

_QUERIES, _ORACLES = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-table join + agg + top-k (q3 shipping priority)."""
    return _QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
