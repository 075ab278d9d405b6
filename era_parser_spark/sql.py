"""SQL surface: register the synthetic tables / warehouse as temp views so
the whole engine is usable via spark.sql(...) — Catalyst produces the same
plans either way.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from era_parser_spark.queries.registry import table

SYNTH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_synthetic_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Temp views over the TPC-H-ish synthetic tables (nanos-ts safe)."""
    for name in SYNTH_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(SYNTH_TABLES)


def register_warehouse_views(spark: SparkSession, warehouse_dir: str) -> list[str]:
    """Temp views over a normalized-era warehouse (one dir per table)."""
    registered = []
    for path in sorted(glob.glob(os.path.join(warehouse_dir, "*"))):
        name = os.path.basename(path)
        if name.startswith("_") or not os.path.isdir(path):
            continue
        spark.read.parquet(path).createOrReplaceTempView(name)
        registered.append(name)
    return registered
