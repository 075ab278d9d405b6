"""Differential tests for the reference's documented analytics workload on
the engine's own 15-table warehouse: synthetic eras -> normalize -> parquet,
then each beacon query runs in Spark AND DuckDB over the same files and must
match exactly (the full oracle loop on the beacon data model).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from era_parser_spark.testing.era_gen import era_filename, write_synthetic_era
from era_parser_spark.testing.oracle import compare_spark_duckdb

# capella + deneb + electra eras so every table (incl. requests) has rows
ERAS = (1300, 1800, 2700, 2701)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from era_parser_spark.operators.normalize import all_tables
    from era_parser_spark.sources.era import read_era_blocks

    src = tmp_path_factory.mktemp("beacon_eras")
    for era in ERAS:
        write_synthetic_era(str(src / era_filename("gnosis", era)), era, "gnosis", blocks=48)
    out = str(tmp_path_factory.mktemp("beacon_wh"))
    blocks = read_era_blocks(spark, str(src), glob="*.era").cache()
    for name, df in all_tables(blocks).items():
        df.write.mode("overwrite").parquet(f"{out}/{name}")
    blocks.unpersist()
    return out


@pytest.fixture(scope="module")
def beacon_duck(warehouse):
    con = duckdb.connect()
    for d in sorted(os.listdir(warehouse)):
        if glob.glob(f"{warehouse}/{d}/*.parquet"):
            con.execute(
                f"CREATE VIEW {d} AS SELECT * FROM read_parquet('{warehouse}/{d}/*.parquet')"
            )
    return con


def _names():
    from era_parser_spark.operators.beacon_analytics import BEACON_QUERIES

    return sorted(BEACON_QUERIES)


@pytest.mark.parametrize("name", _names())
def test_beacon_query_matches_oracle(spark, warehouse, beacon_duck, name):
    from era_parser_spark.operators.beacon_analytics import BEACON_ORACLES, BEACON_QUERIES

    fn, table_names = BEACON_QUERIES[name]
    dfs = [spark.read.parquet(f"{warehouse}/{t}") for t in table_names]
    compare_spark_duckdb(fn(*dfs), beacon_duck, BEACON_ORACLES[name], name)


def test_validator_slashed_lookup(spark, warehouse, beacon_duck):
    from era_parser_spark.operators.beacon_analytics import (
        validator_slashed_lookup,
        validator_slashed_lookup_oracle,
    )

    slashings = spark.read.parquet(f"{warehouse}/attester_slashings")
    # pick a validator that actually appears in a slashing
    import json

    first = slashings.select("att_1_attesting_indices").first()
    target = json.loads(first[0])[0]
    out = validator_slashed_lookup(slashings, target)
    assert out.count() >= 1
    compare_spark_duckdb(
        out, beacon_duck, validator_slashed_lookup_oracle(target), "validator_slashed_lookup"
    )


def test_workload_nonempty(spark, warehouse):
    """Guard: the synthetic eras must actually exercise every input table."""
    for t in (
        "blocks attestations sync_aggregates execution_payloads transactions "
        "withdrawals voluntary_exits proposer_slashings attester_slashings "
        "bls_changes blob_commitments deposit_requests withdrawal_requests "
        "consolidation_requests"
    ).split():
        assert glob.glob(f"{warehouse}/{t}/*.parquet"), f"{t} is empty"
        assert spark.read.parquet(f"{warehouse}/{t}").count() > 0, f"{t} has no rows"
