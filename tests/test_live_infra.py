"""Opt-in LIVE infrastructure smoke tests (round-7 verdict item #6).

These drive the EXISTING production paths — `write_clickhouse` over the
dependency-free HTTP wire client, and `discover_s3` over real boto3 —
against real services, so deployment verification needs zero new code.
They are env-var gated and SKIP cleanly in the sandbox/CI:

    CLICKHOUSE_URL=http://host:8123 [CLICKHOUSE_USER/_PASSWORD/_DATABASE]
        -> round-trips a small typed frame through a real server.
    ERA_S3_BUCKET=bucket [ERA_S3_PREFIX, ERA_S3_NETWORK]
        -> lists era files from a real bucket via the boto3 default path.

Everything these tests exercise is already protocol-tested offline:
the wire client against a byte-level HTTP stub (test_clickhouse_http.py)
and discovery against fake clients + a live local http.server
(test_http_source.py).  See README "Live-infrastructure smoke tests".
"""

from __future__ import annotations

import os
import uuid

import pytest

CH_URL = os.environ.get("CLICKHOUSE_URL")
S3_BUCKET = os.environ.get("ERA_S3_BUCKET")


@pytest.mark.skipif(not CH_URL, reason="CLICKHOUSE_URL not set (live test)")
def test_live_clickhouse_round_trip(spark):
    """INSERT a typed frame through the real HTTP interface and read the
    row count back — the exact path `write_clickhouse` uses in
    production, including insert-time coercion."""
    from era_parser_spark.sinks.clickhouse_http import (
        ClickHouseHttpClient,
        clickhouse_conform,
    )
    from era_parser_spark.sinks.writers import write_clickhouse

    url = CH_URL
    user = os.environ.get("CLICKHOUSE_USER", "default")
    password = os.environ.get("CLICKHOUSE_PASSWORD", "")
    database = os.environ.get("CLICKHOUSE_DATABASE", "default")

    def factory():
        return ClickHouseHttpClient(
            url, user=user, password=password, database=database
        )

    table = f"era_spark_smoke_{uuid.uuid4().hex[:8]}"
    client = factory()
    client.command(
        f"CREATE TABLE {table} (slot UInt64, block_root String, ts DateTime) "
        "ENGINE = MergeTree ORDER BY slot"
    )
    try:
        df = spark.createDataFrame(
            [
                (1, "0xabc", "2024-05-01T12:00:00Z"),
                (2, "0xdef", "1714564800"),
                (3, None, None),  # coercion: NULLs -> '' / epoch
            ],
            "slot long, block_root string, ts string",
        )
        conformed = clickhouse_conform(df, {"slot"}, {"ts"})
        write_clickhouse(conformed, table, factory)
        got = client.command(f"SELECT count(*) FROM {table}")
        assert str(got).strip() == "3"
    finally:
        client.command(f"DROP TABLE IF EXISTS {table}")


@pytest.mark.skipif(not S3_BUCKET, reason="ERA_S3_BUCKET not set (live test)")
def test_live_s3_discovery():
    """List era files from a real bucket via discover_s3's boto3 default
    path (pagination included) — the A7 production route."""
    from era_parser_spark.sources.discovery import discover_s3

    found = discover_s3(
        S3_BUCKET,
        os.environ.get("ERA_S3_PREFIX", ""),
        os.environ.get("ERA_S3_NETWORK", "gnosis"),
    )
    assert isinstance(found, list)
    # a real era bucket yields sorted (era_number, url-or-key) tuples
    assert found == sorted(found)
    if found:
        era, path = found[0]
        assert isinstance(era, int) and str(era) not in ("",)
        assert path.endswith(".era")
