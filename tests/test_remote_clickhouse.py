"""Remote discovery (fake S3/HTTP clients) + ClickHouse foreachPartition
writer (fake clickhouse_connect-shaped client): the network-path logic the
environment can't exercise for real, driven end-to-end with injected fakes.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from era_parser_spark.sources.discovery import (
    discover_http,
    discover_s3,
    probe_http_eras,
)


class FakeS3Client:
    """Three-page ListObjectsV2 with continuation tokens."""

    def __init__(self):
        self.pages = [
            {
                "Contents": [
                    {"Key": "gnosis-01082-aabbccdd.era"},
                    {"Key": "gnosis-01083-deadbeef.era"},
                    {"Key": "mainnet-01084-deadbeef.era"},  # wrong network
                    {"Key": "notes.txt"},
                ],
                "IsTruncated": True,
                "NextContinuationToken": "tok1",
            },
            {
                "Contents": [{"Key": "gnosis-01084-00112233.era"}],
                "IsTruncated": True,
                "NextContinuationToken": "tok2",
            },
            {
                "Contents": [{"Key": "gnosis-01085-44556677.era"}],
                "IsTruncated": False,
            },
        ]
        self.calls: list[dict] = []

    def list_objects_v2(self, **kw):
        self.calls.append(kw)
        return self.pages[len(self.calls) - 1]


def test_discover_s3_paginates_and_filters():
    client = FakeS3Client()
    found = discover_s3("era-bucket", "gnosis-", "gnosis", client=client)
    assert found == [
        (1082, "s3a://era-bucket/gnosis-01082-aabbccdd.era"),
        (1083, "s3a://era-bucket/gnosis-01083-deadbeef.era"),
        (1084, "s3a://era-bucket/gnosis-01084-00112233.era"),
        (1085, "s3a://era-bucket/gnosis-01085-44556677.era"),
    ]
    assert len(client.calls) == 3
    assert "ContinuationToken" not in client.calls[0]
    assert client.calls[1]["ContinuationToken"] == "tok1"
    assert client.calls[2]["ContinuationToken"] == "tok2"
    assert all(c["Bucket"] == "era-bucket" for c in client.calls)


def test_discover_http_scrapes_listing():
    html = (
        '<a href="gnosis-01082-aabbccdd.era">x</a>\n'
        '<a href="gnosis-01090-deadbeef.era">y</a>\n'
        '<a href="sepolia-01091-deadbeef.era">z</a>\n'
        '<a href="README.md">r</a>'
    )
    found = discover_http("http://files.example/eras/", "gnosis", http_get=lambda url: html)
    assert found == [
        (1082, "http://files.example/eras/gnosis-01082-aabbccdd.era"),
        (1090, "http://files.example/eras/gnosis-01090-deadbeef.era"),
    ]


def test_probe_http_eras_closed_range():
    exists = {1082, 1083, 1085}
    calls = []

    def head(url):
        calls.append(url)
        era = int(url.rsplit("-", 1)[1].split(".")[0])
        return era in exists

    found = probe_http_eras("http://h/", "gnosis", 1080, 1090, http_head=head)
    assert [e for e, _ in found] == [1082, 1083, 1085]
    assert found[0][1] == "http://h/gnosis-01082.era"
    assert len(calls) == 11  # whole closed range probed, once each


def test_probe_http_eras_open_end_stops_after_empty_batches():
    calls = []

    def head(url):
        calls.append(url)
        era = int(url.rsplit("-", 1)[1].split(".")[0])
        return era <= 105

    found = probe_http_eras(
        "http://h", "gnosis", 100, None, http_head=head, batch_size=10
    )
    assert [e for e, _ in found] == list(range(100, 106))
    # 1 batch with hits + 3 consecutive empty batches, not open_end_limit
    assert len(calls) == 40


def _make_ch_factory(log_dir: str, fail_first: bool):
    """Factory built from nested defs so cloudpickle serializes it by VALUE
    (the test module isn't importable from Spark's Python workers).  The
    fake journals every insert to disk — foreachPartition runs in worker
    processes, so in-memory state would be invisible to the test."""

    def factory():
        state = {"failed_once": False}

        class _Client:
            def insert(self, table, rows, column_names):
                if fail_first and not state["failed_once"]:
                    state["failed_once"] = True
                    raise ConnectionError("injected transient failure")
                path = os.path.join(log_dir, f"{uuid.uuid4().hex}.json")
                with open(path, "w") as f:
                    json.dump(
                        {"table": table, "columns": column_names, "rows": rows}, f
                    )

            def command(self, sql):
                return 1

        return _Client()

    return factory


def _read_batches(log_dir):
    batches = []
    for name in os.listdir(log_dir):
        with open(os.path.join(log_dir, name)) as f:
            batches.append(json.load(f))
    return batches


@pytest.mark.parametrize("fail_first", [False, True])
def test_write_clickhouse_batches_and_retries(spark, tmp_path, fail_first):
    from era_parser_spark.sinks.writers import write_clickhouse

    log_dir = str(tmp_path / "ch_log")
    os.makedirs(log_dir)
    df = spark.range(25).selectExpr("id", "id * 2 AS v").repartition(3)
    write_clickhouse(
        df,
        "beacon.blocks",
        _make_ch_factory(log_dir, fail_first),
        batch_size=4,
        max_retries=3,
        backoff=0.0,
    )
    batches = _read_batches(log_dir)
    assert all(b["table"] == "beacon.blocks" for b in batches)
    assert all(b["columns"] == ["id", "v"] for b in batches)
    assert all(1 <= len(b["rows"]) <= 4 for b in batches)
    got = sorted(tuple(r) for b in batches for r in b["rows"])
    assert got == [(i, 2 * i) for i in range(25)]
