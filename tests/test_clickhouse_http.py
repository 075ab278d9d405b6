"""Protocol-level test of the A14 ClickHouse sink: `write_clickhouse`
driven through `ClickHouseHttpClient` against an in-process HTTP stub that
speaks BYTES — it parses the real wire shape (query URL parameter with
``INSERT INTO t (cols) FORMAT TabSeparated`` + TSV body, TSV unescaping,
typed column parsing) rather than recording Python method calls.  A real
server swap is therefore config-only: point the client URL at a live
ClickHouse :8123.

Covers the round-5 verdict's checklist: column order on the wire, batch
boundaries at batch_size, retry-after-disconnect (including full
reconnect when the ping fails too), and the reference's insert-time
type-coercion semantics (era-parser clickhouse_service.py:170-297 —
bad numerics -> 0, robust DateTime coercion) in both the row-at-a-time
twins and the Spark codegen `clickhouse_conform` path.
"""

from __future__ import annotations

import datetime as dt
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# the byte-level stub server
# ---------------------------------------------------------------------------


def _unescape_tsv(field: str) -> str | None:
    if field == r"\N":
        return None
    out = []
    i = 0
    while i < len(field):
        ch = field[i]
        if ch == "\\" and i + 1 < len(field):
            nxt = field[i + 1]
            out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _parse_typed(raw: str | None, ch_type: str):
    if raw is None:
        return None
    if ch_type.startswith("Int") or ch_type.startswith("UInt"):
        return int(raw)
    if ch_type.startswith("Float"):
        return float(raw)
    if ch_type == "DateTime":
        return dt.datetime.strptime(raw, "%Y-%m-%d %H:%M:%S")
    return raw  # String


class ClickHouseStub:
    """In-process HTTP server implementing the ClickHouse insert wire
    shape.  State lives server-side (Spark tasks run in separate worker
    processes, so only what crossed the wire is observable — which is
    exactly the point of a protocol test)."""

    def __init__(self, schemas: dict[str, dict[str, str]]):
        self.schemas = schemas  # table -> {col: ch_type}, ordered
        self.tables: dict[str, list[tuple]] = {t: [] for t in schemas}
        self.inserts: list[dict] = []  # one record per wire insert
        self.commands: list[str] = []
        self.fail_next_inserts = 0
        self.fail_next_pings = 0
        self.lock = threading.Lock()

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep pytest output clean
                pass

            def do_POST(self):
                qs = urllib.parse.parse_qs(
                    urllib.parse.urlsplit(self.path).query
                )
                query = (qs.get("query") or [""])[0]
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                if not query:  # command(): sql travels as the body
                    query = body.decode("utf-8")
                    body = b""
                try:
                    out = stub.execute(query, body)
                except _InjectedFailure as exc:
                    self.send_response(500)
                    msg = f"Code: 999. DB::Exception: {exc}".encode()
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                payload = out.encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def execute(self, query: str, body: bytes) -> str:
        q = query.strip()
        if q.upper().startswith("INSERT INTO"):
            with self.lock:
                if self.fail_next_inserts > 0:
                    self.fail_next_inserts -= 1
                    raise _InjectedFailure("injected insert failure")
            head = q[len("INSERT INTO"):].strip()
            table = head.split("(")[0].strip()
            cols = [c.strip() for c in head.split("(")[1].split(")")[0].split(",")]
            schema = self.schemas[table]
            assert set(cols) <= set(schema), f"unknown columns {cols}"
            rows = []
            for line in body.decode("utf-8").splitlines():
                fields = [_unescape_tsv(f) for f in line.split("\t")]
                assert len(fields) == len(cols), (fields, cols)
                rows.append(
                    tuple(
                        _parse_typed(raw, schema[c])
                        for raw, c in zip(fields, cols)
                    )
                )
            with self.lock:
                self.inserts.append(
                    {"table": table, "columns": cols, "n_rows": len(rows)}
                )
                self.tables[table].extend(rows)
            return ""
        # command path (ping etc.)
        with self.lock:
            self.commands.append(q)
            if self.fail_next_pings > 0:
                self.fail_next_pings -= 1
                raise _InjectedFailure("injected ping failure")
        if q.upper().startswith("SELECT 1"):
            return "1\n"
        return ""

    def close(self):
        self.server.shutdown()
        self.server.server_close()


class _InjectedFailure(Exception):
    pass


EVENTS_SCHEMA = {
    "slot": "Int64",
    "proposer_index": "Int64",
    "timestamp_utc": "DateTime",
    "graffiti": "String",
}


@pytest.fixture()
def stub():
    s = ClickHouseStub({"blocks": EVENTS_SCHEMA})
    yield s
    s.close()


def _factory(url):
    from era_parser_spark.sinks.clickhouse_http import ClickHouseHttpClient

    return lambda: ClickHouseHttpClient(url)


# ---------------------------------------------------------------------------
# wire-shape tests
# ---------------------------------------------------------------------------


def test_insert_column_order_and_values_on_the_wire(spark, stub):
    from era_parser_spark.sinks.writers import write_clickhouse

    rows = [
        (1, 10, dt.datetime(2024, 5, 1, 12, 0, 0), "hello"),
        (2, 20, dt.datetime(2024, 5, 1, 12, 0, 5), "tab\tnewline\nback\\slash"),
        (3, 30, dt.datetime(2024, 5, 1, 12, 0, 10), ""),
    ]
    df = spark.createDataFrame(
        rows, "slot long, proposer_index long, timestamp_utc timestamp, graffiti string"
    ).repartition(1)
    write_clickhouse(df, "blocks", _factory(stub.url))
    assert all(i["columns"] == list(df.columns) for i in stub.inserts)
    got = sorted(stub.tables["blocks"])
    assert got == sorted(rows)  # TSV escaping round-trips tabs/newlines/backslashes


def test_batches_split_at_batch_size(spark, stub):
    from era_parser_spark.sinks.writers import write_clickhouse

    df = spark.range(25).select(
        F.col("id").alias("slot"),
        F.lit(7).alias("proposer_index"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("timestamp_utc"),
        F.lit("g").alias("graffiti"),
    ).repartition(1)
    write_clickhouse(df, "blocks", _factory(stub.url), batch_size=7)
    assert [i["n_rows"] for i in stub.inserts] == [7, 7, 7, 4]
    assert len(stub.tables["blocks"]) == 25
    assert {r[0] for r in stub.tables["blocks"]} == set(range(25))


def test_retry_after_failed_insert_pings_then_succeeds(spark, stub):
    from era_parser_spark.sinks.writers import write_clickhouse

    stub.fail_next_inserts = 1
    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "x")],
        "slot long, proposer_index long, timestamp_utc timestamp, graffiti string",
    ).repartition(1)
    write_clickhouse(df, "blocks", _factory(stub.url), backoff=0.01)
    # exactly one successful landing despite the failed first attempt
    assert len(stub.tables["blocks"]) == 1
    assert [i["n_rows"] for i in stub.inserts] == [1]
    assert "SELECT 1" in stub.commands  # the reference's ping-before-retry


def test_reconnect_when_ping_also_fails(spark, stub):
    from era_parser_spark.sinks.writers import write_clickhouse

    stub.fail_next_inserts = 1
    stub.fail_next_pings = 1  # ping after the failure also dies -> reconnect
    df = spark.createDataFrame(
        [(5, 1, dt.datetime(2024, 1, 1), "y")],
        "slot long, proposer_index long, timestamp_utc timestamp, graffiti string",
    ).repartition(1)
    write_clickhouse(df, "blocks", _factory(stub.url), backoff=0.01)
    assert len(stub.tables["blocks"]) == 1  # no dupes after reconnect+retry


def test_exhausted_retries_surface_the_server_error(spark, stub):
    from era_parser_spark.sinks.writers import write_clickhouse

    stub.fail_next_inserts = 99
    df = spark.createDataFrame(
        [(5, 1, dt.datetime(2024, 1, 1), "y")],
        "slot long, proposer_index long, timestamp_utc timestamp, graffiti string",
    ).repartition(1)
    with pytest.raises(Exception, match="DB::Exception"):
        write_clickhouse(
            df, "blocks", _factory(stub.url), max_retries=2, backoff=0.01
        )
    assert len(stub.tables["blocks"]) == 0


# ---------------------------------------------------------------------------
# reference type-coercion semantics
# ---------------------------------------------------------------------------

NASTY_NUMERIC = [
    (None, 0), ("", 0), ("abc", 0), (float("nan"), 0),
    ("12", 12), ("12.7", 12), ("-3.9", -3), (7, 7), (7.9, 7), (-2.5, -2),
    ("1e3", 1000), ("  ", 0),
    # non-finite / out-of-BIGINT-range -> 0 in BOTH twins
    ("1e999", 0), ("inf", 0), ("-inf", 0), ("9.3e18", 0),
    (float("inf"), 0), (True, 1), (False, 0),
    # digit strings >= 2^53: must coerce EXACTLY (integer path, no float
    # round-trip) in both twins, mirroring try_cast('bigint')-first
    ("9007199254740993", 9007199254740993),          # 2^53 + 1
    ("9223372036854775807", 9223372036854775807),    # I64_MAX
    ("-9223372036854775808", -9223372036854775808),  # I64_MIN
    ("9223372036854775808", 0),                      # 2^63: out of range
]

NASTY_DATETIME = [
    (None, dt.datetime(1970, 1, 1)),
    ("", dt.datetime(1970, 1, 1)),
    ("0", dt.datetime(1970, 1, 1)),
    ("1970-01-01T00:00:00Z", dt.datetime(1970, 1, 1)),
    ("1714564800", dt.datetime(2024, 5, 1, 12, 0, 0)),
    (1714564800, dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("2024-05-01T12:00:00", dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("2024-05-01T12:00:00Z", dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("2024-05-01T12:00:00+02:00", dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("2024-05-01T12:00:00.123456", dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("1714564800.9", dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("99999999999", dt.datetime(1970, 1, 1)),  # beyond the valid range
    (-5, dt.datetime(1970, 1, 1)),
    ("nonsense", dt.datetime(1970, 1, 1)),
    # NEGATIVE utc offsets normalize to the wall time like positive ones
    ("2024-05-01T12:00:00-04:00", dt.datetime(2024, 5, 1, 12, 0, 0)),
    ("2024-05-01T12:00:00.123-0400", dt.datetime(2024, 5, 1, 12, 0, 0)),
    # an INTERIOR Z (malformed: Z plus offset) must fall to the epoch in
    # BOTH twins — only a trailing Z is stripped (Z$, not replace-all)
    ("2024-05-01T12:00:00Z+02:00", dt.datetime(1970, 1, 1)),
]


def test_python_coercion_twins_match_reference_semantics():
    from era_parser_spark.sinks.clickhouse_http import (
        coerce_datetime,
        coerce_numeric,
    )

    for raw, want in NASTY_NUMERIC:
        assert coerce_numeric(raw) == want, raw
    for raw, want in NASTY_DATETIME:
        assert coerce_datetime(raw) == want, raw


def test_spark_conform_matches_python_twins(spark):
    """clickhouse_conform (JVM codegen) must agree with the row-at-a-time
    reference twins on the whole nasty-value matrix."""
    from era_parser_spark.sinks.clickhouse_http import clickhouse_conform

    rows = [
        (i, None if raw is None else str(raw), None if raw is None else str(raw))
        for i, (raw, _) in enumerate(NASTY_DATETIME)
    ]
    # numerics: drive the string forms through a string column.  NaN and
    # booleans can't ride a string column faithfully (str(nan)/'True'
    # differ from Spark's casts) — booleans are covered by the
    # boolean-dtype branch below.
    def _skip(raw):
        return (isinstance(raw, float) and raw != raw) or isinstance(raw, bool)

    nrows = [
        (i, None if raw is None else str(raw))
        for i, (raw, _) in enumerate(NASTY_NUMERIC)
        if not _skip(raw)
    ]
    ndf = spark.createDataFrame(nrows, "i long, v string")
    out = {
        r["i"]: r["v"]
        for r in clickhouse_conform(ndf, {"v", "i"}, set()).collect()
    }
    for i, (raw, want) in enumerate(NASTY_NUMERIC):
        if _skip(raw):
            continue
        assert out[i] == want, (raw, out[i])

    # boolean dtype takes the dedicated branch: true->1, false->0, null->0
    bdf = spark.createDataFrame(
        [(0, True), (1, False), (2, None)], "i long, v boolean"
    )
    bout = {
        r["i"]: r["v"]
        for r in clickhouse_conform(bdf, {"v", "i"}, set()).collect()
    }
    assert bout == {0: 1, 1: 0, 2: 0}

    ddf = spark.createDataFrame(rows, "i long, v string, w string")
    dout = {
        r["i"]: r["v"]
        for r in clickhouse_conform(ddf, {"i"}, {"v"}).collect()
    }
    for i, (raw, want) in enumerate(NASTY_DATETIME):
        got = dout[i]
        got = got.replace(tzinfo=None) if got.tzinfo else got
        assert got == want, (raw, got)

    # an already-typed timestamp column passes through unchanged
    tdf = spark.createDataFrame(
        [(1, dt.datetime(2030, 2, 3, 4, 5, 6))], "i long, ts timestamp"
    )
    trow = clickhouse_conform(tdf, {"i"}, {"ts"}).first()
    assert trow["ts"].replace(tzinfo=None) == dt.datetime(2030, 2, 3, 4, 5, 6)


def test_conformed_load_end_to_end(spark, stub):
    """The full path: messy frame -> clickhouse_conform -> write_clickhouse
    -> stub parses typed values off the wire."""
    from era_parser_spark.sinks.clickhouse_http import clickhouse_conform
    from era_parser_spark.sinks.writers import write_clickhouse

    df = spark.createDataFrame(
        [
            ("1", "bad", "1714564800", None),
            (None, "33", "2024-05-01T00:00:00Z", "ok"),
        ],
        "slot string, proposer_index string, timestamp_utc string, graffiti string",
    )
    conformed = clickhouse_conform(
        df, {"slot", "proposer_index"}, {"timestamp_utc"}
    ).repartition(1)
    write_clickhouse(conformed, "blocks", _factory(stub.url))
    got = sorted(stub.tables["blocks"])
    assert got == [
        (0, 33, dt.datetime(2024, 5, 1, 0, 0, 0), "ok"),
        (1, 0, dt.datetime(2024, 5, 1, 12, 0, 0), ""),
    ]
