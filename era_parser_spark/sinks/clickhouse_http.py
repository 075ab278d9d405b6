"""Dependency-free ClickHouse client speaking the public HTTP interface.

The A14 sink (`sinks/writers.py::write_clickhouse`) takes any client with
the ``insert(table, rows, column_names=)`` / ``command(sql)`` shape.  This
module provides one that talks BYTES over ClickHouse's documented HTTP
protocol (``POST /?query=INSERT INTO t (cols) FORMAT TabSeparated`` with a
TSV body) instead of requiring the clickhouse-connect package — so the
sink is protocol-testable against an in-process HTTP stub
(tests/test_clickhouse_http.py) and swapping in a real server is
config-only (point ``url`` at host:8123).

Also provides the reference's insert-time type-coercion semantics
(era-parser clickhouse_service.py:170-297) twice:

- `coerce_numeric` / `coerce_datetime` — row-at-a-time Python, the exact
  reference behavior, used for wire encoding of driver-side values and as
  the semantics oracle in tests;
- `clickhouse_conform` — the same semantics as pure Spark expressions
  (whole-stage codegen), which is the path a 100 TB load actually uses:
  coercion happens JVM-side during the scan, never per-row in Python.
"""

from __future__ import annotations

import datetime as _dt
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ClickHouseHttpClient",
    "clickhouse_conform",
    "coerce_datetime",
    "coerce_numeric",
    "encode_tsv_value",
]

#: the reference's valid-Unix-range guard (clickhouse_service.py:244):
#: DateTime values outside (0, ~2106) collapse to the 1970 epoch.
_TS_MAX = 4294944000
_EPOCH = _dt.datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# reference coercion semantics (row-at-a-time twins of the Spark exprs)
# ---------------------------------------------------------------------------


#: BIGINT range — values outside it (and non-finite floats) coerce to 0 in
#: BOTH twins.  Deliberate robustness deviation from the reference, which
#: would raise OverflowError on int(float('1e999')).
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def coerce_numeric(value) -> int:
    """Reference numeric-column coercion (clickhouse_service.py:200-212):
    None/''/unparseable -> 0, numerics -> int(value), strings ->
    int(float(s)) (truncation toward zero).  Booleans -> 1/0; non-finite
    or out-of-BIGINT-range values -> 0 (see _I64_MAX note)."""
    if value is None or value == "":
        return 0
    if isinstance(value, bool):
        return 1 if value else 0
    if isinstance(value, float) and value != value:  # NaN
        return 0
    try:
        if isinstance(value, (int, float)):
            n = int(value)
        else:
            # integer strings first (exact, like the Spark twin's
            # try_cast('bigint')), so digit strings >= 2^53 don't lose
            # precision through a float round-trip; non-integer strings
            # fall back to float truncation (try_cast('double'))
            s = str(value)
            try:
                n = int(s)
            except ValueError:
                n = int(float(s))
    except (ValueError, TypeError, OverflowError):
        return 0
    return n if _I64_MIN <= n <= _I64_MAX else 0


def coerce_datetime(value) -> _dt.datetime:
    """Reference DateTime coercion (clickhouse_service.py:228-297):
    None/''/epoch-markers -> 1970-01-01; integer/float strings and
    numerics in (0, 4294944000) -> UTC timestamp; ISO strings with 'T'
    -> parsed with tz/microseconds stripped; anything else -> epoch.

    One deliberate deviation: the reference calls ``fromtimestamp`` (the
    worker's LOCAL timezone); a distributed engine cannot depend on
    worker-local tz, so this is ``utcfromtimestamp`` semantics — identical
    when the reference runs with TZ=UTC, documented otherwise.  Fractional
    Unix timestamps truncate to whole seconds (ClickHouse DateTime
    resolution) where the reference would keep microseconds.
    """
    if value is None or value == "":
        return _EPOCH
    if isinstance(value, float) and value != value:  # NaN
        return _EPOCH
    if isinstance(value, _dt.datetime):
        return value
    if isinstance(value, str):
        if value in (
            "1970-01-01T00:00:00+00:00",
            "1970-01-01T00:00:00Z",
            "1970-01-01T00:00:00",
            "0",
        ):
            return _EPOCH
        try:
            ts = int(value)
            if 0 < ts < _TS_MAX:
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=ts)
            return _EPOCH
        except (ValueError, TypeError):
            pass
        if "T" in value:
            import re as _re

            # strip only a TRAILING 'Z' (like clickhouse_conform's 'Z$'
            # regex — an interior Z, e.g. '...00Z+02:00', must survive so
            # both twins reject the malformed string identically)
            s = _re.sub(r"Z$", "", value)
            # strip a trailing numeric UTC offset of EITHER sign (the
            # reference only splits on '+', leaving '-05:00' to produce a
            # tz-aware datetime; a distributed engine must not depend on
            # offset sign, so both normalize to the wall time — mirrored
            # exactly by clickhouse_conform's cleanup regexes)
            s = _re.sub(r"[+-]\d{2}:?\d{2}$", "", s)
            if "." in s:
                s = s.split(".")[0]
            try:
                # strict format, mirroring try_to_timestamp's
                # yyyy-MM-dd'T'HH:mm:ss (fromisoformat would accept
                # residual-Z / short forms the Spark twin rejects)
                return _dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S")
            except ValueError:
                return _EPOCH
        try:
            ts = float(value)
        except (ValueError, TypeError):
            return _EPOCH
        if 0 < ts < _TS_MAX:
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=int(ts))
        return _EPOCH
    if isinstance(value, (int, float)):
        if 0 < value < _TS_MAX:
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=int(value))
        return _EPOCH
    return _EPOCH


def clickhouse_conform(
    df: DataFrame,
    numeric_cols: set[str] | frozenset[str],
    datetime_cols: set[str] | frozenset[str],
) -> DataFrame:
    """The reference's insert-time coercion as pure Spark expressions.

    Same observable semantics as `coerce_numeric` / `coerce_datetime` /
    str-or-'' (pinned against them in tests over a nasty-value matrix),
    but whole-stage-codegen JVM-side — at load scale the coercion rides
    the scan for free instead of costing a Python round trip per row.
    Columns already typed timestamp pass through datetime coercion
    unchanged (the reference's datetime-object fast path).
    """
    dtypes = dict(df.dtypes)
    out = []
    for name in df.columns:
        c = F.col(name)
        if name in numeric_cols:
            if dtypes[name] == "boolean":
                # bool is int in Python (True -> 1); the string path would
                # see 'true' and collapse to 0 — branch on the dtype
                expr = F.coalesce(c.cast("int"), F.lit(0)).cast("bigint")
            else:
                s = c.cast("string")
                d = s.try_cast("double")
                # non-finite / out-of-BIGINT-range -> 0 (matches
                # coerce_numeric; an unguarded double->bigint cast would
                # silently write LONG_MAX for 'inf' or '1e999')
                finite = d.isNotNull() & ~F.isnan(d) & (F.abs(d) < 9.2e18)
                expr = F.coalesce(
                    s.try_cast("bigint"),
                    F.when(finite, d.cast("bigint")).otherwise(F.lit(0)),
                    F.lit(0).cast("bigint"),
                )
        elif name in datetime_cols:
            if dtypes[name].startswith("timestamp"):
                expr = c.cast("timestamp")
            else:
                s = c.cast("string")
                epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
                as_int = s.try_cast("bigint")
                as_float = s.try_cast("double")
                # strip Z, then a signed numeric UTC offset (either sign —
                # see coerce_datetime's note), then microseconds; both may
                # be present ('...05.123+02:00'), so sequential passes
                cleaned = F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(s, r"Z$", ""), r"[+-]\d{2}:?\d{2}$", ""
                    ),
                    r"\.\d+$",
                    "",
                )
                iso = F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ss"))
                expr = (
                    F.when(c.isNull() | (s == ""), epoch)
                    .when(
                        as_int.isNotNull(),
                        F.when(
                            (as_int > 0) & (as_int < _TS_MAX),
                            F.timestamp_seconds(as_int),
                        ).otherwise(epoch),
                    )
                    .when(s.contains("T"), F.coalesce(iso, epoch))
                    .when(
                        as_float.isNotNull(),
                        F.when(
                            (as_float > 0) & (as_float < _TS_MAX),
                            F.timestamp_seconds(as_float.cast("bigint")),
                        ).otherwise(epoch),
                    )
                    .otherwise(epoch)
                )
        else:
            expr = F.coalesce(c.cast("string"), F.lit(""))
        out.append(expr.alias(name))
    return df.select(*out)


# ---------------------------------------------------------------------------
# wire encoding (ClickHouse TabSeparated, documented escaping rules)
# ---------------------------------------------------------------------------


def encode_tsv_value(value) -> str:
    r"""One value in ClickHouse TabSeparated encoding: \N for NULL,
    backslash-escaped tab/newline/CR/backslash, DateTime as
    'YYYY-MM-DD hh:mm:ss', booleans as 1/0."""
    if value is None:
        return r"\N"
    if isinstance(value, bool):
        return "1" if value else "0"
    if isinstance(value, _dt.datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(value, _dt.date):
        return value.strftime("%Y-%m-%d")
    if isinstance(value, bytes):
        value = value.decode("utf-8", "replace")
    s = str(value)
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


class ClickHouseHttpClient:
    """Minimal ClickHouse client over the public HTTP interface.

    Implements exactly the shape `write_clickhouse` needs —
    ``insert(table, rows, column_names=)`` and ``command(sql)`` — by
    POSTing bytes: the insert ships
    ``INSERT INTO table (cols) FORMAT TabSeparated`` as the ``query`` URL
    parameter with the TSV-encoded rows as the request body, which is the
    documented bulk-load path every ClickHouse server (and the test stub)
    speaks.  Auth goes in X-ClickHouse-User/-Key headers.  Instances are
    constructed inside Spark tasks by the client_factory, so this class
    keeps no sockets open between calls (urllib per-request) — a retry
    after a dropped server needs no explicit reconnect state.
    """

    def __init__(
        self,
        url: str,
        user: str = "default",
        password: str = "",
        database: str = "default",
        timeout: float = 30.0,
    ):
        self.url = url.rstrip("/")
        self.user = user
        self.password = password
        self.database = database
        self.timeout = timeout

    def _post(self, params: dict, body: bytes) -> str:
        qs = urllib.parse.urlencode({"database": self.database, **params})
        req = urllib.request.Request(
            f"{self.url}/?{qs}",
            data=body,
            method="POST",
            headers={
                "X-ClickHouse-User": self.user,
                "X-ClickHouse-Key": self.password,
                "Content-Type": "text/tab-separated-values; charset=UTF-8",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read().decode("utf-8")
        except urllib.error.HTTPError as exc:  # surface the server's message
            detail = exc.read().decode("utf-8", "replace")
            raise ConnectionError(
                f"ClickHouse HTTP {exc.code}: {detail.strip()}"
            ) from exc

    def insert(self, table: str, rows, column_names: list[str]) -> None:
        cols = ", ".join(column_names)
        query = f"INSERT INTO {table} ({cols}) FORMAT TabSeparated"
        body = "".join(
            "\t".join(encode_tsv_value(v) for v in row) + "\n" for row in rows
        ).encode("utf-8")
        self._post({"query": query}, body)

    def command(self, sql: str) -> str:
        return self._post({}, sql.encode("utf-8")).strip()
