"""A8 end-to-end over real HTTP: a stdlib http.server serves synthetic era
files; discovery scrapes its listing (urllib default client), the parse
kernel fetches era bytes task-side, and the incremental driver + CLI run
the full remote flow against it.
"""

from __future__ import annotations

import http.server
import json
import os
import threading

import pytest

from era_parser_spark.testing.era_gen import era_filename, write_synthetic_era


@pytest.fixture(scope="module")
def http_era_server(tmp_path_factory):
    d = tmp_path_factory.mktemp("http_eras")
    for era in (1500, 1501, 1502):
        write_synthetic_era(str(d / era_filename("gnosis", era)), era, "gnosis", blocks=12)

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(d), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/", str(d)
    srv.shutdown()


def test_discover_http_real_listing(http_era_server):
    from era_parser_spark.sources.discovery import discover_auto

    base, _ = http_era_server
    found = discover_auto(base, "gnosis")  # default urllib http_get
    assert [e for e, _ in found] == [1500, 1501, 1502]
    assert all(p.startswith(base) and p.endswith(".era") for _, p in found)


def test_probe_http_real_heads(http_era_server):
    from era_parser_spark.sources.discovery import probe_http_eras

    base, _ = http_era_server
    found = probe_http_eras(base, "gnosis", 1499, 1503)  # default urllib HEAD
    # probe URLs have no content-hash suffix; this server names files with
    # one, so probing finds nothing — but must return cleanly (404s -> False)
    assert found == []


def test_read_era_blocks_over_http_matches_local(spark, http_era_server):
    from era_parser_spark.sources.discovery import discover_auto
    from era_parser_spark.sources.era import read_era_blocks

    base, d = http_era_server
    urls = [p for _, p in discover_auto(base, "gnosis")]
    over_http = read_era_blocks(spark, urls, network="gnosis")
    local = read_era_blocks(spark, d, glob="*.era")
    got = sorted((r.slot, r.signature) for r in over_http.select("slot", "signature").collect())
    want = sorted((r.slot, r.signature) for r in local.select("slot", "signature").collect())
    assert got == want and got


def test_incremental_over_http(spark, http_era_server, tmp_path):
    from era_parser_spark.streaming.incremental import run_incremental

    base, _ = http_era_server
    out = str(tmp_path / "wh")
    state = os.path.join(out, "_state")
    res = run_incremental(spark, base, out, state, "gnosis", tables=["blocks"])
    assert sorted(res) == [1500, 1501, 1502]
    again = run_incremental(spark, base, out, state, "gnosis", tables=["blocks"])
    assert again == {}  # skip-completed planning works over the remote source


def test_cli_discover_and_parse_http(http_era_server, tmp_path, capsys, spark):
    from era_parser_spark.cli import main

    base, _ = http_era_server
    assert main(["discover", base, "--range", "1500-1501"]) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [r["era_number"] for r in rows] == [1500, 1501]

    out = str(tmp_path / "parsed")
    assert main(["parse", base, "blocks", out, "--network", "gnosis"]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["written"]["blocks"] > 0


def test_cli_block_lookup_over_http(http_era_server, capsys):
    from era_parser_spark.cli import main

    base, d = http_era_server
    name = os.path.basename(sorted(os.listdir(d))[0])
    assert main(["block", f"{base}{name}", str(1500 * 8192)]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["data"]["message"]["slot"] == str(1500 * 8192)
