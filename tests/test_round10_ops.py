"""Round-10 pins for the round-9 advice items.

- x41: NULL event timestamps are excluded on BOTH sides (Spark windows
  default to NULLS FIRST, DuckDB to NULLS LAST — an unfiltered NULL ts
  silently reorders the lead chain between engine and oracle).
- kcore: a peel that converges on exactly the last allowed wave is the
  true fixpoint and must be ACCEPTED (stability used to be detected only
  one wave later); a genuinely unconverged peel still raises.
- st15: the stream-side projection is mad_quantized itself — one
  quantization definition across x40 training and st15 serving (pinned
  structurally here; value parity lives in test_round9_ops).
- rehearsal_llm: tier flags are mutually exclusive (two flags used to
  silently run only the first block and misattribute the artifact).
"""

from __future__ import annotations

import datetime
import subprocess
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import register_duck_views

REPO = "/root/repo"


# --- x41: NULL ts excluded identically in engine and oracle ------------------


def _write_events_with_null_ts(tmp_path) -> str:
    """events.parquet with timestamp[ns] ts (the testdata's physical type)
    including NaT rows placed where a NULLS FIRST/LAST divergence would
    flip the lead chain: the NULL row belongs to a user with two real
    events, so ordering it first vs last changes which interval closes."""
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: NULL-ts event plus two real events 100s apart
        (1, 1, "view", base),
        (2, 1, "click", base + datetime.timedelta(seconds=100)),
        (3, 1, "purchase", None),
        # user 2: clean pair
        (4, 2, "view", base),
        (5, 2, "click", base + datetime.timedelta(seconds=7)),
        # user 3: only a NULL-ts event — must contribute nothing
        (6, 3, "view", None),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])  # datetime64[ns] with NaT
    out = str(tmp_path)
    pdf.to_parquet(f"{out}/events.parquet", index=False)
    return out


def test_x41_null_ts_excluded_both_sides(spark, duck, tmp_path):
    from era_parser_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    sf = _write_events_with_null_ts(tmp_path)

    sdf = QUERIES["x41_state_durations"](spark, sf)
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    duck.execute(f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = sorted(tuple(r) for r in duck.execute(ORACLES["x41_state_durations"]).fetchall())
    assert spark_rows == duck_rows
    # and the semantics: only user 1's view->click (100s) and user 2's
    # view->click (7s) close; the NULL rows contribute nothing
    assert spark_rows == [("view", 2, 107_000_000)]


# --- kcore: convergence on the final allowed wave is accepted ----------------


def _path_edges(spark, n):
    return spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(1, n)], ["src", "dst"]
    )


def test_kcore_fixpoint_reached_on_last_wave_is_accepted(spark):
    """Path of 5 at k=2 dissolves in exactly 2 waves (wave 1 drops the
    endpoints, wave 2 empties the graph).  max_iter=2 exhausts the loop
    the wave BEFORE the old count check would have seen stability — the
    post-loop degree check must accept the (empty) fixpoint instead of
    raising."""
    from era_parser_spark.operators.graph import kcore

    out = kcore(_path_edges(spark, 5), k=2, max_iter=2)
    assert out.count() == 0


def test_kcore_genuinely_unconverged_still_raises(spark):
    """Path of 9 at k=2 needs 4 waves; after 2 the frame still has
    degree-1 endpoints, so the guard must fire."""
    from era_parser_spark.operators.graph import kcore

    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore(_path_edges(spark, 9), k=2, max_iter=2)


def test_kcore_clique_unaffected(spark):
    """Sanity: a 4-clique at k=3 is already its own core — the post-loop
    path never engages and every node keeps degree 3."""
    from era_parser_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(f"c{i}", f"c{j}") for i in range(4) for j in range(i + 1, 4)],
        ["src", "dst"],
    )
    rows = {r["node"]: r["core_degree"] for r in kcore(edges, k=3).collect()}
    assert rows == {f"c{i}": 3 for i in range(4)}


# --- st15: single quantization definition (structural pin) -------------------


def test_st15_stream_projection_uses_mad_quantized(spark):
    """mad_quantized must accept a STREAMING DataFrame and produce the
    identical v_us expression st15 serves — quantization has one
    definition across batch training (x40) and stream serving."""
    import pandas as _pd

    from era_parser_spark.queries.extended import mad_quantized

    pdf = _pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "event_type": ["a", "a", "b"],
            "value": [1.25, None, -0.7],
            "ts": _pd.to_datetime(["2024-01-01"] * 3),
        }
    )
    batch = spark.createDataFrame(pdf)
    got = {
        r["event_id"]: r["v_us"]
        for r in mad_quantized(batch, keep_cols=("ts",)).collect()
    }
    # null value dropped; floor(v * 1e6) exact
    assert got == {1: 1_250_000, 3: -700_000}
    # the streaming plan builds (isStreaming DataFrames accept the same
    # projection — this is what st15 relies on)
    sdf = spark.readStream.schema(batch.schema).parquet("/root/testdata/sf0.001")
    assert mad_quantized(sdf, keep_cols=("ts",)).isStreaming


# --- rehearsal_llm: tier flags mutually exclusive -----------------------------


def test_rehearsal_llm_tier_flags_mutually_exclusive():
    p = subprocess.run(
        [sys.executable, f"{REPO}/tools/rehearsal_llm.py", "--sim", "--suffix"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert p.returncode == 2
    assert "not allowed with" in p.stderr
