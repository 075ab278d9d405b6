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


# --- t38: greedy longest-match WordPiece inference ----------------------------


def _greedy_twin(word, pieces):
    by_len = sorted(set(pieces), key=lambda p: (-len(p), p))
    n = 0
    i = 0
    while i < len(word):
        step = 1
        for p in by_len:
            if word.startswith(p, i):
                step = len(p)
                break
        n += 1
        i += step
    return n


def _trainer_twin(word, merges):
    syms = list(word)
    for pair in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_wordpiece_greedy_counts_matches_python_twin(spark):
    import random

    from era_parser_spark.operators.tokenizer import wordpiece_greedy_counts

    pieces = ["aa", "bc", "bbc", "aab", "aaab"]
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in sorted(set(words))], ["w"])
    got = {r["w"]: r["n_greedy"] for r in wordpiece_greedy_counts(df, pieces).collect()}
    want = {w: _greedy_twin(w, pieces) for w in set(words)}
    assert got == want


def test_greedy_inference_differs_from_trainer_segmentation(spark):
    """The rule difference t37 documents and t38 claims: greedy
    longest-match can span a trainer merge boundary and fragment the
    remainder differently.  merges (a,a),(b,c),(b,bc),(aa,b),(a,aab)
    segment 'cacbaaab' into 7 trainer pieces, greedy into 5."""
    from era_parser_spark.operators.tokenizer import wordpiece_greedy_counts

    merges = [("a", "a"), ("b", "c"), ("b", "bc"), ("aa", "b"), ("a", "aab")]
    pieces = [l + r for l, r in merges]
    w = "cacbaaab"
    assert _trainer_twin(w, merges) == 7
    df = spark.createDataFrame([(w,)], ["w"])
    got = wordpiece_greedy_counts(df, pieces).collect()[0]["n_greedy"]
    assert got == 5


def test_wordpiece_greedy_unknown_chars_pass_through(spark):
    from era_parser_spark.operators.tokenizer import wordpiece_greedy_counts

    df = spark.createDataFrame([("xyzzy",), ("aaxaa",)], ["w"])
    got = {r["w"]: r["n_greedy"] for r in wordpiece_greedy_counts(df, ["aa"]).collect()}
    # no piece matches anything in xyzzy -> 5 single chars;
    # aaxaa -> aa|x|aa = 3
    assert got == {"xyzzy": 5, "aaxaa": 3}


# --- x42 / bfs_distances ------------------------------------------------------


def _bfs_twin(edges, sources, rounds):
    from collections import deque

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for s in sources:
        if s not in adj:
            continue
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if d[u] >= rounds:
                continue
            for v in adj[u]:
                if v not in d:
                    d[v] = d[u] + 1
                    q.append(v)
        for node, dist in d.items():
            out[(s, node)] = dist
    return out


def test_bfs_distances_hand_graph(spark):
    from era_parser_spark.operators.graph import bfs_distances

    # path a-b-c-d plus triangle d-e-f-d; landmark 'a' and absent 'z'
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("f", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["landmark"], r["node"]): r["dist"]
        for r in bfs_distances(df, ["a", "z"]).collect()
    }
    assert got == {
        ("a", "a"): 0,
        ("a", "b"): 1,
        ("a", "c"): 2,
        ("a", "d"): 3,
        ("a", "e"): 4,
        ("a", "f"): 4,
    }


def test_bfs_distances_matches_twin_random_graph(spark):
    import random

    from era_parser_spark.operators.graph import bfs_distances

    rng = random.Random(11)
    edges = [
        (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(60)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for rounds in (2, 50):
        got = {
            (r["landmark"], r["node"]): r["dist"]
            for r in bfs_distances(df, ["n0", "n1"], rounds=rounds).collect()
        }
        assert got == _bfs_twin(edges, ["n0", "n1"], rounds)


def test_bfs_fixpoint_on_last_wave_is_accepted(spark):
    """Path of length 3 from the landmark: settled after exactly 3 waves;
    max_iter=3 exhausts the loop with a non-empty frontier whose next
    expansion is empty — must NOT raise (the kcore advice lesson)."""
    from era_parser_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = bfs_distances(df, ["a"], max_iter=3).count()
    assert got == 4


def test_bfs_genuinely_unconverged_raises(spark):
    from era_parser_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="still expanding"):
        bfs_distances(df, ["n0"], max_iter=2)


def test_x42_rounds_covers_fixpoint_depth(spark):
    """rounds=12 in the registry entry must be >= the circulant graph's
    true eccentricity from the landmarks (9 at full residue coverage) —
    bounded waves == exact BFS.  Checked structurally: unbounded
    fixpoint == rounds=12 run on the sf0.01 graph."""
    from era_parser_spark.queries import QUERIES, load_all

    load_all()
    from era_parser_spark.operators.graph import bfs_distances
    from era_parser_spark.queries.registry import table
    from pyspark.sql import functions as F2

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    mk = lambda add: F2.concat(  # noqa: E731
        F2.lit("h"), ((F2.col("doc_id") + add) % 97).cast("string")
    )
    e = docs.select(mk(0).alias("src"), mk(1).alias("dst")).unionByName(
        docs.select(mk(0).alias("src"), mk(7).alias("dst"))
    )
    bounded = {
        (r["landmark"], r["node"]): r["dist"]
        for r in bfs_distances(e, ["h0", "h1", "h2"], rounds=12).collect()
    }
    fixpoint = {
        (r["landmark"], r["node"]): r["dist"]
        for r in bfs_distances(e, ["h0", "h1", "h2"], max_iter=50).collect()
    }
    assert bounded == fixpoint
    assert max(bounded.values()) == 9


# --- st16: streaming as-of enrichment, cross-batch semantics ------------------


def test_asof_enrich_state_across_microbatches(spark, tmp_path_factory):
    """Forward-only locf semantics across micro-batch boundaries: a click
    in batch 1 enriches a purchase in batch 2 (state carries), a purchase
    BEFORE any click emits nothing, and a click arriving in a LATER batch
    never retroactively enriches an earlier purchase — behavior no
    single-batch oracle can check."""
    import uuid as _uuid

    from era_parser_spark.streaming.incremental import (
        asof_enrich_monitor,
        run_stream_once,
    )

    src = tmp_path_factory.mktemp("st16_src")
    sch = "user_id long, event_id long, event_type string, value double, us long"
    # batch 1: u1 purchase-before-click (no emit), then a click;
    #          u2 click only
    spark.createDataFrame(
        [
            (1, 10, "purchase", 9.9, 1_000_000),
            (1, 11, "click", 1.5, 2_000_000),
            (2, 20, "click", 2.5, 3_000_000),
        ],
        sch,
    ).coalesce(1).write.parquet(str(src / "a_batch1"))
    # batch 2: u1 purchase (enriched by batch-1 click), u2 purchase at an
    # EARLIER event time than a same-batch later click — replay order is
    # (us, event_id) within the batch, so the purchase sees the batch-1
    # click, not the later one; then a final u2 purchase sees the new click
    spark.createDataFrame(
        [
            (1, 12, "purchase", 0.0, 5_000_000),
            (2, 21, "purchase", 0.0, 6_000_000),
            (2, 22, "click", 7.5, 7_000_000),
            (2, 23, "purchase", 0.0, 8_000_000),
        ],
        sch,
    ).coalesce(1).write.parquet(str(src / "b_batch2"))

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = run_stream_once(
        asof_enrich_monitor(stream), f"asof_{_uuid.uuid4().hex[:8]}"
    )
    rows = {
        r["event_id"]: (r["purchase_us"], r["last_click_us"], r["last_click_value"])
        for r in out.collect()
    }
    assert 10 not in rows  # purchase before any click: nothing emitted
    assert rows[12] == (5_000_000, 2_000_000, 1.5)  # enriched across batches
    assert rows[21] == (6_000_000, 3_000_000, 2.5)  # later same-batch click ignored
    assert rows[23] == (8_000_000, 7_000_000, 7.5)  # new click state applied
    assert len(rows) == 3


def test_asof_enrich_null_value_clicks_not_updates(spark, tmp_path_factory):
    """A click with NULL value is not a dimension update (IGNORE NULLS on
    the update side): the purchase keeps the older valued click."""
    import uuid as _uuid

    from era_parser_spark.streaming.incremental import (
        asof_enrich_monitor,
        run_stream_once,
    )

    src = tmp_path_factory.mktemp("st16_null_src")
    sch = "user_id long, event_id long, event_type string, value double, us long"
    spark.createDataFrame(
        [
            (1, 1, "click", 4.25, 1_000_000),
            (1, 2, "click", None, 2_000_000),
            (1, 3, "purchase", 0.0, 3_000_000),
        ],
        sch,
    ).coalesce(1).write.parquet(str(src / "a"))
    stream = spark.readStream.schema(sch).parquet(f"{src}/*")
    out = run_stream_once(
        asof_enrich_monitor(stream), f"asofn_{_uuid.uuid4().hex[:8]}"
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(3, 1, 3_000_000, 1_000_000, 4.25)]


# --- x43: gap-fill locf -------------------------------------------------------


def test_x43_locf_semantics(spark, duck, tmp_path):
    """Hand fixture: samples at 10:30 (v=1.5) and 12:15 (v=2.5) hold
    their value on the hourly grid — 11:00 and 12:00 carry 1.5; the last
    sample emits nothing until an aligned hour lands on it.  A second
    user with one hour-ALIGNED sample emits exactly itself (the locf
    right edge).  Engine vs oracle compared on the same parquet."""
    import pandas as _pd

    from era_parser_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    base = datetime.datetime(2024, 1, 1, 10, 30, 0)
    aligned = datetime.datetime(2024, 1, 1, 14, 0, 0)
    rows = [
        (1, 1, "view", base, 1.5),
        (2, 1, "view", base + datetime.timedelta(minutes=105), 2.5),  # 12:15
        (3, 2, "view", aligned, 7.25),
        (4, 3, "view", base, None),  # NULL value: no samples, no grid
    ]
    pdf = _pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    )
    pdf["ts"] = _pd.to_datetime(pdf["ts"])
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    got = sorted(
        tuple(r) for r in QUERIES["x43_gapfill_locf"](spark, sf).collect()
    )
    duck.execute(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    want = sorted(tuple(r) for r in duck.execute(ORACLES["x43_gapfill_locf"]).fetchall())
    assert got == want
    h = 3_600_000_000
    us_11 = int(_pd.Timestamp("2024-01-01 11:00:00").value // 1000)
    assert (1, us_11, 1_500_000, 1.5) in got
    assert (1, us_11 + h, 1_500_000, 1.5) in got  # 12:00 still holds 1.5
    assert (2, us_11 + 3 * h, 7_250_000, 7.25) in got  # aligned sample emits itself
    users = {g[0] for g in got}
    assert users == {1, 2}


# --- p21: curation v6 (budget in learned-BPE tokens) ---------------------------


def test_p21_composition_semantics(spark):
    """Composition pins the sweep can't see: the Gopher gate binds (gated
    docs are absent from the audit frame), the budget binds (some rows
    have kept=False), and a surviving doc's bpe_tokens equals the count
    from encoding it with the TRAINED merge table (the t32 relational
    count == bpe_encode_word differential, here through the composed
    pipeline)."""
    from era_parser_spark.operators.dedup import tokens_col
    from era_parser_spark.operators.text import gopher_quality_flags
    from era_parser_spark.operators.tokenizer import (
        bpe_encode_word,
        bpe_merges_distributed,
    )
    from era_parser_spark.queries import QUERIES, load_all
    from era_parser_spark.queries.registry import table as _table

    load_all()
    sf = "/root/testdata/sf0.01"
    out = QUERIES["p21_curation_v6"](spark, sf).collect()
    assert len(out) > 0
    kept_flags = {bool(r["kept"]) for r in out}
    assert kept_flags == {True, False}  # the budget binds

    docs = _table(spark, sf, "documents")
    n_docs = docs.count()
    assert len(out) < n_docs  # the gate binds

    # independent count for one surviving doc: train the same merges on
    # the same gated corpus, encode the doc's words with the python kernel
    flags = gopher_quality_flags(
        docs, "doc_id", "text",
        min_words=40, min_required_stopwords=1, keep_cols=("text", "source"),
    )
    surv = flags.filter(F.col("gopher_keep")).select("doc_id", "text")
    merges_df = bpe_merges_distributed(surv, "text", n_merges=8)
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges_df.collect()
    }
    pick = sorted(out, key=lambda r: r["doc_id"])[0]
    text = surv.filter(F.col("doc_id") == pick["doc_id"]).first()["text"]
    words = [w for w in text.strip().lower().split() if w]
    want = sum(len(bpe_encode_word(w, ranks)) for w in words)
    assert pick["bpe_tokens"] == want
