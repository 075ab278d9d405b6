"""SRP-LSH (s6), temperature mixing (p5), SCD2 intervals (x11) behavior
tests: planted-pair recall, data-derived-rate math, interval invariants,
and partition-independence of every keep/signature decision.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def srp_corpus(spark):
    """40 seeded random unit-ish vectors + 10 planted near-copies
    (cosine >= 0.99 to their base) + 30 identical degenerate vectors."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # planted near-dups: id 100+i is a tiny perturbation of base[i]
    for i in range(10):
        nb = base[i] + rng.normal(scale=0.01, size=64)
        rows.append((100 + i, [float(x) for x in nb]))
    # degenerate mode: one embedding repeated 30x (spam cluster)
    spam = [float(x) for x in rng.normal(size=64)]
    rows += [(1000 + j, spam) for j in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_srp_finds_planted_near_dups(spark, srp_corpus):
    from era_parser_spark.operators.similarity import srp_lsh_pairs

    got = {
        (r.doc_a, r.doc_b)
        for r in srp_lsh_pairs(
            srp_corpus.filter(F.col("vec_id") < 1000),
            "embedding", "vec_id", top_pairs=10, dim=64,
        ).collect()
    }
    planted = {(i, 100 + i) for i in range(10)}
    # every planted pair collides in >= 1 of the 4 tables and outranks the
    # random pairs on verified cosine
    assert planted <= got


def test_srp_signatures_partition_independent(spark, srp_corpus):
    from era_parser_spark.operators.similarity import srp_signatures

    a = {
        (r.vec_id, r.table_id, r.sig)
        for r in srp_signatures(srp_corpus, "embedding", "vec_id", dim=64).collect()
    }
    b = {
        (r.vec_id, r.table_id, r.sig)
        for r in srp_signatures(
            srp_corpus.repartition(13), "embedding", "vec_id", dim=64
        ).collect()
    }
    assert a == b and len(a) == 80 * 4


def test_srp_max_bucket_guard_drops_spam_cluster(spark, srp_corpus):
    from era_parser_spark.operators.similarity import srp_lsh_pairs

    got = srp_lsh_pairs(
        srp_corpus, "embedding", "vec_id",
        top_pairs=1000, dim=64, max_bucket=5,
    ).collect()
    spam_pairs = [r for r in got if r.doc_a >= 1000 and r.doc_b >= 1000]
    planted = {(i, 100 + i) for i in range(10)}
    # the 30-identical-vector cluster (bucket size 30 in every table) is
    # guarded out; genuine near-dup pairs (bucket size ~2) survive
    assert not spam_pairs
    assert planted <= {(r.doc_a, r.doc_b) for r in got}


def test_temperature_mix_rates_and_floor(spark):
    from era_parser_spark.operators.curation import temperature_mix

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    kept = temperature_mix(df, "src", "doc_id", alpha=0.5).collect()
    by = {}
    rates = {}
    for r in kept:
        by[r.src] = by.get(r.src, 0) + 1
        rates[r.src] = r.keep_rate
    # smallest stratum always kept whole at rate exactly 1.0
    assert by["small"] == 100 and rates["small"] == 1.0
    # big stratum: rate sqrt(100/400) = 0.5, kept count ~ Binomial(400, .5)
    assert rates["big"] == 0.5
    assert 150 <= by["big"] <= 250


def test_temperature_mix_alpha1_is_identity(spark):
    from era_parser_spark.operators.curation import temperature_mix

    rows = [(i, "a" if i % 5 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    assert temperature_mix(df, "src", "doc_id", alpha=1.0).count() == 200


def test_temperature_mix_partition_independent(spark):
    from era_parser_spark.operators.curation import temperature_mix

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    a = {r.doc_id for r in temperature_mix(df, "src", "doc_id").collect()}
    b = {
        r.doc_id
        for r in temperature_mix(df.repartition(7), "src", "doc_id").collect()
    }
    assert a == b


def test_scd2_intervals_collapse_and_chain(spark):
    import datetime as dt

    from era_parser_spark.queries import load_all

    ts = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 1, ts(0), "A"), (2, 1, ts(1), "A"), (3, 1, ts(2), "B"),
        (4, 1, ts(3), "A"),
        (5, 2, ts(0), "C"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    # reuse the registered query against this mini warehouse
    q, _ = load_all()
    out = sorted(
        q["x11_scd2_intervals"](spark, d).collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    got = [
        (r.user_id, r.state, r.valid_from.minute,
         None if r.valid_to is None else r.valid_to.minute, r.is_current)
        for r in out
    ]
    # A,A collapse into one interval; chain property: valid_to == next
    # valid_from; exactly one open interval per user
    assert got == [
        (1, "A", 0, 2, False),
        (1, "B", 2, 3, False),
        (1, "A", 3, None, True),
        (2, "C", 0, None, True),
    ]


def test_scd2_one_current_per_user_on_fixture(spark):
    from tests.conftest import SF_MED

    from era_parser_spark.queries import load_all

    q, _ = load_all()
    df = q["x11_scd2_intervals"](spark, SF_MED)
    per_user = (
        df.groupBy("user_id")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("cur"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert per_user and all(r.cur == 1 for r in per_user)
    # intervals chain: every non-current valid_to equals a later valid_from
    bad = (
        df.alias("a")
        .filter(~F.col("a.is_current"))
        .join(
            df.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.valid_to") == F.col("b.valid_from")),
            "left_anti",
        )
        .count()
    )
    assert bad == 0


def test_boilerplate_strip_planted_template(spark):
    from era_parser_spark.operators.text import boilerplate_strip

    tpl = "accept cookies"
    rows = [(i, f"{tpl} unique{i} words{i}") for i in range(60)]
    rows.append((100, tpl))               # pure boilerplate
    rows.append((101, "rare chunk only"))  # untouched
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_strip(
        df, "doc_id", "text", chunk_tokens=2, max_doc_freq=50
    ).collect()}
    # the 61-doc template chunk is stripped everywhere, uniques survive
    assert out[0].clean_text == "unique0 words0"
    assert out[59].clean_text == "unique59 words59"
    # pure-boilerplate doc comes back EMPTY, not missing
    assert out[100].clean_text == "" and out[100].n_kept == 0
    # sub-threshold chunks untouched (odd-length tail chunk too)
    assert out[101].clean_text == "rare chunk only"
    assert out[101].n_chunks == 2 and out[101].n_kept == 2


def test_kmv_exact_below_k_and_accurate_above(spark):
    from pyspark.sql import functions as F

    from era_parser_spark.operators.sketch import kmv_distinct

    rows = [(i, "small" if i < 10 else "big") for i in range(5000)]
    # 'small': 10 distinct values; 'big': 4990 distinct
    df = spark.createDataFrame(rows, "v long, g string")
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=32, buckets=16).collect()}
    # below k the sketch IS the set: exact
    assert out["small"].n_tracked == 10 and out["small"].est_distinct == 10.0
    # above k: KMV std error ~1/sqrt(k-2) ~ 18%; allow 3 sigma
    est = out["big"].est_distinct
    assert out["big"].n_tracked == 32
    assert abs(est - 4990) / 4990 < 0.55
    # partition-independence of the full sketch row
    out2 = {
        r.g: r
        for r in kmv_distinct(df.repartition(11), "g", "v", k=32, buckets=16).collect()
    }
    assert out2["big"].kth_min == out["big"].kth_min
    assert out2["big"].est_distinct == est


def test_funnel_order_matters(spark):
    import datetime as dt
    import os
    import tempfile

    from era_parser_spark.queries import load_all

    ts = lambda m: dt.datetime(2024, 3, 1, 0, m)
    rows = [
        # user 1: full ordered funnel in one day -> stage 3
        (1, 1, ts(0), "view", 0.0, "{}"),
        (2, 1, ts(1), "click", 0.0, "{}"),
        (3, 1, ts(2), "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE click -> only v..c -> stage 2
        (4, 2, ts(0), "view", 0.0, "{}"),
        (5, 2, ts(1), "purchase", 0.0, "{}"),
        (6, 2, ts(2), "click", 0.0, "{}"),
        # user 3: click then view (wrong order) -> stage 1 (has a view)
        (7, 3, ts(0), "click", 0.0, "{}"),
        (8, 3, ts(1), "view", 0.0, "{}"),
        # user 4: no view at all -> stage 0
        (9, 4, ts(0), "error", 0.0, "{}"),
        # user 1 next day: view only -> a separate user-day at stage 1
        (10, 1, ts(0) + dt.timedelta(days=1), "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    q, _ = load_all()
    got = {
        r.funnel_stage: r.n_user_days
        for r in q["x13_funnel_stages"](spark, d).collect()
    }
    assert got == {3: 1, 2: 1, 1: 2, 0: 1}


def test_srp_tolerates_null_and_ragged_vectors(spark):
    """A null or wrong-dim embedding row must be skipped, not kill the
    kernel batch (object-dtype matrix) — the per-record resilience
    contract of every scan-shaped operator here."""
    from era_parser_spark.operators.similarity import srp_signatures

    rows = [
        (1, [float(i) for i in range(8)]),
        (2, None),
        (3, [1.0, 2.0]),  # ragged
        (4, [float(-i) for i in range(8)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = srp_signatures(df, "embedding", "vec_id", dim=8).collect()
    assert {r.vec_id for r in got} == {1, 4}
    assert len(got) == 2 * 4


def test_all_pairs_tolerates_null_and_ragged_vectors(spark):
    from era_parser_spark.operators.similarity import all_pairs_topk

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, None),
        (3, [1.0]),  # ragged
        (4, [1.0, 0.0, 0.0]),
        (5, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = all_pairs_topk(df, "embedding", "vec_id", top_pairs=3,
                         candidates_per_pair=3).collect()
    pairs = {(r.doc_a, r.doc_b): r.cosine_sim for r in got}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert all(2 not in p and 3 not in p for p in pairs)


def test_boilerplate_strip_identity_property(spark):
    """Reassembly identity on BOTH chunker paths (zip_with k=2 and the
    generic slice path): with the doc-frequency cap above the corpus size
    nothing is hot, so clean_text must be the normalized token join and
    n_kept == n_chunks — for arbitrary token streams."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from era_parser_spark.operators.text import boilerplate_strip

    word = st.text(alphabet="abcXYZ09", min_size=1, max_size=6)

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.lists(word, min_size=1, max_size=17), min_size=1, max_size=5),
        st.sampled_from([2, 3]),
    )
    def check(docs, k):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in boilerplate_strip(
                df, "doc_id", "text", chunk_tokens=k, max_doc_freq=len(docs) + 1
            ).collect()
        }
        for i, toks in enumerate(docs):
            norm = [t.lower() for t in toks]
            assert out[i].clean_text == " ".join(norm)
            assert out[i].n_chunks == math.ceil(len(norm) / k)
            assert out[i].n_kept == out[i].n_chunks

    check()


def test_dim_inference_survives_malformed_first_row(spark):
    """The dim witness is the MODE of sizes, not the first row: a corpus
    whose physically first vector is the malformed one must keep the
    healthy majority, and empty/all-null inputs return empty typed
    frames instead of raising."""
    from era_parser_spark.operators.similarity import (
        all_pairs_topk,
        srp_signatures,
    )

    rows = [(0, [1.0])]  # malformed row FIRST
    rows += [(i, [float(i), 0.0, 1.0]) for i in range(1, 6)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    pairs = all_pairs_topk(df, "embedding", "vec_id", top_pairs=10,
                           candidates_per_pair=10).collect()
    ids = {i for r in pairs for i in (r.doc_a, r.doc_b)}
    assert ids == {1, 2, 3, 4, 5}  # healthy majority kept, row 0 dropped
    sigs = srp_signatures(df, "embedding", "vec_id").collect()
    assert {r.vec_id for r in sigs} == {1, 2, 3, 4, 5}
    # degenerate inputs: empty + all-null
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert srp_signatures(empty, "embedding", "vec_id").count() == 0
    assert all_pairs_topk(empty, "embedding", "vec_id", top_pairs=5,
                          candidates_per_pair=5).count() == 0
    nulls = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    assert srp_signatures(nulls, "embedding", "vec_id").count() == 0


def test_kmv_ignores_null_values(spark):
    from era_parser_spark.operators.sketch import kmv_distinct

    rows = [(1, "g"), (2, "g"), (None, "g"), (None, "h")]
    df = spark.createDataFrame(rows, "v long, g string")
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=8).collect()}
    # nulls are not values: g counts 2, the all-null group is absent —
    # matching the oracle's WHERE value IS NOT NULL
    assert out["g"].n_tracked == 2 and out["g"].est_distinct == 2.0
    assert "h" not in out


def test_boilerplate_strip_null_text_survives(spark):
    from era_parser_spark.operators.text import boilerplate_strip

    df = spark.createDataFrame(
        [(1, "real words here"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in boilerplate_strip(
        df, "doc_id", "text", chunk_tokens=2, max_doc_freq=10
    ).collect()}
    assert out[2].clean_text == "" and out[2].n_chunks == 1
    assert out[1].clean_text == "real words here"


def test_null_rows_across_kernels(spark):
    """One malformed row must never wedge or crash a kernel: knn top-k
    stays clean (a NaN at the heap root would wedge real neighbors out),
    simhash maps null text to the empty fingerprint, winnowing skips it."""
    from era_parser_spark.operators.dedup import simhash_fingerprints
    from era_parser_spark.operators.similarity import knn_join
    from era_parser_spark.operators.winnowing import winnowing_fingerprints

    vecs = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None), (4, [0.0, 1.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = knn_join(emb, emb.filter("vec_id = 1"), "embedding", "vec_id", k=3).collect()
    assert [r.nbr_id for r in sorted(out, key=lambda r: r.rnk)] == [2, 4]
    assert all(r.cosine_sim == r.cosine_sim for r in out)  # no NaN

    docs = spark.createDataFrame(
        [(1, "spark rows " * 10), (2, None)], "doc_id long, text string"
    )
    fps = {r.doc_id: r.simhash for r in
           simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert fps[2] == 0 and fps[1] != 0
    wn = winnowing_fingerprints(docs, "doc_id", "text").collect()
    assert {r.doc_id for r in wn} == {1}


def test_bpe_merges_roundtrip_hash_symbols(tmp_path):
    """A learned ('#','#') merge writes the line '# #'; the loader must
    keep it (only a first-line #version header is a comment) — a blanket
    '#' comment rule silently desynchronizes learned and applied tables."""
    from era_parser_spark.operators.tokenizer import (
        bpe_encode_word,
        load_merges,
        save_merges,
    )

    p = tmp_path / "merges.txt"
    save_merges([("#", "#"), ("a", "b")], str(p))
    ranks = load_merges(str(p))
    assert ranks == {("#", "#"): 0, ("a", "b"): 1}
    assert bpe_encode_word("##", ranks) == ["##"]


def test_kmeans_trainer_rejects_tiny_corpus(spark):
    import pytest as _pytest

    from era_parser_spark.operators.similarity import centroid_table

    one = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="stride"):
        centroid_table(one, "embedding", "vec_id", trainer="kmeans")


def test_stream_src_dir_repairs_dangling_link(spark, tmp_path):
    import os

    from era_parser_spark.queries.streaming_q import _stream_src_dir

    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "events.parquet").write_text("x")
    d = _stream_src_dir("tlink", str(sf))
    link = os.path.join(d, "events.parquet")
    assert os.path.exists(link)
    # break it: remove the target, leaving the link dangling
    os.remove(sf / "events.parquet")
    (sf / "events.parquet").write_text("y")
    out = _stream_src_dir("tlink", str(sf))
    assert os.path.exists(os.path.join(out, "events.parquet"))


def test_pii_redact_classes_and_nulls(spark):
    from era_parser_spark.operators.text import pii_redact

    rows = [
        (1, "mail a.b+c@ex-ample.org x"),
        (2, "srv 192.168.0.1 up"),
        (3, "call +44-20-7946-0958 now"),
        (4, None),
        (5, "a@b.co and 10.0.0.255 and +1-555-0100"),
        (6, "no pii here 1234 5.6"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(df, "doc_id", "text").collect()}
    assert out[1]["redacted_text"] == "mail <EMAIL> x"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 0)
    assert out[2]["redacted_text"] == "srv <IP> up"
    assert out[3]["redacted_text"] == "call <PHONE> now"
    assert out[4]["redacted_text"] == "" and out[4]["n_email"] == 0
    assert out[5]["redacted_text"] == "<EMAIL> and <IP> and <PHONE>"
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (1, 1, 1)
    assert out[6]["redacted_text"] == rows[5][1]


def test_domain_filter_threshold_and_blocklist(spark):
    from era_parser_spark.operators.curation import domain_reputation_filter

    rows = (
        [(i, "good.com", 500) for i in range(4)]
        + [(10 + i, "thin.com", 10) for i in range(4)]
        + [(20 + i, "spam.com", 900) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_chars long")
    out = domain_reputation_filter(
        df, "domain", "n_chars", min_avg_chars=100, blocked=("spam.com",)
    ).collect()
    assert {r["domain"] for r in out} == {"good.com"}
    assert len(out) == 4
    assert out[0]["domain_n_docs"] == 4 and out[0]["domain_avg_chars"] == 500


def test_fuzzy_dedup_keeps_min_id_per_cluster(spark):
    from era_parser_spark.operators.dedup import fuzzy_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = (
        [(i, base) for i in (7, 3, 11)]  # one 3-copy cluster, min id 3
        + [(i, f"unique text number {i} with words {i * 7} {i * 13} distinct") for i in range(20, 26)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fuzzy_dedup(df, "doc_id", "text").collect()}
    assert len(out) == 9
    for i in (3, 7, 11):
        assert out[i]["cluster_id"] == 3 and out[i]["cluster_sz"] == 3
        assert out[i]["kept"] == (i == 3)
    for i in range(20, 26):
        assert out[i]["cluster_sz"] == 1 and out[i]["kept"]
    assert sum(1 for r in out.values() if r["kept"]) == 7


def test_fuzzy_dedup_estimate_verify_matches_exact_on_clear_margins(spark):
    """verify='estimate' scores candidates by min-hash agreement — for
    exact copies (J=1, every min-hash equal) and clearly-distinct docs
    (J~0) the decision is deterministic and must equal the exact path."""
    from era_parser_spark.operators.dedup import fuzzy_dedup, lsh_estimate_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = (
        [(i, base) for i in (7, 3, 11)]
        + [(i, f"unique text number {i} with words {i * 7} {i * 13} distinct") for i in range(20, 26)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["doc_id"], r["cluster_id"], r["kept"])
        for r in fuzzy_dedup(df, "doc_id", "text").collect()
    }
    est = {
        (r["doc_id"], r["cluster_id"], r["kept"])
        for r in fuzzy_dedup(df, "doc_id", "text", verify="estimate").collect()
    }
    assert est == exact
    # identical docs agree on every one of the 32 min-hashes
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est"]
        for r in lsh_estimate_pairs(df, "doc_id", "text").collect()
    }
    assert pairs[(3, 7)] == 1.0 and pairs[(3, 11)] == 1.0
    assert not any(a >= 20 or b >= 20 for a, b in pairs)

    with pytest.raises(ValueError, match="verify"):
        fuzzy_dedup(df, "doc_id", "text", verify="nope")


def test_zorder_key_matches_reference_and_layout_is_range_disjoint(spark):
    from era_parser_spark.operators.layout import zorder_key, zorder_layout, zorder_py

    rows = [(x, y) for x in (0, 1, 5, 255, 40000, 70000) for y in (0, 2, 9, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(["x", "y"], 16).alias("z")).collect()
    for r in got:
        assert r["z"] == zorder_py((r["x"], r["y"]), 16), (r["x"], r["y"])

    laid = zorder_layout(df, ["x", "y"], bits=16, num_files=4)
    # The internal __zkey column is dropped from the output (callers persist
    # the result); recompute it from (x, y) to check range-disjointness.
    assert laid.columns == ["x", "y"]
    parts = (
        laid.select(
            F.expr("spark_partition_id()").alias("pid"),
            zorder_key(["x", "y"], 16).alias("z"),
        )
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]


def test_audio_energy_samples_windows_and_sign(spark):
    from era_parser_spark.operators.multimodal import audio_window_energy

    rows = [
        # "AB" -> one sample 0x4241 = 16961
        (1, bytearray(b"AB")),
        # 0x00 0xFF -> raw 0xFF00 = 65280 -> signed -256 -> abs 256
        (2, bytearray(b"\x00\xff")),
        # 130 samples of value 1 -> windows of 64/64/2
        (3, bytearray(b"\x01\x00" * 130)),
        # odd trailing byte dropped; single byte -> no rows
        (4, bytearray(b"Z")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = audio_window_energy(df, window_samples=64).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], {})[r["window_no"]] = r
    assert by[1][0]["n_samples"] == 1 and by[1][0]["sum_abs"] == 16961
    assert by[2][0]["peak_abs"] == 256
    assert [by[3][w]["n_samples"] for w in (0, 1, 2)] == [64, 64, 2]
    assert by[3][0]["sum_abs"] == 64 and by[3][2]["sum_abs"] == 2
    assert 4 not in by and 5 not in by


def test_shared_spans_maximal_positions_and_threshold(spark):
    from era_parser_spark.operators.dedup import shared_token_spans

    shared15 = " ".join(f"s{i}" for i in range(15))
    shared11 = " ".join(f"u{i}" for i in range(11))
    rows = [
        (1, "a0 a1 a2 a3 a4 " + shared15 + " b0 b1 b2 b3 b4"),
        (2, "c0 c1 c2 " + shared15 + " d0 d1 d2 d3 d4 d5 d6"),
        (3, "e0 e1 " + shared11 + " e2 e3 e4 e5 e6 e7 e8 e9"),
        (4, "f0 f1 " + shared11 + " f2 f3 f4 f5 f6 f7 f8 f9"),
        (5, "g0 g1 g2 g3 g4 g5 g6 g7 g8 g9 g10 g11 g12 g13"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = shared_token_spans(df, "doc_id", "text", l=8, min_span_tokens=12).collect()
    # exactly one maximal span, not a ladder of sub-spans
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (5, 3, 15)


def test_shared_spans_match_bruteforce_on_seeded_corpus(spark):
    """Differential check: engine spans == brute-force maximal equal-token
    runs, on a seeded corpus with planted motifs and tiny vocab (so runs
    arise naturally at many offsets and lengths)."""
    import random

    from era_parser_spark.operators.dedup import shared_token_spans

    rng = random.Random(407)
    vocab = [f"w{i}" for i in range(12)]
    motif = ["m0", "m1", "m2", "m3", "m4", "m5"]
    docs = {}
    for did in range(8):
        toks = [rng.choice(vocab) for _ in range(rng.randint(10, 40))]
        if did % 2 == 0:  # plant the motif in half the docs
            at = rng.randint(0, len(toks))
            toks[at:at] = motif
        docs[did] = toks

    L, MIN = 3, 4
    expect = set()
    for a in range(8):
        for b in range(a + 1, 8):
            A, B = docs[a], docs[b]
            for d in range(-len(B) + 1, len(A)):
                i, run = max(0, d), 0
                j = i - d
                while i <= len(A) and j <= len(B):
                    if i < len(A) and j < len(B) and A[i] == B[j]:
                        run += 1
                    else:
                        if run >= MIN:
                            expect.add((a, b, i - run, j - run, run))
                        run = 0
                    i += 1
                    j += 1

    df = spark.createDataFrame(
        [(did, " ".join(t)) for did, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_tokens"])
        for r in shared_token_spans(
            df, "doc_id", "text", l=L, min_span_tokens=MIN, max_doc_freq=10**6
        ).collect()
    }
    assert got == expect and len(expect) > 5


def test_intra_doc_strip_keeps_first_occurrence(spark):
    from era_parser_spark.operators.text import intra_doc_span_strip

    rows = [
        # "a b c" repeats: second occurrence (pos 3-5) stripped
        (1, "a b c a b c tail1 tail2"),
        # no repeats
        (2, "one two three four"),
        # pure repetition of one gram: everything after the first copy goes
        (3, "x y z x y z x y z"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in intra_doc_span_strip(df, "doc_id", "text", l=3).collect()}
    assert out[1]["clean_text"] == "a b c tail1 tail2"
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (8, 3)
    assert out[2]["clean_text"] == "one two three four" and out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "x y z" and out[3]["n_removed"] == 6
    assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 1


def test_zorder_layout_improves_second_column_pruning(spark, tmp_path):
    """The point of the z-layout: files carry tight min/max bounds on BOTH
    interleaved columns.  A predicate on the SECOND column alone prunes
    most z-ordered files but no pk-sorted files."""
    from era_parser_spark.operators.layout import zorder_layout
    from era_parser_spark.queries.registry import table
    from tests.conftest import SF_MED

    li = table(spark, SF_MED, "lineitem").select("l_partkey", "l_suppkey")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_layout(
        li, ["l_partkey", "l_suppkey"], num_files=16, rank_normalize=True
    ).drop("__zkey").write.parquet(zdir)
    li.repartitionByRange(16, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(ldir)

    def files_touched(path, lo, hi):
        bounds = (
            spark.read.parquet(path)
            .selectExpr("input_file_name() AS f", "l_suppkey")
            .groupBy("f")
            .agg(F.min("l_suppkey").alias("lo"), F.max("l_suppkey").alias("hi"))
            .collect()
        )
        assert len(bounds) == 16
        return sum(1 for b in bounds if b["hi"] >= lo and b["lo"] <= hi)

    z, lin = files_touched(zdir, 10, 20), files_touched(ldir, 10, 20)
    assert lin == 16          # pk-sorted: suppkey spread everywhere
    assert z <= lin // 2      # z-ordered: most files prunable on suppkey


def test_lang_id_pluggable_markers(spark, tmp_path):
    """An external wordlist (load_lang_markers) resolves docs the built-in
    10-word sets cannot, through the unchanged operator plan."""
    from era_parser_spark.operators.text import lang_id_col, load_lang_markers

    mk = tmp_path / "markers.txt"
    mk.write_text(
        "# frequency-derived wordlists\n"
        "en the of and however therefore\n"
        "nl het een niet aan ook\n"
        "nl maar voor zijn\n"
    )
    markers = load_lang_markers(str(mk))
    assert markers["nl"] == ("het", "een", "niet", "aan", "ook", "maar", "voor", "zijn")

    rows = [
        (1, "het een niet aan ook maar"),   # dutch: not in built-in sets
        (2, "however therefore the of"),
        (3, "zzz qqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    default = {r["doc_id"]: r["p"] for r in df.select("doc_id", lang_id_col("text").alias("p")).collect()}
    plugged = {r["doc_id"]: r["p"] for r in df.select("doc_id", lang_id_col("text", markers).alias("p")).collect()}
    assert default[1] == "und"      # built-in sets have no dutch
    assert plugged[1] == "nl"
    assert plugged[2] == "en" and plugged[3] == "und"


def test_fuzzy_dedup_matches_bruteforce_clusters(spark):
    """Differential: dd9's clusters == brute-force exact-Jaccard graph +
    union-find, on a seeded corpus of high-similarity cluster families
    (intra-cluster jaccard >= ~0.85 so LSH collision probability is
    ~1-3e-4 per pair — and xxhash64 is deterministic, so this either
    always passes or never does)."""
    import random

    rng = random.Random(1311)
    vocab = [f"v{i}" for i in range(200)]
    docs = {}
    did = 0
    for fam, copies in enumerate((3, 2, 4, 2)):
        base = [rng.choice(vocab) for _ in range(40)]
        for c in range(copies):
            toks = list(base)
            if c:  # perturb two tokens
                for _ in range(2):
                    toks[rng.randrange(40)] = rng.choice(vocab)
            docs[did] = toks
            did += 1
    for _ in range(8):  # singletons
        docs[did] = [rng.choice(vocab) for _ in range(30)]
        did += 1

    def shingles(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {d: shingles(t) for d, t in docs.items()}
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in docs:
        for b in docs:
            if a < b:
                inter = len(sh[a] & sh[b])
                uni = len(sh[a] | sh[b])
                if uni and inter / uni >= 0.5:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    labels = {d: find(d) for d in docs}
    sizes = {}
    for d, c in labels.items():
        sizes[c] = sizes.get(c, 0) + 1
    expect = {
        d: (labels[d], sizes[labels[d]], d == labels[d]) for d in docs
    }

    from era_parser_spark.operators.dedup import fuzzy_dedup

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_sz"], r["kept"])
        for r in fuzzy_dedup(df, "doc_id", "text").collect()
    }
    assert got == expect
    assert max(s for _, s, _ in expect.values()) == 4  # families really formed


def test_incremental_topk_equals_rescan_across_splits(spark):
    """topk(A∪B) == merge(topk(A), score(B)) for several split shapes,
    including a batch that displaces every carried row."""
    from era_parser_spark.operators.similarity import cosine_topk, incremental_topk
    from era_parser_spark.queries.registry import table
    from tests.conftest import SF_MED

    emb = table(spark, SF_MED, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    full = [tuple(r) for r in cosine_topk(emb, "embedding", "vec_id", q, k=7).collect()]
    for pred in (F.col("vec_id") % 3 == 0, F.col("vec_id") < 5, F.col("vec_id") >= 0):
        prev = cosine_topk(emb.filter(pred), "embedding", "vec_id", q, k=7)
        inc = incremental_topk(prev, emb.filter(~pred), "embedding", "vec_id", q, k=7)
        assert [tuple(r) for r in inc.collect()] == full


def test_incremental_near_dedup_kinds_and_no_old_pairs(spark):
    from era_parser_spark.operators.dedup import incremental_near_dedup

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    old = [(2, base), (4, base), (6, "completely different older text here now")]
    new = [(1, base), (3, base), (5, "fresh unique arrival nothing shared at all")]
    o = spark.createDataFrame(old, "doc_id long, text string")
    n = spark.createDataFrame(new, "doc_id long, text string")
    out = incremental_near_dedup(o, n, "doc_id", "text", threshold=0.5).collect()
    kinds = {(r["doc_a"], r["doc_b"]): r["pair_kind"] for r in out}
    # new-vs-old: each of 1,3 against each of 2,4 (doc_a is the new id)
    assert kinds[(1, 2)] == "new_old" and kinds[(3, 4)] == "new_old"
    assert kinds[(1, 4)] == "new_old" and kinds[(3, 2)] == "new_old"
    # new-vs-new: 1-3 once, ordered
    assert kinds[(1, 3)] == "new_new" and (3, 1) not in kinds
    # old-vs-old (2,4) must NOT be re-emitted; unrelated docs absent
    assert (2, 4) not in kinds and len(kinds) == 5
    assert all(r["jaccard"] == 1.0 for r in out)


def test_global_order_exact_ties_and_partition_independent(spark):
    from era_parser_spark.operators.curation import global_order

    rows = [(i, (i * 7) % 13) for i in range(300)]  # heavy ties
    df = spark.createDataFrame(rows, "doc_id long, score long")
    expect = {
        d: p + 1
        for p, (d, _) in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))
    }
    for frame in (df, df.repartition(11)):
        got = {
            r["doc_id"]: r["pos"]
            for r in global_order(frame, "score", "doc_id", n_buckets=8).collect()
        }
        assert got == expect


def test_global_order_null_key_fails_loudly(spark):
    import pytest

    from era_parser_spark.operators.curation import global_order

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, score long"
    )
    # wrapper type varies with session state (Py4JJavaError vs captured
    # SparkRuntimeException) — pin the message, not the class
    with pytest.raises(Exception, match="null in sort key"):
        global_order(df, "score", "doc_id", n_buckets=4).collect()


def test_ahash_pigeonhole_and_spam_guard(spark):
    from era_parser_spark.operators.multimodal import ahash_near_pairs, ahash_signatures

    same = b"A" * 30 + b"z" * 30
    near = b"A" * 30 + b"z" * 29 + b"Q"  # flips few grid bits
    # NOT bytes(range(60)): any "first half dark, second half bright"
    # payload aHashes identically to `same` — the hash captures the
    # pattern, not the values.  Alternate bright/dark instead.
    far = bytes([0, 255] * 30)
    rows = (
        [(1, bytearray(same)), (2, bytearray(same)), (3, bytearray(near)), (4, bytearray(far))]
        + [(100 + j, bytearray(b"spamspam" * 8)) for j in range(20)]
        + [(500, None), (501, bytearray(b""))]
    )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sigs = {r["media_id"]: r["ahash"] for r in ahash_signatures(df).collect()}
    assert sigs[1] == sigs[2] and 500 not in sigs and 501 not in sigs
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert 0 < ham13 <= 6

    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in ahash_near_pairs(df, max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == ham13
    assert (1, 4) not in pairs
    # spam cluster guarded out, genuine pairs survive
    guarded = {
        (r["media_a"], r["media_b"])
        for r in ahash_near_pairs(df, max_hamming=6, max_bucket=5).collect()
    }
    assert (1, 2) in guarded and not any(a >= 100 for a, _ in guarded)


def test_zorder_roundtrip_seeded():
    import random

    from era_parser_spark.operators.layout import zorder_decode_py, zorder_py

    rng = random.Random(99)
    for _ in range(500):
        ncols = rng.choice((2, 3))
        bits = rng.choice((8, 16)) if ncols == 2 else 8
        vals = tuple(rng.randrange(1 << bits) for _ in range(ncols))
        assert zorder_decode_py(zorder_py(vals, bits), ncols, bits) == vals


def test_retention_and_twa_hand_computed(spark, tmp_path):
    import datetime as dt
    import os

    from era_parser_spark.queries import load_all

    ts = lambda day, sec: dt.datetime(2024, 3, 1 + day, 0, 0, 0) + dt.timedelta(seconds=sec)
    rows = [
        # user 1: days 0 and 1; values 10.0 held 10s, 20.0 held 30s, tail
        (1, 1, ts(0, 0), "v", 10.0),
        (2, 1, ts(0, 10), "v", 20.0),
        (3, 1, ts(0, 40), "v", 99.0),
        (4, 1, ts(1, 0), "v", None),
        # user 2: day 0 only, single valued event -> no interval
        (5, 2, ts(0, 5), "v", 7.0),
        # user 3: first active day 3, returns day 10 (offsets vs own cohort)
        (6, 3, ts(3, 0), "v", 1.0),
        (7, 3, ts(10, 0), "v", 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    )
    d = str(tmp_path / "wh")
    ev.write.parquet(os.path.join(d, "events.parquet"))
    q, _ = load_all()

    ret = {r["cohort_date"].isoformat(): r for r in q["x16_retention_cohorts"](spark, d).collect()}
    assert ret["2024-03-01"]["n_users"] == 2
    assert ret["2024-03-01"]["d1"] == 1 and ret["2024-03-01"]["d3"] == 0
    assert ret["2024-03-04"]["n_users"] == 1 and ret["2024-03-04"]["d7"] == 1

    twa = {r["user_id"]: r for r in q["x17_time_weighted_avg"](spark, d).collect()}
    # user 1: (10*10 + 20*30 + 99*86360) / (10+30+86360) weighted by holds —
    # the day-1 null-value event is excluded, so 99.0 holds nothing beyond
    # the valued stream's last point... compute exactly:
    assert twa[1]["span_s"] == 40 and twa[1]["twa"] == (10 * 10 + 20 * 30) / 40
    assert 2 not in twa  # single interval-less user excluded
    assert twa[3]["twa"] == 1.0  # one held value across the whole span


def test_asof_nearest_directions_and_tiebreak(spark, tmp_path):
    import datetime as dt
    import os

    from era_parser_spark.queries import load_all

    t0 = dt.datetime(2024, 5, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (1, 1, s(0), "click", 1.0),
        (2, 1, s(10), "purchase", 0.0),   # back 10s vs fwd 5s -> forward
        (3, 1, s(15), "click", 2.0),
        (4, 1, s(20), "purchase", 0.0),   # back 5s vs fwd 5s -> tie: backward
        (5, 1, s(25), "click", 3.0),
        (6, 2, s(0), "purchase", 0.0),    # only a later click -> forward
        (7, 2, s(60), "click", 9.0),
        (8, 3, s(0), "purchase", 0.0),    # user has no clicks -> dropped
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    )
    d = str(tmp_path / "wh")
    ev.write.parquet(os.path.join(d, "events.parquet"))
    q, _ = load_all()
    out = {r["event_id"]: r for r in q["x18_asof_nearest"](spark, d).collect()}
    assert out[2]["direction"] == "forward" and out[2]["nearest_click_value"] == 2.0
    assert out[2]["delta_us"] == 5_000_000
    assert out[4]["direction"] == "backward" and out[4]["nearest_click_value"] == 2.0
    assert out[6]["direction"] == "forward" and out[6]["nearest_click_value"] == 9.0
    assert 8 not in out


def test_normalize_text_collapses_and_flags(spark):
    from era_parser_spark.operators.text import normalize_text

    rows = [
        (1, "Hello,   World!"),
        (2, "already clean"),
        (3, None),
        (4, "...!!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df, "doc_id", "text").collect()}
    assert out[1]["norm_text"] == "hello world" and out[1]["changed"]
    assert out[2]["norm_text"] == "already clean" and not out[2]["changed"]
    assert out[3]["norm_text"] == "" and not out[3]["changed"]
    assert out[4]["norm_text"] == "" and out[4]["changed"]


def test_containment_catches_embedded_doc(spark):
    from era_parser_spark.queries import load_all
    import os

    # build a mini warehouse: doc 1 fully embedded in doc 2 (jaccard low,
    # containment 1.0); doc 3 unrelated
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(30))
    rows = [(1, small, "en", "s", len(small)), (2, big, "en", "s", len(big)),
            (3, "totally different content entirely here now", "en", "s", 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    import tempfile
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    q, _ = load_all()
    out = {(r["doc_a"], r["doc_b"]): r for r in q["dd12_containment_pairs"](spark, d).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["containment"] == 1.0 and r["jaccard"] < 0.8
    assert not any(3 in p for p in out)


def test_html_strip_tags_entities_nulls(spark):
    from era_parser_spark.operators.text import html_strip

    rows = [
        (1, '<div id="x">Hello <b>world</b></div>'),
        (2, "a &lt;tag&gt; &amp; entity&nbsp;end"),
        (3, None),
        (4, "no markup at all"),
        # pre-escaped markup: "&amp;lt;" means the literal text "&lt;" and
        # must NOT double-decode to "<" (decode order: &amp; last)
        (5, "show &amp;lt;code&amp;gt; here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in html_strip(df, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "Hello world" and out[1]["n_tags"] == 4
    assert out[2]["clean_text"] == "a <tag> & entity end" and out[2]["n_tags"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_tags"] == 0
    assert out[4]["clean_text"] == "no markup at all"
    assert out[5]["clean_text"] == "show &lt;code&gt; here"


def test_lang_marker_table_rejects_empty_language(tmp_path):
    from era_parser_spark.operators.text import load_lang_markers

    good = tmp_path / "good.txt"
    good.write_text("# comment\nen the and of\nfr le la et\n")
    assert load_lang_markers(str(good))["en"] == ("the", "and", "of")

    bad = tmp_path / "bad.txt"
    bad.write_text("en the and\nzz\n")
    with pytest.raises(ValueError, match="zz"):
        load_lang_markers(str(bad))
