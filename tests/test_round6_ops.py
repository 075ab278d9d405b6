"""Semantic tests for the round-6 operators: corpus line dedup (t15),
URL stats (t16), TF-IDF cosine pairs (dd13), scene cuts (mm6),
train/val/test split (p9).  Fixture-level behavior the sf0.01 oracles
can't see (edge cases, guard behavior, determinism properties)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_MED


def test_line_dedup_keep_first_and_blank_lines(spark):
    from era_parser_spark.operators.text import line_dedup

    rows = [
        (1, "alpha\nshared line\n\nunique one"),
        (2, "shared line\nbeta\n\nunique two"),
        # duplicate only differs by case/whitespace -> same normalized line
        (3, "  SHARED LINE  \ngamma"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    # doc 1 owns the first occurrence of 'shared line'; 2 and 3 lose it
    assert out[1]["clean_text"] == "alpha\nshared line\n\nunique one"
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 4
    assert out[2]["clean_text"] == "beta\n\nunique two"
    assert out[2]["n_lines"] == 4 and out[2]["n_kept"] == 3
    # normalization matched, original casing of the KEPT copy is preserved
    assert out[3]["clean_text"] == "gamma"
    # null text -> one empty line, kept (blank lines never dedup)
    assert out[4]["clean_text"] == "" and out[4]["n_lines"] == 1 and out[4]["n_kept"] == 1


def test_line_dedup_intra_document_repeats(spark):
    from era_parser_spark.operators.text import line_dedup

    df = spark.createDataFrame(
        [(1, "same\nsame\nsame\nother")], "doc_id long, text string"
    )
    r = line_dedup(df, "doc_id", "text").first()
    assert r["clean_text"] == "same\nother"
    assert r["n_lines"] == 4 and r["n_kept"] == 2


def test_url_stats_extraction_and_host_normalization(spark):
    from era_parser_spark.operators.text import url_stats

    rows = [
        (1, "go to https://A.Example.com/x?q=1 or http://b.org:8080/y (see http://a.example.com)"),
        (2, "no links here"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in url_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_urls"] == 3
    assert out[1]["n_unique_domains"] == 2  # a.example.com (case-folded) + b.org
    assert out[1]["domains"] == "a.example.com,b.org"
    assert out[2]["n_urls"] == 0 and out[2]["domains"] == ""
    assert out[3]["n_urls"] == 0


def test_tfidf_cosine_identical_docs_score_one(spark):
    from era_parser_spark.operators.dedup import tfidf_cosine_pairs

    rows = [
        (1, "rare phrase rare phrase common"),
        (2, "rare phrase rare phrase common"),  # exact copy -> cosine 1.0
        (3, "totally different words entirely here common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r for r in tfidf_cosine_pairs(df, "doc_id", "text").collect()}
    assert out[(1, 2)]["cosine"] == 1.0
    # docs 1 and 3 share only 'common' (idf-damped): strictly smaller
    assert out.get((1, 3)) is None or out[(1, 3)]["cosine"] < 0.5


def test_tfidf_guard_drops_viral_terms_from_index_only(spark):
    from era_parser_spark.operators.dedup import tfidf_cosine_pairs

    # 'viral' appears in every doc; with max_doc_freq=2 it leaves the
    # index, so docs sharing ONLY 'viral' produce no pair at all
    rows = [(i, f"viral unique{i} word{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = tfidf_cosine_pairs(df, "doc_id", "text", max_doc_freq=2).collect()
    assert pairs == []
    # without the guard the pairs exist (dot > 0 through 'viral')
    pairs2 = tfidf_cosine_pairs(df, "doc_id", "text").collect()
    assert len(pairs2) == 10 and all(r["dot"] > 0 for r in pairs2)


def test_scene_cuts_threshold_and_short_payloads(spark):
    from era_parser_spark.operators.multimodal import scene_cuts

    flat = bytes([10] * 16)
    bright = bytes([200] * 16)
    rows = [
        # flat, flat, bright, flat: cuts at frame 2 and 3
        (1, bytearray(flat + flat + bright + flat)),
        (2, bytearray(flat * 3)),          # static -> no cuts
        (3, bytearray(flat)),              # single frame -> no diffs
        (4, bytearray(b"x" * 10)),         # shorter than one frame
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {(r["media_id"], r["cut_idx"]): r for r in scene_cuts(df, frame_bytes=16, threshold=200).collect()}
    assert set(out) == {(1, 2), (1, 3)}
    assert out[(1, 2)]["prev_energy"] == 160 and out[(1, 2)]["energy"] == 3200
    assert out[(1, 3)]["prev_energy"] == 3200 and out[(1, 3)]["energy"] == 160
    # exactly-at-threshold diff is NOT a cut (strict >)
    df2 = spark.createDataFrame(
        [(9, bytearray(flat + bytes([10] * 15 + [210])))],
        "media_id long, payload binary",
    )
    assert scene_cuts(df2, frame_bytes=16, threshold=200).count() == 0


def test_split_assign_fractions_and_determinism(spark):
    from era_parser_spark.operators.curation import split_assign

    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01
    # determinism: same assignment on a re-run and on a subset (no
    # leakage when the corpus grows)
    again = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}
    subset = {
        r["doc_id"]: r["split"]
        for r in split_assign(df.filter("doc_id < 1000"), "doc_id").collect()
    }
    for k, v in subset.items():
        assert again[k] == v

    with pytest.raises(ValueError, match="non-empty"):
        split_assign(df, "doc_id", [])
    with pytest.raises(ValueError, match="sum"):
        split_assign(df, "doc_id", [("a", 0.9), ("b", 0.3)])


def test_split_assign_remainder_falls_to_last_label(spark):
    from era_parser_spark.operators.curation import split_assign

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id", [("train", 0.5), ("rest", 0.1)])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    # 'rest' absorbs everything past the train threshold (0.5 + remainder)
    assert counts["train"] + counts["rest"] == 1000
    assert abs(counts["train"] / 1000 - 0.5) < 0.05


def test_bigram_lm_score_orders_fluent_above_shuffled(spark):
    """t17: text made of the corpus's common transitions must out-score
    text of the same tokens in an unseen order."""
    from era_parser_spark.operators.text import bigram_lm_score

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "mat the on sat cat the"))  # same tokens, rare transitions
    rows.append((200, "x"))                        # single token -> no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert out[0]["mean_prob"] > out[100]["mean_prob"]
    assert out[200]["n_bigrams"] == 0 and out[200]["mean_prob"] == 0.0
    # 'the cat' occurs 10x among 21 'the'-prefixed bigrams -> q = 1e6*10//21
    assert out[0]["n_bigrams"] == 5


def test_countmin_overestimates_and_is_exact_when_sparse(spark):
    from era_parser_spark.operators.sketch import countmin_sketch, estimate_countmin

    rows = [(v,) for v in ["a"] * 50 + ["b"] * 7 + ["c"] * 1]
    df = spark.createDataFrame(rows, "v string")
    cells = [(r["row"], r["col"], r["cnt"]) for r in countmin_sketch(df, "v").collect()]
    # 3 distinct values into 4x64 cells: no collisions, estimates exact
    assert estimate_countmin(cells, "a") == 50
    assert estimate_countmin(cells, "b") == 7
    assert estimate_countmin(cells, "c") == 1
    # never-seen value estimates >= 0 and never underestimates a seen one
    assert estimate_countmin(cells, "zzz") >= 0
    # mergeability: sketch of a union == cellwise sum of the two sketches
    df2 = spark.createDataFrame([("a",), ("d",)], "v string")
    c2 = {(r["row"], r["col"]): r["cnt"] for r in countmin_sketch(df2, "v").collect()}
    c1 = {(r, c): n for r, c, n in cells}
    both = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(df.unionByName(df2), "v").collect()
    }
    for key in set(c1) | set(c2):
        assert both[key] == c1.get(key, 0) + c2.get(key, 0)


def test_pq_codes_seeds_encode_to_themselves(spark):
    """s10: a vector that IS a codebook seed has distance 0 to its own
    code in every subspace — it must encode to its own id 4 times."""
    from era_parser_spark.operators.similarity import pq_codes

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    codes = pq_codes(emb, "embedding", "vec_id", dim=64, m=4, k=16, stride=25)
    seed_ids = [r["vec_id"] for r in emb.filter("vec_id % 25 = 0").orderBy("vec_id").limit(16).collect()]
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in codes.filter(F.col("vec_id").isin(seed_ids)).collect()
    }
    for sid in seed_ids:
        for j in range(4):
            assert got[(sid, j)] == sid, (sid, j)
    # every vector emits exactly m rows
    assert codes.count() == emb.count() * 4

    with pytest.raises(ValueError, match="divisible"):
        pq_codes(emb, "embedding", "vec_id", dim=63, m=4)


def test_trained_lang_id_separable_fixture_is_exact(spark):
    """t18's train/predict machinery: on a corpus whose languages have
    genuinely distinct character distributions, the trained trigram
    profiles must classify held-out documents perfectly; gibberish in
    no trained language falls to a language with SOME shared trigrams
    or 'und' when nothing matches."""
    from era_parser_spark.operators.text import trained_lang_id, train_lang_profiles

    en = "the quick brown fox jumps over the lazy dog and runs with them all day"
    de = "der schnelle braune fuchs springt ueber den faulen hund und laeuft mit ihnen"
    fr = "le rapide renard brun saute par dessus le chien paresseux et court avec eux"
    train_rows = []
    for i in range(20):
        train_rows += [
            (100 + i, en + f" variant {i}", "en"),
            (200 + i, de + f" variante {i}", "de"),
            (300 + i, fr + f" variante {i}", "fr"),
        ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string, lang string")
    profiles = train_lang_profiles(train, "text", "lang")
    test = spark.createDataFrame(
        [
            (1, "the lazy dog runs over the brown fox with all of them"),
            (2, "der faule hund springt ueber den schnellen braunen fuchs"),
            (3, "le chien paresseux court avec le renard brun rapide"),
            (4, "@@@@ ####"),  # no trained trigram at all
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in trained_lang_id(profiles, test, "doc_id", "text").collect()}
    assert out[1]["predicted_lang"] == "en"
    assert out[2]["predicted_lang"] == "de"
    assert out[3]["predicted_lang"] == "fr"
    assert out[4]["predicted_lang"] == "und" and out[4]["score"] == 0
    assert out[5]["predicted_lang"] == "und"
    # a real wordlist-free classifier: scores come from the MODEL, so
    # retraining without French must stop predicting it
    p2 = train_lang_profiles(train.filter("lang != 'fr'"), "text", "lang")
    out2 = {r["doc_id"]: r["predicted_lang"] for r in trained_lang_id(p2, test, "doc_id", "text").collect()}
    assert out2[3] != "fr"


def test_token_budget_cap_takes_whole_docs_until_budget(spark):
    from era_parser_spark.operators.curation import token_budget_cap

    rows = [
        ("s1", 1, 40), ("s1", 2, 40), ("s1", 3, 40),  # cum 40/80/120
        ("s2", 10, 100), ("s2", 11, 1),               # cum 100/101
        ("s3", 20, 0), ("s3", 21, 50),                # zero-token doc
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    out = {
        (r["source"], r["doc_id"]): r
        for r in token_budget_cap(df, "source", "doc_id", "n", budget=100).collect()
    }
    assert out[("s1", 1)]["kept"] and out[("s1", 2)]["kept"]
    assert not out[("s1", 3)]["kept"]  # would end at 120 > 100
    assert out[("s2", 10)]["kept"] and not out[("s2", 11)]["kept"]  # 101 > 100
    assert out[("s3", 20)]["kept"] and out[("s3", 21)]["kept"]
    assert out[("s1", 3)]["cum_tokens"] == 120

    # bucketed prefix sum must agree with a tiny bucket width that forces
    # cross-bucket carries
    small = {
        (r["source"], r["doc_id"]): (r["cum_tokens"], r["kept"])
        for r in token_budget_cap(
            df, "source", "doc_id", "n", budget=100, bucket_width=2
        ).collect()
    }
    big = {(k): (v["cum_tokens"], v["kept"]) for k, v in out.items()}
    assert small == big

    with pytest.raises(ValueError, match="budget"):
        token_budget_cap(df, "source", "doc_id", "n", budget=-1)


def test_bloom_filter_membership_and_packing(spark):
    """Bloom invariants: every member probes true (no false negatives),
    a disjoint probe set probes false at this load factor, and the packed
    words array is bit-for-bit the bit set."""
    from pyspark.sql import functions as F

    from era_parser_spark.operators.sketch import (
        bloom_bits,
        bloom_probe_sql,
        bloom_words,
    )

    m, k = 1 << 12, 4
    members = spark.createDataFrame([(f"val-{i}",) for i in range(50)], "v string")
    others = spark.createDataFrame([(f"other-{i}",) for i in range(50)], "v string")
    bits = bloom_bits(members, "v", m_bits=m, k=k)
    words = bloom_words(bits, m_bits=m)

    got_bits = sorted(r["bit"] for r in bits.collect())
    packed = words.collect()[0]["words"]
    assert len(packed) == m // 64
    unpacked = sorted(
        w * 64 + o for w, word in enumerate(packed) for o in range(64) if (word >> o) & 1
    )
    assert unpacked == got_bits

    probe = F.expr(bloom_probe_sql("words", "v", m_bits=m, k=k))
    hits_m = members.crossJoin(F.broadcast(words)).select(probe.alias("h")).collect()
    assert all(r["h"] for r in hits_m)  # no false negatives, ever
    hits_o = others.crossJoin(F.broadcast(words)).select(probe.alias("h")).collect()
    # 200 bits of 4096 set -> fp ~ (0.05)^4; 50 disjoint probes all miss
    assert not any(r["h"] for r in hits_o)


def test_bloom_decontaminate_flags_planted_quote(spark):
    """A train doc quoting the benchmark is flagged with full hit count;
    an unrelated doc is clean; a verbatim copy hits on every shingle."""
    from era_parser_spark.operators.dedup import bloom_decontaminate

    bench_text = "the seven secret benchmark questions nobody should train on ever"
    clean_text = "completely unrelated prose about gardening tools and soil quality"
    quoter = "intro words then " + bench_text + " trailing commentary here"
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, quoter), (2, clean_text), (3, bench_text)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(train, bench, "doc_id", "text", n=3).collect()
    }
    assert out[3]["contaminated"] and out[3]["n_hit"] == out[3]["n_shingles"]
    assert out[1]["contaminated"] and out[1]["n_hit"] >= 8  # the quoted span
    assert not out[2]["contaminated"] and out[2]["n_hit"] == 0
