"""Winnowing fingerprint semantics: the guarantee is that any shared
substring of length >= w + k - 1 yields at least one shared fingerprint."""

from __future__ import annotations

from era_parser_spark.operators.winnowing import (
    _gram_hashes,
    overlap_pairs,
    winnow_text,
    winnowing_fingerprints,
)


def test_rolling_hash_matches_direct():
    text = "the quick brown fox jumps"
    k = 8
    rolled = _gram_hashes(text, k)
    B, M = 1_000_003, (1 << 61) - 1

    def direct(s):
        h = 0
        for ch in s:
            h = (h * B + ord(ch)) % M
        return h

    assert rolled == [direct(text[i : i + k]) for i in range(len(text) - k + 1)]


def test_winnow_deterministic_and_short_texts():
    assert winnow_text("", 8, 4) == set()
    assert winnow_text("short", 8, 4) == set()  # shorter than k
    assert len(winnow_text("exactly8", 8, 4)) == 1
    a = winnow_text("some document body " * 20)
    assert a == winnow_text("some document body " * 20)  # deterministic


def test_shared_substring_guarantee():
    import random

    rng = random.Random(7)
    shared = "this exact sentence is plagiarized verbatim across both documents"
    mk = lambda: " ".join(  # noqa: E731
        "".join(rng.choice("abcdefg") for _ in range(5)) for _ in range(40)
    )
    doc_a = mk() + " " + shared + " " + mk()
    doc_b = mk() + " " + shared + " " + mk()
    doc_c = mk()
    fa, fb, fc = (winnow_text(d, 8, 4) for d in (doc_a, doc_b, doc_c))
    assert fa & fb, "shared substring must share fingerprints"
    assert len(fa & fb) > len(fa & fc)


def test_spark_overlap_pairs(spark):
    base = "completely original filler words " * 10
    shared = "the copied passage that appears in two documents verbatim " * 3
    df = spark.createDataFrame(
        [
            (1, base + shared),
            (2, shared + "different tail content here " * 10),
            (3, "nothing in common with the others at all " * 12),
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(df, "doc_id", "text")
    assert fps.groupBy("doc_id").count().count() == 3
    pairs = {(r.doc_a, r.doc_b): r.shared for r in overlap_pairs(df, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
