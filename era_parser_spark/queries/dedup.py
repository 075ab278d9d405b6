"""Deduplication queries over `documents` (north-star extensions).

dd1/dd2 are oracle-checked (SQL-expressible); dd3/dd4 use engine-specific
hashing (xxhash64 / blake2b) with no DuckDB twin, so the driver records the
weaker rows-only check — their semantics are pinned down in tests/ instead
(LSH candidates vs exact Jaccard, SimHash vs brute-force Hamming).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from era_parser_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from era_parser_spark.operators.multimodal import documents_as_media, extract_media_features
from era_parser_spark.queries.registry import register, table

_TOK = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_TOK}) - 1), "
    f"i -> {_TOK}[i] || ' ' || {_TOK}[i+1] || ' ' || {_TOK}[i+2]))"
)


@register(
    "dd1_exact_dedup",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dd1_exact_dedup(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return dedup_exact(docs, "text", "doc_id").select("doc_id", "n_copies")


@register(
    "dd2_ngram_jaccard_topk",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id
         )
    SELECT doc_a, doc_b, inter,
           sa.nsh + sb.nsh - inter AS union_sz,
           CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def dd2_ngram_jaccard_topk(spark, sf_dir):
    # Exact 3-gram Jaccard near-dup, top-20 pairs (inverted-index self-join).
    docs = table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


@register("dd3_minhash_lsh")  # engine-specific hashing -> rows-only check
def dd3_minhash_lsh(spark, sf_dir):
    # MinHash(32 perms) + LSH(8 bands x 4 rows) candidates, exact-verified.
    docs = table(spark, sf_dir, "documents")
    return (
        minhash_lsh_dedup_pairs(docs, "doc_id", "text", num_perm=32, bands=8)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(100)
    )


@register("dd4_simhash")  # engine-specific hashing -> rows-only check
def dd4_simhash(spark, sf_dir):
    # SimHash near-dup pairs within Hamming distance 16 (banded blocking).
    docs = table(spark, sf_dir, "documents")
    return (
        simhash_near_pairs(docs, "doc_id", "text", max_hamming=16)
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(100)
    )


@register("mm1_binary_features")  # binary plumbing demo -> rows-only check
def mm1_binary_features(spark, sf_dir):
    # Multimodal plumbing: binary payload column -> Arrow-batched feature
    # extraction (deterministic fake decode; real codec gated on import).
    docs = table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return extract_media_features(media).orderBy("media_id")
