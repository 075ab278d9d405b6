"""End-to-end training-data curation pipeline over `documents`.

This is the composition a real pretraining-data run executes: enrich with
token counts + language ID + content fingerprint, drop low-quality and
unidentifiable docs, exact-dedup on the normalized fingerprint keeping the
lowest doc_id (with the copy count carried along for provenance).

Every step is a pure JVM column expression or a digest-keyed aggregate, so
at 100 TB the only shuffle is (fingerprint, doc_id) pairs — document
payloads never move; near-dup clustering on top of this is dd5_dup_clusters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from era_parser_spark.operators.text import (
    bpe_token_count_col,
    fingerprint_col,
    lang_id_col,
    token_count_col,
)
from era_parser_spark.queries.registry import register, table
from era_parser_spark.queries.text import _lang_case_sql

_TOK = "regexp_split_to_array(trim(lower(text)), '\\s+')"


@register(
    "p1_curation_pipeline",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id,
             len({_TOK}) AS n_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+'))
               AS n_bpe_tokens,
             {_lang_case_sql()} AS predicted_lang,
             md5(array_to_string({_TOK}, ' ')) AS fingerprint
      FROM documents
    ),
    filt AS (
      SELECT * FROM enriched
      WHERE n_tokens BETWEEN 10 AND 100000 AND predicted_lang <> 'und'
    ),
    keep AS (
      SELECT fingerprint, min(doc_id) AS doc_id, count(*) AS n_copies
      FROM filt GROUP BY fingerprint
    )
    SELECT f.doc_id, f.predicted_lang, f.n_tokens, f.n_bpe_tokens,
           k.n_copies, f.fingerprint
    FROM keep k JOIN filt f
      ON f.doc_id = k.doc_id AND f.fingerprint = k.fingerprint
    """,
)
def p1_curation_pipeline(spark, sf_dir):
    # quality filter -> language filter -> fingerprint dedup (min-id
    # survivor, copy count kept) in one declarative plan.
    docs = table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        token_count_col("text").alias("n_tokens"),
        bpe_token_count_col("text").alias("n_bpe_tokens"),
        lang_id_col("text").alias("predicted_lang"),
        fingerprint_col("text").alias("fingerprint"),
    )
    filt = enriched.filter(
        F.col("n_tokens").between(10, 100000) & (F.col("predicted_lang") != "und")
    )
    keep = filt.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return keep.join(filt, ["fingerprint", "doc_id"]).select(
        "doc_id", "predicted_lang", "n_tokens", "n_bpe_tokens", "n_copies", "fingerprint"
    )
