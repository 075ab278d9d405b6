"""Similarity-search queries over `embeddings` (north-star extensions).

s1 is the exact brute-force baseline with a DuckDB oracle
(list_cosine_similarity); s2/s3 are the scale paths (IVF probe, blocked
all-pairs matmul) checked rows-only + against s1 in tests/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from era_parser_spark.operators.similarity import all_pairs_topk, cosine_topk, ivf_topk
from era_parser_spark.queries.registry import register, table


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    row = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


@register(
    "s1_cosine_topk",
    oracle="""
    SELECT vec_id,
           CAST(CAST(list_cosine_similarity(
             embedding::DOUBLE[],
             (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]
           ) AS DECIMAL(10,6)) AS DOUBLE) AS cosine_sim
    FROM embeddings
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def s1_cosine_topk(spark, sf_dir):
    # Exact cosine top-10 to the vec_id=0 embedding (brute-force baseline).
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, "embedding", "vec_id", _query_vec(spark, sf_dir, 0), k=10)


@register("s2_ann_ivf_topk")  # approximate -> rows-only check (recall in tests/)
def s2_ann_ivf_topk(spark, sf_dir):
    # IVF approximate top-10: deterministic centroids, probe 3 cells.
    emb = table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, "embedding", "vec_id", _query_vec(spark, sf_dir, 0), k=10, every=25, nprobe=3
    )


@register("s3_embedding_dup_pairs")  # numpy matmul path -> rows-only check
def s3_embedding_dup_pairs(spark, sf_dir):
    # Top-20 most-similar embedding pairs (near-dup by cosine), blocked matmul.
    emb = table(spark, sf_dir, "embeddings")
    return all_pairs_topk(emb, "embedding", "vec_id", top_pairs=20)
