"""Embedding similarity search over array<float> columns.

Two tiers, mirroring how ANN is actually deployed on big corpora:

* brute-force cosine top-k — exact baseline.  Pure JVM column expressions
  (zip_with + aggregate fold), so Catalyst/codegen runs it; per-row cost is
  O(dim) with no shuffle at all for a single query vector.
* IVF (inverted-file) — k centroids chosen deterministically, every vector
  assigned to its nearest centroid once (a broadcast nested-loop against a
  tiny centroid table); queries probe only the closest nprobe cells.  At
  100 TB the assignment is a single pass and each query touches ~nprobe/k
  of the data.  The vectors-vs-vectors pair search uses an Arrow-batched
  numpy matmul (block matrix multiply), not a per-row UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in doubles (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sumsq_expr(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(sumsq_expr(a))


def cosine_expr(a: Column, b: Column) -> Column:
    # Single sqrt over the product of squared norms (not sqrt(a)*sqrt(b)):
    # one fewer rounding, and self-similarity lands exactly on 1.0 — this is
    # also how DuckDB's list_cosine_similarity evaluates.
    return dot_expr(a, b) / F.sqrt(sumsq_expr(a) * sumsq_expr(b))


def lit_vector(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k against one query vector (brute-force baseline).

    The similarity is quantized through DECIMAL(10,6) — engines disagree on
    the last ulp of a float reduction, and the quantization (plus the id
    tie-break) makes the top-k deterministic — then surfaced as DOUBLE so
    the column representation is stable across engines.
    """
    emb = F.col(vec_col).cast("array<double>")
    q = lit_vector(query)
    return (
        df.select(
            F.col(id_col),
            cosine_expr(emb, q).cast("decimal(10,6)").cast("double").alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def ivf_assign(
    df: DataFrame, vec_col: str, id_col: str, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin).

    Centroids ride along as one literal array-of-structs — a broadcast in
    spirit, evaluated entirely in codegen; ties break on centroid id.
    """
    emb = F.col(vec_col).cast("array<double>")
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(emb, lit_vector(c), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(cid).alias("centroid_id"),
            )
            for cid, c in centroids
        ]
    )
    best = F.array_min(dists)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        best.getField("centroid_id").alias("centroid_id"),
        best.getField("dist").alias("centroid_dist"),
    )


def pick_centroids(
    df: DataFrame, vec_col: str, id_col: str, every: int
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seed: every `every`-th vector by id.

    (Stand-in for k-means training; the assignment/probe machinery is what
    matters for the engine.  Swap in Spark ML KMeans offline for quality.)
    """
    rows = (
        df.filter(F.col(id_col) % every == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    every: int = 25,
    nprobe: int = 3,
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest cells, brute inside."""
    centroids = pick_centroids(df, vec_col, id_col, every)
    q = np.asarray(query, dtype=np.float64)
    by_dist = sorted(
        centroids, key=lambda c: (float(np.sum((np.asarray(c[1]) - q) ** 2)), c[0])
    )
    probe_ids = [cid for cid, _ in by_dist[:nprobe]]
    assigned = ivf_assign(df, vec_col, id_col, centroids)
    emb = F.col(vec_col).cast("array<double>")
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .select(F.col(id_col), cosine_expr(emb, lit_vector(query)).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def all_pairs_topk(
    df: DataFrame, vec_col: str, id_col: str, top_pairs: int = 20, batch_topk: int = 8
) -> DataFrame:
    """Most-similar vector pairs via blocked matrix multiplication.

    The full (normalized) matrix broadcasts to every task; each Arrow batch
    computes sims for its rows against everything with one numpy matmul and
    keeps its local top candidates; a tiny global top-N finishes.  At scale
    the broadcast side becomes the IVF cell or an LSH bucket — the blocked
    matmul inner loop is the part that stays.
    """
    spark = df.sparkSession
    rows = df.select(id_col, vec_col).orderBy(id_col).collect()
    ids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        pos = {int(i): p for p, i in enumerate(all_ids)}
        k = batch_topk
        for pdf in it:
            row_ids = pdf[id_col].to_numpy(dtype=np.int64)
            if row_ids.size == 0:
                continue
            block_vecs = all_mat[[pos[int(i)] for i in row_ids]]
            sims = block_vecs @ all_mat.T
            # emit each pair once: mask out columns with id <= row id
            sims[all_ids[None, :] <= row_ids[:, None]] = -np.inf
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            vals = np.take_along_axis(sims, top, axis=1)
            keep = np.isfinite(vals)
            rows = np.repeat(row_ids, kk).reshape(-1, kk)
            yield pd.DataFrame(
                {
                    "doc_a": rows[keep].ravel(),
                    "doc_b": all_ids[top[keep].ravel()],
                    "cosine_sim": vals[keep].ravel(),
                }
            )

    cand = df.select(id_col).mapInPandas(block, "doc_a long, doc_b long, cosine_sim double")
    return cand.orderBy(F.desc("cosine_sim"), "doc_a", "doc_b").limit(top_pairs)
