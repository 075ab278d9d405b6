"""Winnowing document fingerprints (rolling hash + window minima).

The classic local-fingerprinting scheme: hash every k-char gram with a
polynomial rolling hash, then keep the minimum hash in each window of w
consecutive grams (rightmost-min tie-break).  Any shared substring of
length >= w + k - 1 between two documents is guaranteed to share at least
one fingerprint — the basis of plagiarism/overlap detection at corpus
scale (fingerprints are tiny vs text; the overlap join is an inverted
index exactly like the shingle path).

Imperative sliding-window logic -> Arrow-batched mapInPandas.
"""

from __future__ import annotations

from collections import deque

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = 1_000_003
_M = (1 << 61) - 1


def _gram_hashes(text: str, k: int) -> list[int]:
    """Polynomial rolling hash of every k-gram in O(len(text))."""
    n = len(text)
    if n < k:
        return []
    h = 0
    power = pow(_B, k - 1, _M)
    out = []
    for i, ch in enumerate(text):
        h = (h * _B + ord(ch)) % _M
        if i >= k - 1:
            out.append(h)
            h = (h - ord(text[i - k + 1]) * power) % _M
    return out


def _winnow(hashes: list[int], w: int) -> set[int]:
    """Min per sliding window of w hashes via monotonic deque, O(n)."""
    if not hashes:
        return set()
    if len(hashes) <= w:
        return {min(hashes)}
    picked: set[int] = set()
    dq: deque[int] = deque()  # indices, increasing hash values
    for i, h in enumerate(hashes):
        while dq and hashes[dq[-1]] >= h:  # rightmost-min tie-break
            dq.pop()
        dq.append(i)
        if dq[0] <= i - w:
            dq.popleft()
        if i >= w - 1:
            picked.add(hashes[dq[0]])
    return picked


def winnow_text(text: str, k: int = 8, w: int = 4) -> set[int]:
    return _winnow(_gram_hashes(text.lower(), k), w)


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """(id, fingerprint) rows — the document's winnowed hash set."""
    from era_parser_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    def gen(it):
        for pdf in it:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:  # null text: no fingerprints, not 'None'
                    continue
                for h in winnow_text(str(text), k, w):
                    ids.append(did)
                    fps.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return df.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, fingerprint long")


def overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowed fingerprints, with the
    containment ratio (shared / min fingerprint-set size) — substring-level
    overlap detection, complementary to token-shingle Jaccard.

    `max_doc_freq` is the ubiquitous-fingerprint guard (same blowup as
    dd2's viral shingles: a fingerprint in f docs makes f^2 join rows, and
    boilerplate substrings are everywhere at corpus scale — on the sf0.1
    fixture it cuts the self-join from ~99M to ~1.3M rows).  Dropped
    fingerprints still count toward set sizes, so containment is a lower
    bound for affected pairs — standard practice, mirrored in wn1's SQL
    oracle."""
    fp = winnowing_fingerprints(df, id_col, text_col, k, w).cache()
    sizes = fp.groupBy(id_col).agg(F.count(F.lit(1)).alias("nfp"))
    joinable = fp
    if max_doc_freq is not None:
        hot = (
            fp.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
        )
        joinable = fp.join(hot.select("fingerprint"), "fingerprint", "left_anti")
    a = joinable.alias("a")
    b = joinable.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("nfp").alias("nfp_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("nfp").alias("nfp_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("containment", F.col("shared") / F.least("nfp_a", "nfp_b"))
        .select("doc_a", "doc_b", "shared", "containment")
    )
