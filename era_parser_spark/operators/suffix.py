"""Distributed suffix-array construction — prefix doubling (Manber-Myers
1990, the standard O(n log n) construction; public algorithm re-derived
for DataFrames).

Why it exists: dd10/dd16 approximate substring dedup with fixed-l grams;
a suffix array is the EXACT substring index those methods approximate
(Lee et al.'s deduplication pipeline builds one).  Prefix doubling is
the construction that survives distribution: every round is one
position-arithmetic EQUI-join plus one per-document window rank — no
suffix strings are ever materialized or compared, only integer rank
pairs, so a round's shuffle carries (doc, pos, rank) longs regardless of
token sizes.

Round k upgrades ranks from 2^k-token prefixes to 2^(k+1): each
position pairs its rank with the rank 2^k ahead — `lead(r, 2^k)` over
the document's position order, NOT a self-join: the lead shares the
dense_rank window's partitioning, so a round is two in-partition sorts
and zero extra exchanges (the join formulation re-shuffled on (doc,
pos) every round).  A missing lead (suffix end) becomes -1, which
orders a shorter suffix before any extension — exactly lexicographic
suffix order.  ceil(log2(max doc tokens)) rounds make every rank
distinct; the result is the suffix array as (doc, pos, suffix_rank)
with suffix_rank = 1..n_tokens per doc.

The per-round frame is localCheckpoint'ed (the CC-edges precedent) so
round k+1 does not recompute rounds 1..k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from era_parser_spark.operators.dedup import tokens_col


def suffix_ranks(
    df: DataFrame, id_col: str, text_col: str, return_history: bool = False
):
    """(id, pos, suffix_rank): rank of the token-level suffix starting at
    1-based position pos within its document, 1 = lexicographically
    smallest.  Whitespace/lowercase tokenization (`tokens_col`); suffix
    order compares TOKEN SEQUENCES element-wise (shorter prefix first) —
    the DuckDB oracle's list-slice ordering, ties impossible (suffixes
    of one document have distinct lengths)."""
    toks = (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col), tokens_col(F.col(text_col)).alias("__t"))
        .filter(F.size("__t") >= 1)
    )
    pos = toks.select(
        id_col,
        F.posexplode("__t").alias("__i0", "__tok"),
    ).select(id_col, (F.col("__i0") + 1).alias("pos"), "__tok")
    w = Window.partitionBy(id_col)
    cur = pos.select(
        id_col,
        "pos",
        F.dense_rank().over(w.orderBy("__tok")).alias("r"),
        F.max("pos").over(w).alias("__n"),
    ).localCheckpoint(eager=True)
    max_len = cur.agg(F.max("__n")).first()[0] or 1
    history = [(1, cur)]
    off = 1
    while off < max_len:
        # early stop: when every document's ranks are already distinct
        # (dense-rank max == n), the suffix order is fully determined and
        # no later level could separate anything — in real text this
        # triggers once 2^k exceeds the longest repeated span (typically
        # k ~ 3-4), not at log2(max doc length).  Sound for the LCP walk
        # too: all-distinct at prefix length `off` means every LCP is
        # < off, and levels 1..off are already in the history.
        all_distinct = (
            cur.groupBy(id_col)
            .agg((F.max("r") == F.max("pos")).alias("__ok"))
            .agg(F.min(F.col("__ok").cast("int")))
            .first()[0]
        )
        if all_distinct == 1:
            break
        paired = cur.select(
            id_col,
            "pos",
            "r",
            F.coalesce(
                F.lead("r", off).over(w.orderBy("pos")), F.lit(-1)
            ).alias("r2"),
            "__n",
        )
        cur = paired.select(
            id_col,
            "pos",
            F.dense_rank().over(w.orderBy("r", "r2")).alias("r"),
            "__n",
        ).localCheckpoint(eager=True)
        history.append((off * 2, cur))
        off *= 2
    out = cur.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.col("r").cast("long").alias("suffix_rank"),
    )
    if return_history:
        # [(L, (id, pos, r))]: ranks reflecting exactly L-token prefixes,
        # L = 1, 2, 4, ... >= max_len — the binary-decomposition tables
        # the LCP walk consumes.
        return out, history
    return out


def longest_repeated_span(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """EXACT longest repeated token span per document — the quantity
    t29's Gopher repetition ratios and dd10's fixed-l spans approximate.

    Suffix-array theory: the longest repeated substring is the maximum
    LCP over RANK-ADJACENT suffix pairs (any repeated span is a common
    prefix of two suffixes, and the closest pair in suffix order
    maximizes it).  The LCP of each adjacent pair is computed by the
    classic binary decomposition over the prefix-doubling rank tables:
    for L = 2^k descending, if the L-prefix ranks at the pair's current
    offsets are equal, add L and advance both offsets — O(log n) rounds,
    each ONE equi-join per side against the L-rank table on (doc,
    pos = start + lcp), shuffling (doc, pos, rank) longs only.  Token
    text never rides any shuffle, same as the construction.

    Output: (id, longest_repeat) for every tokenizable document, 0 when
    nothing repeats (incl. single-token docs).
    """
    ranks, history = suffix_ranks(df, id_col, text_col, return_history=True)
    w = Window.partitionBy(id_col)
    # rank-adjacent pairs: (start_i, start_j) of consecutive suffixes
    pairs = ranks.select(
        id_col,
        F.col("pos").alias("i"),
        F.lead("pos").over(w.orderBy("suffix_rank")).alias("j"),
        F.lit(0).cast("long").alias("lcp"),
    ).filter(F.col("j").isNotNull())
    for L, rk in sorted(history, key=lambda t: -t[0]):
        ra = rk.select(
            F.col(id_col).alias("__ida"),
            F.col("pos").alias("__pa"),
            F.col("r").alias("__ra"),
        )
        rb = rk.select(
            F.col(id_col).alias("__idb"),
            F.col("pos").alias("__pb"),
            F.col("r").alias("__rb"),
        )
        pairs = (
            pairs.join(
                ra,
                (F.col(id_col) == F.col("__ida"))
                & (F.col("__pa") == F.col("i") + F.col("lcp")),
                "left",
            )
            .join(
                rb,
                (F.col(id_col) == F.col("__idb"))
                & (F.col("__pb") == F.col("j") + F.col("lcp")),
                "left",
            )
            .select(
                id_col,
                "i",
                "j",
                F.when(
                    F.col("__ra").isNotNull() & (F.col("__ra") == F.col("__rb")),
                    F.col("lcp") + L,
                )
                .otherwise(F.col("lcp"))
                .alias("lcp"),
            )
            .localCheckpoint(eager=True)
        )
    per_doc = pairs.groupBy(id_col).agg(F.max("lcp").alias("longest_repeat"))
    # single-token docs have no adjacent pair; they still report 0
    all_docs = ranks.select(id_col).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("longest_repeat", F.lit(0)).cast("long").alias("longest_repeat"),
    )
