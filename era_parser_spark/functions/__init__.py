"""Reusable column-level functions — the engine's expression library.

One flat namespace over the column functions that live next to their
operators, for users composing their own queries:

    from era_parser_spark import functions as EF
    df.select(EF.popcount_hex(F.col("bits")), EF.lang_id_col("text"))
"""

from era_parser_spark.operators.dedup import shingles_col, tokens_col
from era_parser_spark.operators.normalize import popcount_hex
from era_parser_spark.operators.similarity import (
    cosine_expr,
    dot_expr,
    lit_vector,
    norm_expr,
    sumsq_expr,
)
from era_parser_spark.operators.text import (
    fingerprint_col,
    lang_id_col,
    stopword_hits,
    token_count_col,
)

__all__ = [
    "tokens_col",
    "shingles_col",
    "popcount_hex",
    "token_count_col",
    "stopword_hits",
    "lang_id_col",
    "fingerprint_col",
    "dot_expr",
    "norm_expr",
    "sumsq_expr",
    "cosine_expr",
    "lit_vector",
]
