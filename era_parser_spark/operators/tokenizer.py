"""Pluggable real BPE tokenizer behind the regex token-count stand-in.

The engine's oracle path counts subword tokens with a lookahead-free regex
(`operators/text.py::BPE_PATTERN`) because that is exactly reproducible in
DuckDB.  Production data budgeting wants counts from the *actual* model
tokenizer; this module runs a real byte-pair-encoding merge loop from a
standard ``merges.txt``-style file (one merge per line, ``"left right"``,
rank = line order — the public GPT-2/HuggingFace format) behind the same
operator signatures, as an Arrow-batched pandas UDF.

Scale notes: the merges file is loaded ONCE per executor process (module
cache keyed by path+mtime) and never rides the closure; ship it to
executors with ``spark-submit --files`` on a real cluster.  The merge loop
is the genuinely imperative per-word kernel Python UDFs exist for, and a
per-batch word-level memo dedupes repeated words (natural text repeats
most words), so the loop runs once per distinct word per batch.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Merge loop operates on the pre-token pieces of the SAME regex the
# stand-in counts with, so swapping the tokenizer never changes what a
# "word" is — only how words split into subwords.
from era_parser_spark.operators.text import BPE_PATTERN

_RANKS_CACHE: dict[tuple[str, float], dict[tuple[str, str], int]] = {}


def load_merges(path: str) -> dict[tuple[str, str], int]:
    """Parse a merges.txt-style file -> {(left, right): rank}.

    Lines starting with ``#`` (the usual version header) and blank lines
    are skipped; rank is the surviving line index (lower merges first).
    """
    key = (os.path.abspath(path), os.path.getmtime(path))
    if key not in _RANKS_CACHE:
        ranks: dict[tuple[str, str], int] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                parts = line.split(" ")
                if len(parts) != 2:
                    continue
                ranks[(parts[0], parts[1])] = len(ranks)
        _RANKS_CACHE[key] = ranks
    return _RANKS_CACHE[key]


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE: repeatedly merge the lowest-rank adjacent pair."""
    symbols = list(word)
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    pattern: str = BPE_PATTERN,
    _memo: dict[str, int] | None = None,
) -> int:
    """Token count of `text` under the merge table (pre-tokenize, then
    merge within each piece).  `_memo` caches per-word subword counts."""
    n = 0
    for word in re.findall(pattern, text):
        if _memo is not None and word in _memo:
            n += _memo[word]
            continue
        c = len(bpe_encode_word(word, ranks))
        if _memo is not None:
            _memo[word] = c
        n += c
    return n


@lru_cache(maxsize=8)
def bpe_token_count_udf(merges_path: str):
    """Pandas UDF: text column -> real-BPE token count (int).

    The merges file is read lazily inside the task (first batch on each
    executor), so only the path string ships with the closure.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def count(texts):
        import pandas as pd

        ranks = load_merges(merges_path)
        memo: dict[str, int] = {}
        return pd.Series(
            [bpe_encode_text(str(t), ranks, _memo=memo) for t in texts],
            dtype="int32",
        )

    return count


def real_bpe_token_count_col(text_col: str | Column, merges_path: str) -> Column:
    """Drop-in for `text.bpe_token_count_col` backed by the real tokenizer."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return bpe_token_count_udf(merges_path)(c)
