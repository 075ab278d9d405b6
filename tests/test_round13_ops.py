"""Round-13 (optimization round 2) focused tests.

Differential pins for the optimizations and correctness fixes of this
round — every fast path must equal its reference path bit-for-bit.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- ivf_assign degenerate-centroid guards (round-13 ADVICE fixes) -----------


def _assign_key(r):
    d = r["centroid_dist"]
    return (
        r["vec_id"],
        r["centroid_id"],
        None if d is None else (math.isnan(d), d if not math.isnan(d) else 0.0),
    )


def test_ivf_assign_null_element_centroid_falls_back(spark):
    """A null ELEMENT inside a centroid vector must route the whole
    assignment through the expression path: np.array would silently read
    None as NaN, picking a different centroid than sq_l2_expr's SQL-null
    distance (the ADVICE counterexample: [None, 0.0] centroid)."""
    import era_parser_spark.operators.similarity as S

    df = spark.createDataFrame(
        [(1, [4.0, 0.0]), (2, [0.0, 0.0]), (3, [8.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [None, 0.0]), (1, [4.0, 0.0])],
        "centroid_id long, cvec array<double>",
    )
    fast = sorted(
        map(_assign_key, S.ivf_assign(df, "embedding", "vec_id", cents).collect())
    )
    expr = sorted(
        map(
            _assign_key,
            S._ivf_assign_expr(df, "embedding", "vec_id", cents).collect(),
        )
    )
    assert fast == expr
    # the expression semantics: the null-element centroid yields a NULL
    # distance, and array_min's struct order puts NULL dist FIRST — every
    # row must therefore land on centroid 0 with a NULL distance
    assert all(k[1] == 0 and k[2] is None for k in fast)


def test_ivf_assign_null_centroid_id_falls_back(spark):
    """A NULL centroid_id used to crash ivf_assign at plan-build time
    (TypeError sorting int vs None); it must fall back to the expression
    path like every other malformed centroid table."""
    import era_parser_spark.operators.similarity as S

    df = spark.createDataFrame(
        [(1, [4.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(None, [0.0, 0.0]), (7, [4.0, 0.0])],
        "centroid_id long, cvec array<double>",
    )
    fast = sorted(
        map(_assign_key, S.ivf_assign(df, "embedding", "vec_id", cents).collect())
    )
    expr = sorted(
        map(
            _assign_key,
            S._ivf_assign_expr(df, "embedding", "vec_id", cents).collect(),
        )
    )
    assert fast == expr
