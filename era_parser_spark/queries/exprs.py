"""Shared expression helpers for oracle-stable aggregates.

Floating-point sums are order-dependent, and Spark's partition order differs
from DuckDB's scan order.  Routing double aggregates through DECIMAL makes
the accumulation exact (integer arithmetic), so both engines produce the
bit-identical DOUBLE after the final cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
DEC2 = "decimal(12,2)"

# Keep decimal aggregates at scale <= 4 and magnitude < ~9e11: the sum's
# integer representation then stays under 2^53, so casting the result to
# DOUBLE is a single exact rounding in BOTH engines.  (At scale 8, DuckDB's
# int128 -> double -> /10^scale cast rounds twice and drifts 1 ulp from
# Java's correctly-rounded BigDecimal.doubleValue.)


# DuckDB TRUNCATES on decimal->decimal scale reduction while Spark rounds
# HALF_UP, so scale-reducing casts are only allowed where the value is
# exactly representable at the target scale (then both are no-ops).
# double->decimal casts round-to-nearest in both engines and are safe.


def dec(col) -> Column:
    """Cast a double column to exact decimal for order-independent math."""
    return F.col(col).cast(DEC) if isinstance(col, str) else col.cast(DEC)


def dec2(col) -> Column:
    """Scale-2 decimal cast (money/rate inputs), keeps product scales low."""
    return F.col(col).cast(DEC2) if isinstance(col, str) else col.cast(DEC2)


def dsum(col) -> Column:
    """Exact (order-independent) sum of a double column, returned as double."""
    return F.sum(dec(col)).cast("double")


def davg(col) -> Column:
    """Exact average of a double column: exact decimal sum / count."""
    c = dec(col)
    return (F.sum(c).cast("double") / F.count(c)).cast("double")


def sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (
        f"CAST(CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / count(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
    )
