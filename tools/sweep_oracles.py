"""Pre-driver correctness sweep: run every queries() entry against its
oracle_sql() at sf0.01 the way the driver does — row count, column-name
set, value equality over name-sorted columns — PLUS a type audit the
driver's hash is sensitive to (round-1 lesson: DuckDB HUGEINT vs Spark
BIGINT hash-mismatch with identical values).

Usage: python tools/sweep_oracles.py [sf_dir] [name_substring ...]
(exit 1 on any mismatch; extra args filter to matching query names)
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]

# DuckDB type -> the Spark dtype the driver would see after its own
# normalization; pairs NOT in this map are flagged for eyeballing.
OK_TYPE_PAIRS = {
    ("BIGINT", "bigint"),
    ("INTEGER", "int"),
    ("DOUBLE", "double"),
    ("VARCHAR", "string"),
    ("DATE", "date"),
    ("BOOLEAN", "boolean"),
    ("TIMESTAMP", "timestamp"),
    ("TIMESTAMP_NS", "timestamp_ntz"),
    # driver-verified tolerant pairs (CORRECTNESS_r01: e17/t1/t2/t5 passed
    # with BIGINT-vs-int, q3 with TIMESTAMP-vs-timestamp_ntz; only
    # HUGEINT- and DECIMAL-vs-int/double representations hash-mismatch)
    ("BIGINT", "int"),
    ("TIMESTAMP", "timestamp_ntz"),
}


def norm(v):
    if isinstance(v, float):
        # driver hashes bitwise; NaN != NaN breaks tuple compare
        return ("f", math.isnan(v), v)
    return v


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    Q, O = m.queries(), m.oracle_sql()
    bad: list[str] = []
    for name in sorted(Q):
        if ONLY and not any(s in name for s in ONLY):
            continue
        if name not in O:
            print(f"{name:28s} rows-only (no oracle)")
            continue
        try:
            sdf = Q[name](spark, SF)
            scols = sorted(sdf.columns)
            stypes = dict(sdf.dtypes)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect()
            )
            rel = con.sql(O[name])
            dcols_raw, dtypes_raw = list(rel.columns), list(rel.types)
            order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            dcols = [dcols_raw[i] for i in order]
            drows = sorted(
                tuple(norm(row[i]) for i in order) for row in rel.fetchall()
            )
        except Exception as exc:  # noqa: BLE001 - report and keep sweeping
            bad.append(name)
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
            continue
        probs = []
        if scols != dcols:
            probs.append(f"cols {scols} vs {dcols}")
        if len(srows) != len(drows):
            probs.append(f"rows {len(srows)} vs {len(drows)}")
        elif srows != drows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            probs.append(f"values differ at sorted row {diff}: {srows[diff]} vs {drows[diff]}")
        for i, c in enumerate(dcols_raw):
            dt, st = str(dtypes_raw[i]).upper(), stypes.get(c, "?")
            if (dt, st) not in OK_TYPE_PAIRS:
                probs.append(f"type {c}: duckdb {dt} vs spark {st}")
        if probs:
            bad.append(name)
            print(f"{name:28s} MISMATCH: " + "; ".join(probs))
        else:
            print(f"{name:28s} ok ({len(srows)} rows)")
        # entries that cache intermediates (fuzzy_dedup's reps/signature/
        # candidate frames) must not accumulate blocks across a 186-entry
        # sweep — same hygiene as tools/plan_lint.py (round-8 advice)
        spark.catalog.clearCache()
    print(f"\n{len(bad)} problem(s): {bad}" if bad else "\nALL GREEN")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
