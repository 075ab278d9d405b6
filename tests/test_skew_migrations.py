from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_MED


def test_salted_join_equivalence(spark):
    from era_parser_spark.operators.skew import salted_join, top_hot_keys

    # skewed probe: one hot key with most of the rows
    probe = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 8, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("dim_val")
    )

    plain = probe.join(build, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(probe, build, "k", salt_factor=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    left = salted_join(probe, build.filter("k < 50"), "k", salt_factor=4, how="left")
    assert left.count() == probe.count()  # left join preserves probe rows
    assert left.filter(F.col("dim_val").isNull()).count() == probe.filter(
        ~((F.col("k") < 50))
    ).count()

    hot = top_hot_keys(probe, "k", n=1).first()
    assert hot.k == 1  # diagnosis finds the hot key

    with pytest.raises(ValueError):
        salted_join(probe, build, "k", how="full_outer")


def test_migration_runner(spark, tmp_path):
    from era_parser_spark.state.migrations import (
        Migration,
        MigrationRunner,
        add_column_migration,
    )

    from era_parser_spark.queries.registry import table

    wh = str(tmp_path / "wh")
    table(spark, SF_MED, "events").limit(100).write.parquet(f"{wh}/events")

    migs = [
        Migration(1, "add_quality_flag", add_column_migration("events", "quality_ok", "boolean", True)),
        Migration(2, "add_source_tag", add_column_migration("events", "source_tag", "string", "v1")),
    ]
    runner = MigrationRunner(spark, wh, migs)
    assert [m["status"] for m in runner.status()] == ["pending", "pending"]

    assert runner.run() == [1, 2]
    assert [m["status"] for m in runner.status()] == ["applied", "applied"]
    df = spark.read.parquet(f"{wh}/events")
    assert df.filter(F.col("quality_ok")).count() == 100
    assert df.select("source_tag").first()[0] == "v1"

    # idempotent: second run applies nothing
    assert runner.run() == []

    # a later migration joins the sequence and only it runs
    migs.append(Migration(3, "add_score", add_column_migration("events", "score", "double", 0.0)))
    runner2 = MigrationRunner(spark, wh, migs)
    assert runner2.run() == [3]
    assert "score" in spark.read.parquet(f"{wh}/events").columns

    with pytest.raises(ValueError):
        MigrationRunner(spark, wh, [Migration(1, "a", migs[0].apply), Migration(1, "b", migs[0].apply)])
