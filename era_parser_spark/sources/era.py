"""Era-file Spark source: binary e2store archives -> typed blocks DataFrame.

Pipeline (reference lifecycle §3.1, rebuilt Spark-shaped):
  spark.read.format("binaryFile")      one row per era file, one task per file
    -> mapInPandas(parse kernel)       snappy + SSZ decode inside each task,
                                       Arrow-batched, JSON out
    -> from_json(BLOCK_SCHEMA)         JVM-side typing into the fork-superset
                                       struct (earlier forks leave nulls)

Scale model: one era file (= 8192 slots, hundreds of MB) is one task; a
100 TB archive is ~hundreds of thousands of files, so parallelism scales
with the file count and no stage shuffles raw payloads.  Column pruning is
pushed into the SSZ layer via `tables=`/`body_include=` — the scan only
decodes the body fields the requested tables need (the reference always
decodes everything).

The Spark schema is GENERATED from the SSZ schema (one source of truth).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from era_parser_spark.config.networks import detect_network, parse_era_filename
from era_parser_spark.parsing import ssz
from era_parser_spark.parsing.beacon import BODY_SCHEMAS, block_schema
from era_parser_spark.parsing.e2store import iter_block_payloads
from era_parser_spark.parsing.beacon import parse_block

# body fields each normalized table needs (drives pruned decode)
TABLE_BODY_FIELDS: dict[str, set[str]] = {
    "blocks": {"eth1_data", "graffiti", "randao_reveal"},
    "sync_aggregates": {"sync_aggregate"},
    "execution_payloads": {"execution_payload"},
    "transactions": {"execution_payload"},
    "withdrawals": {"execution_payload"},
    "attestations": {"attestations"},
    "deposits": {"deposits"},
    "voluntary_exits": {"voluntary_exits"},
    "proposer_slashings": {"proposer_slashings"},
    "attester_slashings": {"attester_slashings"},
    "bls_changes": {"bls_to_execution_changes"},
    "blob_commitments": {"blob_kzg_commitments"},
    "deposit_requests": {"execution_requests"},
    "withdrawal_requests": {"execution_requests"},
    "consolidation_requests": {"execution_requests"},
}
ALL_TABLES = tuple(TABLE_BODY_FIELDS)


def ssz_to_spark(t: ssz.SSZType) -> T.DataType:
    """Spark type from an SSZ type (the schema single-source-of-truth)."""
    if isinstance(t, ssz.Uint):
        return T.LongType() if t.bits <= 64 else T.StringType()
    if isinstance(t, (ssz.ByteVector, ssz.ByteList, ssz.Bitvector, ssz.Bitlist)):
        return T.StringType()
    if isinstance(t, (ssz.List, ssz.Vector)):
        return T.ArrayType(ssz_to_spark(t.elem), True)
    if isinstance(t, ssz.Container):
        return T.StructType(
            [T.StructField(n, ssz_to_spark(ft), True) for n, ft in t.fields]
        )
    raise TypeError(f"no spark mapping for {type(t)}")


# The electra body is the superset of every fork's fields.
BODY_SPARK_SCHEMA: T.StructType = ssz_to_spark(BODY_SCHEMAS["electra"])
BLOCK_SPARK_SCHEMA: T.StructType = ssz_to_spark(block_schema("electra"))

_PARSE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("network", T.StringType(), False),
        T.StructField("era_number", T.LongType(), False),
        T.StructField("slot", T.LongType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("timestamp_sec", T.LongType(), False),
        T.StructField("compressed_size", T.LongType(), True),
        T.StructField("decompressed_size", T.LongType(), True),
        T.StructField("json", T.StringType(), False),
    ]
)


def _local_path(path: str) -> str | None:
    """Filesystem path if the URI is local, else None."""
    if path.startswith("file:"):
        return path[len("file:"):]
    if "://" not in path:
        return path
    return None


def _parser(
    network: str | None,
    body_include: set[str] | None,
    on_error: str = "skip",
    batch_rows: int = 2048,
):
    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        cols = [f.name for f in _PARSE_OUT_SCHEMA.fields]
        for pdf in it:
            rows: list[tuple] = []
            has_content = "content" in pdf.columns
            for i, path in enumerate(pdf["path"]):
                if has_content:
                    content = pdf["content"].iloc[i]
                else:
                    # paths-only mode: the task opens its own file, so era
                    # bytes never ride through Arrow/pandas (one era file
                    # can be hundreds of MB)
                    with open(_local_path(str(path)), "rb") as f:
                        content = f.read()
                net = network or detect_network(str(path))
                meta = parse_era_filename(str(path))
                n_bad = 0
                for slot, payload in iter_block_payloads(bytes(content)):
                    try:
                        parsed = parse_block(payload, net, body_include=body_include)
                    except Exception as exc:  # noqa: BLE001
                        # per-block error isolation (the reference defaults
                        # bad fields rather than failing the era); one
                        # corrupt block must not kill a 100 TB job
                        if on_error == "fail":
                            raise
                        n_bad += 1
                        print(
                            f"era_parser_spark: skipping slot {slot} in {path}: "
                            f"{type(exc).__name__}: {exc}",
                            file=sys.stderr,
                        )
                        continue
                    rows.append(
                        (
                            str(path),
                            net,
                            meta["era_number"] if meta else slot // 8192,
                            slot,
                            parsed["version"],
                            parsed["timestamp_utc"],
                            parsed["metadata"]["compressed_size"],
                            parsed["metadata"]["decompressed_size"],
                            json.dumps(parsed["data"], separators=(",", ":")),
                        )
                    )
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if n_bad:
                    print(
                        f"era_parser_spark: {n_bad} unparseable block(s) skipped in {path}",
                        file=sys.stderr,
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return parse


def read_era_blocks(
    spark: SparkSession,
    paths: str | list[str],
    network: str | None = None,
    tables: list[str] | None = None,
    body_include: set[str] | None = None,
    glob: str | None = None,
    on_error: str = "skip",
) -> DataFrame:
    """Era files -> blocks DataFrame (typed, fork-superset body struct).

    `tables` prunes the SSZ decode to only the body fields those normalized
    tables need; `glob` filters file names (A6 glob_batch_source);
    `on_error='skip'` isolates per-block parse failures (logged + counted
    on executor stderr), `'fail'` surfaces them.
    """
    from era_parser_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    if tables is not None and body_include is None:
        body_include = set()
        for t in tables:
            body_include |= TABLE_BODY_FIELDS[t]
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    binary = reader.load(paths)
    # Local files: distribute paths only and open inside the task — era
    # bytes never cross the JVM->Arrow->pandas boundary.  Remote schemes
    # (s3a/hdfs/...) keep binaryFile's content column (the JVM filesystem
    # layer owns credentials/retries there).
    first = binary.select("path").first()
    local = first is not None and _local_path(str(first["path"])) is not None
    src = binary.select("path") if local else binary.select("path", "content")
    parsed = src.mapInPandas(
        _parser(network, body_include, on_error), _PARSE_OUT_SCHEMA
    )
    block = F.from_json("json", BLOCK_SPARK_SCHEMA)
    return parsed.select(
        "network",
        "era_number",
        "slot",
        "version",
        F.timestamp_seconds("timestamp_sec").alias("timestamp_utc"),
        block.getField("message").getField("proposer_index").alias("proposer_index"),
        block.getField("message").getField("parent_root").alias("parent_root"),
        block.getField("message").getField("state_root").alias("state_root"),
        block.getField("signature").alias("signature"),
        block.getField("message").getField("body").alias("body"),
        "compressed_size",
        "decompressed_size",
        "path",
    )


def era_file_inventory(
    spark: SparkSession,
    paths: str | list[str],
    glob: str | None = None,
    with_md5: bool = False,
) -> DataFrame:
    """(path, era_number, network, size[, md5]) listing — the planning-side
    view (A6): feed this to state.plan_pending for incremental runs.
    with_md5 adds the file-content hash the reference tracks per era (D9,
    era_state_manager.py:477-485) — it reads every byte, so keep it off for
    pure planning."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    cols = ["path", "length"] + (["content"] if with_md5 else [])
    files = reader.load(paths).select(*cols)
    era_re = r"([a-z0-9]+)-(\d{5})-([0-9a-f]+)\.era$"
    out = files.select(
        "path",
        F.regexp_extract("path", era_re, 1).alias("network"),
        F.regexp_extract("path", era_re, 2).cast("long").alias("era_number"),
        F.col("length").alias("size_bytes"),
        *([F.md5("content").alias("file_md5")] if with_md5 else []),
    )
    return out


def scan_stats(df: DataFrame) -> DataFrame:
    """A5 era_stats as a DataFrame op: blocks + slot range per era file."""
    return df.groupBy("path", "network", "era_number").agg(
        F.count(F.lit(1)).alias("block_count"),
        F.min("slot").alias("min_slot"),
        F.max("slot").alias("max_slot"),
        F.countDistinct("version").alias("fork_count"),
    )


def lookup_block(df: DataFrame, slot: int) -> DataFrame:
    """Point lookup (§3.3): slot equality predicate; with parquet-backed
    tables this prunes via min/max stats rather than a linear rescan."""
    return df.filter(F.col("slot") == slot)
