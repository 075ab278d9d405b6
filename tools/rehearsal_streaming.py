"""Streaming state-boundedness rehearsal: measured evidence that the
watermarked operators' state PLATEAUS while the stream grows without
bound — the property every "runs forever on a live ingest" claim in the
streaming tier rests on (st8 join, st10 dedup, st11 sessions).

Harness: a long synthetic event stream written as one parquet file per
micro-batch (maxFilesPerTrigger=1 keeps batch boundaries), event time
advancing ~1 hour per batch, and EVERY batch minting fresh keys — so
total distinct keys grow linearly while the watermark (delay 2 h) should
evict everything older than the trailing window.  After the run, the
query's recentProgress stateOperators give numRowsTotal per batch:

    bounded  <=> max/final state rows ~ keys in the trailing window,
                 NOT ~ total keys processed.

Usage: python tools/rehearsal_streaming.py [--batches 24 --keys 200]
Prints one JSON line; per-op records (batches, rows_in, state_max,
state_final, distinct_keys, bounded).  Solo-run it (bench rules apply).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def state_curve(query) -> list[int]:
    rows = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            rows.append(sum(int(o.get("numRowsTotal", 0)) for o in ops))
    return rows


def run_to_end(df, name: str, out: dict, key: str, distinct_keys: int,
               rows_in: int):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    curve = state_curve(q)
    emitted = df.sparkSession.sql(f"SELECT count(*) c FROM {name}").first()["c"]
    rec = {
        "batches_with_state": len(curve),
        "emitted_rows": int(emitted),
        "distinct_keys": distinct_keys,
        "state_max": max(curve) if curve else 0,
        "state_final": curve[-1] if curve else 0,
        "state_curve": curve,
        # bounded: the curve PLATEAUS (max reached by mid-stream, i.e.
        # eviction keeps pace with arrival) and sits far below the total
        # rows ingested — the unbounded failure mode is a curve that
        # tracks cumulative input (st4's keep-forever state would).
        "bounded": bool(curve)
        and max(curve) <= 1.1 * max(curve[: max(1, len(curve) // 2)])
        and max(curve) < rows_in / 2,
    }
    out[key] = rec
    print(f"{key}: max={rec['state_max']} final={rec['state_final']} "
          f"keys={distinct_keys} bounded={rec['bounded']}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--keys", type=int, default=200,
                    help="fresh keys minted per batch")
    ap.add_argument("--base", default=os.path.join(tempfile.gettempdir(),
                                                   "stream_rehearsal"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from era_parser_spark.session import get_spark
    from era_parser_spark.streaming.incremental import attribution_join

    spark = get_spark(app_name="stream_rehearsal")
    t0 = dt.datetime(2024, 1, 1)
    src = os.path.join(args.base, f"src_{args.batches}x{args.keys}")
    shutil.rmtree(src, ignore_errors=True)

    # batch b: event time ~ b hours; keys k_{b}_{i} are NEW every batch;
    # each key appears twice in its batch (in-batch duplicate for dedup),
    # once as a 'view' and once as a 'purchase' 10 min later (join fuel),
    # plus a second view 5 min later (session fuel).
    B, K = args.batches, args.keys
    rows = []
    for b in range(B):
        base = t0 + dt.timedelta(hours=b)
        for i in range(K):
            k = f"k{b}_{i}"
            rows.append((k, base, "view"))
            rows.append((k, base + dt.timedelta(minutes=5), "view"))
            rows.append((k, base + dt.timedelta(minutes=10), "purchase"))
    df_all = spark.createDataFrame(rows, "k string, ts timestamp, et string")
    for b in range(B):
        lo = t0 + dt.timedelta(hours=b)
        hi = lo + dt.timedelta(hours=1)
        df_all.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{b:04d}"))

    out: dict = {"batches": B, "keys_per_batch": K, "total_rows": len(rows)}

    def stream():
        return (
            spark.readStream.schema("k string, ts timestamp, et string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )

    # st10 shape: native watermark dedup — state should hold ~the keys of
    # the trailing (delay + batch) window, not all B*K keys.
    run_to_end(
        stream()
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k"),
        f"sr_dedup_{uuid.uuid4().hex[:8]}",
        out,
        "st10_watermark_dedup",
        distinct_keys=B * K,
        rows_in=len(rows),
    )

    # st11 shape: native session windows, APPEND mode — closed sessions
    # flush once the watermark passes their end; open-state ~ trailing
    # window.
    run_to_end(
        stream()
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "k")
        .agg(F.count(F.lit(1)).alias("n")),
        f"sr_sess_{uuid.uuid4().hex[:8]}",
        out,
        "st11_session_window",
        distinct_keys=B * K,
        rows_in=len(rows),
    )

    # st8 shape: watermarked stream-stream attribution join.
    views = (
        stream()
        .filter(F.col("et") == "view")
        .select(
            F.concat(F.col("k"), F.lit("_v")).alias("view_id"),
            F.col("k").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        stream()
        .filter(F.col("et") == "purchase")
        .select(
            F.concat(F.col("k"), F.lit("_p")).alias("purchase_id"),
            F.col("k").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.lit(1.0).alias("purchase_value"),
        )
    )
    run_to_end(
        attribution_join(views, purchases, window="1 hour", watermark="2 hours"),
        f"sr_join_{uuid.uuid4().hex[:8]}",
        out,
        "st8_stream_stream_join",
        distinct_keys=B * K,
        rows_in=len(rows),
    )

    # st12 shape: custom stateful windowFunnel — EXPECTED UNBOUNDED here:
    # funnel level is a lifetime-of-user fact (state = 3 longs per user
    # forever, the st4 keep-forever class; the TTL lever is documented in
    # funnel_monitor).  Measured so the growth CLASS is on record next to
    # the watermarked operators' plateaus, not assumed.
    from era_parser_spark.streaming.incremental import funnel_monitor

    ev = stream().select(
        F.xxhash64("k").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("event_id"),
        F.col("et").alias("event_type"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    run_to_end(
        funnel_monitor(ev),
        f"sr_funnel_{uuid.uuid4().hex[:8]}",
        out,
        "st12_window_funnel",
        distinct_keys=B * K,
        rows_in=len(rows),
    )

    # st14 shape: streaming sequenceCount — same keep-forever class as
    # st12 but the state is even smaller (2 ints: automaton stage +
    # chain count); growth must be exactly one row per distinct user.
    from era_parser_spark.streaming.incremental import sequence_count_monitor

    run_to_end(
        sequence_count_monitor(ev),
        f"sr_seqcnt_{uuid.uuid4().hex[:8]}",
        out,
        "st14_sequence_count",
        distinct_keys=B * K,
        rows_in=len(rows),
    )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
