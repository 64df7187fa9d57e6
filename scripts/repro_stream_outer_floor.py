"""Minimal repro: the ~3.5-4.6 s wall-time floor of
streaming_interval_join_outer is ENGINE micro-batch sequencing, not the
operator code.

The catalog entry joins ~46k events at sf0.1; this repro runs the SAME
stream-stream left-outer interval join shape on FOUR rows (one purchase,
one click, one sentinel pair) and prints the per-batch engine timings from
StreamingQuery.recentProgress. What the numbers show: wall time is fixed
lifecycle — query start, two stateful micro-batches each committing
2 state stores x N shuffle partitions, the watermark-driven NO-DATA
finalization batch that flushes the pending outer row, and stop — and is
unchanged when the input is 10,000x smaller than the bench entry's.

Run:  python scripts/repro_stream_outer_floor.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zio_analytics_spark.session import get_spark
from zio_analytics_spark.streaming.joins import interval_join
from zio_analytics_spark.tmpdirs import scratch_dir

t_all = time.perf_counter()
spark = get_spark("outer-floor-repro", extra_conf={"spark.sql.shuffle.partitions": "4"})
t_session = time.perf_counter() - t_all

src = scratch_dir(prefix="zas_floor_src_")
rows = spark.createDataFrame(
    [
        (1, 7, "purchase", "2024-01-01 10:00:00"),
        (2, 7, "click", "2024-01-01 09:30:00"),
        (3, 8, "purchase", "2024-01-01 10:00:00"),  # unmatched → outer row
    ],
    "event_id long, user_id long, event_type string, ts string",
).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
sentinel = spark.createDataFrame(
    [(-1, -1, "purchase", "2030-01-01 00:00:00"), (-2, -1, "click", "2030-01-01 00:00:00")],
    "event_id long, user_id long, event_type string, ts string",
).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))

t0 = time.perf_counter()
import os

rows.repartition(1).write.mode("append").parquet(src)
for name in os.listdir(src):
    os.utime(os.path.join(src, name), (time.time() - 20, time.time() - 20))
sentinel.repartition(1).write.mode("append").parquet(src)
t_source = time.perf_counter() - t0

stream = (
    spark.readStream.schema("event_id long, user_id long, event_type string, ts timestamp")
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
p = stream.where(F.col("event_type") == "purchase").select(
    F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
)
c = stream.where(F.col("event_type") == "click").select(
    F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
    F.col("ts").alias("c_ts"),
)
joined = interval_join(
    p, c, on=F.col("user_id") == F.col("c_user"),
    left_ts="p_ts", right_ts="c_ts", watermark="1 hour",
    lower="1 HOUR", upper="0 SECONDS", how="left_outer",
)
# NOTE the sentinel filter is NOT applied inside the streaming plan: a
# `user_id >= 0` before the sink is pushed below the watermark operator
# (and inferred onto the other side through the join key), so the
# sentinels would advance nothing — the trap the catalog entry documents;
# this repro filters on the SINK OUTPUT, like the entry.

t0 = time.perf_counter()
q = joined.writeStream.format("memory").queryName("floor_out").outputMode("append").start()
q.processAllAvailable()
# processAllAvailable covers available INPUT; the watermark-driven NO-DATA
# finalization batch that flushes pending outer rows can still be in
# flight — poll until the batch id stops moving (this wait is itself part
# of the floor being attributed)
last = -1
stable_since = time.perf_counter()
while time.perf_counter() - stable_since < 2.0:
    cur = q.lastProgress["batchId"] if q.lastProgress else -1
    if cur != last:
        last, stable_since = cur, time.perf_counter()
    time.sleep(0.1)
t_run = time.perf_counter() - t0
n_out = spark.sql("SELECT count(*) FROM floor_out WHERE user_id >= 0").collect()[0][0]

batches = []
for prog in q.recentProgress:
    d = prog if isinstance(prog, dict) else json.loads(prog.json)
    batches.append(
        {
            "batchId": d["batchId"],
            "rows_in": d.get("numInputRows", 0),
            "triggerExecution_ms": d["durationMs"].get("triggerExecution"),
            "addBatch_ms": d["durationMs"].get("addBatch"),
            "commit_ms": d["durationMs"].get("commitBatch", d["durationMs"].get("commitOffsets")),
            "state_rows": sum(
                s.get("numRowsTotal", 0) for s in d.get("stateOperators", [])
            ),
        }
    )
t0 = time.perf_counter()
q.stop()
t_stop = time.perf_counter() - t0
total = time.perf_counter() - t_all

print(json.dumps({
    "rows_joined": n_out,
    "session_start_sec": round(t_session, 2),
    "source_setup_sec": round(t_source, 2),
    "query_run_sec": round(t_run, 2),
    "stop_sec": round(t_stop, 2),
    "total_sec": round(total, 2),
    "batches": batches,
}, indent=1))
spark.stop()
