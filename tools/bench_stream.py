"""Structured-Streaming throughput bench → STREAM_BENCH.json.

The batch side has BENCH/WRITE_BENCH artifacts; this measures the
STREAMING surface the same way — real micro-batched runs over the
sf0.1 events volume, wall-clocked end to end, one JSON line on stdout.

Scenarios (all availableNow-triggered over a drop dir of N_FILES flat
part files, one micro-batch per file via ``maxFilesPerTrigger=1`` —
the per-batch overhead is measured, not hidden behind one giant batch):

* ``tumbling_1h``   — watermarked tumbling-window counts/sums
                      (complete mode → memory sink)
* ``session_30m``   — native session windows per user
                      (complete mode → memory sink)
* ``dedup``         — ``dropDuplicatesWithinWatermark`` on event_id
                      (append mode → memory sink)
* ``scd1_merge``    — ``foreachBatch`` SCD1 upsert of customer batches
                      into a parquet target (the reference's daily
                      merge, expressed as a stream)

Reported per scenario: input rows, wall seconds, rows/sec, micro-batch
count, and peak state rows (from the final progress's stateOperators)
— state size is the number that decides whether a watermark config
survives an unbounded stream.

Scale: throughput here is single-node local[32]; the artifact's value
is (a) the ratio between scenarios (stateful window vs stateless
dedup vs foreachBatch write path) and (b) regression tracking of the
streaming surface round over round. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_stream.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bikes_data_warehouse_etl_spark.session import get_spark  # noqa: E402
from bikes_data_warehouse_etl_spark.streaming.pipeline import (  # noqa: E402
    session_window_counts,
    stream_events,
    streaming_dedup,
    windowed_event_counts,
    run_scd1_stream,
)

N_FILES = 16


def _flat_part_files(df, dest: str, n_files: int) -> int:
    """Write ``df`` as ``n_files`` flat .parquet files in ``dest``
    (file-stream sources ignore nested dirs, so part files are moved
    to the watched root). Returns the row count."""
    staging = tempfile.mkdtemp()
    df.repartition(n_files).write.mode("overwrite").parquet(staging)
    os.makedirs(dest, exist_ok=True)
    i = 0
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(staging, f), os.path.join(dest, f"part-{i:03d}.parquet")
            )
            i += 1
    shutil.rmtree(staging, ignore_errors=True)
    return i


def _drain(q) -> dict:
    q.awaitTermination()
    prog = q.recentProgress
    state_rows = 0
    for p in prog:
        for so in p.get("stateOperators") or []:
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
    return {
        "n_batches": sum(1 for p in prog if p.get("numInputRows", 0) > 0),
        "state_rows": state_rows,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    events_dir = os.path.join(work, "events")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_events = ev.count()
    _flat_part_files(ev, events_dir, N_FILES)

    scenarios: dict[str, dict] = {}

    def record(name: str, rows: int, wall: float, meta: dict) -> None:
        scenarios[name] = {
            "input_rows": rows,
            "wall_s": round(wall, 2),
            "rows_per_sec": int(rows / wall) if wall > 0 else None,
            **meta,
        }
        print(f"{name}: {rows} rows in {wall:.1f}s", file=sys.stderr)

    # 1. watermarked tumbling windows, complete mode
    t0 = time.perf_counter()
    q = (
        windowed_event_counts(stream_events(spark, events_dir))
        .writeStream.format("memory")
        .queryName("sb_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    meta = _drain(q)
    record("tumbling_1h", n_events, time.perf_counter() - t0, meta)

    # 2. native session windows, complete mode
    t0 = time.perf_counter()
    q = (
        session_window_counts(stream_events(spark, events_dir))
        .writeStream.format("memory")
        .queryName("sb_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    meta = _drain(q)
    record("session_30m", n_events, time.perf_counter() - t0, meta)

    # 3. streaming dedup, append mode
    t0 = time.perf_counter()
    q = (
        streaming_dedup(stream_events(spark, events_dir))
        .writeStream.format("memory")
        .queryName("sb_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    meta = _drain(q)
    record("dedup", n_events, time.perf_counter() - t0, meta)

    # 4. foreachBatch SCD1 merge of customer batches into parquet
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    n_cust = cust.count()
    cust_dir = os.path.join(work, "customer")
    n_batches = _flat_part_files(cust, cust_dir, 8)
    target = os.path.join(work, "scd1_target")
    ckpt = os.path.join(work, "scd1_ckpt")
    t0 = time.perf_counter()
    run_scd1_stream(
        spark, cust_dir, cust.schema, target, ["c_custkey"], ckpt
    )
    wall = time.perf_counter() - t0
    merged_rows = spark.read.parquet(target).count()
    record(
        "scd1_merge",
        n_cust,
        wall,
        {"n_batches": n_batches, "target_rows": merged_rows},
    )
    assert merged_rows == cust.select("c_custkey").distinct().count()

    shutil.rmtree(work, ignore_errors=True)
    doc = {
        "metric": "stream_bench",
        "unit": "rows_per_sec",
        "sf_dir": sf_dir,
        "n_events": n_events,
        "scenarios": scenarios,
    }
    print(json.dumps(doc))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAM_BENCH.json",
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
