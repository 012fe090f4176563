"""Structured Streaming: windowed counts match the batch twin; the
foreachBatch SCD1 sink upserts across micro-batches."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.streaming.pipeline import (
    run_scd1_stream,
    run_windowed_counts_to_memory,
)


def test_streaming_window_counts_equal_batch(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events_in")
    os.makedirs(events_dir)
    shutil.copy(f"{sf_dir}/events.parquet", events_dir)

    run_windowed_counts_to_memory(spark, events_dir, table="wc_test")
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.table("wc_test").collect()
    }
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in QUERIES["events_tumbling"].spark(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_stream_stream_join_matches_batch_pairs(spark, sf_dir, tmp_path):
    """The watermarked stream-stream interval join must emit exactly
    the pair set of the batch predicate (inner matches emit on
    arrival, so one availableNow drain sees them all — no watermark
    finalization wait, unlike append-mode window tests)."""
    from bikes_data_warehouse_etl_spark.sources.parquet import read_table
    from bikes_data_warehouse_etl_spark.streaming.pipeline import (
        run_stream_stream_join_to_memory,
    )

    events_dir = str(tmp_path / "ssj_in")
    os.makedirs(events_dir)
    shutil.copy(f"{sf_dir}/events.parquet", events_dir)
    run_stream_stream_join_to_memory(spark, events_dir, table="ssj_test")
    stream_pairs = {tuple(r) for r in spark.table("ssj_test").collect()}

    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.unix_timestamp("ts").cast("long").alias("v_es"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
    )
    batch_pairs = {
        tuple(r)
        for r in p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_es") > F.col("es") - 3600)
            & (F.col("v_es") <= F.col("es")),
        )
        .select("event_id", "user_id", "es", "v_es", "v_cents")
        .collect()
    }
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0


def test_scd1_stream_upserts_across_batches(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("v", StringType(), True),
        ]
    )
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # two files → two micro-batches (maxFilesPerTrigger=1); batch 2
    # updates k=2 and inserts k=3
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.parquet(
        src + "/b1"
    )
    spark.createDataFrame([(2, "b2"), (3, "c")], schema).coalesce(1).write.parquet(
        src + "/b2"
    )
    # flatten: move part files into src root with ordered names
    i = 0
    for sub in ["b1", "b2"]:
        for f in sorted(os.listdir(f"{src}/{sub}")):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{sub}/{f}", f"{src}/{i:03d}.parquet")
                i += 1
        shutil.rmtree(f"{src}/{sub}")

    run_scd1_stream(spark, src, schema, tgt, ["k"], ckpt)
    final = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert final[1] == "a" and final[3] == "c"
    assert final[2] in ("b", "b2")  # file order decides which batch won
    assert len(final) == 3


def test_stream_static_dim_enrichment(spark, sf_dir, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension frame (no watermark needed — the static side is fully
    known per micro-batch, and broadcasts). The per-type totals must
    equal the batch join's."""
    from bikes_data_warehouse_etl_spark.streaming.pipeline import stream_events

    events_dir = str(tmp_path / "enrich_in")
    os.makedirs(events_dir)
    shutil.copy(f"{sf_dir}/events.parquet", events_dir)

    type_dim = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 10), ("signup", 5)],
        "event_type string, weight long",
    )
    enriched = (
        stream_events(spark, events_dir)
        .join(F.broadcast(type_dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("weight").alias("weight_sum"),
        )
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_type"]: (r["n"], r["weight_sum"])
        for r in spark.table("enrich_test").collect()
    }
    want = {
        r["event_type"]: (r["n"], r["weight_sum"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .join(type_dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("weight").alias("weight_sum"),
        )
        .collect()
    }
    assert got == want and len(got) >= 3


def test_ingest_dedup_stream_classifies_across_batches(spark, tmp_path):
    """Continuous ingest dedup: batch 1 seeds the corpus; batch 2's
    exact replay of a batch-1 text is dup_of_base, its internal twin
    pair keeps one doc, and the corpus ends with exactly the distinct
    texts (streaming twin of incremental_dedup_ingest)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bikes_data_warehouse_etl_spark.streaming.pipeline import (
        run_ingest_dedup_stream,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("source", StringType(), True),
            StructField("text", StringType(), True),
        ]
    )
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    b1 = [(1, "s", "alpha text"), (2, "s", "beta text")]
    b2 = [
        (3, "s", "alpha text"),   # dup_of_base
        (4, "s", "gamma text"),   # novel keeper
        (5, "s", "gamma text"),   # intra_batch_dup
    ]
    for sub, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/{sub}"
        )
    i = 0
    for sub in ["b1", "b2"]:
        for f in sorted(os.listdir(f"{src}/{sub}")):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{sub}/{f}", f"{src}/{i:03d}.parquet")
                i += 1
        shutil.rmtree(f"{src}/{sub}")

    run_ingest_dedup_stream(spark, src, schema, corpus, audit, ckpt)

    kept = {r["text"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {"alpha text", "beta text", "gamma text"}
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).collect()
    )
    assert kept_ids == [1, 2, 4]  # keeper ids, base copies stable

    rows = spark.read.parquet(audit).collect()
    audit_map = {
        (r["batch_id"], r["dedup_class"]): r["n_docs"] for r in rows
    }
    # batch order follows file order: 000=b1, 001=b2
    assert audit_map[(0, "novel")] == 2
    assert audit_map[(1, "novel")] == 1
    assert audit_map[(1, "dup_of_base")] == 1
    assert audit_map[(1, "intra_batch_dup")] == 1


def test_scd1_stream_self_vacuum_bounds_snapshots(spark, tmp_path, monkeypatch):
    """Advisor r9 + judge r9 task #4: a rapid-cadence SCD1 stream under
    the production 600 s GC floor accumulates one full-table snapshot
    per micro-batch until an operator intervenes. Two knobs bound it:
    the per-stream ``snapshot_min_age`` floor (passed to every commit)
    and the ``vacuum_every_n_batches`` self-vacuum hook. 12 rapid
    batches with the hook on end with a bounded snapshot count; the
    same batches under the env floor alone keep every snapshot."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bikes_data_warehouse_etl_spark.sources import snapshot

    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("v", StringType(), True),
        ]
    )
    n_batches = 12
    src = str(tmp_path / "src")
    os.makedirs(src)
    staging = str(tmp_path / "mk")
    for i in range(n_batches):
        spark.createDataFrame([(i, f"v{i}")], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        for f in os.listdir(staging):
            if f.endswith(".parquet"):
                os.rename(f"{staging}/{f}", f"{src}/{i:03d}.parquet")

    # production-shaped env floor: without a per-stream override every
    # young snapshot survives commit-time GC
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_MIN_AGE", "600")

    tgt_acc = str(tmp_path / "tgt_acc")
    run_scd1_stream(
        spark, src, schema, tgt_acc, ["k"], str(tmp_path / "ck_acc"),
        snapshot_min_age=None,  # env floor: the pre-r10 behavior
    )
    assert len(snapshot.list_snapshots(tgt_acc)) == n_batches  # accumulates

    tgt = str(tmp_path / "tgt")
    run_scd1_stream(
        spark, src, schema, tgt, ["k"], str(tmp_path / "ck"),
        snapshot_min_age=0.0,
        vacuum_every_n_batches=4,
    )
    # batch ids 0..11 → self-vacuum after batches 4, 8 and 12 (the
    # last); keep_last=1 + zero grace leaves exactly the live snapshot
    # (commit-time GC alone would leave retain=2)
    assert len(snapshot.list_snapshots(tgt)) == 1
    final = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert final == {i: f"v{i}" for i in range(n_batches)}
