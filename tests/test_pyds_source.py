"""Custom Python data source (eventgen): schema, partitioning,
determinism, and downstream composability."""

from __future__ import annotations

import pytest

from bikes_data_warehouse_etl_spark.sources.pyds import register


@pytest.fixture(scope="module")
def gen(spark):
    register(spark)
    return (
        spark.read.format("eventgen")
        .option("n_rows", 500)
        .option("n_partitions", 4)
        .option("seed", 7)
    )


def test_schema_and_counts(spark, gen):
    df = gen.load()
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,user_id:bigint,event_type:string,"
        "value:double,ts:timestamp>"
    )
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 4
    # exact row-id coverage: no dupes, no gaps across partitions
    ids = [r["event_id"] for r in df.select("event_id").collect()]
    assert sorted(ids) == list(range(500))


def test_deterministic_across_reads(spark, gen):
    a = sorted(map(tuple, gen.load().collect()))
    b = sorted(map(tuple, gen.load().collect()))
    assert a == b


def test_seed_changes_stream(spark, gen):
    register(spark)
    other = (
        spark.read.format("eventgen")
        .option("n_rows", 500)
        .option("n_partitions", 4)
        .option("seed", 8)
        .load()
    )
    a = sorted(map(tuple, gen.load().collect()))
    b = sorted(map(tuple, other.collect()))
    assert a != b


def test_composes_with_engine_ops(spark, gen):
    """The generated frame must behave like any scanned table: here a
    per-type rollup with integer cents."""
    import pyspark.sql.functions as F

    out = (
        gen.load()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    )
    assert sum(r["n"] for r in out) == 500
    assert {r["event_type"] for r in out} <= {
        "view", "click", "purchase", "signup", "error"
    }


def test_streaming_twin_matches_batch(spark, tmp_path):
    """The micro-batch stream must produce the SAME rows as the batch
    reader over the same (seed, index) range — one generator, two
    execution modes."""
    import time

    register(spark)
    opts = {"seed": "7", "n_users": "100"}
    stream = (
        spark.readStream.format("eventgen")
        .options(rows_per_batch="60", n_total="200", **opts)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("eventgen_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("eventgen_stream").count() >= 200:
                break
            time.sleep(0.5)
        got = sorted(map(tuple, spark.table("eventgen_stream").collect()))
    finally:
        q.stop()
    batch = (
        spark.read.format("eventgen")
        .options(n_rows="200", n_partitions="4", **opts)
        .load()
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_stream_composes_with_windowed_agg(spark, tmp_path):
    """The custom streaming source must drive the real streaming
    engine: a tumbling event-time window over the eventgen stream
    equals the same window computed in batch over the same rows."""
    import time

    import pyspark.sql.functions as F

    register(spark)
    opts = {"seed": "11", "n_users": "20"}
    stream = (
        spark.readStream.format("eventgen")
        .options(rows_per_batch="100", n_total="300", **opts)
        .load()
    )
    agg = stream.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("eventgen_windows")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        batch = (
            spark.read.format("eventgen")
            .options(n_rows="300", n_partitions="2", **opts)
            .load()
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        want = sorted(
            (r["w"]["start"], r["event_type"], r["n"]) for r in batch.collect()
        )
        deadline = time.time() + 60
        got = None
        while time.time() < deadline:
            got = sorted(
                (r["w"]["start"], r["event_type"], r["n"])
                for r in spark.table("eventgen_windows").collect()
            )
            if got == want:
                break
            time.sleep(0.5)
        assert got == want
    finally:
        q.stop()
