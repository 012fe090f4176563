"""Runtime bloom-filter injection (InjectRuntimeFilter): a selective
dim-side predicate on a shuffle join should seed a bloom filter that
prunes fact rows BEFORE the exchange — Spark's runtime answer to the
semi-join reduction a distributed warehouse does by hand.

The thresholds are lowered for the test because the defaults
(creation side <= 10 MB, application-side scan >= 10 GB) are sized
for clusters, not sf0.01 fixtures; the PLAN SHAPE is what's pinned.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bloom_filter_injected_on_shuffle_join(spark, sf_dir):
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, plan[:2000]
        # and the result is identical with the filter disabled
        n_with = joined.count()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        try:
            n_without = joined.count()
        finally:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
            )
        assert n_with == n_without
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
