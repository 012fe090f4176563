"""ORC ingestion edge: roundtrip fidelity + the scan properties that
matter at scale (column pruning, predicate pushdown)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.sources.orc import read_orc, write_orc
from bikes_data_warehouse_etl_spark.sources.parquet import read_table


def test_orc_roundtrip_lineitem(spark, sf_dir, tmp_path):
    src = read_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "lineitem_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # value fidelity on an integer-exact projection
    a = src.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
    )
    b = back.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_orc_scan_prunes_and_pushes_down(spark, sf_dir, tmp_path):
    """The ORC reader must behave like the parquet one where it counts:
    filters in PushedFilters, projection pruned in ReadSchema."""
    path = str(tmp_path / "li_orc")
    write_orc(read_table(spark, sf_dir, "lineitem"), path)
    q = (
        read_orc(spark, path)
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_merge_schema_read_unions_evolving_footers(spark, tmp_path):
    """Files written under an evolving schema must read as the UNION
    of their columns (old rows null-filled) — the default single-footer
    sample would silently drop the added column if an old file wins."""
    from bikes_data_warehouse_etl_spark.sources.parquet import read_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, v string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, "b", 20)], "id long, v string, score long"
    ).write.mode("append").parquet(path)

    df = read_evolving(spark, path)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r["id"]: (r["v"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 20)}
