"""Write-path benchmark (VERDICT r4 task #4): the engine is an ETL
engine, but bench.py times only queries. The reference's operating
contract is a daily *refresh* (ref BikesDWSQl.sql:4 "daily job"), so
this tool times the full write path:

* **day 1** — initial ``BikesPipeline.run()`` on a x``N_REP`` scaled
  bikes source (facts replicated with disjoint keys; dims held at
  reference size, as real fact growth behaves): 9 SCD merges from
  empty + 7 DW builds, everything materialized to parquet.
* **day 2** — the incremental daily refresh against day 1's state:
  every SCD1 table re-merged (1% updates + 1% new keys on the facts,
  targeted updates on Customer), Product SCD2 expiry+append, and the
  anti-join incremental appends on the two order facts.
* **merge-at-scale** — ``scd1_merge`` and ``scd2_merge`` with the sf1
  ``orders`` table (≈1.5M rows) as both target and source (1% changed
  rows, 1% new keys), materialized. This is the merge operator cost
  isolated from CSV parsing and the small-dim chaff.

Output: one JSON line + ``WRITE_BENCH.json`` at the repo root. If a
previous artifact exists, day-over-day regressions >" REGRESSION_X "x
are listed (the relative gate bench.py applies to reads, applied to
writes).

Scale notes (why these numbers transfer): every merge here is
join+union against the immutable previous state and rewrites via
staging+atomic swap — on a cluster the same plans run unchanged with a
Delta/Iceberg writer, the rewrite touches only affected partitions,
and the per-day source is broadcast-sized. The day-2 cost is dominated
by one scan of the previous state per table, which is the honest floor
for a file-format merge without a transactional table format.

Usage: python tools/bench_write.py [--rep N] [--sf1 DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOURCE = "/root/reference/SourceData"
N_REP = 1000  # SalesOrder x1000 = 334k orders / 1.9M items
REGRESSION_X = 1.5

ORDER_OFFSET = 10_000  # orig SalesOrderID spans ~500000000..500000333
ITEM_OFFSET = 10_000  # orig SalesOrderItemsID spans 1..1935


def _read(name: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(SOURCE, f"{name}.csv"), dtype=str)


def _write(df: pd.DataFrame, out_dir: str, name: str) -> None:
    df.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)


def _replicate_facts(n_rep: int, start_rep: int = 0):
    """Fact tables replicated with disjoint SalesOrder(Items)IDs; all
    dim foreign keys stay inside the original range (dims do not grow
    with fact volume — the realistic shape)."""
    so = _read("SalesOrder")
    soi = _read("SalesOrderItems")
    so_id = so["SalesOrderID"].astype("int64")
    soi_id = soi["SalesOrderItemsID"].astype("int64")
    soi_fk = soi["SalesOrderID"].astype("int64")
    so_out, soi_out = [], []
    for r in range(start_rep, start_rep + n_rep):
        s = so.copy()
        s["SalesOrderID"] = so_id + r * ORDER_OFFSET
        so_out.append(s)
        i = soi.copy()
        i["SalesOrderItemsID"] = soi_id + r * ITEM_OFFSET
        i["SalesOrderID"] = soi_fk + r * ORDER_OFFSET
        soi_out.append(i)
    return pd.concat(so_out, ignore_index=True), pd.concat(
        soi_out, ignore_index=True
    )


def build_day1(out_dir: str, n_rep: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in (
        "Customer",
        "Address",
        "BusinessPartner",
        "ProductCategory",
        "ProductDetail",
        "Store",
        "Product",
    ):
        _write(_read(name), out_dir, name)
    so, soi = _replicate_facts(n_rep)
    _write(so, out_dir, "SalesOrder")
    _write(soi, out_dir, "SalesOrderItems")


def build_day2(out_dir: str, n_rep: int) -> None:
    """Day-2 extract: 1% of fact rows change amounts, 1% new fact keys,
    a slice of customers changes industry (SCD1 update), every 5th
    product changes price (SCD2 version)."""
    os.makedirs(out_dir, exist_ok=True)
    cust = _read("Customer")
    upd = cust["customer_id"].astype("int64") % 7 == 0
    cust.loc[upd, "job_industry_category"] = "Retail-Updated"
    _write(cust, out_dir, "Customer")

    prod = _read("Product")
    mask = prod.index % 5 == 0
    prod.loc[mask, "PRICE"] = (
        prod.loc[mask, "PRICE"].astype("int64") + 10
    ).astype(str)
    _write(prod, out_dir, "Product")

    for name in ("Address", "BusinessPartner", "ProductCategory",
                 "ProductDetail", "Store"):
        _write(_read(name), out_dir, name)

    so, soi = _replicate_facts(n_rep)
    chg = so["SalesOrderID"].astype("int64") % 100 == 7
    so.loc[chg, "GROSSAMOUNT"] = (
        so.loc[chg, "GROSSAMOUNT"].astype("int64") + 1
    ).astype(str)
    chg_i = soi["SalesOrderItemsID"].astype("int64") % 100 == 7
    soi.loc[chg_i, "GROSSAMOUNT"] = (
        soi.loc[chg_i, "GROSSAMOUNT"].astype("int64") + 1
    ).astype(str)
    new_so, new_soi = _replicate_facts(max(1, n_rep // 100), start_rep=n_rep)
    _write(pd.concat([so, new_so], ignore_index=True), out_dir, "SalesOrder")
    _write(
        pd.concat([soi, new_soi], ignore_index=True), out_dir, "SalesOrderItems"
    )


def bench_pipeline(spark, work: str, n_rep: int) -> dict:
    from bikes_data_warehouse_etl_spark.plans.bikes_pipeline import BikesPipeline

    d1, d2 = os.path.join(work, "day1"), os.path.join(work, "day2")
    wh = os.path.join(work, "wh")
    build_day1(d1, n_rep)
    build_day2(d2, n_rep)

    p1 = BikesPipeline(spark, d1, wh, "2022-01-15", "2022-01-15 18:00:00")
    t0 = time.time()
    p1.load_ods()
    t1 = time.time()
    p1.refresh_dw()
    t2 = time.time()

    p2 = BikesPipeline(spark, d2, wh, "2022-01-16", "2022-01-16 18:00:00")
    t3 = time.time()
    p2.load_ods()
    t4 = time.time()
    p2.refresh_dw()
    t5 = time.time()

    # paired A/B for the OPT-IN power-loss fsync sweep
    # (SPARK_GRAFT_SNAPSHOT_FSYNC=1): replay the day-2 ODS refresh
    # twice against identical state (the SCD rewrites re-stage and
    # re-commit every table even when the source is unchanged, so both
    # replays do the same physical write work) — once without the
    # sweep, once with. The delta is the measured cost of making every
    # commit power-loss durable on this FS.
    # the baseline leg must run WITHOUT the sweep even if the caller's
    # environment already set the var (advisor r9: the unconditional
    # set-then-del both polluted the baseline leg and clobbered the
    # user's setting) — save, pop for the A leg, restore afterwards
    prev_fsync = os.environ.pop("SPARK_GRAFT_SNAPSHOT_FSYNC", None)
    try:
        t6 = time.time()
        p2.load_ods()
        t7 = time.time()
        os.environ["SPARK_GRAFT_SNAPSHOT_FSYNC"] = "1"
        t8 = time.time()
        p2.load_ods()
        t9 = time.time()
    finally:
        if prev_fsync is None:
            os.environ.pop("SPARK_GRAFT_SNAPSHOT_FSYNC", None)
        else:
            os.environ["SPARK_GRAFT_SNAPSHOT_FSYNC"] = prev_fsync

    n_items = spark.read.parquet(os.path.join(wh, "ods", "salesorderitems")).count()
    n_fact = spark.read.parquet(os.path.join(wh, "dw", "ordr_dtl_fct")).count()
    return {
        "n_rep": n_rep,
        "ods_rows_salesorderitems": n_items,
        "dw_rows_ordr_dtl_fct": n_fact,
        "day1_ods_s": round(t1 - t0, 2),
        "day1_dw_s": round(t2 - t1, 2),
        "day2_ods_s": round(t4 - t3, 2),
        "day2_dw_s": round(t5 - t4, 2),
        "day2_ods_replay_s": round(t7 - t6, 2),
        "day2_ods_replay_fsync_s": round(t9 - t8, 2),
        "total_s": round(t5 - t0 - (t3 - t2), 2),
    }


def bench_merge_sf1(spark, work: str, sf1_dir: str) -> dict:
    """scd1/scd2 merge with sf1 orders (~1.5M rows) as target AND
    source: 1% of keys change o_totalprice, 1% are new."""
    import pyspark.sql.functions as F

    from bikes_data_warehouse_etl_spark.operators.merge import (
        scd1_merge,
        scd2_merge,
    )

    orders = spark.read.parquet(os.path.join(sf1_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    tgt1_path = os.path.join(work, "m_tgt1")
    orders.write.mode("overwrite").parquet(tgt1_path)
    tgt1 = spark.read.parquet(tgt1_path)
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    changed = orders.where(F.col("o_orderkey") % 100 == 7).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    new = orders.where(F.col("o_orderkey") % 100 == 13).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(int(max_key))
    )
    src = changed.unionByName(new)
    src_path = os.path.join(work, "m_src")
    src.write.mode("overwrite").parquet(src_path)
    src = spark.read.parquet(src_path)
    n_tgt, n_src = tgt1.count(), src.count()

    t0 = time.time()
    scd1_merge(tgt1, src, ["o_orderkey"]).write.mode("overwrite").parquet(
        os.path.join(work, "m_out1")
    )
    t1 = time.time()

    tgt2 = tgt1.withColumn("current_flag", F.lit(1)).withColumn(
        "effective_timestamp", F.lit("2022-01-01 00:00:00")
    ).withColumn("expire_timestamp", F.lit("9999-12-31 00:00:00"))
    tgt2_path = os.path.join(work, "m_tgt2")
    tgt2.write.mode("overwrite").parquet(tgt2_path)
    tgt2 = spark.read.parquet(tgt2_path)
    t2 = time.time()
    scd2_merge(
        tgt2,
        src,
        keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice", "o_orderdate"],
        run_ts="2022-01-02 00:00:00",
    ).write.mode("overwrite").parquet(os.path.join(work, "m_out2"))
    t3 = time.time()
    return {
        "target_rows": n_tgt,
        "source_rows": n_src,
        "scd1_merge_s": round(t1 - t0, 2),
        "scd2_merge_s": round(t3 - t2, 2),
    }


def bench_pair_sink(spark, work: str, sf_dir: str) -> dict:
    """The emitters' scale path (VERDICT r6 task #4): at real scale the
    consumer of fuzzy_name_pairs / lsh_candidates is a bucketed
    partitioned WRITE, not a returned DataFrame. Times write_pairs on
    both emitters at the given sf and reports rows + rows/s — the
    throughput number the 372M-pair sf10 form needs."""
    from bikes_data_warehouse_etl_spark.plans.coverage import (
        q_fuzzy_name_pairs,
    )
    from bikes_data_warehouse_etl_spark.plans.extensions import (
        q_lsh_candidates,
    )
    from bikes_data_warehouse_etl_spark.sources.sinks import write_pairs

    out: dict = {"sf_dir": sf_dir}
    for name, df, blocks in (
        ("fuzzy_name_pairs", q_fuzzy_name_pairs(spark, sf_dir), ["id_a"]),
        ("lsh_candidates", q_lsh_candidates(spark, sf_dir), ["id_a"]),
    ):
        dest = os.path.join(work, f"pairs_{name}")
        t0 = time.time()
        write_pairs(df, dest, block_cols=blocks, n_buckets=64)
        el = time.time() - t0
        spark_df = spark.read.parquet(dest)
        n = spark_df.count()
        out[f"{name}_rows"] = n
        out[f"{name}_write_s"] = round(el, 2)
        out[f"{name}_rows_per_s"] = int(n / el) if el > 0 else None
        shutil.rmtree(dest, ignore_errors=True)
    return out


def main() -> int:
    args = sys.argv[1:]
    n_rep = int(args[args.index("--rep") + 1]) if "--rep" in args else N_REP
    sf1_dir = (
        args[args.index("--sf1") + 1]
        if "--sf1" in args
        else os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    )
    # --pairs DIR: also time the bucketed pair sink against DIR
    # (intended: /tmp/sf10). Off by default — it is the one arm whose
    # input queries take minutes at sf10.
    pairs_dir = args[args.index("--pairs") + 1] if "--pairs" in args else None
    from bikes_data_warehouse_etl_spark.session import get_spark

    spark = get_spark("bench-write")
    work = "/tmp/bench_write"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    result = {"pipeline": bench_pipeline(spark, work, n_rep)}
    if os.path.isdir(sf1_dir):
        result["merge_sf1"] = bench_merge_sf1(spark, work, sf1_dir)
    else:
        result["merge_sf1"] = {"skipped": f"{sf1_dir} absent — run tools/make_sf1.py"}
    if pairs_dir:
        result["pair_sink"] = bench_pair_sink(spark, work, pairs_dir)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev_path = os.path.join(repo, "WRITE_BENCH.json")
    regressions = []
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        for section in ("pipeline", "merge_sf1"):
            for k, v in result.get(section, {}).items():
                pv = prev.get(section, {}).get(k)
                if (
                    k.endswith("_s")
                    and isinstance(pv, (int, float))
                    and isinstance(v, (int, float))
                    and pv > 1.0
                    and v > pv * REGRESSION_X
                ):
                    regressions.append(
                        {"metric": f"{section}.{k}", "prev": pv, "now": v}
                    )
    if not pairs_dir and os.path.exists(prev_path):
        # keep the last measured pair-sink row when this regen skipped
        # the (expensive, sf10) arm — absence would read as a removal
        with open(prev_path) as f:
            prev_keep = json.load(f).get("pair_sink")
        if prev_keep:
            result["pair_sink"] = prev_keep
    result["regressions_vs_prev"] = regressions
    with open(prev_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
