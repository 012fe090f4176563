"""DW layer: the seven warehouse builders (reference parity, SURVEY §3.3).

Each function is one statement of the reference's daily refresh
(ref SQLserver Scripts/BikesDWSQl.sql), re-expressed as a lazy DataFrame
plan ending in the caller's overwrite (full refresh) or append
(incremental CDC). Column names match the reference SELECT lists
exactly, including the leading ``DWH_CYC_DT`` audit timestamp — but
pinned to an explicit ``run_ts`` instead of ``getdate()`` (§1.5.3).

Scale notes: all dimension joins broadcast (dim-sized right sides);
the items⋈orders fact join is the only shuffle join; groupBys emit
map-side partials; the CDC anti-joins probe only the fact's key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.datetime_fns import (
    start_of_week_sunday,
)
from bikes_data_warehouse_etl_spark.operators.cdc import anti_join_new_rows


def _cyc(run_ts: str):
    return F.lit(run_ts).cast("timestamp").alias("DWH_CYC_DT")


def build_prdct_sm_fct(
    items: DataFrame, orders: DataFrame, run_ts: str
) -> DataFrame:
    """Product×date sales rollup, full refresh (ref BikesDWSQl.sql:22-39)."""
    return (
        items.join(orders, "SalesOrderID", "inner")
        .groupBy(
            F.col("PRODUCTID").alias("Prdct_ID"),
            F.col("Date").alias("Act_Perd_Dt"),
        )
        .agg(
            F.sum(items.GROSSAMOUNT).alias("Sale_Amt"),
            F.sum("QUANTITY").alias("Prdct_Cnt"),
        )
        .select(_cyc(run_ts), "Prdct_ID", "Act_Perd_Dt", "Sale_Amt", "Prdct_Cnt")
    )


def build_ordr_sm_fct(
    orders: DataFrame, existing_fct: DataFrame | None, run_ts: str
) -> DataFrame:
    """Order-grain summary fact, incremental (ref BikesDWSQl.sql:41-72).

    CDC guard: only orders whose SalesOrderID is not already in the
    fact (ref :60-67) — expressed as a left_anti join (J4). Conditional
    online/offline splits of counts, amounts and ratings (A2); AVG
    skips NULL ratings in both engines (A4).
    """
    src = orders
    if existing_fct is not None:
        src = anti_join_new_rows(
            src, existing_fct.select(F.col("Ordr_ID").alias("SalesOrderID")),
            ["SalesOrderID"],
        )
    online = F.col("Ordertype") == "Online"
    g = F.col("GROSSAMOUNT")
    r = F.col("RATING")
    zero = F.lit(0).cast("long")
    return (
        src.groupBy(
            F.col("SalesOrderID").alias("Ordr_ID"),
            F.col("customer_id").alias("Cust_ID"),
            F.col("StoreID").alias("Str_ID"),
            F.col("Date").alias("Act_Perd_Dt"),
        )
        .agg(
            F.count(F.lit(1)).alias("Ordr_Cnt"),
            F.sum(F.when(online, 1).otherwise(0)).alias("On_Ordr_Cnt"),
            F.sum(F.when(~online, 1).otherwise(0)).alias("Off_Ordr_Cnt"),
            F.sum(g).alias("Ordr_Amt"),
            F.sum(F.when(online, g).otherwise(zero)).alias("On_Ordr_Amt"),
            F.sum(F.when(~online, g).otherwise(zero)).alias("Off_Ordr_Amt"),
            F.avg(r).alias("Rtng_Val"),
            F.sum(F.when(~online, r).otherwise(zero)).alias("Off_Rtng_Val"),
            F.sum(F.when(online, r).otherwise(zero)).alias("On_Rtng_Val"),
        )
        .select(
            _cyc(run_ts),
            "Ordr_ID",
            "Cust_ID",
            "Str_ID",
            "Act_Perd_Dt",
            "Ordr_Cnt",
            "On_Ordr_Cnt",
            "Off_Ordr_Cnt",
            "Ordr_Amt",
            "On_Ordr_Amt",
            "Off_Ordr_Amt",
            "Rtng_Val",
            "Off_Rtng_Val",
            "On_Rtng_Val",
        )
    )


def build_ordr_dtl_fct(
    items: DataFrame,
    orders: DataFrame,
    existing_fct: DataFrame | None,
    run_ts: str,
) -> DataFrame:
    """Order×product detail fact, incremental with composite-key CDC
    (ref BikesDWSQl.sql:75-106; anti-join on (Ordr_ID, Prdct_ID) ref
    :92-100). Orphan order items (no matching SalesOrder) are silently
    dropped by the inner join — reference semantics (§1.5, SURVEY §7.4.6).
    """
    joined = items.join(orders, "SalesOrderID", "inner")
    if existing_fct is not None:
        joined = anti_join_new_rows(
            joined,
            existing_fct.select(
                F.col("Ordr_ID").alias("SalesOrderID"),
                F.col("Prdct_ID").alias("PRODUCTID"),
            ),
            ["SalesOrderID", "PRODUCTID"],
        )
    return (
        joined.groupBy(
            F.col("PRODUCTID").alias("Prdct_ID"),
            F.col("SalesOrderID").alias("Ordr_ID"),
            F.col("customer_id").alias("Cust_ID"),
            F.col("StoreID").alias("Str_ID"),
            F.col("Date").alias("Act_Perd_Dt"),
        )
        .agg(
            F.sum(items.GROSSAMOUNT).alias("Sale_Amt"),
            F.sum("QUANTITY").alias("Prdct_Cnt"),
        )
        .select(
            _cyc(run_ts),
            "Prdct_ID",
            "Ordr_ID",
            "Cust_ID",
            "Str_ID",
            "Act_Perd_Dt",
            "Sale_Amt",
            "Prdct_Cnt",
        )
    )


def build_cust_dim(customer: DataFrame, run_ts: str) -> DataFrame:
    """Customer dimension, full refresh (ref BikesDWSQl.sql:108-121)."""
    return customer.select(
        _cyc(run_ts),
        F.col("customer_id").alias("Cust_ID"),
        F.col("first_name").alias("Cust_F_Nm"),
        F.col("last_name").alias("Cust_L_Nm"),
        F.col("gender").alias("Cust_Gndr"),
        F.col("DOB").alias("Cust_Brth_Dt"),
        F.col("Age").alias("Cust_Age"),
        F.col("Agerange").alias("Cust_Age_Grp"),
    )


def build_str_dim(store: DataFrame, address: DataFrame, run_ts: str) -> DataFrame:
    """Store dimension: Store ⟕ Address (ref BikesDWSQl.sql:123-139)."""
    return store.join(
        F.broadcast(address), store.AddressID == address.ADDRESSID, "left"
    ).select(
        _cyc(run_ts),
        F.col("StoreID").alias("Str_ID"),
        F.col("phone").alias("Str_Phn_Nbr"),
        F.col("manager").alias("Str_Mngr_Nm"),
        F.col("CITY").alias("Str_City"),
        F.col("COUNTRY").alias("Str_Cntry"),
        F.col("REGION").alias("Str_Rgn"),
        F.col("POSTALCODE").alias("Str_Zip"),
    )


def build_prdct_dim(
    product: DataFrame,
    category: DataFrame,
    detail: DataFrame,
    partner: DataFrame,
    address: DataFrame,
    run_ts: str,
) -> DataFrame:
    """Product dimension: current SCD2 versions flattened through the
    4-join enrichment chain (ref BikesDWSQl.sql:141-170, filter :170).

    The ``current_flag = 1`` filter sits directly on the scan so it
    pushes down; every right side broadcasts.
    """
    p = product.filter(F.col("CURRENT_FLAG") == 1)
    return (
        p.join(F.broadcast(category), "PRODCATEGORYID", "left")
        .join(F.broadcast(detail), "PRODUCTID", "left")
        .join(F.broadcast(partner), "PARTNERID", "left")
        .join(
            F.broadcast(address),
            partner.ADDRESSID == address.ADDRESSID,
            "left",
        )
        .select(
            _cyc(run_ts),
            F.col("PRODUCTID").alias("Prdct_ID"),
            F.col("PRODUCT_NAME").alias("Prdct_Nm"),
            F.col("PRICE").alias("Prdct_Cst"),
            F.col("PRODCATEGORYNAME").alias("Prdct_Ctg_Nm"),
            F.col("COMPANYNAME").alias("Ptrn_Nm"),
            F.col("EMAILADDRESS").alias("Ptnr_Email"),
            F.col("CITY").alias("Ptnr_City"),
            F.col("COUNTRY").alias("Ptnr_Cntry"),
            F.col("REGION").alias("Ptnr_Rgn"),
            F.col("POSTALCODE").alias("Ptnr_Zip"),
        )
    )


def build_act_perd_dim(datetab: DataFrame, as_of_date: str, run_ts: str) -> DataFrame:
    """Activity-period dimension (ref BikesDWSQl.sql:172-200).

    The reference's trailing flags are *open-ended*: ``Date >
    start_of_week(as_of - k*7 days)`` with Sunday-start weeks — CW =
    since start of current week, PW = since start of previous week,
    4W/13W = since start of the week 4/13 weeks back. Reproduced
    exactly (not the windowed interpretation).
    """
    d = F.col("date")
    as_of = F.lit(as_of_date).cast("date")

    def since_flag(weeks_back: int):
        anchor = start_of_week_sunday(F.date_sub(as_of, 7 * weeks_back))
        return F.when(d > anchor, "Y").otherwise("N")

    return datetab.select(
        _cyc(run_ts),
        d.alias("Act_Perd_Dt"),
        F.col("date_day").alias("Act_Perd_Day"),
        F.col("date_weekdayid").alias("Act_Perd_Wk_Day_Nbr"),
        F.col("date_weekday").alias("Act_Perd_Wk_Day"),
        F.col("date_week").alias("Act_Perd_Wk"),
        F.col("date_quarter").alias("Act_Perd_Qtr_Nbr"),
        F.concat(F.lit("Q"), F.col("date_quarter").cast("string")).alias(
            "Act_Perd_Qtr_Nm"
        ),
        F.col("date_year").alias("Act_Perd_Yr"),
        (F.col("date_year") * 100 + F.col("date_month")).alias("Act_Perd_Yr_Mo_Nbr"),
        F.col("date_month").alias("Act_Perd_Mo_Nbr"),
        F.col("date_monthname").alias("Act_Perd_Mo"),
        F.when(F.col("date_year") == F.year(as_of), "Y").otherwise("N").alias(
            "Act_Perd_CYTD"
        ),
        F.when(F.col("date_year") == F.year(as_of) - 1, "Y")
        .otherwise("N")
        .alias("Act_Perd_PYTD"),
        since_flag(0).alias("Act_Perd_CW"),
        since_flag(1).alias("Act_Perd_PW"),
        since_flag(4).alias("Act_Perd_4W"),
        since_flag(13).alias("Act_Perd_13W"),
    )
