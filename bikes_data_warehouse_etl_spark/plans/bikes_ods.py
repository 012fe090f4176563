"""ODS layer: per-table cleaning transforms (reference parity, SURVEY §3.1).

Each function is a pure DataFrame→DataFrame transform replicating one
table's extract-clean step from the reference ETL
(ref ETLScript_withSCDimplementation.py, per-table blocks at :19, :123,
:208, :293, :375, :462, :547, :630, :720). Eager pandas becomes one
lazy Catalyst plan per table; the documented reference bugs are fixed
per SURVEY §1.5 (uniform day-first dates, explicit as-of age).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from bikes_data_warehouse_etl_spark.functions.cleaning import (
    age_at,
    age_bucket,
    clean_name,
    parse_ddmmyyyy,
)


def clean_customer(raw: DataFrame, as_of_date: str) -> DataFrame:
    """Customer ODS transform (ref :19-45).

    Order matters: project to 5 columns *then* dedup — the reference's
    customer_id 10 rows differ only in the dropped columns, so
    dedup-after-projection is what removes the duplicate (§1.5.8).
    Age is computed against the explicit ``as_of_date`` (§1.5.3);
    DOB is parsed day-first uniformly (§1.5.2 divergence, documented).
    """
    as_of = F.lit(as_of_date).cast("date")
    return (
        raw.select("customer_id", "first_name", "last_name", "gender", "DOB")
        .dropDuplicates()
        .withColumn("first_name", clean_name("first_name"))
        .withColumn("last_name", clean_name("last_name"))
        .withColumn("DOB", parse_ddmmyyyy("DOB"))
        .withColumn("Age", age_at(F.col("DOB"), as_of))
        .withColumn("Agerange", age_bucket("Age"))
    )


def clean_address(raw: DataFrame) -> DataFrame:
    """Address ODS transform (ref :123-127): full-row dedup."""
    return raw.dropDuplicates()


def clean_business_partner(raw: DataFrame) -> DataFrame:
    """BusinessPartner ODS transform (ref :208-212)."""
    return raw.dropDuplicates()


def clean_product_category(raw: DataFrame) -> DataFrame:
    """ProductCategory ODS transform (ref :293-297)."""
    return raw.dropDuplicates()


def clean_product_detail(raw: DataFrame) -> DataFrame:
    """ProductDetail ODS transform (ref :375-379)."""
    return raw.dropDuplicates()


def clean_store(raw: DataFrame) -> DataFrame:
    """Store ODS transform (ref :462-466)."""
    return raw.dropDuplicates()


def clean_sales_order(raw: DataFrame) -> DataFrame:
    """SalesOrder ODS transform (ref :547-562).

    Drops PARTNERID (ref :557), dedups, parses Date day-first.
    """
    return (
        raw.drop("PARTNERID")
        .dropDuplicates()
        .withColumn("Date", parse_ddmmyyyy("Date"))
    )


def clean_sales_order_items(raw: DataFrame) -> DataFrame:
    """SalesOrderItems ODS transform (ref :720-724)."""
    return raw.dropDuplicates()


def product_scd2_initial(raw: DataFrame, run_ts: str) -> DataFrame:
    """Initial SCD2 load of Product (ref :630-717 insert branch;
    target schema ref Createtables_BIKES.sql:73-82).

    The surrogate ``PID`` is assigned with ``row_number`` over the
    business key — deterministic under any partitioning, unlike
    ``monotonically_increasing_id`` (SURVEY §7.4.5). Current rows carry
    ``expire_timestamp = NULL`` as in the reference DDL.

    Scale note: the global row_number window is single-partition — fine
    for a dim-sized table; for a billion-row SCD2 target switch to
    ``zipWithIndex``-style or hash surrogate keys.
    """
    w = Window.orderBy("PRODUCTID")
    return (
        raw.dropDuplicates()
        .withColumn("PID", F.row_number().over(w).cast("long"))
        .withColumn("CURRENT_FLAG", F.lit(1).cast("long"))
        .withColumn("effective_timestamp", F.lit(run_ts).cast("timestamp"))
        .withColumn("expire_timestamp", F.lit(None).cast("timestamp"))
        .select(
            "PID",
            "PRODUCTID",
            "PRODCATEGORYID",
            "PARTNERID",
            "PRICE",
            "CURRENT_FLAG",
            "effective_timestamp",
            "expire_timestamp",
        )
    )
