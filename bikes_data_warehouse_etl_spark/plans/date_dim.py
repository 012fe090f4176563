"""Generated date dimension (reference parity: DATETAB + Act_Perd_Dim).

The reference manufactures its date spine by numbering rows of an
unrelated donor table with ``ROW_NUMBER() OVER (ORDER BY getdate())``
(ref Createtables_BIKES.sql:17-22 — a workaround for SQL Server's lack
of a generator). Spark has a real generator: ``sequence`` + ``explode``
runs entirely in whole-stage codegen with no donor table, no DISTINCT,
no shuffle.

``Act_Perd_Dim`` (ref BikesDWSQl.sql:172-200) adds quarter names, a
yyyymm key, and CYTD/PYTD + trailing-week flags — all computed against
an explicit ``as_of_date`` instead of ``getdate()`` (SURVEY §1.5.3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.datetime_fns import (
    quarter_name,
    start_of_week_sunday,
    week_of_year_sqlserver,
    yyyymm,
)


def build_date_dim(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
) -> DataFrame:
    """One row per day in [start, end] with the DATETAB attributes.

    Columns mirror ref Createtables_BIKES.sql:7-15: date, date_day,
    date_weekday, date_week (SQL-Server calendar week), date_weekdayid
    (1=Sunday), date_month, date_monthname, date_quarter, date_year.
    """
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    d = F.col("date")
    return spine.select(
        d,
        F.dayofmonth(d).alias("date_day"),
        F.date_format(d, "EEEE").alias("date_weekday"),
        week_of_year_sqlserver(d).alias("date_week"),
        F.dayofweek(d).alias("date_weekdayid"),
        F.month(d).alias("date_month"),
        F.date_format(d, "MMMM").alias("date_monthname"),
        F.quarter(d).alias("date_quarter"),
        F.year(d).alias("date_year"),
    )


def build_act_perd_dim(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    as_of_date: str | dt.date,
) -> DataFrame:
    """Activity-period dimension (ref BikesDWSQl.sql:172-200).

    Adds to the date spine: quarter name Q1-Q4 (ref :182-187), integer
    yyyymm key (ref :189), CYTD/PYTD year flags (ref :192-193), and
    current / previous / trailing-4 / trailing-13 week Y-N flags using
    Sunday-start week arithmetic (ref :194-197; F17 — NOT Monday-start
    ``date_trunc``).
    """
    dim = build_date_dim(spark, start, end)
    d = F.col("date")
    as_of = F.lit(str(as_of_date)).cast("date")
    week0 = start_of_week_sunday(as_of)  # start of the as-of week
    yn = lambda cond: F.when(cond, "Y").otherwise("N")  # noqa: E731
    return dim.select(
        "*",
        quarter_name(d).alias("quarter_name"),
        yyyymm(d).alias("yyyymm_key"),
        yn(F.year(d) == F.year(as_of)).alias("cytd_flag"),
        yn(F.year(d) == F.year(as_of) - 1).alias("pytd_flag"),
        yn(start_of_week_sunday(d) == week0).alias("cw_flag"),
        yn(start_of_week_sunday(d) == F.date_sub(week0, 7)).alias("pw_flag"),
        yn(
            (start_of_week_sunday(d) >= F.date_sub(week0, 28))
            & (start_of_week_sunday(d) < week0)
        ).alias("w4_flag"),
        yn(
            (start_of_week_sunday(d) >= F.date_sub(week0, 91))
            & (start_of_week_sunday(d) < week0)
        ).alias("w13_flag"),
    )
