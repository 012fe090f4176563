"""SQL surface: the warehouse as literal Spark SQL (SURVEY §7.2.8).

Every layer registers as a temp view and every DW statement exists as
SQL text runnable via ``spark.sql`` — so users of the reference's T-SQL
scripts can keep their workflow: same statements, same output columns,
executed by Catalyst instead of SQL Server. The text is parameterized
on ``run_ts``/``as_of_date`` (the reference's ``getdate()`` sites).

The DataFrame builders in plans/bikes_dw.py are the primary
implementation; these SQL twins are asserted equal in
tests/test_sql_surface.py, which is exactly the guarantee a user
migrating query-by-query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bikes_data_warehouse_etl_spark.plans.bikes_pipeline import BikesPipeline

ODS_VIEWS = (
    "customer",
    "address",
    "businesspartner",
    "productcategory",
    "productdetail",
    "store",
    "salesorder",
    "salesorderitems",
    "product",
    "datetab",
)


def register_ods_views(pipeline: BikesPipeline, prefix: str = "ods_") -> None:
    for t in ODS_VIEWS:
        pipeline.read("ods", t).createOrReplaceTempView(f"{prefix}{t}")


def dw_sql(run_ts: str, as_of_date: str, prefix: str = "ods_") -> dict[str, str]:
    """The seven DW statements as Spark SQL text (ref BikesDWSQl.sql),
    output columns identical to plans/bikes_dw.py."""
    cyc = f"CAST('{run_ts}' AS TIMESTAMP) AS DWH_CYC_DT"
    sow = (
        "DATE_SUB(DATE_SUB(DATE'{aod}', 7 * {k}), "
        "DAYOFWEEK(DATE_SUB(DATE'{aod}', 7 * {k})) - 1)"
    )
    return {
        "prdct_sm_fct": f"""
            SELECT {cyc}, OI.PRODUCTID AS Prdct_ID, O.Date AS Act_Perd_Dt,
                   SUM(OI.GROSSAMOUNT) AS Sale_Amt, SUM(OI.QUANTITY) AS Prdct_Cnt
            FROM {prefix}salesorderitems OI
            JOIN {prefix}salesorder O ON O.SalesOrderID = OI.SalesOrderID
            GROUP BY OI.PRODUCTID, O.Date
        """,
        "ordr_sm_fct": f"""
            SELECT {cyc}, O.SalesOrderID AS Ordr_ID, O.customer_id AS Cust_ID,
                   O.StoreID AS Str_ID, O.Date AS Act_Perd_Dt,
                   COUNT(1) AS Ordr_Cnt,
                   SUM(CASE WHEN Ordertype =  'Online' THEN 1 ELSE 0 END) AS On_Ordr_Cnt,
                   SUM(CASE WHEN Ordertype <> 'Online' THEN 1 ELSE 0 END) AS Off_Ordr_Cnt,
                   SUM(GROSSAMOUNT) AS Ordr_Amt,
                   SUM(CASE WHEN Ordertype =  'Online' THEN GROSSAMOUNT ELSE 0 END) AS On_Ordr_Amt,
                   SUM(CASE WHEN Ordertype <> 'Online' THEN GROSSAMOUNT ELSE 0 END) AS Off_Ordr_Amt,
                   AVG(RATING) AS Rtng_Val,
                   SUM(CASE WHEN Ordertype <> 'Online' THEN RATING ELSE 0 END) AS Off_Rtng_Val,
                   SUM(CASE WHEN Ordertype =  'Online' THEN RATING ELSE 0 END) AS On_Rtng_Val
            FROM {prefix}salesorder O
            GROUP BY O.SalesOrderID, O.customer_id, O.StoreID, O.Date
        """,
        "ordr_dtl_fct": f"""
            SELECT {cyc}, OI.PRODUCTID AS Prdct_ID, O.SalesOrderID AS Ordr_ID,
                   O.customer_id AS Cust_ID, O.StoreID AS Str_ID, O.Date AS Act_Perd_Dt,
                   SUM(OI.GROSSAMOUNT) AS Sale_Amt, SUM(OI.QUANTITY) AS Prdct_Cnt
            FROM {prefix}salesorderitems OI
            JOIN {prefix}salesorder O ON O.SalesOrderID = OI.SalesOrderID
            GROUP BY OI.PRODUCTID, O.SalesOrderID, O.customer_id, O.StoreID, O.Date
        """,
        "cust_dim": f"""
            SELECT {cyc}, customer_id AS Cust_ID, first_name AS Cust_F_Nm,
                   last_name AS Cust_L_Nm, gender AS Cust_Gndr, DOB AS Cust_Brth_Dt,
                   Age AS Cust_Age, Agerange AS Cust_Age_Grp
            FROM {prefix}customer
        """,
        "str_dim": f"""
            SELECT {cyc}, S.StoreID AS Str_ID, S.phone AS Str_Phn_Nbr,
                   S.manager AS Str_Mngr_Nm, A.CITY AS Str_City,
                   A.COUNTRY AS Str_Cntry, A.REGION AS Str_Rgn, A.POSTALCODE AS Str_Zip
            FROM {prefix}store S LEFT JOIN {prefix}address A ON S.AddressID = A.ADDRESSID
        """,
        "prdct_dim": f"""
            SELECT {cyc}, P.PRODUCTID AS Prdct_ID, PD.PRODUCT_NAME AS Prdct_Nm,
                   P.PRICE AS Prdct_Cst, PC.PRODCATEGORYNAME AS Prdct_Ctg_Nm,
                   BP.COMPANYNAME AS Ptrn_Nm, BP.EMAILADDRESS AS Ptnr_Email,
                   A.CITY AS Ptnr_City, A.COUNTRY AS Ptnr_Cntry,
                   A.REGION AS Ptnr_Rgn, A.POSTALCODE AS Ptnr_Zip
            FROM {prefix}product P
            LEFT JOIN {prefix}productcategory PC ON P.PRODCATEGORYID = PC.PRODCATEGORYID
            LEFT JOIN {prefix}productdetail PD ON P.PRODUCTID = PD.PRODUCTID
            LEFT JOIN {prefix}businesspartner BP ON P.PARTNERID = BP.PARTNERID
            LEFT JOIN {prefix}address A ON BP.ADDRESSID = A.ADDRESSID
            WHERE P.CURRENT_FLAG = 1
        """,
        "act_perd_dim": f"""
            SELECT {cyc}, date AS Act_Perd_Dt, date_day AS Act_Perd_Day,
                   date_weekdayid AS Act_Perd_Wk_Day_Nbr, date_weekday AS Act_Perd_Wk_Day,
                   date_week AS Act_Perd_Wk, date_quarter AS Act_Perd_Qtr_Nbr,
                   CONCAT('Q', CAST(date_quarter AS STRING)) AS Act_Perd_Qtr_Nm,
                   date_year AS Act_Perd_Yr,
                   date_year * 100 + date_month AS Act_Perd_Yr_Mo_Nbr,
                   date_month AS Act_Perd_Mo_Nbr, date_monthname AS Act_Perd_Mo,
                   CASE WHEN date_year = YEAR(DATE'{as_of_date}') THEN 'Y' ELSE 'N' END AS Act_Perd_CYTD,
                   CASE WHEN date_year = YEAR(DATE'{as_of_date}') - 1 THEN 'Y' ELSE 'N' END AS Act_Perd_PYTD,
                   CASE WHEN date > {sow.format(aod=as_of_date, k=0)} THEN 'Y' ELSE 'N' END AS Act_Perd_CW,
                   CASE WHEN date > {sow.format(aod=as_of_date, k=1)} THEN 'Y' ELSE 'N' END AS Act_Perd_PW,
                   CASE WHEN date > {sow.format(aod=as_of_date, k=4)} THEN 'Y' ELSE 'N' END AS Act_Perd_4W,
                   CASE WHEN date > {sow.format(aod=as_of_date, k=13)} THEN 'Y' ELSE 'N' END AS Act_Perd_13W
            FROM {prefix}datetab
        """,
    }


def run_dw_sql(
    spark: SparkSession, name: str, run_ts: str, as_of_date: str
) -> DataFrame:
    return spark.sql(dw_sql(run_ts, as_of_date)[name])
