"""Round-4 batch 58: revenue milestone calendar, year-over-year spend-
quintile migration matrix, and the ordered string-aggregation surface.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Revenue milestone days: day-of-year each 10% of annual revenue lands
# ---------------------------------------------------------------------------
_SQL_MILESTONES = """
    WITH daily AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
    cum AS (
        SELECT yr, doy, cents,
               CAST(SUM(cents) OVER (PARTITION BY yr ORDER BY doy)
                   AS BIGINT) AS c,
               CAST(SUM(cents) OVER (PARTITION BY yr) AS BIGINT) AS t
        FROM daily),
    hits AS (
        SELECT cum.yr, k.k,
               CAST(MIN(cum.doy) AS BIGINT) AS milestone_doy
        FROM cum, generate_series(1, 9) AS k(k)
        WHERE cum.c * 10 >= cum.t * k.k
        GROUP BY 1, 2)
    SELECT yr, CAST(k AS BIGINT) AS decile_milestone, milestone_doy
    FROM hits
    """


@_q("milestone_days", _SQL_MILESTONES)
def q_milestone_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE MILESTONE CALENDAR: for each year, the first
    day-of-year by which 10%, 20%, …, 90% of that year's revenue had
    landed — the pacing curve finance reads against last year's
    ("we hit half-year revenue 9 days earlier than last year" is
    this table's row 5 differenced across years). A uniform year
    puts milestone k near day 36.5k; front-loaded demand pulls the
    early milestones down. The calendar-anchored cousin of
    `seasonal_index_monthly` (which normalizes the same shape into
    indices).

    Scale: the cumulative window runs per-year over the ≤366-day
    census (partitioned by year — parallel and bounded); the
    threshold scan is a 9-way fan-out over that census with a
    map-side MIN. Cross-multiplied (c·10 ≥ t·k) keeps the threshold
    integer-exact.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.dayofyear("o_orderdate").cast("long").alias("doy"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    yw = Window.partitionBy("yr")
    cum = daily.select(
        "yr",
        "doy",
        F.sum("cents").over(yw.orderBy("doy")).cast("long").alias("c"),
        F.sum("cents").over(yw).cast("long").alias("t"),
    )
    ks = daily.sparkSession.range(1, 10).select(
        F.col("id").cast("long").alias("k")
    )
    return (
        cum.crossJoin(F.broadcast(ks))
        .where(F.col("c") * 10 >= F.col("t") * F.col("k"))
        .groupBy("yr", F.col("k").alias("decile_milestone"))
        .agg(F.min("doy").cast("long").alias("milestone_doy"))
    )


# ---------------------------------------------------------------------------
# Year-over-year spend-quintile migration matrix
# ---------------------------------------------------------------------------
_SM_Y0 = 2000
_SM_Y1 = 2001

_SQL_MIGRATION = f"""
    WITH spend AS (
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) IN ({_SM_Y0}, {_SM_Y1})
        GROUP BY 1, 2),
    q AS (
        SELECT o_custkey, yr,
               NTILE(5) OVER (PARTITION BY yr
                              ORDER BY cents, o_custkey) AS quintile
        FROM spend),
    w AS (
        SELECT a.o_custkey,
               a.quintile AS q0, b.quintile AS q1
        FROM q a JOIN q b
          ON a.o_custkey = b.o_custkey
         AND a.yr = {_SM_Y0} AND b.yr = {_SM_Y1})
    SELECT CAST(q0 AS BIGINT) AS quintile_{_SM_Y0},
           CAST(q1 AS BIGINT) AS quintile_{_SM_Y1},
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM w GROUP BY 1, 2
    """


@_q("segment_migration", _SQL_MIGRATION)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT MIGRATION MATRIX: customers active in both {y0} and
    {y1}, cross-tabulated by their spend QUINTILE in each year — the
    5×5 transition matrix whose diagonal mass is loyalty-tier
    stickiness and whose off-diagonal flows are the upgrade/churn
    currents (a heavy (5→1) cell is whale collapse; (1→5) is the
    growth story). `rfm_segments` snapshots one period; this is the
    DYNAMICS between snapshots, and the input a Markov LTV projector
    multiplies forward. Ties break on custkey so both engines cut
    identical quintiles.

    Scale: year-filtered customer×year census; per-year NTILE windows
    (partitioned by year — the global-sort note of `rfm_segments`
    applies per partition); a self-join on custkey (both sides
    already customer-grain) and a ≤25-cell rollup.
    """
    spend = (
        _t(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(_SM_Y0, _SM_Y1))
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    q = spend.select(
        "o_custkey",
        "yr",
        F.ntile(5)
        .over(
            Window.partitionBy("yr").orderBy("cents", "o_custkey")
        )
        .alias("quintile"),
    )
    a = q.where(F.col("yr") == _SM_Y0).select(
        F.col("o_custkey").alias("ck"), F.col("quintile").alias("q0")
    )
    b = q.where(F.col("yr") == _SM_Y1).select(
        F.col("o_custkey").alias("ck2"), F.col("quintile").alias("q1")
    )
    return (
        a.join(b, F.col("ck") == F.col("ck2"))
        .groupBy(
            F.col("q0").cast("long").alias(f"quintile_{_SM_Y0}"),
            F.col("q1").cast("long").alias(f"quintile_{_SM_Y1}"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation surface
# ---------------------------------------------------------------------------
_SQL_LISTAGG = """
    WITH top_brands AS (
        SELECT cn.n_name AS nation, p.p_brand AS brand,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
               ROW_NUMBER() OVER (
                   PARTITION BY cn.n_name
                   ORDER BY SUM(CAST(l.l_quantity AS BIGINT)) DESC,
                            p.p_brand) AS rk
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        GROUP BY 1, 2)
    SELECT nation,
           string_agg(brand, ',' ORDER BY rk) AS top3_brands,
           CAST(SUM(q) AS BIGINT) AS top3_qty
    FROM top_brands WHERE rk <= 3
    GROUP BY 1
    """


@_q("ordered_listagg", _SQL_LISTAGG)
def q_ordered_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED STRING AGGREGATION: each nation's top-3 brands by
    shipped quantity, concatenated IN RANK ORDER into one
    deliverable string — the report-surface operator (listagg /
    string_agg) whose portability trap is ordering: an unordered
    concat hashes differently on every engine and every run, so this
    query pins the DETERMINISTIC form (explicit rank, explicit
    delimiter, rank-then-aggregate) that survives cross-engine
    comparison — proven by the hash gate itself. Spark side builds
    the same string via array_join(sort_by-rank collect), the
    engine's native route to ordered aggregation.

    Scale: the (nation, brand) census is bounded (25×25); the rank
    window partitions by nation; the string aggregation concatenates
    exactly 3 elements per group. The expensive part is the fact
    join chain — dims broadcast, one orderkey shuffle, one custkey
    shuffle, as in `local_supplier_volume`.
    """
    tb = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", F.col("l_quantity").cast("long").alias("q"))
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation", F.col("p_brand").alias("brand"))
        .agg(F.sum("q").cast("long").alias("q"))
    )
    ranked = tb.select(
        "nation",
        "brand",
        "q",
        F.row_number()
        .over(
            Window.partitionBy("nation").orderBy(
                F.col("q").desc(), "brand"
            )
        )
        .alias("rk"),
    ).where(F.col("rk") <= 3)
    return ranked.groupBy("nation").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rk", "brand"))
                ),
                lambda s: s.brand,
            ),
            ",",
        ).alias("top3_brands"),
        F.sum("q").cast("long").alias("top3_qty"),
    )
