"""Round-4 batch 40: customer-lifecycle and smoothing primitives —
RFM quintile segmentation, consecutive-month order streaks
(gaps-and-islands), and an exact dyadic-weight EWMA of daily revenue.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# RFM quintile segmentation
# ---------------------------------------------------------------------------
_SQL_RFM = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', MAX(o_orderdate),
                              (SELECT MAX(o_orderdate) FROM orders))
                   AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS monetary_cents
        FROM orders GROUP BY 1),
    scored AS (
        SELECT NTILE(5) OVER (ORDER BY recency_days ASC,  o_custkey) AS r,
               NTILE(5) OVER (ORDER BY frequency   DESC, o_custkey) AS f,
               NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m,
               monetary_cents
        FROM per_cust)
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored GROUP BY 1, 2, 3
    """


@_q("rfm_segments", _SQL_RFM)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION: every ordering customer scored into recency /
    frequency / monetary quintiles (1 = best on each axis, ties broken
    by custkey so both engines cut identical quintiles), then the
    census of the ≤125 (r,f,m) cells with member count and cell
    revenue — the lifecycle map marketing reads to find "champions"
    (1,1,1) and "at-risk big spenders" (5,·,1). The
    customer-lifecycle sibling of `decile_lift` (one score, lift per
    decile) — this crosses three scores into segments.

    Scale: one orders scan to a custkey-keyed map-side-combined
    rollup; the three NTILEs are windows over the CUSTOMER table, not
    the fact stream. Like the other full-order windows
    (`value_histogram`'s rank note), a global sort over customers is
    the honest cost at this output's exactness; the histogram-rank
    upgrade (bucket counts → cumulative offsets) replaces the sort at
    the 10⁹-customer mark. The final census is ≤125 cells, fully
    map-side combined.
    """
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_dt"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_dt")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    scored = per_cust.select(
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
        .cast("long")
        .alias("r"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .cast("long")
        .alias("f"),
        F.ntile(5)
        .over(
            Window.orderBy(F.col("monetary_cents").desc(), F.col("o_custkey"))
        )
        .cast("long")
        .alias("m"),
        "monetary_cents",
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
    )


# ---------------------------------------------------------------------------
# Consecutive-month order streaks (gaps-and-islands)
# ---------------------------------------------------------------------------
_SQL_STREAKS = """
    WITH cm AS (
        SELECT DISTINCT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                    + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS midx
        FROM orders),
    isl AS (
        SELECT o_custkey,
               midx - DENSE_RANK() OVER (
                   PARTITION BY o_custkey ORDER BY midx) AS island
        FROM cm),
    runs AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY o_custkey, island),
    best AS (
        SELECT o_custkey, CAST(MAX(run_len) AS BIGINT) AS best_streak
        FROM runs GROUP BY 1)
    SELECT best_streak AS streak_months,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM best GROUP BY 1
    """


@_q("order_streaks", _SQL_STREAKS)
def q_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: each customer's longest run of CONSECUTIVE
    calendar months with at least one order (month-index minus
    dense-rank is constant exactly within a consecutive run), rolled
    up to the distribution of best streaks — the classic engagement
    question ("how many customers ever sustained a 6-month habit?")
    and the canonical SQL-pattern test the reference's warehouse
    would answer with the same three-level window/group stack.
    `user_retention_weekly` measures return AT a lag; this measures
    the LENGTH of uninterrupted presence.

    Scale: ONE customer-keyed shuffle. `collect_set(midx)` dedups the
    order fan-out INSIDE the aggregate (partial sets on the wire are
    ≤84 longs per customer — calendar-bounded), and the longest
    consecutive run is then a row-local `aggregate()` fold over the
    sorted month set (run extends iff m = prev+1), codegen'd JVM-side.
    The oracle keeps the classic three-level island/window SQL as the
    judge-side spec; the hash match proves the fold computes the same
    streaks. The round-4 formulation (distinct → dense_rank window →
    two rollups) paid three fact-scale shuffles and a per-customer
    sort; the fold pays the one collect_set shuffle plus a ≤84-cell
    census rollup (sf10: 47 s → 4 s measured, same hash).
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            )
            .cast("long")
            .alias("midx"),
        )
        .groupBy("o_custkey")
        .agg(F.collect_set("midx").alias("ms"))
    )
    # fold over the sorted month set: run extends iff m = prev + 1;
    # the -2 seed can never be prev+1 of a real month index ≥ 0
    best = per_cust.select(
        F.expr(
            """
            aggregate(
              array_sort(ms),
              struct(cast(-2 as bigint) as prev, cast(0 as bigint) as run,
                     cast(0 as bigint) as best),
              (acc, m) -> struct(
                m as prev,
                if(m = acc.prev + 1, acc.run + 1, 1L) as run,
                greatest(acc.best,
                         if(m = acc.prev + 1, acc.run + 1, 1L)) as best),
              acc -> acc.best)
            """
        )
        .cast("long")
        .alias("best_streak")
    )
    return best.groupBy(F.col("best_streak").alias("streak_months")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Exact dyadic-weight EWMA of daily revenue
# ---------------------------------------------------------------------------
_EWMA_W = 20  # window length; weight for lag i is 2^(W-1-i)

_SQL_EWMA = f"""
    WITH rev AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT MIN(day) FROM rev),
                   (SELECT MAX(day) FROM rev))) AS BIGINT) AS day),
    contrib AS (
        SELECT r.day + t.i AS day,
               CAST(r.cents * (CAST(1 AS BIGINT)
                               << ({_EWMA_W} - 1 - t.i)) AS BIGINT) AS w
        FROM rev r, generate_series(0, {_EWMA_W} - 1) AS t(i)),
    num AS (
        SELECT day, CAST(SUM(w) AS BIGINT) AS num
        FROM contrib GROUP BY 1)
    SELECT s.day AS day,
           CAST(COALESCE(r.cents, 0) AS BIGINT) AS rev_cents,
           -- (num*1000) div D without the intermediate overflow:
           -- a*k div d == (a div d)*k + ((a mod d)*k) div d, exactly
           CAST((COALESCE(n.num, 0) // ((CAST(1 AS BIGINT) << {_EWMA_W}) - 1))
                    * 1000
                + (COALESCE(n.num, 0) % ((CAST(1 AS BIGINT) << {_EWMA_W}) - 1))
                    * 1000 // ((CAST(1 AS BIGINT) << {_EWMA_W}) - 1)
               AS BIGINT) AS ewma_milli_cents
    FROM spine s
    LEFT JOIN rev r ON r.day = s.day
    LEFT JOIN num n ON n.day = s.day
    """


@_q("ewma_revenue_dyadic", _SQL_EWMA)
def q_ewma_revenue_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT EWMA: a 20-day exponentially weighted moving average of
    daily order revenue with α = 1/2 — every weight is the integer
    power 2^(19-lag), so the smoother is pure int64 arithmetic and the
    two engines agree bit-for-bit (no float pow, no summation-order
    drift). Gap days smooth toward zero through the full calendar
    spine. The trend companion to `rolling_7d_revenue` (uniform
    window) and `decayed_event_counts` (shift-based decay at event
    grain): dyadic weights make exponential smoothing EXACT.

    Scale: the smoother is an equi-join, not a window — each daily
    total fans out to exactly 20 (day+i, cents·2^(19-i)) contribution
    rows which group back by target day, so the plan is two
    calendar-keyed shuffles with map-side combine and NO global sort;
    a cluster smooths a 10-year spine per product line by adding the
    line key to every join. Overflow: daily cents ≤ ~9·10¹³ stays
    exact under the 2¹⁹ top weight; at larger daily volumes floor to
    dollars first (the `daily_anomaly_flags` fix).
    """
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("cents"))
        # the daily census feeds THREE consumers (bounds, contrib, the
        # final spine join); without materialization each one re-runs
        # the full orders scan + day shuffle (sf10 measured 3×). A lazy
        # localCheckpoint pins the ~|days| rows once — the
        # `pagerank_suppliers` edge-set pattern.
        .localCheckpoint(eager=False)
    )
    bounds = rev.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    contrib = rev.select(
        "day",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_EWMA_W - 1))).alias("i"),
    ).select(
        (F.col("day") + F.col("i")).alias("day"),
        (
            F.col("cents")
            * F.expr(f"shiftleft(CAST(1 AS BIGINT), {_EWMA_W} - 1 - i)")
        ).alias("w"),
    )
    num = contrib.groupBy("day").agg(F.sum("w").cast("long").alias("num"))
    return (
        spine.join(rev, "day", "left")
        .join(num, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias(
                "rev_cents"
            ),
            # (num*1000) div D via the split identity — num*1000 alone
            # overflows int64 at sf1 daily volumes (caught by the sf1
            # bench run); (a div d)*k + ((a mod d)*k) div d is exact
            F.expr(
                f"CAST((COALESCE(num, 0) div "
                f"(shiftleft(CAST(1 AS BIGINT), {_EWMA_W}) - 1)) * 1000"
                f" + (COALESCE(num, 0) % "
                f"(shiftleft(CAST(1 AS BIGINT), {_EWMA_W}) - 1)) * 1000 div "
                f"(shiftleft(CAST(1 AS BIGINT), {_EWMA_W}) - 1) AS BIGINT)"
            ).alias("ewma_milli_cents"),
        )
    )
