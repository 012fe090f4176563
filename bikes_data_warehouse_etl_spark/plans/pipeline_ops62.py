"""Round-4 batch 62: chunked bitmap-index overlap (the >64-element
domain path promised by `bitset_week_overlap`), part launch cohorts,
and the catalog survival curve.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Chunked weekly bitmaps over the full two-year horizon
# ---------------------------------------------------------------------------
_SQL_BITSET_CHUNKED = """
    WITH wk AS (
        SELECT cn.n_name AS nation,
               CAST(date_diff('day', DATE '2000-01-01', o_orderdate) // 7
                   AS BIGINT) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
          AND o_orderdate < TIMESTAMP '2002-01-01'
          AND l_returnflag = 'R'),
    bm AS (
        SELECT nation, CAST(w // 63 AS BIGINT) AS chunk,
               CAST(bit_or(CAST(1 AS BIGINT) << CAST(w % 63 AS INTEGER))
                   AS BIGINT) AS bits
        FROM wk GROUP BY 1, 2),
    pair AS (
        SELECT a.nation AS nation_a, b.nation AS nation_b,
               CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS inter,
               CAST(SUM(bit_count(a.bits | b.bits)) AS BIGINT) AS uni
        FROM bm a JOIN bm b
          ON a.chunk = b.chunk AND a.nation < b.nation
        GROUP BY 1, 2)
    SELECT nation_a, nation_b, inter AS weeks_both, uni AS weeks_either,
           CAST(inter * 10000 // GREATEST(uni, 1) AS BIGINT) AS jaccard_bp
    FROM pair
    """


@_q("bitset_chunked_overlap", _SQL_BITSET_CHUNKED)
def q_bitset_chunked_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNKED BITMAP INDEX: the 104-week two-year return-activity
    domain no longer fits one machine word, so each nation's week set
    splits into (week div 63) CHUNKS of 63-bit words (bit 63 stays
    clear: a signed-int64 left shift into the sign bit overflows
    DuckDB and silently wraps in Spark — 63 usable bits per word is
    the portable container width) — exactly
    roaring's container scheme — and pairwise Jaccard becomes a
    chunk-aligned join whose intersections/unions SUM across chunks
    (bit_count is additive over disjoint containers). This delivers
    the upgrade `bitset_week_overlap`'s docstring promises: set
    algebra on unbounded element domains at 8 bytes per 63 elements,
    the reason bitmap indexes beat row joins for segment-overlap
    workloads at any scale.

    Scale: one filtered fact pass to (nation, chunk) words —
    map-side bit_or, ≤2 words per nation here, |domain|/63 in
    general; the pairwise stage joins ≤25×25 word-pairs per chunk.
    Densely-populated chunks stay words; sparse chunks would switch
    to array containers (roaring's other half) — the censused shape
    is identical.
    """
    wk = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .join(
            _t(spark, sf_dir, "orders")
            .where(
                (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp"))
            )
            .select(
                "o_orderkey",
                "o_custkey",
                F.floor(
                    F.datediff(
                        F.col("o_orderdate"),
                        F.lit("2000-01-01").cast("date"),
                    )
                    / 7
                )
                .cast("long")
                .alias("w"),
            ),
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
        .select("nation", "w")
    )
    bm = wk.groupBy(
        "nation", F.expr("CAST(w div 63 AS BIGINT)").alias("chunk")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(w % 63 AS INT)))"
        ).alias("bits")
    )
    a = bm.select(
        F.col("nation").alias("nation_a"),
        F.col("chunk").alias("ca"),
        F.col("bits").alias("ba"),
    )
    b = bm.select(
        F.col("nation").alias("nation_b"),
        F.col("chunk").alias("cb"),
        F.col("bits").alias("bb"),
    )
    pair = (
        a.join(
            F.broadcast(b),
            (F.col("ca") == F.col("cb"))
            & (F.col("nation_a") < F.col("nation_b")),
        )
        .groupBy("nation_a", "nation_b")
        .agg(
            F.expr("CAST(SUM(bit_count(ba & bb)) AS BIGINT)").alias(
                "inter"
            ),
            F.expr("CAST(SUM(bit_count(ba | bb)) AS BIGINT)").alias("uni"),
        )
    )
    return pair.selectExpr(
        "nation_a",
        "nation_b",
        "inter AS weeks_both",
        "uni AS weeks_either",
        "CAST(inter * 10000 div GREATEST(uni, 1) AS BIGINT) AS jaccard_bp",
    )


# ---------------------------------------------------------------------------
# Part launch cohorts: catalog introduction pacing and early ramp
# ---------------------------------------------------------------------------
_SQL_LAUNCH = """
    WITH first_ship AS (
        SELECT l_partkey AS pk,
               CAST(MIN(date_diff('day', DATE '1970-01-01', l_shipdate))
                   AS BIGINT) AS d0
        FROM lineitem GROUP BY 1),
    ramp AS (
        SELECT f.pk, f.d0,
               CAST(SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                            l.l_shipdate) < f.d0 + 90
                             THEN CAST(l.l_quantity AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS qty_90d
        FROM first_ship f JOIN lineitem l ON l.l_partkey = f.pk
        GROUP BY 1, 2),
    cohort AS (
        SELECT CAST(d0 // 91 AS BIGINT) AS launch_quarter,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(qty_90d) AS BIGINT) AS total_ramp_qty
        FROM ramp GROUP BY 1)
    SELECT launch_quarter, n_parts, total_ramp_qty,
           CAST(total_ramp_qty * 1000 // n_parts AS BIGINT)
               AS ramp_per_part_milli
    FROM cohort
    """


@_q("part_launch_cohorts", _SQL_LAUNCH)
def q_part_launch_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PART LAUNCH COHORTS: parts grouped by the quarter of their
    FIRST shipment, with the cohort's 90-day ramp volume — the
    catalog-side cohort view (`cohort_ltv` does this for customers):
    introduction pacing per quarter and whether newer vintages ramp
    faster, the assortment-planning read. First-quarter cohorts are
    left-censored (the part may predate the data) — the launch-
    quarter key makes that visible rather than hiding it.

    Scale: the first-ship census is one part-keyed MIN; the ramp
    join is part-keyed fact⋈census with a row-local window
    predicate; cohorts are a ≤9-cell rollup. No windows over fact
    rows.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    first_ship = li.groupBy("pk").agg(F.min("d").cast("long").alias("d0"))
    ramp = (
        li.join(first_ship, "pk")
        .groupBy("pk", "d0")
        .agg(
            F.sum(
                F.when(F.col("d") < F.col("d0") + 90, F.col("q")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("qty_90d")
        )
    )
    cohort = ramp.groupBy(
        F.expr("CAST(d0 div 91 AS BIGINT)").alias("launch_quarter")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("qty_90d").cast("long").alias("total_ramp_qty"),
    )
    return cohort.selectExpr(
        "launch_quarter",
        "n_parts",
        "total_ramp_qty",
        "CAST(total_ramp_qty * 1000 div n_parts AS BIGINT)"
        " AS ramp_per_part_milli",
    )


# ---------------------------------------------------------------------------
# Catalog survival curve: share of parts still active k quarters in
# ---------------------------------------------------------------------------
_SQL_PART_SURVIVAL = """
    WITH lif AS (
        SELECT l_partkey AS pk,
               CAST(MIN(date_diff('day', DATE '1970-01-01', l_shipdate))
                   AS BIGINT) AS d0,
               CAST(MAX(date_diff('day', DATE '1970-01-01', l_shipdate))
                   AS BIGINT) AS d1
        FROM lineitem GROUP BY 1),
    h AS (SELECT MAX(d1) AS horizon FROM lif),
    ages AS (
        SELECT lif.pk,
               (lif.d1 - lif.d0) // 91 AS active_q,
               (h.horizon - lif.d0) // 91 AS observable_q
        FROM lif, h)
    SELECT CAST(k.k AS BIGINT) AS age_quarters,
           CAST(SUM(CASE WHEN ages.observable_q >= k.k THEN 1 ELSE 0 END)
               AS BIGINT) AS n_at_risk,
           CAST(SUM(CASE WHEN ages.observable_q >= k.k
                          AND ages.active_q >= k.k
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
           CAST(SUM(CASE WHEN ages.observable_q >= k.k
                          AND ages.active_q >= k.k
                         THEN 1 ELSE 0 END) * 10000
                // GREATEST(SUM(CASE WHEN ages.observable_q >= k.k
                                     THEN 1 ELSE 0 END), 1) AS BIGINT)
               AS survival_bp
    FROM ages, generate_series(1, 7) AS k(k)
    GROUP BY 1
    """


@_q("part_survival_curve", _SQL_PART_SURVIVAL)
def q_part_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG SURVIVAL CURVE: of the parts OBSERVABLE for at least k
    quarters (launched ≥ k quarters before the horizon — the
    risk-set correction that naive "share still active" plots skip,
    and the same right-censoring discipline Kaplan–Meier formalizes),
    the share whose active span (first→last shipment) reached k
    quarters. Read with `part_launch_cohorts` (births) and
    `dead_stock_detection` (current deaths), this is the lifetime
    distribution between them — the catalog's actuarial table.

    Scale: one part-keyed MIN/MAX census, a broadcast horizon, a
    7-way row-local fan-out into a ≤7-cell rollup — counting, not
    windows; denominator and numerator share the one census pass.
    """
    lif = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_partkey").alias("pk")
    ).agg(
        F.min(
            F.datediff(
                F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
        )
        .cast("long")
        .alias("d0"),
        F.max(
            F.datediff(
                F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
        )
        .cast("long")
        .alias("d1"),
    )
    h = lif.agg(F.max("d1").alias("horizon"))
    ages = lif.crossJoin(F.broadcast(h)).selectExpr(
        "(d1 - d0) div 91 AS active_q",
        "(horizon - d0) div 91 AS observable_q",
    )
    ks = lif.sparkSession.range(1, 8).select(
        F.col("id").cast("long").alias("k")
    )
    return (
        ages.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum((F.col("observable_q") >= F.col("k")).cast("long"))
            .cast("long")
            .alias("n_at_risk"),
            F.sum(
                (
                    (F.col("observable_q") >= F.col("k"))
                    & (F.col("active_q") >= F.col("k"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_surviving"),
        )
        .selectExpr(
            "k AS age_quarters",
            "n_at_risk",
            "n_surviving",
            "CAST(n_surviving * 10000 div GREATEST(n_at_risk, 1)"
            " AS BIGINT) AS survival_bp",
        )
    )
