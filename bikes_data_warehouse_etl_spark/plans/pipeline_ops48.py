"""Round-4 batch 48: derandomized permutation test, offline greedy
bandit replay with hindsight regret, and difference-in-differences
with a pre-trend check.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Derandomized permutation test: priority effect on order value
# ---------------------------------------------------------------------------
_PT_PERMS = 32

_SQL_PERMUTATION = f"""
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS grp,
               {_sql_hash64("CAST(o_orderkey AS VARCHAR)")} AS h
        FROM orders),
    obs AS (
        SELECT {_sdiv_sql("SUM(CASE WHEN grp = 1 THEN cents ELSE 0 END)",
                          "GREATEST(SUM(grp), 1)")}
               - {_sdiv_sql(
                   "SUM(CASE WHEN grp = 0 THEN cents ELSE 0 END)",
                   "GREATEST(SUM(1 - grp), 1)")} AS d
        FROM o),
    perm AS (
        SELECT t.j,
               {_sdiv_sql(
                   "SUM(CASE WHEN (o.h >> t.j) & 1 = 1 THEN cents"
                   " ELSE 0 END)",
                   "GREATEST(SUM(CASE WHEN (o.h >> t.j) & 1 = 1"
                   " THEN 1 ELSE 0 END), 1)")}
               - {_sdiv_sql(
                   "SUM(CASE WHEN (o.h >> t.j) & 1 = 0 THEN cents"
                   " ELSE 0 END)",
                   "GREATEST(SUM(CASE WHEN (o.h >> t.j) & 1 = 0"
                   " THEN 1 ELSE 0 END), 1)")} AS d
        FROM o, generate_series(0, {_PT_PERMS} - 1) AS t(j)
        GROUP BY 1)
    SELECT CAST(obs.d AS BIGINT) AS obs_diff_cents,
           CAST(SUM(CASE WHEN abs(perm.d) >= abs(obs.d)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_perms_ge,
           CAST((SUM(CASE WHEN abs(perm.d) >= abs(obs.d)
                          THEN 1 ELSE 0 END) + 1) * 1000
                // ({_PT_PERMS} + 1) AS BIGINT) AS p_milli
    FROM perm, obs
    GROUP BY obs.d
    """


@_q("permutation_test_priority", _SQL_PERMUTATION)
def q_permutation_test_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DERANDOMIZED PERMUTATION TEST: does urgent/high priority shift
    mean order value? The observed group-mean gap is compared against
    32 REFERENCE assignments, each relabeling every order by one BIT
    of its portable content hash (bit j of hash64(orderkey) — i.i.d.
    fair coins under the null, reproducible on any engine and any
    run, the same derandomization as `poisson_bootstrap_ci`). The
    add-one p-value (B+1 rule) in milli. The assignment-level
    companion of `mann_whitney_eras`: that test uses rank theory for
    its null; this MANUFACTURES the null from the data, which
    generalizes to any statistic.

    Scale: the 32 relabelings ride ONE fan-out of the order stream
    (32× rows, each a bit-shift of an already-computed hash), all
    collapsing in a single map-side-combined aggregate to 32 rows —
    the bounded-replicate pattern; more permutations widen the
    constant, never add a pass. The hash is computed once per row.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("grp"),
        hash64(F.col("o_orderkey").cast("string")).alias("h"),
    )
    obs = o.agg(
        F.expr(
            _sdiv_expr(
                "SUM(CASE WHEN grp = 1 THEN cents ELSE 0 END)",
                "GREATEST(SUM(grp), 1)",
            )
            + " - "
            + _sdiv_expr(
                "SUM(CASE WHEN grp = 0 THEN cents ELSE 0 END)",
                "GREATEST(SUM(1 - grp), 1)",
            )
        ).alias("d_obs")
    )
    perm = (
        o.select(
            "cents",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(_PT_PERMS - 1))).alias("j"),
        )
        .groupBy("j")
        .agg(
            F.expr(
                _sdiv_expr(
                    "SUM(CASE WHEN (h >> j) & 1 = 1 THEN cents ELSE 0 END)",
                    "GREATEST(SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1"
                    " ELSE 0 END), 1)",
                )
                + " - "
                + _sdiv_expr(
                    "SUM(CASE WHEN (h >> j) & 1 = 0 THEN cents ELSE 0 END)",
                    "GREATEST(SUM(CASE WHEN (h >> j) & 1 = 0 THEN 1"
                    " ELSE 0 END), 1)",
                )
            ).alias("d")
        )
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .agg(
            F.first("d_obs").alias("d_obs"),
            F.sum(
                (F.abs(F.col("d")) >= F.abs(F.col("d_obs"))).cast("long")
            )
            .cast("long")
            .alias("nge"),
        )
        .selectExpr(
            "CAST(d_obs AS BIGINT) AS obs_diff_cents",
            "CAST(nge AS BIGINT) AS n_perms_ge",
            f"CAST((nge + 1) * 1000 div ({_PT_PERMS} + 1) AS BIGINT)"
            " AS p_milli",
        )
    )


# ---------------------------------------------------------------------------
# Offline greedy bandit replay with hindsight regret
# ---------------------------------------------------------------------------
_SQL_BANDIT = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               c_mktsegment AS arm,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM daily),
    arms AS (SELECT DISTINCT arm FROM daily),
    grid AS (
        SELECT d.day, a.arm, COALESCE(x.cents, 0) AS cents
        FROM days d CROSS JOIN arms a
        LEFT JOIN daily x ON x.day = d.day AND x.arm = a.arm),
    cum AS (
        SELECT day, arm, cents,
               CAST(COALESCE(SUM(cents) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS prior
        FROM grid),
    pick AS (
        SELECT day, arm, cents,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY prior DESC, arm) AS rk
        FROM cum)
    SELECT CAST(SUM(CASE WHEN rk = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS replay_cents,
           CAST(MAX(fixed.best) AS BIGINT) AS best_fixed_cents,
           CAST(MAX(fixed.best)
                - SUM(CASE WHEN rk = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS regret_cents,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
    FROM pick,
         (SELECT MAX(s) AS best FROM (
              SELECT CAST(SUM(cents) AS BIGINT) AS s
              FROM daily GROUP BY arm)) fixed
    """


@_q("bandit_replay_greedy", _SQL_BANDIT)
def q_bandit_replay_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFLINE BANDIT REPLAY: a greedy policy that each day stakes on
    the market segment with the highest CUMULATIVE revenue so far
    (strictly prior days only — no peeking; deterministic
    alphabetical tie-break on day one) is replayed against the log,
    and its haul compared to the best FIXED arm in hindsight — the
    regret. This is the counterfactual-evaluation shape behind every
    "what would policy X have earned" readout (`decile_lift` scores a
    static model; this scores a SEQUENTIAL decision rule), with
    greedy's known failure mode — early-leader lock-in — measurable
    in the regret column.

    Scale: the replay is NOT sequential compute: the full decision
    sequence materializes from one cumulative window over the
    day × arm grid (calendar-bounded, ≤5 arms), because greedy's
    state is a prefix sum. Policies whose state feeds back into
    rewards (learning rates, epsilon schedules) leave SQL and take
    the `inventory_clamped_balance` route — reflection when algebra
    allows, `applyInPandas` per shard otherwise.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", F.col("c_mktsegment").alias("arm")
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            "arm",
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    days = daily.select("day").distinct()
    arms = daily.select("arm").distinct()
    grid = (
        days.crossJoin(F.broadcast(arms))
        .join(daily, ["day", "arm"], "left")
        .select(
            "day", "arm", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
        )
    )
    aw = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "day",
        "arm",
        "cents",
        F.coalesce(F.sum("cents").over(aw), F.lit(0))
        .cast("long")
        .alias("prior"),
    )
    pick = cum.select(
        "day",
        "arm",
        "cents",
        F.row_number()
        .over(Window.partitionBy("day").orderBy(F.col("prior").desc(), "arm"))
        .alias("rk"),
    )
    fixed = daily.groupBy("arm").agg(
        F.sum("cents").cast("long").alias("s")
    ).agg(F.max("s").cast("long").alias("best"))
    return (
        pick.crossJoin(F.broadcast(fixed))
        .agg(
            F.sum(F.when(F.col("rk") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("replay_cents"),
            F.max("best").cast("long").alias("best_fixed_cents"),
            F.countDistinct("day").cast("long").alias("n_days"),
        )
        .selectExpr(
            "replay_cents",
            "best_fixed_cents",
            "CAST(best_fixed_cents - replay_cents AS BIGINT)"
            " AS regret_cents",
            "n_days",
        )
        .select(
            "replay_cents", "best_fixed_cents", "regret_cents", "n_days"
        )
    )


# ---------------------------------------------------------------------------
# Difference-in-differences with pre-trend check
# ---------------------------------------------------------------------------
_DID_T = "NATION_2"
_DID_C = "NATION_7"

_SQL_DID = f"""
    WITH m AS (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                    + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS mabs,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name IN ('{_DID_T}', '{_DID_C}')
        GROUP BY 1, 2),
    b AS (SELECT (MIN(mabs) + MAX(mabs)) // 2 AS cut FROM m),
    cell AS (
        SELECT CASE WHEN nation = '{_DID_T}' THEN 1 ELSE 0 END AS treated,
               CASE WHEN mabs > (SELECT cut FROM b) THEN 1 ELSE 0 END
                   AS post,
               {_sdiv_sql("SUM(cents)", "COUNT(*)")} AS mean_cents
        FROM m GROUP BY 1, 2),
    did AS (
        SELECT CAST(SUM(CASE WHEN treated = 1 AND post = 1
                             THEN mean_cents ELSE 0 END)
                  - SUM(CASE WHEN treated = 1 AND post = 0
                             THEN mean_cents ELSE 0 END)
                  - SUM(CASE WHEN treated = 0 AND post = 1
                             THEN mean_cents ELSE 0 END)
                  + SUM(CASE WHEN treated = 0 AND post = 0
                             THEN mean_cents ELSE 0 END) AS BIGINT) AS d
        FROM cell),
    pre AS (
        SELECT CASE WHEN nation = '{_DID_T}' THEN 1 ELSE 0 END AS treated,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mabs) AS BIGINT) AS sx,
               CAST(SUM(cents // 1000) AS BIGINT) AS sy,
               CAST(SUM(mabs * (cents // 1000)) AS BIGINT) AS sxy,
               CAST(SUM(mabs * mabs) AS BIGINT) AS sxx
        FROM m WHERE mabs <= (SELECT cut FROM b)
        GROUP BY 1),
    slopes AS (
        SELECT treated,
               {_sdiv_sql("(n * sxy - sx * sy) * 1000",
                          "GREATEST(n * sxx - sx * sx, 1)")} AS slope_milli
        FROM pre)
    SELECT CAST(did.d AS BIGINT) AS did_cents,
           CAST(MAX(CASE WHEN treated = 1 THEN slope_milli END)
              - MAX(CASE WHEN treated = 0 THEN slope_milli END) AS BIGINT)
               AS pre_trend_gap_milli_kc
    FROM slopes, did
    GROUP BY did.d
    """


@_q("did_nations", _SQL_DID)
def q_did_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES: the treated nation's post-period
    shift in mean monthly revenue net of the control nation's shift —
    the workhorse causal estimate for "the campaign launched
    mid-window in market T; market C never got it" — plus the
    assumption audit every DiD needs: the PRE-period slope gap
    (parallel-trends check, via `ols_discount_quantity`'s integer
    sufficient sums on kilocent months). A large pre-gap invalidates
    the estimate before anyone reads it. `ab_test_readout` compares
    randomized arms at one time; DiD rescues the NON-randomized
    rollout using time × control.

    Scale: one dimension-filtered fact pass to a ≤|months|×2 census;
    the four cell means and two slopes are mergeable sums over that
    census. The month cut broadcasts as a 1-row frame. Nothing here
    grows with fact cardinality.
    """
    m = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation")
                .where(F.col("n_name").isin(_DID_T, _DID_C))
                .select("n_nationkey", F.col("n_name").alias("nation"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "nation",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("mabs"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    b = m.agg(
        F.expr("(MIN(mabs) + MAX(mabs)) div 2").cast("long").alias("cut")
    )
    mc = m.crossJoin(F.broadcast(b))
    cell = mc.groupBy(
        (F.col("nation") == _DID_T).cast("long").alias("treated"),
        (F.col("mabs") > F.col("cut")).cast("long").alias("post"),
    ).agg(
        F.expr(_sdiv_expr("SUM(cents)", "COUNT(*)")).alias("mean_cents")
    )
    did = cell.agg(
        F.expr(
            "CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN mean_cents"
            " ELSE 0 END)"
            " - SUM(CASE WHEN treated = 1 AND post = 0 THEN mean_cents"
            " ELSE 0 END)"
            " - SUM(CASE WHEN treated = 0 AND post = 1 THEN mean_cents"
            " ELSE 0 END)"
            " + SUM(CASE WHEN treated = 0 AND post = 0 THEN mean_cents"
            " ELSE 0 END) AS BIGINT)"
        ).alias("d")
    )
    pre = (
        mc.where(F.col("mabs") <= F.col("cut"))
        .groupBy((F.col("nation") == _DID_T).cast("long").alias("treated"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("mabs").cast("long").alias("sx"),
            F.sum(F.expr("cents div 1000")).cast("long").alias("sy"),
            F.sum(F.expr("mabs * (cents div 1000)"))
            .cast("long")
            .alias("sxy"),
            F.sum(F.col("mabs") * F.col("mabs")).cast("long").alias("sxx"),
        )
    )
    slopes = pre.select(
        "treated",
        F.expr(
            _sdiv_expr(
                "(n * sxy - sx * sy) * 1000",
                "GREATEST(n * sxx - sx * sx, 1)",
            )
        ).alias("slope_milli"),
    )
    return (
        slopes.crossJoin(F.broadcast(did))
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(MAX(CASE WHEN treated = 1 THEN slope_milli END)"
                " - MAX(CASE WHEN treated = 0 THEN slope_milli END)"
                " AS BIGINT)"
            ).alias("pre_trend_gap_milli_kc")
        )
        .select(
            F.col("d").cast("long").alias("did_cents"),
            "pre_trend_gap_milli_kc",
        )
    )
