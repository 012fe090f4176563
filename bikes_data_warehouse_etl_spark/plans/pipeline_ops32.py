"""Round-4 batch 32: community quality, distributed uncertainty
quantification, and one-pass data profiling — graph modularity of the
nation partition, a deterministic Poisson bootstrap CI, and a
stacked table profile.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Signed division uses the sign-abs form (pipeline_ops27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import (
    co_order_edges,
    sql_coorder_edge_ctes,
)
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Modularity of the nation partition over the co-order graph
# ---------------------------------------------------------------------------
_SQL_MODULARITY = f"""
    WITH {sql_coorder_edge_ctes()},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    nat AS (
        SELECT s_suppkey AS v, n_name AS nation
        FROM supplier JOIN nation ON s_nationkey = n_nationkey),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        GROUP BY 1),
    dsum AS (
        SELECT nat.nation, CAST(SUM(deg.d) AS BIGINT) AS d_c,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg JOIN nat ON deg.v = nat.v GROUP BY 1),
    intra AS (
        SELECT na.nation, CAST(COUNT(*) AS BIGINT) AS e_c
        FROM e
        JOIN nat na ON e.a = na.v
        JOIN nat nb ON e.b = nb.v
        WHERE na.nation = nb.nation
        GROUP BY 1)
    SELECT dsum.nation, dsum.n_nodes,
           CAST(COALESCE(intra.e_c, 0) AS BIGINT) AS e_intra,
           dsum.d_c,
           CAST({_sdiv_sql("(4 * m.m * COALESCE(intra.e_c, 0)"
                           " - dsum.d_c * dsum.d_c) * 1000000",
                           "GREATEST(4 * m.m * m.m, 1)")} AS BIGINT)
               AS contrib_ppm
    FROM dsum LEFT JOIN intra ON dsum.nation = intra.nation, m
    """


@_q("graph_modularity", _SQL_MODULARITY)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODULARITY of the supplier-nation partition over the co-order
    graph: per community c, the Newman contribution (4m·e_c − d_c²) /
    4m² in ppm (summing the column IS the partition's modularity Q) —
    the metric that says whether nations actually trade as communities
    or the partition is no better than random wiring (Q ≈ 0). The
    quality readout for any clustering of the graph family
    (`kcore_peel` strips hair, `pagerank_suppliers` ranks,
    `triangle_census` measures closure — this scores a PARTITION).
    Integer throughout: the signed numerator amplifies to ppm before
    one sign-abs division.

    Scale: degrees and intra-edge counts key on vertex/nation —
    |V|-bounded aggregates off the one shared edge build
    (`co_order_edges`, localCheckpoint'd); the nation map broadcasts;
    m is a 1-row broadcast. int64: 4m·e_c·10⁶ caps at ~5e18 for
    m ≈ 1e6 edges — per-shard modularity (it's a sum) merges beyond
    that.
    """
    e = co_order_edges(spark, sf_dir).localCheckpoint(eager=False)
    m = e.agg(F.count(F.lit(1)).cast("long").alias("m"))
    nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("v"), F.col("n_name").alias("nation"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dsum = (
        deg.join(nat, "v")
        .groupBy("nation")
        .agg(
            F.sum("d").cast("long").alias("d_c"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        )
    )
    na = nat.select(F.col("v").alias("a"), F.col("nation").alias("nat_a"))
    nb = nat.select(F.col("v").alias("b"), F.col("nation").alias("nat_b"))
    intra = (
        e.join(na, "a")
        .join(nb, "b")
        .where(F.col("nat_a") == F.col("nat_b"))
        .groupBy(F.col("nat_a").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    return (
        dsum.join(intra, "nation", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "nation",
            "n_nodes",
            F.coalesce(F.col("e_c"), F.lit(0)).cast("long").alias("e_intra"),
            "d_c",
            F.expr(
                "CAST("
                + _sdiv_expr(
                    "(4 * m * coalesce(e_c, 0) - d_c * d_c) * 1000000",
                    "GREATEST(4 * m * m, 1)",
                )
                + " AS LONG)"
            ).alias("contrib_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap: deterministic hash-replicate CI for the mean
# ---------------------------------------------------------------------------
_PB_B = 32
# Poisson(1) CDF thresholds in millionths: P(X <= k)
_PB_CDF = (367879, 735759, 919699, 981012, 996340, 1000000)
# Per-replicate affine families over the 31-bit base hash (own
# multiplier constants — deliberately NOT minhash_coeffs, so retuning
# the dedup sketch can never silently reshuffle the bootstrap)
_PB_P = 2_147_483_647
_PB_COEFFS = tuple(
    (
        (1_000_003 * (b + 1)) % _PB_P or 1,
        (7_919 + 2_654_435_761 * b) % _PB_P,
    )
    for b in range(_PB_B)
)


def _sql_multiplicity(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_PB_CDF)
    )
    return f"CASE {branches} ELSE {len(_PB_CDF)} END"


_PB_SQL_FAMILIES = ", ".join(
    f"({b}, {a}, {c})" for b, (a, c) in enumerate(_PB_COEFFS)
)

_SQL_BOOTSTRAP = f"""
    WITH o AS (
        SELECT {_sql_hash64("CAST(o_orderkey AS VARCHAR)")}
                   & {_PB_P} AS h,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders),
    rep AS (
        SELECT r.b, o.cents,
               {_sql_multiplicity(
                   f"((r.a * o.h + r.c) % {_PB_P}) % 1000000")}
                   AS mult
        FROM o CROSS JOIN (VALUES {_PB_SQL_FAMILIES}) r(b, a, c)),
    means AS (
        SELECT b, CAST(SUM(mult * cents) // GREATEST(SUM(mult), 1) AS BIGINT)
                   AS mean_cents
        FROM rep GROUP BY b),
    ranked AS (
        SELECT mean_cents, ROW_NUMBER() OVER (ORDER BY mean_cents, mean_cents)
                   AS rk
        FROM means),
    pt AS (SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS point_cents FROM o)
    SELECT CAST({_PB_B} AS BIGINT) AS n_replicates,
           pt.point_cents,
           CAST((SELECT mean_cents FROM ranked WHERE rk = 2) AS BIGINT)
               AS ci_lo_cents,
           CAST((SELECT mean_cents FROM ranked WHERE rk = {_PB_B // 2})
               AS BIGINT) AS ci_med_cents,
           CAST((SELECT mean_cents FROM ranked WHERE rk = {_PB_B - 1})
               AS BIGINT) AS ci_hi_cents
    FROM pt
    """


@_q("poisson_bootstrap_ci", _SQL_BOOTSTRAP)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for mean order value —
    THE distributed bootstrap: instead of resampling n rows with
    replacement (impossible without global coordination), every row
    independently joins replicate b with multiplicity ~ Poisson(1),
    here DERANDOMIZED by mapping the portable content hash of
    (order, replicate) through the integer Poisson CDF — fully
    deterministic, reproducible, engine-identical, no RNG state. 32
    replicate means, CI = (2nd, 16th, 31st) order statistics
    (~94% interval). The uncertainty readout the monitoring family
    (`daily_anomaly_flags`, `late_rate_pchart`) needs when someone
    asks "is that daily mean move real?".

    Scale: ONE scan fans out ×B row-locally, partial-agg combines per
    (b) before the 32-key shuffle — the bootstrap costs B
    aggregate-inputs but zero extra scans and no driver-side data. The
    replicate uniforms are the minhash trick, not B independent
    hashes: ONE portable md5 per order gives a 31-bit base h, and
    replicate b reads u_b = (a_b·h + c_b) mod P mod 10⁶ (P = 2³¹−1
    prime; distinct per-replicate affine families — pure fused integer
    ops inside the explode). Per-ROW independence, which is what the
    Poisson bootstrap actually requires (each row's multiplicity
    vector must be independent ACROSS ROWS; across replicates,
    pairwise near-independence from the universal family suffices for
    the variance the CI estimates), is carried entirely by h. The
    previous shape paid B string-concat+md5 per row — measured 37 s →
    ~7 s at sf10 (same JVM), and it was the bench suite's one absolute
    latency-budget exception at sf0.1. Order statistics over 32 rows
    are a trivial window. B scales the CI's resolution, not the
    shuffle width.
    """
    o = _t(spark, sf_dir, "orders").select(
        hash64(F.col("o_orderkey").cast("string"))
        .bitwiseAND(F.lit(_PB_P))
        .alias("h"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    fam = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("b"),
                F.lit(a).cast("long").alias("a"),
                F.lit(c).cast("long").alias("c"),
            )
            for b, (a, c) in enumerate(_PB_COEFFS)
        ]
    )
    rep = o.select("h", "cents", F.explode(fam).alias("f")).select(
        F.col("f.b").alias("b"),
        "cents",
        (
            (F.col("f.a") * F.col("h") + F.col("f.c"))
            % F.lit(_PB_P)
            % F.lit(1_000_000)
        ).alias("u"),
    )
    mult = F.lit(len(_PB_CDF)).cast("long")
    for k in range(len(_PB_CDF) - 1, -1, -1):
        mult = F.when(F.col("u") < _PB_CDF[k], F.lit(k).cast("long")).otherwise(
            mult
        )
    means = (
        rep.select("b", "cents", mult.alias("mult"))
        .groupBy("b")
        .agg(
            F.expr("CAST(sum(mult * cents) div GREATEST(sum(mult), 1) AS LONG)")
            .alias("mean_cents")
        )
    )
    from pyspark.sql import Window

    ranked = means.select(
        "mean_cents",
        F.row_number().over(Window.orderBy("mean_cents")).alias("rk"),
    )
    pt = o.agg(F.expr("CAST(sum(cents) div count(*) AS LONG)").alias("point_cents"))
    lo = ranked.where(F.col("rk") == 2).select(
        F.col("mean_cents").alias("ci_lo_cents")
    )
    med = ranked.where(F.col("rk") == _PB_B // 2).select(
        F.col("mean_cents").alias("ci_med_cents")
    )
    hi = ranked.where(F.col("rk") == _PB_B - 1).select(
        F.col("mean_cents").alias("ci_hi_cents")
    )
    return (
        pt.select(F.lit(_PB_B).cast("long").alias("n_replicates"), "point_cents")
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(hi))
    )


# ---------------------------------------------------------------------------
# One-pass table profile: stacked per-column statistics
# ---------------------------------------------------------------------------
_SQL_TABLE_PROFILE = """
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS nn_ok,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nd_ok,
               CAST(MIN(l_orderkey) AS BIGINT) AS mn_ok,
               CAST(MAX(l_orderkey) AS BIGINT) AS mx_ok,
               CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS nn_q,
               CAST(COUNT(DISTINCT CAST(FLOOR(l_quantity) AS BIGINT))
                   AS BIGINT) AS nd_q,
               CAST(MIN(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS mn_q,
               CAST(MAX(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS mx_q,
               CAST(COUNT(*) - COUNT(l_discount) AS BIGINT) AS nn_d,
               CAST(COUNT(DISTINCT CAST(ROUND(l_discount * 10000, 0)
                   AS BIGINT)) AS BIGINT) AS nd_d,
               CAST(MIN(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
                   AS BIGINT) AS mn_d,
               CAST(MAX(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
                   AS BIGINT) AS mx_d,
               CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS nn_f,
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS nd_f,
               CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT) AS nn_s,
               CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS nd_s,
               CAST(date_diff('day', DATE '1970-01-01',
                   CAST(MIN(l_shipdate) AS DATE)) AS BIGINT) AS mn_s,
               CAST(date_diff('day', DATE '1970-01-01',
                   CAST(MAX(l_shipdate) AS DATE)) AS BIGINT) AS mx_s
        FROM lineitem)
    SELECT 'l_orderkey' AS col, n_rows, nn_ok AS n_null, nd_ok AS n_distinct,
           mn_ok AS min_v, mx_ok AS max_v FROM s
    UNION ALL
    SELECT 'l_quantity', n_rows, nn_q, nd_q, mn_q, mx_q FROM s
    UNION ALL
    SELECT 'l_discount_bp', n_rows, nn_d, nd_d, mn_d, mx_d FROM s
    UNION ALL
    SELECT 'l_returnflag', n_rows, nn_f, nd_f, NULL, NULL FROM s
    UNION ALL
    SELECT 'l_shipdate_day', n_rows, nn_s, nd_s, mn_s, mx_s FROM s
    """


@_q("table_profile", _SQL_TABLE_PROFILE)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS TABLE PROFILE: null count, exact distinct count, and
    typed-normalized min/max for five representative lineitem columns,
    stacked to (col, stats) rows — the dbt/Deequ-style profiling
    contract a data platform runs on ingest (`column_completeness`
    checks one invariant; this is the general census that FEEDS such
    checks, and its distinct counts are the dictionary-encoding
    planner's input). Values normalize to BIGINT per type (quantity
    floors, discount to bp, dates to epoch days; strings profile
    null/distinct only) so one output schema serves every column.

    Scale: a single scan computes every statistic in ONE aggregate —
    the multi-count-distinct Expand is the honest cost (5 distinct
    domains in one pass beats 5 scans; `approx_distinct_parts` is the
    sketch upgrade when exactness can yield); the stack is a 5-row
    union of the same 1-row aggregate, which Spark caches via
    ReusedExchange.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_orderkey")).cast("long").alias("nn_ok"),
        F.countDistinct("l_orderkey").cast("long").alias("nd_ok"),
        F.min("l_orderkey").cast("long").alias("mn_ok"),
        F.max("l_orderkey").cast("long").alias("mx_ok"),
        (F.count(F.lit(1)) - F.count("l_quantity")).cast("long").alias("nn_q"),
        F.countDistinct(F.floor("l_quantity").cast("long"))
        .cast("long")
        .alias("nd_q"),
        F.min(F.floor("l_quantity").cast("long")).cast("long").alias("mn_q"),
        F.max(F.floor("l_quantity").cast("long")).cast("long").alias("mx_q"),
        (F.count(F.lit(1)) - F.count("l_discount")).cast("long").alias("nn_d"),
        F.countDistinct(F.round(F.col("l_discount") * 10000, 0).cast("long"))
        .cast("long")
        .alias("nd_d"),
        F.min(F.round(F.col("l_discount") * 10000, 0).cast("long"))
        .cast("long")
        .alias("mn_d"),
        F.max(F.round(F.col("l_discount") * 10000, 0).cast("long"))
        .cast("long")
        .alias("mx_d"),
        (F.count(F.lit(1)) - F.count("l_returnflag")).cast("long").alias("nn_f"),
        F.countDistinct("l_returnflag").cast("long").alias("nd_f"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).cast("long").alias("nn_s"),
        F.countDistinct("l_shipdate").cast("long").alias("nd_s"),
        F.datediff(
            F.min("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("mn_s"),
        F.datediff(
            F.max("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("mx_s"),
    )
    rows = [
        ("l_orderkey", "nn_ok", "nd_ok", "mn_ok", "mx_ok"),
        ("l_quantity", "nn_q", "nd_q", "mn_q", "mx_q"),
        ("l_discount_bp", "nn_d", "nd_d", "mn_d", "mx_d"),
        ("l_returnflag", "nn_f", "nd_f", None, None),
        ("l_shipdate_day", "nn_s", "nd_s", "mn_s", "mx_s"),
    ]
    parts = []
    for col, nn, nd, mn, mx in rows:
        parts.append(
            s.select(
                F.lit(col).alias("col"),
                F.col("n_rows"),
                F.col(nn).alias("n_null"),
                F.col(nd).alias("n_distinct"),
                (F.col(mn) if mn else F.lit(None).cast("long")).alias("min_v"),
                (F.col(mx) if mx else F.lit(None).cast("long")).alias("max_v"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
