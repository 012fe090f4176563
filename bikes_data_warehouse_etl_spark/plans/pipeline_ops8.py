"""Training-data pipeline operators, round 2 batch 8: null-key skew
routing (proved equivalent to the plain join by the oracle), a
GDPR-style deletion cascade audit, a watermark-tuning late-arrival
profile, and entity clustering over fuzzy-match edges.

Standing contract: integer cross-engine arithmetic, identical column
aliases on both sides, bounded key spaces before joined/windowed
steps, scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.operators.skew import null_split_left_join
from bikes_data_warehouse_etl_spark.plans.coverage import (
    SQL_FUZZY_PAIRS as _sql_fuzzy_pairs_adaptive,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Null-key skew routing: equivalence proof against the plain left join
# ---------------------------------------------------------------------------
_SQL_NULL_SKEW = """
    WITH o2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_custkey END AS okey
        FROM orders)
    SELECT o2.o_orderkey, o2.okey, c.c_mktsegment
    FROM o2 LEFT JOIN customer c ON o2.okey = c.c_custkey
    """


@_q("null_skew_join", _SQL_NULL_SKEW)
def q_null_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key skew mitigation, oracle-proved: 20% of the fact's
    foreign key is nulled (guest checkouts / unattributed rows), and
    the Spark side routes those rows around the join via
    :func:`null_split_left_join` while the oracle is the PLAIN left
    join — the hash match certifies the rewrite is semantics-
    preserving through the external gate, like `salted_join_revenue`
    does for hot keys.

    Scale: every NULL hashes identically, so a plain left join ships
    ALL null-key rows to one reducer — at 100 TB that's one task
    holding 20% of the fact. The split version's null branch is a
    scan-local filter + narrow union (no shuffle at all for those
    rows); only real keys enter the exchange.
    """
    o2 = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("okey"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return null_split_left_join(o2, c, "okey", "c_custkey").select(
        "o_orderkey", "okey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# GDPR-style deletion cascade audit
# ---------------------------------------------------------------------------
_SQL_DELETION_CASCADE = """
    WITH del AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    od AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del))
    SELECT 'customer' AS entity,
           CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS n_purged,
           CAST((SELECT COUNT(*) FROM customer) -
                (SELECT COUNT(*) FROM del) AS BIGINT) AS n_kept
    UNION ALL
    SELECT 'orders',
           CAST((SELECT COUNT(*) FROM od) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) -
                (SELECT COUNT(*) FROM od) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM od)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM od))
               AS BIGINT)
    """


@_q("deletion_cascade_audit", _SQL_DELETION_CASCADE)
def q_deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep audit: given a deletion list of
    customer keys, count the rows that must be purged vs kept at each
    level of the foreign-key cascade (customer → orders → lineitem) —
    the dry-run report a compliance pipeline produces before executing
    deletes, and the row-count reconciliation it re-runs after.

    Scale: the deletion list and the purged-order keys join as
    broadcast membership marks (never IN-subquery materialization on
    the driver), and each table is scanned exactly ONCE — purge/keep
    counts come from one conditional aggregate over the mark, not a
    count per branch. All three levels live in ONE lazy plan (a union
    of single-row aggregates — no per-level collect, no driver
    round-trips), so the whole audit is a single job. The
    customer-level list broadcasts by construction (deletion requests
    ≪ customers); the order-key set for the lineitem mark is
    deletion-proportional — AQE picks broadcast vs shuffle as it
    grows.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    del_keys = c.where(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("dk")
    )
    od = o.join(
        del_keys, o["o_custkey"] == del_keys["dk"], "left_semi"
    ).select(F.col("o_orderkey").alias("pk"))

    def audit(df, mark_col, entity):
        purged = F.sum(
            F.when(F.col(mark_col).isNotNull(), 1).otherwise(0)
        ).cast("long")
        kept = F.sum(
            F.when(F.col(mark_col).isNull(), 1).otherwise(0)
        ).cast("long")
        return df.agg(
            purged.alias("n_purged"), kept.alias("n_kept")
        ).select(F.lit(entity).alias("entity"), "n_purged", "n_kept")

    return (
        audit(
            c.join(del_keys, c["c_custkey"] == del_keys["dk"], "left"),
            "dk",
            "customer",
        )
        .unionByName(
            audit(
                o.join(del_keys, o["o_custkey"] == del_keys["dk"], "left"),
                "dk",
                "orders",
            )
        )
        .unionByName(
            audit(li.join(od, li["l_orderkey"] == od["pk"], "left"), "pk", "lineitem")
        )
    )


# ---------------------------------------------------------------------------
# Late-arrival profile: the watermark-tuning study
# ---------------------------------------------------------------------------
_SQL_LAT_JITTER = (
    "CAST(('0x' || substr(md5('lat:' || CAST(event_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 120"
)

_SQL_LATE_PROFILE = f"""
    WITH ev AS (
        SELECT event_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + {_SQL_LAT_JITTER} AS arr
        FROM events),
    e2 AS (SELECT event_id, es, arr // 60 AS blk FROM ev),
    bm AS (SELECT blk, MAX(es) AS bmax FROM e2 GROUP BY blk),
    pm AS (
        SELECT blk,
               MAX(bmax) OVER (ORDER BY blk
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prior_max
        FROM bm),
    lat AS (
        SELECT GREATEST(0, pm.prior_max - e2.es) AS late_s
        FROM e2 JOIN pm ON e2.blk = pm.blk
        WHERE pm.prior_max IS NOT NULL)
    SELECT CASE WHEN late_s = 0 THEN 'on-time'
                WHEN late_s <= 30 THEN 'late<=30s'
                WHEN late_s <= 60 THEN 'late<=60s'
                WHEN late_s <= 120 THEN 'late<=120s'
                ELSE 'late>120s' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s
    FROM lat GROUP BY 1
    """


@_q("late_arrival_profile", _SQL_LATE_PROFILE)
def q_late_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How late does data actually arrive? Events get a deterministic
    simulated transport delay (hash-derived 0-119 s — the testdata is
    generated in perfect order, so jitter is injected to make the
    study non-trivial), then each event's lateness is measured against
    the max event-time seen in strictly-earlier arrival minutes — the
    empirical distribution that answers "is a 2-minute watermark
    enough, or do we drop 1% of events?" BEFORE committing a streaming
    job's `withWatermark` (streaming/pipeline.py defaults to 2 h;
    this query is how that number gets chosen from data).

    Scale: the running max runs over arrival-minute *blocks* (bounded:
    one row per minute of history), never over raw events — same
    histogram-window discipline as `winsorized_price_stats`. Events
    touch one aggregate (per-block max) and one broadcast join back;
    the bucket rollup is a ≤5-key aggregate.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    jitter = (
        hash64(F.concat(F.lit("lat:"), F.col("event_id").cast("string")))
        % 120
    )
    e2 = ev.select(
        "event_id", "es", (F.col("es") + jitter).alias("arr")
    ).select("event_id", "es", F.expr("arr div 60").alias("blk"))
    bm = e2.groupBy("blk").agg(F.max("es").alias("bmax"))
    wprior = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pm = bm.select("blk", F.max("bmax").over(wprior).alias("prior_max"))
    lat = (
        e2.join(pm, "blk")
        .where(F.col("prior_max").isNotNull())
        .select(
            F.greatest(F.lit(0), F.col("prior_max") - F.col("es")).alias(
                "late_s"
            )
        )
    )
    bucket = (
        F.when(F.col("late_s") == 0, "on-time")
        .when(F.col("late_s") <= 30, "late<=30s")
        .when(F.col("late_s") <= 60, "late<=60s")
        .when(F.col("late_s") <= 120, "late<=120s")
        .otherwise("late>120s")
    )
    return lat.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("late_s").cast("long").alias("max_late_s"),
    )


# ---------------------------------------------------------------------------
# Entity clustering over fuzzy-match edges (record linkage closure)
# ---------------------------------------------------------------------------
_SQL_FUZZY_CLUSTERS = f"""
    WITH RECURSIVE
    pairs AS (SELECT id_a, id_b FROM ({_sql_fuzzy_pairs_adaptive}) fp),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT src AS node, src AS r FROM edges
        UNION
        SELECT w.node, e.dst FROM reach w JOIN edges e ON e.src = w.r
    ),
    comp AS (SELECT node AS cust_id, MIN(r) AS entity_id
             FROM reach GROUP BY node)
    SELECT c.cust_id, c.entity_id, s.n_members
    FROM comp c
    JOIN (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM comp GROUP BY entity_id) s USING (entity_id)
    """


@_q("fuzzy_entity_clusters", _SQL_FUZZY_CLUSTERS)
def q_fuzzy_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage closure: fuzzy name-match pairs (blocked
    Levenshtein ≤ 3, the `fuzzy_name_pairs` edges) clustered into
    entities by min-label propagation — A≈B and B≈C merge into one
    entity even though A and C were never compared. The full
    entity-resolution pipeline: block → compare → cluster; the oracle
    recomputes the same transitive closure as a DuckDB recursive CTE
    (the second iterative-vs-declarative differential after
    `neardup_components`).

    Scale: edge generation is the composite-blocked self-join (2 500
    blocks — see PERF.md's 25× rewrite); each propagation round is one
    join + min-aggregate on (long, long) with map-side combine,
    converging in ≤ diameter rounds (name-typo clusters are
    star-shaped, 2-3 rounds). Driver holds a convergence count only.
    """
    from bikes_data_warehouse_etl_spark.operators.dedup import (
        neardup_components,
    )
    from bikes_data_warehouse_etl_spark.plans.coverage import (
        q_fuzzy_name_pairs,
    )

    pairs = q_fuzzy_name_pairs(spark, sf_dir).select("id_a", "id_b")
    comps = neardup_components(pairs)
    sizes = comps.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        comps.select(F.col("node").alias("cust_id"), "component_id")
        .join(sizes, "component_id")
        .select(
            "cust_id", F.col("component_id").alias("entity_id"), "n_members"
        )
    )
