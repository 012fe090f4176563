"""Round-4 batch 21: recursive CTE surface (Spark 4) under the oracle
gate.

The engine's iterative operators (`neardup_components`,
`pagerank_suppliers`, `fuzzy_entity_clusters`) run driver-side loops
with checkpointed lineage because their iteration counts are
data-dependent; Spark 4's native WITH RECURSIVE covers the
FIXED-DEPTH recursion family in pure SQL, and this batch pins that
surface against the same DuckDB recursive-CTE oracle the CC loop
already differentials against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


_N_PERIODS = 6
_DECAY_PCT = 95

_SQL_DECAY_PROJECTION = f"""
    WITH RECURSIVE base AS (
        SELECT r_name AS region,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE EXTRACT(year FROM o_orderdate) = 2001
        GROUP BY 1),
    proj AS (
        SELECT region, CAST(0 AS BIGINT) AS period_offset, cents
        FROM base
        UNION ALL
        SELECT region, period_offset + 1,
               CAST(cents * {_DECAY_PCT} // 100 AS BIGINT)
        FROM proj WHERE period_offset < {_N_PERIODS})
    SELECT region, period_offset, cents FROM proj
    """


@_q("revenue_decay_projection", _SQL_DECAY_PROJECTION)
def q_revenue_decay_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): the final actual year's
    revenue per region projected six periods forward at a 95%
    integer-decay — the run-off/churn projection every finance rollup
    keeps, expressed as NATIVE recursive SQL on BOTH engines (the
    DuckDB oracle is textually the same recursion), so the hash match
    pins Spark's recursion semantics (UNION ALL accumulation,
    level-guard termination) against an independent implementation.

    This is the fixed-depth end of the recursion spectrum; the
    data-dependent end (connected components, label propagation) stays
    on the driver-loop + localCheckpoint pattern (`neardup_components`)
    because unbounded recursion wants per-round materialization
    barriers. Integer decay (x*95 div 100 per step) keeps every level
    engine-exact.

    Scale: the anchor is a bounded per-region rollup (dims broadcast,
    one exchange); each recursion level is a row-local projection of
    the previous level's ~5 rows — the recursion adds NO shuffles. At
    100 TB only the anchor grows; the recursion cost stays
    |regions| x periods.
    """
    for t in ("orders", "customer", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"rec_{t}")
    # same recursion text on both engines, modulo dialect: integer
    # division is `//` in DuckDB, `div` in Spark SQL
    return spark.sql(
        _SQL_DECAY_PROJECTION.replace("FROM orders", "FROM rec_orders")
        .replace("JOIN customer", "JOIN rec_customer")
        .replace("JOIN nation", "JOIN rec_nation")
        .replace("JOIN region", "JOIN rec_region")
        .replace(" // ", " div ")
    )
