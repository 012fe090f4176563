"""Round-4 batch 20: Spark-4-native surfaces under the oracle gate —
the VARIANT semi-structured type and SQL pipe syntax.

Both queries produce the same answers as plain-ANSI oracles, so the
hash match proves the MODERN surface (variant shredding, pipe
operators) is a pure execution-strategy change, not a semantics one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# VARIANT: parse-once semi-structured extraction
# ---------------------------------------------------------------------------
_SQL_VARIANT_PROPS = """
    SELECT event_type,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7
               AS BIGINT) AS k_mod7,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(len(json_extract_string(props, '$.tag')) AS BIGINT))
               AS BIGINT) AS tag_chars
    FROM events
    GROUP BY 1, 2
    """


@_q("variant_props_extract", _SQL_VARIANT_PROPS)
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into the shredded binary encoding, then typed
    ``variant_get`` field reads — versus `events_json_extract`, which
    re-parses the JSON STRING on every ``get_json_object`` call. Two
    fields are extracted here, so the parse-once economics are visible:
    string-path cost grows with fields x bytes, variant-path pays one
    parse then O(field) binary reads. The DuckDB oracle answers from
    its native JSON reader, proving VARIANT is representation, not
    semantics.

    Scale: parse + extraction are row-local (no shuffle added); the
    rollup groups (type x 7) keys and map-side-combines to nothing. At
    100 TB the variant column is what you'd PERSIST (parquet writes
    shredded variant natively in Spark 4), making every later reader
    skip the parse entirely — the docstring contract `events_json_extract`
    points at, landed.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    return (
        e.select(
            "event_type",
            (
                F.expr("variant_get(v, '$.k', 'long')") % 7
            ).alias("k_mod7"),
            F.length(F.expr("variant_get(v, '$.tag', 'string')")).alias(
                "tag_len"
            ),
        )
        .groupBy("event_type", "k_mod7")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("tag_len").cast("long").alias("tag_chars"),
        )
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax: the modern composable form, oracle-proven equivalent
# ---------------------------------------------------------------------------
_SQL_PIPE_TOPK = """
    SELECT l_returnflag AS flag, l_linestatus AS status,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS gross_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY gross_cents DESC, flag, status
    LIMIT 5
    """


@_q("pipe_sql_topk", _SQL_PIPE_TOPK)
def q_pipe_sql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the filter -> aggregate -> order ->
    limit report written as ``|>`` pipeline stages in the order they
    EXECUTE, not the inside-out ANSI nesting — the composable SQL
    surface new pipelines adopt. The oracle is the traditional ANSI
    spelling of the identical report; the hash match pins that pipe
    syntax is parser sugar over the same Catalyst plan (it compiles to
    the same Aggregate + TakeOrderedAndProject).

    Scale: filter pushed to the parquet scan, two-phase aggregate on a
    (flag x status) domain of ~6 keys, top-5 via per-partition heaps —
    the same plan `top_revenue` pins.
    """
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |> AGGREGATE CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
               AS qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS gross_cents
           GROUP BY l_returnflag AS flag, l_linestatus AS status
        |> SELECT flag, status, qty, gross_cents
        |> ORDER BY gross_cents DESC, flag, status
        |> LIMIT 5
        """
    )
