"""Similarity search over embedding columns (array<float>).

Two strategies:

* ``brute_force_topk`` — exact cosine top-k against a query vector.
  The per-row cosine is a codegen'd array expression; top-k collapses
  to TakeOrderedAndProject (per-partition heap + k-row driver merge),
  so the full similarity column is never materialized or shuffled.
  This is the correctness baseline and is already the right plan for
  one-off queries at any scale (one scan, no shuffle).

* ``lsh_topk`` — sign-LSH bucketed approximate search: probe only the
  query's bucket (plus optional Hamming-1 neighbor buckets). At 100 TB
  with the table *written bucketed/partitioned by the LSH bucket*,
  partition pruning turns a full scan into a handful of buckets; recall
  is traded via n_bits/probes.

* ``knn_join_bucketed`` — all-pairs k-NN restricted to shared buckets:
  the scalable self-join shape (bucket-equi-join bounds the quadratic
  blowup to within-bucket pairs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.vectors import cosine, sign_lsh_bucket


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(v)) for v in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k; deterministic tie-break on id."""
    q = _query_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_dp).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_bits: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket.

    The bucket predicate is a plain equality on a derived column — if
    the table is stored partitioned/bucketed by it, this prunes to one
    partition before any vector math runs.
    """
    qbucket = sum(1 << i for i, v in enumerate(query_vec[:n_bits]) if v > 0)
    q = _query_lit(query_vec)
    return (
        df.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), n_bits))
        .filter(F.col("bucket") == F.lit(qbucket))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_dp).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join_bucketed(
    df: DataFrame,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cos_bp: int = 0,
    round_dp: int = 6,
) -> DataFrame:
    """Within-bucket all-pairs cosine (id_a < id_b) — the bounded
    self-join for near-dup detection over embeddings.

    ``min_cos_bp`` filters pairs below a cosine threshold expressed in
    basis points (integer, engine-portable).
    """
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    left = b.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    right = b.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.floor(F.round(cosine("v_a", "v_b"), round_dp) * 10000)
            .cast("long")
            .alias("cos_bp"),
        )
        .filter(F.col("cos_bp") >= min_cos_bp)
    )
