"""Vector expressions over array<float> embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the
math JVM-side and codegen-friendly — no UDF, no VectorUDT conversion.
At 100 TB these evaluate per-row inside the scan stage; the only
shuffles in similarity pipelines come from the grouping/join strategy
around them (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays.

    Elements are cast to double *before* multiplying and the fold runs
    left-to-right — bit-identical to the DuckDB mirror
    ``list_sum(list_transform(list_zip(a,b), x -> x[1]::DOUBLE * x[2]::DOUBLE))``.
    """
    return F.aggregate(
        F.zip_with(
            _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm (double accumulation, left-to-right)."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (NULL-safe on zero vectors)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def sign_lsh_bucket(a: Column | str, n_bits: int = 16) -> Column:
    """Axis-aligned sign-LSH bucket: bit i set iff component i > 0.

    A deterministic, engine-portable LSH family (hyperplanes = axis
    planes of the first ``n_bits`` dimensions). Nearby unit vectors
    agree on most signs → collide in coarse buckets. For production
    randomized hyperplanes, seed a projection matrix and broadcast it;
    the bucketing/join structure stays identical.

    Vectors SHORTER than ``n_bits`` contribute 0 for the missing bits
    (``F.get`` is null-safe; the ``> 0`` predicate is false on null) —
    under Spark 4's default ANSI mode the previous ``element_at(arr,
    i+1)`` threw INVALID_ARRAY_INDEX on the first short vector and
    killed the job, while the driver-side query mirror silently
    truncated; now both sides agree that absent dimensions hash as
    non-positive.
    """
    arr = _c(a)
    acc = F.lit(0).cast("long")
    for i in range(n_bits):
        acc = acc + F.when(
            F.get(arr, i) > 0, F.lit(2**i).cast("long")
        ).otherwise(0)
    return acc
