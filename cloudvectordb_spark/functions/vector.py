"""Vector math as pure Column expressions (SURVEY.md §2 K6, K7, H8).

The reference's S3/S4 stages ("building the embeddings ... building the
vectordb", /root/reference/README.md:2) need dense-vector arithmetic.
Implemented with Spark higher-order functions (``aggregate``/``zip_with``/
``transform``) so the expressions stay inside whole-stage codegen — no
Python boundary on the hot path. All accumulation is in DOUBLE, matching
DuckDB's ``list_*`` semantics on ``CAST(embedding AS DOUBLE[])`` so the
oracle can verify values bit-for-bit after rounding.

At 100 TB these expressions scan columnar float arrays in the JVM with
zero serialization; a numpy Pandas-UDF fast path exists in
``operators.vector_ops`` for when profiling favors Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double
    (sequential left-to-right, same as DuckDB list_dot_product)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe via try_divide (0-norm -> NULL)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array column (K6); keeps float element type.
    A zero vector normalizes to itself (try_divide -> NULL would poison
    downstream dots; ANSI plain division would throw DIVIDE_BY_ZERO)."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.when(n == 0.0, a).otherwise(
        F.transform(a, lambda x: (x.cast("double") / n).cast("float"))
    )


def has_nan(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.exists(a, lambda x: F.isnan(x))
