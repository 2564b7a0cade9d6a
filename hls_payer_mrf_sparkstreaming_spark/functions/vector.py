"""Vector math as JVM-side column expressions (no Python UDFs).

Embeddings are ``array<float>`` columns; all math casts to double and uses
``zip_with``/``aggregate`` higher-order functions, which run inside
whole-stage codegen — at 100 TB this is the difference between a scan-bound
job and a Python-serialization-bound one. Sequential left-to-right
aggregation also makes results bit-identical to a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_bucket(vec, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed to a long.

    ``planes`` are plain Python lists baked into the plan as literals —
    deterministic and broadcast-free.
    """
    bucket = F.lit(0).cast("long")
    for plane in planes:
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = (dot(vec, plane_col) > 0).cast("long")
        bucket = bucket * 2 + bit
    return bucket


# --- Spark-SQL text twins -------------------------------------------------
#
# Loop-built Column trees (a bucket fold over 8-16 plane literals, an
# argmax fold over a broadcast centroid array, per-subspace PQ encoders)
# cost hundreds of py4j round trips per query CONSTRUCTION — profiled at
# 0.5-1.5 s of driver wall per vector-family query, paid before any task
# runs at every scale. These return the same expressions as Spark SQL text
# so one selectExpr/F.expr call parses the whole tree in the JVM. The
# parsed trees are semantically identical (same functions, same double
# literals via repr round-trip), so plans and oracle hashes are unchanged.


def to_double_expr(col: str) -> str:
    return f"transform({col}, x -> CAST(x AS DOUBLE))"


def dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        f"(acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + x * x))"


def cosine_expr(a: str, b: str) -> str:
    """Spark-SQL text twin of :func:`cosine`."""
    return f"({dot_expr(a, b)} / ({norm_expr(a)} * {norm_expr(b)}))"


def array_lit(vals) -> str:
    """array<double> literal (repr round-trips doubles exactly; the D
    suffix keeps the literal DoubleType, matching F.lit(float))."""
    return "array(" + ", ".join(f"{float(v)!r}D" for v in vals) + ")"


def hyperplane_bucket_expr(vec: str, planes: list[list[float]]) -> str:
    """Spark-SQL text twin of :func:`hyperplane_bucket`."""
    expr = "CAST(0 AS BIGINT)"
    for plane in planes:
        bit = f"CAST(({dot_expr(vec, array_lit(plane))} > 0) AS BIGINT)"
        expr = f"({expr} * 2 + {bit})"
    return expr


def cosine_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB-SQL cosine between two DOUBLE[] expressions, with the same
    sequential accumulation order as :func:`cosine` (list_aggregate is not
    order-stable across engines; explicit reduce is)."""
    return (
        f"(list_sum(list_transform(list_zip({a_expr}, {b_expr}), "
        f"p -> p[1] * p[2])) / "
        f"(sqrt(list_sum(list_transform({a_expr}, x -> x * x))) * "
        f"sqrt(list_sum(list_transform({b_expr}, x -> x * x)))))"
    )


def hyperplane_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """DuckDB-SQL equivalent of :func:`hyperplane_bucket`."""
    expr = "0"
    for plane in planes:
        lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
        d = (
            f"list_sum(list_transform(list_zip({vec_expr}, {lit}), "
            f"p -> p[1] * p[2]))"
        )
        expr = f"(({expr}) * 2 + (CASE WHEN {d} > 0 THEN 1 ELSE 0 END))"
    return expr
