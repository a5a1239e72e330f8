"""Vector math over ``array<float>`` embedding columns, JVM-side.

Spark has no native cosine; the engine builds it from higher-order functions
(``zip_with`` + ``aggregate``) — whole-stage codegen, no UDF. Elements are cast
to double BEFORE any arithmetic and folds run left-to-right, matching DuckDB's
``list_dot_product`` evaluation order so the oracle's floats agree to the last
bit (outputs are still rounded defensively).
"""

from __future__ import annotations

COS_ROUND = 4

# Spark-side expressions (column names interpolated)
CAST_DOUBLE = "transform({v}, x -> cast(x as double))"
DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"


def spark_dot(a: str, b: str) -> str:
    return DOT.format(a=a, b=b)


def spark_norm(v: str) -> str:
    return f"sqrt({DOT.format(a=v, b=v)})"


# DuckDB twins
def duck_cast_double(v: str) -> str:
    return f"list_transform({v}, x -> CAST(x AS DOUBLE))"


def duck_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def duck_norm(v: str) -> str:
    return f"sqrt(list_dot_product({v}, {v}))"
