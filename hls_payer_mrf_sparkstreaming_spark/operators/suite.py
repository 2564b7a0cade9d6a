"""Central registry of oracle-checked queries.

Every operator the engine claims is registered here as a
``(spark_fn, oracle_sql)`` pair with IDENTICAL output column names, so the
driver (and ``tests/test_oracle.py``) can hash-compare Spark vs DuckDB on
the same parquet inputs. ``oracle=None`` marks genuinely
non-SQL-expressible ops (custom streaming, hash families DuckDB lacks) —
those get rows-only checks plus dedicated pytest coverage.

Float discipline (the driver hash is exact): monetary/real aggregates are
computed in exact integer units (cents / basis points) and divided back at
the end, so Spark's parallel summation order can never produce a ULP diff
vs DuckDB. MIN/MAX/COUNT are order-insensitive and used raw.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@dataclass
class QueryPair:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str


REGISTRY: dict[str, QueryPair] = {}


def query(name: str, oracle: Optional[str] = None, description: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryPair(fn, oracle, description)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, QueryPair]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
    import hls_payer_mrf_sparkstreaming_spark.operators.relational  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.dedup  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.text_analysis  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.similarity  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.multimodal  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.plans.mrf_queries  # noqa: F401

    return REGISTRY
