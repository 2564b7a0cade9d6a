"""Mini-oracle: mimic the driver's DuckDB comparison for every registered
query pair at sf0.001, so hash mismatches are caught here first.

Comparison = same columns (sorted by name), same row count, same
order-insensitive multiset of stringified rows (floats repr'd exactly —
the pairs are engineered for bit-identical float math; see suite.py).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _duck_con(sf_dir):
    con = duckdb.connect()
    for t in [
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
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
PAIRS = sorted(ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = _duck_con(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", PAIRS)
def test_oracle_pair(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _row_multiset(spark_cols, spark_rows)
    b = _row_multiset(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_registered_outputs_are_driver_hashable(spark):
    """The driver canonicalizes results via pandas sort_values, which cannot
    hash array/struct/map cells — every registered query must project complex
    columns through to_json (or equivalent) first."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad, f"{name}: complex output columns {bad}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"r_name", "n_name", "revenue", "n_items"}
