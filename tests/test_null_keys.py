"""NULL categorical-key semantics for the window-rewritten stats queries
(r14, ADVICE r13): the DuckDB oracles join marginals with
``JOIN ... USING (key)``, which silently DROPS NULL-keyed cells from the
chi2/MI terms while still counting the NULL marginal GROUP in nr/nc and
the marginal entropies. The committed fixtures are NULL-free, so the
driver hash can never catch a divergence here — this test plants NULL
keys and replays the full oracle comparison on them.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod


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
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    """An sf dir whose documents.lang/source and orders status/priority
    carry NULLs (plus rows that are NULL in one key only, both keys, and
    duplicated NULL-key cells so marginal counts exceed 1)."""
    out = str(tmp_path_factory.mktemp("nullsf"))
    con = duckdb.connect()
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con.execute(
        f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN doc_id % 4 = 0 THEN NULL ELSE lang END AS lang,
                CASE WHEN doc_id % 6 < 2 THEN NULL ELSE source END AS source
            )
            FROM '{src}/documents.parquet'
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN o_orderkey % 5 = 0 THEN NULL
                     ELSE o_orderstatus END AS o_orderstatus,
                CASE WHEN o_orderkey % 7 < 2 THEN NULL
                     ELSE o_orderpriority END AS o_orderpriority
            )
            FROM '{src}/orders.parquet'
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN user_id % 5 = 0 THEN NULL
                     ELSE event_type END AS event_type
            )
            FROM '{src}/events.parquet'
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return out


@pytest.mark.parametrize(
    "name", ["chi_square_independence", "mutual_information", "column_entropy"]
)
def test_null_key_oracle_parity(spark, null_sf, name):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = queries[name](spark, null_sf)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("documents", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_sf}/{t}.parquet'"
        )
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _row_multiset(spark_cols, spark_rows)
    b = _row_multiset(duck_cols, duck_rows)
    assert a == b, f"{name}: NULL-key divergence, first diffs: " + str(
        [(x, y) for x, y in zip(a, b) if x != y][:5]
    )
