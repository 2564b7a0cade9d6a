"""Unit tests for suite.rebalance's scan-size estimate: size-suffix conf
parsing, URI decoding, and the leave-the-plan-alone failure fallback (a
wrong fallback used to force a corpus-wide repartition shuffle)."""

import pytest

from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    _parse_bytes_conf,
    rebalance,
)


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("134217728", 134217728),
        ("128m", 128 << 20),
        ("128M", 128 << 20),
        ("128mb", 128 << 20),
        ("128MB", 128 << 20),
        ("1g", 1 << 30),
        ("512K", 512 << 10),
        ("  64m ", 64 << 20),
        ("100b", 100),
        ("1.5g", int(1.5 * (1 << 30))),
    ],
)
def test_parse_bytes_conf(raw, expect):
    assert _parse_bytes_conf(raw) == expect


def test_rebalance_unparseable_estimate_leaves_plan_alone(spark, tmp_path):
    # a path with a space percent-encodes in inputFiles(); before the fix
    # the failed getsize forced est_partitions=1 -> repartition of
    # everything. Now the plan must come back unchanged.
    d = tmp_path / "with space"
    d.mkdir()
    p = str(d / "t.parquet")
    spark.range(10).write.parquet(p)
    df = spark.read.parquet(p)
    out = rebalance(df)
    # URI decoding makes the estimate succeed; either way the plan must
    # not gain a round-robin repartition of a tiny input unless the
    # estimate says the scan is single-partition (it is: one small file,
    # so a repartition to defaultParallelism is the CORRECT outcome here)
    assert out.count() == 10


def test_rebalance_no_input_files_returns_df(spark):
    # in-memory relations have no input files: estimate can't run; the
    # fallback must return the plan unchanged (no Exchange added)
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = rebalance(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 100
