"""Bucketed co-located join: pay the shuffle at write time, join with zero
exchanges forever after. Asserts the plan property AND result parity with
the plain shuffled join."""

import re

import pytest
from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.functions.bucketing import (
    bucketed_join,
    write_bucketed,
)
from hls_payer_mrf_sparkstreaming_spark.operators.suite import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_custkey"
    )
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, "t_orders_b", ["l_orderkey"], n_buckets=8)
    yield "t_lineitem_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # forbid broadcast so the test proves the bucket layout (not table
    # size) is what removes the shuffle
    with _no_broadcast(spark):
        df = bucketed_join(spark, left, right, ["l_orderkey"])
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        p = df._jdf.queryExecution().explainString(jmode)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p
    assert "SortMergeJoin" in p, p


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    with _no_broadcast(spark):
        got = (
            bucketed_join(spark, left, right, ["l_orderkey"])
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                ).alias("cents"),
            )
        )
        rows_b = {tuple(r) for r in got.collect()}
    li = load(spark, SF_DIR, "lineitem")
    orders = load(spark, SF_DIR, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    rows_p = {tuple(r) for r in plain.collect()}
    assert rows_b == rows_p


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", self.prev
        )
