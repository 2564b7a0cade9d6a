"""Bucketed-table co-located joins.

At 100 TB the dominant cost of a big-big equi-join is shuffling both sides
on the key. Bucketing pre-partitions the data at WRITE time: each side is
hash-partitioned into the same number of buckets on the join key and
(optionally) sorted within buckets, so Catalyst plans the join with ZERO
exchanges — every task sort-merges bucket i of the left side against
bucket i of the right. Pay the shuffle once at ingest, join for free on
every subsequent query (the fact-to-fact joins of a star model, the
rate-to-provider join of the MRF silver tables, repeated dedup-survivor
joins of a curation pipeline).

tests/test_bucketing.py asserts the exchange-free plan and result parity
with the plain shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets the join skip its per-task sort too; pick
    ``n_buckets`` so one bucket of the larger table fits an executor's
    memory comfortably (buckets are the unit of join-task granularity).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    Both tables must be bucketed into the SAME bucket count on the join
    columns; Catalyst then satisfies the join's distribution requirement
    from the table layout and plans no exchange on either side.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
