"""Partitioned-write layout control.

At 100 TB the write layout decides every future read: partition directories
give free partition pruning (a filter on the partition column never opens
non-matching files), but the naive ``df.write.partitionBy(...)`` has a
small-file failure mode — every task writes one file into EVERY partition
it holds rows for, so 1000 tasks × 365 date partitions = 365k tiny files.
``write_partitioned`` repartitions on the partition columns first (each
partition's rows land in one task), caps file size with
``maxRecordsPerFile`` (one oversized partition splits into bounded files
instead of one huge one), and optionally sorts within partitions so
min/max column statistics actually prune row groups.

tests/test_layout.py asserts the file counts, the roundtrip, and that a
read-back filter becomes a PartitionFilters entry (no data files opened
outside the matching directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    out = df.repartition(*partition_cols)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
