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


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns into one
    long — sort or range-partition by this key and 2-D-close rows land in
    the same files, so min/max statistics prune BOTH dimensions instead of
    just the leading sort column. Pure bit expressions in codegen (one
    shifted term per bit), no shuffle of its own.
    """
    from pyspark.sql import functions as F

    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        # the bit must be long BEFORE the shift: shiftleft on an int
        # column wraps into the sign bit at position 31
        key = (
            key
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB-SQL twin of :func:`zorder_key` (same bit-term expansion)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
