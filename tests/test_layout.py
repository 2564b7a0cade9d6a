"""Partitioned-write layout: one file per partition (no small-file
explosion), bounded file sizes, lossless roundtrip, and partition pruning
on read-back."""

import glob
import os

from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.functions.layout import (
    write_partitioned,
)
from hls_payer_mrf_sparkstreaming_spark.operators.suite import load

SF_DIR = "/root/testdata/sf0.001"


def _parquet_files(path, pattern="lang=*/[!.]*.parquet"):
    return glob.glob(os.path.join(path, pattern))


def test_one_file_per_partition_and_roundtrip(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"], sort_within=["doc_id"])

    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {
        os.path.basename(d)
        for d in glob.glob(os.path.join(out, "lang=*"))
    }
    assert dirs == {f"lang={v}" for v in langs}
    # repartition-on-partition-cols => exactly one file per partition dir
    for d in dirs:
        files = _parquet_files(out, f"{d}/[!.]*.parquet")
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    a = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    assert a == b


def test_max_records_per_file_bounds_partition_files(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_capped")
    n_en = docs.filter(F.col("lang") == "en").count()
    cap = 50
    write_partitioned(docs, out, ["lang"], max_records_per_file=cap)
    files = _parquet_files(out, "lang=en/[!.]*.parquet")
    assert len(files) >= (n_en + cap - 1) // cap > 1


def test_readback_filter_is_partition_pruned(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_pruned")
    write_partitioned(docs, out, ["lang"])
    df = spark.read.parquet(out).filter(F.col("lang") == "en")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = df._jdf.queryExecution().explainString(jmode)
    import re

    m = re.search(r"PartitionFilters: \[.*?\]", p)
    assert m, p
    assert re.search(r"lang#\d+ = en", m.group(0)), m.group(0)


def test_zorder_key_matches_python_morton(spark):
    """Bit-exact check of the Morton interleave against a Python
    reference over a deterministic (x, y) grid, including 16-bit
    extremes."""
    from pyspark.sql import functions as F

    from hls_payer_mrf_sparkstreaming_spark.functions.layout import (
        zorder_key,
    )

    def morton(x: int, y: int) -> int:
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    pts = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 254, 32768, 65535)]
    df = spark.createDataFrame(pts, "x INT, y INT")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key("x", "y").alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)
    # locality sanity: the max key is the full 32-bit square's corner
    assert got[(65535, 65535)] == (1 << 32) - 1
