"""Delta append sink (reference: 01_payer_mrf_demo.py:80-88 streams bronze
rows into a Delta table with a checkpoint). Delta is a sink format plus
session extensions — nothing engine-side changes — so this test exercises
the exact demo wiring when delta-spark is installed and skips (not passes)
where it isn't: the container for CI here ships no delta-spark jars.
"""

import pytest

delta = pytest.importorskip("delta")


def test_stream_bronze_to_delta(tmp_path):
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    from hls_payer_mrf_sparkstreaming_spark.sources.datasource import (
        register,
        stream_payer_mrf,
    )
    from hls_payer_mrf_sparkstreaming_spark.sources.synth import write_mrf_file

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-sink-test")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    register(spark)

    src = tmp_path / "payer.json"
    write_mrf_file(str(src), n_in_network=20, seed=7)
    out = str(tmp_path / "delta_table")
    ckpt = str(tmp_path / "ckpt")

    q = (
        stream_payer_mrf(spark, str(src))
        .writeStream.format("delta")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination(120)

    back = spark.read.format("delta").load(out)
    assert back.count() > 0
    assert set(back.columns) == {"file_name", "header_key", "json_payload"}
