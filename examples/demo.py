#!/usr/bin/env python
"""End-to-end demo: the reference workflow, re-expressed on this engine.

Mirrors the reference's solution-accelerator notebook
(/root/reference/01_payer_mrf_demo.py) step for step —

  Bronze : (download & decompress) -> stream the MRF file as chunks
  Silver : curation ETL into the star data model (CTAS tables)
  Gold   : the CMS price-comparison mandate query (shoppable price)

— but with a seeded synthetic MRF file instead of the 4 GB UMR download
(pass a real ``*.json`` / ``*.json.gz`` path, local or ``s3://...``, as
argv[1] to run against actual payer data; ``.gz`` inputs are decompressed
by the source's pre-pass automatically).

Run:  python examples/demo.py [path-to-mrf.json[.gz]]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(source: str | None = None) -> None:
    from hls_payer_mrf_sparkstreaming_spark.plans.silver import (
        build_silver,
        shoppable_price,
    )
    from hls_payer_mrf_sparkstreaming_spark.session import get_spark
    from hls_payer_mrf_sparkstreaming_spark.sources.datasource import (
        stream_payer_mrf,
    )
    from hls_payer_mrf_sparkstreaming_spark.sources.synth import (
        write_mrf_file,
    )

    work = tempfile.mkdtemp(prefix="payer_mrf_demo_")
    if source is None:
        # stand-in for the notebook's wget+gunzip of the UMR file
        source = os.path.join(work, "synthetic_payer.json")
        write_mrf_file(source, n_in_network=500, n_provider_refs=60, seed=1)
        print(f"[bronze] generated synthetic MRF: {source}")

    from pyspark.sql import SparkSession

    # getOrCreate() joins a caller's live session (e.g. the test suite's
    # shared fixture) — only stop at the end what this demo itself created
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master="local[*]")

    # ---- Bronze: stream the single-object JSON as chunk rows ----------
    # (reference: spark.readStream.format("com.databricks.labs...") ->
    #  parquet sink + progress-poll loop; availableNow replaces the poll)
    bronze_dir = os.path.join(work, "bronze")
    q = (
        stream_payer_mrf(spark, source)
        .writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    bronze = spark.read.parquet(bronze_dir)
    print("[bronze] chunk counts by header_key:")
    bronze.groupBy("header_key").count().show(truncate=False)

    # ---- Silver: curation ETL into the star model (CTAS) --------------
    # (reference: 6x CREATE TABLE ... AS SELECT over the bronze table;
    #  here build_silver reads byte-range-pruned branches directly and
    #  save_all stages each tier off the previously written table)
    db = "hls_payer_transparency_demo"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    # the default in-memory catalog forgets tables across sessions while
    # the warehouse directory persists — clear leftovers from prior runs
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(os.path.join(wh, f"{db}.db"), ignore_errors=True)
    tables = build_silver(spark, source)
    tables.save_all(spark, db)
    print(f"[silver] CTAS tables in database {db}:")
    for t in spark.catalog.listTables(db):
        if not t.isTemporary:
            n = spark.table(f"{db}.{t.name}").count()
            print(f"  {t.name}: {n} rows")

    # ---- Gold: CMS price-comparison mandate query ----------------------
    # (reference: parameterized SQL over the silver tables)
    codes = spark.table(f"{db}.in_network_codes")
    prices = spark.table(f"{db}.in_network_prices")
    par = spark.table(f"{db}.in_network_par_providers")
    pxp = spark.table(f"{db}.provider_references_x_payer")
    hit = (
        par.join(prices.select("sk_rate_id", "sk_in_network_id"), "sk_rate_id")
        .join(codes.select("sk_in_network_id", "billing_code"),
              "sk_in_network_id")
        .join(pxp, par.provider_reference_id == pxp.provider_group_id)
        .selectExpr("billing_code", "tin.value AS tin_value")
        .orderBy("billing_code", "tin_value")
        .first()
    )
    print(
        f"[gold] shoppable price for billing_code={hit['billing_code']} "
        f"tin={hit['tin_value']}:"
    )
    shoppable_price(
        codes, pxp, hit["billing_code"], hit["tin_value"]
    ).show(truncate=False)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
