"""Continuous bronze -> silver ETL: transform INSIDE the stream with
foreachBatch instead of landing bronze first.

Each micro-batch of bronze chunks is parsed straight into the four silver
child tables and appended to parquet. This is correct incrementally
because every silver row derives from exactly ONE bronze chunk and the
surrogate keys are content+offset hashes (plans/silver.py) — batch
boundaries can't split or duplicate a row, and discovery order doesn't
change any key. The reference lands bronze and re-reads it
(01_payer_mrf_demo.py:80-147); this path skips the intermediate hop, the
pattern you want when the 100 TB file should become queryable silver in
one pass.

tests/test_streaming_ops.py proves multi-microbatch streamed silver ==
direct batch silver row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

SILVER_TABLES = ("codes", "prices", "par_providers", "providers_x_payer")

# what foreachBatch appends: only tables whose every row derives from ONE
# bronze chunk. providers_x_payer crosses provider_references with the
# header's reporting entity — header and provider_references chunks land
# in DIFFERENT micro-batches under pipelined discovery, so that join must
# happen at read time over the accumulated stores, never per batch.
_CHUNK_LOCAL = ("codes", "prices", "par_providers", "provider_references",
                "header")


def stream_silver_continuous(
    spark,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_interval: str | None = None,
    **source_options,
):
    """Start a stream that writes the silver child tables under
    ``out_dir/<table>`` as parquet appends, one foreachBatch transform
    per micro-batch, and return the streaming query.

    Default trigger is ``availableNow`` (full-manifest discovery, drain
    and stop). Pass ``trigger_interval`` for a ``processingTime`` trigger
    — required when pipelining discovery with ``maxchunksperbatch>0``,
    which availableNow cannot use (it needs the whole manifest in the
    first ``latestOffset``); the caller then watches progress and stops
    the query."""
    from hls_payer_mrf_sparkstreaming_spark.plans.silver import (
        MrfSilverTables,
        in_network_par_providers,
        in_network_prices,
        in_network_rates,
    )
    from hls_payer_mrf_sparkstreaming_spark.sources.datasource import (
        stream_payer_mrf,
    )

    # same forcing as build_silver: surrogate keys hash the chunk byte
    # offset, so a stream read without offsets would silently derive
    # DIFFERENT keys than the batch pipeline over the same file
    if "includeoffsets" not in {k.lower() for k in source_options}:
        source_options["includeoffsets"] = "true"

    def write_batch(bronze: DataFrame, batch_id: int) -> None:
        # batch-local staging, same reason as save_all: codes/prices/
        # par_providers all derive from the parsed in_network branch —
        # persist the parsed codes tier so each micro-batch parses its
        # in_network JSON exactly once instead of three times
        t = MrfSilverTables(bronze)
        codes = t.codes.persist()
        try:
            rates = in_network_rates(codes)
            for name, df in (
                ("codes", codes),
                ("prices", in_network_prices(rates)),
                ("par_providers", in_network_par_providers(rates)),
                ("provider_references", t.provider_references),
                ("header", t.header),
            ):
                df.write.mode("append").parquet(
                    os.path.join(out_dir, name)
                )
        finally:
            codes.unpersist()

    writer = (
        stream_payer_mrf(spark, path, **source_options)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_interval is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def read_silver(spark, out_dir: str) -> dict[str, DataFrame]:
    """The four silver child tables from a continuous-ETL output dir;
    providers_x_payer is derived here from the accumulated header +
    provider_references stores (see _CHUNK_LOCAL)."""
    from hls_payer_mrf_sparkstreaming_spark.plans.silver import (
        provider_references_x_payer,
    )

    stored = {
        name: spark.read.parquet(os.path.join(out_dir, name))
        for name in _CHUNK_LOCAL
    }
    return {
        "codes": stored["codes"],
        "prices": stored["prices"],
        "par_providers": stored["par_providers"],
        "providers_x_payer": provider_references_x_payer(
            stored["provider_references"], stored["header"]
        ),
    }
