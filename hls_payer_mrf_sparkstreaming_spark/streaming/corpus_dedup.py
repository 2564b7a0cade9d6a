"""Incremental exact dedup over a document stream: first arrival wins.

A training-data pipeline rarely sees its corpus at once — crawl drops land
over days, and "dedupe the new files against everything already accepted"
is the operation that keeps the corpus clean without ever reprocessing it.
This is that operator: a ``foreachBatch`` loop that maintains a
fingerprint store and lets a document through only if its content hash has
never been seen (earlier batch OR earlier row of the same batch).

Per micro-batch (all digest-width shuffles — text never shuffles):

1. fingerprint every doc: ``fp = md5(text)``;
2. within-batch survivorship: keep the min-id row per fp (one window over
   the batch, partitioned by fp);
3. cross-batch: left-anti join the batch against the accumulated fp store;
4. append survivors to ``out/docs`` and their fps to ``out/fps``.

Scale notes. The store side of the anti-join carries 16-byte digests, not
text, and Spark hash-partitions both sides on fp — at 100 TB you would
bucket ``out/fps`` by fp (functions/bucketing.py) so the anti-join stops
shuffling the store, and use a transactional table (Delta MERGE) instead
of parquet appends for exactly-once batch retries; with plain parquet a
retried partially-written batch is at-least-once. The semantics here are
arrival-order-dependent by design (first arrival wins) — tests/\
test_streaming_ops.py pins delivery order and proves streamed survivors
== the batch min-id dedup of the same corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def dedup_corpus_batch(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    normalized: bool = False,
) -> DataFrame:
    """Within-batch survivorship: min-id row per content fingerprint —
    ``md5(text)`` exact, or the md5 of the canonicalized text when
    ``normalized`` (same normalization as the batch operator
    ``dedup_normalized_exact``, so a streamed corpus collapses the same
    case/punctuation variants its batch twin does)."""
    from hls_payer_mrf_sparkstreaming_spark.operators.dedup import (
        normalized_text,
    )

    fp_src = (
        normalized_text(F.col(text_col)) if normalized else F.col(text_col)
    )
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        batch.withColumn("fp", F.md5(fp_src))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_dedup_corpus(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    normalized: bool = False,
):
    """Start the incremental-dedup stream over a parquet document source
    and return the streaming query (``availableNow`` — drains then stops).
    Survivor docs land in ``out_dir/docs``, their fingerprints (the
    accepted-corpus state) in ``out_dir/fps``."""
    docs_dir = os.path.join(out_dir, "docs")
    fps_dir = os.path.join(out_dir, "fps")
    schema = spark.read.parquet(input_dir).schema

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        fresh = dedup_corpus_batch(batch, id_col, text_col, normalized)
        try:
            seen = spark.read.parquet(fps_dir).select("fp")
            fresh = fresh.join(seen, "fp", "left_anti")
        except Exception:  # first batch: no store yet
            pass
        # two actions on the (small) survivor set: materialize once
        fresh = fresh.persist()
        fresh.drop("fp").write.mode("append").parquet(docs_dir)
        fresh.select("fp").write.mode("append").parquet(fps_dir)
        fresh.unpersist()

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# incremental line-level dedup (CCNet-style) with document rewrite
# ---------------------------------------------------------------------------
# The streaming twin of operators/dedup.py line_dedup_rewrite, with
# first-arrival-wins semantics instead of the batch operator's corpus-wide
# count: a block survives iff its fingerprint has never been seen — not in
# any earlier micro-batch (the fp store) and not earlier within the same
# batch (ordered by (doc_id, pos)). Documents are rewritten from their
# surviving blocks and appended to ``out/docs``; the fingerprints of the
# accepted blocks become the store. Same scale discipline as
# stream_dedup_corpus: the store side carries 16-byte digests only.


def split_doc_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """Explode documents into fingerprinted fixed-size token blocks."""
    from hls_payer_mrf_sparkstreaming_spark.operators.dedup import (
        _LINE_BLOCK_TOKENS,
        block_split_expr,
    )

    n = n or _LINE_BLOCK_TOKENS
    return df.select(
        id_col,
        *(carry or []),
        F.posexplode(F.expr(block_split_expr(text_col, n))).alias(
            "pos", "block"
        ),
    ).withColumn("fp", F.md5("block"))


def _reassemble(blocks: DataFrame, id_col: str) -> DataFrame:
    """Per-document rewrite from flagged blocks: surviving blocks (keep)
    re-concatenated in position order."""
    return blocks.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "block"))
                    )
                ),
                lambda s: s["block"],
            ),
            " ",
        ).alias("clean_text"),
    )


def line_dedup_reference(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_col: str | None = None,
    n: int | None = None,
) -> DataFrame:
    """Batch twin of the incremental stream: each block fingerprint's FIRST
    occurrence in (batch, id, pos) order survives; every later occurrence
    is dropped. With no ``batch_col`` the whole corpus is one batch."""
    b = split_doc_blocks(
        docs, id_col, text_col, n, carry=[batch_col] if batch_col else None
    )
    order = ([batch_col] if batch_col else []) + [id_col, "pos"]
    w = Window.partitionBy("fp").orderBy(*order)
    b = b.withColumn("keep", F.row_number().over(w) == 1)
    return _reassemble(b, id_col)


def stream_line_dedup(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    n: int | None = None,
):
    """Start the incremental line-dedup stream over a parquet document
    source and return the streaming query (``availableNow``). Rewritten
    documents land in ``out_dir/docs`` (doc_id, n_blocks, n_kept,
    clean_text); accepted block fingerprints in ``out_dir/fps``."""
    docs_dir = os.path.join(out_dir, "docs")
    fps_dir = os.path.join(out_dir, "fps")
    schema = spark.read.parquet(input_dir).schema

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        b = split_doc_blocks(batch, id_col, text_col, n)
        w = Window.partitionBy("fp").orderBy(id_col, "pos")
        b = b.withColumn("_first", F.row_number().over(w) == 1)
        try:
            seen = (
                spark.read.parquet(fps_dir)
                .select("fp")
                .withColumn("_seen", F.lit(True))
            )
            b = b.join(seen, "fp", "left")
        except Exception:  # first batch: no store yet
            b = b.withColumn("_seen", F.lit(None).cast("boolean"))
        b = b.withColumn(
            "keep", F.col("_first") & F.col("_seen").isNull()
        ).persist()
        _reassemble(b, id_col).write.mode("append").parquet(docs_dir)
        b.filter("keep").select("fp").write.mode("append").parquet(fps_dir)
        b.unpersist()

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
