"""Sequence-assembly operators for LLM training-data pipelines: sliding-
window chunking (context-window splitting with overlap) and concat-and-
chunk sequence packing (the GPT-style "concatenate documents, split every
B tokens" layout).

Both are pure column expressions / windowed aggregations — no Python in
the hot path. Packing is computed per ``lang`` shard so the prefix-sum
window parallelizes across shards instead of serializing the corpus
through one partition; at 100 TB you would shard finer (e.g.
``(lang, crc32(doc_id) % n_shards)``) and the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.suite import load, query

CHUNK_W = 32  # tokens per sliding window
CHUNK_S = 24  # stride (overlap = W - S = 8 tokens)
PACK_B = 256  # tokens per packed training sequence


@query(
    "text_chunk_sliding",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        s AS (
            SELECT doc_id, t,
                   unnest(range(1, len(t) + 1, {CHUNK_S})) AS start
            FROM toks
        )
        SELECT doc_id,
               CAST((start - 1) // {CHUNK_S} AS INT) AS chunk_idx,
               CAST(len(list_slice(t, start, start + {CHUNK_W - 1})) AS INT)
                   AS n_chunk_tokens,
               md5(array_to_string(
                   list_slice(t, start, start + {CHUNK_W - 1}), ' '))
                   AS chunk_fp
        FROM s
    """,
    description=f"sliding-window chunking: split each document into "
    f"{CHUNK_W}-token windows with stride {CHUNK_S} (overlap "
    f"{CHUNK_W - CHUNK_S}) — the retrieval/context-window splitter. "
    "Window starts are a per-row sequence() expanded with posexplode; "
    "the slice + fingerprint run in codegen, so the operator is "
    "scan-bound and embarrassingly parallel (no shuffle at all)",
)
def text_chunk_sliding(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(CHUNK_S)
    )
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_W)
    return (
        docs.select(
            "doc_id",
            "t",
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
        )
    )


@query(
    "pack_sequences",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_toks
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, n_toks,
                   sum(n_toks) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS end_tok
            FROM d
        )
        SELECT doc_id, lang,
               CAST(n_toks AS BIGINT) AS n_toks,
               CAST(end_tok - n_toks AS BIGINT) AS start_tok,
               CAST((end_tok - n_toks) // {PACK_B} AS BIGINT) AS seq_first,
               CAST((end_tok - 1) // {PACK_B} AS BIGINT) AS seq_last,
               CAST((end_tok - 1) // {PACK_B}
                    - (end_tok - n_toks) // {PACK_B} + 1 AS BIGINT)
                   AS n_seqs_spanned
        FROM c
    """,
    description=f"concat-and-chunk sequence packing manifest: documents are "
    f"concatenated in doc_id order per lang shard and split into "
    f"{PACK_B}-token training sequences; each doc's token span "
    "[start_tok, start_tok + n_toks) maps to the sequence ids it lands in. "
    "One prefix-sum window per shard (skinny rows: id + token count, "
    "never text) — shards pack independently, so the plan parallelizes "
    "across a cluster instead of serializing the corpus",
)
def pack_sequences(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_toks")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end_tok = F.sum("n_toks").over(w)
    c = d.select(
        "doc_id",
        "lang",
        "n_toks",
        (end_tok - F.col("n_toks")).alias("start_tok"),
        (end_tok - 1).alias("last_tok"),
    )
    seq_first = F.expr(f"start_tok div {PACK_B}")
    seq_last = F.expr(f"last_tok div {PACK_B}")
    return c.select(
        "doc_id",
        "lang",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("start_tok").cast("long").alias("start_tok"),
        seq_first.cast("long").alias("seq_first"),
        seq_last.cast("long").alias("seq_last"),
        (seq_last - seq_first + 1).cast("long").alias("n_seqs_spanned"),
    )


MAX_LEN = 32  # model context length for the id tensor
VOCAB_V = 256  # vocabulary size (ids 2..V+1; 1 = OOV, 0 = pad)


@query(
    "tokenize_pad_ids",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        alltok AS (SELECT unnest(toks) AS tok FROM t),
        v AS (
            SELECT tok, count(*) AS cnt FROM alltok GROUP BY tok
            ORDER BY cnt DESC, tok LIMIT {VOCAB_V}
        ),
        vid AS (
            SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) + 1
                             AS INT) AS id
            FROM v
        ),
        e AS (
            SELECT doc_id, toks,
                   unnest(range(1, least(len(toks), {MAX_LEN}) + 1)) AS pos
            FROM t
        ),
        e2 AS (SELECT doc_id, pos, toks[pos] AS tok FROM e),
        j AS (
            SELECT doc_id, pos, coalesce(vid.id, 1) AS id
            FROM e2 LEFT JOIN vid USING (tok)
        ),
        a AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_tokens_kept,
                   list(id ORDER BY pos) AS ids
            FROM j GROUP BY doc_id
        )
        SELECT doc_id, n_tokens_kept,
               CAST(to_json(list_concat(ids,
                    list_transform(range({MAX_LEN} - len(ids)), i -> 0)))
                    AS VARCHAR) AS ids_json
        FROM a
    """,
    description=f"tokenizer-to-tensor step: map each document's first "
    f"{MAX_LEN} tokens to integer ids under the corpus's top-{VOCAB_V} "
    "vocabulary (id = frequency rank + 1, OOV = 1) and right-pad with 0 "
    "to a fixed-length id row — the layout a training dataloader consumes. "
    "The vocabulary is one partially-aggregated count + "
    "TakeOrderedAndProject, documents join it BROADCAST after a "
    "truncated posexplode (never the full token stream), and order is "
    "restored with sort_array over (pos, id) structs so the result is "
    "deterministic under any partitioning. ids render via to_json for "
    "cross-engine hashing",
)
def tokenize_pad_ids(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # vocabulary over the FULL token stream (not the truncated prefix)
    v = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(VOCAB_V)
    )
    w = Window.orderBy(F.desc("cnt"), "tok")
    vid = v.select(
        "tok", (F.row_number().over(w) + 1).cast("int").alias("id")
    )
    e = docs.select(
        "doc_id",
        F.posexplode(F.slice("toks", 1, MAX_LEN)).alias("pos", "tok"),
    )
    j = e.join(F.broadcast(vid), "tok", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("id"), F.lit(1).cast("int")).alias("id"),
    )
    ids_in_order = F.transform(
        F.sort_array(F.collect_list(F.struct("pos", "id"))),
        lambda s: s["id"],
    )
    padded = F.concat(
        ids_in_order,
        F.array_repeat(
            F.lit(0).cast("int"), MAX_LEN - F.size(ids_in_order)
        ),
    )
    return j.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens_kept"),
        F.to_json(padded).alias("ids_json"),
    )


_PAD_MIN_BUCKET = 16  # smallest padded batch shape


@query(
    "pad_bucket_waste",
    oracle=f"""
        WITH d AS (
            SELECT lang, len(string_split(text, ' ')) AS n_toks
            FROM documents
        ),
        b AS (
            SELECT lang, n_toks,
                   greatest({_PAD_MIN_BUCKET},
                            1 << length(bin(n_toks - 1))) AS bucket_tokens
            FROM d
        )
        SELECT lang, CAST(bucket_tokens AS BIGINT) AS bucket_tokens,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS real_tokens,
               CAST(count(*) * bucket_tokens AS BIGINT) AS padded_tokens,
               CAST((count(*) * bucket_tokens - sum(n_toks)) * 1000000
                    // (count(*) * bucket_tokens) AS BIGINT) AS waste_ppm
        FROM b GROUP BY lang, bucket_tokens
    """,
    description="padding-bucket waste report: every doc pads up to the "
    "next power-of-two token bucket (the dynamic-batching shape rule — "
    "batches must share a tensor length, and power-of-two buckets bound "
    "pad overhead at 50%), and the report shows docs, real vs padded "
    "tokens, and the exact-ppm waste per (lang, bucket). This is the "
    "artifact that decides between padded batching and pack_sequences' "
    "concat-and-chunk layout for a corpus. Bucket = 1 << bit_length(n-1) "
    "via binary-string length — exact integers in both engines, no "
    "float log2 edge cases at powers of two (same primitive as "
    "token_length_histogram). One partial-agg groupBy over a scan; "
    "shuffles only (lang, bucket, partial sums)",
)
def pad_bucket_waste(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).alias("n_toks")
    )
    # SQL-form shiftleft: the Python API wants a literal bit count, the
    # SQL function accepts a column
    bucket = F.greatest(
        F.lit(_PAD_MIN_BUCKET),
        F.expr("shiftleft(1, CAST(length(bin(n_toks - 1)) AS INT))"),
    ).cast("long")
    return (
        d.select("lang", "n_toks", bucket.alias("bucket_tokens"))
        .groupBy("lang", "bucket_tokens")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("real_tokens"),
            (F.count("*") * F.col("bucket_tokens"))
            .cast("long")
            .alias("padded_tokens"),
            F.expr(
                "(count(*) * bucket_tokens - sum(n_toks)) * 1000000 "
                "DIV (count(*) * bucket_tokens)"
            )
            .cast("long")
            .alias("waste_ppm"),
        )
    )
