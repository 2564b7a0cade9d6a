"""Multimodal columns: opaque binary payloads + typed metadata structs.

Pattern for image/audio/video at 100 TB: the bytes live in a ``binary``
column (or object-store URIs for >1 MB payloads), typed metadata travels in
a sibling struct, and decode/feature steps run as Arrow-batched
``mapInPandas`` over the binary column — partition-parallel, no driver
involvement, and the Python boundary is crossed once per batch, not per
row.

The decode kernel itself is STUBBED here (image/audio libraries are not in
this container): ``fake_decode_meta`` derives deterministic pseudo
width/height/duration from the payload bytes so the plumbing — schema,
batching, partitioning — is real and testable; ``decode_image`` raises
NotImplementedError where PIL/libvips would plug in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hls_payer_mrf_sparkstreaming_spark.operators.suite import load, query


@query(
    "multimodal_meta",
    oracle="""
        SELECT source,
               count(*) AS n_blobs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents GROUP BY source
    """,
    description="binary-column construction + metadata aggregation: blobs "
    "as binary, stats computed on metadata only (bytes never shuffled)",
)
def multimodal_meta(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.encode("text", "utf-8").alias("blob"),
    )
    size = F.octet_length("blob")
    # both sides present int64: DuckDB's sum() is HUGEINT and Spark's
    # min/max(octet_length) is int32 — cast here and in the oracle SQL so
    # the driver's type canonicalization sees identical dtypes.
    return blobs.groupBy("source").agg(
        F.count("*").alias("n_blobs"),
        F.sum(size).cast("long").alias("total_bytes"),
        F.min(size).cast("long").alias("min_bytes"),
        F.max(size).cast("long").alias("max_bytes"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("frame_sample", BinaryType()),
    ]
)


def decode_image(payload: bytes):
    """Real decoder plug point (PIL/libvips/ffmpeg live here in prod)."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoder: pseudo width/height derived
    from the payload bytes."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return 64 + h % 1024, 64 + (h // 1024) % 1024


def decode_blobs(blobs: DataFrame, media_type: str = "image") -> DataFrame:
    """Arrow-batched decode over a (doc_id, blob) DataFrame.

    mapInPandas: one Python process per partition, pandas batches in/out —
    the scalable shape for real decoders (swap fake_decode_meta for
    decode_image)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h = zip(*(fake_decode_meta(b) for b in pdf["blob"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": media_type,
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "width": list(w),
                    "height": list(h),
                    # frame sample = first 16 bytes (stand-in for a thumbnail)
                    "frame_sample": [bytes(b[:16]) for b in pdf["blob"]],
                }
            )

    return blobs.mapInPandas(decode, DECODED_SCHEMA)


@query(
    "multimodal_decode",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(
                               range(1, least(length(text), 64) + 1),
                               j -> CAST(unicode(substring(text, j, 1))
                                         AS BIGINT))),
                       (a, b) -> (a * 131 + b) & 2147483647) AS hv
            FROM documents
        )
        SELECT doc_id, 'image' AS media_type, n_bytes,
               CAST(64 + hv % 1024 AS BIGINT) AS width,
               CAST(64 + (hv // 1024) % 1024 AS BIGINT) AS height
        FROM h
    """,
    description="Arrow-batched mapInPandas decode pipeline over binary "
    "blobs. The stub kernel (imaging libs absent from this container) is "
    "deterministic bytes-math — a 31-bit multiply-add fold over the first "
    "64 payload bytes — so a DuckDB list_reduce over code points (the "
    "corpus is ASCII: byte == code point, same assumption as the audio "
    "oracle) replays it exactly and the driver hash-checks the full "
    "distributed decode plumbing; a real decoder is a drop-in for the "
    "kernel with the same (blob in, rows out) contract",
)
def multimodal_decode(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return decode_blobs(blobs).select(
        "doc_id", "media_type", "n_bytes", "width", "height"
    )


# ---------------------------------------------------------------------------
# Frame sampling: video-style strided frame extraction from binary payloads
# ---------------------------------------------------------------------------

FRAME_BYTES = 32  # fixed-size "frame" (stand-in for a decoded video frame)
FRAME_STRIDE = 4  # keep every 4th frame

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    blobs: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Strided frame sampling over a (doc_id, blob) DataFrame via
    Arrow-batched mapInPandas — the video-pipeline shape: a container's
    bytes arrive once per batch, the kernel slices frames 0, stride,
    2*stride, ... and emits one row per KEPT frame, so the expensive
    downstream (feature extraction) sees 1/stride of the data.

    The kernel decodes each payload (utf-8 here; ffmpeg in a real
    pipeline), slices fixed-width frames off the decoded form, and
    fingerprints each kept frame — deterministic, so a DuckDB
    substring/md5 oracle replays it exactly: the mapInPandas plumbing
    (batch iteration, 1-to-many fan-out, binary handling) is what's being
    proven, not the codec. The trailing partial frame is kept (real
    samplers keep the last frame)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                decoded = bytes(blob).decode("utf-8")
                n_frames = max(1, -(-len(decoded) // frame_bytes))
                for i in range(0, n_frames, stride):
                    frame = decoded[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return blobs.mapInPandas(kernel, FRAMES_SCHEMA)


@query(
    "multimodal_framesample",
    oracle=f"""
        WITH frames AS (
            SELECT doc_id,
                   unnest(range(0,
                       greatest(CAST(ceil(length(text)
                                          / {FRAME_BYTES}.0) AS BIGINT), 1),
                       {FRAME_STRIDE})) AS frame_idx,
                   text
            FROM documents
        )
        SELECT doc_id, frame_idx,
               md5(substring(text, frame_idx * {FRAME_BYTES} + 1,
                             {FRAME_BYTES})) AS frame_md5
        FROM frames
    """,
    description="strided frame sampling from binary payloads through "
    "Arrow-batched mapInPandas (one Python crossing per batch, 1-to-many "
    "fan-out, binary in / rows out) — the deterministic byte-slicing "
    "kernel lets a BLOB-substring oracle verify the distributed plumbing "
    "exactly; a real pipeline drops an ffmpeg decode into the same kernel",
)
def multimodal_framesample(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return sample_frames(blobs)


# ---------------------------------------------------------------------------
# Audio-style windowed energy over binary payloads
# ---------------------------------------------------------------------------

AUDIO_WIN = 64  # samples per analysis window
AUDIO_HOP = 32  # hop between window starts

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
    ]
)


def windowed_energy(
    blobs: DataFrame, win: int = AUDIO_WIN, hop: int = AUDIO_HOP
) -> DataFrame:
    """Audio-feature shape: sliding-window energy over a (doc_id, blob)
    PCM-like payload via Arrow-batched mapInPandas. The kernel treats
    each byte as an unsigned 8-bit sample, centers at 128, and emits one
    row per hop with the window's exact integer sum of squares — numpy
    vectorized per batch, one Python crossing per Arrow batch. A real
    pipeline swaps the byte view for a soundfile/librosa decode with the
    identical (blob in, feature rows out) contract; the deterministic
    stand-in kernel is what lets a DuckDB code-point oracle verify the
    distributed plumbing bit-exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, winidx, counts, energies = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                samples = (
                    np.frombuffer(bytes(blob), dtype=np.uint8).astype(
                        np.int64
                    )
                    - 128
                )
                n = len(samples)
                k = 0
                for start in range(0, max(n, 1), hop):
                    w = samples[start : start + win]
                    ids.append(doc_id)
                    winidx.append(k)
                    counts.append(len(w))
                    energies.append(int((w * w).sum()))
                    k += 1
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": winidx,
                    "n_samples": counts,
                    "energy": energies,
                }
            )

    return blobs.mapInPandas(kernel, AUDIO_SCHEMA)


@query(
    "multimodal_audio_energy",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, text,
                   unnest(range(0,
                       greatest(CAST(ceil(length(text)
                                          / {AUDIO_HOP}.0) AS BIGINT), 1)))
                       AS win_idx
            FROM documents
        ),
        win AS (
            SELECT doc_id, win_idx,
                   substring(text, win_idx * {AUDIO_HOP} + 1, {AUDIO_WIN})
                       AS chunk
            FROM w
        )
        SELECT doc_id, win_idx,
               CAST(length(chunk) AS BIGINT) AS n_samples,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(chunk) + 1),
                           j -> CAST((unicode(substring(chunk, j, 1)) - 128)
                                     * (unicode(substring(chunk, j, 1)) - 128)
                                     AS BIGINT))),
                   (a, x) -> a + x) AS BIGINT) AS energy
        FROM win
    """,
    description="audio-style windowed energy: 64-sample windows at hop 32 "
    "over binary payloads through Arrow-batched mapInPandas (numpy "
    "sum-of-squares per window, exact integers) — the spectral-feature "
    "extraction shape for an audio corpus; the ASCII corpus makes byte "
    "values equal code points, so a DuckDB substring/unicode oracle "
    "replays the kernel exactly and proves the batch plumbing",
)
def multimodal_audio_energy(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return windowed_energy(blobs)


# ---------------------------------------------------------------------------
# Tile statistics: per-region reduction over binary payloads
# ---------------------------------------------------------------------------

TILE_BYTES = 256  # one "tile" = 256 payload bytes (stand-in for a 16x16 patch)

TILES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tile_idx", LongType()),
        StructField("n", LongType()),
        StructField("mean_milli", LongType()),
        StructField("max_byte", LongType()),
    ]
)


def tile_stats(blobs: DataFrame, tile_bytes: int = TILE_BYTES) -> DataFrame:
    """Per-tile byte statistics via an Arrow-batched numpy kernel — the
    plumbing shape of real patch/tile feature extractors (ViT patch
    embeddings, CLIP tiles): blob in, one row per region out, all stats
    exact integers. Swap the byte-mean for a model forward pass and the
    contract is unchanged."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tiles, ns, means, maxs = [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                a = np.frombuffer(blob, dtype=np.uint8)
                for t in range(0, len(a), tile_bytes):
                    seg = a[t : t + tile_bytes]
                    ids.append(doc_id)
                    tiles.append(t // tile_bytes)
                    ns.append(len(seg))
                    means.append(
                        int(seg.sum(dtype=np.int64)) * 1000 // len(seg)
                    )
                    maxs.append(int(seg.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "tile_idx": tiles,
                    "n": ns,
                    "mean_milli": means,
                    "max_byte": maxs,
                }
            )

    return blobs.mapInPandas(kernel, TILES_SCHEMA)


@query(
    "multimodal_tile_stats",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, encode(text) AS blob,
                   octet_length(encode(text)) AS nb
            FROM documents
        ),
        ti AS (
            SELECT doc_id, blob, nb,
                   unnest(range(CAST(ceil(CAST(nb AS DOUBLE)
                                / {TILE_BYTES}) AS BIGINT))) AS tile_idx
            FROM b
        ),
        t AS (
            SELECT doc_id, tile_idx,
                   least(nb - tile_idx * {TILE_BYTES}, {TILE_BYTES})
                       AS n,
                   list_transform(
                       range(1, least(nb - tile_idx * {TILE_BYTES},
                                      {TILE_BYTES}) + 1),
                       j -> CAST(unicode(substring(
                                CAST(blob AS VARCHAR),
                                tile_idx * {TILE_BYTES} + j, 1))
                            AS BIGINT)) AS bytes_list
            FROM ti
        )
        SELECT doc_id, CAST(tile_idx AS BIGINT) AS tile_idx,
               CAST(n AS BIGINT) AS n,
               CAST(list_sum(bytes_list) * 1000 // n AS BIGINT)
                   AS mean_milli,
               CAST(list_max(bytes_list) AS BIGINT) AS max_byte
        FROM t
    """,
    description="Per-tile byte statistics over binary payloads via an "
    "Arrow-batched numpy mapInPandas kernel — one row per {b}-byte "
    "region, exact integer mean/max — the plumbing shape of patch/tile "
    "feature extraction (ViT patches, CLIP tiles): swap the byte-mean "
    "for a model forward pass, same contract. The oracle replays the "
    "kernel in DuckDB over code points (ASCII corpus: byte == code "
    "point), so the whole distributed Python boundary is hash-checked"
    .replace("{b}", str(TILE_BYTES)),
)
def multimodal_tile_stats(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return tile_stats(blobs)


# ---------------------------------------------------------------------------
# Perceptual hash (aHash family) over binary payloads — the image-dedup
# primitive: 64 region means over the blob (the stand-in for an 8x8
# downsampled grayscale image), one bit per region (above/below the whole-
# payload mean). Identical blobs hash identically; near-identical payloads
# differ in few bits, so downstream near-dup matching is exactly the
# hamming-banded machinery simhash_hamming_pairs already implements for
# text. The kernel is the real plumbing: swap the byte-block means for a
# DCT over decoded pixels and the contract (blob in, 64-bit hash out) is
# unchanged.
# ---------------------------------------------------------------------------

_PHASH_BITS = 64

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", StringType()),
        StructField("n_set_bits", LongType()),
    ]
)


def phash_blobs(blobs: DataFrame) -> DataFrame:
    """Arrow-batched numpy aHash kernel over a (doc_id, blob) DataFrame.

    Exact integer arithmetic throughout (milli-unit floor-divided means)
    so the distributed Python boundary hash-checks against the DuckDB
    replay. Payloads shorter than 64 bytes are dropped (no full grid).
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, pops = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if blob is None:
                    # NULL payloads drop, matching the oracle's implicit
                    # NULL filter (octet_length(NULL) >= 64 is NULL).
                    continue
                a = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                nb = len(a)
                if nb < _PHASH_BITS:
                    continue
                doc_mean_milli = int(a.sum()) * 1000 // nb
                cuts = [
                    (i * nb) // _PHASH_BITS
                    for i in range(_PHASH_BITS + 1)
                ]
                bits = []
                for i in range(_PHASH_BITS):
                    seg = a[cuts[i] : cuts[i + 1]]
                    bm = int(seg.sum()) * 1000 // len(seg)
                    bits.append("1" if bm > doc_mean_milli else "0")
                ids.append(doc_id)
                hashes.append("".join(bits))
                pops.append(sum(1 for b in bits if b == "1"))
            yield pd.DataFrame(
                {"doc_id": ids, "phash": hashes, "n_set_bits": pops}
            )

    return blobs.mapInPandas(kernel, PHASH_SCHEMA)


@query(
    "multimodal_phash",
    oracle=f"""
        WITH b AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS nb,
                   list_transform(range(1, octet_length(encode(text)) + 1),
                       j -> CAST(unicode(substring(text, j, 1)) AS BIGINT))
                       AS bl
            FROM documents
            WHERE octet_length(encode(text)) >= {_PHASH_BITS}
        ),
        m AS (
            SELECT doc_id, nb, bl,
                   CAST(list_sum(bl) * 1000 // nb AS BIGINT)
                       AS doc_mean_milli
            FROM b
        )
        SELECT doc_id,
               array_to_string(list_transform(range(0, {_PHASH_BITS}), i ->
                   CASE WHEN
                       CAST(list_sum(bl[(i * nb) // {_PHASH_BITS} + 1
                                        : ((i + 1) * nb) // {_PHASH_BITS}])
                            * 1000
                            // (((i + 1) * nb) // {_PHASH_BITS}
                                - (i * nb) // {_PHASH_BITS})
                            AS BIGINT) > doc_mean_milli
                   THEN '1' ELSE '0' END), '') AS phash,
               CAST(len(list_filter(list_transform(range(0, {_PHASH_BITS}),
                   i -> CASE WHEN
                       CAST(list_sum(bl[(i * nb) // {_PHASH_BITS} + 1
                                        : ((i + 1) * nb) // {_PHASH_BITS}])
                            * 1000
                            // (((i + 1) * nb) // {_PHASH_BITS}
                                - (i * nb) // {_PHASH_BITS})
                            AS BIGINT) > doc_mean_milli
                   THEN 1 ELSE 0 END), x -> x = 1)) AS BIGINT)
                   AS n_set_bits
        FROM m
    """,
    description=f"perceptual hash (aHash) over binary payloads: "
    f"{_PHASH_BITS} region means per blob, one bit per region vs the "
    "whole-payload mean, all in exact integer milli-units — the "
    "image-dedup primitive whose kernel swaps byte-block means for a "
    "DCT over decoded pixels in production (same blob-in/hash-out "
    "contract). Arrow-batched numpy mapInPandas, hash-checked against a "
    "DuckDB replay over code points (ASCII corpus: byte == code point); "
    "near-match grouping at scale reuses the hamming-banded self-join "
    "simhash_hamming_pairs implements",
)
def multimodal_phash(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return phash_blobs(blobs)


# ---------------------------------------------------------------------------
# Aspect-ratio bucketing — the batching primitive for image training
# (LAION/SDXL-style): variable-aspect images can't share a tensor batch, so
# each image snaps to the nearest ratio in a fixed ladder and batches form
# within a bucket. The assignment must be exact-integer (no float log-ratio
# distances) so the distributed result hash-checks against the oracle.
# ---------------------------------------------------------------------------

# (bw, bh) ladder; _ASPECT_SCALE is a common multiple of every bh so the
# cross-multiplied distance |w*bh - h*bw| * (SCALE/bh) compares exactly
# across buckets without rationals
_ASPECT_LADDER = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (2, 1), (1, 2)]
_ASPECT_SCALE = 144


def _aspect_costs_sql(w: str, h: str) -> list[str]:
    return [
        f"(abs({w} * {bh} - {h} * {bw}) * {_ASPECT_SCALE // bh})"
        for bw, bh in _ASPECT_LADDER
    ]


def _aspect_label_sql(w: str, h: str) -> str:
    costs = _aspect_costs_sql(w, h)
    m = "least(" + ", ".join(costs) + ")"
    whens = " ".join(
        f"WHEN {c} = {m} THEN '{bw}:{bh}'"
        for c, (bw, bh) in zip(costs, _ASPECT_LADDER)
    )
    return f"CASE {whens} END"


@query(
    "multimodal_aspect_bucket",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(
                               range(1, least(length(text), 64) + 1),
                               j -> CAST(unicode(substring(text, j, 1))
                                         AS BIGINT))),
                       (a, b) -> (a * 131 + b) & 2147483647) AS hv
            FROM documents
        ),
        wh AS (
            SELECT doc_id,
                   CAST(64 + hv % 1024 AS BIGINT) AS w,
                   CAST(64 + (hv // 1024) % 1024 AS BIGINT) AS h
            FROM h
        )
        SELECT {_aspect_label_sql('w', 'h')} AS aspect_bucket,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(w * h) AS BIGINT) AS total_pixels,
               CAST(sum(w) AS BIGINT) AS sum_width,
               CAST(sum(h) AS BIGINT) AS sum_height
        FROM wh GROUP BY 1
    """,
    description="aspect-ratio bucketing over the decoded image metadata "
    "(the batching primitive for variable-aspect image training: a "
    "tensor batch must share a shape, so every image snaps to the "
    "nearest ratio in a fixed 7-entry ladder and batches form within a "
    "bucket). Nearest = argmin over EXACT cross-multiplied integer "
    "distances |w*bh - h*bw| scaled to a common denominator — no float "
    "log-ratio, so the distributed assignment hash-matches the DuckDB "
    "replay bit for bit; ties take the earliest ladder entry. Dimensions "
    "come from the same Arrow-batched mapInPandas decode pipeline as "
    "multimodal_decode (stub kernel replayed byte-exactly by the "
    "oracle); the aggregate shuffles 7 buckets of partial sums, never "
    "pixels",
)
def multimodal_aspect_bucket(spark, sf_dir):
    blobs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    wh = decode_blobs(blobs).select("doc_id", "width", "height")
    costs = [
        F.abs(F.col("width") * bh - F.col("height") * bw)
        * (_ASPECT_SCALE // bh)
        for bw, bh in _ASPECT_LADDER
    ]
    m = F.least(*costs)
    expr = None
    for c, (bw, bh) in zip(costs, _ASPECT_LADDER):
        branch = (c == m, F.lit(f"{bw}:{bh}"))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    return (
        wh.select(
            expr.alias("aspect_bucket"),
            "width",
            "height",
        )
        .groupBy("aspect_bucket")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum(F.col("width") * F.col("height"))
            .cast("long")
            .alias("total_pixels"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
        )
    )
