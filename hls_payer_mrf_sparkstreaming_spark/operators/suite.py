"""Central registry of oracle-checked queries.

Every operator the engine claims is registered here as a
``(spark_fn, oracle_sql)`` pair with IDENTICAL output column names, so the
driver (and ``tests/test_oracle.py``) can hash-compare Spark vs DuckDB on
the same parquet inputs. ``oracle=None`` marks genuinely
non-SQL-expressible ops (custom streaming, hash families DuckDB lacks) —
those get rows-only checks plus dedicated pytest coverage.

Float discipline (the driver hash is exact): monetary/real aggregates are
computed in exact integer units (cents / basis points) and divided back at
the end, so Spark's parallel summation order can never produce a ULP diff
vs DuckDB. MIN/MAX/COUNT are order-insensitive and used raw.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@dataclass
class QueryPair:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str


REGISTRY: dict[str, QueryPair] = {}


def query(name: str, oracle: Optional[str] = None, description: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryPair(fn, oracle, description)
        return fn

    return deco


def _usec_copy(path: str) -> str:
    """Spark rejects parquet TIMESTAMP(NANOS) columns ([PARQUET_TYPE_ILLEGAL]);
    DuckDB truncates them to micros. Make a one-time µs-cast copy so both
    engines see identical values. No-op for files without ns timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # a "table" may be a directory of part files (any real deployment);
    # the schema probe reads one part, the conversion reads the dataset
    schema_path = path
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if p.endswith(".parquet")
        )
        if not parts:
            return path
        schema_path = parts[0]
    schema = pq.read_schema(schema_path)
    if not any(
        pa.types.is_timestamp(f.type) and f.type.unit == "ns" for f in schema
    ):
        return path
    key = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), "spark_graft_usec", key)
    out = os.path.join(out_dir, os.path.basename(path))
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        table = pq.read_table(path)
        target = pa.schema(
            [
                pa.field(
                    f.name,
                    pa.timestamp("us")
                    if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
                    else f.type,
                )
                for f in table.schema
            ]
        )
        tmp = out + ".tmp"
        pq.write_table(table.cast(target, safe=False), tmp)
        os.replace(tmp, out)
    return out


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(_usec_copy(f"{sf_dir}/{table}.parquet"))


def rebalance(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism when the
    scan yields fewer partitions.

    CPU-dense per-row operators (per-shingle hashing, per-bit SimHash votes,
    centroid folds) otherwise run on a handful of cores when the input is a
    few small-but-dense files — a 5 MB parquet of 5k documents is ONE scan
    partition, so 31 of 32 cores idle through the most expensive stage. At
    real scale the scan already has more partitions than cores and this is
    a no-op, so nothing extra shuffles on a large cluster.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # estimate the scan's partition count from file sizes instead of
    # df.rdd.getNumPartitions() — the .rdd probe converts the plan to an
    # RDD (analyzer + physical planning) on every call, while inputFiles()
    # only consults the file index driver-side
    try:
        from urllib.parse import unquote, urlparse

        files = df.inputFiles()
        if not files:
            # not a file scan (in-memory relation, stream, ...): no basis
            # for an estimate — leave the plan alone
            return df
        total = 0
        for f in files:
            # inputFiles() returns URIs with percent-encoded paths
            p = unquote(urlparse(f).path) if "://" in f else unquote(
                f.removeprefix("file:")
            )
            total += os.path.getsize(p)
        est_partitions = max(1, -(-total // _parse_bytes_conf(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )))
    except Exception:
        # unknown scan size: leave the plan alone — a silent fallback to
        # "1 partition, so repartition everything" would add a corpus-wide
        # shuffle at exactly the scale where it hurts most
        return df
    if est_partitions >= max(2, target // 2):
        return df
    return df.repartition(target)


_SIZE_SUFFIXES = {
    "k": 1 << 10,
    "m": 1 << 20,
    "g": 1 << 30,
    "t": 1 << 40,
    "p": 1 << 50,
}


def _parse_bytes_conf(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m', '128MB',
    case-insensitive) into bytes, mirroring JavaUtils.byteStringAsBytes."""
    s = v.strip().lower().removesuffix("b")
    if s and s[-1] in _SIZE_SUFFIXES:
        return int(float(s[:-1]) * _SIZE_SUFFIXES[s[-1]])
    return int(s)


# The driver's CORRECTNESS harness verifies the FIRST 50 registry entries
# only, so ordering is a verification-coverage decision, not cosmetics.
# Entries that have never received a driver row (or were red / no_oracle in
# the last round) go first; entries green in BOTH r2 and r3 go last — their
# correctness is already on record. Keep newly added operators inside the
# first 50 by appending them to this list.
_DRIVER_PRIORITY = [
    # round-8 window. Never-driver-checked entries outrank everything
    # (test_driver_priority_names_exist_and_new_ops_in_window enforces
    # they sit inside the first 50); then the operators whose ORACLE
    # DEFINITION changed this round (the graph family now replays the
    # LSH-blocked edge CTE — their older green rows certified the old
    # exact-blocked definition and are void); then the r4-stale rotation
    # (44 of the 48 operators whose last driver row is round 4 — the
    # window holds 50, so the 4 most trivial/untouched ops wait one more
    # round: filter_eq, project_substr, class_weights, event_funnel).
    # never driver-checked (new in round 8)
    "neardup_pairs_lsh",
    "corpus_overlap_sketch",
    "lsh_edge_recall",
    # oracle definition changed in round 8 (LSH-blocked edges) and not
    # already in the r4-stale rotation below
    "dedup_cluster_survivors",
    "dedup_graph_stats",
    "graph_pagerank",
    # r4-stale rotation (last driver row round 4); dedup_cluster,
    # graph_triangles also carry the round-8 oracle change, anomaly_mad
    # the round-8 single-lineage rewrite
    "mrf_silver_prices",
    "mrf_silver_providers",
    "mrf_variant_codes",
    "mrf_gold_shoppable",
    "dedup_cluster",
    "graph_triangles",
    "dedup_containment",
    "anomaly_mad",
    "corpus_overlap",
    "ngram_counts",
    "rolling_user_spend",
    "embedding_drift_centroids",
    "embedding_neardup_pairs",
    "embedding_quantize",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "ann_recall_eval",
    "knn_join",
    "bm25_search",
    "rank_fusion_rrf",
    "unigram_logprob_score",
    "decontaminate",
    "pii_scrub",
    "text_repetition",
    "text_chunk_sliding",
    "token_length_histogram",
    "tokenize_pad_ids",
    "pack_sequences",
    "shard_manifest",
    "zorder_tiles",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_framesample",
    "multimodal_audio_energy",
    "quality_funnel",
    "corpus_mix",
    "profile_columns",
    "corr_stats",
    "drift_ks",
    "histogram_prices",
    "approx_distinct_users",
    "approx_percentile_summary",
    "cdc_apply_changelog",
    # ---- the 50-entry driver window ends here ----
    # r4-stale leftovers (trivial untouched ops, next round's rotation)
    "event_funnel",
    "filter_eq",
    "project_substr",
    "class_weights",
    # r5 greens (rotation candidates after that)
    "surrogate_keys",
    "explode_tokens",
    "nested_extract",
    "cross_join",
    "param_filter",
    "limit_topk",
    "array_index",
    "rollup_counts",
    "semi_anti_join",
    "star_join_revenue",
    "semantic_dedup",
    "bloom_prefilter",
    "pca_power_iteration",
]


def all_queries() -> dict[str, QueryPair]:
    """Import every operator module (side effect: registration) and return
    the full registry, ordered so the driver's 50-entry correctness window
    covers the least-recently-verified operators first."""
    import hls_payer_mrf_sparkstreaming_spark.operators.relational  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.temporal  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.dedup  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.sampling  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.clustering  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.text_analysis  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.packing  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.stats  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.similarity  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.multimodal  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.operators.retrieval  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.plans.mrf_queries  # noqa: F401
    import hls_payer_mrf_sparkstreaming_spark.plans.variant  # noqa: F401

    ordered: dict[str, QueryPair] = {}
    for name in _DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, qp in REGISTRY.items():
        if name not in ordered:
            ordered[name] = qp
    return ordered
