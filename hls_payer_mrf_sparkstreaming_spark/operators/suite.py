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


# ---------------------------------------------------------------------------
# Bounded registry for intra-query scratch persists.
#
# Many operators persist() a mid-pipeline relation that a self-join or a
# multi-aggregate fan-out references more than once (shingle sets, scored
# candidates, distinct gram streams). The persist is load-bearing for cost
# (without it each reference re-runs the dominant stage) but nothing in a
# lazily-returned DataFrame's lifecycle tells the operator when the caller
# has finished materializing it — so an unpersist inside the operator would
# fire before the action, and NO unpersist leaks one cached relation per
# call into a long-lived host session (advice r8: lsh_edge_recall,
# ndcg_eval, and a dozen siblings). scratch_persist() bounds the leak: a
# session-wide FIFO holds the last _SCRATCH_MAX scratch relations and
# unpersists the oldest on overflow. Eviction is always correctness-safe —
# persist() keeps lineage, so a consumer that still holds an evicted frame
# just recomputes. Deliberate session caches (_EDGE_CACHE, _PQ_CACHE,
# _MANIFEST_CACHE) do NOT route through this: they are keyed, repersisted
# on clear, and own their eviction policy.
_SCRATCH: list[DataFrame] = []
_SCRATCH_MAX = 32


def scratch_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _SCRATCH.append(df)
    while len(_SCRATCH) > _SCRATCH_MAX:
        old = _SCRATCH.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # owning session already stopped — nothing to release
    return df


def clear_scratch() -> None:
    """Unpersist every tracked scratch relation (test/REPL hook)."""
    while _SCRATCH:
        old = _SCRATCH.pop()
        try:
            old.unpersist()
        except Exception:
            pass


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
    # round-9 window (VERDICT r8 task 1: drain the staleness tail).
    # The 4 operators whose last driver row is round 4 lead; the rest of
    # the window is 46 of the 49 operators last driver-verified in round
    # 5 (the window holds exactly 50, so the 3 most trivial r5 entries —
    # limit_topk, set_ops, cube_counts — wait for the r10 rotation).
    # Newly added operators MUST be inserted inside the first 50
    # (test_driver_priority_names_exist_and_new_ops_in_window enforces
    # it); displace from the TAIL of the r5 cohort when adding.
    # last driver row: round 4
    "event_funnel",
    "filter_eq",
    "project_substr",
    "class_weights",
    # last driver row: round 5
    "explode_tokens",
    "array_index",
    "nested_extract",
    "cross_join",
    "surrogate_keys",
    "param_filter",
    "pricing_summary",
    "star_join_revenue",
    "window_topk_per_group",
    "rollup_counts",
    "skew_salted_join",
    "semi_anti_join",
    "join_size_estimate",
    "cluster_quality_summary",
    "ngram_novelty_score",
    "seasonal_profile",
    "knn_classify",
    "pca_power_iteration",
    "minhash_error_eval",
    "sample_weighted_by_score",
    "key_skew_report",
    "churn_labels",
    "sliding_window_counts",
    "pareto_share_curve",
    "sessionize_native",
    "interval_union_length",
    "event_transition_matrix",
    "mode_per_group",
    "skyline_pareto",
    "snapshot_diff",
    "compaction_bins",
    "calibration_bins",
    "top_unshipped_orders",
    "token_cooccurrence_lift",
    "auc_score",
    "bloom_prefilter",
    "semantic_dedup",
    "pq_encode",
    "intra_corpus_dup_ngrams",
    "retention_cohorts",
    "ewma_user_value",
    "domain_cap",
    "quality_deciles",
    "lag_features",
    # r9 additions (new ops MUST sit inside the first 50): LSH banding
    # health + cluster-size histogram, displacing the two tail r5 entries
    "lsh_bucket_skew",
    "dedup_cluster_sizes",
    # ---- the 50-entry driver window ends here ----
    # r5-stale leftovers (head of the r10 rotation)
    "grouping_sets_revenue",
    "dup_rate_by_source",
    "limit_topk",
    "set_ops",
    "cube_counts",
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
