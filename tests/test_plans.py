"""Physical-plan regression tests: the scale properties that make these
queries viable at 100 TB are plan shapes, not results — filters reaching
the parquet scan, small dimensions broadcast instead of shuffled, top-k as
TakeOrderedAndProject instead of a global sort, a pre-partitioning reused
by the downstream aggregate. Results stay identical if any of these
regress; only these assertions catch it.
"""

import os
import re

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()


def plan(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def runtime_generates(p: str) -> int:
    """Count Generate nodes in a formatted plan's RUNTIME lineage.

    Spark's formatted explain prints each cached relation's *build* plan
    nested under its InMemoryTableScan / InMemoryRelation node. Those
    Generates execute at most once, when the cache materializes — not per
    query — so plan guards that pin "the parse runs once" must exclude
    them. A raw ``(\\d+) Generate`` count over the details section counts
    every cache-build explode on top of the runtime ones and goes red the
    moment a lineage is routed through ``.cache()`` (the exact trap that
    broke this guard in round 7 when the per-payer silver tables were
    session-cached).

    Walks the tree section only (details repeat each node once more),
    skipping any subtree rooted at an InMemoryRelation /
    InMemoryTableScan. Two counting traps, both pinned by
    test_runtime_generates_counter: the plan root carries no branch
    marker (a Generate at the very top of the tree must still count),
    and the cache-skip must anchor to the NODE NAME — a node whose
    arguments merely mention "InMemoryRelation" must not swallow its
    siblings.
    """
    count = 0
    skip_indent = None
    for line in p.splitlines():
        if re.match(r"^\(\d+\) ", line):
            break  # details section — tree is fully consumed
        m = re.search(r"(?:\+|:)- ", line)
        if m:
            indent = m.start()
            node = line[m.end() :]
        elif re.match(r"^[*\w]", line) and re.search(r"\(\d+\)\s*$", line):
            indent = 0  # root node: first tree line, no branch marker
            node = line
            skip_indent = None
        else:
            continue
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if re.match(r"\*?\s*(InMemoryRelation|InMemoryTableScan)\b", node):
            skip_indent = indent
            continue
        if re.match(r"\*?\s*Generate \(\d+\)", node):
            count += 1
    return count


def test_runtime_generates_counter():
    """Unit-pin the plan-walk itself (advice r8): a root-level Generate
    counts, a cached subtree is skipped, and an InMemoryRelation mention
    inside another node's ARGUMENTS does not start a skip."""
    p = "\n".join(
        [
            "Generate (9)",
            "+- Project (8) [plan id: InMemoryRelation mention in args]",
            "   +- Generate (7)",
            "      +- InMemoryTableScan (6)",
            "            +- InMemoryRelation (5)",
            "                  +- Generate (4)",
            "(9) Generate",
        ]
    )
    assert runtime_generates(p) == 2


def test_filter_pushdown_reaches_scan(spark):
    p = plan(spark, "filter_eq")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in p


def test_column_pruning_reaches_scan(spark):
    # project_substr touches 3 of lineitem's 16 columns; the scan schema
    # must not read the rest
    p = plan(spark, "project_substr")
    scan = p[p.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" not in scan
    assert "l_quantity" not in scan


def test_star_join_broadcasts_dimensions(spark):
    # every dim join in the star should be broadcast-hash; a SortMergeJoin
    # here means a full fact-table shuffle per dimension at scale
    p = plan(spark, "star_join_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_is_take_ordered_not_global_sort(spark):
    p = plan(spark, "limit_topk")
    assert "TakeOrderedAndProject" in p


def test_repartition_reused_by_aggregate(spark):
    # the explicit repartition on the grouping keys must be the ONLY
    # exchange: Catalyst reuses the partitioning for the groupBy
    import re

    p = plan(spark, "repartition_roundtrip")
    # formatted mode prints each node twice (tree + detail); count the
    # detail headers, which are unique per physical node
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_stratified_sample_is_shuffle_free(spark):
    # a scan-time hash gate: any exchange means the sample is no longer a
    # single-pass filter
    p = plan(spark, "sample_stratified")
    assert "Exchange" not in p


def test_knn_join_broadcasts_query_side(spark):
    # the corpus must never shuffle for scoring: the (tiny) query set is
    # broadcast and the only exchange moves skinny scored rows to the
    # per-query top-k window
    p = plan(spark, "knn_join")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_exact_dedup_shuffles_digest_not_text(spark):
    # the exchange feeding the fingerprint aggregate must carry the 32-char
    # md5 and doc_id, not the document text
    p = plan(spark, "dedup_exact")
    ex = [
        block
        for block in p.split("\n\n")
        if block.startswith("(") and "Exchange" in block.splitlines()[0]
    ]
    assert ex, p
    assert all("text" not in b for b in ex), ex


def test_hot_paths_are_whole_stage_codegen(spark):
    # text scoring is pure built-in expressions; if a Python eval node
    # appears the operator fell off the JVM fast path
    for name in ("text_quality", "text_lang_id", "pii_scrub"):
        p = plan(spark, name)
        # formatted mode marks codegen'd nodes with "[codegen id : N]"
        assert "codegen id" in p, name
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


@pytest.mark.parametrize(
    "name", ["pricing_summary", "distinct_agg", "windowed_agg_events"]
)
def test_aggregates_have_partial_phase(spark, name):
    # map-side combine: two HashAggregate phases around one exchange —
    # without the partial phase every raw row crosses the shuffle
    p = plan(spark, name)
    assert p.count("HashAggregate") >= 2, name


def test_chunk_and_quantize_are_shuffle_free(spark):
    # per-row window expansion and per-vector quantization are pure
    # projections; any exchange means they stopped being scan-bound
    for name in ("text_chunk_sliding", "embedding_quantize"):
        assert "Exchange" not in plan(spark, name), name


def test_pack_sequences_single_shard_exchange(spark):
    # one hash partitioning on the shard key feeds the prefix-sum window;
    # a second exchange (or a global non-partitioned sort) would serialize
    # the corpus through one task at scale
    import re

    p = plan(spark, "pack_sequences")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "hashpartitioning(lang" in p, p


def test_corr_stats_partial_aggregation(spark):
    # six integer moments combine map-side; only the per-event_type moment
    # rows cross the exchange
    p = plan(spark, "corr_stats")
    assert p.count("HashAggregate") >= 2, p


def test_bm25_broadcasts_corpus_stats_and_takes_ordered(spark):
    # corpus stats reduce to one broadcast row; top-k must be
    # TakeOrderedAndProject, not a global Sort
    p = plan(spark, "bm25_search")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_scd2_single_user_exchange(spark):
    # one hash partitioning on user_id feeds both window functions
    import re

    p = plan(spark, "scd2_intervals")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_fuzzy_match_joins_on_block_key(spark):
    # the levenshtein filter must ride an equi-join on the blocking key,
    # never a cartesian product
    p = plan(spark, "fuzzy_match_names")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_drift_ks_aggregates_before_cdf_window(spark):
    # raw rows reduce to bounded bucket counts (partial agg) before any
    # window; the single-partition cumsum sees only bucket rows
    p = plan(spark, "drift_ks")
    assert p.count("HashAggregate") >= 2, p
    assert "Window" in p, p


def test_operator_catalog_is_current():
    # OPERATORS.md is generated from the registry; fail if it drifts
    import os

    from hls_payer_mrf_sparkstreaming_spark.docs import render_operator_table

    path = os.path.join(os.path.dirname(__file__), "..", "OPERATORS.md")
    with open(path) as f:
        assert f.read() == render_operator_table(), (
            "OPERATORS.md is stale — regenerate with "
            "`python -m hls_payer_mrf_sparkstreaming_spark.docs`"
        )


def test_readme_operator_index_is_current():
    # the README family-grouped index is generated from the registry plus
    # the COMMITTED bench_medians.json snapshot (NOT the live
    # bench_details.json, which the driver harness rewrites every round —
    # comparing against live medians would turn this red the moment a
    # median moved); fail if an operator lands without a regen
    import os

    from hls_payer_mrf_sparkstreaming_spark.docs import (
        _INDEX_BEGIN,
        _INDEX_END,
        render_readme_index,
    )

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "README.md")) as f:
        readme = f.read()
    got = readme.split(_INDEX_BEGIN, 1)[1].split(_INDEX_END, 1)[0]
    want = render_readme_index(
        bench_path=os.path.join(root, "bench_medians.json")
    )
    want = want.split(_INDEX_BEGIN, 1)[1].split(_INDEX_END, 1)[0]
    assert got == want, (
        "README operator index is stale — regenerate with "
        "`python -m hls_payer_mrf_sparkstreaming_spark.docs`"
    )


def test_rank_fusion_topk_not_global_sort(spark):
    # both rankers must reduce via TakeOrderedAndProject; a global Sort
    # before the fusion join means the corpus is sorted at scale
    p = plan(spark, "rank_fusion_rrf")
    assert p.count("TakeOrderedAndProject") >= 3  # 2 rankers + final top-20


def test_tokenize_vocab_is_broadcast(spark):
    # the vocabulary dim must broadcast; a SortMergeJoin on tok would
    # shuffle the whole exploded token stream by token string
    p = plan(spark, "tokenize_pad_ids")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_unigram_vocab_is_broadcast(spark):
    p = plan(spark, "unigram_logprob_score")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_quality_funnel_single_scan(spark):
    # all cumulative gate counts must come from ONE aggregate over one
    # scan of documents — a second scan means the funnel re-reads the
    # corpus per gate
    # formatted mode prints each node twice (tree + detail), so one
    # physical scan appears exactly twice
    p = plan(spark, "quality_funnel")
    assert p.count("Scan parquet") == 2


def test_drift_centroids_global_row_broadcast(spark):
    # the per-dimension global centroid is a 64-row dim: it must
    # broadcast back onto the per-label partials, never shuffle them
    p = plan(spark, "embedding_drift_centroids")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_anomaly_mad_one_lineage_no_joins(spark):
    # med, MAD and the outlier rollup all ride ONE group-partitioned
    # window chain over the (group, cents) histogram: no join of any
    # kind (the whole-partition min(when(...)) windows replace the old
    # broadcast-median-back joins), one fact scan, and exactly two
    # exchanges — the histogram aggregate plus the group partitioning
    # shared by every window and the final rollup
    import re

    p = plan(spark, "anomaly_mad")
    assert "Join" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_class_weights_scans_corpus_once(spark):
    # total/k come from a window over the K aggregated rows; a second
    # aggregate branch would show up as a second parquet scan. formatted
    # mode prints each node twice (tree + detail); count detail headers
    import re

    p = plan(spark, "class_weights")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p


def test_containment_joins_on_block_key(spark):
    # the self-join must be an equi-join keyed on the block hash — a
    # BroadcastNestedLoopJoin or cartesian here means all-pairs scoring
    p = plan(spark, "dedup_containment")
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or (
        "BroadcastHashJoin" in p
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _fn_plan(spark, fn, mode: str = "formatted") -> str:
    df = fn(spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_sketch_only_distinct_never_computes_exact(spark):
    # the production-shaped sketch operator must carry HLL buffers through
    # one partial-agg exchange and never expand to exact distinct pairs
    import re

    from hls_payer_mrf_sparkstreaming_spark.operators.relational import (
        approx_distinct_users_sketch,
    )

    p = _fn_plan(spark, approx_distinct_users_sketch)
    assert "approx_count_distinct" in p, p
    assert "Expand" not in p, p  # exact-distinct rewrite inserts Expand
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert p.count("HashAggregate") >= 2, p  # map-side partial sketches


def test_sketch_only_percentile_has_no_exact_twin(spark):
    import re

    from hls_payer_mrf_sparkstreaming_spark.operators.relational import (
        approx_percentile_sketch,
    )

    p = _fn_plan(spark, approx_percentile_sketch)
    assert "approx_percentile" in p or "percentile_approx" in p, p
    assert "percentile_disc" not in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_no_driver_collect_in_package():
    # .collect() pulls data (or manifests) through the driver — the one
    # historical use (distributed-discovery manifest assembly) was replaced
    # by an executor-side df.write.json in round 6. Keep the package at
    # zero so a driver ceiling can't silently reappear. (Tests and bench
    # collect freely — they ARE the driver.)
    import glob as _glob

    pkg = os.path.join(
        os.path.dirname(__file__), "..", "hls_payer_mrf_sparkstreaming_spark"
    )
    hits = []
    for fp in _glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        with open(fp) as f:
            for i, line in enumerate(f, 1):
                if ".collect()" in line:
                    hits.append(f"{fp}:{i}")
    assert not hits, f".collect() in package source: {hits}"


def test_no_unmanaged_persist_in_package():
    # Every .persist() in the package must be one of: the scratch FIFO
    # itself (suite.py), a keyed session cache with an eviction policy
    # (edge/CC/PQ caches, _repersist_if_cleared), or a call PAIRED with
    # an unpersist in the same lifecycle (foreachBatch bodies, the
    # corpus-gate termination listener). A bare persist leaks one cached
    # relation per call into a long-lived host session (advice r8/r10) —
    # operators that need a scratch cache route through scratch_persist.
    import glob as _glob

    allowed = {
        # file basename -> set of line-content markers that justify a
        # direct persist there (checked by substring of the source line
        # or the file's audited pairing, listed explicitly)
        "suite.py": "the FIFO implementation itself",
        "dedup.py": "keyed caches (_EDGE_CACHE/_CC_CACHE) + paired "
        "build intermediates, audited below",
        "similarity.py": "_PQ_CACHE keyed cache",
        "corpus_dedup.py": "per-micro-batch persists paired with "
        "unpersist in the same foreachBatch body",
        "corpus_gate.py": "paired with unpersist on stream termination",
        "silver_stream.py": "per-micro-batch, paired",
        "mrf_queries.py": "keyed silver-table session cache",
    }
    pkg = os.path.join(
        os.path.dirname(__file__), "..", "hls_payer_mrf_sparkstreaming_spark"
    )
    hits = []
    for fp in _glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        base = os.path.basename(fp)
        with open(fp) as f:
            for i, line in enumerate(f, 1):
                if ".persist()" not in line or "scratch_persist" in line:
                    continue
                if base not in allowed:
                    hits.append(f"{fp}:{i}")
    assert not hits, f"unmanaged .persist() outside audited files: {hits}"
    # the audited files must keep their persist counts pinned — a NEW
    # bare persist added to an allowed file still fails until audited
    counts = {}
    for fp in _glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        base = os.path.basename(fp)
        if base not in allowed:
            continue
        n = 0
        with open(fp) as f:
            for line in f:
                if ".persist()" in line and "scratch_persist" not in line:
                    n += 1
        if n:
            counts[base] = n
    assert counts == {
        "suite.py": 2,  # scratch_persist's own body +
        # repersist_if_cleared (moved here from dedup.py, advice r12)
        "dedup.py": 6,  # 3 paired build intermediates + edge-cache and
        # CC-cache entries + paired CC sym
        "similarity.py": 1,  # _PQ_CACHE entry
        "corpus_dedup.py": 4,  # all paired in-foreachBatch
        "corpus_gate.py": 1,  # paired via termination listener
        "silver_stream.py": 1,  # paired in-batch
        "mrf_queries.py": 3,  # keyed silver session cache (in-network
        # pair) + keyed allowed-amounts session cache (r13)
    }, counts


def test_bench_median_snapshot_matches_details_and_registry():
    # VERDICT r10: the committed bench_medians.json had drifted from the
    # bench_details.json sidecar it is supposed to be derived from (one
    # op 8x off, one op missing) — anyone diffing committed medians
    # across rounds read phantom regressions. Pin the derivation: the
    # snapshot must cover exactly the registry, and — while the details
    # file it was copied from is still on disk (matching fingerprint) —
    # every value must be byte-equal to it. A DIFFERENT details file
    # (the driver's own rebench on a faster/slower host) only gets the
    # key-set check: cross-environment value comparison is exactly the
    # phantom-regression trap this test exists to kill.
    import hashlib
    import json

    from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
        all_queries,
    )

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "bench_medians.json")) as f:
        snap = json.load(f)
    medians = snap["queries_sec_median"]

    assert set(medians) == set(all_queries()), (
        "committed median catalog != registry: "
        f"missing={sorted(set(all_queries()) - set(medians))[:5]} "
        f"extra={sorted(set(medians) - set(all_queries()))[:5]}"
    )
    assert snap.get("source_details_sha256"), (
        "snapshot lacks its source fingerprint — regenerate via "
        "python -m hls_payer_mrf_sparkstreaming_spark.docs"
    )

    details_path = os.path.join(root, "bench_details.json")
    if not os.path.exists(details_path):
        return  # fresh checkout: details is a gitignored sidecar
    with open(details_path, "rb") as f:
        raw = f.read()
    details = json.loads(raw)
    det_med = details["queries_sec_median"]
    if hashlib.sha256(raw).hexdigest() == snap["source_details_sha256"]:
        assert medians == det_med, "snapshot drifted from its source pass"
    else:
        # a different (e.g. driver-side) pass: catalogs must still agree
        assert set(det_med) == set(medians), (
            "details catalog != committed medians catalog: "
            f"only_details={sorted(set(det_med) - set(medians))[:5]} "
            f"only_medians={sorted(set(medians) - set(det_med))[:5]}"
        )


def test_readme_counts_are_current():
    # the README's operator/oracle/suite-size claims must track the live
    # registry (round 4 shipped with stale hand-edited numbers). Its own
    # test function — NOT the tail of the snapshot test above — so it
    # runs unconditionally on fresh checkouts where the gitignored
    # bench_details.json sidecar is absent (advice r11: the early return
    # there silently skipped these assertions).
    from hls_payer_mrf_sparkstreaming_spark.docs import registry_counts

    c = registry_counts()
    path = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(path) as f:
        readme = f.read()
    assert f"{c['headline']} queries" in readme, (
        f"README suite size drifted — bench.py has {c['headline']} "
        "headline queries"
    )
    assert f"{c['oracled']} of {c['operators']} `queries()` entries" in (
        readme
    ), (
        f"README correctness counts drifted — registry is "
        f"{c['oracled']}/{c['operators']}"
    )


def test_driver_window_self_rotation_invariants():
    # the driver verifies only the FIRST 50 entries of queries(); the
    # ordering is generated from the committed CORRECTNESS history
    # (oldest green driver row first), so pin the invariants the rotation
    # must provide: (1) every never-driver-verified operator — i.e. every
    # NEW operator — sits inside the window; (2) the window is exactly
    # the stalest cohort: no entry outside the window has an older latest
    # green row than any entry inside it; (3) ordering is deterministic
    # across calls.
    from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
        _latest_green_rounds,
        all_queries,
    )

    ordered = list(all_queries())
    hist = _latest_green_rounds()
    window = ordered[:50]
    rest = ordered[50:]

    unverified = [n for n in ordered if n not in hist]
    outside = [n for n in unverified if n not in window]
    assert not outside, (
        f"never-driver-verified operators outside the 50-entry window: "
        f"{outside}"
    )
    if rest:
        assert max(hist.get(n, -1) for n in window) <= min(
            hist.get(n, -1) for n in rest
        ), "driver window is not the stalest-verification cohort"
    assert ordered == list(all_queries()), "window ordering not stable"


def test_event_funnel_shuffles_only_stage_subsets(spark):
    # the stage-type restriction must reach the ONE scan as a pushed
    # In-filter (r13: three per-stage scans + user_id joins became one
    # user-partitioned window pass), and no join may remain
    import re

    p = plan(spark, "event_funnel")
    assert re.search(r"In\(event_type, \[[^\]]*view", p), p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p, p


def test_pq_encode_is_broadcast_only(spark):
    # PQ encoding is a per-row fold over one broadcast codebook row: the
    # corpus must not shuffle and no window/sort may appear
    p = plan(spark, "pq_encode")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    for node in ("SortMergeJoin", "Window"):
        assert node not in p, node


def test_semantic_dedup_is_window_not_self_join(spark):
    # the pairwise prune is a sorted-neighborhood WINDOW per (cid,
    # bucket) — O(N*W) — never a block self-join (cost tracks block
    # height^2: the r10 scale audit measured the join shape at 12.3x
    # wall on 10x data) and never a CartesianProduct; the only
    # nested-loop join allowed is the 1-row centroid broadcast
    import re

    p = plan(spark, "semantic_dedup")
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p


def test_retention_cohorts_shuffles_ids_only(spark):
    # every exchange carries (user_id, week)-shaped longs, never event
    # payload columns
    p = plan(spark, "retention_cohorts")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert ex, p
    assert all(
        "props" not in b and "event_type" not in b for b in ex
    ), ex


def test_ewma_single_user_exchange(spark):
    # the row_number window and the groupBy share one hash partitioning
    # on user_id: exactly one exchange in the whole plan
    import re

    p = plan(spark, "ewma_user_value")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_intra_corpus_dup_shuffles_digests_not_text(spark):
    # all exchanges carry md5 digests / doc ids / counts — document text
    # must never cross the wire after the shingle projection
    p = plan(spark, "intra_corpus_dup_ngrams")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        # rebalance()'s round-robin small-input spread (no-op at scale)
        # legitimately still carries text — see the neardup guard
        and "RoundRobinPartitioning" not in b
    ]
    assert ex, p
    assert all("text#" not in b for b in ex), ex


def test_auc_partial_aggregation(spark):
    # per-score counts must combine map-side before the bounded-domain
    # cumulative window
    p = plan(spark, "auc_score")
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


def test_pagerank_no_cartesian(spark):
    # every per-round rank/edge join is an equi-join on src; a cartesian
    # or nested-loop node means the iteration went all-pairs
    p = plan(spark, "graph_pagerank")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_bloom_bitmap_is_broadcast(spark):
    # the bitmap must reach probes via broadcast (map-side screen); the
    # only allowed nested-loop join is that single-row bitmap attach
    p = plan(spark, "bloom_prefilter")
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_q3_broadcasts_dim_and_takes_ordered(spark):
    # customer (one segment) must broadcast; the top-10 must be
    # TakeOrderedAndProject, not a global sort of the aggregate
    p = plan(spark, "top_unshipped_orders")
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_cooccurrence_shuffles_tokens_not_text(spark):
    # after the shingle projection only (doc_id, tok) rows and pair
    # counts may cross the wire
    p = plan(spark, "token_cooccurrence_lift")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert ex, p
    assert all("text#" not in b for b in ex), ex
    assert "CartesianProduct" not in p


def test_skyline_no_dominance_self_join(spark):
    # the frontier must come from the bounded-domain window, never a
    # pairwise dominance join
    p = plan(spark, "skyline_pareto")
    for node in ("CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"):
        assert node not in p, node
    assert p.count("HashAggregate") >= 2, p


def test_snapshot_diff_single_join_no_second_scan(spark):
    # one full-outer join, classification in projection: exactly two
    # scan-side exchanges plus the single-row final aggregate
    p = plan(spark, "snapshot_diff")
    assert "FullOuter" in p or "full_outer" in p.lower(), p
    assert "CartesianProduct" not in p


def test_compaction_window_partitioning_reused(spark):
    # the running-sum window and the (source, bin) groupBy must share one
    # hash partitioning: a single Exchange in the plan
    import re

    p = plan(spark, "compaction_bins")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_interval_union_single_user_exchange(spark):
    # both windows, the island merge and the final per-user aggregate must
    # reuse ONE hash partitioning on user_id
    import re

    p = plan(spark, "interval_union_length")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_transition_matrix_aggregates_before_prob_window(spark):
    # the event-scale work is the lag window + partial-agg groupBy; the
    # ppm window must run over the K x K transition relation only
    p = plan(spark, "event_transition_matrix")
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


def test_mode_no_raw_row_window(spark):
    # raw orders rows must be aggregated before any window touches them
    p = plan(spark, "mode_per_group")
    assert p.count("HashAggregate") >= 2, p


def test_session_window_is_single_shuffle_no_lag_chain(spark):
    # the native session aggregation must not fall back to a lag/cumsum
    # window chain; one user_id exchange only
    import re

    p = plan(spark, "sessionize_native")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "Window" not in p, p


def test_sliding_window_partial_agg(spark):
    # the window generator must stay map-side with a two-phase aggregate
    p = plan(spark, "sliding_window_counts")
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


def test_pareto_aggregates_before_ranking_windows(spark):
    # the ranking windows must run over per-key totals, never raw orders
    # rows: an aggregate appears below the first Window node
    p = plan(spark, "pareto_share_curve")
    assert p.count("HashAggregate") >= 2, p
    first_window = p.find("Window")
    assert first_window > 0 and "HashAggregate" in p[first_window:], p


def test_weighted_sample_is_shuffle_free(spark):
    # the score-proportional gate is a scan-time filter: no exchange
    p = plan(spark, "sample_weighted_by_score")
    assert "Exchange" not in p, p


def test_skew_report_two_chained_partial_aggs(spark):
    p = plan(spark, "key_skew_report")
    assert p.count("HashAggregate") >= 4, p  # two aggs x partial/final


def test_churn_horizon_is_broadcast(spark):
    # the corpus horizon must attach as a broadcast scalar, not a shuffle
    p = plan(spark, "churn_labels")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "SortMergeJoin" not in p


def test_minhash_eval_exact_only_on_candidates(spark):
    # the shingle-set intersection must only run on LSH candidate pairs:
    # every join is an equi-join (band bucket or id rejoin), no cartesian
    p = plan(spark, "minhash_error_eval")
    assert "CartesianProduct" not in p, p


def _edge_build_plan(spark) -> str:
    """Formatted plan of the LSH edge BUILD pipeline. The registered
    query (neardup_pairs_lsh) returns the session-cached CHECKPOINTED
    edge list — a flat scan, deliberately free of the build's plan — so
    build-shape guards must explain the pipeline itself."""
    from hls_payer_mrf_sparkstreaming_spark.operators import dedup

    dedup.clear_edge_cache()
    edges, aux = dedup._compute_edges_lsh(spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = edges._jdf.queryExecution().explainString(jmode)
    for df in aux:  # persist marks registered lazily — drop them
        df.unpersist()
    return p


def test_neardup_edges_lsh_blocked_no_text_shuffle(spark):
    # the shared graph-family edge generator must derive candidates from
    # the LSH band self-join (equi-join, no cartesian), and no exchange
    # may carry raw text — the band join moves (id, band, band_hash)
    # only, shingle arrays rejoin by id for candidate ids
    p = _edge_build_plan(spark)
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # hash-partitioned exchanges are the join/agg shuffles; the one
    # round-robin exchange is rebalance()'s small-input spread (a no-op
    # at scale) and legitimately still carries text
    blocks = [
        b
        for b in re.split(r"\n\n", p)
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        and "RoundRobinPartitioning" not in b
    ]
    assert blocks, p
    assert all("text" not in b for b in blocks), blocks


def test_neardup_edges_never_broadcast_corpus(spark):
    # the corpus (shingle arrays / signatures) is the 100 TB side: the
    # band self-join and both exact-verify pair joins must be
    # ShuffledHashJoins with the density-bounded candidate side as the
    # build side. The ONE allowed broadcast is the candidate-id list
    # into the semi-join that prunes the shingle recompute — it must
    # carry doc_id only, never text/shingles/signatures
    p = _edge_build_plan(spark)
    assert p.count("ShuffledHashJoin") >= 3, p
    bcast = [
        b
        for b in re.split(r"\n\n", p)
        if b.startswith("(") and "BroadcastExchange" in b.splitlines()[0]
    ]
    for b in bcast:
        assert "text" not in b and "sh#" not in b and "sig" not in b, b


def test_consumer_plans_truncated_at_edge_checkpoint(spark):
    # graph-family consumers read the CHECKPOINTED edge list: their plans
    # must contain the flat checkpoint scan and none of the edge build
    # (no documents scan, no shingle Generate/transform pipeline) — the
    # build's giant expression tree otherwise costs seconds of pure
    # driver time per action in cache lookups and AQE re-planning
    from hls_payer_mrf_sparkstreaming_spark.operators import dedup

    dedup.clear_edge_cache()
    for name in ["graph_triangles", "dedup_graph_stats", "graph_pagerank"]:
        p = plan(spark, name)
        assert "ExistingRDD" in p, (name, p)
        # build markers: shingle hashing and exact-verify never appear in
        # a consumer plan (dedup_graph_stats legitimately scans documents
        # for its isolated-doc join, so the parquet scan itself is fine)
        for marker in ["array_intersect", "md5", "band_hash"]:
            assert marker not in p, (name, marker)


def test_overlap_sketch_shuffles_bucket_minima(spark):
    # the bounds twin (r10 shape): sketch estimate vs the PRE-COMMITTED
    # exact snapshot — ONE raw gram scan feeds the per-(source, bucket)
    # MIN (map-side partial agg), the snapshot arrives as a local
    # relation (ExistingRDD), and the whole exact-matrix pipeline
    # (distinct grams + shared-set Generate) must be GONE from the plan
    import re

    p = plan(spark, "corpus_overlap_sketch")
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the snapshot arrives as a parsed VALUES literal (LocalTableScan),
    # never a py4j-serialized RDD (r13: ExistingRDD -> local relation)
    assert "LocalTableScan" in p, p
    assert "ExistingRDD" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert runtime_generates(p) <= 1, p  # the gram explode, nothing else

    # the PRODUCTION sketch path must have NO distinct of the gram
    # stream: one partial-agg min (two HashAggregate phases) and exactly
    # one exchange — the sources x K bucket-min rows
    from hls_payer_mrf_sparkstreaming_spark.operators.text_analysis import (
        corpus_overlap_sketch_only,
    )

    df = corpus_overlap_sketch_only(spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    pp = df._jdf.queryExecution().explainString(jmode)
    # exactly one WIDE exchange (the sources x K bucket-min rows);
    # rebalance()'s round-robin small-input spread is exempt
    wide = [
        b
        for b in pp.split("\n\n")
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        and "RoundRobinPartitioning" not in b
    ]
    assert len(wide) == 1, pp
    assert pp.count("HashAggregate") >= 2, pp


def test_lsh_recall_truth_is_block_equijoin(spark):
    # the exact-truth side must pair docs via an equi-join on the
    # (lang, bucket) block key, and n_true/n_hit must come from ONE
    # aggregate over a single left outer join of id pairs against the
    # unique-pair edge list (r13: the separate semi-join pass and the
    # truth persist are gone) — no cartesian of data relations, no Python
    from hls_payer_mrf_sparkstreaming_spark.operators import dedup

    dedup.clear_edge_cache()
    p = plan(spark, "lsh_edge_recall")
    assert "CartesianProduct" not in p, p
    assert "LeftOuter" in p, p
    assert "LeftSemi" not in p, p
    assert "InMemoryTableScan" in p, p  # truth sides read the doc cache
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_triangles_orient_edges_by_degree(spark):
    # the wedge enumeration must join ORIENTED out-edges at a common
    # source (equi-join on src) and close against the canonical edge
    # list — no cartesian, and the closure test is an equi-join on both
    # wedge endpoints, never a filter over a cross product
    p = plan(spark, "graph_triangles")
    assert "CartesianProduct" not in p, p
    assert "CASE WHEN" in p or "casewhen" in p.lower(), p  # orientation


def test_pca_rounds_reduce_to_dim_rows(spark):
    # every round's Gram-vector product must partially aggregate the
    # posexploded (dim, partial) rows; no cartesian beyond the broadcast
    # 1-row v attach
    p = plan(spark, "pca_power_iteration")
    assert "CartesianProduct" not in p, p
    assert p.count("HashAggregate") >= 2, p
    # each round must be ONE subtree: a separate max-aggregate branch per
    # round doubles the corpus-wide posexplode every round (2^r blowup).
    # 4 runtime Generate nodes: 3 rounds + final unpack (cache-build
    # lineage excluded — same trap as the MRF guards).
    n_gen = runtime_generates(p)
    assert n_gen <= 4, f"posexplode subtree duplicated: {n_gen} runtime Generates\n{p}"


def test_knn_classify_broadcasts_seed_set(spark):
    # the labeled seed set must broadcast; the corpus never shuffles for
    # scoring — only the skinny scored rows move to the top-k window
    p = plan(spark, "knn_classify")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "SortMergeJoin" not in p, p


def test_cluster_quality_no_expansion_no_window(spark):
    # the two-slot argmin fold keeps best+runner-up inside codegen:
    # no per-(row, centroid) window and no sort-merge join
    p = plan(spark, "cluster_quality_summary")
    assert "Window" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p


def test_novelty_shuffles_digests_not_text(spark):
    p = plan(spark, "ngram_novelty_score")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        # rebalance()'s round-robin small-input spread (no-op at scale)
        # legitimately still carries text — see the neardup guard
        and "RoundRobinPartitioning" not in b
    ]
    assert ex, p
    assert all("text#" not in b for b in ex), ex


def test_seasonal_profile_partial_agg(spark):
    p = plan(spark, "seasonal_profile")
    assert p.count("HashAggregate") >= 2, p
    assert "Exchange" in p


def test_join_size_estimate_never_joins_payload(spark):
    # the estimate must be priced from key-count relations: every
    # exchange carries keys and counts, never order/event payload columns
    p = plan(spark, "join_size_estimate")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert ex, p
    assert all(
        "o_totalprice" not in b and "props" not in b for b in ex
    ), ex


def test_bigram_lm_joins_are_broadcast(spark):
    # the LM table and the scalar total must reach the bigram stream via
    # broadcast; a SortMergeJoin would re-shuffle every bigram occurrence
    p = plan(spark, "text_bigram_logprob")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_column_entropy_never_shuffles_raw_rows(spark):
    # one exploded (column, value) stream partial-aggregates to K
    # category rows before any exchange; per-column totals attach as a
    # window sum over that K-row relation (r13) — no join of any kind,
    # documents scanned once for both of its columns
    import re

    p = plan(spark, "column_entropy")
    assert "Join" not in p, p
    assert p.count("HashAggregate") >= 4, p  # partial+final, two tiers
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p


def test_quantile_normalize_is_one_exchange_no_join(spark):
    import re

    p = plan(spark, "quantile_normalize_scores")
    assert "Window" in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "Join" not in p, p


def test_vocab_coverage_windows_constant_rows(spark):
    # the running sum must run over the TakeOrdered top-K relation, never
    # the corpus: TakeOrderedAndProject feeds the Window, no merge join
    p = plan(spark, "vocab_coverage_curve")
    assert "TakeOrderedAndProject" in p, p
    assert "Window" in p, p
    assert "SortMergeJoin" not in p, p


def test_normalized_dedup_shuffles_digest_not_text(spark):
    # same discipline as dedup_exact: exchanges carry the md5 of the
    # normalized text, never the text column itself
    p = plan(spark, "dedup_normalized_exact")
    ex = [
        block
        for block in p.split("\n\n")
        if block.startswith("(") and "Exchange" in block.splitlines()[0]
    ]
    assert ex, p
    assert all("text" not in b for b in ex), ex


def test_mrf_rate_percentiles_single_agg(spark):
    # exact discrete percentiles with the fact consumed by ONE grouped
    # histogram aggregation — no join-back of the price stream (the
    # only join is the broadcast of the tiny bucket table; see
    # test_mrf_rate_percentiles_never_buffers_group_values for the r13
    # ObjectHashAggregate audit)
    p = plan(spark, "mrf_rate_percentiles")
    assert "SortMergeJoin" not in p, p


def test_pq_adc_corpus_never_shuffles(spark):
    # codebook + query set reach the corpus as broadcast single rows and
    # encode + LUT scoring run in codegen, so the exchange feeding the
    # per-query top-k window must carry only skinny (q_id, vec_id, dist)
    # rows — never the fixed-point vectors, the codebook map, or the PQ
    # codes; Spark 4's WindowGroupLimit also pre-prunes to k per
    # partition before that shuffle
    p = plan(spark, "pq_adc_topk")
    assert "SortMergeJoin" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p
    assert "WindowGroupLimit" in p, p
    win_ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        and "hashpartitioning(q_id" in b
    ]
    assert win_ex, p
    for b in win_ex:
        assert "qx" not in b and "cbmap" not in b and "cids" not in b, b


def test_interpolate_missing_is_joinless(spark):
    # grid + observations merge into ONE per-user ordered stream with
    # carry window frames — a grid-to-series join would shuffle the fact
    # stream once per bracket side at scale
    p = plan(spark, "interpolate_missing")
    assert "Join" not in p, p
    assert "Window" in p, p


def test_token_entropy_shuffles_no_text(spark):
    p = plan(spark, "token_entropy_per_doc")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert ex, p
    assert all("text" not in b for b in ex), ex


def test_pq_recall_is_one_pass_two_windows(spark):
    # r13: ONE corpus pass computes both the exact and the ADC distance;
    # the two per-query rankings are windows sharing a single q_id
    # exchange and the recall "join" is rn_exact<=k AND rn_adc<=k on the
    # same row — no join of ranked sets, no second corpus expansion, and
    # the final groupBy(q_id) reuses the window partitioning
    p = plan(spark, "pq_recall_eval")
    assert "SortMergeJoin" not in p, p
    assert "BroadcastHashJoin" not in p, p
    assert "ShuffledHashJoin" not in p and "CartesianProduct" not in p, p
    # the only join is the broadcast of the one-row codebook+query set
    assert "BroadcastNestedLoopJoin" in p, p
    assert p.count("+- Window (") == 2, p
    win_ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        and "hashpartitioning(q_id" in b
    ]
    assert len(win_ex) == 1, p


def test_target_encoding_broadcasts_stats_never_shuffles_fact(spark):
    # K-row category stats broadcast back; a SortMergeJoin would shuffle
    # every event row by category at scale
    p = plan(spark, "target_encoding_loo")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_copurchase_topk_is_take_ordered(spark):
    # pair counting partial-aggregates and the top-k must be
    # TakeOrderedAndProject, not a global sort of all pairs
    p = plan(spark, "copurchase_pairs")
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p


def test_incremental_merge_has_two_agg_tiers(spark):
    # daily partials then monthly merge: at least two grouped
    # aggregations, each with its partial phase
    p = plan(spark, "incremental_agg_merge")
    assert p.count("HashAggregate") >= 4, p


def test_session_paths_share_user_partitioning_and_take_ordered(spark):
    # session derivation + numbering windows both partition by user; the
    # final top-k must be TakeOrderedAndProject, not a global sort
    p = plan(spark, "session_path_topk")
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p, p


def test_cluster_survivor_window_over_skinny_rows(spark):
    # the retention window runs over (doc_id, cluster_id, n_chars) only —
    # document text must never reach an exchange
    p = plan(spark, "dedup_cluster_survivors")
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert ex, p
    assert all("text" not in b for b in ex), ex


def test_oov_rate_broadcasts_vocab(spark):
    # the top-K vocabulary must come back to the exploded token stream as
    # a broadcast: a SortMergeJoin here shuffles every token occurrence in
    # the corpus by token value
    p = plan(spark, "doc_oov_rate")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # and the vocabulary itself is a top-k, not a global sort
    assert "TakeOrderedAndProject" in p, p


def test_line_dedup_rewrite_no_cartesian(spark):
    # corpus rewrite = EXACTLY two linear shuffles (block-digest window,
    # then doc_id reassembly); any nested-loop/cartesian stage means the
    # dup test degenerated to all-pairs, a third exchange means the
    # rewrite re-shuffles the corpus
    import re

    p = plan(spark, "line_dedup_rewrite")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p


def test_prefix_pairs_is_equijoin_on_block_key(spark):
    # candidate generation must be an equi-join on the first-block digest;
    # a nested-loop join would compare every document pair
    p = plan(spark, "dedup_prefix_pairs")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    ), p


def test_filtered_ann_prefilters_at_scan(spark):
    # the metadata predicate must reach the parquet scan (pre-filtering):
    # post-filtering a larger top-k loses recall and scans every vector
    p = plan(spark, "ann_filtered_topk")
    assert "PushedFilters" in p and "In(label, [1,3]" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_quantile_merge_is_partial_rows_only(spark):
    # the merge tier must aggregate daily partials, not raw rows: two
    # HashAggregate pairs (daily tier + merge tier), no second scan
    # (formatted mode prints each node twice: tree + detail)
    p = plan(spark, "incremental_quantile_merge")
    assert p.count("Scan parquet") == 2, p
    assert p.count("HashAggregate") >= 4, p


def test_heavy_hitters_recount_is_broadcast_filtered(spark):
    # pass 2 must broadcast the tiny MG candidate set into the token
    # stream (BHJ = scan-speed filter) — a shuffle join here would move
    # the whole vocabulary, exactly what the sketch exists to avoid; the
    # only Python boundary is the candidate pass itself
    p = plan(spark, "heavy_hitters_twopass")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # formatted mode prints each node twice (tree + detail): one
    # MapInPandas node = the candidate pass, and only that
    assert 1 <= p.count("MapInPandas") <= 2, p


def test_span_pairs_join_carries_digests_not_text(spark):
    # the anchor self-join and the island window must move only
    # (digest, doc_id, pos) — document text stays at the scan
    p = plan(spark, "shared_ngram_span_pairs")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    ex = [
        b
        for b in p.split("\n\n")
        if b.startswith("(")
        and "Exchange" in b.splitlines()[0]
        # rebalance()'s round-robin small-input spread (no-op at scale)
        # legitimately still carries text — see the neardup guard
        and "RoundRobinPartitioning" not in b
    ]
    assert ex, p
    assert all("text" not in b for b in ex), ex


def test_activity_streaks_shares_user_partitioning(spark):
    import re

    # distinct (user, day) shuffles once; the window and BOTH groupBys
    # then run on user_id partitioning — one more exchange, no third
    p = plan(spark, "activity_streaks")
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "CartesianProduct" not in p, p


def test_twap_single_user_shuffle(spark):
    import re

    # lead() window and the final aggregate share one hash partitioning
    # on user_id: exactly one exchange in the whole plan
    p = plan(spark, "twap_user_value")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_benford_stays_tiny_after_first_agg(spark):
    import re

    # the digit groupBy partial-aggregates map-side to <= 9 rows; the
    # share window then runs over those 9 rows — one exchange for the
    # aggregate plus the single-partition window exchange, nothing wider
    p = plan(spark, "benford_digit_test")
    assert p.count("HashAggregate") >= 2, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_network_overlap_reduces_before_join(spark):
    # each payer's lineage must collapse to distinct (code, tin) BEFORE
    # the cross-payer join: the full-outer join's direct children carry
    # aggregates, not raw price explodes
    p = plan(spark, "mrf_network_overlap")
    assert "FullOuter" in p, p
    assert "CartesianProduct" not in p, p
    # each payer must parse its JSON ONCE at runtime: 2 runtime explodes
    # per payer over the cached silver base (cache-BUILD Generates under
    # InMemoryRelation run once at materialization and are excluded — see
    # runtime_generates). A codes-join-rates-join-par_providers
    # formulation re-executes the explode chain per join side and at
    # least doubles this count.
    n_gen = runtime_generates(p)
    assert n_gen <= 6, f"parse lineage duplicated: {n_gen} runtime Generates\n{p}"


def test_gold_shoppable_filters_before_explode(spark):
    # the one-code filter must precede the explodes (filter-first
    # derivation from codes); joining the prices/par_providers facts
    # would scan the whole fact and re-execute the parse per join side
    p = plan(spark, "mrf_gold_shoppable")
    assert "SortMergeJoin" not in p, p
    n_gen = runtime_generates(p)
    assert n_gen <= 4, f"fact-scan join shape returned: {n_gen} runtime Generates\n{p}"


def test_payer_compare_single_parse_per_payer(spark):
    # per payer, (billing_code, cents) must be one double-explode pass
    # over in_network (3 Generates each); codes-join-prices would
    # re-execute the corpus-sized parse on both join sides
    p = plan(spark, "mrf_payer_compare")
    n_gen = runtime_generates(p)
    assert n_gen <= 4, f"parse lineage duplicated: {n_gen} runtime Generates\n{p}"


def test_trend_slope_single_user_shuffle(spark):
    import re

    # the rebasing min() window, the sufficient-statistic aggregate and
    # the final projection all run on one user_id partitioning
    p = plan(spark, "trend_slope_per_user")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_rolling_median_single_shuffle_bounded_frame(spark):
    import re

    # one exchange on user_id; the frame spec must be the bounded
    # 9-row window, not an unbounded running aggregate
    p = plan(spark, "rolling_median_value")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    # formatted mode prints the frame as specifiedwindowframe(RowFrame,
    # -8, currentrow$())
    assert "RowFrame, -8" in p, p


def test_gini_single_segment_shuffle(spark):
    import re

    # rank window and three-sum aggregate share one segment shuffle
    p = plan(spark, "gini_by_segment")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_simhash_hamming_joins_on_band_key(spark):
    # pigeonhole band blocking: the self-join must ride an equi-join on
    # (band, band_value) — never a cartesian / nested-loop over docs —
    # and the joined rows carry fingerprints, not text
    p = plan(spark, "simhash_hamming_pairs")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_chi_square_is_joinless_window_chain(spark):
    # contingency cells reduce first (partial agg); marginals and the
    # grand total attach as window sums over the SAME K-cell relation
    # (r13, the mutual_information shape) — no join of any kind, raw
    # rows scanned once
    p = plan(spark, "chi_square_independence")
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("Window") >= 2, p
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p


def test_ab_test_single_user_shuffle(spark):
    import re

    # per-user conversion is the only data-sized exchange; the arm
    # totals collapse to one row without further shuffles
    p = plan(spark, "ab_test_ztest")
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_ols_two_feature_partial_aggregation(spark):
    # the nine moments must come from a map-side-combinable two-phase
    # aggregate; the determinant math is projection-only on top
    p = plan(spark, "ols_two_feature")
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_m4_downsample_single_aggregate(spark):
    import re

    # ONE groupBy produces all four extremes — no joins, no windows,
    # one exchange on the (series, bucket) keys
    p = plan(spark, "m4_downsample")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "Join" not in p and "Window" not in p, p


def test_kaplan_meier_windows_after_aggregation(spark):
    # the unpartitioned cumulative windows may only see the per-duration
    # aggregate (bounded rows), never raw events: every Window sits
    # above at least one completed HashAggregate pair
    p = plan(spark, "kaplan_meier_curve")
    assert "Window" in p, p
    assert p.count("HashAggregate") >= 4, p


def test_zipf_head_is_take_ordered(spark):
    # the frequency head must come from TakeOrderedAndProject, never a
    # global sort of the vocabulary
    p = plan(spark, "zipf_slope")
    assert "TakeOrderedAndProject" in p, p


def test_linear_count_sketch_two_phase_distinct(spark):
    # both distinct aggregates must run as expand + two-phase partial
    # aggregation; no raw-token shuffle beyond the (source, bucket/token)
    # distinct keys, and no Python evaluation anywhere
    p = plan(spark, "linear_count_distinct")
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_funnel_time_windows_after_per_user_reduction(spark):
    # the unpartitioned rank window may only see one row per converted
    # user (two per-user aggregations run first)
    p = plan(spark, "funnel_time_percentiles")
    assert "Window" in p, p
    assert p.count("HashAggregate") >= 4, p


def test_seasonal_anomaly_broadcasts_baseline_topk(spark):
    # the per-(series,hour) baseline joins back as a broadcast (the fact
    # table is never re-shuffled) and the top-k is TakeOrderedAndProject
    p = plan(spark, "seasonal_anomaly_residual")
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_winnowing_selection_is_array_expression(spark):
    # shingle hashing and window-min selection must run inside array
    # expressions in ONE projection — no Python eval, and the only
    # exchange is the final distinct on (doc_id, fp)
    import re

    p = plan(spark, "winnowing_fingerprints")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_cohens_kappa_single_scan_partial_agg(spark):
    # one corpus scan, two-phase aggregate to four longs, kappa math
    # projection-only (formatted mode prints nodes twice: count detail
    # headers, like test_class_weights_scans_corpus_once)
    import re

    p = plan(spark, "cohens_kappa")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert p.count("HashAggregate") >= 2, p


def test_cusum_topk_not_global_sort(spark):
    # the argmax day must come from TakeOrderedAndProject over the
    # day-level series, never a global sort
    p = plan(spark, "cusum_changepoint")
    assert "TakeOrderedAndProject" in p, p


def test_ndcg_rankings_are_take_ordered(spark):
    # both the system top-k and the ideal ordering must be
    # TakeOrderedAndProject over the scored relation — never a global
    # sort of the corpus
    p = plan(spark, "ndcg_eval")
    assert p.count("TakeOrderedAndProject") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_mann_whitney_aggregates_before_rank_window(spark):
    # raw rows reduce to one row per distinct cents value (partial agg)
    # BEFORE the cumulative-rank window — the window never sees raw events
    p = plan(spark, "mann_whitney_u")
    assert p.count("HashAggregate") >= 2, p
    assert "Window" in p, p


def test_welch_ttest_single_scan_partial_agg(spark):
    import re

    p = plan(spark, "welch_ttest")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert p.count("HashAggregate") >= 2, p


def test_asof_forward_single_key_shuffle(spark):
    import re

    # the union + following-frame window rewrite: one hash partitioning
    # on user_id, never an inequality join
    p = plan(spark, "asof_join_forward")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert len(re.findall(r"hashpartitioning\(user_id", p)) >= 1, p


def test_record_linkage_joins_on_block_key(spark):
    # candidates come from an equi-join on the id-tail block key; the
    # weight arithmetic is projection-only on top
    p = plan(spark, "record_linkage_scores")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_acf_single_series_window_partial_agg(spark):
    # one window pass partitioned by series, stack() pivot without a
    # second shuffle, then a map-side-combinable moment aggregate
    p = plan(spark, "acf_lags")
    assert "Window" in p, p
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_hhi_reduces_to_two_sums(spark):
    # per-customer rollup then two exact sums per segment. The customer
    # projection is joined WITHOUT a forced broadcast hint (customer is
    # SF-linear, not a fixed dim) — at test scale the planner still
    # picks broadcast because the 2-column projection is tiny, but the
    # choice must come from the threshold, not a hint that would bypass
    # it at 100 TB
    p = plan(spark, "hhi_concentration")
    assert "BroadcastHashJoin" in p, p
    assert p.count("HashAggregate") >= 4, p


def test_jackknife_single_data_pass(spark):
    import re

    # raw rows cross exactly one exchange (the 32-block partial agg);
    # every replicate mean is arithmetic on the 32-row block relation
    p = plan(spark, "jackknife_variance")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert p.count("HashAggregate") >= 2, p


def test_bootstrap_reduces_before_rank_window(spark):
    # the x32 fan-out reduces map-side to 32 (weight-sum, weighted-sum)
    # rows; the rank window sees only those
    p = plan(spark, "poisson_bootstrap_ci")
    assert p.count("HashAggregate") >= 2, p
    assert "Window" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_psi_bins_before_windows(spark):
    # raw rows reduce to 10 bin rows in a partial agg before the
    # unpartitioned total windows
    p = plan(spark, "psi_stability_index")
    assert p.count("HashAggregate") >= 2, p
    assert "Window" in p, p


def test_nearest_match_no_inequality_join(spark):
    # both directions are union + window rewrites; the closest-of-two
    # pick joins skinny per-treatment rows — never a cartesian /
    # nested-loop over the event table
    p = plan(spark, "nearest_score_match")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_conformal_broadcasts_fit_table(spark):
    # the per-series fit table joins back broadcast; calibration rows
    # rank inside a per-series window
    p = plan(spark, "conformal_interval")
    assert "BroadcastHashJoin" in p, p
    assert "Window" in p, p


def test_session_likelihood_broadcasts_transitions(spark):
    # the transition model (state-space-sized) re-joins broadcast onto
    # the step stream; no second full-data shuffle for scoring
    p = plan(spark, "session_path_likelihood")
    assert "BroadcastHashJoin" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_hill_order_stats_take_ordered(spark):
    # the top-(k+1) order statistics must come from
    # TakeOrderedAndProject, never a global sort of the fact table
    p = plan(spark, "hill_tail_index")
    assert "TakeOrderedAndProject" in p, p


def test_tile_stats_is_single_arrow_stage(spark):
    import re

    # the numpy kernel is ONE Arrow-batched python stage over the scan —
    # no shuffle before or after (per-tile rows emerge locally)
    p = plan(spark, "multimodal_tile_stats")
    assert "MapInPandas" in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p


def test_spearman_ranks_are_bucket_parallel(spark):
    # two-phase ranking (r10): each rank axis must partition its window
    # by (event_type, value-range bucket) — a window partitioned by
    # event_type alone puts the whole axis in ONE task, the 10x-data
    # limiter BENCH_SCALE r9 measured at 2.63x. Exactly three windows:
    # the two rank axes plus the tiny per-(group, axis) prefix-sum over
    # bucket counts; offsets join back broadcast, never a sort-merge.
    import re

    p = plan(spark, "spearman_corr")
    assert re.search(r"rank\(x#\d+L?\) windowspecdefinition\(event_type#\d+, _bx#", p), p
    assert re.search(r"rank\(y#\d+L?\) windowspecdefinition\(event_type#\d+, _by#", p), p
    assert len(re.findall(r"\(\d+\) Window", p)) == 3, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_mutual_information_is_joinless_window_chain(spark):
    # r13 rework: marginals and the total attach as window sums over the
    # K-cell joint relation — ONE lineage per pair, each fact table
    # scanned exactly once, and NO join of any kind (the old
    # broadcast-marginal forest launched ~26 jobs per pair). Windows per
    # pair: (xv), (yv), whole-relation = up to 3 nodes x 2 pairs.
    import re

    p = plan(spark, "mutual_information")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in p, (join, p)
    assert 1 <= len(re.findall(r"\(\d+\) Window", p)) <= 6, p


def test_precision_recall_rankings_are_take_ordered(spark):
    # the ranked list is TakeOrderedAndProject (never a global sort of
    # the corpus); the persisted scored relation keeps the corpus at one
    # scan per term-stats branch
    import re

    p = plan(spark, "precision_recall_at_k")
    assert p.count("TakeOrderedAndProject") >= 1, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_theil_sen_pairs_join_is_equi_on_user(spark):
    # the bounded pair join is an equi-join on user_id over the persisted
    # last-K rows (never a cartesian / nested-loop); events are scanned
    # once and the rank window runs once
    import re

    p = plan(spark, "theil_sen_slope")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 1, p
    assert "Window" in p, p


def test_audit_plans_truncated_at_checkpoint(spark):
    # the overlap FALLBACK twin (any dataset without a pre-committed
    # exact snapshot) and minhash_error_eval checkpoint their fan-out
    # scratch relations (distinct grams / narrow signatures): the
    # returned plan must read the checkpoint scan, and the severed
    # build must not reappear (no gram-explode Generate in the sketch
    # twin; no 32-perm array_min signature tree in the error eval —
    # its shingle branch legitimately recomputes shingle STRINGS)
    from hls_payer_mrf_sparkstreaming_spark.operators.text_analysis import (
        _sketch_vs_exact_twin,
    )

    df = _sketch_vs_exact_twin(spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = df._jdf.queryExecution().explainString(jmode)
    assert "ExistingRDD" in p, p
    # exactly TWO runtime Generates survive, both over the
    # distinct-fingerprint-sized source-set relation: _exact_overlap's
    # source-pair combo expansion (C(k,2) structs per shared gram) and
    # the r14 per-source-totals set explode. The corpus-sized gram
    # explode itself is behind the checkpoint — a third Generate means
    # it leaked back into the per-action plan
    assert runtime_generates(p) == 2, p
    p = plan(spark, "minhash_error_eval")
    assert "ExistingRDD" in p, p
    assert "array_min" not in p, p


def test_bpe_pairs_explode_after_word_aggregate(spark):
    # BPE merge candidates must collapse the corpus to the distinct-word
    # frequency table BEFORE exploding character pairs: the Generate's
    # input has to be an aggregate, never the raw scan — otherwise pair
    # work scales with corpus duplication instead of vocabulary size.
    # Shape: token explode -> word-freq aggregate -> pair Generate whose
    # DIRECT child is that aggregate -> pair aggregate -> top-k as
    # TakeOrderedAndProject (never a global Sort), two exchanges total
    # (word shuffle + pair shuffle).
    p = plan(spark, "bpe_merge_candidates")
    tree = p.split("\n\n", 1)[0]
    assert re.search(r"Generate \(\d+\)\n\s*\+- HashAggregate", tree), tree
    assert "TakeOrderedAndProject" in tree, tree
    assert len(re.findall(r"Exchange \(\d+\)", tree)) == 2, tree


def test_dsir_vocab_is_broadcast_topk_not_sort(spark):
    # the 256-row log-ratio vocabulary joins the corpus broadcast (never
    # a SortMergeJoin that would shuffle document tokens), and the quota
    # selection is a TakeOrderedAndProject, not a global Sort
    p = plan(spark, "dsir_importance_sample")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_ts_paa_candidates_are_bucket_join_topk(spark):
    # candidate pairs must come from an equi-join on the shape code —
    # never a cartesian/broadcast-nested-loop all-pairs — and the final
    # ranking must be a TakeOrderedAndProject, not a global Sort
    p = plan(spark, "ts_paa_similarity_topk")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_containment_skew_audit_has_no_join(spark):
    """The audit must be safe to run when the blocking is NOT: one
    shingle pass, a partial-aggregated per-block count, a one-row
    aggregate — never a join of any kind."""
    p = plan(spark, "containment_block_skew")
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p


def test_containment_cap_is_mapside_broadcast(spark):
    """r14 (ADVICE r13): the hot-block cap must be a KEY-ONLY
    partial-aggregated count plus a broadcast LEFT join, so the thinning
    filter runs map-side BEFORE any full-row block exchange — a window
    count over blk would shuffle every uncapped hot-block row (heavy
    shingle arrays included) into one task before dropping it. The only
    hashpartitioning(blk) exchanges allowed are the key-only count's
    (once per join side pre-AQE; reused at runtime) — the full-row
    self-join side must never re-shuffle heavy rows by blk here (at this
    scale it broadcasts; at scale AQE plans the SMJ on thinned rows)."""
    p = plan(spark, "dedup_containment")
    assert "+- Window (" not in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "BroadcastHashJoin LeftOuter" in p, p
    # every blk exchange is the key-only count aggregate: its input is a
    # HashAggregate over (blk) alone, never a relation carrying sh arrays
    import re

    for m in re.finditer(r"\((\d+)\) Exchange", p):
        blocks = [b for b in p.split("\n\n") if b.startswith(f"({m.group(1)}) Exchange")]
        for b in blocks:
            if "hashpartitioning(blk" in b:
                assert "sh#" not in b, b


def test_sketch_only_gram_path_is_codegen(spark):
    """corpus_overlap_sketch_only's r11 rework: per-gram md5 must run
    row-side in whole-stage codegen (explode of start indices), not
    inside an interpreted ArrayTransform/array_distinct — the 10x-scale
    profiling showed the higher-order-function path as the dominant
    cost. min() is duplicate-invariant, so no distinct belongs here."""
    p = plan(spark, "corpus_overlap_sketch_only")
    assert "array_distinct" not in p, p
    assert "Generate" in p and "explode" in p, p
    # md5 evaluated in the post-explode projection (row-side): no
    # higher-order transform survives anywhere in the plan
    assert "transform(" not in p, p


def test_norm_audit_windows_walk_the_histogram_not_rows(spark):
    """embedding_norm_audit's median/MAD walks must consume the (norm,
    count) HISTOGRAM — the corpus-sized relation is reduced by a
    partial-aggregated groupBy BEFORE any window — and no join appears
    anywhere."""
    p = plan(spark, "embedding_norm_audit")
    assert "Join" not in p, p
    # the histogram aggregate sits below the window walk: a partial
    # aggregate must appear, and Window nodes must exist above it
    assert "partial_count" in p or "partial_" in p, p
    assert "Window" in p, p


def test_range_search_broadcasts_queries_and_scans_once(spark):
    """ann_range_search: the 5-query dim must broadcast (never shuffle
    the corpus for it) and the plan must contain no corpus self-join."""
    p = plan(spark, "ann_range_search")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_silver_consumer_queries_matches_source():
    # bench.py warms the session silver cache before timing any query in
    # SILVER_CONSUMER_QUERIES; a silver query missing from the set gets
    # timed cold-parse (the r11 mrf_silver_prices spread-5.64 artifact).
    # Derive the true set from the source: every @query in mrf_queries.py
    # whose body calls build_silver_cached.
    import re

    import hls_payer_mrf_sparkstreaming_spark.plans.mrf_queries as mq

    src = open(mq.__file__).read()
    want = set()
    chunks = src.split("@query(")[1:]
    for chunk in chunks:
        m = re.search(r'"([a-z_0-9]+)"', chunk)
        assert m, "query registration without a name literal"
        if (
            "build_silver_cached(" in chunk
            or "build_oon_silver_cached(" in chunk
        ):
            want.add(m.group(1))
    assert set(mq.SILVER_CONSUMER_QUERIES) == want, (
        sorted(set(mq.SILVER_CONSUMER_QUERIES) ^ want)
    )


def test_median_snapshot_refuses_noisy_pass(tmp_path, monkeypatch):
    # r11 verdict: the committed medians came from a host instability
    # episode (values up to 7x off a quiet run). The refresh must refuse
    # a pass that self-reports noise (spread p95 > 1.0) or whose MEDIAN
    # per-query ratio vs the committed snapshot exceeds 1.15 — the
    # distribution gate (advice r12): one intentionally-reworked slower
    # op must NOT block the refresh, the bulk running slow must.
    import json

    from hls_payer_mrf_sparkstreaming_spark.docs import (
        refresh_median_snapshot,
    )

    monkeypatch.delenv("SPARK_GRAFT_SNAPSHOT_FORCE", raising=False)
    details = tmp_path / "details.json"
    snap = tmp_path / "medians.json"

    def write(path, med, spreads=None):
        with open(path, "w") as f:
            json.dump(
                {"queries_sec_median": med, "query_spread_rel": spreads or {}},
                f,
            )

    # first snapshot (no committed file yet): always writes
    base = {"a": 1.0, "b": 2.0, "z": 1.0}
    write(details, base, {"a": 0.1, "b": 0.2, "z": 0.1})
    refresh_median_snapshot(str(details), str(snap))
    committed = json.load(open(snap))
    assert committed["queries_sec_median"] == base
    assert committed["source_details_sha256"]

    # noisy spread: refused
    write(
        details,
        {"a": 0.9, "b": 1.9, "z": 1.0},
        {"a": 3.0, "b": 2.8, "z": 2.9},
    )
    refresh_median_snapshot(str(details), str(snap))
    assert json.load(open(snap)) == committed

    # bulk slow (median per-query ratio > 1.15): refused
    write(
        details,
        {"a": 2.0, "b": 3.0, "z": 1.6},
        {"a": 0.1, "b": 0.1, "z": 0.1},
    )
    refresh_median_snapshot(str(details), str(snap))
    assert json.load(open(snap)) == committed

    # ONE op much slower (a legitimate rework) while the bulk is in
    # band: accepted — the old aggregate-total gate refused this
    # forever (advice r12)
    write(
        details,
        {"a": 4.0, "b": 1.9, "z": 1.0},
        {"a": 0.1, "b": 0.1, "z": 0.1},
    )
    refresh_median_snapshot(str(details), str(snap))
    assert json.load(open(snap))["queries_sec_median"]["a"] == 4.0

    # quiet and within band: accepted (new key doesn't count as slow)
    write(
        details,
        {"a": 3.9, "b": 1.9, "z": 0.9, "c": 9.0},
        {"a": 0.1, "b": 0.1, "z": 0.1},
    )
    refresh_median_snapshot(str(details), str(snap))
    assert json.load(open(snap))["queries_sec_median"]["c"] == 9.0

    # forced: a slow pass still writes
    write(details, {"a": 9.0, "b": 9.0, "z": 9.0}, {"a": 0.1})
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_FORCE", "1")
    refresh_median_snapshot(str(details), str(snap))
    assert json.load(open(snap))["queries_sec_median"]["a"] == 9.0


def _topmost_join_branches(p: str):
    """The two child-branch start indices of a formatted plan's TOPMOST
    join, as (start_index, lines) pairs over the tree section's
    (indent, node) list — the scaffolding for aggregate-before-join
    pins that must hold under EITHER join strategy (SMJ on a cold plan,
    BHJ once cached inputs have stats)."""
    lines = []
    for line in p.splitlines():
        if re.match(r"^\(\d+\) ", line):
            break
        m = re.search(r"(?:\+|:)- ", line)
        if m:
            lines.append((m.start(), line[m.end() :]))
    join_at = next(
        i
        for i, (_, node) in enumerate(lines)
        if re.match(r"\*?\s*\w*(Join|join)", node)
    )
    join_indent = lines[join_at][0]
    heads = [
        i
        for i, (ind, _) in enumerate(lines[join_at + 1 :], join_at + 1)
        if ind == join_indent + 3
    ]
    assert len(heads) == 2, lines[join_at:]
    return [(h, lines) for h in heads]


def _assert_branch_aggregates_first(lines, start, p):
    """Walking down one join branch, a HashAggregate must appear before
    any Generate/Scan/nested-Join — i.e. the branch feeds the join its
    REDUCED relation, with only wrapper nodes (Sort/Exchange/Project/
    BroadcastExchange) in between."""
    for _, node in lines[start:]:
        if re.match(r"\*?\s*HashAggregate", node):
            return
        assert not re.search(r"Generate|Scan|Join", node), (node, p)


def test_provider_network_size_aggregates_before_join(spark):
    # mrf_provider_network_size: both sides must reduce to one row per
    # provider group BEFORE the final join — the partial-agg-then-join
    # shape that moves one row per group, never per rate, at national
    # scale. The join STRATEGY is Catalyst's choice (SMJ on a cold
    # plan, BHJ of the aggregated side once the cached parse has stats
    # — the full suite sees the latter), so the pin is structural:
    # walking down from the topmost join, each branch must reach a
    # HashAggregate before any Generate/Scan/other-Join (wrapper nodes
    # like Sort/Exchange/Project are fine). Nothing may go cartesian
    # (the only cross join in lineage is the cached providers build's
    # one-row reporting-entity broadcast).
    p = plan(spark, "mrf_provider_network_size")
    assert "CartesianProduct" not in p, p
    for start, lines in _topmost_join_branches(p):
        _assert_branch_aggregates_first(lines, start, p)


def _broadcast_subtree_has(p: str, detail_regex: str) -> bool:
    """True iff SOME BroadcastExchange subtree of the formatted plan
    contains a node whose detail section matches detail_regex — a real
    containment check, unlike a flat 'both substrings appear somewhere
    in the plan' regex, which an unrelated broadcast plus a fact-side
    filter would also satisfy."""
    tree = []
    for line in p.splitlines():
        if re.match(r"^\(\d+\) ", line):
            break
        mid = re.search(r"\((\d+)\)\s*$", line)
        if not mid:
            continue
        m = re.search(r"(?:\+|:)- ", line)
        tree.append(
            (
                m.start() if m else -3,
                (line[m.end() :] if m else line).strip(),
                int(mid.group(1)),
            )
        )
    details = dict(
        re.findall(r"^\((\d+)\) ([\s\S]*?)(?=^\(\d+\) |\Z)", p, re.M)
    )
    for i, (ind0, name, nid) in enumerate(tree):
        if not name.startswith("BroadcastExchange"):
            continue
        sub = [nid]
        for j in range(i + 1, len(tree)):
            if tree[j][0] <= ind0:
                break
            sub.append(tree[j][2])
        if any(
            re.search(detail_regex, details.get(str(n), "")) for n in sub
        ):
            return True
    return False


def test_tin_rate_lookup_broadcasts_filtered_dim(spark):
    # mrf_tin_rate_lookup: the TIN predicate reduces the provider dim to
    # a handful of rows which must BROADCAST into the
    # par_providers->prices->codes fact chain (the shape that survives
    # one TIN appearing in millions of rate rows), no cartesian. The
    # FACT-chain surrogate-key joins are deliberately NOT strategy-pinned:
    # between corpus-sized silver tables a shuffle join is the correct
    # at-scale plan — the r12 "no SortMergeJoin anywhere" form only held
    # while the cached fixture tables had materialized stats, and went
    # red the moment cache eviction handed the planner a cold relation.
    p = plan(spark, "mrf_tin_rate_lookup")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    # the broadcast side must be the tin-filtered provider dim: some
    # BroadcastExchange SUBTREE (tree-walked, not a flat proximity
    # regex) must contain the tin.value predicate
    assert _broadcast_subtree_has(p, r"tin#\d+\.value"), p


def test_npi_coverage_distincts_links_before_npi_join(spark):
    # mrf_npi_coverage: the rate->group link chain must be
    # DISTINCT-reduced to (billing_code, group) BEFORE the NPI-explode
    # dim joins — the join fans out per NPI, so feeding it per-rate
    # duplicate links would multiply rows for nothing. Structural pin on
    # the topmost join's LINK branch only (the NPI branch legitimately
    # contains the explode Generate); join strategy stays Catalyst's.
    p = plan(spark, "mrf_npi_coverage")
    assert "CartesianProduct" not in p, p
    (link_branch, lines), _ = _topmost_join_branches(p)
    _assert_branch_aggregates_first(lines, link_branch, p)


def test_embedding_threshold_curve_is_bucketed_and_one_generate(spark):
    # embedding_threshold_curve: pairwise work must stay inside LSH
    # buckets (equi-join on bucket, never a corpus cross/cartesian), and
    # the 6-tier sweep must be ONE explode over the bounded pair set —
    # exactly one runtime Generate (the scratch-persisted bucket
    # relation's build lineage is excluded by the runtime walk).
    p = plan(spark, "embedding_threshold_curve")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert runtime_generates(p) == 1, p


def test_ivf_probe_curve_broadcasts_probe_sets(spark):
    # ann_ivf_probe_curve: centroid assignment is the broadcast argmax
    # fold (never an N-by-K shuffle), the probe sets and query dim
    # broadcast into the corpus scan, and the exact side is the one
    # O(N*Q) verification scan — so the plan must contain no shuffle
    # join and nothing cartesian (the broadcast nested-loop exact scan
    # is the pq_recall_eval precedent).
    p = plan(spark, "ann_ivf_probe_curve")
    assert "CartesianProduct" not in p, p
    # the ONE allowed shuffle join is the final LeftOuter hit-join of
    # the two top-k result sets (both bounded at NQ*K*tiers rows);
    # every corpus-side join must be broadcast
    import re as _re

    smj = _re.findall(r"SortMergeJoin (\w+)", p)
    assert smj in ([], ["LeftOuter"]), p
    assert "Window" in p, p


def test_dedup_threshold_curve_checkpointed_and_bucketed(spark):
    # dedup_threshold_curve: must read the checkpointed signature scan
    # (no 32-perm array_min tree re-inlined into the per-action plan),
    # sweep tiers as ONE explode over the bounded candidate set, and
    # never go cartesian — the same discipline pinned for
    # minhash_error_eval, which shares its candidate pipeline.
    p = plan(spark, "dedup_threshold_curve")
    assert "ExistingRDD" in p, p
    assert "array_min" not in p, p
    assert "CartesianProduct" not in p, p


def test_percentile_summary_walks_are_bucket_bounded(spark):
    # percentile_summary (r13 rework — the r12 10x scale max at 2.1x):
    # the exact-rank walk must be the ranked_value_histogram shape —
    # the within-bucket cumulative window exchanges on (group, bucket)
    # so no single-task per-group sort over the whole distinct-cents
    # histogram remains, and the bucket-level cumulative table comes
    # back as a BROADCAST join, never a shuffle join.
    p = plan(spark, "percentile_summary")
    assert re.search(r"hashpartitioning\(l_returnflag#\d+, _b#", p), p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # the raw fact is scanned once, into the persisted histogram
    assert "InMemoryRelation" in p, p


def test_mrf_rate_percentiles_never_buffers_group_values(spark):
    # mrf_rate_percentiles (r13 audit rider of the percentile_summary
    # rework): percentile_disc's ObjectHashAggregate buffers every
    # group value in memory — fatal for a 2-value billing_class key at
    # corpus scale — so the plan must contain neither; the percentiles
    # ride the bounded-bucket exact rank instead (broadcast bucket
    # table, no shuffle join).
    p = plan(spark, "mrf_rate_percentiles")
    assert "percentile_disc" not in p, p
    assert "ObjectHashAggregate" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_sweep_ratio_claims_cite_committed_artifact():
    # r12 verdict task 4: SWEEP_r12.md narrated a minhash scale ratio
    # (1.4) from an uncommitted pass while BENCH_SCALE.json said 1.93.
    # Convention: a scale-ratio claim in the LATEST sweep doc is written
    # as `op` ... ratio X -> Y (or `op` ... ratio Y); Y must equal the
    # ratio in the committed BENCH_SCALE.json at HEAD. Older sweeps
    # cite their own round's artifact and are not re-checked.
    import glob
    import json

    root = os.path.join(os.path.dirname(__file__), "..")
    sweeps = sorted(
        glob.glob(os.path.join(root, "SWEEP_r*.md")),
        key=lambda p: int(re.search(r"SWEEP_r(\d+)", p).group(1)),
    )
    scale_path = os.path.join(root, "BENCH_SCALE.json")
    if not sweeps or not os.path.exists(scale_path):
        pytest.skip("no sweep docs / no committed scale artifact")
    with open(scale_path) as f:
        committed = json.load(f).get("ratio", {})
    with open(sweeps[-1]) as f:
        text = f.read()
    bad = []
    for m in re.finditer(
        r"`([a-z_0-9]+)`[^`]*?ratio(?:\s+[\d.]+\s*->)?\s*([\d.]+)", text
    ):
        op, claimed = m.group(1), float(m.group(2))
        if op in committed and abs(claimed - committed[op]) > 1e-9:
            bad.append((op, claimed, committed[op]))
    assert not bad, (
        f"{os.path.basename(sweeps[-1])} cites scale ratios that "
        f"disagree with the committed BENCH_SCALE.json: {bad}"
    )


def test_capitation_profile_is_explode_free_single_agg(spark):
    # mrf_capitation_profile: covered-service counts and rate stats come
    # from size/flatten/filter/transform higher-order functions on the
    # nested arrays — the plan must contain NO runtime explode (the only
    # Generate is the cache-build in_network parse), no join anywhere,
    # and the arrangement filter must sit on the item scan.
    p = plan(spark, "mrf_capitation_profile")
    assert runtime_generates(p) == 0, p
    assert "Join" not in p.split("\n(1)")[0], p
    assert "capitation" in p, p


def test_bundle_expansion_aggregates_ffs_side_before_join(spark):
    # mrf_bundle_expansion: the only runtime explode is the bounded
    # bundled_codes fan-out on the bundle side; the ffs side must reach
    # the join as a per-code aggregate (HashAggregate below the join),
    # never as raw price rows, and nothing is cartesian. Join strategy
    # itself is NOT pinned (SMJ cold, BHJ once cached stats exist).
    p = plan(spark, "mrf_bundle_expansion")
    assert runtime_generates(p) == 1, p
    assert "CartesianProduct" not in p, p
    branches = _topmost_join_branches(p)
    # one branch aggregates before anything corpus-shaped; the other is
    # the bundle explode
    ok = 0
    for start, lines in branches:
        try:
            _assert_branch_aggregates_first(lines, start, p)
            ok += 1
        except AssertionError:
            pass
    assert ok == 1, p


def test_oon_allowed_vs_billed_is_join_free_single_agg(spark):
    # mrf_oon_allowed_vs_billed: one exploded payments lineage (the
    # allowed_amounts -> payments -> providers fan-out = 3 runtime
    # Generates; the out_of_network item parse is the cached build, not
    # runtime) into ONE partial-agg groupBy — no join anywhere.
    p = plan(spark, "mrf_oon_allowed_vs_billed")
    assert "Join" not in p.split("\n(1)")[0], p
    assert runtime_generates(p) == 3, p


def test_oon_tin_profile_is_join_free_single_agg(spark):
    # mrf_oon_tin_profile: payments lineage + the bounded npi array
    # fan-out (4 runtime Generates), distinct counts in one groupBy.
    p = plan(spark, "mrf_oon_tin_profile")
    assert "Join" not in p.split("\n(1)")[0], p
    assert runtime_generates(p) == 4, p


def test_toc_manifest_is_join_free_single_parse(spark):
    # mrf_toc_manifest: the plan-x-file cross product happens WITHIN
    # each reporting_structure row (two sequential explodes on one
    # lineage), so the plan must contain no join and the TOC JSON parse
    # must appear exactly once.
    p = plan(spark, "mrf_toc_manifest")
    assert "Join" not in p.split("\n(1)")[0], p
    assert p.split("\n(1)")[0].count("BatchScan payer-mrf") == 1, p


def test_toc_shared_files_is_join_free_two_level_agg(spark):
    # mrf_toc_shared_files: per-URL distinct-plan counting happens as a
    # two-level partial-agg rollup on the join-free manifest lineage —
    # no join, one TOC parse, and exactly two grouping levels (the
    # location-grain agg then the file_kind-grain agg, each a
    # partial+final HashAggregate pair).
    p = plan(spark, "mrf_toc_shared_files")
    body = p.split("\n(1)")[0]
    assert "Join" not in body, p
    assert body.count("BatchScan payer-mrf") == 1, p


def test_inn_vs_oon_benchmark_aggregates_before_join(spark):
    # mrf_inn_vs_oon_benchmark: both file types must reduce to
    # billing_code grain BEFORE the join — the join moves two
    # code-cardinality summaries, never the exploded price or payment
    # facts. Join STRATEGY stays Catalyst's choice (cold SMJ vs warm
    # BHJ, same rationale as mrf_provider_network_size).
    p = plan(spark, "mrf_inn_vs_oon_benchmark")
    assert "CartesianProduct" not in p, p
    branches = _topmost_join_branches(p)
    assert len(branches) == 2, p
    for start, lines in branches:
        _assert_branch_aggregates_first(lines, start, p)


def test_toc_delta_distincts_before_outer_join(spark):
    # mrf_toc_delta: each TOC snapshot must reduce to its DISTINCT
    # (file_kind, location) set BEFORE the full-outer join — the join
    # moves URL-cardinality sets, never the plan-x-file manifest
    # fan-out. Distinct plans as a HashAggregate, so the existing
    # aggregate-before-join walker applies to both branches.
    p = plan(spark, "mrf_toc_delta")
    assert "CartesianProduct" not in p, p
    branches = _topmost_join_branches(p)
    assert len(branches) == 2, p
    for start, lines in branches:
        _assert_branch_aggregates_first(lines, start, p)


def test_remote_provider_resolve_broadcasts_ref_dim(spark):
    # mrf_remote_provider_resolve: the remote side is one pinned-schema
    # distributed JSON scan (stock FileScan — small standalone files
    # are not chunker work), and the ref->file linkage joins against an
    # EXPLICITLY broadcast (gid, basename) dim — the hint makes BHJ
    # strategy-stable regardless of stats, so pinning it is safe here.
    # No cartesian anywhere (the providers-build one-row entity
    # broadcast is a BroadcastNestedLoopJoin, not CartesianProduct).
    p = plan(spark, "mrf_remote_provider_resolve")
    body = p.split("\n(1)")[0]
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in body, p
    assert body.count("Scan json") == 1, p
