"""MRF-domain queries for the driver's rows-only checks.

These exercise the actual payer-mrf engine (chunker -> source -> silver ->
gold) end-to-end. They run on a deterministic synthetic MRF file (seeded,
generated once into a work dir) because the oracle's DuckDB views only
cover the TPC-H-ish tables — correctness of these paths is enforced by
tests/test_datasource.py and tests/test_silver.py instead.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.relational import (
    ranked_value_histogram,
)
from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    query,
    repersist_if_cleared,
)
from hls_payer_mrf_sparkstreaming_spark.plans.silver import (
    build_oon_silver,
    build_silver,
    build_toc_silver,
    HEADER_KEY_REPORTING_STRUCTURE,
    resolve_remote_provider_groups,
)
from hls_payer_mrf_sparkstreaming_spark.sources.datasource import read_payer_mrf
from hls_payer_mrf_sparkstreaming_spark.sources.synth import (
    materialize_remote_provider_files,
    write_allowed_amounts_file,
    write_mrf_file,
    write_toc_file,
)

_N_ITEMS = 200
_SEED = 42

# Per-session cache of parsed silver tables, mirroring the bounded
# neardup-edge/component caches in operators/dedup.py: five registry
# queries (silver prices/providers, gold shoppable, rate percentiles,
# rate spread) all derive from the SAME parsed fixture — persisting the
# parsed in_network / providers branches once per session is the
# registry-query analogue of save_all's materialize-once medallion
# discipline (at 100 TB you CTAS silver once and query the tables; here
# the persisted parse plays that role). Entries from dead sessions are
# dropped; the FIFO bound caps memory.
_SILVER_CACHE: dict[tuple, "object"] = {}
# capacity = the distinct fixtures registry queries parse in one session
# (main, payer-compare A/B, mixed-arrangement, headroom) — at 4, adding
# the r13 mixed fixture caused eviction thrash: the main fixture's parsed
# tables lost their materialized stats mid-suite and downstream plan pins
# saw cold SMJ plans
_SILVER_CACHE_MAX = 6


def _unpersist_tables(t) -> None:
    # a cached entry may outlive its SparkSession (stopped mid-process);
    # unpersist then raises through py4j — the blocks died with the JVM,
    # so dropping the reference is the only cleanup left
    try:
        t.in_network.unpersist()
        t.providers_x_payer.unpersist()
    except Exception:
        pass


def build_silver_cached(spark, path: str, **options):
    app_id = spark.sparkContext.applicationId
    # entries keyed by another app_id belong to a previous (now replaced)
    # session in this process — same liveness heuristic as the
    # operators/dedup.py edge/component caches
    for k in [k for k in _SILVER_CACHE if k[0] != app_id]:
        _unpersist_tables(_SILVER_CACHE.pop(k))
    key = (app_id, path, tuple(sorted(options.items())))
    t = _SILVER_CACHE.get(key)
    if t is None:
        while len(_SILVER_CACHE) >= _SILVER_CACHE_MAX:
            _unpersist_tables(_SILVER_CACHE.pop(next(iter(_SILVER_CACHE))))
        t = build_silver(spark, path, **options)
        t.in_network.persist()
        t.providers_x_payer.persist()
        _SILVER_CACHE[key] = t
    else:
        # a host spark.catalog.clearCache() (bench.py between samples)
        # drops the storage but not this dict entry: without re-persist,
        # every later consumer re-parses the full in_network branch per
        # action WITHOUT re-caching — the same stale-CacheManager trap
        # the edge cache hit (operators/suite.py repersist_if_cleared)
        repersist_if_cleared(t.in_network)
        repersist_if_cleared(t.providers_x_payer)
    return t


def clear_silver_cache() -> None:
    """Unpersist and drop every cached silver parse (test/REPL hook,
    mirroring operators/dedup.py clear_edge_cache/clear_cc_cache)."""
    while _SILVER_CACHE:
        _unpersist_tables(_SILVER_CACHE.popitem()[1])


# Registry queries that read through the session silver cache: bench.py
# warms the cache untimed before each of their timed samples (mirror of
# dedup.py EDGE_CONSUMER_QUERIES), so their medians measure the warm
# consumer cost while the one-time parse is measured separately and fully
# cold as silver_build_sec.
SILVER_CONSUMER_QUERIES = frozenset(
    {
        "mrf_silver_prices",
        "mrf_silver_providers",
        "mrf_gold_shoppable",
        "mrf_rate_percentiles",
        "mrf_rate_spread",
        "mrf_payer_compare",
        "mrf_network_overlap",
        "mrf_rate_outliers",
        "mrf_provider_price_position",
        "mrf_billing_class_gap",
        "mrf_modifier_mix",
        "mrf_negotiation_type_mix",
        "mrf_service_code_rates",
        "mrf_provider_network_size",
        "mrf_tin_rate_lookup",
        "mrf_npi_coverage",
        "mrf_capitation_profile",
        "mrf_bundle_expansion",
        "mrf_oon_allowed_vs_billed",
        "mrf_oon_tin_profile",
        "mrf_inn_vs_oon_benchmark",
        "mrf_remote_provider_resolve",
    }
)


def fixture_path() -> str:
    """Deterministic synthetic MRF file, generated once per machine."""
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"mrf_n{_N_ITEMS}_s{_SEED}.json")
    if not os.path.exists(p):
        write_mrf_file(p, n_in_network=_N_ITEMS, n_provider_refs=40, seed=_SEED)
    return p


_BIG_N_ITEMS = 60
_BIG_N_REFS = 20
_BIG_SEED = 7
# every element padded past the chunker's 1024-byte target floor, so at
# chunktargetbytes=1024 the splitter MUST emit exactly one element per
# chunk — which makes per-header chunk counts equal DuckDB's element
# counts, turning the chunk-boundary placement itself into an oracled
# quantity (not just the element totals mrf_bronze_elements checks)
_BIG_MIN_ELEMENT_BYTES = 1400


def fixture_big_path() -> str:
    """Synthetic MRF file whose array elements each exceed the chunker's
    1024-byte chunk-target floor (see ``min_element_bytes``)."""
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(
        d, f"mrf_big_n{_BIG_N_ITEMS}_s{_BIG_SEED}_m{_BIG_MIN_ELEMENT_BYTES}.json"
    )
    if not os.path.exists(p):
        write_mrf_file(
            p,
            n_in_network=_BIG_N_ITEMS,
            n_provider_refs=_BIG_N_REFS,
            seed=_BIG_SEED,
            min_element_bytes=_BIG_MIN_ELEMENT_BYTES,
        )
    return p


def _bronze_oracle() -> str:
    return f"""
        SELECT 'in_network' AS header_key,
               CAST(len(in_network) AS BIGINT) AS n_chunks
        FROM read_json('{fixture_big_path()}')
        UNION ALL
        SELECT 'provider_references' AS header_key,
               CAST(len(provider_references) AS BIGINT) AS n_chunks
        FROM read_json('{fixture_big_path()}')
    """


@query(
    "mrf_bronze",
    oracle=_bronze_oracle(),
    description="payer-mrf source end-to-end: chunk counts per header_key "
    "(header/footer fragments excluded). Oracled exactly: the fixture's "
    "elements are each padded past the chunker's 1024-byte target floor "
    "and the read uses chunktargetbytes=1024, so a correct splitter "
    "closes a chunk after every element — per-header chunk counts must "
    "equal the array lengths an independent DuckDB read_json sees. Any "
    "chunk that merges two elements, splits one, or lands on the wrong "
    "header breaks the hash",
)
def mrf_bronze(spark, sf_dir):
    df = read_payer_mrf(spark, fixture_big_path(), chunktargetbytes=1024)
    return (
        df.filter(F.col("header_key") != "")
        .groupBy("header_key")
        .agg(F.count("*").cast("long").alias("n_chunks"))
    )


def _silver_prices_oracle() -> str:
    # DuckDB parses the SAME fixture json directly — a semantic
    # cross-check of the whole chunker -> source -> silver pipeline
    # against an independent JSON reader, not just an invariant test.
    # fixture_path() also guarantees the file exists before the driver
    # runs the oracle side.
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_path()}')
        ),
        rates AS (
            SELECT unnest(item.negotiated_rates) AS r FROM items
        ),
        pr AS (
            SELECT unnest(r.negotiated_prices) AS p FROM rates
        )
        SELECT p.billing_class AS billing_class,
               CAST(count(*) AS BIGINT) AS n_prices,
               min(p.negotiated_rate) AS min_rate,
               max(p.negotiated_rate) AS max_rate
        FROM pr
        WHERE p.negotiated_type = 'negotiated'
        GROUP BY 1
    """


@query(
    "mrf_silver_prices",
    oracle=_silver_prices_oracle(),
    description="bronze->silver explode pipeline: negotiated prices by "
    "billing_class — oracled by DuckDB read_json over the same fixture "
    "file, proving the byte-chunker + Spark source + silver explode "
    "chain equals an independent JSON parse",
)
def mrf_silver_prices(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    return t.prices.groupBy("billing_class").agg(
        F.count("*").alias("n_prices"),
        F.min("negotiated_rate").alias("min_rate"),
        F.max("negotiated_rate").alias("max_rate"),
    )


def _silver_providers_oracle() -> str:
    return f"""
        WITH src AS (SELECT * FROM read_json('{fixture_path()}')),
        pxp AS (
            SELECT pr.provider_group_id AS provider_group_id,
                   unnest(pr.provider_groups) AS g
            FROM (SELECT unnest(provider_references) AS pr FROM src)
        )
        SELECT s.reporting_entity_name AS reporting_entity_name,
               s.reporting_entity_type AS reporting_entity_type,
               pxp.provider_group_id AS provider_group_id,
               to_json(g.npi) AS npi,
               to_json(g.tin) AS tin
        FROM pxp CROSS JOIN (
            SELECT reporting_entity_name, reporting_entity_type FROM src
        ) s
    """


@query(
    "mrf_silver_providers",
    oracle=_silver_providers_oracle(),
    description="silver provider_references table: exploded provider "
    "groups x broadcast reporting entity (the reference's first silver "
    "CTAS, 01_payer_mrf_demo.py:148-158) — oracled by a DuckDB read_json "
    "twin over the same fixture file; npi/tin serialized to JSON on both "
    "sides for the hash comparison",
)
def mrf_silver_providers(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    return t.providers_x_payer.select(
        "reporting_entity_name",
        "reporting_entity_type",
        "provider_group_id",
        F.to_json("npi").alias("npi"),
        F.to_json("tin").alias("tin"),
    )


# (billing_code, tin_value) guaranteed to hit, memoized per fixture path —
# parameter discovery is setup, not part of the gold query being measured
_gold_params: dict[str, tuple[str, str]] = {}


def _shoppable_params(t, path: str) -> tuple[str, str]:
    if path not in _gold_params:
        hit = (
            t.par_providers.join(t.prices, "sk_rate_id")
            .join(t.codes, "sk_in_network_id")
            .join(
                t.providers_x_payer,
                F.col("provider_reference_id") == F.col("provider_group_id"),
            )
            .select("billing_code", F.col("tin.value").alias("tin_value"))
            .orderBy("billing_code", "tin_value")
            .first()
        )
        _gold_params[path] = (hit["billing_code"], hit["tin_value"])
    return _gold_params[path]


def _gold_oracle() -> str:
    # Full semantic twin of the gold query in DuckDB, from the raw fixture
    # JSON: same explodes, same 4-way join keyed on (item, rate) position,
    # and the SAME deterministic parameter pick (lexicographic minimum
    # (billing_code, tin_value) over the joined space) as
    # _shoppable_params. Complex outputs are JSON-serialized on both
    # sides, so the driver canonicalizer can hash them.
    return f"""
        WITH src AS (SELECT * FROM read_json('{fixture_path()}')),
        items AS (
            SELECT unnest(in_network) AS item,
                   generate_subscripts(in_network, 1) AS item_pos
            FROM src
        ),
        rates AS (
            SELECT item, item_pos,
                   unnest(item.negotiated_rates) AS r,
                   generate_subscripts(item.negotiated_rates, 1) AS rate_pos
            FROM items
        ),
        par AS (
            SELECT item_pos, rate_pos,
                   unnest(r.provider_references) AS pref
            FROM rates
        ),
        prices AS (
            SELECT item, item_pos, rate_pos,
                   unnest(r.negotiated_prices) AS p
            FROM rates
        ),
        pxp AS (
            SELECT pr.provider_group_id AS pgid,
                   unnest(pr.provider_groups) AS g
            FROM (SELECT unnest(provider_references) AS pr FROM src)
        ),
        params AS (
            SELECT prices.item.billing_code AS bc, g.tin.value AS tv
            FROM par
            JOIN prices USING (item_pos, rate_pos)
            JOIN pxp ON par.pref = pxp.pgid
            WHERE p.negotiated_type = 'negotiated'
            ORDER BY 1, 2 LIMIT 1
        )
        SELECT prices.item.billing_code AS billing_code,
               prices.item.description AS description,
               p.billing_class AS billing_class,
               to_json(p.billing_code_modifier) AS billing_code_modifier,
               to_json(p.service_code) AS service_code,
               p.negotiated_rate AS negotiated_rate,
               to_json(g.npi) AS npi,
               to_json(g.tin) AS tin
        FROM par
        JOIN prices USING (item_pos, rate_pos)
        JOIN pxp ON par.pref = pxp.pgid
        CROSS JOIN params
        WHERE p.negotiated_type = 'negotiated'
          AND prices.item.negotiation_arrangement = 'ffs'
          AND prices.item.billing_code = params.bc
          AND g.tin.value = params.tv
    """


@query(
    "mrf_gold_shoppable",
    oracle=_gold_oracle(),
    description="gold shoppable-price query (parameterized) — the one-code "
    "predicate filters the codes relation BEFORE any explode (a pushed "
    "parquet filter on materialized tables), the (price, provider_ref) "
    "pairs unfold from that code's negotiated_rates alone, and the only "
    "join is against the broadcast TIN-filtered provider dim; the full "
    "price fact is never scanned. Oracled end-to-end by a DuckDB "
    "read_json twin with the same deterministic parameter discovery",
)
def mrf_gold_shoppable(spark, sf_dir):
    p = fixture_path()
    t = build_silver_cached(spark, p, chunktargetbytes=65536)
    billing_code, tin_value = _shoppable_params(t, p)
    gold = t.shoppable_price(billing_code, tin_value)
    # Registered-entry projection only: the driver's pandas canonicalizer
    # sorts every column, and array/struct cells are unhashable there —
    # serialize them to deterministic JSON strings for the check.
    return gold.select(
        "billing_code",
        "description",
        "billing_class",
        F.to_json("billing_code_modifier").alias("billing_code_modifier"),
        F.to_json("service_code").alias("service_code"),
        "negotiated_rate",
        F.to_json("npi").alias("npi"),
        F.to_json("tin").alias("tin"),
    )


def _bronze_elements_oracle() -> str:
    return f"""
        SELECT 'in_network' AS header_key,
               CAST(len(in_network) AS BIGINT) AS n_elements
        FROM read_json('{fixture_path()}')
        UNION ALL
        SELECT 'provider_references' AS header_key,
               CAST(len(provider_references) AS BIGINT) AS n_elements
        FROM read_json('{fixture_path()}')
    """


@query(
    "mrf_bronze_elements",
    oracle=_bronze_elements_oracle(),
    description="element-exactness of the splitter: total array elements "
    "per header_key summed over all bronze chunk payloads "
    "(json_array_length per chunk) must equal the array lengths an "
    "independent DuckDB read_json sees in the raw file — any element "
    "lost, duplicated or mis-assigned at a chunk boundary by the "
    "byte-scanner breaks the hash. This oracles the engine-internal path "
    "that mrf_bronze (chunk counts, a chunking-parameter artifact) "
    "cannot",
)
def mrf_bronze_elements(spark, sf_dir):
    df = read_payer_mrf(spark, fixture_path(), chunktargetbytes=65536)
    return (
        df.filter(F.col("header_key") != "")
        .groupBy("header_key")
        .agg(
            F.sum(F.json_array_length("json_payload"))
            .cast("long")
            .alias("n_elements")
        )
    )


def _rate_percentiles_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_path()}')
        ),
        rates AS (
            SELECT unnest(item.negotiated_rates) AS r FROM items
        ),
        pr AS (
            SELECT unnest(r.negotiated_prices) AS p FROM rates
        ),
        c AS (
            SELECT p.billing_class AS billing_class,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
        )
        SELECT billing_class,
               CAST(count(*) AS BIGINT) AS n_prices,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS p25_cents,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS median_cents,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS p75_cents
        FROM c GROUP BY 1
    """


@query(
    "mrf_rate_percentiles",
    oracle=_rate_percentiles_oracle(),
    description="negotiated-rate benchmarking — the price-transparency "
    "use case the CMS mandate exists for: per billing_class p25/median/"
    "p75 of negotiated rates in exact integer cents, computed through "
    "the full chunker -> source -> silver explode chain and oracled by "
    "an independent DuckDB read_json of the same fixture. Plan (r13 "
    "rework, same audit as percentile_summary): percentile_disc's "
    "ObjectHashAggregate buffers every group value in memory — fatal "
    "for a 2-value billing_class key over a 100 TB MRF corpus — so the "
    "percentiles ride ranked_value_histogram's bounded-bucket exact "
    "rank instead: one map-side-combined (class, cents) histogram is "
    "the only pass over price rows, the cumulative walks are domain-"
    "bounded, and all three percentiles are min(when(rank*100 >= p*n)) "
    "over the same relation; the byte-range-pruned in_network branch "
    "means provider_references bytes are never read",
)
def mrf_rate_percentiles(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = t.prices.select(
        "billing_class",
        F.round(F.col("negotiated_rate") * 100).cast("long").alias("cents"),
    )
    r = ranked_value_histogram(c, ["billing_class"], "cents")
    pick = lambda p: F.min(  # noqa: E731 — percentile_disc(p) via rank
        F.when(F.col("_rank") * 100 >= p * F.col("_n"), F.col("cents"))
    ).cast("long")
    return r.groupBy("billing_class").agg(
        F.max("_n").cast("long").alias("n_prices"),
        pick(25).alias("p25_cents"),
        pick(50).alias("median_cents"),
        pick(75).alias("p75_cents"),
    )


def _rate_spread_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_path()}')
        ),
        rates AS (
            SELECT item.billing_code AS billing_code,
                   unnest(item.negotiated_rates) AS r
            FROM items
        ),
        pr AS (
            SELECT billing_code, unnest(r.negotiated_prices) AS p FROM rates
        ),
        c AS (
            SELECT billing_code,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
        )
        SELECT billing_code,
               CAST(count(*) AS BIGINT) AS n_prices,
               min(cents) AS min_cents,
               max(cents) AS max_cents,
               CAST(floor((max(cents) - min(cents)) * 10000.0 / min(cents))
                    AS BIGINT) AS spread_bps
        FROM c GROUP BY 1
    """


@query(
    "mrf_rate_spread",
    oracle=_rate_spread_oracle(),
    description="per-procedure rate dispersion — the other headline "
    "price-transparency question (how much does the SAME billing code "
    "cost across provider groups?): per billing_code, the count, min "
    "and max negotiated rate in exact integer cents and the spread in "
    "basis points of the minimum, computed through the full chunker -> "
    "source -> silver chain and oracled by an independent DuckDB "
    "read_json of the same fixture. Plan: codes->prices is a surrogate-"
    "key equi-join inside one exploded lineage (no shuffle beyond the "
    "final partial-agg groupBy on billing_code); min/max/count are "
    "order-insensitive so the parallel aggregation is hash-exact",
)
def mrf_rate_spread(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = (
        t.codes.select("sk_in_network_id", "billing_code")
        .join(t.prices, "sk_in_network_id")
        .select(
            "billing_code",
            F.round(F.col("negotiated_rate") * 100).cast("long").alias("cents"),
        )
    )
    return c.groupBy("billing_code").agg(
        F.count("*").cast("long").alias("n_prices"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.floor(
            (F.max("cents") - F.min("cents"))
            * 10000.0
            / F.min("cents")
        )
        .cast("long")
        .alias("spread_bps"),
    )


_B_SEED = 99


def fixture_b_path() -> str:
    """Second synthetic payer: same deterministic billing-code universe
    (codes derive from the item index, not the seed), independently drawn
    rates — the cross-payer comparison the CMS mandate exists to enable."""
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"mrf_n{_N_ITEMS}_s{_B_SEED}.json")
    if not os.path.exists(p):
        write_mrf_file(
            p, n_in_network=_N_ITEMS, n_provider_refs=40, seed=_B_SEED
        )
    return p


def _payer_compare_oracle() -> str:
    def med(path: str) -> str:
        return f"""(
            WITH items AS (
                SELECT unnest(in_network) AS item
                FROM read_json('{path}')
            ),
            rates AS (
                SELECT item.billing_code AS billing_code,
                       unnest(item.negotiated_rates) AS r
                FROM items
            ),
            pr AS (
                SELECT billing_code, unnest(r.negotiated_prices) AS p
                FROM rates
            )
            SELECT billing_code,
                   CAST(percentile_disc(0.5) WITHIN GROUP (
                       ORDER BY CAST(round(p.negotiated_rate * 100)
                                     AS BIGINT)) AS BIGINT) AS med_cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
            GROUP BY 1
        )"""

    return f"""
        SELECT a.billing_code AS billing_code,
               a.med_cents AS payer_a_median_cents,
               b.med_cents AS payer_b_median_cents,
               CAST(floor(b.med_cents * 10000.0 / a.med_cents) AS BIGINT)
                   AS b_over_a_bps
        FROM {med(fixture_path())} a
        JOIN {med(fixture_b_path())} b USING (billing_code)
    """


@query(
    "mrf_payer_compare",
    oracle=_payer_compare_oracle(),
    description="cross-payer rate comparison — the consumer question the "
    "CMS transparency mandate exists to answer (which payer negotiated "
    "the better rate for the SAME procedure?): median negotiated rate "
    "per billing_code for two payers' MRF files, joined on billing_code, "
    "with the B/A ratio in basis points. Runs the full chunker -> "
    "source -> silver chain on BOTH files (each parsed once via the "
    "session silver cache) and is oracled by independent DuckDB "
    "read_json twins. Plan: per payer, (billing_code, cents) is ONE "
    "double-explode pass over the parsed in_network branch (a "
    "codes-join-prices formulation would re-execute the corpus-sized "
    "parse on both join sides — the silver tables share the explode "
    "lineage, which Spark does not dedupe across joins), reduced to "
    "per-code medians BEFORE the cross-payer join, so the join moves "
    "one row per billing code, not per price — at national scale "
    "(thousands of payer files) this is the same "
    "partial-aggregate-then-join shape",
)
def mrf_payer_compare(spark, sf_dir):
    def med(path):
        t = build_silver_cached(spark, path, chunktargetbytes=65536)
        return (
            t.in_network.select(
                "billing_code",
                F.explode("negotiated_rates").alias("nr"),
            )
            .select(
                "billing_code",
                F.explode("nr.negotiated_prices").alias("price"),
            )
            .filter(F.col("price.negotiated_type") == "negotiated")
            .select(
                "billing_code",
                F.round(F.col("price.negotiated_rate") * 100)
                .cast("long")
                .alias("cents"),
            )
            .groupBy("billing_code")
            .agg(
                F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
                .cast("long")
                .alias("med_cents")
            )
        )

    a = med(fixture_path()).withColumnRenamed(
        "med_cents", "payer_a_median_cents"
    )
    b = med(fixture_b_path()).withColumnRenamed(
        "med_cents", "payer_b_median_cents"
    )
    return a.join(b, "billing_code").select(
        "billing_code",
        "payer_a_median_cents",
        "payer_b_median_cents",
        F.floor(
            F.col("payer_b_median_cents")
            * 10000.0
            / F.col("payer_a_median_cents")
        )
        .cast("long")
        .alias("b_over_a_bps"),
    )


# network-overlap fixtures: two independently-seeded payers whose provider
# groups draw TINs from the SAME 30-TIN pool, so the per-code TIN sets
# genuinely intersect (with the full ~9e8 TIN space two seeds never
# collide and every Jaccard is 0 — a degenerate oracle)
_OVL_TIN_POOL = [f"{20 + i % 70:02d}-{5000000 + i * 37:07d}" for i in range(30)]
_OVL_SEED_A = 11
_OVL_SEED_B = 13


def fixture_ovl_path(seed: int) -> str:
    import hashlib

    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    # the filename fingerprints every generation parameter (the big
    # fixture encodes m{bytes} the same way): editing _OVL_TIN_POOL later
    # must regenerate, not silently reuse a stale per-machine file
    pool_fp = hashlib.md5("|".join(_OVL_TIN_POOL).encode()).hexdigest()[:8]
    p = os.path.join(
        d, f"mrf_ovl_n{_N_ITEMS}_s{seed}_r40_p{pool_fp}.json"
    )
    if not os.path.exists(p):
        write_mrf_file(
            p,
            n_in_network=_N_ITEMS,
            n_provider_refs=40,
            seed=seed,
            tin_pool=_OVL_TIN_POOL,
        )
    return p


def _network_pairs_oracle(path: str) -> str:
    """DuckDB twin of the per-payer (billing_code, tin) distinct pair set
    (nested WITH — DuckDB allows a full statement as a CTE body)."""
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item FROM read_json('{path}')
        ),
        rr AS (
            SELECT item.billing_code AS bc,
                   unnest(item.negotiated_rates) AS r
            FROM items
        ),
        refs AS (
            SELECT bc, unnest(r.provider_references) AS ref FROM rr
        ),
        prs AS (
            SELECT unnest(provider_references) AS pr
            FROM read_json('{path}')
        ),
        groups AS (
            SELECT pr.provider_group_id AS gid,
                   unnest(pr.provider_groups) AS g
            FROM prs
        ),
        tins AS (SELECT gid, g.tin.value AS tin FROM groups)
        SELECT DISTINCT bc AS billing_code, tin
        FROM refs JOIN tins ON ref = gid
    """


def _network_overlap_oracle() -> str:
    return f"""
        WITH apairs AS ({_network_pairs_oracle(fixture_ovl_path(_OVL_SEED_A))}),
        bpairs AS ({_network_pairs_oracle(fixture_ovl_path(_OVL_SEED_B))}),
        merged AS (
            SELECT coalesce(a.billing_code, b.billing_code) AS billing_code,
                   CASE WHEN a.tin IS NOT NULL THEN 1 ELSE 0 END AS in_a,
                   CASE WHEN b.tin IS NOT NULL THEN 1 ELSE 0 END AS in_b
            FROM apairs a FULL JOIN bpairs b
              ON a.billing_code = b.billing_code AND a.tin = b.tin
        )
        SELECT billing_code,
               CAST(sum(in_a) AS BIGINT) AS n_tin_a,
               CAST(sum(in_b) AS BIGINT) AS n_tin_b,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_shared,
               CAST(sum(in_a * in_b) * 10000
                    // count(*) AS BIGINT) AS jaccard_bps
        FROM merged GROUP BY billing_code
    """


@query(
    "mrf_network_overlap",
    oracle=_network_overlap_oracle(),
    description="provider-network overlap between two payers per billing "
    "code — the network-adequacy question behind the CMS transparency "
    "mandate (do these payers negotiate with the SAME provider groups "
    "for this procedure?): distinct (billing_code, TIN) pairs per payer "
    "via the full chunker -> source -> silver chain on both files, then "
    "a full outer join on (code, TIN) reduced to per-code set sizes, "
    "shared count and exact-integer Jaccard in basis points (count(*) "
    "of the merged rows IS |union|). Oracled by independent DuckDB "
    "read_json twins on both fixtures. Plan: the (billing_code, "
    "provider_reference) edge is ONE double-explode pass over the parsed "
    "in_network branch — joining the codes/rates/par_providers silver "
    "tables instead would re-execute the corpus-sized JSON parse once "
    "per join side (they share the explode lineage, which Spark does "
    "not dedupe across joins) — and each payer's lineage reduces to "
    "distinct (code, tin) BEFORE the join, so the join moves one row "
    "per network membership, not per negotiated price; at national "
    "scale (every payer x every code) that is the "
    "partial-aggregate-then-join shape, keyed on (code, tin) so both "
    "sides co-locate in one shuffle",
)
def mrf_network_overlap(spark, sf_dir):
    def pairs(path):
        t = build_silver_cached(spark, path, chunktargetbytes=65536)
        refs = t.in_network.select(
            "billing_code",
            F.explode("negotiated_rates").alias("r"),
        ).select(
            "billing_code",
            F.explode("r.provider_references").alias(
                "provider_reference_id"
            ),
        )
        return (
            refs.join(
                t.providers_x_payer.select(
                    "provider_group_id",
                    F.col("tin.value").alias("tin"),
                ),
                F.col("provider_reference_id")
                == F.col("provider_group_id"),
            )
            .select("billing_code", "tin")
            .distinct()
        )
    a = pairs(fixture_ovl_path(_OVL_SEED_A))
    b = pairs(fixture_ovl_path(_OVL_SEED_B))
    merged = a.withColumn("in_a", F.lit(1)).join(
        b.withColumn("in_b", F.lit(1)),
        ["billing_code", "tin"],
        "full_outer",
    ).select(
        "billing_code",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    return merged.groupBy("billing_code").agg(
        F.sum("in_a").cast("long").alias("n_tin_a"),
        F.sum("in_b").cast("long").alias("n_tin_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_shared"),
        F.expr("sum(in_a * in_b) * 10000 div count(*)")
        .cast("long")
        .alias("jaccard_bps"),
    )


# ---------------------------------------------------------------------------
# Rate-outlier detection — the billing-integrity question on top of the
# dispersion views (mrf_rate_spread/mrf_rate_percentiles): which negotiated
# rates sit implausibly far from their procedure's typical price? Robust
# center/scale (median + MAD) instead of mean/stddev, so a single wild rate
# cannot mask itself by inflating the threshold. All statistics are exact
# integer cents via rank-based LOWER medians (the value at row_number
# (n+1)//2 of the sorted series) — deterministic on both engines with no
# percentile interpolation.
# ---------------------------------------------------------------------------


def _rate_outliers_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_path()}')
        ),
        rates AS (
            SELECT item.billing_code AS billing_code,
                   unnest(item.negotiated_rates) AS r
            FROM items
        ),
        pr AS (
            SELECT billing_code, unnest(r.negotiated_prices) AS p FROM rates
        ),
        c AS (
            SELECT billing_code,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
        ),
        ranked AS (
            SELECT billing_code, cents,
                   row_number() OVER (PARTITION BY billing_code
                                      ORDER BY cents) AS rn,
                   count(*) OVER (PARTITION BY billing_code) AS n
            FROM c
        ),
        med AS (
            SELECT billing_code, cents AS med_cents
            FROM ranked WHERE rn = (n + 1) // 2
        ),
        dev AS (
            SELECT c.billing_code, c.cents,
                   abs(c.cents - m.med_cents) AS d, m.med_cents
            FROM c JOIN med m USING (billing_code)
        ),
        dranked AS (
            SELECT billing_code, d,
                   row_number() OVER (PARTITION BY billing_code
                                      ORDER BY d) AS rn,
                   count(*) OVER (PARTITION BY billing_code) AS n
            FROM dev
        ),
        mad AS (
            SELECT billing_code, d AS mad_cents
            FROM dranked WHERE rn = (n + 1) // 2
        )
        SELECT dev.billing_code AS billing_code,
               CAST(count(*) AS BIGINT) AS n_prices,
               CAST(max(dev.med_cents) AS BIGINT) AS med_cents,
               CAST(max(mad.mad_cents) AS BIGINT) AS mad_cents,
               CAST(count(*) FILTER (dev.d > 3 * mad.mad_cents) AS BIGINT)
                   AS n_outliers,
               CAST(max(dev.d) AS BIGINT) AS max_abs_dev_cents
        FROM dev JOIN mad USING (billing_code)
        GROUP BY 1
    """


@query(
    "mrf_rate_outliers",
    oracle=_rate_outliers_oracle(),
    description="negotiated-rate outlier report per billing code: robust "
    "median + MAD in exact integer cents (rank-based lower medians — no "
    "percentile interpolation, so both engines pick the identical "
    "element), counting rates beyond 3 MAD — the billing-integrity "
    "screen a transparency dataset feeds. With MAD = 0 (a majority-"
    "constant price), ANY deviation flags, the conservative reading. "
    "Plan: the silver codes->prices lineage reduces to (code, cents) "
    "once, then two window passes and the final aggregate all share ONE "
    "hash partitioning on billing_code — three window/agg stages, one "
    "shuffle",
)
def mrf_rate_outliers(spark, sf_dir):
    from pyspark.sql import Window

    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = (
        t.codes.select("sk_in_network_id", "billing_code")
        .join(t.prices, "sk_in_network_id")
        .select(
            "billing_code",
            F.round(F.col("negotiated_rate") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    # r13: the med/mad relations used to be filter-then-join branches
    # whose subtrees replanned the earlier windows per join side; each
    # median instead attaches inline as a window MAX of the single
    # rank-selected value over the SAME billing_code partitioning (the
    # selected element is unique per partition, so max picks exactly the
    # old join value, ties in the sort included). One lineage, one
    # exchange, two sorts, zero joins.
    wcode = Window.partitionBy("billing_code")
    ranked = c.select(
        "billing_code",
        "cents",
        F.row_number().over(wcode.orderBy("cents")).alias("rn"),
        F.count("*").over(wcode).alias("n"),
    )
    dev = ranked.select(
        "billing_code",
        "cents",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents"))
        )
        .over(wcode)
        .alias("med_cents"),
    ).select(
        "billing_code",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("d"),
    )
    dranked = dev.select(
        "billing_code",
        "med_cents",
        "d",
        F.row_number().over(wcode.orderBy("d")).alias("rn"),
        F.count("*").over(wcode).alias("n"),
    )
    withmad = dranked.select(
        "billing_code",
        "med_cents",
        "d",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("d"))
        )
        .over(wcode)
        .alias("mad_cents"),
    )
    return withmad.groupBy("billing_code").agg(
        F.count("*").cast("long").alias("n_prices"),
        F.max("med_cents").cast("long").alias("med_cents"),
        F.max("mad_cents").cast("long").alias("mad_cents"),
        F.sum(
            F.when(F.col("d") > 3 * F.col("mad_cents"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.max("d").cast("long").alias("max_abs_dev_cents"),
    )


# ---------------------------------------------------------------------------
# Provider price positioning — the payer-side negotiation view: which
# provider groups sit systematically ABOVE their procedures' typical price?
# A negotiated_rates entry carries a LIST of provider groups and a LIST of
# prices; the relationship is a CROSS within the rate object (every linked
# group negotiates every listed price — the same semantics as the gold
# shoppable join), so links join par_providers x prices on the rate
# surrogate key. Every linked rate is compared against its billing code's
# robust median (same rank-based lower median as mrf_rate_outliers) and
# reported per provider group in exact integer units.
# ---------------------------------------------------------------------------


def _provider_position_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item,
                   generate_subscripts(in_network, 1) AS item_idx
            FROM read_json('{fixture_path()}')
        ),
        rates AS (
            SELECT item_idx, item.billing_code AS billing_code,
                   unnest(item.negotiated_rates) AS r,
                   generate_subscripts(item.negotiated_rates, 1) AS rate_idx
            FROM items
        ),
        refs AS (
            SELECT item_idx, rate_idx, billing_code,
                   unnest(r.provider_references) AS provider_reference_id
            FROM rates
        ),
        prices AS (
            SELECT item_idx, rate_idx, billing_code,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM (SELECT item_idx, rate_idx, billing_code,
                         unnest(r.negotiated_prices) AS p
                  FROM rates) x
            WHERE p.negotiated_type = 'negotiated'
        ),
        c AS (
            SELECT refs.provider_reference_id, prices.billing_code,
                   prices.cents
            FROM refs JOIN prices USING (item_idx, rate_idx)
        ),
        ranked AS (
            SELECT billing_code, cents,
                   row_number() OVER (PARTITION BY billing_code
                                      ORDER BY cents) AS rn,
                   count(*) OVER (PARTITION BY billing_code) AS n
            FROM prices
        ),
        med AS (
            SELECT billing_code, cents AS med_cents
            FROM ranked WHERE rn = (n + 1) // 2
        )
        SELECT c.provider_reference_id AS provider_reference_id,
               CAST(count(*) AS BIGINT) AS n_links,
               CAST(count(*) FILTER (c.cents > m.med_cents) AS BIGINT)
                   AS n_above_med,
               CAST(count(*) FILTER (c.cents > m.med_cents) * 10000
                    // count(*) AS BIGINT) AS above_share_bps
        FROM c JOIN med m USING (billing_code)
        GROUP BY 1
    """


@query(
    "mrf_provider_price_position",
    oracle=_provider_position_oracle(),
    description="provider price positioning: per provider group, the "
    "share of its linked negotiated rates sitting ABOVE the billing "
    "code's rank-based median, in exact basis points — the payer-side "
    "negotiation screen (which groups price systematically high across "
    "procedures?). Links are par_providers x prices on the rate "
    "surrogate key — the CROSS-within-rate-object semantics of the CMS "
    "schema, identical to the gold shoppable join. Plan: per-code "
    "medians reduce BEFORE the provider join (one row per code "
    "crosses), then one partial-agg groupBy on the provider id; the "
    "silver parse is shared via the session cache",
)
def mrf_provider_price_position(spark, sf_dir):
    from pyspark.sql import Window

    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    cents = F.round(F.col("negotiated_rate") * 100).cast("long")
    prices = t.prices.join(
        t.codes.select("sk_in_network_id", "billing_code"),
        "sk_in_network_id",
    ).select("sk_rate_id", "billing_code", cents.alias("cents"))
    c = t.par_providers.join(prices, "sk_rate_id").select(
        "provider_reference_id", "billing_code", "cents"
    )
    wcode = Window.partitionBy("billing_code")
    ranked = prices.select(
        "billing_code",
        "cents",
        F.row_number().over(wcode.orderBy("cents")).alias("rn"),
        F.count("*").over(wcode).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "billing_code", F.col("cents").alias("med_cents")
    )
    return (
        c.join(med, "billing_code")
        .groupBy("provider_reference_id")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.sum(
                F.when(F.col("cents") > F.col("med_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_above_med"),
            F.expr(
                "sum(CASE WHEN cents > med_cents THEN 1 ELSE 0 END) "
                "* 10000 div count(*)"
            )
            .cast("long")
            .alias("above_share_bps"),
        )
    )


# ---------------------------------------------------------------------------
# Professional vs institutional pricing gap — the site-of-service question
# (is the SAME procedure negotiated at a premium when billed by a facility
# vs a clinician?): per billing code with both billing classes present,
# the rank-based median cents per class and the gap in basis points of the
# institutional median. Same exact-integer lower-median discipline as
# mrf_rate_outliers, partitioned by (code, class).
# ---------------------------------------------------------------------------


def _class_gap_oracle() -> str:
    return f"""
        WITH pr AS (
            SELECT item.billing_code AS billing_code,
                   unnest(r.negotiated_prices) AS p
            FROM (SELECT unnest(item.negotiated_rates) AS r, item
                  FROM (SELECT unnest(in_network) AS item
                        FROM read_json('{fixture_path()}')) ) x
        ),
        c AS (
            SELECT billing_code, p.billing_class AS billing_class,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
        ),
        ranked AS (
            SELECT billing_code, billing_class, cents,
                   row_number() OVER (PARTITION BY billing_code,
                                      billing_class ORDER BY cents) AS rn,
                   count(*) OVER (PARTITION BY billing_code,
                                  billing_class) AS n
            FROM c
        ),
        med AS (
            SELECT billing_code, billing_class, cents AS med_cents,
                   n AS n_prices
            FROM ranked WHERE rn = (n + 1) // 2
        )
        SELECT p.billing_code AS billing_code,
               CAST(p.n_prices AS BIGINT) AS n_professional,
               CAST(i.n_prices AS BIGINT) AS n_institutional,
               CAST(p.med_cents AS BIGINT) AS prof_med_cents,
               CAST(i.med_cents AS BIGINT) AS inst_med_cents,
               CAST(floor(CAST((p.med_cents - i.med_cents) * 10000
                               AS DOUBLE) / i.med_cents)
                    AS BIGINT) AS gap_bps
        FROM (SELECT * FROM med WHERE billing_class = 'professional') p
        JOIN (SELECT * FROM med WHERE billing_class = 'institutional') i
          USING (billing_code)
    """


@query(
    "mrf_billing_class_gap",
    oracle=_class_gap_oracle(),
    description="professional vs institutional pricing gap per billing "
    "code — the site-of-service premium question: rank-based median "
    "cents per (code, class) in exact integers, codes carrying BOTH "
    "classes joined into a gap in basis points of the institutional "
    "median (negative = clinician billing cheaper). gap_bps floors a "
    "POSSIBLY-NEGATIVE quotient, where DuckDB's integer // truncates "
    "toward zero and Spark's floor does not — both sides therefore use "
    "the identical double-floor form. Plan: one (code, class) window pass over the shared "
    "silver parse, medians reduce to one row per (code, class) before "
    "the self-join on billing_code",
)
def mrf_billing_class_gap(spark, sf_dir):
    from pyspark.sql import Window

    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = t.prices.join(
        t.codes.select("sk_in_network_id", "billing_code"),
        "sk_in_network_id",
    ).select(
        "billing_code",
        "billing_class",
        F.round(F.col("negotiated_rate") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("billing_code", "billing_class")
    ranked = c.select(
        "billing_code",
        "billing_class",
        "cents",
        F.row_number().over(w.orderBy("cents")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "billing_code",
        "billing_class",
        F.col("cents").alias("med_cents"),
        F.col("n").alias("n_prices"),
    )
    prof = med.filter(F.col("billing_class") == "professional").select(
        "billing_code",
        F.col("n_prices").alias("n_professional"),
        F.col("med_cents").alias("prof_med_cents"),
    )
    inst = med.filter(F.col("billing_class") == "institutional").select(
        "billing_code",
        F.col("n_prices").alias("n_institutional"),
        F.col("med_cents").alias("inst_med_cents"),
    )
    return prof.join(inst, "billing_code").select(
        "billing_code",
        "n_professional",
        "n_institutional",
        "prof_med_cents",
        "inst_med_cents",
        F.floor(
            (F.col("prof_med_cents") - F.col("inst_med_cents"))
            * 10000.0
            / F.col("inst_med_cents")
        )
        .cast("long")
        .alias("gap_bps"),
    )


# ---------------------------------------------------------------------------
# Modifier mix — what do billing-code modifiers do to negotiated prices?
# Per modifier (NULL = unmodified base code): price count, distinct codes,
# and the rank-based median cents. Modifiers are the last pricing dimension
# in the price table (code, class, provider, modifier); auditors read this
# to spot modifiers that systematically re-price a procedure.
# ---------------------------------------------------------------------------


def _modifier_mix_oracle() -> str:
    return f"""
        WITH pr AS (
            SELECT item.billing_code AS billing_code,
                   unnest(r.negotiated_prices) AS p
            FROM (SELECT unnest(item.negotiated_rates) AS r, item
                  FROM (SELECT unnest(in_network) AS item
                        FROM read_json('{fixture_path()}')) ) x
        ),
        c AS (
            SELECT billing_code,
                   array_to_string(p.billing_code_modifier, '+') AS modifier,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
        ),
        ranked AS (
            SELECT modifier, cents,
                   row_number() OVER (PARTITION BY modifier
                                      ORDER BY cents) AS rn,
                   count(*) OVER (PARTITION BY modifier) AS n
            FROM c
        ),
        med AS (
            SELECT modifier, cents AS med_cents
            FROM ranked WHERE rn = (n + 1) // 2
        )
        SELECT c.modifier AS modifier,
               CAST(count(*) AS BIGINT) AS n_prices,
               CAST(count(DISTINCT c.billing_code) AS BIGINT) AS n_codes,
               CAST(max(m.med_cents) AS BIGINT) AS med_cents
        FROM c LEFT JOIN med m
          ON c.modifier IS NOT DISTINCT FROM m.modifier
        GROUP BY 1
    """


@query(
    "mrf_modifier_mix",
    oracle=_modifier_mix_oracle(),
    description="billing-code-modifier mix: per modifier (NULL = the "
    "unmodified base code), price count, distinct codes covered, and the "
    "rank-based median in exact integer cents — the audit view for "
    "modifiers that systematically re-price procedures. NULL-safe "
    "grouping via null-tolerant equality on the median join so the "
    "unmodified bucket groups identically on both engines. Plan: one "
    "window pass partitioned by modifier (a handful of partitions) over "
    "the shared silver parse, then one partial-agg groupBy",
)
def mrf_modifier_mix(spark, sf_dir):
    from pyspark.sql import Window

    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = t.prices.join(
        t.codes.select("sk_in_network_id", "billing_code"),
        "sk_in_network_id",
    ).select(
        "billing_code",
        # scalar output contract: the driver hash canonicalization takes
        # scalars only, so the modifier LIST becomes a '+'-joined string
        # (NULL array stays NULL = the unmodified base bucket)
        F.array_join("billing_code_modifier", "+").alias("modifier"),
        F.round(F.col("negotiated_rate") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("modifier")
    ranked = c.select(
        "modifier",
        "cents",
        F.row_number().over(w.orderBy("cents")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        F.col("modifier").alias("m_mod"), F.col("cents").alias("med_cents")
    )
    return (
        c.join(med, c["modifier"].eqNullSafe(med["m_mod"]), "left")
        .groupBy("modifier")
        .agg(
            F.count("*").cast("long").alias("n_prices"),
            F.count_distinct("billing_code").cast("long").alias("n_codes"),
            F.max("med_cents").cast("long").alias("med_cents"),
        )
    )


def _negotiation_type_mix_oracle() -> str:
    return f"""
        WITH pr AS (
            SELECT item.billing_code AS billing_code,
                   unnest(r.negotiated_prices) AS p
            FROM (SELECT unnest(item.negotiated_rates) AS r, item
                  FROM (SELECT unnest(in_network) AS item
                        FROM read_json('{fixture_path()}')) ) x
        )
        SELECT p.negotiated_type AS negotiated_type,
               p.billing_class AS billing_class,
               CAST(count(*) AS BIGINT) AS n_prices,
               CAST(count(DISTINCT billing_code) AS BIGINT) AS n_codes,
               CAST(min(CAST(round(p.negotiated_rate * 100) AS BIGINT))
                    AS BIGINT) AS min_cents,
               CAST(max(CAST(round(p.negotiated_rate * 100) AS BIGINT))
                    AS BIGINT) AS max_cents
        FROM pr GROUP BY 1, 2
    """


@query(
    "mrf_negotiation_type_mix",
    oracle=_negotiation_type_mix_oracle(),
    description="negotiation-type mix per billing class — the only gold "
    "query that reads the rows every other price query filters OUT "
    "(silver's prices table keeps negotiated_type = 'negotiated' per the "
    "reference demo, JsonMRFSource consumers drop derived/fee-schedule "
    "rows silently): price volume, code coverage, and the cents range "
    "per (negotiated_type, billing_class), the audit that shows how much "
    "of a payer's file is actually shoppable versus derived pricing. "
    "Explodes straight off the cached silver CODES relation (which "
    "retains the raw negotiated_rates array), one partial-agg groupBy — "
    "no window, no join",
)
def mrf_negotiation_type_mix(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = (
        t.codes.select(
            "billing_code", F.explode("negotiated_rates").alias("nr")
        )
        .select(
            "billing_code",
            F.explode("nr.negotiated_prices").alias("p"),
        )
        .select(
            "billing_code",
            F.col("p.negotiated_type").alias("negotiated_type"),
            F.col("p.billing_class").alias("billing_class"),
            F.round(F.col("p.negotiated_rate") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    return c.groupBy("negotiated_type", "billing_class").agg(
        F.count("*").cast("long").alias("n_prices"),
        F.count_distinct("billing_code").cast("long").alias("n_codes"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


def _service_code_rates_oracle() -> str:
    return f"""
        WITH pr AS (
            SELECT item.billing_code AS billing_code,
                   unnest(r.negotiated_prices) AS p
            FROM (SELECT unnest(item.negotiated_rates) AS r, item
                  FROM (SELECT unnest(in_network) AS item
                        FROM read_json('{fixture_path()}')) ) x
        ),
        c AS (
            SELECT billing_code,
                   unnest(p.service_code) AS service_code,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS cents
            FROM pr WHERE p.negotiated_type = 'negotiated'
        )
        SELECT service_code,
               CAST(count(*) AS BIGINT) AS n_prices,
               CAST(count(DISTINCT billing_code) AS BIGINT) AS n_codes,
               CAST(min(cents) AS BIGINT) AS min_cents,
               CAST(max(cents) AS BIGINT) AS max_cents
        FROM c GROUP BY 1
    """


@query(
    "mrf_service_code_rates",
    oracle=_service_code_rates_oracle(),
    description="site-of-service rate profile: negotiated prices exploded "
    "by CMS place-of-service code (prices without a service_code list "
    "drop on both engines: Spark's explode and DuckDB's unnest both emit "
    "zero rows for NULL arrays), with price volume, code coverage, and "
    "the exact-cents range per site — where a procedure's price varies "
    "by setting, this is the view that shows it, complementing "
    "mrf_billing_class_gap's two-bucket professional/institutional "
    "split. One explode over the shared silver parse and one partial-agg "
    "groupBy on a low-cardinality key",
)
def mrf_service_code_rates(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    c = t.prices.join(
        t.codes.select("sk_in_network_id", "billing_code"),
        "sk_in_network_id",
    ).select(
        "billing_code",
        F.explode("service_code").alias("service_code"),
        F.round(F.col("negotiated_rate") * 100).cast("long").alias("cents"),
    )
    return c.groupBy("service_code").agg(
        F.count("*").cast("long").alias("n_prices"),
        F.count_distinct("billing_code").cast("long").alias("n_codes"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


def _provider_network_size_oracle() -> str:
    return f"""
        WITH src AS (SELECT * FROM read_json('{fixture_path()}')),
        links AS (
            SELECT unnest(r.provider_references) AS pgid,
                   item.billing_code AS billing_code
            FROM (SELECT unnest(item.negotiated_rates) AS r, item
                  FROM (SELECT unnest(in_network) AS item FROM src)) x
        ),
        net AS (
            SELECT pgid,
                   CAST(count(DISTINCT billing_code) AS BIGINT) AS n_codes,
                   CAST(count(*) AS BIGINT) AS n_rate_links
            FROM links GROUP BY 1
        ),
        prov AS (
            SELECT pgid,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(count(DISTINCT g.tin.value) AS BIGINT) AS n_tins
            FROM (
                SELECT pr.provider_group_id AS pgid,
                       unnest(pr.provider_groups) AS g
                FROM (SELECT unnest(provider_references) AS pr FROM src)
            ) GROUP BY 1
        )
        SELECT prov.pgid AS provider_group_id,
               n_groups, n_tins, n_codes, n_rate_links
        FROM prov JOIN net USING (pgid)
    """


@query(
    "mrf_provider_network_size",
    oracle=_provider_network_size_oracle(),
    description="directory-adequacy screen: per provider group, how wide "
    "is the negotiated network — distinct billing codes reachable "
    "through its rate links, total rate links, practice rows, and "
    "distinct TINs. The question a regulator (or a plan shopping for a "
    "network) asks of an MRF: does this practice actually have "
    "negotiated prices across the code book, or is it in-name-only? "
    "Plan: both sides reduce BEFORE the join — the code side aggregates "
    "the par_providers->rates->codes link chain (all derived from the "
    "one cached in_network parse) down to one row per group id, the "
    "provider side aggregates the exploded groups likewise, and the "
    "final join moves one row per provider group, never per rate. At "
    "national scale this is the partial-agg-then-join shape: the rate "
    "fact is the only big relation and it is touched exactly once",
)
def mrf_provider_network_size(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    links = t.par_providers.join(
        t.rates.select("sk_rate_id", "sk_in_network_id"), "sk_rate_id"
    ).join(
        t.codes.select("sk_in_network_id", "billing_code"),
        "sk_in_network_id",
    )
    net = links.groupBy("provider_reference_id").agg(
        F.count_distinct("billing_code").cast("long").alias("n_codes"),
        F.count("*").cast("long").alias("n_rate_links"),
    )
    prov = t.providers_x_payer.groupBy("provider_group_id").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.count_distinct(F.col("tin.value")).cast("long").alias("n_tins"),
    )
    return prov.join(
        net,
        prov.provider_group_id == net.provider_reference_id,
    ).select(
        "provider_group_id", "n_groups", "n_tins", "n_codes", "n_rate_links"
    )


def _tin_rate_lookup_oracle() -> str:
    # Same CTE scaffolding as the gold shoppable twin, but parameterized
    # by TIN alone: params reuses the gold query's deterministic
    # lexicographic-minimum (billing_code, tin_value) pick and keeps only
    # the tin — the practice whose whole negotiated code book the widget
    # lists.
    return f"""
        WITH src AS (SELECT * FROM read_json('{fixture_path()}')),
        items AS (
            SELECT unnest(in_network) AS item,
                   generate_subscripts(in_network, 1) AS item_pos
            FROM src
        ),
        rates AS (
            SELECT item, item_pos,
                   unnest(item.negotiated_rates) AS r,
                   generate_subscripts(item.negotiated_rates, 1) AS rate_pos
            FROM items
        ),
        par AS (
            SELECT item_pos, rate_pos,
                   unnest(r.provider_references) AS pref
            FROM rates
        ),
        prices AS (
            SELECT item, item_pos, rate_pos,
                   unnest(r.negotiated_prices) AS p
            FROM rates
        ),
        pxp AS (
            SELECT pr.provider_group_id AS pgid,
                   unnest(pr.provider_groups) AS g
            FROM (SELECT unnest(provider_references) AS pr FROM src)
        ),
        params AS (
            SELECT prices.item.billing_code AS bc, g.tin.value AS tv
            FROM par
            JOIN prices USING (item_pos, rate_pos)
            JOIN pxp ON par.pref = pxp.pgid
            WHERE p.negotiated_type = 'negotiated'
            ORDER BY 1, 2 LIMIT 1
        )
        SELECT prices.item.billing_code AS billing_code,
               prices.item.description AS description,
               p.billing_class AS billing_class,
               to_json(p.service_code) AS service_code,
               p.negotiated_rate AS negotiated_rate,
               to_json(g.npi) AS npi,
               pxp.pgid AS provider_group_id
        FROM par
        JOIN prices USING (item_pos, rate_pos)
        JOIN pxp ON par.pref = pxp.pgid
        CROSS JOIN params
        WHERE p.negotiated_type = 'negotiated'
          AND prices.item.negotiation_arrangement = 'ffs'
          AND g.tin.value = params.tv
    """


@query(
    "mrf_tin_rate_lookup",
    oracle=_tin_rate_lookup_oracle(),
    description="the reference demo's second widget parameter "
    "(01_payer_mrf_demo.py:229-238 creates BOTH billing_code and "
    "tin_value widgets): everything one practice negotiated — all "
    "billing codes, settings and rates for a fixed tin.value, the "
    "provider-side dual of the code-parameterized shoppable query. "
    "Plan: the TIN predicate reduces the provider dim to a handful of "
    "rows, which broadcast into the par_providers->prices->codes fact "
    "chain (one pass over the cached parse); no code predicate exists, "
    "so the fact IS scanned once — the broadcast keeps that scan "
    "shuffle-free, which is the shape that survives a payer file where "
    "one TIN appears in millions of rate rows. Parameter discovery "
    "reuses the gold query's memoized deterministic pick",
)
def mrf_tin_rate_lookup(spark, sf_dir):
    p = fixture_path()
    t = build_silver_cached(spark, p, chunktargetbytes=65536)
    _, tin_value = _shoppable_params(t, p)
    prov = (
        t.providers_x_payer.filter(F.col("tin.value") == tin_value)
        .select("provider_group_id", "npi")
    )
    fact = (
        t.par_providers.join(t.prices, "sk_rate_id")
        .join(
            t.codes.filter(
                F.col("negotiation_arrangement") == "ffs"
            ).select("sk_in_network_id", "billing_code", "description"),
            "sk_in_network_id",
        )
    )
    return fact.join(
        F.broadcast(prov),
        F.col("provider_reference_id") == F.col("provider_group_id"),
    ).select(
        "billing_code",
        "description",
        "billing_class",
        F.to_json("service_code").alias("service_code"),
        "negotiated_rate",
        F.to_json("npi").alias("npi"),
        "provider_group_id",
    )


def _npi_coverage_oracle() -> str:
    return f"""
        WITH src AS (SELECT * FROM read_json('{fixture_path()}')),
        links AS (
            SELECT DISTINCT billing_code, pgid FROM (
                SELECT item.billing_code AS billing_code,
                       unnest(r.provider_references) AS pgid
                FROM (SELECT unnest(item.negotiated_rates) AS r, item
                      FROM (SELECT unnest(in_network) AS item FROM src)) x
            )
        ),
        npis AS (
            SELECT pgid, unnest(g.npi) AS npi FROM (
                SELECT pr.provider_group_id AS pgid,
                       unnest(pr.provider_groups) AS g
                FROM (SELECT unnest(provider_references) AS pr FROM src)
            )
        )
        SELECT billing_code,
               CAST(count(DISTINCT npi) AS BIGINT) AS n_npis,
               CAST(count(DISTINCT l.pgid) AS BIGINT) AS n_groups
        FROM links l JOIN npis USING (pgid)
        GROUP BY 1
    """


@query(
    "mrf_npi_coverage",
    oracle=_npi_coverage_oracle(),
    description="per-code provider coverage — the consumer-side dual of "
    "mrf_provider_network_size's per-group screen: for every billing "
    "code, how many distinct individual providers (NPIs) and provider "
    "groups actually have a negotiated rate. The access question behind "
    "network-adequacy review: a code priced by two NPIs in the file is "
    "a procedure members cannot realistically shop. Plan: the "
    "rate->group link chain is DISTINCT-reduced to (billing_code, "
    "group) BEFORE the NPI dim joins (the audited "
    "mrf_network_overlap shape — the join fans out per NPI, so feeding "
    "it per-rate duplicates would multiply rows for nothing), then one "
    "partial-agg distinct count per code",
)
def mrf_npi_coverage(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    links = (
        t.par_providers.join(
            t.rates.select("sk_rate_id", "sk_in_network_id"), "sk_rate_id"
        )
        .join(
            t.codes.select("sk_in_network_id", "billing_code"),
            "sk_in_network_id",
        )
        .select(
            "billing_code",
            F.col("provider_reference_id").alias("pgid"),
        )
        .dropDuplicates(["billing_code", "pgid"])
    )
    npis = t.providers_x_payer.select(
        F.col("provider_group_id").alias("pgid"),
        F.explode("npi").alias("npi"),
    )
    return links.join(npis, "pgid").groupBy("billing_code").agg(
        F.count_distinct("npi").cast("long").alias("n_npis"),
        F.count_distinct("pgid").cast("long").alias("n_groups"),
    )


# ---------------------------------------------------------------------------
# capitation / bundle arrangements (r13): the two remaining CMS in-network
# schemas the silver layer parses (plans/schemas.py covered_services /
# bundled_codes; reference test corpus:
# src/test/resources/in-network-rates-capitation-single-plan-sample.json and
# in-network-rates-bundle-single-plan-sample.json) but no gold query had
# exercised. A mixed-arrangement fixture feeds both.
# ---------------------------------------------------------------------------

_MIX_N_ITEMS = 120
_MIX_SEED = 11
_MIX = {"capitation": 0.3, "bundle": 0.3}


def fixture_mixed_path() -> str:
    """Synthetic MRF with ffs + capitation + bundle in_network items;
    bundle/capitation component codes draw from the file's own item code
    space so the expansion join resolves."""
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"mrf_mixed_n{_MIX_N_ITEMS}_s{_MIX_SEED}.json")
    if not os.path.exists(p):
        write_mrf_file(
            p,
            n_in_network=_MIX_N_ITEMS,
            n_provider_refs=20,
            seed=_MIX_SEED,
            arrangement_mix=_MIX,
        )
    return p


def _price_cents_array() -> F.Column:
    """Per-item array of negotiated prices in exact integer cents,
     'negotiated' type only — flatten/filter/transform higher-order
    functions, so per-item rate statistics never need an explode."""
    return F.transform(
        F.filter(
            F.flatten(F.col("negotiated_rates.negotiated_prices")),
            lambda p: p["negotiated_type"] == F.lit("negotiated"),
        ),
        lambda p: F.round(p["negotiated_rate"] * 100).cast("long"),
    )


_DUCK_CENTS = (
    "list_transform(list_filter("
    "flatten(list_transform(item.negotiated_rates, "
    "r -> r.negotiated_prices)), "
    "p -> p.negotiated_type = 'negotiated'), "
    "p -> CAST(round(p.negotiated_rate * 100) AS BIGINT))"
)


def _capitation_profile_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_mixed_path()}')
        ),
        cap AS (
            SELECT item.billing_code AS billing_code,
                   CAST(len(item.covered_services) AS BIGINT) AS ncs,
                   {_DUCK_CENTS} AS cents
            FROM items
            WHERE item.negotiation_arrangement = 'capitation'
        )
        SELECT billing_code,
               CAST(sum(ncs) AS BIGINT) AS n_covered_services,
               CAST(sum(len(cents)) AS BIGINT) AS n_prices,
               CAST(min(list_min(cents)) AS BIGINT) AS min_cents,
               CAST(max(list_max(cents)) AS BIGINT) AS max_cents
        FROM cap GROUP BY 1
    """


@query(
    "mrf_capitation_profile",
    oracle=_capitation_profile_oracle(),
    description="capitation-arrangement rate profile — the CMS schema "
    "where one negotiated rate covers a SERVICE LIST (covered_services) "
    "rather than a single procedure: per capitation billing code, how "
    "many services the rate covers and the negotiated per-member rate "
    "range in exact integer cents, through the full chunker -> source "
    "-> silver chain on a mixed-arrangement fixture, oracled by an "
    "independent DuckDB read_json. Plan: the arrangement filter prunes "
    "the in_network scan FIRST, and covered-service counts + rate "
    "min/max come from size/flatten/filter/transform higher-order "
    "functions on the nested arrays — zero explodes, zero joins, one "
    "partial-agg groupBy over only the capitation items",
)
def mrf_capitation_profile(spark, sf_dir):
    t = build_silver_cached(
        spark, fixture_mixed_path(), chunktargetbytes=65536
    )
    cap = t.in_network.filter(
        F.col("negotiation_arrangement") == "capitation"
    ).select(
        "billing_code",
        F.size("covered_services").cast("long").alias("ncs"),
        _price_cents_array().alias("cents"),
    )
    return cap.groupBy("billing_code").agg(
        F.sum("ncs").cast("long").alias("n_covered_services"),
        F.sum(F.size("cents")).cast("long").alias("n_prices"),
        F.min(F.array_min("cents")).cast("long").alias("min_cents"),
        F.max(F.array_max("cents")).cast("long").alias("max_cents"),
    )


def _bundle_expansion_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_mixed_path()}')
        ),
        mins AS (
            SELECT billing_code, min(item_min) AS ffs_min_cents
            FROM (
                SELECT item.billing_code AS billing_code,
                       list_min({_DUCK_CENTS}) AS item_min
                FROM items
                WHERE item.negotiation_arrangement = 'ffs'
            ) GROUP BY 1
        ),
        bund AS (
            SELECT bundle_code, bundle_item_min,
                   comp.billing_code AS component_code
            FROM (
                SELECT item.billing_code AS bundle_code,
                       list_min({_DUCK_CENTS}) AS bundle_item_min,
                       unnest(item.bundled_codes) AS comp
                FROM items
                WHERE item.negotiation_arrangement = 'bundle'
            )
        )
        SELECT bundle_code,
               CAST(count(*) AS BIGINT) AS n_components,
               CAST(count(m.ffs_min_cents) AS BIGINT) AS n_resolved,
               CAST(min(bundle_item_min) AS BIGINT) AS bundle_min_cents,
               CAST(sum(m.ffs_min_cents) AS BIGINT)
                   AS sum_component_min_cents
        FROM bund b LEFT JOIN mins m ON b.component_code = m.billing_code
        GROUP BY 1
    """


@query(
    "mrf_bundle_expansion",
    oracle=_bundle_expansion_oracle(),
    description="bundled-codes expansion join — the CMS bundle "
    "arrangement prices a package (e.g. a total knee replacement) whose "
    "bundled_codes list the component procedures: expand each bundle "
    "into its components, resolve every component against the file's "
    "own fee-for-service items, and compare the bundle's minimum "
    "negotiated rate with the SUM of the components' minimum ffs rates "
    "— the is-the-bundle-a-discount question bundles exist to answer. "
    "Exact integer cents; unresolved components stay counted "
    "(n_components vs n_resolved) instead of silently dropping. Plan: "
    "both join inputs aggregate FIRST (per-ffs-code min via "
    "higher-order functions + one partial-agg groupBy; bundles explode "
    "only their bounded bundled_codes arrays), so the equi-join carries "
    "two code-keyed aggregates, never raw price rows",
)
def mrf_bundle_expansion(spark, sf_dir):
    t = build_silver_cached(
        spark, fixture_mixed_path(), chunktargetbytes=65536
    )
    inn = t.in_network
    mins = (
        inn.filter(F.col("negotiation_arrangement") == "ffs")
        .select(
            "billing_code",
            F.array_min(_price_cents_array()).alias("item_min"),
        )
        .groupBy("billing_code")
        .agg(F.min("item_min").alias("ffs_min_cents"))
    )
    bundles = (
        inn.filter(F.col("negotiation_arrangement") == "bundle")
        .select(
            F.col("billing_code").alias("bundle_code"),
            F.array_min(_price_cents_array()).alias("bundle_item_min"),
            F.explode("bundled_codes").alias("comp"),
        )
        .select(
            "bundle_code",
            "bundle_item_min",
            F.col("comp.billing_code").alias("component_code"),
        )
    )
    joined = bundles.join(
        mins,
        bundles.component_code == mins.billing_code,
        "left",
    )
    return joined.groupBy("bundle_code").agg(
        F.count("*").cast("long").alias("n_components"),
        F.count("ffs_min_cents").cast("long").alias("n_resolved"),
        F.min("bundle_item_min").cast("long").alias("bundle_min_cents"),
        F.sum("ffs_min_cents").cast("long").alias("sum_component_min_cents"),
    )


# ---------------------------------------------------------------------------
# allowed-amounts (out-of-network) gold (r13): the second CMS
# Transparency-in-Coverage file type. The reference stops at
# in-network-rates files; the chunker/source are agnostic over top-level
# array names, so the same engine streams out_of_network chunks — only
# the silver from_json schema differs (plans/silver.py build_oon_silver).
# ---------------------------------------------------------------------------

_OON_N_ITEMS = 80
_OON_SEED = 7

_OON_CACHE: dict[tuple, "object"] = {}
_OON_CACHE_MAX = 2


def fixture_oon_path() -> str:
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"mrf_oon_n{_OON_N_ITEMS}_s{_OON_SEED}.json")
    if not os.path.exists(p):
        write_allowed_amounts_file(
            p, n_out_of_network=_OON_N_ITEMS, seed=_OON_SEED
        )
    return p


def _unpersist_oon(t) -> None:
    try:
        t.out_of_network.unpersist()
    except Exception:
        pass


def build_oon_silver_cached(spark, path: str, **options):
    """Session cache of parsed allowed-amounts silver, mirroring
    build_silver_cached (persist the parsed out_of_network branch once;
    payments derive from it)."""
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _OON_CACHE if k[0] != app_id]:
        _unpersist_oon(_OON_CACHE.pop(k))
    key = (app_id, path, tuple(sorted(options.items())))
    t = _OON_CACHE.get(key)
    if t is None:
        while len(_OON_CACHE) >= _OON_CACHE_MAX:
            _unpersist_oon(_OON_CACHE.pop(next(iter(_OON_CACHE))))
        t = build_oon_silver(spark, path, **options)
        t.out_of_network.persist()
        _OON_CACHE[key] = t
    else:
        repersist_if_cleared(t.out_of_network)
    return t


def clear_oon_silver_cache() -> None:
    while _OON_CACHE:
        _unpersist_oon(_OON_CACHE.popitem()[1])


def _oon_allowed_vs_billed_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(out_of_network) AS item
            FROM read_json('{fixture_oon_path()}')
        ),
        aa AS (
            SELECT item.billing_code AS billing_code,
                   unnest(item.allowed_amounts) AS a
            FROM items
        ),
        pay AS (
            SELECT billing_code,
                   CAST(round(p.allowed_amount * 100) AS BIGINT)
                       AS allowed_cents,
                   unnest(p.providers) AS pr
            FROM (SELECT billing_code, unnest(a.payments) AS p FROM aa)
        ),
        prov AS (
            SELECT billing_code, allowed_cents,
                   CAST(round(pr.billed_charge * 100) AS BIGINT)
                       AS billed_cents
            FROM pay
        )
        SELECT billing_code,
               CAST(count(*) AS BIGINT) AS n_billed,
               min(allowed_cents) AS min_allowed_cents,
               max(allowed_cents) AS max_allowed_cents,
               CAST(sum(billed_cents) AS BIGINT) AS sum_billed_cents,
               CAST(sum(allowed_cents) AS BIGINT) AS sum_allowed_cents,
               CAST(sum(billed_cents) * 10000 // sum(allowed_cents)
                    AS BIGINT) AS markup_bps
        FROM prov GROUP BY 1
    """


@query(
    "mrf_oon_allowed_vs_billed",
    oracle=_oon_allowed_vs_billed_oracle(),
    description="allowed-amounts file, billed-vs-allowed gap — the "
    "balance-billing question the CMS out-of-network file type exists "
    "to expose: per billing code, how much providers BILLED vs what the "
    "plan actually ALLOWED, in exact integer cents with the aggregate "
    "markup in basis points (positive-only integer division, engine-"
    "exact). Runs the full chunker -> source -> silver chain over an "
    "out_of_network top-level array — proving the bronze engine is "
    "schema-agnostic beyond the reference's in-network files — and is "
    "oracled by an independent DuckDB read_json. Plan: one exploded "
    "payment lineage, one partial-agg groupBy on billing_code, no joins",
)
def mrf_oon_allowed_vs_billed(spark, sf_dir):
    t = build_oon_silver_cached(
        spark, fixture_oon_path(), chunktargetbytes=65536
    )
    p = t.payments.select(
        "billing_code",
        F.round(F.col("allowed_amount") * 100).cast("long").alias("ac"),
        F.round(F.col("billed_charge") * 100).cast("long").alias("bc"),
    )
    return (
        p.groupBy("billing_code")
        .agg(
            F.count("*").cast("long").alias("n_billed"),
            F.min("ac").alias("min_allowed_cents"),
            F.max("ac").alias("max_allowed_cents"),
            F.sum("bc").cast("long").alias("sum_billed_cents"),
            F.sum("ac").cast("long").alias("sum_allowed_cents"),
        )
        .withColumn(
            "markup_bps",
            F.expr(
                "CAST(sum_billed_cents * 10000 DIV sum_allowed_cents"
                " AS LONG)"
            ),
        )
    )


def _oon_tin_profile_oracle() -> str:
    return f"""
        WITH items AS (
            SELECT unnest(out_of_network) AS item
            FROM read_json('{fixture_oon_path()}')
        ),
        aa AS (
            SELECT item.billing_code AS billing_code,
                   unnest(item.allowed_amounts) AS a
            FROM items
        ),
        pay AS (
            SELECT billing_code, a.tin.value AS tin_value,
                   CAST(round(p.allowed_amount * 100) AS BIGINT)
                       AS allowed_cents,
                   unnest(p.providers) AS pr
            FROM (SELECT billing_code, a, unnest(a.payments) AS p FROM aa)
        ),
        npis AS (
            SELECT billing_code, tin_value, allowed_cents,
                   unnest(pr.npi) AS npi
            FROM pay
        )
        SELECT tin_value,
               CAST(count(DISTINCT billing_code) AS BIGINT) AS n_codes,
               CAST(count(DISTINCT npi) AS BIGINT) AS n_npis,
               min(allowed_cents) AS min_allowed_cents,
               max(allowed_cents) AS max_allowed_cents
        FROM npis GROUP BY 1
    """


@query(
    "mrf_oon_tin_profile",
    oracle=_oon_tin_profile_oracle(),
    description="allowed-amounts provider-directory rollup: per TIN, how "
    "many distinct billing codes it billed out-of-network, how many "
    "distinct rendering NPIs sit behind it, and the allowed-amount "
    "range in exact integer cents — the payer-side view of which "
    "out-of-network groups drive claims. Plan: one exploded lineage "
    "(the bounded npi array fan-out), distinct counts as one "
    "partial-agg groupBy per tin, no joins; min/max are duplication-"
    "invariant so the npi explode cannot skew them",
)
def mrf_oon_tin_profile(spark, sf_dir):
    t = build_oon_silver_cached(
        spark, fixture_oon_path(), chunktargetbytes=65536
    )
    p = t.payments.select(
        "billing_code",
        F.col("tin.value").alias("tin_value"),
        F.round(F.col("allowed_amount") * 100).cast("long").alias("ac"),
        F.explode("npi").alias("npi"),
    )
    return p.groupBy("tin_value").agg(
        F.count_distinct("billing_code").cast("long").alias("n_codes"),
        F.count_distinct("npi").cast("long").alias("n_npis"),
        F.min("ac").alias("min_allowed_cents"),
        F.max("ac").alias("max_allowed_cents"),
    )


# ---------------------------------------------------------------------------
# table-of-contents index files (r13): the CMS discovery format — which
# in-network / allowed-amounts files exist per reporting plan group. Real
# payer TOCs run to hundreds of MB, so reporting_structure streams
# through the same splitter; gold is the ingest-scheduler manifest.
# ---------------------------------------------------------------------------

_TOC_N = 40
_TOC_SEED = 5


def fixture_toc_path() -> str:
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"mrf_toc_n{_TOC_N}_s{_TOC_SEED}.json")
    if not os.path.exists(p):
        write_toc_file(p, n_structures=_TOC_N, seed=_TOC_SEED)
    return p


def _toc_manifest_oracle() -> str:
    return f"""
        WITH s AS (
            SELECT unnest(reporting_structure) AS r
            FROM read_json('{fixture_toc_path()}')
        ),
        sf AS (
            SELECT r.reporting_plans AS plans,
                   list_concat(
                       list_transform(
                           r.in_network_files,
                           fl -> {{'file_kind': 'in_network',
                                   'location': fl.location}}),
                       CASE WHEN r.allowed_amount_file IS NULL
                            THEN []
                            ELSE [{{'file_kind': 'allowed_amounts',
                                    'location':
                                        r.allowed_amount_file.location}}]
                       END
                   ) AS files
            FROM s
        ),
        p1 AS (SELECT unnest(plans) AS p, files FROM sf),
        p2 AS (SELECT p, unnest(files) AS f FROM p1)
        SELECT p.plan_market_type AS plan_market_type,
               f.file_kind AS file_kind,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT p.plan_id) AS BIGINT) AS n_plans,
               CAST(count(DISTINCT f.location) AS BIGINT) AS n_files
        FROM p2 GROUP BY 1, 2
    """


@query(
    "mrf_toc_manifest",
    oracle=_toc_manifest_oracle(),
    description="table-of-contents ingest manifest — the CMS discovery "
    "file type that maps each reporting plan group to its in-network "
    "file URLs and allowed-amounts file URL (real payer TOCs run to "
    "hundreds of MB, so reporting_structure streams through the same "
    "chunker as the data files — the third top-level-array schema this "
    "one engine ingests): per (plan_market_type, file_kind), how many "
    "plan-file ingest pairs, distinct plans, and distinct file URLs the "
    "scheduler would fan over. Plan: join-free — the plan-x-file cross "
    "product happens WITHIN each structure row (two sequential explodes "
    "on one lineage, the file list carried alongside the plan explode), "
    "then one partial-agg distinct-count groupBy; the TOC JSON is "
    "parsed exactly once",
)
def mrf_toc_manifest(spark, sf_dir):
    t = build_toc_silver(
        spark,
        fixture_toc_path(),
        chunktargetbytes=65536,
        headerkey=HEADER_KEY_REPORTING_STRUCTURE,
    )
    return t.file_manifest.groupBy("plan_market_type", "file_kind").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.count_distinct("plan_id").cast("long").alias("n_plans"),
        F.count_distinct("location").cast("long").alias("n_files"),
    )


def _toc_shared_files_oracle() -> str:
    return f"""
        WITH s AS (
            SELECT unnest(reporting_structure) AS r
            FROM read_json('{fixture_toc_path()}')
        ),
        sf AS (
            SELECT r.reporting_plans AS plans,
                   list_concat(
                       list_transform(
                           r.in_network_files,
                           fl -> {{'file_kind': 'in_network',
                                   'location': fl.location}}),
                       CASE WHEN r.allowed_amount_file IS NULL
                            THEN []
                            ELSE [{{'file_kind': 'allowed_amounts',
                                    'location':
                                        r.allowed_amount_file.location}}]
                       END
                   ) AS files
            FROM s
        ),
        p1 AS (SELECT unnest(plans) AS p, files FROM sf),
        p2 AS (SELECT p, unnest(files) AS f FROM p1),
        per_file AS (
            SELECT f.file_kind AS file_kind, f.location AS location,
                   count(*) AS n_pairs,
                   count(DISTINCT p.plan_id) AS n_plans
            FROM p2 GROUP BY 1, 2
        )
        SELECT file_kind,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN n_plans >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared_files,
               CAST(max(n_plans) AS BIGINT) AS max_plans_per_file,
               CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
               CAST(sum(n_pairs) - count(*) AS BIGINT) AS fetches_saved
        FROM per_file GROUP BY 1
    """


@query(
    "mrf_toc_shared_files",
    oracle=_toc_shared_files_oracle(),
    description="table-of-contents file-sharing rollup — the first thing "
    "an ingest scheduler computes from a real payer TOC: the same data "
    "file URL is referenced by many reporting plans, so fetching per "
    "(plan, file) pair instead of per distinct URL multiplies ingest "
    "cost. Per file_kind: distinct file URLs, how many are shared by "
    ">=2 plans, the max fan-in, total plan-file pairs, and the fetches "
    "saved by URL-deduplicating the work list. Plan: two-level "
    "partial-agg rollup (location grain, then file_kind grain) over the "
    "join-free manifest lineage — the per-URL distinct-plan count never "
    "leaves its location-keyed partition",
)
def mrf_toc_shared_files(spark, sf_dir):
    t = build_toc_silver(
        spark,
        fixture_toc_path(),
        chunktargetbytes=65536,
        headerkey=HEADER_KEY_REPORTING_STRUCTURE,
    )
    per_file = t.file_manifest.groupBy("file_kind", "location").agg(
        F.count("*").alias("np"),
        F.count_distinct("plan_id").alias("npl"),
    )
    return per_file.groupBy("file_kind").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.when(F.col("npl") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_files"),
        F.max("npl").cast("long").alias("max_plans_per_file"),
        F.sum("np").cast("long").alias("n_pairs"),
        (F.sum("np") - F.count("*")).cast("long").alias("fetches_saved"),
    )


# ---------------------------------------------------------------------------
# cross-file-type benchmark (r13): the analytical payoff of ingesting
# BOTH CMS data formats into one engine — negotiated in-network rates
# vs out-of-network allowed amounts for the same billing codes.
# ---------------------------------------------------------------------------


def _inn_vs_oon_oracle() -> str:
    return f"""
        WITH inn AS (
            SELECT item.billing_code AS billing_code,
                   CAST(round(p.negotiated_rate * 100) AS BIGINT) AS nc
            FROM (
                SELECT unnest(in_network) AS item
                FROM read_json('{fixture_path()}')
            ),
            LATERAL (SELECT unnest(item.negotiated_rates) AS r),
            LATERAL (SELECT unnest(r.negotiated_prices) AS p)
            WHERE p.negotiated_type = 'negotiated'
        ),
        inn_agg AS (
            SELECT billing_code,
                   count(*) AS n_negotiated,
                   sum(nc) AS sum_negotiated_cents,
                   min(nc) AS min_negotiated_cents
            FROM inn GROUP BY 1
        ),
        oon AS (
            SELECT billing_code,
                   allowed_cents,
                   unnest(p.providers) AS pr
            FROM (
                SELECT item.billing_code AS billing_code,
                       CAST(round(p.allowed_amount * 100) AS BIGINT)
                           AS allowed_cents,
                       p
                FROM (
                    SELECT unnest(out_of_network) AS item
                    FROM read_json('{fixture_oon_path()}')
                ),
                LATERAL (SELECT unnest(item.allowed_amounts) AS a),
                LATERAL (SELECT unnest(a.payments) AS p)
            )
        ),
        oon_agg AS (
            SELECT billing_code,
                   count(*) AS n_allowed,
                   sum(allowed_cents) AS sum_allowed_cents
            FROM oon GROUP BY 1
        )
        SELECT i.billing_code AS billing_code,
               CAST(i.n_negotiated AS BIGINT) AS n_negotiated,
               CAST(i.sum_negotiated_cents AS BIGINT)
                   AS sum_negotiated_cents,
               CAST(i.min_negotiated_cents AS BIGINT)
                   AS min_negotiated_cents,
               CAST(o.n_allowed AS BIGINT) AS n_allowed,
               CAST(o.sum_allowed_cents AS BIGINT) AS sum_allowed_cents,
               CAST(i.sum_negotiated_cents * o.n_allowed * 10000
                    // (i.n_negotiated * o.sum_allowed_cents)
                    AS BIGINT) AS negotiated_vs_allowed_bps
        FROM inn_agg i JOIN oon_agg o USING (billing_code)
    """


@query(
    "mrf_inn_vs_oon_benchmark",
    oracle=_inn_vs_oon_oracle(),
    description="cross-file-type rate benchmark — the analytical payoff "
    "of one engine ingesting BOTH CMS Transparency-in-Coverage formats: "
    "per billing code present in both the in-network-rates file and the "
    "allowed-amounts file, the negotiated-rate profile vs the "
    "out-of-network allowed profile (allowed is weighted by billed "
    "provider events, the grain the OON file reports), with the "
    "mean-negotiated over mean-allowed ratio in exact basis points "
    "(positive integer division, engine-exact). Plan: each file's "
    "lineage is aggregated to billing_code grain BEFORE the join — the "
    "join input is two code-cardinality aggregates, never the exploded "
    "price or payment facts, so at 100 TB the join is a broadcast of "
    "two tiny summaries while all heavy fan-out stays map-side-combined",
)
def mrf_inn_vs_oon_benchmark(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    o = build_oon_silver_cached(
        spark, fixture_oon_path(), chunktargetbytes=65536
    )
    inn = (
        t.in_network.select(
            "billing_code", F.explode("negotiated_rates").alias("r")
        )
        .select("billing_code", F.explode("r.negotiated_prices").alias("p"))
        .filter(F.col("p.negotiated_type") == "negotiated")
        .select(
            "billing_code",
            F.round(F.col("p.negotiated_rate") * 100)
            .cast("long")
            .alias("nc"),
        )
    )
    inn_agg = inn.groupBy("billing_code").agg(
        F.count("*").cast("long").alias("n_negotiated"),
        F.sum("nc").cast("long").alias("sum_negotiated_cents"),
        F.min("nc").alias("min_negotiated_cents"),
    )
    oon_agg = (
        o.payments.select(
            "billing_code",
            F.round(F.col("allowed_amount") * 100).cast("long").alias("ac"),
        )
        .groupBy("billing_code")
        .agg(
            F.count("*").cast("long").alias("n_allowed"),
            F.sum("ac").cast("long").alias("sum_allowed_cents"),
        )
    )
    return inn_agg.join(oon_agg, "billing_code").withColumn(
        "negotiated_vs_allowed_bps",
        F.expr(
            "CAST(sum_negotiated_cents * n_allowed * 10000"
            " DIV (n_negotiated * sum_allowed_cents) AS LONG)"
        ),
    )


_TOC_B_N = 45
_TOC_B_SEED = 6


def fixture_toc_b_path() -> str:
    """Second TOC snapshot (\"next month's republish\"): the index-keyed
    URL scheme in the synth means the two snapshots share a
    deterministic subset of file URLs (every structure's first
    in-network file and its allowed-amounts file for the overlapping
    index range) while the rng-dependent extra files churn — additions
    AND removals, like a real monthly republish."""
    d = os.path.join(tempfile.gettempdir(), "payer_mrf_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"mrf_toc_n{_TOC_B_N}_s{_TOC_B_SEED}.json")
    if not os.path.exists(p):
        write_toc_file(p, n_structures=_TOC_B_N, seed=_TOC_B_SEED)
    return p


def _toc_delta_oracle() -> str:
    def manifest(path: str, alias: str) -> str:
        return f"""
        {alias}_s AS (
            SELECT unnest(reporting_structure) AS r
            FROM read_json('{path}')
        ),
        {alias} AS (
            SELECT DISTINCT file_kind, location FROM (
                SELECT 'in_network' AS file_kind, fl.location AS location
                FROM (SELECT unnest(r.in_network_files) AS fl FROM {alias}_s)
                UNION ALL
                SELECT 'allowed_amounts' AS file_kind,
                       r.allowed_amount_file.location AS location
                FROM {alias}_s
                WHERE r.allowed_amount_file IS NOT NULL
            )
        )"""

    return f"""
        WITH {manifest(fixture_toc_path(), "a")},
        {manifest(fixture_toc_b_path(), "b")}
        SELECT file_kind,
               CASE WHEN b.location IS NULL THEN 'removed'
                    WHEN a.location IS NULL THEN 'added'
                    ELSE 'common' END AS status,
               CAST(count(*) AS BIGINT) AS n_files
        FROM a FULL OUTER JOIN b USING (file_kind, location)
        GROUP BY 1, 2
    """


@query(
    "mrf_toc_delta",
    oracle=_toc_delta_oracle(),
    description="table-of-contents republish delta — payers reissue the "
    "discovery index monthly, and the ingest scheduler's first question "
    "is which file URLs are new (fetch), gone (retire), or unchanged "
    "(skip if already ingested): per file_kind, the added / removed / "
    "common URL counts between two TOC snapshots. Plan: each snapshot "
    "reduces to its DISTINCT (file_kind, location) set BEFORE the "
    "full-outer join — the join moves two URL-cardinality sets, never "
    "the plan-x-file manifest fan-out",
)
def mrf_toc_delta(spark, sf_dir):
    def urls(path: str):
        t = build_toc_silver(
            spark,
            path,
            chunktargetbytes=65536,
            headerkey=HEADER_KEY_REPORTING_STRUCTURE,
        )
        return t.file_manifest.select("file_kind", "location").distinct()

    a = urls(fixture_toc_path()).withColumn("in_a", F.lit(1))
    b = urls(fixture_toc_b_path()).withColumn("in_b", F.lit(1))
    return (
        a.join(b, ["file_kind", "location"], "full_outer")
        .select(
            "file_kind",
            F.when(F.col("in_b").isNull(), F.lit("removed"))
            .when(F.col("in_a").isNull(), F.lit("added"))
            .otherwise(F.lit("common"))
            .alias("status"),
        )
        .groupBy("file_kind", "status")
        .agg(F.count("*").cast("long").alias("n_files"))
    )


# ---------------------------------------------------------------------------
# remote provider-reference resolution (r13): the CMS schema's fourth
# file shape — standalone provider files pointed at by
# provider_references[].location, which the reference engine drops.
# ---------------------------------------------------------------------------


def fixture_remote_provider_dir() -> str:
    d = os.path.join(
        tempfile.gettempdir(),
        "payer_mrf_fixture",
        f"remote_n{_N_ITEMS}_s{_SEED}",
    )
    if not os.path.isdir(d) or not os.listdir(d):
        materialize_remote_provider_files(fixture_path(), d, seed=_SEED)
    return d


def _remote_provider_resolve_oracle() -> str:
    return f"""
        WITH refs AS (
            SELECT unnest(provider_references) AS pr
            FROM read_json('{fixture_path()}')
        ),
        inline_g AS (
            SELECT 'inline' AS source, pr.provider_group_id AS gid,
                   unnest(pr.provider_groups) AS g
            FROM refs WHERE pr.provider_groups IS NOT NULL
        ),
        remote_refs AS (
            SELECT pr.provider_group_id AS gid,
                   regexp_extract(pr.location, '[^/]+$') AS bn
            FROM refs
            WHERE pr.location IS NOT NULL AND pr.provider_groups IS NULL
        ),
        remote_g AS (
            SELECT 'remote' AS source, rr.gid AS gid,
                   unnest(rf.provider_groups) AS g
            FROM remote_refs rr JOIN (
                SELECT regexp_extract(filename, '[^/]+$') AS bn,
                       provider_groups
                FROM read_json('{fixture_remote_provider_dir()}/*.json',
                               filename=true)
            ) rf USING (bn)
        ),
        all_g AS (
            SELECT * FROM inline_g UNION ALL SELECT * FROM remote_g
        ),
        npis AS (
            SELECT source, gid, g.tin.value AS tin_value,
                   unnest(g.npi) AS npi
            FROM all_g
        )
        SELECT source,
               CAST(count(DISTINCT gid) AS BIGINT) AS n_groups,
               CAST(count(*) AS BIGINT) AS n_npi_rows,
               CAST(count(DISTINCT npi) AS BIGINT) AS n_npis,
               CAST(count(DISTINCT tin_value) AS BIGINT) AS n_tins
        FROM npis GROUP BY 1
    """


@query(
    "mrf_remote_provider_resolve",
    oracle=_remote_provider_resolve_oracle(),
    description="remote provider-reference resolution — the CMS schema's "
    "fourth file shape: a provider_references entry may carry a "
    "`location` URL pointing at a standalone provider file instead of "
    "inline provider_groups (the reference engine drops these rows; "
    "this engine materializes and resolves them). Per provider source "
    "(inline vs remote): groups, NPI rows, distinct NPIs, distinct "
    "TINs — the directory-completeness audit a payer runs before "
    "trusting network-adequacy numbers. Plan: the remote side is ONE "
    "pinned-schema distributed spark.read.json scan over the small "
    "standalone files (the right tool — they are not chunker work), "
    "joined by URL basename to an explicitly broadcast (gid, basename) "
    "dim bounded by the reference count; inline and resolved rows "
    "union into a single partial-agg rollup",
)
def mrf_remote_provider_resolve(spark, sf_dir):
    t = build_silver_cached(spark, fixture_path(), chunktargetbytes=65536)
    inline = t.providers_x_payer.select(
        F.lit("inline").alias("source"), "provider_group_id", "npi", "tin"
    )
    remote = resolve_remote_provider_groups(
        spark, t.provider_references, fixture_remote_provider_dir()
    ).select(F.lit("remote").alias("source"), "provider_group_id", "npi", "tin")
    u = inline.unionByName(remote).select(
        "source",
        "provider_group_id",
        F.col("tin.value").alias("tin_value"),
        F.explode("npi").alias("npi"),
    )
    return u.groupBy("source").agg(
        F.count_distinct("provider_group_id").cast("long").alias("n_groups"),
        F.count("*").cast("long").alias("n_npi_rows"),
        F.count_distinct("npi").cast("long").alias("n_npis"),
        F.count_distinct("tin_value").cast("long").alias("n_tins"),
    )
