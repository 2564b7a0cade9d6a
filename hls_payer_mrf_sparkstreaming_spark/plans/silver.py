"""Bronze -> silver -> gold relational pipeline for CMS MRF data.

Re-expresses the reference demo notebook's SQL
(/root/reference/01_payer_mrf_demo.py:118-238) as composable DataFrame
functions:

- no RDD round-trip / runtime schema inference — ``from_json`` with the
  pinned CMS schema keeps everything JVM-side (01_payer_mrf_demo.py:118-129
  replaced);
- non-deterministic ``uuid()`` surrogate keys (01_payer_mrf_demo.py:165,180)
  replaced by position-derived ``xxhash64`` keys — (file_name, chunk byte
  offset, item position) — which are per-row unique AND stable across
  retries/restarts: at 100 TB a task retry with uuid() keys silently
  orphans child rows, xxhash keys cannot;
- the provider-references x payer cross join (01_payer_mrf_demo.py:157-158)
  is an explicit ``crossJoin`` against a 1-row broadcast dimension.

Scale notes: every transform here is a narrow projection/generate over the
bronze rows — the only shuffles in the whole pipeline are the gold query's
joins, which Catalyst turns into broadcast joins for the small dimension
sides. Explode fan-out (negotiated_rates -> negotiated_prices) stays within
a partition; partition sizing is controlled upstream by the source's
``chunktargetbytes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.plans import schemas as S
from hls_payer_mrf_sparkstreaming_spark.sources.datasource import (
    HEADER_KEY_IN_NETWORK,
    HEADER_KEY_PROVIDER_REFERENCES,
    read_payer_mrf,
)


# ---------------------------------------------------------------------------
# bronze -> typed
# ---------------------------------------------------------------------------


def parse_header(bronze: DataFrame) -> DataFrame:
    """Header fragments -> one typed row per fragment (merged downstream)."""
    return (
        bronze.filter(F.col("header_key") == "")
        .select(F.from_json("json_payload", S.HEADER_SCHEMA).alias("h"))
        .select("h.*")
    )


def parse_provider_references(bronze: DataFrame) -> DataFrame:
    """provider_references chunks -> one row per provider-reference object."""
    from pyspark.sql.types import ArrayType

    return (
        bronze.filter(F.col("header_key") == HEADER_KEY_PROVIDER_REFERENCES)
        .select(
            F.explode(
                F.from_json(
                    "json_payload", ArrayType(S.PROVIDER_REFERENCE_SCHEMA)
                )
            ).alias("p")
        )
        .select("p.*")
    )


def _parse_top_level_array(
    bronze: DataFrame, header_key: str, item_schema, sk_name: str
) -> DataFrame:
    """Chunks of one top-level array -> one typed row per array element,
    with a per-row-unique, retry-stable surrogate key — the shared
    recipe behind every array-shaped silver parse (in_network,
    out_of_network, reporting_structure).

    Real CMS files repeat a billing code across in_network items (differing
    name / negotiation_arrangement), so hashing the payload columns alone
    collides and cross-links prices between unrelated items. The key hashes
    (file_name, chunk identity, item position within the chunk) instead —
    unique per item and deterministic across task retries (the reference's
    uuid() keys, 01_payer_mrf_demo.py:165, are neither). Chunk identity is
    ``chunk_start`` (byte offset; present when the source ran with
    ``includeoffsets=true`` — every build_*_silver sets it), falling back
    to a hash of the chunk payload for raw 3-column bronzes.
    """
    from pyspark.sql.types import ArrayType

    chunk_id = (
        F.col("chunk_start")
        if "chunk_start" in bronze.columns
        else F.xxhash64("json_payload")
    )
    return (
        bronze.filter(F.col("header_key") == header_key)
        .select(
            "file_name",
            chunk_id.alias("_chunk_id"),
            F.posexplode(
                F.from_json("json_payload", ArrayType(item_schema))
            ).alias("_item_pos", "n"),
        )
        .select(
            _sk("file_name", "_chunk_id", "_item_pos").alias(sk_name),
            "n.*",
        )
    )


def parse_in_network(bronze: DataFrame) -> DataFrame:
    """in_network chunks -> one row per in_network item (see
    _parse_top_level_array for the surrogate-key rationale)."""
    return _parse_top_level_array(
        bronze,
        HEADER_KEY_IN_NETWORK,
        S.IN_NETWORK_ITEM_SCHEMA,
        "sk_in_network_id",
    )


# ---------------------------------------------------------------------------
# silver star model (01_payer_mrf_demo.py:148-213)
# ---------------------------------------------------------------------------


def _sk(*cols) -> F.Column:
    """Deterministic surrogate key (replaces uuid(); see module docstring)."""
    return F.xxhash64(*cols)


def provider_references_x_payer(
    provider_refs: DataFrame, header: DataFrame
) -> DataFrame:
    """Exploded provider groups x reporting entity
    (01_payer_mrf_demo.py:148-158)."""
    groups = provider_refs.select(
        "provider_group_id", F.explode("provider_groups").alias("group_array")
    ).select(
        "provider_group_id",
        F.col("group_array.npi").alias("npi"),
        F.col("group_array.tin").alias("tin"),
    )
    entity = (
        header.filter(F.col("reporting_entity_name").isNotNull())
        .select("reporting_entity_name", "reporting_entity_type")
        .limit(1)
    )
    return groups.crossJoin(F.broadcast(entity)).select(
        "reporting_entity_name",
        "reporting_entity_type",
        "provider_group_id",
        "npi",
        "tin",
    )


def in_network_codes(in_network: DataFrame) -> DataFrame:
    """Procedure table with surrogate key (01_payer_mrf_demo.py:160-171).

    The key is the per-item one minted in parse_in_network — NOT a hash of
    the billing columns, which repeat across items in real CMS files."""
    return in_network.select(
        "sk_in_network_id",
        "billing_code",
        "billing_code_type",
        "billing_code_type_version",
        "description",
        "name",
        "negotiation_arrangement",
        "negotiated_rates",
    )


def in_network_rates(codes: DataFrame) -> DataFrame:
    """Exploded negotiated_rates with rate surrogate key
    (01_payer_mrf_demo.py:173-184). posexplode keeps the key deterministic
    for identical rate payloads within one code."""
    return codes.select(
        "sk_in_network_id",
        F.posexplode("negotiated_rates").alias("rate_pos", "negotiated_rates_array"),
    ).select(
        _sk("sk_in_network_id", "rate_pos").alias("sk_rate_id"),
        "sk_in_network_id",
        "negotiated_rates_array",
    )


def in_network_prices(rates: DataFrame) -> DataFrame:
    """Exploded negotiated_prices, negotiated-type only
    (01_payer_mrf_demo.py:186-200)."""
    return (
        rates.select(
            "sk_in_network_id",
            "sk_rate_id",
            F.explode("negotiated_rates_array.negotiated_prices").alias("price"),
        )
        .filter(F.col("price.negotiated_type") == "negotiated")
        .select(
            "sk_in_network_id",
            "sk_rate_id",
            F.col("price.billing_class").alias("billing_class"),
            F.col("price.billing_code_modifier").alias("billing_code_modifier"),
            F.col("price.expiration_date").alias("expiration_date"),
            F.col("price.negotiated_rate").alias("negotiated_rate"),
            F.col("price.negotiated_type").alias("negotiated_type"),
            F.col("price.service_code").alias("service_code"),
        )
    )


def in_network_par_providers(rates: DataFrame) -> DataFrame:
    """Rate -> provider_reference_id links (01_payer_mrf_demo.py:202-213)."""
    return rates.select(
        F.explode("negotiated_rates_array.provider_references").alias(
            "provider_reference_id"
        ),
        "sk_rate_id",
    )


# ---------------------------------------------------------------------------
# gold (01_payer_mrf_demo.py:225-238)
# ---------------------------------------------------------------------------


def shoppable_price(
    codes: DataFrame,
    providers_x_payer: DataFrame,
    billing_code: str,
    tin_value: str,
) -> DataFrame:
    """Parameterized price-comparison query: price for a procedure within a
    provider group (the CMS 2023 mandate query, 01_payer_mrf_demo.py:225-238).

    The demo's SQL joins the materialized codes/prices/par_providers
    tables; re-expressed here as filter-first derivation instead: the
    one-code predicate hits the codes scan BEFORE any explode (pushed
    into the parquet read on a materialized table), and the
    (price, provider_reference) pairs unfold from that code's
    negotiated_rates alone. The full price fact is never scanned, no
    surrogate-key join is needed, and the one corpus-sized input is
    read once — joining the prices/par_providers tables instead would
    scan the whole fact and, on un-materialized lineage, re-execute the
    JSON parse once per join side."""
    proc = codes.filter(
        (F.col("billing_code") == billing_code)
        & (F.col("negotiation_arrangement") == "ffs")
    )
    price_refs = (
        proc.select(
            "billing_code",
            "description",
            F.explode("negotiated_rates").alias("nr"),
        )
        .select(
            "billing_code",
            "description",
            F.col("nr.provider_references").alias("refs"),
            F.explode("nr.negotiated_prices").alias("price"),
        )
        .filter(F.col("price.negotiated_type") == "negotiated")
        .select(
            "billing_code",
            "description",
            F.col("price.billing_class").alias("billing_class"),
            F.col("price.billing_code_modifier").alias(
                "billing_code_modifier"
            ),
            F.col("price.service_code").alias("service_code"),
            F.col("price.negotiated_rate").alias("negotiated_rate"),
            F.explode("refs").alias("provider_reference_id"),
        )
    )
    # the tin-filtered provider dim is tiny; broadcast it explicitly —
    # the payer-mrf scan has no stats, so Catalyst would otherwise pick
    # a shuffle join.
    provider = providers_x_payer.filter(F.col("tin.value") == tin_value)
    return price_refs.join(
        F.broadcast(provider),
        F.col("provider_reference_id") == F.col("provider_group_id"),
    ).select(
        "billing_code",
        "description",
        "billing_class",
        "billing_code_modifier",
        "service_code",
        "negotiated_rate",
        "npi",
        "tin",
    )


# ---------------------------------------------------------------------------
# one-call pipeline
# ---------------------------------------------------------------------------


class MrfSilverTables:
    """All silver tables derived from one bronze DataFrame.

    ``bronze_header``/``bronze_pr``/``bronze_in`` optionally supply
    per-branch pruned bronzes (source ``headerkey`` option): each branch's
    scan then plans only its own byte ranges, so the provider_references
    branch never reads in_network bytes and vice versa — the IO win the
    row-level header_key filter alone cannot give a Python data source.
    """

    def __init__(
        self,
        bronze: DataFrame,
        bronze_header: DataFrame | None = None,
        bronze_pr: DataFrame | None = None,
        bronze_in: DataFrame | None = None,
    ):
        self.bronze = bronze
        self.header = parse_header(
            bronze_header if bronze_header is not None else bronze
        )
        self.provider_references = parse_provider_references(
            bronze_pr if bronze_pr is not None else bronze
        )
        self.in_network = parse_in_network(
            bronze_in if bronze_in is not None else bronze
        )
        self.codes = in_network_codes(self.in_network)
        self.rates = in_network_rates(self.codes)
        self.prices = in_network_prices(self.rates)
        self.par_providers = in_network_par_providers(self.rates)
        self.providers_x_payer = provider_references_x_payer(
            self.provider_references, self.header
        )

    def shoppable_price(self, billing_code: str, tin_value: str) -> DataFrame:
        return shoppable_price(
            self.codes,
            self.providers_x_payer,
            billing_code,
            tin_value,
        )

    def save_all(self, spark: SparkSession, database: str) -> None:
        """CTAS equivalents (01_payer_mrf_demo.py:148-213), staged: each
        in_network tier derives from the PREVIOUSLY WRITTEN table, not from
        bronze lineage — otherwise codes/rates/prices/par_providers would
        each re-read and re-parse the in_network JSON branch (4x the
        ingest cost; measured 1.7 GB/min vs 3x that staged on a 2.2 GB
        corpus). Reading back the just-written parquet is the medallion
        pattern that holds at 100 TB, where persist() of the parsed branch
        would not fit and lineage recompute is prohibitive."""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")

        def save(name: str, df: DataFrame) -> DataFrame:
            df.write.mode("overwrite").saveAsTable(f"{database}.{name}")
            return spark.table(f"{database}.{name}")

        save("provider_header", self.header)
        save("provider_references_x_payer", self.providers_x_payer)
        codes = save("in_network_codes", self.codes)
        rates = save("in_network_rates", in_network_rates(codes))
        save("in_network_prices", in_network_prices(rates))
        save("in_network_par_providers", in_network_par_providers(rates))


def build_silver(spark: SparkSession, path: str, **options) -> MrfSilverTables:
    """Read an MRF file and derive the full silver star model.

    Each branch gets its own byte-range-pruned bronze (``headerkey``
    option), so e.g. the gold query's in_network scans never read
    provider_references bytes. ``includeoffsets`` is forced on so
    in_network surrogate keys hash the chunk byte offset (per-row unique,
    retry-stable)."""
    options = dict(options)
    if "includeoffsets" not in {k.lower() for k in options}:
        options["includeoffsets"] = "true"
    if "headerkey" in {k.lower() for k in options}:
        return MrfSilverTables(read_payer_mrf(spark, path, **options))

    def branch(hk: str | None) -> DataFrame:
        o = dict(options)
        if hk is not None:
            o["headerkey"] = hk
        return read_payer_mrf(spark, path, **o)

    return MrfSilverTables(
        branch(None),
        bronze_header=branch(""),
        bronze_pr=branch(HEADER_KEY_PROVIDER_REFERENCES),
        bronze_in=branch(HEADER_KEY_IN_NETWORK),
    )


# ---------------------------------------------------------------------------
# allowed-amounts (out-of-network) silver — the second CMS
# Transparency-in-Coverage file type. The reference repo stops at
# in-network-rates files, but its splitter (and this engine's) is agnostic
# over top-level array names, so an allowed-amounts file streams through
# the SAME bronze source with header_key='out_of_network'; only the
# from_json schema differs.
# ---------------------------------------------------------------------------

HEADER_KEY_OUT_OF_NETWORK = "out_of_network"


def parse_out_of_network(bronze: DataFrame) -> DataFrame:
    """out_of_network chunks -> one row per item, same shared recipe."""
    return _parse_top_level_array(
        bronze,
        HEADER_KEY_OUT_OF_NETWORK,
        S.OUT_OF_NETWORK_ITEM_SCHEMA,
        "sk_oon_id",
    )


def out_of_network_payments(items: DataFrame) -> DataFrame:
    """Fully exploded payment fact: one row per (item, allowed_amounts
    entry, payment, provider) with the code/tin/class dims carried and
    amounts in the raw dollars the file states."""
    return (
        items.select(
            "sk_oon_id",
            "billing_code",
            F.posexplode("allowed_amounts").alias("aa_pos", "aa"),
        )
        .select(
            "sk_oon_id",
            "billing_code",
            _sk("sk_oon_id", "aa_pos").alias("sk_allowed_id"),
            F.col("aa.tin").alias("tin"),
            F.col("aa.billing_class").alias("billing_class"),
            F.col("aa.service_code").alias("service_code"),
            F.explode("aa.payments").alias("pay"),
        )
        .select(
            "sk_oon_id",
            "sk_allowed_id",
            "billing_code",
            "tin",
            "billing_class",
            "service_code",
            F.col("pay.allowed_amount").alias("allowed_amount"),
            F.explode("pay.providers").alias("prov"),
        )
        .select(
            "sk_oon_id",
            "sk_allowed_id",
            "billing_code",
            "tin",
            "billing_class",
            "service_code",
            "allowed_amount",
            F.col("prov.billed_charge").alias("billed_charge"),
            F.col("prov.npi").alias("npi"),
        )
    )


class OonSilverTables:
    """Silver tables derived from one allowed-amounts bronze."""

    def __init__(self, bronze: DataFrame, bronze_header=None, bronze_oon=None):
        self.bronze = bronze
        self.header = parse_header(
            bronze_header if bronze_header is not None else bronze
        )
        self.out_of_network = parse_out_of_network(
            bronze_oon if bronze_oon is not None else bronze
        )
        self.payments = out_of_network_payments(self.out_of_network)


def build_oon_silver(
    spark: SparkSession, path: str, **options
) -> OonSilverTables:
    """Read a CMS allowed-amounts file through the payer-mrf source and
    derive the out-of-network silver tables (byte-range-pruned branches,
    same discipline as build_silver)."""
    options = dict(options)
    if "includeoffsets" not in {k.lower() for k in options}:
        options["includeoffsets"] = "true"
    if "headerkey" in {k.lower() for k in options}:
        return OonSilverTables(read_payer_mrf(spark, path, **options))

    def branch(hk: str | None) -> DataFrame:
        o = dict(options)
        if hk is not None:
            o["headerkey"] = hk
        return read_payer_mrf(spark, path, **o)

    return OonSilverTables(
        branch(None),
        bronze_header=branch(""),
        bronze_oon=branch(HEADER_KEY_OUT_OF_NETWORK),
    )


def save_oon_all(
    tables: OonSilverTables, spark: SparkSession, database: str
) -> None:
    """CTAS the allowed-amounts silver tables, staged like
    MrfSilverTables.save_all: payments derives from the just-written
    out_of_network table, not from bronze lineage, so the JSON branch is
    parsed exactly once per medallion build."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    tables.header.write.mode("overwrite").saveAsTable(
        f"{database}.oon_header"
    )
    tables.out_of_network.write.mode("overwrite").saveAsTable(
        f"{database}.out_of_network_items"
    )
    items = spark.table(f"{database}.out_of_network_items")
    out_of_network_payments(items).write.mode("overwrite").saveAsTable(
        f"{database}.out_of_network_payments"
    )


# ---------------------------------------------------------------------------
# table-of-contents silver — the CMS discovery format. Real payer TOCs
# run to hundreds of MB (thousands of plan groups x file lists), so the
# reporting_structure array streams through the same splitter; silver is
# one flat (plan x file) manifest a fleet scheduler can fan ingest over.
# ---------------------------------------------------------------------------

HEADER_KEY_REPORTING_STRUCTURE = "reporting_structure"


def parse_reporting_structure(bronze: DataFrame) -> DataFrame:
    """reporting_structure chunks -> one row per plan-group entry."""
    return _parse_top_level_array(
        bronze,
        HEADER_KEY_REPORTING_STRUCTURE,
        S.TOC_STRUCTURE_SCHEMA,
        "sk_structure_id",
    )


def toc_file_manifest(structures: DataFrame) -> DataFrame:
    """Flat (plan, file_kind, location) manifest: every reporting plan
    crossed with its group's in-network files plus the allowed-amounts
    file — the work list an ingest scheduler partitions over.

    One lineage, two sequential explodes (plans, then the group's file
    list carried alongside) — the plan-x-file cross product happens
    WITHIN each structure row, so no self-join and the JSON branch is
    parsed exactly once."""
    # struct field names set by .alias() inside a higher-order-function
    # lambda are NOT preserved (Spark names them col1, col2, ...), so
    # both concat sides are cast to the same named struct type. Both
    # sides are also coalesced to an empty typed array: concat returns
    # NULL if ANY argument is NULL, so a structure with an
    # allowed_amount_file but no in_network_files key (both are optional
    # in the CMS TOC schema) would otherwise explode to ZERO rows and
    # silently drop its allowed-amounts URL from the manifest.
    ftype = "array<struct<file_kind:string,location:string>>"
    empty = f"CAST(array() AS {ftype})"
    # one parsed expression (SQL text, see functions/vector.py) — the
    # Column-API build of this nested transform/when/cast tree cost ~100
    # py4j round trips per manifest construction
    files_arr = (
        "concat("
        "coalesce(CAST(transform(in_network_files, "
        "f -> struct('in_network' AS file_kind, f.location AS location)) "
        f"AS {ftype}), {empty}), "
        "coalesce(CAST(CASE WHEN allowed_amount_file IS NOT NULL THEN "
        "array(struct('allowed_amounts' AS file_kind, "
        "allowed_amount_file.location AS location)) "
        f"ELSE array() END AS {ftype}), {empty}))"
    )
    return (
        structures.selectExpr(
            "sk_structure_id",
            "explode(reporting_plans) AS p",
            f"{files_arr} AS _files",
        )
        .select("sk_structure_id", "p.*", F.explode("_files").alias("f"))
        .select(
            "sk_structure_id",
            "plan_name",
            "plan_id_type",
            "plan_id",
            "plan_market_type",
            "f.file_kind",
            "f.location",
        )
    )


class TocSilverTables:
    """Silver tables derived from one table-of-contents bronze."""

    def __init__(self, bronze: DataFrame, bronze_rs=None):
        self.bronze = bronze
        self.structures = parse_reporting_structure(
            bronze_rs if bronze_rs is not None else bronze
        )
        self.file_manifest = toc_file_manifest(self.structures)


def build_toc_silver(
    spark: SparkSession, path: str, **options
) -> TocSilverTables:
    options = dict(options)
    if "includeoffsets" not in {k.lower() for k in options}:
        options["includeoffsets"] = "true"
    if "headerkey" in {k.lower() for k in options}:
        return TocSilverTables(read_payer_mrf(spark, path, **options))
    o = dict(options)
    o["headerkey"] = HEADER_KEY_REPORTING_STRUCTURE
    return TocSilverTables(
        read_payer_mrf(spark, path, **options),
        bronze_rs=read_payer_mrf(spark, path, **o),
    )


# ---------------------------------------------------------------------------
# remote provider-reference resolution — the CMS in-network schema lets
# a provider_references entry point at a standalone file via `location`
# instead of inlining provider_groups (the reference engine drops these
# on the floor; see JsonMRFSource.scala's fixed 3-column contract). The
# remote files are thousands of SMALL JSON objects, so the right tool is
# a stock distributed spark.read.json scan, not the chunker. Download
# layout contract: the fetcher saves each ref's payload as
# provider_group_{gid}.json (materialize_remote_provider_files does
# exactly this) — keyed by the gid, NOT the URL basename, because real
# payer URLs routinely share basenames across path prefixes
# (.../2026-01/provider_refs.json vs .../2026-02/provider_refs.json)
# and a basename join would silently cross-link provider groups.
# ---------------------------------------------------------------------------


def resolve_remote_provider_groups(
    spark: SparkSession, provider_refs: DataFrame, remote_dir: str
) -> DataFrame:
    """location-only provider_references -> (provider_group_id, npi, tin)
    rows, shaped exactly like the inline-group explode in
    provider_references_x_payer so the two sources union cleanly.

    ``remote_dir`` must follow the download-layout contract above: one
    ``provider_group_{gid}.json`` per location-only reference.

    Plan: ONE distributed JSON scan over the remote directory (pinned
    schema — no inference pass), exploded to group rows; the refs side
    reduces to a (gid, expected-filename) dim bounded by the reference
    count, so it is explicitly broadcast — at national scale the scan
    side (thousands of small files across executors) never shuffles."""
    remote = (
        spark.read.schema(S.REMOTE_PROVIDER_FILE_SCHEMA)
        # each standalone file is ONE pretty-printed JSON object, not
        # JSON-Lines — without multiLine the line-oriented reader yields
        # a null row per line and the explode silently drops everything
        .option("multiLine", "true")
        .json(remote_dir.rstrip("/") + "/*.json")
        .select(
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("_basename"),
            F.explode("provider_groups").alias("g"),
        )
    )
    refs = provider_refs.filter(
        F.col("location").isNotNull() & F.col("provider_groups").isNull()
    ).select(
        "provider_group_id",
        F.concat(
            F.lit("provider_group_"),
            F.col("provider_group_id").cast("string"),
            F.lit(".json"),
        ).alias("_basename"),
    )
    return remote.join(F.broadcast(refs), "_basename").select(
        "provider_group_id",
        F.col("g.npi").alias("npi"),
        F.col("g.tin").alias("tin"),
    )
