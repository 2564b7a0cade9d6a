"""Explicit StructTypes for the CMS in-network-rates schema.

The reference infers silver schemas at runtime with ``spark.read.json(rdd)``
(01_payer_mrf_demo.py:118-129) — a full extra pass over the data plus an RDD
round-trip. At 100 TB that inference pass is a non-starter, so we pin the
schema (derived from the public CMS examples the reference tests against,
e.g. src/test/resources/in-network-rates-fee-for-service-single-plan-sample.json)
and parse with ``from_json``, which keeps parsing JVM-side inside
whole-stage codegen. ``spark.read.json`` stays available as an opt-in
fallback for files with out-of-schema extensions.
"""

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TIN_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("value", StringType()),
    ]
)

PROVIDER_GROUP_SCHEMA = StructType(
    [
        StructField("npi", ArrayType(LongType())),
        StructField("tin", TIN_SCHEMA),
    ]
)

PROVIDER_REFERENCE_SCHEMA = StructType(
    [
        StructField("provider_group_id", LongType()),
        StructField("provider_groups", ArrayType(PROVIDER_GROUP_SCHEMA)),
        StructField("location", StringType()),
    ]
)

NEGOTIATED_PRICE_SCHEMA = StructType(
    [
        StructField("negotiated_type", StringType()),
        StructField("negotiated_rate", DoubleType()),
        StructField("expiration_date", StringType()),
        StructField("service_code", ArrayType(StringType())),
        StructField("billing_class", StringType()),
        StructField("billing_code_modifier", ArrayType(StringType())),
        StructField("additional_information", StringType()),
    ]
)

NEGOTIATED_RATE_SCHEMA = StructType(
    [
        StructField("provider_groups", ArrayType(PROVIDER_GROUP_SCHEMA)),
        StructField("provider_references", ArrayType(LongType())),
        StructField("negotiated_prices", ArrayType(NEGOTIATED_PRICE_SCHEMA)),
    ]
)

# covered_services (capitation) / bundled_codes (bundle) variants share the
# code-identification fields
_CODE_FIELDS = [
    StructField("billing_code", StringType()),
    StructField("billing_code_type", StringType()),
    StructField("billing_code_type_version", StringType()),
    StructField("description", StringType()),
]

COVERED_SERVICE_SCHEMA = StructType(_CODE_FIELDS)
BUNDLED_CODE_SCHEMA = StructType(_CODE_FIELDS)

IN_NETWORK_ITEM_SCHEMA = StructType(
    [
        StructField("negotiation_arrangement", StringType()),
        StructField("name", StringType()),
        *_CODE_FIELDS,
        StructField("negotiated_rates", ArrayType(NEGOTIATED_RATE_SCHEMA)),
        StructField("covered_services", ArrayType(COVERED_SERVICE_SCHEMA)),
        StructField("bundled_codes", ArrayType(BUNDLED_CODE_SCHEMA)),
    ]
)

HEADER_SCHEMA = StructType(
    [
        StructField("reporting_entity_name", StringType()),
        StructField("reporting_entity_type", StringType()),
        StructField("plan_name", StringType()),
        StructField("plan_id_type", StringType()),
        StructField("plan_id", StringType()),
        StructField("plan_market_type", StringType()),
        StructField("last_updated_on", StringType()),
        StructField("version", StringType()),
    ]
)


# ---------------------------------------------------------------------------
# allowed-amounts (out-of-network) files — the second CMS
# Transparency-in-Coverage machine-readable file type (schema per the
# public CMS price-transparency-guide allowed-amounts examples; the
# reference repo ingests only in-network-rates files, but its splitter
# design — and ours — is agnostic over top-level array names, so the same
# bronze engine streams these)
# ---------------------------------------------------------------------------

OON_PROVIDER_SCHEMA = StructType(
    [
        StructField("billed_charge", DoubleType()),
        StructField("npi", ArrayType(LongType())),
    ]
)

OON_PAYMENT_SCHEMA = StructType(
    [
        StructField("allowed_amount", DoubleType()),
        StructField("billing_code_modifier", ArrayType(StringType())),
        StructField("providers", ArrayType(OON_PROVIDER_SCHEMA)),
    ]
)

OON_ALLOWED_AMOUNT_SCHEMA = StructType(
    [
        StructField("tin", TIN_SCHEMA),
        StructField("service_code", ArrayType(StringType())),
        StructField("billing_class", StringType()),
        StructField("payments", ArrayType(OON_PAYMENT_SCHEMA)),
    ]
)

OUT_OF_NETWORK_ITEM_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        *_CODE_FIELDS,
        StructField("allowed_amounts", ArrayType(OON_ALLOWED_AMOUNT_SCHEMA)),
    ]
)


# ---------------------------------------------------------------------------
# table-of-contents index files (the CMS discovery format: which
# in-network / allowed-amounts files exist per reporting plan group)
# ---------------------------------------------------------------------------

TOC_PLAN_SCHEMA = StructType(
    [
        StructField("plan_name", StringType()),
        StructField("plan_id_type", StringType()),
        StructField("plan_id", StringType()),
        StructField("plan_market_type", StringType()),
    ]
)

TOC_FILE_SCHEMA = StructType(
    [
        StructField("description", StringType()),
        StructField("location", StringType()),
    ]
)

TOC_STRUCTURE_SCHEMA = StructType(
    [
        StructField("reporting_plans", ArrayType(TOC_PLAN_SCHEMA)),
        StructField("in_network_files", ArrayType(TOC_FILE_SCHEMA)),
        StructField("allowed_amount_file", TOC_FILE_SCHEMA),
    ]
)


# standalone provider-reference file (`location`-variant resolution
# target): the whole file is one object {"provider_groups": [...]}
REMOTE_PROVIDER_FILE_SCHEMA = StructType(
    [StructField("provider_groups", ArrayType(PROVIDER_GROUP_SCHEMA))]
)
