"""Schema-free MRF silver via Spark 4 VariantType.

The reference infers silver schemas with ``spark.read.json`` over an RDD of
payload strings (01_payer_mrf_demo.py:118-129) — a second full pass over
the data on the driver's terms. ``plans/silver.py`` replaces that with
pinned ``from_json`` schemas (fast, but a schema change in a payer's feed
means code changes). VariantType is the third point on that curve: parse
once into a binary-encoded variant, then extract paths lazily with
``variant_get`` — no inference pass, no pinned schema, still columnar and
shreddable. For exploratory queries over feeds whose shape drifts (every
payer publishes slightly different MRF), this is the idiomatic Spark-4
answer.

tests/test_variant.py proves the variant path extracts exactly the same
rows as the pinned-schema silver on the synthetic CMS fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.suite import query
from hls_payer_mrf_sparkstreaming_spark.plans.silver import (
    HEADER_KEY_IN_NETWORK,
)


def parse_in_network_variant(bronze: DataFrame) -> DataFrame:
    """in_network chunks -> one variant per item (no schema anywhere)."""
    return bronze.filter(
        F.col("header_key") == HEADER_KEY_IN_NETWORK
    ).select(
        "file_name",
        F.explode(
            F.expr(
                "variant_get(parse_json(json_payload), '$', 'array<variant>')"
            )
        ).alias("item"),
    )


def variant_codes(bronze: DataFrame) -> DataFrame:
    """The billing-code projection of the silver codes table, pulled from
    variants by path — ``variant_get`` prunes to just these paths at scan
    time, so unqueried payload subtrees are never decoded."""
    item = parse_in_network_variant(bronze)
    return item.select(
        F.expr("variant_get(item, '$.billing_code', 'string')").alias(
            "billing_code"
        ),
        F.expr("variant_get(item, '$.billing_code_type', 'string')").alias(
            "billing_code_type"
        ),
        F.expr(
            "variant_get(item, '$.negotiation_arrangement', 'string')"
        ).alias("negotiation_arrangement"),
        F.expr(
            "variant_get(item, '$.negotiated_rates', 'array<variant>')"
        ).alias("rates"),
    ).select(
        "billing_code",
        "billing_code_type",
        "negotiation_arrangement",
        F.size("rates").alias("n_rates"),
    )


def _variant_codes_oracle() -> str:
    from hls_payer_mrf_sparkstreaming_spark.plans.mrf_queries import (
        fixture_path,
    )

    return f"""
        WITH items AS (
            SELECT unnest(in_network) AS item
            FROM read_json('{fixture_path()}')
        )
        SELECT item.negotiation_arrangement AS negotiation_arrangement,
               item.billing_code_type AS billing_code_type,
               CAST(count(*) AS BIGINT) AS n_codes,
               CAST(sum(len(item.negotiated_rates)) AS BIGINT) AS n_rates
        FROM items GROUP BY 1, 2
    """


@query(
    "mrf_variant_codes",
    oracle=_variant_codes_oracle(),
    description="schema-free silver via VariantType: parse_json once, "
    "variant_get path extraction (lazy, shredded decode — unqueried "
    "subtrees never materialize), no inference pass and no pinned schema; "
    "billing-code summary per negotiation arrangement",
)
def mrf_variant_codes(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.plans.mrf_queries import (
        fixture_path,
    )
    from hls_payer_mrf_sparkstreaming_spark.sources.datasource import (
        read_payer_mrf,
    )

    bronze = read_payer_mrf(spark, fixture_path(), chunktargetbytes=65536)
    return (
        variant_codes(bronze)
        .groupBy("negotiation_arrangement", "billing_code_type")
        .agg(
            F.count("*").alias("n_codes"),
            F.sum("n_rates").alias("n_rates"),
        )
    )
