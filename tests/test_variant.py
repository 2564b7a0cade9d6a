"""VariantType silver path: the schema-free variant extraction must agree
with the pinned-schema from_json silver on the same bronze."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mrf_file(tmp_path_factory):
    from hls_payer_mrf_sparkstreaming_spark.sources.synth import (
        write_mrf_file,
    )

    p = tmp_path_factory.mktemp("variant") / "payer.json"
    write_mrf_file(str(p), n_in_network=60, seed=11)
    return str(p)


def test_variant_codes_match_schema_silver(spark, mrf_file):
    from hls_payer_mrf_sparkstreaming_spark.plans.silver import build_silver
    from hls_payer_mrf_sparkstreaming_spark.plans.variant import (
        variant_codes,
    )
    from hls_payer_mrf_sparkstreaming_spark.sources.datasource import (
        read_payer_mrf,
    )

    bronze = read_payer_mrf(spark, mrf_file, chunktargetbytes=16384)
    got = sorted(
        tuple(r)
        for r in variant_codes(bronze).collect()
    )

    silver = build_silver(spark, mrf_file, chunktargetbytes=16384)
    want = sorted(
        tuple(r)
        for r in silver.codes.select(
            "billing_code",
            "billing_code_type",
            "negotiation_arrangement",
            F.size("negotiated_rates").alias("n_rates"),
        ).collect()
    )
    assert got == want
    assert len(got) == 60


def test_mrf_variant_codes_query_runs(spark):
    import __spark_entry__ as entry

    df = entry.queries()["mrf_variant_codes"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    assert df.columns == [
        "negotiation_arrangement",
        "billing_code_type",
        "n_codes",
        "n_rates",
    ]
