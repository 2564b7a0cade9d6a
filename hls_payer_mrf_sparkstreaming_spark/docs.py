"""Operator-catalog generator: OPERATORS.md is rendered from the live
query registry so the docs can never drift from the code (a pytest
regenerates and diffs it).
"""

from __future__ import annotations

_HEADER = """# Operator catalog

One row per registered query/operator (the driver correctness gate runs
every row; "oracle" = hash-checked against DuckDB on the same inputs,
"rows-only" = run-checked with dedicated pytest coverage instead).
Generated from the registry by `hls_payer_mrf_sparkstreaming_spark.docs`
— edit descriptions at the `@query` site, not here.

| # | Query | Check | Description |
|---|-------|-------|-------------|
"""


def render_operator_table() -> str:
    from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
        all_queries,
    )

    rows = []
    for i, (name, pair) in enumerate(sorted(all_queries().items()), 1):
        check = "oracle" if pair.oracle else "rows-only"
        desc = " ".join(pair.description.split())
        rows.append(f"| {i} | `{name}` | {check} | {desc} |")
    return _HEADER + "\n".join(rows) + "\n"


def write_catalog(path: str = "OPERATORS.md") -> None:
    with open(path, "w") as f:
        f.write(render_operator_table())


if __name__ == "__main__":
    write_catalog()


def registry_counts() -> dict[str, int]:
    """Live operator/oracle/bench counts — the single source for the
    README's headline numbers (drift-guarded by tests/test_plans.py)."""
    import importlib.util

    from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
        all_queries,
    )

    q = all_queries()
    # bench.HEADLINE is curated-order + registry tail (computed at import);
    # import the module rather than regexing its source so the count stays
    # live
    spec = importlib.util.spec_from_file_location(
        "_bench_for_counts", __file__.rsplit("/", 2)[0] + "/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return {
        "operators": len(q),
        "oracled": sum(1 for p in q.values() if p.oracle),
        "headline": len(bench.HEADLINE),
    }
