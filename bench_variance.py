#!/usr/bin/env python
"""Variance audit for the slowest headline queries.

This host shows bursty external interference: driver-run medians have
disagreed with committed medians by 2-3x on identical code (r7:
anomaly_mad 7.78 s driver vs 2.99 s committed). This script reruns the
slowest N queries from bench_details.json with more samples and records
min / median / max / spread per query into bench_variance.json, committed
next to bench_medians.json — so a future round-to-round delta can be
attributed to code (min moved) vs host (min flat, spread wide).

Usage: python bench_variance.py [--top 10] [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--runs", type=int, default=5)
    a = ap.parse_args()

    with open(os.path.join(REPO_ROOT, "bench_details.json")) as f:
        details = json.load(f)
    med = details["queries_sec_median"]
    targets = [k for k, _ in sorted(med.items(), key=lambda kv: -kv[1])][
        : a.top
    ]

    import __spark_entry__ as entry_mod
    from bench import _unpersist_all
    from hls_payer_mrf_sparkstreaming_spark.session import get_spark

    spark = get_spark(
        app_name="bench_variance",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # mirror bench.py: graph-family consumers INCLUDING neardup_pairs_lsh
    # time against a warm session-level edge cache (the cold build is
    # bench.py's separate edge_build_sec metric)
    from hls_payer_mrf_sparkstreaming_spark.operators.dedup import (
        EDGE_CONSUMER_QUERIES,
        neardup_edges,
    )

    out = {}
    for name in targets:
        fn = queries[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        _unpersist_all(spark)
        samples = []
        for _ in range(a.runs):
            if name in EDGE_CONSUMER_QUERIES or name == "neardup_pairs_lsh":
                neardup_edges(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            _unpersist_all(spark)
        mn, md, mx = (
            min(samples),
            statistics.median(samples),
            max(samples),
        )
        out[name] = {
            "min": round(mn, 3),
            "median": round(md, 3),
            "max": round(mx, 3),
            "spread_rel": round((mx - mn) / md, 2) if md else None,
            "runs": a.runs,
        }
        print(name, out[name], flush=True)
    spark.stop()

    path = os.path.join(REPO_ROOT, "bench_variance.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}, f,
                  indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
