#!/usr/bin/env python
"""Interleaved within-session config A/B (the r13 discipline: this host
has bursty external interference, so only A/B samples alternated inside
ONE Spark session are trustworthy).

For each query: one untimed warmup, then 2*RUNS timed noop-sink passes
alternating the candidate conf ON/OFF per sample (OFF first). Reports the
per-query median under each arm and the total.

Usage:
  python tools/ab_conf.py --conf k=v [--conf k2=v2] q1 q2 ... [--runs 4]

The conf keys must be runtime-settable SQL confs (AQE/codegen knobs are).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument(
        "--conf",
        action="append",
        required=True,
        help="k=v to toggle (B arm sets it; A arm restores the default)",
    )
    a = ap.parse_args()

    from bench import _unpersist_all

    import __spark_entry__ as entry_mod
    from hls_payer_mrf_sparkstreaming_spark.operators.dedup import (
        EDGE_CONSUMER_QUERIES,
        neardup_edges,
    )
    from hls_payer_mrf_sparkstreaming_spark.plans.mrf_queries import (
        SILVER_CONSUMER_QUERIES,
    )
    from hls_payer_mrf_sparkstreaming_spark.session import get_spark

    spark = get_spark(
        app_name="ab_conf",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    confs = [kv.split("=", 1) for kv in a.conf]
    defaults = {}
    for k, _ in confs:
        try:
            defaults[k] = spark.conf.get(k)
        except Exception:
            defaults[k] = None

    def _arm(on: bool) -> None:
        for k, v in confs:
            if on:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    def _warm(name):
        if name in EDGE_CONSUMER_QUERIES or name == "neardup_pairs_lsh":
            _noop(neardup_edges(spark, SF_DIR))
        if name in SILVER_CONSUMER_QUERIES:
            _noop(queries[name](spark, SF_DIR))

    tot = {"A": 0.0, "B": 0.0}
    for name in a.names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        _arm(False)
        _noop(fn(spark, SF_DIR))  # untimed warmup
        _unpersist_all(spark)
        samples: dict[str, list[float]] = {"A": [], "B": []}
        for i in range(2 * a.runs):
            arm = "B" if i % 2 else "A"
            _arm(arm == "B")
            _warm(name)
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            samples[arm].append(time.time() - t0)
            _unpersist_all(spark)
        ma = statistics.median(samples["A"])
        mb = statistics.median(samples["B"])
        tot["A"] += ma
        tot["B"] += mb
        print(
            f"{name}: A={ma:.3f} B={mb:.3f} "
            f"({'B wins' if mb < ma else 'A wins'} "
            f"{abs(mb - ma) / ma * 100:.0f}%)",
            flush=True,
        )
    print(
        f"TOTAL: A={tot['A']:.2f} B={tot['B']:.2f} "
        f"ratio B/A={tot['B'] / tot['A']:.3f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
