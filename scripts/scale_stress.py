#!/usr/bin/env python
"""Time registry queries at two scales and print the PLANS.md
amplification table (wall ratio for 10× data; sub-linear = scale-safe
at this size, super-linear = a quadratic lurking).

    python scripts/amplify_sf.py               # build .scratch/sf_amp8
    python scripts/scale_stress.py b135_column_profile b139_cusum_changepoint ...

Each query runs min-of-N (default 3) at --base (sf0.1) and --amp
(the 10× fixture); timing is a full collect() of the query result.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_query(fn, spark, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--amp", default=os.path.join(REPO, ".scratch/sf_amp8"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from spark_dynamodb_spark.registry import load_all

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    factor = os.environ.get("SPARK_GRAFT_AMP_FACTOR", "10")
    print(f"| operator | base | {factor}× | wall ratio for {factor}× data |")
    print("|---|---|---|---|")
    for name in args.names:
        fn = reg.resolve(name).fn
        b = time_query(fn, spark, args.base, args.runs)
        a = time_query(fn, spark, args.amp, args.runs)
        print(f"| {name} | {b:.2f} s | {a:.2f} s | {a / b:.2f}× |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
