#!/usr/bin/env python
"""Build the 10× scale-stress fixture (PLANS.md amplification tables).

Amplifies the sf0.1 FACT tables 10× with key shifts that preserve
join/dup structure (dims pass through untouched), writing a directory
usable as a ``sf_dir`` by every registry query:

    python scripts/amplify_sf.py [--src /root/testdata/sf0.1] \
        [--out .scratch/sf_amp8]

- lineitem/orders: replica r shifts l_orderkey/o_orderkey by
  r * 10^7 (same orders exist for every lineitem replica; FK targets
  l_partkey/l_suppkey/o_custkey stay valid against the unamplified
  dims, so integrity audits see 10× probe volume with the same
  verdicts).
- events: event_id shifted; (user_id, ts, type, value) kept — time
  series get 10× points per (type, day) bucket.
- documents: doc_id shifted by r * 10^6 and per-replica text
  perturbation (replica tag appended to ~1-in-7 docs) so corpus
  dup-structure amplifies like real near-dup clusters (round-6
  recipe).
- embeddings: vec_id shifted; one dimension nudged by a tiny
  replica-dependent epsilon so no two replicas are bit-identical
  vectors (breaks cosine ties, preserves neighborhoods).
- dims (region nation customer supplier part): copied reference via
  symlink — unchanged.

The output is a scratch fixture (NOT checked in; ~10× sf0.1 bytes).
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPLICAS = 10
KEY_SHIFT = 10_000_000
DOC_SHIFT = 1_000_000
DIMS = ("region", "nation", "customer", "supplier", "part")


def amplified(df, key_cols: dict[str, int], extra=None, replicas: int = REPLICAS):
    parts = []
    for r in range(replicas):
        d = df
        for col, shift in key_cols.items():
            d = d.withColumn(col, F.col(col) + F.lit(r * shift))
        if extra is not None:
            d = extra(d, r)
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scratch/sf_amp8")
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument(
        "--docs-only",
        action="store_true",
        help="amplify only documents (100x-class runs); other facts symlink",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def rd(t):
        return spark.read.parquet(f"{args.src}/{t}.parquet")

    def wr(df, t):
        df.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")

    R = args.replicas
    passthrough = []
    if args.docs_only:
        passthrough += ["lineitem", "orders", "events", "embeddings"]
    else:
        wr(amplified(rd("lineitem"), {"l_orderkey": KEY_SHIFT}, replicas=R), "lineitem")
        wr(amplified(rd("orders"), {"o_orderkey": KEY_SHIFT}, replicas=R), "orders")
        wr(amplified(rd("events"), {"event_id": KEY_SHIFT}, replicas=R), "events")

    def perturb_doc(d, r):
        if r == 0:
            return d
        return d.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(f" replica{r}")),
            ).otherwise(F.col("text")),
        )

    wr(
        amplified(rd("documents"), {"doc_id": DOC_SHIFT}, perturb_doc, replicas=R)
        .repartition(32),
        "documents",
    )

    def perturb_vec(d, r):
        if r == 0:
            return d
        eps = float(r) * 1e-4
        return d.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x + F.lit(eps)).otherwise(x),
            ),
        )

    if not args.docs_only:
        wr(
            amplified(rd("embeddings"), {"vec_id": DOC_SHIFT}, perturb_vec, replicas=R),
            "embeddings",
        )

    for t in DIMS + tuple(passthrough):
        dst = f"{args.out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{args.src}/{t}.parquet"), dst)
    print(f"amplified fixture at {args.out}")


if __name__ == "__main__":
    main()
