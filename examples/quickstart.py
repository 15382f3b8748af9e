#!/usr/bin/env python
"""Quickstart: the four faces of the engine in one runnable script.

    python examples/quickstart.py [sf_dir]      # default sf0.001

1. The DynamoDB-shaped source ("dynamo" format): register, scan with
   pushdown + rate limiting, read through a GSI.
2. Relational surface: a TPC-H-style aggregate with exact-decimal
   double sums.
3. LLM-pipeline: MinHash-LSH near-dup pairs and SQ8 quantized ANN.
4. Streaming: a tumbling-window aggregate over the events fixture.

Every query here is a registered `queries()` entry — this script just
shows the library-style call pattern a migrating user would write.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from spark_dynamodb_spark.session import get_spark

    spark = get_spark("quickstart")

    # -- 1. the dynamo source ------------------------------------------------
    from spark_dynamodb_spark.sources.dynamo_queries import dynamo_scan

    print("== dynamo segmented scan (filters pushed into the source) ==")
    dynamo_scan(spark, sf_dir).show(3)

    # -- 2. relational: flagship Q1-style aggregate --------------------------
    from spark_dynamodb_spark.operators.aggregates import flagship

    print("== pricing summary (exact-decimal double sums) ==")
    flagship(spark, sf_dir).show(3)

    # -- 3. LLM pipeline: near-dup pairs + quantized ANN ---------------------
    from spark_dynamodb_spark.operators.dedup import dedup_minhash_lsh
    from spark_dynamodb_spark.operators.similarity import ann_int8_topk

    print("== MinHash-LSH verified near-dup pairs (J >= 0.8) ==")
    dedup_minhash_lsh(spark, sf_dir).show(3)
    print("== SQ8 int8-quantized cosine top-k ==")
    ann_int8_topk(spark, sf_dir).show(5)

    # -- 4. streaming: tumbling window over events ---------------------------
    from spark_dynamodb_spark.streaming.stream_queries import tumbling_window

    print("== streaming tumbling-window aggregate (availableNow) ==")
    tumbling_window(spark, sf_dir).show(3)

    print("quickstart OK")


if __name__ == "__main__":
    main()
