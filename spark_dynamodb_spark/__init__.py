"""spark_dynamodb_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``audienceproject/spark-dynamodb``.

The reference (SURVEY.md §0 — reconstructed from public knowledge; the
read-only mount at /root/reference was empty) is a Spark DataSource V2
connector for AWS DynamoDB: a keyed-document source/sink with
segmented parallel scans, filter/projection pushdown, rate limiting,
and batch/update/delete writes, delegating all relational operators to
Spark. This package re-expresses that surface Spark-first:

- ``sources/``   — the "dynamo" Python DataSource over a keyed document
                   store (SURVEY §2 Part A), with segment partitions,
                   ``pushFilters`` and a token-bucket rate limiter.
- ``operators/`` — the delegated relational surface (SURVEY §2 Part B)
                   plus LLM-data-pipeline operators (Part C: dedup,
                   similarity search, text analysis, multimodal).
- ``functions/`` — reusable column expression helpers (vector math,
                   text shingling/hashing) built on pyspark.sql.functions.
- ``streaming/`` — Structured Streaming windows/watermark/upsert
                   (SURVEY §2 B27–B31).
- ``plans/``     — plan-inspection helpers (pushdown/broadcast checks).

Everything is DataFrame/SQL-first: Catalyst does pushdown, pruning and
join selection; Python UDFs appear only where built-ins cannot express
the semantics (Arrow-batched, never row-at-a-time in hot paths).
"""

from spark_dynamodb_spark.registry import REGISTRY, query  # noqa: F401

__version__ = "0.1.0"
