"""Reusable column-expression helpers.

All helpers return Catalyst Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen-eligible.
No Python UDFs live here.
"""

from spark_dynamodb_spark.functions.exact import dsum, davg, sql_dsum, sql_davg  # noqa: F401
from spark_dynamodb_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from spark_dynamodb_spark.functions.text import (  # noqa: F401
    normalize_text,
    tokens,
    shingles,
    md5_64,
)
