"""Sources: the "dynamo" Python DataSource over a keyed document store.

``io``-style sugar mirroring the reference's implicits
(``spark.read.dynamodb("t")`` / ``df.write.dynamodb("t")``,
SURVEY §2 A15):

    from spark_dynamodb_spark.sources import read_dynamo, write_dynamo
    df = read_dynamo(spark, "customer_kv", targetCapacity=0.5)
    write_dynamo(df, "customer_kv", update=True)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_dynamodb_spark.sources import keyed_store


def read_dynamo(spark: SparkSession, table: str, **options) -> DataFrame:
    from spark_dynamodb_spark.sources.dynamo import register

    register(spark)
    # Required for DynamoReader.pushFilters (off by default in 4.1).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # Resolve the store dir HERE on the driver: planning workers import
    # the package from the shipped zip, where __file__-relative paths
    # would resolve inside the archive.
    options.setdefault("storeDir", keyed_store.DEFAULT_STORE_DIR)
    reader = spark.read.format("dynamo").option("tableName", table)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def write_dynamo(df: DataFrame, table: str, **options) -> None:
    from spark_dynamodb_spark.sources.dynamo import register

    register(df.sparkSession)
    options.setdefault("storeDir", keyed_store.DEFAULT_STORE_DIR)
    writer = df.write.format("dynamo").option("tableName", table).mode("append")
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.save()
