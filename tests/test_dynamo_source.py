"""Dynamo source tests — the local analog of the reference's
DynamoDB-Local suite (SURVEY §5): round-trips, pushdown agreement,
partition planning, rate limiting, schemaless inference."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from spark_dynamodb_spark.sources import keyed_store, read_dynamo, write_dynamo
from spark_dynamodb_spark.sources.rate_limiter import TokenBucket
from spark_dynamodb_spark.tables import load_table


@pytest.fixture(scope="module")
def customer_kv(spark, sf_dir):
    name = "t_customer_kv"
    keyed_store.create_table(
        spark,
        load_table(spark, sf_dir, "customer"),
        name,
        hash_key="c_custkey",
        n_segments=4,
    )
    return name


def test_roundtrip_equals_parquet(spark, sf_dir, customer_kv):
    via_dynamo = read_dynamo(spark, customer_kv).orderBy("c_custkey").collect()
    via_parquet = load_table(spark, sf_dir, "customer").orderBy("c_custkey").collect()
    assert via_dynamo == via_parquet


def test_pushed_vs_unpushed_agreement(spark, customer_kv):
    """Same predicate with filterPushdown on/off must agree (the
    reference's pushed-vs-postScan invariant, SURVEY §5)."""
    pred = (
        (F.col("c_acctbal") > 0)
        & F.col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD")
        & F.col("c_name").contains("1")
    )
    pushed = read_dynamo(spark, customer_kv).filter(pred).orderBy("c_custkey").collect()
    unpushed = (
        read_dynamo(spark, customer_kv, filterPushdown="false")
        .filter(pred)
        .orderBy("c_custkey")
        .collect()
    )
    assert pushed == unpushed
    assert len(pushed) > 0


def test_residual_endswith(spark, customer_kv):
    """StringEndsWith is NOT translatable (SURVEY §4.1) — must still
    evaluate correctly via Spark's post-scan filter."""
    rows = (
        read_dynamo(spark, customer_kv)
        .filter(F.col("c_name").endswith("7"))
        .collect()
    )
    assert all(r.c_name.endswith("7") for r in rows)
    assert len(rows) > 0


def test_read_partitions_option(spark, customer_kv):
    df = read_dynamo(spark, customer_kv, readPartitions=2)
    assert df.rdd.getNumPartitions() == 2
    df4 = read_dynamo(spark, customer_kv)
    assert df4.rdd.getNumPartitions() == 4  # one per segment file


def test_projection_option(spark, customer_kv):
    df = read_dynamo(spark, customer_kv, columns="c_custkey,c_acctbal")
    assert df.columns == ["c_custkey", "c_acctbal"]


def test_key_fields_non_nullable(spark, customer_kv):
    schema = read_dynamo(spark, customer_kv).schema
    assert not schema["c_custkey"].nullable  # key attribute (SURVEY §1.2)
    assert schema["c_name"].nullable


def test_write_put_upsert(spark, customer_kv):
    base = read_dynamo(spark, customer_kv)
    one = base.filter(F.col("c_custkey") == 1).withColumn("c_acctbal", F.lit(9999.0))
    write_dynamo(one, customer_kv)
    got = read_dynamo(spark, customer_kv).filter(F.col("c_custkey") == 1).collect()
    assert len(got) == 1 and got[0].c_acctbal == 9999.0


def test_token_bucket_timing():
    bucket = TokenBucket(rate=100.0, burst=10.0)
    t0 = time.monotonic()
    bucket.acquire(10)  # burst, free
    assert time.monotonic() - t0 < 0.05
    bucket.acquire(50)  # must wait ~0.5s
    assert time.monotonic() - t0 >= 0.45


def test_rate_limited_scan_slower(spark, sf_dir):
    """targetCapacity/throughput throttle the scan (A8)."""
    name = "t_rate_kv"
    keyed_store.create_table(
        spark,
        load_table(spark, sf_dir, "nation"),
        name,
        hash_key="n_nationkey",
        n_segments=1,
    )
    t0 = time.monotonic()
    read_dynamo(spark, name).count()
    fast = time.monotonic() - t0
    # nation arrow batch ~523B; throughput=1 RCU, bytesPerRCU=150 →
    # ~3.5 units at 1/s with burst 1 → ~2.5s sleep.
    t0 = time.monotonic()
    read_dynamo(spark, name, throughput=1, bytesPerRCU=150).count()
    slow = time.monotonic() - t0
    assert slow > fast + 1.0


def test_jsonl_schemaless_inference(spark, tmp_path):
    """Heterogeneous documents: schema = sampled union of attributes;
    missing attribute → null; numeric widening long→double (A3/§1.2)."""
    tdir = tmp_path / "docs_kv" / "data"
    tdir.mkdir(parents=True)
    docs = [
        {"pk": 1, "name": "a", "qty": 5},
        {"pk": 2, "name": "b", "price": 1.5, "tags": ["x", "y"]},
        {"pk": 3, "qty": 2.5, "meta": {"k": 1}},
    ]
    with open(tdir / "seg-0.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    keyed_store.write_meta(
        str(tmp_path),
        "docs_kv",
        {
            "table": "docs_kv",
            "hash_key": "pk",
            "range_key": None,
            "rcu": 0,
            "wcu": 0,
            "gsis": [],
            "format": "jsonl",
            "n_segments": 1,
        },
    )
    df = read_dynamo(spark, "docs_kv", storeDir=str(tmp_path))
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["pk"] == "bigint"
    assert schema["qty"] == "double"  # long ∪ double widens
    assert schema["tags"] == "array<string>"
    assert schema["meta"] == "map<string,bigint>"
    rows = {r.pk: r for r in df.collect()}
    assert rows[1].qty == 5.0 and rows[1].price is None
    assert rows[2].tags == ["x", "y"]
    # pushdown works on the document path too
    got = df.filter(F.col("qty") > 3).collect()
    assert [r.pk for r in got] == [1]


def test_gsi_read_matches_base(spark, sf_dir):
    name = "t_events_kv"
    keyed_store.create_table(
        spark,
        load_table(spark, sf_dir, "events"),
        name,
        hash_key="user_id",
        range_key="ts",
        gsis=[{"name": "by_type", "hash_key": "event_type", "range_key": "ts"}],
        n_segments=4,
    )
    via_gsi = (
        read_dynamo(spark, name, indexName="by_type")
        .filter(F.col("event_type") == "click")
        .orderBy("event_id")
        .collect()
    )
    via_base = (
        read_dynamo(spark, name)
        .filter(F.col("event_type") == "click")
        .orderBy("event_id")
        .collect()
    )
    assert via_gsi == via_base and len(via_gsi) > 0


def test_delete_then_empty_read(spark, sf_dir):
    name = "t_del_all"
    base = load_table(spark, sf_dir, "region")
    keyed_store.create_table(spark, base, name, hash_key="r_regionkey", n_segments=1)
    write_dynamo(base, name, delete=True)
    assert read_dynamo(spark, name).count() == 0


def test_set_column_dedup_on_write(spark, tmp_path):
    """SS/NS/BS set semantics: uniqueness enforced on write (§1.2)."""
    df = spark.createDataFrame(
        [(1, ["b", "a", "b", "a"]), (2, ["x"])], "pk long, tags array<string>"
    )
    keyed_store.create_table(
        spark, df.limit(0), "t_sets", hash_key="pk", n_segments=1,
        set_columns=["tags"],
    )
    write_dynamo(df, "t_sets")
    rows = {r.pk: r.tags for r in read_dynamo(spark, "t_sets").collect()}
    assert rows[1] == ["a", "b"]  # deduped + sorted
    assert rows[2] == ["x"]


def test_nested_types_roundtrip(spark):
    """Nested list/map/struct round-trip through the source (the
    reference's TestDataTypes coverage, SURVEY §5)."""
    df = spark.createDataFrame(
        [
            (1, ["a", "b"], {"k": 1.5}, (7, "x"), bytearray(b"\x01\x02")),
            (2, [], {}, (8, None), bytearray(b"")),
        ],
        "pk long, arr array<string>, m map<string,double>, "
        "s struct<f1:int,f2:string>, blob binary",
    )
    keyed_store.create_table(spark, df, "t_nested", hash_key="pk", n_segments=1)
    back = {r.pk: r for r in read_dynamo(spark, "t_nested").collect()}
    orig = {r.pk: r for r in df.collect()}
    for pk in (1, 2):
        assert back[pk].arr == orig[pk].arr
        assert back[pk].m == orig[pk].m
        assert back[pk].s == orig[pk].s
        assert bytes(back[pk].blob) == bytes(orig[pk].blob)


def test_missing_table_raises_clearly(spark):
    with pytest.raises(Exception, match="(No such file|not exist|_meta)"):
        read_dynamo(spark, "no_such_table_xyz").collect()


def test_missing_tablename_option_raises(spark):
    from spark_dynamodb_spark.sources.dynamo import register

    register(spark)
    with pytest.raises(Exception, match="tableName"):
        spark.read.format("dynamo").load().collect()


def test_unknown_projection_column_raises(spark, customer_kv):
    with pytest.raises(Exception):
        read_dynamo(spark, customer_kv, columns="c_custkey,nope").collect()
