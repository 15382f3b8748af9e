"""Scalar function surface — SURVEY.md §2 B20–B25.

String, date/time, math, array, JSON and conditional expressions.
All JVM-side built-ins inside whole-stage codegen; the oracle SQL uses
the matching DuckDB spellings (dialects differ: get_json_object →
json_extract_string, split → string_split, etc.).

Math note: transcendental functions (log, pow with fractional args)
can differ by 1 ulp between Java's StrictMath and DuckDB's libm, so
those outputs are rounded to 9 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table


@query(
    "b20_strings",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 1, 8) AS name_prefix,
           c_name || '/' || c_mktsegment AS name_seg,
           trim(c_name) AS name_trim,
           length(c_name) AS name_len,
           regexp_extract(c_name, '[0-9]+', 0) AS name_digits,
           array_to_string(string_split(c_name, '#'), '|') AS name_parts,
           replace(c_mktsegment, 'A', '_') AS seg_repl,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded
    FROM customer
    ORDER BY c_custkey
    """,
)
def strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: string function family."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim("c_name").alias("name_trim"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("name_digits"),
        # split() stays in the plan; the checked output is stringified —
        # array-typed result columns crash the driver's canonicalizer
        # (CORRECTNESS_r01 b20_strings).
        F.array_join(F.split("c_name", "#"), "|").alias("name_parts"),
        F.regexp_replace("c_mktsegment", "A", "_").alias("seg_repl"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
    ).orderBy("c_custkey")


@query(
    "b21_datetime",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(dayofweek(o_orderdate) AS INT) % 7 + 1 AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS date_str,
           o_orderdate + INTERVAL 90 DAY AS due_ts,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: date/time family on o_orderdate.

    Dialect notes: Spark dayofweek is 1=Sunday; DuckDB dayofweek is
    0=Sunday — the oracle maps (dow % 7 + 1) to Spark's convention.
    Spark datediff(end, start) counts date boundaries like DuckDB
    datediff('day', start, end).
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    ).orderBy("o_orderkey")


@query(
    "b22_math",
    """
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           abs(p_retailprice - 1000.0) AS dist_1000,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(sqrt(p_retailprice), 9) AS price_sqrt,
           round(ln(p_retailprice), 9) AS price_ln,
           round(pow(p_size, 2.0), 9) AS size_sq,
           CAST(p_size AS BIGINT) % 7 AS size_mod,
           CAST(sign(p_retailprice - 1500.0) AS DOUBLE) AS above_1500
    FROM part
    ORDER BY p_partkey
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: math family. Transcendentals rounded to 9 dp (ulp drift).

    Integer-vs-float result types are pinned with explicit casts on
    BOTH sides: Spark ceil/floor return BIGINT while DuckDB's return
    DOUBLE, and signum returns DOUBLE while DuckDB sign is integral —
    values match but the driver's stringified hash sees "1500" vs
    "1500.0" (CORRECTNESS_r01 b22_math).
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_1000"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 9).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 9).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2.0)), 9).alias("size_sq"),
        (F.col("p_size").cast("bigint") % 7).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1500.0).cast("double").alias("above_1500"),
    ).orderBy("p_partkey")


@query(
    "b23_arrays",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(CAST(list_aggregate(embedding[1:8], 'sum') AS DOUBLE), 6) AS head_sum,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
)
def arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: array functions over the 64-d embedding column.

    float32 sums accumulate in float64 via explicit casts on both
    sides; rounded to 6 dp because DuckDB list_aggregate sums in
    float32 order — cast elements first, then the reduce matches.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    head = F.slice("embedding", 1, 8)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
        ).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    ).orderBy("vec_id")


@query(
    "b23_explode",
    """
    SELECT t.word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
    GROUP BY t.word
    ORDER BY n DESC, t.word
    LIMIT 20
    """,
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23b: explode (lateral unnest) → word frequency."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@query(
    "b24_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: JSON extraction from events.props (mirrors the reference's
    schemaless document attributes, SURVEY §1.1 — a DynamoDB item's
    nested map arrives as a JSON-ish document)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
    ).orderBy("event_id")


@query(
    "b24_from_json_struct",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           event_type = 'purchase' AS is_purchase
    FROM events
    WHERE user_id = 1
    ORDER BY event_id
    """,
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24b: from_json into a typed struct, then field access — the
    typed-read path (SURVEY §2 A14: schema-on-read of document data)."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.select(
        "event_id",
        F.from_json("props", schema).getField("k").alias("k"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    ).orderBy("event_id")


@query(
    "b23_maps",
    """
    WITH m AS (
      SELECT event_id,
             MAP(['k', 'u'], [CAST(json_extract_string(props, '$.k') AS BIGINT), user_id]) AS props_map
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           array_to_string(map_keys(props_map), '|') AS ks,
           array_to_string(list_transform(map_values(props_map), x -> CAST(x AS VARCHAR)), '|') AS vs,
           props_map['k'][1] AS k_val,
           cardinality(props_map) AS n_entries
    FROM m
    ORDER BY event_id
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23c: map construction + map_keys/map_values/element_at —
    DynamoDB M-type surface (SURVEY §1.2) as first-class map columns.

    The map ops stay in the plan; the checked ks/vs outputs are
    stringified with array_join because array-typed result columns
    crash the driver's canonicalizer (CORRECTNESS_r01 b23_maps).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").cast("bigint"),
        F.lit("u"),
        F.col("user_id"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), "|").alias("ks"),
        F.array_join(F.transform(F.map_values(m), lambda x: x.cast("string")), "|").alias("vs"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_entries"),
    ).orderBy("event_id")


@query(
    "b16_window_last_ignorenulls",
    """
    SELECT c_custkey, c_nationkey,
           last_value(CASE WHEN c_acctbal > 0 THEN c_acctbal END IGNORE NULLS)
             OVER (PARTITION BY c_nationkey ORDER BY c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_positive_bal
    FROM customer
    ORDER BY c_custkey
    """,
)
def window_last_ignorenulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16b: last_value with IGNORE NULLS — carry-forward of the most
    recent positive balance per nation (the gap-fill idiom)."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    positive = F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.last(positive, ignorenulls=True).over(w).alias("last_positive_bal"),
    ).orderBy("c_custkey")


@query(
    "b25_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 5000 THEN 'high'
                WHEN o_totalprice > 1000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END AS urgent_price,
           least(o_totalprice, 2000.0) AS capped,
           greatest(o_totalprice, 100.0) AS floored
    FROM orders
    ORDER BY o_orderkey
    """,
)
def conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: CASE/coalesce/nullif/least/greatest."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 5000, "high")
        .when(F.col("o_totalprice") > 1000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
        .otherwise(0.0)
        .alias("urgent_price"),
        F.least("o_totalprice", F.lit(2000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(100.0)).alias("floored"),
    ).orderBy("o_orderkey")


@query(
    "b46_regexp_extract_all",
    """
    SELECT event_id,
           array_to_string(regexp_extract_all(props, '[0-9]+'), '|') AS nums,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_nums,
           regexp_matches(props, '"k":\\s*[0-9]') AS has_k,
           regexp_replace(props, '[0-9]+', '#', 'g') AS masked
    FROM events
    ORDER BY event_id
    """,
)
def regexp_extract_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20b: regexp surface — extract-all (stringified: array outputs
    crash the driver canonicalizer), match-count, rlike, global
    replace over the JSON props column.

    All four are JVM-side codegen'd regex ops (no Python); at 100 TB
    the regex runs where the row is, and the pattern is a literal so
    it compiles once per task."""
    ev = load_table(spark, sf_dir, "events")
    pat = "[0-9]+"
    return ev.select(
        "event_id",
        F.array_join(F.regexp_extract_all("props", F.lit(pat), 0), "|").alias("nums"),
        F.size(F.regexp_extract_all("props", F.lit(pat), 0)).alias("n_nums"),
        F.col("props").rlike('"k":\\s*[0-9]').alias("has_k"),
        F.regexp_replace("props", pat, "#").alias("masked"),
    ).orderBy("event_id")


@query(
    "b48_string_distance",
    """
    SELECT p_partkey,
           levenshtein(p_brand, p_type) AS lev,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS vowel_runs,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
    FROM part
    ORDER BY p_partkey
    """,
)
def string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20c: string-distance and -shaping surface — Levenshtein edit
    distance (the fuzzy-match primitive), split_part, regexp match
    count, reverse, zero-pad. All JVM codegen'd; no Python.

    At 100 TB these are narrow per-row ops inside whole-stage
    codegen; levenshtein is the building block for fuzzy dedup
    blocking (pair it with c02's LSH candidates rather than running
    it all-pairs)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").alias("lev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]+"), 0)).alias(
            "vowel_runs"
        ),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# B55 — error-safe (try_*) arithmetic surface (round 3)
# ---------------------------------------------------------------------------

@query(
    "b55_try_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_linenumber - 3, 0) AS safe_div,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS ln_roundtrip,
           ([l_returnflag, l_linestatus])[l_linenumber] AS maybe_flag
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25b/B55: error-safe expression surface — Spark 4 runs in ANSI
    mode where division by zero, bad casts and out-of-range element
    access THROW; the try_* family is the production idiom for "null,
    don't crash" over dirty data. try_divide hits a real zero divisor
    (linenumber 3), try_cast a non-numeric string, try_element_at an
    out-of-bounds index.

    DuckDB has no try_divide/try_element_at; the oracle mirrors with
    nullif-guarded division and native out-of-bounds-is-NULL list
    indexing, which define the same results.

    Scale: all narrow codegen'd per-row expressions — the point is
    semantic coverage, not plan shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 3).alias(
            "safe_div"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("ln_roundtrip"),
        F.try_element_at(
            F.array("l_returnflag", "l_linestatus"), F.col("l_linenumber")
        ).alias("maybe_flag"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "b91_variant_json",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events
    ORDER BY event_id
    """,
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B91: the Spark 4 VARIANT type — parse_json() produces an
    open-schema binary-encoded value; variant_get extracts typed
    paths without a declared struct schema (the semi-structured path
    for columns whose shape drifts, vs b24's string-walking
    get_json_object and the fixed-schema from_json). The extracted
    values compute downstream like ordinary columns; DuckDB's JSON
    type mirrors the semantics.

    try_variant_get on an absent path yields NULL (error-safe
    spelling, mirroring b55's try_* discipline).

    Scale shape: narrow codegen map — VARIANT parses once per row and
    both extractions read the same parsed value; at 100 TB this
    replaces two string re-parses per extraction with one binary
    decode.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.variant_get(v, "$.k", "int").alias("k_int"),
            (F.variant_get(v, "$.k", "int") % 10).alias("k_mod"),
            F.try_variant_get(v, "$.missing", "string").alias("missing"),
        )
        .orderBy("event_id")
    )


@query(
    "b92_higher_order_functions",
    """
    WITH t AS (
      SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber) AS qs
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), qs),
                            (acc, x) -> acc + x) AS DOUBLE) AS total_qty,
           len(list_filter(qs, x -> x >= 25)) AS n_bulk,
           CAST(list_reduce(list_prepend(FALSE, list_transform(qs, x -> x > 45)),
                            (acc, x) -> acc OR x) AS BOOLEAN) AS any_huge,
           CAST(list_reduce(list_prepend(TRUE, list_transform(qs, x -> x > 0)),
                            (acc, x) -> acc AND x) AS BOOLEAN) AS all_positive
    FROM t
    ORDER BY l_orderkey
    LIMIT 500
    """,
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B92: the higher-order-function surface as a first-class query —
    aggregate (fold), filter, exists, forall over per-order quantity
    arrays. Several C-family operators lean on these internally; this
    entry pins their SEMANTICS directly against DuckDB's lambda
    spellings (list_reduce with a seeded prepend = F.aggregate's
    explicit zero; exists/forall = folded OR/AND).

    Determinism: the fold runs left-to-right over an ORDER BY
    l_linenumber array in both engines — accumulation order is pinned
    by construction, so even the double sum is bit-stable.

    Scale shape: one orderkey rollup builds the arrays (tiny groups);
    every lambda then runs inside codegen per row.
    """
    ev = load_table(spark, sf_dir, "lineitem")
    qs = F.array_sort(
        F.collect_list(F.struct("l_linenumber", "l_quantity"))
    )
    t = (
        ev.groupBy("l_orderkey")
        .agg(
            F.transform(qs, lambda s: s["l_quantity"]).alias("qs")
        )
    )
    return (
        t.select(
            "l_orderkey",
            F.aggregate(
                "qs", F.lit(0.0), lambda acc, x: acc + x
            ).alias("total_qty"),
            F.size(F.filter("qs", lambda x: x >= 25)).alias("n_bulk"),
            F.exists("qs", lambda x: x > 45).alias("any_huge"),
            F.forall("qs", lambda x: x > 0).alias("all_positive"),
        )
        .orderBy("l_orderkey")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# B131 — corrupt-record JSON ingestion (round 6)
# ---------------------------------------------------------------------------


@query(
    "b131_corrupt_json_handling",
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN '{"lang":"' || lang || '","n":' || CAST(n_chars AS VARCHAR) || '}'
                  ELSE '{"lang":"' || lang || '","n":' || CAST(n_chars AS VARCHAR)
             END AS payload
      FROM documents),
    parsed AS (
      SELECT doc_id,
             CASE WHEN json_valid(payload)
                  THEN json_extract_string(payload, '$.lang') END AS lang,
             CASE WHEN json_valid(payload)
                  THEN CAST(json_extract(payload, '$.n') AS BIGINT) END AS n,
             NOT json_valid(payload) AS corrupt
      FROM raw)
    SELECT coalesce(lang, '_corrupt') AS lang,
           COUNT(*) AS n_records,
           CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(coalesce(n, 0)) AS BIGINT) AS sum_n
    FROM parsed
    GROUP BY 1
    ORDER BY 1
    """,
)
def corrupt_json_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B131: PERMISSIVE-mode semi-structured ingestion — a JSON
    payload column where every third record is truncated (planted
    deterministically: doc_id % 3 != 0 drops the closing brace).
    from_json returns null for the corrupt rows instead of failing
    the job — they roll up under a '_corrupt' key with their count,
    exactly the quarantine-and-continue contract of PERMISSIVE /
    badRecordsPath ingestion at 100 TB (one bad crawl record must
    never kill a 6-hour job).

    Scale shape: narrow parse (one Jackson pass in codegen), one
    combinable rollup keyed by the recovered lang; no shuffle before
    the rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    good = F.concat(
        F.lit('{"lang":"'),
        F.col("lang"),
        F.lit('","n":'),
        F.col("n_chars").cast("string"),
        F.lit("}"),
    )
    bad = F.concat(
        F.lit('{"lang":"'),
        F.col("lang"),
        F.lit('","n":'),
        F.col("n_chars").cast("string"),
    )
    payload = F.when(F.col("doc_id") % 3 == 0, good).otherwise(bad)
    parsed = docs.select(
        "doc_id",
        F.from_json(
            payload, "lang STRING, n BIGINT"
        ).alias("j"),
        payload.alias("payload"),
    ).select(
        "doc_id",
        F.col("j.lang").alias("lang"),
        F.col("j.n").alias("n"),
        # PERMISSIVE from_json yields a struct of nulls (not a null
        # struct) for malformed input; the source lang is never null,
        # so a null recovered lang IS the corruption signal.
        F.col("j.lang").isNull().alias("corrupt"),
    )
    return (
        parsed.groupBy(
            F.coalesce("lang", F.lit("_corrupt")).alias("lang")
        )
        .agg(
            F.count("*").alias("n_records"),
            F.sum(F.col("corrupt").cast("long")).alias("n_corrupt"),
            F.sum(F.coalesce("n", F.lit(0))).alias("sum_n"),
        )
        .orderBy("lang")
    )
