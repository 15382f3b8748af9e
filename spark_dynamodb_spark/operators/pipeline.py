"""Training-data pipeline operators — SURVEY §2 Part C extensions
(round 2): the dataset-preparation steps a 100 TB pretraining corpus
pipeline runs after dedup/quality filtering.

All hashes that must match the oracle derive from md5 (engine-portable,
functions/text.py); everything is JVM built-ins — no Python in any hot
path.

Scale notes:
- train/val/test split and stratified sampling are pure narrow maps on
  a deterministic hash — zero shuffles beyond the final count/agg; the
  split is reproducible run-to-run and machine-to-machine, which is
  the property that matters for dataset governance (no RAND()).
- TF-IDF: one explode + two combinable aggregations; document
  frequency re-uses the token relation; the corpus size joins in as a
  1-row broadcast.
- vocabulary: groupBy token (combinable) + top-k window over the
  small aggregated relation.
- quantiles: exact percentiles per group — at 100 TB swap
  percentile() for percentile_approx() (same plan shape, sketch
  merge instead of sort); both are one combinable aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.text import (
    md5_64,
    sql_md5_64,
    sql_tokens,
    tokens,
)
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table

# split fractions: 90 / 5 / 5 over hash buckets 0..99
TRAIN_END, VAL_END = 90, 95


@query(
    "c06_train_split",
    f"""
    WITH b AS (
      SELECT n_chars,
             {sql_md5_64("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < {TRAIN_END} THEN 'train'
                WHEN bucket < {VAL_END} THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b
    GROUP BY split
    ORDER BY split
    """,
)
def train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6a: deterministic 90/5/5 train/val/test split by content-free
    id hash — reproducible across runs, engines, and partitionings
    (dataset governance forbids RAND() splits). Narrow map + one agg."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_64(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < TRAIN_END, "train")
        .when(bucket < VAL_END, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


@query(
    "c06_stratified_sample",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE {sql_md5_64("'salt7' || CAST(doc_id AS VARCHAR)")} % 10 = 0
    ORDER BY doc_id
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6b: deterministic ~10% sample, uniform WITHIN every source
    stratum because the hash is per-row (per-stratum rates would just
    change the modulus per source via a join against a rate table).
    Pure narrow filter — samples 100 TB without a shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    keep = md5_64(F.concat(F.lit("salt7"), F.col("doc_id").cast("string"))) % 10 == 0
    return docs.filter(keep).select("doc_id", "source").orderBy("doc_id")


@query(
    "c04_text_tfidf",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 9) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln(n.n_docs * 1.0 / df.df) DESC,
                                         tf.term) AS rnk
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rnk
    FROM scored
    WHERE rnk <= 5 AND doc_id < 100
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4g: TF-IDF with top-5 terms per document. Corpus statistics
    (document frequency, corpus size) aggregate combinably; the
    1-row corpus size broadcasts; the per-doc top-k is a window over
    the already-aggregated tf relation. The doc_id < 100 cut applies
    to the OUTPUT only — df/idf are corpus-wide, as they must be."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    score = F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(score.desc(), "term")
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 5) & (F.col("doc_id") < 100))
        .select("doc_id", "term", F.round(score, 9).alias("tfidf"), "rnk")
        .orderBy("doc_id", "rnk")
    )


@query(
    "c06_vocab_topk",
    f"""
    WITH tok AS (
      SELECT unnest({sql_tokens('text')}) AS token FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
    SELECT token, n,
           row_number() OVER (ORDER BY n DESC, token) AS vocab_id
    FROM counts
    ORDER BY vocab_id
    LIMIT 200
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6c: tokenizer vocabulary construction — corpus token counts,
    ranked, top-200. The groupBy is map-side combinable; the global
    rank runs over the aggregated (small) vocabulary relation only."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # top-k FIRST (TakeOrderedAndProject — no single-partition global
    # sort of the whole vocabulary), then rank the 200 survivors.
    top = counts.orderBy(F.col("n").desc(), "token").limit(200)
    w = Window.orderBy(F.col("n").desc(), "token")
    return top.withColumn("vocab_id", F.row_number().over(w)).orderBy("vocab_id")


@query(
    "c06_group_quantiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 9) AS p50,
           round(quantile_cont(l_quantity, 0.9), 9) AS p90,
           round(quantile_cont(l_quantity, 0.99), 9) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6d: exact per-group percentiles (length/score distribution
    profiling). Spark percentile() and DuckDB quantile_cont() share
    linear interpolation. At 100 TB switch to percentile_approx —
    identical plan shape, mergeable KLL-style sketch instead of a
    per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 9).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 9).alias("p90"),
            F.round(F.percentile("l_quantity", F.lit(0.99)), 9).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "c03_embedding_normalize",
    """
    WITH e AS (
      SELECT vec_id, label, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
      WHERE vec_id < 200
    )
    SELECT vec_id, label,
           round(nrm, 6) AS l2_norm,
           CAST(list_aggregate(list_transform(embedding,
                  x -> floor(CAST(x AS DOUBLE) / nrm * 127 + 0.5)), 'sum')
                AS BIGINT) AS quant_sum
    FROM e
    ORDER BY vec_id
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3d: embedding L2-normalization + int8 quantization — the
    storage-reduction step before ANN indexing. Everything is JVM
    higher-order functions over the array column (no Python, no
    explode); the checked output is the norm and the quantized-vector
    checksum (array outputs cannot be oracle-hashed). floor(x+0.5)
    rounding is engine-portable (round() half-modes differ)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = F.sqrt(sq)
    q_sum = F.aggregate(
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") / nrm * 127 + 0.5)
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return emb.select(
        "vec_id",
        "label",
        F.round(nrm, 6).alias("l2_norm"),
        q_sum.alias("quant_sum"),
    ).orderBy("vec_id")
