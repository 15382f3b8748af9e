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
    simple_tokens,
    sql_md5_64,
    sql_simple_tokens,
    sql_tokens,
    tokens,
)
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import EVENTS_TS_SQL, load_table

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


@query(
    "c04_text_pmi",
    f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens('text')} AS t FROM documents
    ),
    bigrams AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(t) - 1, 0)),
               i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS bg
      FROM toks
    ),
    bg_counts AS (
      SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS n_bg FROM bigrams GROUP BY 1, 2
    ),
    uni AS (
      SELECT unnest(t) AS w FROM toks
    ),
    uni_counts AS (SELECT w, COUNT(*) AS n_w FROM uni GROUP BY w),
    totals AS (
      SELECT (SELECT CAST(SUM(n_bg) AS BIGINT) FROM bg_counts) AS n_pairs,
             (SELECT CAST(SUM(n_w) AS BIGINT) FROM uni_counts) AS n_toks
    )
    SELECT w1, w2, n_bg,
           round(ln((n_bg * 1.0 / n_pairs)
                    / ((a.n_w * 1.0 / n_toks) * (b.n_w * 1.0 / n_toks))), 9) AS pmi
    FROM bg_counts
    JOIN uni_counts a ON a.w = w1
    JOIN uni_counts b ON b.w = w2
    CROSS JOIN totals
    WHERE n_bg >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 100
    """,
)
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4h: PMI bigram collocations — ln(p(ab) / (p(a)p(b))) for
    bigrams seen ≥5 times, top-100. Corpus statistics are combinable
    aggregates; the two unigram joins run against the (small)
    aggregated vocabulary, so AQE broadcasts them; totals join in as a
    1-row broadcast. The n_bg >= 5 support cut prunes the bigram
    relation BEFORE the joins — at 100 TB that filter is what keeps
    the collocation join bounded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("t"))
    bg_structs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("t") - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at("t", i).alias("w1"), F.element_at("t", i + 1).alias("w2")
        ),
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(F.explode(bg_structs).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_bg"))
        .filter(F.col("n_bg") >= 5)
    )
    uni = (
        toks.select(F.explode("t").alias("w")).groupBy("w").agg(F.count("*").alias("n_w"))
    )
    # 1-row totals; n_pairs must count ALL bigrams (pre-support-cut)
    n_pairs = (
        toks.filter(F.size("t") >= 2)
        .select(F.sum(F.size("t") - 1).alias("n_pairs"))
    )
    n_toks = toks.select(F.sum(F.size("t")).alias("n_toks"))
    a = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("na"))
    b = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("nb"))
    pmi = F.log(
        (F.col("n_bg") / F.col("n_pairs"))
        / ((F.col("na") / F.col("n_toks")) * (F.col("nb") / F.col("n_toks")))
    )
    return (
        bg.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_toks))
        .select("w1", "w2", "n_bg", F.round(pmi, 9).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(100)
    )


@query(
    "b34_cdc_latest_per_key",
    f"""
    WITH e AS (SELECT event_id, user_id, event_type, value, {EVENTS_TS_SQL} AS ts
               FROM events),
    r AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM e
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM r WHERE rn = 1
    ORDER BY user_id
    """,
)
def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34: batch CDC compaction — latest record per key by event
    time (ties broken by event_id), the materialize-a-changelog op
    every ingestion pipeline runs. One shuffle on the key; at 100 TB
    pre-bucketing the changelog by key makes this shuffle-free."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


@query(
    "b35_approx_quantile",
    """
    SELECT p_brand,
           quantile_disc(p_retailprice, 0.25) AS q25,
           quantile_disc(p_retailprice, 0.50) AS q50,
           quantile_disc(p_retailprice, 0.75) AS q75,
           COUNT(*) AS n
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: sketch-based quantiles — percentile_approx (Greenwald-
    Khanna, mergeable across partitions: one combinable shuffle, no
    sort) per group. At accuracy >= group size the sketch is exact and
    lands on the same nearest-rank element as DuckDB quantile_disc,
    which is what gives this op a value-level oracle; at 100 TB the
    user dials accuracy down (e.g. 100) and the same plan streams in
    O(accuracy) memory per group instead of sorting each group."""
    part = load_table(spark, sf_dir, "part")
    acc = 1_000_000  # >= any sf's per-brand group size → exact path
    return (
        part.groupBy("p_brand")
        .agg(
            F.percentile_approx("p_retailprice", 0.25, acc).alias("q25"),
            F.percentile_approx("p_retailprice", 0.50, acc).alias("q50"),
            F.percentile_approx("p_retailprice", 0.75, acc).alias("q75"),
            F.count("*").alias("n"),
        )
        .orderBy("p_brand")
    )


def _sql_corpus_prep() -> str:
    from spark_dynamodb_spark.functions.text import sql_normalize_text
    from spark_dynamodb_spark.operators.dedup import SQL_EXACT_JACCARD_PAIRS
    from spark_dynamodb_spark.operators.text_analysis import _sql_langid

    langid_body = _sql_langid().replace("ORDER BY doc_id", "")
    pairs_body = SQL_EXACT_JACCARD_PAIRS.replace("ORDER BY doc_a, doc_b", "")
    return f"""
    WITH RECURSIVE
    lang AS ({langid_body}),
    qual AS (
      SELECT doc_id, toks,
             (len(toks) BETWEEN 10 AND 100000)
               AND (CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum')
                    AS DOUBLE) / len(toks)) BETWEEN 2.0 AND 12.0 AS quality_ok
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    ex AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5({sql_normalize_text('text')})) AS exact_keep
      FROM documents
    ),
    pairs AS ({pairs_body}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component_id FROM reach GROUP BY id)
    SELECT d.doc_id, d.source,
           lang.predicted_lang = 'en' AS lang_ok,
           qual.quality_ok,
           d.doc_id = ex.exact_keep AS exact_canonical,
           d.doc_id = comp.component_id AS neardup_canonical,
           lang.predicted_lang = 'en' AND qual.quality_ok
             AND d.doc_id = ex.exact_keep
             AND d.doc_id = comp.component_id AS kept,
           CASE WHEN lang.predicted_lang != 'en' THEN 'lang'
                WHEN NOT qual.quality_ok THEN 'quality'
                WHEN d.doc_id != ex.exact_keep THEN 'exact_dup'
                WHEN d.doc_id != comp.component_id THEN 'near_dup'
           END AS drop_reason
    FROM documents d
    JOIN lang USING (doc_id)
    JOIN qual USING (doc_id)
    JOIN ex USING (doc_id)
    JOIN comp USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "c07_corpus_prep",
    _sql_corpus_prep(),
    doc="""End-to-end keep-list: every stage verdict oracle-checked via
    the composed SQL of the stage fragments (langid, quality rules,
    window-min exact dedup, recursive-CTE components).""",
)
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: the end-to-end training-corpus prep pipeline — the flagship
    COMPOSITION query. Every document is annotated with each cleaning
    stage's verdict and the first failing stage:

      lang       n-gram marker language-ID says not-English
      quality    Gopher-style length/token-shape rules fail
      exact_dup  another doc has the same normalized content hash
      near_dup   doc is a non-canonical member of a MinHash-LSH
                 duplicate component (c02_dedup_components)

    kept = passes all four — the rows a tokenizer run would consume.

    Scale shape: stages are independent single-shuffle plans over the
    same corpus scan, joined back on doc_id (co-partitioned after the
    first exchange; AQE reuses it). Nothing quadratic, nothing
    collected: at 100 TB this is 4 passes + an O(diameter) component
    loop over the near-dup pair graph only.
    """
    from spark_dynamodb_spark.functions.text import normalize_text
    from spark_dynamodb_spark.operators.dedup import dedup_components
    from spark_dynamodb_spark.operators.text_analysis import langid, quality_score

    docs = load_table(spark, sf_dir, "documents")
    lang_ok = langid(spark, sf_dir).select(
        "doc_id", (F.col("predicted_lang") == "en").alias("lang_ok")
    )
    quality_ok = quality_score(spark, sf_dir).select(
        "doc_id", F.col("passes_quality").alias("quality_ok")
    )
    exact = docs.select(
        "doc_id", F.md5(normalize_text("text")).alias("content_hash")
    ).select(
        "doc_id",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("content_hash"))
        ).alias("exact_canonical"),
    )
    neardup = dedup_components(spark, sf_dir).select(
        "doc_id", F.col("is_canonical").alias("neardup_canonical")
    )
    kept = (
        F.col("lang_ok")
        & F.col("quality_ok")
        & F.col("exact_canonical")
        & F.col("neardup_canonical")
    )
    drop_reason = (
        F.when(~F.col("lang_ok"), "lang")
        .when(~F.col("quality_ok"), "quality")
        .when(~F.col("exact_canonical"), "exact_dup")
        .when(~F.col("neardup_canonical"), "near_dup")
    )
    return (
        docs.select("doc_id", "source")
        .join(lang_ok, "doc_id")
        .join(quality_ok, "doc_id")
        .join(exact, "doc_id")
        .join(neardup, "doc_id")
        .select(
            "doc_id",
            "source",
            "lang_ok",
            "quality_ok",
            "exact_canonical",
            "neardup_canonical",
            kept.alias("kept"),
            drop_reason.alias("drop_reason"),
        )
        .orderBy("doc_id")
    )


@query(
    "c08_sessionization",
    None,  # oracle assigned at definition (needs EVENTS_TS_SQL import)
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: batch sessionization — the gaps-and-islands assignment every
    behavioral pipeline runs: a session breaks when a user is idle
    > 30 min. lag() flags the break, a running sum numbers the island.

    Scale shape: both windows partition by user_id — ONE shuffle on
    the user key, then two narrow window passes over each user's
    (time-sorted) partition; the per-session agg reuses the same
    keying. The streaming twin is s03 (session_window); this is the
    backfill path over historical data.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_break = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = e.select(
        "user_id", "event_id", "ts", is_break.alias("brk")
    ).withColumn(
        "session_idx",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
        .orderBy("user_id", "session_idx")
    )


def _sql_sessionization() -> str:
    from spark_dynamodb_spark.tables import EVENTS_TS_SQL

    return f"""
    WITH e AS (SELECT event_id, user_id, {EVENTS_TS_SQL} AS ts FROM events),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) > 30*60*1000000
                  THEN 1 ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_us
    FROM sess
    GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """


PACK_BUDGET = 2048  # tokens per packed training sequence


@query(
    "c09_sequence_packing",
    f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    pre AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS prefix
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(prefix // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(prefix % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM pre
    ORDER BY doc_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: sequence packing — concat-and-chunk assignment of documents
    into fixed {PACK_BUDGET}-token training sequences: each doc gets
    the pack it STARTS in plus its offset (docs crossing a boundary
    spill into the next pack, exactly how a packed pretraining loader
    slices the concatenated token stream).

    The exclusive prefix-sum is windowed PER SOURCE SHARD — a single
    global ordering would serialize the cumsum through one partition
    at 100 TB; per-shard packing shuffles once on the shard key and
    packs shards independently (pack identity is (source, pack_id)),
    which is what distributed loaders do anyway.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = t.withColumn("prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return pre.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"prefix div {PACK_BUDGET}").alias("pack_id"),
        (F.col("prefix") % PACK_BUDGET).alias("pack_offset"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C11 — domain-mixture resampling
# ---------------------------------------------------------------------------

# Keep-rate granularity. floor() on BOTH sides before the integer
# compare: Spark's double→bigint CAST truncates while DuckDB's rounds,
# so the threshold must be floored explicitly to agree.
MIX_DENOM = 1_000_000


@query(
    "c11_domain_mixture",
    f"""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    m AS (SELECT MIN(n) AS mn FROM c),
    r AS (SELECT source, n, mn * 1.0 / n AS rate FROM c CROSS JOIN m),
    k AS (
      SELECT d.source
      FROM documents d JOIN r USING (source)
      WHERE {sql_md5_64("'mix' || CAST(doc_id AS VARCHAR)")} % {MIX_DENOM}
            < CAST(floor(rate * {MIX_DENOM}) AS BIGINT)
    )
    SELECT r.source, r.n AS n_in,
           round(r.rate, 6) AS target_rate,
           coalesce(kc.n_kept, 0) AS n_kept
    FROM r LEFT JOIN (
      SELECT source, COUNT(*) AS n_kept FROM k GROUP BY source
    ) kc USING (source)
    ORDER BY source
    """,
)
def domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: domain-mixture resampling — downsample every source domain
    to the smallest domain's size (uniform target mixture) with a
    deterministic per-row hash, the way pretraining corpora rebalance
    web/books/code shares without RAND().

    Scale shape: the per-domain rate table is a tiny aggregate
    (distinct sources), broadcast back onto the corpus; the keep
    decision is then a pure narrow filter — the 100 TB corpus is
    scanned once and never shuffled (the final per-source count here
    is reporting, not part of the resample)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "source", "n", (F.col("mn") * 1.0 / F.col("n")).alias("rate")
    )
    h = md5_64(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))) % MIX_DENOM
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(h < F.floor(F.col("rate") * MIX_DENOM).cast("long"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_in"),
            F.round("rate", 6).alias("target_rate"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


from spark_dynamodb_spark.registry import REGISTRY as _REGISTRY  # noqa: E402

_REGISTRY.resolve("c08_sessionization").oracle = _sql_sessionization()


@query(
    "c17_group_sample",
    """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM documents)
    SELECT doc_id, lang, rk
    FROM r WHERE rk <= 3
    ORDER BY lang, rk
    """,
)
def group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: fixed-size per-stratum sample — exactly k=3 documents per
    language, chosen by hash rank (deterministic "random": md5 of the
    id is uniform but reproducible across runs and engines). The
    companion to c06_stratified_sample, which keeps a FRACTION per
    stratum; evaluation sets want a fixed COUNT.

    Scale shape: one shuffle on the stratum key; WindowGroupLimit
    pushes the rk<=3 cut into the per-partition sort, so each task
    keeps a 3-row heap per stratum instead of fully sorting it."""
    docs = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        docs.select("doc_id", "lang", rk.alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("lang", "rk")
    )


@query(
    "c18_global_ids",
    """
    SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) AS gid
    FROM documents
    ORDER BY doc_id
    """,
)
def global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18: global contiguous ID assignment — the scalable twin of
    ``row_number() OVER (ORDER BY key)``. A naive global window
    collapses 100 TB into ONE task; instead: (1) range-bucket rows by
    key (order-preserving), (2) rank AND count per bucket behind one
    Exchange, (3) prefix-sum the 16-row bucket table and broadcast
    the offsets back. Every stage is distributed; the only global
    object is the 16-row offset table.

    Both consumers of the bucketed relation (the offsets branch and
    the final join) hang off the SAME Exchange subtree, so Spark's
    ReuseExchange executes the scan+shuffle once — the data is read
    twice only logically, not physically (plan-gated).

    The oracle IS the naive global row_number — values identical,
    plan radically different (plan-gated: no SinglePartition window).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    B = 16
    rng = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    # Order-preserving range bucket in [0, B): any deterministic
    # monotone bucketing works — parity rides on the final ids only.
    b = docs.crossJoin(F.broadcast(rng)).select(
        "doc_id",
        F.least(
            F.floor(
                (F.col("doc_id") - F.col("lo"))
                * B
                / (F.col("hi") - F.col("lo") + 1)
            ),
            F.lit(B - 1),
        )
        .cast("int")
        .alias("bucket"),
    )
    # Rank and per-bucket count in the same post-shuffle stage: both
    # windows share the Exchange(bucket), and every downstream branch
    # reuses it.
    wb = Window.partitionBy("bucket")
    b2 = b.select(
        "doc_id",
        "bucket",
        F.row_number().over(wb.orderBy("doc_id")).alias("rk"),
        F.count("*").over(wb).alias("cnt"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        b2.select("bucket", "cnt")
        .distinct()
        .select(
            "bucket",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("off"),
        )
    )
    return (
        b2.join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("off") + F.col("rk")).alias("gid"))
        .orderBy("doc_id")
    )


@query(
    "c21_vocab_coverage",
    f"""
    WITH tok AS (
      SELECT unnest({sql_simple_tokens('text')}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    ranked AS (
      SELECT token, n,
             CAST(SUM(n) OVER (ORDER BY n DESC, token
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(n) OVER () AS BIGINT) AS total
      FROM counts)
    SELECT token, n, cum,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
    FROM ranked
    WHERE 5 * (cum - n) < 4 * total
    ORDER BY cum
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21: vocabulary coverage cut — the smallest frequency-ranked
    token set whose cumulative count reaches 80% of corpus mass (a
    token is kept if the mass BEFORE it is still under the target).
    The standard "how big must the vocab be" pruning step.

    Parity design: cumulative sum, total, and the 80% threshold
    (5·(cum−n) < 4·total) are ALL pure BIGINT — exact at any corpus
    size; the only double is the reported coverage ratio (one
    division). Ties in the rank order break on the token string, so
    `cum` is total-order deterministic.

    Scale shape: ONE combinable-count pass over the corpus; the
    cumsum AND the grand total come from windows over the same
    aggregated vocab-sized relation (a second `counts.agg(...)`
    subtree would re-scan the corpus). The global-order window is
    acceptable because vocabularies are ≤ a few million rows
    regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(simple_tokens("text")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = counts.select(
        "token",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    return (
        ranked.filter(
            5 * (F.col("cum") - F.col("n")) < 4 * F.col("total")
        )
        .select(
            "token",
            "n",
            "cum",
            (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
                "coverage"
            ),
        )
        .orderBy("cum")
    )


# ---------------------------------------------------------------------------
# C26 — per-source quality-percentile filter (round 3)
# ---------------------------------------------------------------------------

C26_KEEP_FRAC = 0.8


@query(
    "c26_quality_percentile_filter",
    f"""
    WITH t AS (
      SELECT doc_id, source, {sql_tokens('text')} AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum')
                  AS DOUBLE) / len(toks) AS score
      FROM t
    ),
    ranked AS (
      SELECT doc_id, source, score,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY score, doc_id) AS pr
      FROM scored
    )
    SELECT doc_id, source, round(score, 6) AS score, round(pr, 6) AS pr,
           pr <= {C26_KEEP_FRAC} AS kept
    FROM ranked
    ORDER BY doc_id
    """,
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26: per-source quality-percentile gate — score every document
    (mean token length, the cheapest Gopher-style signal) and keep the
    bottom {C26_KEEP_FRAC:.0%} of each SOURCE's score distribution...
    i.e. thresholds are per-domain, not global: a uniform global
    cutoff would wipe out whole low-resource sources, the classic
    curation mistake this operator exists to avoid.

    Determinism: the score is one integer-sum division; percent_rank
    divides identical integers under a total (score, doc_id) order —
    bit-equal in both engines.

    Scale shape: one shuffle on source + per-partition sort for the
    window. Source is a modest-cardinality key; a 100 TB run with few
    giant sources would pre-aggregate an approximate per-source
    threshold (b35's GK sketch) and broadcast it instead — this exact
    variant is the correctness anchor for that optimization.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    total_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = docs.select(
        "doc_id", "source", (total_chars.cast("double") / F.size(toks)).alias("score")
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .select(
            "doc_id",
            "source",
            F.round("score", 6).alias("score"),
            F.round("pr", 6).alias("pr"),
            (F.col("pr") <= C26_KEEP_FRAC).alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C27 — dataset-card rollup (round 3)
# ---------------------------------------------------------------------------

@query(
    "c27_dataset_card",
    f"""
    WITH t AS (
      SELECT lang, source, n_chars, len({sql_tokens('text')}) AS n_tokens
      FROM documents
    )
    SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           GROUPING(lang) + 2 * GROUPING(source) AS gid,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM t
    GROUP BY ROLLUP (lang, source)
    ORDER BY gid, lang, source
    """,
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27: dataset-card rollup — the composition table every corpus
    release ships: docs / tokens / bytes per (lang x source), per
    lang, and overall, in one ROLLUP pass. The first artifact a
    training-data audit asks for, and the input to c11's mixture
    weights.

    All-integer aggregates (counts and sums of exact ints) — no float
    discipline needed; gid disambiguates real NULL groups from rollup
    totals exactly as in b14.

    Scale shape: ROLLUP is one combinable aggregation (Spark expands
    grouping sets map-side); the shuffle carries (lang, source, gid)
    partial sums — tiny regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", "source", "n_chars", F.size(tokens("text")).alias("n_tokens"))
    return (
        t.rollup("lang", "source")
        .agg(
            (F.grouping("lang") + 2 * F.grouping("source")).alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "gid",
            "n_docs",
            "total_tokens",
            "total_chars",
        )
        .orderBy("gid", "lang", "source")
    )


# ---------------------------------------------------------------------------
# C30 — robust (MAD) length-outlier flags (round 3, x_-parked)
# ---------------------------------------------------------------------------

C30_MAD_K = 3.0


@query(
    "c30_length_outliers",
    f"""
    WITH t AS (
      SELECT doc_id, source, len({sql_tokens('text')}) AS n_tokens
      FROM documents
    ),
    med AS (
      SELECT source, quantile_disc(n_tokens, 0.5) AS med
      FROM t GROUP BY source
    ),
    dev AS (
      SELECT t.doc_id, t.source, t.n_tokens, med.med,
             abs(t.n_tokens - med.med) AS adev
      FROM t JOIN med USING (source)
    ),
    mad AS (
      SELECT source, quantile_disc(adev, 0.5) AS mad FROM dev GROUP BY source
    )
    SELECT dev.doc_id, dev.source, dev.n_tokens,
           CAST(dev.med AS BIGINT) AS source_median,
           CAST(mad.mad AS BIGINT) AS source_mad,
           dev.adev > {C30_MAD_K} * greatest(mad.mad, 1) AS is_outlier
    FROM dev JOIN mad USING (source)
    ORDER BY doc_id
    """,
)
def length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30: robust per-source length-outlier flags — median/MAD
    (median absolute deviation) instead of mean/stddev, because crawl
    length distributions are heavy-tailed and a single 100 MB page
    drags a mean-based z-score past any threshold. A doc is flagged
    when |len - median| > {C30_MAD_K} x MAD (MAD floored at 1 so a
    perfectly uniform source flags nothing rather than everything).

    Exactness: token counts, discrete medians (percentile with
    midpoint-free DISC semantics — identical in both engines on
    integers), and integer comparisons only — no float discipline
    needed anywhere.

    Scale shape: two combinable per-source aggregations (median via
    percentile_approx at 100 TB — same plan, sketch merge) and two
    broadcast-sized joins on source. The corpus is scanned once; the
    per-doc relation shuffles once on source... and even that shuffle
    disappears if the stats table is broadcast (AQE decides).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tokens")
    )
    med = t.groupBy("source").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)").alias("med")
    )
    dev = t.join(med, "source").withColumn(
        "adev", F.abs(F.col("n_tokens") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(mad, "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.col("med").cast("long").alias("source_median"),
            F.col("mad").cast("long").alias("source_mad"),
            (
                F.col("adev")
                > C30_MAD_K * F.greatest(F.col("mad"), F.lit(1))
            ).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C47 — temperature-based language resampling (round 4, parked)
# ---------------------------------------------------------------------------


@query(
    "c47_temperature_resampling",
    """
    WITH counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ),
    rates AS (
      -- sqrt values ride the decimal detour before summing: a 5-row
      -- double sum is STILL order-dependent across engines (the c45
      -- lesson), and rates feed a hash-compared keep decision
      SELECT lang, n,
             CAST(CAST(sqrt(n) AS DECIMAL(28,6)) AS DOUBLE)
               / (SELECT CAST(SUM(CAST(sqrt(n) AS DECIMAL(28,6))) AS DOUBLE)
                  FROM counts) AS p_temp,
             n / (SELECT CAST(SUM(CAST(n AS DECIMAL(28,6))) AS DOUBLE)
                  FROM counts) AS p_raw
      FROM counts
    ),
    scored AS (
      SELECT d.lang,
             (CAST(('0x' || substr(md5('c47:' || CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000000) / 1000000.0 AS u,
             r.p_temp / r.p_raw
               / (SELECT max(p_temp / p_raw) FROM rates) AS keep_rate
      FROM documents d JOIN rates r ON d.lang = r.lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN u < keep_rate THEN 1 END) AS BIGINT) AS n_kept,
           round(max(keep_rate), 6) AS keep_rate
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
)
def temperature_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47: temperature-based language rebalancing — the mC4/XLM-R
    recipe: sample languages ∝ n^α instead of ∝ n so low-resource
    languages aren't drowned (α = 0.5 here). Per-doc keep probability
    ∝ p_temp(lang)/p_raw(lang), normalized so the most-boosted
    language keeps everything; the coin flip is the md5-fraction
    discipline (no RAND()).

    α is 0.5 SPECIFICALLY because sqrt is IEEE-correctly-rounded in
    both engines while pow(x, 0.7) is not — a general-α version would
    need the temperature table precomputed and broadcast as literals
    (which is also what a production pipeline does). The per-lang
    sqrt values additionally ride the decimal detour before the
    normalizing sums: even a |langs|-row double sum is accumulation-
    order-dependent across engines, and the resulting rates feed a
    hash-compared per-doc keep decision.

    Scale shape: the rate table is |langs| rows (broadcast join onto
    the corpus scan); the keep decision is a narrow per-row hash
    compare; one rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    sq = F.sqrt("n").cast("decimal(28,6)")
    tot = counts.agg(
        F.sum(sq).cast("double").alias("sum_sqrt"),
        F.sum(F.col("n").cast("decimal(28,6)")).cast("double").alias("sum_n"),
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))  # 1-row totals — bounded
        .select(
            "lang",
            (sq.cast("double") / F.col("sum_sqrt")).alias("p_temp"),
            (F.col("n") / F.col("sum_n")).alias("p_raw"),
        )
        .withColumn("boost", F.col("p_temp") / F.col("p_raw"))
    )
    max_boost = rates.agg(F.max("boost").alias("max_boost"))
    rates = rates.crossJoin(F.broadcast(max_boost)).select(
        "lang", (F.col("boost") / F.col("max_boost")).alias("keep_rate")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("c47:"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000000
    ) / 1000000.0
    return (
        docs.join(F.broadcast(rates), "lang")
        .select("lang", u.alias("u"), "keep_rate")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count(F.when(F.col("u") < F.col("keep_rate"), 1))
            .cast("long")
            .alias("n_kept"),
            F.round(F.max("keep_rate"), 6).alias("keep_rate"),
        )
        .orderBy("lang")
    )


# --- c58: weighted sampling without replacement ----------------------------
C58_K = 5  # docs kept per source
# md5-derived uniform in (0,1): 60-bit hash scaled by 2^60.
_C58_EXPR = "'wrs' || CAST(doc_id AS VARCHAR)"
_C58_U = f"(({sql_md5_64(_C58_EXPR)} + 1) / 1152921504606846976.0)"


@query(
    "c58_weighted_sample",
    f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln({_C58_U}) / n_chars AS k
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rnk
      FROM keyed
    )
    SELECT source, rnk, doc_id, CAST(n_chars AS BIGINT) AS weight
    FROM ranked
    WHERE rnk <= {C58_K}
    ORDER BY source, rnk
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C58: weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-Res): each item draws a deterministic uniform u from md5 and is
    ranked by ln(u)/w (equivalent to the textbook u^(1/w) key — the
    monotone form that avoids pow's cross-engine wobble); the top-k
    per source is an exact weighted sample, here length-weighted so
    big documents are proportionally favored — the sampling mode
    quality-audit pipelines want (chars-coverage, not doc-count).

    Determinism: no RAND() anywhere (the governance rule every split/
    sample op in this repo follows) — same sample on any cluster, any
    partitioning, any run.

    Scale shape: the key is a narrow per-row expression; the top-k is
    a WindowGroupLimit per source (rank never materializes beyond k
    per partition after the group-limit pushdown).
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (md5_64(F.concat(F.lit("wrs"), F.col("doc_id").cast("string"))) + 1) / F.lit(
        1152921504606846976.0
    )
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.log(u) / F.col("n_chars")).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= C58_K)
        .select("source", "rnk", "doc_id", F.col("n_chars").cast("long").alias("weight"))
        .orderBy("source", "rnk")
    )


# --- c59: differentially-private noisy counts ------------------------------
# Laplace scale b = sensitivity/epsilon = 1/1.0.
_C59_U = f"(({sql_md5_64('lang || chr(31) || source')} + 1) / 1152921504606846976.0 - 0.5)"


@query(
    "c59_dp_noisy_counts",
    f"""
    WITH g AS (
      SELECT lang, source, COUNT(*) AS true_count,
             {_C59_U} AS u
      FROM documents
      GROUP BY lang, source
    )
    SELECT lang, source, true_count,
           round(true_count
                 - CASE WHEN u < 0 THEN -1.0 ELSE 1.0 END
                   * ln(1 - 2 * abs(u)), 6) AS noisy_count
    FROM g
    ORDER BY lang, source
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C59: differentially-private release of group counts — Laplace
    mechanism (b = 1/epsilon, epsilon = 1) over the (lang, source)
    contingency table, the standard dataset-card privacy guard when
    slice counts could identify contributors.

    The Laplace draw inverts the CDF on a uniform derived from md5 of
    the GROUP KEY — deterministic for the parity harness (a real
    release uses a secret seed; the mechanism, sensitivity accounting,
    and inverse-CDF shape are exactly what production does). true_count
    rides along here only because this is a test harness — a real
    release emits the noisy column alone.

    Scale shape: one combinable rollup; the noise is a narrow
    expression on the aggregated (tiny) relation.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count("*").alias("true_count"))
    u = (
        md5_64(F.concat(F.col("lang"), F.lit("\x1f"), F.col("source"))) + 1
    ) / F.lit(1152921504606846976.0) - 0.5
    noise = F.when(u < 0, -1.0).otherwise(1.0) * F.log(1 - 2 * F.abs(u))
    return g.select(
        "lang",
        "source",
        "true_count",
        F.round(F.col("true_count") - noise, 6).alias("noisy_count"),
    ).orderBy("lang", "source")


# --- c60: size-balanced shard assignment -----------------------------------
C60_SHARDS = 8


@query(
    "c60_balanced_shards",
    f"""
    WITH per_len AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars
    ),
    offs AS (
      SELECT n_chars,
             SUM(cnt) OVER (ORDER BY n_chars DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS off
      FROM per_len
    ),
    ranked AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(o.off, 0)
               + row_number() OVER (PARTITION BY d.n_chars ORDER BY d.doc_id)
               AS rnk
      FROM documents d JOIN offs o ON d.n_chars = o.n_chars
    )
    SELECT CAST((rnk - 1) % {C60_SHARDS} AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked
    GROUP BY shard
    ORDER BY shard
    """,
)
def balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C60: size-balanced output sharding — assign documents to 8
    shards round-robin in descending size order (the LPT greedy
    approximation: consecutive sizes land on different shards, so
    shard byte totals stay within one max-document of each other).
    This is how a 100 TB corpus writes balanced output files without a
    bin-packing loop.

    The global size rank would naively be a single-partition window
    (the scale-killer c18 documents); instead it is the same two-phase
    spelling c18 uses: per-size-value ranks (partitioned window over
    doc_id) plus broadcast prefix offsets of the tiny distinct-size
    rollup — ordering by (n_chars DESC, doc_id) exactly, with no
    SinglePartition window over the corpus.

    Scale shape: one combinable size rollup (bounded by distinct
    sizes), one tiny running-sum window over it, one broadcast join
    back, one combinable shard rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_len = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    wo = Window.orderBy(F.col("n_chars").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per_len.select(
        "n_chars", F.coalesce(F.sum("cnt").over(wo), F.lit(0)).alias("off")
    )
    wr = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = (
        docs.join(F.broadcast(offs), "n_chars")
        .withColumn("rnk", F.col("off") + F.row_number().over(wr))
    )
    return (
        ranked.groupBy(((F.col("rnk") - 1) % C60_SHARDS).cast("long").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("shard")
    )


# --- c66: padding-waste audit ----------------------------------------------
C66_BATCH = 32


@query(
    "c66_padding_waste",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({sql_simple_tokens('text')}) AS BIGINT) AS n_toks
      FROM documents
    ),
    arrival AS (
      SELECT n_toks,
             (row_number() OVER (ORDER BY doc_id) - 1) // {C66_BATCH} AS batch
      FROM d
    ),
    srt AS (
      SELECT n_toks,
             (row_number() OVER (ORDER BY n_toks, doc_id) - 1) // {C66_BATCH} AS batch
      FROM d
    ),
    a_b AS (SELECT batch, COUNT(*) AS bs, MAX(n_toks) AS mx, SUM(n_toks) AS real
            FROM arrival GROUP BY batch),
    s_b AS (SELECT batch, COUNT(*) AS bs, MAX(n_toks) AS mx, SUM(n_toks) AS real
            FROM srt GROUP BY batch)
    SELECT 'arrival' AS strategy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(real) AS BIGINT) AS real_tokens,
           CAST(SUM(bs * mx) AS BIGINT) AS padded_tokens,
           CAST((SUM(bs * mx) - SUM(real)) * 1000000 // SUM(bs * mx) AS BIGINT)
             AS waste_ppm
    FROM a_b
    UNION ALL
    SELECT 'sorted' AS strategy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(real) AS BIGINT) AS real_tokens,
           CAST(SUM(bs * mx) AS BIGINT) AS padded_tokens,
           CAST((SUM(bs * mx) - SUM(real)) * 1000000 // SUM(bs * mx) AS BIGINT)
             AS waste_ppm
    FROM s_b
    ORDER BY strategy
    """,
)
def padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C66: padding-waste audit — batch inference/training pads every
    sequence in a batch to the batch max, so batch composition decides
    how much compute is burned on pad tokens. Compare arrival-order
    batching against length-sorted batching (the bucketing trick) on
    the fixture corpus: waste in ppm of padded volume, all-integer.

    NOTE on the ranking windows: this op is an offline audit over a
    corpus SAMPLE, so the oracle-mirrored spelling uses plain
    row_number() for clarity; at 100 TB the same rank comes from the
    c18/c60 two-phase bucketed spelling (per-length ranks + broadcast
    prefix offsets) with an identical result — c60 is the plan-gated
    template.

    Scale shape: one narrow token-count pass, two rank windows, two
    tiny per-batch rollups.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(simple_tokens("text")).cast("long").alias("n_toks")
    )
    out = []
    for strategy in ("arrival", "sorted"):
        b = d.select(
            "n_toks",
            F.expr(f"(row_number() over (order by {'doc_id' if strategy == 'arrival' else 'n_toks, doc_id'}) - 1) div {C66_BATCH}").alias("batch"),
        )
        bb = b.groupBy("batch").agg(
            F.count("*").alias("bs"),
            F.max("n_toks").alias("mx"),
            F.sum("n_toks").alias("real"),
        )
        out.append(
            bb.agg(
                F.count("*").cast("long").alias("n_batches"),
                F.sum("real").cast("long").alias("real_tokens"),
                F.sum(F.col("bs") * F.col("mx")).cast("long").alias("padded_tokens"),
            ).select(
                F.lit(strategy).alias("strategy"),
                "n_batches",
                "real_tokens",
                "padded_tokens",
                F.expr(
                    "(padded_tokens - real_tokens) * 1000000 div padded_tokens"
                ).cast("long").alias("waste_ppm"),
            )
        )
    return out[0].unionAll(out[1]).orderBy("strategy")


# --- c68: population-stability-index drift detection -----------------------
C68_BUCKET_W = 100  # n_chars bucket width
C68_NBUCKETS = 10  # last bucket is open-ended


@query(
    "c68_psi_drift",
    f"""
    WITH halves AS (
      SELECT least(n_chars // {C68_BUCKET_W}, {C68_NBUCKETS - 1}) AS bucket,
             doc_id % 2 = 0 AS in_a
      FROM documents
    ),
    b AS (
      SELECT g.bucket,
             1 + COALESCE(SUM(CASE WHEN in_a THEN 1 END), 0) AS n_a,
             1 + COALESCE(SUM(CASE WHEN NOT in_a THEN 1 END), 0) AS n_b
      FROM (SELECT unnest(generate_series(0, {C68_NBUCKETS - 1})) AS bucket) g
      LEFT JOIN halves h ON h.bucket = g.bucket
      GROUP BY g.bucket
    ),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM b)
    SELECT bucket,
           CAST(n_a - 1 AS BIGINT) AS count_a,
           CAST(n_b - 1 AS BIGINT) AS count_b,
           round((n_a * 1.0 / ta - n_b * 1.0 / tb)
                 * ln((n_a * 1.0 / ta) / (n_b * 1.0 / tb)), 6) AS psi_term
    FROM b CROSS JOIN tot
    ORDER BY bucket
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C68: population stability index — the drift monitor every
    production data pipeline runs between a reference corpus slice and
    a new batch (here: even vs odd doc_ids over document-length
    buckets). PSI = sum over buckets of (p-q)*ln(p/q); terms above
    ~0.1 flag a shifted bucket, a total above ~0.25 blocks the batch.
    Add-one smoothing keeps empty buckets finite, and the bucket spine
    is generated so both engines emit all 10 rows even when a bucket
    is empty on both sides.

    Exactness: counts are integers; each psi term is one fixed-order
    double expression from integer ratios (the per-term output avoids
    a cross-engine float SUM — callers total the column, or wrap it in
    the decimal detour as c13 does).

    Scale shape: one combinable bucket rollup; the 10-row spine joins
    broadcast; everything after the rollup is constant-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    halves = docs.select(
        F.least(
            F.expr(f"n_chars div {C68_BUCKET_W}"), F.lit(C68_NBUCKETS - 1)
        ).alias("bucket"),
        (F.col("doc_id") % 2 == 0).alias("in_a"),
    )
    spine = spark.range(0, C68_NBUCKETS).select(F.col("id").alias("bucket"))
    b = (
        spine.join(halves, "bucket", "left")
        .groupBy("bucket")
        .agg(
            (1 + F.coalesce(F.sum(F.when(F.col("in_a"), 1)), F.lit(0))).alias("n_a"),
            (
                1 + F.coalesce(F.sum(F.when(~F.col("in_a"), 1)), F.lit(0))
            ).alias("n_b"),
        )
    )
    tot = b.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    pa = F.col("n_a") * 1.0 / F.col("ta")
    pb = F.col("n_b") * 1.0 / F.col("tb")
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.col("n_a") - 1).cast("long").alias("count_a"),
            (F.col("n_b") - 1).cast("long").alias("count_b"),
            F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


@query(
    "c74_embedding_whitening",
    """
    WITH dims AS (
      SELECT vec_id, label, i.dim,
             CAST(embedding[i.dim] AS DOUBLE) AS x
      FROM embeddings,
           (SELECT unnest(generate_series(1, 64)) AS dim) i
    ),
    stats AS (
      SELECT dim,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu,
             sqrt(
               CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
             ) AS sd
      FROM dims GROUP BY dim
    )
    SELECT d.vec_id, d.label,
           CAST(SUM(CAST(floor((d.x - s.mu) / s.sd * 1000 + 0.5) AS BIGINT))
                AS BIGINT) AS z_milli_sum,
           CAST(COUNT(CASE WHEN abs((d.x - s.mu) / s.sd) > 2 THEN 1 END)
                AS BIGINT) AS n_extreme
    FROM dims d JOIN stats s USING (dim)
    GROUP BY d.vec_id, d.label
    ORDER BY d.vec_id
    """,
)
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C74: per-dimension embedding standardization (diagonal
    whitening) — subtract the corpus mean and divide by the corpus
    std per dimension, the preprocessing step before PCA/matryoshka
    truncation and the drift guard feature stores apply to embedding
    columns. Checked output is the per-vector standardized checksum
    (milli-units, floor(x+0.5) portable rounding) and the count of
    |z| > 2 outlier dimensions (array outputs cannot be
    oracle-hashed).

    Exactness: per-dim mean/std route their sums through the decimal
    detour, then every per-element z is a fixed chain of IEEE double
    ops — engine-identical; the checksum is a sum of exact integers.

    Scale shape: ONE posexplode shuffle builds the 64-row stats table
    (combinable decimal aggs keyed by dim); the stats come back as a
    single broadcast array row, and the scoring pass is a narrow
    higher-order transform over the original array column — the
    corpus is never exploded a second time and nothing fact-sized
    shuffles for scoring (the oracle's join-on-dim spelling would
    shuffle corpus×64 rows; the broadcast plan is the 100-TB shape).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select("dim0", F.col("xf").cast("double").alias("x"))
    stats = (
        dims.groupBy("dim0")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("mu"),
            F.sqrt(
                F.sum((F.col("x") * F.col("x")).cast("decimal(28,6)")).cast(
                    "double"
                )
                / F.count("*")
                - (
                    F.sum(F.col("x").cast("decimal(28,6)")).cast("double")
                    / F.count("*")
                )
                ** 2
            ).alias("sd"),
        )
    )
    stats_arr = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim0", "mu", "sd"))).alias("st")
    )
    z = F.transform(
        "embedding",
        lambda x, i: F.floor(
            (x.cast("double") - F.element_at(F.col("st"), i + 1)["mu"])
            / F.element_at(F.col("st"), i + 1)["sd"]
            * 1000
            + 0.5
        ).cast("long"),
    )
    extreme = F.filter(
        "embedding",
        lambda x, i: F.abs(
            (x.cast("double") - F.element_at(F.col("st"), i + 1)["mu"])
            / F.element_at(F.col("st"), i + 1)["sd"]
        )
        > 2,
    )
    return (
        emb.crossJoin(F.broadcast(stats_arr))
        .select(
            "vec_id",
            "label",
            F.aggregate(z, F.lit(0).cast("long"), lambda a, v: a + v).alias(
                "z_milli_sum"
            ),
            F.size(extreme).cast("long").alias("n_extreme"),
        )
        .orderBy("vec_id")
    )


@query(
    "c82_mixture_token_budget",
    f"""
    WITH per_source AS (
      SELECT source,
             CAST(SUM(len({sql_simple_tokens('text')})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS budget,
             CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM per_source
    )
    SELECT p.source, p.n_tokens,
           CAST(t.budget // t.n_sources AS BIGINT) AS alloc_tokens,
           CAST((t.budget // t.n_sources) * 1000000 // p.n_tokens AS BIGINT)
             AS epochs_ppm,
           CAST(CASE WHEN (t.budget // t.n_sources) > p.n_tokens
                     THEN (t.budget // t.n_sources) - p.n_tokens ELSE 0 END
                AS BIGINT) AS oversample_tokens
    FROM per_source p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C82: mixture token budgeting — given a total training budget
    (here: the corpus's own token count) and a target mixture (here:
    uniform across sources), compute each source's token allocation,
    its epoch count in ppm (alloc/available — above 1e6 means the
    source must REPEAT to fill its share), and the oversampled-token
    excess. The planning table behind every "we trained on X tokens
    with source S seen 3.2 epochs" dataset card; c11/c47 decide which
    docs survive, this decides how many times they are seen.

    Exactness: all quantities are integer floor division over exact
    token counts.

    Scale shape: one combinable per-source token rollup (size() is
    narrow — tokens are counted, never exploded), a 1-row broadcast
    total, and a |sources|-row output.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(simple_tokens("text"))).cast("long").alias("n_tokens")
    )
    tot = per_source.agg(
        F.sum("n_tokens").cast("long").alias("budget"),
        F.count("*").cast("long").alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.expr("CAST(budget div n_sources AS BIGINT)").alias("alloc_tokens"),
            F.expr(
                "CAST((budget div n_sources) * 1000000 div n_tokens AS BIGINT)"
            ).alias("epochs_ppm"),
            F.expr(
                "CAST(CASE WHEN (budget div n_sources) > n_tokens"
                " THEN (budget div n_sources) - n_tokens ELSE 0 END AS BIGINT)"
            ).alias("oversample_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# C90 — curriculum interleave ordering (round 6, second wave)
# ---------------------------------------------------------------------------
#
# Training-order assignment: documents sorted easy-to-hard (difficulty
# = length bucket) with sources round-robin-interleaved inside the
# curriculum, so no source ever dominates a contiguous training span.
# position = per-source curriculum rank * n_sources + source index —
# unique, monotone per source, interleaved across sources.

_CUR_BUCKETS = 16  # two-phase rank buckets (per source)


@query(
    "c90_curriculum_interleave",
    f"""
    WITH s AS (
      SELECT source,
             row_number() OVER (ORDER BY source) - 1 AS src_idx,
             COUNT(*) OVER () AS n_sources
      FROM (SELECT DISTINCT source FROM documents)),
    r AS (
      SELECT doc_id, source,
             n_chars // 100 AS difficulty,
             row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars // 100,
                        md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS crank
      FROM documents)
    SELECT r.doc_id, r.source, r.difficulty,
           CAST(r.crank * s.n_sources + s.src_idx AS BIGINT) AS position
    FROM r JOIN s USING (source)
    ORDER BY r.doc_id
    """,
)
def curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C90: curriculum + source-interleave training order — rank each
    source's documents easy-to-hard (length-bucket difficulty, then a
    reproducible md5 shuffle within a bucket), and interleave the
    sources round-robin: position = crank * n_sources + src_idx.

    Scale shape: the oracle's naive per-source row_number collapses a
    whole domain into one task; here the per-source rank is TWO-PHASE
    (c18/c84 discipline): rank within (source, hash-bucket) — 16-way
    skew split — plus per-(source, bucket) counts, prefix-summed over
    the tiny (sources x 16) table and broadcast back as offsets. The
    source-index table is a second tiny broadcast. No window ever
    sees more than a bucket's slice of one source.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("n_chars DIV 100").alias("difficulty"),
        F.md5(F.col("doc_id").cast("string")).alias("hh"),
    )
    # order-preserving bucket of the (difficulty, hh) sort key: bucket
    # by difficulty first, then the hash's first hex char (16-way)
    b = docs.withColumn(
        "bk",
        F.col("difficulty") * 16
        + F.conv(F.substring("hh", 1, 1), 16, 10).cast("int"),
    )
    wb = Window.partitionBy("source", "bk")
    b2 = b.select(
        "doc_id",
        "source",
        "difficulty",
        "bk",
        (F.row_number().over(wb.orderBy("hh", "doc_id")) - 1).alias("rk"),
        F.count("*").over(wb).alias("cnt"),
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        b2.select("source", "bk", "cnt")
        .distinct()
        .select(
            "source",
            "bk",
            F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off"),
        )
    )
    srcs = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1).alias(
                "src_idx"
            ),
            F.count("*").over(Window.partitionBy()).alias("n_sources"),
        )
    )
    return (
        b2.join(F.broadcast(offsets), ["source", "bk"])
        .join(F.broadcast(srcs), "source")
        .select(
            "doc_id",
            "source",
            "difficulty",
            ((F.col("off") + F.col("rk")) * F.col("n_sources") + F.col("src_idx"))
            .cast("long")
            .alias("position"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C94 — export manifest with order-independent checksums (round 6)
# ---------------------------------------------------------------------------
#
# The reproducibility artifact published next to a dataset export:
# per shard, the row count, id range, total bytes-ish payload, and an
# ORDER-INDEPENDENT 60-bit checksum (bitwise XOR of per-row content
# hashes — XOR is commutative/associative, so any partitioning, any
# task order, any engine produces the same value; a re-export diffs
# against this manifest shard-by-shard without re-reading rows).

_MANIFEST_SHARDS = 8


@query(
    "c94_export_manifest",
    f"""
    WITH rows_h AS (
      SELECT doc_id % {_MANIFEST_SHARDS} AS shard_id,
             doc_id, n_chars,
             {sql_md5_64("CAST(doc_id AS VARCHAR) || ':' || text")} AS rh
      FROM documents)
    SELECT shard_id,
           COUNT(*) AS n_rows,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(rh) AS xor_checksum
    FROM rows_h
    GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C94: shard manifest for a reproducible export — per shard
    (doc_id mod 8): row count, doc_id range, total chars, and the
    bitwise-XOR of per-row md5-derived content hashes. XOR is
    commutative and associative, so the checksum is identical under
    ANY partitioning or task order — the property that makes it safe
    to compute distributed and compare across engines, re-exports,
    and re-shards (same rows ⇒ same manifest, one corrupted row ⇒
    one differing shard line).

    Scale shape: narrow per-row hash, one combinable rollup keyed by
    shard — every aggregate here (count/min/max/sum/bit_xor) partial-
    aggregates map-side; the manifest itself is shard-count rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    rh = md5_64(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    )
    return (
        docs.select(
            (F.col("doc_id") % _MANIFEST_SHARDS).alias("shard_id"),
            "doc_id",
            "n_chars",
            rh.alias("rh"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("n_chars").alias("total_chars"),
            F.bit_xor("rh").alias("xor_checksum"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# C111 — single-scan corpus profiler (the profiling capstone, c99 discipline)
# ---------------------------------------------------------------------------

_C111_COLS = ["source", "lang", "n_chars"]
_C111_QCOLS = ["n_chars", "n_tokens"]
_C111_QS = [(25, 0.25), (50, 0.50), (75, 0.75)]




def corpus_profile_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE pass over raw text for c111: per-doc profile signature
    (doc_id, source, lang, n_chars, n_tokens, sh, toks).

    sh carries per-doc-DISTINCT shingle hashes as longs (the KMV
    input); toks carries the simple-token array — the one string
    payload the profiler genuinely needs, because heavy-hitter
    REPORTS must name the token (a hashes-only stage could estimate
    frequencies but never report which term they belong to). The
    stage is columnar: each profile section column-prunes to exactly
    the arrays it consumes, so the KMV pass never reads toks and the
    CMS pass never reads sh."""
    from spark_dynamodb_spark.functions.text import shingles
    from spark_dynamodb_spark.operators.dedup import SHINGLE_K

    docs = load_table(spark, sf_dir, "documents")
    toks = simple_tokens("text")
    # repartition first: one row group = one task (verify-skill gotcha)
    return docs.repartition("doc_id").select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.transform(
            F.array_distinct(shingles("text", SHINGLE_K)), lambda s: md5_64(s)
        ).alias("sh"),
        toks.alias("toks"),
    )


def _c111_sql() -> str:
    from spark_dynamodb_spark.operators.dedup import (
        _KMV_K,
        sql_shingles,
    )
    from spark_dynamodb_spark.operators.text_analysis import (
        _CMS_D,
        _CMS_TOPK,
        _CMS_W,
    )

    col_rows = "\n      UNION ALL\n".join(
        f"""SELECT 'columns' AS section, '{c}' AS k,
                 'n_nonnull' AS metric, CAST(COUNT({c}) AS BIGINT) AS value
          FROM documents
          UNION ALL
          SELECT 'columns', '{c}', 'n_distinct',
                 CAST(COUNT(DISTINCT {c}) AS BIGINT)
          FROM documents"""
        for c in _C111_COLS
    )
    qexpr = {"n_chars": "n_chars", "n_tokens": f"len({sql_simple_tokens('text')})"}
    q_rows = "\n      UNION ALL\n".join(
        f"""SELECT 'quantiles', '{c}', 'q{tag}',
                 CAST(quantile_disc({qexpr[c]}, {p}) AS BIGINT)
          FROM documents"""
        for c in _C111_QCOLS
        for tag, p in _C111_QS
    )
    cms_rows = ", ".join(str(r) for r in range(_CMS_D))
    cms_min = " , ".join(
        f"MAX(CASE WHEN r = {r} THEN cnt END)" for r in range(_CMS_D)
    )
    return f"""
    WITH sh AS ({sql_shingles(key_col='source', distinct_rows=True)}),
    h AS (SELECT DISTINCT source, {sql_md5_64('shingle')} AS h FROM sh),
    kranked AS (SELECT source, h,
                       row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                FROM h),
    sk AS (SELECT source, COUNT(*) AS n_in, max(h) AS hk
           FROM kranked WHERE rn <= {_KMV_K} GROUP BY source),
    toks AS (SELECT unnest({sql_simple_tokens('text')}) AS tok FROM documents),
    rows_ AS (SELECT unnest([{cms_rows}]) AS r),
    cells AS (
      SELECT r,
             ({sql_md5_64("tok || ':' || CAST(r AS VARCHAR)")}) % {_CMS_W} AS col,
             COUNT(*) AS cnt
      FROM toks CROSS JOIN rows_
      GROUP BY r, col
    ),
    exact AS (SELECT tok, COUNT(*) AS n_exact FROM toks GROUP BY tok),
    hh AS (
      SELECT tok, n_exact,
             row_number() OVER (ORDER BY n_exact DESC, tok) AS rnk
      FROM exact
    ),
    probe AS (
      SELECT h.tok, h.n_exact, h.rnk, r.r,
             ({sql_md5_64("h.tok || ':' || CAST(r.r AS VARCHAR)")}) % {_CMS_W} AS col
      FROM hh h CROSS JOIN rows_ r
      WHERE h.rnk <= {_CMS_TOPK}
    ),
    est AS (
      SELECT p.tok, p.n_exact, p.rnk,
             least({cms_min}) AS n_est
      FROM (SELECT p.tok, p.n_exact, p.rnk, p.r, c.cnt
            FROM probe p JOIN cells c ON c.r = p.r AND c.col = p.col) p
      GROUP BY p.tok, p.n_exact, p.rnk
    ),
    allrows AS (
      SELECT 'columns' AS section, '_table' AS k, 'n_rows' AS metric,
             CAST(COUNT(*) AS BIGINT) AS value
      FROM documents
      UNION ALL
      {col_rows}
      UNION ALL
      {q_rows}
      UNION ALL
      SELECT 'kmv', source, 'n_in', CAST(n_in AS BIGINT) FROM sk
      UNION ALL
      SELECT 'kmv', source, 'hk', CAST(hk AS BIGINT) FROM sk
      UNION ALL
      SELECT 'cms_heavy', tok, 'rnk', CAST(rnk AS BIGINT) FROM est
      UNION ALL
      SELECT 'cms_heavy', tok, 'n_exact', CAST(n_exact AS BIGINT) FROM est
      UNION ALL
      SELECT 'cms_heavy', tok, 'n_est', CAST(n_est AS BIGINT) FROM est
    )
    SELECT section, k, metric, value FROM allrows
    ORDER BY section, k, metric
    """


@query(
    "c111_corpus_profile",
    _c111_sql(),
    doc="""Oracle recomposes the b135/b35/c102/c107 section semantics
    as CTEs over documents directly (it may scan as often as it
    likes); every value is an integer — no float caveat. The Spark
    side's whole point is that IT scans documents exactly once.""",
)
def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C111: the single-scan corpus profiler — column profile (b135
    discipline), exact length/token quantiles (b35), per-source KMV
    distinct sketches (c102), and CMS heavy hitters with exact audit
    (c107), all emitted as ONE tall (section, k, metric, value)
    table off ONE scan of raw text.

    This is the 100 TB profiling story, the same argument c99 makes
    for dedup: at corpus scale the scan IS the cost, so every profile
    a pipeline wants must ride one pass. The staging projection
    extracts per-doc bounded signatures (doc-level columns, token
    count, distinct shingle hashes, token array) to parquet; the four
    sections then each column-prune the STAGE to their own column —
    the verdict plan has ZERO documents scans (plan-gated), and
    re-profiling or adding a section costs a signature scan, not a
    corpus scan.

    Section scale shapes, inherited from their parent entries:
    columns = one Expand + combinable two-phase aggregate; quantiles
    = GK sketch (percentile_approx on the exact path at this scale —
    at 100 TB dial accuracy down, same plan); KMV = two bounded top-k
    window phases, kilobytes per source; CMS = D x W-bounded cell
    aggregate + broadcast probe of the exact top-20 (itself two-phase
    sharded). Nothing collects; every shuffle is either combinable or
    bounded by sketch size.
    """
    from spark_dynamodb_spark.operators.dedup import _kmv_kept
    from spark_dynamodb_spark.operators.text_analysis import (
        cms_heavy_hitters_from,
    )

    from spark_dynamodb_spark.tables import scratch_stage_path

    path = scratch_stage_path(spark, "c111", sf_dir)
    corpus_profile_signatures(spark, sf_dir).write.mode("overwrite").parquet(path)
    sigs = spark.read.parquet(path)

    # columns section: one wide aggregate, stack-unpivoted (b135 shape)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _C111_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    wide = sigs.agg(*aggs)
    stack_args = ["'_table'", "'n_rows'", "n_rows"]
    for c in _C111_COLS:
        stack_args += [f"'{c}'", "'n_nonnull'", f"nn_{c}"]
        stack_args += [f"'{c}'", "'n_distinct'", f"nd_{c}"]
    cols_sec = wide.selectExpr(
        f"stack({1 + 2 * len(_C111_COLS)}, {', '.join(stack_args)})"
        " AS (k, metric, value)"
    ).select(F.lit("columns").alias("section"), "k", "metric", "value")

    # quantiles section: GK sketch on its exact path (b35 discipline)
    qaggs = [
        F.percentile_approx(c, p, 1_000_000).alias(f"{c}_q{tag}")
        for c in _C111_QCOLS
        for tag, p in _C111_QS
    ]
    qwide = sigs.agg(*qaggs)
    qstack = []
    for c in _C111_QCOLS:
        for tag, _p in _C111_QS:
            qstack += [f"'{c}'", f"'q{tag}'", f"{c}_q{tag}"]
    quant_sec = qwide.selectExpr(
        f"stack({len(_C111_QCOLS) * len(_C111_QS)}, {', '.join(qstack)})"
        " AS (k, metric, value)"
    ).select(F.lit("quantiles").alias("section"), "k", "metric", "value")

    # kmv section: two bounded top-k phases (c102 machinery)
    h = sigs.select("source", F.explode("sh").alias("h")).distinct()
    sk = (
        _kmv_kept(h)
        .groupBy("source")
        .agg(F.count("*").alias("n_in"), F.max("h").alias("hk"))
    )
    kmv_sec = sk.selectExpr(
        "source AS k", "stack(2, 'n_in', n_in, 'hk', hk) AS (metric, value)"
    ).select(F.lit("kmv").alias("section"), "k", "metric", "value")

    # cms_heavy section: shared c107 core over the staged token arrays
    toks = sigs.select(F.explode("toks").alias("tok"))
    est = cms_heavy_hitters_from(toks)
    cms_sec = est.selectExpr(
        "tok AS k",
        "stack(3, 'rnk', CAST(rnk AS BIGINT), 'n_exact', n_exact,"
        " 'n_est', n_est) AS (metric, value)",
    ).select(F.lit("cms_heavy").alias("section"), "k", "metric", "value")

    out = cols_sec.unionByName(quant_sec).unionByName(kmv_sec).unionByName(cms_sec)
    return out.select(
        "section", "k", "metric", F.col("value").cast("long").alias("value")
    ).orderBy("section", "k", "metric")


# ---------------------------------------------------------------------------
# C121 — the landing-zone capstone: train-ready shard manifest
# (VERDICT r12 "Next round" #9)
# ---------------------------------------------------------------------------


def _c121_sig_path() -> str:
    """Staging path for the capstone's signature parquet: a fresh
    mkdtemp per INVOCATION (ADVICE r13 — the old (sf_dir,
    applicationId) key let two concurrent c121 runs in one session
    clobber each other's stage mid-read, and the staged parquet
    accumulated across sf_dirs/sessions). The caller localCheckpoints
    the staged read and rmtree's this directory before returning, so
    nothing outlives the call."""
    import tempfile as _tempfile

    return _tempfile.mkdtemp(prefix="c121_sigs_")


def _c121_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone stage 1: the single documents scan, projected to the
    narrow signature schema (doc_id, source, content_md5, hashed
    shingle array, n_tokens), staged through a per-call parquet
    directory to cut lineage, then localCheckpointed (eager) so the
    directory can be removed before this function returns. The
    returned DataFrame reads from block-manager RDD blocks
    (ContextCleaner-GC'd when unreferenced), never from documents —
    the plan gate asserts zero documents scans downstream."""
    import shutil

    from spark_dynamodb_spark.functions.text import normalize_text, shingles
    from spark_dynamodb_spark.operators.dedup import SHINGLE_K

    sig_path = _c121_sig_path()
    try:
        docs = load_table(spark, sf_dir, "documents")
        (
            docs.repartition(
                int(spark.conf.get("spark.sql.shuffle.partitions")), "doc_id"
            )
            .select(
                "doc_id",
                "source",
                F.md5(normalize_text("text")).alias("content_md5"),
                F.transform(
                    F.array_distinct(shingles("text", SHINGLE_K)),
                    lambda s: F.xxhash64(s),
                ).alias("sh"),
                F.size(tokens("text")).cast("long").alias("n_tokens"),
            )
            .write.mode("overwrite")
            .parquet(sig_path)
        )
        return spark.read.parquet(sig_path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sig_path, ignore_errors=True)


def _sql_c121(pack_budget: int = PACK_BUDGET) -> str:
    """c121's composed five-stage CTE chain. ``pack_budget``
    parameterizes ONLY the stage-5 bucket width (s35 consumes the
    landing zone at a reduced budget so pack CLOSURE is exercisable
    at fixture scale; c121/c124 use the production default)."""
    from spark_dynamodb_spark.functions.text import sql_normalize_text
    from spark_dynamodb_spark.operators.dedup import (
        BENCH_SOURCE,
        CONTAM_T,
        JACCARD_T,
        SQL_SHINGLES,
    )

    return f"""
    WITH sh AS ({SQL_SHINGLES}),
    docs2 AS (SELECT doc_id, source FROM documents),
    bench AS (
      SELECT sh.doc_id, sh.shingle FROM sh JOIN docs2 USING (doc_id)
      WHERE docs2.source = '{BENCH_SOURCE}'
    ),
    train AS (
      SELECT sh.doc_id, sh.shingle FROM sh JOIN docs2 USING (doc_id)
      WHERE docs2.source != '{BENCH_SOURCE}'
    ),
    bn AS (SELECT doc_id, COUNT(*) AS n FROM bench GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc, COUNT(*) AS c
      FROM train t JOIN bench b USING (shingle)
      GROUP BY train_doc, bench_doc
    ),
    contaminated AS (
      SELECT DISTINCT train_doc AS doc_id
      FROM hits JOIN bn ON bn.doc_id = bench_doc
      WHERE c * 1.0 / bn.n >= {CONTAM_T}
    ),
    s1 AS (
      SELECT d.doc_id, d.source, d.text FROM documents d
      WHERE d.source != '{BENCH_SOURCE}'
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    s2 AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               min(doc_id) OVER (
                 PARTITION BY md5({sql_normalize_text('text')})) AS k
        FROM s1)
      WHERE doc_id = k
    ),
    sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN s2 USING (doc_id)),
    n2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ),
    neardrop AS (
      SELECT DISTINCT doc_b AS doc_id
      FROM common
      JOIN n2 na ON na.doc_id = doc_a
      JOIN n2 nb ON nb.doc_id = doc_b
      WHERE c * 1.0 / (na.n + nb.n - c) >= {JACCARD_T}
    ),
    s3 AS (
      SELECT doc_id, source, CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
      FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM neardrop)
    ),
    pre AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS prefix
      FROM s3
    ),
    packed AS (
      SELECT source, CAST(prefix // {pack_budget} AS BIGINT) AS pack_id,
             doc_id, n_tokens
      FROM pre
    )
    SELECT source, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """


@query("c121_train_shards_capstone", _sql_c121())
def train_shards_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C121: the END-TO-END landing-zone capstone (VERDICT r12 #9) —
    one entry composing the full corpus-to-train-shards pipeline the
    engine exists for: ingest -> decontaminate (c10 rule) -> exact
    dedup (c01 rule) -> near-dup verdict (c02 rule, one-hop drop) ->
    tokenize (c04 rule) -> pack (c09 rule), emitting the per-shard
    manifest (source, pack_id, n_docs, pack_tokens, first_doc,
    last_doc) a training loader would mount.

    Stage contract (each inherited verbatim from its proven entry):
    - benchmark docs ({{BENCH_SOURCE}}) are excluded from training;
    - a train doc is CONTAMINATED if its shingles cover >= CONTAM_T
      of any benchmark doc's (c10);
    - exact dedup keeps the min doc_id per content_md5 group among
      decontaminated survivors (c01);
    - near-dup verdict: verified Jaccard >= 0.8 pairs among exact
      survivors (MinHash-LSH candidates, exact verify — c02); every
      pair drops its larger id (one-hop, deterministic — chains
      beyond one hop survive, the documented difference from the
      component-fold c02_dedup_components contract);
    - packing is the c09 per-source prefix-sum at PACK_BUDGET tokens.

    Single-scan discipline (the c99 pattern): stage 1 projects
    (doc_id, source, content_md5, hashed shingles, n_tokens) in ONE
    documents scan, stages it as a narrow parquet side table, and
    localCheckpoints the read-back so the per-call staging directory
    can be deleted before return (ADVICE r13: unique mkdtemp per
    invocation, no cross-run clobber, no tempdir accumulation); every
    downstream stage reads ONLY the checkpointed signatures — the
    manifest plan has ZERO documents scans (plan-gated). Decon +
    near-dup run on xxhash64'd shingles; the oracle uses string
    shingles — the same collision-freeness argument as c02/c99's
    verify (counts and Jaccard values are identical on a
    collision-free hashed set).

    Oracle-recall assumption (ADVICE r13, inherited verbatim from
    c02_dedup_minhash_lsh): stage 4's Spark side generates candidates
    by 8x4 MinHash-LSH banding with the MAX_BUCKET_DOCS hot-bucket
    cap, while the oracle enumerates exact all-pairs Jaccard. Equality
    holds because at the fixture's duplicate level (J >= 0.8 pairs sit
    at J ~ 0.98) band recall is 1-(1-J^4)^8 ~ 1-2e-9 and no true-pair
    bucket approaches the 512-doc cap; on adversarial data a missed
    candidate or capped bucket would diverge stage 4 AND shift every
    downstream pack boundary. The cap is the documented 100 TB
    skew-safety trade, not an equality guarantee.

    100 TB shape: the one text scan writes ~50 bytes + hashes per doc;
    the bench side of decon broadcasts (evals are small by nature);
    exact dedup shuffles 16-byte hashes; LSH banding is the c02
    skew-capped single exchange; packing shuffles (source, doc_id,
    n_tokens) triples only. The heavy corpus bytes move exactly once.
    """
    from spark_dynamodb_spark.operators.dedup import (
        BENCH_SOURCE,
        CONTAM_T,
        _minhash_verified_pairs,
    )

    s = _c121_stage(spark, sf_dir)

    # stage 2: decontamination on hashed shingles
    bench = s.filter(F.col("source") == BENCH_SOURCE).select(
        F.col("doc_id").alias("bench_doc"), F.explode("sh").alias("h")
    )
    train = s.filter(F.col("source") != BENCH_SOURCE).select(
        F.col("doc_id").alias("train_doc"), F.explode("sh").alias("h")
    )
    bn = bench.groupBy("bench_doc").agg(F.count("*").alias("n"))
    hits = (
        train.join(bench, "h")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count("*").alias("c"))
    )
    contaminated = (
        hits.join(bn, "bench_doc")
        .filter(F.col("c") / F.col("n") >= CONTAM_T)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
    )
    s1 = s.filter(F.col("source") != BENCH_SOURCE).join(
        contaminated, "doc_id", "left_anti"
    )

    # stage 3: exact dedup (min-owner window on content_md5)
    w = Window.partitionBy("content_md5")
    s2 = s1.withColumn("keep", F.min("doc_id").over(w) == F.col("doc_id")).filter(
        "keep"
    )

    # stage 4: near-dup verdict among exact survivors (c02 pipeline
    # over the staged hashed arrays; one-hop drop of each pair's
    # larger id)
    pairs = _minhash_verified_pairs(s2.select("doc_id", "sh"), "sh")
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    s3 = s2.join(dropped, "doc_id", "left_anti")

    # stage 5: pack (c09 per-source prefix sum) + shard manifest
    w2 = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = s3.withColumn(
        "prefix", F.coalesce(F.sum("n_tokens").over(w2), F.lit(0))
    )
    packed = pre.withColumn(
        "pack_id", F.expr(f"prefix div {PACK_BUDGET}").cast("long")
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


# ---------------------------------------------------------------------------
# C123 — pack boundary slices: the loader-facing detail of c09
# ---------------------------------------------------------------------------


@query(
    "c123_pack_boundary_slices",
    f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    pre AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS prefix
      FROM t
      ),
    spans AS (
      SELECT doc_id, source, n_tokens, prefix,
             CAST(prefix // {PACK_BUDGET} AS BIGINT) AS p0,
             CAST((prefix + n_tokens - 1) // {PACK_BUDGET} AS BIGINT) AS p1
      FROM pre WHERE n_tokens > 0
    ),
    seg AS (
      SELECT s.source, s.doc_id, s.n_tokens, s.prefix,
             unnest(generate_series(s.p0, s.p1)) AS pack_id
      FROM spans s
    )
    SELECT source, CAST(pack_id AS BIGINT) AS pack_id, doc_id,
           CAST(greatest(0, prefix - pack_id * {PACK_BUDGET}) AS BIGINT)
             AS seg_start,
           CAST(least({PACK_BUDGET}, prefix + n_tokens - pack_id * {PACK_BUDGET})
                - greatest(0, prefix - pack_id * {PACK_BUDGET}) AS BIGINT)
             AS seg_len,
           CAST(pack_id * {PACK_BUDGET}
                + greatest(0, prefix - pack_id * {PACK_BUDGET}) - prefix
             AS BIGINT) AS doc_off
    FROM seg
    ORDER BY source, pack_id, seg_start, doc_id
    """,
)
def pack_boundary_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C123: pack BOUNDARY SLICES (round 13) — the loader-facing
    detail c09 stops short of: c09 assigns each doc the pack it
    STARTS in, but a packed pretraining loader mounts, per pack, the
    exact (doc, in-doc offset, length) slices that fill its
    {PACK_BUDGET} tokens — including the tail of a doc that started
    in the previous pack. One row per (doc, pack) segment:
    ``seg_start``/``seg_len`` locate the slice inside the pack,
    ``doc_off`` locates it inside the document, and per pack the
    seg_len's sum to {PACK_BUDGET} (except the final partial pack) —
    the invariant a data-loader smoke test checks first. Zero-token
    docs contribute no segments (mirrored in both engines).

    100 TB shape: inherits c09's per-source prefix-sum shuffle, then
    the segment explode is NARROW (sequence() per doc, spillover
    factor ~ mean doc length / pack budget); no second shuffle before
    the presentation sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = t.withColumn("prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    spans = pre.filter(F.col("n_tokens") > 0).select(
        "source",
        "doc_id",
        "n_tokens",
        "prefix",
        F.expr(f"prefix div {PACK_BUDGET}").alias("p0"),
        F.expr(f"(prefix + n_tokens - 1) div {PACK_BUDGET}").alias("p1"),
    )
    seg = spans.select(
        "source",
        "doc_id",
        "n_tokens",
        "prefix",
        F.explode(F.sequence("p0", "p1")).alias("pack_id"),
    )
    B = PACK_BUDGET
    seg_start = F.greatest(F.lit(0), F.col("prefix") - F.col("pack_id") * B)
    seg_end = F.least(
        F.lit(B), F.col("prefix") + F.col("n_tokens") - F.col("pack_id") * B
    )
    return (
        seg.select(
            "source",
            F.col("pack_id").cast("long"),
            "doc_id",
            seg_start.cast("long").alias("seg_start"),
            (seg_end - seg_start).cast("long").alias("seg_len"),
            (F.col("pack_id") * B + seg_start - F.col("prefix"))
            .cast("long")
            .alias("doc_off"),
        )
        .orderBy("source", "pack_id", "seg_start", "doc_id")
    )


# ---------------------------------------------------------------------------
# C124 — shard->worker assignment: the LOADER-side consumer of c121's
# manifest (round 14, VERDICT r13 #7)
# ---------------------------------------------------------------------------

N_LOADER_WORKERS = 8
N_LOADER_EPOCHS = 2


def _shard_assignment_cols(epoch_col, source_col, pack_col):
    """The one spelling of the assignment keys, shared by the entry
    and the synthetic-manifest balance pytest: ``key`` is the
    epoch-seeded md5 order key (per-worker consumption order), and
    ``worker`` the md5_64 hash-bucket assignment — the c06/c58
    content-free-hash discipline, so both are reproducible across
    runs, engines, and partitionings, and re-seeding the epoch
    reshuffles both."""
    key = F.md5(
        F.concat_ws(
            "|",
            F.lit("ep"),
            epoch_col.cast("string"),
            source_col,
            pack_col.cast("string"),
        )
    )
    worker = md5_64(F.concat(F.lit("w|"), key)) % N_LOADER_WORKERS
    return key, worker


@query("c124_shard_assignment", None)  # oracle patched below (shared builder)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C124: the loader-side twin of c121 (VERDICT r13 #7) — proves
    the train-shard manifest is actually CONSUMABLE: a deterministic
    shard->worker assignment plus an epoch-seeded per-worker
    consumption order, emitting each worker's token/doc budget per
    epoch. Assignment and order are both content-free md5 keys (the
    c06/c58 governance discipline: no RAND(), reproducible across
    runs/engines/partitionings; changing the epoch reshuffles both,
    so epochs see different shard orders AND different worker maps
    without any state). first_key/last_key pin the per-worker order
    as aggregates — deliberately NO global row_number: a global rank
    would funnel the manifest through one task per epoch, while
    hash-bucket assignment stays narrow (the manifest at 100 TB is
    billions of rows; hash balance is within O(1/sqrt(shards/worker))
    of fair, and the share_ppm column IS the imbalance audit a
    loader team watches — the synthetic-manifest pytest pins the
    bound at 10k shards). share_ppm is integer ppm of the epoch's
    total tokens (no float).

    Composition: the manifest is c121's output (the entry runs the
    full five-stage pipeline — its single-scan discipline carries
    over); the oracle nests c121's composed CTE chain verbatim as a
    derived table, so one answer covers ingest -> shards -> loader."""
    manifest = train_shards_capstone(spark, sf_dir)
    return shard_assignment_rollup(expand_shard_assignments(manifest))


def expand_shard_assignments(manifest: DataFrame) -> DataFrame:
    """(source, pack_id, pack_tokens, n_docs) -> one assignment row
    per epoch: the epoch-seeded md5 order key + md5_64 hash-bucket
    worker. ONE spelling shared by c124's batch answer and s35's
    incremental closure emission (code-review r15: the two had grown
    parallel copies) so they can never drift."""
    e = manifest.select(
        "source",
        "pack_id",
        "pack_tokens",
        "n_docs",
        F.explode(
            F.array(*[F.lit(i) for i in range(N_LOADER_EPOCHS)])
        ).alias("epoch"),
    )
    key, worker = _shard_assignment_cols(
        F.col("epoch"), F.col("source"), F.col("pack_id")
    )
    return e.select(
        "epoch",
        key.alias("key"),
        worker.alias("worker"),
        "pack_tokens",
        "n_docs",
    )


def shard_assignment_rollup(a: DataFrame) -> DataFrame:
    """Per-(epoch, worker) budget rollup over assignment rows — the
    c124 output contract (n_shards / worker_tokens / worker_docs /
    integer share_ppm / first_key / last_key), shared with s35's
    finalization."""
    g = a.groupBy("epoch", "worker").agg(
        F.count("*").cast("long").alias("n_shards"),
        F.sum("pack_tokens").cast("long").alias("worker_tokens"),
        F.sum("n_docs").cast("long").alias("worker_docs"),
        F.min("key").alias("first_key"),
        F.max("key").alias("last_key"),
    )
    t = g.groupBy("epoch").agg(F.sum("worker_tokens").alias("tot"))
    return (
        g.join(F.broadcast(t), "epoch")
        .select(
            "epoch",
            "worker",
            "n_shards",
            "worker_tokens",
            "worker_docs",
            F.expr("worker_tokens * 1000000 div tot").alias("share_ppm"),
            "first_key",
            "last_key",
        )
        .orderBy("epoch", "worker")
    )


def shard_assignment_oracle_sql(
    closed_only: bool = False, pack_budget: int = PACK_BUDGET
) -> str:
    """The ONE SQL spelling of manifest -> per-(epoch, worker)
    budgets (code-review r15: c124's literal and s35's builder had
    grown parallel copies). ``closed_only`` restricts to packs below
    the source's max pack_id (s35's in-stream-closure set; TRUE-pred
    for the full c124 manifest); ``pack_budget`` parameterizes the
    stage-5 bucket width exactly as _sql_c121 does."""
    from spark_dynamodb_spark.functions.text import sql_md5_64

    values = ", ".join(f"({i})" for i in range(N_LOADER_EPOCHS))
    closed_pred = "m.pack_id < mx.maxp" if closed_only else "TRUE"
    return f"""
    WITH manifest AS (SELECT * FROM ({_sql_c121(pack_budget)}) _m),
    mx AS (SELECT source, MAX(pack_id) AS maxp FROM manifest GROUP BY source),
    closed AS (
      SELECT m.* FROM manifest m JOIN mx USING (source)
      WHERE {closed_pred}
    ),
    e AS (
      SELECT c.*, ep.epoch
      FROM closed c, (VALUES {values}) AS ep(epoch)
    ),
    k AS (
      SELECT epoch, pack_tokens, n_docs,
             md5(concat_ws('|', 'ep', CAST(epoch AS VARCHAR), source,
                           CAST(pack_id AS VARCHAR))) AS key
      FROM e
    ),
    a AS (
      SELECT epoch, key, pack_tokens, n_docs,
             {sql_md5_64("'w|' || key")} % {N_LOADER_WORKERS} AS worker
      FROM k
    ),
    g AS (
      SELECT epoch, worker,
             CAST(COUNT(*) AS BIGINT) AS n_shards,
             CAST(SUM(pack_tokens) AS BIGINT) AS worker_tokens,
             CAST(SUM(n_docs) AS BIGINT) AS worker_docs,
             MIN(key) AS first_key,
             MAX(key) AS last_key
      FROM a GROUP BY epoch, worker
    ),
    t AS (SELECT epoch, SUM(worker_tokens) AS tot FROM g GROUP BY epoch)
    SELECT g.epoch, g.worker, g.n_shards, g.worker_tokens, g.worker_docs,
           CAST(g.worker_tokens * 1000000 // t.tot AS BIGINT) AS share_ppm,
           g.first_key, g.last_key
    FROM g JOIN t USING (epoch)
    ORDER BY g.epoch, g.worker
    """


def _finalize_c124_oracle() -> None:
    """One oracle source of truth: the shared builder at the full
    manifest / production budget (a drift in c121's oracle or the
    assignment spelling propagates to c124 AND s35 automatically)."""
    _REGISTRY.resolve("c124_shard_assignment").oracle = (
        shard_assignment_oracle_sql(closed_only=False)
    )


_finalize_c124_oracle()


# ---------------------------------------------------------------------------
# C127 — loader mixture schedule (round 15): the governance step between
# the manifest (c121) and the shard consumer (c124/s35).
# ---------------------------------------------------------------------------

# Per-epoch token budget the mixture schedule allocates across sources.
# A demo constant sized so fixture sources get non-trivial integer
# budgets; the schedule math is budget-agnostic.
MIXTURE_EPOCH_TOKENS = 1_000_000


@query(
    "c127_mixture_schedule",
    f"""
    WITH manifest AS (SELECT * FROM ({{c121}}) _m),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_packs,
             CAST(SUM(pack_tokens) AS BIGINT) AS source_tokens,
             CAST(SUM(n_docs) AS BIGINT) AS source_docs
      FROM manifest GROUP BY source
    ),
    w AS (
      SELECT s.*, CAST(FLOOR(SQRT(source_tokens)) AS BIGINT) AS w_sqrt
      FROM s
    ),
    t AS (SELECT SUM(w_sqrt) AS wtot, SUM(source_tokens) AS ttot FROM w)
    SELECT w.source, w.n_packs, w.source_tokens, w.source_docs,
           CAST(w.source_tokens * 1000000 // t.ttot AS BIGINT)
             AS natural_ppm,
           CAST(w.w_sqrt * 1000000 // t.wtot AS BIGINT) AS weight_ppm,
           CAST(w.w_sqrt * {MIXTURE_EPOCH_TOKENS} // t.wtot AS BIGINT)
             AS epoch_budget_tokens,
           CAST((w.w_sqrt * {MIXTURE_EPOCH_TOKENS} // t.wtot) * 1000
                // w.source_tokens AS BIGINT) AS repeat_x1000
    FROM w, t
    ORDER BY w.source
    """,
)
def mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C127: the loader MIXTURE SCHEDULE — the last governance step a
    training-data platform runs between the shard manifest and the
    data loader: decide how much each source contributes per epoch.

    Rule: temperature-weighted sampling with alpha = 0.5 — target
    weight proportional to sqrt(source_tokens), the standard
    sub-linear upweighting of small sources (the p_s ~ D_s^alpha
    family used across public multilingual/multi-corpus training
    recipes). Integer-exact cross-engine: the weight is
    floor(sqrt(tokens)) (token counts are far below 2^52, so the
    double sqrt is exact and the floor deterministic in BOTH Spark
    and DuckDB), and every derived column is integer ppm / integer
    division — no float crosses the hash oracle.

    Emitted per source: pack/doc/token totals, natural_ppm (the
    corpus's own distribution), weight_ppm (the alpha=0.5 target),
    epoch_budget_tokens (the per-epoch token allocation out of
    MIXTURE_EPOCH_TOKENS), and repeat_x1000 (budget / source_tokens,
    the oversampling factor a loader applies — >1000 means the
    source repeats within an epoch; small sources land higher, the
    entire point of the temperature).

    Composition: manifest = c121 (the oracle nests c121's composed
    CTE chain verbatim); downstream, c124/s35 consume the shards
    this schedule budgets. 100 TB shape: one manifest aggregation to
    O(sources) rows, a 1-row total broadcast back — the schedule
    never touches doc-level data."""
    manifest = train_shards_capstone(spark, sf_dir)
    s = manifest.groupBy("source").agg(
        F.count("*").cast("long").alias("n_packs"),
        F.sum("pack_tokens").cast("long").alias("source_tokens"),
        F.sum("n_docs").cast("long").alias("source_docs"),
    )
    w = s.withColumn(
        "w_sqrt", F.floor(F.sqrt(F.col("source_tokens"))).cast("long")
    )
    t = w.agg(
        F.sum("w_sqrt").alias("wtot"), F.sum("source_tokens").alias("ttot")
    )
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_packs",
            "source_tokens",
            "source_docs",
            F.expr("source_tokens * 1000000 div ttot").alias("natural_ppm"),
            F.expr("w_sqrt * 1000000 div wtot").alias("weight_ppm"),
            F.expr(f"w_sqrt * {MIXTURE_EPOCH_TOKENS} div wtot").alias(
                "epoch_budget_tokens"
            ),
            F.expr(
                f"(w_sqrt * {MIXTURE_EPOCH_TOKENS} div wtot) * 1000"
                " div source_tokens"
            ).alias("repeat_x1000"),
        )
        .orderBy("source")
    )


def _finalize_c127_oracle() -> None:
    spec = _REGISTRY.resolve("c127_mixture_schedule")
    spec.oracle = spec.oracle.replace("{c121}", _sql_c121())


_finalize_c127_oracle()
