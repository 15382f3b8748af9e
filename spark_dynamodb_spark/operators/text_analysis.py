"""Text analysis operators — SURVEY §2 C4: token stats, language ID,
quality scoring, document fingerprinting.

All single-pass groupBy/explode pipelines over `documents` — every
aggregate is map-side combinable, nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.text import (
    md5_64,
    simple_tokens,
    sql_simple_tokens,
    normalize_text,
    shingles,
    sql_md5_64,
    sql_normalize_text,
    sql_tokens,
    tokens,
)
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table


@query(
    "c04_text_token_stats",
    f"""
    WITH t AS (SELECT doc_id, lang, source, {sql_tokens('text')} AS toks FROM documents)
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS ttr,
           CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum') AS BIGINT)
             AS total_token_chars
    FROM t
    ORDER BY doc_id
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4a: per-document token counting + type-token ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("total_token_chars"),
    ).orderBy("doc_id")


@query(
    "c04_text_ngram_freq",
    f"""
    WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 1)),
                                   i -> concat_ws(' ', toks[i], toks[i+1]))) AS bigram
      FROM t
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 25
    """,
)
def ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4b: global top-25 bigrams (n-gram statistics)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(shingles("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(25)
    )


# --- C4c: language ID -------------------------------------------------------
# Heuristic stopword scoring. The fixture's text is synthetic word soup
# (FIXTURES.md), so this checks DETERMINISM/parity, not accuracy; real
# accuracy tests belong to a real corpus. Markers are frequent function
# words per language.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["的", "是", "了", "在", "和"],
}


def _sql_langid() -> str:
    score_cols = []
    for lang, words in LANG_MARKERS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(toks, x -> x IN ({in_list}))) AS s_{lang}"
        )
    # deterministic argmax: highest score wins, ties break alphabetically
    langs = sorted(LANG_MARKERS)
    best = "CASE "
    for lang in langs:
        others = " AND ".join(
            f"s_{lang} >= s_{o}" for o in langs if o != lang
        )
        best += f"WHEN {others} THEN '{lang}' "
    best += "END"
    return f"""
    WITH t AS (SELECT doc_id, lang AS labeled_lang, {sql_tokens('text')} AS toks
               FROM documents),
    scored AS (SELECT doc_id, labeled_lang, {', '.join(score_cols)} FROM t)
    SELECT doc_id, labeled_lang, {best} AS predicted_lang,
           s_en + s_de + s_fr + s_es + s_zh AS marker_hits
    FROM scored
    ORDER BY doc_id
    """


@query("c04_text_langid", _sql_langid())
def langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4c: n-gram/stopword-marker language ID with deterministic
    alphabetical tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(
                F.filter(toks, lambda x: x.isin(*words))
            ).alias(f"s_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    langs = sorted(LANG_MARKERS)
    pred = F.lit(None).cast("string")
    # build the same CASE chain: first alphabetical lang with max score
    chain = None
    for lang in langs:
        cond = None
        for o in langs:
            if o == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{o}")
            cond = c if cond is None else (cond & c)
        chain = (
            F.when(cond, lang) if chain is None else chain.when(cond, lang)
        )
    total = None
    for lang in langs:
        t = F.col(f"s_{lang}")
        total = t if total is None else total + t
    return scored.select(
        "doc_id",
        "labeled_lang",
        chain.alias("predicted_lang"),
        total.alias("marker_hits"),
    ).orderBy("doc_id")


@query(
    "c04_text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, n_chars, {sql_normalize_text('text')} AS norm,
             {sql_tokens('text')} AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(CAST(len(list_filter(toks, x -> length(x) >= 3)) AS DOUBLE)
                 / len(toks), 6) AS frac_long_tokens,
           round(CAST(length(norm) - length(replace(norm, ' ', '')) AS DOUBLE)
                 / length(norm), 6) AS space_ratio,
           round(CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum')
                 AS DOUBLE) / len(toks), 6) AS mean_token_len,
           (len(toks) BETWEEN 10 AND 100000)
             AND (CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum')
                  AS DOUBLE) / len(toks)) BETWEEN 2.0 AND 12.0 AS passes_quality
    FROM t
    ORDER BY doc_id
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4d: heuristic quality scoring (length / token-shape ratios) —
    the Gopher-rules shape on the fixture's columns."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    toks = tokens("text")
    total_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_len = total_chars.cast("double") / F.size(toks)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.filter(toks, lambda x: F.length(x) >= 3)).cast("double")
            / F.size(toks),
            6,
        ).alias("frac_long_tokens"),
        F.round(
            (F.length(norm) - F.length(F.regexp_replace(norm, " ", ""))).cast("double")
            / F.length(norm),
            6,
        ).alias("space_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        (
            F.size(toks).between(10, 100000) & mean_len.between(2.0, 12.0)
        ).alias("passes_quality"),
    ).orderBy("doc_id")


@query(
    "c04_text_token_bpe",
    r"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_bpe_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CAST(ceil(len(toks) * 1.3) AS BIGINT) AS est_llm_tokens
    FROM t
    ORDER BY doc_id
    """,
)
def token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""C4f: BPE-ish token counting — a GPT-2-style pre-tokenizer
    regex (word runs | single punctuation) plus the standard
    ~1.3×-words LLM-token estimate. The real BPE merge table is a
    lookup the regex pre-pass feeds at scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]', 0)")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.ceil(F.size(toks) * 1.3).alias("est_llm_tokens"),
    ).orderBy("doc_id")


@query(
    "c03_label_centroids",
    """
    WITH p AS (SELECT unnest(generate_series(1, 8)) AS pos),
    e AS (
      SELECT label, p.pos AS pos, embedding[p.pos] AS v
      FROM embeddings CROSS JOIN p
    )
    SELECT label, pos,
           round(SUM(CAST(v AS DOUBLE)) / COUNT(*), 9) AS mean_val
    FROM e
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3c: per-label embedding centroids (first 8 dims) — the cluster
    summary an IVF-style ANN index builds its coarse quantizer from.

    posexplode → groupBy(label, pos) is fully map-side combinable; at
    100 TB the shuffle carries (label × dim) partial sums only.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .filter(F.col("pos0") < 8)
        .select("label", (F.col("pos0") + 1).alias("pos"), "v")
        .groupBy("label", "pos")
        .agg(
            # NOT the decimal detour here: Spark's float→decimal cast is
            # string-mediated (shortest repr) while DuckDB quantizes the
            # exact binary value — they disagree at the 7th decimal.
            # Double sums + round(9) are stable: accumulation-order noise
            # is ~1e-14, five orders below the rounding granularity.
            F.round(
                F.sum(F.col("v").cast("double")) / F.count("*"), 9
            ).alias("mean_val")
        )
        .orderBy("label", "pos")
    )


@query(
    "c04_text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 4, 1)),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS s
      FROM t
    )
    SELECT doc_id,
           min({sql_md5_64('s')}) AS fingerprint,
           COUNT(*) AS n_shingles
    FROM sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4e: rolling-window document fingerprint — min hash over 5-token
    shingles (winnowing's keep-the-min idea at window = whole doc)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 5))).alias("s")
    )
    return (
        sh.groupBy("doc_id")
        .agg(
            F.min(md5_64("s")).alias("fingerprint"),
            F.count("*").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


@query(
    "c04_text_repetition",
    f"""
    WITH t AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           round(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 6)
             AS dup_gram_frac,
           1.0 - len(list_distinct(grams)) * 1.0 / len(grams) > 0.2
             AS flagged_repetitive
    FROM g
    ORDER BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4i: within-document repetition (Gopher rule): the fraction of
    duplicated 3-grams inside each document — boilerplate/spam has a
    high duplicate-gram fraction even when no other doc matches it.
    Entirely narrow (per-row array ops, no explode, no shuffle): the
    cheapest quality rule to run at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    grams = shingles("text", 3)
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    dup_frac = 1.0 - n_distinct.cast("double") / n_grams
    return docs.select(
        "doc_id",
        n_grams.cast("long").alias("n_grams"),
        n_distinct.cast("long").alias("n_distinct"),
        F.round(dup_frac, 6).alias("dup_gram_frac"),
        (dup_frac > 0.2).alias("flagged_repetitive"),
    ).orderBy("doc_id")


@query(
    "c13_unigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
    total AS (SELECT COUNT(*) AS t FROM tok),
    scored AS (
      SELECT tok.doc_id, ln(vocab.n * 1.0 / total.t) AS lp
      FROM tok JOIN vocab USING (term) CROSS JOIN total
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           round(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: unigram language-model scoring — the cheapest perplexity
    proxy a corpus-quality pipeline runs: average log-probability of a
    document's tokens under the corpus's own unigram distribution
    (spammy/outlier docs score far below the mode and get filtered).

    Scale shape: the vocabulary is one combinable groupBy on the
    token; the corpus total is a 1-row broadcast; scoring re-joins the
    token relation to the vocab on the token key (AQE broadcasts the
    vocab when it fits, shuffle-joins when a 100 TB corpus's vocab
    does not); the per-doc reduce is a second combinable agg. The
    per-token log term rides the exact-decimal detour so the per-doc
    sum is engine- and partitioning-independent."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("n"))
    total = tok.agg(F.count("*").alias("t"))
    scored = tok.join(vocab, "term").crossJoin(F.broadcast(total)).select(
        "doc_id", F.log(F.col("n") * 1.0 / F.col("t")).alias("lp")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.col("lp").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


# Stopword set for the normalize op: literal on both sides.
_STOPWORDS = ("the", "a", "of", "and")


@query(
    "c04_text_normalize",
    f"""
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(lower(text), ' '),
                         t -> t NOT IN {_STOPWORDS!r} AND t <> ''),
             ' ') AS clean_text,
           CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t NOT IN {_STOPWORDS!r} AND t <> '')) AS BIGINT)
             AS n_kept
    FROM documents
    ORDER BY doc_id
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4g: text normalization — lowercase, tokenize, drop stopwords,
    re-join. The cleaning pass that precedes dedup/quality scoring in
    a corpus pipeline, expressed with a JVM higher-order FILTER lambda
    (no Python, no explode/re-group round trip).

    Scale shape: fully narrow — zero shuffles; each row is cleaned in
    place inside whole-stage codegen. The DuckDB oracle uses the same
    lambda via list_filter."""
    docs = load_table(spark, sf_dir, "documents")
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    kept = F.expr(
        f"filter(split(lower(text), ' '), t -> NOT t IN ({sw}) AND t <> '')"
    )
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
    ).orderBy("doc_id")


@query(
    "c15_token_diversity",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest({sql_simple_tokens('text')}) AS tok
      FROM documents),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    agg AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_unique,
             CAST(SUM(c * c) AS BIGINT) AS s_c2
      FROM cnt GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_unique,
           CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
           1.0 - CAST(s_c2 AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
             AS simpson
    FROM agg ORDER BY doc_id
    """,
)
def token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4k: per-document token diversity — type-token ratio and
    Simpson diversity index (1 - Σ(c/n)²), the quality signals that
    separate natural text from boilerplate and keyword stuffing.

    Parity design: Simpson is chosen over Shannon entropy
    DELIBERATELY — entropy needs ln(), which is not correctly-rounded
    IEEE, and Java's Math.log disagrees with libm by 1 ulp on ~1% of
    inputs (measured: 6/500 docs mismatched), which no decimal detour
    can repair. Simpson needs only integer moments (Σc, Σc², count)
    aggregated EXACTLY, plus single-rounded double divisions that are
    bit-equal in both engines at any partitioning.

    Scale shape: explode → count(doc,token) → per-doc combinable agg.
    Both aggregations partial map-side; the shuffles carry (doc,
    token, count) then (doc, 3 integers) — never document text. This
    beats the narrow all-in-row formulation (quadratic in tokens per
    row) for long documents."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(simple_tokens("text")).alias("tok"),
    )
    cnt = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique"),
        F.sum(F.col("c") * F.col("c")).alias("s_c2"),
    )
    nd = F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_unique",
        (F.col("n_unique").cast("double") / nd).alias("ttr"),
        (F.lit(1.0) - F.col("s_c2").cast("double") / (nd * nd)).alias(
            "simpson"
        ),
    ).orderBy("doc_id")


@query(
    "c16_inverted_index",
    f"""
    WITH p AS (
      SELECT DISTINCT doc_id,
             unnest({sql_simple_tokens('text')}) AS tok
      FROM documents),
    r AS (SELECT doc_id, tok,
                 row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
          FROM p)
    SELECT tok,
           COUNT(*) AS n_docs,
           array_to_string(
             list_sort(list(CAST(doc_id AS VARCHAR))
                       FILTER (WHERE rn <= 10)), '|') AS postings
    FROM r
    GROUP BY tok
    HAVING COUNT(*) >= 5
    ORDER BY tok
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: inverted-index build — token → document frequency + a
    BOUNDED posting-list sample (first 10 doc_ids). The index/search
    side of a corpus pipeline.

    Scale shape: distinct (doc, token) pairs, ONE shuffle on token for
    the row_number window, and the groupBy(token) right after reuses
    that partitioning — no second exchange. The collected posting list
    is capped BEFORE collection (rank ≤ 10), so a stopword's state is
    10 ids, never a million-element array. Postings are stringified
    (driver canonicalizer rejects array columns); doc_ids are sorted
    in-row so partition arrival order can't leak."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id",
        F.explode(simple_tokens("text")).alias("tok"),
    ).distinct()
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("tok").orderBy("doc_id"))
    r = p.select("doc_id", "tok", rn.alias("rn"))
    return (
        r.groupBy("tok")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= 10,
                            F.col("doc_id").cast("string"),
                        )
                    )
                ),
                "|",
            ).alias("postings"),
        )
        .filter(F.col("n_docs") >= 5)
        .orderBy("tok")
    )


# Chunking geometry: 50-token chunks, stride 30 (20-token overlap).
CHUNK_SIZE, CHUNK_STRIDE = 50, 30


@query(
    "c19_chunk_overlap",
    f"""
    WITH t AS (
      SELECT doc_id,
             {sql_simple_tokens('text')}
               AS toks
      FROM documents),
    n AS (
      SELECT doc_id, toks, len(toks) AS n_toks,
             CASE WHEN len(toks) <= {CHUNK_SIZE} THEN 1
                  ELSE CAST(ceil((len(toks) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0)
                            AS INT) + 1 END AS n_chunks
      FROM t),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM n)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                        chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}])
                AS INT) AS chunk_len,
           array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                                chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}],
                           ' ') AS chunk_text
    FROM c
    ORDER BY doc_id, chunk_id
    """,
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19: overlapping token chunking — fixed 50-token windows with
    stride 30 (20-token overlap), the standard document → embedding /
    RAG-unit split. Tail rule: a doc shorter than one chunk yields
    exactly one (short) chunk; otherwise enough chunks that the last
    one reaches the end.

    Scale shape: fully narrow — tokenize, compute the chunk count per
    row, explode a tiny index sequence, slice the token array in
    place. Zero shuffles before the presentation sort; chunking
    happens where each document's row already lives."""
    docs = load_table(spark, sf_dir, "documents")
    toks = simple_tokens("text")
    n = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.when(F.size("toks") <= CHUNK_SIZE, F.lit(1))
        .otherwise(
            F.ceil(
                (F.size("toks") - CHUNK_SIZE) / float(CHUNK_STRIDE)
            ).cast("int")
            + 1
        )
        .alias("n_chunks"),
    )
    c = n.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_id"
        ),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_SIZE
    )
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).alias("chunk_len"),
        F.array_join(piece, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# C24 — winnowing fingerprints (round 3)
# ---------------------------------------------------------------------------

WINNOW_K = 5  # tokens per k-gram
WINNOW_W = 4  # k-gram hashes per selection window


@query(
    "c24_winnowing_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    k AS (
      SELECT doc_id, list_transform(
               generate_series(1, greatest(len(toks) - {WINNOW_K - 1}, 1)),
               i -> {sql_md5_64(f"array_to_string(toks[i:i+{WINNOW_K - 1}], ' ')")}
             ) AS kh
      FROM t
    ),
    w AS (
      SELECT doc_id, list_transform(
               generate_series(1, greatest(len(kh) - {WINNOW_W - 1}, 1)),
               j -> list_min(kh[j:j+{WINNOW_W - 1}])
             ) AS fps
      FROM k
    )
    SELECT doc_id, fp FROM (
      SELECT doc_id, unnest(list_sort(list_distinct(fps))) AS fp FROM w
    )
    ORDER BY doc_id, fp
    """,
)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    — the MOSS algorithm): hash every {WINNOW_K}-token k-gram, slide a
    window of {WINNOW_W} hashes, keep each window's minimum. The
    selected hash set is the guarantee-bearing fingerprint: any shared
    run of >= K + W - 1 tokens between two documents shares at least
    one selected hash — the local-similarity complement to MinHash's
    whole-document Jaccard (c02).

    Parity: hashes are portable md5-derived 60-bit ints (xxhash64
    would be faster Spark-side but has no DuckDB twin); window minima
    and dedup are integer ops. Short docs degrade exactly like the
    shingle rule: < K tokens -> one k-gram of the whole text.

    Scale shape: entirely NARROW — per-row array transforms inside
    whole-stage codegen, no explode before the final fingerprint set,
    zero pre-output shuffles. At 100 TB this is a pure map stage; the
    downstream use (group by fp to find shared runs) inherits c02's
    bucket-cap discipline.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _winnow_khashes("text").alias("kh"))
    return (
        t.select("doc_id", F.explode(_winnow_fps_from_khashes("kh")).alias("fp"))
        .orderBy("doc_id", "fp")
    )


def _winnow_khashes(text_col) -> "F.Column":
    """Portable md5 hashes of every WINNOW_K-token k-gram (narrow)."""
    toks = tokens(text_col)
    m = F.greatest(F.size(toks) - (WINNOW_K - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), m),
        lambda i: md5_64(F.concat_ws(" ", F.slice(toks, i, WINNOW_K))),
    )


def _winnow_fps_from_khashes(kh_col) -> "F.Column":
    """Distinct window-minima fingerprint set from a k-gram hash array
    (the winnowing selection step — shared by the query and the
    guarantee property test in tests/test_properties.py)."""
    wn = F.greatest(F.size(kh_col) - (WINNOW_W - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), wn),
            lambda j: F.array_min(F.slice(kh_col, j, WINNOW_W)),
        )
    )


@query(
    "c52_bigram_logprob",
    f"""
    WITH t AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                                   i -> toks[i] || chr(9) || toks[i + 1])) AS pr
      FROM t
    ),
    bg AS (
      SELECT doc_id,
             string_split(pr, chr(9))[1] AS w1,
             string_split(pr, chr(9))[2] AS w2
      FROM big
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS nb FROM bg GROUP BY w1, w2),
    cw AS (SELECT w1, SUM(nb) AS nh FROM cb GROUP BY w1),
    tok AS (SELECT unnest(toks) AS w FROM t),
    cu AS (SELECT w, COUNT(*) AS nu FROM tok GROUP BY w),
    tot AS (SELECT COUNT(*) AS tt FROM tok),
    scored AS (
      SELECT bg.doc_id,
             ln(0.5 * (cb.nb * 1.0 / cw.nh) + 0.5 * (cu.nu * 1.0 / tot.tt)) AS lp
      FROM bg
      JOIN cb ON bg.w1 = cb.w1 AND bg.w2 = cb.w2
      JOIN cw ON bg.w1 = cw.w1
      JOIN cu ON bg.w2 = cu.w
      CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C52: interpolated bigram language-model scoring — the step up
    from c13's unigram proxy: each document is scored by the average
    ln(0.5*p(w2|w1) + 0.5*p(w2)) of its bigrams under the corpus's own
    counts (Jelinek-Mercer interpolation, lambda=0.5, so unseen-context
    smoothing needs no extra machinery — every bigram in the corpus is
    in the model by construction).

    Scale shape: bigrams are built NARROWLY per row (the zip_with
    shift-concat, no posexplode self-join); the model tables are three
    combinable rollups (bigram, bigram-head, unigram); scoring re-joins
    the bigram relation on its two token keys (AQE broadcasts the count
    tables when they fit); the per-doc reduce is one more combinable
    agg. Per-bigram ln rides the exact-decimal detour before the
    per-doc sum, the same cross-engine discipline as c13.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    heads = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    tails = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    pairs = F.zip_with(heads, tails, lambda a, b: F.concat_ws("\t", a, b))
    bg = docs.select("doc_id", F.explode(pairs).alias("pr")).select(
        "doc_id",
        F.split("pr", "\t").getItem(0).alias("w1"),
        F.split("pr", "\t").getItem(1).alias("w2"),
    )
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("nb"))
    cw = cb.groupBy("w1").agg(F.sum("nb").alias("nh"))
    tok = docs.select(F.explode(toks).alias("w"))
    cu = tok.groupBy("w").agg(F.count("*").alias("nu")).withColumnRenamed("w", "w2")
    tot = tok.agg(F.count("*").alias("tt"))
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cw, "w1")
        .join(cu, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(
                0.5 * (F.col("nb") * 1.0 / F.col("nh"))
                + 0.5 * (F.col("nu") * 1.0 / F.col("tt"))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(F.col("lp").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


# c53: top-N output rows (the merge itself touches every word; the cap
# only bounds the emitted sample).
C53_TOP = 100


@query(
    "c53_bpe_merge_step",
    f"""
    WITH w AS (
      SELECT unnest({sql_simple_tokens('text')}) AS word FROM documents
    ),
    vocab AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
    sp AS (
      SELECT word, freq,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS spaced
      FROM vocab
    ),
    pairs AS (
      SELECT p.pair, SUM(sp.freq) AS cnt
      FROM sp,
           unnest(list_transform(
             generate_series(1, greatest(len(string_split(spaced, ' ')) - 1, 0)),
             i -> string_split(spaced, ' ')[i] || ' ' || string_split(spaced, ' ')[i + 1]
           )) AS p(pair)
      GROUP BY p.pair
    ),
    best AS (SELECT pair FROM pairs ORDER BY cnt DESC, pair LIMIT 1)
    SELECT word, freq, best.pair AS merge_pair,
           CAST(len(string_split(spaced, ' ')) AS BIGINT) AS n_syms_before,
           CAST(len(string_split(replace(spaced, best.pair, replace(best.pair, ' ', '')), ' '))
                AS BIGINT) AS n_syms_after
    FROM sp CROSS JOIN best
    ORDER BY freq DESC, word
    LIMIT {C53_TOP}
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C53: one BPE training step — count adjacent symbol pairs over
    the word-frequency-weighted vocabulary, pick the most frequent
    pair (lexicographic tie-break), and apply the merge to every word.
    This is the inner loop of tokenizer training (Sennrich et al.'s
    algorithm); c04_text_token_bpe counts with a FIXED tokenizer —
    this op LEARNS the next merge.

    Exactness: the merge is `replace(spaced, 'x y', 'xy')` on the
    space-separated symbol string. Both engines replace left-to-right
    non-overlapping, which IS greedy BPE application (for 'a a a' with
    pair 'a a': first two merge, the third survives — in both).

    Scale shape: everything runs on the DISTINCT-word vocabulary, not
    the corpus: one combinable word-count rollup collapses 100 TB of
    text to a vocab-sized table; pair counting, the argmax, and the
    merge are all vocab-sized, and the argmax is a 1-row broadcast.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(simple_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    sp = vocab.withColumn(
        "spaced", F.trim(F.regexp_replace("word", "(.)", "$1 "))
    )
    syms = F.split("spaced", " ")
    m = F.size(syms)
    pair_arr = F.zip_with(
        F.slice(syms, 1, F.greatest(m - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(m - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = (
        sp.select("freq", F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )
    best = pairs.orderBy(F.col("cnt").desc(), "pair").limit(1).select("pair")
    merged = sp.crossJoin(F.broadcast(best)).select(
        "word",
        "freq",
        F.col("pair").alias("merge_pair"),
        F.size(F.split("spaced", " ")).cast("long").alias("n_syms_before"),
        F.size(
            F.split(
                F.replace(
                    F.col("spaced"),
                    F.col("pair"),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                ),
                F.lit(" "),
            )
        )
        .cast("long")
        .alias("n_syms_after"),
    )
    return merged.orderBy(F.col("freq").desc(), "word").limit(C53_TOP)


ZIPF_TOP = 50  # vocabulary ranks fitted per source


@query(
    "c57_zipf_slope",
    f"""
    WITH tok AS (
      SELECT source, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    vocab AS (SELECT source, term, COUNT(*) AS n FROM tok GROUP BY source, term),
    ranked AS (
      SELECT source,
             ln(row_number() OVER (PARTITION BY source ORDER BY n DESC, term)) AS x,
             ln(n) AS y,
             row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS rnk
      FROM vocab
    ),
    pts AS (SELECT source, x, y FROM ranked WHERE rnk <= {ZIPF_TOP}),
    mom AS (
      SELECT source,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx
      FROM pts GROUP BY source
    )
    SELECT source, n AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS zipf_intercept
    FROM mom
    ORDER BY source
    """,
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C57: Zipf law fit per source — least-squares slope of
    ln(frequency) against ln(rank) over each source's top-50
    vocabulary. Natural language sits near slope -1; word-salad, spam,
    and template boilerplate deviate hard, making the slope a cheap
    corpus-health audit statistic (and the fixture's synthetic
    uniform-ish vocabulary shows exactly that deviation).

    Exactness: per-point ln products are single IEEE ops; the four
    moment sums ride the decimal detour (b47's closed-form regression
    discipline); the slope/intercept are fixed-order double
    expressions from those exact moments.

    Scale shape: one combinable (source, term) rollup collapses the
    corpus; the ranking window runs over vocab-sized data partitioned
    by source; the regression is one more combinable agg per source.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("term"))
    vocab = tok.groupBy("source", "term").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    rw = W.partitionBy("source").orderBy(F.col("n").desc(), "term")
    pts = (
        vocab.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= ZIPF_TOP)
        .select(
            "source",
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("n").cast("double")).alias("y"),
        )
    )
    mom = pts.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(28,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return mom.select(
        "source",
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    ).orderBy("source")


@query(
    "c61_char_ngram_entropy",
    f"""
    WITH t AS (
      SELECT doc_id, {sql_normalize_text('text')} AS norm FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(length(norm) - 1, 1)),
                                   i -> substr(norm, CAST(i AS INT), 2))) AS gram
      FROM t
    ),
    cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(ln(SUM(c))
                 - CAST(SUM(CAST(c * ln(c) AS DECIMAL(28,6))) AS DOUBLE) / SUM(c),
                 6) AS entropy_nats
    FROM cnt
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def char_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C61: character-bigram entropy per document — the randomness
    detector quality pipelines run to catch base64 blobs, minified
    code, and key-mash spam (too-high entropy) or repeated-template
    boilerplate (too-low). H = ln(n) - sum(c*ln(c))/n over the per-doc
    bigram counts — the algebraic form whose only reductions are sums
    of integers and of decimal-cast per-term doubles (c13's ln
    discipline; no per-row division, so no error accumulation).

    Scale shape: one narrow per-row gram build (no join), one
    combinable (doc, gram) rollup, one combinable per-doc rollup —
    both shuffles carry counts keyed by doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    grams = F.expr(
        "transform(sequence(1, greatest(length(norm) - 1, 1)),"
        " i -> substring(norm, i, 2))"
    )
    g = docs.select("doc_id", norm.alias("norm")).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    cnt = g.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(
                F.log(F.sum("c"))
                - F.sum((F.col("c") * F.log("c")).cast("decimal(28,6)"))
                .cast("double")
                / F.sum("c"),
                6,
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


# c62: content-defined chunking — a boundary fires where the 60-bit
# md5 of the 8-char window is 0 mod 2^6 (expected chunk ~64 chars).
CDC_W = 8
CDC_MASK = 64


@query(
    "c62_content_defined_chunking",
    f"""
    WITH t AS (
      SELECT doc_id, {sql_normalize_text('text')} AS norm FROM documents
    ),
    b AS (
      SELECT doc_id, length(norm) AS n,
             list_filter(
               list_transform(generate_series(1, greatest(length(norm) - {CDC_W - 1}, 1)),
                              i -> CASE WHEN {sql_md5_64(f"substr(norm, CAST(i AS INT), {CDC_W})")}
                                        % {CDC_MASK} = 0 THEN i ELSE NULL END),
               x -> x IS NOT NULL) AS cuts
      FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           CAST(len(cuts) + 1 AS BIGINT) AS n_chunks,
           CAST(COALESCE(cuts[1], 0) AS BIGINT) AS first_cut,
           CAST(COALESCE(cuts[len(cuts)], 0) AS BIGINT) AS last_cut,
           {sql_md5_64("COALESCE(array_to_string(cuts, ','), '')")} AS cuts_hash
    FROM b
    ORDER BY doc_id
    """,
)
def content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C62: content-defined chunk boundaries (the rolling-hash cut
    rule behind rsync/FastCDC-style dedup): a boundary fires wherever
    the hash of the local 8-char window hits 0 mod 64, so chunk
    boundaries survive insertions/deletions elsewhere in the document
    — the property that makes chunk-level dedup (c12) robust to edits,
    unlike fixed-width chunking. Emits per-doc boundary statistics and
    a hash of the exact cut list (so any drift in any boundary
    position fails the oracle).

    Scale shape: fully narrow — per-row higher-order transform/filter,
    no explode, no shuffle (the hash rides md5 for engine portability;
    a Spark-only deployment would use xxhash64 here, same plan).
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    md5_sql = (
        f"conv(substring(md5(substring(norm, i, {CDC_W})), 1, 15), 16, 10)"
    )
    cuts = F.expr(
        f"filter(transform(sequence(1, greatest(length(norm) - {CDC_W - 1}, 1)),"
        f" i -> CASE WHEN CAST({md5_sql} AS BIGINT) % {CDC_MASK} = 0"
        f" THEN i ELSE NULL END), x -> x IS NOT NULL)"
    )
    b = docs.select(
        "doc_id", F.length(norm).alias("n"), norm.alias("norm")
    ).select("doc_id", "n", cuts.alias("cuts"))
    return b.select(
        "doc_id",
        F.col("n").cast("long").alias("n_chars"),
        (F.size("cuts") + 1).cast("long").alias("n_chunks"),
        F.coalesce(F.try_element_at("cuts", F.lit(1)), F.lit(0))
        .cast("long")
        .alias("first_cut"),
        F.coalesce(F.try_element_at("cuts", F.lit(-1)), F.lit(0))
        .cast("long")
        .alias("last_cut"),
        md5_64(F.array_join("cuts", ",")).alias("cuts_hash"),
    ).orderBy("doc_id")


# c67: span corruption — a span of SPAN_LEN tokens is masked wherever
# the position hash fires (1-in-10); overlapping spans merge.
C67_SPAN = 3


def _c67_sql() -> str:
    trig = (
        "list_transform(generate_series(1, len(toks)), p -> "
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0)"
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {sql_simple_tokens('text')} AS toks FROM documents
    ),
    a AS (
      SELECT doc_id, toks, {trig} AS trig FROM t
    ),
    b AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, len(toks)), p ->
               trig[p] OR (CASE WHEN p > 1 THEN trig[p - 1] ELSE false END)
                       OR (CASE WHEN p > 2 THEN trig[p - 2] ELSE false END)) AS msk
      FROM a
    ),
    c AS (
      SELECT doc_id, toks, msk,
             list_transform(generate_series(1, len(toks)), p ->
               msk[p] AND NOT (CASE WHEN p > 1 THEN msk[p - 1] ELSE false END)) AS st
      FROM b
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_masked,
           CAST(len(list_filter(st, x -> x)) AS BIGINT) AS n_spans,
           COALESCE(array_to_string(
             list_filter(
               list_transform(generate_series(1, len(toks)), p ->
                 CASE WHEN NOT msk[p] THEN toks[p]
                      WHEN st[p] THEN '<X>' END),
               x -> x IS NOT NULL), ' '), '') AS corrupted,
           COALESCE(array_to_string(
             list_filter(
               list_transform(generate_series(1, len(toks)), p ->
                 CASE WHEN msk[p] THEN toks[p] END),
               x -> x IS NOT NULL), ' '), '') AS targets
    FROM c
    ORDER BY doc_id
    """


@query("c67_span_corruption", _c67_sql())
def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C67: span-corruption objective construction (T5/UL2) — mask
    deterministic 3-token spans (a position hash fires 1-in-10;
    overlapping spans merge), emit the corrupted input with one
    sentinel per span plus the target sequence of masked tokens. This
    is the pretraining-data transformation an infilling objective
    needs, as a pure narrow plan (a real pipeline numbers the
    sentinels <extra_id_0..n>; the numbering is a per-doc prefix count
    — same plan, one more transform).

    Exactness: the mask derives from md5 of (doc_id, position) —
    engine-portable and reproducible; all list accesses are
    index-guarded with lazy CASE branches ON BOTH SIDES: Spark's ANSI
    element_at — and even try_element_at — reject index 0, while
    DuckDB's bracket indexing WRAPS negative indices to the list tail
    (trig[-1] is the last element), which silently masks position 1
    whenever the final position triggers.

    Scale shape: fully narrow — per-row higher-order transforms, no
    explode, no shuffle; pipelines with the scan at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id", simple_tokens("text").alias("toks")
    ).withColumn(
        "trig",
        F.expr(
            "transform(sequence(1, size(toks)), p -> "
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
            "CAST(p AS STRING))), 1, 15), 16, 10) AS BIGINT) % 10 = 0)"
        ),
    )
    b = a.withColumn(
        "msk",
        F.expr(
            "transform(sequence(1, size(toks)), p -> "
            "element_at(trig, p)"
            " OR (CASE WHEN p > 1 THEN element_at(trig, p - 1) ELSE false END)"
            " OR (CASE WHEN p > 2 THEN element_at(trig, p - 2) ELSE false END))"
        ),
    )
    c = b.withColumn(
        "st",
        F.expr(
            "transform(sequence(1, size(toks)), p -> "
            "element_at(msk, p) AND NOT "
            "(CASE WHEN p > 1 THEN element_at(msk, p - 1) ELSE false END))"
        ),
    )
    return c.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.expr("filter(msk, x -> x)")).cast("long").alias("n_masked"),
        F.size(F.expr("filter(st, x -> x)")).cast("long").alias("n_spans"),
        F.array_join(
            F.expr(
                "filter(transform(sequence(1, size(toks)), p -> "
                "CASE WHEN NOT element_at(msk, p) THEN element_at(toks, p) "
                "WHEN element_at(st, p) THEN '<X>' END), x -> x IS NOT NULL)"
            ),
            " ",
        ).alias("corrupted"),
        F.array_join(
            F.expr(
                "filter(transform(sequence(1, size(toks)), p -> "
                "CASE WHEN element_at(msk, p) THEN element_at(toks, p) END), "
                "x -> x IS NOT NULL)"
            ),
            " ",
        ).alias("targets"),
    ).orderBy("doc_id")


@query(
    "c69_tokenizer_fertility",
    r"""
    WITH t AS (
      SELECT lang,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                  AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))
                  AS BIGINT) AS n_bpe
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_bpe) * 1000000 // SUM(n_words) AS BIGINT)
             AS fertility_ppm
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C69: tokenizer fertility per language — BPE-ish tokens emitted
    per whitespace word (the c04f pre-tokenizer over the c04j word
    splitter). Fertility is THE multilingual-fairness statistic for a
    tokenizer: a language whose fertility runs 2x English pays twice
    the context length and twice the inference cost for the same text,
    which is why tokenizer audits report it per language before
    training. Integer ppm so the ranking is bit-stable.

    Scale shape: one narrow token-count pass, one combinable per-lang
    rollup — audit-priced at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.expr("filter(split(lower(text), ' '), x -> x <> '')")
    bpe = F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]', 0)")
    t = docs.select(
        "lang",
        F.size(words).cast("long").alias("n_words"),
        F.size(bpe).cast("long").alias("n_bpe"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_words",
            "total_bpe_tokens",
            F.expr("total_bpe_tokens * 1000000 div total_words")
            .cast("long")
            .alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# C73 — term burstiness (variance-to-mean ratio of per-doc counts)
# ---------------------------------------------------------------------------


@query(
    "c73_term_burstiness",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({sql_simple_tokens('text')}) AS term FROM documents
    ),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    tf AS (SELECT term, doc_id, COUNT(*) AS c FROM tok GROUP BY term, doc_id),
    stats AS (
      SELECT term,
             COUNT(*) AS n_docs,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS sumsq
      FROM tf GROUP BY term
    )
    SELECT term, n_docs, total,
           CAST((1000000 * (n.nd * sumsq - total * total)) // (n.nd * total)
                AS BIGINT) AS vmr_micro
    FROM stats CROSS JOIN n
    ORDER BY total DESC, term
    LIMIT 20
    """,
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C73: term burstiness — the variance-to-mean ratio (Fano factor)
    of each term's per-document count, zeros included. VMR ≈ 1 means
    Poisson-like background vocabulary; VMR >> 1 means the term
    clusters in few documents (topical/boilerplate burst) — the
    dispersion statistic that separates function words from content
    and template terms, complementing c38's raw frequent-ngram count.

    Exactness: with zeros included, var/mean reduces to
    (N·Σc² − (Σc)²) / (N·Σc) — all integers; scaled to micro-units
    with floor division, so no float ever forms.

    Scale shape: one (term, doc) combinable rollup then one term
    rollup (both corpus-shaped, map-side combinable), a 1-row
    broadcast for N, and a top-20 TakeOrdered. No window, no join
    back to the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(simple_tokens("text")).alias("term"))
    nd = docs.agg(F.count("*").alias("nd"))
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    stats = tf.groupBy("term").agg(
        F.count("*").alias("n_docs"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sumsq"),
    )
    return (
        stats.crossJoin(F.broadcast(nd))
        .select(
            "term",
            "n_docs",
            "total",
            F.expr(
                "(1000000 * (nd * sumsq - total * total)) div (nd * total)"
            ).alias("vmr_micro"),
        )
        .orderBy(F.col("total").desc(), "term")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# C80 — Heaps'-law vocabulary growth curve
# ---------------------------------------------------------------------------


@query(
    "c80_heaps_law_curve",
    f"""
    WITH rng AS (
      SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi, COUNT(*) AS nd
      FROM documents
    ),
    d AS (SELECT unnest(generate_series(1, 10)) AS decile),
    cuts AS (
      SELECT d.decile, rng.lo + ((rng.hi - rng.lo + 1) * d.decile) // 10 AS cut
      FROM d CROSS JOIN rng
    ),
    toks AS (
      SELECT doc_id, unnest({sql_simple_tokens('text')}) AS term FROM documents
    ),
    first_seen AS (SELECT term, MIN(doc_id) AS first_doc FROM toks GROUP BY term),
    doc_tokens AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id)
    SELECT c.decile,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id < c.cut) AS BIGINT)
             AS n_docs,
           CAST(coalesce((SELECT SUM(n_toks) FROM doc_tokens WHERE doc_id < c.cut), 0)
                AS BIGINT) AS n_tokens,
           CAST((SELECT COUNT(*) FROM first_seen WHERE first_doc < c.cut) AS BIGINT)
             AS n_distinct_terms
    FROM cuts c
    ORDER BY c.decile
    """,
)
def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C80: Heaps'-law vocabulary growth — cumulative distinct terms
    vs cumulative tokens at ten corpus prefixes (value-based doc_id
    deciles). THE scaling diagnostic for a 100 TB ingest decision:
    fit V ≈ K·nᵝ to the curve and you know how much new vocabulary
    (≙ new information) the next 10× of data buys. Complements c21
    (OOV against a FIXED vocab) and c25 (per-doc novelty) with the
    corpus-level growth trajectory.

    Exactness: cut points are integer arithmetic on broadcast min/max
    ids; every curve point is a count of integers — nothing floats.

    Scale shape: one (term → min doc_id) combinable rollup + one
    (doc → token count) combinable rollup, then each tiny relation is
    bucketed against the BROADCAST 10-row cut table and rolled up —
    no global window, no sort, no per-prefix rescan of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    rng = docs.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    )
    cuts = (
        spark.range(1, 11)
        .select(F.col("id").cast("int").alias("decile"))
        .crossJoin(F.broadcast(rng))
        .select(
            "decile",
            F.expr("lo + ((hi - lo + 1) * decile) div 10").alias("cut"),
        )
    )
    toks = docs.select("doc_id", F.explode(simple_tokens("text")).alias("term"))
    first_seen = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    doc_tokens = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))

    bcuts = F.broadcast(cuts)
    n_docs = (
        docs.select("doc_id")
        .join(bcuts, F.col("doc_id") < F.col("cut"))
        .groupBy("decile")
        .agg(F.count("*").alias("n_docs"))
    )
    n_tokens = (
        doc_tokens.join(bcuts, F.col("doc_id") < F.col("cut"))
        .groupBy("decile")
        .agg(F.sum("n_toks").cast("long").alias("n_tokens"))
    )
    n_terms = (
        first_seen.join(bcuts, F.col("first_doc") < F.col("cut"))
        .groupBy("decile")
        .agg(F.count("*").alias("n_distinct_terms"))
    )
    return (
        cuts.select("decile")
        .join(n_docs, "decile", "left")
        .join(n_tokens, "decile", "left")
        .join(n_terms, "decile", "left")
        .select(
            "decile",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_distinct_terms", F.lit(0))
            .cast("long")
            .alias("n_distinct_terms"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# C107 — count-min sketch: heavy-hitter frequency estimation at fixed memory
# ---------------------------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 1024   # counters per row
_CMS_TOPK = 20  # heavy hitters audited against exact counts


def _cms_sql() -> str:
    rows = ", ".join(str(r) for r in range(_CMS_D))
    est_min = " , ".join(
        f"MAX(CASE WHEN r = {r} THEN cnt END)" for r in range(_CMS_D)
    )
    return f"""
    WITH toks AS (
      SELECT unnest({sql_simple_tokens('text')}) AS tok FROM documents
    ),
    rows_ AS (SELECT unnest([{rows}]) AS r),
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
             least({est_min}) AS n_est
      FROM (SELECT p.tok, p.n_exact, p.rnk, p.r, c.cnt
            FROM probe p JOIN cells c ON c.r = p.r AND c.col = p.col) p
      GROUP BY p.tok, p.n_exact, p.rnk
    )
    SELECT rnk, tok, n_exact, CAST(n_est AS BIGINT) AS n_est,
           CAST(n_est - n_exact AS BIGINT) AS overcount
    FROM est
    ORDER BY rnk
    """


@query(
    "c107_countmin_heavy_hitters",
    _cms_sql(),
    doc="""Oracle builds the same D x W counter table from the same
    md5-derived cells and probes the same exact top-K tokens; every
    emitted column is an integer, and CMS's one-sided error
    (overcount >= 0 always) is part of the checked output.""",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C107: count-min sketch — frequency estimation in FIXED memory
    (D=4 x W=1024 counters, ~32 KB) with one-sided error, audited
    against the exact counts for the corpus's top-20 tokens. Completes
    the sketch shelf: HLL (b13, cardinality), KMV (c102/c103,
    distinct + set algebra), CMS (frequency / heavy hitters).

    Mergeability is the same partial-aggregation algebra as the
    others: CMS counters are plain sums, so per-partition sketches
    combine by elementwise addition — the map-side-combinable groupBy
    that builds the cell table here IS the merge. At 100 TB: exact
    vocabulary counting (c06_vocab_topk) shuffles every distinct
    token; the CMS shuffle is bounded by D x W cells regardless of
    corpus or vocabulary size, and the estimate for any token is the
    min over its D counters — never an undercount (every collision
    only inflates), with overcount bounded by ~2N/W w.h.p.

    Output: the exact top-20 tokens with exact count, CMS estimate,
    and the (always >= 0) overcount — integer-only, bit-portable.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.repartition("doc_id").select(
        F.explode(simple_tokens("text")).alias("tok")
    )
    est = cms_heavy_hitters_from(toks)
    return est.select(
        "rnk",
        "tok",
        "n_exact",
        F.col("n_est").cast("long").alias("n_est"),
        (F.col("n_est") - F.col("n_exact")).cast("long").alias("overcount"),
    ).orderBy("rnk")


def cms_cells_from(toks: DataFrame) -> DataFrame:
    """The D x W CMS counter table (r, col, cnt) over a (tok)
    occurrence relation. Counters are plain sums, so per-batch tables
    merge by elementwise addition — the property s24 exercises under
    incremental arrival."""
    rows_ = F.array(*[F.lit(r) for r in range(_CMS_D)])
    return (
        toks.select("tok", F.explode(rows_).alias("r"))
        .select(
            "r",
            F.pmod(
                md5_64(F.concat(F.col("tok"), F.lit(":"), F.col("r").cast("string"))),
                F.lit(_CMS_W),
            ).alias("col"),
        )
        .groupBy("r", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters_from(toks: DataFrame) -> DataFrame:
    """The c107 core over any (tok) occurrence relation: D x W CMS
    cell table + exact two-phase top-K + broadcast probe. Returns
    (tok, n_exact, rnk, n_est) unordered — shared with the c111
    single-scan corpus profiler."""
    rows_ = F.array(*[F.lit(r) for r in range(_CMS_D)])
    cells = cms_cells_from(toks)
    exact = toks.groupBy("tok").agg(F.count("*").alias("n_exact"))
    from pyspark.sql import Window as W

    # two-phase top-K: per-shard heads first (bounded spill, parallel),
    # then the global rank over <= 8*K survivors — a global window over
    # the full vocabulary would single-task a 10^9-token vocab at
    # 100 TB. Selection (not sampling), so results are identical and
    # the oracle keeps the simple one-window spelling.
    shard_w = W.partitionBy(F.pmod(md5_64("tok"), F.lit(8))).orderBy(
        F.col("n_exact").desc(), F.col("tok")
    )
    heads = (
        exact.withColumn("srn", F.row_number().over(shard_w))
        .filter(F.col("srn") <= _CMS_TOPK)
        .drop("srn")
    )
    hh = (
        heads.withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.col("n_exact").desc(), F.col("tok"))
            ),
        )
        .filter(F.col("rnk") <= _CMS_TOPK)
    )
    probe = hh.select(
        "tok", "n_exact", "rnk", F.explode(rows_).alias("r")
    ).select(
        "tok",
        "n_exact",
        "rnk",
        "r",
        F.pmod(
            md5_64(F.concat(F.col("tok"), F.lit(":"), F.col("r").cast("string"))),
            F.lit(_CMS_W),
        ).alias("col"),
    )
    return (
        probe.join(F.broadcast(cells), ["r", "col"])
        .groupBy("tok", "n_exact", "rnk")
        .agg(
            F.least(
                *[
                    F.max(F.when(F.col("r") == r, F.col("cnt")))
                    for r in range(_CMS_D)
                ]
            ).alias("n_est")
        )
    )


# ---------------------------------------------------------------------------
# C112 — BPE merge-table training: the iterative-algorithm capstone
# ---------------------------------------------------------------------------

_BPE_MERGES = 6  # learned merges; fixed depth keeps the unrolled oracle sane

# Fold markers (outside the fixture's printable-ASCII alphabet): chr(31)
# separates symbols inside the fold's string accumulator, chr(2) closes a
# segment just produced by a merge so it cannot re-merge within the same
# pass (BPE applies each rule left-to-right over NON-overlapping pairs;
# fresh merges become eligible again in the NEXT iteration when the marks
# are stripped).
_BPE_SEP_SQL = "char(31)"   # Spark SQL spelling
_BPE_MARK_SQL = "char(2)"


def _bpe_merge_expr(l: str, r: str) -> str:
    """Spark SQL: apply ONE merge rule (columns ``l``/``r``) to a symbol
    array left-to-right via a string fold — acc holds SEP-joined
    segments; a segment equal to l (and not mark-closed) followed by r
    collapses into l||r||MARK. Mirrored verbatim (modulo dialect
    spellings) by the DuckDB oracle's list_reduce."""
    return f"""split(replace(
         aggregate(syms, '', (acc, x) -> CASE
           WHEN (acc = {l} OR endswith(acc, concat({_BPE_SEP_SQL}, {l}))) AND x = {r}
             THEN concat(substring(acc, 1, length(acc) - length({l})),
                         {l}, {r}, {_BPE_MARK_SQL})
           WHEN acc = '' THEN x
           ELSE concat(acc, {_BPE_SEP_SQL}, x) END),
       {_BPE_MARK_SQL}, ''), {_BPE_SEP_SQL})"""


_BPE_FOLD_SQL = """list_reduce(list_prepend('', syms),
             (acc, x) -> CASE
               WHEN (acc = b.l OR ends_with(acc, chr(31) || b.l)) AND x = b.r
                 THEN substr(acc, 1, length(acc) - length(b.l)) || b.l || b.r || chr(2)
               WHEN acc = '' THEN x
               ELSE acc || chr(31) || x END)"""


def _bpe_train_ctes() -> list[str]:
    """The unrolled {_BPE_MERGES}-iteration training chain (w, s0,
    p1/b1/s1 .. p6/b6/s6) shared by the c112 (merge table) and c113
    (corpus encode) oracles — the c56/PQ discipline: fixed-depth
    iteration as chained CTEs."""
    ctes = [
        f"""w AS (SELECT tok AS word, COUNT(*) AS wcnt
          FROM (SELECT unnest({sql_simple_tokens('text')}) AS tok FROM documents)
          GROUP BY tok)""",
        """s0 AS (SELECT word, wcnt,
                list_transform(generate_series(1, length(word)),
                               i -> substr(word, i, 1)) AS syms
          FROM w)""",
    ]
    for k in range(1, _BPE_MERGES + 1):
        ctes.append(
            f"""p{k} AS (
      SELECT s.l, s.r, SUM(wcnt) AS cnt FROM (
        SELECT wcnt, unnest(list_transform(generate_series(1, len(syms) - 1),
                     i -> struct_pack(l := syms[i], r := syms[i+1]))) AS s
        FROM s{k - 1} WHERE len(syms) >= 2
      ) GROUP BY s.l, s.r
    )"""
        )
        ctes.append(
            f"b{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"""s{k} AS (
      SELECT word, wcnt,
             string_split(replace({_BPE_FOLD_SQL}, chr(2), ''), chr(31)) AS syms
      FROM s{k - 1} CROSS JOIN b{k} b
    )"""
        )
    return ctes


def _bpe_sql() -> str:
    union = "\n      UNION ALL\n      ".join(
        f"SELECT {k} AS step, l AS lhs, r AS rhs, CAST(cnt AS BIGINT) AS pair_count"
        f" FROM b{k}"
        for k in range(1, _BPE_MERGES + 1)
    )
    return (
        "WITH " + ",\n    ".join(_bpe_train_ctes()) + f"""
    SELECT CAST(step AS INT) AS step, lhs, rhs, pair_count FROM (
      {union}
    )
    ORDER BY step
    """
    )


@query(
    "c112_bpe_train",
    _bpe_sql(),
    doc="""Oracle unrolls the identical fixed-depth training loop as
    chained CTEs (the PQ/c56 discipline); the left-to-right
    non-overlapping merge application is the same string fold in both
    engines (aggregate <-> list_reduce), argmax ties break
    lexicographically, and counts are exact integer sums — no float
    caveat anywhere.""",
)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C112: learn a BPE merge table from the corpus — the iterative
    TRAINING loop behind c04_text_token_bpe's static pre-tokenizer,
    expressed as a DataFrame fixed-point iteration (the same
    chained-plan discipline as c56's Lloyd iterations).

    Algorithm (Sennrich et al., standard BPE): start from character
    symbols over the distinct-WORD relation (word, count); each
    iteration counts adjacent symbol pairs weighted by word frequency,
    picks the most frequent pair (ties lexicographic), and merges its
    non-overlapping left-to-right occurrences in every word. Emits the
    learned table: (step, lhs, rhs, pair_count).

    The merge application is a per-word string fold (SEP-joined
    accumulator; a freshly merged segment is mark-closed so it cannot
    re-merge within the same pass but becomes eligible next iteration)
    — identical algebra on both engines, so the whole training run is
    hash-checked end-to-end.

    Scale shape (100 TB): training runs on the DISTINCT-WORD relation
    — vocabulary-bounded, not corpus-bounded. The corpus is scanned
    once for word counts (a combinable groupBy); each of the N
    iterations then costs one pair-count aggregate over ~|vocab| rows
    (shuffle keyed by symbol pair), one global top-1 (sort-limit,
    two-phase), and one 1-row collect of the winning rule (the only
    driver-side traffic — a single (l, r, cnt) triple per iteration,
    folded back in as literals; see _bpe_train_collected for why the
    pre-r15 broadcast-join transport was an O(2^k) planning bomb).
    The symbol relation is checkpointed per iteration so plan k never
    replays its predecessors.
    """
    rules = _bpe_train_collected(spark, sf_dir)
    return spark.createDataFrame(
        rules, "step int, lhs string, rhs string, pair_count long"
    ).orderBy("step")


def _sql_str_lit(s: str) -> str:
    """Spell a Python string as a Spark SQL string literal (backslash
    escaping — the dialect both Spark and the pinned tests use)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bpe_train_collected(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """The c112 training loop, shared by every BPE consumer (c112/
    c113/c115/c117/s31): returns the learned rules as plain tuples
    (step, lhs, rhs, pair_count), in merge order.

    Round-15 optimization (guide §1.2 "the distributed algorithm" /
    §3.3 "very wide plans — planning time itself becomes the
    bottleneck"): the previous shape kept each winning rule as a
    cached 1-row DataFrame and crossJoin-broadcast it into the next
    iteration's fold, so iteration k's lineage contained iteration
    k-1's TWICE (once under syms, once under best -> pairs -> syms) —
    an O(2^k) plan whose explain string hit Spark's 8 MB cap and
    whose CATALYST PLANNING dominated wall time (c112: 6.06 s wall,
    0.07 s of job time; c113: 28.4 s wall, 2.7 s jobs — round-15
    event-log profile). Collecting the single winning rule per
    iteration (a 1-row, vocabulary-bounded collect — the same
    discipline the c115 serving path already used) and folding with
    STRING LITERALS keeps every per-iteration plan O(1)-deep. The
    arithmetic is unchanged: same pair counts, same lexicographic
    tie-break, same fold — only the rule's transport changed
    (broadcast column refs -> literals of the same values).

    The symbol relation is eagerly localCheckpoint'ed per iteration
    (vocabulary-bounded kilobytes) so each pair-count aggregate runs
    on a flat plan instead of replaying the fold chain."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.repartition("doc_id")
        .select(F.explode(simple_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    )
    syms = w.select(
        "word", "wcnt", F.expr("filter(split(word, ''), x -> x <> '')").alias("syms")
    ).localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, int]] = []
    for k in range(1, _BPE_MERGES + 1):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                "wcnt",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1),
                        F.slice("syms", 2, F.size("syms") - 1),
                    )
                ).alias("p"),
            )
            .select(F.col("p.0").alias("l"), F.col("p.1").alias("r"), "wcnt")
            .groupBy("l", "r")
            .agg(F.sum("wcnt").alias("cnt"))
        )
        row = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()[0]
        rules.append((k, row["l"], row["r"], int(row["cnt"])))
        syms = syms.selectExpr(
            "word",
            "wcnt",
            _bpe_merge_expr(_sql_str_lit(row["l"]), _sql_str_lit(row["r"]))
            + " AS syms",
        ).localCheckpoint(eager=True)
    return rules




def _bpe_encode_sql() -> str:
    ctes = _bpe_train_ctes()
    ctes.append(
        f"""ws AS (SELECT source, tok AS word, COUNT(*) AS wcnt
          FROM (SELECT source, unnest({sql_simple_tokens('text')}) AS tok
                FROM documents)
          GROUP BY source, tok)"""
    )
    ctes.append(
        """e0 AS (SELECT source, word, wcnt,
                list_transform(generate_series(1, length(word)),
                               i -> substr(word, i, 1)) AS syms
          FROM ws)"""
    )
    for k in range(1, _BPE_MERGES + 1):
        ctes.append(
            f"""e{k} AS (
      SELECT source, word, wcnt,
             string_split(replace({_BPE_FOLD_SQL}, chr(2), ''), chr(31)) AS syms
      FROM e{k - 1} CROSS JOIN b{k} b
    )"""
        )
    last = f"e{_BPE_MERGES}"
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    , stats AS (
      SELECT source,
             CAST(SUM(wcnt) AS BIGINT) AS n_words,
             CAST(SUM(wcnt * len(syms)) AS BIGINT) AS n_bpe_tokens,
             CAST(SUM(wcnt * length(word)) AS BIGINT) AS n_chars
      FROM {last}
      GROUP BY source
    ),
    vocab AS (
      SELECT source, COUNT(DISTINCT sym) AS n_symbols FROM (
        SELECT source, unnest(syms) AS sym FROM {last}
      ) GROUP BY source
    )
    SELECT s.source, s.n_words, s.n_bpe_tokens,
           CAST(s.n_bpe_tokens * 1000 // s.n_words AS BIGINT) AS bpe_per_kword,
           CAST(s.n_chars * 1000 // s.n_bpe_tokens AS BIGINT)
             AS chars_per_ktoken,
           CAST(v.n_symbols AS BIGINT) AS n_symbols
    FROM stats s JOIN vocab v ON v.source = s.source
    ORDER BY s.source
    """
    )


@query(
    "c113_bpe_encode",
    _bpe_encode_sql(),
    doc="""Oracle re-trains via the shared c112 CTE chain, then applies
    the same six rules to per-source word counts with the identical
    fold — every emitted figure is an exact integer (counts and
    floor-divided ratios), no tolerance surface.""",
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C113: apply the c112-learned merge table to the corpus — the
    ENCODE half of the BPE pair, emitting the per-source tokenization
    profile a data pipeline actually consumes: word count, BPE token
    count, tokens per 1000 words, chars per 1000 tokens (the
    compression the merges bought), and the per-source symbol
    vocabulary after merging.

    Same scale shape as training: encoding statistics run on the
    per-source DISTINCT-WORD relation (each distinct word is folded
    once per rule and its stats weighted by wcnt), so the corpus is
    scanned once for the per-source word counts and everything after
    is vocabulary-bounded. At serving time the learned table would be
    broadcast into a tokenizer UDF over raw text; here the stats ARE
    the deliverable, so the weighted distinct-word form is both
    cheaper and exactly equivalent.
    """
    rules = _bpe_train_collected(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ws = (
        docs.repartition("doc_id")
        .select("source", F.explode(simple_tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("wcnt"))
    )
    enc = ws.select(
        "source", "word", "wcnt",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
    )
    for _, lhs, rhs, _cnt in rules:
        # literal-rule folds (round 15): with the rules collected, each
        # fold references the previous relation exactly ONCE, so the
        # plan stays linear in _BPE_MERGES and the old per-step eager
        # localCheckpoint guard (against the crossJoin-broadcast
        # lineage doubling that OOMed the driver pre-r15) is no longer
        # needed — c113 wall dropped 28.4 s -> ~3 s with job time
        # unchanged (round-15 profile).
        enc = enc.selectExpr(
            "source",
            "word",
            "wcnt",
            _bpe_merge_expr(_sql_str_lit(lhs), _sql_str_lit(rhs)) + " AS syms",
        )
    stats = enc.groupBy("source").agg(
        F.sum("wcnt").cast("long").alias("n_words"),
        F.sum(F.col("wcnt") * F.size("syms")).cast("long").alias("n_bpe_tokens"),
        F.sum(F.col("wcnt") * F.length("word")).cast("long").alias("n_chars"),
    )
    vocab = (
        enc.select("source", F.explode("syms").alias("sym"))
        .groupBy("source")
        .agg(F.count_distinct("sym").alias("n_symbols"))
    )
    return (
        stats.join(vocab, "source")
        .select(
            "source",
            "n_words",
            "n_bpe_tokens",
            F.expr("n_bpe_tokens * 1000 DIV n_words")
            .cast("long")
            .alias("bpe_per_kword"),
            F.expr("n_chars * 1000 DIV n_bpe_tokens")
            .cast("long")
            .alias("chars_per_ktoken"),
            F.col("n_symbols").cast("long"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# C115 — serving-path tokenizer: learned merges applied to RAW text
# ---------------------------------------------------------------------------


def _bpe_apply_merge_py(syms: list[str], l: str, r: str) -> list[str]:
    """Python twin of _bpe_merge_expr's string fold: one left-to-right
    pass merging each (l, r) adjacency greedily, a just-merged segment
    mark-closed (it cannot be the LEFT side of another merge in the
    same pass — the incoming element is always a raw symbol, so it can
    never be the right side either). Kept next to the SQL spelling so
    the three implementations (Spark fold, DuckDB list_reduce, this)
    cannot drift separately; tests/test_llm.py pins them equal on every
    non-empty input (callers only fold words from simple_tokens, which
    filters empties; on an empty array the string-fold spellings yield
    [''] where this returns [] — a documented non-input)."""
    out: list[str] = []
    closed: list[bool] = []
    for x in syms:
        if out and out[-1] == l and not closed[-1] and x == r:
            out[-1] = l + r
            closed[-1] = True
        else:
            out.append(x)
            closed.append(False)
    return out


def _bpe_doc_stats_ctes() -> tuple[list[str], str]:
    """The train chain + per-doc encode chain (wd/d0..dN), shared by
    c115's oracle and s31's per-source rollup oracle (code review r12:
    the streaming entry had copy-pasted these ~30 lines; one source of
    truth means a fold-SQL fix cannot drift between the two)."""
    ctes = _bpe_train_ctes()
    ctes.append(
        f"""wd AS (SELECT doc_id, tok AS word, COUNT(*) AS wcnt
          FROM (SELECT doc_id, unnest({sql_simple_tokens('text')}) AS tok
                FROM documents)
          GROUP BY doc_id, tok)"""
    )
    ctes.append(
        """d0 AS (SELECT doc_id, word, wcnt,
                list_transform(generate_series(1, length(word)),
                               i -> substr(word, i, 1)) AS syms
          FROM wd)"""
    )
    for k in range(1, _BPE_MERGES + 1):
        ctes.append(
            f"""d{k} AS (
      SELECT doc_id, word, wcnt,
             string_split(replace({_BPE_FOLD_SQL}, chr(2), ''), chr(31)) AS syms
      FROM d{k - 1} CROSS JOIN b{k} b
    )"""
        )
    return ctes, f"d{_BPE_MERGES}"


def _bpe_word_stats_factory(merges: list[tuple[str, str]]):
    """A per-partition cached word -> (n_syms, n_chars) closure over
    the collected merge rules — the serving-path kernel shared by
    c115's encoder and s31's ingest ledger (code review r12)."""
    cache: dict[str, tuple[int, int]] = {}

    def word_stats(w: str) -> tuple[int, int]:
        hit = cache.get(w)
        if hit is None:
            syms = [ch for ch in w]
            for l, r in merges:
                syms = _bpe_apply_merge_py(syms, l, r)
            hit = (len(syms), len(w))
            cache[w] = hit
        return hit

    return word_stats


def _bpe_encode_rawtext_sql() -> str:
    ctes, last = _bpe_doc_stats_ctes()
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    , stats AS (
      SELECT doc_id,
             CAST(SUM(wcnt) AS BIGINT) AS n_words,
             CAST(SUM(wcnt * len(syms)) AS BIGINT) AS n_tokens,
             CAST(SUM(wcnt * length(word)) AS BIGINT) AS n_chars
      FROM {last}
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_words, 0) AS n_words,
           coalesce(s.n_tokens, 0) AS n_tokens,
           coalesce(s.n_chars, 0) AS n_chars
    FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
    """
    )


@query(
    "c115_tokenizer_encode",
    _bpe_encode_rawtext_sql(),
    doc="""Oracle re-trains via the shared c112 CTE chain and folds the
    same six rules over PER-DOC word counts; every emitted figure is an
    exact integer count, no tolerance surface.""",
)
def tokenizer_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C115: the SERVING-PATH tokenizer — the c112-learned merge table
    applied to raw ``documents.text``, emitting per-document token
    statistics (n_words, n_tokens after merging, n_chars). This is the
    path VERDICT r10 named as missing #1: c113 computes corpus stats on
    the weighted distinct-word relation; a real pipeline ALSO needs the
    learned model carried into an encoder over raw text (per-doc token
    counts for budgeting, packing, curriculum).

    Scale shape: the learned model is SIX (lhs, rhs) string pairs —
    collected once driver-side (the bounded-model pattern: same as
    shipping centroids or an ADC table) and closed over an Arrow-batched
    ``mapInPandas`` encoder. Raw text is tokenized, each distinct word
    split to chars and folded through the six merges EXACTLY as the
    Spark/DuckDB folds do (_bpe_apply_merge_py is the pinned Python
    twin), with a per-partition word cache so replica-heavy batches pay
    per DISTINCT word. One documents scan, no shuffle of raw text —
    the only exchange in the plan is the final range sort of the
    per-doc count rows (plan-gated). Per-source rollups of this output
    must equal c113's distinct-word algebra exactly — that identity is
    pinned in tests/test_llm.py.
    """
    from collections.abc import Iterator

    import pandas as pd

    from spark_dynamodb_spark.sources.dynamo import _ship_package

    # the encode closure references module globals (_bpe_apply_merge_py),
    # pickled BY REFERENCE — ship the package zip so out-of-repo worker
    # processes can import it (the multimodal/_ensure_worker_imports
    # lesson; in-repo pytest never catches this class)
    _ship_package(spark)
    merges = [
        (lhs, rhs) for _, lhs, rhs, _cnt in _bpe_train_collected(spark, sf_dir)
    ]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        word_stats = _bpe_word_stats_factory(merges)

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                _ascii_guard(text, "c115_tokenizer_encode")
                toks = [t for t in (text or "").lower().split(" ") if t]
                n_tokens = 0
                n_chars = 0
                for w in toks:
                    s, c = word_stats(w)
                    n_tokens += s
                    n_chars += c
                rows.append((int(doc_id), len(toks), n_tokens, n_chars))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_tokens", "n_chars"]
            )

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "text")
        .mapInPandas(encode, "doc_id long, n_words long, n_tokens long, n_chars long")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C116 — unigram-LM (SentencePiece-style) tokenizer training: hard-EM
# ---------------------------------------------------------------------------

def _ascii_guard(text: str | None, op: str) -> None:
    """The serving encoders lowercase/split with Python ``str``
    methods while the training relations and oracles use SQL
    ``lower()``/``split()`` — these agree only on ASCII (Python
    'İ'.lower() is TWO chars, breaking the pinned serve<->train
    identities silently). Fail loudly instead (ADVICE r11)."""
    if text and not text.isascii():
        raise ValueError(
            f"{op}: non-ASCII document text — Python and SQL lowercase "
            "semantics diverge outside ASCII; normalize the corpus "
            "upstream (e.g. c04_text_normalize) before serving"
        )


_ULM_WMAX = 12     # segmentation key: the word's first 12 chars (FULL
                   # words for any real-ish corpus word; fixture max is 8)
_ULM_MAXP = 3      # max piece length
_ULM_KMAX = 9      # max pieces per word: words <= 9 chars get the
                   # COMPLETE segmentation space; 10..12-char words only
                   # lose the near-all-singles tail (k > 9)
_ULM_ITERS = 2     # fixed-depth Viterbi-EM (c112/c56 discipline)
_ULM_SCALE = 10_000  # probability quantization: q = cnt*SCALE DIV total;
                     # SCALE^KMAX = 1e36 keeps every score exact inside
                     # DECIMAL(38,0) / HUGEINT (see _ulm_pattern_rows)
_ULM_TOPN = 40


def _ulm_pattern_rows() -> list[tuple[int, list[int], list[int], int, int]]:
    """All compositions of n in 1.._ULM_WMAX into at most _ULM_KMAX
    parts of 1.._ULM_MAXP, as (n, starts, lens, k, boost) where boost
    = SCALE^(KMAX - k). 1951 rows — generated here for the Spark
    frame and by the textually-pinned recursive CTE (_ULM_PAT_CTES)
    for the oracle; tests/test_llm.py asserts the two enumerations are
    row-identical so the segmentation spaces cannot drift.

    Round-12 full-word upgrade (VERDICT r11 #3): round 11 segmented
    6-char word PREFIXES because boost = SCALE^(PFX-k) with SCALE=1e6
    overflows DECIMAL(38,0) past 6 pieces. Trading quantization
    granularity for length (SCALE 1e6 -> 1e4, KMAX 6 -> 9) keeps the
    same exactness invariant — each quantized piece prob is <= SCALE,
    so score = prod(q_i) * boost <= SCALE^KMAX = 1e36 — while words up
    to 9 chars (every word in the fixtures) segment over their FULL
    composition space, not a prefix."""
    rows = []
    for n in range(1, _ULM_WMAX + 1):
        pats: list[list[int]] = []

        def rec(left: int, acc: list[int]) -> None:
            if left == 0:
                pats.append(list(acc))
                return
            if len(acc) >= _ULM_KMAX:
                return
            for ln in range(1, min(_ULM_MAXP, left) + 1):
                rec(left - ln, acc + [ln])

        rec(n, [])
        for lens in pats:
            starts, s = [], 1
            for ln in lens:
                starts.append(s)
                s += ln
            k = len(lens)
            rows.append((n, starts, lens, k, _ULM_SCALE ** (_ULM_KMAX - k)))
    return rows


# The oracle-side twin of _ulm_pattern_rows: a recursive composition
# enumerator (1951 rows is too large for a readable VALUES literal).
# boost = SCALE^(KMAX-k) is built as a decimal string so it stays an
# exact HUGEINT — repeat('0', 4*(KMAX-k)) is 10000^(KMAX-k).
_ULM_PAT_CTES = [
    f"""patr(n, k, lens, starts) AS (
      SELECT 0, 0, CAST([] AS INT[]), CAST([] AS INT[])
      UNION ALL
      SELECT p.n + l.l, p.k + 1,
             list_append(p.lens, l.l), list_append(p.starts, p.n + 1)
      FROM patr p, (VALUES (1), (2), (3)) l(l)
      WHERE p.n + l.l <= {_ULM_WMAX} AND p.k < {_ULM_KMAX}
        AND l.l <= {_ULM_MAXP})""",
    f"""pat AS (
      SELECT n, k, lens, starts,
             CAST('1' || repeat('0000', {_ULM_KMAX} - k) AS HUGEINT) AS boost
      FROM patr WHERE n > 0)""",
]

_ULM_PIECES_EXPR = (
    "flatten(transform(sequence(1, length(wseg)), "
    f"s -> transform(sequence(1, least({_ULM_MAXP}, length(wseg) - s + 1)), "
    "l -> substring(wseg, s, l))))"
)

_ULM_PIECES_SQL = (
    "flatten(list_transform(generate_series(1, length(wseg)), "
    f"s -> list_transform(generate_series(1, least({_ULM_MAXP}, length(wseg) - s + 1)), "
    "l -> substr(wseg, s, l))))"
)


def _ulm_ctes() -> tuple[list[str], str]:
    """The shared unigram-LM CTE chain (w, wseg, patr/pat, v0, then
    per iteration t: t/q/cand/ex/scored/best/u/v) — returns (ctes,
    final_vocab_name). Shared by the c116 oracle and c117's
    fertility-comparison oracle, the c112/_bpe_train_ctes discipline.
    NOTE: consumers must emit ``WITH RECURSIVE`` — the composition
    space is enumerated by the patr recursion."""
    ctes = [
        f"""w AS (SELECT tok AS word, COUNT(*) AS wcnt
          FROM (SELECT unnest({sql_simple_tokens('text')}) AS tok FROM documents)
          GROUP BY tok)""",
        f"""wseg AS (SELECT substr(word, 1, {_ULM_WMAX}) AS wseg, SUM(wcnt) AS wcnt
          FROM w GROUP BY 1)""",
        *_ULM_PAT_CTES,
        f"""v0 AS (SELECT piece, SUM(wcnt) AS cnt FROM (
          SELECT wcnt, unnest({_ULM_PIECES_SQL}) AS piece FROM wseg)
          GROUP BY piece)""",
    ]
    prev = "v0"
    for t in range(1, _ULM_ITERS + 1):
        ctes += _ulm_estep_ctes(t, prev)
        ctes += [
            f"""u{t} AS (SELECT piece, SUM(wcnt) AS used FROM (
          SELECT wcnt, unnest(pieces) AS piece FROM best{t})
          GROUP BY piece)""",
            f"""v{t} AS (SELECT v.piece, 1 + coalesce(u.used, 0) AS cnt
          FROM v0 v LEFT JOIN u{t} u ON u.piece = v.piece)""",
        ]
        prev = f"v{t}"
    return ctes, prev


def _ulm_estep_ctes(t: int, vocab: str) -> list[str]:
    """One E-step as CTEs t{t}/q{t}/cand{t}/ex{t}/scored{t}/best{t}
    over vocabulary relation ``vocab``. Candidates are keyed by
    seg_str (the '|'-joined pieces), which is unique per composition
    of a given word."""
    return [
        f"t{t} AS (SELECT SUM(cnt) AS tot FROM {vocab})",
        f"""q{t} AS (SELECT piece, cnt * {_ULM_SCALE} // tot AS q
          FROM {vocab} CROSS JOIN t{t})""",
        f"""cand{t} AS (
      SELECT w.wseg, w.wcnt, p.k, p.boost,
             list_transform(generate_series(1, p.k),
                            i -> substr(w.wseg, p.starts[i], p.lens[i])) AS pieces
      FROM wseg w JOIN pat p ON p.n = length(w.wseg))""",
        f"""ex{t} AS (
      SELECT c.wseg, c.wcnt, c.k, c.boost, c.pieces,
             array_to_string(c.pieces, '|') AS seg_str,
             unnest(c.pieces) AS piece
      FROM cand{t} c)""",
        f"""scored{t} AS (
      SELECT e.wseg, e.wcnt, e.k, e.pieces, e.seg_str,
             list_reduce(list_prepend(any_value(e.boost),
                                      list(q.q::HUGEINT)),
                         (a, b) -> a * b) AS score
      FROM ex{t} e JOIN q{t} q ON q.piece = e.piece
      GROUP BY e.wseg, e.wcnt, e.k, e.pieces, e.seg_str)""",
        f"""best{t} AS (
      SELECT * FROM (
        SELECT wseg, wcnt, k, pieces,
               row_number() OVER (PARTITION BY wseg
                 ORDER BY score DESC, k ASC, seg_str ASC) AS rn
        FROM scored{t}) WHERE rn = 1)""",
    ]


def _ulm_sql() -> str:
    ctes, prev = _ulm_ctes()
    return (
        "WITH RECURSIVE " + ",\n    ".join(ctes) + f"""
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) AS BIGINT)
             AS rank,
           piece,
           CAST(cnt AS BIGINT) AS cnt
    FROM {prev}
    ORDER BY cnt DESC, piece ASC
    LIMIT {_ULM_TOPN}
    """
    )


def _ulm_relations(spark: SparkSession, sf_dir: str):
    """(wseg, cand, seed, vocab0) — the bounded training relations:
    the distinct full-word counts (12-char segmentation key), the
    per-word candidate segmentations (joined against the broadcast
    1951-row composition table), the seed piece domain, and the
    occurrence-weighted seed counts. Each eagerly checkpointed: they
    are re-read every iteration and the chain must not re-derive them
    (c112 lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    wseg = (
        docs.repartition("doc_id")
        .select(F.explode(simple_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
        .select(F.expr(f"substring(word, 1, {_ULM_WMAX})").alias("wseg"), "wcnt")
        .groupBy("wseg")
        .agg(F.sum("wcnt").alias("wcnt"))
        .localCheckpoint(eager=True)
    )
    pat = spark.createDataFrame(
        [
            (n, starts, lens, k, str(boost))
            for n, starts, lens, k, boost in _ulm_pattern_rows()
        ],
        "n int, starts array<int>, lens array<int>, k int, boost_s string",
    ).select(
        "n", "starts", "lens", "k",
        F.col("boost_s").cast("decimal(38,0)").alias("boost"),
    )
    vocab0 = (
        wseg.select("wcnt", F.explode(F.expr(_ULM_PIECES_EXPR)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcnt").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    cand = (
        wseg.join(F.broadcast(pat), F.length("wseg") == F.col("n"))
        .select(
            "wseg",
            "wcnt",
            "k",
            "boost",
            F.expr(
                "transform(sequence(1, k), "
                "i -> substring(wseg, element_at(starts, i), element_at(lens, i)))"
            ).alias("pieces"),
        )
        .withColumn("seg_str", F.array_join("pieces", "|"))
        .localCheckpoint(eager=True)
    )
    return wseg, cand, vocab0.select("piece"), vocab0


def _ulm_estep(cand: DataFrame, vocab: DataFrame) -> DataFrame:
    """One Viterbi E-step: every word picks its max-score segmentation
    under ``vocab`` — returns (wseg, wcnt, k, pieces). Scores are
    exact bounded integers (see _ulm_pattern_rows)."""
    from pyspark.sql import Window as W

    total = vocab.agg(F.sum("cnt").alias("tot"))
    q = vocab.crossJoin(F.broadcast(total)).select(
        "piece", F.expr(f"cnt * {_ULM_SCALE} DIV tot").alias("q")
    )
    scored = (
        cand.select(
            "wseg", "wcnt", "k", "boost", "seg_str",
            "pieces", F.explode("pieces").alias("piece"),
        )
        .join(q, "piece")
        .groupBy("wseg", "wcnt", "k", "boost", "seg_str", "pieces")
        .agg(F.collect_list("q").alias("qs"))
        .select(
            "wseg",
            "wcnt",
            "k",
            "seg_str",
            "pieces",
            F.expr(
                "aggregate(qs, boost, (a, x) -> a * CAST(x AS DECIMAL(38,0)))"
            ).alias("score"),
        )
    )
    return (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("wseg").orderBy(
                    F.col("score").desc(), F.col("k").asc(), F.col("seg_str").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("wseg", "wcnt", "k", "pieces")
    )


def _ulm_train(spark: SparkSession, sf_dir: str):
    """Run the fixed-depth hard-EM loop; returns (wseg, cand,
    vocab_final) — wseg rides along so c117's BPE side doesn't re-run
    _ulm_relations' three eager materializations just to rebuild it
    (code-review r11). Each M-step re-estimates counts from the chosen
    segmentations with add-one smoothing over the seed domain, then
    checkpoints."""
    wseg, cand, seed, vocab = _ulm_relations(spark, sf_dir)
    for _ in range(_ULM_ITERS):
        best = _ulm_estep(cand, vocab)
        used = (
            best.select("wcnt", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("wcnt").alias("used"))
        )
        vocab = (
            seed.join(used, "piece", "left")
            .select("piece", (F.lit(1) + F.coalesce("used", F.lit(0))).alias("cnt"))
            .localCheckpoint(eager=True)
        )
    return wseg, cand, vocab


@query(
    "c116_unigram_lm_train",
    _ulm_sql(),
    doc="""Oracle unrolls the same two Viterbi-EM iterations as chained
    CTEs over the recursively-enumerated composition space; every
    score is an exact bounded integer (quantized probs, HUGEINT
    products), every emitted figure an integer or string — no
    tolerance surface.""",
)
def unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C116: unigram-LM tokenizer training (SentencePiece-style) — the
    EM-based alternative a data team compares against BPE (c112), as a
    fixed-depth DataFrame iteration with integer-exact E and M steps
    (VERDICT r10 "Next round" #3; full words per VERDICT r11 #2).

    Semantics (bounded so the unrolled oracle stays tractable, the
    c112 discipline — but FULL-WORD as of round 12): words segment
    over their first 12 chars (_ULM_WMAX — full words in any fixture;
    max fixture word is 8 chars) into at most 9 pieces (_ULM_KMAX) of
    length <= 3 (_ULM_MAXP), so every word <= 9 chars gets its
    COMPLETE segmentation space; the seed vocabulary is every such
    substring with occurrence-weighted counts. Each of the 2 hard-EM
    iterations: (E) every word picks its max-probability segmentation
    — piece probabilities quantized to cnt*1e4 DIV total so each
    segmentation score prod(q_i) * SCALE^(KMAX-k) is an EXACT integer
    <= 1e36 (inside DECIMAL(38,0) / HUGEINT; identical floor-division
    in both engines), ties broken (fewer pieces, then lexicographic
    segmentation string); (M) piece counts re-estimated from the
    chosen segmentations with add-one smoothing over the seed
    vocabulary (keeps every piece scorable — no zero-probability dead
    ends). Output: the top 40 pieces by final count — the learned
    piece inventory.

    Scale shape (the c112 story): training runs entirely on the
    DISTINCT-WORD relation — the corpus is scanned ONCE for word
    counts; candidate enumeration is a broadcast join against the
    1951-row composition table (<= 860 segmentations per word, <= 81
    for fixture-length words); the only per-iteration shuffles are the
    piece-keyed q-join and the per-word argmax window, both bounded by
    |distinct words| x |compositions|, never corpus-sized. Each
    vocabulary update localCheckpoints (the c112/c113 CollapseProject
    lineage-cut lesson). The final global rank window runs on the
    piece inventory only.
    """
    from pyspark.sql import Window as W

    _, _, vocab = _ulm_train(spark, sf_dir)
    return (
        vocab.withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.col("cnt").desc(), F.col("piece").asc()))
            .cast("long"),
        )
        .filter(F.col("rank") <= _ULM_TOPN)
        .select("rank", "piece", F.col("cnt").cast("long").alias("cnt"))
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# C117 — tokenizer fertility: unigram-LM vs BPE on the same prefix corpus
# ---------------------------------------------------------------------------


@query(
    "c117_tokenizer_fertility_compare",
    None,  # oracle patched at module end (composes the c112 BPE CTEs)
)
def tokenizer_fertility_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C117: the tokenizer-selection artifact — fertility (tokens per
    1000 words) of the c116 unigram-LM model vs the c112 BPE merges on
    the SAME corpus relation, apples-to-apples: both tokenizers applied
    to the distinct FULL-WORD relation (the unigram model's domain —
    round 12 upgraded from 6-char prefixes, VERDICT r11 #3), weighted
    by word counts. One row per tokenizer: (tokenizer, n_words,
    n_tokens, tokens_per_kword), all exact integers. This is the
    comparison row VERDICT r10 asked to pair with the unigram trainer
    — what a data team reads before picking the tokenizer for a
    corpus; with full words the figures are directly comparable to
    real tokenizers' fertility numbers.

    Scale shape: both sides run on the bounded distinct-word relation
    (corpus scanned once via the shared word count); the unigram side
    is one serving E-step with the trained vocabulary; the BPE side
    folds six broadcast rules over the distinct words. Nothing is
    corpus-sized after the first aggregation.
    """
    wseg, cand, vocab = _ulm_train(spark, sf_dir)
    best = _ulm_estep(cand, vocab)
    uni = best.agg(
        F.sum("wcnt").cast("long").alias("n_words"),
        F.sum(F.col("wcnt") * F.col("k")).cast("long").alias("n_tokens"),
    ).select(F.lit("unigram").alias("tokenizer"), "n_words", "n_tokens")

    rules = _bpe_train_collected(spark, sf_dir)
    enc = wseg.select(
        "wseg", "wcnt", F.expr("filter(split(wseg, ''), x -> x <> '')").alias("syms")
    )
    for _, lhs, rhs, _cnt in rules:
        # literal-rule folds — linear plan, no per-step checkpoint
        # needed (see c113; round-15 BPE restructure)
        enc = enc.selectExpr(
            "wseg",
            "wcnt",
            _bpe_merge_expr(_sql_str_lit(lhs), _sql_str_lit(rhs)) + " AS syms",
        )
    bpe = enc.agg(
        F.sum("wcnt").cast("long").alias("n_words"),
        F.sum(F.col("wcnt") * F.size("syms")).cast("long").alias("n_tokens"),
    ).select(F.lit("bpe").alias("tokenizer"), "n_words", "n_tokens")

    return (
        uni.unionByName(bpe)
        .select(
            "tokenizer",
            "n_words",
            "n_tokens",
            F.expr("n_tokens * 1000 DIV n_words").cast("long").alias(
                "tokens_per_kword"
            ),
        )
        .orderBy("tokenizer")
    )


def _finalize_c117_oracle() -> None:
    """Composes the unigram chain (+1 serving E-step) with the c112 BPE
    training chain applied to the same distinct-word relation. The BPE
    chain's own w/s0 CTEs train on FULL words (exactly as c112 does);
    the encode fold then runs over the shared wseg relation."""
    from spark_dynamodb_spark.registry import REGISTRY

    ctes, prev = _ulm_ctes()
    t = _ULM_ITERS + 1
    ctes += _ulm_estep_ctes(t, prev)
    # c112 training chain: w and the s0/p/b/s iteration CTEs — w is
    # already defined identically in _ulm_ctes (same definition text),
    # so append only s0 onward.
    bpe_ctes = _bpe_train_ctes()
    # the BPE chain's w CTE is substituted by the unigram chain's w —
    # valid only while the two definitions are TEXTUALLY identical
    # (code-review r11: a startswith check would let a drifted c112
    # word relation silently train BPE on the wrong words here)
    assert bpe_ctes[0] == ctes[0], "c112/c116 w CTE drifted apart"
    ctes += bpe_ctes[1:]
    ctes.append(
        """e0 AS (SELECT wseg, wcnt,
            list_transform(generate_series(1, length(wseg)),
                           i -> substr(wseg, i, 1)) AS syms
          FROM wseg)"""
    )
    for k in range(1, _BPE_MERGES + 1):
        ctes.append(
            f"""e{k} AS (
      SELECT wseg, wcnt,
             string_split(replace({_BPE_FOLD_SQL}, chr(2), ''), chr(31)) AS syms
      FROM e{k - 1} CROSS JOIN b{k} b
    )"""
        )
    REGISTRY.resolve("c117_tokenizer_fertility_compare").oracle = (
        "WITH RECURSIVE " + ",\n    ".join(ctes) + f"""
    , uni AS (
      SELECT 'unigram' AS tokenizer,
             CAST(SUM(wcnt) AS BIGINT) AS n_words,
             CAST(SUM(wcnt * k) AS BIGINT) AS n_tokens
      FROM best{t}
    ),
    bpe AS (
      SELECT 'bpe' AS tokenizer,
             CAST(SUM(wcnt) AS BIGINT) AS n_words,
             CAST(SUM(wcnt * len(syms)) AS BIGINT) AS n_tokens
      FROM e{_BPE_MERGES}
    )
    SELECT tokenizer, n_words, n_tokens,
           CAST(n_tokens * 1000 // n_words AS BIGINT) AS tokens_per_kword
    FROM (SELECT * FROM uni UNION ALL SELECT * FROM bpe)
    ORDER BY tokenizer
    """
    )


_finalize_c117_oracle()


# ---------------------------------------------------------------------------
# C119 — unigram-LM serving encoder: trained model over RAW text
# ---------------------------------------------------------------------------


def _ulm_segment_py(
    wseg: str, q: dict[str, int], patterns: dict[int, list]
) -> int:
    """Python twin of the _ulm_estep argmax for ONE word: returns k
    (piece count) of the winning segmentation. Arithmetic is
    arbitrary-precision Python int — identical by construction to the
    Spark DECIMAL(38,0) / DuckDB HUGEINT scores (all values <= 1e36,
    same floor-divided quantized probs, same (score DESC, k ASC,
    seg_str ASC) tie-break).

    Candidates containing a piece ABSENT from ``q`` are skipped
    entirely — mirroring _ulm_estep's INNER join on the q relation,
    where such candidates never reach the argmax (ADVICE r11: scoring
    them 0 instead could flip the winner on out-of-corpus words;
    absent-from-q is distinct from present-with-q==0, which scores 0
    and stays). Unreachable when serving the training corpus (the
    seed vocabulary covers every substring of every word), so running
    out of candidates entirely is an error by construction."""
    best = None  # (neg marker handled via comparisons)
    best_k = None
    for starts, lens, k, boost in patterns[len(wseg)]:
        pieces = [wseg[s - 1 : s - 1 + ln] for s, ln in zip(starts, lens)]
        score = boost
        oov = False
        for p in pieces:
            qp = q.get(p)
            if qp is None:
                oov = True  # join semantics: candidate drops out
                break
            score *= qp
        if oov:
            continue
        seg = "|".join(pieces)
        cand = (-score, k, seg)
        if best is None or cand < best:
            best = cand
            best_k = k
    if best_k is None:
        raise ValueError(
            "_ulm_segment_py: every candidate segmentation contains an "
            f"out-of-vocabulary piece for {wseg!r} — the encoder is being "
            "served a corpus the model was not trained on"
        )
    return best_k


def _ulm_encode_sql() -> str:
    ctes, prev = _ulm_ctes()
    t = _ULM_ITERS + 1
    ctes += _ulm_estep_ctes(t, prev)  # serving E-step with the final vocab
    ctes.append(
        f"""dw AS (SELECT doc_id, substr(tok, 1, {_ULM_WMAX}) AS wseg,
                 COUNT(*) AS n
          FROM (SELECT doc_id, unnest({sql_simple_tokens('text')}) AS tok
                FROM documents)
          GROUP BY doc_id, wseg)"""
    )
    ctes.append(
        f"""ds AS (SELECT d.doc_id,
                 CAST(SUM(d.n) AS BIGINT) AS n_words,
                 CAST(SUM(d.n * b.k) AS BIGINT) AS n_pieces
          FROM dw d JOIN best{t} b ON b.wseg = d.wseg
          GROUP BY d.doc_id)"""
    )
    return (
        "WITH RECURSIVE " + ",\n    ".join(ctes) + """
    SELECT d.doc_id,
           coalesce(s.n_words, 0) AS n_words,
           coalesce(s.n_pieces, 0) AS n_pieces
    FROM documents d LEFT JOIN ds s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
    """
    )


@query(
    "c119_unigram_encode",
    _ulm_encode_sql(),
    doc="""Oracle re-trains via the shared unigram CTE chain, runs one
    serving E-step, and folds per-doc prefix counts through the
    winning piece counts; exact integers throughout.""",
)
def unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C119: the unigram-LM SERVING encoder — the c115 twin for the
    c116-trained model, completing the tokenizer family end-to-end
    (train c112/c116, corpus-stats c113/c117, raw-text serve
    c115/here). The trained piece table (piece -> quantized prob q,
    plus the 1951-row composition table) is collected once driver-side
    — tokenizer vocabularies ARE the MB-scale bounded model every
    serving stack ships — and closed over an Arrow-batched
    mapInPandas Viterbi encoder: per document, per DISTINCT word
    (per-partition cache), enumerate the length-bounded candidate
    segmentations and take the SAME integer-exact argmax as training
    (_ulm_segment_py is the pinned Python twin of _ulm_estep; Python
    arbitrary-precision ints reproduce the DECIMAL(38,0)/HUGEINT
    scores bit-for-bit because every value is <= 1e36). Emits per-doc
    (n_words, n_pieces).

    Scale shape: model collection is piece-inventory bounded (never
    corpus-bounded); the encode pass is ONE pruned documents scan into
    mapInPandas with no shuffle of raw text (plan-gated, same shape
    as c115); corpus-level rollups of this output must equal c117's
    unigram row exactly — pinned in tests/test_llm.py.
    """
    from collections.abc import Iterator

    import pandas as pd

    from spark_dynamodb_spark.sources.dynamo import _ship_package

    _ship_package(spark)
    _, _, vocab = _ulm_train(spark, sf_dir)
    model = vocab.collect()
    total = sum(r["cnt"] for r in model)
    q = {r["piece"]: r["cnt"] * _ULM_SCALE // total for r in model}
    patterns: dict[int, list] = {}
    for n, starts, lens, k, boost in _ulm_pattern_rows():
        patterns.setdefault(n, []).append((starts, lens, k, boost))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def k_of(word: str) -> int:
            wseg = word[:_ULM_WMAX]
            hit = cache.get(wseg)
            if hit is None:
                hit = _ulm_segment_py(wseg, q, patterns)
                cache[wseg] = hit
            return hit

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                _ascii_guard(text, "c119_unigram_encode")
                toks = [t for t in (text or "").lower().split(" ") if t]
                rows.append(
                    (int(doc_id), len(toks), sum(k_of(w) for w in toks))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_words", "n_pieces"])

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "text")
        .mapInPandas(encode, "doc_id long, n_words long, n_pieces long")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C126 — TRUE-FLOAT unigram perplexity eval (round 14, VERDICT r13 #6):
# the float logprob/perplexity member of the banded-eval family.
# ---------------------------------------------------------------------------


@query("c126_unigram_perplexity_eval", None)  # rows-only BY DESIGN (float)
def unigram_perplexity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C126: per-source unigram-LM perplexity — the float eval every
    data-mixture team actually reads (c82/c84 weight by token counts;
    this scores how SURPRISING each source is under the corpus-wide
    unigram model, the classic quality/domain-shift signal). Model:
    maximum-likelihood unigram probabilities over the whole corpus
    (simple_tokens; every scored word is in-vocabulary by
    construction, so no smoothing term muddies the reference).
    Per source: n_docs, n_tokens, total log-probability
    sum(log(cnt_w)) - n_tokens * log(total_tokens) — the factored
    form moves ONE log per distinct corpus word instead of per token
    — and perplexity exp(-logprob / n_tokens).

    Driver contract: rows-only BY CONSTRUCTION — logprob is a sum of
    millions of float logs whose value depends on summation order;
    no hashable SQL twin exists. STRONG check: the banded pytest
    (tests/float_compare.py) recomputes every source with a pure
    Python Counter + math.fsum reference (different log
    implementation call pattern, different summation algorithm) and
    the results must agree within explicit rtol/ulp bands.

    Scale shape: TEXT is scanned once — the (source, word, n)
    relation is vocabulary-x-sources bounded, so it localCheckpoints
    (the c121 staging discipline) and BOTH the corpus-wide model and
    the per-source scoring derive from it; the only other documents
    touch is the n_docs rollup, a source-column-only pruned scan
    (empty-text docs must still count, so it cannot ride the token
    relation). Plan-gated: exactly one text-bearing scan."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(simple_tokens("text")).alias("word")
    )
    # the one text scan: per-(source, word) counts, staged bounded
    sw = (
        tok.groupBy("source", "word")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    wc = sw.groupBy("word").agg(F.sum("n").alias("cnt"))
    total = wc.agg(F.sum("cnt").alias("t")).collect()[0][0]
    per_src = (
        sw.join(wc, "word")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * F.log("cnt")).alias("sum_log_cnt"),
        )
    )
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    logprob = F.col("sum_log_cnt") - F.col("n_tokens") * F.log(F.lit(float(total)))
    return (
        per_src.join(nd, "source")
        .select(
            "source",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            logprob.alias("logprob"),
            F.exp(-logprob / F.col("n_tokens")).alias("perplexity"),
        )
        .orderBy("source")
    )
