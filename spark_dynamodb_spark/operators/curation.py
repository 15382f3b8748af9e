"""Round-4 corpus-curation operators: PII redaction, boilerplate
removal, and model-based quality filtering (SURVEY §2 Part C family —
the training-data pipeline stages between raw crawl and dedup).

Reference parity: the reference connector has no text surface at all
(SURVEY §0 — it delegates everything past the scan to Spark); these
are the LLM-pipeline extension mandated by the build brief, expressed
as pure DataFrame plans.

Hash discipline: cross-engine comparisons hash via md5 (functions/
text.py); everything shuffled is hashes/counts, never raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.text import (
    md5_64,
    simple_tokens,
    sql_md5_64,
    sql_simple_tokens,
)
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table

# ---------------------------------------------------------------------------
# C37 — PII detection + redaction
# ---------------------------------------------------------------------------
#
# The fixture corpus is synthetic word soup with no natural PII, so the
# operator plants deterministic PII first — an email and a long numeric
# reference derived from doc_id, via IDENTICAL string expressions in
# both engines — and then proves the detector/redactor finds and strips
# exactly what was planted. The regexes use only constructs with the
# same semantics in Java regex (Spark) and RE2 (DuckDB).

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_LONGNUM_RE = r"\d{7,}"


@query(
    "c37_pii_redaction",
    f"""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com ref '
                  || CAST(1000000 + (doc_id * 37) % 9000000 AS VARCHAR)
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(
                  regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                  '{_LONGNUM_RE}')) AS BIGINT)
             AS n_longnums,
           md5(regexp_replace(
                 regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_LONGNUM_RE}', '<NUM>', 'g'))
             AS redacted_hash
    FROM planted
    ORDER BY doc_id
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37: PII scrub — detect emails and long numeric identifiers,
    count them, and emit the md5 of the fully-redacted text (emails →
    <EMAIL> first, then surviving 7+-digit runs → <NUM>; the order
    matters because email local parts contain digits). The fixture
    has no natural PII, so deterministic PII is planted per doc_id by
    the same expression in both engines — the green row proves the
    detector finds exactly what was planted and the redaction is
    byte-identical.

    Scale shape: pure narrow map (regex inside whole-stage codegen),
    no shuffle at all except the output ORDER BY; at 100 TB this
    pipelines with the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com ref "),
            (1000000 + (F.col("doc_id") * 37) % 9000000).cast("string"),
        ).alias("text"),
    )
    no_email = F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(_LONGNUM_RE), F.lit(0)))
        .cast("long")
        .alias("n_longnums"),
        F.md5(
            F.regexp_replace(no_email, _LONGNUM_RE, "<NUM>").cast("binary")
        ).alias("redacted_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C38 — boilerplate n-gram detection
# ---------------------------------------------------------------------------

BP_K = 8  # token n-gram width
BP_MIN_DOCS = 3  # a gram in >= this many distinct docs is boilerplate


def _sql_grams(k: int) -> str:
    """DuckDB: all k-token windows of a doc (docs with >= k tokens)."""
    return f"""
      SELECT doc_id, gram
      FROM (
        SELECT doc_id, {sql_simple_tokens('text')} AS toks FROM documents
      ), LATERAL (
        SELECT unnest(list_transform(
                 range(1, len(toks) - {k - 1} + 1),
                 i -> array_to_string(toks[i:i + {k - 1}], ' '))) AS gram
      )
      WHERE len(toks) >= {k}
    """


@query(
    "c38_boilerplate_ngrams",
    f"""
    WITH grams AS ({_sql_grams(BP_K)}),
    hashed AS (SELECT doc_id, {sql_md5_64('gram')} AS h FROM grams),
    bp AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM hashed)
      GROUP BY h HAVING count(*) >= {BP_MIN_DOCS}
    )
    SELECT doc_id,
           count(*) AS n_grams,
           CAST(count(CASE WHEN bp.h IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_boilerplate
    FROM hashed LEFT JOIN bp ON hashed.h = bp.h
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38: boilerplate detection — token 8-grams shared by >= 3
    distinct documents are "boilerplate" (headers, footers, license
    blurbs in a real crawl); each doc reports how many of its gram
    positions hit the boilerplate set. The removal step is then a
    trivial filter on the same join.

    Scale shape: grams hash to 64-bit ints at the source (shuffles
    carry hashes, never text); the boilerplate set is the output of a
    distinct+HAVING rollup — usually tiny, but not provably bounded,
    so its join back into the per-doc count carries NO hard broadcast
    hint (AQE broadcasts when it fits). All exchanges carry
    (doc_id, hash) pairs.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", simple_tokens("text").alias("toks")
    ).filter(F.size("toks") >= BP_K)
    # positions 1..n-k+1; zip_with-free spelling: transform over index range
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (BP_K - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, BP_K)),
            )
        ).alias("gram"),
    )
    hashed = grams.select("doc_id", md5_64("gram").alias("h"))
    bp = (
        hashed.distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= BP_MIN_DOCS)
        .select("h", F.lit(1).alias("is_bp"))
    )
    return (
        # bp is usually tiny but NOT provably bounded (a template-heavy
        # corpus can have a huge boilerplate set) — leave the build-side
        # choice to AQE rather than a hard hint (r1 minhash rule)
        hashed.join(bp, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("is_bp").cast("long").alias("n_boilerplate"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C41 — model-based quality filtering (fixed-weight linear classifier)
# ---------------------------------------------------------------------------
#
# Stand-in for the fastText-style quality classifier every pretraining
# pipeline runs: a linear model over cheap text statistics. Weights are
# fixed constants (a trained model would broadcast its coefficients the
# same way); the score is a handful of per-row IEEE ops — identical in
# both engines, no aggregation-order concerns.

_QSTOP = ("the", "a", "of", "and", "key", "table")
_Q_THRESHOLD = 0.5


@query(
    "c41_quality_classifier",
    f"""
    WITH feats AS (
      SELECT source,
             len(toks) AS n_toks,
             len(list_filter(toks, t -> t IN ({', '.join(repr(s) for s in _QSTOP)})))
               AS n_stop,
             len(list_distinct(toks)) AS n_uniq,
             len(array_to_string(toks, '')) AS n_chars
      FROM (SELECT source, {sql_simple_tokens('text')} AS toks FROM documents)
    ),
    scored AS (
      SELECT source,
             1.2 * (CAST(n_uniq AS DOUBLE) / n_toks)
               - 0.8 * (CAST(n_stop AS DOUBLE) / n_toks)
               + 0.05 * (CAST(n_chars AS DOUBLE) / n_toks)
               - 0.001 * n_toks AS score
      FROM feats
    )
    SELECT source,
           CAST(count(CASE WHEN score > {_Q_THRESHOLD} THEN 1 END) AS BIGINT)
             AS n_keep,
           CAST(count(CASE WHEN score <= {_Q_THRESHOLD} THEN 1 END) AS BIGINT)
             AS n_drop,
           round(min(score), 6) AS min_score,
           round(max(score), 6) AS max_score
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C41: model-based quality filter — a fixed-weight linear scorer
    over per-doc statistics (type-token ratio up, stopword ratio
    down, mean token length up, length penalty), thresholded into
    keep/drop counts per source. The shape of fastText/logreg quality
    gates in pretraining pipelines; swapping real trained weights in
    changes constants, not the plan.

    Determinism: each feature is an integer; the score is a fixed
    left-to-right chain of IEEE ops on those integers — bit-identical
    across engines; min/max need no accumulation-order care.

    Scale shape: narrow per-row feature extraction fused into the
    scan, then one partial-agg rollup by source.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", simple_tokens("text").alias("toks")
    )
    stop_set = ", ".join(repr(s) for s in _QSTOP)
    feats = docs.select(
        "source",
        F.size("toks").alias("n_toks"),
        F.size(F.expr(f"filter(toks, t -> t IN ({stop_set}))")).alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.length(F.array_join("toks", "")).alias("n_chars"),
    )
    score = (
        1.2 * (F.col("n_uniq").cast("double") / F.col("n_toks"))
        - 0.8 * (F.col("n_stop").cast("double") / F.col("n_toks"))
        + 0.05 * (F.col("n_chars").cast("double") / F.col("n_toks"))
        - 0.001 * F.col("n_toks")
    )
    return (
        feats.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.when(F.col("score") > _Q_THRESHOLD, 1)).cast("long").alias("n_keep"),
            F.count(F.when(F.col("score") <= _Q_THRESHOLD, 1)).cast("long").alias("n_drop"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# C44 — feature-hashed document embeddings (round 4, parked for round-5)
# ---------------------------------------------------------------------------
#
# The hashing trick (Weinberger et al. 2009): project a bag of tokens
# into a fixed-width vector by hashing each token to a bucket with a
# ±1 sign hash — no vocabulary, no training, collision-tolerant. The
# cheap dense featurization pipelines use when a trained encoder is
# overkill (near-dup pre-filters, cheap clustering, drift monitors).

FH_DIM = 8

_SPARK_MD5_64 = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
_DUCK_MD5_64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _fh_dim_exprs(md5_64_tpl: str) -> list[str]:
    """Per-dimension signed-count expressions, one per bucket — the
    SAME formula rendered per dialect (only the md5→int64 spelling
    differs)."""
    b = md5_64_tpl.format(x="t") + f" % {FH_DIM}"
    s = md5_64_tpl.format(x="('s' || t)") + " % 2"
    out = []
    for i in range(FH_DIM):
        pos = f"len(list_filter(toks, t -> {b} = {i} AND {s} = 0))"
        neg = f"len(list_filter(toks, t -> {b} = {i} AND {s} = 1))"
        out.append(f"({pos} - {neg})")
    return out


@query(
    "c44_feature_hash_embedding",
    f"""
    WITH toks AS (
      SELECT doc_id, {sql_simple_tokens('text')} AS toks FROM documents
    ),
    raw AS (
      SELECT doc_id,
             {', '.join(f'CAST({e} AS DOUBLE) AS r{i}' for i, e in enumerate(_fh_dim_exprs(_DUCK_MD5_64)))}
      FROM toks
    ),
    normed AS (
      SELECT doc_id,
             sqrt({' + '.join(f'r{i} * r{i}' for i in range(FH_DIM))}) AS nrm,
             {', '.join(f'r{i}' for i in range(FH_DIM))}
      FROM raw
    )
    SELECT doc_id,
           {', '.join(f'round(r{i} / nullif(nrm, 0.0), 6) AS f{i}' for i in range(FH_DIM))}
    FROM normed
    ORDER BY doc_id
    """,
)
def feature_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C44: hashing-trick embeddings — each token lands in
    md5-derived bucket (of {FH_DIM}) with an md5-derived ±1 sign;
    the signed counts are L2-normalized into a dense doc vector. The
    output spreads dims across scalar columns (f0..f{FH_DIM - 1})
    because the driver's comparator cannot sort array cells.

    Determinism: buckets/signs come from md5 (engine-portable —
    functions/text.py discipline); integer counts; sqrt and the
    divisions are correctly-rounded single IEEE ops; round(…, 6)
    both sides.

    Scale shape: pure narrow map over the scan — {2 * FH_DIM} list
    passes per doc, all inside codegen, zero shuffles (plan-gated
    like c37). At 100 TB this featurizer pipelines with the read.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", simple_tokens("text").alias("toks")
    )
    raw = docs.select(
        "doc_id",
        *[
            F.expr(e).cast("double").alias(f"r{i}")
            for i, e in enumerate(
                _sparkify(_fh_dim_exprs(_SPARK_MD5_64))
            )
        ],
    )
    nrm = F.sqrt(
        sum(F.col(f"r{i}") * F.col(f"r{i}") for i in range(FH_DIM))
    )
    return (
        raw.withColumn("nrm", nrm)
        .select(
            "doc_id",
            *[
                F.round(
                    F.col(f"r{i}") / F.nullif(F.col("nrm"), F.lit(0.0)), 6
                ).alias(f"f{i}")
                for i in range(FH_DIM)
            ],
        )
        .orderBy("doc_id")
    )


def _sparkify(exprs: list[str]) -> list[str]:
    """Translate the shared expression skeleton to Spark SQL: DuckDB's
    list_filter/len become filter/size."""
    return [
        e.replace("list_filter", "filter").replace("len(", "size(")
        for e in exprs
    ]


# ---------------------------------------------------------------------------
# C49 — lexical retrieval + token-budget context assembly (round 4)
# ---------------------------------------------------------------------------
#
# The RAG serving primitive, end to end: score chunks against a query
# by lexical overlap (posting-list join — BM25's candidate step), rank
# per query, then assemble the context window greedily under a token
# budget. Every quantity is an integer (overlap counts, token counts,
# running sums) — no float discipline needed anywhere.

RAG_QUERIES = (
    (1, "key table scan"),
    (2, "merge batch window"),
    (3, "stream sort value"),
)
RAG_CHUNK_W = 32  # tokens per chunk (c19's RAG-unit shape)
RAG_BUDGET = 96  # max context tokens per query (3 chunks)


def _sql_rag_chunks() -> str:
    return f"""
      SELECT doc_id, chunk_idx, toks[(chunk_idx * {RAG_CHUNK_W} + 1)
                                     :(chunk_idx * {RAG_CHUNK_W} + {RAG_CHUNK_W})]
               AS ctoks
      FROM (SELECT doc_id, {sql_simple_tokens('text')} AS toks FROM documents),
           LATERAL (SELECT unnest(range(0, CAST(ceil(len(toks) / {RAG_CHUNK_W}.0)
                                          AS BIGINT))) AS chunk_idx)
    """


@query(
    "c49_rag_context_assembly",
    f"""
    WITH chunks AS ({_sql_rag_chunks()}),
    qtok AS (
      SELECT q.query_id, t.tok
      FROM (VALUES {', '.join(f"({qid}, '{qs}')" for qid, qs in RAG_QUERIES)})
             AS q(query_id, qtext),
           LATERAL (SELECT unnest(string_split(qtext, ' ')) AS tok) t
    ),
    scored AS (
      SELECT query_id, doc_id, chunk_idx,
             count(*) AS overlap,
             any_value(n_chunk_toks) AS n_chunk_toks
      FROM (
        SELECT c.doc_id, c.chunk_idx, len(c.ctoks) AS n_chunk_toks, u.tok
        FROM chunks c, LATERAL (SELECT unnest(list_distinct(c.ctoks)) AS tok) u
      ) posting
      JOIN qtok USING (tok)
      GROUP BY query_id, doc_id, chunk_idx
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY overlap DESC, doc_id, chunk_idx)
                  AS rnk,
             sum(n_chunk_toks) OVER (PARTITION BY query_id
                                     ORDER BY overlap DESC, doc_id, chunk_idx
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cum_toks
      FROM scored
    )
    SELECT query_id, rnk, doc_id, chunk_idx,
           CAST(overlap AS BIGINT) AS overlap,
           CAST(cum_toks AS BIGINT) AS cum_toks
    FROM ranked
    WHERE cum_toks <= {RAG_BUDGET}
    ORDER BY query_id, rnk
    """,
)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C49: RAG retrieval + context assembly, end to end — chunk the
    corpus into {RAG_CHUNK_W}-token units, score each against a fixed
    query set by DISTINCT-token overlap via a posting-list equi-join
    (the candidate step under BM25; no similarity scan touches
    non-matching chunks), rank per query, and greedily keep chunks in
    rank order while the running token total fits the
    {RAG_BUDGET}-token context budget — exactly what a serving
    pipeline hands the model.

    Determinism: overlap/token/cumulative counts are all integers;
    rank ties break (doc_id, chunk_idx).

    Scale shape: chunks emit (token, chunk) postings (hash-joinable
    against any query load); the per-query rank + budget cut shares
    ONE window partitioning; queries are a broadcast-sized VALUES
    relation. The 100 TB analog swaps the VALUES for the day's query
    log and nothing else changes.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", simple_tokens("text").alias("toks")
    )
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("toks") / float(RAG_CHUNK_W)).cast("long") - 1,
            )
        ).alias("chunk_idx"),
        F.col("toks"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(
            "toks", F.col("chunk_idx") * RAG_CHUNK_W + 1, RAG_CHUNK_W
        ).alias("ctoks"),
    )
    qtok = spark.createDataFrame(
        [(qid, tok) for qid, qs in RAG_QUERIES for tok in qs.split(" ")],
        "query_id int, tok string",
    )
    posting = chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("ctoks").alias("n_chunk_toks"),
        F.explode(F.array_distinct("ctoks")).alias("tok"),
    )
    scored = (
        posting.join(F.broadcast(qtok), "tok")
        .groupBy("query_id", "doc_id", "chunk_idx")
        .agg(
            F.count("*").alias("overlap"),
            F.any_value("n_chunk_toks").alias("n_chunk_toks"),
        )
    )
    from pyspark.sql import Window as W

    wq = W.partitionBy("query_id").orderBy(
        F.col("overlap").desc(), "doc_id", "chunk_idx"
    )
    ranked = scored.select(
        "query_id",
        "doc_id",
        "chunk_idx",
        F.col("overlap").cast("long").alias("overlap"),
        F.row_number().over(wq).alias("rnk"),
        F.sum("n_chunk_toks")
        .over(wq.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("cum_toks"),
    )
    return (
        ranked.filter(F.col("cum_toks") <= RAG_BUDGET)
        .select("query_id", "rnk", "doc_id", "chunk_idx", "overlap", "cum_toks")
        .orderBy("query_id", "rnk")
    )


@query(
    "c50_pareto_doc_cut",
    """
    WITH ranked AS (
      SELECT source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_chars,
             SUM(n_chars) OVER (PARTITION BY source) AS total_chars,
             COUNT(*) OVER (PARTITION BY source) AS total_docs
      FROM documents
    )
    SELECT source,
           CAST(total_docs AS BIGINT) AS total_docs,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(COUNT(*) FILTER (WHERE 2 * (cum_chars - n_chars) < total_chars)
                AS BIGINT) AS docs_kept,
           CAST(COALESCE(SUM(n_chars)
                  FILTER (WHERE 2 * (cum_chars - n_chars) < total_chars), 0)
                AS BIGINT) AS chars_kept
    FROM ranked
    GROUP BY source, total_docs, total_chars
    ORDER BY source
    """,
)
def pareto_doc_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C50: Pareto document cut — per source, the smallest set of
    largest documents covering >= half the source's characters (the
    budget question behind corpus pruning: "how head-heavy is each
    source?"). A source where 5% of docs hold half the mass needs
    length-stratified sampling; a flat one doesn't.

    Keep rule on the integer axis: a doc is kept while the cumulative
    chars BEFORE it are under half the total, i.e. 2*(cum - own) <
    total — the crossing document is included, everything after is
    not. All-BIGINT arithmetic: no float threshold to drift.

    Scale shape: one exchange on source feeds both window passes (the
    per-source total is a frameless window on the same key — no second
    shuffle, no join back), then the rollup reuses the source axis.
    Per-task state is one source's doc-length list; at 100 TB the
    lengths column is the only thing shuffled, never text.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_chars"),
        F.sum("n_chars").over(W.partitionBy("source")).alias("total_chars"),
        F.count("*").over(W.partitionBy("source")).alias("total_docs"),
    )
    keep = 2 * (F.col("cum_chars") - F.col("n_chars")) < F.col("total_chars")
    return (
        ranked.groupBy("source", "total_docs", "total_chars")
        .agg(
            F.count(F.when(keep, 1)).alias("docs_kept"),
            F.coalesce(
                F.sum(F.when(keep, F.col("n_chars"))), F.lit(0)
            ).cast("long").alias("chars_kept"),
        )
        .select(
            "source",
            F.col("total_docs").cast("long").alias("total_docs"),
            F.col("total_chars").cast("long").alias("total_chars"),
            "docs_kept",
            "chars_kept",
        )
        .orderBy("source")
    )


# c51: skip-gram window size (offsets 1..C51_WINDOW on each side count
# as co-occurrence; only forward pairs are emitted, so (a,b) at +k and
# (b,a) at -k are the same directed pair counted once).
C51_WINDOW = 2


@query(
    "c51_skipgram_cooccurrence",
    f"""
    WITH t AS (
      SELECT doc_id, {sql_simple_tokens('text')} AS toks FROM documents
    ),
    pairs AS (
      SELECT unnest(
               list_concat(
                 list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                                i -> toks[i] || chr(9) || toks[i + 1]),
                 list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                i -> toks[i] || chr(9) || toks[i + 2])
               )) AS pair
      FROM t
    )
    SELECT string_split(pair, chr(9))[1] AS center,
           string_split(pair, chr(9))[2] AS context,
           COUNT(*) AS pair_count
    FROM pairs
    GROUP BY center, context
    ORDER BY center, context
    """,
)
def skipgram_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C51: skip-gram co-occurrence counts (word2vec/GloVe input) —
    directed (center, context) pair frequencies within a +/-2 token
    window across the corpus.

    The naive spelling is posexplode + a per-doc self-join on position
    distance — a shuffle whose input is every token twice and whose
    join explodes on repeated tokens. This plan builds the pair list
    NARROWLY per row instead: one zip_with pass per offset (array-level
    shift-and-concat, same trick as functions/text.shingles), one
    explode, and a single combinable groupBy — the only shuffle
    carries (pair, partial count), nothing positional.

    Scale shape: shuffle volume is bounded by the distinct-pair count
    per partition (map-side combine), not the token count; there is no
    join anywhere in the plan (plan-gated).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = simple_tokens("text")
    n = F.size(toks)
    pair_arrays = []
    for off in range(1, C51_WINDOW + 1):
        shifted = F.slice(toks, 1 + off, F.greatest(n - off, F.lit(0)))
        paired = F.zip_with(
            F.slice(toks, 1, F.greatest(n - off, F.lit(0))),
            shifted,
            lambda a, b: F.concat_ws("\t", a, b),
        )
        pair_arrays.append(paired)
    pairs = docs.select(
        F.explode(F.concat(*pair_arrays)).alias("pair")
    )
    split = F.split(F.col("pair"), "\t")
    return (
        pairs.groupBy(
            split.getItem(0).alias("center"), split.getItem(1).alias("context")
        )
        .agg(F.count("*").alias("pair_count"))
        .orderBy("center", "context")
    )


# --- c64: TextRank keyword extraction --------------------------------------
# PageRank in integer micro-units: total mass 1e12, damping 0.85 as
# the exact rational 85/100 with floor division — bit-identical in
# both engines for positive values (Spark `div` truncates, DuckDB `//`
# floors; same thing above zero). 3 unrolled iterations.
C64_MASS = 1_000_000_000_000
C64_ITERS = 3
C64_TOP = 20


def _textrank_sql() -> str:
    ctes = [
        f"t AS (SELECT doc_id, {sql_simple_tokens('text')} AS toks FROM documents)",
        """pr AS (
      SELECT string_split(p, chr(9))[1] AS w1, string_split(p, chr(9))[2] AS w2
      FROM t, unnest(list_concat(
        list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || chr(9) || toks[i + 1]),
        list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                       i -> toks[i] || chr(9) || toks[i + 2])
      )) AS pp(p)
    )""",
        """und AS (
      SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
      FROM pr WHERE w1 <> w2
    )""",
        "dir AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und)",
        "deg AS (SELECT u, COUNT(*) AS d FROM dir GROUP BY u)",
        f"""const AS (
      SELECT COUNT(*) AS nn,
             (15 * ({C64_MASS} // COUNT(*))) // 100 AS dd,
             {C64_MASS} // COUNT(*) AS r_init
      FROM deg
    )""",
        "r0 AS (SELECT deg.u, const.r_init AS r FROM deg CROSS JOIN const)",
    ]
    for k in range(C64_ITERS):
        ctes.append(
            f"""r{k + 1} AS (
      SELECT inc.u, const.dd + (85 * inc.inc) // 100 AS r
      FROM (
        SELECT dir.v AS u, SUM(r{k}.r // deg.d) AS inc
        FROM dir JOIN r{k} ON r{k}.u = dir.u JOIN deg ON deg.u = dir.u
        GROUP BY dir.v
      ) inc CROSS JOIN const
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT r{C64_ITERS}.u AS word, CAST(deg.d AS BIGINT) AS degree,
           CAST(r{C64_ITERS}.r AS BIGINT) AS rank_micro
    FROM r{C64_ITERS} JOIN deg ON deg.u = r{C64_ITERS}.u
    ORDER BY rank_micro DESC, word
    LIMIT {C64_TOP}
    """
    )


@query("c64_textrank_keywords", _textrank_sql())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C64: TextRank keyword extraction (Mihalcea & Tarau) — PageRank
    over the word co-occurrence graph (±2 token window, undirected),
    surfacing the corpus's most central vocabulary; the classic
    unsupervised keyword/keyphrase signal for corpus exploration and
    topic labeling.

    Exactness: the rank lives in integer micro-units (total mass 1e12)
    with damping 0.85 applied as floor((85*x)/100) — no floats
    anywhere, so three fixed iterations are bit-identical in any
    engine and under any partitioning; integer sums commute so the
    incoming-contribution rollup needs no decimal detour.

    Scale shape: the graph is VOCAB-sized (one corpus pass builds
    distinct co-occurrence edges narrowly, c51-style); each iteration
    is one equi-join + one combinable rollup on the word key; the
    damping constants are a 1-row broadcast. 3 iterations = 3 bounded
    shuffles over vocab-sized data, nothing driver-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = simple_tokens("text")
    n = F.size(toks)
    pair_arrays = []
    for off in (1, 2):
        shifted = F.slice(toks, 1 + off, F.greatest(n - off, F.lit(0)))
        pair_arrays.append(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - off, F.lit(0))),
                shifted,
                lambda a, b: F.concat_ws("\t", a, b),
            )
        )
    pairs = docs.select(F.explode(F.concat(*pair_arrays)).alias("p")).select(
        F.split("p", "\t").getItem(0).alias("w1"),
        F.split("p", "\t").getItem(1).alias("w2"),
    )
    und = (
        pairs.filter(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
        .distinct()
    )
    direct = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).cache()
    deg = direct.groupBy("u").agg(F.count("*").alias("d")).cache()
    const = deg.agg(
        F.count("*").alias("nn"),
        F.expr(f"(15 * ({C64_MASS} div count(*))) div 100").alias("dd"),
        F.expr(f"{C64_MASS} div count(*)").alias("r_init"),
    )
    r = deg.crossJoin(F.broadcast(const)).select("u", F.col("r_init").alias("r"))
    for _ in range(C64_ITERS):
        inc = (
            direct.join(r, "u")
            .join(deg, "u")
            .select(F.col("v").alias("dst"), F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        r = inc.crossJoin(F.broadcast(const)).select(
            F.col("dst").alias("u"),
            (F.col("dd") + F.expr("(85 * inc) div 100")).alias("r"),
        )
    return (
        r.join(deg, "u")
        .select(
            F.col("u").alias("word"),
            F.col("d").cast("long").alias("degree"),
            F.col("r").cast("long").alias("rank_micro"),
        )
        .orderBy(F.col("rank_micro").desc(), "word")
        .limit(C64_TOP)
    )


# ---------------------------------------------------------------------------
# C71 — Gopher-style rule filter with reject-reason attribution
# ---------------------------------------------------------------------------
#
# c04_text_quality computes the score shape; what a production corpus
# pipeline additionally needs is ATTRIBUTION — for every dropped doc,
# WHICH rule fired first (Gopher §A1.1 reports exactly this breakdown,
# and it is how threshold regressions get debugged). Rules are checked
# in a fixed order and the first failure wins.
#
# Exactness: every rule is an integer comparison (ratio thresholds are
# cross-multiplied: mean_len < 3.9 becomes 10*chars < 39*toks), so
# there is no float anywhere and both engines agree bitwise.

_C71_STOPS = ("the", "a", "of", "and")


@query(
    "c71_gopher_reject_reasons",
    f"""
    WITH t AS (
      SELECT doc_id, source, {sql_simple_tokens('text')} AS toks
      FROM documents
    ),
    x AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    tf AS (SELECT doc_id, tk, COUNT(*) AS c FROM x GROUP BY doc_id, tk),
    mx AS (SELECT doc_id, MAX(c) AS max_tf FROM tf GROUP BY doc_id),
    feats AS (
      SELECT t.doc_id, t.source,
             len(toks) AS n_toks,
             len(array_to_string(toks, '')) AS n_chars,
             len(list_filter(toks, x -> x IN ({', '.join(repr(s) for s in _C71_STOPS)}))) AS n_stop,
             mx.max_tf
      FROM t JOIN mx ON mx.doc_id = t.doc_id
    ),
    labeled AS (
      SELECT source,
             CASE
               WHEN n_toks < 20 THEN 'too_short'
               WHEN 10 * n_chars < 39 * n_toks THEN 'word_length'
               WHEN 5 * max_tf > n_toks THEN 'repetition'
               WHEN n_stop < 1 THEN 'no_stopwords'
               ELSE 'keep'
             END AS reason
      FROM feats
    )
    SELECT source, reason, COUNT(*) AS n_docs
    FROM labeled
    GROUP BY source, reason
    ORDER BY source, reason
    """,
)
def gopher_reject_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C71: Gopher-rule document filter with reject-reason attribution
    (Rae et al. 2021 §A1.1) — every document is labeled with the FIRST
    rule it fails (too_short → word_length → repetition →
    no_stopwords) or 'keep', rolled up per source. The breakdown is
    the artifact pipeline owners actually read when a threshold change
    shifts yield.

    Exactness: all four rules are integer comparisons (ratio
    thresholds cross-multiplied), so the label is engine-exact.

    Scale shape: the max-token-frequency feature is two combinable
    aggs keyed by (doc_id, token) then doc_id — the same corpus-sized
    shuffle c01 runs; every other feature is narrow per-row array
    math fused into the scan; the final rollup is source×reason
    (tiny). Nothing quadratic, nothing driver-side.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", simple_tokens("text").alias("toks")
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count("*").alias("c"))
    )
    mx = tf.groupBy("doc_id").agg(F.max("c").alias("max_tf"))
    stops = ", ".join(repr(s) for s in _C71_STOPS)
    feats = docs.join(mx, "doc_id").select(
        "source",
        F.size("toks").alias("n_toks"),
        F.length(F.array_join("toks", "")).alias("n_chars"),
        F.size(F.expr(f"filter(toks, x -> x IN ({stops}))")).alias("n_stop"),
        "max_tf",
    )
    reason = (
        F.when(F.col("n_toks") < 20, "too_short")
        .when(10 * F.col("n_chars") < 39 * F.col("n_toks"), "word_length")
        .when(5 * F.col("max_tf") > F.col("n_toks"), "repetition")
        .when(F.col("n_stop") < 1, "no_stopwords")
        .otherwise("keep")
    )
    return (
        feats.select("source", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "reason")
    )


# ---------------------------------------------------------------------------
# C72 — CCNet perplexity bucketing (head / middle / tail per language)
# ---------------------------------------------------------------------------


@query(
    "c72_perplexity_buckets",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({sql_simple_tokens('text')}) AS term FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
    total AS (SELECT COUNT(*) AS t FROM tok),
    scored AS (
      SELECT tok.doc_id, ln(vocab.n * 1.0 / total.t) AS lp
      FROM tok JOIN vocab USING (term) CROSS JOIN total
    ),
    perdoc AS (
      SELECT doc_id,
             round(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_logprob
      FROM scored GROUP BY doc_id
    ),
    bucketed AS (
      SELECT d.lang, p.avg_logprob,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY p.avg_logprob DESC, p.doc_id) AS tercile
      FROM perdoc p JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket,
           COUNT(*) AS n_docs,
           round(MIN(avg_logprob), 6) AS lp_min,
           round(MAX(avg_logprob), 6) AS lp_max
    FROM bucketed
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C72: CCNet-style perplexity bucketing (Wenzek et al. 2020) —
    split each language's documents into head/middle/tail terciles by
    LM score (here the c13 unigram-logprob proxy; a real KenLM score
    would drop in as the same column). Pretraining pipelines keep
    head+middle and downsample tail; the per-bucket score bounds are
    the cut points to publish with the dataset card.

    Exactness: the per-doc score is c13's decimal-detour logprob
    rounded to 6 dp (proven engine-exact by c13's driver row), and the
    tercile is ntile over the TOTAL order (score DESC, doc_id) — no
    ties left to engine choice.

    Scale shape: vocab rollup + broadcast total + per-doc combinable
    agg (all c13-shaped, corpus-sized), then a per-language window
    (languages are many and balanced at scale — no SinglePartition)
    and a tiny lang×bucket rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(simple_tokens("text")).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("n"))
    total = tok.agg(F.count("*").alias("t"))
    perdoc = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("n") * 1.0 / F.col("t")).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("lp").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id")
    )
    bucketed = (
        perdoc.join(docs.select("doc_id", "lang"), "doc_id")
        .select("lang", "avg_logprob", F.ntile(3).over(w).alias("tercile"))
    )
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        bucketed.select("lang", bucket.alias("bucket"), "avg_logprob")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("avg_logprob"), 6).alias("lp_min"),
            F.round(F.max("avg_logprob"), 6).alias("lp_max"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# C84 — per-domain document cap (round 6)
# ---------------------------------------------------------------------------
#
# Common-crawl pipelines cap how many documents any single domain may
# contribute (over-crawled domains would otherwise dominate the
# mixture). Semantics: keep the top-K documents per source by quality
# key (n_chars DESC, doc_id ASC). The ORACLE is the naive
# row_number-per-source; the Spark plan is the scale-safe two-phase
# histogram refinement — rank only the boundary bucket, never the
# whole domain.

DOMAIN_CAP_K = 15
_CAP_BW = 25  # histogram bucket width over n_chars


@query(
    "c84_domain_doc_cap",
    f"""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    SELECT doc_id, source, n_chars,
           CAST(rk <= {DOMAIN_CAP_K} AS BOOLEAN) AS kept
    FROM r
    ORDER BY doc_id
    """,
)
def domain_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C84: per-domain (source) document cap — keep the K best docs
    per source by (n_chars DESC, doc_id ASC).

    Scale shape: a naive window over PARTITION BY source collapses
    each domain into one task — and crawl domains are exactly where
    skew lives (one domain can be 10% of a 100 TB crawl). Instead:
    (1) one combinable histogram rollup on (source, quality-bucket),
    (2) a per-source prefix sum over the TINY histogram (bounded by
    n_sources x n_buckets rows) finds each source's threshold bucket,
    (3) docs strictly above the threshold bucket are kept with NO
    ranking; only the boundary bucket's docs — a sliver of each
    domain — are ranked, partitioned by source, to fill the remaining
    slots. The only windows run over the histogram and the boundary
    sliver, never a whole domain.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # Higher bucket = better quality; bucket count is bounded by
    # max(n_chars)/_CAP_BW, independent of corpus size.
    b = docs.withColumn(
        "qb", (F.col("n_chars") / _CAP_BW).cast("int")
    )
    hist = b.groupBy("source", "qb").agg(F.count("*").alias("cnt"))
    w_above = (
        Window.partitionBy("source")
        .orderBy(F.col("qb").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hist.select(
        "source",
        "qb",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_above), F.lit(0)).alias("n_above"),
    )
    # Boundary bucket: first bucket (descending) where the running
    # total crosses K. Everything above it is kept outright.
    boundary = marked.filter(
        (F.col("n_above") < DOMAIN_CAP_K)
        & (F.col("n_above") + F.col("cnt") > DOMAIN_CAP_K)
    ).select(
        "source",
        F.col("qb").alias("bqb"),
        (F.lit(DOMAIN_CAP_K) - F.col("n_above")).alias("slots"),
    )
    thresh = marked.filter(F.col("n_above") + F.col("cnt") <= DOMAIN_CAP_K).groupBy(
        "source"
    ).agg(F.min("qb").alias("keep_above_qb"))
    joined = (
        b.join(F.broadcast(thresh), "source", "left")
        .join(F.broadcast(boundary), "source", "left")
    )
    kept_outright = F.col("keep_above_qb").isNotNull() & (
        F.col("qb") >= F.col("keep_above_qb")
    )
    in_boundary = F.col("bqb").isNotNull() & (F.col("qb") == F.col("bqb"))
    # Rank ONLY the boundary sliver (<= bucket width docs per source).
    w_b = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    bnd = (
        joined.filter(in_boundary & ~kept_outright)
        .select("doc_id", "source", "n_chars", "slots")
        .withColumn("brk", F.row_number().over(w_b))
        .select("doc_id", (F.col("brk") <= F.col("slots")).alias("bkeep"))
    )
    return (
        joined.join(bnd, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            (kept_outright | F.coalesce(F.col("bkeep"), F.lit(False))).alias(
                "kept"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C85 — DSIR-style hashed importance weights (round 6)
# ---------------------------------------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., 2023) scores
# raw documents by how target-like their hashed n-gram features are.
# This is the integer-exact variant: feature weights are ppm-frequency
# deltas (target minus raw) under floor division, so the score is a
# BIGINT sum with identical values in any engine and any partitioning
# — no log-ratio doubles, no cross-engine libm drift.

_DSIR_BUCKETS = 1024
_DSIR_TARGET_LANG = "en"


def _sql_dsir() -> str:
    fh = f"({sql_md5_64('tok')} % {_DSIR_BUCKETS})"
    return f"""
    WITH t AS (SELECT doc_id, lang, {sql_simple_tokens('text')} AS toks
               FROM documents),
    e AS (SELECT doc_id, lang, unnest(toks) AS tok FROM t),
    f AS (SELECT doc_id, lang, {fh} AS fh FROM e),
    doc_f AS (SELECT doc_id, fh, COUNT(*) AS c FROM f GROUP BY doc_id, fh),
    tot AS (SELECT COUNT(*) AS n_raw,
                   COUNT(*) FILTER (lang = '{_DSIR_TARGET_LANG}') AS n_tgt
            FROM f),
    fw AS (
      SELECT fh,
             (1000000 * COUNT(*) FILTER (lang = '{_DSIR_TARGET_LANG}'))
               // (SELECT n_tgt FROM tot)
             - (1000000 * COUNT(*)) // (SELECT n_raw FROM tot) AS w
      FROM f GROUP BY fh)
    SELECT d.doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           CAST(SUM(d.c * fw.w) AS BIGINT) AS dsir_score
    FROM doc_f d JOIN fw USING (fh)
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


@query("c85_dsir_importance", _sql_dsir())
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C85: DSIR hashed importance weights — per-document sum of
    (target-ppm minus raw-ppm) over hashed unigram features, the
    importance-resampling score that up-weights documents whose
    feature mix looks like the target slice (here: lang='en').

    Scale shape: one explode pass feeds (1) the per-(doc, feature)
    count rollup and (2) the feature-weight table — the weight table
    is bounded by the hash-bucket count (1024 rows) regardless of
    corpus size, so it broadcasts; the final per-doc rollup is
    combinable. Two exchanges total, no window, no all-pairs, and the
    shuffles carry (id, bucket, count) triples — never text.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", "lang", F.explode(simple_tokens("text")).alias("tok")
    ).select(
        "doc_id", "lang", (md5_64("tok") % _DSIR_BUCKETS).alias("fh")
    )
    doc_f = feats.groupBy("doc_id", "fh").agg(F.count("*").alias("c"))
    is_tgt = (F.col("lang") == _DSIR_TARGET_LANG).cast("long")
    tot = feats.agg(
        F.count("*").alias("n_raw"), F.sum(is_tgt).alias("n_tgt")
    )
    fw = (
        feats.groupBy("fh")
        .agg(F.count("*").alias("c_raw"), F.sum(is_tgt).alias("c_tgt"))
        .crossJoin(F.broadcast(tot))
        .select(
            "fh",
            (
                F.expr("1000000 * c_tgt DIV n_tgt")
                - F.expr("1000000 * c_raw DIV n_raw")
            ).alias("w"),
        )
    )
    return (
        doc_f.join(F.broadcast(fw), "fh")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("w")).alias("dsir_score"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# C86 — language-ID confusion matrix (round 6)
# ---------------------------------------------------------------------------
#
# The eval companion to c04_text_langid: score the marker-based
# language detector against the labeled lang column and emit the full
# confusion matrix with per-cell recall (share of the labeled
# language) and precision (share of the predicted language) in ppm
# integers — floor division, engine-exact.


def _sql_langid_confusion() -> str:
    from spark_dynamodb_spark.operators.text_analysis import LANG_MARKERS

    from spark_dynamodb_spark.functions.text import sql_tokens

    score_cols = []
    for lang, words in LANG_MARKERS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(toks, x -> x IN ({in_list}))) AS s_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "CASE "
    for lang in langs:
        others = " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang)
        best += f"WHEN {others} THEN '{lang}' "
    best += "END"
    return f"""
    WITH t AS (SELECT doc_id, lang AS labeled_lang, {sql_tokens('text')} AS toks
               FROM documents),
    scored AS (SELECT doc_id, labeled_lang, {', '.join(score_cols)} FROM t),
    pred AS (SELECT labeled_lang, {best} AS predicted_lang FROM scored),
    cell AS (SELECT labeled_lang, predicted_lang, COUNT(*) AS n
             FROM pred GROUP BY labeled_lang, predicted_lang),
    lt AS (SELECT labeled_lang, SUM(n) AS n_labeled FROM cell GROUP BY labeled_lang),
    pt AS (SELECT predicted_lang, SUM(n) AS n_predicted FROM cell GROUP BY predicted_lang)
    SELECT c.labeled_lang, c.predicted_lang, c.n,
           CAST((1000000 * c.n) // lt.n_labeled AS BIGINT) AS recall_ppm,
           CAST((1000000 * c.n) // pt.n_predicted AS BIGINT) AS precision_ppm
    FROM cell c
    JOIN lt USING (labeled_lang)
    JOIN pt USING (predicted_lang)
    ORDER BY labeled_lang, predicted_lang
    """


@query("c86_langid_confusion", _sql_langid_confusion())
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C86: confusion matrix of the c04 marker language detector vs
    the labeled lang column — per-cell count, recall ppm (share of
    the labeled language) and precision ppm (share of the predicted
    language). The go/no-go eval before trusting a detector to route
    a 100 TB multilingual crawl.

    Scale shape: one narrow scoring pass (no explode — array filter
    counts inside the row), one combinable rollup to the
    |langs| x |langs| cell table, then all remaining joins run over
    that bounded matrix. One exchange over data, everything after is
    broadcast-sized.
    """
    from spark_dynamodb_spark.operators.text_analysis import LANG_MARKERS

    from spark_dynamodb_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.select(
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(F.filter(toks, lambda x: x.isin(*words))).alias(f"s_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    langs = sorted(LANG_MARKERS)
    chain = None
    for lang in langs:
        cond = None
        for o in langs:
            if o == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{o}")
            cond = c if cond is None else (cond & c)
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    cell = (
        scored.select("labeled_lang", chain.alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    lt = cell.groupBy("labeled_lang").agg(F.sum("n").alias("n_labeled"))
    pt = cell.groupBy("predicted_lang").agg(F.sum("n").alias("n_predicted"))
    return (
        cell.join(F.broadcast(lt), "labeled_lang")
        .join(F.broadcast(pt), "predicted_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            F.expr("1000000 * n DIV n_labeled").alias("recall_ppm"),
            F.expr("1000000 * n DIV n_predicted").alias("precision_ppm"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# C88 — source keyness terms (round 6, second wave)
# ---------------------------------------------------------------------------
#
# Corpus-comparison keyness: which terms are most over-represented in
# each source relative to the rest of the corpus. The per-source
# dataset-card table ("what is src7 actually full of?") and the
# debugging view behind c11/c82 mixture decisions. Integer ppm deltas
# (floor division) — engine-exact, no log-odds doubles.

_KEYNESS_TOPK = 10


@query(
    "c88_source_keyness_terms",
    f"""
    WITH e AS (
      SELECT source, unnest({sql_simple_tokens('text')}) AS term
      FROM documents),
    st AS (SELECT source, term, COUNT(*) AS c_src FROM e GROUP BY 1, 2),
    tt AS (SELECT term, COUNT(*) AS c_tot FROM e GROUP BY 1),
    stot AS (SELECT source, COUNT(*) AS tok_src FROM e GROUP BY 1),
    gtot AS (SELECT COUNT(*) AS tok_tot FROM e),
    scored AS (
      SELECT st.source, st.term, st.c_src,
             (1000000 * st.c_src) // stot.tok_src
             - (1000000 * (tt.c_tot - st.c_src))
               // (gtot.tok_tot - stot.tok_src) AS keyness_ppm
      FROM st
      JOIN tt USING (term)
      JOIN stot USING (source)
      CROSS JOIN gtot),
    ranked AS (
      SELECT source, term, c_src, keyness_ppm,
             row_number() OVER (PARTITION BY source
                                ORDER BY keyness_ppm DESC, term) AS rnk
      FROM scored)
    SELECT source, rnk, term, c_src, keyness_ppm
    FROM ranked WHERE rnk <= {_KEYNESS_TOPK}
    ORDER BY source, rnk
    """,
)
def source_keyness_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C88: top-10 keyness terms per source — the term's ppm rate in
    the source minus its ppm rate in the REST of the corpus (floor
    division, integers). Positive keyness = over-represented.

    Scale shape: one explode pass feeds three combinable rollups
    ((source, term), term, source); the term-totals join runs on the
    vocabulary-sized relation keyed by term; source totals and the
    grand total broadcast; the final top-10-per-source window gets
    WindowGroupLimit pushdown (per-task 10-row heaps, never a full
    per-source sort). Everything shuffled is (term, count) pairs.
    """
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(simple_tokens("text")).alias("term")
    )
    st = e.groupBy("source", "term").agg(F.count("*").alias("c_src"))
    tt = e.groupBy("term").agg(F.count("*").alias("c_tot"))
    stot = e.groupBy("source").agg(F.count("*").alias("tok_src"))
    gtot = e.agg(F.count("*").alias("tok_tot"))
    scored = (
        st.join(tt, "term")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            "term",
            "c_src",
            (
                F.expr("1000000 * c_src DIV tok_src")
                - F.expr(
                    "1000000 * (c_tot - c_src) DIV (tok_tot - tok_src)"
                )
            ).alias("keyness_ppm"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("keyness_ppm").desc(), "term"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KEYNESS_TOPK)
        .select("source", "rnk", "term", "c_src", "keyness_ppm")
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# C96 — k-anonymity audit over corpus metadata (release-gate governance)
# ---------------------------------------------------------------------------

_C96_KS = [2, 5, 10, 20]
_C96_BUCKET = 128  # n_chars quasi-identifier bucket width


@query(
    "c96_k_anonymity_audit",
    f"""
    WITH qi AS (
      SELECT source, lang, n_chars // {_C96_BUCKET} AS len_bucket
      FROM documents),
    grp AS (
      SELECT source, lang, len_bucket, COUNT(*) AS g_n
      FROM qi GROUP BY source, lang, len_bucket),
    ks AS (SELECT unnest([{", ".join(str(k) for k in _C96_KS)}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(*) FILTER (g_n < ks.k) AS BIGINT) AS violating_groups,
           CAST(COALESCE(SUM(g_n) FILTER (g_n < ks.k), 0) AS BIGINT)
             AS rows_at_risk,
           CAST(1000000 * COALESCE(SUM(g_n) FILTER (g_n < ks.k), 0)
                // SUM(g_n) AS BIGINT) AS at_risk_ppm
    FROM grp CROSS JOIN ks
    GROUP BY ks.k
    ORDER BY k
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C96: k-anonymity audit over the corpus's release metadata —
    treating (source, lang, length-bucket) as the quasi-identifier
    tuple, report for each candidate k how many QI equivalence
    classes fall below k members and how many rows those classes
    expose (the re-identification surface). This is the governance
    gate a dataset release runs before publishing per-document
    metadata: a document alone in its (source, lang, length) cell is
    linkable even with the text withheld. Complements c37 (content
    PII) and c59 (DP aggregate release) — this one audits the
    METADATA side channel, and the k-level table is exactly the
    suppression/generalization trade-off curve an editor reads.

    Scale shape: one exchange builds the QI-class histogram, whose
    size is bounded by |sources| x |langs| x |length buckets| — a
    cardinality-bounded relation, never row count. The k-level sweep
    is a broadcast cross of that bounded relation with a literal
    4-row frame (the repo's bounded-crossJoin rule), collapsed by a
    combinable FILTER aggregate. Nothing rescans the corpus per k.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", F.expr(f"n_chars DIV {_C96_BUCKET}").alias("len_bucket")
    )
    grp = docs.groupBy("source", "lang", "len_bucket").agg(
        F.count(F.lit(1)).alias("g_n")
    )
    ks = spark.range(len(_C96_KS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _C96_KS]), (F.col("id") + 1).cast("int")
        ).alias("k")
    )
    swept = grp.crossJoin(F.broadcast(ks))
    return (
        swept.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.count(F.when(F.col("g_n") < F.col("k"), 1))
            .cast("long")
            .alias("violating_groups"),
            F.coalesce(
                F.sum(F.when(F.col("g_n") < F.col("k"), F.col("g_n"))),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_at_risk"),
            F.expr(
                "CAST(1000000 * COALESCE(SUM(CASE WHEN g_n < k THEN g_n END), 0)"
                " DIV SUM(g_n) AS BIGINT)"
            ).alias("at_risk_ppm"),
        )
        .select(
            F.col("k").cast("long"),
            "n_groups",
            "violating_groups",
            "rows_at_risk",
            "at_risk_ppm",
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# C97 — classifier ranking quality (ROC-AUC via rank-sum)
# ---------------------------------------------------------------------------
#
# The eval every learned quality filter needs before it gates a corpus:
# does the model's SCORE actually rank good documents above bad ones?
# AUC is the probability a random positive outranks a random negative —
# threshold-free, computed exactly from the Mann-Whitney rank-sum. The
# score is c41's fixed-weight linear classifier (quantized to integer
# micros); the "gold" label is the independent Gopher-style rule gate
# (length + mean-token-length), so the number measures how well the
# cheap learned score reproduces the rule verdicts per source.

_AUC_SCORED_DUCK = f"""
    SELECT source,
           CAST(floor(1000000 * (
               1.2 * (CAST(n_uniq AS DOUBLE) / n_toks)
               - 0.8 * (CAST(n_stop AS DOUBLE) / n_toks)
               + 0.05 * (CAST(n_chars AS DOUBLE) / n_toks)
               - 0.001 * n_toks)) AS BIGINT) AS score_micro,
           CASE WHEN n_toks BETWEEN 10 AND 100000
                 AND (CAST(n_chars AS DOUBLE) / n_toks) BETWEEN 2.0 AND 12.0
                THEN 1 ELSE 0 END AS label
    FROM (
      SELECT source,
             len(toks) AS n_toks,
             len(list_filter(toks, t -> t IN ({', '.join(repr(s) for s in _QSTOP)})))
               AS n_stop,
             len(list_distinct(toks)) AS n_uniq,
             len(array_to_string(toks, '')) AS n_chars
      FROM (SELECT source, {sql_simple_tokens('text')} AS toks FROM documents)
    )
"""


def _auc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, score_micro, label) — c41's IEEE score chain quantized
    to micros (per-row double ops are bit-identical cross-engine, so
    the floor is too) + the independent rule label."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", simple_tokens("text").alias("toks")
    )
    stop_set = ", ".join(repr(s) for s in _QSTOP)
    feats = docs.select(
        "source",
        F.size("toks").alias("n_toks"),
        F.size(F.expr(f"filter(toks, t -> t IN ({stop_set}))")).alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.length(F.array_join("toks", "")).alias("n_chars"),
    )
    score = (
        1.2 * (F.col("n_uniq").cast("double") / F.col("n_toks"))
        - 0.8 * (F.col("n_stop").cast("double") / F.col("n_toks"))
        + 0.05 * (F.col("n_chars").cast("double") / F.col("n_toks"))
        - 0.001 * F.col("n_toks")
    )
    mean_len = F.col("n_chars").cast("double") / F.col("n_toks")
    label = (
        F.col("n_toks").between(10, 100000) & mean_len.between(2.0, 12.0)
    )
    return feats.select(
        "source",
        F.floor(F.lit(1000000) * score).cast("long").alias("score_micro"),
        F.when(label, 1).otherwise(0).alias("label"),
    )


@query(
    "c97_classifier_auc",
    f"""
    WITH scored AS ({_AUC_SCORED_DUCK}),
    g AS (
      SELECT source, score_micro,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(label) AS BIGINT) AS pos
      FROM scored GROUP BY source, score_micro
    ),
    r AS (
      SELECT source, pos, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY score_micro
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - cnt AS cum_before
      FROM g
    ),
    a AS (
      SELECT source,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
             CAST(SUM(pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS r2
      FROM r GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(((r2 - n_pos * (n_pos + 1)) * 1000000)
                          // (2 * n_pos * n_neg) AS BIGINT)
           END AS auc_ppm
    FROM a ORDER BY source
    """,
)
def classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C97: exact ROC-AUC of the c41 quality score against the
    rule-gate label, per source — Mann-Whitney rank-sum with average
    ranks on ties (doubled to stay integer): AUC = (2*R_pos -
    P*(P+1)) / (2*P*N), emitted in ppm by exact BIGINT floor
    division. The retrieval-eval triad (c42/c93/c95) measures ANN
    rankers; this is the same discipline for the quality CLASSIFIER.

    Exactness: the score is c41's per-row IEEE chain (bit-identical
    cross-engine) quantized to micros; everything after is integer.
    2*avg_rank for a tie group = 2*(rows before) + cnt + 1 — exact
    without any .5 fractions. BIGINT bounds: R2 <= 2*P*n, so ppm
    numerator stays under 2^63 to ~10^5 positives x 10^6 rows per
    source; past that the division rides DECIMAL(38).

    Scale shape: one corpus scan -> groupBy (source, score) collapses
    ties; the global per-source rank prefix is the c18/b139 bucketed
    two-phase form (score-range buckets via DIV — trunc-division by a
    positive constant is monotone, so bucket order extends score
    order; bucket carries broadcast) — no per-source SinglePartition
    window ever sees row-level data.
    """
    from pyspark.sql import Window as W

    from spark_dynamodb_spark.operators.dedup import _materialize

    g = (
        _auc_scored(spark, sf_dir)
        .groupBy("source", "score_micro")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("label").cast("long").alias("pos"),
        )
        .withColumn("bkt", F.expr("score_micro DIV 100000"))
    )
    w_in = (
        W.partitionBy("source", "bkt")
        .orderBy("score_micro")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    in_b = g.select(
        "source",
        "bkt",
        "pos",
        "cnt",
        F.sum("cnt").over(w_in).alias("cum_in"),
    )
    bt = _materialize(
        g.groupBy("source", "bkt").agg(F.sum("cnt").alias("b_cnt")), "local"
    )
    w_b = (
        W.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carries = bt.select(
        "source",
        "bkt",
        (F.sum("b_cnt").over(w_b) - F.col("b_cnt")).alias("carry"),
    )
    r = in_b.join(F.broadcast(carries), ["source", "bkt"]).select(
        "source",
        "pos",
        "cnt",
        (F.col("carry") + F.col("cum_in") - F.col("cnt")).alias("cum_before"),
    )
    a = r.groupBy("source").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("long").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("r2"),
    )
    return a.select(
        "source",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "((r2 - n_pos * (n_pos + 1)) * 1000000)"
                " DIV (2 * n_pos * n_neg)"
            ),
        ).alias("auc_ppm"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# C98 — calibration audit (expected calibration error, fixed bins)
# ---------------------------------------------------------------------------


@query(
    "c98_calibration_ece",
    f"""
    WITH scored AS ({_AUC_SCORED_DUCK}),
    p AS (
      SELECT source,
             LEAST(GREATEST(score_micro, 0), 1000000) AS p_ppm,
             label
      FROM scored
    ),
    b AS (
      SELECT source, LEAST(p_ppm // 100000, 9) AS bin, p_ppm, label FROM p
    ),
    gb AS (
      SELECT source, bin,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(label) AS BIGINT) AS n_pos,
             CAST(SUM(p_ppm) AS BIGINT) AS sum_p,
             CAST(ABS(SUM(label) * 1000000 - SUM(p_ppm)) AS BIGINT) AS gap
      FROM b GROUP BY source, bin
    ),
    mx AS (SELECT source, MAX(gap) AS wgap FROM gb GROUP BY source),
    w AS (
      SELECT gb.source, MIN(gb.bin) AS worst_bin
      FROM gb JOIN mx ON gb.source = mx.source AND gb.gap = mx.wgap
      GROUP BY gb.source
    )
    SELECT gb.source,
           CAST(SUM(gb.n_b) AS BIGINT) AS n_docs,
           CAST(SUM(gb.gap) // SUM(gb.n_b) AS BIGINT) AS ece_ppm,
           CAST(MAX(w.worst_bin) AS BIGINT) AS worst_bin,
           CAST(MAX(CASE WHEN gb.bin = w.worst_bin
                         THEN gb.gap // gb.n_b END) AS BIGINT)
             AS worst_gap_ppm
    FROM gb JOIN w ON gb.source = w.source
    GROUP BY gb.source
    ORDER BY gb.source
    """,
)
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C98: expected calibration error of the c41 score read as a
    probability (clipped to [0, 1] in ppm), against the rule-gate
    label, in 10 fixed-width confidence bins: ECE = sum_b (n_b/N) *
    |accuracy_b - confidence_b|. A score can RANK perfectly (c97 AUC
    = 1) yet lie about its confidence — this is the release audit
    that catches it, per source, plus the worst-calibrated bin.

    Exactness: per-bin gap = |n_pos*1e6 - sum(p_ppm)| is the
    mass-weighted |acc - conf| scaled to ppm-docs, pure BIGINT;
    ECE = sum(gap) / N by integer floor division. No floats anywhere
    past the (bit-identical) per-row score.

    Scale shape: one corpus scan -> one partial-agg exchange to
    (source, bin) — a <= 10*|sources| relation; everything after
    (argmax bin, per-source rollup) is driver-free work on that
    bounded frame. At 100 TB this is the cheapest possible audit: a
    single combinable aggregation.
    """
    p = _auc_scored(spark, sf_dir).select(
        "source",
        F.least(F.greatest(F.col("score_micro"), F.lit(0)), F.lit(1000000)).alias(
            "p_ppm"
        ),
        "label",
    )
    gb = (
        p.select(
            "source",
            F.least(F.expr("p_ppm DIV 100000"), F.lit(9)).alias("bin"),
            "p_ppm",
            "label",
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_b"),
            F.sum("label").cast("long").alias("n_pos"),
            F.sum("p_ppm").cast("long").alias("sum_p"),
        )
        .withColumn(
            "gap", F.abs(F.col("n_pos") * 1000000 - F.col("sum_p")).cast("long")
        )
    )
    out = gb.groupBy("source").agg(
        F.sum("n_b").cast("long").alias("n_docs"),
        F.expr("SUM(gap) DIV SUM(n_b)").cast("long").alias("ece_ppm"),
        F.max(
            F.struct(
                F.col("gap"),
                (-F.col("bin")).alias("negbin"),
                F.col("n_b").alias("wn"),
            )
        ).alias("mx"),
    )
    return out.select(
        "source",
        "n_docs",
        "ece_ppm",
        (-F.col("mx.negbin")).cast("long").alias("worst_bin"),
        F.expr("mx.gap DIV mx.wn").cast("long").alias("worst_gap_ppm"),
    ).orderBy("source")
