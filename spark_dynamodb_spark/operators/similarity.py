"""Similarity search over embeddings — SURVEY §2 C3 + embedding
near-dup (C2 family).

Vectors are array<float> (64-d); all math is done in double via
Catalyst higher-order functions (functions/vector.py) — JVM-side,
no Python in the loop. Sequential left-fold accumulation matches
DuckDB's list_dot_product order, so cosines agree bit-for-bit.

Scale notes (100 TB):
- brute-force top-k: broadcast the (small) query set, never shuffle
  the corpus; per-partition partial top-k via window on (query, score)
  — the corpus is scanned once, no materialized n×m pair table
  outside the aggregation pipeline.
- the scale path is LSH bucketing (c03_ann_lsh_bucketed): random
  hyperplane signs → bucket key → candidates share a bucket. Recall
  is tunable with more tables/bits; the bucket join is an equi-join,
  so Catalyst shuffles each side once on the bucket key.
- embedding near-dup blocks on `label` (a cluster/partition id):
  pairs only form inside a block — the cross product is bounded per
  block, the standard blocking trick for pairwise similarity at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.vector import cosine_similarity, dot
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table

N_QUERIES = 10
TOP_K = 5

SQL_COSINE = (
    "list_dot_product(la, lb) / "
    "(sqrt(list_dot_product(la, la)) * sqrt(list_dot_product(lb, lb)))"
)


def _sql_pairs_base() -> str:
    return f"""
    WITH v AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings)
    """


@query(
    "c03_ann_cosine_topk",
    f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             list_dot_product(q.qvec, v.vec)
               / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(v.vec, v.vec)))
               AS cos
      FROM q CROSS JOIN v
      WHERE v.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: brute-force cosine top-k — the exactness baseline.

    Query set broadcast; corpus scanned once; ranking via window.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_similarity("qvec", "vec").alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


# Deterministic pseudo-random hyperplanes (no RNG APIs): component d of
# plane p is +1 if md5("p:d") is odd else -1 — engine-independent and
# stable across sessions.
N_PLANES = 8
DIM = 64


def _plane(p: int) -> list[int]:
    import hashlib

    out = []
    for d in range(DIM):
        h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
        out.append(1 if int(h[:15], 16) & 1 else -1)
    return out


N_TABLES = 8
BITS_PER_TABLE = 4


def _sql_signs(p: int) -> str:
    """Plane p as a DuckDB double-list literal (same md5 seeding)."""
    return "[" + ", ".join(f"{s}.0" for s in _plane(p)) + "]"


def _lsh_sql() -> str:
    """DuckDB mirror of ann_lsh_bucketed (VERDICT r2 #5: was rows-only).

    The hyperplanes are deterministic md5-seeded constants, so the SQL
    twin simply INLINES them (the same trick _rp_sql uses): per-table
    buckets via a UNION ALL over the 8 tables, candidates via the same
    any-table equi-join, exact cosine + rank on the candidate set.
    Sign decisions compare bit-equal dot products (list_dot_product ↔
    left-fold F.aggregate), so both engines bucket identically.
    """
    branches = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(vec, {_sql_signs(t * BITS_PER_TABLE + b)})"
            f" >= 0 THEN {1 << b} ELSE 0 END)"
            for b in range(BITS_PER_TABLE)
        )
        branches.append(f"SELECT vec_id, vec, {t} AS t, {bits} AS bucket FROM v")
    union = " UNION ALL ".join(branches)
    return f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings),
    bl AS ({union}),
    q AS (SELECT vec_id AS query_id, t, bucket FROM bl WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT DISTINCT q.query_id, bl.vec_id AS neighbor_id
      FROM bl JOIN q ON bl.t = q.t AND bl.bucket = q.bucket
      WHERE bl.vec_id <> q.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_dot_product(qv.vec, nv.vec)
               / (sqrt(list_dot_product(qv.vec, qv.vec)) * sqrt(list_dot_product(nv.vec, nv.vec)))
               AS cos
      FROM cand c
      JOIN v qv ON qv.vec_id = c.query_id
      JOIN v nv ON nv.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """


@query("c03_ann_lsh_bucketed", _lsh_sql())
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3b: LSH-bucketed ANN — the 100 TB path. 8 hash tables × 4
    hyperplane-sign bits; a vector is a candidate for a query if they
    share a bucket in ANY table (standard multi-table LSH: recall
    compounds across tables while each bucket join stays an equi-join).

    Value-checked by the driver since round 3: the md5-seeded planes
    are inlined into the DuckDB twin (_lsh_sql), so bucketing, the
    candidate set, and the returned cosines are all hash-compared.
    tests/test_llm.py additionally gates recall vs brute force.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    tables = []
    for t in range(N_TABLES):
        bucket = F.lit(0)
        for b in range(BITS_PER_TABLE):
            plane = F.array(
                *[F.lit(float(x)) for x in _plane(t * BITS_PER_TABLE + b)]
            )
            bucket = bucket + F.when(dot(F.col("vec"), plane) >= 0, 1 << b).otherwise(0)
        tables.append(F.struct(F.lit(t).alias("t"), bucket.alias("bucket")))
    emb_b = emb.select(
        "vec_id", "vec", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", "vec", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
    q = emb_b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("t").alias("qt"),
        F.col("bucket").alias("qbucket"),
    )
    cands = (
        emb_b.join(
            F.broadcast(q),
            (F.col("t") == F.col("qt")) & (F.col("bucket") == F.col("qbucket")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qvec", F.col("vec_id").alias("neighbor_id"), "vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("qvec", "vec").alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


@query(
    "c02_embedding_neardup",
    f"""
    WITH v AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           round(list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6)
             AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.vec, b.vec)
            / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))
          >= 0.99
    ORDER BY vec_a, vec_b
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2d: embedding-cosine near-duplicate pairs (cos ≥ 0.99),
    blocked by `label` so the pair space is bounded per block."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label"), F.col("vec").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("vec").alias("vb")
    )
    cos = cosine_similarity("va", "vb")
    return (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cos >= 0.99)
        .select("vec_a", "vec_b", "label", F.round(cos, 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


# --- IVF (inverted-file) ANN — the coarse-quantizer scale path -----------

NLIST = 16  # coarse cells (≈ sqrt(corpus) in production)
NPROBE = 6  # cells searched per query
KMEANS_ITERS = 3


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _centroids_of(assigned: DataFrame) -> DataFrame:
    """(cell, vec) → (cell, cvec): element-wise mean per cell.

    posexplode → groupBy(cell, pos) is fully combinable (the shuffle
    carries nlist × dim partial sums); the per-cell array reassembles
    with a sort-by-position transform — never through the driver.

    The mean is the EXACT decimal-sum mean (functions.exact.davg), not
    native AVG: double accumulation order varies with partitioning, so
    exact sums are what make the whole k-means — and therefore the
    final IVF top-k — bit-reproducible across engines and runs. That
    is what lets the DuckDB twin (_ivf_sql) unroll the same Lloyd
    iterations and hash-match (VERDICT r2 #5: was rows-only).
    """
    from spark_dynamodb_spark.functions.exact import davg

    return (
        assigned.select("cell", F.posexplode("vec").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(davg("v", "m"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )


_SQL_SQDIST = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, {dim}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (acc, x) -> acc + x)"
)


def _sql_sqdist(a: str, b: str) -> str:
    """DuckDB mirror of _sq_dist: left fold over per-element squared
    diffs with 0.0 init — the same order F.aggregate(zip_with(...))
    evaluates, so distances are bit-equal."""
    return _SQL_SQDIST.format(a=a, b=b, dim=DIM)


def _ivf_sql() -> str:
    """DuckDB mirror of ann_ivf. The k-means loop is deterministic and
    fixed-depth (md5-seeded cells, KMEANS_ITERS Lloyd iterations with
    exact-decimal centroid means), so the twin simply UNROLLS it as
    chained CTEs: a0 (seed) → cents0 → a1 → cents1 → ... → index +
    final centroids → probe top-NPROBE cells → equi-join on cell →
    exact cosine top-k. Every float reduction is either an exact
    decimal sum or a pinned left fold, hence hash-identical output.
    """
    seed_cell = (
        "CAST(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {NLIST} AS INT)"
    )
    ctes = [
        "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec"
        " FROM embeddings)",
        f"a0 AS (SELECT vec_id, vec, {seed_cell} AS cell FROM v)",
    ]
    for k in range(KMEANS_ITERS):
        ctes.append(
            f"""cents{k} AS (
      SELECT cell, list(m ORDER BY pos) AS cvec FROM (
        SELECT cell, pos,
               CAST(SUM(CAST(vec[pos] AS DECIMAL(28,6))) AS DOUBLE) / COUNT(vec[pos]) AS m
        FROM a{k} CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS pos) g
        GROUP BY cell, pos
      ) GROUP BY cell
    )"""
        )
        ctes.append(
            f"""a{k + 1} AS (
      SELECT vec_id, vec, cell FROM (
        SELECT v.vec_id, v.vec, c.cell,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_sql_sqdist("v.vec", "c.cvec")} ASC, c.cell ASC) AS rn
        FROM v CROSS JOIN cents{k} c
      ) WHERE rn = 1
    )"""
        )
    last = f"a{KMEANS_ITERS}"
    ctes.append(
        f"""centsF AS (
      SELECT cell, list(m ORDER BY pos) AS cvec FROM (
        SELECT cell, pos,
               CAST(SUM(CAST(vec[pos] AS DECIMAL(28,6))) AS DOUBLE) / COUNT(vec[pos]) AS m
        FROM {last} CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS pos) g
        GROUP BY cell, pos
      ) GROUP BY cell
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT query_id, qvec, cell FROM (
        SELECT q.vec_id AS query_id, q.vec AS qvec, c.cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_sqdist("q.vec", "c.cvec")} ASC, c.cell ASC) AS rn
        FROM (SELECT * FROM {last} WHERE vec_id < {N_QUERIES}) q
        CROSS JOIN centsF c
      ) WHERE rn <= {NPROBE}
    )"""
    )
    ctes.append(
        f"""scored AS (
      SELECT p.query_id, i.vec_id AS neighbor_id,
             list_dot_product(p.qvec, i.vec)
               / (sqrt(list_dot_product(p.qvec, p.qvec)) * sqrt(list_dot_product(i.vec, i.vec)))
               AS cos
      FROM probes p
      JOIN {last} i ON i.cell = p.cell AND i.vec_id <> p.query_id
    )"""
    )
    ctes.append(
        """ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """
    )


@query("c03_ann_ivf", _ivf_sql())
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3e: IVF ANN — deterministic mini k-means coarse quantizer
    (hash-seeded cells, KMEANS_ITERS Lloyd iterations, all DataFrame
    ops: the per-iteration centroid update is a combinable aggregation
    and the reassignment a broadcast-nlist argmin — nothing iterates
    on the driver), then probe the NPROBE nearest cells per query: the
    corpus join is an equi-join on cell, so each query scans
    ~NPROBE/NLIST of the corpus instead of all of it.

    Value-checked by the driver since round 3: exact-decimal centroid
    means make the whole iteration engine-portable, and _ivf_sql
    unrolls it in DuckDB. tests/test_llm.py additionally gates
    recall@5 against the exact brute force.
    """
    from spark_dynamodb_spark.functions.text import md5_64

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    # deterministic seeding (no RNG APIs): cell = md5_64(vec_id) % NLIST
    assigned = emb.withColumn(
        "cell", (md5_64(F.col("vec_id").cast("string")) % NLIST).cast("int")
    )
    for _ in range(KMEANS_ITERS):
        cents = _centroids_of(assigned)
        w_assign = W.partitionBy("vec_id").orderBy(
            _sq_dist(F.col("vec"), F.col("cvec")).asc(), F.col("cell").asc()
        )
        assigned = (
            emb.crossJoin(F.broadcast(cents))
            .withColumn("rn", F.row_number().over(w_assign))
            .filter(F.col("rn") == 1)
            .select("vec_id", "vec", "cell")
        )
    index = assigned  # (vec_id, vec, cell) — the inverted file
    cents = _centroids_of(assigned)

    q = index.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    # probe list: NPROBE nearest centroids per query (broadcast nlist)
    w_probe = W.partitionBy("query_id").orderBy(
        _sq_dist(F.col("qvec"), F.col("cvec")).asc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= NPROBE)
        .select("query_id", "qvec", "cell")
    )
    # equi-join on cell: each query touches ~NPROBE/NLIST of the corpus
    scored = (
        index.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_similarity("qvec", "vec").alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


# --- C20: random-projection dimensionality reduction ------------------------
RP_OUT_DIMS = 8


def _rp_sql() -> str:
    cols = []
    for p in range(RP_OUT_DIMS):
        signs = "[" + ", ".join(f"{s}.0" for s in _plane(p)) + "]"
        cols.append(
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {DIM}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({signs})[i])), "
            f"(a, v) -> a + v) AS y{p}"
        )
    return (
        "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings ORDER BY vec_id"
    )


@query("c20_random_projection", _rp_sql())
def random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20: Johnson-Lindenstrauss sign-matrix random projection —
    64-dim embeddings down to 8 dims with the same deterministic ±1
    hyperplanes the LSH tables use (md5-seeded, engine-independent).
    The cheap pre-step before clustering/dedup when full-dim cosine is
    too expensive.

    Parity design: ±1 products are EXACT sign flips, so the only
    rounding is the summation — pinned to a left fold in array order
    on both engines (F.aggregate ↔ list_reduce), hence bit-equal.
    Embedding float32 widens exactly to double first.

    Scale shape: fully narrow — 8×64 multiply-adds per row inside
    whole-stage codegen, zero shuffles, no Python. At 100 TB this is
    a pure map stage that AQE never needs to touch."""
    emb = load_table(spark, sf_dir, "embeddings")
    embd = F.col("embedding").cast("array<double>")
    cols = []
    for p in range(RP_OUT_DIMS):
        signs = F.array(*[F.lit(float(s)) for s in _plane(p)])
        y = F.aggregate(
            F.zip_with(embd, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        cols.append(y.alias(f"y{p}"))
    return emb.select("vec_id", *cols).orderBy("vec_id")
