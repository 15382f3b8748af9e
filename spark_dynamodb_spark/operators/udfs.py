"""UDF surface — SURVEY.md §2 B26: scalar Python UDF, Arrow-batched
pandas UDF, grouped-map applyInPandas, grouped-agg UDAF, and a UDTF.

These exist to prove the extension surface, with semantics chosen to
be SQL-expressible so the oracle can check them. The engine rule
(SURVEY §2 C6) still holds: hot paths use built-ins; pandas UDFs are
the sanctioned escape hatch (Arrow batches, ~10-100× faster than
row-at-a-time) and the plain Python UDF appears exactly once, here,
as a deliberately-marked slow-path demonstrator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table


@query(
    "b26_pandas_udf_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS total_cost
    FROM lineitem
    WHERE l_orderkey < 1000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26a: Arrow-batched scalar pandas UDF (vectorized numpy math —
    IEEE-identical to the SQL expression)."""

    @F.pandas_udf("double")
    def total_cost(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # No rounding: pandas .round is banker's (half-even) while SQL
        # round is half-away — the raw product is IEEE-identical.
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        total_cost("l_extendedprice", "l_discount", "l_tax").alias("total_cost"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "b26_python_udf_scalar",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor' ELSE 'credit' END
             || ':' || c_mktsegment AS segment_tag
    FROM customer
    ORDER BY c_custkey
    """,
)
def python_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26b: row-at-a-time Python UDF — the documented slow path.

    Exists to prove the surface; anything hot uses built-ins or
    pandas UDFs instead.
    """

    @F.udf(T.StringType())
    def tag(bal: float, seg: str) -> str:
        return ("debtor" if bal < 0 else "credit") + ":" + seg

    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", tag("c_acctbal", "c_mktsegment").alias("segment_tag")
    ).orderBy("c_custkey")


@query(
    "b26_grouped_agg_udaf",
    """
    SELECT c_nationkey,
           round(CAST(max(c_acctbal) - min(c_acctbal) AS DOUBLE), 6) AS bal_range
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26c: grouped-aggregate pandas UDF (a UDAF): per-nation balance
    range. max-min is order-independent so it hash-matches exactly."""

    @F.pandas_udf("double")
    def bal_range(bal: pd.Series) -> float:
        return round(float(bal.max() - bal.min()), 6)

    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(bal_range("c_acctbal").alias("bal_range"))
        .orderBy("c_nationkey")
    )


@query(
    "b26_apply_in_pandas",
    """
    SELECT c_nationkey, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
    FROM customer
    QUALIFY bal_rank <= 2
    ORDER BY c_nationkey, bal_rank
    """,
)
def apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26d: grouped-map applyInPandas — per-nation top-2 by balance
    computed inside an Arrow batch per group.

    This is the template for custom per-group operators Spark lacks
    (the multimodal decode path, C5, uses the same shape). A window
    would be faster here — the point is the extension surface.
    """

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).head(2)
        out = out.assign(bal_rank=range(1, len(out) + 1))
        return out[["c_nationkey", "c_custkey", "c_acctbal", "bal_rank"]]

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    schema = T.StructType(
        [
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("bal_rank", T.IntegerType()),
        ]
    )
    return (
        cust.groupBy("c_nationkey")
        .applyInPandas(top2, schema)
        .orderBy("c_nationkey", "bal_rank")
    )


@query(
    "b26_udtf_split",
    """
    SELECT p_partkey, t.word
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
          FROM part WHERE p_partkey < 100) t(p_partkey, word)
    ORDER BY p_partkey, word
    """,
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26e: Python UDTF (table function) — split-to-rows demonstrator
    (PySpark 4 @udtf). Registered per-call; lateral-joined per row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, name: str):
            for w in (name or "").split(" "):
                yield (w,)

    spark.udtf.register("split_words", SplitWords)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    part.createOrReplaceTempView("b26_part_v")
    return spark.sql(
        """
        SELECT p_partkey, s.word
        FROM b26_part_v, LATERAL split_words(p_name) s
        ORDER BY p_partkey, s.word
        """
    )


@query(
    "c46_map_in_arrow",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(array_to_string(t, '')) AS BIGINT) AS n_chars,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique
    FROM toks
    ORDER BY doc_id
    """,
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C46: mapInArrow — the lowest-overhead Python escape hatch:
    batches arrive as raw pyarrow RecordBatches (no pandas
    conversion), transform with pyarrow.compute kernels (C++
    vectorized), emit RecordBatches back. One level below B26's
    pandas UDFs; the right tool when the Python-side work is itself
    Arrow-native (tokenizers with Arrow bindings, Arrow-producing
    model runtimes).

    The batch fn computes per-doc token stats with pa.compute
    kernels plus vectorized numpy scatter/sort — no Python-level
    per-row loop anywhere.

    Scale shape: narrow map over the scan; Arrow both ways means the
    only cost vs JVM codegen is the (zero-copy) IPC hop.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for batch in batches:
            toks = pc.split_pattern(
                pc.utf8_lower(batch.column("text")), " "
            )
            # flatten; empties are masked below (the oracle's
            # list_filter mirror — pyarrow has no list-level filter)
            flat = pc.list_flatten(toks)
            nonempty = pc.not_equal(flat, "")
            parents = pc.list_parent_indices(toks)
            import numpy as np

            n = len(batch)
            n_tokens = np.zeros(n, dtype="int64")
            n_chars = np.zeros(n, dtype="int64")
            np.add.at(
                n_tokens, parents.to_numpy(zero_copy_only=False),
                nonempty.to_numpy(zero_copy_only=False).astype("int64"),
            )
            lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            np.add.at(n_chars, parents.to_numpy(zero_copy_only=False), lens)
            # unique per doc: vectorized sort-boundary count over
            # (parent, token) — lexsort, then a new (parent, token)
            # pair starts wherever either component changes
            tok_np = flat.to_numpy(zero_copy_only=False)
            par_np = parents.to_numpy(zero_copy_only=False)
            mask = nonempty.to_numpy(zero_copy_only=False)
            tok_m, par_m = tok_np[mask], par_np[mask]
            n_unique = np.zeros(n, dtype="int64")
            if len(par_m):
                order = np.lexsort((tok_m, par_m))
                ps, ts = par_m[order], tok_m[order]
                new_pair = np.ones(len(ps), dtype=bool)
                new_pair[1:] = (ps[1:] != ps[:-1]) | (ts[1:] != ts[:-1])
                np.add.at(n_unique, ps[new_pair], 1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(n_tokens),
                    pa.array(n_chars),
                    pa.array(n_unique),
                ],
                ["doc_id", "n_tokens", "n_chars", "n_unique"],
            )

    return docs.mapInArrow(
        stats, "doc_id long, n_tokens long, n_chars long, n_unique long"
    ).orderBy("doc_id")


@query(
    "b107_cogroup_in_pandas",
    """
    WITH budgets AS (
      SELECT c_custkey AS user_id,
             CAST(floor(c_acctbal * 10000) AS BIGINT) AS budget_micro
      FROM customer
    ),
    e AS (
      SELECT user_id, CAST(floor(value * 1000000) AS BIGINT) AS v_micro
      FROM events
    )
    SELECT b.user_id,
           COUNT(e.v_micro) AS n_events,
           CAST(COUNT(CASE WHEN e.v_micro > b.budget_micro THEN 1 END) AS BIGINT)
             AS n_over_budget,
           b.budget_micro
    FROM budgets b JOIN e ON e.user_id = b.user_id
    GROUP BY b.user_id, b.budget_micro
    ORDER BY b.user_id
    """,
)
def cogroup_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B107: cogrouped applyInPandas — the two-frame grouped-map API
    (``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas``): each
    task receives BOTH sides of one key as pandas frames, the
    extension point for per-key reconciliation logic no join
    expresses in one pass (pandas merge_asof, per-key model scoring,
    custom conflict resolution). Here: per-user spend events
    reconciled against the matching customer's budget (over-budget
    event counting), only keys present on both sides emitted — the
    semantics the SQL-join oracle mirrors.

    Exactness: both sides compare in integer micro-units (floor —
    Spark truncates a bare double->BIGINT cast where DuckDB rounds).

    Scale shape: cogroup shuffles each side ONCE on the key (two
    exchanges total, same as the equivalent join) and streams each
    key's pair of Arrow batches; per-task memory is one key's rows on
    both sides.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.col("value") * 1000000).cast("long").alias("v_micro")
    )
    budgets = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.floor(F.col("c_acctbal") * 10000).cast("long").alias("budget_micro"),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("n_over_budget", T.LongType()),
            T.StructField("budget_micro", T.LongType()),
        ]
    )

    def reconcile(events: pd.DataFrame, budget: pd.DataFrame) -> pd.DataFrame:
        if budget.empty or events.empty:
            return pd.DataFrame(
                {k: pd.Series(dtype="int64") for k in schema.fieldNames()}
            )
        bm = int(budget["budget_micro"].iloc[0])
        uid = int(budget["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [len(events)],
                "n_over_budget": [int((events["v_micro"] > bm).sum())],
                "budget_micro": [bm],
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(budgets.groupBy("user_id"))
        .applyInPandas(reconcile, schema)
        .orderBy("user_id")
    )
