"""Multimodal column operators — SURVEY §2 C5.

Media are opaque ``binary`` payloads + typed struct metadata; the
compute pattern is Arrow-batched Pandas UDFs over ``mapInPandas``.
The fixture set has no real media files (and this container has no
image/audio libs — TESTDATA), so payloads are derived
deterministically from ``documents.text`` (UTF-8 bytes standing in
for encoded media) and the *decode* step is a clearly-marked stub:
``decode_image`` raises NotImplementedError unless the deterministic
fake decoder is requested. The Spark-side plumbing — binary columns,
struct metadata, mapInPandas schema/batching, frame explode — is real
and oracle-checked.

Scale notes: mapInPandas streams Arrow batches; per-batch memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch — media
pipelines tune it down so a batch of decoded frames fits executor
memory. Payload bytes never route through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table

FRAME_BYTES = 64  # fake "frame" chunk size for the frame-sampling op


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an encoded image payload → pixel features.

    STUB (TESTDATA: no codec libs in this container). With
    ``fake=True`` returns deterministic pseudo-features so the
    pipeline plumbing is testable; real deployments drop in
    PIL/ffmpeg here unchanged.
    """
    if not fake:
        raise NotImplementedError(
            "image/audio codecs unavailable in this environment; "
            "use fake=True for the deterministic test decoder"
        )
    return {
        "n_bytes": len(payload),
        "checksum": sum(payload) % 65536,
        "head": payload[:4].hex(),
    }


def with_media_columns(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary, meta: struct). The binary
    payload is the UTF-8 encoding of text (deterministic stand-in for
    an encoded media blob)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/x-fake-media").alias("mime"),
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("content_length"),
        ).alias("meta"),
    )


@query(
    "c05_multimodal_features",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           'application/x-fake-media' AS mime,
           source AS origin
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5a: binary payload + struct metadata → feature extraction via
    mapInPandas (Arrow batches of binary values)."""
    docs = with_media_columns(load_table(spark, sf_dir, "documents"))

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("payload_md5", T.StringType()),
            T.StructField("mime", T.StringType()),
            T.StructField("origin", T.StringType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [decode_image(p, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "origin": [m["origin"] for m in pdf["meta"]],
                }
            )

    return docs.mapInPandas(extract, out_schema).orderBy("doc_id")


@query(
    "c05_multimodal_frames",
    f"""
    WITH f AS (
      SELECT doc_id, n_chars,
             unnest(generate_series(0, CAST(ceil(n_chars * 1.0 / {FRAME_BYTES}) AS BIGINT) - 1))
               AS frame_idx
      FROM documents
    )
    SELECT d.doc_id, f.frame_idx,
           md5(substr(d.text, CAST(f.frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
             AS frame_md5,
           CAST(length(substr(d.text, CAST(f.frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
             AS BIGINT) AS frame_bytes
    FROM f JOIN documents d USING (doc_id)
    WHERE f.frame_idx % 2 = 0
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5b: frame sampling — chunk the payload into fixed-size frames,
    keep every 2nd frame, one output row per sampled frame (the
    video-frame-extraction shape: 1 input row → N frame rows)."""
    docs = with_media_columns(load_table(spark, sf_dir, "documents"))

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
            T.StructField("frame_bytes", T.LongType()),
        ]
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = -(-len(payload) // FRAME_BYTES)
                for i in range(0, n_frames, 2):  # sample every 2nd frame
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id", "payload")
        .mapInPandas(sample_frames, out_schema)
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "c05_multimodal_roundtrip",
    """
    SELECT doc_id, text AS decoded_text, length(text) AS n_chars_out
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5c: binary round-trip — encode → binary column → decode back
    (base64 over the wire both ways), proving lossless binary
    transport through shuffle/Arrow (the §1.2 B-type row)."""
    docs = with_media_columns(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.decode(F.unbase64(F.base64("payload")), "UTF-8").alias("decoded_text"),
        F.length(F.decode("payload", "UTF-8")).alias("n_chars_out"),
    ).orderBy("doc_id")
