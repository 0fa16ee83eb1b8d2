"""Multimodal column operators (SURVEY.md §2.3 E5 + north-star
multimodal): binary payload columns with typed struct metadata, and
Arrow-batched feature extraction via mapInPandas.

Design: media payloads are opaque ``BinaryType`` columns riding next to a
typed metadata struct (modality, byte_len, content digest) — the lake
idiom for image/audio/video corpora. The payload here is the document's
utf-8 bytes (this container has no media decode libs — see
``decode_media``), but every Spark-side mechanism is real: BinaryType
columns, struct metadata projection/pruning, JVM-side digesting
(sha2/octet length — no Python in the oracle-checked path), and the
mapInPandas Arrow batch plumbing for the Python-side feature extractor.

At 100 TB: payload bytes never shuffle in these plans — digests and
metadata are computed in the scan projection (narrow), aggregations group
on small derived columns, and mapInPandas streams Arrow batches without
materializing a partition in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from user_feed_cdc_spark.sources.tables import fan_out, load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


MODALITIES = ("image", "audio", "video")
FEATURE_DIM = 8


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → simulated multimodal rows: ``payload BINARY`` plus a
    typed ``meta STRUCT<modality, byte_len, content_sha>``. Modality is
    assigned deterministically (doc_id mod 3) so oracles can reproduce
    it. Everything is a narrow JVM-side projection over the scan."""
    payload = F.encode(F.col("text"), "UTF-8")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, MODALITIES[0])
        .when(F.col("doc_id") % 3 == 1, MODALITIES[1])
        .otherwise(MODALITIES[2])
    )
    return docs.select(
        "doc_id",
        "source",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.length(payload).alias("byte_len"),
            F.sha2(payload, 256).alias("content_sha"),
        ).alias("meta"),
    )


@_register(
    "multimodal_binary_stats",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item binary metadata: byte length + content digest of the
    payload, projected out of the metadata struct. Digesting happens
    JVM-side (sha2 over BinaryType) in the scan projection."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.content_sha").alias("content_sha"),
    )


@_register(
    "multimodal_rollup",
    """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           source,
           COUNT(*) AS n_items,
           SUM(octet_length(encode(text))) AS total_bytes,
           COUNT(DISTINCT sha256(text)) AS n_distinct_content
    FROM documents
    GROUP BY 1, 2
    """,
)
def multimodal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting per (modality, source): item count, raw byte
    volume, distinct-content count (exact-dup detection over binary
    payloads via the digest — the digest, not the payload, shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.groupBy(
        F.col("meta.modality").alias("modality"), "source"
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.byte_len").alias("total_bytes"),
        F.countDistinct("meta.content_sha").alias("n_distinct_content"),
    )


FRAME_BYTES = 64  # simulated frame size
FRAME_STRIDE = 4  # sample every 4th frame


@_register(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id, n_frames, n_sampled, first_frame_md5
    FROM (
        SELECT doc_id,
               CAST(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
               CAST(CEIL(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0)
                         / {FRAME_STRIDE}.0) AS BIGINT) AS n_sampled,
               md5(substring(text, 1, {FRAME_BYTES})) AS first_frame_md5
        FROM documents
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: treat the payload as a
    sequence of fixed-size frames, sample every FRAME_STRIDE-th, digest
    the first sampled frame — byte-slicing (substring over BinaryType)
    and digesting happen JVM-side; this is the plumbing a video pipeline
    runs before handing sampled frames to a Python decoder
    (decode_media). Narrow over the scan, payload bytes never shuffle.
    (Oracle note: DuckDB can't substring a BLOB, so the oracle slices
    the source STRING — equivalent here because the corpus is pure
    ASCII, verified octet_length == length at every SF; Spark slices
    the actual binary payload.)"""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    n_frames = F.ceil(F.col("meta.byte_len") / float(FRAME_BYTES))
    return mm.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.ceil(n_frames / float(FRAME_STRIDE)).alias("n_sampled"),
        F.md5(F.expr(f"substring(payload, 1, {FRAME_BYTES})")).alias(
            "first_frame_md5"
        ),
    )


def decode_media(payload: bytes, modality: str):
    """Decode raw media bytes into pixels/samples/frames. STUB: the real
    implementation plugs PIL (image), soundfile (audio), or an ffmpeg
    frame sampler (video) — none are available in this container.
    ``extract_features`` falls back to a deterministic digest-derived
    feature vector so the distributed plumbing stays testable."""
    raise NotImplementedError(
        f"media decode for {modality!r} requires image/audio libraries "
        "not present in this environment; plug the real decoder here"
    )


def _fallback_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: first FEATURE_DIM bytes of
    the payload's sha256 digest scaled into [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas). Per batch: try the real decoder, fall back to the
    deterministic digest features. The batch shape is the real contract:
    payload arrives as a bytes Series per Arrow batch; output is a
    fixed-width ``array<float>`` column — the shape an embedding model
    or image featurizer produces at scale."""
    import pandas as pd

    out_schema = (
        "doc_id long, modality string, features array<float>"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload)
                try:
                    decoded = decode_media(raw, modality)
                    feats.append([float(x) for x in decoded[:FEATURE_DIM]])
                except NotImplementedError:
                    feats.append(_fallback_features(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    # modest fan-out: each NEW partition pays a Python worker cold-start
    # (fork + Arrow init), so matching core count on a small input spends
    # more on spawns than it wins in parallelism; 8 balances both. On a
    # warm cluster (reused workers) raise toward the core count.
    flat = fan_out(
        mm.select("doc_id", F.col("meta.modality").alias("modality"), "payload"),
        min_parallelism=8,
    )
    return flat.mapInPandas(batches, out_schema)


@_register("multimodal_feature_extract", None)  # Python featurizer → rows-only
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction end-to-end: binary payload → mapInPandas →
    per-item float vector + a JVM-side L2 norm over the result (proving
    the extracted vectors flow back into built-in higher-order fns)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(with_binary_payload(docs))
    norm = F.sqrt(
        F.aggregate(
            F.col("features"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return feats.select(
        "doc_id", "modality", F.round(norm, 4).alias("feature_norm")
    )
