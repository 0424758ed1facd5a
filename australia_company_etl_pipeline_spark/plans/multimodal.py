"""Oracle-checked multimodal queries (training-data pipeline extension).

The media fixture derives deterministically from ``documents`` (payload =
UTF-8 text bytes), so even the mapInPandas featurizer is SQL-expressible:
DuckDB recomputes byte statistics from character codes (the corpus is
ASCII — byte sum == ascii-code sum). The plumbing under test is real:
binary columns, metadata structs, column pruning past the payload,
Arrow-batched decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..multimodal.media import (
    decode_features,
    frame_offsets,
    pack_documents_as_media,
    resize_plan,
)
from .registry import register

# DuckDB twin of the kind/meta derivation in pack_documents_as_media
_KIND = ("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' "
         "WHEN 1 THEN 'audio' ELSE 'video' END")


_MEDIA_ORACLE = f"""
WITH b AS (
  SELECT doc_id AS media_id, {_KIND} AS kind,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS payload_md5,
         list_aggregate(list_transform(regexp_split_to_array(text, ''),
                                       c -> ascii(c)), 'sum') AS total,
         ascii(substr(text, 1, 1)) AS first_byte,
         CASE WHEN {_KIND} IN ('image', 'video')
              THEN CAST(doc_id % 640 + 64 AS INT) END AS width,
         CASE WHEN {_KIND} IN ('image', 'video')
              THEN CAST(doc_id % 480 + 48 AS INT) END AS height,
         CASE WHEN {_KIND} IN ('audio', 'video')
              THEN CAST(doc_id % 90000 + 1000 AS INT) END AS duration_ms,
         CASE WHEN {_KIND} = 'audio'
              THEN CAST(16000 AS INT) END AS sample_rate
  FROM documents
)
SELECT media_id, kind, n_bytes, payload_md5,
       width, height, duration_ms, sample_rate,
       CAST(round(width * (CAST(224 AS DOUBLE) / greatest(width, height)))
            AS INT) AS target_w,
       CAST(round(height * (CAST(224 AS DOUBLE) / greatest(width, height)))
            AS INT) AS target_h,
       CAST(n_bytes AS DOUBLE) AS f_len,
       CASE WHEN n_bytes = 0 THEN 0.0
            ELSE floor((CAST(total AS DOUBLE) / n_bytes) * 1000000 + 0.5)
                 / 1000000 END AS f_mean_byte,
       CASE WHEN n_bytes = 0 THEN 0.0
            ELSE CAST(first_byte AS DOUBLE) END AS f_first_byte,
       CAST(coalesce(total, 0) % 997 AS DOUBLE) AS f_checksum
FROM b
"""

_FRAMES_ORACLE = f"""
WITH v AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % 90000 + 1000 AS INT) AS duration_ms
  FROM documents WHERE {_KIND} = 'video'
), k AS (SELECT unnest([0, 1, 2, 3, 4]) AS frame_idx)
SELECT v.media_id, v.duration_ms, k.frame_idx,
       CAST(floor(k.frame_idx * v.duration_ms / 5.0) AS BIGINT) AS offset_ms
FROM v CROSS JOIN k
"""


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = pack_documents_as_media(table(spark, sf_dir, "documents"))
    feats = decode_features(media, codec="fake")
    meta_side = media.select(
        "media_id",
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.sample_rate").alias("sample_rate"))
    targets = resize_plan(media, box=224).select(
        "media_id", "target_w", "target_h")
    return (feats
            .join(meta_side, "media_id")
            .join(targets, "media_id", "left")
            .select(
                "media_id", "kind", "n_bytes", "payload_md5",
                "width", "height", "duration_ms", "sample_rate",
                "target_w", "target_h",
                F.element_at("features", 1).alias("f_len"),
                F.element_at("features", 2).alias("f_mean_byte"),
                F.element_at("features", 3).alias("f_first_byte"),
                F.element_at("features", 4).alias("f_checksum")))


def _frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = pack_documents_as_media(table(spark, sf_dir, "documents"))
    return frame_offsets(media, n_frames=5).select(
        "media_id", "duration_ms", "frame_idx", "offset_ms")


@register(
    "media_report",
    doc="The whole multimodal surface in one row_kind-tagged result (r4 "
        "fold of media_pack_features / media_frame_offsets to free a "
        "driver-window slot for segment_dedup_docs; same operators "
        "exercised). row_kind='media': binary payload stats (byte "
        "length, md5 — the binary column round-trips bit-exactly), typed "
        "kind-dependent metadata (NULL where not applicable), "
        "aspect-preserving resize targets, and the Arrow-batched "
        "mapInPandas byte-statistics featurizer (real codecs stubbed — "
        "no image/audio libs here). row_kind='frame': 5 equally-spaced "
        "video frame-sample offsets — frame *selection* is native "
        "expression math; only decoding needs the (stubbed) codec. The "
        "oracle recomputes every column from character codes, so the "
        "Python boundary is held to SQL-checkable semantics.",
    tags=("multimodal", "pandas-udf"),
    oracle=f"""
SELECT 'media' AS row_kind, f.*,
       CAST(NULL AS INT) AS frame_idx, CAST(NULL AS BIGINT) AS offset_ms
FROM ({_MEDIA_ORACLE}) f
UNION ALL
SELECT 'frame' AS row_kind, media_id, CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS BIGINT) AS n_bytes, CAST(NULL AS VARCHAR) AS payload_md5,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       duration_ms, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS target_w, CAST(NULL AS INT) AS target_h,
       CAST(NULL AS DOUBLE) AS f_len, CAST(NULL AS DOUBLE) AS f_mean_byte,
       CAST(NULL AS DOUBLE) AS f_first_byte,
       CAST(NULL AS DOUBLE) AS f_checksum,
       frame_idx, offset_ms
FROM ({_FRAMES_ORACLE}) fr
""",
)
def media_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _media_features(spark, sf_dir).select(
        F.lit("media").alias("row_kind"), "*")
    frames = _frame_rows(spark, sf_dir).select(
        F.lit("frame").alias("row_kind"), "*")
    return feats.unionByName(frames, allowMissingColumns=True)


