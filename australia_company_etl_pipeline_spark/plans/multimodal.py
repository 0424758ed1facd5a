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


@register(
    "media_pack_features",
    doc="Multimodal packing + decode plumbing + resize planning in one "
        "per-media report (fold of r2's media_pack_stats / "
        "media_fake_features / media_resize_plan to fit the driver's "
        "query window; same operators exercised): binary payload stats "
        "(byte length, md5) prove the binary column round-trips "
        "bit-exactly; typed kind-dependent metadata (NULL where not "
        "applicable); aspect-preserving resize targets for visual media; "
        "and the Arrow-batched mapInPandas byte-statistics featurizer "
        "(real codecs stubbed — no image/audio libs here). The oracle "
        "recomputes every column from character codes, so the Python "
        "boundary is held to SQL-checkable semantics.",
    tags=("multimodal", "pandas-udf"),
    oracle=f"""
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
""",
)
def media_pack_features(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@register(
    "media_frame_offsets",
    doc="Video frame sampling: 5 equally-spaced sample offsets per video "
        "from duration metadata — frame *selection* is native expression "
        "math (sequence + explode); only decoding the chosen frames needs "
        "the (stubbed) Python codec.",
    tags=("multimodal",),
    oracle=f"""
WITH v AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % 90000 + 1000 AS INT) AS duration_ms
  FROM documents WHERE {_KIND} = 'video'
), k AS (SELECT unnest([0, 1, 2, 3, 4]) AS frame_idx)
SELECT v.media_id, v.duration_ms, k.frame_idx,
       CAST(floor(k.frame_idx * v.duration_ms / 5.0) AS BIGINT) AS offset_ms
FROM v CROSS JOIN k
""",
)
def media_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = pack_documents_as_media(table(spark, sf_dir, "documents"))
    return frame_offsets(media, n_frames=5).select(
        "media_id", "duration_ms", "frame_idx", "offset_ms")


