"""Multimodal plumbing tests: binary payload round-trip, typed metadata,
mapInPandas decode batching, and the clearly-marked real-codec stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from australia_company_etl_pipeline_spark.catalog import table
from australia_company_etl_pipeline_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    frame_offsets,
    pack_documents_as_media,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return pack_documents_as_media(table(spark, sf_dir, "documents"))


def test_media_schema_and_kinds(media):
    # same names/types; nullability may tighten on derived columns
    assert [(f.name, f.dataType) for f in media.schema.fields] \
        == [(f.name, f.dataType) for f in MEDIA_SCHEMA.fields]
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_payload_roundtrips_bytes(media, spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    back = (media.withColumn("text2", F.decode("payload", "UTF-8"))
            .join(docs, media.media_id == docs.doc_id)
            .filter(F.col("text2") != F.col("text")))
    assert back.count() == 0


def test_metadata_typed_by_kind(media):
    bad_audio = media.filter(
        (F.col("kind") == "audio") & (
            F.col("meta.width").isNotNull()
            | F.col("meta.sample_rate").isNull()))
    bad_image = media.filter(
        (F.col("kind") == "image") & (
            F.col("meta.duration_ms").isNotNull()
            | F.col("meta.width").isNull()))
    assert bad_audio.count() == 0
    assert bad_image.count() == 0


def test_fake_decode_deterministic_and_total(media):
    f1 = decode_features(media, codec="fake").collect()
    f2 = decode_features(media, codec="fake").collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f2))
    assert len(f1) == media.count()
    row = next(r for r in f1 if r.n_bytes > 0)
    assert len(row.features) == 4
    assert row.features[0] == float(row.n_bytes)
    assert 0.0 <= row.features[1] <= 255.0


def test_real_codec_is_stubbed(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media.limit(1), codec="real").collect()
    with pytest.raises(ValueError):
        decode_features(media, codec="mp3")


def test_frame_offsets_within_duration(media):
    fo = frame_offsets(media, n_frames=5)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert fo.count() == 5 * n_videos
    bad = fo.filter((F.col("offset_ms") < 0)
                    | (F.col("offset_ms") >= F.col("duration_ms")))
    assert bad.count() == 0


def test_resize_preserves_aspect_and_bounds(media):
    rp = resize_plan(media, box=224)
    assert rp.filter(F.col("kind") == "audio").count() == 0
    bad = rp.filter((F.greatest("target_w", "target_h") > 224)
                    | (F.least("target_w", "target_h") < 1))
    assert bad.count() == 0
    # longer edge hits the box exactly
    off = rp.filter(F.greatest("target_w", "target_h") != 224)
    assert off.count() == 0


def test_metadata_queries_prune_payload(media):
    """Resize planning must not materialize payload bytes: the physical
    scan's ReadSchema excludes the payload's source column (`text`) —
    column pruning reached the parquet reader."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        resize_plan(media, box=224).explain("formatted")
    lines = [ln for ln in buf.getvalue().splitlines() if "ReadSchema" in ln]
    assert lines, "no ReadSchema in formatted plan"
    assert all("text" not in ln for ln in lines)
