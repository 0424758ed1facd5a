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


def _py_dhash(b: bytes) -> int:
    """From-scratch twin of the fake byte-stream dHash."""
    if not b:
        return 0
    n = len(b)
    # numpy array_split layout: first (n % 65) chunks get one extra
    base, extra = divmod(n, 65)
    means, pos = [], 0
    for i in range(65):
        size = base + (1 if i < extra else 0)
        chunk = b[pos:pos + size]
        means.append(sum(chunk) / size if size else 0.0)
        pos += size
    h = 0
    for i in range(64):
        if means[i] > means[i + 1]:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def test_perceptual_hash_matches_python_twin(spark):
    from australia_company_etl_pipeline_spark.multimodal import (
        perceptual_hash,
    )

    payloads = [
        (1, "image", bytearray(b"the quick brown fox " * 40)),
        (2, "image", bytearray(b"")),          # empty -> 0
        (3, "audio", None),                    # null -> 0
        (4, "video", bytearray(range(256)) * 3),
        (5, "image", bytearray(b"x")),         # shorter than 65 chunks
    ]
    df = spark.createDataFrame(
        [(i, k, p, None) for i, k, p in payloads],
        "media_id long, kind string, payload binary, meta string")
    got = {r.media_id: r.phash for r in perceptual_hash(df).collect()}
    for i, _, p in payloads:
        want = _py_dhash(bytes(p) if p is not None else b"")
        assert got[i] == want, i
    assert got[2] == 0 and got[3] == 0


def test_media_dup_pairs_banded_recall_and_kind_guard(spark):
    """Near-identical payloads pair up; the banded join finds EVERY
    pair the pigeonhole guarantees (hamming < n_bands), never emits a
    pair above max_hamming, and cross-kind collisions are refused."""
    from australia_company_etl_pipeline_spark.multimodal import (
        media_dup_pairs,
        perceptual_hash,
    )

    base = (b"some repeated media payload content block " * 32)
    tweaked = bytearray(base)
    tweaked[100] ^= 0x01                      # tiny corruption
    rows = [
        (1, "image", bytearray(base)),
        (2, "image", tweaked),                # near-dup of 1
        (3, "image", bytearray(base)),        # exact dup of 1
        (4, "audio", bytearray(base)),        # same bytes, other kind
        (5, "image", bytearray(b"\x00\xff" * 700)),  # far away
    ]
    df = spark.createDataFrame(
        [(i, k, p, None) for i, k, p in rows],
        "media_id long, kind string, payload binary, meta string")

    fps = {r.media_id: r.phash
           for r in perceptual_hash(df).collect()}

    def ham(a, b):
        return bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")

    max_h = 6
    got = {(r.id_a, r.id_b): r.hamming
           for r in media_dup_pairs(df, max_hamming=max_h).collect()}
    # exact dup always found, hamming 0
    assert got[(1, 3)] == 0
    # the pigeonhole guarantee: every same-kind pair with hamming <
    # n_bands(=4) MUST be found; nothing above max_hamming may appear
    ids = [i for i, k, _ in rows]
    kinds = {i: k for i, k, _ in rows}
    for a in ids:
        for b in ids:
            if a < b and kinds[a] == kinds[b] and ham(a, b) < 4:
                assert (a, b) in got, (a, b, ham(a, b))
    for (a, b), h in got.items():
        assert h <= max_h and kinds[a] == kinds[b]
        assert h == ham(a, b)
    # cross-kind twin payloads (1,4) collide on hash but are refused…
    assert (1, 4) not in got
    # …unless the guard is lifted
    free = {(r.id_a, r.id_b) for r in
            media_dup_pairs(df, max_hamming=max_h,
                            same_kind=False).collect()}
    assert (1, 4) in free


def test_perceptual_hash_real_codec_is_stubbed(spark):
    from australia_company_etl_pipeline_spark.multimodal import (
        perceptual_hash,
    )

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"abc"), None)],
        "media_id long, kind string, payload binary, meta string")
    with pytest.raises(PythonException, match="NotImplementedError"):
        perceptual_hash(df, codec="real").collect()


def test_banded_hamming_pairs_single_band(spark):
    """n_bands=1 (exact-fingerprint blocking) must not crash on the
    64-bit mask literal: only hamming-0 pairs can collide, so it finds
    exact fingerprint duplicates and nothing else."""
    from australia_company_etl_pipeline_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    fp = spark.createDataFrame(
        [(1, 7), (2, 7), (3, -9223372036854775808), (4, 5)],
        "media_id long, phash long")
    got = {(r.id_a, r.id_b): r.hamming for r in banded_hamming_pairs(
        fp, "media_id", "phash", max_hamming=6, n_bands=1).collect()}
    assert got == {(1, 2): 0}
