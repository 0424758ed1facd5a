"""WebDataset tar shard sink (sources/webdataset.py): layout, byte
determinism, modality handling, and the dense-shard-list contract."""

from __future__ import annotations

import hashlib
import json

import pytest

from australia_company_etl_pipeline_spark.sources.webdataset import (
    read_webdataset_shard,
    write_webdataset_shards,
)


def _frame(spark):
    rows = [
        (f"doc{i:03d}",
         f"text of sample {i}",
         bytes([i % 256, (i * 7) % 256]),
         "en" if i % 2 == 0 else "de",
         i)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "k string, txt string, payload binary, lang string, "
              "n long")


def test_webdataset_roundtrip_and_layout(spark, tmp_path):
    out = str(tmp_path / "wds")
    paths = write_webdataset_shards(
        _frame(spark), out, "k", {"txt": "txt", "bin": "payload"},
        shards=3, json_cols=["lang", "n"])
    assert len(paths) == 3
    samples: dict[str, dict[str, bytes]] = {}
    for p in paths:
        shard = read_webdataset_shard(p)
        # range sharding: contiguous key ranges, no key straddles shards
        assert not (set(shard) & set(samples))
        samples.update(shard)
    assert len(samples) == 20
    s = samples["doc007"]
    assert s["txt"] == b"text of sample 7"
    assert s["bin"] == bytes([7, 49])
    assert json.loads(s["json"]) == {"lang": "de", "n": 7}


def test_webdataset_shards_are_byte_deterministic(spark, tmp_path):
    df = _frame(spark)
    h = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        paths = write_webdataset_shards(
            df.repartition(7 if d == "a" else 2), out, "k",
            {"txt": "txt"}, shards=2, json_cols=["n"])
        h.append([hashlib.md5(open(p, "rb").read()).hexdigest()
                  for p in paths])
    assert h[0] == h[1]              # layout-independent, byte-exact


def test_webdataset_null_members_skipped_and_dense_list(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "has text", None), ("b", None, b"\x01")],
        "k string, txt string, payload binary")
    out = str(tmp_path / "wds2")
    paths = write_webdataset_shards(df, out, "k",
                                    {"txt": "txt", "bin": "payload"},
                                    shards=4)
    assert len(paths) == 4           # dense even when input is tiny
    merged = {}
    for p in paths:
        merged.update(read_webdataset_shard(p))
    assert set(merged["a"]) == {"txt"} and set(merged["b"]) == {"bin"}


def test_webdataset_validates_inputs(spark, tmp_path):
    df = spark.createDataFrame([("x/y", "t")], "k string, txt string")
    with pytest.raises(Exception, match="bad webdataset key"):
        write_webdataset_shards(df, str(tmp_path / "w3"), "k",
                                {"txt": "txt"}, shards=1)
    with pytest.raises(ValueError, match="shards"):
        write_webdataset_shards(df, str(tmp_path / "w4"), "k",
                                {"txt": "txt"}, shards=0)
    with pytest.raises(ValueError, match="member"):
        write_webdataset_shards(df, str(tmp_path / "w5"), "k", {},
                                shards=1)


def test_webdataset_duplicate_keys_fail_loudly(spark, tmp_path):
    """Keys are sample identity: a duplicate must raise from the
    writer (sorted-adjacent check), never silently emit colliding
    member stems that read_webdataset_shard would last-wins overwrite."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "c")], "k long, txt string")
    with pytest.raises(Exception, match="duplicate webdataset key"):
        write_webdataset_shards(df, str(tmp_path / "wdup"), "k",
                                {"txt": "txt"}, shards=1)
