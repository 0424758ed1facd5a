"""Distributed Bloom filter (operators/bloom.py, r7).

The hard guarantee is NO FALSE NEGATIVES — a filter that can drop a
seen key silently corrupts every dedup built on it — so that is tested
exhaustively; the false-positive rate only has to stay near theory.
The md5 backend is replayed bit-for-bit by a from-scratch python twin
(the same backend the driver oracle replays in DuckDB).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import bloom as bl

M = 63 * 512          # 32 256 bits
K = 5


def _keys(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                 "doc_id long, key string")


def _py_positions(key: str, m: int, k: int) -> list[int]:
    hx = hashlib.md5(key.encode()).hexdigest()
    h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
    return [(h1 + i * h2) % m for i in range(k)]


def _py_words(vals, m, k):
    words: dict[int, int] = {}
    for v in vals:
        for p in _py_positions(v, m, k):
            words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    return words


def test_no_false_negatives_both_backends(spark):
    vals = [f"key-{i}" for i in range(2000)]
    df = _keys(spark, vals)
    for fn in ("xxhash64", "md5"):
        filt = bl.build_bloom(df, F.col("key"), M, K, hash_fn=fn)
        probed = bl.bloom_probe(df, F.col("key"), filt, M, K, hash_fn=fn)
        n_missed = probed.filter(~F.col("maybe_seen")).count()
        assert n_missed == 0, fn


def test_false_positive_rate_near_theory(spark):
    seen = [f"key-{i}" for i in range(2000)]
    unseen = [f"other-{i}" for i in range(2000)]
    filt = bl.build_bloom(_keys(spark, seen), F.col("key"), M, K)
    probed = bl.bloom_probe(_keys(spark, unseen), F.col("key"), filt, M, K)
    fp = probed.filter(F.col("maybe_seen")).count()
    # theory: fill = 1-e^(-kn/m) ≈ 0.267, fpr ≈ fill^k ≈ 0.0014;
    # a broken probe reads ~0% or ~100%, so a loose 2% ceiling is
    # still a sharp test
    assert fp / 2000 < 0.02, fp
    # and it actually filters: most unseen keys are definitely-new
    assert fp < 200


def test_null_keys(spark):
    df = spark.createDataFrame([(0, "a"), (1, None), (2, "b")],
                               "doc_id long, key string")
    filt = bl.build_bloom(df, F.col("key"), M, K)
    probed = bl.bloom_probe(df, F.col("key"), filt, M, K)
    rows = {r.doc_id: r.maybe_seen for r in probed.collect()}
    assert rows[0] and rows[2]
    assert rows[1] is False  # NULL is not a member


def test_md5_backend_word_parity_with_python(spark):
    vals = [f"doc {i} text" for i in range(300)]
    filt = bl.build_bloom(_keys(spark, vals), F.col("key"), M, K,
                          hash_fn="md5")
    got = {r.word_idx: r.bits for r in filt.collect()}
    assert got == _py_words(vals, M, K)


def test_bloom_stats(spark):
    vals = [f"key-{i}" for i in range(500)]
    filt = bl.build_bloom(_keys(spark, vals), F.col("key"), M, K,
                          hash_fn="md5")
    row = bl.bloom_stats(filt, M, K).head()
    exp_bits = sum(bin(w).count("1") for w in _py_words(vals, M, K).values())
    assert row.set_bits == exp_bits
    assert row.fill_ratio == exp_bits / M
    assert math.isclose(row.fpr_estimate, (exp_bits / M) ** K)


def test_prefilter_equals_plain_anti_join(spark):
    """The composition the filter exists for: definitely-new rows skip
    the join; only maybe-seen rows pay the exact anti-join — and the
    union equals the plain anti-join against the full history."""
    history = _keys(spark, [f"key-{i}" for i in range(1500)])
    batch = _keys(spark, [f"key-{i}" for i in range(1400, 1500)]
                  + [f"new-{i}" for i in range(400)])
    filt = bl.build_bloom(history, F.col("key"), M, K)
    probed = bl.bloom_probe(batch, F.col("key"), filt, M, K)
    fast_new = probed.filter(~F.col("maybe_seen")).select("key")
    slow_new = (probed.filter(F.col("maybe_seen")).select("key")
                .join(history.select("key"), "key", "left_anti"))
    got = sorted(r.key for r in fast_new.unionByName(slow_new).collect())
    want = sorted(r.key for r in
                  batch.select("key")
                  .join(history.select("key"), "key", "left_anti")
                  .collect())
    assert got == want
    # and the fast path carried most of the batch (the point of the
    # filter): well over half the new keys skipped the join
    assert fast_new.count() > 300


def test_probe_plan_broadcasts_filter(spark):
    df = _keys(spark, ["a", "b"])
    filt = bl.build_bloom(df, F.col("key"), M, K)
    plan = (bl.bloom_probe(df, F.col("key"), filt, M, K)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
