"""Count-Min sketch (operators/cms.py, r7).

The never-undercount bound and the sketch-of-union == merge-of-
sketches identity are pinned as exact properties; the registered
kind='cms'/'cms_probe' fold is value-checked counter-by-counter
against DuckDB by tests/test_queries_oracle.py.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import cms

WORDS = (["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5
         + [f"tail{i}" for i in range(100)])


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], "w string")


def _estimates(spark, sketch, keys, depth, width):
    probe = spark.createDataFrame([(k,) for k in keys], "w string")
    got = cms.cms_estimate(probe, F.col("w"), sketch, depth, width,
                           id_col="w", out_col="est")
    return {r.w: r.est for r in got.collect()}


def test_never_undercounts_and_exact_when_wide(spark, words_df):
    truth = Counter(WORDS)
    sketch = cms.build_cms(words_df, F.col("w"), depth=4, width=4096)
    est = _estimates(spark, sketch, list(truth), 4, 4096)
    for w, n in truth.items():
        assert est[w] >= n
    # 103 keys in 4×4096 counters: overwhelmingly collision-free
    exact = sum(est[w] == n for w, n in truth.items())
    assert exact >= 100


def test_narrow_sketch_overcounts_but_never_under(spark, words_df):
    truth = Counter(WORDS)
    sketch = cms.build_cms(words_df, F.col("w"), depth=2, width=16)
    est = _estimates(spark, sketch, list(truth), 2, 16)
    assert all(est[w] >= n for w, n in truth.items())
    assert any(est[w] > n for w, n in truth.items())  # collisions real


def test_absent_key_estimate_is_bounded_not_negative(spark, words_df):
    sketch = cms.build_cms(words_df, F.col("w"), depth=4, width=4096)
    est = _estimates(spark, sketch, ["never_seen_zzz"], 4, 4096)
    assert est["never_seen_zzz"] >= 0


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(w,) for w in WORDS[:80]], "w string")
    b = spark.createDataFrame([(w,) for w in WORDS[80:]], "w string")
    both = spark.createDataFrame([(w,) for w in WORDS], "w string")
    kw = dict(depth=3, width=64)
    merged = cms.merge_cms(cms.build_cms(a, F.col("w"), **kw),
                           cms.build_cms(b, F.col("w"), **kw))
    direct = cms.build_cms(both, F.col("w"), **kw)
    m = {(r.row_idx, r.col_idx): r.cnt for r in merged.collect()}
    d = {(r.row_idx, r.col_idx): r.cnt for r in direct.collect()}
    assert m == d


def test_weighted_build(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)],
                               "w string, n int")
    sketch = cms.build_cms(df, F.col("w"), depth=4, width=4096,
                           weight=F.col("n"))
    est = _estimates(spark, sketch, ["a", "b"], 4, 4096)
    assert est["a"] == 15 and est["b"] == 2


def test_null_keys_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "w string")
    sketch = cms.build_cms(df, F.col("w"), depth=4, width=4096)
    est = _estimates(spark, sketch, ["a"], 4, 4096)
    assert est["a"] == 2


def test_portable_backend_matches_python_twin(spark, words_df):
    """hash_fn='md5' counters replayed in pure python from the same
    hex-slice arithmetic — the engine-portability contract the DuckDB
    oracle relies on."""
    import hashlib

    depth, width = 3, 32
    sketch = cms.build_cms(words_df, F.col("w"), depth, width,
                           hash_fn="md5")
    got = {(r.row_idx, r.col_idx): r.cnt for r in sketch.collect()}
    want: Counter = Counter()
    for w in WORDS:
        hx = hashlib.md5(w.encode()).hexdigest()
        h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
        for i in range(depth):
            want[(i, (h1 + i * h2) % width)] += 1
    assert got == dict(want)


def test_build_plan_is_one_partial_agg_shuffle(spark, words_df):
    plan = (cms.build_cms(words_df, F.col("w"), depth=4, width=64)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()
