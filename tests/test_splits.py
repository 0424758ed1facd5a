"""Leakage-safe splitting + contamination audit (operators/splits.py, r7).

The cluster-hash rule's arithmetic is replayed in python (portable md5
twin); the registered `dedup_clusters` fold value-checks it in DuckDB
on top of the recursive-CTE cluster oracle. The demonstration test is
the point of the operator: a doc-hash split separates planted
near-dup pairs across train/test, the cluster split never does, and
the audit report sees exactly that difference.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import dedup as dd
from australia_company_etl_pipeline_spark.operators import splits as sp

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _py_split(cluster_id: int, seed: int = 42) -> str:
    joined = f"{cluster_id}\x1f{seed}"
    b = int(hashlib.md5(joined.encode()).hexdigest()[:8], 16) % 1_000_000
    if b < 800_000:
        return "train"
    if b < 900_000:
        return "val"
    return "test"


@pytest.fixture(scope="module")
def corpus(spark):
    """60 originals + a near-copy of each multiple of 3 (one word
    appended — trigram jaccard >= 0.8 for these long sentences)."""
    base = [(i, f"document number {i} talks about topic {i % 7} in "
                f"considerable detail across several sentences here")
            for i in range(60)]
    near = [(1000 + i, t + " extra") for i, t in base if i % 3 == 0]
    return spark.createDataFrame(base + near, "doc_id long, text string")


@pytest.fixture(scope="module")
def clusters(corpus):
    return dd.dedup_clusters(corpus, "text", "doc_id", threshold=0.8,
                             method="prefix")


def test_split_expr_portable_matches_python_twin(spark):
    df = spark.range(500).select(F.col("id").alias("c"))
    got = {r.c: r.s for r in df.select(
        "c", sp.split_expr(F.col("c"), SPLITS, seed=42,
                           hash_fn="md5").alias("s")).collect()}
    for c, s in got.items():
        assert s == _py_split(c)
    # all three splits materialize at plausible rates
    from collections import Counter
    rates = Counter(got.values())
    assert rates["train"] > 300 and rates["val"] > 20 and rates["test"] > 20


def test_split_fractions_validated(spark):
    with pytest.raises(ValueError, match="sum"):
        sp.split_expr(F.lit(1), {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="negative"):
        sp.split_expr(F.lit(1), {"a": 1.5, "b": -0.5})


def test_cluster_members_share_split(corpus, clusters):
    out = sp.leakage_safe_split(corpus, clusters, SPLITS, hash_fn="md5")
    joined = out.join(clusters.select("doc_id", "cluster_id"), "doc_id")
    n_bad = (joined.groupBy("cluster_id")
             .agg(F.countDistinct("split").alias("n"))
             .filter(F.col("n") > 1).count())
    assert n_bad == 0


def test_missing_cluster_rows_fall_back_to_singleton(spark, corpus,
                                                     clusters):
    some = clusters.filter(F.col("doc_id") < 30)
    out = sp.leakage_safe_split(corpus, some, SPLITS, hash_fn="md5")
    assert out.count() == corpus.count()          # nothing dropped
    rows = {r.doc_id: r.split for r in out.collect()}
    for i in range(31, 60, 3):                    # unlisted, not near-dup'd
        if i % 3 != 0:
            assert rows[i] == _py_split(i)        # own id is the cluster


def test_dochash_split_leaks_cluster_split_does_not(spark, corpus,
                                                    clusters):
    """The demonstration: hash DOC ids and some near-dup pair straddles
    train/non-train; hash CLUSTER ids and none does — and the
    containment audit reports exactly that."""
    naive = corpus.withColumn(
        "split", sp.split_expr(F.col("doc_id"), SPLITS, hash_fn="md5"))
    safe = sp.leakage_safe_split(corpus, clusters, SPLITS, hash_fn="md5")

    def pair_straddles(df):
        a = df.filter(F.col("doc_id") < 1000).select(
            F.col("doc_id").alias("o"), F.col("split").alias("so"))
        b = df.filter(F.col("doc_id") >= 1000).select(
            (F.col("doc_id") - 1000).alias("o"),
            F.col("split").alias("sb"))
        return (a.join(b, "o")
                .filter((F.col("so") == "train")
                        != (F.col("sb") == "train"))
                .count())
    assert pair_straddles(safe) == 0
    assert pair_straddles(naive) > 0

    naive_rep = sp.split_leakage_report(naive, "text", "doc_id",
                                        threshold=0.8)
    safe_rep = sp.split_leakage_report(safe, "text", "doc_id",
                                       threshold=0.8)
    assert sum(r.n_leaky for r in naive_rep.collect()) > 0
    assert sum(r.n_leaky for r in safe_rep.collect()) == 0


def test_leakage_report_shape(spark, corpus, clusters):
    safe = sp.leakage_safe_split(corpus, clusters, SPLITS, hash_fn="md5")
    rep = {r.split: r for r in sp.split_leakage_report(
        safe, "text", "doc_id").collect()}
    assert set(rep) <= {"val", "test"}
    for r in rep.values():
        assert r.n_docs > 0 and r.leak_ratio == 0.0
