"""Contrastive pair mining (operators/pairs.py, r7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import dedup as dd
from australia_company_etl_pipeline_spark.operators import pairs as pr


@pytest.fixture(scope="module")
def corpus(spark):
    base = [(i, f"document number {i} discusses subject {i % 9} at "
                f"length with several distinctive sentences included")
            for i in range(80)]
    near = [(2000 + i, t + " appended") for i, t in base if i % 4 == 0]
    return spark.createDataFrame(base + near, "doc_id long, text string")


@pytest.fixture(scope="module")
def clusters(corpus):
    return dd.dedup_clusters(corpus, "text", "doc_id", threshold=0.8,
                             method="prefix")


def test_triples_structure(spark, corpus, clusters):
    got = pr.mine_contrastive_pairs(clusters, corpus).collect()
    assert got, "no triples mined"
    members = {r.doc_id: (r.cluster_id, r.is_canonical)
               for r in clusters.collect()}
    for r in got:
        # positive shares the anchor's cluster and is its canonical
        assert members[r.anchor_id][0] == members[r.positive_id][0]
        assert members[r.positive_id][1] is True
        assert r.anchor_id != r.positive_id
        # negative comes from a DIFFERENT cluster
        assert members[r.negative_id][0] != members[r.anchor_id][0]
        # texts joined for all three roles
        assert r.anchor_text and r.positive_text and r.negative_text


def test_one_row_per_non_canonical_member(spark, corpus, clusters):
    got = pr.mine_contrastive_pairs(clusters, corpus, text_col=None)
    n_members = clusters.filter(~F.col("is_canonical")).count()
    # collisions (anchor's bucket rep in its own cluster) may drop a
    # few rows but never duplicate one
    assert n_members >= got.count() >= n_members - 3
    assert got.select("anchor_id").distinct().count() == got.count()


def test_deterministic(spark, corpus, clusters):
    a = pr.mine_contrastive_pairs(clusters, corpus, text_col=None)
    b = pr.mine_contrastive_pairs(clusters, corpus, text_col=None)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


def test_no_cartesian_in_plan(spark, corpus, clusters):
    plan = (pr.mine_contrastive_pairs(clusters, corpus, text_col=None)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hard_negatives_exclude_cluster_members(spark, corpus, clusters):
    """Hard negatives are embedding neighbors OUTSIDE the anchor's
    cluster — its near-dup twin, the nearest vector of all, must never
    appear; unrelated docs must."""
    import math

    from australia_company_etl_pipeline_spark.operators import embed

    triples = pr.mine_contrastive_pairs(clusters, corpus, text_col=None)
    emb = embed.embed_documents(corpus, "text", out_col="embedding",
                                dim=64).select("doc_id", "embedding")
    hard = pr.hard_negatives(triples, emb, clusters, k=3).collect()
    assert hard, "no hard negatives mined"
    members = {r.doc_id: r.cluster_id for r in clusters.collect()}
    per_anchor = {}
    for r in hard:
        assert members[r.negative_id] != members[r.anchor_id]
        assert r.negative_id != r.anchor_id
        per_anchor.setdefault(r.anchor_id, []).append(r.rank)
    for ranks in per_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
