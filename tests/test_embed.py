"""Feature-hashing text embeddings: determinism, unit norm, lexical
cosine behavior, and end-to-end flow into the ANN/semdedup consumers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import ann, embed


def _emb(spark, texts, dim=32):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    return embed.embed_documents(df, "text", dim=dim)


def test_embedding_shape_norm_and_determinism(spark):
    rows = _emb(spark, ["the quick brown fox", "the quick brown fox",
                        "completely different words here", "", None],
                dim=32).collect()
    by_id = {r.doc_id: r.embedding for r in rows}
    assert all(len(v) == 32 for v in by_id.values() if v is not None)
    # identical text → identical vector (hash determinism)
    assert by_id[0] == by_id[1]
    assert math.isclose(sum(x * x for x in by_id[0]), 1.0, abs_tol=1e-9)
    assert by_id[3] == [0.0] * 32              # empty text → zero vector
    assert by_id[4] is None                    # NULL propagates


def test_cosine_tracks_token_overlap(spark):
    out = _emb(spark, ["alpha beta gamma delta epsilon zeta",
                       "alpha beta gamma delta epsilon eta",   # 5/6 shared
                       "one two three four five six"])         # disjoint
    a, b, c = [r.embedding for r in out.orderBy("doc_id").collect()]

    def cos(u, v):
        return sum(x * y for x, y in zip(u, v))

    assert cos(a, b) > 0.6                     # near-dup territory
    assert abs(cos(a, c)) < 0.4                # disjoint stays far


def test_embeddings_flow_into_ann_and_semdedup(spark):
    """The whole point: a raw TEXT corpus becomes ANN-searchable and
    semantically deduplicatable with zero external models."""
    texts = [f"unique document number {i} about topic{i} stuff{i}"
             for i in range(20)]
    texts += ["shared common duplicated paragraph of text " * 3,
              "shared common duplicated paragraph of text " * 3]
    corpus = _emb(spark, texts, dim=32).select("doc_id", "embedding")
    queries = (corpus.filter(F.col("doc_id") == 20)
               .select(F.col("doc_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    top = ann.brute_force_topk(corpus, queries, k=2,
                               id_col="doc_id").collect()
    assert {r.doc_id for r in top} == {20, 21}  # its copy is rank-2
    assert all(r.cosine_sim == 1.0 for r in top)
    sem = ann.semdedup(corpus, threshold=0.95, n_clusters=4,
                       kmeans_iter=3, id_col="doc_id").collect()
    pair = {r.doc_id: r for r in sem if r.doc_id in (20, 21)}
    assert pair[20].group_id == pair[21].group_id == 20
    assert pair[20].is_canonical != pair[21].is_canonical
    others = [r for r in sem if r.doc_id < 20]
    assert all(r.is_canonical for r in others)


def test_embedding_dim_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        embed.hashed_embedding(F.lit("x"), dim=0)


def test_fnv1a32_pair_matches_two_single_folds(spark):
    from australia_company_etl_pipeline_spark.operators.embed import (
        fnv1a32,
        fnv1a32_pair,
    )

    df = spark.createDataFrame(
        [("hello",), ("",), ("répé 日本",), ("a",),
         ("the quick brown fox",)], "t string")
    rows = df.select(
        fnv1a32(F.col("t"), 101).alias("a1"),
        fnv1a32(F.col("t"), 202).alias("a2"),
        fnv1a32_pair(F.col("t"), 101, 202).alias("p")).collect()
    for r in rows:
        assert r.p.h1 == r.a1 and r.p.h2 == r.a2
