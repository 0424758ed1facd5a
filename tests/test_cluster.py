"""Corpus clustering + c-TF-IDF topics (operators/cluster.py, r7)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import cluster as cl


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_ctfidf_hand_oracle(spark):
    """Every score replayed from scratch in python (same formula,
    same rounding)."""
    rows = [
        (0, "a", "cat cat dog"),
        (1, "a", "cat fish"),
        (2, "b", "dog dog dog bird"),
        (3, "b", "bird bird"),
    ]
    got = {(r[0], r.term): (r.tf, r.score, r.rank)
           for r in cl.ctfidf_terms(_docs(spark, rows), "lang",
                                    top_k=10, min_count=1).collect()}

    tf = {}
    for _, lang, text in rows:
        for t in text.split():
            tf[(lang, t)] = tf.get((lang, t), 0) + 1
    wc = {}
    ft = {}
    for (lang, t), n in tf.items():
        wc[lang] = wc.get(lang, 0) + n
        ft[t] = ft.get(t, 0) + n
    A = sum(wc.values()) / len(wc)
    exp = {k: round((n / wc[k[0]]) * math.log(1.0 + A / ft[k[1]]), 6)
           for k, n in tf.items()}
    for (lang, t), (n, score, _) in got.items():
        assert tf[(lang, t)] == n
        assert score == exp[(lang, t)], (lang, t)
    # ranks: descending score, term-ascending ties, dense 1..n per class
    for lang in ("a", "b"):
        ranked = sorted(((v[2], k[1]) for k, v in got.items()
                         if k[0] == lang))
        assert [r for r, _ in ranked] == list(range(1, len(ranked) + 1))
        scores = [got[(lang, t)][1] for _, t in ranked]
        assert scores == sorted(scores, reverse=True)


def test_ctfidf_min_count_null_class_topk(spark):
    rows = [(0, "a", "x x y"), (1, None, "z z z"), (2, "b", "w w")]
    out = cl.ctfidf_terms(_docs(spark, rows), "lang",
                          top_k=1, min_count=2).collect()
    langs = {r[0] for r in out}
    assert langs == {"a", "b"}          # NULL class excluded
    terms = {r.term for r in out}
    assert "y" not in terms             # hapax pruned by min_count
    assert all(r.rank == 1 for r in out)  # top_k=1


def _planted(spark):
    """Two well-separated concept groups in 4-d embedding space with
    disjoint vocabularies."""
    import itertools
    docs, vecs = [], []
    for i in range(6):
        docs.append((i, "en", "quantum physics electron " + f"filler{i}"))
        vecs.append((i, [1.0, 0.1 * (i % 3), 0.0, 0.0]))
    for i in range(6, 12):
        docs.append((i, "en", "recipe butter flour " + f"filler{i}"))
        vecs.append((i, [0.0, 0.0, 1.0, 0.1 * (i % 3)]))
    d = _docs(spark, docs)
    e = spark.createDataFrame(vecs, "doc_id long, embedding array<float>")
    return d, e


def test_cluster_topics_planted_concepts(spark):
    d, e = _planted(spark)
    terms, summary = cl.cluster_topics(d, e, n_clusters=2,
                                       top_k=3, min_count=2)
    tt = terms.collect()
    by_cluster = {}
    for r in tt:
        by_cluster.setdefault(r.cluster_id, set()).add(r.term)
    assert len(by_cluster) == 2
    vocabs = sorted(frozenset(v) for v in by_cluster.values())
    # each cluster's top terms come from ITS concept vocabulary
    assert any({"quantum", "physics", "electron"} == v for v in vocabs)
    assert any({"recipe", "butter", "flour"} == v for v in vocabs)
    srows = summary.collect()
    assert sorted(r.n_docs for r in srows) == [6, 6]
    # each representative belongs to its cluster's id range
    for r in srows:
        members = ({0, 1, 2, 3, 4, 5} if r.rep_id < 6
                   else {6, 7, 8, 9, 10, 11})
        assert r.rep_id in members
        assert 0.0 < r.rep_sim <= 1.0 + 1e-9


def test_cluster_topics_reuses_given_centroids(spark):
    """Passing centroids (e.g. a persisted IVF index's) skips training
    and yields the same topics as training in-line with the same k."""
    from australia_company_etl_pipeline_spark.operators import ann

    d, e = _planted(spark)
    cents = ann.kmeans_centroids(e, 2, id_col="doc_id",
                                 vec_col="embedding")
    t1, s1 = cl.cluster_topics(d, e, n_clusters=2, centroids=cents,
                               top_k=3, min_count=2)
    t2, s2 = cl.cluster_topics(d, e, n_clusters=2, top_k=3, min_count=2)
    key = lambda r: (r.cluster_id, r.rank, r.term)
    assert sorted(map(key, t1.collect())) == sorted(map(key, t2.collect()))
    assert (sorted((r.cluster_id, r.n_docs, r.rep_id)
                   for r in s1.collect())
            == sorted((r.cluster_id, r.n_docs, r.rep_id)
                      for r in s2.collect()))


def test_ctfidf_totals_reuse_the_term_exchange(spark):
    """The class/term totals derive from the (class, term) aggregate:
    physically, its exchange is computed ONCE and the per-class,
    per-term and corpus-average reductions read it as ReusedExchange —
    the corpus is tokenized/shuffled once, not once per total."""
    rows = [(i, "a" if i % 2 else "b", f"w{i % 5} common") for i in range(20)]
    q = cl.ctfidf_terms(_docs(spark, rows), "lang")
    q.collect()  # executedPlan reflects reuse only after execution
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 3, plan
