"""Link-graph PageRank (operators/graph.py, r7).

Pinned against a from-scratch python power iteration on the same
graph (same damping, same dangling redistribution, same iteration
count) — exact to fp tolerance, not direction-of-effect.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import graph

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("d", "c"),            # d has in-degree 0
         ("c", "e")]            # e is dangling (no outlinks)


def _py_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / out[s]
        dang = sum(r for v, r in rank.items() if v not in out)
        rank = {v: (1 - damping) / n + damping * (contrib[v] + dang / n)
                for v in nodes}
    return rank


@pytest.fixture(scope="module")
def ranks(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    return {r.node: r.rank
            for r in graph.pagerank(e, max_iter=10).collect()}


def test_matches_python_power_iteration(ranks):
    want = _py_pagerank(EDGES)
    assert set(ranks) == set(want)
    for v, r in want.items():
        assert ranks[v] == pytest.approx(r, abs=1e-9)


def test_ranks_sum_to_one(ranks):
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_authority_ordering(ranks):
    # c receives from a, b, d -> the most authoritative; d receives
    # nothing -> the least
    assert ranks["c"] == max(ranks.values())
    assert ranks["d"] == min(ranks.values())


def test_dupes_and_self_loops_collapse(spark):
    e = spark.createDataFrame(EDGES + [("a", "b"), ("a", "a")],
                              "src string, dst string")
    got = {r.node: r.rank for r in graph.pagerank(e, max_iter=10).collect()}
    want = _py_pagerank(EDGES)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-9)


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert graph.pagerank(e).count() == 0


def test_host_graph_extraction(spark):
    docs = spark.createDataFrame(
        [("https://www.blog.site-a.com/post",
          "see https://site-b.org/x and http://www.site-b.org/y plus "
          "https://blog.site-a.com/self ok"),
         ("https://site-b.org/", "no links here")],
        "url string, text string")
    edges = {(r.src, r.dst)
             for r in graph.host_graph(docs, "url", "text").collect()}
    # both site-b links collapse to one registrable domain; the
    # self-host link drops
    assert edges == {("site-a.com", "site-b.org")}


def test_host_graph_quarantines_unknown_hosts(spark):
    """ADVICE r7: registrable_domain returns '' (never NULL) for
    host-less/unparseable URLs — '' rows must be dropped, not collapsed
    into a pseudo-host that absorbs PageRank mass."""
    docs = spark.createDataFrame(
        [("", "see https://site-b.org/x"),                 # host-less page
         ("https://site-a.com/p", "see http:///nohost ok"),  # bad outlink
         ("https://site-a.com/q", "see https://site-b.org/y")],
        "url string, text string")
    edges = {(r.src, r.dst)
             for r in graph.host_graph(docs, "url", "text").collect()}
    assert edges == {("site-a.com", "site-b.org")}
    assert not any(s == "" or d == "" for s, d in edges)


def test_host_graph_host_granularity(spark):
    """granularity='host' keeps full hostnames so subdomains of one
    registrable domain are distinct nodes (what authority-weighted
    shaping needs); 'domain' (default) collapses them."""
    docs = spark.createDataFrame(
        [("https://blog.example.com/a", "see https://docs.example.com/x"),
         ("https://spam.example.com/b", "see https://blog.example.com/a")],
        "url string, text string")
    host_edges = {(r.src, r.dst) for r in
                  graph.host_graph(docs, "url", "text",
                                   granularity="host").collect()}
    assert host_edges == {("blog.example.com", "docs.example.com"),
                          ("spam.example.com", "blog.example.com")}
    # domain view: all three hosts are example.com → only self-loops,
    # which drop
    assert graph.host_graph(docs, "url", "text").count() == 0
    import pytest
    with pytest.raises(ValueError, match="granularity"):
        graph.host_graph(docs, "url", "text", granularity="page")


def test_domain_cap_authority_keeps_best_ranked_hosts(spark):
    """The closed loop: host-granularity PageRank feeds
    domain_cap(authority=...) — under the cap, the registrable domain
    keeps its highest-authority subdomains' docs, not a hash-random
    sample; unknown hosts rank last."""
    from australia_company_etl_pipeline_spark.operators import urls as U

    # link graph: many hosts endorse blog.example.com; spam endorses
    # nothing and nobody endorses it
    pages = spark.createDataFrame(
        [(f"https://ref{i}.org/p", "see https://blog.example.com/x")
         for i in range(5)]
        + [("https://blog.example.com/x", "see https://docs.example.com/y")],
        "url string, text string")
    ranks = graph.pagerank(
        graph.host_graph(pages, "url", "text", granularity="host"))
    rank_map = {r.node: r["rank"] for r in ranks.collect()}
    assert rank_map["blog.example.com"] == max(rank_map.values())

    # corpus: one registrable domain, 6 docs on the high-authority
    # host, 6 on spam (unranked), cap n=6
    docs = spark.createDataFrame(
        [(i, f"https://blog.example.com/p{i}") for i in range(6)]
        + [(100 + i, f"https://spam.example.com/p{i}") for i in range(6)],
        "doc_id long, url string")
    kept = {r.doc_id for r in
            U.domain_cap(docs, "url", 6, authority=ranks).collect()}
    assert kept == set(range(6))  # every survivor is a blog doc
    import pytest
    with pytest.raises(ValueError, match="not both"):
        U.domain_cap(docs, "url", 6, order_col="doc_id",
                     authority=ranks)
