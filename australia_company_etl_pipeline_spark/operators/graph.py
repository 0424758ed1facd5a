"""Link-graph ranking for crawl prioritization (distributed PageRank).

A crawl pipeline doesn't just clean pages — it decides WHICH hosts to
fetch next, and the standard signal is link authority over the host
graph (Page et al. 1999; Cho et al.'s crawl-ordering study made it the
frontier-priority baseline). The graph is already in this engine's
hands: ``urls.extract_urls`` pulls outlinks from page text and
``urls.registrable_domain`` collapses them to hosts — this module
ranks the resulting edges so ``domain_cap`` / frontier scheduling can
weight by authority instead of treating every host equally.

Spark shape (the textbook distributed power iteration, with this
package's disciplines):

- edges dedup to ``(src, dst)`` once; out-degrees are ONE partial-agg
  pass, joined into a contribution frame persisted across rounds;
- each round is contribution-scatter (equi-join rank→edges) + ONE
  partial-aggregated sum per dst + the teleport/damping projection —
  shuffle-bound, no windows, no collect;
- dangling nodes (no outlinks) redistribute their mass uniformly via
  a one-row aggregate (the standard correction — dropping it leaks
  rank mass and the vector stops summing to 1);
- every round ``materialize``s (lineage truncation — the
  connected-components/k-means loop discipline).

Ranks sum to 1 (pinned); convergence is iteration-capped like
``kmeans_centroids`` rather than delta-tested — a fixed budget is
reproducible and the caller can read the residual from two runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, max_iter: int = 10) -> DataFrame:
    """→ ``(node, rank)`` over the directed edge list, ranks summing
    to 1. Nodes appearing only as destinations still rank (they just
    never scatter); self-loops and duplicate edges collapse first."""
    from ..session import materialize

    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                 & (F.col("src") != F.col("dst")))
         .distinct())
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node"))).distinct())
    n = nodes.count()  # scalar, once — the teleport term needs it
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # edges with the source's out-degree, persisted once for the loop
    ed = materialize(e.join(deg, "src"))
    # the SET of dangling nodes (no outlinks) is loop-invariant —
    # compute the anti-join once; each round only sums the current
    # ranks over it (semi join against a materialized, usually tiny
    # set) instead of re-deriving the set with a fresh anti-join
    dangling = materialize(
        nodes.join(deg.select(F.col("src").alias("node")),
                   "node", "left_anti"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        contrib = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("__deg"))
                           .alias("__c"))
                   .groupBy("node")
                   .agg(F.sum("__c").alias("__in")))
        # dangling mass: rank held by nodes with no outlinks this
        # round, folded in as a broadcast 1-row frame — the round stays
        # ONE job (the materialize), no per-round driver action
        dang = (ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__d")))
        ranks = materialize(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select("node",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping)
                     * (F.coalesce("__in", F.lit(0.0))
                        + F.col("__d") / n)).alias("rank")))
    return ranks


def host_graph(docs: DataFrame, url_col: str, text_col: str,
               granularity: str = "domain") -> DataFrame:
    """Page rows → host edge list ``(src, dst)``: the page's own host
    links to every host in its outlinks. One projection + explode;
    feed to ``pagerank``.

    ``granularity='domain'`` (default) collapses to registrable
    domains — the crawl-frontier view. ``'host'`` keeps full hostnames
    (``urls.host_key``), which is the granularity authority-weighted
    domain shaping needs: under ``domain_cap(authority=...)`` the cap
    key is the registrable domain while the rank must discriminate its
    SUBDOMAINS (blog.example.com vs spam.example.com), so a
    domain-level rank would be constant within every cap group."""
    from . import urls

    if granularity == "domain":
        key = urls.registrable_domain
    elif granularity == "host":
        key = urls.host_key
    else:
        raise ValueError(
            f"granularity must be 'domain' or 'host', got {granularity!r}")
    # the key functions return '' (never NULL) for host-less or
    # unparseable URLs — '' means "unknown, quarantine" per the urls
    # module contract, so it must not become a pseudo-host that absorbs
    # and scatters PageRank mass (every bad URL would collapse into one
    # mega-node). Filter on != '' — an isNotNull guard alone is dead
    # code against these columns.
    return (docs.select(
        key(url_col).alias("src"),
        F.explode(urls.extract_urls(F.col(text_col))).alias("__u"))
        .select("src", key("__u").alias("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != "")
                & (F.col("src") != F.col("dst"))))
