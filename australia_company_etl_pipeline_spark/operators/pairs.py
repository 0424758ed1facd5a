"""Contrastive training-pair mining from near-dup clusters.

Embedding models (the ones that later power SemDeDup / semantic
decontamination / ANN here) train on (anchor, positive, negative)
triples — and a deduplicated corpus already CONTAINS the supervision:
near-dup cluster members are natural paraphrase positives (same
content, different surface — exactly what MinHash verified), while
anything outside the cluster is a negative. This operator turns
``dedup_clusters`` output into that training set, so the pipeline that
cleans a corpus also mines its own contrastive data (the SimCSE/E5
weak-supervision recipe, minus the web-pair scraping).

Shape (skew-safe by construction):

- positives: each non-canonical member pairs with its cluster's
  CANONICAL doc — one row per member via an equi-join on cluster_id,
  O(members), never the Σ|cluster|² all-pairs blowup (a boilerplate
  mega-cluster contributes |c| rows, not |c|²);
- negatives: each anchor hash-routes to one of ``n_buckets``
  representative docs (min id per xxhash64 bucket — ONE partial-agg
  pass, broadcastable pool), rejecting same-cluster collisions. A
  deterministic pseudo-random partner with no shuffle of the corpus
  and no RNG (reruns and retries mine identical triples).

The bucket-representative negatives are "easy" negatives;
``hard_negatives`` layers the informative kind on top — each anchor's
top-k EMBEDDING neighbors that are not cluster members (the
look-alike non-matches contrastive training actually learns from).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_contrastive_pairs(clusters: DataFrame, docs: DataFrame,
                           id_col: str = "doc_id",
                           text_col: str | None = "text",
                           n_buckets: int = 1024,
                           seed: int = 42) -> DataFrame:
    """→ ``(anchor_id, positive_id, negative_id[, anchor_text,
    positive_text, negative_text])``.

    ``clusters`` is ``dedup_clusters`` output (``id_col, cluster_id,
    is_canonical``); only multi-member clusters yield rows (a
    singleton has no positive). ``text_col=None`` skips the text
    joins and returns ids only. Anchors whose negative bucket
    collides with their own cluster are dropped (rare — 1/n_buckets —
    and a biased replacement would be worse than a missing row).
    """
    cl = clusters.select(F.col(id_col), "cluster_id", "is_canonical")
    canon = (cl.filter("is_canonical")
             .select("cluster_id", F.col(id_col).alias("positive_id")))
    anchors = (cl.filter(~F.col("is_canonical"))
               .select(F.col(id_col).alias("anchor_id"), "cluster_id")
               .join(canon, "cluster_id"))

    # negative pool: one representative per OCCUPIED hash bucket,
    # densely re-numbered 0..P-1 so every anchor routes to a real row
    # (sparse bucket ids would silently drop most anchors on a corpus
    # smaller than n_buckets). The window and the count both run on
    # the ≤ n_buckets-row pool — the count is an EAGER bounded action
    # at build time (the mixture_sample discipline), never the corpus.
    from pyspark.sql.window import Window

    pool = (cl.groupBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                              F.lit(n_buckets)).alias("__nb"))
            .agg(F.min(F.struct(F.col(id_col).alias("negative_id"),
                                F.col("cluster_id").alias("__ncl")))
                 .alias("__rep"))
            .select("__nb", "__rep.negative_id", "__rep.__ncl")
            .withColumn("__ri",
                        F.row_number().over(Window.orderBy("__nb")) - 1))
    n_pool = pool.count()
    triples = (anchors
               .withColumn("__ri",
                           F.pmod(F.xxhash64(F.col("anchor_id"),
                                             F.lit(seed + 1)),
                                  F.lit(n_pool)))
               .join(F.broadcast(pool), "__ri")
               .filter(F.col("__ncl") != F.col("cluster_id"))
               .select("anchor_id", "positive_id", "negative_id"))
    if text_col is None:
        return triples
    t = docs.select(F.col(id_col), F.col(text_col))
    for role in ("anchor", "positive", "negative"):
        triples = triples.join(
            t.select(F.col(id_col).alias(f"{role}_id"),
                     F.col(text_col).alias(f"{role}_text")),
            f"{role}_id")
    return triples


def hard_negatives(triples: DataFrame, embeddings: DataFrame,
                   clusters: DataFrame, k: int = 3,
                   n_planes: int = 8, dim: int = 64, seed: int = 42,
                   id_col: str = "doc_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Upgrade a mined triple set with HARD negatives: for each anchor,
    the top-``k`` embedding-space neighbors that are NOT in its
    near-dup cluster → ``(anchor_id, negative_id, cosine_sim, rank)``.

    Easy (random-bucket) negatives saturate contrastive training
    quickly; the informative negatives are the look-alike non-matches
    — exactly what ANN + the cluster frame can separate. Shape: the
    LSH top-k kernel (``ann.lsh_topk`` — corpus bucketed once, anchors
    explode multiprobe buckets) with same-cluster candidates
    anti-joined out BEFORE the rank window, so a cluster member can
    never rank as its own negative. O(anchors × probe buckets), never
    a cross join."""
    from .ann import lsh_topk

    anchors = (triples.select("anchor_id").distinct()
               .join(embeddings.select(F.col(id_col).alias("anchor_id"),
                                       F.col(vec_col)), "anchor_id")
               .select(F.col("anchor_id").alias("query_id"),
                       F.col(vec_col).alias("query_vec")))
    cl = clusters.select(F.col(id_col), F.col("cluster_id"))
    # neighbors (k + headroom), then strike same-cluster pairs and
    # re-rank to exactly k
    from pyspark.sql.window import Window

    raw = lsh_topk(embeddings, anchors, k=k + 8, n_planes=n_planes,
                   dim=dim, seed=seed, multiprobe=2, id_col=id_col,
                   vec_col=vec_col)
    joined = (raw
              .join(cl.select(F.col(id_col).alias("query_id"),
                              F.col("cluster_id").alias("__acl")),
                    "query_id", "left")
              .join(cl.select(F.col(id_col),
                              F.col("cluster_id").alias("__ncl")),
                    id_col, "left")
              .filter((F.col("query_id") != F.col(id_col))
                      & (F.col("__acl").isNull()
                         | F.col("__ncl").isNull()
                         | (F.col("__acl") != F.col("__ncl")))))
    win = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id"))
    return (joined
            .select(F.col("query_id").alias("anchor_id"),
                    F.col(id_col).alias("negative_id"), "cosine_sim")
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k))
