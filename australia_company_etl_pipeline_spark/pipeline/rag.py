"""RAG corpus preparation and retrieval — the end-to-end composition of
this package's already-oracled kernels, packaged the way a
retrieval-augmented-generation stack consumes them:

``rag_prepare``: documents → sliding-window chunks
(``textstats.chunk_documents``) → hashed embeddings
(``embed.embed_documents``) → a persisted IVF index
(``ann.build_ivf_index``) plus a chunk store, under ONE index root.
``rag_search``: a query string → embedded through the SAME feature
hasher → partition-pruned IVF probe (``ann.ivf_index_topk``) → chunk
texts back; optionally fused with a BM25 term ranking over the chunk
store by reciprocal rank (``retrieval.rrf_fuse``) — the classic hybrid
(dense recall + lexical precision) every production RAG stack runs.

Everything here is composition — each kernel is individually
driver-oracled (`pack_docs` kind='chunk', `embedding_dup_pairs`
method='hashed', `ann_approx_topk` method='ivf', `doc_search_bm25`
kinds 'search'/'rrf'), so these functions add orchestration and the
on-disk contract, not new math. Composition is pytest-gated
(tests/test_rag.py).

Index root layout (all swaps atomic via ``session.replace_dir``):

- ``<root>/chunks``  — ``(chunk_uid, doc id, chunk_idx, chunk_text,
  n_chunk_tokens)`` parquet: the answer-time payload store;
- ``<root>/ivf``     — the ``build_ivf_index`` layout (centroids +
  centroid-partitioned inverted lists);
- ``<root>/postings``/``<root>/stats`` — the chunk store's BM25 term
  postings (``retrieval.term_postings``) and one-row (N, avgdl): the
  LEXICAL index artifact (r9), so the hybrid path never re-tokenizes
  the chunk store at query time;
- ``<root>/meta``    — one row pinning (dim, seed, hash_fn,
  chunk_tokens, overlap): a query embedded under different hashing
  than the index is garbage-in, so ``rag_search`` reads the stored
  params instead of trusting the caller to repeat them. Written LAST —
  the build-if-missing pattern keys on it, so a crashed build (no
  meta) rebuilds rather than serving a partial root.

Scale shape: chunking and embedding are shuffle-free projections; the
index build is one k-means + one assignment shuffle + one partitioned
write + one postings aggregate; a search is a partition-pruned probe
over ``n_probe`` inverted lists plus a term-filtered postings read,
plus one join back to the chunk store (candidate ids only — never a
chunk-store scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ann
from ..operators import retrieval as rt
from ..operators.embed import embed_documents
from ..operators.textstats import chunk_documents

__all__ = ["rag_prepare", "rag_search"]


def rag_prepare(docs: DataFrame, text_col: str, id_col: str, path: str,
                chunk_tokens: int = 64, overlap: int = 16,
                dim: int = 64, seed: int = 42, hash_fn: str = "native",
                n_centroids: int = 16, kmeans_iter: int = 5) -> None:
    """Build the RAG index root at ``path`` (see module docstring for
    the layout). Rebuild-safe: each table lands via an atomic swap, the
    ivf index last — a crash mid-build leaves the previous generation
    (or nothing) readable, never a chunk store paired with a stale
    index whose ids it doesn't cover... the reverse pairing (new
    chunks, old index briefly) cannot serve wrong text because probes
    join candidates back to the store by chunk_uid.

    Rebuild over an EXISTING root deletes ``meta`` FIRST (r10): the
    build-if-missing pattern keys on meta's presence, so a crash
    mid-rebuild must read as "missing" on restart — old meta presiding
    over mixed-generation tables (new chunks + old ivf/postings) would
    otherwise never self-heal. meta is rewritten LAST, closing the
    window from both ends."""
    import os

    from ..session import replace_dir

    spark = docs.sparkSession
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    mpath = hpath(f"{path}/meta")
    if fs.exists(mpath):
        fs.delete(mpath, True)
    chunks = chunk_documents(docs, text_col, id_col,
                             chunk_tokens=chunk_tokens, overlap=overlap)
    # chunk_uid: string key '<doc id>:<chunk_idx>' — collision-free for
    # any id type, deterministic, and a stable tie-break for rankers
    chunks = chunks.withColumn(
        "chunk_uid", F.concat_ws(":", F.col(id_col).cast("string"),
                                 F.col("chunk_idx").cast("string")))
    tmp = f"{path}/chunks.__build_tmp.{os.getpid()}"
    chunks.write.mode("overwrite").parquet(tmp)
    replace_dir(spark, tmp, f"{path}/chunks")

    emb = (embed_documents(chunks, "chunk_text", out_col="embedding",
                           dim=dim, seed=seed, hash_fn=hash_fn)
           .select(F.col("chunk_uid").alias("vec_id"), "embedding"))
    ann.build_ivf_index(emb, f"{path}/ivf", n_centroids=n_centroids,
                        kmeans_iter=kmeans_iter, seed=seed)

    # lexical artifact: postings + stats over the LANDED chunk store
    # (read back, so the persisted lexical index is derived from
    # exactly the bytes the payload joins will serve)
    landed = spark.read.parquet(f"{path}/chunks")
    ptmp = f"{path}/postings.__build_tmp.{os.getpid()}"
    (rt.term_postings(landed, "chunk_text", "chunk_uid")
     .write.mode("overwrite").parquet(ptmp))
    replace_dir(spark, ptmp, f"{path}/postings")
    stmp = f"{path}/stats.__build_tmp.{os.getpid()}"
    (rt.corpus_stats(landed, "chunk_text")
     .coalesce(1).write.mode("overwrite").parquet(stmp))
    replace_dir(spark, stmp, f"{path}/stats")

    meta = spark.createDataFrame(
        [(dim, seed, hash_fn, chunk_tokens, overlap)],
        "dim int, seed int, hash_fn string, chunk_tokens int, "
        "overlap int")
    mtmp = f"{path}/meta.__build_tmp.{os.getpid()}"
    meta.coalesce(1).write.mode("overwrite").parquet(mtmp)
    replace_dir(spark, mtmp, f"{path}/meta")


def rag_search(spark: SparkSession, path: str, query: str, k: int = 5,
               n_probe: int = 4, hybrid: bool = False,
               rrf_k: int = 60) -> DataFrame:
    """Top-``k`` chunks for ``query`` from a ``rag_prepare`` root →
    ``(rank, score, chunk_uid, chunk_idx, chunk_text)``.

    Dense path: the query embeds through the hasher params pinned in
    ``<root>/meta`` (never caller-supplied — a mismatched hasher is
    silent garbage), probes the IVF index partition-pruned, and joins
    the k candidate ids back to the chunk store. ``hybrid=True``
    additionally ranks the query's terms against the PERSISTED
    ``<root>/postings``/``<root>/stats`` lexical index and fuses both
    lists with reciprocal rank (``rrf_fuse``) — rank position is all
    that crosses, so the cosine and BM25 scales never need
    calibration; ``score`` is then the RRF score.

    Both halves answer from persisted artifacts ONLY (r9 — the
    pre-r9 form re-tokenized the chunk store per call, an accidental
    corpus scan per query): the dense list from the partition-pruned
    IVF layout, the lexical list from the postings table with the
    query-term IN-filter pushed to the scan. Per-query cost scales
    with the probed lists + matching postings, never the store."""
    from ..catalog import read_meta_rows, read_parquet

    if not query or not query.strip():
        raise ValueError("rag_search needs a non-empty query string")
    m = read_meta_rows(spark, f"{path}/meta")[0]
    qdf = spark.createDataFrame([(0, query)], "query_id long, t string")
    qv = (embed_documents(qdf, "t", out_col="query_vec", dim=m.dim,
                          seed=m.seed, hash_fn=m.hash_fn)
          .select("query_id", "query_vec"))
    # the index dim is pinned in meta — pass it through so the probe
    # skips its centroid-sample job (r11)
    dense = ann.ivf_index_topk(spark, f"{path}/ivf", qv,
                               k=k if not hybrid else max(k, 10),
                               n_probe=n_probe, expected_dim=m.dim)
    chunks = read_parquet(spark, f"{path}/chunks")
    if not hybrid:
        hits = dense.select(F.col("vec_id").alias("chunk_uid"),
                            F.col("cosine_sim").alias("score"), "rank")
    else:
        # normalize query terms with the SAME tokenizer the postings
        # were built with (textstats.tokens: lowercase + whitespace
        # split), deduped — raw query.split() would silently zero-match
        # any uppercase/punctuated query against the lowercased index
        # while the dense half normalizes inside embed_documents
        q_terms = sorted(set(query.lower().split()))
        bm = rt.bm25_search_from_postings(
            read_parquet(spark, f"{path}/postings"),
            read_parquet(spark, f"{path}/stats"),
            "chunk_uid", q_terms, top_n=max(k, 10))
        fused = rt.rrf_fuse(
            [dense.select(F.col("vec_id").alias("chunk_uid"), "rank"),
             bm.select("chunk_uid", "rank")],
            "chunk_uid", k=rrf_k)
        hits = (fused.filter(F.col("rank") <= k)
                .select("chunk_uid", F.col("rrf_score").alias("score"),
                        "rank"))
    return (hits.join(chunks, "chunk_uid")
            .select("rank", "score", "chunk_uid", "chunk_idx",
                    "chunk_text")
            .orderBy("rank"))
