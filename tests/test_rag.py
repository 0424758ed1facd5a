"""RAG recipe composition (pipeline/rag.py): chunk → embed → persisted
IVF index → dense / hybrid search. Each kernel is individually
driver-oracled; these tests pin the COMPOSITION contract — the on-disk
layout, the meta-pinned hasher params, the candidate-join answer path,
and the hybrid fusion."""

from __future__ import annotations

import pytest

from australia_company_etl_pipeline_spark.pipeline import rag


def _docs(spark):
    # one doc carries a globally unique token ('xylophone') in its
    # SECOND chunk, so a correct search must find a specific chunk of a
    # specific doc — not just the right doc
    filler = " ".join(f"word{i}" for i in range(20))
    rows = [
        (1, filler + " " + " ".join(f"alpha{i}" for i in range(20))),
        (2, filler + " xylophone " + " ".join(
            f"beta{i}" for i in range(19))),
        (3, " ".join(f"gamma{i}" for i in range(30))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def rag_root(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ragidx") / "root")
    rag.rag_prepare(_docs(spark), "text", "doc_id", path,
                    chunk_tokens=20, overlap=0, dim=32, seed=11,
                    n_centroids=2, kmeans_iter=3)
    return path


def test_rag_prepare_layout_and_chunk_store(spark, rag_root):
    chunks = spark.read.parquet(f"{rag_root}/chunks")
    uids = {r.chunk_uid for r in chunks.collect()}
    # doc 1 and 2: 40 tokens / 20 → 2 chunks; doc 3: 30 → 2 chunks
    assert uids == {"1:0", "1:1", "2:0", "2:1", "3:0", "3:1"}
    meta = spark.read.parquet(f"{rag_root}/meta").collect()[0]
    assert (meta.dim, meta.seed, meta.chunk_tokens) == (32, 11, 20)
    lists = spark.read.parquet(f"{rag_root}/ivf/lists")
    assert lists.count() == 6                  # every chunk indexed


def test_rag_dense_search_returns_chunks(spark, rag_root):
    got = rag.rag_search(spark, rag_root, "xylophone beta1 beta2",
                         k=3, n_probe=2).collect()
    assert len(got) == 3
    assert [r.rank for r in got] == [1, 2, 3]
    # the unique-token chunk is the top dense hit (hashed embeddings
    # overlap on the query tokens only there)
    assert got[0].chunk_uid == "2:1"
    assert "xylophone" in got[0].chunk_text


def test_rag_hybrid_search_fuses_bm25(spark, rag_root):
    got = rag.rag_search(spark, rag_root, "xylophone", k=2,
                         n_probe=2, hybrid=True).collect()
    # BM25 puts the only chunk containing the term first; fusion keeps
    # it on top regardless of the dense list's opinion
    assert got[0].chunk_uid == "2:1"
    assert got[0].score > 0


def test_rag_search_validates_query(spark, rag_root):
    with pytest.raises(ValueError, match="non-empty"):
        rag.rag_search(spark, rag_root, "   ")


def test_rag_prepare_rebuild_swaps_atomically(spark, tmp_path):
    path = str(tmp_path / "root2")
    docs = _docs(spark)
    rag.rag_prepare(docs, "text", "doc_id", path, chunk_tokens=20,
                    overlap=0, dim=32, seed=11, n_centroids=2)
    first = {r.chunk_uid for r in
             spark.read.parquet(f"{path}/chunks").collect()}
    # rebuild with one doc dropped — the store and index swap whole
    rag.rag_prepare(docs.filter("doc_id < 3"), "text", "doc_id", path,
                    chunk_tokens=20, overlap=0, dim=32, seed=11,
                    n_centroids=2)
    second = {r.chunk_uid for r in
              spark.read.parquet(f"{path}/chunks").collect()}
    assert "3:0" in first and "3:0" not in second
    got = rag.rag_search(spark, path, "xylophone", k=2, n_probe=2)
    assert got.collect()[0].chunk_uid == "2:1"


def test_rag_hybrid_plan_reads_persisted_artifacts_only(spark, rag_root):
    """The hybrid search plan must answer from the persisted root
    ONLY: the lexical list from <root>/postings + <root>/stats, the
    dense list from the IVF layout, payloads from <root>/chunks — and
    it must never re-tokenize the chunk store (the pre-r9 form paid a
    postings rebuild per query: a full store scan at 100 TB)."""
    import contextlib
    import io
    import re

    df = rag.rag_search(spark, rag_root, "xylophone", k=2,
                        n_probe=2, hybrid=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    locs = re.findall(
        r"\(\d+\) Scan parquet\s*\n(?:.*\n)*?Location.*?\[file:([^\]]*)",
        plan)
    assert locs, plan
    subs = {loc.rstrip("/").rsplit("/", 1)[-1] for loc in locs}
    # every scan points into the index root...
    assert all("/postings" in loc or "/stats" in loc or "/chunks" in loc
               or "/ivf/" in loc for loc in locs), locs
    # ...and the lexical artifact is actually consumed
    assert "postings" in subs and "stats" in subs, subs


def test_registered_rag_kind_answers_from_cache_root(spark, sf_dir):
    """The doc_search_bm25 kind='rag' branch, once its keyed cache is
    warm, plans ZERO scans of documents.parquet — every scan reads the
    persisted acep_rag_cache root (the production RAG shape: prepare
    once, answer many)."""
    import contextlib
    import io
    import re

    from australia_company_etl_pipeline_spark import plans

    reg = plans.REGISTRY["doc_search_bm25"]
    # first build warms (or finds) the keyed cache
    assert reg.branches["rag"](spark, sf_dir).count() > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        reg.branches["rag"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    locs = re.findall(
        r"\(\d+\) Scan parquet\s*\n(?:.*\n)*?Location.*?\[file:([^\]]*)",
        plan)
    assert locs
    assert all("acep_rag_cache" in loc for loc in locs), locs
