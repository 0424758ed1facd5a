"""Structured Streaming tests: the streaming execution path must produce
exactly the batch-twin results (which are themselves DuckDB-oracled in
``plans/streaming.py``).

Strategy: replay ``events`` as ordered micro-batch files, run each
transformation through a real streaming query (file source → memory
sink, availableNow trigger), and diff against the same transformation
applied in batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.catalog import table
from australia_company_etl_pipeline_spark.streaming import (
    read_events_stream,
    session_windows,
    sessionize_stateful,
    stage_event_batches,
    stream_to_parquet,
    tumbling_counts,
)
from australia_company_etl_pipeline_spark.streaming.events_stream import (
    run_to_memory,
)


@pytest.fixture(scope="module")
def landing_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_landing"))
    stage_event_batches(spark, sf_dir, d, n_batches=3)
    return d


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.select(*key_cols).collect())


def test_staged_batches_cover_all_events(spark, sf_dir, landing_dir):
    batch = table(spark, sf_dir, "events")
    staged = spark.read.parquet(landing_dir)
    assert staged.count() == batch.count()
    assert len(staged.inputFiles()) >= 3  # one file per micro-batch


def test_tumbling_counts_stream_matches_batch(spark, sf_dir, landing_dir):
    stream = read_events_stream(spark, landing_dir)
    assert stream.isStreaming
    q = run_to_memory(tumbling_counts(stream), "tumbling_t", "complete")
    q.awaitTermination(120)
    got = spark.table("tumbling_t")
    want = tumbling_counts(table(spark, sf_dir, "events"))
    cols = ["window_start_s", "window_end_s", "event_type",
            "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_windows_stream_matches_batch(spark, sf_dir, landing_dir):
    stream = read_events_stream(spark, landing_dir)
    q = run_to_memory(session_windows(stream, gap="30 minutes"),
                      "sessions_t", "complete")
    q.awaitTermination(120)
    got = spark.table("sessions_t")
    want = session_windows(table(spark, sf_dir, "events"),
                           gap="30 minutes")
    cols = ["user_id", "session_start_s", "session_end_s",
            "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stateful_sessionizer_emits_closed_sessions(
        spark, sf_dir, landing_dir, tmp_path):
    """applyInPandasWithState emits each CLOSED session exactly once
    (append mode). With availableNow, every session except each user's
    final one closes — compare against the batch twin minus per-user
    last sessions."""
    stream = read_events_stream(spark, landing_dir)
    q = run_to_memory(sessionize_stateful(stream, gap="30 minutes"),
                      "stateful_t", "append",
                      checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = spark.table("stateful_t")

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    want_all = session_windows(table(spark, sf_dir, "events"),
                               gap="30 minutes")
    last = Window.partitionBy("user_id").orderBy(
        F.desc("session_start_s"))
    want_closed = (want_all
                   .withColumn("rn", F.row_number().over(last))
                   .filter(F.col("rn") > 1).drop("rn"))
    cols = ["user_id", "session_start_s", "session_end_s",
            "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want_closed, cols)


def test_parquet_sink_checkpointed(spark, landing_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt2")
    stream = read_events_stream(spark, landing_dir, max_files_per_trigger=2)
    q = stream_to_parquet(stream, out, ckpt)
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    assert written.count() == spark.read.parquet(landing_dir).count()
    # restart with same checkpoint: no new data -> no duplicate rows
    q2 = stream_to_parquet(read_events_stream(spark, landing_dir), out, ckpt)
    q2.awaitTermination(60)
    assert (spark.read.parquet(out).count()
            == spark.read.parquet(landing_dir).count())


def test_stream_dedup_drops_redelivered_batch(spark, sf_dir, landing_dir,
                                              tmp_path):
    """At-least-once ingest: a whole micro-batch file redelivered under a
    new name must be suppressed by dedup_stream — output matches the
    original event set exactly, with state bounded by the watermark."""
    import glob
    import os
    import shutil

    from australia_company_etl_pipeline_spark.streaming.events_stream import (
        dedup_stream,
        read_events_stream,
        run_to_memory,
    )

    d = str(tmp_path / "landing_dup")
    os.makedirs(d)
    files = sorted(glob.glob(landing_dir + "/*.parquet"))
    for f in files:
        shutil.copy(f, os.path.join(d, os.path.basename(f)))
    shutil.copy(files[0], os.path.join(d, "redelivered.parquet"))

    expected = spark.read.parquet(landing_dir).count()
    staged = spark.read.parquet(d).count()
    assert staged > expected                     # duplicates really staged

    # horizon larger than the fixture's whole time span → no late drops;
    # a real deployment sizes this to the upstream redelivery lag
    stream = dedup_stream(read_events_stream(spark, d),
                          watermark="400 days")
    q = run_to_memory(stream, "dedup_t", "append")
    q.awaitTermination()
    out = spark.table("dedup_t")
    assert out.count() == expected
    assert out.select("event_id").distinct().count() == expected


def test_dedup_within_horizon_contract(spark):
    """The batch twin's documented semantics, incl. its one divergence
    from the streaming form: suppression is measured against the NEAREST
    earlier arrival, so in a chain a<b<c with b−a and c−b ≤ horizon but
    c−a > horizon the stream (anchored at a's state) would KEEP c while
    the batch form suppresses it. Single redelivery per horizon — the
    pattern the guard exists for — agrees exactly."""
    from australia_company_etl_pipeline_spark.streaming.events_stream import (
        dedup_within_horizon,
    )

    rows = [
        # k=1: single redelivery inside horizon → dropped
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
        # k=2: redelivery beyond horizon → kept
        (2, "2024-01-01 00:00:00"), (2, "2024-01-01 02:00:00"),
        # k=3: the chain case — c is 80min from a but 40min from b
        (3, "2024-01-01 00:00:00"), (3, "2024-01-01 00:40:00"),
        (3, "2024-01-01 01:20:00"),
    ]
    df = spark.createDataFrame(rows, "k long, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    kept = sorted((r.k, str(r.ts)) for r in dedup_within_horizon(
        df, ("k",), horizon_s=3600, ts_col="ts").collect())
    assert kept == [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:00:00"), (2, "2024-01-01 02:00:00"),
        (3, "2024-01-01 00:00:00"),   # b dropped AND c dropped (chain)
    ]


def test_interval_join_stream_matches_batch_range_join(spark, sf_dir,
                                                       landing_dir):
    """Stream-stream interval self-join (purchases ← clicks in the prior
    hour) must produce exactly the batch range_join pairs."""
    from australia_company_etl_pipeline_spark.operators.temporal import (
        range_join,
    )
    from australia_company_etl_pipeline_spark.streaming import (
        interval_join_stream,
    )

    stream = read_events_stream(spark, landing_dir)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    joined = interval_join_stream(purchases, clicks, lookback_s=3600)
    q = run_to_memory(joined.select("event_id", "r_event_id"),
                      "interval_join_t", "append")
    q.awaitTermination(120)
    got = _rows(spark.table("interval_join_t"), ["event_id", "r_event_id"])

    events = table(spark, sf_dir, "events")
    windows = (events.filter(F.col("event_type") == "purchase")
               .select(F.col("event_id").alias("purchase_id"), "user_id",
                       (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("lo"),
                       F.col("ts").alias("hi")))
    batch_clicks = (events.filter(F.col("event_type") == "click")
                    .select("user_id", F.col("ts").alias("click_ts"),
                            F.col("event_id").alias("click_id")))
    pairs = range_join(batch_clicks, windows, on=["user_id"],
                       left_ts="click_ts", lower_col="lo", upper_col="hi",
                       bucket_s=3600)
    want = _rows(pairs.select(F.col("r.purchase_id").alias("event_id"),
                              F.col("l.click_id").alias("r_event_id")),
                 ["event_id", "r_event_id"])
    assert got == want and len(got) > 0


def test_stream_dedup_ingest_cross_batch(spark, tmp_path):
    """Continuous corpus ingest: a near-copy arriving in a LATER
    micro-batch of one near-copy in the SAME batch must both be dropped
    against the persisted index; unique docs all land. Output is
    partitioned by batch id (replay rewrites, never appends)."""
    import time

    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_dedup_ingest)

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")

    def doc(i, copy_of=None):
        base = " ".join(f"w{copy_of if copy_of is not None else i}x{j}"
                        for j in range(20))
        return (i, base + (" extra" if copy_of is not None else ""))

    schema = "doc_id long, text string"
    b1 = spark.createDataFrame([doc(i) for i in range(10)], schema)
    b2 = spark.createDataFrame(
        [doc(10), doc(11), doc(12), doc(13), doc(14),
         doc(15, copy_of=3),        # near-dup of batch-1 doc 3
         doc(16), doc(17, copy_of=11),  # near-dup inside batch 2
         doc(18), doc(19)], schema)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)  # file-source order is mtime-based; keep b1 older
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_dedup_ingest(stream, out, index, ck, threshold=0.8)
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    kept = sorted(r.doc_id for r in got.select("doc_id").collect())
    assert kept == [i for i in range(20) if i not in (15, 17)]
    assert set(got.columns) >= {"doc_id", "text", "__batch"}
    assert got.select("__batch").distinct().count() == 2
    # the index grew by ALL batch rows (dropped docs still index)
    idx = spark.read.parquet(f"{index}/shingles")
    assert idx.select("doc_id").distinct().count() == 20


def test_stream_embed_index_grows_searchable_index(spark, tmp_path):
    """Streaming embed→index ingest: after two triggers the persisted
    IVF index must answer top-k over BOTH batches' documents, identical
    to a one-shot index built over the union (same seed, frozen
    centroids from the first batch trained on batch 1 only — so parity
    is against build-on-b1 + append-b2), and a replayed append must not
    duplicate rows."""
    import time

    from australia_company_etl_pipeline_spark.operators import ann
    from australia_company_etl_pipeline_spark.operators.embed import (
        embed_documents)
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_embed_index)

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "ivf")
    ck = str(tmp_path / "ck")

    def doc(i):
        return (i, f"document {i} about topic{i % 5} with words w{i} x{i}")

    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    b1 = spark.createDataFrame([doc(i) for i in range(12)], schema)
    b2 = spark.createDataFrame([doc(i) for i in range(12, 20)], schema)
    # a zero-row landing file arrives FIRST: it must not bootstrap a
    # zero-centroid index (which would silently drop every later doc)
    empty.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_embed_index(stream, index, ck, dim=32, n_centroids=4)
    q.awaitTermination(180)

    lists = spark.read.parquet(f"{index}/lists")
    assert lists.count() == 20
    assert lists.select("vec_id").distinct().count() == 20

    # searchable: a query for doc 15's own embedding finds doc 15 first
    qv = (embed_documents(b2.filter(F.col("doc_id") == 15), "text",
                          dim=32)
          .select(F.col("doc_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    top = ann.ivf_index_topk(spark, index, qv, k=3, n_probe=4).collect()
    assert top and top[0].vec_id == 15 and top[0].cosine_sim == 1.0

    # replayed trigger (manual re-append of batch 2) is a no-op
    vecs2 = (embed_documents(b2, "text", dim=32)
             .select(F.col("doc_id").alias("vec_id"), "embedding"))
    ann.append_to_ivf_index(vecs2, index)
    assert spark.read.parquet(f"{index}/lists").count() == 20


def test_stream_dedup_ingest_lm_gate(spark, tmp_path):
    """The streaming perplexity gate: a frozen bigram LM trained on a
    fluent reference snapshot must drop the disfluent arrival BEFORE it
    indexes — spam never becomes 'seen' content — while fluent docs
    pass the gate and still dedup cross-batch."""
    import time

    from australia_company_etl_pipeline_spark.operators import lm
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_dedup_ingest)

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    lm_path = str(tmp_path / "lm_art")

    # reference snapshot: fluent sentences over a small recurring
    # vocabulary — the frozen LM learns these transitions
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again")
         for i in range(20)],
        "doc_id long, text string")
    lm.save_bigram_lm(ref, "text", lm_path)

    fluent = "the quick brown fox jumps over the lazy dog"
    spam = "zz1 qq2 ww3 ee4 rr5 tt6 yy7 uu8 ii9 oo0"  # all-OOV salad
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(100, fluent), (101, spam), (102, fluent + " again")], schema)
    b2 = spark.createDataFrame(
        [(200, fluent + " too"), (201, spam + " more")], schema)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    # threshold between the fluent docs' NLL (seen transitions, low)
    # and the OOV salad's floor -ln(1/(V+1))
    import math
    v = spark.read.parquet(f"{lm_path}/meta").collect()[0]["v"]
    floor = round(-math.log(1.0 / (v + 1)), 6)
    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_dedup_ingest(stream, out, index, ck, threshold=0.8,
                            lm_gate=(lm_path, floor - 0.1))
    q.awaitTermination(180)

    kept = sorted(r.doc_id for r in
                  spark.read.parquet(out).select("doc_id").collect())
    # spam (101, 201) gated out; 102/200 are near-dups of 100 -> dropped
    # by dedup; only the first fluent doc survives end-to-end
    assert 101 not in kept and 201 not in kept
    assert 100 in kept
    # gated docs never entered the index
    idx_ids = {r.doc_id for r in
               spark.read.parquet(f"{index}/shingles")
               .select("doc_id").collect()}
    assert 101 not in idx_ids and 201 not in idx_ids
    assert {100, 102, 200} <= idx_ids  # dedup-dropped docs still index


def test_stream_drift_monitor_alerts_on_shape_change(spark, tmp_path):
    """Continuous feed monitoring: a healthy micro-batch (same value
    distribution as the frozen baseline) raises no alerts; a later batch
    whose null rate spikes appends alert rows for exactly the drifted
    metrics, tagged with its batch id. The baseline parquet is never
    re-profiled (old_profile fast path)."""
    import time

    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_table)
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_drift_monitor)

    landing = str(tmp_path / "landing")
    alerts = str(tmp_path / "alerts")
    ck = str(tmp_path / "ck")
    base_path = str(tmp_path / "baseline")

    schema = "doc_id long, value double"
    ref = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(200)], schema)
    profile_table(ref, "stream", ["value"]).write.parquet(base_path)

    healthy = spark.createDataFrame(
        [(1000 + i, float(i % 10)) for i in range(200)], schema)
    drifted = spark.createDataFrame(
        [(2000 + i, None if i % 2 == 0 else float(i % 10))
         for i in range(200)], schema)
    healthy.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    drifted.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_drift_monitor(stream, base_path, alerts, ck,
                             cols=["value"], rel_threshold=0.5)
    q.awaitTermination(180)

    got = spark.read.parquet(alerts)
    rows = got.collect()
    assert rows, "drifted batch raised no alerts"
    # all alerts come from the second (drifted) batch
    assert {r["__batch"] for r in rows} == {1}
    names = {r.metric_name for r in rows}
    assert "value.null_rate" in names, names
    nr = next(r for r in rows if r.metric_name == "value.null_rate")
    assert nr.old_value == 0.0 and nr.new_value == 0.5


def test_stream_media_dedup_ingest_cross_batch(spark, tmp_path):
    """Multimodal ingest twin: a near-identical payload arriving in a
    LATER micro-batch (vs the persisted fingerprint index) and one
    inside its own batch both drop; a byte-identical payload of a
    DIFFERENT kind survives (same-kind guard); unique media all land.
    Dropped items still index (transitive chains)."""
    import time

    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_media_dedup_ingest)

    landing = str(tmp_path / "mlanding")
    out = str(tmp_path / "mout")
    index = str(tmp_path / "midx")
    ck = str(tmp_path / "mck")

    def payload(i, copy_of=None, flip=False):
        k = copy_of if copy_of is not None else i
        # structurally distinct byte stream per item (every token
        # differs) — the dHash rightly treats "same bytes, one digit
        # swapped" as a near-dup, so distinct items must actually differ
        b = bytearray(" ".join(
            f"m{k}q{j}v{(k * 7 + j * j) % 97}" for j in range(80)
        ).encode())
        if flip:
            b[50] ^= 0x01                       # near, not identical
        return b

    schema = ("media_id long, kind string, payload binary, "
              "width int")
    b1 = spark.createDataFrame(
        [(i, "image", payload(i), 64) for i in range(6)], schema)
    b2 = spark.createDataFrame(
        [(10, "image", payload(10), 64),
         (11, "image", payload(3, copy_of=3, flip=True), 64),   # ~ idx 3
         (12, "audio", payload(4), 64),          # same bytes, other kind
         (13, "image", payload(13), 64),
         (14, "image", payload(13, copy_of=13, flip=True), 64),  # own batch
         ], schema)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_media_dedup_ingest(stream, out, index, ck, max_hamming=6)
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    kept = sorted(r.media_id for r in got.select("media_id").collect())
    assert kept == [0, 1, 2, 3, 4, 5, 10, 12, 13]
    assert got.select("__batch").distinct().count() == 2
    # index carries EVERY arrival, dropped included
    idx = spark.read.parquet(index)
    assert idx.select("media_id").distinct().count() == 11
    assert set(idx.columns) == {"media_id", "kind", "phash"}


def test_stream_media_dedup_ingest_replay_keeps_same_set(spark,
                                                         tmp_path):
    """The documented at-least-once contract: replaying the whole
    stream (fresh checkpoint, same landing files, EXISTING index) must
    return the identical kept set — the strict lower-id rule ignores a
    replayed batch's own first-run index rows (ids >= its own), and the
    dynamic batch-partition overwrite rewrites instead of appending."""
    import time

    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_media_dedup_ingest)

    landing = str(tmp_path / "rlanding")
    out = str(tmp_path / "rout")
    index = str(tmp_path / "ridx")

    def payload(k, flip=False):
        b = bytearray(" ".join(
            f"r{k}q{j}v{(k * 11 + j * 3) % 89}" for j in range(80)
        ).encode())
        if flip:
            b[40] ^= 0x01
        return b

    schema = "media_id long, kind string, payload binary"
    b1 = spark.createDataFrame(
        [(i, "image", payload(i)) for i in range(5)], schema)
    b2 = spark.createDataFrame(
        [(10, "image", payload(10)),
         (11, "image", payload(2, flip=True))], schema)  # ~ idx item 2
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    def run(ck):
        stream = read_documents_stream(spark, landing, schema,
                                       max_files_per_trigger=1)
        q = stream_media_dedup_ingest(stream, out, index, ck,
                                      max_hamming=6)
        q.awaitTermination(180)
        return sorted(r.media_id for r in
                      spark.read.parquet(out).collect())

    first = run(str(tmp_path / "ck1"))
    assert first == [0, 1, 2, 3, 4, 10]          # 11 deduped vs 2
    # full replay: new checkpoint, same landing, index already holds
    # every first-run fingerprint (including ids >= the replayed ones)
    second = run(str(tmp_path / "ck2"))
    assert second == first
    # index grew by the replayed appends (documented: compact offline),
    # but the VERDICTS did not change
    idx = spark.read.parquet(index)
    assert idx.select("media_id").distinct().count() == 7


def test_stream_dedup_ingest_url_stage(spark, tmp_path):
    """url_col prepends a per-batch exact URL dedup against its own
    persisted key index: a page refetched under a messy URL variant in
    a LATER batch is dropped before the MinHash machinery sees it, and
    distinct-content docs sharing no URL still flow through."""
    import time

    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_dedup_ingest)

    landing = str(tmp_path / "ulanding")
    out = str(tmp_path / "uout")
    index = str(tmp_path / "uindex")
    ck = str(tmp_path / "uck")

    def doc(i, url):
        text = " ".join(f"w{i}x{j}" for j in range(20))
        return (i, text, url)

    schema = "doc_id long, text string, url string"
    b1 = spark.createDataFrame(
        [doc(i, f"http://site.net/p/{i}") for i in range(5)], schema)
    b2 = spark.createDataFrame(
        [doc(10, "HTTPS://WWW.site.net/p/3/?utm_source=x"),  # refetch of 3
         doc(11, "http://site.net/p/11"),                    # new page
         doc(12, "http://site.net/p/0")],                    # refetch of 0
        schema)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_dedup_ingest(stream, out, index, ck, threshold=0.8,
                            url_col="url")
    q.awaitTermination(180)

    kept = sorted(r.doc_id for r in
                  spark.read.parquet(out).select("doc_id").collect())
    # 10 and 12 die at the URL stage (content differs — MinHash alone
    # would have kept them); 11 lands
    assert kept == [0, 1, 2, 3, 4, 11]
    # the url-key index holds one row per distinct key
    ukeys = spark.read.parquet(f"{index}/urlkeys/keys")
    assert ukeys.count() == 6
    # and the MinHash shingle index never saw the URL-dropped docs
    sh = spark.read.parquet(f"{index}/shingles")
    assert sorted(r.doc_id for r in
                  sh.select("doc_id").distinct().collect()) == \
        [0, 1, 2, 3, 4, 11]


def test_stream_sketch_ingest_folds_and_fences(spark, tmp_path):
    """Two triggers fold into sketch state that EXACTLY equals the
    one-shot CMS of the union (the merge identity), the HLL estimate
    tracks the true distinct count, and a replayed batch id is fenced
    out instead of double-counting."""
    from pyspark.sql import functions as F

    from australia_company_etl_pipeline_spark.operators import cms, hll
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        fold_sketch_batch, read_documents_stream, stream_sketch_ingest)

    land = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    rows_a = [(i, f"dom{i % 20}") for i in range(500)]
    rows_b = [(1000 + i, f"dom{i % 50}") for i in range(500)]
    schema = "doc_id long, domain string"
    spark.createDataFrame(rows_a, schema).coalesce(1) \
        .write.parquet(land, mode="append")
    q = stream_sketch_ingest(
        read_documents_stream(spark, land, schema), state, ck, "domain",
        depth=4, width=4096, lg_k=12)
    q.awaitTermination(120)
    spark.createDataFrame(rows_b, schema).coalesce(1) \
        .write.parquet(land, mode="append")
    q2 = stream_sketch_ingest(
        read_documents_stream(spark, land, schema), state, ck, "domain",
        depth=4, width=4096, lg_k=12)
    q2.awaitTermination(120)

    both = spark.createDataFrame(rows_a + rows_b, schema)
    direct = {(r.row_idx, r.col_idx): r.cnt
              for r in cms.build_cms(both, F.col("domain"), 4,
                                     4096).collect()}
    got = {(r.row_idx, r.col_idx): r.cnt
           for r in spark.read.parquet(f"{state}/cms").collect()}
    assert got == direct                      # merge identity, exact
    est = hll.distinct_estimate(
        spark.read.parquet(f"{state}/hll")).head()["n_distinct"]
    assert est == pytest.approx(50, rel=0.05)  # dom0..dom49

    meta = spark.read.parquet(f"{state}/meta").head()
    last = meta["last_batch_id"]
    # replayed trigger (same or older id) must be fenced out
    replay = spark.createDataFrame(rows_b, schema)
    assert fold_sketch_batch(replay, last, state, "domain",
                             4, 4096, 12) is False
    got2 = {(r.row_idx, r.col_idx): r.cnt
            for r in spark.read.parquet(f"{state}/cms").collect()}
    assert got2 == direct                     # unchanged
    # a genuinely new batch folds
    extra = spark.createDataFrame([(9999, "domNEW")], schema)
    assert fold_sketch_batch(extra, last + 1, state, "domain",
                             4, 4096, 12) is True
    est2 = hll.distinct_estimate(
        spark.read.parquet(f"{state}/hll")).head()["n_distinct"]
    assert est2 > est


def test_stream_sft_ingest_cross_batch_prompt_dedup(spark, tmp_path):
    """r8 SFT ingest: invalid conversations drop per batch; a prompt
    redelivered in a LATER batch (different answer) is dropped against
    the persisted key index; survivors land rendered with loss-mask
    spans, batch-partitioned."""
    import time

    from australia_company_etl_pipeline_spark.operators.chat import (
        TURNS_SCHEMA)
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        read_documents_stream, stream_sft_ingest)

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")

    def conv(i, prompt, answer, valid=True):
        turns = [("user", prompt), ("assistant", answer)]
        if not valid:
            turns = [("user", prompt)]  # no final assistant
        return (i, turns)

    schema = f"doc_id long, turns {TURNS_SCHEMA}"
    b1 = spark.createDataFrame(
        [conv(1, "what is spark", "a JVM engine"),
         conv(2, "what is duckdb", "an in-process OLAP db"),
         conv(3, "broken", "", valid=False)], schema)
    b2 = spark.createDataFrame(
        [conv(10, "what is spark", "a different answer"),  # dup prompt
         conv(11, "what is pandas", "a dataframe library")], schema)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_sft_ingest(stream, out, index, ck)
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    kept = sorted(r.doc_id for r in got.select("doc_id").collect())
    assert kept == [1, 2, 11]  # 3 invalid, 10 dup prompt
    row = {r.doc_id: r for r in got.collect()}[1]
    assert row.text == ("<|user|>\nwhat is spark\n"
                        "<|assistant|>\na JVM engine<|end|>\n")
    s, e = tuple(row.spans[0])
    assert row.text[s:e] == "a JVM engine"
    assert got.select("__batch").distinct().count() == 2
    # the key index holds one row per distinct VALID prompt
    keys = spark.read.parquet(f"{index}/keys")
    assert keys.count() == 3


def test_stateful_transitions_match_batch_twin(spark, sf_dir,
                                               landing_dir, tmp_path):
    """Cross-batch Markov maintenance: the stateful stream's summed
    (prev, next) increments equal the batch event_transitions EXACTLY —
    the one-row-per-user state carries the boundary event, so a
    transition split across two triggers is still counted once."""
    from australia_company_etl_pipeline_spark.operators.temporal import (
        event_transitions,
    )
    from australia_company_etl_pipeline_spark.streaming.events_stream import (
        transitions_stateful,
    )

    stream = read_events_stream(spark, landing_dir)
    q = run_to_memory(transitions_stateful(stream), "trans_t", "append",
                      checkpoint_dir=str(tmp_path / "ckpt_tr"))
    q.awaitTermination(180)
    got = {(r.prev_type, r.next_type): (r.n, r.u)
           for r in (spark.table("trans_t")
                     .groupBy("prev_type", "next_type")
                     .agg(F.sum("n").alias("n"),
                          F.countDistinct("user_id").alias("u"))
                     .collect())}
    want = {(r.prev_type, r.next_type): (r.n_transitions, r.n_users)
            for r in event_transitions(
                table(spark, sf_dir, "events")).collect()}
    assert got == want


def test_stream_postings_index_matches_batch_bm25(spark, tmp_path):
    """Continuously maintained BM25 index: after two triggers, a search
    from the persisted postings equals a batch bm25_search over the
    union — scores bit-for-bit (per-batch corpus constants fold as
    integer sums). Replaying a batch id rewrites its own partition, so
    results are unchanged."""
    import time

    from australia_company_etl_pipeline_spark.operators import (
        retrieval as rt,
    )
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        bm25_search_indexed, fold_postings_batch, read_documents_stream,
        stream_postings_ingest)

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "spark shuffle spark join"),
         (2, "join join join filter"),
         (3, None)], schema)                    # NULL text counts as 0
    b2 = spark.createDataFrame(
        [(4, "quantum spark"),
         (5, "filter scan scan scan scan scan")], schema)
    b1.coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_postings_ingest(stream, index, ck)
    q.awaitTermination(180)

    terms = ["spark", "join", "zzz_missing"]
    got = {(r.doc_id): (r.n_terms_matched, r.score, r.rank)
           for r in bm25_search_indexed(spark, index, terms).collect()}
    want = {(r.doc_id): (r.n_terms_matched, r.score, r.rank)
            for r in rt.bm25_search(b1.unionByName(b2), "text",
                                    "doc_id", terms).collect()}
    assert got == want and got
    # replay: re-folding batch 0 with the same rows changes nothing
    fold_postings_batch(b1, 0, index)
    again = {(r.doc_id): (r.n_terms_matched, r.score, r.rank)
             for r in bm25_search_indexed(spark, index,
                                          terms).collect()}
    assert again == want


def test_compact_postings_preserves_search_and_bounds_partitions(
        spark, tmp_path):
    """compact_postings folds old per-trigger partitions into the base
    generation: search results stay bit-identical, the partition count
    drops to keep_last (+1 base), a replay of a KEPT batch is still
    idempotent, and re-compacting is a no-op. This is what keeps the
    read path's listing cost flat as trigger count grows — after 10^5
    triggers an uncompacted index lists 10^5 directories per query."""
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        bm25_search_indexed, compact_postings, fold_postings_batch)

    index = str(tmp_path / "idx")
    # 12 triggers, one doc each; terms overlap so idf/avgdl shift
    # with every batch folded in
    batches = [
        spark.createDataFrame(
            [(i, f"spark term{i % 3} join " + "pad " * (i % 5))],
            "doc_id long, text string")
        for i in range(12)]
    for i, b in enumerate(batches):
        fold_postings_batch(b, i, index)

    terms = ["spark", "term1", "join"]
    def search():
        return {r.doc_id: (r.n_terms_matched, r.score, r.rank)
                for r in bm25_search_indexed(spark, index,
                                             terms).collect()}

    def live_batches():
        return {r["__batch"] for r in
                spark.read.parquet(f"{index}/postings")
                .select("__batch").distinct().collect()}

    want = search()
    res = compact_postings(spark, index, keep_last=3)
    assert res == {"batches_folded": 9, "partitions": 4}
    assert search() == want
    assert live_batches() == {-1, 9, 10, 11}
    # stats folded to one base row + one per kept batch
    assert (spark.read.parquet(f"{index}/stats")
            .select("__batch").distinct().count() == 4)
    # replay of a KEPT batch rewrites its own partition: idempotent
    fold_postings_batch(batches[11], 11, index)
    assert search() == want
    # second compaction folds nothing further at the same horizon
    assert compact_postings(spark, index, keep_last=3) == {
        "batches_folded": 0, "partitions": 4}
    # a later horizon folds kept batches INTO the existing base
    assert compact_postings(spark, index, keep_last=1) == {
        "batches_folded": 2, "partitions": 2}
    assert search() == want
    assert live_batches() == {-1, 11}

    import pytest as _pt
    with _pt.raises(ValueError, match="keep_last"):
        compact_postings(spark, index, keep_last=0)


def test_session_windows_bot_user_cap(spark):
    """max_events_per_user pre-caps a bot BEFORE the session merge with
    the skew-safe salted cap: normal users are bit-identical to the
    uncapped result, the bot keeps only its earliest slice (later
    sessions truncated — the documented sampling trade), streaming
    frames reject the knob."""
    from datetime import datetime, timedelta

    from australia_company_etl_pipeline_spark.streaming.events_stream import (
        session_windows,
    )

    base = datetime(2024, 1, 1)
    rows = [(i, 99, base + timedelta(hours=i), 1.0)
            for i in range(6)]                       # bot: 6 sessions
    rows += [(100, 1, base, 2.0),
             (101, 1, base + timedelta(minutes=5), 3.0)]  # one session
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    capped = session_windows(df, gap="30 minutes",
                             max_events_per_user=2).collect()
    by_user = {}
    for r in capped:
        by_user.setdefault(r.user_id, []).append(r)
    # bot truncated to its earliest 2 events -> 2 sessions, not 6
    assert len(by_user[99]) == 2
    # normal user unchanged vs the uncapped twin
    full = [r for r in session_windows(df, gap="30 minutes").collect()
            if r.user_id == 1]
    assert sorted(map(tuple, by_user[1])) == sorted(map(tuple, full))
    assert full[0].n_events == 2 and full[0].sum_value == 5.0

    import pytest as _pt
    with _pt.raises(ValueError, match="max_events_per_user"):
        session_windows(df, max_events_per_user=0)


def test_stream_postings_ingest_auto_compaction(spark, tmp_path):
    """compact_every=N runs the compactor in-stream (r10): across 3×N
    triggers the live partition count stays bounded by keep_last + N,
    search results are bit-identical to a batch build over the union,
    and a replayed trigger (which re-runs its compaction) changes
    nothing."""
    import time

    from australia_company_etl_pipeline_spark.operators import (
        retrieval as rt,
    )
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        bm25_search_indexed, fold_postings_batch, read_documents_stream,
        stream_postings_ingest)

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"
    N = 2  # compact_every
    batches = [
        spark.createDataFrame(
            [(i, f"spark term{i % 3} join " + "pad " * (i % 4))], schema)
        for i in range(6)]  # 3×N triggers (one file per trigger)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(landing)
        time.sleep(1.05)  # distinct mtimes -> stable trigger order

    stream = read_documents_stream(spark, landing, schema,
                                   max_files_per_trigger=1)
    q = stream_postings_ingest(stream, index, ck,
                               compact_every=N, keep_last=2)
    q.awaitTermination(300)

    live = {r["__batch"] for r in
            spark.read.parquet(f"{index}/postings")
            .select("__batch").distinct().collect()}
    # bounded: base generation + at most keep_last + N live batches
    assert len(live) <= 1 + 2 + N, live
    assert -1 in live, live

    terms = ["spark", "term1", "join"]
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    got = {r.doc_id: (r.n_terms_matched, r.score, r.rank)
           for r in bm25_search_indexed(spark, index, terms).collect()}
    want = {r.doc_id: (r.n_terms_matched, r.score, r.rank)
            for r in rt.bm25_search(union, "text", "doc_id",
                                    terms).collect()}
    assert got == want and got

    # a replayed KEPT trigger rewrites its own partition and re-runs
    # its compaction: results unchanged
    kept = sorted(b for b in live if b != -1)
    fold_postings_batch(batches[kept[-1]], kept[-1], index)
    from australia_company_etl_pipeline_spark.streaming.corpus_stream import (
        compact_postings,
    )
    compact_postings(spark, index, keep_last=2)
    again = {r.doc_id: (r.n_terms_matched, r.score, r.rank)
             for r in bm25_search_indexed(spark, index,
                                          terms).collect()}
    assert again == want

    import pytest as _pt
    with _pt.raises(ValueError, match="compact_every"):
        stream_postings_ingest(stream, index, ck, compact_every=0)
