"""Sinks (SURVEY.md §2.1 S7–S12).

- ``write_parquet``      — S7, thin DataFrameWriter wrapper.
- ``upsert_parquet``     — S9 MERGE semantics for engine-internal tables:
  union existing+updates, keep the newest row per key (deterministic
  window), staging-dir swap so the read path is never overwritten mid-job.
- ``jdbc_upsert_sql`` /
  ``write_jdbc_upsert``  — S8/S9 Postgres ``INSERT … ON CONFLICT`` upsert
  via ``foreachPartition`` (distributed, batched), replacing the
  reference's driver-side psycopg2 loops
  (``/root/reference/src/load/load_postgres.py:124-372``, ~5.7k rows/s
  single-connection). Statement generation is pure (testable offline);
  the connection path is gated behind an import-try since no database
  driver ships in this environment.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """S7 — parquet sink (parse_abr.py:329-331)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def upsert_parquet(spark, path: str, updates: DataFrame, keys: list[str],
                   version_col: str | None = None) -> None:
    """S9 — keyed upsert into a parquet table (MERGE emulation).

    New rows win over existing rows for the same key; among duplicates the
    highest ``version_col`` wins (ties: updates side). Written via a
    staging directory + atomic-ish swap, because Spark cannot overwrite a
    path it is still reading. LOCAL-FILESYSTEM ONLY: the staging swap is
    ``os.replace`` and the existence probe is driver-local — both forms
    below (partitioned, streaming) work on any Hadoop filesystem.

    This form rewrites the WHOLE table per merge — right for small
    engine-internal tables (dims, audit state). For big fact tables use
    ``upsert_parquet_partitioned``: identical row semantics, but only the
    partitions touched by the batch are rewritten (O(touched partitions),
    the incremental-load shape), and ``stream_upsert_parquet`` wraps it
    for continuous ingest.
    """
    if os.path.exists(path):
        existing = spark.read.parquet(path).withColumn("__src", F.lit(0))
        merged = existing.unionByName(updates.withColumn("__src", F.lit(1)))
    else:
        merged = updates.withColumn("__src", F.lit(1))
    order = [F.desc("__src")]
    if version_col:
        order.insert(0, F.desc(version_col))
    win = Window.partitionBy(*keys).orderBy(*order)
    result = (merged.withColumn("__rn", F.row_number().over(win))
              .filter(F.col("__rn") == 1).drop("__rn", "__src"))
    staging = path.rstrip("/") + ".__staging__"
    result.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(staging, path)


def jdbc_upsert_sql(table: str, columns: list[str], conflict_keys: list[str],
                    update_columns: list[str] | None = None,
                    placeholder: str = "%s") -> str:
    """Generate the ``INSERT … ON CONFLICT`` statement the reference
    hand-writes per table (load_postgres.py:188-250, 252-309, 311-372).

    ``update_columns=None`` → update every non-key column;
    ``update_columns=[]``   → DO NOTHING (conflict-ignore, S8).
    ``placeholder`` — DB-API paramstyle marker (``%s`` psycopg2, ``?``
    qmark drivers such as duckdb/sqlite).
    """
    cols = ", ".join(columns)
    params = ", ".join([placeholder] * len(columns))
    stmt = f"INSERT INTO {table} ({cols}) VALUES ({params})"
    if update_columns == []:
        return f"{stmt} ON CONFLICT ({', '.join(conflict_keys)}) DO NOTHING"
    updates = update_columns if update_columns is not None else [
        c for c in columns if c not in conflict_keys]
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in updates)
    return (f"{stmt} ON CONFLICT ({', '.join(conflict_keys)}) "
            f"DO UPDATE SET {sets}")


def write_jdbc_upsert(df: DataFrame, dsn: str, table: str,
                      conflict_keys: list[str],
                      update_columns: list[str] | None = None,
                      batch_size: int = 1000,
                      connection_factory=None,
                      placeholder: str = "%s") -> None:
    """S8/S9 — distributed Postgres upsert: every partition opens its own
    connection and executes batched upserts (vs the reference's single
    driver connection, load_postgres.py:124-372).

    ``connection_factory`` — optional picklable ``dsn -> DB-API
    connection`` callable for non-psycopg2 backends
    (``tests/test_sources.py::test_write_jdbc_upsert_duckdb_roundtrip``
    round-trips the real foreachPartition path against a DuckDB file this
    way, asserting DO UPDATE / DO NOTHING / insert semantics on the final
    table). ``None`` → psycopg2 with ``execute_batch``; the generic path
    uses DB-API ``executemany`` in ``batch_size`` chunks.
    """
    if connection_factory is None:
        import importlib.util

        if importlib.util.find_spec("psycopg2") is None:
            # fail fast on the driver instead of erroring every task
            raise NotImplementedError(
                "write_jdbc_upsert needs psycopg2 on the executors; "
                "install it, pass connection_factory=, or use "
                "upsert_parquet for engine-internal tables")
    columns = df.columns
    sql = jdbc_upsert_sql(table, columns, conflict_keys, update_columns,
                          placeholder=placeholder)

    def load_partition(rows) -> None:
        if connection_factory is not None:
            conn = connection_factory(dsn)
            run_batch = None
        else:
            import psycopg2
            from psycopg2.extras import execute_batch
            conn = psycopg2.connect(dsn)
            run_batch = execute_batch
        try:
            cur = conn.cursor()
            try:
                params = ([getattr(r, c) for c in columns] for r in rows)
                if run_batch is not None:
                    run_batch(cur, sql, params, page_size=batch_size)
                else:
                    while True:
                        chunk = list(itertools.islice(params, batch_size))
                        if not chunk:
                            break
                        cur.executemany(sql, chunk)
            finally:
                cur.close()
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(load_partition)


def write_bucketed_parquet(df: DataFrame, table_name: str,
                           bucket_cols: list[str], num_buckets: int,
                           sort_cols: list[str] | None = None,
                           mode: str = "overwrite") -> None:
    """S7 extension — bucketed managed parquet table: pay the shuffle ONCE
    at write time so every later equi-join/aggregation on the bucket key
    reads co-located and shuffle-free (Exchange-less SortMergeJoin when
    both sides share bucket key and count;
    tests/test_plan_shapes.py::test_cobucketed_join_has_no_exchange
    asserts that on the actual plan).

    The 100 TB use: fact tables repeatedly joined on the same FK (orders
    x customer, matches x entities) amortize their shuffle across every
    downstream query. Buckets are also the skew lever: hash-spread files
    per key, `num_buckets` sized so a bucket fits an executor.
    Managed-table (saveAsTable) because bucket metadata lives in the
    catalog — plain .parquet(path) writes lose it.
    """
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(num_buckets, *bucket_cols)
         .sortBy(*(sort_cols or bucket_cols)))
    w.saveAsTable(table_name)


def write_sharded_corpus(df: DataFrame, path: str, sort_col: str,
                         shards: int,
                         max_records_per_file: int | None = None) -> None:
    """Corpus-release writer: globally range-sharded, locally sorted
    parquet — shard i holds a contiguous ``sort_col`` range, rows sorted
    within it, so a consumer can binary-search shards by key, stream the
    corpus in key order shard-by-shard, and reproduce byte-identical
    shard contents from the same input (deterministic layout, unlike
    hash partitioning where shard membership shifts with cluster size).

    Scale: ``repartitionByRange`` samples the key distribution once to
    pick balanced boundaries (skew-resistant — a hot key range gets
    split, not funneled); ``maxRecordsPerFile`` caps file size inside a
    shard without another shuffle, the knob that keeps 100 TB writes in
    object-store-friendly file sizes.
    """
    w = (df.repartitionByRange(shards, F.col(sort_col))
         .sortWithinPartitions(sort_col)
         .write.mode("overwrite"))
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def upsert_parquet_partitioned(spark, path: str, updates: DataFrame,
                               keys: list[str], partition_col: str,
                               version_col: str | None = None) -> None:
    """S9 at scale — partition-scoped MERGE: only partitions that appear
    in ``updates`` are rewritten (dynamic partition overwrite), so an
    incremental load touching K partitions costs O(K partitions), not
    O(whole table) like ``upsert_parquet``'s full rewrite. The 100 TB
    shape for date/shard-partitioned fact tables.

    Same row semantics as ``upsert_parquet`` (updates win per key;
    highest ``version_col`` wins among duplicates), applied within the
    affected partitions; a key's update must carry its original
    partition value — cross-partition key moves would leave the old row
    behind (document of record: partition_col is part of the physical
    key, as in Hive/Delta static layouts).

    The affected-partition list is collected to the driver (K values —
    the partition count touched by one load, small by construction) to
    prune the existing-side read; the merged rows are materialized
    before the write because Spark refuses a plan that reads and
    overwrites the same path.

    Dynamic partition overwrite is scoped to THIS write via the writer
    option — never set on the shared session conf, which would silently
    turn every later ``mode('overwrite').partitionBy(...)`` in the same
    session into a partition-scoped overwrite that leaves stale
    partitions behind. Rows with a NULL partition value land in the
    default (``__HIVE_DEFAULT_PARTITION__``) partition and merge against
    it explicitly (``isin`` alone would skip NULLs under three-valued
    logic and dynamic overwrite would then drop the partition's
    un-updated keys).

    The does-the-table-exist bootstrap probes by READING the path (like
    ``dedup._read_or_empty``), not ``os.path`` — a driver-local stat of
    an object-store URI is always False, and the resulting "first
    write" full-overwrite would silently wipe every previously merged
    partition on each call.
    """
    from functools import reduce

    from pyspark.errors import AnalysisException

    from ..session import materialize

    try:
        full = spark.read.parquet(path)
    except AnalysisException as exc:
        cond = (exc.getCondition() if hasattr(exc, "getCondition")
                else exc.getErrorClass())
        # UNABLE_TO_INFER_SCHEMA = the directory exists but holds no
        # parquet files (e.g. only _SUCCESS) — the table is effectively
        # absent and bootstrapping over it is non-destructive. Anything
        # else (corrupt footers, permissions) must not masquerade as new.
        if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise
        if updates.isEmpty():
            # writing an empty bootstrap would leave a _SUCCESS-only dir
            # whose later reads die on UNABLE_TO_INFER_SCHEMA — routine
            # for a stream's first micro-batch; just wait for data
            return
        (updates.write.mode("overwrite").partitionBy(partition_col)
         .parquet(path))
        return
    affected = [r[0] for r in
                updates.select(partition_col).distinct().collect()]
    if not affected:  # empty batch: nothing to merge, nothing to rewrite
        return
    non_null = [a for a in affected if a is not None]
    conds = []
    if non_null:
        conds.append(F.col(partition_col).isin(non_null))
    if len(non_null) < len(affected):  # updates touch the NULL partition
        conds.append(F.col(partition_col).isNull())
    existing = (full
                .filter(reduce(lambda a, b: a | b, conds))
                .withColumn("__src", F.lit(0)))
    merged = existing.unionByName(updates.withColumn("__src", F.lit(1)))
    order = [F.desc("__src")]
    if version_col:
        order.insert(0, F.desc(version_col))
    win = Window.partitionBy(*keys).orderBy(*order)
    result = materialize(
        merged.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") == 1).drop("__rn", "__src"))
    (result.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col)
     .parquet(path))


def compact_parquet(spark, path: str, target_bytes: int = 128 << 20,
                    partition_col: str | None = None,
                    sort_col: str | None = None,
                    max_records_per_file: int | None = None
                    ) -> dict[str, int]:
    """Small-file compaction — the maintenance op every streaming sink
    needs: ``foreachBatch`` / dynamic-overwrite writers emit one-or-more
    files per trigger per partition, and a month of 30-second triggers
    turns a table into millions of KB-sized files whose open/footer
    overhead dominates every scan.

    Flat tables rewrite to ``ceil(bytes / target_bytes)`` files.
    Partitioned tables (``partition_col`` given) keep the hive layout
    and dynamic-overwrite semantics of ``upsert_parquet_partitioned``
    and collapse each partition directory to ONE file — the right shape
    for trigger-accumulated small files; cap oversized partitions with
    ``max_records_per_file`` (bytes-per-partition isn't knowable
    without a second listing pass, so the cap is row-based). Optionally
    sorted within files on ``sort_col`` to restore parquet min/max
    pruning that interleaved trigger writes destroy. The rewrite lands
    in a sibling temp directory and swaps in via atomic renames
    (``session.replace_dir``) — a crash mid-compact leaves the original
    table untouched, never a truncated one.

    Returns ``{'files_before': n, 'files_after': m, 'bytes': b}``.
    Row-identical by construction (no dedup, no filter — pair with
    ``compact_dedup_index`` for stores that also accumulate replay
    duplicates). Scale: one read + one write of the table; run it
    off-peak, per-partition-subset at very large sizes.
    """
    import math

    from ..session import replace_dir

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(conf)
    total = fs.getContentSummary(hpath(path)).getLength()

    def data_files() -> int:
        # count data files (Hadoop RemoteIterator: manual draining)
        it, n = fs.listFiles(hpath(path), True), 0
        while it.hasNext():
            name = it.next().getPath().getName()
            if not name.startswith(("_", ".")):
                n += 1
        return n

    files_before = data_files()
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(total / target_bytes))
    import os as _os

    # pid-suffixed like build_ivf_index's build dir: two overlapping
    # compactions then never interleave writes in one tmp tree (the swap
    # itself is last-wins on complete, row-identical rewrites)
    tmp = f"{path}.__compact_tmp.{_os.getpid()}"
    if partition_col is not None:
        # one task (→ one file) per partition value; partitionBy
        # re-splits the directories, maxRecordsPerFile caps oversized
        # partitions without another shuffle
        out = df.repartition(F.col(partition_col))
        if sort_col:
            out = out.sortWithinPartitions(partition_col, sort_col)
        w = out.write.mode("overwrite").partitionBy(partition_col)
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(tmp)
    else:
        out = (df.repartitionByRange(n_files, F.col(sort_col))
               .sortWithinPartitions(sort_col)
               if sort_col else df.repartition(n_files))
        w = out.write.mode("overwrite")
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(tmp)
    replace_dir(spark, tmp, path)
    return {"files_before": files_before, "files_after": data_files(),
            "bytes": int(total)}


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          shards: int, seed: int = 42,
                          max_records_per_file: int | None = None) -> None:
    """Training-order corpus writer: the complement of
    ``write_sharded_corpus``.  A release wants KEY order (binary-search
    shards); a training run wants the opposite — a decorrelated global
    order, because curation leaves the corpus sorted by source/time/
    quality and gradient training on correlated batches degrades.  The
    standard recipe shuffles once at write time so every epoch reader
    streams shards sequentially.

    Order is ``xxhash64(seed, id)`` — deterministic pseudo-random:
    reproducible end-to-end from (input, seed), re-shuffled by bumping
    ``seed``, independent of cluster size and partition layout (unlike
    ``orderBy(rand())``, which is neither reproducible nor stable
    across retried tasks — a retried stage would re-draw its randoms
    and silently duplicate/drop rows under speculative execution).

    Scale: one ``repartitionByRange`` over the hash (sampled balanced
    boundaries — hash values are uniform, so shards are even) + local
    sort; ``maxRecordsPerFile`` caps file sizes without extra shuffle.
    Shard i's CONTENT depends only on (input, seed, shards).
    """
    order = F.xxhash64(F.lit(seed), F.col(id_col))
    w = (df.withColumn("__ord", order)
         .repartitionByRange(shards, F.col("__ord"))
         .sortWithinPartitions("__ord")
         .drop("__ord")
         .write.mode("overwrite"))
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_curriculum_shards(df: DataFrame, path: str, id_col: str,
                            order_col: str, shards: int,
                            blocks: int = 10, seed: int = 42,
                            max_records_per_file: int | None = None,
                            ) -> None:
    """Curriculum/annealing-order corpus writer: shards stream in
    ASCENDING ``order_col`` blocks (e.g. a quality score — the
    data-annealing practice of ending training on the cleanest slice;
    pass a negated score for the reverse curriculum), while rows
    WITHIN a block stay pseudo-randomly decorrelated (a strict global
    score sort would feed the model long runs of near-identical
    documents — exactly the correlation ``write_training_shards``
    exists to break).

    Order key = ``(block, xxhash64(seed, id))`` where ``block`` is the
    row's ``blocks``-quantile bucket of ``order_col`` (boundaries from
    ONE ``percentile_approx`` aggregate — deterministic given the
    data; NULL scores land in block 0, i.e. earliest). Reproducible
    end-to-end from (input, seed, blocks, shards) and stable under
    task retry, like the flat shuffle writer.

    Scale: one agg for the boundaries + one ``repartitionByRange`` +
    local sort — identical shape to ``write_training_shards`` plus a
    one-row aggregate. Shard files in name order ARE the training
    order."""
    if blocks < 2:
        raise ValueError(f"blocks must be >= 2, got {blocks}")
    qs = [i / blocks for i in range(1, blocks)]
    bounds = df.agg(F.percentile_approx(
        order_col, qs, 10_000).alias("b")).head()["b"]
    # percentile_approx over zero rows (or an all-NULL score column)
    # returns NULL — degrade to one block (pure hash order, the flat
    # writer's behavior) instead of crashing a pipeline whose upstream
    # filters emptied it
    blk = F.lit(0)
    for b in (bounds or []):
        blk = blk + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    order = F.xxhash64(F.lit(seed), F.col(id_col))
    w = (df.withColumn("__blk", blk)
         .withColumn("__ord", order)
         .repartitionByRange(shards, F.col("__blk"), F.col("__ord"))
         .sortWithinPartitions("__blk", "__ord")
         .drop("__blk", "__ord")
         .write.mode("overwrite"))
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
