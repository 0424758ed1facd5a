"""JSONL corpus source — the de-facto interchange format for LLM
training data (one JSON document per line; ``.jsonl`` or per-shard
``.jsonl.gz``).

Spark's native json reader IS the right scale engine here — splittable
parallel reads for uncompressed files, file-parallel for gzip shards,
and the schema is pushed into the parser so fields the query never
touches are skipped at parse time. What this module adds is the
operational contract the WET/ABR shredders set
(``/root/reference/src/extract/commoncrawl.py`` downloads and shreds
crawl records; the JSONL equivalent is what today's pipelines exchange):

- **Explicit schema, never inference.** At 100 TB an inference pass
  reads the corpus twice, and a single drifting field in one shard
  silently retypes the whole table. Callers pass a ``StructType``;
  ``DOC_SCHEMA`` is the engine's documents-table shape.
- **Corrupt-line accounting.** PERMISSIVE parsing with a named corrupt
  column: a broken line (truncated shard, interleaved log output, type
  drift) lands in ``_corrupt_record`` instead of vanishing.
  ``jsonl_scan_stats`` is the one-aggregate audit mirroring
  ``wet_scan_stats`` — a filter that loses 3% of a crawl must be
  measurable.
- **Round-trip release.** ``write_jsonl`` shards with bounded file
  sizes and optional compression for handoff to trainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

CORRUPT_COL = "_corrupt_record"

#: The engine's documents-table shape as a JSONL contract.
DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("lang", StringType()),
    StructField("text", StringType()),
])


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType = DOC_SCHEMA,
               corrupt_col: str = CORRUPT_COL) -> DataFrame:
    """Read a JSONL corpus with the declared ``schema`` plus a corrupt
    -record column.

    PERMISSIVE mode: a malformed line (or a line whose fields fail the
    declared types) parses to NULL fields with the ORIGINAL line
    preserved in ``corrupt_col`` — nothing is silently dropped
    (FAILFAST would kill a 100 TB job on one bad shard line;
    DROPMALFORMED would hide the loss). Filter with ``valid_rows`` /
    audit with ``jsonl_scan_stats``.

    Implementation: ``spark.read.text`` + ``from_json`` rather than the
    raw json reader — same splittable scan, but the corrupt column is
    an ordinary computed field, so corrupt-only projections (the scan
    audit!) don't trip Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
    restriction on raw-file reads, and blank lines are dropped
    explicitly instead of by reader-internal behavior.
    """
    if corrupt_col in {f.name for f in schema.fields}:
        raise ValueError(f"corrupt_col {corrupt_col!r} collides with a "
                         "schema field")
    full = StructType(list(schema.fields)
                      + [StructField(corrupt_col, StringType())])
    raw = (spark.read.text(path)
           .filter(F.length(F.trim(F.col("value"))) > 0))
    parsed = raw.select(F.from_json(
        F.col("value"), full,
        {"mode": "PERMISSIVE",
         "columnNameOfCorruptRecord": corrupt_col}).alias("__r"))
    return parsed.select("__r.*")


def valid_rows(df: DataFrame,
               corrupt_col: str = CORRUPT_COL) -> DataFrame:
    """The clean projection: rows that parsed fully, corrupt column
    dropped."""
    return df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)


def jsonl_scan_stats(df: DataFrame,
                     corrupt_col: str = CORRUPT_COL) -> DataFrame:
    """One-row scan audit — (n_lines, n_corrupt, corrupt_rate) — the
    ``wet_scan_stats`` twin for JSONL shards. ONE partial aggregate;
    run it on the raw ``read_jsonl`` frame BEFORE ``valid_rows``."""
    n = F.count(F.lit(1))
    bad = F.count(F.col(corrupt_col))
    return df.agg(n.alias("n_lines"), bad.alias("n_corrupt"),
                  F.round(bad / n, 6).alias("corrupt_rate"))


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = "gzip",
                max_records_per_file: int = 1_000_000) -> None:
    """Sharded JSONL release: bounded records per file (trainer-sized
    shards without a global repartition), optional per-file gzip.
    NULL-valued fields are omitted per line (standard JSONL practice;
    Spark's json writer drops them) — a round-trip through
    ``read_jsonl`` restores them as NULLs via the declared schema."""
    w = df.write.mode(mode).option("maxRecordsPerFile",
                                   max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
