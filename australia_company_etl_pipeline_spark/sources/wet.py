"""Common Crawl WET archive scan (SURVEY.md §2.1 S1/S2).

Re-expression of the reference's warcio/manual WET parsers
(``/root/reference/src/ingest/parse_commoncrawl.py:79-185``) as a
distributed Spark read + native record shredding:

- one task per WET file (``spark.read.text(..., wholetext=True)`` —
  gzip-transparent, splittable across files);
- record boundaries, headers, and bodies extracted with native
  ``split`` / ``regexp_extract`` Catalyst expressions (codegen'd);
- no Python in the record path, no driver-side funneling.

The reference yields only ``conversion`` records with a
``WARC-Target-URI`` header; ours keeps the same contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Every WARC record starts with this version line (WARC/1.0, WARC/1.1 …).
_RECORD_SPLIT = r"(?=WARC/\d+\.\d+)"
_HEADER_FIELD = r"{name}:\s*([^\r\n]+)"
# Body = everything after the first blank line (header/body separator).
_BODY = r"(?s)\r?\n\r?\n(.*)"


def header(record: Column, name: str) -> Column:
    """Extract one WARC header value (empty → NULL)."""
    v = F.regexp_extract(record, _HEADER_FIELD.format(name=name), 1)
    return F.when(F.trim(v) != "", F.trim(v))


def parse_wet_records(df: DataFrame, text_col: str = "value",
                      record_type: str = "conversion") -> DataFrame:
    """Shred whole-file WET text into (url, text) conversion records.

    Mirrors parse_commoncrawl.py:79-122: keep ``WARC-Type: conversion``
    records that carry a ``WARC-Target-URI``; body is the content after
    the header block, trimmed.
    """
    records = (df
               .select(F.explode(F.split(F.col(text_col),
                                         _RECORD_SPLIT)).alias("rec"))
               .filter(F.col("rec").startswith("WARC/")))
    # Spark's trim() strips only spaces; records end in \r\n\r\n → regex strip.
    body = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(F.col("rec"), _BODY, 1),
                         r"^\s+", ""), r"\s+$", "")
    parsed = records.select(
        header(F.col("rec"), "WARC-Type").alias("warc_type"),
        header(F.col("rec"), "WARC-Target-URI").alias("url"),
        body.alias("text"))
    return (parsed
            .filter(F.col("warc_type") == record_type)
            .filter(F.col("url").isNotNull())
            .select("url", "text"))


def read_wet(spark: SparkSession, path: str,
             min_text_len: int = 0,
             australian_only: bool = False) -> DataFrame:
    """S1 — distributed WET scan: one row per (url, text) conversion record.

    ``path`` may be a glob of ``*.warc.wet(.gz)`` files; gzip decode is
    handled by the text source. Optional filters mirror the reference's
    ``_should_process`` (.au domains, parse_commoncrawl.py:187-199).
    """
    raw = spark.read.text(path, wholetext=True)
    out = parse_wet_records(raw)
    if min_text_len > 0:
        out = out.filter(F.length("text") >= min_text_len)
    if australian_only:
        from ..functions.text import extract_domain

        out = out.filter(extract_domain(F.col("url")).endswith(".au"))
    return out
