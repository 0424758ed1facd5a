"""Corpus datasheet (pipeline/datasheet.py, r7)."""

from __future__ import annotations

import pytest

from australia_company_etl_pipeline_spark.pipeline.datasheet import (
    corpus_datasheet)


@pytest.fixture(scope="module")
def sheet(spark):
    rows = (
        [(i, "the quick brown fox jumps over the lazy dog number "
             f"{i} with more words", "en-ish")
         for i in range(40)]
        # exact duplicates of the first 10 texts
        + [(100 + i, "the quick brown fox jumps over the lazy dog "
                     f"number {i} with more words", "dup")
           for i in range(10)]
        + [(200, None, "null"), (201, "   ", "blank"),
           (202, "mail me at jane@example.com today please folks.",
            "pii")])
    docs = spark.createDataFrame(rows, "doc_id long, text string, tag string")
    df = corpus_datasheet(docs, "text", "doc_id")
    return {(r.section, r.key): r.value for r in df.collect()}


def test_volume(sheet):
    assert sheet[("volume", "n_docs")] == 53.0
    assert sheet[("volume", "n_null_text")] == 2.0
    assert sheet[("volume", "total_tokens")] > 0


def test_length_and_quality_shape(sheet):
    assert (sheet[("length", "p10")] <= sheet[("length", "p50")]
            <= sheet[("length", "p90")] <= sheet[("length", "max")])
    assert 0.0 <= sheet[("quality", "p50")] <= 1.0


def test_duplication_estimate(sheet):
    # 10 planted exact dups out of 53 docs ≈ 0.19 (HLL ±2%);
    # NULL and blank collapse too, nudging it up
    assert 0.12 <= sheet[("duplication", "dup_rate_est")] <= 0.30


def test_langs_partition_docs(sheet):
    lang_total = sum(v for (s, _), v in sheet.items() if s == "langs")
    assert lang_total == 53.0


def test_pii_counts(sheet):
    assert sheet[("pii", "email")] == 1.0


def test_repetition_bounded(sheet):
    assert 0.0 <= sheet[("repetition", "token_dup_ratio")] <= 1.0


def test_dup_rate_excludes_null_text(spark):
    """ADVICE r7: a zero-dup corpus with NULL texts must not report a
    duplicate rate (~n_null/n_docs) — the distinct count skips NULLs,
    so the denominator must too."""
    rows = ([(i, f"a unique document body number {i} with words", "en")
             for i in range(30)]
            + [(100 + i, None, "null") for i in range(10)])
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, tag string")
    sheet = {(r.section, r.key): r.value
             for r in corpus_datasheet(docs, "text", "doc_id").collect()}
    assert sheet[("volume", "n_null_text")] == 10.0
    # 0 true dups; HLL ±2% tolerance, but nowhere near the 0.25 the
    # wrong n_docs denominator produced
    assert sheet[("duplication", "dup_rate_est")] <= 0.05


def test_dup_rate_all_null_corpus(spark):
    docs = spark.createDataFrame([(1, None, "x"), (2, None, "y")],
                                 "doc_id long, text string, tag string")
    sheet = {(r.section, r.key): r.value
             for r in corpus_datasheet(docs, "text", "doc_id").collect()}
    assert sheet[("duplication", "dup_rate_est")] == 0.0


def test_dup_rate_blank_variants_do_not_mask_real_dups(spark):
    """Review regression (r8): distinct WHITESPACE variants must not
    inflate the distinct count while the denominator excludes them —
    that combination understated (even zeroed) a real dup rate."""
    rows = ([(i, "the same exact duplicated body text here", "dup")
             for i in range(5)]
            + [(100, " ", "b1"), (101, "  ", "b2"), (102, "   ", "b3"),
               (103, "    ", "b4"), (104, "     ", "b5")])
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, tag string")
    sheet = {(r.section, r.key): r.value
             for r in corpus_datasheet(docs, "text", "doc_id").collect()}
    # 5 real texts, all identical -> ~80% dup among non-blank rows
    assert sheet[("duplication", "dup_rate_est")] >= 0.7
