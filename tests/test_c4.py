"""C4-style page/line cleaning (operators/c4.py, r7).

Goldens pin every clause of the documented contract (line rules, page
rules, rule precedence, reassembly, audit counters); the registered
kind='c4'/'c4text' fold is value-checked against the arithmetic-derived
DuckDB oracle by tests/test_queries_oracle.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import c4


def clean_one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return c4.c4_clean(df, "text", **kw).head().asDict()


GOOD_PAGE = ("This is the first proper sentence here.\n"
             "And here is another complete sentence too.\n"
             "Finally a third full sentence closes it.")


def test_clean_page_kept_verbatim(spark):
    r = clean_one(spark, GOOD_PAGE)
    assert r["c4_reason"] is None
    assert r["c4_text"] == GOOD_PAGE
    assert r["c4_sentences"] == 3
    assert r["c4_lines_kept"] == 3 and r["c4_lines_total"] == 3


# --- line rules --------------------------------------------------------------

@pytest.mark.parametrize("line,kept", [
    ("This line ends with a period.", True),
    ("Does this line end with a question mark?", True),
    ("This line ends with an exclamation mark!", True),
    ('He said this whole line is "quoted."', True),
    ("This line has no terminal punctuation at all", False),
    ("Home | About | Contact", False),
    ("Too short line.", False),                       # < 5 words
    ("One two three four five.", True),               # exactly 5
    ("Please enable javascript to view this content.", False),
    ("Please enable JavaScript to view this content.", False),  # any case
    ("The word javascripted is not the word itself ok.", True),  # \b bound
    ("   Padded line still counts its five words.   ", True),    # trimmed
])
def test_line_rules(spark, line, kept):
    page = GOOD_PAGE + "\n" + line
    r = clean_one(spark, page)
    assert r["c4_reason"] is None
    assert (line.strip() in r["c4_text"]) == kept
    assert r["c4_lines_kept"] == 3 + kept


# --- page rules and precedence ----------------------------------------------

@pytest.mark.parametrize("suffix,reason", [
    ("\nSome Lorem Ipsum dolor sit amet filler.", "lorem_ipsum"),
    ("\nvar f = function() { return 1; }", "curly_brace"),
])
def test_page_rules(spark, suffix, reason):
    r = clean_one(spark, GOOD_PAGE + suffix)
    assert r["c4_reason"] == reason
    assert r["c4_text"] is None


def test_too_few_sentences_counts_only_kept_lines(spark):
    # two proper sentences + one sentence on a dropped (short) line:
    # the dropped line's period must NOT count
    page = ("This is the first proper sentence here.\n"
            "And here is another complete sentence too.\n"
            "Dropped line.")
    r = clean_one(spark, page)
    assert r["c4_reason"] == "too_few_sentences"
    assert r["c4_sentences"] == 2


def test_multi_sentence_line_counts_each(spark):
    page = "One sentence here. Another one here. And a third one here."
    r = clean_one(spark, page)
    assert r["c4_reason"] is None and r["c4_sentences"] == 3


@pytest.mark.parametrize("text,reason", [
    (None, "empty"),
    ("", "empty"),
    ("   \n  ", "empty"),
])
def test_empty(spark, text, reason):
    r = clean_one(spark, text)
    assert r["c4_reason"] == reason


def test_blocklist_word_bounded(spark):
    kw = dict(blocklist=["badword", "otherbad"])
    r = clean_one(spark, GOOD_PAGE + "\nThis page mentions badword sadly.",
                  **kw)
    assert r["c4_reason"] == "blocked_word"
    # substring is NOT a word match
    r2 = clean_one(spark, GOOD_PAGE + "\nThis mentions notbadwordish only.",
                   **kw)
    assert r2["c4_reason"] is None


def test_precedence_lorem_beats_curly_beats_sentences(spark):
    r = clean_one(spark, "lorem ipsum { x }")
    assert r["c4_reason"] == "lorem_ipsum"
    r2 = clean_one(spark, "short { x }")
    assert r2["c4_reason"] == "curly_brace"


def test_knobs(spark):
    # min_line_words=3 admits the short line; min_sentences=2 passes
    page = ("This is the first proper sentence here.\nTiny line here.")
    r = clean_one(spark, page, min_line_words=3, min_sentences=2)
    assert r["c4_reason"] is None
    assert r["c4_text"] == page


def test_plan_is_shuffle_free(spark):
    """One whole-stage-codegen projection: no Exchange, no Python."""
    df = spark.createDataFrame([(1, GOOD_PAGE)], "id long, text string")
    plan = (c4.c4_clean(df, "text", blocklist=["bad"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan
