"""C4-style heuristic page/line cleaning (Raffel et al. 2020, §2.2).

The canonical web-corpus cleaning recipe the C4 dataset was built
with, as ONE shuffle-free native projection:

line rules (a line survives iff ALL hold):

- ends in a terminal punctuation mark (``. ! ?`` or a closing quote) —
  headings, nav chrome and footers rarely do;
- has at least ``min_line_words`` words (C4 used 5);
- does not contain the word "javascript" (the enable-JS interstitial).

page rules (the whole document drops, ``c4_reason`` says why — the
FIRST failing rule in a fixed order, same observability contract as
``textstats.corpus_filter``):

- ``empty`` — NULL/blank text;
- ``lorem_ipsum`` — placeholder text anywhere on the page;
- ``curly_brace`` — ``{`` anywhere (code, not prose);
- ``blocked_word`` — any word from the caller's blocklist (C4 used the
  "List of Dirty, Naughty …" list; the operator takes the list as a
  parameter rather than shipping one);
- ``too_few_sentences`` — fewer than ``min_sentences`` sentences
  REMAIN after line filtering (sentence ≈ terminal-punct occurrence).

Scale: everything is per-row array/lambda arithmetic inside one
whole-stage-codegen projection — no explode, no window, no shuffle, no
Python. At 100 TB this pass costs one scan and composes with
``line_dedup`` (cross-doc boilerplate) which catches what these
per-page rules cannot, and vice versa.

Relation to the reference: the reference's cleaning stage normalizes
FIELDS (ref: src/pipeline/clean.py-style P1/P2 chains); this is the
page-level web-corpus analogue from the public C4 recipe, added for
the training-data product surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: a line must end with one of these to survive (closing straight or
#: curly quote included, per the C4 rule)
TERMINAL_PUNCT_RE = '[.!?"”’]$'
#: the enable-javascript interstitial marker (word-bounded, any case)
JS_RE = r"\bjavascript\b"
#: sentence counter — terminal punctuation occurrences
SENTENCE_RE = "[.!?]"


def line_keep(ln: Column, min_line_words: int = 5) -> Column:
    """The C4 line predicate as a pure native boolean column."""
    t = F.trim(ln)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")))
    return (t.rlike(TERMINAL_PUNCT_RE)
            & (words >= F.lit(min_line_words))
            & ~F.lower(t).rlike(JS_RE))


def blocklist_pattern(blocklist: list[str]) -> str:
    """Word-bounded alternation over a lowercased blocklist — ONE
    compiled regex per page, not one scan per word."""
    if not blocklist:
        raise ValueError("empty blocklist")
    return r"\b(" + "|".join(sorted(re.escape(w.lower())
                                    for w in blocklist)) + r")\b"


def c4_clean(df: DataFrame, text_col: str = "text",
             min_line_words: int = 5, min_sentences: int = 3,
             blocklist: list[str] | None = None) -> DataFrame:
    """Apply the C4 rules → input columns plus

    - ``c4_reason`` — NULL (kept) or the first failing page rule;
    - ``c4_text`` — the line-filtered page (NULL when dropped);
    - ``c4_sentences`` — sentences remaining after line filtering;
    - ``c4_lines_kept`` / ``c4_lines_total`` — line-rule volume audit.

    The kept path is ``.filter(c4_reason IS NULL)`` and downstream
    reads ``c4_text``. Lambda expressions sit outside codegen CSE, so
    the kept-lines array is STAGED once (``__c4_kept``) and every
    consumer (sentence count, join, size) reads the staged column.
    """
    t = F.col(text_col)
    staged = (df
              .withColumn("__c4_lines", F.split(t, "\n"))
              .withColumn("__c4_kept",
                          F.filter("__c4_lines",
                                   lambda ln: line_keep(ln, min_line_words)))
              .withColumn("__c4_sent",
                          F.aggregate("__c4_kept", F.lit(0),
                                      lambda acc, ln:
                                      acc + F.regexp_count(
                                          ln, F.lit(SENTENCE_RE)))))

    low = F.lower(t)
    reason = F.when(t.isNull() | t.rlike(r"^\s*$"), F.lit("empty"))
    reason = reason.when(low.contains("lorem ipsum"), F.lit("lorem_ipsum"))
    reason = reason.when(t.contains("{"), F.lit("curly_brace"))
    if blocklist:
        reason = reason.when(low.rlike(blocklist_pattern(blocklist)),
                             F.lit("blocked_word"))
    reason = (reason.when(F.col("__c4_sent") < min_sentences,
                          F.lit("too_few_sentences"))
              .otherwise(F.lit(None).cast("string")))

    return (staged
            .withColumn("c4_reason", reason)
            .withColumn("c4_text",
                        F.when(F.col("c4_reason").isNull(),
                               F.array_join("__c4_kept", "\n")))
            .withColumn("c4_sentences", F.col("__c4_sent"))
            .withColumn("c4_lines_kept", F.size("__c4_kept"))
            .withColumn("c4_lines_total", F.size("__c4_lines"))
            .drop("__c4_lines", "__c4_kept", "__c4_sent"))
