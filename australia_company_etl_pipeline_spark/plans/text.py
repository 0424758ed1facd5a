"""Text-analysis queries over `documents` (training-data extensions).

Every operator here is a native expression with a full DuckDB SQL twin —
token counting, language-ID heuristic, quality scoring, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import textstats as ts
from .registry import register

_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"


def _hits(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKS}, t -> t IN ({inlist})))"


@register(
    "doc_token_stats",
    doc="Token counting: whitespace tokens + BPE-ish pre-tokenization "
        "units (\\w+ runs and solo symbols) + mean token length.",
    tags=("text",),
    oracle=f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_units,
       round(CASE WHEN len({_TOKS}) > 0 THEN
             CAST(list_aggregate(list_transform({_TOKS}, t -> length(t)),
                  'sum') AS DOUBLE) / len({_TOKS})
             ELSE 0.0 END, 6) AS mean_token_len
FROM documents
""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ts.token_count(F.col("text")).alias("n_tokens"),
        ts.bpe_ish_token_count(F.col("text")).alias("n_units"),
        ts.mean_token_len(F.col("text")).alias("mean_token_len"))


@register(
    "doc_lang_profile",
    doc="Language-ID heuristic: per-language marker-word ratios and the "
        "argmax prediction ('und' below 5% ratio, alphabetical tie-break).",
    tags=("text",),
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         round(CASE WHEN len({_TOKS}) > 0 THEN
               CAST({_hits(ts.LANG_MARKERS['de'])} AS DOUBLE) / len({_TOKS})
               ELSE 0.0 END, 6) AS de_ratio,
         round(CASE WHEN len({_TOKS}) > 0 THEN
               CAST({_hits(ts.LANG_MARKERS['en'])} AS DOUBLE) / len({_TOKS})
               ELSE 0.0 END, 6) AS en_ratio,
         round(CASE WHEN len({_TOKS}) > 0 THEN
               CAST({_hits(ts.LANG_MARKERS['es'])} AS DOUBLE) / len({_TOKS})
               ELSE 0.0 END, 6) AS es_ratio,
         round(CASE WHEN len({_TOKS}) > 0 THEN
               CAST({_hits(ts.LANG_MARKERS['fr'])} AS DOUBLE) / len({_TOKS})
               ELSE 0.0 END, 6) AS fr_ratio
  FROM documents
)
SELECT doc_id, de_ratio, en_ratio, es_ratio, fr_ratio,
       CASE WHEN greatest(de_ratio, en_ratio, es_ratio, fr_ratio) < 0.05
            THEN 'und'
            WHEN de_ratio = greatest(de_ratio, en_ratio, es_ratio, fr_ratio)
            THEN 'de'
            WHEN en_ratio = greatest(de_ratio, en_ratio, es_ratio, fr_ratio)
            THEN 'en'
            WHEN es_ratio = greatest(de_ratio, en_ratio, es_ratio, fr_ratio)
            THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM scored
""",
)
def doc_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scores = ts.lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        *[scores[lang].alias(f"{lang}_ratio") for lang in sorted(scores)],
        ts.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "doc_quality",
    doc="Document quality scoring: length saturation, punctuation penalty, "
        "mean-word-length plausibility, stopword signal — weighted to [0,1].",
    tags=("text",),
    oracle=f"""
WITH parts AS (
  SELECT doc_id,
         least(CAST(length(text) AS DOUBLE) / 500, 1.0) AS length_score,
         round(CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
               / length(text) ELSE 0.0 END, 6) AS p_ratio,
         round(CASE WHEN len({_TOKS}) > 0 THEN
               CAST(list_aggregate(list_transform({_TOKS}, t -> length(t)),
                    'sum') AS DOUBLE) / len({_TOKS}) ELSE 0.0 END, 6) AS mtl,
         round(CASE WHEN len({_TOKS}) > 0 THEN
               CAST({_hits(ts.LANG_MARKERS['en'])} AS DOUBLE) / len({_TOKS})
               ELSE 0.0 END, 6) AS stop_ratio
  FROM documents
), units AS (
  -- integer micro-units: exact weighted sum on the 1e-7 grid, half-up
  -- to 1e-6 (same arithmetic as the Spark operator — no float ties)
  SELECT doc_id, p_ratio, stop_ratio,
         CAST(round(length_score * 1000000) AS BIGINT) AS ls6,
         CAST(round(p_ratio * 1000000) AS BIGINT) AS p6,
         CASE WHEN mtl >= 3.0 AND mtl <= 10.0
              THEN 1000000 ELSE 500000 END AS ws6,
         CAST(round(stop_ratio * 1000000) AS BIGINT) AS s6
  FROM parts
)
SELECT doc_id, p_ratio AS punct_ratio, stop_ratio AS stopword_ratio,
       floor((4 * ls6
            + 3 * (1000000 - least(p6 * 4, 1000000))
            + 2 * ws6
            + least(s6 * 5, 1000000) + 5) / 10.0) / 1000000.0 AS quality
FROM units
""",
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ts.punct_ratio(F.col("text")).alias("punct_ratio"),
        ts.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        ts.quality_score(F.col("text")).alias("quality"))


@register(
    "doc_fingerprint",
    doc="Document fingerprinting: polynomial rolling hash mod 1e9+7 over "
        "characters — engine-portable (same fold in DuckDB via list_reduce).",
    tags=("text",),
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(text, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS fp
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", ts.fingerprint(F.col("text")).alias("fp"))
