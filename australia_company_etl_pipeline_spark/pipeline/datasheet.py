"""Corpus datasheet — the "datasheets for datasets" rollup.

One call summarizing what a text corpus IS (Gebru et al. 2021 ask for
exactly this before anyone trains on it): volume, length distribution,
quality distribution, language mix, intra-doc repetition, estimated
exact-duplicate rate, and PII exposure — as one LONG frame
``(section, key, value)`` ready to persist next to a release or diff
between two snapshots (the batch twin of ``profile_drift``'s feed
monitoring, at corpus grain).

Cost, stated exactly (the operator is a composition of kernels that
are each oracle-gated elsewhere — this module adds no new math, only
the report shape):

- ONE scan + aggregate computes every scalar section (volume, length
  percentiles, quality, repetition, the HLL++ dup-rate sketch) — the
  token array is staged once, the percentiles are GK sketches, the
  distinct count is HLL++, so the aggregate state is bounded;
- ONE partial-agg groupBy for the language mix;
- ONE scan for the PII hit counts (``textstats.pii_stats``).

Three jobs over a 100 TB corpus, no window, no join, no collect
beyond the report's own ≤ a-few-dozen rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import textstats as ts


def corpus_datasheet(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """→ ``(section, key, value: double)`` rows. Sections: ``volume``
    (n_docs, n_null_text, total_tokens, total_chars), ``length``
    (token-count mean/p10/p50/p90/max), ``quality`` (mean/p10/p50/p90),
    ``repetition`` (mean token/line dup ratios), ``duplication``
    (HLL++ exact-dup-rate estimate), ``langs`` (per-language doc
    counts), ``pii`` (per-kind hit counts)."""
    t = F.col(text_col)
    staged = docs.withColumn("__toks", ts.tokens(t))
    ntok = ts.token_count_t(F.col("__toks")).cast("double")
    qual = ts.quality_score_t(t, F.col("__toks"))

    row = staged.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.when(t.isNull() | (F.trim(t) == ""), 1).otherwise(0))
        .cast("double").alias("n_null_text"),
        F.sum(F.coalesce(ntok, F.lit(0.0))).alias("total_tokens"),
        F.sum(F.coalesce(F.length(t).cast("double"), F.lit(0.0)))
        .alias("total_chars"),
        F.avg(ntok).alias("len_mean"),
        F.percentile_approx(ntok, [0.1, 0.5, 0.9]).alias("len_p"),
        F.max(ntok).alias("len_max"),
        F.avg(qual).alias("q_mean"),
        F.percentile_approx(qual, [0.1, 0.5, 0.9]).alias("q_p"),
        F.avg(ts.token_dup_ratio_t(F.col("__toks")))
        .alias("rep_tokens"),
        F.avg(ts.line_dup_ratio(t)).alias("rep_lines"),
        # numerator masked with the SAME null-or-blank predicate the
        # n_null_text denominator correction uses — counting blank
        # variants as distinct while excluding them from the
        # denominator would understate (even zero out) a real dup rate
        F.approx_count_distinct(
            F.when(t.isNull() | (F.trim(t) == ""), None)
            .otherwise(F.md5(t)), 0.02).cast("double")
        .alias("n_distinct"))

    metrics: list[tuple[str, str, "F.Column"]] = [
        ("volume", "n_docs", F.col("n_docs")),
        ("volume", "n_null_text", F.col("n_null_text")),
        ("volume", "total_tokens", F.col("total_tokens")),
        ("volume", "total_chars", F.col("total_chars")),
        ("length", "mean", F.col("len_mean")),
        ("length", "p10", F.col("len_p")[0]),
        ("length", "p50", F.col("len_p")[1]),
        ("length", "p90", F.col("len_p")[2]),
        ("length", "max", F.col("len_max")),
        ("quality", "mean", F.col("q_mean")),
        ("quality", "p10", F.col("q_p")[0]),
        ("quality", "p50", F.col("q_p")[1]),
        ("quality", "p90", F.col("q_p")[2]),
        ("repetition", "token_dup_ratio", F.col("rep_tokens")),
        ("repetition", "line_dup_ratio", F.col("rep_lines")),
        # approx_count_distinct(md5(text)) skips NULL-text rows, so the
        # denominator must too — dividing by n_docs would report a 10%-
        # NULL zero-dup corpus as ~10% duplicated (ADVICE r7); NULLIF
        # guards the all-NULL corpus (rate 0, not a divide-by-zero)
        ("duplication", "dup_rate_est",
         F.greatest(F.lit(0.0), F.coalesce(
             F.lit(1.0) - F.col("n_distinct")
             / F.nullif(F.col("n_docs") - F.col("n_null_text"),
                        F.lit(0)), F.lit(0.0)))),
    ]
    scalars = (row.select(F.explode(F.array(*[
        F.struct(F.lit(s).alias("section"), F.lit(k).alias("key"),
                 v.cast("double").alias("value"))
        for s, k, v in metrics])).alias("kv"))
        .select("kv.section", "kv.key",
                F.round("kv.value", 6).alias("value")))

    langs = (staged
             .groupBy(ts.lang_id_t(F.col("__toks")).alias("key"))
             .agg(F.count(F.lit(1)).cast("double").alias("value"))
             .select(F.lit("langs").alias("section"), "key", "value"))

    pii = (ts.pii_stats(docs, text_col)
           .select(F.lit("pii").alias("section"),
                   F.col("kind").alias("key"),
                   F.col("n_hits").cast("double").alias("value")))

    return scalars.unionByName(langs).unionByName(pii)
