"""Match kernel (SURVEY §7.2 M3 — the flagship path).

Re-expression of ``match_companies_spark``
(``/root/reference/src/transform/entity_match.py:437-628``):

    block join (J1) → pairwise fuzzy score (M1/M2) → band split (P7/M6)
    → LLM rescore of the uncertain band (M5) → weighted final score (F20)
    → union (U1) → 11-column contract

Differences by design (SURVEY §4.2):
- the small CC side is broadcast, not the 2M-row ABR side;
- the LLM stage is a distributed ``mapInPandas`` against a pluggable
  scorer, not a driver-side ``toPandas()`` loop over sequential API calls;
  the default scorer is a deterministic stub (testable, offline — the
  reference's neutral-0.5 fallback generalized, ``llm_matcher.py:129-136``).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as fx
from ..operators.block_join import block_join

# Output contract, entity_match.py:610-626.
# (lo, hi, scorer, declared-context) -> the band-masked pandas_udf; see
# the cache note at its build site for why re-creating the udf per call
# is a session-level performance hazard, not just wasted work.
# BOUNDED (r11): keyed on scorer *identity*, so a long-lived service
# constructing a scorer closure/partial per request would otherwise
# accumulate one pandas_udf entry per call forever — an OrderedDict LRU
# capped at _LLM_UDF_CACHE_MAX keeps the steady-state set (module-level
# scorer singletons × band configs) hot while evicting per-request
# churn. Unhashable scorers (e.g. a dataclass with eq=True) skip the
# cache entirely and get a fresh (uncached) udf — correct, just without
# the reuse win.
from collections import OrderedDict as _OrderedDict

_LLM_UDF_CACHE: "_OrderedDict[tuple, object]" = _OrderedDict()
_LLM_UDF_CACHE_MAX = 32

RESULT_COLUMNS = [
    "crawl_name", "crawl_url", "abr_name", "abn", "fuzzy_score",
    "llm_score", "final_score", "match_method", "state", "postcode",
    "start_date",
]

SCORERS = {
    "token_sort": fx.token_sort_ratio,   # M1 parity path (Arrow pandas_udf)
    "jaccard": fx.jaccard_tokens,        # M2 native path (codegen, scale)
    "levenshtein": fx.levenshtein_ratio,  # native edit-distance path
}


def stub_llm_scorer(batch: pd.DataFrame) -> pd.Series:
    """M5 deterministic stub: interface-compatible with the reference's
    LLMMatcher (llm_matcher.py:69-136) but offline and reproducible.

    Scores name-pair agreement on token overlap, shifted to the LLM's
    [0.3, 1.0]-ish verdict range; unavailable-LLM neutral is 0.5.
    """
    # upper-casing vectorized in C; per-row set math stays Python (this is
    # the stand-in for a per-pair external call — cost model is per row)
    ca = batch["crawl_name"].fillna("").astype(str).str.upper().str.split()
    ab = batch["abr_name"].fillna("").astype(str).str.upper().str.split()

    def one(a: list, b: list) -> float:
        if not a or not b:
            return 0.5
        ta, tb = set(a), set(b)
        return round(0.3 + 0.7 * (len(ta & tb) / len(ta | tb)), 4)

    return pd.Series([one(a, b) for a, b in zip(ca, ab)],
                     index=batch.index)


# Columns the stub actually reads — the cascade ships ONLY these through
# Arrow (plus fuzzy_score for the band mask). Custom scorers declare
# their own ``context_cols``; undeclared scorers get the full reference
# prompt context (see _LLM_CONTEXT_COLS below).
stub_llm_scorer.context_cols = ("crawl_name", "abr_name")


def match_companies(crawl_df: DataFrame, abr_df: DataFrame,
                    fuzzy_threshold: float = 0.75,
                    use_llm: bool = False,
                    llm_threshold_min: float = 0.60,
                    fuzzy_weight: float = 0.70,
                    llm_weight: float = 0.30,
                    scorer: str | Callable = "token_sort",
                    llm_scorer: Callable[[pd.DataFrame], pd.Series] = stub_llm_scorer,
                    broadcast_side: str | None = "left") -> DataFrame:
    """Entity-match cascade; returns the 11-column match contract.

    crawl_df / abr_df must be cleaned (have normalized_name + block_key);
    see ``pipeline.clean``.
    """
    score_fn = SCORERS[scorer] if isinstance(scorer, str) else scorer

    # Hot-path scorer: tokenize each side ONCE before the join (O(rows)),
    # score pairs with a single array_intersect (O(pairs) but cheap) —
    # never re-split strings per candidate pair.
    if scorer == "jaccard":
        crawl_df = crawl_df.withColumn(
            "__toks", fx.token_set(F.col("normalized_name")))
        abr_df = abr_df.withColumn(
            "__toks", fx.token_set(F.col("normalized_name")))
        score_expr = lambda: fx.jaccard_token_arrays(  # noqa: E731
            F.col("l.__toks"), F.col("r.__toks"))
    else:
        score_expr = lambda: score_fn(  # noqa: E731
            F.col("l.normalized_name"), F.col("r.normalized_name"))

    pairs = block_join(crawl_df, abr_df, key="block_key",
                       broadcast_side=broadcast_side)
    scored = (pairs
              .withColumn("fuzzy_score", score_expr())
              .select(F.col("l.company_name").alias("crawl_name"),
                      F.col("l.url").alias("crawl_url"),
                      F.col("l.industry").alias("industry"),
                      F.col("r.entity_name").alias("abr_name"),
                      F.col("r.abn").alias("abn"),
                      F.col("fuzzy_score"),
                      F.col("r.state").alias("state"),
                      F.col("r.postcode").alias("postcode"),
                      F.col("r.start_date").alias("start_date")))

    if not use_llm:
        return (scored
                .filter(F.col("fuzzy_score") >= fuzzy_threshold)
                .withColumn("llm_score", F.lit(None).cast("double"))
                .withColumn("final_score", F.col("fuzzy_score"))
                .withColumn("match_method", F.lit("fuzzy"))
                .select(*RESULT_COLUMNS))

    # Single-pass cascade. A high/uncertain branch fork + union would scan
    # the block join TWICE (a DAG fork recomputes its input absent an
    # explicit materialization); instead: one band filter, then the LLM
    # score as a band-masked Arrow pandas_udf — the (expensive, possibly
    # external) scorer fires only for rows inside the uncertain band, and
    # high-band rows pass through with a NULL llm_score. Distributed, vs
    # the reference's driver-side sequential loop (entity_match.py:536-576).
    lo, hi = float(llm_threshold_min), float(fuzzy_threshold)

    # Arrow payload discipline: a projection-level pandas_udf is evaluated
    # for EVERY surviving row (Catalyst extracts it into an ArrowEvalPython
    # node — a `when(band, udf)` guard would not skip serialization), so
    # the transfer is trimmed two ways instead:
    #   1. only the columns the active scorer DECLARES (``context_cols``
    #      attribute) cross the boundary — the stub reads just the two
    #      names; an undeclared custom scorer gets the full reference
    #      prompt context (url/industry/state/postcode,
    #      entity_match.py:552-563) for compatibility;
    #   2. every context field is band-masked to NULL *outside* the udf,
    #      so high-band rows (the majority) ship one double + null
    #      bitmaps, not strings.
    # The in-udf mask then fires the scorer only for uncertain-band rows.
    _LLM_CONTEXT_COLS = ("crawl_name", "abr_name", "crawl_url", "industry",
                         "state", "postcode")
    declared = tuple(getattr(llm_scorer, "context_cols", _LLM_CONTEXT_COLS))
    in_band = (F.col("fuzzy_score") >= lo) & (F.col("fuzzy_score") < hi)
    ctx = [F.col("fuzzy_score")] + [
        F.when(in_band, F.col(c)).otherwise(F.lit(None)).alias(c)
        for c in declared if c != "fuzzy_score"]

    # The udf object is CACHED per (band, scorer) key (r10): a fresh
    # pandas_udf per builder call re-registers new function/codegen
    # artifacts every repetition, and on a long-lived session that
    # churn was measured to trigger JIT deoptimization storms in
    # UNRELATED whole-stage-codegen loops (the bench's blocking-join
    # reps swung 3s → 48-208s on an IDENTICAL final adaptive plan,
    # CPU-bound in interpreted ArrayIntersect, and stabilized at
    # 2.8s ± 0.1 once the udf object was reused). One udf per band
    # config is also simply the right lifetime — the closure only
    # depends on (lo, hi, scorer).
    key = (lo, hi, llm_scorer, declared)
    try:
        llm_batch = _LLM_UDF_CACHE.get(key)
        if llm_batch is not None:
            _LLM_UDF_CACHE.move_to_end(key)
    except TypeError:
        # unhashable scorer: build an uncached udf below (pre-r10
        # behavior) — correctness over reuse
        key, llm_batch = None, None
    if llm_batch is None:
        @F.pandas_udf("double")
        def llm_batch(pair: pd.DataFrame) -> pd.Series:
            fuzzy = pair["fuzzy_score"]
            out = pd.Series(pd.NA, index=pair.index, dtype="Float64")
            mask = (fuzzy >= lo) & (fuzzy < hi)
            if mask.any():
                out[mask] = llm_scorer(
                    pair[mask].reset_index(drop=True)).to_numpy()
            return out

        # An external scorer is not a pure function of its column
        # inputs, and declaring that stops Catalyst from inlining the
        # call into the final-score filter downstream — which would
        # materialize a SECOND ArrowEvalPython stage and send every
        # surviving pair through Arrow (and the scorer) twice. Locked
        # by tests/test_plan_shapes.py.
        llm_batch = llm_batch.asNondeterministic()
        if key is not None:
            _LLM_UDF_CACHE[key] = llm_batch
            while len(_LLM_UDF_CACHE) > _LLM_UDF_CACHE_MAX:
                _LLM_UDF_CACHE.popitem(last=False)

    high_band = F.col("fuzzy_score") >= fuzzy_threshold
    return (scored
            .filter(F.col("fuzzy_score") >= llm_threshold_min)
            .withColumn("llm_score", llm_batch(F.struct(*ctx)))
            .withColumn("final_score",
                        F.when(high_band, F.col("fuzzy_score"))
                        .otherwise(F.round(
                            fuzzy_weight * F.col("fuzzy_score")
                            + llm_weight * F.col("llm_score"), 6)))
            .withColumn("match_method",
                        F.when(high_band, F.lit("fuzzy"))
                        .otherwise(F.lit("hybrid")))
            .filter(F.col("final_score") >= fuzzy_threshold)
            .select(*RESULT_COLUMNS))


def best_match_per_key(matches: DataFrame, key: str = "abn",
                       tie_break: str = "crawl_url") -> DataFrame:
    """W1/W3 — top-1 match per key, deterministic tie-break
    (score desc, tie_break asc) per SURVEY §7.4.3."""
    from pyspark.sql.window import Window

    win = Window.partitionBy(key).orderBy(
        F.desc("final_score"), F.asc(tie_break))
    return (matches.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1).drop("__rn"))
