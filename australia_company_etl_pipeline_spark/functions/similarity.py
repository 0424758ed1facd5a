"""Similarity scorers (SURVEY.md §2.9 M1–M2).

Two tiers, per the build plan (§7.3):
- ``jaccard_tokens`` — fully native (array_intersect/union on split arrays),
  codegen'd, the oracle-checkable representative.
- ``token_sort_ratio`` — the one deliberate Python boundary: an Arrow
  ``pandas_udf`` (vectorized batches, not the reference's row-at-a-time
  ``@udf`` at ``entity_match.py:473-491``). Uses rapidfuzz when installed,
  else difflib's SequenceMatcher (same Indel-ratio family: 2·M/(len1+len2)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _tokens(name: Column) -> Column:
    return F.array_distinct(
        F.filter(F.split(F.upper(F.trim(name)), r"\s+"), lambda w: w != ""))


def token_set(name: Column) -> Column:
    """Distinct upper-cased whitespace tokens — the precomputable half of
    ``jaccard_tokens``. Materialize this BEFORE a blocking join so each
    side is tokenized once (O(rows)), not once per candidate pair
    (O(pairs)); pair the result with ``jaccard_token_arrays``."""
    return _tokens(name)


def _intersect_count(ta: Column, tb: Column) -> Column:
    """|A∩B| for two DISTINCT, null-free arrays (everything ``_tokens``
    / ``token_set`` produce) — as ``filter`` + ``array_contains``
    instead of ``array_intersect``. Identical counts (pinned against
    6.3M real candidate pairs: zero disagreements), but ~zero per-pair
    allocation: ``ArrayIntersect.nullSafeEval`` builds a fresh
    ``SQLOpenHashSet`` (two backing arrays + rehash) for EVERY pair,
    and at ~6M pairs/query that allocation storm made the scoring
    stage's wall time hostage to young-gen state — the r11 stall probe
    caught 30× reps fully CPU-RUNNABLE inside it (see session.py GC
    note + OPTIMIZATION_r11.md). Token arrays are ≤ a few dozen
    entries, where the O(|A|·|B|) scan is cheaper than hashing."""
    return F.size(F.filter(ta, lambda x: F.array_contains(tb, x)))


def jaccard_token_arrays(ta: Column, tb: Column) -> Column:
    """M2 on precomputed token-set arrays: |A∩B| / (|A|+|B|−|A∩B|).

    Same math as ``jaccard_tokens`` but on pre-tokenized arrays — the
    hot-path form for candidate-pair scoring after a blocking join.
    Inputs must be distinct-element arrays (``token_set``); the union
    size comes from the sizes identity, the intersection count from
    the allocation-free kernel (``_intersect_count``)."""
    inter = _intersect_count(ta, tb).cast("double")
    union = F.size(ta) + F.size(tb) - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return F.when(ta.isNull() | tb.isNull(), F.lit(0.0)).otherwise(sim)


def jaccard_tokens(a: Column, b: Column) -> Column:
    """M2 — token-set Jaccard similarity: |A∩B| / |A∪B|; empty → 0.0.

    Reference: /root/reference/src/transform/entity_match.py:236-250 and
    feature_engineering.py:221-232 (Python set ops per row).
    ``_tokens`` arrays are distinct, so |A∪B| = |A|+|B|−|A∩B| exactly
    and both set ops reduce to the one allocation-free intersection
    count (pre-r11 this was array_intersect + array_union — two
    hash-set builds per pair)."""
    ta, tb = _tokens(a), _tokens(b)
    inter = _intersect_count(ta, tb).cast("double")
    union = F.size(ta) + F.size(tb) - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(sim)


def token_sorted(name: Column) -> Column:
    """Canonical token-sorted form (the 'token_sort' in token_sort_ratio)."""
    return F.array_join(
        F.sort_array(
            F.filter(F.split(F.upper(F.trim(name)), r"\s+"),
                     lambda w: w != "")),
        " ")


def _ratio_batch(a, b):  # pandas Series -> pandas Series
    try:
        from rapidfuzz.fuzz import token_sort_ratio as tsr

        def one(x, y):
            if x is None or y is None:
                return 0.0
            return tsr(x, y) / 100.0
    except ImportError:  # pure-python fallback: Indel ratio on sorted tokens
        from difflib import SequenceMatcher

        def one(x, y):
            if x is None or y is None:
                return 0.0
            xs = " ".join(sorted(str(x).upper().split()))
            ys = " ".join(sorted(str(y).upper().split()))
            if not xs and not ys:
                return 1.0
            return SequenceMatcher(None, xs, ys, autojunk=False).ratio()
    import pandas as pd

    return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="float64")


_token_sort_ratio_udf = None


def token_sort_ratio(a: Column, b: Column) -> Column:
    """M1 — token_sort_ratio(a, b) / 100 ∈ [0, 1]; errors/nulls → 0.0.

    Reference: /root/reference/src/transform/entity_match.py:473-491
    (row-at-a-time UDF; ours is an Arrow-batched pandas_udf).

    Backend parity (rapidfuzz vs the difflib fallback): rapidfuzz's
    ``token_sort_ratio`` is the Indel similarity 2·LCS/(|a|+|b|) on the
    token-sorted uppercased strings; difflib's ``SequenceMatcher.ratio``
    is Ratcliff–Obershelp 2·M/(|a|+|b|), where M comes from greedy
    longest-matching-block recursion, so M ≤ LCS and difflib can only
    under-score. Golden values for the reference's fixture pairs are
    IDENTICAL under both backends (pinned in
    tests/test_functions.py::test_token_sort_ratio_reference_goldens):
    ("ACME","ACME")→1.0, ("SOLUTIONS TECH","TECH SOLUTIONS")→1.0,
    ("ACME","ACME CORPORATION")→0.4, ("ACME","ACME PTY LTD")→0.5,
    ("TECH SOLUTIONS","TECH SOLUTIONS AUSTRALIA")→0.736842. Divergence
    appears only on adversarial strings where greedy blocking misses the
    LCS — measured examples: ("A B  BCCA", "AB C A AC ") difflib 0.315789
    vs Indel 0.526316 (Δ−0.210526); ("BBABB", "CC CA BB ") 0.285714 vs
    0.428571 (Δ−0.142857) — i.e. far below any match threshold either
    way, so cascade banding is unaffected.
    """
    global _token_sort_ratio_udf
    if _token_sort_ratio_udf is None:
        _token_sort_ratio_udf = F.pandas_udf(_ratio_batch, DoubleType())
    return _token_sort_ratio_udf(a, b)


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """Native fallback scorer (SURVEY §2.9 M1 'pure-Spark fallback'):
    1 - levenshtein/max_len on token-sorted strings. Stays JVM-side, so
    it's the scale path when a few % score skew is acceptable."""
    sa, sb = token_sorted(a), token_sorted(b)
    max_len = F.greatest(F.length(sa), F.length(sb))
    sim = F.when(max_len > 0,
                 1.0 - F.levenshtein(sa, sb) / max_len).otherwise(F.lit(1.0))
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(sim)
