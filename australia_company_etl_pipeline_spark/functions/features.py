"""M3/M4 — pairwise match-feature vector + linear match probability.

Re-expression of the reference's FeatureEngineer
(``/root/reference/src/transform/feature_engineering.py:33-232``) and
``compute_match_probability`` (``:256-289``) as native Column expressions —
one ``select`` evaluates all 12 features for every candidate pair inside
whole-stage codegen (the reference loops row-by-row in Python,
``:241-252``).

Fuzzy-feature semantics follow the reference's no-rapidfuzz fallback path
(``:106-112``: token Jaccard stands in for ratio/token_sort/token_set/
partial_ratio) — that is also what its recorded run used, and it keeps
every feature SQL-expressible for the DuckDB oracle. A rapidfuzz-backed
variant of the four fuzzy features can drop in via
``similarity.token_sort_ratio`` (Arrow pandas_udf) when bit-parity with a
rapidfuzz deployment is required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .similarity import jaccard_tokens
from .text import extract_domain, normalize_company_name

# feature_engineering.py:174-183
STATE_VARIANTS: dict[str, tuple[str, ...]] = {
    "NSW": ("nsw", "new south wales", "sydney"),
    "VIC": ("vic", "victoria", "melbourne"),
    "QLD": ("qld", "queensland", "brisbane"),
    "SA": ("south australia", "adelaide"),
    "WA": ("western australia", "perth"),
    "TAS": ("tasmania", "hobart"),
    "NT": ("northern territory", "darwin"),
    "ACT": ("act", "canberra", "australian capital"),
}

# feature_engineering.py:214-216
COMPANY_TYPES = ("PRV", "PUB", "Private Company", "Public Company")

# compute_match_probability weights, feature_engineering.py:267-275
# (weights sum to 1.0, so the reference's total_weight division is a no-op
# when all features are present — our vector always carries all of them).
FEATURE_WEIGHTS: dict[str, float] = {
    "name_exact_match": 0.30,
    "name_token_sort": 0.20,
    "name_token_set": 0.15,
    "domain_name_match": 0.15,
    "domain_contains_name": 0.10,
    "state_mentioned": 0.05,
    "postcode_mentioned": 0.05,
}


def _flag(cond: Column) -> Column:
    return F.when(F.coalesce(cond, F.lit(False)), 1.0).otherwise(0.0)


def feature_columns(crawl_name: Column, entity_name: Column, url: Column,
                    raw_text: Column, state: Column, postcode: Column,
                    industry: Column, entity_type: Column
                    ) -> dict[str, Column]:
    """The 12-feature vector of feature_engineering.py:33-74, as named
    Column expressions (apply in ONE select over candidate pairs)."""
    empty = (crawl_name.isNull() | entity_name.isNull()
             | (crawl_name == "") | (entity_name == ""))
    exact = F.when(empty, 0.0).otherwise(
        _flag(normalize_company_name(crawl_name)
              == normalize_company_name(entity_name)))
    # fallback fuzzy block (:106-112): token Jaccard for all four
    jacc = F.when(empty, 0.0).otherwise(jaccard_tokens(crawl_name,
                                                       entity_name))

    # domain features (:118-154)
    domain = F.lower(extract_domain(url))
    norm_parts = F.filter(
        F.split(F.lower(normalize_company_name(entity_name)), r"\s+"),
        lambda t: t != "")
    contains_name = F.exists(
        F.filter(norm_parts, lambda t: F.length(t) >= 4),
        lambda t: domain.contains(t))
    domain_clean = F.regexp_replace(
        F.regexp_replace(domain, r"\.com\.au$|\.au$", ""),
        "[^a-z0-9]", "")
    name_clean = F.regexp_replace(F.array_join(norm_parts, ""),
                                  "[^a-z0-9]", "")
    dom_guard = url.isNull() | entity_name.isNull() | (url == "") \
        | (entity_name == "")
    domain_match = F.when(dom_guard, 0.0).otherwise(
        _flag((domain_clean != "") & (name_clean != "")
              & (domain_clean == name_clean)))
    domain_contains = F.when(dom_guard, 0.0).otherwise(_flag(contains_name))

    # location features (:156-196)
    text_lower = F.lower(raw_text)
    # fallback for codes outside STATE_VARIANTS: check the literal state
    # string in the text (feature_engineering.py uses [state.lower()] when
    # the code has no variant list)
    mentioned = text_lower.contains(F.lower(state))
    for code, variants in STATE_VARIANTS.items():
        any_variant = F.lit(False)
        for v in variants:
            any_variant = any_variant | text_lower.contains(v)
        mentioned = F.when(F.upper(state) == code, any_variant) \
            .otherwise(mentioned)
    state_mentioned = F.when(raw_text.isNull() | state.isNull(), 0.0) \
        .otherwise(_flag(mentioned))
    postcode_mentioned = F.when(raw_text.isNull() | postcode.isNull(), 0.0) \
        .otherwise(_flag(raw_text.contains(postcode)))

    # industry features (:198-221)
    industry_present = _flag(industry.isNotNull() & (industry != ""))
    is_company = _flag(entity_type.isin(*COMPANY_TYPES))

    return {
        "name_exact_match": exact,
        "normalized_exact": exact,
        "name_fuzzy_ratio": jacc,
        "name_token_sort": jacc,
        "name_token_set": jacc,
        "name_partial_ratio": jacc,
        "domain_name_match": domain_match,
        "domain_contains_name": domain_contains,
        "state_mentioned": state_mentioned,
        "postcode_mentioned": postcode_mentioned,
        "industry_present": industry_present,
        "is_company": is_company,
    }


def match_probability(features: dict[str, Column]) -> Column:
    """M4 — linear match probability (feature_engineering.py:256-289):
    weighted sum over the 7 scoring features (weights sum to 1.0)."""
    score = F.lit(0.0)
    for name, w in FEATURE_WEIGHTS.items():
        score = score + F.lit(w) * features[name]
    return score


def with_features(pairs, crawl_name="crawl_name", entity_name="abr_name",
                  url="crawl_url", raw_text="raw_text", state="state",
                  postcode="postcode", industry="industry",
                  entity_type="entity_type", prob_col="match_probability"):
    """Append the 12 feature columns + match_probability to a pair frame."""
    feats = feature_columns(
        F.col(crawl_name), F.col(entity_name), F.col(url), F.col(raw_text),
        F.col(state), F.col(postcode), F.col(industry), F.col(entity_type))
    out = pairs
    for name, c in feats.items():
        out = out.withColumn(name, c)
    return out.withColumn(prob_col, F.round(match_probability(feats), 6))
