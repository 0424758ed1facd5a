"""End-to-end entity-resolution pipeline tests.

Mirrors the reference's tests/test_matching.py semantics (fixtures from
tests/conftest.py:14-64) against our clean → match → marts path, plus the
dbt-parity assertion suite (SURVEY §5.2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark import operators as ops
from australia_company_etl_pipeline_spark import pipeline as pl

CC_RAW = [
    # (url, company_name, industry, raw_text)
    ("https://www.acme.com.au/about", "ACME Corporation Pty Ltd",
     "Manufacturing", "Welcome to ACME Corporation."),
    ("https://techcorp.com.au/", "TechCorp Australia",
     "Technology", "TechCorp provides technology solutions."),
    ("https://greenenergy.com.au/services", "Green Energy Partners Pty Ltd",
     "Energy", "Green Energy Partners for sustainable energy."),
    # noise rows that cleaning must drop
    ("https://bad.com.au", "A", None, "too short"),
    ("https://empty.com.au", None, None, "no name"),
]

ABR_RAW = [
    # (abn, entity_name, entity_type, entity_status, state, postcode, start_date)
    ("51824753556", "ACME Corporation Pty Ltd", "PRV", "Active", "NSW",
     "2000", "2020-01-01"),
    ("10000000032", "TechCorp Australia Pty Ltd", "PRV", "Active", "VIC",
     "3000", "2019-06-15"),
    ("53004085616", "Green Energy Partners Pty Ltd", "PRV", "Active", "QLD",
     "4000", "20180320"),
    # invalid ABN checksum — must be dropped
    ("12345678901", "Checksum Fail Pty Ltd", "PRV", "Active", "NSW",
     "2000", "2020-01-01"),
    # duplicate ABN — dedup keeps first by entity_name
    ("51824753556", "ZZ Duplicate ACME", "PRV", "Active", "NSW",
     "2000", "2020-01-01"),
]


@pytest.fixture(scope="module")
def cleaned(spark):
    cc_raw = spark.createDataFrame(
        CC_RAW, "url string, company_name string, industry string, raw_text string")
    abr_raw = spark.createDataFrame(
        ABR_RAW, "abn string, entity_name string, entity_type string, "
                 "entity_status string, state string, postcode string, "
                 "start_date string")
    return pl.clean_web_companies(cc_raw), pl.clean_abr_entities(abr_raw)


def test_cleaning_drops_invalid(cleaned):
    cc, abr = cleaned
    assert cc.count() == 3                       # noise rows dropped
    abr_rows = {r.abn: r for r in abr.collect()}
    assert "12345678901" not in abr_rows         # bad checksum dropped
    assert len(abr_rows) == 3                    # duplicate ABN deduped
    assert abr_rows["51824753556"].entity_name == "ACME Corporation Pty Ltd"
    assert abr_rows["53004085616"].start_date is not None  # yyyyMMdd parsed


def test_block_keys_align(cleaned):
    cc, abr = cleaned
    assert {r.block_key for r in cc.collect()} == {"acme", "tech", "gree"}
    assert {r.block_key for r in abr.collect()} == {"acme", "tech", "gree"}


def test_exact_name_match(cleaned):
    """Reference test_matching.py:55-60 — exact names match ≥ threshold."""
    cc, abr = cleaned
    matches = pl.match_companies(cc, abr, scorer="token_sort").collect()
    assert len(matches) == 3
    assert all(m.final_score >= 0.75 for m in matches)
    assert all(m.match_method == "fuzzy" for m in matches)
    assert all(m.llm_score is None for m in matches)
    assert list(matches[0].asDict()) == pl.RESULT_COLUMNS


def test_no_match_different_blocks(spark):
    """Reference test_matching.py:62-82 — disjoint blocks yield nothing."""
    cc = spark.createDataFrame(
        [("https://alpha.com.au", "Alpha Corp", None, "x")],
        "url string, company_name string, industry string, raw_text string")
    abr = spark.createDataFrame(
        [("53004085616", "Beta Ltd", "PRV", "Active", "NSW", "2000",
          "2020-01-01")],
        "abn string, entity_name string, entity_type string, entity_status "
        "string, state string, postcode string, start_date string")
    out = pl.match_companies(pl.clean_web_companies(cc),
                             pl.clean_abr_entities(abr))
    assert out.count() == 0


def test_block_join_salted_matches_unsalted(spark):
    """Skew-salting (salt_keys>1) must not change the result set: one
    pathological hot key carrying most rows joins identically salted and
    unsalted."""
    from australia_company_etl_pipeline_spark.operators.block_join import \
        block_join

    left = spark.createDataFrame(
        [(i, "HOT" if i % 10 else f"k{i}") for i in range(500)],
        "lid long, block_key string")
    right = spark.createDataFrame(
        [(j, "HOT" if j % 3 else f"k{j * 10}") for j in range(60)],
        "rid long, block_key string")

    def pairs(salt):
        out = block_join(left, right, key="block_key",
                         broadcast_side=None, salt_keys=salt)
        return {(r.lid, r.rid) for r in
                out.select(F.col("l.lid"), F.col("r.rid")).collect()}

    unsalted = pairs(1)
    salted = pairs(8)
    assert len(unsalted) > 10000      # the hot key really explodes
    assert salted == unsalted


def test_llm_cascade_rescues_uncertain(spark):
    """M6 band logic: a 0.60–0.75 pair goes through the stub LLM scorer and
    is kept iff the weighted final score clears the threshold."""
    cc = spark.createDataFrame(
        [("https://sunx.com.au", "Sunrise Bakery Holdings", None, "x")],
        "url string, company_name string, industry string, raw_text string")
    abr = spark.createDataFrame(
        [("51824753556", "Sunrise Bakery Group Pty Ltd", "PRV", "Active",
          "NSW", "2000", "2020-01-01")],
        "abn string, entity_name string, entity_type string, entity_status "
        "string, state string, postcode string, start_date string")
    ccc, cabr = pl.clean_web_companies(cc), pl.clean_abr_entities(abr)

    # normalized: 'SUNRISE BAKERY' both sides (HOLDINGS/GROUP are stopwords)
    # → fuzzy 1.0, so force the uncertain band with the jaccard scorer on
    # raw-ish names by lowering the threshold band instead:
    no_llm = pl.match_companies(ccc, cabr, fuzzy_threshold=1.01,
                                use_llm=False)
    assert no_llm.count() == 0
    with_llm = pl.match_companies(ccc, cabr, fuzzy_threshold=1.01,
                                  use_llm=True, llm_threshold_min=0.9,
                                  fuzzy_weight=0.5, llm_weight=0.5)
    rows = with_llm.collect()
    # stub scorer: names share 2 of 5 upper tokens → llm 0.3+0.7*(2/5)=0.58
    # final = 0.5*1.0 + 0.5*0.58 = 0.79 < 1.01 → still filtered
    assert rows == []
    kept = pl.match_companies(ccc, cabr, fuzzy_threshold=0.76,
                              use_llm=True, llm_threshold_min=0.9)
    # fuzzy=1.0 ≥ 0.76 → confident fuzzy path, llm untouched
    assert kept.count() == 1 and kept.head().match_method == "fuzzy"


def test_golden_record_and_stats(spark, cleaned):
    cc, abr = cleaned
    matches = pl.match_companies(cc, abr)

    stg_web = pl.stg_web_companies(spark.createDataFrame(
        CC_RAW, "url string, company_name string, industry string, raw_text string"
    ).withColumn("domain", F.lit(None).cast("string")))
    # raw warehouse table has PK(abn) — the upsert sink dedups before dbt
    # ever sees it (create_tables.sql:31-44) — so drop the duplicate row
    stg_abr = pl.stg_abr_entities(spark.createDataFrame(
        ABR_RAW[:4], "abn string, entity_name string, entity_type string, "
                     "entity_status string, state string, postcode string, "
                     "start_date string"))

    int_m = pl.int_matched_companies(matches, stg_web, stg_abr)
    assert int_m.count() == 3
    dim = pl.dim_companies(int_m, stg_abr)
    rows = {r.abn: r for r in dim.collect()}
    # 3 matched + 2 abr_only actives (bad-checksum row is still in stg
    # — dbt staging only length-checks ABNs, stg_abr_entities.sql:69-72;
    # duplicate 51824753556 keys collapse via best-match window)
    assert rows["51824753556"].data_source == "MERGED"
    assert rows["51824753556"].canonical_name == "ACME Corporation Pty Ltd"
    assert rows["12345678901"].data_source == "ABR_ONLY"
    assert rows["12345678901"].confidence_score == 1.0
    # trading_name only when web name differs from abr name
    assert rows["10000000032"].trading_name == "TechCorp Australia"

    fct = pl.fct_match_statistics(int_m, stg_web, stg_abr)
    stats = fct.head()
    assert stats.total_matches == 3
    # staging already dropped the <3-char and null names → 3 valid web rows
    assert stats.match_rate_percent == 100.0
    assert stats.matches_by_state == {"NSW": 1, "VIC": 1, "QLD": 1}

    # dbt-test parity suite: all assertions green (0 violations)
    violations = ops.run_assertions({
        "valid_scores": ops.assert_valid_scores(matches),
        "no_dup_abns": ops.assert_no_duplicates(dim, ["abn"]),
        "not_null_canonical": ops.assert_not_null(
            dim, ["abn", "canonical_name"]),
        "accepted_sources": ops.assert_accepted_values(
            dim, "data_source", ["MERGED", "WEB_ONLY", "ABR_ONLY"]),
        "score_range": ops.assert_accepted_range(
            dim, "confidence_score", 0.0, 1.0),
        "min_match_rate": ops.assert_minimum_match_rate(fct, 20.0),
    })
    assert all(v == 0 for v in violations.values()), violations


def test_best_match_per_key_tie_break(spark):
    m = spark.createDataFrame(
        [("A", "u2", 0.9), ("A", "u1", 0.9), ("A", "u3", 0.8),
         ("B", "u9", 0.7)],
        "abn string, crawl_url string, final_score double")
    best = {r.abn: r.crawl_url
            for r in pl.best_match_per_key(m, "abn").collect()}
    assert best == {"A": "u1", "B": "u9"}   # score desc, url asc


def test_feature_vector_and_probability_bounds(spark):
    """M3/M4 parity with reference tests (test_matching.py:149-182):
    identical pair scores high, disjoint pair scores ~0."""
    from australia_company_etl_pipeline_spark.functions.features import (
        feature_columns, match_probability)

    df = spark.createDataFrame(
        [("Acme Pty Ltd", "Acme Pty Ltd", "https://www.acme.com.au",
          "Offices in Sydney NSW 2000", "NSW", "2000", "Technology", "PRV"),
         ("Alpha Systems", "Zeta Holdings", "https://www.unrelated.com.au",
          None, "VIC", "3000", None, "IND")],
        "crawl_name string, abr_name string, url string, raw_text string, "
        "state string, postcode string, industry string, entity_type string")
    feats = feature_columns(
        *[df[c] for c in ["crawl_name", "abr_name", "url", "raw_text",
                          "state", "postcode", "industry", "entity_type"]])
    rows = (df.select(match_probability(feats).alias("p"),
                      *[c.alias(n) for n, c in feats.items()])
            .collect())
    hi, lo = rows[0], rows[1]
    # normalization strips PTY/LTD → exact; domain derived from the name
    assert hi["name_exact_match"] == 1.0
    assert hi["domain_name_match"] == 1.0
    assert hi["domain_contains_name"] == 1.0
    assert hi["state_mentioned"] == 1.0      # 'sydney' variant
    assert hi["postcode_mentioned"] == 1.0
    assert hi["is_company"] == 1.0           # PRV
    assert hi["p"] >= 0.9
    assert lo["name_exact_match"] == 0.0
    assert lo["name_fuzzy_ratio"] == 0.0
    assert lo["state_mentioned"] == 0.0      # null raw_text
    assert lo["p"] <= 0.2


def test_llm_udf_cache_bounded_and_unhashable_scorer(spark):
    """r11 (ADVICE): the band-masked-udf cache keys on scorer identity,
    so (a) an UNHASHABLE scorer must fall back to an uncached udf
    instead of raising TypeError, and (b) per-call scorer construction
    must not grow the cache without bound (LRU cap)."""
    import pandas as pd

    from australia_company_etl_pipeline_spark.pipeline import match as m

    cc = spark.createDataFrame(
        [("https://sunx.com.au", "Sunrise Bakery Holdings", None, "x")],
        "url string, company_name string, industry string, raw_text string")
    abr = spark.createDataFrame(
        [("51824753556", "Sunrise Bakery Group Pty Ltd", "PRV", "Active",
          "NSW", "2000", "2020-01-01")],
        "abn string, entity_name string, entity_type string, entity_status "
        "string, state string, postcode string, start_date string")
    ccc, cabr = pl.clean_web_companies(cc), pl.clean_abr_entities(abr)

    class UnhashableScorer(dict):  # dict subclass: __hash__ is None
        def __call__(self, batch: "pd.DataFrame") -> "pd.Series":
            return m.stub_llm_scorer(batch)

    before = dict(m._LLM_UDF_CACHE)
    out = pl.match_companies(ccc, cabr, fuzzy_threshold=0.76,
                             use_llm=True, llm_threshold_min=0.9,
                             llm_scorer=UnhashableScorer())
    assert out.count() == 1                       # works, just uncached
    assert dict(m._LLM_UDF_CACHE) == before       # nothing leaked in

    # per-call closures (distinct identities) stay bounded by the LRU cap
    for i in range(m._LLM_UDF_CACHE_MAX + 5):
        def scorer(batch, _i=i):
            return m.stub_llm_scorer(batch)
        pl.match_companies(ccc, cabr, fuzzy_threshold=0.76,
                           use_llm=True, llm_threshold_min=0.9,
                           llm_scorer=scorer)
    assert len(m._LLM_UDF_CACHE) <= m._LLM_UDF_CACHE_MAX
