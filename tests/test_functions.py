"""Golden expression-level tests for the scalar function library.

Every assertion from the reference's tests/test_parsing.py:22-143 is ported
here against our native-expression rewrites (SURVEY.md §5.2 — the highest
parity-risk area is Python-vs-Java regex semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import australia_company_etl_pipeline_spark.functions as fx


def ev(spark, expr_fn, *values):
    """Evaluate a 1..n-arg Column function against literal values."""
    cols = [F.lit(v).cast("string") if v is None or isinstance(v, str)
            else F.lit(v) for v in values]
    return spark.range(1).select(expr_fn(*cols).alias("out")).head()[0]


# --- F1 normalize_company_name (tests/test_parsing.py:26-45) ---------------

@pytest.mark.parametrize("raw,expected", [
    ("ACME PTY LTD", "ACME"),
    ("ACME Pty Ltd", "ACME"),
    ("ACME Australia", "ACME"),
    (None, ""),
    ("", ""),
    # NOTE: the reference's test_parsing.py:44-45 expects 'ACME CORPORATION',
    # but its own implementation returns 'ACME' (CORPORATION is in the
    # stopword list, utils.py:17) — verified by executing the reference.
    # We match code behavior, which is what produced the recorded outputs.
    ("acme corporation", "ACME"),
    ("ABC & Sons Australia Limited", "ABC SONS"),   # utils.py:66 docstring
    ("ACME Corporation Pty Ltd", "ACME"),
    ("A.C.M.E. Pty. Ltd.", "A C M E"),
])
def test_normalize_company_name(spark, raw, expected):
    assert ev(spark, fx.normalize_company_name, raw) == expected


def test_normalize_punctuation(spark):
    out = ev(spark, fx.normalize_company_name, "ACME & SONS PTY LTD")
    assert "ACME" in out and "SONS" in out


# --- F9 validate_abn (tests/test_parsing.py:50-67) --------------------------

@pytest.mark.parametrize("abn,expected", [
    ("51824753556", True),
    ("51 824 753 556", True),
    ("1234567890", False),     # 10 digits
    ("123456789012", False),   # 12 digits
    (None, False),
    ("", False),
    ("51824753557", False),    # checksum off by one
])
def test_validate_abn(spark, abn, expected):
    assert ev(spark, fx.validate_abn, abn) is expected


# --- F8 format_abn (tests/test_parsing.py:72-80) ----------------------------

@pytest.mark.parametrize("abn,expected", [
    ("51824753556", "51 824 753 556"),
    ("51 824 753 556", "51 824 753 556"),
    (None, ""),
    ("12345", "12345"),  # non-11-digit: digits pass through
])
def test_format_abn(spark, abn, expected):
    assert ev(spark, fx.format_abn, abn) == expected


# --- (r7) ACN / TFN checksums -----------------------------------------------

@pytest.mark.parametrize("acn,expected", [
    ("000250000", True),       # ASIC's published worked example
    ("000 250 000", True),
    ("000000019", True),       # minimal: sum=1 -> check digit 9
    ("000250001", False),      # check digit off by one
    ("00025000", False),       # 8 digits
    (None, False),
    ("", False),
])
def test_validate_acn(spark, acn, expected):
    assert ev(spark, fx.validate_acn, acn) is expected


@pytest.mark.parametrize("acn,expected", [
    ("000250000", "000 250 000"),
    ("000 250 000", "000 250 000"),
    (None, ""),
    ("12345", "12345"),
])
def test_format_acn(spark, acn, expected):
    assert ev(spark, fx.format_acn, acn) == expected


@pytest.mark.parametrize("tfn,expected", [
    ("123456782", True),       # the commonly published valid test TFN
    ("123 456 782", True),
    ("123456783", False),
    ("12345678", False),       # 8-digit sum 1+8+9+28+25+48+42+72=233, %11!=0
    ("87654321", True),        # 8*1+7*4+6*3+5*7+4*5+3*8+2*6+1*9=154=11*14
    (None, False),
    ("", False),
])
def test_validate_tfn(spark, tfn, expected):
    assert ev(spark, fx.validate_tfn, tfn) is expected


def test_acn_from_abn(spark):
    # valid ABN -> its last 9 digits; invalid ABN -> NULL (never launder
    # a corrupt identifier into a new one)
    assert ev(spark, fx.acn_from_abn, "51824753556") == "824753556"
    assert ev(spark, fx.acn_from_abn, "51824753557") is None
    assert ev(spark, fx.acn_from_abn, None) is None


# --- F10 clean_abn -----------------------------------------------------------

@pytest.mark.parametrize("abn,expected", [
    ("51 824 753 556", "51824753556"),
    ("invalid", None),
    ("123", None),
])
def test_clean_abn(spark, abn, expected):
    assert ev(spark, fx.clean_abn, abn) == expected


# --- F3/F4 domain (tests/test_parsing.py:85-112) ----------------------------

@pytest.mark.parametrize("url,expected", [
    ("https://www.acme.com.au/about", "acme.com.au"),
    ("http://acme.com.au", "acme.com.au"),
    ("https://www.example.com", "example.com"),
    (None, ""),
    ("not a url", ""),
])
def test_extract_domain(spark, url, expected):
    assert ev(spark, fx.extract_domain, url) == expected


@pytest.mark.parametrize("url,expected", [
    ("https://www.acme.com.au", True),
    ("https://charity.org.au", True),
    ("https://www.example.com", False),
])
def test_is_australian_domain(spark, url, expected):
    assert ev(spark, fx.is_australian_domain, url) is expected


# --- F2 clean_text (tests/test_parsing.py:117-142) ---------------------------

def test_clean_text(spark):
    assert "<p>" not in ev(spark, fx.clean_text, "<p>Hello</p> <b>World</b>")
    assert "https://" not in ev(
        spark, fx.clean_text, "Visit https://example.com for more")
    assert "@" not in ev(spark, fx.clean_text, "Contact info@example.com")
    assert ev(spark, fx.clean_text, None) == ""
    assert "  " not in ev(spark, fx.clean_text, "Too    many   spaces")


# --- F5 blocking key ---------------------------------------------------------

@pytest.mark.parametrize("name,expected", [
    ("ACME", "acme"),
    ("ACME CORPORATION", "acme"),
    ("AB", ""),      # shorter than key → '' (clean_abr.py:104-106)
    (None, ""),
])
def test_blocking_key(spark, name, expected):
    assert ev(spark, fx.blocking_key, name) == expected


# --- F6/F7 extraction cascades ----------------------------------------------

def test_extract_company_from_text(spark):
    # The leading 'Welcome to' IS captured by the reference's first pattern
    # ([A-Z] matches 'W'); verified by executing the reference.
    assert ev(spark, fx.extract_company_from_text,
              "Welcome to ACME Corporation Pty Ltd, est 1990"
              ) == "Welcome to ACME Corporation Pty Ltd"
    assert ev(spark, fx.extract_company_from_text, "no companies here") is None
    assert ev(spark, fx.extract_company_from_text,
              "About Sunshine Bakery and our story") == "Sunshine Bakery and our story"


def test_extract_industry_from_text(spark):
    assert ev(spark, fx.extract_industry_from_text,
              "Industry: Mining and exploration") == "Mining and exploration"
    assert ev(spark, fx.extract_industry_from_text, "nothing here") is None


# --- F11-F17 cleaning functions ----------------------------------------------

@pytest.mark.parametrize("name,expected", [
    ("ACME CORPORATION PTY LTD", "Acme Corporation PTY LTD"),
    ("  spaced   name  ", "spaced name"),
    ("ACME AS TRUSTEE FOR THE SMITH TRUST", "Acme"),
    ("Mixed Case Stays", "Mixed Case Stays"),
    (None, None),
])
def test_clean_entity_name(spark, name, expected):
    assert ev(spark, fx.clean_entity_name, name) == expected


@pytest.mark.parametrize("name,expected", [
    ("Welcome to ACME Corp", "ACME Corp"),
    ("About Us Widgets", "Us Widgets"),
    ("Home - Bakery Co", "Bakery Co"),
    ("Bakery Co | Official Site", "Bakery Co"),
    ("A", None),           # too short
    (None, None),
])
def test_clean_company_name(spark, name, expected):
    assert ev(spark, fx.clean_company_name, name) == expected


@pytest.mark.parametrize("state,expected", [
    ("nsw", "NSW"),
    ("New South Wales", "NSW"),
    ("VICTORIA", "VIC"),
    ("XX", None),
    (None, None),
])
def test_clean_state(spark, state, expected):
    assert ev(spark, fx.clean_state, state) == expected


@pytest.mark.parametrize("pc,expected", [
    ("2000", "2000"),
    ("NSW 2000", "2000"),
    ("20001", None),   # 5 digits is not a \b\d{4}\b hit
    ("abc", None),
])
def test_clean_postcode(spark, pc, expected):
    assert ev(spark, fx.clean_postcode, pc) == expected


@pytest.mark.parametrize("et,expected", [
    ("PRV", "Private Company"),
    ("pub", "Public Company"),
    ("ZZZ", "ZZZ"),     # unknown passes through
    (None, None),
])
def test_clean_entity_type(spark, et, expected):
    assert ev(spark, fx.clean_entity_type, et) == expected


@pytest.mark.parametrize("status,expected", [
    ("ACTIVE", "Active"),
    ("Registered", "Active"),
    # 'deregistered' contains 'registered', and the reference checks the
    # Active branch first (clean_abr.py:179-182) → Active, not Cancelled.
    ("Deregistered", "Active"),
    ("cancelled", "Cancelled"),
    ("in liquidation", "In Liquidation"),
    (None, None),
])
def test_clean_status(spark, status, expected):
    assert ev(spark, fx.clean_status, status) == expected


@pytest.mark.parametrize("industry,expected", [
    ("software development", "Information Technology"),
    ("Banking", "Financial Services"),
    ("manufacturing", "Manufacturing"),
    ("Industry: retail stores", "Retail"),
    ("Underwater Basket Weaving", "Underwater Basket Weaving"),
    (None, None),
])
def test_clean_industry(spark, industry, expected):
    assert ev(spark, fx.clean_industry, industry) == expected


# --- F18 date parsing ---------------------------------------------------------

@pytest.mark.parametrize("raw,expected", [
    ("20200115", "2020-01-15"),
    ("2020-01-15", "2020-01-15"),
    ("15/01/2020", "2020-01-15"),
    ("2020/01/15", "2020-01-15"),
    ("15-01-2020", "2020-01-15"),
    ("not a date", None),
])
def test_parse_date_multi(spark, raw, expected):
    out = ev(spark, fx.parse_date_multi, raw)
    assert (str(out) if out is not None else None) == expected


# --- F20/F21 scoring -----------------------------------------------------------

def test_weighted_score(spark):
    row = spark.range(1).select(
        fx.weighted_score(F.lit(0.8), F.lit(0.6)).alias("hybrid"),
        fx.weighted_score(F.lit(0.8), F.lit(None).cast("double")).alias("fuzzy_only"),
    ).head()
    assert abs(row.hybrid - (0.7 * 0.8 + 0.3 * 0.6)) < 1e-9
    assert abs(row.fuzzy_only - 0.8) < 1e-9


@pytest.mark.parametrize("score,expected", [
    (0.95, "High"), (0.90, "High"), (0.80, "Medium"), (0.75, "Medium"),
    (0.5, "Low"),
])
def test_confidence_bucket(spark, score, expected):
    assert ev(spark, lambda c: fx.confidence_bucket(c), float(score)) == expected


# --- M1/M2 similarity -----------------------------------------------------------

def test_jaccard_tokens(spark):
    row = spark.range(1).select(
        fx.jaccard_tokens(F.lit("ACME CORP"), F.lit("CORP ACME")).alias("perm"),
        fx.jaccard_tokens(F.lit("ACME CORP"), F.lit("ACME LTD")).alias("half"),
        fx.jaccard_tokens(F.lit("AAA"), F.lit("BBB")).alias("zero"),
        fx.jaccard_tokens(F.lit(None).cast("string"), F.lit("X")).alias("null_in"),
    ).head()
    assert row.perm == 1.0
    assert abs(row.half - 1.0 / 3.0) < 1e-9
    assert row.zero == 0.0
    assert row.null_in == 0.0


def test_token_sort_ratio(spark):
    row = spark.range(1).select(
        fx.token_sort_ratio(F.lit("ACME Corporation"),
                            F.lit("Corporation ACME")).alias("perm"),
        fx.token_sort_ratio(F.lit("ACME"), F.lit("ACME")).alias("same"),
        fx.token_sort_ratio(F.lit(None).cast("string"),
                            F.lit("X")).alias("null_in"),
    ).head()
    assert row.perm == 1.0   # token-sorted forms are identical
    assert row.same == 1.0
    assert row.null_in == 0.0


def test_token_sort_ratio_reference_goldens(spark):
    """Literal golden scores through the M1 token_sort scorer path
    (similarity.py:token_sort_ratio), pinned from the reference fixture
    names (tests/test_matching.py:28-47,55-60: normalized pairs ACME/ACME
    and TECH SOLUTIONS/TECH SOLUTIONS both score 1.0 → the 2-match ≥0.75
    fixture). Expected values are the Indel similarity 2·LCS/(|a|+|b|)
    on token-sorted uppercase strings — hand-derivable, and identical
    under rapidfuzz AND the difflib fallback for these pairs (divergence
    analysis in the token_sort_ratio docstring)."""
    cases = [
        # reference fixture pairs (normalized_name vs normalized_name)
        ("ACME", "ACME", 1.0),
        ("TECH SOLUTIONS", "TECH SOLUTIONS", 1.0),
        # the "token_sort" in the name: order must not matter
        ("SOLUTIONS TECH", "TECH SOLUTIONS", 1.0),
        # Indel goldens: 2·LCS/(|a|+|b|) on sorted-token forms
        ("ACME", "ACME CORPORATION", 2 * 4 / (4 + 16)),        # 0.4
        ("ACME", "ACME PTY LTD", 2 * 4 / (4 + 12)),            # 0.5
        ("TECH SOLUTIONS", "TECH SOLUTIONS AUSTRALIA",
         2 * 14 / (14 + 24)),                                  # 0.736842…
        ("ACME Corporation", "ACME CORP",
         2 * 9 / (16 + 9)),                                    # 0.72
    ]
    df = spark.createDataFrame(cases, "a string, b string, exp double")
    rows = df.select(
        "a", "b", "exp",
        fx.token_sort_ratio(F.col("a"), F.col("b")).alias("got")).collect()
    for r in rows:
        assert abs(r.got - r.exp) < 1e-9, (r.a, r.b, r.exp, r.got)
    # reference band behavior: every fixture pair clears the 0.75 gate
    assert all(r.got >= 0.75 for r in rows[:3])


def test_levenshtein_ratio(spark):
    row = spark.range(1).select(
        fx.levenshtein_ratio(F.lit("ACME CORP"), F.lit("CORP ACME")).alias("perm"),
        fx.levenshtein_ratio(F.lit("ACME"), F.lit("ACMX")).alias("close"),
    ).head()
    assert row.perm == 1.0
    assert 0.5 < row.close < 1.0


def test_soundex_portable_parity_and_blocking(spark):
    """The portable Soundex chain must equal Spark's JVM F.soundex on
    every letters-only input (classic goldens incl. the H/W-adjacency
    and vowel-separator cases, plus random-word fuzz), return NULL for
    letterless input (documented divergence: F.soundex passes such
    strings through), and block misspelled company names together."""
    import random

    from pyspark.sql import functions as F

    from australia_company_etl_pipeline_spark.functions.text import (
        soundex_portable)

    goldens = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
               "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
               "Honeyman": "H555", "Smith": "S530", "Smythe": "S530",
               "Washington": "W252", "Lee": "L000", "Gutierrez": "G362"}
    rng = random.Random(13)
    fuzz = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(1, 12)))
            for _ in range(300)]
    df = spark.createDataFrame(
        [(n,) for n in [*goldens, *fuzz]], "name string")
    out = df.select("name", soundex_portable(F.col("name")).alias("mine"),
                    F.soundex("name").alias("jvm")).collect()
    for r in out:
        assert r.mine == r.jvm, (r.name, r.mine, r.jvm)
    got = {r.name: r.mine for r in out}
    for name, code in goldens.items():
        assert got[name] == code, (name, got[name], code)

    edge = spark.createDataFrame([("123",), ("  ",), (None,)],
                                 "name string")
    assert [r.s for r in edge.select(
        soundex_portable(F.col("name")).alias("s")).collect()] == \
        [None, None, None]

    # the blocking property: misspellings share the key, different
    # names don't collide on these examples
    pairs = [("Acme Holdings", "Akme Holdings"),
             ("Smith Consulting", "Smythe Consulting"),
             ("Jackson Pty", "Jacksen Pty")]
    kdf = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a string, b string")
    keyed = kdf.select(
        soundex_portable(F.split("a", " ").getItem(0)).alias("ka"),
        soundex_portable(F.split("b", " ").getItem(0)).alias("kb")
    ).collect()
    assert all(r.ka == r.kb for r in keyed)
    assert got["Smith"] != got["Washington"]
