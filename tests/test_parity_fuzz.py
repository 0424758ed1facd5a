"""Randomized parity fuzzing for the native-expression rewrites.

SURVEY §7.4 ranks Python-`re`-vs-Java-regex semantic drift as the #1
parity risk for the scalar library (``\\w``/``\\b`` Unicode classes,
anchor behavior). The golden tests pin known values; these fuzz tests
compare the Catalyst expressions against independent pure-Python oracles
(written here from the documented semantics, not lifted from anywhere)
over a seeded adversarial corpus — one DataFrame pass per function, so
the whole file costs a few Spark jobs, not one per example.
"""

from __future__ import annotations

import random
import re
import string

from pyspark.sql import functions as F

import australia_company_etl_pipeline_spark.functions as fx
from australia_company_etl_pipeline_spark.functions.text import (
    COMPANY_STOPWORDS,
)

_ALPHABET = (
    string.ascii_letters + string.digits + "  \t_-.,!?'\"&()/\\:;@#$%^*+="
    + "éüñÉÜÑ日本語"  # unicode: \w-class divergence territory
)


def _corpus(n: int = 400, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randint(0, 40)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(ln)))
    # targeted adversaries
    out += ["", "   ", "PTY LTD", "ACME PTY LTD", "A&B (AUST) PTY. LTD.",
            "...", "１２３", "ÀCMÉ LTD", "x" * 300, "\tTAB\tCO\t",
            "12 345 678 901", "ABN:51824753556!", "word nbsp"]
    return out


def _batch_compare(spark, values, expr_fn, oracle_fn, label):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r.o for r in df.select(expr_fn(F.col("s")).alias("o")).collect()]
    mismatches = [(v, g, oracle_fn(v)) for v, g in zip(values, got)
                  if g != oracle_fn(v)]
    assert not mismatches, f"{label}: first 5 = {mismatches[:5]}"


def _norm_oracle(s: str) -> str:
    # documented F1 semantics: upper, unicode-\w-preserving punctuation
    # strip, stopword drop, whitespace collapse; null/empty -> ''
    if not s:
        return ""
    up = s.upper()
    kept = []
    for tok in re.sub(r"[^\w\s]", " ", up, flags=re.UNICODE).split():
        if tok not in COMPANY_STOPWORDS:
            kept.append(tok)
    return " ".join(kept)


def test_fuzz_normalize_company_name(spark):
    _batch_compare(spark, _corpus(), fx.normalize_company_name,
                   _norm_oracle, "normalize_company_name")


def test_fuzz_clean_and_validate_abn(spark):
    rng = random.Random(11)
    vals = ["".join(rng.choice("0123456789 -ab.") for _ in range(
        rng.randint(0, 18))) for _ in range(400)]
    vals += ["51824753556", "51 824 753 556", "51824753557", ""]

    def clean_oracle(s):
        d = re.sub(r"\D", "", s)
        return d if len(d) == 11 else None

    def valid_oracle(s):
        d = re.sub(r"\D", "", s)
        if len(d) != 11:
            return False
        weights = [10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19]
        digits = [int(c) for c in d]
        digits[0] -= 1
        return sum(a * b for a, b in zip(digits, weights)) % 89 == 0

    _batch_compare(spark, vals, fx.clean_abn, clean_oracle, "clean_abn")
    _batch_compare(spark, vals, fx.validate_abn, valid_oracle,
                   "validate_abn")


def test_fuzz_validate_acn_tfn(spark):
    rng = random.Random(17)
    vals = ["".join(rng.choice("0123456789 -x") for _ in range(
        rng.randint(0, 14))) for _ in range(400)]
    # seed plenty of well-formed 9-digit strings so both branches are hit
    vals += ["".join(rng.choice("0123456789") for _ in range(9))
             for _ in range(200)]
    vals += ["000250000", "123456782", "87654321", ""]

    def acn_oracle(s):
        d = re.sub(r"\D", "", s)
        if len(d) != 9:
            return False
        total = sum(int(c) * w for c, w in zip(d, [8, 7, 6, 5, 4, 3, 2, 1]))
        return (10 - total % 10) % 10 == int(d[8])

    def tfn_oracle(s):
        d = re.sub(r"\D", "", s)
        w = [1, 4, 3, 7, 5, 8, 6, 9, 10]
        if len(d) not in (8, 9):
            return False
        return sum(int(c) * x for c, x in zip(d, w)) % 11 == 0

    _batch_compare(spark, vals, fx.validate_acn, acn_oracle, "validate_acn")
    _batch_compare(spark, vals, fx.validate_tfn, tfn_oracle, "validate_tfn")


def test_fuzz_clean_postcode(spark):
    rng = random.Random(13)
    vals = []
    for _ in range(400):
        ln = rng.randint(0, 14)
        vals.append("".join(rng.choice("0123456789 abcX-") for _ in range(ln)))
    vals += ["2000", " 3000 ", "20000", "NSW 2000", "postcode2000", "12 3456"]

    def oracle(s):
        m = re.search(r"\b(\d{4})\b", s)
        return m.group(1) if m else None

    _batch_compare(spark, vals, fx.clean_postcode, oracle, "clean_postcode")


def test_fuzz_extract_domain(spark):
    rng = random.Random(17)
    parts = ["http://", "https://", "", "ftp://", "www.", "sub.", "acme",
             ".com", ".au", ".com.au", ":8080", "/path", "?q=1", "#f",
             "UPPER", "-x-"]
    vals = ["".join(rng.choice(parts)
                    for _ in range(rng.randint(1, 6))) for _ in range(400)]
    vals += ["https://www.acme.com.au/about", "http://x.au", "acme.com.au",
             "https://WWW.ACME.COM.AU:443/a?b#c", ""]

    def oracle(s):
        m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", s)
        host = m.group(1) if m else ""
        return re.sub(r"^www\.", "", host).lower()

    _batch_compare(spark, vals, fx.extract_domain, oracle, "extract_domain")


def test_fuzz_jaccard_properties(spark):
    """Algebraic properties over random token sets: symmetry, [0,1]
    bounds, self-similarity 1 (non-empty), disjoint -> 0."""
    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(12)]
    pairs = [(" ".join(rng.sample(vocab, rng.randint(1, 8))),
              " ".join(rng.sample(vocab, rng.randint(1, 8))))
             for _ in range(300)]
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        fx.jaccard_tokens(F.col("a"), F.col("b")).alias("ab"),
        fx.jaccard_tokens(F.col("b"), F.col("a")).alias("ba"),
        fx.jaccard_tokens(F.col("a"), F.col("a")).alias("aa")).collect()
    for r in rows:
        assert abs(r.ab - r.ba) < 1e-12          # symmetric
        assert 0.0 <= r.ab <= 1.0                # bounded
        assert r.aa == 1.0                       # reflexive (non-empty)
    disjoint = spark.range(1).select(
        fx.jaccard_tokens(F.lit("p q r"), F.lit("x y z")).alias("j"))
    assert disjoint.head().j == 0.0


def test_fuzz_parse_date_multi(spark):
    """F18 cascade vs a strptime-cascade oracle over generated date-ish
    strings: valid dates (padded and unpadded), impossible dates (month
    13, Feb 30), and garbage. Scope matches the reference's inputs:
    4-digit years, 8-digit compact forms (7-digit compact strings are a
    known CPython-leniency corner excluded by construction)."""
    from datetime import datetime

    rng = random.Random(23)
    vals = []
    for _ in range(400):
        y = rng.randint(1980, 2030)
        m = rng.randint(0, 14)
        d = rng.randint(0, 33)
        pad_m = rng.random() < 0.5
        pad_d = rng.random() < 0.5
        ms = f"{m:02d}" if pad_m else str(m)
        ds = f"{d:02d}" if pad_d else str(d)
        fmt = rng.randint(0, 5)
        if fmt == 0:
            vals.append(f"{y}{m:02d}{d:02d}")
        elif fmt == 1:
            vals.append(f"{y}-{ms}-{ds}")
        elif fmt == 2:
            vals.append(f"{ds}/{ms}/{y}")
        elif fmt == 3:
            vals.append(f"{y}/{ms}/{ds}")
        elif fmt == 4:
            vals.append(f"{ds}-{ms}-{y}")
        else:
            vals.append("".join(rng.choice("0123456789-/ x")
                                for _ in range(rng.randint(0, 12))))
    vals += ["20150301", "2020-1-2", "2/3/2020", "2020/3/2", "2-3-2020",
             "2019-02-29", "2020-02-29", "", "not a date"]

    def oracle(s):
        for f in ("%Y%m%d", "%Y-%m-%d", "%d/%m/%Y", "%Y/%m/%d",
                  "%d-%m-%Y"):
            try:
                return datetime.strptime(s, f).date()
            except ValueError:
                continue
        return None

    # exclude 7-digit compact strings: CPython's %m greedily takes two
    # digits there; the engine's strict 8-digit yyyyMMdd is the contract
    vals = [v for v in vals if not (v.isdigit() and len(v) != 8)]
    _batch_compare(spark, vals, fx.parse_date_multi, oracle,
                   "parse_date_multi")


def test_fuzz_clean_state(spark):
    """F13 over full names, codes, paddings, case mixes, and garbage."""
    from australia_company_etl_pipeline_spark.functions.text import (
        STATE_NAME_MAP,
        VALID_STATES,
    )

    rng = random.Random(29)
    pool = (list(STATE_NAME_MAP) + VALID_STATES
            + ["nsw", " Victoria ", "New South Wales", "QLDX", "S A",
               "ZZZ", "", "  ", "australia", "N.S.W."])
    vals = [rng.choice(pool) for _ in range(300)]
    vals += ["".join(rng.choice(string.ascii_letters + " ")
                     for _ in range(rng.randint(0, 12)))
             for _ in range(100)]

    def oracle(s):
        up = s.strip().upper()
        mapped = STATE_NAME_MAP.get(up, up)
        return mapped if mapped in VALID_STATES else None

    _batch_compare(spark, vals, fx.clean_state, oracle, "clean_state")


def test_fuzz_clean_status(spark):
    """F16: contains-based mapping then title case, with the engine's
    initcap contract (first letter of each whitespace token upper)."""
    rng = random.Random(31)
    frags = ["active", "Active", "REGISTERED", "cancel", "cancelled",
             "deregistered", "pending", "in liquidation", "x", ""]
    vals = [" ".join(rng.choice(frags)
                     for _ in range(rng.randint(0, 3)))
            for _ in range(300)]

    def oracle(s):
        low = s.strip().lower()
        if low == "":
            return None
        if "active" in low or "registered" in low:
            return "Active"
        if "cancel" in low or "deregistered" in low:
            return "Cancelled"
        # initcap semantics: capitalize first letter of each token
        return " ".join(w[:1].upper() + w[1:] if w else w
                        for w in low.split(" "))

    _batch_compare(spark, vals, fx.clean_status, oracle, "clean_status")


def test_fuzz_clean_entity_type(spark):
    """F15: known ABR codes map to descriptions, unknown non-empty codes
    pass through upper-trimmed, empty/NULL → NULL."""
    from australia_company_etl_pipeline_spark.functions.text import (
        ENTITY_TYPE_MAP,
    )

    rng = random.Random(37)
    pool = (list(ENTITY_TYPE_MAP) + ["prv", " Pub ", "XYZ", "ind", "",
                                     " ", "Trust", "PRV2"])
    vals = [rng.choice(pool) for _ in range(200)]
    vals += ["".join(rng.choice(string.ascii_letters)
                     for _ in range(rng.randint(0, 5)))
             for _ in range(100)]

    def oracle(s):
        up = s.strip().upper()
        if up == "":
            return None
        return ENTITY_TYPE_MAP.get(up, up)

    _batch_compare(spark, vals, fx.clean_entity_type, oracle,
                   "clean_entity_type")


def test_fuzz_clean_industry(spark):
    """F17: label-prefix strip → first matching canonical pattern (search
    anywhere, first-listed wins) → else initcap truncated to 50."""
    from australia_company_etl_pipeline_spark.functions.text import (
        INDUSTRY_PATTERNS,
    )

    rng = random.Random(41)
    frags = ["tech", "software", "bank", "health", "retail", "mining",
             "farm", "hotel", "law", "property", "widgets", "unknown",
             "Industry:", "Sector: ", "services ", "power"]
    vals = [" ".join(rng.choice(frags)
                     for _ in range(rng.randint(0, 3)))
            for _ in range(300)]
    vals += ["Industry: tech", "sector:  banking", "Services widgets co",
             "w" * 60, "", "  "]

    def oracle(s):
        c = s.strip()
        c = re.sub(r"^(industry|sector|services?)[\s:]+", "", c,
                   flags=re.IGNORECASE)
        if s is None or c == "":
            return None
        low = c.lower()
        for pattern, label in INDUSTRY_PATTERNS:
            if re.search(pattern, low):
                return label
        # Spark initcap: first letter of each whitespace word upper,
        # rest lower
        title = " ".join(w[:1].upper() + w[1:].lower() if w else w
                         for w in c.split(" "))
        return title[:50]

    _batch_compare(spark, vals, fx.clean_industry, oracle,
                   "clean_industry")


def test_profile_stats_fuzz_vs_pandas(spark):
    """Profiler parity: exact profile_table stats over a seeded random
    numeric/string frame (with NULL and NaN adversaries) must match a
    pandas-computed oracle."""
    import math

    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_table)

    rng = random.Random(23)
    rows = []
    for i in range(500):
        v = (None if rng.random() < 0.1
             else round(rng.uniform(-1000, 1000), 3))
        s = (None if rng.random() < 0.1
             else "".join(rng.choice(_ALPHABET)
                          for _ in range(rng.randint(0, 20))))
        rows.append((i, v, s))
    df = spark.createDataFrame(rows, "id long, v double, s string")
    m = {r.metric_name: r.metric_value
         for r in profile_table(df, "t", ["v", "s"]).collect()}

    vs = [v for _, v, _ in rows if v is not None]
    ss = [s for _, _, s in rows if s is not None]
    assert m["v.null_rate"] == round((500 - len(vs)) / 500, 6)
    assert m["v.n_distinct"] == len(set(vs))
    assert m["v.min"] == min(vs) and m["v.max"] == max(vs)
    assert abs(m["v.mean"] - sum(vs) / len(vs)) < 1e-6

    def pctl(xs, p):  # exact interpolated percentile (Spark semantics)
        xs = sorted(xs)
        k = (len(xs) - 1) * p
        f, c = math.floor(k), math.ceil(k)
        return xs[f] + (xs[c] - xs[f]) * (k - f)

    for p, name in ((0.25, "v.p25"), (0.5, "v.p50"), (0.75, "v.p75")):
        assert abs(m[name] - pctl(vs, p)) < 1e-5, name
    lens = [len(s) for s in ss]
    assert m["s.len_min"] == min(lens) and m["s.len_max"] == max(lens)
    assert abs(m["s.len_mean"] - sum(lens) / len(lens)) < 1e-6
    assert m["s.n_distinct"] == len(set(ss))
