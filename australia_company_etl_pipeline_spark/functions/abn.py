"""ABN (Australian Business Number) functions (SURVEY.md §2.8 F8–F10).

The checksum is pure arithmetic over the 11 digits, so it compiles to a
single codegen'd expression — no Python boundary (the reference runs it as
a row-at-a-time UDF filter, ``clean_abr.py:246,267``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Checksum weights, /root/reference/src/common/utils.py:287.
ABN_WEIGHTS = [10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19]

# ACN check-digit weights (ASIC algorithm, public): weights 8..1 over the
# first 8 digits; check digit = (10 - sum mod 10) mod 10.
ACN_WEIGHTS = [8, 7, 6, 5, 4, 3, 2, 1]

# TFN weights (ATO algorithm, public): weighted sum of all 9 digits must
# be divisible by 11.
TFN_WEIGHTS = [1, 4, 3, 7, 5, 8, 6, 9, 10]


def _digits(abn: Column) -> Column:
    return F.regexp_replace(abn.cast("string"), r"\D", "")


def clean_abn(abn: Column) -> Column:
    """F10 — digits only; exactly 11 digits else NULL.

    Reference: /root/reference/src/transform/clean_abr.py:118-130.
    """
    d = _digits(abn)
    return F.when(F.length(d) == 11, d)


def abn_checksum(abn_digits: Column) -> Column:
    """Weighted digit sum with first digit decremented (mod-89 scheme).

    Reference algorithm: /root/reference/src/common/utils.py:270-300.
    """
    terms = [
        (F.substring(abn_digits, i + 1, 1).cast("int")
         - (1 if i == 0 else 0)) * w
        for i, w in enumerate(ABN_WEIGHTS)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def validate_abn(abn: Column) -> Column:
    """F9/P6 — True iff 11 digits and weighted sum % 89 == 0; null → False.

    Reference: /root/reference/src/common/utils.py:270-300; golden value
    validate_abn('51824753556') == True (tests/test_parsing.py:53).
    """
    d = _digits(abn)
    valid = (F.length(d) == 11) & (abn_checksum(d) % 89 == 0)
    return F.coalesce(valid, F.lit(False))


def validate_acn(acn: Column) -> Column:
    """True iff 9 digits and the ASIC check digit holds; null → False.

    The registry the reference cleans carries ACNs alongside ABNs (an
    ABN's last 9 digits are the company's ACN), but the reference only
    validates the ABN form (utils.py:270-300) — this closes the gap with
    the same pure-codegen shape. Check digit: complement of the
    weighted sum of the first 8 digits mod 10. Golden: '000250000'
    (ASIC's published example) is valid.
    """
    d = _digits(acn)
    total = None
    # try_cast: ANSI mode + Spark's common-subexpression elimination can
    # evaluate these casts outside the length guard, where substring
    # returns '' on short inputs.
    for i, w in enumerate(ACN_WEIGHTS):
        t = F.substring(d, i + 1, 1).try_cast("int") * w
        total = t if total is None else total + t
    check = (10 - total % 10) % 10
    valid = ((F.length(d) == 9)
             & (check == F.substring(d, 9, 1).try_cast("int")))
    return F.coalesce(valid, F.lit(False))


def format_acn(acn: Column) -> Column:
    """'XXX XXX XXX' grouping; non-9-digit inputs pass through
    digit-stripped; null → '' (mirrors ``format_abn``'s contract)."""
    d = _digits(acn)
    grouped = F.concat_ws(
        " ", F.substring(d, 1, 3), F.substring(d, 4, 3),
        F.substring(d, 7, 3))
    return (F.when(acn.isNull(), F.lit(""))
            .when(F.length(d) == 9, grouped)
            .otherwise(d))


def acn_from_abn(abn: Column) -> Column:
    """The ACN embedded in a valid ABN (its last 9 digits); NULL when the
    ABN itself does not validate — deriving an ACN from a corrupt ABN
    would launder the corruption into a new identifier."""
    d = _digits(abn)
    return F.when(validate_abn(abn), F.substring(d, 3, 9))


def validate_tfn(tfn: Column) -> Column:
    """True iff 8–9 digits and the ATO weighted sum ≡ 0 (mod 11);
    null → False. 8-digit legacy TFNs validate over the first 8 weights.
    Golden: '123456782' (the commonly published test value) is valid.
    """
    d = _digits(tfn)

    def _sum(n: int) -> Column:
        total = None
        for i, w in enumerate(TFN_WEIGHTS[:n]):
            t = F.substring(d, i + 1, 1).try_cast("int") * w
            total = t if total is None else total + t
        return total

    valid = (((F.length(d) == 9) & (_sum(9) % 11 == 0))
             | ((F.length(d) == 8) & (_sum(8) % 11 == 0)))
    return F.coalesce(valid, F.lit(False))


def format_abn(abn: Column) -> Column:
    """F8 — 'XX XXX XXX XXX' grouping; non-11-digit inputs pass through
    digit-stripped; null → ''.

    Reference: /root/reference/src/common/utils.py:246-267.
    """
    d = _digits(abn)
    grouped = F.concat_ws(
        " ",
        F.substring(d, 1, 2), F.substring(d, 3, 3),
        F.substring(d, 6, 3), F.substring(d, 9, 3))
    return (F.when(abn.isNull(), F.lit(""))
            .when(F.length(d) == 11, grouped)
            .otherwise(d))
