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
