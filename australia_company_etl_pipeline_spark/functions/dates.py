"""Date parsing functions (SURVEY.md §2.8 F18–F19).

``try_to_date`` (never-throwing under ANSI mode) replaces the reference's
sequential strptime attempts (``parse_abr.py:219-240``) and pandas
``to_datetime(errors='coerce')`` (``clean_abr.py:97-99``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference format cascade, /root/reference/src/ingest/parse_abr.py:226-233.
# Single-letter month/day patterns (M, d): Spark's MM/dd REQUIRE zero
# padding, but the reference's strptime %m/%d accept '1' and '01' alike —
# M/d match both, keeping parity on unpadded inputs like '2020-1-2'
# (divergence caught by tests/test_parity_fuzz.py). The compact form
# stays strict yyyyMMdd: 8 digits only, like %Y%m%d on the 8-digit data
# it exists for.
DATE_FORMATS = ("yyyyMMdd", "yyyy-M-d", "d/M/yyyy", "yyyy/M/d", "d-M-yyyy")


def parse_date_multi(date_str: Column) -> Column:
    """F18 — try each known format in order; unparseable → NULL.

    (The reference passes unparseable strings through; downstream it then
    coerces them to NaT anyway — clean_abr.py:99 — so NULL out is the
    semantically-merged behavior.)
    """
    return F.coalesce(
        *[F.try_to_date(date_str, fmt) for fmt in DATE_FORMATS])


def coerce_date(c: Column) -> Column:
    """F19 — permissive cast-to-date, invalid → NULL."""
    return F.try_to_date(c)
