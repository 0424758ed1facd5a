"""Sources & sinks (SURVEY.md §2.1 S1–S12).

Raw-format scans re-expressed as distributed Spark reads + native record
shredding (no driver-side ``createDataFrame`` funneling — the reference's
50 MB-task defect, SURVEY §4.2):

- ``wet``      — Common Crawl WET archive scan (S1/S2)
- ``abr_xml``  — ABR bulk-extract XML shredder (S3/S4)
- ``sinks``    — parquet sink, keyed upsert, JDBC upsert (S7–S9, S11)
"""

from . import abr_xml, sinks, wet  # noqa: F401
