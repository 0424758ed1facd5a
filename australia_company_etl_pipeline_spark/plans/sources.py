"""Source-shredder queries (SURVEY §2.1 S1–S4) — oracle-checked.

Raw-format parsers can't scan /root/testdata directly (it's parquet), so
each query SYNTHESIZES the raw format from a catalog table inside the
plan (deterministically), runs the real distributed shredder on it, and
the DuckDB oracle derives the expected records directly from the same
table. This exercises record splitting, header extraction, the XML
multi-path name cascade, and F18 date parsing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..sources.abr_xml import shred_abr_xml, split_abr_records
from ..sources.wet import parse_wet_records
from .registry import register

_STATES = ["NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT"]


def _pack_files(records: DataFrame, key: str, rec_col: str,
                group_mod: int, sep: str) -> DataFrame:
    """Concatenate per-record strings into multi-record 'files'
    (deterministic order within each synthetic file)."""
    return (records
            .groupBy((F.col(key) % group_mod).alias("__file"))
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col(key).alias("k"),
                                 F.col(rec_col).alias("r")))),
                    lambda s: s["r"]),
                sep).alias("value"))
            .select("value"))


@register(
    "wet_scan_shred",
    doc="S1/S2 — WET conversion-record shredder: documents rows rendered "
        "as multi-record WARC/1.0 WET files (25 records/file), shredded "
        "back to (url, text) with native split/regexp_extract.",
    tags=("sources",),
    oracle="""
SELECT 'https://site' || CAST(doc_id AS VARCHAR) || '.com.au/page' AS url,
       regexp_replace(regexp_replace(text, '^\\s+', ''), '\\s+$', '') AS text
FROM documents
""",
)
def wet_scan_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    rec = d.select(
        F.col("doc_id"),
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: conversion\r\n"
                  "WARC-Target-URI: https://site"),
            F.col("doc_id").cast("string"),
            F.lit(".com.au/page\r\nContent-Length: "),
            F.length("text").cast("string"),
            F.lit("\r\n\r\n"),
            F.col("text")).alias("rec"))
    files = _pack_files(rec, "doc_id", "rec", 25, "\r\n\r\n")
    return parse_wet_records(files)


@register(
    "abr_xml_shred",
    doc="S3/S4 — ABR XML shredder: supplier rows rendered as <ABR> "
        "records (even keys via MainEntity/NonIndividualName, odd keys "
        "via LegalEntity/IndividualName given+family — the reference's "
        "name cascade, parse_abr.py:136-175), packed 20/file, shredded "
        "back with from_xml + coalesce cascade + F18 date parse.",
    tags=("sources",),
    oracle="""
SELECT lpad(CAST((s_suppkey * 7919) % 100000000000 AS VARCHAR), 11, '0') AS abn,
       CASE WHEN s_suppkey % 2 = 0 THEN upper(s_name)
            ELSE 'Sup ' || s_name END AS entity_name,
       CASE WHEN s_suppkey % 2 = 0 THEN 'Australian Private Company'
            ELSE 'IND' END AS entity_type,
       CASE WHEN s_suppkey % 2 = 0 THEN 'PRV' ELSE 'IND' END
         AS entity_type_code,
       CASE WHEN s_suppkey % 3 = 0 THEN 'Cancelled' ELSE 'Active' END
         AS entity_status,
       ['NSW','VIC','QLD','SA','WA','TAS','NT','ACT'][(s_suppkey % 8) + 1]
         AS state,
       CAST(2000 + (s_suppkey % 7000) AS VARCHAR) AS postcode,
       CASE WHEN s_suppkey % 2 = 0 THEN '2015-03-01'
            ELSE '2001-05-12' END AS start_date
FROM supplier
""",
)
def abr_xml_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    abn = F.lpad(((k * 7919) % 100000000000).cast("string"), 11, "0")
    status = F.when(k % 3 == 0, "Cancelled").otherwise("Active")
    state = F.element_at(F.array(*[F.lit(x) for x in _STATES]),
                         (k % 8 + 1).cast("int"))
    postcode = (F.lit(2000) + k % 7000).cast("string")
    # even: yyyyMMdd, odd: ISO — exercises the F18 multi-format cascade
    date_str = F.when(k % 2 == 0, "20150301").otherwise("2001-05-12")
    name_xml = F.when(
        k % 2 == 0,
        F.concat(F.lit("<MainEntity><NonIndividualName><NonIndividualName"
                       "Text>"), F.upper("s_name"),
                 F.lit("</NonIndividualNameText></NonIndividualName>"))
    ).otherwise(
        F.concat(F.lit("<LegalEntity><IndividualName><GivenName>Sup"
                       "</GivenName><FamilyName>"), F.col("s_name"),
                 F.lit("</FamilyName></IndividualName>")))
    addr_xml = F.concat(
        F.lit("<BusinessAddress><AddressDetails><State>"), state,
        F.lit("</State><Postcode>"), postcode,
        F.lit("</Postcode></AddressDetails></BusinessAddress>"),
        F.when(k % 2 == 0, "</MainEntity>").otherwise("</LegalEntity>"))
    etype_xml = F.when(
        k % 2 == 0,
        F.lit("<EntityType><EntityTypeInd>PRV</EntityTypeInd>"
              "<EntityTypeText>Australian Private Company</EntityTypeText>"
              "</EntityType>")
    ).otherwise(F.lit("<EntityType><EntityTypeInd>IND</EntityTypeInd>"
                      "</EntityType>"))
    rec = s.select(
        F.col("s_suppkey"),
        F.concat(F.lit('<ABR recordLastUpdatedDate="20240101"><ABN '
                       'status="'), status,
                 F.lit('" ABNStatusFromDate="'), date_str, F.lit('">'),
                 abn, F.lit("</ABN>"), etype_xml, name_xml, addr_xml,
                 F.lit("</ABR>")).alias("rec"))
    files = _pack_files(rec, "s_suppkey", "rec", 20, "\n")
    return (shred_abr_xml(split_abr_records(files))
            # driver compare stringifies; emit the date as ISO text
            .withColumn("start_date", F.col("start_date").cast("string")))
