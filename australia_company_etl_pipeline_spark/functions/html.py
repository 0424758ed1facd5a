"""HTML → text extraction as native column expressions (r7).

The reference ingests Common Crawl WET files — text ALREADY extracted
from HTML by the crawl (parse_commoncrawl.py). A pipeline that starts
one step earlier (raw WARC/HTML responses, site scrapes) needs the
extraction step itself, and at 100 TB it must be pure codegen: this
module is a fixed-order chain of regexp/replace projections — no UDF,
no parser library, one pass over the scan.

Every pattern is written to the RE2-safe subset (no backreferences, no
lookaround), which keeps it valid AND identical under Java regex
(Spark) and RE2 (DuckDB) — so the driver oracle can value-check the
extraction string-exactly.

Best-effort contract (documented, tested): a regex extractor is not an
HTML5 parser. Known limitations:
- an unquoted/quoted attribute value containing ``>`` truncates that
  tag early (``<a title="a>b">``);
- CDATA sections and MS conditional comments are treated as plain
  comments/tags;
- only the common named entities + ``&#39;`` are decoded (numeric
  entities in general would need computed codepoints — a `transform`
  over matches, deliberately out of the hot path).
For corpus curation these are noise at worst: the quality/dedup gates
downstream are robust to residual markup fragments.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed-order removal chain. Order matters and is part of the contract:
# script/style bodies die wholesale FIRST (their content is code, and
# may contain markup-looking strings), then comments, then the <head>
# block (title/meta/links are not body text; html_title() reads the
# title separately from the RAW html).
_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_HEAD = r"(?is)<head[^>]*>.*?</head>"
# Tags that end a visual block become newlines so line-level operators
# (line_dedup, C4-style line filters) see real line structure.
_BLOCK_TAGS = (r"(?is)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|thead|tbody|"
               r"section|article|header|footer|blockquote|pre|form)[^>]*>")
_ANY_TAG = r"(?s)<[^>]*>"

# Literal entity decodes, fixed order: specific entities first, &amp;
# LAST — the HTML rule that '&amp;lt;' renders as '&lt;', not '<'.
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
             ("&amp;", "&")]

# Whitespace normalization (explicit classes — Java's \s includes \x0B,
# RE2's does not; spelling the class keeps both engines identical).
_HSPACE = r"[ \t\x0B\f\r]+"
_NL_RUN = r"[ ]*\n[\n ]*"
_TRIM = r"^[\n ]+|[\n ]+$"


def decode_entities(col: Column) -> Column:
    """Decode the common named HTML entities (fixed order, &amp; last)."""
    out = col
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return out


def extract_html_text(html: Column) -> Column:
    """Visible body text of an HTML document, newline-structured.

    script/style/comment/head blocks removed, block-level tag
    boundaries become newlines, remaining tags become spaces, common
    entities decoded, whitespace collapsed (runs of blank lines fold to
    one newline, lines are trimmed). NULL html → NULL.
    """
    out = F.regexp_replace(html, _SCRIPT, " ")
    out = F.regexp_replace(out, _STYLE, " ")
    out = F.regexp_replace(out, _COMMENT, " ")
    out = F.regexp_replace(out, _HEAD, " ")
    out = F.regexp_replace(out, _BLOCK_TAGS, "\n")
    out = F.regexp_replace(out, _ANY_TAG, " ")
    out = decode_entities(out)
    out = F.regexp_replace(out, _HSPACE, " ")
    out = F.regexp_replace(out, r" *\n", "\n")   # strip EOL spaces first
    out = F.regexp_replace(out, _NL_RUN, "\n")
    return F.regexp_replace(out, _TRIM, "")


def html_title(html: Column) -> Column:
    """<title> content from the RAW html (entity-decoded, whitespace
    collapsed to single spaces); missing/empty title → NULL."""
    raw = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    t = decode_entities(raw)
    t = F.regexp_replace(t, r"[ \t\x0B\f\r\n]+", " ")
    t = F.regexp_replace(t, r"^ +| +$", "")
    return F.when(t != "", t)


def html_text_ratio(html: Column) -> Column:
    """length(extracted text) / length(html) — the classic boilerplate
    signal (content pages ≫ chrome-heavy pages); NULL/empty html → NULL."""
    return F.when(
        F.length(html) > 0,
        F.length(extract_html_text(html)).cast("double")
        / F.length(html).cast("double"))
