"""HTML → text extraction (functions/html.py, r7).

Goldens pin each clause of the documented contract; the fuzz pins the
Spark chain to an independently-written python twin over randomized
compositions of markup fragments.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.functions import html as hx


def ev(spark, expr_fn, value):
    return spark.range(1).select(
        expr_fn(F.lit(value).cast("string")).alias("out")).head()[0]


# --- extract_html_text goldens ----------------------------------------------

@pytest.mark.parametrize("html,expected", [
    # plain text passes through
    ("hello world", "hello world"),
    # inline tags become spaces, words keep their boundaries
    ("<b>bold</b>and<i>italic</i>", "bold and italic"),
    # block tags become line structure
    ("<p>one</p><p>two</p>", "one\ntwo"),
    ("line<br>break", "line\nbreak"),
    # script/style bodies die wholesale, including markup-looking code
    ('<script>if (1 < 2) { x("<b>hi</b>"); }</script>after', "after"),
    ("<style>p { color: red; }</style>after", "after"),
    # case-insensitive tag matching
    ("<SCRIPT>var x;</SCRIPT><P>text</P>", "text"),
    # comments vanish, even with tags inside
    ("a<!-- <div>chrome</div> -->b", "a b"),
    # the whole <head> block is not body text
    ("<head><title>T</title><meta x></head><body>B</body>", "B"),
    # entities decode; &amp;lt; renders as &lt; (single decode)
    ("x &amp; y &lt;z&gt; &quot;q&quot; &nbsp;w", 'x & y <z> "q" w'),
    ("literal &amp;lt; stays", "literal &lt; stays"),
    # whitespace: runs collapse, blank-line runs fold, ends trim
    ("  a   b  \n\n\n  c  ", "a b\nc"),
    # empty / markup-only inputs
    ("", ""),
    ("<p></p><div></div>", ""),
])
def test_extract_html_text_goldens(spark, html, expected):
    assert ev(spark, hx.extract_html_text, html) == expected


def test_extract_html_text_null(spark):
    assert ev(spark, hx.extract_html_text, None) is None


def test_full_page_shape(spark):
    page = ('<!DOCTYPE html><html><HEAD><title> T </title>'
            '<style>b{}</style><script>s("<p>")</script></HEAD>'
            '<body><!-- c --><h1>H</h1><p>body text</p>'
            '<ul><li>i1</li><li>i2</li></ul>'
            '<div>&quot;F&quot;&nbsp;Co</div></body></html>')
    assert ev(spark, hx.extract_html_text, page) == \
        'H\nbody text\ni1\ni2\n"F" Co'


# --- html_title ---------------------------------------------------------------

@pytest.mark.parametrize("html,expected", [
    ("<title>My  Page</title>", "My Page"),
    ("<TITLE lang=en> Doc &amp; Co </TITLE>", "Doc & Co"),
    ("<title>multi\nline</title>", "multi line"),
    ("<title></title>", None),
    ("no title here", None),
    ("", None),
])
def test_html_title(spark, html, expected):
    assert ev(spark, hx.html_title, html) == expected


def test_html_text_ratio(spark):
    # 'ab' visible out of 9 chars of html
    got = ev(spark, hx.html_text_ratio, "<p>ab</p>")
    assert got == pytest.approx(2 / 9)
    assert ev(spark, hx.html_text_ratio, "") is None


# --- fuzz vs python twin -------------------------------------------------------

_ENTS = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
         ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")]
_BLOCK = (r"(?is)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|thead|tbody|"
          r"section|article|header|footer|blockquote|pre|form)[^>]*>")


def _twin(html: str) -> str:
    out = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", html)
    out = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", out)
    out = re.sub(r"(?s)<!--.*?-->", " ", out)
    out = re.sub(r"(?is)<head[^>]*>.*?</head>", " ", out)
    out = re.sub(_BLOCK, "\n", out)
    out = re.sub(r"(?s)<[^>]*>", " ", out)
    for ent, rep in _ENTS:
        out = out.replace(ent, rep)
    out = re.sub(r"[ \t\x0B\f\r]+", " ", out)
    out = re.sub(r" *\n", "\n", out)
    out = re.sub(r"[ ]*\n[\n ]*", "\n", out)
    return re.sub(r"^[\n ]+|[\n ]+$", "", out)


def test_fuzz_extract_vs_twin(spark):
    rng = random.Random(23)
    frags = ["word", "two words", "<p>", "</p>", "<div class='x'>",
             "</div>", "<br>", "<b>", "</b>", "<h2>", "</h2>",
             "<script>a < b; \"</b>\"</script>", "</script>",
             "<style>p{}</style>", "<!-- hidden <p>x</p> -->",
             "&amp;", "&lt;", "&nbsp;", "&amp;lt;", "  ", "\n", "\t",
             "<title>t</title>", "<head><meta></head>", "<ul><li>i</li></ul>",
             "5 > 3", "<unknown attr='v'>", "plain & raw"]
    vals = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 25)))
            for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.o for r in
           df.select(hx.extract_html_text(F.col("s")).alias("o")).collect()]
    bad = [(v, g, _twin(v)) for v, g in zip(vals, got) if g != _twin(v)]
    assert not bad, f"first 3 = {bad[:3]}"
