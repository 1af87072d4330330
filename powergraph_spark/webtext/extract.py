"""Vectorized (JVM-side) text + link extraction from html.

This is the engine's hot path over the 10^12-document pages table, so
it runs entirely inside whole-stage codegen: regexp_replace /
regexp_extract_all / replace column expressions — zero Python, zero
Arrow transfer. Gated byte-for-byte against the pinned row-wise
reference parser (webtext/reference_parser.py) by
tests/test_webtext.py.

The regex dialect subset used here behaves identically in java.util.regex
and Python re for this contract: inline (?is) flags, \\b, lazy
quantifiers, explicit ASCII whitespace class (Java's \\s is
ASCII-only while Python's is unicode — so the contract pins the class
[ \\t\\n\\r\\f] explicitly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
_TAG = r"<[^>]*>"
_HREF = r'(?i)<a\s[^>]*?href="([^"]*)"[^>]*>'
_WS = r"[ \t\n\r\f]+"


def _strip_blocks(html: Column) -> Column:
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _SCRIPT, " ")
    return F.regexp_replace(s, _STYLE, " ")


def text_expr(html: Column) -> Column:
    """Byte-identical equivalent of reference_parser.extract_text."""
    s = _strip_blocks(html)
    s = F.regexp_replace(s, _TAG, " ")
    # single-pass entity decode, &amp; last (matches oracle order)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, _WS, " ")
    return F.trim(s)


def links_expr(html: Column) -> Column:
    """array<string> of href values, document order, duplicates kept —
    equivalent of reference_parser.extract_links."""
    return F.regexp_extract_all(_strip_blocks(html), F.lit(_HREF), 1)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (url, text, links)."""
    return pages.select(
        "url", text_expr(F.col("html")).alias("text"),
        links_expr(F.col("html")).alias("links"),
    )


def link_pairs(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) one row per link occurrence. Column-pruned:
    only `url` and `html` are read from the scan."""
    return pages.select(
        F.col("url").alias("src_url"),
        F.explode(links_expr(F.col("html"))).alias("dst_url"),
    )
