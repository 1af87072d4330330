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


_ANCHOR_EL = r'(?is)<a\s[^>]*?href="[^"]*"[^>]*>.*?</a>'
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]


def anchor_pairs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, anchor): one row per link occurrence with
    its anchor text — the classic web-corpus enrichment (anchor text
    is a training/label signal FOR THE TARGET page, aggregated after a
    shuffle on dst_url).

    Anchor text gets the same cleanup chain as text_expr (tag strip,
    entity decode in the pinned order, ASCII whitespace normalize) so
    anchors and page text tokenize identically downstream. Pure JVM
    regex pipeline like the rest of this module — zero Python.
    """
    els = F.regexp_extract_all(
        _strip_blocks(F.col(html_col)), F.lit(_ANCHOR_EL), 0
    )
    ex = pages.select(
        F.col(url_col).alias("src_url"), F.explode(els).alias("__e")
    )
    href = F.regexp_extract("__e", r'(?i)href="([^"]*)"', 1)
    inner = F.regexp_replace(
        F.regexp_replace(F.col("__e"), r"(?is)^<a[^>]*>", ""),
        r"(?is)</a>$",
        "",
    )
    inner = F.regexp_replace(inner, _TAG, " ")
    for ent, ch in _ENTITIES:
        inner = F.replace(inner, F.lit(ent), F.lit(ch))
    inner = F.trim(F.regexp_replace(inner, _WS, " "))
    return ex.select(
        "src_url", href.alias("dst_url"), inner.alias("anchor")
    )


def anchor_texts(
    pairs: DataFrame, max_anchors: int = 32
) -> DataFrame:
    """Aggregate anchors per target page: (dst_url, n_links,
    anchors) with anchors the sorted-deduped first ``max_anchors``
    texts — bounded state per key, one partial-agg shuffle."""
    return pairs.groupBy("dst_url").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.slice(
            F.array_sort(F.collect_set("anchor")), 1, max_anchors
        ).alias("anchors"),
    )
