"""The pinned row-wise reference parser — the byte-identity ORACLE.

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url". The C++ reference has no HTML
parser (its builtin_parsers.hpp parses edge lists only), so per
SURVEY.md §7 Phase 0 this pure-Python module IS the pinned reference
implementation; the engine's vectorized extraction
(webtext/extract.py) must reproduce its output byte-for-byte.

Contract (deliberately regular so it is expressible both row-wise here
and as JVM-side Spark SQL expressions there):

1. html bytes are UTF-8; decode strictly.
2. links  = every href value of an ``<a href="...">`` tag, in document
   order, duplicates preserved.
3. text   = html with (a) <script>/<style> blocks removed, (b) every
   remaining tag replaced by a single space, (c) the five standard
   entities decoded in one pass (&lt; &gt; &quot; &#39; &amp; — amp
   LAST, single-pass semantics), (d) ASCII whitespace runs
   ([ \\t\\n\\r\\f]+) collapsed to one space, (e) leading/trailing
   space stripped.

DO NOT "improve" this module: it is the semantics, not an
implementation detail. Any change breaks the byte-identity gate.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script>", re.DOTALL | re.IGNORECASE)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_HREF_RE = re.compile(r"""<a\s[^>]*?href="([^"]*)"[^>]*>""", re.IGNORECASE)
_WS_RE = re.compile(r"[ \t\n\r\f]+")

# single-pass entity decode; &amp; must be handled without re-scanning
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def extract_text(html: bytes) -> str:
    s = html.decode("utf-8")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def extract_links(html: bytes) -> list[str]:
    s = html.decode("utf-8")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    return _HREF_RE.findall(s)


def parse_page(html: bytes) -> tuple[str, list[str]]:
    return extract_text(html), extract_links(html)
