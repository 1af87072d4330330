"""URL canonicalization + host-level graph rollup.

A Common-Crawl-scale link pipeline (BASELINE.json input_hint: pages
(url, warc_ts, html, text, lang)) needs URL identity before hashing
vertices: the same page reached via `HTTP://Site.COM:80/a/?utm_x=1#f`
and `http://site.com/a` must collapse to one vertex, and domain-level
analytics (host PageRank, inter-site link counts) need the page graph
rolled up to hosts. The reference operates on pre-built integer edge
lists (SNAP/TSV), so this layer extends its capability surface on the
Spark side the same way datapipe does.

Everything here is a pure JVM regexp/expression chain (whole-stage
codegen; no Python, RE2-portable patterns — no lookaround — so the
DuckDB oracle replays the identical canonicalization).

Canonicalization rule chain (documented contract, applied in order):
 1. trim surrounding whitespace
 2. strip the fragment (`#...`)
 3. strip tracking params (utm_*, gclid, fbclid) and repair dangling
    `?&` / `&&` / trailing `?`/`&` separators
 4. lowercase the scheme and host:port authority (path/query case is
    preserved — path case is significant per RFC 3986)
 5. strip the scheme's default port (http:80, https:443)
 6. strip a trailing `/`
URLs without a `://` authority skip steps 4-5 unchanged.

Codegen note: project-collapsing inlines the chain several times when
canonicalization, host extraction, and the non-empty filter compose in
one plan; past janino's method-size limit Spark logs an
InternalCompilerException and falls back to interpreted evaluation —
correct results, slower path. For hot 100 TB pipelines, materialize
the canonical column once (localCheckpoint / write) before fanning
out further derivations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_TRACKING_RE = r"([?&])(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&#]*"


def _strip_tracking(u: Column) -> Column:
    u = F.regexp_replace(u, _TRACKING_RE, r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    return F.regexp_replace(u, r"[?&]+$", "")


def canonicalize_url(col: Column) -> Column:
    """Apply the module's 6-step canonicalization chain (JVM-only)."""
    u = F.regexp_replace(F.trim(col), "#.*$", "")
    u = _strip_tracking(u)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    rest = F.regexp_replace(u, _AUTH_RE, "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    rebuilt = F.when(
        scheme != "", F.concat(scheme, F.lit("://"), auth, rest)
    ).otherwise(u)
    return F.regexp_replace(rebuilt, "/$", "")


def host_of(col: Column) -> Column:
    """Lowercased host (authority minus port) of a URL; '' when the
    URL has no ``scheme://`` authority."""
    return F.lower(F.regexp_extract(col, "://([^/?#:]*)", 1))


def host_graph(
    pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    canonicalize: bool = True,
    drop_self: bool = False,
) -> DataFrame:
    """Roll a page-level link-pair table up to the host graph:
    (src_host, dst_host, weight = #links). One partial-aggregated
    shuffle on the host pair — the canonicalization/host extraction is
    map-side, so at 100 TB the shuffle carries only (host, host, count)
    partial rows. ``drop_self`` removes intra-host edges (the usual
    setting for inter-site analytics)."""
    s, d = F.col(src_col), F.col(dst_col)
    if canonicalize:
        s, d = canonicalize_url(s), canonicalize_url(d)
    out = (
        pairs.select(
            host_of(s).alias("src_host"), host_of(d).alias("dst_host")
        )
        .filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    )
    if drop_self:
        out = out.filter(F.col("src_host") != F.col("dst_host"))
    return out.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


def latest_capture(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str | None = None,
) -> DataFrame:
    """Crawl-snapshot dedup: keep only the NEWEST capture of each
    canonical URL — the first pass a Common-Crawl-style ingest runs so
    re-crawled pages don't enter the corpus twice.

    One shuffle on the canonical-URL key; group sizes are captures-
    per-page, so Spark 4's WindowGroupLimit keeps the rank-1 filter
    partial (no full group materialization at 100 TB). Deterministic
    total order: ts desc, then raw url asc, then ``id_col`` asc when
    given (ties on all keys would make the survivor arbitrary —
    supply ``id_col`` when captures can share url AND timestamp).
    Adds ``canon_url`` and returns only the surviving rows.
    """
    from pyspark.sql import Window

    keys = [F.desc(ts_col), F.asc(url_col)]
    if id_col:
        keys.append(F.asc(id_col))
    w = Window.partitionBy("canon_url").orderBy(*keys)
    return (
        df.withColumn("canon_url", canonicalize_url(F.col(url_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def blocklist_filter(
    docs: DataFrame,
    blocked_hosts: list[str],
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop rows whose URL's host is a blocked domain OR any subdomain
    of one (blocking ``example.com`` blocks ``a.b.example.com`` but
    NOT ``notexample.com`` — matching is on dot boundaries). The
    standard crawl-hygiene filter (UT1/ads blocklists shape).

    Scale shape: the blocklist is a driver-side constant folded into
    ONE literal array; matching is a pure JVM F.exists over it (list
    sizes in the tens of thousands stay KBs of plan constant) — no
    join, no shuffle, pipelined into the scan. For multi-million-entry
    lists switch to a broadcast join on the registrable-domain suffix;
    this literal form is exact and cheaper below that."""
    blocked = sorted({b.strip().lower().lstrip(".") for b in blocked_hosts
                      if b.strip()})
    h = host_of(canonicalize_url(F.col(url_col)))
    lst = F.array(*[F.lit(b) for b in blocked])
    hit = F.exists(
        lst,
        lambda b: (h == b) | h.endswith(F.concat(F.lit("."), b)),
    )
    return docs.filter(hit if keep_blocked else ~hit)
