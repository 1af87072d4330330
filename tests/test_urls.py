"""URL canonicalization + host graph vs a pure-python rule replica."""

from __future__ import annotations

import re

from powergraph_spark.webtext import canonicalize_url, host_graph, host_of
from pyspark.sql import functions as F

URLS = [
    "HTTP://Site.Example.COM:80/Path/Page?id=3&utm_source=x#frag",
    "http://site.example.com/Path/Page?id=3",
    "https://Other.ORG:443/",
    "https://other.org",
    "  http://a.com/x/  ",
    "http://a.com/x",
    "http://b.com/?utm_campaign=z",
    "http://b.com/?utm_a=1&utm_b=2&q=ok",
    "http://c.com:8080/keep-port",
    "ftp://Files.NET:80/dir/",          # :80 kept — not http's default
    "no-scheme/path/?gclid=abc#x",
    "http://d.com/a?x=1&fbclid=zz&y=2",
]


def _canon(u: str) -> str:
    u = u.strip()
    u = re.sub(r"#.*$", "", u)
    u = re.sub(r"([?&])(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&#]*", r"\1", u)
    u = re.sub(r"\?&+", "?", u)
    u = re.sub(r"&&+", "&", u)
    u = re.sub(r"[?&]+$", "", u)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)", u)
    if m:
        scheme, auth = m.group(1).lower(), m.group(2).lower()
        if scheme == "http":
            auth = re.sub(r":80$", "", auth)
        elif scheme == "https":
            auth = re.sub(r":443$", "", auth)
        u = scheme + "://" + auth + u[m.end():]
    return re.sub(r"/$", "", u)


def _host(u: str) -> str:
    m = re.search(r"://([^/?#:]*)", u)
    return m.group(1).lower() if m else ""


def test_canonicalize_matches_replica(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [_canon(u) for u in URLS]


def test_canonicalize_collapses_equivalent_urls(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    c = [r["c"] for r in df.select(
        canonicalize_url(F.col("url")).alias("c")).collect()]
    assert c[0] == c[1]          # case/port/utm/fragment variants
    assert c[2] == c[3]          # https default port + trailing slash
    assert c[4] == c[5]          # whitespace + trailing slash
    assert ":8080" in c[8]       # non-default port survives
    assert ":80" in c[9]         # ftp's :80 is not a default port here


def test_host_of(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r["h"] for r in df.select(
        host_of(canonicalize_url(F.col("url"))).alias("h")).collect()]
    assert got[0] == "site.example.com"
    assert got[10] == ""         # schemeless


def test_host_graph_rollup(spark):
    pairs = spark.createDataFrame(
        [
            ("HTTP://A.com:80/1#f", "http://b.com/x/"),
            ("http://a.com/2", "http://b.com/y"),
            ("http://a.com/3", "http://a.com/4"),
            ("no-scheme", "http://b.com/z"),
        ],
        "src_url string, dst_url string",
    )
    hg = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(pairs).collect()
    }
    assert hg == {("a.com", "b.com"): 2, ("a.com", "a.com"): 1}
    inter = host_graph(pairs, drop_self=True).collect()
    assert {(r["src_host"], r["dst_host"]) for r in inter} == {("a.com", "b.com")}


def test_host_graph_from_synthetic_crawl(spark, tmp_path):
    # end-to-end: generated pages -> extracted link pairs -> host graph
    from powergraph_spark.webtext import link_pairs, write_pages_table

    path = str(tmp_path / "pages")
    write_pages_table(spark, path, n_pages=300, n_sites=7)
    pages = spark.read.parquet(path)
    pairs = link_pairs(pages)
    hg = host_graph(pairs)
    hosts = {r["src_host"] for r in hg.select("src_host").distinct().collect()}
    assert len(hosts) == 7
    total = hg.agg(F.sum("weight")).first()[0]
    assert total == pairs.count()


def test_latest_capture_keeps_newest_per_canonical_url(spark):
    from powergraph_spark.webtext import latest_capture

    rows = [
        # same canonical page, three captures (tracking params differ)
        (1, "HTTP://A.com:80/x?utm_source=a", 100),
        (2, "http://a.com/x?gclid=zz", 300),
        (3, "http://a.com/x", 200),
        # distinct page
        (4, "https://b.com/y/", 50),
        # timestamp tie -> url asc wins, then id asc
        (5, "http://c.com/z?utm_c=1", 70),
        (6, "http://c.com/z", 70),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    out = {r["canon_url"]: r for r in
           latest_capture(df, id_col="doc_id").collect()}
    assert set(out) == {"http://a.com/x", "https://b.com/y", "http://c.com/z"}
    assert out["http://a.com/x"]["doc_id"] == 2      # newest capture
    assert out["https://b.com/y"]["doc_id"] == 4
    assert out["http://c.com/z"]["doc_id"] == 6      # tie -> url asc


def test_latest_capture_partitioning_invariant(spark):
    from powergraph_spark.webtext import latest_capture

    df = spark.createDataFrame(
        [(i, f"http://s{i % 7}.com/p{i % 11}?gclid={i}", (i * 13) % 97)
         for i in range(200)],
        "doc_id long, url string, warc_ts long",
    )
    a = sorted(map(tuple,
                   latest_capture(df.repartition(1), id_col="doc_id")
                   .collect()))
    b = sorted(map(tuple,
                   latest_capture(df.repartition(9), id_col="doc_id")
                   .collect()))
    assert a == b
