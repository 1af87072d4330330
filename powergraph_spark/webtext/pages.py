"""Deterministic synthetic Common-Crawl-style `pages` table.

Schema per BASELINE.json input_hint:
    url: string, warc_ts: timestamp, html: binary, text: string,
    lang: string

Generation is fully id-deterministic: every random quantity derives
from splitmix64 mixes of the row id, so the SAME table is produced at
any parallelism / partitioning (required for the two-cluster-size
benchmark to run on identical input). Out-degrees follow the
power-law construction of the reference's load_synthetic_powerlaw
(/root/reference/src/graphlab/graph/distributed_graph.hpp:2380-2412):
degree ~ d^-alpha via inverse CDF, link targets chosen by a fixed
coprime-stride walk that skips self-links.

The `text` column is the EXPECTED extraction — computed by the pinned
row-wise reference parser at generation time — so the engine's
vectorized extractor is gated byte-for-byte against it.

Generation runs distributed via mapInPandas over spark.range (numpy
kernels per Arrow batch; generation-time use of the row-wise oracle
parser is the one permitted row-wise loop, since it defines the
fixture, not the engine path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .reference_parser import extract_text

ALPHA = 2.1  # distributed_graph.hpp:2380 default
MAX_OUT = 64
LANGS = ["en", "de", "fr", "es", "it", "pt"]
_WORDS = (
    "web graph rank vertex edge crawl page link power law engine spark "
    "gather apply scatter partition shuffle iceberg parquet arrow batch "
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
).split()

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _mix(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _splitmix64(
        ids.astype(np.uint64)
        ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        ^ np.uint64(salt)
    )


def _uniform(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _mix(ids, salt, seed).astype(np.float64) / 2**64


def url_of(i: int, n_sites: int) -> str:
    return f"https://site{i % n_sites}.example/page/{i}"


def _degree_cdf(alpha: float = ALPHA, max_out: int = MAX_OUT) -> np.ndarray:
    w = np.arange(1, max_out + 1, dtype=np.float64) ** -alpha
    return np.cumsum(w / w.sum())


def out_targets(i: int, n_pages: int, deg: int, stride: int) -> list[int]:
    """Fixed-stride walk skipping self-links (distributed_graph.hpp:2396-2408)."""
    out = []
    t = (i * 7919 + 13) % n_pages
    while len(out) < deg and len(out) < n_pages - 1:
        if t != i:
            out.append(t)
        t = (t + stride) % n_pages
    return out


def expected_edges(n_pages: int, seed: int = 42, alpha: float = ALPHA,
                   max_out: int = MAX_OUT) -> list[tuple[int, int]]:
    """Driver-side oracle edge list (page index space): the link graph
    the generated html encodes, deduped per (src, dst)."""
    cdf = _degree_cdf(alpha, max_out)
    stride = 2654435761 % n_pages or 1
    ids = np.arange(n_pages, dtype=np.uint64)
    u = _uniform(ids, 1, seed)
    degs = np.searchsorted(cdf, u) + 1
    edges = set()
    for i in range(n_pages):
        for t in out_targets(i, n_pages, int(degs[i]), stride):
            edges.add((i, t))
    return sorted(edges)


def _render_html(i: int, n_pages: int, n_sites: int, deg: int, stride: int,
                 lang: str, wordsel: np.ndarray) -> bytes:
    """Seeded template with entities, script/style noise, and
    whitespace edge cases to exercise byte-identical extraction."""
    words = [_WORDS[w % len(_WORDS)] for w in wordsel]
    title = f"Page {i} &amp; the {words[0]} {words[1]}"
    links = "".join(
        f'<a href="{url_of(t, n_sites)}" class="l{j % 3}">{words[(j + 2) % len(words)]} {t}</a>\n'
        for j, t in enumerate(out_targets(i, n_pages, deg, stride))
    )
    paras = "".join(
        f"<p>{words[(k * 3) % len(words)]} &lt;{k}&gt; {words[(k * 5 + 1) % len(words)]}"
        f"{'  ' if k % 2 else chr(9)}&quot;{words[(k * 7 + 2) % len(words)]}&#39;</p>\n"
        for k in range(3 + i % 4)
    )
    html = (
        f"<!DOCTYPE html>\n<html lang=\"{lang}\">\n<head>\n"
        f"<title>{title}</title>\n"
        f"<style>body {{ color: #000; }}</style>\n"
        f"<script>var x = {i}; if (x < 2) {{ x += 1; }}</script>\n"
        f"</head>\n<body>\n<h1>{title}</h1>\n{paras}{links}"
        f"<div>footer &amp; colophon of page {i}</div>\n</body>\n</html>\n"
    )
    return html.encode("utf-8")


def generate_pages(
    spark: SparkSession, n_pages: int, n_sites: int = 32, seed: int = 42,
    partitions: int | None = None, alpha: float = ALPHA, max_out: int = MAX_OUT,
) -> DataFrame:
    """alpha/max_out control the out-degree power law (alpha=2.1 is the
    reference default, distributed_graph.hpp:2380; lower alpha = denser
    graph for scale benchmarks)."""
    cdf = _degree_cdf(alpha, max_out)
    stride = 2654435761 % n_pages or 1
    base_ts = pd.Timestamp("2024-01-01 00:00:00")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy().astype(np.uint64)
            u_deg = _uniform(ids, 1, seed)
            degs = np.searchsorted(cdf, u_deg) + 1
            lang_ix = _mix(ids, 2, seed) % np.uint64(len(LANGS))
            wordsel = np.stack(
                [(_mix(ids, 100 + k, seed) % np.uint64(97)).astype(np.int64)
                 for k in range(24)],
                axis=1,
            )
            rows = []
            for j, i in enumerate(ids.tolist()):
                lang = LANGS[int(lang_ix[j])]
                html = _render_html(
                    int(i), n_pages, n_sites, int(degs[j]), stride, lang,
                    wordsel[j],
                )
                rows.append(
                    (
                        url_of(int(i), n_sites),
                        base_ts + pd.Timedelta(seconds=int(i)),
                        html,
                        extract_text(html),  # pinned oracle output
                        lang,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    P = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        spark.range(0, n_pages, numPartitions=min(P, max(1, n_pages // 100 or 1)))
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages_table(spark: SparkSession, path: str, n_pages: int, **kw) -> None:
    """Materialize the pages table as Parquet (Iceberg stand-in; on a
    real cluster this is `.writeTo(...).using('iceberg')`)."""
    generate_pages(spark, n_pages, **kw).write.mode("overwrite").parquet(path)
