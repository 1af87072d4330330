"""Driver contract for the spark-graft builder (PySpark target).

Queries run the engine's operators (SURVEY.md §2) over the driver's
testdata tables; each has an ANSI-SQL oracle for DuckDB. The graph
under test is the deterministic part co-occurrence graph derived from
`lineitem` (parts appearing in the same order, oriented low->high),
plus a directed customer->supplier graph for directed ops.

Float-valued results are rounded (5dp) on BOTH sides so value-hash
comparison is robust to summation order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from powergraph_spark.algorithms import (  # noqa: E402
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from powergraph_spark.datapipe import (  # noqa: E402
    brute_force_topk,
    exact_dup_groups,
    minhash_lsh_candidates,
    simhash,
    text_stats,
)
from powergraph_spark.datapipe.text import (  # noqa: E402
    doc_fingerprint,
    quality_score,
    token_count,
)
from powergraph_spark.graph import Graph  # noqa: E402

# ----------------------------------------------------------------- helpers

# The co-occurrence edge set, as SQL (shared by every oracle):
_SQL_EDGES = """
e AS (
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
und AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
"""


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _co_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l1 = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = l1.withColumnRenamed("l_partkey", "p2")
    return (
        l1.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )


def _co_graph(spark: SparkSession, sf_dir: str, P: int = 16) -> Graph:
    return Graph.from_edges(_co_edges(spark, sf_dir), num_partitions=P)


# ----------------------------------------------------------------- queries


def q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree accessors (distributed_graph.hpp:725-794): per-vertex
    in/out degree of the co-occurrence graph."""
    g = _co_graph(spark, sf_dir)
    return g.degrees().select("id", "in_deg", "out_deg").orderBy("id")


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_reduce_vertices-style aggregation: degree -> vertex count."""
    g = _co_graph(spark, sf_dir)
    return (
        g.degrees()
        .select((F.col("in_deg") + F.col("out_deg")).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("degree")
    )


def q_pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 fixed supersteps, reference update rule
    (pagerank.cpp:99-106), rounded 5dp."""
    g = _co_graph(spark, sf_dir)
    res = pagerank(g, tol=0.0, max_iterations=3)
    out = res.state.select("id", F.round("rank", 5).alias("rank")).orderBy("id")
    g.unpersist()
    return out


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label CC at convergence (connected_component.cpp:105-113)."""
    g = _co_graph(spark, sf_dir)
    res = connected_components(g)
    out = res.state.select("id", "component").orderBy("id")
    g.unpersist()
    return out


def q_cc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram (connected_component_stats.cpp:65-155)."""
    g = _co_graph(spark, sf_dir)
    res = connected_components(g)
    out = (
        res.state.groupBy("component")
        .agg(F.count(F.lit(1)).alias("csize"))
        .groupBy("csize")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy("csize")
    )
    g.unpersist()
    return out


def q_label_propagation2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous LP supersteps with the reference tie-break
    (label_propagation.cpp:101-125)."""
    g = _co_graph(spark, sf_dir)
    res = label_propagation(g, max_iterations=2)
    out = res.state.select("id", "label").orderBy("id")
    g.unpersist()
    return out


def q_triangles_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total triangle count, degree-ordered intersection
    (undirected_triangle_count.cpp:148-560)."""
    g = _co_graph(spark, sf_dir)
    _, total = triangle_count(g)
    g.unpersist()
    return spark.createDataFrame([(total,)], "n_triangles long")


def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts (simple_undirected_triangle_count.cpp:216-288)."""
    g = _co_graph(spark, sf_dir)
    per_v, _ = triangle_count(g)
    out = per_v.orderBy("id")
    g.unpersist()
    return out


def q_neighbors_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vertex_set 1-hop expansion (distributed_graph.hpp:2471-2493):
    out-neighbors of the 10 lowest-id vertices."""
    g = _co_graph(spark, sf_dir)
    seed = g.vertices.select("id").orderBy("id").limit(10)
    return g.neighbors(seed, "out").orderBy("id")


def q_vertex_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_vertex_join (graph_vertex_join.hpp:171-522): join vertex
    degree data with the part dimension table."""
    g = _co_graph(spark, sf_dir)
    part = _load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), "p_brand", "p_retailprice"
    )
    return (
        g.degrees()
        .join(part, "id")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("in_deg") + F.col("out_deg")).alias("total_degree"),
            F.round(F.avg("p_retailprice"), 5).alias("avg_price"),
        )
        .orderBy("p_brand")
    )


def q_select_vset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select(pred) -> vertex_set (distributed_graph.hpp:2532-2550):
    high-degree vertices (degree > 40)."""
    g = _co_graph(spark, sf_dir)
    return (
        g.degrees()
        .filter((F.col("in_deg") + F.col("out_deg")) > 40)
        .select("id")
        .orderBy("id")
    )


def q_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_reduce_vertices/edges global aggregation
    (distributed_graph.hpp:966-1170): one-row graph summary."""
    g = _co_graph(spark, sf_dir)
    nv = g.vertices.count()
    ne = g.edges.count()
    deg = g.degrees().agg(
        F.sum(F.col("in_deg") + F.col("out_deg")).alias("sum_deg"),
        F.max(F.col("in_deg") + F.col("out_deg")).alias("max_deg"),
    ).first()
    return spark.createDataFrame(
        [(nv, ne, int(deg["sum_deg"]), int(deg["max_deg"]))],
        "n_vertices long, n_edges long, sum_degree long, max_degree long",
    )


def q_vset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vertex_set boolean algebra (vertex_set.hpp:267-430): sizes of
    A&B, A|B, A-B for A = odd ids, B = degree>20."""
    from powergraph_spark.graph import vset_and, vset_minus, vset_or

    g = _co_graph(spark, sf_dir)
    a = g.select_vertices(F.col("id") % 2 == 1)
    deg = g.degrees()
    b = deg.filter((F.col("in_deg") + F.col("out_deg")) > 20).select("id")
    return spark.createDataFrame(
        [(vset_and(a, b).count(), vset_or(a, b).count(), vset_minus(a, b).count())],
        "n_and long, n_or long, n_minus long",
    )


def q_sssp_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSSP (sssp.cpp:96-201), undirected hop distances from the
    min-id vertex; unreachable omitted (finite rows only so the SQL
    oracle is expressible)."""
    from powergraph_spark.algorithms import sssp as sssp_fn

    g = _co_graph(spark, sf_dir)
    source = g.vertices.agg(F.min("id")).first()[0]
    res = sssp_fn(g, source=int(source), directed=False, max_iterations=40)
    out = (
        res.state.filter(~F.isnan("dist") & (F.col("dist") != float("inf")))
        .select("id", F.col("dist").cast("long").alias("hops"))
        .orderBy("id")
    )
    g.unpersist()
    return out


def q_kcore2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core vertex set (kcore.cpp:70-185) — iterative peel; no SQL
    oracle (fixpoint with aggregates), driver records rows-only."""
    from powergraph_spark.algorithms import kcore_vertices

    g = _co_graph(spark, sf_dir)
    return kcore_vertices(g, 2).orderBy("id")


def q_coloring_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy coloring + the reference's own validation
    (simple_coloring.cpp:262): monochromatic-edge count MUST be 0, so
    the oracle is the constant 0 — this checks the engine produces a
    valid coloring, exactly the reference's self-check."""
    from powergraph_spark.algorithms import coloring, count_conflicts

    g = _co_graph(spark, sf_dir)
    colors = coloring(g)
    return spark.createDataFrame(
        [(count_conflicts(g, colors),)], "n_conflicts long"
    )


def q_approx_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FM-bitmask approximate diameter (approximate_diameter.cpp) —
    rows-only (probabilistic estimate)."""
    from powergraph_spark.algorithms import approx_diameter

    g = _co_graph(spark, sf_dir)
    hops, _ = approx_diameter(g, r=8, max_hops=32)
    return spark.createDataFrame([(hops,)], "diameter_hops long")


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (rows-only; recall vs brute force gated in
    pytest)."""
    from powergraph_spark.datapipe import lsh_topk

    vecs = _load(spark, sf_dir, "embeddings")
    qs = vecs.filter(F.col("vec_id") < 5)
    return lsh_topk(vecs, qs, k=5, n_planes=6).orderBy("query_id", "rank")


# --------------------------------------------- training-data pipeline ops


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counting over the documents table (JVM exprs)."""
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_got"),
    ).orderBy("doc_id")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic (length/alpha/punct bands)."""
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup hash-groups (all groups, so the comparison is
    non-trivial even on a dup-free corpus)."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .orderBy("text_md5")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-min-hash document fingerprint (rolling 5-gram md5 min)."""
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def q_lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")).orderBy("lang")


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 5 vectors (the exact
    baseline of the ANN path)."""
    vecs = _load(spark, sf_dir, "embeddings")
    qs = vecs.filter(F.col("vec_id") < 5)
    return brute_force_topk(vecs, qs, k=5).orderBy("query_id", "rank")


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (xxhash64-based — no SQL
    oracle; driver records rows-only)."""
    docs = _load(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, num_hashes=32, bands=16, k=3).orderBy(
        "id_a", "id_b"
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints via Arrow-vectorized pandas UDF
    (rows-only check — hash internals not SQL-expressible)."""
    docs = _load(spark, sf_dir, "documents")
    return simhash(docs).select("doc_id", "simhash").orderBy("doc_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to convergence (tol 1e-4 at smoke scale) on
    the sf0.001 co-occurrence graph."""
    sf_dir = "/root/testdata/sf0.001"
    g = _co_graph(spark, sf_dir, P=8)
    res = pagerank(g, tol=1e-4, max_iterations=50)
    return res.state.select("id", F.round("rank", 5).alias("rank")).orderBy(
        F.desc("rank"), "id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree_stats": q_degree_stats,
        "degree_histogram": q_degree_histogram,
        "pagerank3": q_pagerank3,
        "connected_components": q_connected_components,
        "cc_sizes": q_cc_sizes,
        "label_propagation2": q_label_propagation2,
        "triangles_total": q_triangles_total,
        "triangles_per_vertex": q_triangles_per_vertex,
        "neighbors_hop": q_neighbors_hop,
        "vertex_join": q_vertex_join,
        "select_vset": q_select_vset,
        "graph_stats": q_graph_stats,
        "vset_ops": q_vset_ops,
        "sssp_hops": q_sssp_hops,
        "kcore2": q_kcore2,
        "coloring_conflicts": q_coloring_conflicts,
        "approx_diameter": q_approx_diameter,
        "lsh_topk": q_lsh_topk,
        "text_stats": q_text_stats,
        "quality_score": q_quality_score,
        "exact_dup_groups": q_exact_dup_groups,
        "doc_fingerprint": q_doc_fingerprint,
        "lang_histogram": q_lang_histogram,
        "knn_cosine": q_knn_cosine,
        "minhash_candidates": q_minhash_candidates,
        "simhash": q_simhash,
    }


# -------------------------------------------------------------- oracle SQL


def oracle_sql() -> dict[str, str]:
    E = _SQL_EDGES
    return {
        "degree_stats": f"""
WITH {E}
SELECT v.id,
       COALESCE(i.c, 0) AS in_deg,
       COALESCE(o.c, 0) AS out_deg
FROM v
LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst) i ON i.id = v.id
LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src) o ON o.id = v.id
ORDER BY v.id
""",
        "degree_histogram": f"""
WITH {E},
deg AS (SELECT src AS id FROM und GROUP BY src),
dc AS (SELECT src AS id, COUNT(*) AS degree FROM und GROUP BY src)
SELECT degree, COUNT(*) AS n_vertices FROM dc GROUP BY degree ORDER BY degree
""",
        "pagerank3": f"""
WITH {E},
od AS (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src),
r0 AS (SELECT id, 1.0 AS rank FROM v),
r1 AS (
  SELECT v.id, 0.15 + 0.85 * COALESCE(SUM(r0.rank / od.c), 0.0) AS rank
  FROM v LEFT JOIN e ON e.dst = v.id
         LEFT JOIN r0 ON r0.id = e.src
         LEFT JOIN od ON od.id = e.src
  GROUP BY v.id
),
r2 AS (
  SELECT v.id, 0.15 + 0.85 * COALESCE(SUM(r1.rank / od.c), 0.0) AS rank
  FROM v LEFT JOIN e ON e.dst = v.id
         LEFT JOIN r1 ON r1.id = e.src
         LEFT JOIN od ON od.id = e.src
  GROUP BY v.id
),
r3 AS (
  SELECT v.id, 0.15 + 0.85 * COALESCE(SUM(r2.rank / od.c), 0.0) AS rank
  FROM v LEFT JOIN e ON e.dst = v.id
         LEFT JOIN r2 ON r2.id = e.src
         LEFT JOIN od ON od.id = e.src
  GROUP BY v.id
)
SELECT id, ROUND(rank, 5) AS rank FROM r3 ORDER BY id
""",
        "connected_components": f"""
WITH RECURSIVE {E},
walk(id, comp) AS (
  SELECT id, id FROM v
  UNION
  SELECT und.dst AS id, walk.comp
  FROM walk JOIN und ON und.src = walk.id
  WHERE walk.comp < und.dst
)
SELECT id, MIN(comp) AS component FROM walk GROUP BY id ORDER BY id
""",
        "cc_sizes": f"""
WITH RECURSIVE {E},
walk(id, comp) AS (
  SELECT id, id FROM v
  UNION
  SELECT und.dst AS id, walk.comp
  FROM walk JOIN und ON und.src = walk.id
  WHERE walk.comp < und.dst
),
cc AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
sizes AS (SELECT component, COUNT(*) AS csize FROM cc GROUP BY component)
SELECT csize, COUNT(*) AS n_components FROM sizes GROUP BY csize ORDER BY csize
""",
        "label_propagation2": f"""
WITH {E},
l1 AS (
  SELECT v.id, COALESCE(MIN(und.src), v.id) AS label
  FROM v LEFT JOIN und ON und.dst = v.id
  GROUP BY v.id
),
c2 AS (
  SELECT und.dst AS id, l1.label AS lbl, COUNT(*) AS cnt
  FROM und JOIN l1 ON l1.id = und.src
  GROUP BY und.dst, l1.label
),
b2 AS (
  SELECT id, lbl,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS rn
  FROM c2
)
SELECT l1.id, COALESCE(b2.lbl, l1.label) AS label
FROM l1 LEFT JOIN (SELECT id, lbl FROM b2 WHERE rn = 1) b2 ON b2.id = l1.id
ORDER BY l1.id
""",
        "triangles_total": f"""
WITH {E},
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
o AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN e.src ELSE e.dst END AS lo,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN e.dst ELSE e.src END AS hi
  FROM e JOIN deg da ON da.id = e.src JOIN deg db ON db.id = e.dst
)
SELECT COUNT(*) AS n_triangles
FROM o ab JOIN o bc ON bc.lo = ab.hi JOIN o ac ON ac.lo = ab.lo AND ac.hi = bc.hi
""",
        "triangles_per_vertex": f"""
WITH {E},
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
o AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN e.src ELSE e.dst END AS lo,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN e.dst ELSE e.src END AS hi
  FROM e JOIN deg da ON da.id = e.src JOIN deg db ON db.id = e.dst
),
tri AS (
  SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
  FROM o ab JOIN o bc ON bc.lo = ab.hi JOIN o ac ON ac.lo = ab.lo AND ac.hi = bc.hi
),
credit AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v.id, COALESCE(t.n, 0) AS n_triangles
FROM v LEFT JOIN (SELECT id, COUNT(*) AS n FROM credit GROUP BY id) t ON t.id = v.id
ORDER BY v.id
""",
        "neighbors_hop": f"""
WITH {E},
seed AS (SELECT id FROM v ORDER BY id LIMIT 10)
SELECT DISTINCT e.dst AS id
FROM e JOIN seed ON e.src = seed.id
ORDER BY id
""",
        "vertex_join": f"""
WITH {E},
deg AS (
  SELECT v.id,
         COALESCE(i.c, 0) AS in_deg, COALESCE(o.c, 0) AS out_deg
  FROM v
  LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst) i ON i.id = v.id
  LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src) o ON o.id = v.id
)
SELECT p.p_brand,
       COUNT(*) AS n_parts,
       SUM(deg.in_deg + deg.out_deg) AS total_degree,
       ROUND(AVG(p.p_retailprice), 5) AS avg_price
FROM deg JOIN part p ON p.p_partkey = deg.id
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
        "select_vset": f"""
WITH {E},
dc AS (SELECT src AS id, COUNT(*) AS degree FROM und GROUP BY src)
SELECT id FROM dc WHERE degree > 40 ORDER BY id
""",
        "graph_stats": f"""
WITH {E},
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src)
SELECT (SELECT COUNT(*) FROM v) AS n_vertices,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT SUM(d) FROM deg) AS sum_degree,
       (SELECT MAX(d) FROM deg) AS max_degree
""",
        "vset_ops": f"""
WITH {E},
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
a AS (SELECT id FROM v WHERE id % 2 = 1),
b AS (SELECT id FROM deg WHERE d > 20)
SELECT (SELECT COUNT(*) FROM (SELECT id FROM a INTERSECT SELECT id FROM b)) AS n_and,
       (SELECT COUNT(*) FROM (SELECT id FROM a UNION SELECT id FROM b)) AS n_or,
       (SELECT COUNT(*) FROM (SELECT id FROM a EXCEPT SELECT id FROM b)) AS n_minus
""",
        "sssp_hops": f"""
WITH RECURSIVE {E},
seed AS (SELECT MIN(id) AS id FROM v),
walk(id, hops) AS (
  SELECT id, 0 FROM seed
  UNION
  SELECT und.dst, walk.hops + 1
  FROM walk JOIN und ON und.src = walk.id
  WHERE walk.hops < 39
)
SELECT id, MIN(hops)::BIGINT AS hops FROM walk GROUP BY id ORDER BY id
""",
        "coloring_conflicts": """
SELECT CAST(0 AS BIGINT) AS n_conflicts
""",
        "text_stats": """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '[ \t\n\r\f]+')) END::BIGINT
         AS n_tokens,
       length(text)::BIGINT AS n_chars_got
FROM documents ORDER BY doc_id
""",
        "quality_score": """
SELECT doc_id,
       ROUND(
         0.4 * LEAST(length(text) / 500.0, 1.0)
       + 0.4 * (CASE WHEN length(text) > 0
                THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                     / length(text) ELSE 0.0 END)
       + 0.2 * (1.0 - LEAST(
           (CASE WHEN length(text) > 0
            THEN length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                 / length(text) ELSE 0.0 END) * 4, 1.0)),
       5) AS quality
FROM documents ORDER BY doc_id
""",
        "exact_dup_groups": """
SELECT md5(text) AS text_md5, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM documents GROUP BY md5(text) ORDER BY text_md5
""",
        "doc_fingerprint": """
WITH toks AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '[ \t\n\r\f]+') END AS t
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(t) >= 5 THEN
         list_min(list_transform(
           generate_series(1, len(t) - 4),
           i -> md5(array_to_string(t[i:i+4], ' '))))
       ELSE md5(text) END AS fingerprint
FROM toks ORDER BY doc_id
""",
        "lang_histogram": """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
""",
        "knn_cosine": """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 5
),
v AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
scored AS (
  SELECT q.query_id, v.neighbor_id,
         list_dot_product(q.qv, v.nv)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(v.nv, v.nv))) AS sim
  FROM v CROSS JOIN q WHERE v.neighbor_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, ROUND(sim, 5) AS sim
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
""",
    }
