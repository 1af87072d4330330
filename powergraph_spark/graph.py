"""The distributed property graph as two DataFrames.

PowerGraph's single abstraction is distributed_graph<VertexData,
EdgeData> (/root/reference/src/graphlab/graph/distributed_graph.hpp:103-312).
Spark-first mapping (SURVEY.md §1.4):

- ``edges(src BIGINT, dst BIGINT, [edge-data cols...], pid INT)`` —
  each edge lives in exactly one partition (`pid`, vertex-cut).
- ``vertices(id BIGINT, [vertex-data cols...])`` — one row per vertex;
  master/mirror replication is *not* materialized: the scatter join
  replicates vertex state to edge partitions each superstep, which is
  exactly the reference's master->mirror synchronize
  (/root/reference/src/graphlab/graph/distributed_graph.hpp:2846-2900)
  executed as a shuffle.

Structural rules enforced at construction (finalize() analog,
/root/reference/src/graphlab/graph/ingress/distributed_ingress_base.hpp:181-510):
no self-edges (local_graph.hpp:341-346), no duplicate (src,dst) pairs
(local_graph.hpp:196-199), vertices implicitly created from edge
endpoints (distributed_graph.hpp:160-162).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .partition import assign_pid, replication_factor


@dataclass
class Graph:
    """Directed property graph over two DataFrames.

    ``edges`` always carries (src, dst, pid); ``vertices`` always
    carries (id,). Extra columns are the user's vertex/edge data
    (template params VertexData/EdgeData in the reference).
    """

    edges: DataFrame
    vertices: DataFrame
    num_partitions: int
    _stats: dict = field(default_factory=dict)

    # ------------------------------------------------------------- build
    @staticmethod
    def from_edges(
        edges: DataFrame,
        vertices: DataFrame | None = None,
        num_partitions: int | None = None,
        strategy: str = "grid",
        salt_cap: int | None = None,
        drop_self_loops: bool = True,
        dedup: bool = True,
        persist: bool = True,
        src: str = "src",
        dst: str = "dst",
    ) -> "Graph":
        """finalize(): self-loop filter -> pid -> repartition -> dedupe.

        ONE shuffle total (the pid repartition) — genuinely. The pid is
        a pure function of (src, dst), so duplicate pairs always land
        in the same partition, and the dedup (duplicate edges fail the
        reference's finalization, local_graph.hpp:196-199) runs AFTER
        the repartition as a partition-local window (sort within
        partition + lag-compare): the window's required distribution
        hashpartitioning(pid) is exactly what the repartition
        produced, so Catalyst inserts no second exchange. A
        dropDuplicates BEFORE the repartition would be a full extra
        hash-agg exchange of the entire edge set — at 100 TB, a second
        all-to-all as large as the ingest itself. (The 'identity'
        strategy's pid is NOT a pair function, so it keeps the
        up-front dedup.)
        """
        spark = edges.sparkSession
        P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        e = edges
        if src != "src":
            e = e.withColumnRenamed(src, "src")
        if dst != "dst":
            e = e.withColumnRenamed(dst, "dst")
        e = e.withColumn("src", F.col("src").cast("long")).withColumn(
            "dst", F.col("dst").cast("long")
        )
        if drop_self_loops:
            # self-edges are fatal in the reference (local_graph.hpp:341-346)
            e = e.filter(F.col("src") != F.col("dst"))
        if dedup and strategy == "identity":
            e = e.dropDuplicates(["src", "dst"])
        e = assign_pid(e, P, strategy=strategy, salt_cap=salt_cap)
        e = e.repartition(P, "pid")
        if dedup and strategy != "identity":
            from pyspark.sql import Window

            w = Window.partitionBy("pid").orderBy("src", "dst")
            e = (
                e.withColumn("_ps", F.lag("src").over(w))
                .withColumn("_pd", F.lag("dst").over(w))
                .filter(
                    ~(
                        F.col("_ps").eqNullSafe(F.col("src"))
                        & F.col("_pd").eqNullSafe(F.col("dst"))
                    )
                )
                .drop("_ps", "_pd")
            )
        if persist:
            e = e.persist(StorageLevel.MEMORY_AND_DISK)

        if vertices is None:
            # add_edge implicitly creates vertices (distributed_graph.hpp:160-162)
            v = (
                e.select(F.col("src").alias("id"))
                .unionAll(e.select(F.col("dst").alias("id")))
                .distinct()
            )
        else:
            v = vertices
            if "id" not in v.columns:
                v = v.withColumnRenamed(v.columns[0], "id")
            v = v.withColumn("id", F.col("id").cast("long"))
        if persist:
            v = v.persist(StorageLevel.MEMORY_AND_DISK)
        return Graph(edges=e, vertices=v, num_partitions=P)

    @staticmethod
    def from_pandas(spark: SparkSession, pairs, **kw) -> "Graph":
        """Tiny-fixture constructor: list of (src, dst) tuples."""
        df = spark.createDataFrame(
            [(int(s), int(d)) for s, d in pairs], "src long, dst long"
        )
        return Graph.from_edges(df, **kw)

    # ------------------------------------------------------------- stats
    def num_vertices(self) -> int:
        if "nv" not in self._stats:
            self._stats["nv"] = self.vertices.count()
        return self._stats["nv"]

    def num_edges(self) -> int:
        if "ne" not in self._stats:
            self._stats["ne"] = self.edges.count()
        return self._stats["ne"]

    def degrees(self) -> DataFrame:
        """(id, in_deg, out_deg) with 0 for edgeless endpoints.

        Analog of vertex_record degree fields negotiated at finalize
        (distributed_graph.hpp:2606-2654). Two partial-aggregated
        shuffles; at scale this is cached once in the graph's stats
        table, not recomputed per superstep.
        """
        out_d = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_deg")
        )
        in_d = self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_deg")
        )
        return (
            self.vertices.select("id")
            .join(out_d, "id", "left")
            .join(in_d, "id", "left")
            .select(
                "id",
                F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            )
        )

    def powerlaw_alpha(
        self, direction: str = "out", dmin: int = 1
    ) -> tuple[float, int]:
        """MLE of the degree-distribution power-law exponent
        (Clauset-Shalizi-Newman 2009 continuous approximation):
        alpha = 1 + n / Σ_{d >= dmin} ln(d / (dmin - 0.5)). The
        diagnostic companion to load_synthetic_powerlaw / the skew
        machinery — the measured alpha decides hub salting and skew
        caps at ingest. One degree pass + one global aggregate.
        Returns (alpha, n_samples); alpha = inf when every sampled
        degree equals dmin (zero log-sum)."""
        col = {"out": "out_deg", "in": "in_deg"}[direction]
        row = (
            self.degrees()
            .filter(F.col(col) >= dmin)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.log(F.col(col) / F.lit(dmin - 0.5))).alias("s"),
            )
            .first()
        )
        n, s = int(row["n"]), float(row["s"] or 0.0)
        if s <= 0.0:
            return float("inf"), n
        return 1.0 + n / s, n

    def replication_factor(self) -> float:
        return replication_factor(self.edges)

    # --------------------------------------------------------- dataflow
    # The reference's graph-wide primitives (SURVEY.md §2.3). Thin and
    # declarative on purpose — Catalyst owns the physical plan.

    def map_reduce_vertices(self, *agg_cols) -> DataFrame:
        """map over vertices + global += reduce
        (distributed_graph.hpp:966-1024) == vertices.agg(...)."""
        return self.vertices.agg(*agg_cols)

    def map_reduce_edges(self, *agg_cols) -> DataFrame:
        """(distributed_graph.hpp:1093-1170) == edges.agg(...)."""
        return self.edges.agg(*agg_cols)

    def transform_vertices(self, **cols) -> "Graph":
        """mutate vertex data (distributed_graph.hpp:1473-1496); the
        master->mirror sync is implicit in the next scatter join."""
        v = self.vertices
        for name, col in cols.items():
            v = v.withColumn(name, col)
        return Graph(self.edges, v, self.num_partitions, dict(self._stats))

    def transform_edges(self, **cols) -> "Graph":
        """(distributed_graph.hpp:1556-1599)."""
        e = self.edges
        for name, col in cols.items():
            e = e.withColumn(name, col)
        return Graph(e, self.vertices, self.num_partitions, dict(self._stats))

    def select_vertices(self, pred) -> DataFrame:
        """predicate -> vertex_set (distributed_graph.hpp:2532-2550);
        a vertex_set is a slim id-DataFrame."""
        return self.vertices.filter(pred).select("id")

    def neighbors(self, vset: DataFrame, direction: str = "out") -> DataFrame:
        """1-hop expansion of a vertex set
        (distributed_graph.hpp:2471-2493): semi-join frontier growth."""
        f = vset.select(F.col(vset.columns[0]).alias("id"))
        outs, ins = None, None
        if direction in ("out", "all"):
            outs = self.edges.join(f, self.edges.src == f.id, "leftsemi").select(
                F.col("dst").alias("id")
            )
        if direction in ("in", "all"):
            ins = self.edges.join(f, self.edges.dst == f.id, "leftsemi").select(
                F.col("src").alias("id")
            )
        if direction == "out":
            return outs.distinct()
        if direction == "in":
            return ins.distinct()
        if direction == "all":
            return outs.unionAll(ins).distinct()
        raise ValueError(direction)

    def symmetrized_edges(self) -> DataFrame:
        """Both directions of every edge, deduped — the undirected view
        used by CC/triangles (graph_basic_types.hpp:54)."""
        fwd = self.edges.select("src", "dst")
        rev = self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return fwd.unionAll(rev).dropDuplicates(["src", "dst"])

    def all_edges_view(self) -> DataFrame:
        """Both directions WITHOUT dedup — the exact ALL_EDGES gather
        multiset (in-edge list + out-edge list). A reciprocal pair
        (u,v),(v,u) contributes v twice to u's gather, matching the
        reference (ivertex_program.hpp:477-495); required for LP's
        label counter to match exactly."""
        fwd = self.edges.select("src", "dst")
        rev = self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return fwd.unionAll(rev)

    def unpersist(self) -> None:
        try:
            self.edges.unpersist()
            self.vertices.unpersist()
        except Exception:
            pass


# vertex_set algebra (vertex_set.hpp:267-430): id-DataFrames + set ops.
def vset_and(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def vset_or(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.union(b).distinct()


def vset_minus(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b).distinct()


def vset_complement(universe: DataFrame, a: DataFrame) -> DataFrame:
    return universe.join(a, "id", "left_anti")
