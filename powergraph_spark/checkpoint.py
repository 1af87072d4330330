"""Durable per-superstep checkpointing with lineage + metrics.

Analog of the reference's snapshot mechanism (snapshot_interval,
/root/reference/src/graphlab/engine/synchronous_engine.hpp:191-200,1418-1420
-> graph.save_binary, distributed_graph.hpp:1720-1833) with two
upgrades the north rule demands:

- resumable at ANY parallelism (save_binary requires the same machine
  count to reload; Parquet/Iceberg tables do not), and
- per-partition lineage + metrics recorded with each commit so a run
  can be audited and resumed mid-iteration.

Layout (an Iceberg-style table-with-manifest on plain Parquet — on a
real cluster the same CheckpointStore API is backed by an Iceberg
table where each superstep is a table snapshot; this sandbox has no
Iceberg runtime jar, so commits are directory+manifest with
write-then-rename atomicity, which preserves the same semantics:
readers only see manifests of fully-written snapshots):

    <root>/superstep=<n>/part-*.parquet     state rows
    <root>/superstep=<n>/MANIFEST.json      commit marker: superstep,
                                            per-partition row counts
                                            (lineage), metrics, schema
    <root>/metrics.jsonl                    append-only metrics log

Every filesystem operation (mkdir, manifest write, atomic rename,
listing) goes through the Hadoop FileSystem API resolved FROM THE
ROOT PATH's scheme — so an hdfs:// or s3a:// root works exactly like
a local one (the spark-submit job wires --checkpoint straight here).
Driver-local POSIX calls would silently target the wrong filesystem
on a real cluster.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from .gas import SuperstepMetrics


class _Fs:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for the
    store's root scheme."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._io = jvm.org.apache.commons.io.IOUtils
        p = self._Path(root)
        self.fs = p.getFileSystem(spark._jsc.hadoopConfiguration())

    def path(self, s: str):
        return self._Path(s)

    def mkdirs(self, s: str) -> None:
        self.fs.mkdirs(self._Path(s))

    def exists(self, s: str) -> bool:
        return bool(self.fs.exists(self._Path(s)))

    def delete(self, s: str) -> None:
        self.fs.delete(self._Path(s), True)

    def rename(self, src: str, dst: str) -> bool:
        return bool(self.fs.rename(self._Path(src), self._Path(dst)))

    def write_text(self, s: str, text: str) -> None:
        out = self.fs.create(self._Path(s), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, s: str) -> str:
        # byte-buffer read() can't work over py4j (array mutations stay
        # on the Java side); commons-io (shipped with Spark) drains the
        # stream JVM-side and returns the bytes by value.
        stream = self.fs.open(self._Path(s))
        try:
            data = self._io.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def append_line(self, s: str, line: str) -> bool:
        """Append a line where the filesystem supports it (HDFS).
        Returns False instead of falling back on append-less
        filesystems (local checksum FS, object stores) — a per-line
        whole-file rewrite there would be O(n^2) over a long run and a
        crash mid-rewrite truncates the entire history; callers route
        to one-file-per-record instead."""
        p = self._Path(s)
        try:
            out = self.fs.append(p) if self.fs.exists(p) else self.fs.create(p, False)
            try:
                out.write(bytearray((line + "\n").encode("utf-8")))
            finally:
                out.close()
            return True
        except Exception:
            return False

    def listdir(self, s: str) -> list[str]:
        if not self.exists(s):
            return []
        return [
            st.getPath().getName() for st in self.fs.listStatus(self._Path(s))
        ]


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._fs = _Fs(spark, self.root)
        self._fs.mkdirs(self.root)

    def _dir(self, superstep: int) -> str:
        return f"{self.root}/superstep={superstep:06d}"

    def _manifest(self, superstep: int) -> str:
        return f"{self._dir(superstep)}/_MANIFEST.json"

    def commit(self, superstep: int, state: DataFrame, metrics: "SuperstepMetrics") -> DataFrame:
        """Write state + lineage + metrics; return the re-read state
        (fresh scan => truncated plan)."""
        d = self._dir(superstep)
        tmp = d + ".tmp"
        if self._fs.exists(tmp):
            self._fs.delete(tmp)
        state.write.mode("overwrite").parquet(tmp)
        # per-partition lineage: physical partition -> row count,
        # computed from the just-written files (NOT from `state`, whose
        # plan would re-execute the whole superstep a second time)
        written = self.spark.read.parquet(tmp)
        lineage = [
            {"partition": int(r["p"]), "rows": int(r["n"])}
            for r in written.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        manifest = {
            "superstep": superstep,
            "schema": state.schema.jsonValue(),
            "lineage": lineage,
            "metrics": json.loads(metrics.to_json()),
        }
        self._fs.write_text(f"{tmp}/_MANIFEST.json", json.dumps(manifest))
        if self._fs.exists(d):
            self._fs.delete(d)
        # atomic commit: Hadoop FileSystem.rename signals failure by
        # RETURN VALUE (dest-exists races, object-store quirks), not by
        # raising — proceeding would append metrics for a snapshot that
        # was never committed and a later resume would silently restart
        # from an older superstep.
        if not self._fs.rename(tmp, d):
            raise IOError(
                f"checkpoint commit failed: rename {tmp} -> {d} returned false"
            )
        self._log_metrics(superstep, metrics.to_json())
        # drop any cached scan of this path (a prior run may have
        # persisted a DataFrame over the old files)
        self.spark.catalog.refreshByPath(d)
        return self.spark.read.parquet(d)

    def _log_metrics(self, superstep: int, line: str) -> None:
        """Metrics stream: true appends to metrics.jsonl where the FS
        supports them (HDFS); elsewhere one atomic file per superstep
        under metrics/ — O(1) per commit, crash loses at most the
        in-flight record. `metrics_log()` merges both layouts."""
        if not self._fs.append_line(f"{self.root}/metrics.jsonl", line):
            self._fs.mkdirs(f"{self.root}/metrics")
            self._fs.write_text(
                f"{self.root}/metrics/{superstep:06d}.json", line + "\n"
            )

    def metrics_log(self) -> list[dict]:
        """All committed metrics records, ordered by superstep."""
        out = []
        jl = f"{self.root}/metrics.jsonl"
        if self._fs.exists(jl):
            for ln in self._fs.read_text(jl).splitlines():
                if ln.strip():
                    out.append(json.loads(ln))
        for name in sorted(self._fs.listdir(f"{self.root}/metrics")):
            if name.endswith(".json"):
                out.append(
                    json.loads(self._fs.read_text(f"{self.root}/metrics/{name}"))
                )
        return sorted(out, key=lambda m: m.get("superstep", -1))

    def committed_supersteps(self) -> list[int]:
        out = []
        for name in self._fs.listdir(self.root):
            if name.startswith("superstep=") and not name.endswith(".tmp"):
                n = int(name.split("=")[1])
                if self._fs.exists(self._manifest(n)):
                    out.append(n)
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame] | None:
        steps = self.committed_supersteps()
        if not steps:
            return None
        n = steps[-1]
        return n, self.read(n)

    def read(self, superstep: int) -> DataFrame:
        d = self._dir(superstep)
        self.spark.catalog.refreshByPath(d)
        return self.spark.read.parquet(d)

    def manifest(self, superstep: int) -> dict:
        return json.loads(self._fs.read_text(self._manifest(superstep)))

    def truncate_after(self, superstep: int) -> None:
        """Drop commits newer than `superstep` (crash-mid-run tests)."""
        for n in self.committed_supersteps():
            if n > superstep:
                self._fs.delete(self._dir(n))
