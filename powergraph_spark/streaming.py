"""Structured Streaming surface: streaming ingest + event-time analytics.

The reference is a batch engine (its "dynamic" computation is async
scheduling over a static graph, /root/reference/src/graphlab/engine/
async_consistent_engine.hpp — declared BSP-equivalent in SURVEY §2.4).
This module is the Spark-first capability the reference cannot offer:
the SAME declarative transformations running incrementally over
unbounded inputs.

- ``stream_pages_to_edges``: readStream(pages) -> the identical
  vectorized link extraction used by batch ingest -> append-mode edge
  sink. New crawl shards become graph edges as they land.
- ``windowed_event_counts``: event-time tumbling-window aggregation
  with a late-data watermark; the same function compiles for batch
  DataFrames (withWatermark is a no-op there), which is how the
  streaming path is oracle-checked — one definition, two runtimes.
- ``sessionize``: custom stateful operator via applyInPandasWithState
  (gap-based user sessions) — the pattern for semantics Spark's
  built-in operators can't express.

All sinks used here are exactly-once parquet append with a checkpoint
directory; ``trigger(availableNow)`` drains the current input and
stops, which is both the test harness mode and the production backfill
mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_pages_to_edges(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental crawl ingest: watch ``pages_dir`` for parquet
    shards, extract link edges (same JVM regex pipeline as batch
    ingest), append (src, dst) to ``output_dir``. Returns the
    StreamingQuery; with available_now the call blocks until the
    current input is drained."""
    from .webtext.extract import link_pairs
    from .webtext.ingest import url_id

    schema = spark.read.parquet(pages_dir).schema
    pages = spark.readStream.schema(schema).parquet(pages_dir)
    edges = link_pairs(pages).select(
        url_id(F.col("src_url")).alias("src"),
        url_id(F.col("dst_url")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    writer = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    time_col: str = "ts",
) -> DataFrame:
    """(window_start, event_type, n_events): event-time tumbling
    windows; late rows beyond the watermark are dropped (append-mode
    compatible). Batch DataFrames compile identically (watermark is a
    no-op), so the streaming result is verifiable against the batch
    run of the SAME function — and against an ANSI time_bucket oracle."""
    # parquet timestamps may arrive as TIMESTAMP_NTZ; watermarks and
    # window() want the session TIMESTAMP type (UTC session -> identity)
    events = events.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def run_stream_to_parquet(
    sdf: DataFrame, output_dir: str, checkpoint_dir: str
):
    """Drain a streaming DataFrame to a parquet sink (availableNow,
    exactly-once via the checkpoint) and block until done."""
    q = (
        sdf.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    time_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark_minutes: float | None = None,
) -> DataFrame:
    """Gap-based user sessions as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState, GroupState timeout on the event-time
    watermark): consecutive events of a user belong to one session
    while gaps stay under ``gap_minutes``; a session closes when the
    watermark passes its end + gap. On a batch DataFrame the same
    semantics run as a window/lag expression pipeline (no Python) —
    used as the differential oracle for the stateful path.

    ``watermark_minutes`` (default = ``gap_minutes``) is the late-data
    tolerance. With the default delay == gap, every on-time event is
    provably within ``gap`` of the stored session start, so the state
    update is a pure widen and the stream matches the batch oracle
    exactly. A LARGER delay admits on-time events more than ``gap``
    before the stored start; those merge into their own earlier
    session(s), emitted as the batch oracle would — see the interval
    merge in ``fn``."""
    import pandas as pd

    gap = pd.Timedelta(minutes=gap_minutes)
    events = events.withColumn(time_col, F.col(time_col).cast("timestamp"))

    if not events.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(user_col).orderBy(time_col)
        sec = F.unix_micros(F.col(time_col)) / F.lit(1e6)
        marked = events.select(
            user_col, time_col, value_col,
            F.when(
                sec - F.lag(sec).over(w) > gap_minutes * 60.0,
                1,
            ).otherwise(0).alias("_new_session"),
        ).withColumn("_sid", F.sum("_new_session").over(
            Window.partitionBy(user_col).orderBy(time_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ))
        return (
            marked.groupBy(user_col, "_sid")
            .agg(
                F.min(time_col).alias("session_start"),
                F.max(time_col).alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(value_col), 5).alias("total_value"),
            )
            .select(
                F.col(user_col).alias("user_id"),
                "session_start", "session_end", "n_events", "total_value",
            )
        )

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        # state: (start_iso, end_iso, n, total)
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [[uid, pd.Timestamp(start), pd.Timestamp(end), n, total]],
                columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value"],
            )
            return
        rows = pd.concat(list(pdfs))
        # Exact interval merge of {stored session} ∪ {batch events}:
        # an on-time event may sort anywhere relative to the stored
        # bounds (within-batch rows are sorted below, cross-batch
        # arrival is not), including MORE than `gap` before
        # session_start — such events form their own earlier session,
        # emitted here, exactly as the fully-sorted batch oracle would.
        # (Only if further events for an already-emitted earlier
        # session arrive in a yet-later batch — possible only while the
        # per-user session front runs ahead of the global watermark by
        # more than `gap` — does the stream emit a split the batch
        # oracle would merge.)
        items = [
            (ts, ts, 1, float(val))
            for ts, val in zip(rows[time_col], rows[value_col])
        ]
        if state.exists:
            start, end, n, total = state.get
            items.append((pd.Timestamp(start), pd.Timestamp(end), n, total))
        items.sort(key=lambda t: (t[0], t[1]))
        merged = [items[0]]
        for s2, e2, n2, t2 in items[1:]:
            s1, e1, n1, t1 = merged[-1]
            if s2 - e1 > gap:
                merged.append((s2, e2, n2, t2))
            else:
                merged[-1] = (s1, max(e1, e2), n1 + n2, t1 + t2)
        out = [
            [uid, s, e, n, round(t, 5)] for s, e, n, t in merged[:-1]
        ]
        start, end, n, total = merged[-1]
        state.update((start.isoformat(), end.isoformat(), n, total))
        state.setTimeoutTimestamp(
            int((end + gap).timestamp() * 1000)
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value"],
            )

    wm = gap_minutes if watermark_minutes is None else watermark_minutes
    return (
        events.withWatermark(time_col, f"{int(wm)} minutes")
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start string, end string, n long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup_captures(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
    available_now: bool = True,
):
    """Streaming crawl-snapshot dedup: drop re-captures of the same
    canonical URL arriving within the event-time watermark
    (``dropDuplicatesWithinWatermark`` — state is bounded by the
    watermark, so a continuous crawl never accumulates unbounded
    seen-URL state). The batch ``webtext.latest_capture`` remains the
    periodic authoritative compaction (newest-wins); this in-flight
    filter keeps exact re-crawls from ever landing in the corpus.
    Returns the StreamingQuery; available_now drains current input.
    """
    from .webtext.urls import canonicalize_url

    schema = spark.read.parquet(pages_dir).schema
    pages = spark.readStream.schema(schema).parquet(pages_dir)
    deduped = (
        pages.withColumn("canon_url", canonicalize_url(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["canon_url"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
