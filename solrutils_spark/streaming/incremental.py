"""Structured-Streaming surfaces (SURVEY.md §2.10).

The reference is batch-only; its nearest streaming analogs are mapped here:

- incremental indexing (S3/S4 update handlers) → ``foreachBatch`` appending
  new segments through the SAME lineage-tracked segment builder (append
  semantics, no watermark needed — each micro-batch is a doc_id range),
- query-log analytics (S7/A9) → streaming ``groupBy(window(ts)).count()``
  with a watermark for late log lines,
- unique-key ingest dedup (E9 / dedup.py exact stage) →
  ``dropDuplicatesWithinWatermark`` over sha256(text) with bounded state
  (round 5; the dedup stack's stateless Arrow signature kernel
  (mapInPandas) applies to readStream unchanged — pinned by test).

Both run on the engine's existing batch operators — Structured Streaming's
incrementalization does the rest (micro-batch = one lineage'd segment build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.index.segments import build_segments, committed_segments

# per-session distinct-query sketch size: exact n_distinct_q below this,
# lower bound above (bounds state-store growth for chatty users)
_DISTINCT_CAP = 4096


def incremental_index_writer(out_dir: str, segment_size: int = 4096):
    """foreachBatch callback: appends each micro-batch as new segments.

    Usage::

        (stream.writeStream
              .foreachBatch(incremental_index_writer("/idx"))
              .option("checkpointLocation", "/idx/_checkpoints")
              .start())

    Exactly-once: Spark's checkpoint dedups micro-batches; within a batch the
    segment builder's lineage skip makes re-delivery idempotent.

    Alignment guard: segment membership is ``doc_id // segment_size``, and a
    committed segment is immutable — if a micro-batch carries doc_ids that
    fall into an ALREADY-COMMITTED segment (i.e. an earlier batch ended
    mid-segment and this one continues it), those docs would be silently
    skipped by the lineage resume. That is detected here and raised loudly:
    size micro-batches so their doc_id ranges align to ``segment_size``
    (a batch MAY end mid-segment only if no later batch extends it).
    Re-delivery of a whole failed batch stays idempotent: the clash check
    only fires for segments committed by OTHER batches because a re-run of
    the same batch rebuilds byte-identical segments (same doc ranges), which
    the lineage skip then legitimately short-circuits — hence the check
    compares against segments committed BEFORE this batch id (tracked in the
    per-batch marker file).

    Crash-recovery ordering (round 3): the marker records the batch's
    PLANNED segment ids and is written atomically BEFORE ``build_segments``.
    A crash mid-build leaves some of the batch's segments committed; on
    re-delivery those appear in ``committed_segments()`` but are covered by
    the marker ("own" set), so the overlap is recognized as legal and the
    resume completes the remaining segments. (Round 2 wrote the marker after
    the build, so that exact failure path raised ValueError forever.)
    """
    import os
    from pathlib import Path

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marker = Path(out_dir) / "lineage" / f"batch={batch_id}.segments"
        done = committed_segments(out_dir)
        seg_ids = {
            int(r["s"])
            for r in batch_df.select(
                (F.col("doc_id") / segment_size).cast("int").alias("s")
            )
            .distinct()
            .collect()
        }
        own = (
            {int(x) for x in marker.read_text().split()} if marker.exists() else set()
        )  # re-delivered batch: its own segments are a legal overlap
        clash = (seg_ids & done) - own
        if clash:
            raise ValueError(
                f"micro-batch {batch_id} would extend already-committed "
                f"segments {sorted(clash)[:5]} (docs would be silently "
                f"dropped by lineage resume): align micro-batch doc_id "
                f"ranges to segment_size={segment_size}"
            )
        # atomically record the PLAN before building (see docstring)
        marker.parent.mkdir(parents=True, exist_ok=True)
        tmp = marker.with_suffix(marker.suffix + f".tmp{os.getpid()}")
        tmp.write_text(" ".join(str(s) for s in sorted(own | seg_ids)))
        os.replace(tmp, marker)
        build_segments(batch_df, out_dir, segment_size=segment_size, resume=True)

    return write_batch


def sessionize_queries(
    log_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: per-user query SESSIONS with an inactivity
    gap, via ``applyInPandasWithState`` (GroupState + event-time timeout).

    Input: (user string, ts timestamp, q string). Output: one row per CLOSED
    session (user, session_start, session_end, n_queries, n_distinct_q).
    A session closes when no event arrives within ``gap`` of its last event
    (decided by watermark-driven timers, so late data within the watermark
    still extends the right session).

    This is the brief's "custom stateful streaming operator" shape: the state
    (session bounds + counts + distinct-query sketch) lives in the state
    store keyed by user; the pandas function sees each micro-batch's rows for
    the key plus its state, and emits only completed sessions downstream.

    Bounded state: the per-key distinct-query set is capped at
    ``_DISTINCT_CAP`` entries (deduped, insertion-ordered) — ``n_distinct_q``
    is exact below the cap and a lower bound above it. Without the cap a
    chatty user's open session would grow the state store without bound
    (the round-2 version kept every raw query string).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_ms(gap)
    out_schema = (
        "user string, session_start timestamp, session_end timestamp, "
        "n_queries long, n_distinct_q long"
    )
    state_schema = "start long, end long, n long, qs array<string>"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            start, end, n, qs = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user": [user],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_queries": [n],
                    "n_distinct_q": [len(qs)],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
        order = ts_ms.argsort(kind="stable")
        ts_ms = ts_ms[order]
        qvals = rows["q"].to_numpy()[order]
        if state.exists:
            start, end, n, qs = state.get
            qs = list(qs)  # distinct queries, insertion-ordered, capped
        else:
            start, end, n, qs = int(ts_ms[0]), int(ts_ms[0]), 0, []
        seen = set(qs)
        closed = []
        for t, q in zip(ts_ms, qvals):
            t = int(t)
            if n and t - end > gap_ms:  # gap exceeded → close current session
                closed.append((start, end, n, len(qs)))
                start, n, qs, seen = t, 0, [], set()
            end = max(end, t) if n else t
            start = min(start, t)
            n += 1
            if q not in seen and len(qs) < _DISTINCT_CAP:
                seen.add(q)
                qs.append(q)
        state.update((start, end, n, qs))
        # event-time timeout: fire `gap` after the session's last event
        state.setTimeoutTimestamp(end + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, *_ in closed],
                    "n_queries": [c for *_, c, _ in closed],
                    "n_distinct_q": [d for *_, d in closed],
                }
            )

    return (
        log_stream.withWatermark("ts", watermark)
        .groupBy("user")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def _duration_ms(text: str) -> int:
    n, unit = text.split()
    mult = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]
    return int(n) * mult


def streaming_query_stats(log_stream: DataFrame, window: str = "1 day",
                          watermark: str = "1 hour") -> DataFrame:
    """A9 as a stream: tumbling-window per-query counts with late-data bound.

    ``log_stream`` must carry (ts timestamp, q string, num_found long).
    """
    return (
        log_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("q"))
        .agg(
            F.count("*").alias("count"),
            F.sum(F.when(F.col("num_found") == 0, 1).otherwise(0)).alias("zero_count"),
        )
        .select(F.col("w.start").alias("window_start"), "q", "count", "zero_count")
    )


def streaming_exact_dedup(docs: DataFrame, watermark: str = "1 hour",
                          ts_col: str = "ts",
                          text_col: str = "text") -> DataFrame:
    """Streaming twin of ``operators/dedup.py::exact_dedup`` for an ingest
    pipeline: identity = ``sha256(text)``, statefulness = Spark's
    ``dropDuplicatesWithinWatermark`` (first arrival wins; duplicates
    arriving within the watermark window are dropped).

    Scale shape: the state store holds ONE watermark-window of 32-byte
    hashes — not the corpus — so state is bounded by ingest rate × window
    regardless of total data volume. The corollary is honest and
    documented: a duplicate re-arriving AFTER its original's window has
    been evicted is admitted as new (pinned by test); exact corpus-wide
    dedup remains the batch operator's job (one hash-groupBy over the
    accumulated table), and the streaming stage exists to cheaply strip
    the near-in-time duplicates (retries, crawler refetches, fan-in races)
    before they inflate downstream state.
    """
    hashed = docs.withColumn("sha256", F.sha2(F.col(text_col), 256))
    return (hashed.withWatermark(ts_col, watermark)
                  .dropDuplicatesWithinWatermark(["sha256"]))
