"""Structured-Streaming surfaces (SURVEY.md §2.10).

The reference is batch-only; its nearest streaming analogs are mapped here:

- incremental indexing (S3/S4 update handlers) → ``foreachBatch`` appending
  new segments through the SAME lineage-tracked segment builder (append
  semantics, no watermark needed — each micro-batch is a doc_id range),
- query-log analytics (S7/A9) → streaming ``groupBy(window(ts)).count()``
  with a watermark for late log lines.

Both run on the engine's existing batch operators — Structured Streaming's
incrementalization does the rest (micro-batch = one lineage'd segment build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.index.segments import build_segments


def incremental_index_writer(out_dir: str, segment_size: int = 4096, id_offset_col: str = "doc_id"):
    """foreachBatch callback: appends each micro-batch as new segments.

    Usage::

        (stream.writeStream
              .foreachBatch(incremental_index_writer("/idx"))
              .option("checkpointLocation", "/idx/_checkpoints")
              .start())

    Exactly-once: Spark's checkpoint dedups micro-batches; within a batch the
    segment builder's lineage skip makes re-delivery idempotent.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_segments(batch_df, out_dir, segment_size=segment_size, resume=True)

    return write_batch


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
