"""Streaming surfaces: incremental index append + windowed query stats."""

from __future__ import annotations

import json
from pathlib import Path

from solrutils_spark.corpus import synth_corpus
from solrutils_spark.index.builder import build_index
from solrutils_spark.index.docs import build_docs
from solrutils_spark.index.merge import merge_segments
from solrutils_spark.index.segments import read_segments
from solrutils_spark.streaming.incremental import (
    incremental_index_writer,
    sessionize_queries,
    streaming_query_stats,
)


def test_incremental_batches_equal_one_shot(spark, tmp_path):
    """Two foreachBatch micro-batches == one batch build (byte-identical)."""
    corpus = synth_corpus(spark, 200, hot_repeat=500)
    docs = build_docs(corpus).cache()

    inc_dir = str(tmp_path / "inc")
    writer = incremental_index_writer(inc_dir, segment_size=32)
    writer(docs.filter("doc_id < 96"), batch_id=0)
    writer(docs.filter("doc_id >= 96"), batch_id=1)
    # re-delivery of batch 0 must be a no-op (lineage idempotence)
    writer(docs.filter("doc_id < 96"), batch_id=0)

    one_dir = str(tmp_path / "one")
    build_index(corpus, one_dir, segment_size=32, num_salts=2, num_buckets=8)

    inc_idx = merge_segments(read_segments(spark, inc_dir), num_salts=2, num_buckets=8)
    a = sorted(
        (r["term"], r["salt"], bytes(r["payload"])) for r in inc_idx.collect()
    )
    b = sorted(
        (r["term"], r["salt"], bytes(r["payload"]))
        for r in spark.read.parquet(one_dir + "/index").collect()
    )
    assert a == b


def test_incremental_misaligned_batch_raises(spark, tmp_path):
    """A batch ending mid-segment blocks that segment forever (lineage resume
    would silently drop the rest of its doc range) — the writer must refuse
    the NEXT batch that touches the committed partial segment."""
    import pytest

    corpus = synth_corpus(spark, 200, hot_repeat=500)
    docs = build_docs(corpus).cache()
    writer = incremental_index_writer(str(tmp_path / "bad"), segment_size=32)
    writer(docs.filter("doc_id < 100"), batch_id=0)  # segment 3 committed partial
    with pytest.raises(ValueError, match="already-committed"):
        writer(docs.filter("doc_id >= 100"), batch_id=1)  # extends segment 3
    # re-delivery of the same batch stays a legal no-op
    writer(docs.filter("doc_id < 100"), batch_id=0)


def test_streaming_query_stats(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01T10:00:00", "q": "alpha", "num_found": 3},
        {"ts": "2024-01-01T11:00:00", "q": "alpha", "num_found": 0},
        {"ts": "2024-01-02T09:00:00", "q": "beta", "num_found": 7},
    ]
    (src / "part1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("ts timestamp, q string, num_found long")
        .json(str(src))
    )
    agg = streaming_query_stats(stream, window="1 day", watermark="1 hour")
    query = (
        agg.writeStream.format("memory")
        .queryName("qstats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    out = {(str(r["window_start"])[:10], r["q"]): (r["count"], r["zero_count"])
           for r in spark.sql("select * from qstats").collect()}
    assert out[("2024-01-01", "alpha")] == (2, 1)
    assert out[("2024-01-02", "beta")] == (1, 0)


def test_sessionize_queries_stateful(spark, tmp_path):
    """applyInPandasWithState session windows: gap splits within a batch AND
    watermark-driven timeout closes the trailing session."""
    src = tmp_path / "sess_src"
    src.mkdir()
    rows1 = [
        # user a: two queries 5 min apart (one session), then a 2h gap → new session
        {"user": "a", "ts": "2024-01-01T10:00:00", "q": "x"},
        {"user": "a", "ts": "2024-01-01T10:05:00", "q": "y"},
        {"user": "a", "ts": "2024-01-01T12:30:00", "q": "x"},
        # user b: single query
        {"user": "b", "ts": "2024-01-01T10:00:00", "q": "z"},
    ]
    (src / "p1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    # second file far in the future: advances the watermark so the trailing
    # sessions time out and flush
    (src / "p2.json").write_text(json.dumps(
        {"user": "c", "ts": "2024-01-02T12:00:00", "q": "w"}))

    stream = (
        spark.readStream.schema("user string, ts timestamp, q string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sessions = sessionize_queries(stream, gap="30 minutes", watermark="1 minute")
    query = (
        sessions.writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(180)
    got = {
        (r["user"], str(r["session_start"])[11:16]): (r["n_queries"], r["n_distinct_q"])
        for r in spark.sql("select * from sess").collect()
    }
    # first a-session: 2 queries, 2 distinct; second a-session and b flushed by timeout
    assert got[("a", "10:00")] == (2, 2)
    assert got[("a", "12:30")] == (1, 1)
    assert got[("b", "10:00")] == (1, 1)


def test_incremental_redelivery_after_partial_crash(spark, tmp_path):
    """Crash BETWEEN a segment's lineage commit and batch completion: the
    marker (written atomically BEFORE the build) covers the partially-built
    batch's own segments, so re-delivery resumes instead of raising."""
    from solrutils_spark.index.segments import build_segments

    corpus = synth_corpus(spark, 200, hot_repeat=500)
    docs = build_docs(corpus).cache()
    out = str(tmp_path / "crash")
    writer = incremental_index_writer(out, segment_size=32)
    writer(docs.filter("doc_id < 96"), batch_id=0)  # segs 0-2

    # simulate a mid-batch crash for batch 1 (segs 3-6): the marker is down,
    # segment 3 committed, then the process died before segments 4-6
    marker = Path(out) / "lineage" / "batch=1.segments"
    marker.write_text("3 4 5 6")
    build_segments(
        docs.filter("(doc_id >= 96) and (doc_id < 128)"), out,
        segment_size=32, resume=True,
    )

    # re-delivery of the full batch must complete the remaining segments
    writer(docs.filter("doc_id >= 96"), batch_id=1)

    one_dir = str(tmp_path / "one")
    build_index(corpus, one_dir, segment_size=32, num_salts=2, num_buckets=8)
    inc_idx = merge_segments(read_segments(spark, out), num_salts=2, num_buckets=8)
    a = sorted((r["term"], r["salt"], bytes(r["payload"])) for r in inc_idx.collect())
    b = sorted(
        (r["term"], r["salt"], bytes(r["payload"]))
        for r in spark.read.parquet(one_dir + "/index").collect()
    )
    assert a == b


def test_streaming_exact_dedup(spark, tmp_path):
    """Round-5: dropDuplicatesWithinWatermark over sha256(text) — dups
    within a batch and across batches (inside the watermark window) drop;
    a re-arrival AFTER the original's state evicted is admitted as new
    (bounded-state semantics, documented in the docstring)."""
    from solrutils_spark.streaming.incremental import streaming_exact_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    # p1: A twice in one batch + B; p2: A again 5 min later (state alive);
    # p3: far-future C advances the watermark past A's window; p4: another
    # trigger under the advanced watermark (state eviction runs as part of
    # batch processing — the evicting trigger itself still sees old state);
    # p5: A again — state evicted, admitted as new
    (src / "p1.json").write_text("\n".join(json.dumps(r) for r in [
        {"ts": "2024-01-01T10:00:00", "text": "doc A"},
        {"ts": "2024-01-01T10:01:00", "text": "doc A"},
        {"ts": "2024-01-01T10:02:00", "text": "doc B"},
    ]))
    (src / "p2.json").write_text(json.dumps(
        {"ts": "2024-01-01T10:05:00", "text": "doc A"}))
    (src / "p3.json").write_text(json.dumps(
        {"ts": "2024-01-04T10:00:00", "text": "doc C"}))
    (src / "p4.json").write_text(json.dumps(
        {"ts": "2024-01-04T11:00:00", "text": "doc D"}))
    (src / "p5.json").write_text(json.dumps(
        {"ts": "2024-01-05T10:00:00", "text": "doc A"}))

    stream = (
        spark.readStream.schema("ts timestamp, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduped = streaming_exact_dedup(stream, watermark="1 hour")
    query = (
        deduped.writeStream.format("memory").queryName("sdedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(180)
    rows = spark.sql("select text, ts from sdedup").collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(str(r["ts"]))
    assert sorted(by_text["doc A"]) == [
        "2024-01-01 10:00:00", "2024-01-05 10:00:00"]  # first + post-evict
    assert len(by_text["doc B"]) == 1 and len(by_text["doc C"]) == 1


def test_streaming_minhash_signatures_stateless(spark, tmp_path):
    """The dedup stack's Arrow signature kernel (mapInPandas, per-row) is
    stateless and applies to readStream unchanged — streamed signatures
    equal the batch operator's on the same rows. (The all-JVM variant
    explodes + aggregates per doc, so on a stream it would need a
    watermarked aggregation — the batch path remains its home.)"""
    from solrutils_spark.operators.dedup import minhash_signatures

    src = tmp_path / "sig_src"
    src.mkdir()
    rows = [{"doc_id": i, "text": f"alpha beta gamma delta epsilon doc {i}"}
            for i in range(6)]
    (src / "p1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("doc_id long, text string").json(str(src))
    )
    sigs = minhash_signatures(stream, num_perm=16, shingle_k=3)
    query = (
        sigs.writeStream.format("memory").queryName("ssigs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    got = {r["doc_id"]: list(r["signature"])
           for r in spark.sql("select * from ssigs").collect()}
    batch_df = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows],
                                     "doc_id long, text string")
    want = {r["doc_id"]: list(r["signature"])
            for r in minhash_signatures(batch_df, num_perm=16,
                                        shingle_k=3).collect()}
    assert got == want
