"""E3 — term-partitioned shuffle merge of segments, hot-term salting built in.

Lucene merges segments in background threads (implicit in the reference; the
commit at BulkUpdateHandler.java:150 publishes them). Our merge is one
shuffle: ``groupBy(term, salt)`` + ``applyInPandas`` concatenation of the
per-segment sorted runs (disjoint doc_id ranges by construction — segment_id
is a doc_id range), then a single re-encode.

**Salting = the index's term-sharding.** ``salt = segment_id // g`` slices
the doc space into ``num_salts`` ordered ranges that are THE SAME for every
term, so:

- a hot term (``def``-in-Python scale: df ~ 10^11 at 10^12 files) never lands
  in one reducer — its postings split across ``num_salts`` tasks and stay
  split as multiple index rows (no second-stage giant concat *ever*);
- query-side WAND groups rows by salt and processes doc-range slices of the
  whole query independently — embarrassingly parallel top-k, merged by a
  global ``orderBy().limit(k)``.

The merged index is written partitioned by ``bucket = crc32(term) % B``:
a query touching T terms reads at most T bucket directories (file pruning via
a partition-column filter — Catalyst-native, the Parquet stand-in for Iceberg
``bucket(term, B)`` partitioning at cluster scale).
"""

from __future__ import annotations

import zlib
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.index.codec import decode_postings, encode_postings

INDEX_DDL = (
    "bucket int, term string, salt int, df_part long, first_doc long, last_doc long, "
    "payload binary, block_offset array<int>, block_last array<long>, "
    "block_max_tf array<int>, block_min_dl array<int>"
)

DEFAULT_BUCKETS = 64


def term_bucket(term: str, num_buckets: int = DEFAULT_BUCKETS) -> int:
    """Deterministic term → partition bucket; same function driver- and executor-side."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def _merge_group(pdf: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    pdf = pdf.sort_values("first_doc")
    docs_parts, tf_parts, dl_parts = [], [], []
    for row in pdf.itertuples(index=False):
        payload = np.frombuffer(row.payload, dtype=np.uint8)
        d, t, l = decode_postings(
            int(row.n), payload, np.asarray(row.block_offset), np.asarray(row.block_last)
        )
        docs_parts.append(d)
        tf_parts.append(t)
        dl_parts.append(l)
    docs = np.concatenate(docs_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    enc = encode_postings(docs, tfs, dls)
    return pd.DataFrame(
        [
            {
                "bucket": term_bucket(term, num_buckets),
                "term": term,
                "salt": salt,
                "df_part": enc.n,
                "first_doc": int(docs[0]),
                "last_doc": int(docs[-1]),
                "payload": enc.payload.tobytes(),
                "block_offset": enc.block_offset.tolist(),
                "block_last": enc.block_last.tolist(),
                "block_max_tf": enc.block_max_tf.tolist(),
                "block_min_dl": enc.block_min_dl.tolist(),
            }
        ]
    )


def merge_segments(
    segments: DataFrame, num_salts: int = 4, num_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """segments → merged, salted, bucketed index DataFrame."""
    n_segments = (segments.agg(F.max("segment_id")).collect()[0][0] or 0) + 1
    g = max(1, -(-n_segments // num_salts))  # ceil
    salted = segments.withColumn("salt", (F.col("segment_id") / F.lit(g)).cast("int"))
    return salted.groupBy("term", "salt").applyInPandas(
        lambda pdf: _merge_group(pdf, num_buckets), schema=INDEX_DDL
    )


def write_index(index: DataFrame, out_dir: str) -> None:
    (
        index.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(str(Path(out_dir) / "index"))
    )


def read_index(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(str(Path(out_dir) / "index"))
