"""E2/S5 — per-partition inverted-index segment build, checkpoint-resumable.

The reference's indexing path feeds documents through Solr's update-processor
chain into Lucene ``addDocument`` (XsltUpdateHandler.java:196,
BulkUpdateHandler.java:105) and finalizes with a commit
(BulkUpdateHandler.java:150); Lucene writes immutable segments. Here a
*segment* is the inverted index of a deterministic ``doc_id`` range::

    segment_id = doc_id // segment_size

so segment membership is a pure function of the data, independent of physical
partitioning — the property that makes resume sound.

Each segment group (``applyInPandas``) tokenizes, inverts, delta+VByte-encodes
its terms (codec.py) and *itself* writes:

    <out>/segments/seg=<id>.parquet      (tmp + atomic rename)
    <out>/lineage/seg=<id>.json          (written only AFTER the data rename)

Lineage carries rows_in / bytes_in / terms_out / postings_bytes / status /
attempt (north_rule metrics). Resume = list the lineage dir, skip committed
segment_ids, rebuild only the rest; a crash between data-rename and
lineage-write is healed by idempotent overwrite (same bytes, same name).

Scale note: task-level atomic rename stands in for an Iceberg/table-format
commit, which is what a 1000-executor deployment would use; the lineage table
is the same either way. Memory is bounded by ``segment_size`` docs per task,
not by corpus size; no shuffle happens here at all — inversion to global term
order is deferred to the merge stage (merge.py), exactly like Lucene's
write-local/merge-later design.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.functions.analyzer import analyze_series
from solrutils_spark.index.codec import encode_many, encode_positions_many


def _split_list(arr: np.ndarray, boundaries: np.ndarray) -> list:
    """Slice a flat per-block array into per-term lists (boundaries = prefix)."""
    return [
        arr[boundaries[t] : boundaries[t + 1]].tolist()
        for t in range(len(boundaries) - 1)
    ]

SEGMENT_SCHEMA = pa.schema(
    [
        ("segment_id", pa.int32()),
        ("term", pa.string()),
        ("n", pa.int64()),  # postings count == df within segment
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("payload", pa.binary()),
        ("block_offset", pa.list_(pa.int32())),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        # positional sidecar (round 6): per-posting position streams +
        # block-aligned byte offsets (codec.py "positional sidecar" section).
        # Parquet column pruning keeps non-phrase reads from ever touching
        # these bytes.
        ("pos_payload", pa.binary()),
        ("pos_block_offset", pa.list_(pa.int32())),
    ]
)

LINEAGE_DDL = (
    "segment_id int, rows_in long, bytes_in long, terms_out long, tokens long, "
    "postings_bytes long, status string, attempt int, wall_sec double"
)


def _atomic_write(path: Path, write_fn) -> None:
    tmp = path.with_suffix(path.suffix + f".tmp{os.getpid()}")
    write_fn(tmp)
    os.replace(tmp, path)


def _build_segment(pdf: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    t0 = time.time()
    seg_id = int(pdf["segment_id"].iloc[0])
    if not pdf["doc_id"].is_unique:
        raise ValueError(
            f"duplicate doc_ids in segment {seg_id}: the corpus has exact-"
            "duplicate (repo, path, commit) keys — deduplicate the input"
        )
    rows_in = len(pdf)
    bytes_in = int(pdf["content"].str.len().fillna(0).sum())

    toks = analyze_series(pdf["content"])
    lens = toks.map(len).to_numpy(dtype=np.int64)
    seg_dir = Path(out_dir) / "segments"
    lin_dir = Path(out_dir) / "lineage"
    dl_dir = Path(out_dir) / "doclen"
    seg_dir.mkdir(parents=True, exist_ok=True)
    lin_dir.mkdir(parents=True, exist_ok=True)
    dl_dir.mkdir(parents=True, exist_ok=True)

    # per-doc token counts (|d| sidecar) — avoids a second tokenization pass
    # when the docs table needs doc_len
    dl_table = pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"].to_numpy(dtype=np.int64), pa.int64()),
            "doc_len": pa.array(lens.astype("int32"), pa.int32()),
        }
    )
    _atomic_write(
        dl_dir / f"seg={seg_id}.parquet",
        lambda p: pq.write_table(dl_table, p, compression="zstd"),
    )

    if lens.sum() == 0:
        table = pa.table(
            {name: pa.array([], type=SEGMENT_SCHEMA.field(name).type) for name in SEGMENT_SCHEMA.names}
        )
        n_terms = 0
        postings_bytes = 0
    else:
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
        dls = np.repeat(lens, lens).astype(np.int64)
        # token position within its doc (for the positional sidecar): global
        # arange minus each doc's token-start offset
        positions = np.arange(doc_ids.size, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        terms = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
        # (term, doc) → tf aggregation WITHOUT a pandas object-key groupby:
        # factorize tokens to int codes, sort only the UNIQUE terms
        # lexicographically (vocab ≪ tokens), then one integer lexsort +
        # boundary diff gives the same term-sorted posting rows
        codes, uniques = pd.factorize(terms)
        lex = np.argsort(uniques)  # lexicographic order of unique terms
        rank = np.empty(len(uniques), dtype=np.int64)
        rank[lex] = np.arange(len(uniques))
        key = rank[codes]
        sort_idx = np.lexsort((doc_ids, key))
        k_s = key[sort_idx]
        d_s = doc_ids[sort_idx]
        dl_s = dls[sort_idx]
        new_group = np.empty(k_s.size, dtype=bool)
        new_group[0] = True
        new_group[1:] = (k_s[1:] != k_s[:-1]) | (d_s[1:] != d_s[:-1])
        starts = np.flatnonzero(new_group)
        tf_all = np.diff(np.append(starts, k_s.size)).astype(np.int64)
        d_all = d_s[starts]
        dl_all = dl_s[starts]
        uniq_terms = uniques[lex]
        term_counts = np.bincount(k_s[starts], minlength=len(uniques)).astype(np.int64)
        # one vectorized encode over ALL terms (no per-term Python loop)
        enc = encode_many(term_counts, d_all, tf_all, dl_all)
        # positional sidecar: lexsort is stable, so within each (term, doc)
        # group token order == document order and positions are increasing —
        # delta-encode with the first position of each posting absolute
        p_s = positions[sort_idx]
        pos_d = np.empty(p_s.size, dtype=np.int64)
        pos_d[0] = p_s[0]
        pos_d[1:] = p_s[1:] - p_s[:-1]
        pos_d[starts] = p_s[starts]
        pos_enc = encode_positions_many(
            term_counts, tf_all, pos_d.astype(np.uint64)
        )
        n_terms = len(uniq_terms)
        term_starts = np.zeros(n_terms, dtype=np.int64)
        np.cumsum(term_counts[:-1], out=term_starts[1:])
        payload = enc.payload
        rows = {
            "segment_id": np.full(n_terms, seg_id, dtype=np.int32),
            "term": uniq_terms,
            "n": enc.n_per_term,
            "first_doc": d_all[term_starts],
            "last_doc": enc.block_last[enc.blocks_per_term[1:] - 1],
            "payload": [
                payload[enc.term_byte_start[t] : enc.term_byte_end[t]].tobytes()
                for t in range(n_terms)
            ],
            "block_offset": _split_list(enc.block_offset, enc.blocks_per_term),
            "block_last": _split_list(enc.block_last, enc.blocks_per_term),
            "block_max_tf": _split_list(enc.block_max_tf, enc.blocks_per_term),
            "block_min_dl": _split_list(enc.block_min_dl, enc.blocks_per_term),
            "pos_payload": [
                pos_enc.payload[
                    pos_enc.term_byte_start[t] : pos_enc.term_byte_end[t]
                ].tobytes()
                for t in range(n_terms)
            ],
            "pos_block_offset": _split_list(
                pos_enc.block_offset, pos_enc.blocks_per_term
            ),
        }
        table = pa.Table.from_pydict(
            {k: pa.array(v, type=SEGMENT_SCHEMA.field(k).type) for k, v in rows.items()},
            schema=SEGMENT_SCHEMA,
        )
        postings_bytes = int(payload.size)

    data_path = seg_dir / f"seg={seg_id}.parquet"
    _atomic_write(data_path, lambda p: pq.write_table(table, p, compression="zstd"))
    lineage = {
        "segment_id": seg_id,
        "rows_in": rows_in,
        "bytes_in": bytes_in,
        "terms_out": n_terms,
        "tokens": int(lens.sum()),
        "postings_bytes": postings_bytes,
        "status": "committed",
        "attempt": 1,
        "wall_sec": round(time.time() - t0, 4),
    }
    _atomic_write(
        lin_dir / f"seg={seg_id}.json",
        lambda p: p.write_text(json.dumps(lineage)),
    )
    return pd.DataFrame([lineage])


def committed_segments(out_dir: str) -> set[int]:
    lin_dir = Path(out_dir) / "lineage"
    if not lin_dir.exists():
        return set()
    done = set()
    for f in lin_dir.glob("seg=*.json"):
        try:
            row = json.loads(f.read_text())
            if row.get("status") == "committed":
                done.add(int(row["segment_id"]))
        except (ValueError, KeyError):
            continue  # torn write → rebuild that segment
    return done


def build_segments(
    docs: DataFrame, out_dir: str, segment_size: int = 4096, resume: bool = True
) -> DataFrame:
    """Build (or resume) all segments; returns the lineage DataFrame.

    Idempotent: rerunning after any interruption produces a final index
    byte-identical (per term) to an uninterrupted build (FIXTURES.md §7).
    """
    tagged = docs.withColumn(
        "segment_id", (F.col("doc_id") / F.lit(segment_size)).cast("int")
    )
    done = committed_segments(out_dir) if resume else set()
    todo = tagged
    if done:
        todo = tagged.filter(~F.col("segment_id").isin(list(done)))

    lineage_new = todo.select("segment_id", "doc_id", "content").groupBy("segment_id").applyInPandas(
        lambda pdf: _build_segment(pdf, out_dir), schema=LINEAGE_DDL
    )
    lineage_new.count()  # force execution (side-effecting writes)
    return read_lineage(docs.sparkSession, out_dir)


def read_lineage(spark, out_dir: str) -> DataFrame:
    lin_dir = Path(out_dir) / "lineage"
    rows = [json.loads(f.read_text()) for f in sorted(lin_dir.glob("seg=*.json"))]
    return spark.createDataFrame(rows, LINEAGE_DDL) if rows else spark.createDataFrame([], LINEAGE_DDL)


def read_segments(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(str(Path(out_dir) / "segments"))
