"""Tokenize → flat postings (term, doc_id, tf, dl) — E1 + E2(light).

The reference feeds documents through Solr's update-processor chain into
Lucene's ``addDocument`` (XsltUpdateHandler.java:196, BulkUpdateHandler.java:
105); Lucene tokenizes and inverts. Here: one ``mapInPandas`` pass runs the
frozen analyzer over Arrow batches and emits (doc_id, term, tf) counted with
pandas groupby — no per-row Python UDF, no shuffle (inversion to term order
happens later, in the segment merge).

``dl`` (post-analysis token count) is carried ON each posting row rather than
kept as a separate doc→len side table: at 10^12 docs a doc_len lookup table
cannot be broadcast, and joining it at query time on doc_id would shuffle the
full posting set. Denormalizing dl into the posting (Lucene's "norms" are the
same idea) makes scoring embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.functions.analyzer import analyze_series

POSTINGS_SCHEMA = "doc_id long, term string, tf int, dl int"


def _invert_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    toks = analyze_series(pdf["content"])
    lens = toks.map(len).to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return pd.DataFrame({"doc_id": [], "term": [], "tf": [], "dl": []}).astype(
            {"doc_id": "int64", "term": "object", "tf": "int32", "dl": "int32"}
        )
    doc_ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
    dls = np.repeat(lens, lens).astype(np.int32)
    terms = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
    flat = pd.DataFrame({"doc_id": doc_ids, "term": terms, "dl": dls})
    counted = (
        flat.groupby(["doc_id", "term", "dl"], sort=False).size().reset_index(name="tf")
    )
    counted["tf"] = counted["tf"].astype("int32")
    return counted[["doc_id", "term", "tf", "dl"]]


def build_postings(docs: DataFrame) -> DataFrame:
    """docs → postings(doc_id, term, tf, dl). Narrow (no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _invert_batch(pdf)

    return docs.select("doc_id", "content").mapInPandas(gen, schema=POSTINGS_SCHEMA)


def attach_doc_len(docs: DataFrame, postings: DataFrame) -> DataFrame:
    """docs + doc_len column (0 for docs whose every token was filtered)."""
    dl = postings.groupBy("doc_id").agg(F.first("dl").alias("doc_len"))
    return docs.join(dl, "doc_id", "left").fillna({"doc_len": 0}).withColumn(
        "doc_len", F.col("doc_len").cast("int")
    )
