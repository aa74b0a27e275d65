"""IndexReader — BM25 top-k over the merged on-disk index (E4/E5/T2/T3).

Query lifecycle (the Spark twin of SURVEY.md §3.1's Solr crossing):

1. analyze query text → terms (driver, frozen analyzer)
2. prune: ``index.filter(bucket IN … AND term IN …)`` — partition-directory
   pruning on ``bucket`` + row filter on ``term``; payload column read only
   for surviving rows (Parquet column/predicate pushdown)
3. global df per term = sum of row-level ``df_part`` (metadata-only pass,
   payload column never touched — column pruning does this for free)
4. score: per-salt-slice block-max WAND kernel in ``applyInPandas``
5. merge: ``orderBy(score desc, doc_id).limit(k)`` over ≤ slices·k rows
   (TakeOrderedAndProject — never a full sort)
6. optional stored-field fetch: broadcast join of the tiny top-k against the
   docs table (J3, QueryReRankComponent.java:80-85 semantics)

Filters (P2, ``fq``) never affect scores — Lucene ``setIsFilter(true)``
semantics (BulkUpdateHandler.java:59): they restrict candidates via a sorted
doc_id array shipped to the kernel (small filters) — WAND pruning is disabled
in that case to keep exactness (θ would be computed over excluded docs).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solrutils_spark.index.builder import read_docs, read_stats
from solrutils_spark.index.merge import read_index, term_bucket
from solrutils_spark.query.exact import query_terms
from solrutils_spark.query.wand import topk_slice

TOPK_DDL = "doc_id long, score double"


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self.index = read_index(spark, index_dir)
        self._docs: DataFrame | None = None

    @property
    def docs(self) -> DataFrame:
        if self._docs is None:
            self._docs = read_docs(self.spark, self.index_dir)
        return self._docs

    def idf(self, df: int) -> float:
        n = self.stats["n_docs"]
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def _candidate_rows(self, terms: list[str]) -> DataFrame:
        buckets = sorted({term_bucket(t, self.stats["num_buckets"]) for t in terms})
        return self.index.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        rows = (
            self._candidate_rows(terms)
            .groupBy("term")
            .agg(F.sum("df_part").alias("df"))
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    def search(
        self,
        query_text: str,
        k: int = 10,
        *,
        offset: int = 0,
        filter_doc_ids: list[int] | None = None,
        use_wand: bool = True,
    ) -> DataFrame:
        """Disjunctive BM25 top-k → DataFrame(doc_id, score), ranked."""
        terms = query_terms(query_text)
        dfs = self.term_dfs(terms)
        terms = [t for t in terms if dfs.get(t)]
        if not terms:
            return self.spark.createDataFrame([], TOPK_DDL)

        idf_by_term = {t: self.idf(dfs[t]) for t in terms}
        avgdl = float(self.stats["avgdl"])
        fetch_k = k + offset
        allowed = (
            np.sort(np.asarray(filter_doc_ids, dtype=np.int64))
            if filter_doc_ids is not None
            else None
        )

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            d, s = topk_slice(
                pdf, idf_by_term, avgdl, fetch_k, use_wand=use_wand, allowed_docs=allowed
            )
            return pd.DataFrame({"doc_id": d, "score": s})

        cand = self._candidate_rows(terms)
        sliced = cand.groupBy("salt").applyInPandas(kernel, schema=TOPK_DDL)
        ranked = sliced.orderBy(F.desc("score"), F.asc("doc_id")).limit(fetch_k)
        if offset:
            ranked = ranked.offset(offset)
        return ranked

    def fetch(self, topk: DataFrame, fields: list[str] | None = None) -> DataFrame:
        """J3 — stored-field fetch: broadcast the tiny top-k against docs."""
        cols = fields or ["repo", "path", "commit", "lang"]
        return (
            self.docs.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", *cols)
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def matching_docs(self, query_text: str) -> DataFrame:
        """All docs containing ≥1 query term (the facet-domain doc set), unscored."""
        terms = query_terms(query_text)
        if not terms:
            return self.spark.createDataFrame([], "doc_id long")
        cand = self._candidate_rows(terms)

        def decode_all(pdf: pd.DataFrame) -> pd.DataFrame:
            from solrutils_spark.index.codec import decode_postings

            out = []
            for row in pdf.itertuples(index=False):
                payload = np.frombuffer(row.payload, dtype=np.uint8)
                d, _, _ = decode_postings(
                    int(row.df_part), payload, np.asarray(row.block_offset),
                    np.asarray(row.block_last),
                )
                out.append(d)
            docs = np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)
            return pd.DataFrame({"doc_id": docs})

        return cand.groupBy("salt").applyInPandas(decode_all, "doc_id long").distinct()
