"""Exact BM25 top-k over flat postings — E4/E5/T2 reference path.

This is the always-correct baseline the segment/WAND path is verified
against, and the minimum end-to-end slice (SURVEY.md §7.1 step 3). The
reference gets this from Lucene's BooleanQuery + TopDocs collector
(driven via QueryReRankComponent.java:80, SearchSplitComponent.java:69).

Plan shape (all Catalyst-native):
  postings.filter(term IN q_terms)      ← predicate pushdown to the scan
    → per-doc ordered contribution sum  ← sort_array + aggregate (fixed
                                           summation order: bit-identical
                                           to the oracle's sorted-term sum)
    → orderBy(score desc, doc_id).limit(k)  ← TakeOrderedAndProject (heap,
                                               never a full sort)

Scoring floats are float64 end-to-end; tie-break (score desc, doc_id asc)
is the frozen contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.functions.analyzer import B, K1, analyze
from solrutils_spark.index.stats import CorpusStats


def query_terms(query_text: str) -> list[str]:
    """Analyzer-normalized, deduplicated, sorted query terms (summation order)."""
    return sorted(set(analyze(query_text)))


def bm25_topk_exact(
    postings: DataFrame,
    stats: CorpusStats,
    term_df: dict[str, int],
    query_text: str,
    k: int = 10,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Disjunctive (OR) BM25 top-k. Returns (doc_id, score) ranked.

    ``doc_filter``: optional DataFrame of doc_id to restrict to (P2 filter
    semantics — filters select, never score; applied as a semi-join before
    scoring so filtered docs are never decoded/scored).
    """
    spark = postings.sparkSession
    terms = [t for t in query_terms(query_text) if term_df.get(t)]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    idf_rows = [(t, stats.idf(term_df[t])) for t in terms]
    idf_df = spark.createDataFrame(idf_rows, "term string, idf double")

    cand = postings.filter(F.col("term").isin(terms))
    if doc_filter is not None:
        cand = cand.join(doc_filter.select("doc_id"), "doc_id", "left_semi")

    contrib = cand.join(F.broadcast(idf_df), "term").withColumn(
        "contrib",
        F.col("idf")
        * F.col("tf").cast("double")
        / (
            F.col("tf").cast("double")
            + F.lit(K1)
            * (F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / F.lit(stats.avgdl))
        ),
    )
    # fixed summation order: collect per-doc (term, contrib), sort by term,
    # fold left — bit-identical to the oracle regardless of shuffle order
    scored = (
        contrib.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
