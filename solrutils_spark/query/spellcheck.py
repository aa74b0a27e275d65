"""E7 — spellcheck suggestions from the index vocabulary.

The reference passes Solr's spellcheck sections through to the response
(CustomSearchHandler.java:244-255) and counts spellchecker queries in its log
analytics (QueryStatsComponent.java:31). Solr's spellchecker suggests
corrections from indexed terms ranked by document frequency; ours does the
same over the ``termdf`` sidecar table:

    suggest = vocab.filter(|len(term) - len(q)| ≤ max_dist AND same first char*)
                   .withColumn(dist, levenshtein(term, q)).filter(dist ≤ max)
                   .orderBy(dist, df desc)

All JVM-side (``F.levenshtein`` is built-in); the length + first-char guards
prune the vocabulary scan the way Solr's n-gram prefilter does (cheap,
recall-lossy only for first-letter typos — Solr's default behaves the same).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vocabulary(spark: SparkSession, index_dir: str) -> DataFrame:
    """(term, df) table from the termdf sidecar."""
    return spark.read.parquet(str(Path(index_dir) / "termdf")).select("term", "df")


def suggest(
    vocab: DataFrame,
    query_term: str,
    max_distance: int = 2,
    limit: int = 5,
    same_first_char: bool = True,
) -> DataFrame:
    """Correction candidates → (suggestion, df, distance), best first.

    The length band is ±``max_distance`` — any term whose length differs by
    more than the edit budget is provably > ``max_distance`` away, so the
    band is recall-lossless for the distance filter below (a ±1 band would
    silently drop valid distance-2 insert/delete-pair corrections)."""
    q = query_term.lower()
    cand = vocab.filter(
        (F.length("term") >= len(q) - max_distance)
        & (F.length("term") <= len(q) + max_distance)
    )
    if same_first_char and q:
        cand = cand.filter(F.col("term").startswith(q[0]))
    return (
        cand.withColumn("distance", F.levenshtein(F.col("term"), F.lit(q)))
        .filter((F.col("distance") <= max_distance) & (F.col("distance") > 0))
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(limit)
        .select(F.col("term").alias("suggestion"), "df", "distance")
    )


def spellcheck_query(
    vocab: DataFrame, terms: list[str], term_dfs: dict[str, int], **kw
) -> dict:
    """Solr-shaped spellcheck section: suggestions for zero-df query terms +
    a collation assembled from each term's best correction."""
    suggestions: dict = {}
    collation: list[str] = []
    any_corrected = False
    for t in terms:
        if term_dfs.get(t):
            collation.append(t)
            continue
        cands = suggest(vocab, t, **kw).collect()
        suggestions[t] = [
            {"word": r["suggestion"], "freq": int(r["df"])} for r in cands
        ]
        if cands:
            collation.append(cands[0]["suggestion"])
            any_corrected = True
        else:
            collation.append(t)
    return {
        "suggestions": suggestions,
        "collation": " ".join(collation) if any_corrected else None,
        "correctlySpelled": not suggestions,
    }
