"""Rank-identical BM25 parity gate (north_rule; SURVEY.md §5.2 item 3).

Engine top-k must match the pure-Python oracle's docIDs AND scores (atol
1e-9) in rank order, on the full reference query set over the synthetic
corpus — including empty-result, stopword-only, hot-term and tie cases.
"""

from __future__ import annotations

import pytest

from solrutils_spark.corpus import reference_queries, synth_corpus
from solrutils_spark.index.docs import build_docs
from solrutils_spark.index.postings import attach_doc_len, build_postings
from solrutils_spark.index.stats import compute_corpus_stats, compute_df, term_stats_for
from solrutils_spark.oracle.reference_bm25 import OracleIndex
from solrutils_spark.query.exact import bm25_topk_exact, query_terms

N_DOCS = 400
HOT_REPEAT = 2_000


@pytest.fixture(scope="module")
def engine(spark):
    corpus = synth_corpus(spark, N_DOCS, hot_repeat=HOT_REPEAT)
    docs = build_docs(corpus)
    postings = build_postings(docs).persist()
    docs_len = attach_doc_len(docs, postings).persist()
    stats = compute_corpus_stats(docs_len)
    df_table = compute_df(postings).persist()
    yield {"docs": docs_len, "postings": postings, "stats": stats, "df": df_table}
    postings.unpersist()
    docs_len.unpersist()
    df_table.unpersist()


@pytest.fixture(scope="module")
def oracle(engine):
    rows = engine["docs"].select("doc_id", "content").collect()
    return OracleIndex([(r["doc_id"], r["content"]) for r in rows])


def test_corpus_stats_match(engine, oracle):
    assert engine["stats"].n_docs == oracle.n_docs == N_DOCS
    assert engine["stats"].avgdl == pytest.approx(oracle.avgdl, abs=1e-9)


def test_sha256_invariant(spark, engine):
    # per-row invariant: sha256(content) recomputed == stored column
    from pyspark.sql import functions as F

    bad = engine["docs"].filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
    assert bad == 0


@pytest.mark.parametrize("qid,qtext,k", reference_queries())
def test_rank_identical_topk(engine, oracle, qid, qtext, k):
    expected = oracle.search(qtext, k)
    terms = query_terms(qtext)
    term_df = term_stats_for(engine["df"], terms)
    got_df = bm25_topk_exact(engine["postings"], engine["stats"], term_df, qtext, k)
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"q{qid} {qtext!r}: docIDs diverge\n got={got}\n exp={expected}"
    )
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, abs=1e-9), f"q{qid} doc {gd}: {gs} vs {es}"
