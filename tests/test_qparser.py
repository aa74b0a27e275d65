"""Lucene-syntax parser + boolean executor (query/qparser.py): parse-shape
tests plus execution parity against a clause-by-clause Python oracle built
on OracleIndex."""

from __future__ import annotations

import fnmatch

import numpy as np
import pytest

from solrutils_spark.corpus import synth_corpus
from solrutils_spark.functions.analyzer import analyze
from solrutils_spark.index.builder import build_index
from solrutils_spark.oracle.reference_bm25 import OracleIndex
from solrutils_spark.query.boolean import _levenshtein_banded
from solrutils_spark.query.engine import IndexReader
from solrutils_spark.query.qparser import (
    MUST,
    MUST_NOT,
    SHOULD,
    UnsupportedQuerySyntax,
    execute_boolean,
    parse_query,
)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_qp"))
    corpus = synth_corpus(spark, 300, hot_repeat=2_000)
    build_index(corpus, out, segment_size=64, num_salts=3, num_buckets=16)
    return out


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


@pytest.fixture(scope="module")
def oracle(spark, reader):
    rows = reader.docs.select("doc_id", "content").collect()
    return OracleIndex([(r["doc_id"], r["content"]) for r in rows])


# ----------------------------------------------------------- parsing ----


def test_parse_bare_terms_are_should():
    cs = parse_query("posting segment")
    assert [(c.kind, c.text, c.occur) for c in cs] == [
        ("term", "posting", SHOULD), ("term", "segment", SHOULD)]


def test_parse_and_promotes_both_sides():
    cs = parse_query("posting AND segment")
    assert [c.occur for c in cs] == [MUST, MUST]


def test_parse_or_keeps_should():
    cs = parse_query("posting OR segment")
    assert [c.occur for c in cs] == [SHOULD, SHOULD]


def test_parse_plus_minus_not():
    cs = parse_query("+posting -segment NOT vbyte !wand")
    assert [c.occur for c in cs] == [MUST, MUST_NOT, MUST_NOT, MUST_NOT]


def test_parse_explicit_occur_survives_and():
    cs = parse_query("-posting AND segment")
    assert [c.occur for c in cs] == [MUST_NOT, MUST]


def test_parse_phrase_wildcard_fuzzy_boost():
    cs = parse_query('"posting segment" post* te?m fuzz~1 boosted^2.5 bare~')
    assert [c.kind for c in cs] == [
        "phrase", "wildcard", "wildcard", "fuzzy", "term", "fuzzy"]
    assert cs[0].text == "posting segment"
    assert cs[3].max_edits == 1
    assert cs[4].boost == 2.5
    assert cs[5].max_edits == 2  # bare ~ = Lucene default 2


def test_parse_unsupported_is_loud():
    for bad in ["(a AND b)", "title:foo", "[1 TO 5]", '"a b"~3', "a AND"]:
        with pytest.raises(UnsupportedQuerySyntax):
            parse_query(bad)


# --------------------------------------------------------- execution ----


def _oracle_boolean(oracle: OracleIndex, q: str, k: int):
    """Independent clause-by-clause evaluation on the Python oracle."""
    clauses = parse_query(q)

    def clause_scores(c) -> dict[int, float]:
        if c.kind == "term":
            terms = sorted(set(analyze(c.text)))
            out: dict[int, float] = {}
            for t in terms:
                for d, tf in oracle.postings.get(t, {}).items():
                    out[d] = out.get(d, 0.0) + oracle._contrib(t, d, tf)
            return {d: s * c.boost for d, s in out.items()}
        if c.kind == "phrase":
            return {d: s * c.boost
                    for d, s in oracle.search_phrase(c.text, oracle.n_docs)}
        if c.kind == "wildcard":
            terms = [t for t in oracle.postings
                     if fnmatch.fnmatchcase(t, c.text)]
            return {d: 1.0 * c.boost for d in oracle.docs_with_any(terms)}
        if c.kind == "fuzzy":
            terms = [t for t in oracle.postings
                     if _levenshtein_banded(c.text, t, c.max_edits) <= c.max_edits]
            return {d: 1.0 * c.boost for d in oracle.docs_with_any(terms)}
        raise AssertionError(c.kind)

    musts = [clause_scores(c) for c in clauses if c.occur == MUST]
    shoulds = [clause_scores(c) for c in clauses if c.occur == SHOULD]
    nots = [clause_scores(c) for c in clauses if c.occur == MUST_NOT]
    if not musts and not shoulds:
        return []
    scores: dict[int, float] = {}
    for cs in musts + shoulds:
        for d, s in cs.items():
            scores[d] = scores.get(d, 0.0) + s
    domain = set(scores)
    for cs in musts:
        domain &= set(cs)
    for cs in nots:
        domain -= set(cs)
    ranked = sorted(((d, scores[d]) for d in domain), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


BOOL_QUERIES = [
    "posting segment",
    "posting AND segment",
    "posting OR segment OR lucene",
    "+posting -segment",
    '"posting segment" OR vbyte',
    "post* AND wand",
    "posting~1",
    "posting^2 segment",
    "+posting +segment -wand",
    "NOT posting segment",
    "-posting",
    "zzzabsent OR posting",
]


@pytest.mark.parametrize("q", BOOL_QUERIES)
def test_boolean_matches_oracle(reader, oracle, q):
    got = [(r["doc_id"], r["score"])
           for r in execute_boolean(reader, q, 10).collect()]
    want = _oracle_boolean(oracle, q, 10)
    assert [d for d, _ in got] == [d for d, _ in want], q
    assert np.allclose([s for _, s in got], [s for _, s in want], atol=1e-9), q


def test_boolean_and_equals_search_conj(reader):
    a = [(r["doc_id"], round(r["score"], 9))
         for r in execute_boolean(reader, "posting AND segment", 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in reader.search_conj("posting segment", 10).collect()]
    assert a == b


def test_boolean_or_equals_search(reader):
    a = [(r["doc_id"], round(r["score"], 9))
         for r in execute_boolean(reader, "posting segment", 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in reader.search("posting segment", 10).collect()]
    assert a == b


def test_must_absent_term_matches_nothing(reader):
    assert execute_boolean(reader, "+zzzabsent posting", 10).count() == 0
