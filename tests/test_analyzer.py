"""Analyzer golden cases — the frozen contract (FIXTURES.md §3).

Any change to these expected outputs changes every BM25 score in every index.
"""

from __future__ import annotations

import pandas as pd
import pytest

from solrutils_spark.functions.analyzer import STOPWORDS, analyze, analyze_series

GOLDENS = [
    ("parseDateTime", ["parse", "date", "time"]),
    ("to_solr_date", ["solr", "date"]),  # "to" is a stopword
    ("HTTPServer2x", ["http", "server", "2x"]),
    ("a_b", []),  # all parts length<2
    ("", []),
    (None, []),
    ("the and FOR With", []),  # stopwords, case-insensitive
    ("QueryBuilder", ["query", "builder"]),
    ("BulkUpdateHandler", ["bulk", "update", "handler"]),
    ("snake_case_names", ["snake", "case", "names"]),
    ("SCREAMING_CASE", ["screaming", "case"]),
    ("x = foo(bar, baz);", ["foo", "bar", "baz"]),
    ("MAX_ROWS=42", ["max", "rows", "42"]),
    ("BM25_B", ["bm", "25"]),  # letter→digit split, single 'b' dropped
    ("deltaEncode2Blocks", ["delta", "encode", "2blocks"]),
    ("инвертированный индекс", []),  # non-ASCII letters are separators
    ("v2", []),  # letter→digit splits: 'v' and '2' both length<2
    ("hotTermZipfianStorm", ["hot", "term", "zipfian", "storm"]),
    ("3.14", ["14"]),  # "3" too short
    ("don't", ["don"]),
    ("__init__", ["init"]),
    ("IOError", ["io", "error"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_analyze_goldens(text, expected):
    assert analyze(text) == expected


def test_vectorized_matches_pure_python():
    texts = [t for t, _ in GOLDENS] + [
        "def buildIndex(self, doc_list):\n    return merge_segments(doc_list)",
        "a" * 500,
        "CamelCaseABCDef mixedUP_and_down 12x34y",
    ]
    ser = analyze_series(pd.Series(texts, dtype=object))
    for text, got in zip(texts, ser):
        assert got == analyze(text), f"mismatch for {text!r}"


def test_stopword_set_frozen():
    # pin the exact size + a few members; growing/shrinking this set silently
    # would invalidate every index
    assert len(STOPWORDS) == 51
    assert {"the", "def", "self", "return", "pub"} <= STOPWORDS
    assert "function" not in STOPWORDS


def test_ascii_fast_path_equals_regex_fuzz():
    """Round-4: the numpy byte-class batch analyzer must be byte-identical
    to both the regex series path and the pure-Python oracle on adversarial
    ASCII (and route unicode/NUL rows to the regex fallback)."""
    import random

    import pandas as pd

    from solrutils_spark.functions.analyzer import (
        _analyze_series_regex, analyze, analyze_series)

    rng = random.Random(424242)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        "_-. ()/{}\t\n!@#"
    )
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
             for _ in range(400)]
    texts += [
        "", "HTTPServer2x", "XMLHttpRequest", "__init__", "a" * 500,
        "Ab" * 40, "x2y3Z4", "ABC", "aB", "A1b2C3", "snake_case_two",
        "2Xy 2XyZ zz", "UPPER lower Mixed",
        "nul\x00separated\x00text", "naïve café İstanbul Ümit",
        "mixed ASCII and ünïcode CamelCase2x",
    ]
    s = pd.Series(texts)
    fast = list(analyze_series(s))
    slow = list(_analyze_series_regex(s.fillna("")))
    oracle = [analyze(t) for t in texts]
    for t, f, sl, o in zip(texts, fast, slow, oracle):
        assert f == sl == o, repr(t)
