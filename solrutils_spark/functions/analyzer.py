"""E1 — the code-aware analyzer chain (FROZEN CONTRACT, SURVEY.md §7.0).

The reference delegates analysis to Solr's schema-driven analyzer chain and
preprocesses query text with ``lowercase``/``replace``/``match`` conversions
(reference: Conversion.java:199-208,398-479). The north-star spec fixes a
code-aware chain; this module freezes it:

1. split raw text on ``[^A-Za-z0-9_]+``
2. split snake_case at ``_``
3. split camelCase at lower→Upper, UPPER→Upper-lower, and letter→digit
   boundaries (``HTTPServer2x`` → ``http, server, 2x``)
4. lowercase
5. drop tokens shorter than 2 chars
6. drop the frozen stopword set below

Two implementations that MUST agree (pinned by tests/test_analyzer.py):

- :func:`analyze` — pure Python, used by the rank-parity oracle and by
  query-compile (driver side, tiny inputs).
- :func:`analyze_series` — vectorized pandas implementation used inside Arrow
  UDFs on executors (no per-row Python UDF calls; pandas ``.str`` regex ops
  run in C loops over the whole Arrow batch).

Any change here changes every BM25 score in every index — hence frozen.
"""

from __future__ import annotations

import re

import pandas as pd

# --- frozen stopword set (enumerated, never extended silently) --------------
# English function words + language keywords ubiquitous in source code. Tokens
# are matched post-lowercase. A hot term like "self"/"def" being *kept* or
# *dropped* changes df and avgdl globally — this set is part of the contract.
STOPWORDS: frozenset[str] = frozenset(
    {
        # english
        "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
        "has", "in", "is", "it", "of", "on", "or", "that", "the", "this",
        "to", "was", "were", "will", "with",
        # code keywords (shared across py/java/js/go/rs)
        "def", "class", "return", "import", "if", "else", "elif", "while",
        "not", "none", "true", "false", "null", "var", "let", "const",
        "fn", "pub", "use", "mod", "new", "public", "private", "static",
        "void", "self",
    }
)

# boundary-insertion regex: lower→Upper | UPPER→Upper-lower | letter→digit
_CAMEL_BOUNDARY = r"(?<=[a-z])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[A-Za-z])(?=[0-9])"
_CAMEL_RE = re.compile(_CAMEL_BOUNDARY)
# post-lowercase token pattern: runs of [a-z0-9], min length 2. Underscores and
# all other chars act as separators (steps 1+2 fold into this single findall).
_TOKEN_RE = re.compile(r"[a-z0-9]{2,}")

K1 = 1.2
B = 0.75


def analyze(text: str | None) -> list[str]:
    """Pure-Python analyzer — the oracle-side twin of :func:`analyze_series`."""
    if not text:
        return []
    spaced = _CAMEL_RE.sub(" ", text)
    return [t for t in _TOKEN_RE.findall(spaced.lower()) if t not in STOPWORDS]


def analyze_series(texts: pd.Series) -> pd.Series:
    """Vectorized analyzer over a pandas Series of strings → Series of lists.

    Runs inside pandas_udf/mapInPandas on Arrow batches. The regex passes are
    pandas ``.str`` ops (C-level row loop, compiled regex); only the final
    stopword filter is a per-row list comprehension over already-tokenized
    lists, which is unavoidable and cheap (set lookups). (Measured dead end:
    NUL-joining the batch for one giant re.sub is NOT faster — the regex scan
    is byte-bound, so batching only adds join/split overhead.)
    """
    s = texts.fillna("")
    spaced = s.str.replace(_CAMEL_BOUNDARY, " ", regex=True)
    toks = spaced.str.lower().str.findall(_TOKEN_RE)
    stop = STOPWORDS
    return toks.map(lambda ts: [t for t in ts if t not in stop])
