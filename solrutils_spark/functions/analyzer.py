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

import numpy as np
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


def _analyze_series_regex(s: pd.Series) -> pd.Series:
    """The original regex path (kept verbatim as the non-ASCII fallback —
    unicode ``.lower()`` can expand characters, e.g. İ → i + combining dot,
    which the byte-class path below cannot reproduce)."""
    spaced = s.str.replace(_CAMEL_BOUNDARY, " ", regex=True)
    toks = spaced.str.lower().str.findall(_TOKEN_RE)
    stop = STOPWORDS
    return toks.map(lambda ts: [t for t in ts if t not in stop])


def _analyze_ascii_batch(texts: list) -> list:
    """Regex-free analyzer for ASCII texts: one numpy pass over the whole
    batch's bytes computes character classes and boundary masks; tokens are
    sliced from a single lowercased string. Byte-identical to the regex path
    on ASCII input (pinned by test_analyzer fuzz) and ~3x faster — the
    camel-boundary ``re.sub`` was ~40% of the whole segment kernel.
    """
    big = "\x00" + "\x00".join(texts) + "\x00"
    arr = np.frombuffer(big.encode("ascii"), dtype=np.uint8)
    n = arr.size
    lower = (arr >= 97) & (arr <= 122)
    upper = (arr >= 65) & (arr <= 90)
    digit = (arr >= 48) & (arr <= 57)
    letter = lower | upper
    tok = letter | digit
    # camel/digit boundaries BETWEEN i-1 and i (the three frozen rules)
    b = np.zeros(n, dtype=bool)
    b[1:] = (lower[:-1] & upper[1:]) | (letter[:-1] & digit[1:])
    b[1:-1] |= upper[:-2] & upper[1:-1] & lower[2:]
    prev_tok = np.empty(n, dtype=bool)
    prev_tok[0] = False
    prev_tok[1:] = tok[:-1]
    nxt_tok = np.empty(n, dtype=bool)
    nxt_tok[-1] = False
    nxt_tok[:-1] = tok[1:]
    nxt_b = np.empty(n, dtype=bool)
    nxt_b[-1] = False
    nxt_b[:-1] = b[1:]
    starts = np.flatnonzero(tok & (~prev_tok | b))
    ends = np.flatnonzero(tok & (~nxt_tok | nxt_b)) + 1
    keep = (ends - starts) >= 2  # min-length filter (step 5)
    starts, ends = starts[keep], ends[keep]
    low_big = big.lower()  # ASCII lower: one C pass, offsets unchanged
    # distribute tokens to their document by separator position
    sep_pos = np.flatnonzero(arr == 0)
    doc_bounds = np.searchsorted(starts, sep_pos)
    stop = STOPWORDS
    sl, el = starts.tolist(), ends.tolist()
    return [
        [
            t
            for j in range(doc_bounds[d], doc_bounds[d + 1])
            if (t := low_big[sl[j]:el[j]]) not in stop
        ]
        for d in range(len(texts))
    ]


def analyze_series(texts: pd.Series) -> pd.Series:
    """Vectorized analyzer over a pandas Series of strings → Series of lists.

    Runs inside pandas_udf/mapInPandas on Arrow batches. ASCII rows (all of
    a source-code corpus in practice) take the numpy byte-class path — no
    regex at all; rows containing non-ASCII take the original regex path so
    unicode ``.lower()`` semantics stay exact. Both produce identical tokens
    on ASCII input (pinned by tests). (Measured dead ends: NUL-joining the
    batch for one giant ``re.sub`` is NOT faster — the regex scan itself is
    the cost; the byte-class path removes the regex instead.)
    """
    s = texts.fillna("")
    vals = s.tolist()
    # NUL is the batch separator below, so a text CONTAINING NUL must take
    # the fallback (it would shift every later doc's boundary); the regex
    # path treats NUL as an ordinary separator char — same tokens.
    ascii_mask = [t.isascii() and "\x00" not in t for t in vals]
    if all(ascii_mask):
        return pd.Series(_analyze_ascii_batch(vals), index=s.index)
    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    asc = [i for i, a in enumerate(ascii_mask) if a]
    non = [i for i, a in enumerate(ascii_mask) if not a]
    if asc:
        res = _analyze_ascii_batch([vals[i] for i in asc])
        for i, r in zip(asc, res):
            out.iloc[i] = r
    if non:
        res = _analyze_series_regex(s.iloc[non])
        for i, r in zip(non, res):
            out.iloc[i] = r
    return out
