"""Mini Lucene-syntax query parser + boolean executor.

The reference's search model renders raw Lucene query strings into ``q`` /
``fq`` (``Query.java:10-31`` sets the rendered template as the main query;
``FilterQuery.java:11-64`` appends filter queries; templates can emit any
syntax Solr's LuceneQParser accepts). This module parses the practical core
of that syntax and executes it against the engine with DataFrame algebra:

  supported   ::=  clause (connector? clause)*
  clause      ::=  [+|-|NOT|!] atom [~edits] [^boost]
  atom        ::=  '"' words '"'  |  word-with-*-or-?  |  word
  connector   ::=  AND | OR | && | ||

Semantics are Lucene BooleanQuery's (flat — the practical left-to-right
mapping, not the parser's notorious precedence corners):

- bare clauses are SHOULD under the default OR operator;
- ``AND`` promotes BOTH adjacent clauses to MUST;
- ``+`` is MUST, ``-`` / ``NOT`` / ``!`` is MUST_NOT;
- the match domain is: every MUST matches ∧ (≥1 SHOULD matches when there
  is no MUST) ∧ no MUST_NOT matches;
- the score is the sum of matching MUST+SHOULD contributions (SHOULD
  contributes wherever it matches even when not required), each × boost;
- term and phrase clauses score BM25 (phrase: PhraseQuery scoring); wildcard
  and fuzzy clauses are constant-score 1.0 (Lucene's CONSTANT_SCORE
  multi-term rewrite);
- a MUST_NOT-only query matches nothing (Lucene: no positive clause).

Unsupported constructs fail LOUDLY (``UnsupportedQuerySyntax``): grouping
parentheses, field-scoped clauses (the engine indexes one text field),
range queries ``[a TO b]``, and proximity phrases ``"a b"~N`` — the same
honest-gate contract as sources/minixslt.py.

Execution is pure DataFrame algebra over per-clause retrievals — each
clause is an indexed posting read (bounded by its df), contributions union
into one hash aggregation, domain restriction is semi/anti joins on
doc_id. No driver-side doc loops; at cluster scale every step is a bounded
shuffle keyed on doc_id.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.functions.analyzer import analyze
from solrutils_spark.query.boolean import (
    TOPK_DDL,
    expand_fuzzy,
    expand_wildcard,
    multi_term_docs,
    phrase_scored,
    scored_matches,
)

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


class UnsupportedQuerySyntax(ValueError):
    """Query uses a construct outside the supported Lucene subset."""


@dataclass
class Clause:
    kind: str  # term | phrase | wildcard | fuzzy
    text: str
    occur: str = SHOULD
    boost: float = 1.0
    max_edits: int = 2  # Lucene: bare ~ means edit distance 2
    explicit_occur: bool = field(default=False, repr=False)


_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<quoted>"(?P<qbody>[^"]*)"(?P<qsuffix>~\d+)?)
      | (?P<connector>AND|OR|NOT|&&|\|\||!)(?=\s|$|")
      | (?P<bare>[^\s"]+)
    )
    """,
    re.VERBOSE,
)

_CLAUSE_RE = re.compile(
    r"^(?P<prefix>[+\-!])?(?P<body>[^~^]+)(?P<fuzzy>~(?P<edits>\d*))?"
    r"(?P<boost>\^(?P<bval>\d+(?:\.\d+)?))?$"
)


def parse_query(q: str) -> list[Clause]:
    """Parse a Lucene-subset query string into a flat clause list."""
    if "(" in q or ")" in q:
        raise UnsupportedQuerySyntax(f"grouping parentheses not supported: {q!r}")
    if re.search(r"\[[^\]]*\bTO\b", q):
        raise UnsupportedQuerySyntax(f"range queries not supported: {q!r}")

    clauses: list[Clause] = []
    pending_occur: str | None = None
    pending_and = False
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise UnsupportedQuerySyntax(f"cannot tokenize at: {q[pos:]!r}")
            break
        pos = m.end()
        if m.group("connector"):
            c = m.group("connector")
            if c in ("NOT", "!"):
                pending_occur = MUST_NOT
            elif c in ("AND", "&&"):
                if not clauses:
                    raise UnsupportedQuerySyntax(f"AND with no left clause: {q!r}")
                prev = clauses[-1]
                if not prev.explicit_occur and prev.occur == SHOULD:
                    prev.occur = MUST
                pending_and = True
            # OR: default occur stays SHOULD
            continue
        if m.group("quoted") is not None:
            if m.group("qsuffix"):
                raise UnsupportedQuerySyntax(
                    f"proximity phrases not supported: {m.group('quoted')!r}"
                )
            cl = Clause(kind="phrase", text=m.group("qbody"))
        else:
            raw = m.group("bare")
            cm = _CLAUSE_RE.match(raw)
            if not cm:
                raise UnsupportedQuerySyntax(f"cannot parse clause: {raw!r}")
            body = cm.group("body")
            if ":" in body:
                raise UnsupportedQuerySyntax(
                    f"field-scoped clauses not supported (single text field): {raw!r}"
                )
            if cm.group("prefix") == "+":
                occur, explicit = MUST, True
            elif cm.group("prefix") in ("-", "!"):
                occur, explicit = MUST_NOT, True
            else:
                occur, explicit = SHOULD, False
            if cm.group("fuzzy") is not None:
                if "*" in body or "?" in body:
                    raise UnsupportedQuerySyntax(f"fuzzy wildcard: {raw!r}")
                edits = int(cm.group("edits")) if cm.group("edits") else 2
                cl = Clause(kind="fuzzy", text=body.lower(), occur=occur,
                            max_edits=edits, explicit_occur=explicit)
            elif "*" in body or "?" in body:
                cl = Clause(kind="wildcard", text=body.lower(), occur=occur,
                            explicit_occur=explicit)
            else:
                cl = Clause(kind="term", text=body, occur=occur,
                            explicit_occur=explicit)
            if cm.group("boost"):
                cl.boost = float(cm.group("bval"))
        if pending_occur is not None and not cl.explicit_occur:
            cl.occur = pending_occur
            cl.explicit_occur = True
        pending_occur = None
        if pending_and and not cl.explicit_occur and cl.occur == SHOULD:
            cl.occur = MUST
        pending_and = False
        clauses.append(cl)
    if pending_occur is not None or pending_and:
        raise UnsupportedQuerySyntax(f"dangling connector: {q!r}")
    return clauses


# ------------------------------------------------------------ executor ----


def _clause_scored(reader, cl: Clause) -> DataFrame | None:
    """(doc_id, score) of ALL docs the clause matches; None = clause has no
    live terms (matches nothing)."""
    if cl.kind == "term":
        terms = sorted(set(analyze(cl.text)))
        if not terms:
            return None
        df = scored_matches(reader, terms)
    elif cl.kind == "phrase":
        seq = analyze(cl.text)
        if not seq:
            return None
        if len(seq) == 1:
            df = scored_matches(reader, seq)
        else:
            df = phrase_scored(reader, cl.text)
    elif cl.kind == "wildcard":
        df = multi_term_docs(reader, expand_wildcard(reader, cl.text))
    elif cl.kind == "fuzzy":
        df = multi_term_docs(
            reader, expand_fuzzy(reader, cl.text, cl.max_edits, max_expansions=1024)
        )
    else:  # pragma: no cover
        raise AssertionError(cl.kind)
    if cl.boost != 1.0:
        df = df.select("doc_id", (F.col("score") * F.lit(cl.boost)).alias("score"))
    return df


def execute_boolean(reader, q: str, k: int = 10) -> DataFrame:
    """Parse ``q`` and run it → DataFrame(doc_id, score) top-k."""
    clauses = parse_query(q)
    spark = reader.spark
    empty = spark.createDataFrame([], TOPK_DDL)
    musts = [c for c in clauses if c.occur == MUST]
    shoulds = [c for c in clauses if c.occur == SHOULD]
    nots = [c for c in clauses if c.occur == MUST_NOT]
    if not musts and not shoulds:
        return empty  # Lucene: no positive clause → no hits

    contribs: list[DataFrame] = []
    must_domains: list[DataFrame] = []
    for c in musts:
        df = _clause_scored(reader, c)
        if df is None:
            return empty  # a MUST clause that can't match → empty result
        contribs.append(df)
        must_domains.append(df.select("doc_id"))
    for c in shoulds:
        df = _clause_scored(reader, c)
        if df is not None:
            contribs.append(df)
    if not contribs:
        return empty

    scored = contribs[0]
    for df in contribs[1:]:
        scored = scored.unionByName(df)
    scored = scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
    # domain: every MUST present. With no MUST, the union already contains
    # only docs where ≥1 SHOULD matched.
    for dom in must_domains:
        scored = scored.join(dom, "doc_id", "leftsemi")
    for c in nots:
        nd = _clause_matches(reader, c)
        if nd is not None:
            scored = scored.join(nd, "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _clause_matches(reader, cl: Clause) -> DataFrame | None:
    """doc_id set a clause matches (for MUST_NOT exclusion).

    Terms under MUST_NOT use OR-of-terms semantics within the clause (the
    analyzer can split one input word into several tokens; Lucene's
    ``-camelCase`` excludes docs matching the sub-query it parses to)."""
    if cl.kind == "term":
        terms = sorted(set(analyze(cl.text)))
        if not terms:
            return None
        return scored_matches(reader, terms).select("doc_id")
    if cl.kind == "phrase":
        seq = analyze(cl.text)
        if not seq:
            return None
        if len(seq) == 1:
            return scored_matches(reader, seq).select("doc_id")
        return phrase_scored(reader, cl.text).select("doc_id")
    if cl.kind == "wildcard":
        return multi_term_docs(reader, expand_wildcard(reader, cl.text)).select(
            "doc_id"
        )
    if cl.kind == "fuzzy":
        return multi_term_docs(
            reader, expand_fuzzy(reader, cl.text, cl.max_edits, max_expansions=1024)
        ).select("doc_id")
    raise AssertionError(cl.kind)  # pragma: no cover


__all__ = [
    "Clause",
    "MUST",
    "MUST_NOT",
    "SHOULD",
    "UnsupportedQuerySyntax",
    "execute_boolean",
    "parse_query",
]
