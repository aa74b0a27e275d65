"""Pure-Python BM25 reference oracle (SURVEY.md §5.2 item 3).

Deliberately simple and exhaustive: dict-of-dicts index, no pruning, float64,
fixed summation order (terms sorted lexicographically), tie-break
``(score desc, doc_id asc)``. This is the rank-parity gate the engine must
match docID-for-docID and score-for-score (atol 1e-9).

Implements the Lucene-7-default BM25 the reference executes under
(reference: pom.xml:36-40 pins solr-core 7.2.1 whose default similarity is
BM25 k1=1.2, b=0.75): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
tf_norm = tf / (tf + k1*(1 - b + b*|d|/avgdl)).
"""

from __future__ import annotations

import math
from collections import Counter

from solrutils_spark.functions.analyzer import B, K1, analyze


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: list of (doc_id, content)."""
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.tokens: dict[int, list[str]] = {}
        for doc_id, content in docs:
            toks = analyze(content)
            self.tokens[doc_id] = toks
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.doc_len)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive disjunctive (OR) BM25 top-k."""
        terms = sorted(set(analyze(query_text)))
        scores: dict[int, float] = {}
        for term in terms:  # sorted order = fixed summation order
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                norm = K1 * (1.0 - B + B * dl / self.avgdl) if self.avgdl else K1
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf / (tf + norm)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def _contrib(self, term: str, doc_id: int, tf: int) -> float:
        dl = self.doc_len[doc_id]
        norm = K1 * (1.0 - B + B * dl / self.avgdl) if self.avgdl else K1
        return self.idf(term) * tf / (tf + norm)

    def search_conj(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive conjunctive (q.op=AND) BM25 top-k: doc must contain
        ALL query terms; score = the same BM25 sum over those terms."""
        terms = sorted(set(analyze(query_text)))
        if not terms or any(t not in self.postings for t in terms):
            return []
        match = set(self.postings[terms[0]])
        for t in terms[1:]:
            match &= set(self.postings[t])
        scores = {
            d: sum(self._contrib(t, d, self.postings[t][d]) for t in terms)
            for d in match
        }
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]

    def search_phrase(self, phrase_text: str, k: int = 10,
                      slop: int = 0) -> list[tuple[int, float]]:
        """Exhaustive phrase top-k, Lucene PhraseQuery scoring:
        tf = phrase frequency (exact adjacency at slop=0; the minimal-window
        sloppy frequency at slop>0 — heap-based sweep, independent of the
        engine's pointer-loop implementation of the same defined semantics),
        idf = Σ idf(term) over unique terms."""
        seq = analyze(phrase_text)
        if not seq:
            return []
        uniq = sorted(set(seq))
        if any(t not in self.postings for t in uniq):
            return []
        idf_sum = sum(self.idf(t) for t in uniq)
        m = len(seq)
        scores: dict[int, float] = {}
        for doc_id, toks in self.tokens.items():
            if slop == 0:
                pf: float = sum(
                    1
                    for i in range(len(toks) - m + 1)
                    if toks[i : i + m] == seq
                )
            else:
                pf = self._sloppy_pf(toks, seq, slop)
            if pf:
                dl = self.doc_len[doc_id]
                norm = K1 * (1.0 - B + B * dl / self.avgdl) if self.avgdl else K1
                scores[doc_id] = idf_sum * pf / (pf + norm)
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]

    @staticmethod
    def _sloppy_pf(toks: list[str], seq: list[str], slop: int) -> float:
        """Minimal-window sloppy frequency: one adjusted position
        (p - phrase_offset) per phrase term per window; a window whose span
        ≤ slop contributes 1/(1+span); the minimum always advances (ties:
        lowest phrase offset). Slots sharing a REPEATED term must hold
        strictly increasing position-list indexes in slot order (distinct
        token positions, phrase order — round 5, same defined semantics as
        the engine's repeats cascade but formulated as a global
        re-normalization pass each step)."""
        m = len(seq)
        lists = []
        for i, t in enumerate(seq):
            li = [p - i for p, tok in enumerate(toks) if tok == t]
            if not li:
                return 0.0
            lists.append(li)
        term_slots: dict[str, list[int]] = {}
        for i, t in enumerate(seq):
            term_slots.setdefault(t, []).append(i)
        cur = [0] * m

        def normalize() -> bool:
            """Enforce strictly-increasing indexes inside each same-term
            slot group; False when any pointer falls off its list."""
            for slots in term_slots.values():
                hi = -1
                for s in slots:
                    cur[s] = max(cur[s], hi + 1)
                    hi = cur[s]
            return all(cur[s] < len(lists[s]) for s in range(m))

        if not normalize():
            return 0.0
        freq = 0.0
        while True:
            vals = [lists[i][cur[i]] for i in range(m)]
            span = max(vals) - min(vals)
            if span <= slop:
                freq += 1.0 / (1.0 + span)
            cur[min(range(m), key=lambda j: (vals[j], j))] += 1
            if not normalize():
                return freq

    def expand_wildcard(self, pattern: str) -> list[str]:
        import fnmatch

        return sorted(t for t in self.postings if fnmatch.fnmatchcase(t, pattern))

    def docs_with_any(self, terms: list[str]) -> list[int]:
        """Constant-score multi-term domain: doc_ids (asc) containing ≥1 term."""
        out: set[int] = set()
        for t in terms:
            out |= set(self.postings.get(t, {}))
        return sorted(out)
