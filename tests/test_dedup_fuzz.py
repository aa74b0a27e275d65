"""Seeded property-fuzz of the dedup stack (round-4 verdict #8).

The query surface has ``test_query_fuzz.py``; this gives the dedup stack
the same treatment. A deterministic seeded generator draws 200+ texts —
Unicode whitespace (NBSP, NEL, LINE/PARA SEP, IDEOGRAPHIC SPACE, the
U+001C..1F separators), trailing separators, token edits, exact copies,
sub-shingle shorts, empties, NULLs — plus ~30 planted near-dup pairs at
Jaccard ≥ 0.9, and asserts in a handful of Spark jobs:

- JVM shingling (``_shingles_col``) == Python ``str.split()`` shingles on
  every draw
- distributed minhash / simhash signatures == pure-Python scalar oracles
  (FNV + uint64-wrap Carter-Wegman / signed bit-vote), value-identical
- JVM xxhash64 signatures are partition-invariant (same values under
  different repartitionings)
- LSH candidates ⊇ all pairs with true shingle-set Jaccard ≥ 0.9
  (whitespace-variant copies tokenize identically → identical signatures
  → guaranteed candidates; edited copies pass at the banding margin, all
  seed-fixed so the assertion is deterministic)
- ``verify_ngram_jaccard`` == Python set-Jaccard on every surviving pair
- ``simhash_near_dups`` (pigeonhole 4×16-bit blocks) == brute-force
  hamming ≤ 3 over all signature pairs

Everything derives from public algorithms (MinHash: Broder 1997; SimHash:
Charikar 2002); the reference repo has no dedup surface — these are the
training-data-pipeline operators the task brief adds.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from solrutils_spark.operators.dedup import (
    _MERSENNE,
    _minhash_params,
    _shingles,
    _shingles_col,
    hash_bytes,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_jvm,
    simhash_near_dups,
    simhash_signatures,
    verify_ngram_jaccard,
)

SEED = 20260817
K = 5  # shingle size under test
_WS_POOL = [" ", "\t", "\n", "\r\n", " ", "　", " ", " ",
            "", "\x1c", "\x1d", "\x1e", "\x1f"]
_VOCAB = ["def", "return", "self", "import", "класс", "データ", "σ", "foo_bar",
          "parseDateTime", "QueryBuilder", "x1", "éclair", "ñ", "0xFF",
          "lambda", "yield", "async", "await", "assert", "raise", "while"]


def _gen() -> tuple[list[str | None], list[tuple[int, int]]]:
    """Returns (texts, planted near-dup id pairs). Deterministic."""
    rng = random.Random(SEED)
    texts: list[str | None] = []
    planted: list[tuple[int, int]] = []

    def add(t: str | None) -> int:
        texts.append(t)
        return len(texts) - 1

    # 30 long base docs, each with a planted near-dup variant
    for _ in range(30):
        toks = [rng.choice(_VOCAB) for _ in range(150)]
        a = add(" ".join(toks))
        mode = rng.random()
        if mode < 0.4:  # whitespace-variant copy: tokens identical
            b = add("".join(
                tok + rng.choice(_WS_POOL) for tok in toks).rstrip() +
                rng.choice(["", "\n", " ", "\x1c"]))
        elif mode < 0.7:  # single-token substitution (J >= 145/155)
            i = rng.randrange(len(toks))
            edited = toks[:i] + [rng.choice(_VOCAB) + "_v2"] + toks[i + 1:]
            b = add(" ".join(edited))
        else:  # single-token deletion
            i = rng.randrange(len(toks))
            b = add(" ".join(toks[:i] + toks[i + 1:]))
        planted.append((a, b))

    # 140 adversarial singles
    for _ in range(140):
        shape = rng.random()
        if shape < 0.1:
            add("")
        elif shape < 0.15:
            add(None)
        elif shape < 0.25:  # below shingle size
            add(rng.choice(_WS_POOL).join(
                rng.choice(_VOCAB) for _ in range(rng.randrange(1, K))))
        elif shape < 0.35:  # whitespace-only
            add("".join(rng.choice(_WS_POOL)
                        for _ in range(rng.randrange(1, 6))))
        else:
            n = rng.randrange(K, 40)
            add("".join(rng.choice(_VOCAB) + rng.choice(_WS_POOL)
                        for _ in range(n)))

    # a few exact duplicates of earlier draws (guaranteed candidates)
    for _ in range(10):
        i = rng.randrange(30)
        planted.append((2 * i, add(texts[2 * i])))
    return texts, planted


def _py_minhash(text: str | None, num_perm: int) -> list[int]:
    """Scalar oracle for the FNV/Carter-Wegman kernel: FNV per shingle,
    (a*h + b) with uint64 WRAP (the kernel computes the product in uint64,
    pinned by the golden test), then mod 2^61-1, min per permutation."""
    a, b = _minhash_params(num_perm)
    sh = _shingles(text or "", K)
    if not sh:
        return [_MERSENNE] * num_perm
    hs = [hash_bytes(s.encode("utf-8")) % _MERSENNE for s in sh]
    m64 = (1 << 64) - 1
    return [
        min(((ai * h + bi) & m64) % _MERSENNE for h in hs)
        for ai, bi in zip(a.tolist(), b.tolist())
    ]


def _py_simhash(text: str | None) -> int:
    toks = (text or "").split()
    votes = [0] * 64
    for t in toks:
        h = hash_bytes(t.encode("utf-8"))
        for i in range(64):
            votes[i] += (h >> i) & 1
    v = sum(1 << i for i in range(64) if 2 * votes[i] > len(toks))
    return v - (1 << 64) if v >= (1 << 63) else v


def _py_jaccard(ta: str | None, tb: str | None) -> float:
    sa, sb = set(_shingles(ta or "", K)), set(_shingles(tb or "", K))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def corpus(spark):
    texts, planted = _gen()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(7).cache()
    df.count()
    return df, texts, planted


def test_fuzz_shingles_col_matches_python(corpus):
    df, texts, _ = corpus
    got = {r["doc_id"]: list(r["s"]) for r in df.select(
        "doc_id", _shingles_col(F.col("text"), K).alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _shingles(t or "", K), f"doc {i}: {t!r}"


def test_fuzz_minhash_kernel_matches_scalar_oracle(corpus):
    df, texts, _ = corpus
    got = {r["doc_id"]: r["signature"] for r in
           minhash_signatures(df, num_perm=16, shingle_k=K).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_minhash(t, 16), f"doc {i}: {t!r}"


def test_fuzz_simhash_kernel_matches_scalar_oracle(corpus):
    df, texts, _ = corpus
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_simhash(t), f"doc {i}: {t!r}"


def test_fuzz_jvm_signatures_partition_invariant(corpus):
    df, _, _ = corpus
    a = {r["doc_id"]: r["signature"] for r in
         minhash_signatures_jvm(df.repartition(3), num_perm=16,
                                shingle_k=K).collect()}
    b = {r["doc_id"]: r["signature"] for r in
         minhash_signatures_jvm(df.coalesce(1), num_perm=16,
                                shingle_k=K).collect()}
    assert a == b


def test_fuzz_lsh_recall_and_verify_values(corpus):
    df, texts, planted = corpus
    truth = {(a, b) if a < b else (b, a)
             for a, b in planted if _py_jaccard(texts[a], texts[b]) >= 0.9}
    assert len(truth) >= 25  # the generator really plants high-J pairs
    sigs = minhash_signatures_jvm(df, num_perm=64, shingle_k=K)
    cand = {(r["id_a"], r["id_b"]) for r in
            lsh_candidate_pairs(sigs, bands=16).collect()}
    missed = truth - cand
    assert not missed, f"LSH missed true near-dups: {sorted(missed)[:5]}"

    ver = verify_ngram_jaccard(
        lsh_candidate_pairs(sigs, bands=16), df, threshold=0.0, shingle_k=K
    ).collect()
    for r in ver:
        exp = _py_jaccard(texts[r["id_a"]], texts[r["id_b"]])
        assert r["jaccard"] == pytest.approx(exp, abs=1e-9), (r["id_a"], r["id_b"])


def test_fuzz_simhash_pigeonhole_exact(corpus):
    df, texts, _ = corpus
    sigs = {i: _py_simhash(t) for i, t in enumerate(texts)}
    brute = set()
    ids = sorted(sigs)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3:
                brute.add((a, b))
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_dups(simhash_signatures(df), max_hamming=3).collect()}
    assert got == brute
