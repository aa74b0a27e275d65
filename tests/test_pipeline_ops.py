"""Dedup / similarity / textstats / multimodal operator tests (sf0.001 data)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solrutils_spark.operators.dedup import (
    dedup_exact_keep_first,
    embedding_near_dups,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_all_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from solrutils_spark.operators.multimodal import (
    extract_features,
    payload_metadata,
    resize_images,
    synth_multimodal,
)
from solrutils_spark.operators.similarity import (
    assign_centroids,
    cosine_topk_brute,
    ivf_topk,
    train_centroids,
)
from solrutils_spark.operators.textstats import (
    detect_language,
    fingerprint,
    quality_features,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and again today"),  # near dup
        (4, "completely different text about spark inverted index engines"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["ids"] == [1, 2]
    kept = dedup_exact_keep_first(dup_docs)
    assert kept.count() == 4
    assert kept.filter("doc_id = 2").count() == 0


def test_minhash_lsh_finds_near_dup(dup_docs):
    pairs = minhash_dedup_pairs(
        dup_docs, num_perm=64, bands=16, threshold=0.5, shingle_k=3
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found  # exact dup survives
    assert (1, 3) in found or (2, 3) in found  # near dup found
    assert all({a, b} <= {1, 2, 3} for a, b in found)  # doc 4/5 never matched


def test_minhash_signature_determinism(dup_docs):
    s1 = {r["doc_id"]: r["signature"] for r in minhash_signatures(dup_docs).collect()}
    s2 = {r["doc_id"]: r["signature"] for r in minhash_signatures(dup_docs).collect()}
    assert s1 == s2
    assert s1[1] == s1[2]  # identical text → identical signature


def test_lsh_identical_signatures_always_candidates(dup_docs):
    sigs = minhash_signatures(dup_docs)
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, bands=8).collect()}
    assert (1, 2) in cands


def test_simhash(dup_docs):
    sigs = simhash_signatures(dup_docs)
    by_id = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert by_id[1] == by_id[2]
    pairs = simhash_near_dups(sigs, max_hamming=8).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(1, 2)] == 0


def test_ngram_jaccard_exhaustive(dup_docs):
    pairs = ngram_jaccard_all_pairs(dup_docs, threshold=0.4, shingle_k=3).collect()
    d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert d[(1, 2)] == 1.0
    assert 0.4 <= d[(1, 3)] < 1.0


def test_embedding_near_dups_exact_vs_lsh(embeddings):
    sub = embeddings.limit(120)
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(sub, threshold=0.9).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups(sub, threshold=0.9, n_planes=4).collect()}
    assert lsh <= exact  # LSH only prunes, never fabricates


def test_cosine_topk_brute_matches_numpy(embeddings):
    rows = embeddings.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = list(X[0])
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:5]
    expect = [(int(ids[i]), float(cos[i])) for i in order]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk_brute(embeddings, q, 5).collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert g[1] == pytest.approx(e[1], abs=1e-9)


def test_ivf_prunes_but_scores_exact(embeddings):
    q = list(embeddings.first()["embedding"])
    cents = train_centroids(embeddings, n_centroids=8, sample=500)
    assigned = assign_centroids(embeddings, cents).cache()
    assert assigned.select("centroid_id").distinct().count() <= 8
    brute = [(r["vec_id"], r["cosine"]) for r in cosine_topk_brute(embeddings, q, 5).collect()]
    ivf = [(r["vec_id"], r["cosine"]) for r in ivf_topk(assigned, cents, q, 5, n_probe=8).collect()]
    assert ivf == brute  # probing ALL centroids == exact


def test_langid(spark):
    rows = [
        (1, "the cat and the dog are in the house with it"),
        (2, "der hund und die katze sind nicht in das haus"),
        (3, "le chat est dans la maison pour les enfants avec une"),
        (4, "xyzzy plugh 12345"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang_pred"] for r in detect_language(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_features(documents):
    q = quality_features(documents, "text")
    row = q.filter("q_chars > 0").first()
    assert 0.0 <= row["q_score"] <= 1.0
    assert 0.0 <= row["q_punct_ratio"] <= 1.0
    assert q.count() == documents.count()


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "don't count, me twice!"), (2, "")], "id long, text string")
    rows = {r["id"]: r for r in token_counts(df).collect()}
    assert rows[1]["tok_ws"] == 4
    # don | 't | count | , | me | twice | !
    assert rows[1]["tok_bpeish"] == 7
    assert rows[2]["tok_ws"] == 0


def test_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (1, "The  quick   brown fox jumped over the lazy dog near the river bank"),
            (2, "the quick brown fox jumped over the lazy dog near the river bank"),
            (3, "something else entirely different here that shares nothing at all"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in fingerprint(df).collect()}
    assert rows[1]["fp_md5"] == rows[2]["fp_md5"]  # whitespace/case-normalized
    assert rows[1]["fp_winnow"] == rows[2]["fp_winnow"]
    overlap = set(rows[1]["fp_winnow"]) & set(rows[3]["fp_winnow"])
    assert len(overlap) == 0


def test_multimodal_plumbing(spark):
    mm = synth_multimodal(spark, 30)
    meta = payload_metadata(mm)
    rows = meta.collect()
    assert all(r["payload_sha256"] for r in rows)
    jpeg = [r for r in rows if r["meta"]["mime"] == "image/jpeg"]
    assert all(r["sniffed_mime"] == "image/jpeg" for r in jpeg)

    feats = extract_features(mm).collect()
    assert all(len(r["feature"]) == 64 for r in feats)
    # deterministic: same payload → same feature
    again = extract_features(mm).collect()
    assert feats[0]["feature"] == again[0]["feature"]

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_images(mm, 100, 100).collect()
