"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, each a first-class DataFrame transform designed for the
100 TB regime (no driver-side state, no O(n²) unless explicitly windowed by
LSH buckets):

- exact          hash-groupBy on sha256(normalized text) — one shuffle
- minhash_lsh    shingle → minhash (vectorized numpy) → band-bucket join —
                 candidate pairs only WITHIN buckets (classic MinHash+LSH)
- simhash        64-bit simhash + hamming-ball grouping via rotations
- ngram_jaccard  exact Jaccard verification over n-gram sets for candidate
                 pairs (the verify stage after LSH)
- embedding near-dup  cosine ≥ τ pairs via LSH-bucketed (or brute) join

All hashing is deterministic (xxhash64 Spark-side / fixed-seed numpy), so
results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact ----

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts → (fingerprint, ids, dup_count); dup groups only."""
    return (
        df.select(id_col, F.sha2(F.col(text_col), 256).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per identical text (one shuffle, window)."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ------------------------------------------------------------- shingles ----

def _shingles(text: str, k: int = 5) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# ---------------------------------------------------------- minhash+LSH ----

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, signature array<long>) via vectorized minhash over word shingles."""
    a, b = _minhash_params(num_perm)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col].fillna(""):
                sh = _shingles(text, shingle_k)
                if not sh:
                    sigs.append(np.full(num_perm, _MERSENNE, dtype=np.uint64).tolist())
                    continue
                hv = np.array(
                    [hash_bytes(s.encode("utf-8")) for s in sh], dtype=np.uint64
                )
                # (a*h + b) mod p  per permutation — broadcast (P, S)
                vals = (a[:, None] * (hv[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, signature array<long>")


def hash_bytes(data: bytes) -> int:
    """Deterministic 64-bit hash (FNV-1a) — same everywhere, no PYTHONHASHSEED."""
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Band-bucket join → candidate (id_a, id_b) pairs, a < b, deduped.

    Scale shape: explode to (band, band_hash, id) → self-join per bucket —
    the join key (band, band_hash) keeps the shuffle uniform; a band bucket
    with B ids produces B² pairs only inside that bucket.
    """
    num_perm_col = F.size("signature")
    rows_per_band = (num_perm_col / bands).cast("int")
    banded = signatures.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.xxhash64(
                        F.slice(
                            "signature", band * rows_per_band + 1, rows_per_band
                        ).cast("string"),
                        band,
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.band_hash")
    left = banded.withColumnRenamed(id_col, "id_a")
    right = banded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """Full MinHash+LSH pipeline → verified near-dup pairs with jaccard ≥ τ."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    cands = lsh_candidate_pairs(sigs, bands, id_col)
    return verify_ngram_jaccard(cands, df, text_col, id_col, threshold, shingle_k)


# -------------------------------------------------------------- simhash ----

def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized bit-vote)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for text in pdf[text_col].fillna(""):
                toks = text.split()
                if not toks:
                    out.append(0)
                    continue
                hv = np.array([hash_bytes(t.encode("utf-8")) for t in toks], dtype=np.uint64)
                bits = (hv[:, None] >> bit_idx[None, :]) & np.uint64(1)  # (T, 64)
                votes = bits.sum(axis=0) * 2 - len(toks)
                sim = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    sim |= np.uint64(1) << np.uint64(i)
                out.append(int(np.int64(sim)))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, simhash long")


def simhash_near_dups(
    signatures: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Pairs within hamming distance ≤ k via block rotation (4×16-bit blocks):
    two hashes within distance 3 share at least one exact 16-bit block —
    bucket by each block, verify hamming inside buckets (pigeonhole-exact)."""
    sig = signatures
    blocks = [
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bval"),
        )
        for i in range(4)
    ]
    exploded = sig.select(id_col, "simhash", F.explode(F.array(*blocks)).alias("b")).select(
        id_col, "simhash", "b.blk", "b.bval"
    )
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "bval"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "bval"
    )
    pairs = (
        a.join(b, ["blk", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# -------------------------------------------------------- ngram jaccard ----

def verify_ngram_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs (broadcast-friendly:
    only candidate rows' texts move, via two semi-restricted joins)."""
    texts = df.select(F.col(id_col), F.col(text_col))
    a = texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    b = texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jac = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                sa, sb = set(_shingles(ta or "", shingle_k)), set(_shingles(tb or "", shingle_k))
                union = len(sa | sb)
                jac.append(len(sa & sb) / union if union else 1.0)
            out = pdf[["id_a", "id_b"]].copy()
            out["jaccard"] = jac
            yield out

    verified = joined.mapInPandas(gen, "id_a long, id_b long, jaccard double")
    return verified.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_all_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, shingle_k: int = 3,
) -> DataFrame:
    """Exhaustive O(n²) Jaccard — ONLY for small verification corpora/tests;
    the scale path is minhash_dedup_pairs."""
    ids = df.select(F.col(id_col).alias("id_a")).crossJoin(
        df.select(F.col(id_col).alias("id_b"))
    ).filter(F.col("id_a") < F.col("id_b"))
    return verify_ngram_jaccard(ids, df, text_col, id_col, threshold, shingle_k)


# --------------------------------------------------- embedding near-dup ----

def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 0,
) -> DataFrame:
    """Cosine ≥ τ pairs. n_planes=0 → exact all-pairs (tests / small);
    n_planes>0 → random-hyperplane LSH buckets first (scale path: candidates
    only within identical sign-sketch buckets)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    vecs = df.select(
        F.col(id_col), F.col(vec_col), norm.alias("nrm")
    ).filter(F.col("nrm") > 0)

    if n_planes > 0:
        dim = len(df.select(vec_col).first()[0])
        rng = np.random.default_rng(42)
        planes = rng.standard_normal((n_planes, dim)).astype(np.float64)
        planes_lit = F.array(*[
            F.array(*[F.lit(float(v)) for v in row]) for row in planes
        ])
        sketch = F.transform(
            planes_lit,
            lambda p: (F.zip_with(F.col(vec_col), p, lambda a, b: a * b)
                       .cast("array<double>")),
        )
        # sign bits string as bucket key
        bucket = F.array_join(
            F.transform(
                sketch,
                lambda prods: (F.aggregate(prods, F.lit(0.0), lambda a, x: a + x) > 0).cast("int").cast("string"),
            ),
            "",
        )
        vecs = vecs.withColumn("bucket", bucket)
        a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                        F.col("nrm").alias("na"), "bucket")
        b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                        F.col("nrm").alias("nb"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na"))
        b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))

    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = (dot / (F.col("na") * F.col("nb"))).alias("cosine")
    return pairs.select("id_a", "id_b", cos).filter(F.col("cosine") >= threshold)
