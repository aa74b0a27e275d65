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
from pyspark import StorageLevel
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


# Java-regex class equal to Python str.split()'s whitespace set: (?U) makes
# \s the Unicode White_Space property (vs ASCII-only default), and Python's
# str.isspace() additionally counts U+001C..U+001F (bidi classes B/S) which
# White_Space excludes. Pinned by test against Python .split() on both.
_WS_RE = r"(?U)[\s\x1c-\x1f]+"


def _tokens_col(text_col):
    """Python ``str.split()``-equivalent token array as a Column expression.

    Empty tokens are FILTERED, so boundary ``\\t/\\n/\\r`` (e.g. a trailing
    newline, ubiquitous in file-derived corpora) never injects an
    empty-string token (round 2 used ``F.trim`` — space-only — so such texts
    grew a phantom token that perturbed every shingle and let
    trailing-newline near-dups escape the verify stage), and the split class
    is Unicode-aware (``_WS_RE``: Java ``\\s`` is ASCII-only by default, so
    U+00A0 etc. would diverge from the Python oracle)."""
    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.filter(
        F.split(F.coalesce(t, F.lit("")), _WS_RE), lambda x: F.length(x) > 0
    )


def _shingles_from_tokens(toks, k: int):
    """Shingle array from an ALREADY-MATERIALIZED token-array column.

    ``toks`` must be a plain column reference (an attribute), not an inline
    expression: this builder references it ~5 times (three size() branches,
    the array_join, and the slice inside the transform lambda), and Catalyst
    substitutes expression trees textually — an inline ``filter(split(text))``
    here is re-evaluated per shingle INDEX, i.e. O(tokens²) per doc in
    interpreted (non-codegen) higher-order-function eval. The 1M probe
    measured that variant at 790 s (signatures) / 1,411 s (verify); with the
    tokens projected first both stages are O(tokens·k). Use
    :func:`_with_shingle_arr` on hot paths."""
    n = F.size(toks)
    return (
        F.when(n == 0, F.array().cast("array<string>"))
        .when(n < k, F.array(F.array_join(toks, " ")))
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
            )
        )
    )


def _shingles_col(text_col, k: int):
    """Column twin of :func:`_shingles` as a single inline expression.

    Kept for tests and tiny frames ONLY — the inline form re-evaluates the
    tokenizer per shingle index (see :func:`_shingles_from_tokens`); hot
    paths go through :func:`_with_shingle_arr`, which produces the identical
    strings (pinned by test_dedup_fuzz)."""
    return _shingles_from_tokens(_tokens_col(text_col), k)


def _with_shingle_arr(df: DataFrame, text_col: str, k: int, out_col: str) -> DataFrame:
    """``df`` + ``out_col`` = shingle array, with the token array materialized
    in its OWN projection so ``split``+``filter`` runs once per row.

    CollapseProject keeps the two projections separate because ``__toks`` is
    a non-cheap expression referenced multiple times by the shingle builder —
    pinned by a plan test so an optimizer change can't silently reintroduce
    the O(tokens²) inline shape."""
    tdf = df.withColumn("__toks", _tokens_col(text_col))
    return tdf.withColumn(out_col, _shingles_from_tokens(F.col("__toks"), k)).drop(
        "__toks"
    )


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
    """(id, signature array<long>) via vectorized minhash over word shingles.

    The whole Arrow batch's shingles are hashed in ONE vectorized FNV pass
    (:func:`hash_bytes_batch` — no per-token Python loop), then permuted in
    shingle-chunks with per-doc ``minimum.reduceat`` segment reduction, so
    peak memory is O(num_perm × chunk) regardless of batch size.
    """
    a, b = _minhash_params(num_perm)
    CHUNK = 8192  # (num_perm × CHUNK) modmul tiles stay cache-resident

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            n = len(texts)
            sh_lists = [_shingles(t, shingle_k) for t in texts]
            counts = np.fromiter((len(s) for s in sh_lists), dtype=np.int64, count=n)
            hv = _mod_mersenne(hash_bytes_batch([s for lst in sh_lists for s in lst]))
            sigs = np.full((n, num_perm), _MERSENNE, dtype=np.uint64)
            doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            for c0 in range(0, hv.size, CHUNK):
                hc = hv[c0 : c0 + CHUNK]
                dc = doc_of[c0 : c0 + CHUNK]
                # (a*h + b) mod p per permutation — same uint64 wrap semantics
                # as the scalar path (values pinned by golden test)
                vals = _mod_mersenne(a[:, None] * hc[None, :] + b[:, None])
                starts = np.flatnonzero(np.diff(dc, prepend=dc[0] - 1))
                part = np.minimum.reduceat(vals, starts, axis=1)  # (P, docs_in_chunk)
                docs_in_chunk = dc[starts]
                sigs[docs_in_chunk] = np.minimum(sigs[docs_in_chunk], part.T)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "signature": sigs.astype(np.int64).tolist()}
            )

    return df.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, signature array<long>")


_P61 = np.uint64(_MERSENNE)
_S61 = np.uint64(61)


def _mod_mersenne(x: np.ndarray) -> np.ndarray:
    """x % (2^61-1) via Mersenne folding — ~5 vector ops instead of numpy's
    per-element uint64 division (value-identical, pinned by the golden test)."""
    x = (x & _P61) + (x >> _S61)  # ≤ p + 7 after one fold
    return np.where(x >= _P61, x - _P61, x)


def hash_bytes(data: bytes) -> int:
    """Deterministic 64-bit hash (FNV-1a) — same everywhere, no PYTHONHASHSEED."""
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_bytes_batch(strings: list[str]) -> np.ndarray:
    """Vectorized FNV-1a over a batch of strings → uint64 array, value-equal
    to ``hash_bytes(s.encode('utf-8'))`` per element (pinned by test).

    Strings are length-sorted so byte-position j is processed over only the
    still-active suffix — total vector ops = total bytes (optimal), with no
    per-string or per-byte Python loop and no padded 2-D matrix.
    """
    n = len(strings)
    out = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0:
        return out
    enc = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    if int(lens.sum()) == 0:
        return out
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    order = np.argsort(-lens, kind="stable")  # longest first → active = prefix
    slens = lens[order]
    soffs = (np.cumsum(lens) - lens)[order]
    lmax = int(slens[0])
    # ends[j] = how many (sorted) strings still have a byte at position j
    ends = np.searchsorted(-slens, -np.arange(1, lmax + 1), side="right")
    h = out[order].copy()
    prime = np.uint64(0x100000001B3)
    for j in range(lmax):
        e = int(ends[j])
        if e == 0:
            break
        h[:e] = (h[:e] ^ flat[soffs[:e] + j].astype(np.uint64)) * prime
    out[order] = h
    return out


def minhash_signatures_jvm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """All-JVM minhash: shingle → ``xxhash64(shingle, seed=i)`` → per-doc min
    per seed. Zero Python in the pipeline — shingling, hashing, and the
    min-reduce are whole-stage-codegen Column expressions with map-side
    partial aggregation (ONE shuffle carrying num_perm longs per doc).

    This is the 100 TB default; :func:`minhash_signatures` keeps the
    FNV/Carter-Wegman kernel (golden-pinned values) for compatibility.
    Signature VALUES differ between the two (different hash family); LSH/
    verify semantics are identical — verified-pair outputs agree up to LSH
    recall, and both are deterministic.
    """
    # same shingle rule as _shingles(): <k tokens → one joined shingle; empty → none
    # Tokens are materialized in their own projection — the dominant cost of
    # the 790 s/900k-doc round-4 signature stage was the inline shingle
    # expression re-running split() per shingle index (O(tokens²)
    # interpreted eval), not the hashing.
    # Round 6: the shingle is hashed DIRECTLY as a token-array slice —
    # ``xxhash64(slice(toks, i+1, k))`` folds the k token strings through
    # the seeded hash chain, so the per-shingle join into a new string
    # (formerly ~30% of the signature stage: allocate + copy ~k·|token|
    # bytes per shingle) is gone. Identical token sequences still produce
    # identical hashes (what LSH recall relies on: signature equality is
    # decided by token content, pinned by test_dedup_fuzz partition/recall
    # suites); values differ from the string-hash layout — a hash-family
    # change, same as round 5's seed-derivation change.
    # The num_perm permutation values are derived by re-hashing the
    # resulting LONG with per-permutation seeds: 8-byte rehashes cost a
    # small constant vs re-scanning the shingle per permutation.
    tdf = df.select(id_col, _tokens_col(text_col).alias("__toks"))
    n = F.size(F.col("__toks"))
    # n ≥ k: shingles at offsets 0..n−k; 0 < n < k: slice truncates to the
    # whole array → ONE shingle (same rule as _shingles()); n = 0: none.
    hashes = F.when(n == 0, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0))),
            lambda i: F.xxhash64(F.slice(F.col("__toks"), i + 1, shingle_k)),
        )
    )
    exploded = tdf.select(id_col, F.explode_outer(hashes).alias("_h0"))
    sentinel = (1 << 63) - 1  # empty docs: all-sentinel signature
    aggs = [
        F.min(
            F.when(F.col("_h0").isNull(), F.lit(sentinel)).otherwise(
                F.xxhash64(F.col("_h0"), F.lit(i))
            )
        ).alias(f"_m{i}")
        for i in range(num_perm)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("signature"),
        )
    )


def simhash_signatures_jvm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All-JVM 64-bit SimHash: explode tokens → ``xxhash64`` → 64 bit-vote
    sums (map-side combined) → majority assemble. One shuffle, 65 longs per
    doc, no Python. Values differ from the FNV kernel (different token hash);
    hamming semantics are identical.
    """
    t = F.col(text_col)
    toks = F.filter(F.split(t, _WS_RE), lambda x: F.length(x) > 0)
    # hash PROJECTED once per token before the aggregation: the 64 bit-vote
    # agg expressions each reference the hash, and aggregate buffers don't
    # share subexpressions — inlining xxhash64 there recomputes it 64× per
    # token (measured at 50k docs/2.7M tokens: 5.4 s → 3.6 s projected)
    exploded = df.select(id_col, F.explode_outer(toks).alias("_tok")).select(
        id_col,
        F.when(F.col("_tok").isNull(), F.lit(None).cast("long"))
        .otherwise(F.xxhash64(F.col("_tok")))
        .alias("_h"),
    )
    h = F.col("_h")
    live = ~h.isNull()
    cnt = F.sum(F.when(live, 1).otherwise(0)).alias("_cnt")
    bit_aggs = [
        F.sum(
            F.when(live, F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1))).otherwise(0)
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    g = exploded.groupBy(id_col).agg(cnt, *bit_aggs)
    # majority vote per bit; bit 63 contributes -2^63 (two's complement) so the
    # assembled value stays in int64 without ANSI overflow
    sim = F.when(
        F.col("_b63") * 2 > F.col("_cnt"), F.lit(-(1 << 63)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    for i in range(63):
        sim = sim + F.when(
            F.col(f"_b{i}") * 2 > F.col("_cnt"), F.lit(1 << i)
        ).otherwise(F.lit(0))
    return g.select(id_col, sim.cast("long").alias("simhash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band-bucket join → candidate (id_a, id_b) pairs, a < b, deduped.

    Scale shape: explode to (band, band_hash, id) → self-join per bucket —
    the join key (band, band_hash) keeps the shuffle uniform; a band bucket
    with B ids produces B² pairs only inside that bucket.

    Every signature value participates: when ``bands`` does not divide
    ``num_perm`` the remainder is distributed one-extra-row to the first
    ``num_perm % bands`` bands (no silently dropped permutations).

    ``max_bucket_size``: skew guard for degenerate corpora (boilerplate /
    empty texts collapse into one bucket and a bucket of B ids emits B²
    join rows). Buckets larger than the cap are truncated to their
    ``max_bucket_size`` lowest ids (deterministic). This bounds any single
    bucket's pair output at cap² — the standard large-scale LSH-dedup
    mitigation; members dropped from an oversized bucket in one band can
    still pair through their other bands. ``None`` (default) = exact LSH.
    """
    num_perm_col = F.size("signature")
    base = (num_perm_col / bands).cast("int")       # floor rows per band
    rem = num_perm_col % bands                       # first `rem` bands get +1
    banded = signatures.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.xxhash64(
                        F.slice(
                            "signature",
                            band * base + F.least(band, rem) + 1,
                            base + F.when(band < rem, 1).otherwise(0),
                        ).cast("string"),
                        band,
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.band_hash")
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "band_hash").orderBy(F.col(id_col).asc())
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
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
    max_bucket_size: int | None = None,
    impl: str = "jvm",
    cache_registry: list | None = None,
) -> DataFrame:
    """Full MinHash+LSH pipeline → verified near-dup pairs with jaccard ≥ τ.

    ``impl='jvm'`` (default): all-JVM xxhash64 signatures — the 100 TB path.
    ``impl='py'``: FNV/Carter-Wegman Arrow kernel (golden-pinned values).
    Verified outputs agree up to LSH recall; both deterministic.

    At 100 TB set ``max_bucket_size`` (e.g. 10_000) — boilerplate corpora
    produce degenerate band buckets whose B² pair blow-up otherwise dominates
    the join (see :func:`lsh_candidate_pairs`).

    ``cache_registry``: the candidate-pair frame is referenced three times by
    the verify stage (two union legs of the id set + the final pair join);
    pass a list to persist it (and verify's shared shingle sets) so the
    signature+LSH chain runs once, not three times. Persisted frames are
    appended for caller-controlled ``unpersist()``.
    """
    sig_fn = minhash_signatures_jvm if impl == "jvm" else minhash_signatures
    sigs = sig_fn(df, text_col, id_col, num_perm, shingle_k)
    cands = lsh_candidate_pairs(sigs, bands, id_col, max_bucket_size)
    if cache_registry is not None:
        cands = cands.persist()
        cache_registry.append(cands)
    else:
        # the verify stage references the candidate frame three times (two
        # id-set union legs + the final pair join); without a cache the
        # whole signature+LSH chain re-executes per reference (exchange
        # reuse recovers only part of it — measured 11.1 s vs 8.9 s cached
        # at 50k docs). localCheckpoint persists the bounded candidate
        # pairs WITHOUT a session-lifetime CacheManager entry: the blocks
        # are freed by the ContextCleaner once the result goes out of
        # scope, so one-shot callers get the cache and long-lived sessions
        # don't leak it (same rationale as assign_doc_ids' no-registry
        # path).
        cands = cands.localCheckpoint(eager=False)
    return verify_ngram_jaccard(
        cands, df, text_col, id_col, threshold, shingle_k, cache_registry
    )


# -------------------------------------------------------------- simhash ----

def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized bit-vote).

    All tokens of the Arrow batch are hashed in one vectorized FNV pass
    (:func:`hash_bytes_batch`); per-doc bit votes use segment reduction
    (``add.reduceat`` on doc boundaries) — no per-token Python anywhere.

    Note (round-2 fix): votes are counted in SIGNED arithmetic. The round-1
    kernel computed ``bits.sum()*2 - T`` in uint64, so negative votes wrapped
    to huge positives and nearly every bit was set — degenerate signatures
    that made unrelated docs collide at hamming 0. A bit is now set iff
    strictly more than half the tokens have it set (true majority vote).
    """
    CHUNK = 16384  # bit-matrix tiles stay cache-resident

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        powers = (np.uint64(1) << bit_idx).astype(np.uint64)
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            n = len(texts)
            tok_lists = [t.split() for t in texts]
            counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
            hv = hash_bytes_batch([t for toks in tok_lists for t in toks])
            ones = np.zeros((n, 64), dtype=np.int64)  # per-doc set-bit counts
            doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            for c0 in range(0, hv.size, CHUNK):
                hc = hv[c0 : c0 + CHUNK]
                dc = doc_of[c0 : c0 + CHUNK]
                # LSB-first unpack: column i == (h >> i) & 1 (C-speed bit expand)
                bits = np.unpackbits(
                    hc.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                )
                starts = np.flatnonzero(np.diff(dc, prepend=dc[0] - 1))
                ones[dc[starts]] += np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
            # bit set where votes = 2*ones - T > 0 (same rule as scalar path);
            # empty docs have all-zero ones → simhash 0
            mask = (2 * ones) > counts[:, None]
            sims = (mask.astype(np.uint64) * powers[None, :]).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sims})

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
    # hamming filter BEFORE the dedup: bit_count is a cheap per-row JVM
    # expression evaluated map-side on the join output, so the distinct's
    # exchange carries only the SURVIVING pairs instead of every
    # bucket-collision pair (on boilerplate corpora collisions ≫ survivors;
    # output identical — hamming is a function of the pair, so deduping
    # (id_a, id_b, hamming) equals deduping (id_a, id_b, sh_a, sh_b) first)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["blk", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# ------------------------------------------------------ cluster resolve ----

def dedup_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    driver_edge_threshold: int = 2_000_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-dup cluster resolution: candidate pairs → (id, cluster_id) with
    cluster_id = MIN doc_id of the connected component — the keep/drop
    decision a training-data pipeline actually consumes (the reference's
    unique-key dedup keeps one doc per key, BulkUpdateHandler.java:105
    addDocument-with-unique-key semantics generalized to near-dup graphs).

    Two exact-same-output paths, picked by measured edge count:

    - **small graphs** (≤ ``driver_edge_threshold`` distinct undirected
      edges; 2M edges ≈ 32 MB of int64 — trivially driver-sized): collect
      the edge list and run union-find with path compression. The iterative
      Spark loop costs ~1s of fixed scheduler/shuffle floor PER ROUND
      regardless of data size (measured: 6s for a 9k-edge graph), while
      union-find on the same graph is microseconds. Same min-label result.
    - **large graphs**: iterative min-label propagation PLUS pointer jumping
      (label ← label of label) per round → O(log diameter) rounds, each one
      join+agg. Convergence via the monotone-decreasing label sum. Each
      round ends in an EAGER ``localCheckpoint``: measured (rounds 2 AND 3)
      that both non-eager checkpoints and plan-level ``persist`` get
      re-planned per action under AQE and recompute the whole label chain
      (persist variant: 39s vs 6s on the same graph) — the extra checkpoint
      job per round is the cheaper, predictable cost.

    Only ids that appear in ``pairs`` are returned — resolve singletons with
    :func:`near_dup_keep`. Degenerate self-pairs ``(a, a)`` yield a singleton
    cluster ``(a, a)`` on BOTH paths (LSH generators never emit them, but the
    paths must be output-identical on all inputs). Set
    ``driver_edge_threshold=0`` to force the distributed path (tests do, to
    exercise it on adversarial chains).
    """
    edges = (
        pairs.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
        .union(pairs.select(F.col("id_b").alias("x"), F.col("id_a").alias("y")))
        .distinct()
        .persist()
    )
    # threshold + collect both operate on the x<=y half: distinct UNDIRECTED
    # edges (self-pairs count once), so the documented threshold and the
    # collected volume agree (round-3 advice: counting the bidirectional
    # list engaged the driver path at half the documented graph size)
    half = edges.filter(F.col("x") <= F.col("y"))
    n_edges = half.count()  # also materializes the edges cache for the loop
    if stats_out is not None:  # observability: path + rounds, for evidence runs
        stats_out["n_edges"] = n_edges
        stats_out["path"] = "driver" if n_edges <= driver_edge_threshold else "distributed"
    if n_edges <= driver_edge_threshold:
        # Arrow both ways (round 6): toPandas() ships the edge list as Arrow
        # batches and createDataFrame(pandas) ships the labels back the same
        # way — the row-pickled collect() + parallelize of 2×|V| python
        # tuples was ~40% of this operator's wall at 50k docs
        pdf = half.toPandas()
        spark = pairs.sparkSession
        edges.unpersist()
        parent: dict[int, int] = {}

        def find(a: int) -> int:
            root = a
            while parent[root] != root:
                root = parent[root]
            while parent[a] != root:  # path compression
                parent[a], a = root, parent[a]
            return root

        for x, y in zip(pdf["x"].tolist(), pdf["y"].tolist()):
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by min keeps the invariant root == min(label so far)
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        out = pd.DataFrame(
            {id_col: list(parent), "cluster_id": [find(i) for i in parent]}
        ).astype({id_col: "int64", "cluster_id": "int64"})
        return spark.createDataFrame(out, f"{id_col} long, cluster_id long")
    labels = (
        edges.select(F.col("x").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    prev_sum = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("y"), F.col("label").alias("ylab")), "y"
            )
            .groupBy("x")
            .agg(F.min("ylab").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["x"], "left").select(
            labels["id"],
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        jump = stepped.select(F.col("id").alias("pid"), F.col("label").alias("plab"))
        labels = (
            stepped.join(jump, stepped["label"] == jump["pid"], "left")
            .select(
                stepped["id"],
                F.least(stepped["label"], F.coalesce("plab", stepped["label"])).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        s = labels.agg(F.sum("label")).collect()[0][0]
        if s == prev_sum:  # labels only decrease → fixpoint reached
            break
        prev_sum = s
    if stats_out is not None:
        stats_out["rounds"] = rounds
    edges.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def near_dup_keep(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """df + (cluster_id, keep): keep = the lowest-id member of each near-dup
    cluster; docs in no pair form their own cluster and are kept."""
    comp = dedup_clusters(pairs, id_col)
    out = df.join(comp, id_col, "left")
    return out.withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    ).withColumn("keep", F.col(id_col) == F.col("cluster_id"))


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    exact: bool = True,
    near: bool = True,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    shingle_k: int = 5,
    max_bucket_size: int | None = 10_000,
    cache_registry: list | None = None,
) -> DataFrame:
    """ONE-CALL training-data dedup: exact (sha256 hash-groupBy, lowest id
    kept) → MinHash+LSH near-dup pairs (all-JVM signatures, capped buckets) →
    exact-Jaccard verify (JVM) → connected components → keep the lowest-id
    member per cluster. Returns the surviving rows of ``df``.

    This is the operator a 100 TB pipeline actually calls; every stage is a
    bounded-shuffle DataFrame transform (see the per-stage docstrings).

    Intermediates ARE persisted: the exact-dedup frame is consumed by the
    signature build, both verify join sides, and the final keep join —
    without a cache one action recomputes the full corpus window ~4× (the 1M
    probe's cold one-call ran >80 min uncached vs minutes cached). Pass
    ``cache_registry`` (a list) to receive the persisted frames and
    ``unpersist()`` them when the RESULT has been materialized; with the
    default ``None`` they stay cached for the session (MEMORY_AND_DISK, sized
    by the deduped corpus + candidate pairs)."""
    registry = cache_registry if cache_registry is not None else []
    out = dedup_exact_keep_first(df, text_col, id_col) if exact else df
    if near:
        # corpus-sized → SERIALIZED memory+disk: the deserialized default
        # holds JVM string objects (~2-3x the bytes) and OOMed an 8 GB
        # driver at 1M docs once the probe's own caches coexisted with it
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        registry.append(out)
        pairs = minhash_dedup_pairs(
            out, text_col, id_col,
            num_perm=num_perm, bands=bands, threshold=threshold,
            shingle_k=shingle_k, max_bucket_size=max_bucket_size,
            cache_registry=registry,
        )
        out = (
            near_dup_keep(out, pairs.select("id_a", "id_b"), id_col)
            .filter(F.col("keep"))
            .drop("cluster_id", "keep")
        )
    return out


# -------------------------------------------------------- ngram jaccard ----

def verify_ngram_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle SETS for candidate pairs — all JVM.

    Shingling is the materialized-token path (:func:`_with_shingle_arr`);
    |A∩B| / |A∪B| is ``array_intersect``/``array_union`` size arithmetic
    (both dedup, matching the Python set semantics; empty∪empty → 1.0).

    Shingle arrays are computed ONLY for docs that appear in a candidate
    pair (semi-join first): candidates ≪ corpus at scale, and the 1M probe
    measured the compute-sets-for-everyone variant at 1,411 s — the whole
    stage was shingling 900k docs to verify 100k pairs. No Python anywhere
    in the verify stage (round-1 ran a per-pair Python set-ops loop).

    ``sets`` feeds BOTH sides of the pair join, so without a cache the whole
    upstream chain (corpus scan → semi-join → shingling — and, called from
    :func:`dedup_corpus`, the exact-dedup window and the LSH candidate
    generation too) executes twice. Pass ``cache_registry`` (a list) to
    persist it; the persisted DataFrame is appended for caller-controlled
    ``unpersist()``."""
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sets = _with_shingle_arr(
        df.join(cand_ids, id_col, "leftsemi"), text_col, shingle_k, "_sh_arr"
    ).select(F.col(id_col), F.array_distinct(F.col("_sh_arr")).alias("_sset"))
    if cache_registry is not None:
        # candidate-restricted but shingle arrays are fat → serialized level
        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(sets)
    a = sets.select(F.col(id_col).alias("id_a"), F.col("_sset").alias("_sa"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("_sset").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


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
        # ship the plane matrix via a broadcast variable into an Arrow-batched
        # kernel: one (batch × dim) @ (dim × planes) matmul per batch. (Round 2
        # inlined the matrix as nested F.lit arrays — an O(n_planes × dim)
        # LITERAL in the plan; 64 planes × 1024 dims is a ~65k-literal plan
        # that bloats analysis and breaks plan caching.)
        planes_bc = df.sparkSession.sparkContext.broadcast(planes)

        def sketch_gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            P = planes_bc.value
            for pdf in batches:
                if len(pdf):
                    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                    signs = (X @ P.T) > 0
                    pdf = pdf.assign(
                        bucket=[
                            "".join("1" if b else "0" for b in row) for row in signs
                        ]
                    )
                else:
                    pdf = pdf.assign(bucket=pd.Series(dtype="object"))
                yield pdf
        vecs = vecs.mapInPandas(
            sketch_gen,
            f"{id_col} long, {vec_col} array<double>, nrm double, bucket string",
        )
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
