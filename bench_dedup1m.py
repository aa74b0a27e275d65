"""End-to-end ``dedup_corpus`` probe at 1M docs (round-4 verdict #5).

Every dedup component is benched separately (BENCH_r*, CC_PROBE); this runs
the ONE-CALL pipeline (exact → JVM minhash → LSH → Jaccard verify → CC →
keep) on a 1M-doc corpus with PLANTED duplicates, so any inter-stage
caching/shuffle surprise the component benches can't see shows up here.

Corpus: deterministic groups of 10 docs — member 0 is a base doc, member 1
an exact copy, member 2 a near-dup (one appended line → shingle Jaccard
≥0.8 for all but the tiniest docs), members 3..9 unique. So ~10% exact and
~10% near duplicates, a realistic training-data dup rate.

Reports per-stage walls (timed on the same session, each stage's input
cached so walls don't pyramid), the one-call total, and output invariants:

- keep-set is exact-duplicate-free (max sha256 group size == 1)
- every planted exact dup is gone; planted near-dups gone where the JVM
  verify put them at J >= threshold (cross-checked on a 2k-group sample
  against a Python shingle-set Jaccard oracle)

Usage: python bench_dedup1m.py [n_docs]   (default 1_000_000)
Writes BENCH/DEDUP1M_PROBE.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import functions as F
from solrutils_spark.session import get_spark
from solrutils_spark.corpus import _content_for
from solrutils_spark.operators.dedup import (
    dedup_corpus, dedup_exact_keep_first, lsh_candidate_pairs,
    minhash_signatures_jvm, near_dup_keep, verify_ngram_jaccard, _shingles)

n_docs = int(sys.argv[1])
K, THRESH, BANDS, PERM = 5, 0.8, 16, 64
spark = get_spark(app_name="dedup1m", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 8000, numPartitions=8).mapInPandas(lambda it: it, "id long").count()


def mark(name, sec):  # unbuffered per-stage progress so a tail shows where we are
    print(f"STAGE {name} {sec}", file=sys.stderr, flush=True)


def gen(batches):
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        texts = []
        for i in ids:
            i = int(i)
            member, src = i % 10, (i // 10) * 10
            if member == 1:                      # exact duplicate of the base
                texts.append(_content_for(src, 200))
            elif member == 2:                    # near duplicate: one appended line
                texts.append(_content_for(src, 200) + "\nplanted near dup line")
            else:
                texts.append(_content_for(i, 200))
        yield pd.DataFrame({"doc_id": ids, "text": texts})


t0 = time.perf_counter()
docs = (spark.range(0, n_docs, numPartitions=64)
        .mapInPandas(gen, "doc_id long, text string")
        .persist(StorageLevel.MEMORY_AND_DISK))  # serialized: 3 corpus-sized
        # caches coexist during one_call; the deser default OOMed 8g heap
n0 = docs.count()
stage = {"materialize_corpus": round(time.perf_counter() - t0, 2)}
mark("materialize_corpus", stage["materialize_corpus"])

# --- per-stage walls (inputs cached so stages don't re-pay upstream) ------
t0 = time.perf_counter()
exact = dedup_exact_keep_first(docs).persist(StorageLevel.MEMORY_AND_DISK)
n_exact = exact.count()
stage["exact_dedup"] = round(time.perf_counter() - t0, 2)
mark("exact_dedup", stage["exact_dedup"])

t0 = time.perf_counter()
sigs = minhash_signatures_jvm(exact, num_perm=PERM, shingle_k=K).persist()
sigs.count()
stage["jvm_signatures"] = round(time.perf_counter() - t0, 2)
mark("jvm_signatures", stage["jvm_signatures"])

t0 = time.perf_counter()
cand = lsh_candidate_pairs(sigs, bands=BANDS, max_bucket_size=10_000).persist()
n_cand = cand.count()
stage["lsh_pairs"] = round(time.perf_counter() - t0, 2)
mark("lsh_pairs", stage["lsh_pairs"])

t0 = time.perf_counter()
ver_reg = []  # shingle sets feed BOTH join sides — persist so they build once
ver = verify_ngram_jaccard(cand, exact, threshold=THRESH, shingle_k=K,
                           cache_registry=ver_reg).persist()
n_ver = ver.count()
stage["jaccard_verify"] = round(time.perf_counter() - t0, 2)
mark("jaccard_verify", stage["jaccard_verify"])
for c in ver_reg:
    c.unpersist(blocking=True)

t0 = time.perf_counter()
kept = near_dup_keep(exact, ver.select("id_a", "id_b")).filter(F.col("keep"))
n_kept = kept.count()
stage["cc_and_keep"] = round(time.perf_counter() - t0, 2)
mark("cc_and_keep", stage["cc_and_keep"])

# --- the one-call path, genuinely cold ------------------------------------
# the stage caches above MUST be dropped first: Spark's CacheManager does
# plan-fragment matching, so dedup_corpus's internal exact/signature/verify
# plans would silently resolve to the cached stage results (first run of
# this probe reported a 7.6 s "cold" one-call at 1M for exactly that reason)
for c in (exact, sigs, cand, ver):
    c.unpersist(blocking=True)
t0 = time.perf_counter()
reg = []  # dedup_corpus persists its intermediates into this for cleanup
out = dedup_corpus(docs, num_perm=PERM, bands=BANDS,
                   threshold=THRESH, shingle_k=K,
                   cache_registry=reg).persist(StorageLevel.MEMORY_AND_DISK)
n_onecall = out.count()  # timed wall includes the persist write (small)
one_call = round(time.perf_counter() - t0, 2)
mark("one_call", one_call)
for c in reg:
    c.unpersist(blocking=True)

# --- invariants (reuse the one-call result) -------------------------------
n_out = n_onecall
max_hash_group = (out.groupBy(F.sha2("text", 256)).count()
                  .agg(F.max("count")).first()[0])
# every planted exact dup (member 1) must be gone
exact_dup_survivors = out.filter((F.col("doc_id") % 10 == 1)).count()
# near-dup ground truth on a 2k-group sample via the Python oracle
sample = [(g * 10, g * 10 + 2) for g in range(2000)]
sample_ids = {i for p in sample for i in p}
texts = {r["doc_id"]: r["text"] for r in
         docs.filter(F.col("doc_id").isin(list(sample_ids))).collect()}
survived = {r["doc_id"] for r in
            out.filter(F.col("doc_id").isin(list(sample_ids))).collect()}
wrong = []
for a, b in sample:
    sa, sb = set(_shingles(texts[a], K)), set(_shingles(texts[b], K))
    j = len(sa & sb) / max(1, len(sa | sb))
    if j >= THRESH and (a in survived) == (b in survived) and a in survived:
        wrong.append((a, b, round(j, 3)))  # both kept despite J >= threshold

print("RESULT " + json.dumps({
    "n_docs": n0, "after_exact": n_exact, "lsh_candidates": n_cand,
    "verified_pairs": n_ver, "kept": n_kept, "one_call_kept": n_onecall,
    "final": n_out, "stages_sec": stage, "one_call_sec": one_call,
    "max_sha256_group": max_hash_group,
    "exact_dup_survivors": exact_dup_survivors,
    "sampled_nn_pairs_both_kept": wrong[:10],
    "sampled_nn_violations": len(wrong),
}))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER.replace("__REPO__", str(REPO)))
        path = f.name
    try:
        t0 = time.time()
        # stderr inherits (STAGE marks + Spark progress stay tail-able live);
        # stdout is captured for the RESULT line
        out = subprocess.run([sys.executable, path, str(n_docs)],
                             stdout=subprocess.PIPE, text=True, timeout=5400)
    finally:
        os.unlink(path)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
            result["total_wall_sec"] = round(time.time() - t0, 1)
            os.makedirs(REPO / "BENCH", exist_ok=True)
            with open(REPO / "BENCH" / "DEDUP1M_PROBE.json", "w") as fh:
                json.dump(result, fh, indent=2)
            print(json.dumps(result, indent=2))
            return
    raise RuntimeError(f"worker failed:\n{out.stdout[-3000:]}")


if __name__ == "__main__":
    main()
