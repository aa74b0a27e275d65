"""IVF-ANN scale evidence (round-4 verdict #4).

entry:ann_cosine exercises brute force at sf0.1 (6k vectors); this bench
pins the path that makes 100 TB feasible: at ≥1M synthetic vectors,
IVF (centroid-probe, table written partitioned by centroid_id so the probe
filter is PARTITION PRUNING at the scan) must beat brute-force wall time,
with recall@10 measured against the brute answer — exact cosine within the
probed cells, so recall < 1 comes only from cells not probed.

The probe-count knob: ``n_probe`` of ``n_centroids`` cells are scanned, so
cost scales ~n_probe/n_centroids and recall rises with n_probe. This bench
sweeps n_probe ∈ {1, 2, 4, 8} of 64 centroids to show the trade.

Vectors: 64-dim float, drawn deterministically (per-partition seeds) from
32 Gaussian clusters — the clustered geometry real embedding tables have
(uniform vectors would make every cell equidistant and IVF pointless).
Queries: 8 cluster centers perturbed with seeded noise.

Usage: python bench_ann.py [n_vectors]   (default 1_000_000)
Writes BENCH/ANN_PROBE.json.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solrutils_spark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 32
N_CENTROIDS = 64
K = 10


def synth_vectors(spark, n: int, partitions: int = 64):
    """Deterministic clustered vectors: cluster = id % 32, vec = center +
    N(0, 0.35) noise seeded per partition."""
    rng0 = np.random.default_rng(4242)
    centers = rng0.normal(0, 1, size=(N_CLUSTERS, DIM))

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1_000_003 + int(ids[0]) if len(ids) else 0)
            noise = rng.normal(0, 0.35, size=(len(ids), DIM))
            vecs = centers[ids % N_CLUSTERS] + noise
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [v.astype(np.float32).tolist() for v in vecs],
            })

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, "vec_id long, embedding array<float>"),
        centers,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pyspark.sql import functions as F

    from solrutils_spark.operators.similarity import (
        assign_centroids, cosine_topk_brute, ivf_topk, train_centroids)

    spark = get_spark(app_name="bench-ann", master="local[16]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="bench_ann_")
    atexit.register(lambda: shutil.rmtree(base, ignore_errors=True))

    vecs, centers = synth_vectors(spark, n)
    t0 = time.perf_counter()
    vecs.write.mode("overwrite").parquet(base + "/vectors.parquet")
    gen_sec = round(time.perf_counter() - t0, 3)
    table = spark.read.parquet(base + "/vectors.parquet")

    # one-off IVF build (reported, not amortized away): train + assign +
    # write partitioned by centroid_id — at scale this is the ingest-side
    # cost paid once per table, like building any secondary index
    t0 = time.perf_counter()
    cents = train_centroids(table, n_centroids=N_CENTROIDS, sample=20_000)
    assign_centroids(table, cents).write.mode("overwrite").partitionBy(
        "centroid_id").parquet(base + "/ivf.parquet")
    build_sec = round(time.perf_counter() - t0, 3)
    ivf_table = spark.read.parquet(base + "/ivf.parquet")

    rngq = np.random.default_rng(77)
    queries = [
        (centers[i % N_CLUSTERS] + rngq.normal(0, 0.2, DIM)).tolist()
        for i in range(8)
    ]

    # warm both plan shapes untimed (symmetric with bench.py methodology)
    cosine_topk_brute(table, queries[0], K).collect()
    ivf_topk(ivf_table, cents, queries[0], K, n_probe=1).collect()

    brute_truth, brute_times = [], []
    for q in queries:
        t0 = time.perf_counter()
        rows = cosine_topk_brute(table, q, K).collect()
        brute_times.append(time.perf_counter() - t0)
        brute_truth.append({r["vec_id"] for r in rows})

    sweep = {}
    for n_probe in (1, 2, 4, 8):
        times, hits = [], 0
        for q, truth in zip(queries, brute_truth):
            t0 = time.perf_counter()
            rows = ivf_topk(ivf_table, cents, q, K, n_probe=n_probe).collect()
            times.append(time.perf_counter() - t0)
            hits += len({r["vec_id"] for r in rows} & truth)
        sweep[n_probe] = {
            "mean_sec": round(sum(times) / len(times), 3),
            "recall_at_10": round(hits / (K * len(queries)), 4),
        }

    result = {
        "n_vectors": n,
        "dim": DIM,
        "n_centroids": N_CENTROIDS,
        "gen_sec": gen_sec,
        "ivf_build_sec": build_sec,
        "brute_mean_sec": round(sum(brute_times) / len(brute_times), 3),
        "ivf_sweep": sweep,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ANN_PROBE.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
