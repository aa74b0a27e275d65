"""Distributed connected-components evidence at ≥10M edges (verdict #5).

The driver union-find fast path hides the Spark loop below 2M edges; the
O(log diameter) pointer-jumping claim above it was tested for correctness
but never measured at a size where it actually engages. This bench builds a
deterministic ~10.1M-edge graph with the three adversarial shapes:

- 200 chains x 25,000 nodes  (5.0M edges, diameter 25k → pointer jumping
  must converge in ~log2(25k) ≈ 15 rounds, not 25k)
- 100,000 cliques of 10      (4.5M edges — wide, shallow)
- 600,000 pseudo-random edges over a 1M-node id space (mixed components)

and runs the DISTRIBUTED path (threshold=0), reporting rounds + wall.
Output is spot-checked: every sampled chain/clique node must carry its
component's min id, and the labels of the whole random-edge subgraph are
compared against a driver union-find on the same edges (exact match).

Usage: python bench_cc.py            Writes BENCH/CC_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solrutils_spark.session import get_spark  # noqa: E402

N_CHAINS, CHAIN_LEN = 200, 25_000
N_CLIQUES, CLIQUE_SIZE = 100_000, 10
N_RANDOM = 600_000
CLIQUE_BASE, RANDOM_BASE, RANDOM_SPACE = 10_000_000, 20_000_000, 1_000_000


def build_edges(spark):
    from pyspark.sql import functions as F

    chain = (
        spark.range(0, N_CHAINS * (CHAIN_LEN - 1), numPartitions=64)
        .select(
            ((F.col("id") % N_CHAINS) * CHAIN_LEN
             + F.floor(F.col("id") / N_CHAINS)).cast("long").alias("id_a"))
        .withColumn("id_b", F.col("id_a") + 1)
    )
    pairs = [(i, j) for i in range(CLIQUE_SIZE) for j in range(i + 1, CLIQUE_SIZE)]
    pair_df = spark.createDataFrame(pairs, "i int, j int")
    clique = (
        spark.range(0, N_CLIQUES, numPartitions=32)
        .crossJoin(F.broadcast(pair_df))
        .select(
            (F.lit(CLIQUE_BASE) + F.col("id") * CLIQUE_SIZE + F.col("i")).alias("id_a"),
            (F.lit(CLIQUE_BASE) + F.col("id") * CLIQUE_SIZE + F.col("j")).alias("id_b"),
        )
    )
    rand = (
        spark.range(0, N_RANDOM, numPartitions=32)
        .select(
            (F.lit(RANDOM_BASE)
             + (F.col("id") * 2654435761) % RANDOM_SPACE).alias("id_a"),
            (F.lit(RANDOM_BASE)
             + (F.col("id") * 40503 + 7919) % RANDOM_SPACE).alias("id_b"),
        )
    )
    return chain.union(clique).union(rand)


def main() -> None:
    import random

    from pyspark.sql import functions as F

    from solrutils_spark.operators.dedup import dedup_clusters

    spark = get_spark(app_name="bench-cc", master="local[16]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 16000, numPartitions=16).mapInPandas(lambda it: it, "id long").count()

    pairs = build_edges(spark).persist()
    n_pairs = pairs.count()
    stats: dict = {}
    t0 = time.perf_counter()
    labels = dedup_clusters(pairs, driver_edge_threshold=0, max_iter=40,
                            stats_out=stats)
    labels = labels.persist()
    n_nodes = labels.count()
    wall = round(time.perf_counter() - t0, 3)

    # --- spot-checks -----------------------------------------------------
    rng = random.Random(99)
    probes = []
    for c in rng.sample(range(N_CHAINS), 5):  # chain → min id = chain base
        base = c * CHAIN_LEN
        probes += [(base + off, base) for off in
                   (0, 1, CHAIN_LEN // 2, CHAIN_LEN - 1)]
    for c in rng.sample(range(N_CLIQUES), 5):
        base = CLIQUE_BASE + c * CLIQUE_SIZE
        probes += [(base + off, base) for off in (0, 3, CLIQUE_SIZE - 1)]
    probe_ids = [p[0] for p in probes]
    got = {r["doc_id"]: r["cluster_id"]
           for r in labels.filter(F.col("doc_id").isin(probe_ids)).collect()}
    chain_clique_ok = all(got.get(i) == want for i, want in probes)

    # random subgraph: exact match vs driver union-find on the same edges
    redges = [(r["id_a"], r["id_b"]) for r in
              pairs.filter(F.col("id_a") >= RANDOM_BASE).collect()]
    parent: dict[int, int] = {}

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for x, y in redges:
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    want_rand = {i: find(i) for i in parent}
    got_rand = {r["doc_id"]: r["cluster_id"]
                for r in labels.filter(F.col("doc_id") >= RANDOM_BASE).collect()}
    random_ok = got_rand == want_rand

    result = {
        "n_edges_input": n_pairs,
        "n_edges_undirected_distinct": stats.get("n_edges"),
        "n_nodes": n_nodes,
        "path": stats.get("path"),
        "rounds": stats.get("rounds"),
        "wall_sec": wall,
        "max_diameter": CHAIN_LEN,
        "chain_clique_spotcheck_ok": chain_clique_ok,
        "random_subgraph_exact_match": random_ok,
        "random_subgraph_nodes": len(want_rand),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/CC_PROBE.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
