"""Host-scaling ceiling probe for the build kernel (no Spark).

Runs the EXACT per-segment kernel (analyze_series tokenize → numpy invert →
delta+VByte encode_many) in K independent OS processes and reports aggregate
throughput at K = 1, 2, 4, 8, 16. This separates HOST limits (shared memory
bandwidth / sustained-turbo budget of the sandbox) from ENGINE scaling: the
parallelism range where this probe is linear is the range where a Spark-level
efficiency number reflects the engine rather than the box.

Usage: python bench_host_ceiling.py [iters_per_proc]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def work(n_iter: int) -> float:
    import numpy as np
    import pandas as pd

    from solrutils_spark.functions.analyzer import analyze_series
    from solrutils_spark.index.codec import encode_many

    rng = np.random.default_rng(0)
    vocab = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(3, 10)))
        for _ in range(2000)
    ]
    texts = pd.Series(
        [" ".join(vocab[i] for i in rng.integers(0, 2000, size=300)) for _ in range(400)]
    )
    t0 = time.perf_counter()
    for _ in range(n_iter):
        toks = analyze_series(texts)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        doc_ids = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        dls = np.repeat(lens, lens).astype(np.int64)
        terms = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        flat = pd.DataFrame({"term": terms, "doc_id": doc_ids, "dl": dls})
        counted = (
            flat.groupby(["term", "doc_id"], sort=True)
            .agg(tf=("dl", "size"), dl=("dl", "first"))
            .reset_index()
        )
        uniq, cnt = __import__("numpy").unique(
            counted["term"].to_numpy(), return_counts=True
        )
        encode_many(
            cnt,
            counted["doc_id"].to_numpy("int64"),
            counted["tf"].to_numpy("int64"),
            counted["dl"].to_numpy("int64"),
        )
    return time.perf_counter() - t0


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    base = None
    for procs in (1, 2, 4, 8, 16):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(work, [iters] * procs)
            wall = time.perf_counter() - t0
        thr = procs * iters / wall
        if base is None:
            base = thr
        print(
            f"procs={procs:2d} wall={wall:6.2f}s aggregate={thr:7.2f} units/s "
            f"scaling_vs_1 = {thr / base:4.2f}x (ideal {procs}x)"
        )


if __name__ == "__main__":
    main()
