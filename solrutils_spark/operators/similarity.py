"""Approximate-nearest-neighbor search over embedding columns.

Two paths, both returning exact cosine scores:

- :func:`cosine_topk_brute` — exhaustive cosine top-k, JVM-side arithmetic
  (``zip_with``/``aggregate`` column expressions — whole-stage codegen, no
  Python). The correctness baseline, and the right answer below ~10M rows.
- :func:`ivf_topk` — IVF-style: k-means-lite centroids (seeded sample,
  numpy), assign each vector to its nearest centroid (one narrow pass),
  probe only the ``n_probe`` closest centroids at query time. The 100 TB
  path: scan cost drops by ~n_centroids/n_probe, and the centroid assignment
  is a one-off narrow job persisted alongside the table.

Both paths share the exact rescoring epilogue — IVF only prunes candidates,
scores are identical cosines (recall < 1 is the documented trade).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.operators.util import _extend_schema


def _cosine_col(vec_col: str, qvec: list[float]):
    # float64 throughout — float32 element math diverges from the numpy/duckdb
    # oracle at ~1e-8
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    vnorm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    qn = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (vnorm * F.lit(qn))


def cosine_topk_brute(
    df: DataFrame, qvec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrderedAndProject."""
    scored = df.select(id_col, _cosine_col(vec_col, qvec).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# ------------------------------------------------------------------ IVF ----

def train_centroids(
    df: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample: int = 10_000, iters: int = 10, seed: int = 42,
    order_col: str | None = None,
) -> np.ndarray:
    """k-means on a seeded sample (driver-side numpy — centroids are tiny).

    Assignment uses the ‖x‖²+‖c‖²−2x·c expansion in row chunks, so memory is
    O(chunk × n_centroids) — never the (sample × centroids × dim) broadcast
    tensor (at 4k centroids × 768 dims that tensor is ~60 GB).

    ``order_col``: sort the sample by this column before ``limit`` — plain
    ``limit(sample)`` is NOT deterministic across partitionings/runs, so any
    caller that needs reproducible centroids (correctness entries, pinned
    tests) must pass it."""
    src = df.orderBy(order_col) if order_col is not None else df
    rows = src.select(vec_col).limit(sample).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = _assign_chunked(X, cents)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _assign_chunked(X: np.ndarray, cents: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """argmin_c ‖x−c‖² per row, bounded memory (chunk × centroids workspace)."""
    c_sq = (cents**2).sum(axis=1)  # (C,)
    out = np.empty(len(X), dtype=np.int64)
    for lo in range(0, len(X), chunk):
        xb = X[lo : lo + chunk]
        # ‖x−c‖² = ‖x‖² + ‖c‖² − 2x·c; ‖x‖² is constant per row → skip it
        d = c_sq[None, :] - 2.0 * (xb @ cents.T)
        out[lo : lo + chunk] = d.argmin(axis=1)
    return out


def assign_centroids(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``centroid_id`` (narrow mapInPandas pass; persist for reuse)."""
    cents = centroids.astype(np.float64)
    cols = df.columns
    schema = _extend_schema(df, "centroid_id", "int")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X):
                pdf["centroid_id"] = _assign_chunked(X, cents).astype(np.int32)
            else:
                pdf["centroid_id"] = np.array([], dtype=np.int32)
            yield pdf[cols + ["centroid_id"]]

    return df.mapInPandas(gen, schema)


def ivf_topk(
    assigned: DataFrame, centroids: np.ndarray, qvec: list[float], k: int = 10,
    n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Probe the n_probe nearest centroids only; exact cosine inside them.

    At scale `assigned` is written partitioned by centroid_id, so the filter
    below becomes partition pruning — the scan reads n_probe/n_centroids of
    the table.
    """
    q = np.asarray(qvec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d)[:n_probe]]
    cand = assigned.filter(F.col("centroid_id").isin(probe))
    scored = cand.select(id_col, _cosine_col(vec_col, qvec).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
