"""E5 — block-max TAAT top-k kernel (numpy, prune-only ⇒ rank-identical).

The reference's ranked retrieval is Lucene's BooleanQuery + BM25 TopDocs
collector with block-max WAND skipping (Lucene 8 BMW / the public block-max
WAND literature). This kernel is the vectorized term-at-a-time variant:

- terms are processed rare→hot (df ascending); accumulators are sorted
  (doc_id, partial score) arrays merged with ``searchsorted``/``reduceat`` —
  no Python per-posting loops;
- before decoding a block of term *t* we check the certificate::

      max(best accumulated score inside the block's doc range, 0)
        + block_upper_bound(t)                      ← from block_max_tf/min_dl
        + Σ upper bounds of not-yet-processed terms
      < θ   (θ = current k-th best accumulated score)

  Any doc in a skipped block finishes strictly below θ, and θ can only grow
  toward the true k-th final score — so skipping never changes the top-k set,
  scores, or tie-breaks (exactness guard; pinned by test_wand.py comparing
  against exhaustive scoring on every reference query).

The kernel runs per salt-slice (a doc_id range of the whole index) inside
``applyInPandas``; slices are independent, so top-k is embarrassingly
parallel and the driver only merges len(slices)·k candidate rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from solrutils_spark.functions.analyzer import B, K1
from solrutils_spark.index.codec import BLOCK, decode_block


def _tf_norm_bound(max_tf: np.ndarray, min_dl: np.ndarray, avgdl: float) -> np.ndarray:
    mt = max_tf.astype(np.float64)
    return mt / (mt + K1 * (1.0 - B + B * min_dl.astype(np.float64) / avgdl))


def topk_slice(
    term_rows: pd.DataFrame,
    idf_by_term: dict[str, float],
    avgdl: float,
    k: int,
    use_wand: bool = True,
    allowed_docs: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Score one salt-slice. ``term_rows``: one row per (term) with encoded
    postings (this slice's doc range). Returns (doc_ids, scores) of the
    slice-local top-k, tie-broken (score desc, doc_id asc).

    ``allowed_docs``: optional sorted int64 array — P2 filter semantics
    (restricts candidates, never contributes to score). Disables pruning.
    """
    if allowed_docs is not None:
        use_wand = False

    order = np.lexsort(
        (term_rows["term"].to_numpy(), term_rows["df_part"].to_numpy())
    )  # df asc, term asc tie-break — deterministic processing order
    rows = term_rows.iloc[order]

    ubs = []
    for row in rows.itertuples(index=False):
        idf = idf_by_term[row.term]
        bb = _tf_norm_bound(
            np.asarray(row.block_max_tf), np.asarray(row.block_min_dl), avgdl
        )
        ubs.append(idf * bb.max() if len(bb) else 0.0)
    ubs = np.asarray(ubs, dtype=np.float64)
    remaining_after = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]]) if len(ubs) else ubs

    acc_docs = np.empty(0, dtype=np.int64)
    acc_scores = np.empty(0, dtype=np.float64)
    theta = -np.inf

    for t_idx, row in enumerate(rows.itertuples(index=False)):
        idf = idf_by_term[row.term]
        payload = np.frombuffer(row.payload, dtype=np.uint8)
        block_offset = np.asarray(row.block_offset, dtype=np.int32)
        block_last = np.asarray(row.block_last, dtype=np.int64)
        n = int(row.df_part)
        n_blocks = len(block_offset)
        prev_lasts = np.empty(n_blocks, dtype=np.int64)
        prev_lasts[0] = int(row.first_doc) - 1
        prev_lasts[1:] = block_last[:-1]

        if use_wand and np.isfinite(theta):
            block_ub = idf * _tf_norm_bound(
                np.asarray(row.block_max_tf), np.asarray(row.block_min_dl), avgdl
            )
            # range-max of acc inside each block's (prev_last, last] doc range
            left = np.searchsorted(acc_docs, prev_lasts, side="right")
            right = np.searchsorted(acc_docs, block_last, side="right")
            max_acc = np.zeros(n_blocks, dtype=np.float64)
            nonempty = right > left
            if nonempty.any() and acc_scores.size:
                for bi in np.flatnonzero(nonempty):  # ≤ n_blocks iterations
                    max_acc[bi] = acc_scores[left[bi] : right[bi]].max()
            keep = np.maximum(max_acc, 0.0) + block_ub + remaining_after[t_idx] >= theta
        else:
            keep = np.ones(n_blocks, dtype=bool)

        new_docs_parts, contrib_parts = [], []
        for bi in np.flatnonzero(keep):
            d, tf, dl = decode_block(payload, n, int(bi), block_offset, int(prev_lasts[bi]))
            tfv = tf.astype(np.float64)
            contrib = idf * tfv / (tfv + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))
            new_docs_parts.append(d)
            contrib_parts.append(contrib)
        if not new_docs_parts:
            continue
        nd = np.concatenate(new_docs_parts)
        nc = np.concatenate(contrib_parts)
        if allowed_docs is not None:
            pos = np.searchsorted(allowed_docs, nd)
            ok = (pos < allowed_docs.size) & (allowed_docs[np.minimum(pos, allowed_docs.size - 1)] == nd)
            nd, nc = nd[ok], nc[ok]
            if nd.size == 0:
                continue

        # stable sorted merge: acc first so a doc's running sum accumulates in
        # fixed (processing) order — deterministic floats
        all_docs = np.concatenate([acc_docs, nd])
        all_scores = np.concatenate([acc_scores, nc])
        order2 = np.argsort(all_docs, kind="mergesort")
        sd = all_docs[order2]
        ss = all_scores[order2]
        boundaries = np.empty(sd.size, dtype=bool)
        boundaries[0] = True
        boundaries[1:] = sd[1:] != sd[:-1]
        starts = np.flatnonzero(boundaries)
        acc_docs = sd[starts]
        acc_scores = np.add.reduceat(ss, starts)

        if acc_docs.size >= k:
            theta = np.partition(acc_scores, acc_scores.size - k)[acc_scores.size - k]

    if acc_docs.size == 0:
        return acc_docs, acc_scores
    take = min(k, acc_docs.size)
    sel = np.lexsort((acc_docs, -acc_scores))[:take]
    return acc_docs[sel], acc_scores[sel]
