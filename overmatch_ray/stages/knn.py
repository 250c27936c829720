"""Similarity search over an embedding column (list<float>).

- **Brute-force cosine top-k** (the exactness baseline): the query matrix is
  broadcast ONCE with ``ray.put``; each corpus batch computes a numpy
  matmul against it and emits only its batch-local top-k per query
  (partial reduction), then a small ``groupby(query_id)`` merges partials
  into the global top-k. Shuffle volume is O(queries × k × blocks), never
  O(corpus).
- **Hyperplane-LSH bucketed variant** (the scale path): corpus and queries
  are keyed by sign-pattern buckets of R random hyperplanes (deterministic
  seed); only same-bucket (and optional multi-probe) candidates are scored.
  Approximate — recall measured against brute force in tests.
- **embedding near-dup pairs**: same bucketing, exact cosine verify ≥
  threshold inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-ish copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    d = offsets[1] - offsets[0] if len(offsets) > 1 else 0
    return flat.reshape(len(offsets) - 1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def brute_force_topk(
    corpus_ds,
    queries: pa.Table,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact cosine top-k of each query against the corpus Dataset."""
    import ray

    qm = _normalize(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[id_col].to_numpy(zero_copy_only=False))
    qref = ray.put((qids, qm))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(qref)
        cm = _normalize(_to_matrix(batch[vec_col]))
        cids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        sims = qm_ @ cm.T  # (nq, nb)
        if exclude_self:
            sims[qids_[:, None] == cids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        # rank with the final (cos desc, neighbor_id asc) tie-break so ties
        # at the k-th score are not dropped batch-locally
        order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims), axis=1)[:, :kk]
        rows_q = np.repeat(qids_, kk)
        rows_n = cids[order.ravel()]
        rows_s = np.take_along_axis(sims, order, axis=1).ravel()
        m = np.isfinite(rows_s)
        return pa.table(
            {
                "query_id": pa.array(rows_q[m]),
                "neighbor_id": pa.array(rows_n[m]),
                "cos_sim": pa.array(rows_s[m]),
            }
        )

    partials = corpus_ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cos_sim"] = np.round(g["cos_sim"], 6)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# --- hyperplane LSH --------------------------------------------------------


def _hyperplanes(d: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, d))


def _bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits @ (1 << np.arange(planes.shape[0]))).astype(np.int64)


def lsh_topk(
    corpus_ds,
    queries: pa.Table,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Approximate top-k: score only corpus vectors whose hyperplane bucket
    matches the query's (single-probe). Recall vs brute force is measured in
    tests; multi-probe = lower n_planes or repeat with shifted seeds."""
    import ray

    qm = _normalize(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[id_col].to_numpy(zero_copy_only=False))
    d = qm.shape[1]
    planes = _hyperplanes(d, n_planes)
    qbuck = _bucket_ids(qm, planes)
    qref = ray.put((qids, qm, qbuck, planes))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qm_, qbuck_, planes_ = ray.get(qref)
        cm = _normalize(_to_matrix(batch[vec_col]))
        cids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        cbuck = _bucket_ids(cm, planes_)
        out_q, out_n, out_s = [], [], []
        # group corpus rows by bucket, score each query only against its bucket
        order = np.argsort(cbuck, kind="stable")
        sorted_b = cbuck[order]
        for qi in range(qids_.shape[0]):
            lo = np.searchsorted(sorted_b, qbuck_[qi], side="left")
            hi = np.searchsorted(sorted_b, qbuck_[qi], side="right")
            if lo == hi:
                continue
            cand = order[lo:hi]
            cand = cand[cids[cand] != qids_[qi]]
            if cand.size == 0:
                continue
            sims = cm[cand] @ qm_[qi]
            kk = min(k, sims.size)
            top = np.lexsort((cids[cand], -sims))[:kk]
            out_q.append(np.full(kk, qids_[qi]))
            out_n.append(cids[cand[top]])
            out_s.append(sims[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = corpus_ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cos_sim"] = np.round(g["cos_sim"], 6)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def near_dup_embeddings(
    corpus_ds,
    threshold: float = 0.98,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 5000,
):
    """Pairs with cosine ≥ threshold, bucketed by hyperplane signs and
    verified exactly within buckets (high-cosine pairs almost always share
    a bucket at small n_planes).

    TRADE-OFF: a bucket larger than ``max_bucket`` is skipped (its all-pairs
    matrix would be quadratic) — a corpus dominated by one near-duplicate
    cluster needs a larger cap or the exact broadcast variant
    (pipelines.corpus_queries.q_embedding_neardup)."""

    def explode(batch: pa.Table) -> pa.Table:
        cm = _normalize(_to_matrix(batch[vec_col]))
        cids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        planes = _hyperplanes(cm.shape[1], n_planes)
        buck = _bucket_ids(cm, planes)
        return pa.table(
            {
                "bucket": pa.array(buck),
                "vec_id": pa.array(cids),
                "vec": pa.array(cm.tolist(), pa.list_(pa.float64())),
            }
        )

    exploded = corpus_ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort")
        n = len(g)
        if n < 2 or n > max_bucket:  # documented quadratic-blowup guard
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        ia, ib = np.triu_indices(n, k=1)
        s = sims[ia, ib]
        keep = s >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cos_sim": np.round(s[keep], 6),
            }
        )

    from .groupops import dedup_pairs

    return dedup_pairs(
        exploded.groupby("bucket").map_groups(pairs, batch_format="pandas"),
        num_buckets=16,
    )
