"""Graph ANN (HNSW-class): navigable proximity graphs per IVF partition.

The missing member of the ANN family next to LSH / IVF / PQ
(`stages/knn.py`): a **prebuilt index artifact** whose query cost is
sub-linear in partition size — beam search expands ~ef graph nodes
instead of scanning the whole inverted list.

Design (Ray-native rather than a port of any single-machine HNSW):

- **Partition first.** The deterministic distributed k-means coarse
  quantizer (`knn.train_ivf_centroids` — bit-identical centroids at any
  parallelism) splits the corpus into lists; a graph never spans lists,
  so builds parallelize perfectly and a list's graph fits one task.
- **Build = one bucketed shuffle.** Rows co-shuffle by list id; each task
  builds the graphs of the lists in its bucket: members sorted by id
  (determinism), exact top-``M`` cosine neighbors per node (CHUNKED
  matmul — peak memory ``chunk × L``, never ``L × L``), plus ring edges
  ``i↔i+1`` so every graph is connected by construction (a pure kNN
  graph can fragment into cliques, which caps recall no matter how large
  the beam; the ring restores reachability — the role long links play in
  HNSW's upper layers).
- **The index is data.** One row per list: ids / adjacency / float32
  vectors as binary columns. It writes to parquet like any dataset,
  builds once, serves many query batches, and resumes for free.
- **Query = pure map over index rows + the shared top-k merge.** Queries
  (small side) broadcast via ``ray.put`` with their ``nprobe`` routed
  lists; each index row beam-searches the queries routed to it; the
  existing `_merge_topk` reduces candidates globally. No shuffle touches
  the index beyond its one build.

Determinism: entry node is member 0 (min id), all orderings tie-break on
node id, and the arithmetic is plain float64 dot products on a fixed
member order — results are identical at any parallelism (pinned by test).
With ``ef ≥ list size`` and ``nprobe = n_lists`` the search visits every
node, so output EQUALS brute force exactly — the correctness pin that
approximate settings degrade from gracefully.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from .knn import _merge_topk, _normalize, _to_matrix

_ASSIGN_SCALE = np.int64(1 << 15)


def _assign_lists(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Integer-quantized nearest-centroid assignment (same rule as
    knn.ivf_topk / the trainer: exact int scores, no BLAS ulp flap)."""
    qv = np.round(m * _ASSIGN_SCALE).astype(np.int64)
    qc = np.round(centroids * _ASSIGN_SCALE).astype(np.int64)
    return (qv @ qc.T).argmax(axis=1)


def build_nsw_index(
    corpus_ds,
    centroids: np.ndarray,
    M: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 32,
    chunk: int = 4096,
):
    """→ index Dataset, one row per non-empty IVF list:
    (list_id, n, d, m_deg, ids, adj, vecs) with ids int64[n], adj
    int32[n, m_deg] member-local (-1 padded), vecs float32[n, d]
    unit-norm — all as binary columns."""
    from .groupops import bucketed_group_apply

    def tag(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        return batch.append_column(
            "__list", pa.array(_assign_lists(m, centroids).astype(np.int64))
        )

    tagged = corpus_ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lid, sub in g.groupby("__list", sort=True):
            order = np.argsort(sub[id_col].to_numpy(), kind="stable")
            ids = sub[id_col].to_numpy()[order].astype(np.int64)
            vecs = _normalize(
                np.stack(sub[vec_col].to_numpy()[order]).astype(np.float64)
            )
            n = len(ids)
            m_deg = min(M, max(n - 1, 1))
            adj = np.full((n, m_deg + 2), -1, dtype=np.int32)
            # chunked exact top-M neighbor lists (never an L×L matrix)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                sims = vecs[s:e] @ vecs.T
                sims[np.arange(s, e) - s, np.arange(s, e)] = -np.inf
                kk = min(m_deg, n - 1)
                top = np.lexsort(
                    (np.broadcast_to(np.arange(n), sims.shape), -sims), axis=1
                )[:, :kk]
                adj[s:e, :kk] = top
            # ring edges guarantee connectivity (and are deterministic)
            if n > 1:
                adj[:, m_deg] = (np.arange(n) + 1) % n
                adj[:, m_deg + 1] = (np.arange(n) - 1) % n
            rows.append(
                {
                    "list_id": int(lid),
                    "n": n,
                    "d": int(vecs.shape[1]),
                    "m_deg": int(adj.shape[1]),
                    "ids": ids.tobytes(),
                    "adj": adj.tobytes(),
                    "vecs": vecs.astype(np.float32).tobytes(),
                }
            )
        return pd.DataFrame(rows)

    return bucketed_group_apply(
        tagged, ["__list"], per_bucket, num_buckets=num_buckets
    )


def _beam_search(
    vecs: np.ndarray, adj: np.ndarray, q: np.ndarray, ef: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Deterministic best-first beam search from node 0: returns (member
    indices, sims) of the ≤ef best reached nodes. Ties break on node id
    everywhere (heap keys are (-sim, node))."""
    n = vecs.shape[0]
    visited = np.zeros(n, dtype=bool)
    visited[0] = True
    s0 = float(vecs[0] @ q)
    frontier = [(-s0, 0)]  # max-heap via negated sim
    # result pool: min-heap of (sim, -node) capped at ef — worst first
    pool: list = [(s0, -0)]
    while frontier:
        neg_s, u = heapq.heappop(frontier)
        if len(pool) >= ef and -neg_s < pool[0][0]:
            break  # best frontier candidate can't improve the pool
        nbrs = adj[u]
        nbrs = nbrs[(nbrs >= 0) & ~visited[np.maximum(nbrs, 0)]]
        if nbrs.size == 0:
            continue
        visited[nbrs] = True
        sims = vecs[nbrs] @ q
        for v, s in zip(nbrs.tolist(), sims.tolist()):
            if len(pool) < ef:
                heapq.heappush(pool, (s, -v))
                heapq.heappush(frontier, (-s, v))
            elif s > pool[0][0] or (s == pool[0][0] and -v > pool[0][1]):
                heapq.heapreplace(pool, (s, -v))
                heapq.heappush(frontier, (-s, v))
    sims = np.array([p[0] for p in pool])
    nodes = np.array([-p[1] for p in pool], dtype=np.int64)
    return nodes, sims


def nsw_topk(
    index_ds,
    queries: pa.Table,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    ef: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Beam-search the prebuilt graph index: each query searches the
    graphs of its ``nprobe`` nearest-centroid lists; candidates reduce
    through the shared bucketed top-k merge."""
    import ray

    qm = _normalize(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[id_col].to_numpy(zero_copy_only=False))
    nprobe = min(nprobe, centroids.shape[0])
    qlists = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    qref = ray.put((qids, qm, qlists))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qm_, qlists_ = ray.get(qref)
        out_q, out_n, out_s = [], [], []
        for row in batch.to_pylist():
            lid = row["list_id"]
            hit_q = np.flatnonzero((qlists_ == lid).any(axis=1))
            if hit_q.size == 0:
                continue
            n, d, m_deg = row["n"], row["d"], row["m_deg"]
            ids = np.frombuffer(row["ids"], dtype=np.int64)
            adj = np.frombuffer(row["adj"], dtype=np.int32).reshape(n, m_deg)
            vecs = np.frombuffer(row["vecs"], dtype=np.float32).reshape(
                n, d
            ).astype(np.float64)
            for qi in hit_q:
                nodes, sims = _beam_search(vecs, adj, qm_[qi], ef)
                nids = ids[nodes]
                if exclude_self:
                    keep = nids != qids_[qi]
                    nids, sims = nids[keep], sims[keep]
                kk = min(k, nids.size)
                if kk == 0:
                    continue
                order = np.lexsort((nids, -sims))[:kk]
                out_q.append(np.full(kk, qids_[qi]))
                out_n.append(nids[order])
                out_s.append(sims[order])
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

    return _merge_topk(index_ds.map_batches(partial, batch_format="pyarrow"), k)
