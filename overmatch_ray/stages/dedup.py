"""Document deduplication suite (training-data pipeline axis).

Five variants, each a Ray Data composition (SURVEY.md guidance: shingle /
sketch per batch inside ``map_batches``, shuffle only compact keys):

- **exact**: content-hash key → groupby(key) → deterministic first
- **n-gram Jaccard (exact)**: token-shingle inverted index — explode
  (shingle_hash, doc_id), groupby shingle → intra-group pairs, groupby pair
  → shared count, Jaccard from per-doc shingle counts. Exact (no sketch),
  SQL-oracle-checkable.
- **MinHash + LSH**: per-doc 64-perm minhash signature (vectorized affine
  hashes over shingle hashes), banded to (band, band_hash) keys → groupby →
  candidate pairs → estimated Jaccard = matching-minhash fraction,
  optionally verified exactly.
- **SimHash**: 64-bit sign-of-weighted-sum sketch per doc; near-dups =
  pairs at small Hamming distance, found via banded grouping (same banding
  trick as image phash).
- **embedding cosine**: see ``knn.near_dup_embeddings`` (hyperplane-LSH
  buckets + exact verify).

Shingle hashing is splitmix64 over token blake-hashes — deterministic
across processes (NO builtin ``hash``: PYTHONHASHSEED would break
distributed determinism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

# ONE copy of the determinism-critical hash primitives: groupops owns
# splitmix64 and the FNV constants; every other bit-identical consumer
# (shingle hashing here, bucket hashing there) imports them, so a change
# can never silently diverge the text-dedup and bucketing paths
from .groupops import _FNV_BASIS, _FNV_PRIME, _splitmix64  # noqa: E402


def _token_hashes_batch(texts: list[str | None]) -> list[np.ndarray]:
    """Per-token FNV-1a hashes for a whole batch of documents, fully
    vectorized: all docs' utf-8 bytes are joined into one buffer, token
    boundaries recovered from the 0x20 separators, and the FNV fold runs as
    one numpy sweep per byte-COLUMN (j-th byte of every token at once) —
    O(total bytes) vector work, no per-byte Python. Produces values
    identical to the scalar FNV-1a loop (pinned by test_dedup)."""
    n_docs = len(texts)
    counts = np.zeros(n_docs, dtype=np.int64)  # tokens per doc
    enc: list[bytes] = []
    for i, t in enumerate(texts):
        if t:  # '' and None → 0 tokens (matches `text.split(" ") if text`)
            counts[i] = t.count(" ") + 1
            enc.append(t.encode())
    if not enc:
        return [np.empty(0, np.uint64)] * n_docs
    arr = np.frombuffer(b" ".join(enc), dtype=np.uint8)
    sep = np.flatnonzero(arr == 0x20)
    starts = np.concatenate([[0], sep + 1])
    ends = np.concatenate([sep, [arr.size]])
    lens = ends - starts
    h = np.full(starts.size, _FNV_BASIS, dtype=np.uint64)
    j = 0
    active = np.flatnonzero(lens > 0)
    while active.size:
        b = arr[starts[active] + j].astype(np.uint64)
        h[active] = (h[active] ^ b) * _FNV_PRIME
        j += 1
        active = active[lens[active] > j]
    per_doc = np.split(h, np.cumsum(counts)[:-1])
    return [p for p in per_doc]


def _token_hashes(text: str) -> np.ndarray:
    """Per-token 64-bit hashes (FNV-1a over utf-8) for one document."""
    return _token_hashes_batch([text])[0]


def _ordered_kgrams(th: np.ndarray, k: int) -> np.ndarray:
    """Rolling k-gram hashes in DOCUMENT ORDER (one per window position)."""
    if th.size < k:
        return _splitmix64(th) if th.size else th
    # combine k consecutive token hashes order-sensitively
    acc = th[: th.size - k + 1].copy()
    for j in range(1, k):
        acc = _splitmix64(acc * _U64(1099511628211) ^ th[j : th.size - k + 1 + j])
    return acc


def _shingles_from_tokens(th: np.ndarray, k: int) -> np.ndarray:
    return np.unique(_ordered_kgrams(th, k))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-token shingle hashes of a document."""
    return _shingles_from_tokens(_token_hashes(text), k)


def shingle_hashes_batch(texts: list[str | None], k: int = 3) -> list[np.ndarray]:
    """Batch variant: one vectorized token-hash pass, per-doc k-gram
    combine (numpy slices per doc over precomputed token hashes)."""
    return [_shingles_from_tokens(th, k) for th in _token_hashes_batch(texts)]


# --- exact dedup -----------------------------------------------------------


def exact_dedup(docs_ds, key_col: str, id_col: str = "doc_id",
                num_buckets: int = 32):
    """Keep the smallest id per key; report group size. Bucketed, not
    ``groupby(key).aggregate(...)``: key cardinality ≈ corpus size, and
    Ray's sort-aggregate reduce pays ~30 µs of Python PER GROUP — the
    bucketed plan runs one vectorized pandas groupby per hash bucket
    instead (same rows shuffled once, same output; measured 7 s → 3 s on
    224k singleton groups, and the constant scales with the corpus).
    Output columns: (key_col, id_col=min, dup_count)."""
    from .groupops import bucketed_aggregate

    def project(batch: pa.Table) -> pa.Table:
        # in-kernel projection, not select_columns: the caller may feed a
        # map_groups output whose Dataset.schema() is stale (ADVICE r4 /
        # CLAUDE.md schema pitfall) — blocks are the source of truth
        return pa.table({key_col: batch[key_col], id_col: batch[id_col]})

    agg = bucketed_aggregate(
        docs_ds.map_batches(project, batch_format="pyarrow"), [key_col],
        {id_col: (id_col, "min"), "__n": (id_col, "size")},
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch["__n"]
        return batch.drop_columns(["__n"]).append_column(
            "dup_count", pc.subtract(n, pa.scalar(1, n.type))
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def segment_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                  window: int = 5, num_buckets: int = 64,
                  idx_bits: int = 20):
    """Sub-document exact dedup at fixed token-window granularity — the
    C4 line-dedup move for delimiter-free corpora: the corpus is cut into
    NON-OVERLAPPING ``window``-token segments, each distinct full segment
    survives only at its FIRST occurrence in (doc, position) order,
    partial tail segments always survive, and documents are reassembled
    from their surviving segments (an exact duplicate document keeps only
    its sub-``window`` tail).

    Segment identity is the order-sensitive FNV/splitmix combine of the
    window's token hashes (string equality modulo 64-bit collisions — the
    bm25/shingle precedent; the DuckDB oracle compares true strings).
    Input contract: no empty/NULL texts (the corpus convention every
    text-stats oracle already relies on).

    Shape: one explode (seg_hash, packed first-occurrence key, seg text —
    corpus volume crosses ONCE), a bucketed min-aggregate over seg_hash
    (group count ≈ segment count → never the native per-group reduce), a
    bucketed LEFT join back (partials ride through with is_full=0 and
    ignore the winner column), and a per-doc reassembly group apply.
    ``packed = doc_id << idx_bits | seg_idx`` — guarded loudly."""
    from .groupops import bucketed_aggregate, bucketed_group_apply
    from .joins import bucket_hash_join

    w = int(window)
    max_idx = 1 << idx_bits

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        ths = _token_hashes_batch(texts)
        o_id, o_idx, o_hash, o_full, o_seg = [], [], [], [], []
        for did, th, text in zip(ids, ths, texts):
            toks = text.split(" ") if text else []
            nfull = len(toks) // w
            if nfull >= max_idx:
                raise ValueError(
                    f"segment_dedup: doc {did} has {nfull} segments "
                    f"(>= 2^{idx_bits}); raise idx_bits"
                )
            if nfull:
                kg = _ordered_kgrams(th, w)[:: w][:nfull]
                o_hash.extend(kg.view(np.int64).tolist())
                o_id.extend([int(did)] * nfull)
                o_idx.extend(range(nfull))
                o_full.extend([1] * nfull)
                o_seg.extend(
                    " ".join(toks[j * w:(j + 1) * w]) for j in range(nfull)
                )
            if len(toks) % w:
                o_hash.append(0)
                o_id.append(int(did))
                o_idx.append(nfull)
                o_full.append(0)
                o_seg.append(" ".join(toks[nfull * w:]))
        did_a = np.asarray(o_id, dtype=np.int64)
        idx_a = np.asarray(o_idx, dtype=np.int64)
        return pa.table({
            "seg_hash": pa.array(np.asarray(o_hash, dtype=np.int64)),
            "packed": pa.array((did_a << idx_bits) | idx_a),
            id_col: pa.array(did_a),
            "seg_idx": pa.array(idx_a),
            "is_full": pa.array(np.asarray(o_full, dtype=np.int64)),
            "seg": pa.array(o_seg, pa.string()),
        })

    segs = docs_ds.map_batches(explode, batch_format="pyarrow")

    def fulls_only(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["is_full"], pa.scalar(1)))
        return pa.table({"seg_hash": f["seg_hash"], "packed": f["packed"]})

    winners = bucketed_aggregate(
        segs.map_batches(fulls_only, batch_format="pyarrow"), ["seg_hash"],
        {"min_packed": ("packed", "min")}, num_buckets=num_buckets,
    )

    joined = bucket_hash_join(
        segs, winners, "seg_hash", "seg_hash",
        num_buckets=num_buckets, how="left",
    )

    def keep(batch: pa.Table) -> pa.Table:
        full = batch["is_full"].to_numpy(zero_copy_only=False) == 1
        packed = batch["packed"].to_numpy(zero_copy_only=False)
        # partials miss the left join → NULL min_packed, possibly
        # float64-upcast (the nulled-int pitfall); fill and round-trip to
        # int64 — exact while packed < 2^53, i.e. doc_id < 2^(53-idx_bits)
        mp = np.asarray(
            pc.fill_null(batch["min_packed"], -1).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        ).astype(np.int64)
        f = batch.filter(pa.array(~full | (packed == mp)))
        return pa.table({
            id_col: f[id_col], "seg_idx": f["seg_idx"], "seg": f["seg"],
        })

    kept = joined.map_batches(keep, batch_format="pyarrow")

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seg_idx", kind="mergesort")
        out = g.groupby(id_col, sort=False)["seg"].agg(" ".join)
        return pd.DataFrame({
            id_col: out.index.to_numpy(dtype=np.int64),
            "text_dedup": out.to_numpy(),
        })

    return bucketed_group_apply(
        kept, [id_col], reassemble, num_buckets=num_buckets,
    )


# --- exact n-gram Jaccard pairs -------------------------------------------


def _explode_shingles(
    batch: pa.Table, k: int, text_col: str, id_col: str, sets_fn=None
) -> pa.Table:
    ids_in = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    per_doc = sets_fn(texts) if sets_fn else shingle_hashes_batch(texts, k)
    sizes = np.array([sh.size for sh in per_doc], dtype=np.int64)
    # each row carries its doc's total shingle count (+8 B/row) so the
    # Jaccard denominator travels WITH the pair — no size lookup ever
    return pa.table(
        {
            "shingle": pa.array(
                np.concatenate(per_doc).view(np.int64)
                if per_doc
                else np.empty(0, np.int64)
            ),
            "doc_id": pa.array(np.repeat(ids_in.astype(np.int64), sizes)),
            "n_sh": pa.array(np.repeat(sizes, sizes)),
        }
    )


def ngram_jaccard_pairs(
    docs_ds,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_group: int = 1000,
    _sets_fn=None,
):
    """EXACT Jaccard-similar pairs via a shingle inverted index.

    Jaccard(A, B) = |A∩B| / (|A|+|B|−|A∩B|) over distinct k-token shingles.
    A shingle shared by > ``max_group`` docs is a stop-shingle and is
    dropped (standard inverted-index practice; a pair sharing ONLY
    stop-shingles can be missed — documented trade-off for bounded skew).

    Fully distributed with NO size lookup anywhere: every exploded
    (shingle, doc_id) row carries its doc's total shingle count, so a
    candidate pair is born knowing both Jaccard denominators — the pipeline
    is exactly two bucketed shuffles (inverted index, pair combine) and
    nothing O(corpus) ever lands on the driver.
    """
    exploded = docs_ds.map_batches(
        lambda b: _explode_shingles(b, k, text_col, id_col, _sets_fn),
        batch_format="pyarrow",
    )

    from .groupops import bucketed_group_apply, group_pair_indices

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Whole-bucket inverted-index pair generation (vectorized runs)."""
        g = g.sort_values(["shingle", "doc_id"], kind="mergesort")
        run = (g["shingle"] != g["shingle"].shift()).cumsum().to_numpy()
        ia, ib = group_pair_indices(run, max_group)
        if ia.size == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=np.int64),
                 "id_b": pd.Series(dtype=np.int64),
                 "shared": pd.Series(dtype=np.int64),
                 "n_a": pd.Series(dtype=np.int64),
                 "n_b": pd.Series(dtype=np.int64)}
            )
        docs = g["doc_id"].to_numpy()
        ns = g["n_sh"].to_numpy()
        a, b = docs[ia], docs[ib]
        swap = a > b
        lo, hi = np.where(swap, b, a), np.where(swap, a, b)
        n_lo = np.where(swap, ns[ib], ns[ia])
        n_hi = np.where(swap, ns[ia], ns[ib])
        df = pd.DataFrame({"id_a": lo, "id_b": hi, "n_a": n_lo, "n_b": n_hi})
        # partial combiner: collapse repeats within the bucket before the
        # pair-key shuffle (n_a/n_b are constant per pair → first)
        out = df.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first")
        )
        return out

    pair_parts = bucketed_group_apply(
        exploded, ["shingle"], bucket_pairs, num_buckets=64
    )
    pair_counts = bucketed_group_apply(
        pair_parts,
        ["id_a", "id_b"],
        lambda g: g.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("shared", "sum"), n_a=("n_a", "first"), n_b=("n_b", "first")
        ),
        num_buckets=32,
    )

    def add_jaccard(batch: pa.Table) -> pa.Table:
        shared = batch["shared"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = np.maximum(na + nb - shared, 1.0)
        jac = shared / union
        out = batch.select(["id_a", "id_b", "shared"]).append_column(
            "jaccard", pa.array(np.round(jac, 6))
        )
        return out.filter(pa.array(jac >= threshold))

    return pair_counts.map_batches(add_jaccard, batch_format="pyarrow")


# --- winnowing fingerprints (rolling-hash document fingerprinting) ---------


def winnow_fingerprints(th_or_text, k: int = 5, window: int = 4) -> np.ndarray:
    """Schleimer–Wilkerson–Aiken winnowing: from the document's ORDERED
    rolling k-gram hashes, select the RIGHTMOST-minimum hash of every
    ``window`` consecutive positions; the distinct selected hashes are the
    document's fingerprint set. Guarantees: any shared substring of
    ≥ k+window-1 tokens contributes a shared fingerprint; expected density
    2/(window+1) — a ~50–70% smaller inverted index than full shingling at
    the same detection floor."""
    th = (
        _token_hashes(th_or_text)
        if isinstance(th_or_text, str)
        else th_or_text
    )
    grams = _ordered_kgrams(th, k)
    n = grams.size
    if n == 0:
        return grams
    if n <= window:
        # one window covers the whole doc: its rightmost minimum
        return np.array([grams.min()], dtype=grams.dtype)
    w = np.lib.stride_tricks.sliding_window_view(grams, window)
    # rightmost-min: argmin over the reversed window, mapped back
    idx = (window - 1) - np.argmin(w[:, ::-1], axis=1)
    pos = np.unique(np.arange(n - window + 1) + idx)
    return np.unique(grams[pos])


def winnow_fingerprints_batch(
    texts: "list[str | None]", k: int = 5, window: int = 4
) -> "list[np.ndarray]":
    return [
        winnow_fingerprints(th, k, window) for th in _token_hashes_batch(texts)
    ]


def winnow_jaccard_pairs(
    docs_ds,
    threshold: float = 0.5,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_group: int = 1000,
):
    """Near-dup pairs over winnowed fingerprint sets — same two-shuffle
    inverted-index plan as ``ngram_jaccard_pairs`` (counts carried through
    the explode) but over the ~2/(window+1)-density fingerprint sets, so
    the exploded index is a fraction of full shingling's. Jaccard here is
    over FINGERPRINT sets — an approximation backed by the winnowing
    detection guarantee, NOT an unbiased estimator of shingle Jaccard
    (selection is positionally correlated, unlike MinHash)."""
    return ngram_jaccard_pairs(
        docs_ds,
        threshold=threshold,
        k=k,
        text_col=text_col,
        id_col=id_col,
        max_group=max_group,
        _sets_fn=lambda texts: winnow_fingerprints_batch(texts, k, window),
    )


# --- near-dup cluster formation (connected components) ---------------------


def dedup_clusters(
    pairs_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    num_buckets: int = 32,
    broadcast_limit: int = 2_000_000,
):
    """Connected components over a near-dup pair graph → one row per
    member doc: (doc_id, cluster_id) with cluster_id = the smallest doc id
    reachable through the pairs. The canonical final step of corpus dedup
    (keep cluster_id, drop the rest).

    Two paths, picked from the materialized edge count (one scalar):

    - pair graph ≤ ``broadcast_limit`` edges: streaming union-find on the
      driver over ``iter_batches`` — the pair graph is ≪ the corpus by
      construction (LSH bands / stop-shingle caps bound it), so this is a
      bounded small-side step, not an O(corpus) materialization;
    - larger: distributed min-label propagation — each round joins current
      labels onto the symmetric edge list (bucket hash join) and takes the
      per-node min (labels decrease monotonically, so an unchanged label
      SUM is a reached fixpoint). Rounds = graph diameter, tiny for
      near-dup clusters; only one scalar per round reaches the driver.
    """
    import ray.data

    from .joins import bucket_hash_join

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b])),
                "v": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    if edges.count() <= broadcast_limit:
        # vectorized label contraction, no per-edge Python loop (the old
        # union-find was ~1 µs/edge of pure interpreter → multi-second
        # driver stall at the 2M-edge bound). Each round: scatter-min over
        # the edge list, pointer-jump labels to their fixpoint, then
        # CONTRACT the edge list onto the new labels (drop self-loops,
        # dedupe) so later rounds touch a geometrically smaller graph.
        # Measured at the 2M-edge bound: 2.5 s on a near-critical random
        # graph (6 rounds), 0.7 s on a 2M-node path — vs ~7 s without
        # contraction and far worse for the Python loop.
        us, vs = [], []
        for batch in edges.iter_batches(batch_format="pyarrow"):
            us.append(batch["u"].to_numpy(zero_copy_only=False))
            vs.append(batch["v"].to_numpy(zero_copy_only=False))
        u = np.concatenate(us) if us else np.array([], dtype=np.int64)
        v = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: u.size], inv[u.size :]
        lbl = np.arange(nodes.size, dtype=np.int64)
        while ui.size:
            new = lbl.copy()
            np.minimum.at(new, ui, lbl[vi])
            np.minimum.at(new, vi, lbl[ui])
            while True:  # pointer jumping: label ← label of label
                hopped = new[new]
                if np.array_equal(hopped, new):
                    break
                new = hopped
            if np.array_equal(new, lbl):
                break
            lbl = new
            eu, ev = lbl[ui], lbl[vi]
            keep = eu != ev
            lo = np.minimum(eu[keep], ev[keep]).astype(np.uint64)
            hi = np.maximum(eu[keep], ev[keep]).astype(np.uint64)
            packed = np.unique(lo << np.uint64(32) | hi)  # node idx < 2^32
            ui = (packed >> np.uint64(32)).astype(np.int64)
            vi = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        out = pa.table(
            {
                "doc_id": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array(nodes[lbl], pa.int64()),
            }
        )
        return ray.data.from_arrow(out)

    def local_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["lbl"].min()
        return out

    from .groupops import bucketed_group_apply

    # round 0: label(x) = min(x, neighbors) straight from the edge list
    labels = bucketed_group_apply(
        edges.map_batches(
            lambda b: pa.table(
                {
                    "node": b["u"],
                    "lbl": pa.array(
                        np.minimum(
                            b["u"].to_numpy(zero_copy_only=False),
                            b["v"].to_numpy(zero_copy_only=False),
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        local_min,
        num_buckets=num_buckets,
    ).materialize()

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        cur = labels.sum("lbl")
        if prev_sum is not None and cur == prev_sum:
            converged = True
            break
        prev_sum = cur
        # propagate: every edge (u, v) offers label(v) to u, plus u keeps its own
        joined = bucket_hash_join(
            edges, labels, "v", "node", num_buckets=num_buckets
        )
        offers = joined.map_batches(
            lambda b: pa.table({"node": b["u"], "lbl": b["lbl"]}),
            batch_format="pyarrow",
        )
        labels = bucketed_group_apply(
            # union→all-to-all boundary materialized (CLAUDE.md rule):
            # offers is a live task-pool chain off the round's join
            labels.union(offers).materialize(),
            ["node"], local_min, num_buckets=num_buckets,
        ).materialize()
    if not converged and labels.sum("lbl") != prev_sum:
        # never silent (brief rule): a pair-graph with diameter > max_iters
        # would report one true cluster as several
        import logging

        logging.getLogger(__name__).warning(
            "dedup_clusters: label propagation did NOT converge within %d "
            "rounds — cluster ids may be split for long chains; raise "
            "max_iters (graph diameter bound)",
            max_iters,
        )

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["lbl"]}),
        batch_format="pyarrow",
    )


# --- MinHash + LSH ---------------------------------------------------------

_NUM_PERM = 64


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    base = _splitmix64(np.arange(2 * num_perm, dtype=np.uint64) + _U64(seed * 1315423911))
    a = base[:num_perm] | _U64(1)  # odd multipliers
    b = base[num_perm:]
    return a, b


def minhash_signature(sh: np.ndarray, num_perm: int = _NUM_PERM) -> np.ndarray:
    """64-permutation minhash of a shingle-hash set (vectorized)."""
    a, b = _PERM_A[:num_perm], _PERM_B[:num_perm]
    if sh.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = (sh[:, None] * a[None, :] + b[None, :]) & _MASK
    return vals.min(axis=0)


def minhash_signature_batch(shingles: "list[np.ndarray]",
                            chunk_rows: int = 512) -> np.ndarray:
    """(n_docs, 64) minhash signatures for a whole batch: docs' shingles
    concatenate into (≤chunk_rows, 64) affine-hash TILES and
    ``np.minimum.reduceat`` folds per-doc minima — a few numpy sweeps per
    batch instead of per-document Python (bit-identical to the scalar
    ``minhash_signature``, pinned by test). Tiled on purpose: one giant
    (S, 64) uint64 intermediate is ~64 B/shingle × 3 temporaries of pure
    memory traffic (measured 5 s for a 5k-doc batch on a loaded box vs
    0.1 s tiled) — 512-row tiles keep the working set ~256 KB, in L2
    (a chunk-size sweep measured 512 ≈ the per-doc path, 16k 17× worse).
    Empty docs get the all-max sentinel signature, same as the scalar
    path."""
    n = len(shingles)
    out = np.full((n, _NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    sizes = np.array([sh.size for sh in shingles], dtype=np.int64)
    nz = np.flatnonzero(sizes)
    if nz.size == 0:
        return out
    # group docs into tiles of ≤ chunk_rows total shingles
    csum = np.cumsum(sizes[nz])
    tile_of = ((csum - 1) // chunk_rows).astype(np.int64)
    bounds = np.flatnonzero(np.r_[True, tile_of[1:] != tile_of[:-1]])
    bounds = np.r_[bounds, nz.size]
    for t in range(bounds.size - 1):
        doc_sel = nz[bounds[t]:bounds[t + 1]]
        concat = np.concatenate([shingles[i] for i in doc_sel])
        vals = (concat[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) & _MASK
        ssz = sizes[doc_sel]
        starts = np.concatenate([[0], np.cumsum(ssz)[:-1]])
        out[doc_sel] = np.minimum.reduceat(vals, starts, axis=0)
    return out


_PERM_A, _PERM_B = _perm_params(_NUM_PERM)


def minhash_lsh_pairs(
    docs_ds,
    threshold: float = 0.5,
    bands: int = 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    _emit_est: bool = True,
    num_buckets: int = 32,
    driver_pair_limit: int = 100_000,
):
    """Candidate pairs from banded minhash, scored by estimated Jaccard
    (fraction of matching minhashes) ≥ threshold. 16 bands × 4 rows catches
    J=0.5 pairs w.p. ~0.9998.

    Scale plan: band rows NEVER carry signatures — the banding shuffle
    moves 24 B/row (id, band, band_hash), and the est scorer joins the
    per-doc 512 B signature (emitted ONCE per doc, semi-filtered to
    candidate docs) back onto the DEDUPED candidate pairs only. The
    former design tiled the full signature onto every band row
    (8 KB/doc through the all-to-all — measured 8+ GB of store at a
    500k-doc probe and the dominant stage cost). Signature work is one
    tiled numpy sweep per batch (``minhash_signature_batch``).

    When the candidate-pair count (the OUTPUT cardinality, known after
    the dedup materialize) is ≤ ``driver_pair_limit``, scoring skips the
    three shuffle rounds (semi-join + two bucket joins ≈ 2 s of fixed
    all-to-all cost EACH at any data size) for a driver gather bounded
    by output size: candidate ids broadcast sorted, signatures computed
    in one distributed pass with in-kernel membership filter, and the
    ≤ 2·limit×512 B filtered table scored on the driver — the same
    thresholded driver/distributed split as ``dedup_clusters``."""
    rows_per_band = _NUM_PERM // bands
    band_starts = np.arange(0, _NUM_PERM, rows_per_band)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shingles = shingle_hashes_batch(batch[text_col].to_pylist(), k)
        sig = minhash_signature_batch(shingles)  # (n, 64)
        bh = _splitmix64(
            np.add.reduceat(_splitmix64(sig.ravel()).reshape(sig.shape),
                            band_starts, axis=1).ravel()
        ).view(np.int64)  # (n*bands,) row-major: doc-major, band-minor
        n = ids.size
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int8), n)),
            "band_hash": pa.array(bh),
        })

    exploded = docs_ds.map_batches(band_rows, batch_format="pyarrow")

    from .groupops import bucketed_group_apply, dedup_pairs, group_pair_indices

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash", "doc_id"], kind="mergesort")
        g = g.drop_duplicates(["band", "band_hash", "doc_id"])
        run = (
            (g[["band", "band_hash"]] != g[["band", "band_hash"]].shift())
            .any(axis=1)
            .cumsum()
            .to_numpy()
        )
        ia, ib = group_pair_indices(run, 1000)
        if ia.size == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        ids = g["doc_id"].to_numpy()
        a, b = ids[ia], ids[ib]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    cands = dedup_pairs(
        bucketed_group_apply(
            exploded, ["band", "band_hash"], bucket_pairs,
            num_buckets=num_buckets,
        ),
        num_buckets=max(8, num_buckets // 2),
    )
    if not _emit_est:
        return cands

    cands = cands.materialize()
    n_pairs = cands.count()
    if n_pairs == 0:  # typed empty (group-apply output has no schema)
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }))

    if n_pairs <= driver_pair_limit:
        import ray
        import ray.data as _rd

        # skip zero-row blocks: group-apply emptiness leaves them with a
        # columnless schema that poisons concat_tables
        ptbl = pa.concat_tables(
            t for t in ray.get(cands.to_arrow_refs()) if t.num_rows
        )
        a = ptbl["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ptbl["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        cand_sorted_ref = ray.put(np.unique(np.concatenate([a, b])))

        def sig_filtered(batch: pa.Table) -> pa.Table:
            cand_sorted = ray.get(cand_sorted_ref)
            ids = batch[id_col].to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            pos = np.searchsorted(cand_sorted, ids)
            pos[pos == cand_sorted.size] = 0
            mask = cand_sorted[pos] == ids
            if not mask.any():
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.list_(pa.int64())),
                })
            sig = minhash_signature_batch(
                shingle_hashes_batch(
                    batch.filter(pa.array(mask))[text_col].to_pylist(), k
                )
            )
            return pa.table({
                "doc_id": pa.array(ids[mask]),
                "sig": pa.array(
                    sig.view(np.int64).tolist(), pa.list_(pa.int64())
                ),
            })

        stbl = pa.concat_tables(
            t for t in ray.get(
                docs_ds.map_batches(
                    sig_filtered, batch_format="pyarrow"
                ).to_arrow_refs()
            ) if t.num_rows
        )
        import pyarrow.compute as pc

        sids = stbl["doc_id"].to_numpy(zero_copy_only=False)
        # list_flatten (NOT .values): concatenated list chunks may slice
        # a larger child buffer — flatten honors the logical offsets
        sigs = pc.list_flatten(stbl["sig"].combine_chunks()).to_numpy(
            zero_copy_only=False
        ).reshape(sids.size, _NUM_PERM)
        order = np.argsort(sids, kind="mergesort")
        sids, sigs = sids[order], sigs[order]
        est = (
            sigs[np.searchsorted(sids, a)] == sigs[np.searchsorted(sids, b)]
        ).mean(axis=1)
        keep = est >= threshold
        return _rd.from_arrow(pa.table({
            "id_a": pa.array(a[keep]),
            "id_b": pa.array(b[keep]),
            "est_jaccard": pa.array(np.round(est[keep], 6)),
        }))

    def sig_table(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = minhash_signature_batch(
            shingle_hashes_batch(batch[text_col].to_pylist(), k)
        )
        return pa.table({
            "doc_id": pa.array(ids),
            "sig": pa.array(sig.view(np.int64).tolist(), pa.list_(pa.int64())),
        })

    j2 = attach_pair_payload(
        cands, docs_ds.map_batches(sig_table, batch_format="pyarrow"),
        num_buckets,
    )

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # list_flatten (NOT .values): taken/joined list arrays may slice a
        # larger child buffer — flatten honors the logical offsets
        n = batch.num_rows
        ma = pc.list_flatten(batch["sig_a"].combine_chunks()).to_numpy(
            zero_copy_only=False
        ).reshape(n, _NUM_PERM)
        mb = pc.list_flatten(batch["sig_b"].combine_chunks()).to_numpy(
            zero_copy_only=False
        ).reshape(n, _NUM_PERM)
        est = (ma == mb).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "id_a": batch["id_a"].cast(pa.int64()),
            "id_b": batch["id_b"].cast(pa.int64()),
            "est_jaccard": pa.array(np.round(est, 6)),
        }).filter(pa.array(keep))

    return j2.map_batches(score, batch_format="pyarrow")


# --- SimHash ---------------------------------------------------------------


_BIT_POWERS = (_U64(1) << np.arange(64, dtype=np.uint64))


def simhash64_many(texts: list[str | None]) -> np.ndarray:
    """Batch simhash: one bit-matrix over ALL tokens in the batch, per-doc
    bit-count sums via ``np.add.reduceat`` — no per-doc or per-bit Python
    loops. Returns int64 codes (empty docs → 0), values identical to the
    scalar formulation (pinned by test_dedup)."""
    per_doc = _token_hashes_batch(texts)
    counts = np.array([t.size for t in per_doc], dtype=np.int64)
    nz = np.flatnonzero(counts)
    out = np.zeros(len(texts), dtype=np.int64)
    if nz.size == 0:
        return out
    th = np.concatenate([per_doc[i] for i in nz])
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(
        np.int64
    )
    starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
    ones = np.add.reduceat(bits, starts, axis=0)  # per-doc set-bit counts
    v = 2 * ones - counts[nz][:, None]  # sum of (2·bit − 1)
    codes = ((v > 0).astype(np.uint64) * _BIT_POWERS[None, :]).sum(axis=1)
    out[nz] = codes.astype(np.int64)
    return out


def simhash64(text: str) -> int:
    return int(simhash64_many([text])[0])


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = simhash64_many(batch[text_col].to_pylist())
    return batch.append_column("simhash", pa.array(vals, pa.int64()))


def simhash_pairs(docs_ds, max_hamming: int = 3, id_col: str = "doc_id"):
    """Near-dup doc pairs at Hamming ≤ max_hamming, via 4×16-bit banding of
    the simhash (any pair ≤3 bits apart shares ≥1 intact band). Reuses the
    image phash banding machinery (same 64-bit sketch shape)."""
    from .images import near_dup_pairs

    # decide the restore cast ONCE from the id column's SOURCE type
    # (ADVICE r4: a per-batch ArrowInvalid fallback made mixed corpora —
    # mostly-numeric string ids plus a few non-numeric — emit blocks with
    # HETEROGENEOUS schemas, which downstream unions/shuffles mis-bucket)
    id_schema = docs_ds.schema()
    numeric_ids = pa.types.is_integer(
        dict(zip(id_schema.names, id_schema.types))[id_col]
    )

    with_hash = docs_ds.map_batches(simhash_batch, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": pa.compute.cast(batch[id_col], pa.string()),
                "phash": batch["simhash"],
            }
        )

    keyed = with_hash.map_batches(rename, batch_format="pyarrow")
    pairs = near_dup_pairs(keyed, max_hamming=max_hamming, bands=4)

    def restore(batch: pa.Table) -> pa.Table:
        # back to the caller's integer id space with NUMERIC lo/hi order —
        # the banding machinery ordered the string-cast ids
        # lexicographically, which inverts pairs like (9, 10) → ('10','9')
        # and silently changes the id type, breaking the id_a < id_b
        # contract every other pair producer honors (and unions with them).
        # Integer source ids round-trip through the string cast exactly, so
        # a cast failure here is a REAL bug, not a format switch.
        if not numeric_ids:
            return batch  # genuinely non-numeric ids: keep as strings
        a = pa.compute.cast(batch["id_a"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = pa.compute.cast(batch["id_b"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table({
            "id_a": pa.array(np.minimum(a, b)),
            "id_b": pa.array(np.maximum(a, b)),
            "hamming": batch["hamming"],
        })

    return pairs.map_batches(restore, batch_format="pyarrow")


# --- exact duplicate-substring spans ---------------------------------------


def duplicate_spans(
    docs_ds,
    min_tokens: int = 20,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    max_group: int = 1000,
):
    """EXACT duplicate-substring spans ≥ ``min_tokens`` tokens, the
    span-level cousin of suffix-array dedup ("Deduplicating Training Data
    Makes Language Models Better"): instead of dropping whole near-dup
    docs, report exactly WHICH token ranges are copied so a scrubber can
    cut the span. Output one row per maximal shared run:
    (doc_a, doc_b, start_a, start_b, length_tokens), 0-based token
    offsets; doc_a < doc_b, or doc_a == doc_b with start_a < start_b
    (internal repetition).

    Plan — two bucketed shuffles, the ngram-pairs shape:
    1. every position's rolling k-gram hash (one row per token position,
       vectorized off the shared FNV token sweep) co-shuffles by hash;
       per-group all (i<j) position pairs are emitted (groups over
       ``max_group`` positions are boilerplate stop-grams — skipped, same
       contract as the Jaccard stop-shingle cap);
    2. pairs co-shuffle by (doc_a, doc_b); per bucket a diagonal
       gaps-and-islands merge (sort by diagonal pa−pb, runs of
       consecutive pa) turns k-gram matches into maximal spans;
       length = run + k − 1, filtered to ≥ min_tokens.

    Matches are by 64-bit k-gram hash — a collision could fabricate a
    span (probability ~n²/2⁶⁴; the oracle query pins string-exact
    equality on the driver corpus)."""
    from .groupops import bucketed_group_apply

    if min_tokens < k:
        raise ValueError("min_tokens must be >= k")
    min_run = min_tokens - k + 1

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ths = _token_hashes_batch(batch[text_col].to_pylist())
        hs, ds_, ps = [], [], []
        for i, th in enumerate(ths):
            if th.size >= k:
                g = _ordered_kgrams(th, k)
                hs.append(g)
                ds_.append(np.full(g.size, ids[i], np.int64))
                ps.append(np.arange(g.size, dtype=np.int64))
        if not hs:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table(
            {
                "h": pa.array(np.concatenate(hs).view(np.int64)),
                "doc": pa.array(np.concatenate(ds_)),
                "pos": pa.array(np.concatenate(ps)),
            }
        )

    grams = docs_ds.map_batches(gram_rows, batch_format="pyarrow")

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc", "pos"], kind="mergesort")
        h = g["h"].to_numpy()
        doc = g["doc"].to_numpy()
        pos = g["pos"].to_numpy()
        _, starts, counts = np.unique(h, return_index=True, return_counts=True)
        da, pa_, db, pb = [], [], [], []
        for s, c in zip(starts, counts):
            if c < 2 or c > max_group:
                continue
            i, j = np.triu_indices(c, 1)
            da.append(doc[s + i]); pa_.append(pos[s + i])
            db.append(doc[s + j]); pb.append(pos[s + j])
        if not da:
            return pd.DataFrame({
                "da": pd.Series(dtype=np.int64), "pa": pd.Series(dtype=np.int64),
                "db": pd.Series(dtype=np.int64), "pb": pd.Series(dtype=np.int64),
            })
        return pd.DataFrame({
            "da": np.concatenate(da), "pa": np.concatenate(pa_),
            "db": np.concatenate(db), "pb": np.concatenate(pb),
        })

    pairs = bucketed_group_apply(grams, ["h"], pair_bucket,
                                 num_buckets=num_buckets)

    def span_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "doc_a": pd.Series(dtype=np.int64),
                "doc_b": pd.Series(dtype=np.int64),
                "start_a": pd.Series(dtype=np.int64),
                "start_b": pd.Series(dtype=np.int64),
                "length_tokens": pd.Series(dtype=np.int64),
            })
        g = g.assign(diag=g["pa"].to_numpy() - g["pb"].to_numpy())
        g = g.sort_values(["da", "db", "diag", "pa"], kind="mergesort")
        da = g["da"].to_numpy(); db = g["db"].to_numpy()
        pa_ = g["pa"].to_numpy(); pb = g["pb"].to_numpy()
        diag = g["diag"].to_numpy()
        new_run = np.ones(len(g), bool)
        if len(g) > 1:
            new_run[1:] = (
                (da[1:] != da[:-1]) | (db[1:] != db[:-1])
                | (diag[1:] != diag[:-1]) | (np.diff(pa_) != 1)
            )
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        run_len = np.bincount(run_id)
        keep = run_len >= min_run
        return pd.DataFrame({
            "doc_a": da[starts][keep],
            "doc_b": db[starts][keep],
            "start_a": pa_[starts][keep],
            "start_b": pb[starts][keep],
            "length_tokens": (run_len[keep] + k - 1).astype(np.int64),
        })

    return bucketed_group_apply(pairs, ["da", "db"], span_bucket,
                                num_buckets=num_buckets)


# --- prefix-filtered exact set-similarity join (AllPairs / PPJoin) ---------


def prefix_jaccard_pairs(
    docs_ds,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    _sets_fn=None,
    max_posting: int = 200_000,
):
    """EXACT Jaccard-similar pairs via PREFIX FILTERING — the AllPairs /
    PPJoin candidate bound (the distributed set-similarity-join lineage,
    e.g. VernicaJoin; see PAPERS.md "Distributed Streaming Set Similarity
    Join"). Same output contract as ``ngram_jaccard_pairs``
    (id_a, id_b, shared, jaccard≥threshold, 6-dp) — and shares its DuckDB
    oracle, which hash-pins that the filter loses nothing.

    The completeness lemma: fix any total order on grams; if
    J(A, B) ≥ t, the SMALLEST gram of A∩B must lie within the first
    ``|X| − ⌈t·|X|⌉ + 1`` grams of BOTH sides (else the intersection fits
    in a suffix of < t·|X| grams — contradiction). So indexing only each
    doc's prefix under a GLOBAL rarity order (ascending document
    frequency, gram hash tie-break) finds every qualifying pair, and the
    quadratic pair-generation work runs over RARE-gram posting lists —
    the frequent grams that explode the plain inverted index never enter
    the index. Prefix length uses ``n − floor(t·n) + 1`` (floor ≤ ceil ⇒
    at most one extra gram, immune to float-⌈0.6·n⌉ ulp errors).

    Plan (all shuffles linear in corpus/candidates, nothing on the
    driver): explode ← shared with the plain path → global DF (bucketed,
    vocab-scale) → DF join → per-doc prefix slice → rare-gram candidate
    pairs (no silent cap — the rarity order bounds posting sizes only
    heuristically, so a posting above ``max_posting`` raises loudly
    instead of OOMing a worker) → pair dedup → semi-filter the per-doc gram lists to
    candidate docs → two hash joins attach both sides' sorted gram lists
    → exact intersection verify. Trades two extra LINEAR shuffles for
    removing the posting-list² blowup — wins exactly where gram-frequency
    skew is real (web corpora); the plain path stays preferable for tiny
    or uniform corpora. Measured on the sf0.1 derived corpus at t=0.6:
    prefix postings are 42.7% of the full explode and pair-generation
    volume is 25.8% of the plain path's (gap grows with skew)."""
    from .groupops import (
        bucketed_aggregate,
        bucketed_group_apply,
        dedup_pairs,
        group_pair_indices,
    )
    from .joins import bucket_hash_join

    exploded = docs_ds.map_batches(
        lambda b: _explode_shingles(b, k, text_col, id_col, _sets_fn),
        batch_format="pyarrow",
    ).materialize()  # reused three times: DF, prefix slice, verify lists

    df = bucketed_aggregate(
        exploded.select_columns(["shingle"]), ["shingle"],
        {"df": ("shingle", "size")}, num_buckets=num_buckets,
    )
    with_df = bucket_hash_join(
        exploded, df, "shingle", "shingle", num_buckets=num_buckets
    )

    def prefix_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "df", "shingle"], kind="mergesort")
        d = g["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        lens = np.diff(np.r_[starts, d.size])
        n = g["n_sh"].to_numpy()[starts]  # == lens (shingles are distinct)
        p = n - np.floor(threshold * n).astype(np.int64) + 1
        p = np.clip(p, 1, lens)
        pos = np.arange(d.size) - np.repeat(starts, lens)
        keep = pos < np.repeat(p, lens)
        return g.loc[keep, ["shingle", "doc_id", "n_sh"]]

    prefix_post = bucketed_group_apply(
        with_df, ["doc_id"], prefix_kernel, num_buckets=num_buckets
    )

    def cand_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "doc_id"], kind="mergesort")
        run = (g["shingle"] != g["shingle"].shift()).cumsum().to_numpy()
        # The rarity-order prefix bound is a HEURISTIC on posting size:
        # short documents made of globally-frequent grams still index
        # those grams, so an adversarial corpus can inflate one posting
        # quadratically. Fail LOUDLY before a worker OOMs (ADVICE r4) —
        # the exact-output contract (shared oracle) forbids silently
        # capping like the plain ngram path's stop-gram cutoff does.
        if run.size:
            biggest = int(np.bincount(run).max())
            if biggest > max_posting:
                raise ValueError(
                    f"prefix_jaccard_pairs: a prefix posting list has "
                    f"{biggest} docs (> max_posting={max_posting}); the "
                    f"pair blowup would be quadratic. Raise max_posting "
                    f"or use ngram_jaccard_pairs' capped plain path."
                )
        ia, ib = group_pair_indices(run, max_group=np.iinfo(np.int64).max)
        if ia.size == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        docs = g["doc_id"].to_numpy()
        a, b = docs[ia], docs[ib]
        swap = a > b
        return pd.DataFrame(
            {"id_a": np.where(swap, b, a), "id_b": np.where(swap, a, b)}
        ).drop_duplicates()

    cands = dedup_pairs(
        bucketed_group_apply(
            prefix_post, ["shingle"], cand_kernel, num_buckets=num_buckets
        ),
        "id_a", "id_b", num_buckets=max(8, num_buckets // 2),
    ).materialize()

    return verify_pairs_exact(exploded, cands, threshold, num_buckets)


def attach_pair_payload(cands, payload_ds, num_buckets: int = 64):
    """Attach per-doc payload columns onto a candidate pair set — the
    shared confirm-half scaffold of every two-phase (propose/verify)
    near-dup join here: exact-Jaccard verify, simhash canon verify, and
    minhash est scoring all ride it. The payload is semi-filtered to
    candidate docs BEFORE its (usually heavy) columns cross the two
    attach joins, so cost scales with candidates, never the corpus.

    ``cands`` must be a MATERIALIZED, NON-EMPTY (id_a, id_b) Dataset
    (callers return a typed empty at the candidate materialize — the
    schemaless-empty rule); ``payload_ds`` carries "doc_id" + payload
    columns. Output: id_a, id_b plus each payload column c as c_a/c_b."""
    from .joins import bucket_hash_join, semi_join_shuffled

    def cand_ids(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(np.concatenate([a, b]))})

    filt = semi_join_shuffled(
        payload_ds, cands.map_batches(cand_ids, batch_format="pyarrow"),
        "doc_id", "doc_id", num_buckets=num_buckets,
    ).materialize()

    def ren(suffix: str):
        def _r(batch: pa.Table) -> pa.Table:
            return pa.table({
                (f"id_{suffix}" if n == "doc_id" else f"{n}_{suffix}"):
                    batch[n]
                for n in batch.column_names
            })

        return _r

    j1 = bucket_hash_join(
        cands, filt.map_batches(ren("a"), batch_format="pyarrow"),
        "id_a", "id_a", num_buckets=max(8, num_buckets // 2),
    )
    return bucket_hash_join(
        j1, filt.map_batches(ren("b"), batch_format="pyarrow"),
        "id_b", "id_b", num_buckets=max(8, num_buckets // 2),
    )


def verify_pairs_exact(exploded, cands, threshold: float,
                       num_buckets: int = 64):
    """EXACT-Jaccard verification of a candidate pair set — the confirm
    half of every two-phase (propose/verify) near-dup join here. The
    per-doc SORTED gram lists are semi-filtered to candidate docs before
    the heavy list payload crosses the two verify joins, so cost scales
    with candidates, never the corpus. ``exploded`` is the
    (shingle, doc_id, n_sh) table (``_explode_shingles``); ``cands`` a
    MATERIALIZED (id_a, id_b) Dataset. Returns the
    ``ngram_jaccard_pairs`` output contract (id_a, id_b, shared,
    jaccard ≥ threshold, 6-dp) — a candidate producer with complete
    recall at the threshold therefore shares its DuckDB oracle."""
    from .groupops import bucketed_group_apply

    if cands.count() == 0:  # typed empty: a schemaless empty candidate
        import ray.data as _rd  # set would poison the verify joins

        return _rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "shared": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))

    def doc_lists(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "shingle"], kind="mergesort")
        d = g["doc_id"].to_numpy()
        s = g["shingle"].to_numpy()
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        return pd.DataFrame(
            {
                "doc_id": d[starts],
                "shingles": np.split(s, starts[1:]),
                "n_sh": np.diff(np.r_[starts, d.size]),
            }
        )

    L = bucketed_group_apply(
        exploded, ["doc_id"], doc_lists, num_buckets=num_buckets
    )
    j2 = attach_pair_payload(cands, L, num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        la = batch["shingles_a"].to_pylist()
        lb = batch["shingles_b"].to_pylist()
        shared = np.array(
            [
                np.intersect1d(
                    np.asarray(x, np.int64), np.asarray(y, np.int64),
                    assume_unique=True,
                ).size
                for x, y in zip(la, lb)
            ],
            np.int64,
        )
        na = batch["n_sh_a"].to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        nb = batch["n_sh_b"].to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        jac = shared / np.maximum(na + nb - shared, 1.0)
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": batch["id_a"].cast(pa.int64()),
                "id_b": batch["id_b"].cast(pa.int64()),
                "shared": pa.array(shared),
                "jaccard": pa.array(np.round(jac, 6)),
            }
        ).filter(pa.array(keep))

    return j2.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_verified(
    docs_ds,
    threshold: float = 0.6,
    bands: int = 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """MinHash-LSH propose → EXACT verify, the standard two-phase
    near-dup join at web scale: banding finds candidate pairs in
    sub-quadratic time (signatures cross the shuffle, never documents),
    then ``verify_pairs_exact`` intersects the real shingle sets so the
    output carries TRUE Jaccard — an estimate can neither admit a false
    pair nor mis-rank a true one. When banding recall is complete at the
    threshold (16 bands × 4 rows catch a J=0.6 pair w.p. ≈0.89 at the
    boundary and ≈1 above it; completeness on the test corpora is pinned
    by tests + the shared hash oracle), the output EQUALS
    ``ngram_jaccard_pairs`` — same columns, same values, same DuckDB
    oracle. The corpus is touched twice (signatures, then candidate-doc
    gram lists) and both passes are pure maps + bucketed shuffles."""
    cands = minhash_lsh_pairs(
        docs_ds, threshold=0.0, bands=bands, k=k,
        text_col=text_col, id_col=id_col, _emit_est=False,
        num_buckets=num_buckets,
    ).materialize()
    exploded = docs_ds.map_batches(
        lambda b: _explode_shingles(b, k, text_col, id_col, None),
        batch_format="pyarrow",
    )
    return verify_pairs_exact(exploded, cands, threshold, num_buckets)


def simhash_dup_pairs(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    max_group: int = 10_000,
):
    """EXACT token-multiset duplicate pairs via SimHash blocking: simhash
    is order-insensitive, so equal multisets ALWAYS collide — grouping on
    the 64-bit code has complete recall by construction, and only the
    8-byte code crosses the blocking shuffle. Each candidate pair is then
    verified against the real canonicalized (sorted-token) strings, so a
    64-bit collision can never fabricate a pair: the output is exactly
    the multiset-duplicate pair set, which SQL expresses directly
    (group docs on their sorted token list) — a full DuckDB oracle for
    the SimHash blocking machinery. Output (id_a, id_b), id_a < id_b.

    A simhash group larger than ``max_group`` raises loudly (pairs are
    quadratic in group size and the exact contract forbids a silent cap —
    same posture as ``prefix_jaccard_pairs``)."""
    import pyarrow.compute as pc

    from .groupops import bucketed_group_apply, group_pair_indices

    def with_hash(batch: pa.Table) -> pa.Table:
        # NULL text has no token multiset and never pairs — mirrors the
        # oracle's SQL semantics (string_split(NULL) is NULL and
        # NULL = NULL is never true), which would otherwise omit pairs
        # the engine emitted on null-text corpora
        batch = batch.filter(pc.is_valid(batch[text_col]))
        vals = simhash64_many(batch[text_col].to_pylist())
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "simhash": pa.array(vals, pa.int64()),
        })

    hashed = docs_ds.map_batches(with_hash, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["simhash", "doc_id"], kind="mergesort")
        run = (g["simhash"] != g["simhash"].shift()).cumsum().to_numpy()
        if run.size:
            biggest = int(np.bincount(run).max())
            if biggest > max_group:
                raise ValueError(
                    f"simhash_dup_pairs: a simhash group has {biggest} "
                    f"docs (> max_group={max_group}); pair volume would "
                    f"be quadratic. Deduplicate with exact_dedup first."
                )
        ia, ib = group_pair_indices(run, max_group=np.iinfo(np.int64).max)
        if ia.size == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        d = g["doc_id"].to_numpy()
        a, b = d[ia], d[ib]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    cands = bucketed_group_apply(
        hashed, ["simhash"], bucket_pairs, num_buckets=num_buckets
    ).materialize()
    if cands.count() == 0:  # typed empty (group-apply output has no schema)
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
        }))

    def canon(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        return pa.table({
            "doc_id": pa.array(ids),
            "canon": pa.array(
                [" ".join(sorted(t.split(" "))) if t else "" for t in texts],
                pa.string(),
            ),
        })

    j2 = attach_pair_payload(
        cands, docs_ds.map_batches(canon, batch_format="pyarrow"),
        num_buckets,
    )

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["canon_a"], batch["canon_b"])
        out = batch.filter(pc.fill_null(keep, False))
        return pa.table({
            "id_a": out["id_a"].cast(pa.int64()),
            "id_b": out["id_b"].cast(pa.int64()),
        })

    return j2.map_batches(verify, batch_format="pyarrow")
