"""Benchmark decontamination — flag training documents that share a word
n-gram with an evaluation/benchmark set (the standard eval-leak scrub run
before a corpus ships to training; n = 8..13 word-grams in published
practice).

Scale shape: the BENCHMARK side is small by definition (eval suites are
10^5–10^6 grams), so its distinct n-gram-hash set is collected once and
broadcast via ``ray.put`` — read once per worker, never re-shipped per
batch. The corpus side is a pure vectorized map stage: token explode via
Arrow list offsets, per-token FNV hashes folded into order-sensitive
64-bit gram hashes (one numpy sweep per gram position — no Python string
objects in the hot path), membership via one sorted-uint64 ``np.isin``
against the broadcast array. No shuffle touches the corpus.

Tokenizer is the engine-wide single-space split, so the DuckDB oracle
(``string_split(text, ' ')`` + a ``lead()`` window chain) sees identical
grams; the only engine-side approximation is the 64-bit gram hash, whose
spurious-match probability is ≈ n_corpus_grams × n_bench_grams / 2^64
(~1e-9 at 1e6 × 1e4 — far below any realistic flake rate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupops import _hash_strings, _splitmix64
from .textstats import _split_tokens

_PRIME = np.uint64(0x100000001B3)


def doc_ngram_hashes(batch: pa.Table, text_col: str, n: int):
    """(doc_row_index, gram_hash) arrays for every word n-gram in the
    batch. Grams are represented by an order-sensitive splitmix64 fold of
    the per-token FNV hashes — one numpy sweep per gram position instead
    of materializing ~n× the text as Python string objects (measured 5×
    faster at 1M grams/batch). Equal token sequences ⇒ equal hashes;
    spurious equality needs a 64-bit collision (P ≈ n_corpus_grams ×
    n_bench_grams / 2^64 — ~1e-9 even at 1e6 × 1e4)."""
    _, offsets, flat = _split_tokens(batch[text_col])
    n_tok = (offsets[1:] - offsets[:-1]).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n_tok)), n_tok)
    th = _splitmix64(_hash_strings(flat))
    m = len(th) - n + 1
    if m <= 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    # a gram starting at i is valid iff token i+n-1 is in the same doc
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    h = th[:m].copy()
    for k in range(1, n):
        h = _splitmix64(h * _PRIME ^ th[k : m + k])
    return doc_idx[:m][valid], h[valid]


def benchmark_gram_set(benchmark_ds, text_col: str = "text", n: int = 8):
    """Distinct n-gram hashes of the (small) benchmark side as a sorted
    uint64 array, deduped per batch then on the driver."""
    parts: list = []

    def explode(batch: pa.Table) -> pa.Table:
        _, g = doc_ngram_hashes(batch, text_col, n)
        # per-batch dedup before anything leaves the task
        return pa.table({"g": pa.array(np.unique(g))})

    for b in benchmark_ds.map_batches(
        explode, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        parts.append(b["g"].to_numpy(zero_copy_only=False).astype(np.uint64))
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    corpus_ds,
    benchmark_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
):
    """→ (id_col, contaminated bool) per corpus row: True iff the row
    shares ≥1 word n-gram with any benchmark row."""
    import ray

    bench = benchmark_gram_set(benchmark_ds, text_col=text_col, n=n)
    bench_ref = ray.put(bench)
    cache: dict = {}

    def flag(batch: pa.Table) -> pa.Table:
        if "b" not in cache:
            cache["b"] = ray.get(bench_ref)
        d_idx, grams = doc_ngram_hashes(batch, text_col, n)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if grams.size and cache["b"].size:
            # sorted-uint64 membership (np.isin uses a sort-merge here —
            # no Python string comparisons anywhere in the hot path)
            hit = np.isin(grams, cache["b"])
            contaminated[np.unique(d_idx[hit])] = True
        return pa.table(
            {
                id_col: batch[id_col],
                "contaminated": pa.array(contaminated),
            }
        )

    return corpus_ds.map_batches(flag, batch_format="pyarrow")
