"""Benchmark decontamination — flag training documents that share a word
n-gram with an evaluation/benchmark set (the standard eval-leak scrub run
before a corpus ships to training; n = 8..13 word-grams in published
practice).

Scale shape: the BENCHMARK side is small by definition (eval suites are
10^5–10^6 grams), so its distinct n-gram set is collected once and
broadcast via ``ray.put`` — read once per worker, never re-shipped per
batch. The corpus side is a pure vectorized map stage: token explode via
Arrow list offsets, gram assembly as ``n-1`` elementwise object-array
concatenations, membership via one ``np.isin`` against the broadcast
sorted array. No shuffle touches the corpus.

Tokenizer is the engine-wide single-space split, so the DuckDB oracle
(``string_split(text, ' ')`` + a ``lead()`` window chain) sees identical
grams — exact parity, no hashing on either side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import _split_tokens


def doc_ngrams(batch: pa.Table, text_col: str, n: int):
    """(doc_row_index, gram_string) arrays for every word n-gram in the
    batch — vectorized over the flat token array."""
    _, offsets, flat = _split_tokens(batch[text_col])
    n_tok = (offsets[1:] - offsets[:-1]).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n_tok)), n_tok)
    toks = np.asarray(flat.to_pandas(), dtype=object)
    m = len(toks) - n + 1
    if m <= 0:
        return np.empty(0, np.int64), np.empty(0, object)
    # a gram starting at i is valid iff token i+n-1 is in the same doc
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    grams = toks[:m].copy()
    for k in range(1, n):
        grams = grams + " "
        grams = grams + toks[k : m + k]
    return doc_idx[:m][valid], grams[valid]


def benchmark_gram_set(benchmark_ds, text_col: str = "text", n: int = 8):
    """Distinct n-grams of the (small) benchmark side as a sorted object
    array, deduped streaming on the driver."""
    grams: set = set()

    def explode(batch: pa.Table) -> pa.Table:
        _, g = doc_ngrams(batch, text_col, n)
        # per-batch dedup before anything leaves the task
        return pa.table({"g": pa.array(np.unique(g), pa.string())})

    for b in benchmark_ds.map_batches(
        explode, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        grams.update(b["g"].to_pylist())
    return np.sort(np.array(sorted(grams), dtype=object))


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
        d_idx, grams = doc_ngrams(batch, text_col, n)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if grams.size and cache["b"].size:
            hit = np.isin(grams, cache["b"])
            contaminated[np.unique(d_idx[hit])] = True
        return pa.table(
            {
                id_col: batch[id_col],
                "contaminated": pa.array(contaminated),
            }
        )

    return corpus_ds.map_batches(flag, batch_format="pyarrow")
