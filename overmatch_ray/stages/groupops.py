"""Bucketed group operations — the scale-safe replacement for per-group
``map_groups`` dispatch.

Ray's ``groupby(key).map_groups(fn)`` calls ``fn`` once per key group with
~1 ms of fixed overhead; with millions of tiny groups (shingle inverted
index, per-pair dedup, per-phash dedup) that overhead dominates wall time.
The pattern here: group by ``hash(key) % B`` instead (B ≈ a few × CPUs), so
one vectorized callable processes a whole bucket of key-groups at once —
group boundaries recovered with numpy, not the scheduler.

Deterministic hashing only (splitmix64 / crc32) — never Python ``hash``
(PYTHONHASHSEED would break cross-process determinism).
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64

# bit pattern every null/NaN key canonicalizes to before hashing, across
# BOTH the int and float branches of hash_columns (int64 view of the
# canonical quiet NaN) — nullable int keys and their float64-upcast twins
# must co-bucket their null rows in chained joins
_CANON_NAN_BITS = np.int64(np.float64(np.nan).view(np.int64))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


_FNV_BASIS = _U64(0xCBF29CE484222325)
_FNV_PRIME = _U64(0x100000001B3)


def _hash_strings(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized deterministic FNV-1a over a string column's utf-8 bytes,
    read straight from the Arrow offsets/data buffers (zero-copy) and folded
    as one numpy sweep per byte-column. Nulls hash as empty strings."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    outs = []
    for ch in chunks:
        if ch.null_count:
            ch = ch.fill_null("")
        ch = ch.cast(pa.large_string())
        offsets = np.frombuffer(ch.buffers()[1], dtype=np.int64)[
            ch.offset : ch.offset + len(ch) + 1
        ]
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        starts, lens = offsets[:-1], np.diff(offsets)
        h = np.full(len(ch), _FNV_BASIS, dtype=np.uint64)
        j = 0
        active = np.flatnonzero(lens > 0)
        while active.size:
            b = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * _FNV_PRIME
            j += 1
            active = active[lens[active] > j]
        outs.append(h)
    return np.concatenate(outs) if outs else np.empty(0, np.uint64)


def hash_columns(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key columns."""
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in cols:
        col = batch[c]
        if pa.types.is_integer(col.type):
            # widen to int64 first so e.g. int32(-5) and int64(-5) hash
            # alike; NULLS canonicalize to the SAME bit pattern the float
            # branch uses, so a nullable int key and its float64-upcast
            # twin co-bucket their null rows too (the old NaN→astype path
            # produced INT64_MIN here but canonical-NaN bits there)
            i64 = pc.fill_null(col.cast(pa.int64(), safe=False), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            if col.null_count:
                i64 = i64.copy()
                nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
                i64[nulls] = _CANON_NAN_BITS
            h = _splitmix64(i64.view(np.uint64))
        elif pa.types.is_floating(col.type):
            # floats bucket CONSISTENTLY with integers for integral
            # values (groupby shuffles can float64-upcast nulled int
            # columns — a chained join must co-bucket 5 and 5.0); exact
            # bit patterns otherwise, with -0.0 normalized to 0.0 and
            # every NaN/null collapsed to one canonical pattern. The old
            # str()-CRC fallback bucketed "-0.0" vs "0.0" apart, so the
            # within-bucket kernel never saw value-equal rows meet.
            f = col.cast(pa.float64()).to_numpy(zero_copy_only=False).copy()
            f[np.isnan(f)] = np.nan
            f[f == 0.0] = 0.0
            u = f.view(np.uint64).copy()
            integral = (np.trunc(f) == f) & (f >= -(2.0**63)) & (f < 2.0**63)
            u[integral] = f[integral].astype(np.int64).view(np.uint64)
            h = _splitmix64(u)
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = _splitmix64(_hash_strings(col))
        else:
            h = np.fromiter(
                (zlib.crc32(str(v).encode()) for v in col.to_pylist()),
                dtype=np.uint64,
                count=batch.num_rows,
            )
            h = _splitmix64(h)
        acc = _splitmix64(acc * _U64(0x100000001B3) ^ h)
    return acc


def bucketed_group_apply(ds, key_cols: list[str], fn, num_buckets: int = 64):
    """``groupby(hash(keys) % B).map_groups(fn)``: ``fn`` (pandas in/out)
    receives a whole bucket — every row of every key-group that hashed to
    the bucket — and is responsible for its own within-bucket grouping
    (vectorized). Replaces per-key map_groups for high-cardinality keys."""

    def tag(batch: pa.Table) -> pa.Table:
        b = (hash_columns(batch, key_cols) % _U64(num_buckets)).astype(np.int64)
        return batch.append_column("__gbucket", pa.array(b))

    def run_bucket(g: pd.DataFrame):
        out = fn(g.drop(columns="__gbucket"))
        if isinstance(out, pd.DataFrame):
            # hand Ray a metadata-free Arrow block: pandas→arrow conversion
            # (Ray's or from_pandas) attaches a b'pandas' schema-metadata
            # dict that is unhashable in this pyarrow build and defeats the
            # shuffle schema-dedup early exit downstream
            out = pa.Table.from_pandas(
                out, preserve_index=False
            ).replace_schema_metadata(None)
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__gbucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def bucketed_aggregate(ds, key_cols: "list[str]",
                       spec: "dict[str, tuple[str, str]]",
                       num_buckets: int = 32):
    """High-cardinality ``groupby(keys).aggregate(...)`` without the
    per-group Python constant: Ray's sort-based aggregate reduce combines
    each GROUP in Python (~30 µs — measured 7-10 s for 224k mostly-
    singleton groups at 16 CPUs, independent of shuffle strategy), so a
    corpus-scale key column pays it per distinct key. This shuffles the
    same rows once by ``hash(keys) % B`` and runs ONE vectorized pandas
    groupby per bucket (C-speed) — same results, the constant gone.

    ``spec``: output_column → (input_column, op); op is any pandas named-
    agg reduction ("min", "max", "sum", "size", "nunique", ...).
    ONLY order-insensitive ops are safe: within-bucket row order tracks
    block arrival, which varies with parallelism — "first"/"last" and
    float "sum" would break the partition-invariance every caller relies
    on (every current site uses min/max/size or INTEGER sums).
    For row counts use ("<any col>", "size") — matches Ray's ``Count()``.
    Output: one row per distinct key (key_cols + spec keys), unordered
    across buckets (key-sorted within). Use Ray's native aggregate for
    BOUNDED key domains — its per-block partial combine moves less data
    when groups are few and heavy; this helper is for when groups are
    many and light."""
    import pandas as pd_

    def kernel(g: pd_.DataFrame) -> pd_.DataFrame:
        agg = g.groupby(key_cols, sort=True, dropna=False).agg(
            **{out: (col, op) for out, (col, op) in spec.items()}
        ).reset_index()
        for out, (_c, op) in spec.items():
            if op in ("size", "nunique"):
                agg[out] = agg[out].astype(np.int64)
        return agg

    return bucketed_group_apply(ds, key_cols, kernel, num_buckets=num_buckets)


def dedup_pairs(ds, id_a: str = "id_a", id_b: str = "id_b", num_buckets: int = 32):
    """Drop duplicate (id_a, id_b) rows (e.g. a pair surfacing from several
    LSH bands) — vectorized drop_duplicates per hash bucket."""
    return bucketed_group_apply(
        ds,
        [id_a, id_b],
        lambda g: g.sort_values([id_a, id_b], kind="mergesort").drop_duplicates(
            [id_a, id_b]
        ),
        num_buckets=num_buckets,
    )


def exact_quantiles(ds, col: str, ps: "list[float]", round_to: int = 6):
    """EXACT linear-interpolated quantiles of a numeric column, computed
    distributed: collapse to a (value, count) table with one sort-based
    aggregate — the only thing that ever leaves the cluster — then
    interpolate on the driver with the standard ``h = (n-1)·p`` rule (the
    same rule DuckDB's ``quantile_cont`` uses, so results hash-match).

    SIZING ASSUMPTION: distinct(col) must be driver-small. That holds for
    decimal-quantized measures (a 2-decimal value in [0, 100] has ≤ 10k
    distinct values regardless of row count); for continuous doubles use a
    sketch instead. Returns a pyarrow Table (p, q)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(col).aggregate(Count(alias_name="__n")).take_all()
    vals = np.array([r[col] for r in counts], dtype=np.float64)
    ns = np.array([r["__n"] for r in counts], dtype=np.int64)
    order = np.argsort(vals, kind="mergesort")
    vals, ns = vals[order], ns[order]
    cum = np.cumsum(ns)  # cum[i] = #rows ≤ vals[i]
    n = int(cum[-1]) if cum.size else 0
    qs = []
    for p in ps:
        if n == 0:
            qs.append(None)
            continue
        h = (n - 1) * float(p)
        lo_rank, frac = int(np.floor(h)), h - np.floor(h)
        lo = vals[np.searchsorted(cum, lo_rank + 1, side="left")]
        hi = vals[np.searchsorted(cum, min(lo_rank + 1, n - 1) + 1, side="left")]
        q = float(lo + frac * (hi - lo))
        # round_to=None means NO rounding (round(x, None) would round to
        # the nearest INTEGER and silently shift threshold comparisons)
        qs.append(q if round_to is None else round(q, round_to))
    return pa.table(
        {"p": pa.array(list(ps), pa.float64()), "q": pa.array(qs, pa.float64())}
    )


def exact_quantiles_by(
    ds, group_col: str, col: str, ps: "list[float]", round_to: int = 6,
    num_buckets: int = 16,
):
    """Per-group exact quantiles: one (group, value, count) aggregate —
    distinct (group, value) pairs must be shuffle-small (decimal-quantized
    measures) — then per-group interpolation inside a bucketed apply, the
    same ``(n-1)·p`` rule as ``exact_quantiles`` (DuckDB quantile_cont
    parity). Output rows: (group_col, p, q)."""
    from ray.data.aggregate import Count

    counts = ds.groupby([group_col, col]).aggregate(Count(alias_name="__n"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        out_g, out_p, out_q = [], [], []
        for key, sub in g.groupby(group_col, sort=False):
            sub = sub.sort_values(col, kind="mergesort")
            vals = sub[col].to_numpy(dtype=np.float64)
            cum = np.cumsum(sub["__n"].to_numpy(dtype=np.int64))
            n = int(cum[-1])
            for p in ps:
                h = (n - 1) * float(p)
                lo_rank, frac = int(np.floor(h)), h - np.floor(h)
                lo = vals[np.searchsorted(cum, lo_rank + 1, side="left")]
                hi = vals[
                    np.searchsorted(cum, min(lo_rank + 1, n - 1) + 1, side="left")
                ]
                q = float(lo + frac * (hi - lo))
                out_g.append(key)
                out_p.append(float(p))
                # round_to=None means NO rounding (round(x, None) would
                # round to the nearest INTEGER — same guard as
                # exact_quantiles)
                out_q.append(q if round_to is None else round(q, round_to))
        return pd.DataFrame({group_col: out_g, "p": out_p, "q": out_q})

    return bucketed_group_apply(
        counts, [group_col], per_group, num_buckets=num_buckets
    )


def association_pairs(
    ds, basket_col: str, item_col: str, min_support: int = 2, k: int = 100,
    num_buckets: int = 32, max_basket: int = 10_000,
):
    """Market-basket association mining: unordered item pairs that
    co-occur in at least ``min_support`` baskets, scored by lift
    ``n_baskets·c_ab / (c_a·c_b)``, top-``k`` by (rounded lift DESC,
    pair) — the co-purchase / co-occurrence miner every feature-store
    pipeline wants, as one Ray Data plan.

    Plan: distinct (basket, item) via a bucketed aggregate (never the
    native per-group reduce — basket cardinality ≈ rows), in-bucket pair
    expansion over baskets (``group_pair_indices``; baskets above
    ``max_basket`` are stop-baskets — the documented inverted-index
    trade-off, set it above your basket-size bound for exact output),
    bucketed pair counts, item marginals attached via two bucketed hash
    joins (pair-count-bounded), then one k-bounded global sort. Lift is
    computed as the literal float64 chain ``(n·c_ab) / (c_a·c_b)`` —
    exact integers under 2^53 — and ROUNDED before the ordering so the
    SQL oracle's ORDER BY sees identical keys."""
    distinct = bucketed_aggregate(
        ds, [basket_col, item_col], {"__one": (item_col, "size")},
        num_buckets=num_buckets,
    )
    n_baskets = bucketed_aggregate(
        distinct, [basket_col], {"__n": (item_col, "size")},
        num_buckets=num_buckets,
    ).count()

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([basket_col, item_col], kind="mergesort")
        b = g[basket_col].to_numpy()
        items = g[item_col].to_numpy()
        ia, ib = group_pair_indices(b, max_basket)
        return pd.DataFrame({"item_a": items[ia], "item_b": items[ib]})

    pairs = bucketed_aggregate(
        bucketed_group_apply(
            distinct, [basket_col], expand, num_buckets=num_buckets
        ),
        ["item_a", "item_b"], {"support": ("item_a", "size")},
        num_buckets=num_buckets,
    )

    marg = bucketed_aggregate(
        distinct, [item_col], {"__c": (item_col, "size")},
        num_buckets=num_buckets,
    )
    from .joins import bucket_hash_join

    def ren(name_key: str, name_c: str):
        def _r(batch: pa.Table) -> pa.Table:
            return pa.table({name_key: batch[item_col],
                             name_c: batch["__c"]})

        return _r

    j = bucket_hash_join(
        pairs.materialize(),
        marg.map_batches(ren("item_a", "__ca"), batch_format="pyarrow"),
        "item_a", "item_a", num_buckets=num_buckets,
    )
    j = bucket_hash_join(
        j, marg.map_batches(ren("item_b", "__cb"), batch_format="pyarrow"),
        "item_b", "item_b", num_buckets=num_buckets,
    )

    def score(batch: pa.Table) -> pa.Table:
        sup = batch["support"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = batch["__ca"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = batch["__cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = sup >= min_support
        lift = np.round(
            (float(n_baskets) * sup[keep]) / (ca[keep] * cb[keep]), 6
        )
        return pa.table({
            "item_a": pa.array(
                batch["item_a"].to_numpy(zero_copy_only=False)[keep]
            ).cast(pa.int64()),
            "item_b": pa.array(
                batch["item_b"].to_numpy(zero_copy_only=False)[keep]
            ).cast(pa.int64()),
            "support": pa.array(sup[keep]),
            "lift": pa.array(lift),
        })

    return (
        j.map_batches(score, batch_format="pyarrow")
        .sort(["lift", "item_a", "item_b"], descending=[True, False, False])
        .limit(k)
    )


def filter_by_group_quantile(
    ds, group_col: str, value_col: str, p: float, keep: str = "ge",
    num_buckets: int = 16,
):
    """Per-group quantile threshold filter — calibrated pruning (the
    FineWeb-style move: threshold each language/source against ITS OWN
    score distribution so a global cut can't wipe out low-resource
    domains). Keeps rows whose value is >= (``keep="ge"``) or <=
    (``keep="le"``) their group's exact p-quantile.

    Two passes: the ``exact_quantiles_by`` value-count collapse (shuffle
    volume = distinct (group, value) pairs), a driver gather BOUNDED by
    the group count (calibration domains are small by construction —
    document the assumption, don't feed it 1e9 groups), then a pure
    broadcast-bound filter map over sorted key arrays (no per-row dict
    probes). With integer-valued measures the (n−1)p interpolation is
    exact in float64, so the boundary compare is bit-stable against a
    quantile_cont SQL oracle."""
    rows = exact_quantiles_by(
        ds, group_col, value_col, [p], round_to=None, num_buckets=num_buckets
    ).take_all()
    keys = np.array([str(r[group_col]) for r in rows])
    thrs = np.array([float(r["q"]) for r in rows], dtype=np.float64)
    order = np.argsort(keys)
    keys, thrs = keys[order], thrs[order]
    ge = keep == "ge"

    def kernel(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col].to_pylist(), dtype=keys.dtype)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(keys, g)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        known = keys[idx_c] == g
        t = thrs[idx_c]
        mask = known & ((v >= t) if ge else (v <= t))
        return batch.filter(pa.array(mask))

    return ds.map_batches(kernel, batch_format="pyarrow")


def histogram_quantiles(
    ds, col: str, ps: "list[float]", bins: int = 4096, round_to: int = 6,
):
    """Approximate quantiles for CONTINUOUS columns (where the exact
    value-count collapse of ``exact_quantiles`` would be O(rows)): two
    passes — (1) exact min/max aggregate, (2) fixed-bin histogram counts
    summed distributed (each batch contributes one ``bins``-long count
    vector; the shuffle moves bins, never rows) — then linear
    interpolation inside the covering bin. Deterministic; max error ≤ one
    bin width = (max−min)/bins. Returns a pyarrow Table (p, q)."""
    from ray.data.aggregate import Max, Min, Sum

    stats = ds.aggregate(Min(col), Max(col))
    if stats is None or stats.get(f"min({col})") is None:  # empty input
        return pa.table(
            {"p": pa.array(list(ps), pa.float64()),
             "q": pa.array([None] * len(ps), pa.float64())}
        )
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if not np.isfinite(lo) or lo == hi:
        return pa.table(
            {"p": pa.array(list(ps), pa.float64()),
             "q": pa.array([lo] * len(ps), pa.float64())}
        )
    width = (hi - lo) / bins

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        counts, _ = np.histogram(v, bins=bins, range=(lo, hi))
        return pa.table(
            {
                "bin": pa.array(np.arange(bins, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    counts = np.zeros(bins, dtype=np.int64)
    for r in agg:
        counts[r["bin"]] = r["n"]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    qs = []
    for p in ps:
        rank = p * (n - 1)
        b = int(np.searchsorted(cum, rank + 1, side="left"))
        prev = cum[b - 1] if b else 0
        inside = counts[b] if counts[b] else 1
        frac = (rank + 1 - prev) / inside
        q = lo + (b + min(max(frac, 0.0), 1.0)) * width
        # round_to=None = NO rounding (same guard as exact_quantiles)
        qs.append(q if round_to is None else round(q, round_to))
    return pa.table(
        {"p": pa.array(list(ps), pa.float64()), "q": pa.array(qs, pa.float64())}
    )


def concat_ranges(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """``np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)])``
    without the per-range Python loop: one repeat/cumsum gather (measured
    23× at 200k ranges — the candidate-expansion hot path of the matcher
    and the spatial join family). Empty ranges contribute nothing."""
    lo = np.asarray(lo, np.int64)
    c = np.maximum(np.asarray(hi, np.int64) - lo, 0)
    total = int(c.sum())
    if total == 0:
        return np.empty(0, np.int64)
    offs = np.concatenate([[0], np.cumsum(c)[:-1]])
    return np.arange(total) - np.repeat(offs, c) + np.repeat(lo, c)


def group_pair_indices(
    keys_sorted: np.ndarray, max_group: int
) -> tuple[np.ndarray, np.ndarray]:
    """Given a SORTED key array, return (ia, ib) row-index pairs for every
    unordered pair within each equal-key run of size ∈ [2, max_group].
    Runs larger than max_group are stop-keys and skipped (documented
    inverted-index trade-off)."""
    if keys_sorted.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    _, starts, counts = np.unique(keys_sorted, return_index=True, return_counts=True)
    ia_all, ib_all = [], []
    for s, c in zip(starts, counts):
        if 2 <= c <= max_group:
            ia, ib = np.triu_indices(c, k=1)
            ia_all.append(ia + s)
            ib_all.append(ib + s)
    if not ia_all:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ia_all), np.concatenate(ib_all)


# --- HyperLogLog (approximate distinct count) ------------------------------

_HLL_P = 12  # 4096 registers → ~1.6% standard error


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (6 shift steps —
    no float rounding, unlike a log2-based scan which miscounts near
    powers of two at >53-bit magnitudes)."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    zero = x == 0
    for shift in (32, 16, 8, 4, 2, 1):
        z = (x >> np.uint64(64 - shift)) == 0
        n[z] += shift
        x = np.where(z, x << np.uint64(shift), x)
    n[zero] = 64
    return n


def _hll_registers(h: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    """Register maxima for one batch of uint64 hashes: index = top p bits,
    rho = 1 + leading-zero count of the remaining 64-p bits (capped at
    64-p+1 when the suffix is all zeros)."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # suffix in the high bits
    rho = np.minimum(_clz64(rest) + 1, 64 - p + 1)
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rho.astype(np.int8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, p: int = _HLL_P) -> int:
    """Approximate COUNT(DISTINCT col) via a distributed HyperLogLog:
    each batch collapses to its 2^p register maxima (emitted as
    (register, rho) rows — a FIXED-size partial regardless of batch
    rows), one ``groupby(register).max()`` merges them (registers, never
    rows, cross the shuffle), and the driver folds 2^p rows into the
    estimate. Deterministic: splitmix64/FNV hashing, max is
    order-invariant. Standard error ≈ 1.04/√2^p (~1.6% at p=12)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch, [col])
        regs = _hll_registers(h, p)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "reg": pa.array(nz.astype(np.int64)),
                "rho": pa.array(regs[nz].astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .max("rho")
        .take_all()
    )
    regs = np.zeros(1 << p, dtype=np.int8)
    for r in rows:
        regs[r["reg"]] = r["max(rho)"]
    return int(round(hll_estimate(regs)))


def approx_distinct_by(ds, group_col: str, col: str, p: int = _HLL_P):
    """Per-GROUP approximate COUNT(DISTINCT col): one HyperLogLog per
    group, all maintained in a single vectorized pass — per batch the
    groups are dictionary-encoded and every (group, register) pair maps to
    one slot of a composite dense array (``code * 2^p + register``), so
    ``np.maximum.at`` folds the whole batch at once; only NONZERO
    (group, register, rho) rows are emitted (≤ distinct values in the
    batch, never 2^p per group). One ``groupby([group, register]).max``
    merges partials — registers, never rows, cross the shuffle — and the
    driver folds ≤ |groups|·2^p rows into per-group estimates (bounded
    group cardinality, same contract as the grouped heavy hitters).

    Rows with a null group or null value are excluded (SQL
    COUNT(DISTINCT) semantics — unlike the global ``approx_distinct``,
    which hashes nulls as empty strings). Deterministic at any
    parallelism (max is order-invariant). Returns a pyarrow Table
    (group_col, n_distinct_est)."""
    import pyarrow.compute as pc

    grp_type = ds.schema().base_schema.field(group_col).type
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch[group_col]), pc.is_valid(batch[col]))
        t = batch.select([group_col, col]).filter(valid)
        if t.num_rows == 0:
            return pa.table({"grp": pa.array([], grp_type),
                             "reg": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = hash_columns(t, [col])
        enc = t[group_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = np.minimum(_clz64(h << np.uint64(p)) + 1, 64 - p + 1)
        regs = np.zeros(len(enc.dictionary) * m, dtype=np.int8)
        np.maximum.at(regs, codes * m + idx, rho.astype(np.int8))
        nz = np.flatnonzero(regs)
        return pa.table({
            "grp": enc.dictionary.take(pa.array(nz // m, pa.int64())),
            "reg": pa.array(nz % m),
            "rho": pa.array(regs[nz].astype(np.int64)),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["grp", "reg"])
        .max("rho")
        .take_all()  # bounded: <= |groups| * 2^p sketch rows
    )
    per_grp: dict = {}
    for r in rows:
        per_grp.setdefault(r["grp"], np.zeros(m, dtype=np.int8))[r["reg"]] = (
            r["max(rho)"]
        )
    grps = sorted(per_grp)
    return pa.table({
        group_col: pa.array(grps, grp_type),
        "n_distinct_est": pa.array(
            [int(round(hll_estimate(per_grp[g]))) for g in grps], pa.int64()
        ),
    })


def _mg_compress(counts: np.ndarray, k: int) -> "tuple[np.ndarray, np.ndarray]":
    """Misra-Gries compress of exact (item, count) pairs down to <= k
    counters: subtract the (k+1)-th largest count from every count and keep
    the positive ones. Returns (keep_indices, residual_counts). The
    per-item decrement d satisfies d*(k+1) <= sum(top k+1 counts) <= N, so
    every item undercounts by <= N/(k+1) — the standard mergeable-summary
    bound (Agarwal et al., "Mergeable Summaries", PODS'12)."""
    if counts.size <= k:
        return np.arange(counts.size), counts
    d = np.partition(counts, counts.size - (k + 1))[counts.size - (k + 1)]
    keep = np.flatnonzero(counts > d)
    return keep, counts[keep] - d


def heavy_hitters(ds, col: str, denom: int = 1000, k: "int | None" = None):
    """EXACT frequent items: every non-null value of ``col`` whose count is
    >= ceil(N / denom) (N = non-null rows), with its exact count — the
    integer-threshold form keeps Ray/SQL oracle parity free of
    float-vs-DECIMAL rounding.

    Two sketch-bounded passes instead of a full groupby(col) (whose shuffle
    would move every row at 100 TB):

    1. CANDIDATES: each batch collapses to an exact value_counts compressed
       by Misra-Gries to <= k counters (``k`` defaults to 2*denom), so each
       partial is sketch-sized regardless of batch rows; one
       groupby(item).sum merges residuals. Total decrement per item across
       all batches is <= N/(k+1), so pruning at
       ``sum(residual) >= threshold - N//(k+1)`` provably keeps every true
       heavy hitter while bounding the candidate set to ~2*denom items.
    2. VERIFY: the candidate set is broadcast into a per-batch is_in +
       value_counts; one candidate-bounded groupby.sum yields exact counts,
       filtered at the threshold.

    Three narrow scans of the input (N-count, candidates, verify) — scans
    stream and re-execute; only sketch-sized rows ever cross a shuffle.
    Returns a pyarrow Table (item, cnt) with ``item`` in the column's type.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if k is None:
        k = 2 * denom
    if k + 1 <= denom:
        raise ValueError(f"need k+1 > denom for the MG guarantee ({k=}, {denom=})")

    item_type = ds.schema().base_schema.field(col).type

    def _nonnull(batch: pa.Table) -> pa.Table:
        c = batch[col]
        return pa.table({"n": pa.array([len(c) - c.null_count], pa.int64())})

    n_total = ds.map_batches(_nonnull, batch_format="pyarrow").sum("n") or 0
    empty = pa.table({"item": pa.array([], item_type),
                      "cnt": pa.array([], pa.int64())})
    if n_total == 0:
        return empty
    threshold = (n_total + denom - 1) // denom
    cutoff = max(threshold - n_total // (k + 1), 1)

    def mg_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[col].combine_chunks().drop_null())
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        keep, resid = _mg_compress(counts, k)
        return pa.table({
            "item": vc.field("values").take(pa.array(keep, pa.int64())),
            "mg": pa.array(resid.astype(np.int64)),
        })

    def prune(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["sum(mg)"], cutoff))

    cand_rows = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("mg"))
        .map_batches(prune, batch_format="pyarrow")
        .take_all()  # bounded: <= N/cutoff ~ 2*denom candidates
    )
    if not cand_rows:
        return empty
    cand_arr = pa.array([r["item"] for r in cand_rows], item_type)

    def verify(batch: pa.Table) -> pa.Table:
        c = batch[col].combine_chunks().drop_null()
        vc = pc.value_counts(c.filter(pc.is_in(c, value_set=cand_arr)))
        return pa.table({
            "item": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = (
        ds.map_batches(verify, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("cnt"))
        .take_all()  # bounded by the candidate set
    )
    rows = [r for r in rows if r["sum(cnt)"] >= threshold]
    return pa.table({
        "item": pa.array([r["item"] for r in rows], item_type),
        "cnt": pa.array([r["sum(cnt)"] for r in rows], pa.int64()),
    })


def grouped_heavy_hitters(ds, group_col: str, col: str, denom: int = 1000,
                          k: "int | None" = None):
    """Per-GROUP exact frequent items: for each group g, every non-null
    value of ``col`` whose count within g is >= ceil(N_g / denom), with
    its exact count. Same two-pass Misra-Gries plan as ``heavy_hitters``
    applied per group — the MG bound holds per group because compression
    runs on each group's counters separately, so the per-group undercount
    is <= N_g/(k+1) and pruning at ``cutoff_g = thr_g - N_g//(k+1)``
    provably keeps every true per-group heavy hitter.

    Documented contract: GROUP CARDINALITY is bounded (thresholds and the
    candidate sets are broadcast dicts; the per-batch Python loop is over
    groups present in the batch, never rows). Rows with a null group or
    null item are excluded, matching the SQL oracle's WHERE clause.
    Returns a pyarrow Table (group_col, item, cnt)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if k is None:
        k = 2 * denom
    if k + 1 <= denom:
        raise ValueError(f"need k+1 > denom for the MG guarantee ({k=}, {denom=})")

    sch = ds.schema().base_schema
    grp_type = sch.field(group_col).type
    item_type = sch.field(col).type
    empty = pa.table({group_col: pa.array([], grp_type),
                      "item": pa.array([], item_type),
                      "cnt": pa.array([], pa.int64())})

    def _valid(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch[group_col]), pc.is_valid(batch[col]))
        return batch.select([group_col, col]).filter(m)

    # pass 0: per-group non-null row counts (group-cardinality-bounded)
    def n_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(_valid(batch)[group_col].combine_chunks())
        return pa.table({"grp": vc.field("values"),
                         "n_part": pc.cast(vc.field("counts"), pa.int64())})

    n_rows = (
        ds.map_batches(n_partial, batch_format="pyarrow")
        .groupby("grp").aggregate(Sum("n_part")).take_all()
    )
    if not n_rows:
        return empty
    n_by_grp = {r["grp"]: r["sum(n_part)"] for r in n_rows}
    thr = {g: (n + denom - 1) // denom for g, n in n_by_grp.items()}
    cutoff = {g: max(thr[g] - n_by_grp[g] // (k + 1), 1) for g in thr}

    def _pair_counts(batch: pa.Table) -> "tuple[pa.Table, np.ndarray]":
        t = _valid(batch)
        agg = t.group_by([group_col, col]).aggregate([([], "count_all")])
        return agg, agg["count_all"].to_numpy(zero_copy_only=False)

    def mg_partial(batch: pa.Table) -> pa.Table:
        agg, counts = _pair_counts(batch)
        grps = agg[group_col].to_numpy(zero_copy_only=False)
        if counts.size == 0:
            return pa.table({"grp": pa.array([], grp_type),
                             "item": pa.array([], item_type),
                             "mg": pa.array([], pa.int64())})
        keep_parts = []
        resid_parts = []
        for g in pd.unique(grps):
            idx = np.flatnonzero(grps == g)
            kp, resid = _mg_compress(counts[idx], k)
            keep_parts.append(idx[kp])
            resid_parts.append(resid)
        keep = np.concatenate(keep_parts)
        take = pa.array(keep, pa.int64())
        return pa.table({
            "grp": agg[group_col].take(take),
            "item": agg[col].take(take),
            "mg": pa.array(np.concatenate(resid_parts).astype(np.int64)),
        })

    def prune(batch: pa.Table) -> pa.Table:
        cuts = pa.array(
            [cutoff.get(g, 1) for g in batch["grp"].to_pylist()], pa.int64()
        )  # sketch-sized rows: the pylist loop is over merged counters
        return batch.filter(pc.greater_equal(batch["sum(mg)"], cuts))

    cand_rows = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby(["grp", "item"]).aggregate(Sum("mg"))
        .map_batches(prune, batch_format="pyarrow")
        .take_all()  # bounded: <= ~2*denom per group
    )
    if not cand_rows:
        return empty
    cands: dict = {}
    for r in cand_rows:
        cands.setdefault(r["grp"], []).append(r["item"])
    cand_arrs = {g: pa.array(v, item_type) for g, v in cands.items()}

    def verify(batch: pa.Table) -> pa.Table:
        t = _valid(batch)
        gcol = t[group_col].combine_chunks()
        icol = t[col].combine_chunks()
        parts = []
        for g, arr in cand_arrs.items():
            gm = pc.equal(gcol, pa.scalar(g, grp_type))
            items = icol.filter(pc.and_(
                pc.fill_null(gm, False), pc.is_in(icol, value_set=arr)))
            if len(items) == 0:
                continue
            vc = pc.value_counts(items)
            parts.append(pa.table({
                "grp": pa.array([g] * len(vc), grp_type),
                "item": vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }))
        if not parts:
            return pa.table({"grp": pa.array([], grp_type),
                             "item": pa.array([], item_type),
                             "cnt": pa.array([], pa.int64())})
        return pa.concat_tables(parts)

    rows = (
        ds.map_batches(verify, batch_format="pyarrow")
        .groupby(["grp", "item"]).aggregate(Sum("cnt"))
        .take_all()  # bounded by the candidate sets
    )
    rows = [r for r in rows if r["sum(cnt)"] >= thr[r["grp"]]]
    return pa.table({
        group_col: pa.array([r["grp"] for r in rows], grp_type),
        "item": pa.array([r["item"] for r in rows], item_type),
        "cnt": pa.array([r["sum(cnt)"] for r in rows], pa.int64()),
    })


def heavy_hitter_tokens(ds, text_col: str = "text", denom: int = 1000,
                        k: "int | None" = None):
    """Frequent TOKENS over a text column: single-space tokenization
    (parity with SQL string_split + unnest, empty tokens preserved)
    exploded inside map_batches, then the exact two-pass Misra-Gries
    ``heavy_hitters``. The explode is re-streamed per pass rather than
    materialized — at corpus scale recomputing a narrow split is cheaper
    than parking a token-sized intermediate in the object store."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(
            batch[text_col].combine_chunks().drop_null(), " ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        return pa.table({"item": lst.values})

    return heavy_hitters(
        ds.map_batches(explode, batch_format="pyarrow"), "item",
        denom=denom, k=k,
    )


def exact_corr(ds, x_col: str, y_col: str) -> "tuple[int, float]":
    """Distributed EXACT Pearson correlation of two integer columns:
    per-batch moment partials (n, Σx, Σy, Σx², Σxy, Σy²) summed with
    PYTHON ints (arbitrary precision — Σy² of cent-valued money overflows
    int64 at ~10⁵ rows), combined on the driver (one 6-tuple per batch,
    never rows). The final float expression mirrors the SQL
    ``CAST(num AS DOUBLE) / (sqrt(CAST(vx AS DOUBLE)) * sqrt(...))``
    evaluation order, so the double is bit-identical to an oracle that
    sums in HUGEINT — exact at any partitioning. Returns (n, corr)."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64).tolist()
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64).tolist()
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * b for a, b in zip(x, y))
        return pa.table({
            "m": pa.array([json.dumps([len(x), sx, sy, sxx, sxy, syy])],
                          pa.string()),
        })

    n = sx = sy = sxx = sxy = syy = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s in b["m"].to_pylist():
            pn, px, py_, pxx, pxy, pyy = json.loads(s)
            n += pn; sx += px; sy += py_; sxx += pxx; sxy += pxy; syy += pyy
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx == 0 or vy == 0:
        return n, float("nan")
    return n, float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))


def skyline_2d_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Maximal-vector (skyline / Pareto front) keep-mask, both dims
    MAXIMIZED, integer or float: row i survives iff no row j has
    x_j ≥ x_i AND y_j ≥ y_i with at least one strict. Exact duplicates of
    a surviving point all survive (neither dominates the other).

    O(n log n): per-x-group max y, then a strict running-best sweep in
    descending x — a group survives iff its max-y strictly beats every
    higher-x group's max-y; within a surviving group exactly the max-y
    rows survive."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    ux, inv = np.unique(x, return_inverse=True)  # ascending unique x
    gmax = np.full(len(ux), -np.inf)
    np.maximum.at(gmax, inv, y)
    # best y among STRICTLY higher x: suffix max shifted by one
    suf = np.concatenate([
        np.maximum.accumulate(gmax[::-1])[::-1][1:], [-np.inf]
    ])
    alive = gmax > suf
    keep = alive[inv] & (y == gmax[inv])
    return keep


def skyline_2d(ds, x_col: str, y_col: str, keep_cols: list[str] | None = None):
    """Distributed 2D skyline: per-block Pareto fronts (the combiner —
    skyline(A∪B) ⊆ skyline(A) ∪ skyline(B), so local-then-global is
    EXACT) shrink each block to ~O(log n) rows, then one single-partition
    final pass. No groupby shuffle at all; the reduce moves only the
    union of the tiny local fronts."""
    cols = list(dict.fromkeys([x_col, y_col] + (keep_cols or [])))

    def local(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        m = skyline_2d_mask(
            batch[x_col].to_numpy(zero_copy_only=False),
            batch[y_col].to_numpy(zero_copy_only=False),
        )
        return batch.filter(pa.array(m))

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local, batch_format="pyarrow")
    )


def profile_columns(ds, cols: "list[str]"):
    """One-pass numeric data profiler: per column (n_rows, n_nulls, min,
    max) in LONG format. Each batch emits one partial row per column
    (column-count-bounded, never row-bounded), then one tiny
    groupby(column) combine — the shuffle moves #cols × #blocks rows.
    The standard pre-training data-quality screen."""
    from ray.data.aggregate import Max, Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        rows = {"column_name": [], "n_rows": [], "n_nulls": [],
                "min_v": [], "max_v": []}
        for c in cols:
            col = batch[c]
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            null = int(col.null_count)
            ok = v[~np.isnan(v)] if null or np.isnan(v).any() else v
            rows["column_name"].append(c)
            rows["n_rows"].append(batch.num_rows)
            rows["n_nulls"].append(null)
            rows["min_v"].append(float(ok.min()) if ok.size else np.nan)
            rows["max_v"].append(float(ok.max()) if ok.size else np.nan)
        return pa.table(
            {
                "column_name": pa.array(rows["column_name"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
                "min_v": pa.array(rows["min_v"], pa.float64()),
                "max_v": pa.array(rows["max_v"], pa.float64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("column_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    )
