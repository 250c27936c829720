"""Deterministic dataset split assignment (train/val/test — the standard
final step of a training-data pipeline).

Split membership is a pure function of the row id: the first 8 hex digits
of ``md5(salt + str(id))`` compared against cumulative-fraction thresholds
rendered as hex strings. Properties that matter at 100 TB:

- **partitioning-invariant**: no RNG, no row order, no state — the same
  row lands in the same split at any parallelism or retry;
- **oracle-checkable**: DuckDB's ``md5()`` produces the same digest, and
  fixed-width lowercase-hex strings compare in numeric order, so the
  oracle is a plain CASE over ``substr(md5(...), 1, 8)`` — bit-exact
  parity with no engine-specific hash on either side;
- **composable**: new splits can be carved without reshuffling existing
  ones (thresholds are cumulative).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _hex_bound(cum: float) -> str:
    """Exclusive-upper bound for a cumulative fraction as a FIXED-WIDTH
    comparand: 8 lowercase hex chars, or the sorts-after-any-digest
    sentinel once the fraction covers everything (int(1.0·16^8) would be
    9 characters and break the lexicographic compare)."""
    if cum >= 1.0:
        return "g" * 8
    return format(int(cum * 16**8), "08x")


def split_thresholds(fractions: "dict[str, float]") -> "list[tuple[str, str]]":
    """[(name, exclusive-upper hex bound)] in declaration order; the last
    bound is forced to 'ffffffff'+1 territory so fractions that don't sum
    exactly to 1.0 still cover every row."""
    out = []
    cum = 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        cum += fractions[name]
        bound = "g" * 8 if i == len(names) - 1 else _hex_bound(cum)
        out.append((name, bound))
    return out


def split_of(key: str, thresholds: "list[tuple[str, str]]", salt: str = "") -> str:
    h = hashlib.md5((salt + key).encode()).hexdigest()[:8]
    for name, bound in thresholds:
        if h < bound:
            return name
    return thresholds[-1][0]


def split_assign(
    ds,
    id_col: str,
    fractions: "dict[str, float] | None" = None,
    salt: str = "",
):
    """Append a ``split`` column. ``fractions`` preserves declaration
    order; default 90/5/5 train/val/test."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    thresholds = split_thresholds(fractions)

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].to_pylist()
        splits = [split_of(str(k), thresholds, salt) for k in keys]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(
    ds,
    id_col: str,
    group_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.0,
    salt: str = "",
):
    """Per-group deterministic sampling: each row is kept iff
    ``md5(salt + str(id))[:8] < hex_bound(fraction_of_its_group)`` — the
    ``sample_deterministic`` rule with a group-dependent threshold
    (class-balanced corpus downsampling: e.g. keep 5% of English but 100%
    of low-resource languages). Same 100-TB properties as the flat rule:
    no RNG, no shuffle, partitioning/retry-invariant, and a group's sample
    at a smaller fraction is a strict subset of its larger-fraction sample
    (so re-balancing never resamples disjoint rows)."""
    bounds = {g: _hex_bound(f) for g, f in fractions.items()}
    default_bound = _hex_bound(default_fraction)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].to_pylist()
        groups = batch[group_col].to_pylist()
        mask = [
            hashlib.md5((salt + str(k)).encode()).hexdigest()[:8]
            < bounds.get(g, default_bound)
            for k, g in zip(keys, groups)
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def pack_sequences(
    ds,
    id_col: str,
    weight_col: str,
    budget: int,
    range_size: int = 1 << 20,
    num_buckets: int = 32,
):
    """Token-budget shard assignment for training export (sequence
    packing): rows ordered by ``id_col`` fill shards of ``budget`` tokens;
    a row's shard is ``floor(exclusive_prefix_sum(weight) / budget)`` —
    i.e. the shard its first token lands in when documents are
    concatenated in id order (the standard pre-tokenized-corpus layout).

    Distributed two-phase scan (never a single sequential pass):

    1. rows map to contiguous id ranges (``id // range_size``); one tiny
       ``groupby(range).sum(weight)`` yields per-range totals — O(#ranges)
       on the driver, rows never leave the cluster;
    2. the driver prefix-sums range totals into per-range offsets
       (broadcast as a dict — #ranges entries, not rows);
    3. a bucketed group apply sorts each range's rows by id and adds the
       integer in-range cumsum to the range offset. Integer weights ⇒
       bit-exact at any parallelism.

    At 100 TB: #ranges = max_id / range_size — size ``range_size`` so that
    stays ≈1e5–1e6 (a few MB of offsets) while each range's rows still fit
    a task (~``range_size`` rows upper bound)."""
    import numpy as np
    import pandas as pd

    from .groupops import bucketed_group_apply

    def tag_range(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__range", pa.array(ids // np.int64(range_size))
        )

    tagged = ds.map_batches(tag_range, batch_format="pyarrow")
    # phase 1: per-range totals (tiny — one row per range)
    totals = tagged.groupby("__range").sum(weight_col).take_all()
    scol = f"sum({weight_col})"
    totals.sort(key=lambda r: r["__range"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["__range"])] = acc
        acc += int(r[scol])

    # broadcast the offsets once (ray.put), not per-task closure pickle —
    # #ranges can be ~1e6 entries at scale
    import ray

    offsets_ref = ray.put(offsets)
    cache: dict = {}

    # phase 3: in-range exclusive cumsum + broadcast offset
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        if "o" not in cache:
            cache["o"] = ray.get(offsets_ref)
        offs = cache["o"]
        g = g.sort_values(id_col, kind="mergesort")
        out = []
        for rid, sub in g.groupby("__range", sort=True):
            w = sub[weight_col].to_numpy().astype(np.int64)
            prefix = np.cumsum(w) - w + offs[int(rid)]
            out.append(
                pd.DataFrame(
                    {
                        id_col: sub[id_col].to_numpy(),
                        weight_col: w,
                        "shard_id": prefix // np.int64(budget),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        tagged, ["__range"], assign, num_buckets=num_buckets
    )


def sample_deterministic(ds, id_col: str, fraction: float, salt: str = ""):
    """Keep a deterministic ``fraction`` of rows — same md5-hex-threshold
    rule as ``split_assign`` (partitioning/retry-invariant; disjoint
    samples via different salts; a smaller fraction's sample is a strict
    subset of a larger one's at the same salt)."""
    bound = _hex_bound(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].to_pylist()
        mask = [
            hashlib.md5((salt + str(k)).encode()).hexdigest()[:8] < bound
            for k in keys
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def domain_mix(
    ds,
    id_col: str,
    group_col: str,
    weight_col: str,
    target_weights: "dict[str, float]",
    budget_fraction: float,
    salt: str = "",
):
    """Static data-mixture resampling (the Pile / DoReMi-static recipe):
    given target mixture ``target_weights`` per domain and a total token
    budget expressed as ``budget_fraction`` of the MEASURED corpus mass,
    derive each domain's keep-rate from its measured mass and apply the
    deterministic md5-threshold sample at that rate:

        rate_g = budget_fraction * total_mass * w_g / mass_g   (capped at 1)

    Domains absent from ``target_weights`` get weight 0 → dropped.

    Scale shape: pass 1 is a native groupby-sum over a BOUNDED key domain
    (per-block partial combine; |domains| rows to the driver — the small
    side of the computation by definition); pass 2 is a pure filter map.
    No corpus shuffle, no RNG — same partitioning/retry invariance and
    monotone-subset property as ``sample_deterministic``, so raising the
    budget only ADDS documents (stable curriculum growth).

    Oracle parity: rate is computed as the literal expression
    ``budget_fraction * total * w / t`` (left-assoc float64) and bounds
    via ``_hex_bound`` — mirrored verbatim in SQL (see
    corpus_queries.ORACLE_SQL["domain_mix"])."""
    totals = ds.groupby(group_col).sum(weight_col).take_all()
    mass = {
        r[group_col]: int(r[f"sum({weight_col})"]) for r in totals
    }
    total = sum(mass.values())
    bounds = {
        g: _hex_bound(budget_fraction * total * target_weights[g] / t)
        for g, t in mass.items()
        if g in target_weights and t > 0
    }

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].to_pylist()
        groups = batch[group_col].to_pylist()
        mask = [
            g in bounds
            and hashlib.md5((salt + str(k)).encode()).hexdigest()[:8]
            < bounds[g]
            for k, g in zip(keys, groups)
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def global_shuffle_rank(ds, id_col: str, salt: str = "", num_buckets: int = 32):
    """Deterministic global training-data shuffle: every row gets
    ``shuffle_rank`` = its position when the corpus is ordered by
    ``md5(salt + str(id))`` (full 32-hex-digit string — effectively
    collision-free, so the order is total and reproducible at any
    parallelism, unlike ``random_shuffle``).

    Distributed two-phase scan, mirroring ``pack_sequences``: rows map to
    256 hash ranges by their first two hex digits (uniform by
    construction — md5 IS the balancer, no skew possible), one tiny
    ``groupby(range).count()`` gives range sizes, the driver prefix-sums
    256 offsets, and each range sorts its own rows by digest. Nothing
    sequential ever sees more than one range."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    from .groupops import bucketed_group_apply

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].to_pylist()
        digests = [
            _hl.md5((salt + str(k)).encode()).hexdigest() for k in keys
        ]
        rng = [int(d[:2], 16) for d in digests]
        return batch.append_column(
            "__digest", pa.array(digests, pa.string())
        ).append_column("__range", pa.array(rng, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    totals = tagged.groupby("__range").count().take_all()
    totals.sort(key=lambda r: r["__range"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["__range"])] = acc
        acc += int(r["count()"])

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rid, sub in g.groupby("__range", sort=True):
            sub = sub.sort_values("__digest", kind="mergesort")
            out.append(
                pd.DataFrame(
                    {
                        id_col: sub[id_col].to_numpy(),
                        "shuffle_rank": offsets[int(rid)]
                        + np.arange(len(sub), dtype=np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        tagged, ["__range"], rank, num_buckets=num_buckets
    )


def weighted_sample_topk(
    ds,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
):
    """Deterministic weighted sampling without replacement (the
    Efraimidis–Spirakis A-ES scheme): each row gets a uniform
    u = (int(md5(salt+id)[:8], 16) + 1) / 2^32 and priority key
    ln(u) / weight; the global top-k by key IS a weighted sample — row
    inclusion probability proportional to weight, reproducible at any
    parallelism (md5 rule, same family as split_assign). Rows with
    weight ≤ 0 are excluded.

    Plan: per-block local top-k is an exact combiner (the global top-k is
    a subset of the union of block top-ks), so blocks shrink to ≤k rows
    before the single-partition final pass — no sort shuffle of the
    corpus. Oracle-mirrorable: DuckDB
    ``ln((CAST(CAST('0x'||substr(md5(salt||id),1,8) AS ...)) + 1) / 4294967296.0) / w``
    with the identical literal expression (np.log/libm parity, the bm25
    precedent)."""
    import numpy as np

    def key_of(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].to_pylist()
        u = np.array(
            [
                int(hashlib.md5((salt + str(x)).encode()).hexdigest()[:8], 16)
                for x in keys
            ],
            dtype=np.float64,
        )
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = np.where(w > 0, np.log((u + 1.0) / 4294967296.0) / w, -np.inf)
        batch = batch.append_column("__pri", pa.array(pri))
        return batch.filter(pa.array(np.isfinite(pri)))  # weight<=0 excluded

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        pri = batch["__pri"].to_numpy(zero_copy_only=False)
        idx = np.argpartition(-pri, k - 1)[:k]
        return batch.take(pa.array(np.sort(idx)))

    def final_topk(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        df = batch.to_pandas()
        df = df.sort_values(
            ["__pri", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(
            df.drop(columns="__pri"), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(key_of, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow")
    )
