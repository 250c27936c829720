"""Join strategies (SURVEY.md §2.4, ray_guide patterns).

- ``broadcast_join``: small side → ``ray.put`` once → per-batch pandas merge
  inside ``map_batches``. No shuffle. The J2 pattern.
- ``bucket_hash_join``: both sides large → add ``__bucket = hash(key) % B``
  to both, schema-align, union, ``groupby(__bucket)`` → per-bucket pandas
  merge. One explicit partitioned shuffle; B is the parallelism/skew knob.
- ``semi_join_filter`` / ``anti_join_filter``: broadcast the key set,
  vectorized ``is_in`` mask per batch (J3/J4/J5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64


def _mix(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _encode_key_pair(lc, rc) -> "tuple[np.ndarray, ...]":
    """One (left, right) key-column pair → two int64 code arrays plus two
    int8 null flags, JOINTLY encoded so equal values get equal codes across
    sides. The null flag rides as an extra key component, which reproduces
    pandas merge's null-matches-null semantics with no special casing."""
    lnull = pc.is_null(lc).to_numpy(zero_copy_only=False).astype(np.int64)
    rnull = pc.is_null(rc).to_numpy(zero_copy_only=False).astype(np.int64)
    lt = lc.type
    if pa.types.is_floating(lt) or pa.types.is_floating(rc.type):
        # EXACT float semantics (pandas merge compares exact float64
        # values — common-type promotion when one side is integer):
        # compare IEEE-754 bit patterns after normalizing -0.0 → +0.0
        # (value-equal, different bits) and collapsing every NaN to one
        # canonical pattern (pandas merge matches NaN with NaN). A
        # cast-to-int64 here would TRUNCATE fractional keys — 1.5 and
        # 1.2 must not join as equal.
        def _fbits(c) -> np.ndarray:
            f = pc.fill_null(pc.cast(c, pa.float64(), safe=False), 0.0
                             ).to_numpy(zero_copy_only=False).copy()
            f[f == 0.0] = 0.0
            f[np.isnan(f)] = np.nan
            return f.view(np.int64)

        lv, rv = _fbits(lc), _fbits(rc)
    elif pa.types.is_integer(lt):
        lv = pc.fill_null(pc.cast(lc, pa.int64(), safe=False), 0).to_numpy(
            zero_copy_only=False
        )
        rv = pc.fill_null(pc.cast(rc, pa.int64(), safe=False), 0).to_numpy(
            zero_copy_only=False
        )
    else:
        # strings (or anything else): joint dictionary encoding — codes are
        # only compared for equality, so dictionary order is irrelevant
        joint = pa.chunked_array(
            [c.cast(pa.large_string()) for c in
             list(pc.fill_null(lc, "").chunks) + list(pc.fill_null(rc, "").chunks)]
            or [pa.array([], pa.large_string())]
        ).combine_chunks()
        codes = pc.dictionary_encode(joint).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lv, rv = codes[: len(lc)], codes[len(lc):]
    return lv, lnull, rv, rnull


def _join_indices(lcols, rcols, how: str) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized equi-join row selector with pandas-merge semantics
    (null keys match null keys; inner/left/outer). ``lcols``/``rcols`` are
    parallel lists of key ChunkedArrays. Returns (li, ri) int64 index
    arrays into the two sides, -1 marking the null-padded side of an
    unmatched row. O((nl+nr)·log nr) numpy — no Python per-row work."""
    nl, nr = len(lcols[0]), len(rcols[0])
    lparts, rparts = [], []
    for lc, rc in zip(lcols, rcols):
        lv, ln, rv, rn = _encode_key_pair(lc, rc)
        lparts += [lv, ln]
        rparts += [rv, rn]

    def as_void(parts, n):
        m = np.ascontiguousarray(
            np.column_stack(parts) if parts else np.empty((n, 0), np.int64)
        )
        return m.view([("", np.int64)] * m.shape[1]).ravel()

    lv = as_void(lparts, nl)
    rv = as_void(rparts, nr)
    order = np.argsort(rv, kind="stable")
    rs = rv[order]
    lo = np.searchsorted(rs, lv, "left")
    hi = np.searchsorted(rs, lv, "right")
    counts = hi - lo
    tot = int(counts.sum())
    li = np.repeat(np.arange(nl, dtype=np.int64), counts)
    starts = np.repeat(lo, counts)
    offs = np.arange(tot, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    ri = order[starts + offs] if tot else np.empty(0, np.int64)
    if how in ("left", "outer"):
        lu = np.flatnonzero(counts == 0)
        li = np.concatenate([li, lu])
        ri = np.concatenate([ri, np.full(lu.size, -1, np.int64)])
    if how == "outer":
        rhit = np.zeros(nr, bool)
        rhit[ri[ri >= 0]] = True
        ru = np.flatnonzero(~rhit)
        li = np.concatenate([li, np.full(ru.size, -1, np.int64)])
        ri = np.concatenate([ri, ru])
    return li, ri


def _promote_mixed_key(l_type, r_type) -> bool:
    """True when an integer key column joins a float key column. The
    in-bucket kernels compare such pairs through float64 promotion
    (``_encode_key_pair``'s float branch / pandas merge common-type rule),
    so bucket ROUTING must hash through the same promotion: an int64 key
    above 2^53 otherwise hashes by its exact bits while its rounded
    float64 twin hashes by the rounded value — matching rows land in
    different buckets and silently never meet."""
    if l_type is None or r_type is None:
        return False
    return (pa.types.is_integer(l_type) and pa.types.is_floating(r_type)) or (
        pa.types.is_floating(l_type) and pa.types.is_integer(r_type)
    )


def _key_type(ds, col):
    """Key column type for the mixed-key promotion probe, or None when it
    can't be known: an EMPTY materialized group-apply output has no
    schema (Dataset.schema() is None) — a side with no rows routes
    nothing, so no-promotion is always safe there."""
    s = ds.schema()
    if s is None or col not in s.names:
        return None
    return dict(zip(s.names, s.types))[col]


def _key_hash(batch: pa.Table, on: str, promote: bool) -> np.ndarray:
    """hash_columns on one key column, promoting INT → float64 first when
    the other join side is float (routing must match kernel semantics —
    see _promote_mixed_key). hash_columns maps integral floats to their
    int64 bit pattern, so promotion changes nothing for keys ≤ 2^53 and
    co-buckets the rounded value above it, exactly like the kernel."""
    from .groupops import hash_columns

    col = batch[on]
    if promote and pa.types.is_integer(col.type):
        return hash_columns(
            pa.table({on: pc.cast(col, pa.float64(), safe=False)}), [on]
        )
    return hash_columns(batch, [on])


def _take_pad(col, idx: np.ndarray, out_type) -> "pa.ChunkedArray":
    """``col[idx]`` with -1 → null, cast to the declared output type (undoes
    any float64 upcast a groupby shuffle applied to nulled int columns)."""
    indices = pa.array(idx, type=pa.int64(), mask=idx < 0)
    taken = pc.take(col, indices)
    return taken if taken.type == out_type else pc.cast(
        taken, out_type, safe=False
    )


def broadcast_join(
    left_ds,
    right_table: pa.Table,
    left_on: str,
    right_on: str,
    how: str = "inner",
):
    """left ⋈ broadcast(right). Right side shipped once via ray.put.

    Arrow in/out (VERDICT r4 #4): the per-batch merge runs the same
    vectorized ``_join_indices`` selector the bucketed join uses — no
    pandas round-trip, no float64 null-pad upcast to repair after. Payload
    columns of the two sides must be disjoint (same contract as
    ``bucket_hash_join``); the zero-copy Arrow blocks ship straight from
    the object store into the kernel."""
    import ray

    from .enrich import _cached_get

    overlap = [
        n for n in right_table.column_names
        if n != right_on and n in getattr(left_ds.schema(), "names", [])
    ]
    if overlap:
        raise ValueError(
            f"broadcast_join: overlapping payload columns {overlap}; "
            "rename one side (disjoint-columns contract)"
        )
    right_ref = ray.put(right_table.combine_chunks())  # ship once

    def join_batch(batch: pa.Table) -> pa.Table:
        right = _cached_get(right_ref)  # per-worker cached deserialization
        li, ri = _join_indices([batch[left_on]], [right[right_on]], how)
        cols = {}
        for n, t in zip(batch.column_names, batch.schema.types):
            cols[n] = _take_pad(batch[n], li, t)
        for n, t in zip(right.column_names, right.schema.types):
            if n == right_on and right_on == left_on:
                continue  # single key column, from the left side
            cols[n] = _take_pad(right[n], ri, t)
        return pa.table(cols)

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def semi_join_filter(left_ds, keys: set | np.ndarray, on: str, anti: bool = False):
    """Keep rows whose key is (not, if anti) in the broadcast key set."""
    import ray

    key_arr = pa.array(list(keys) if isinstance(keys, set) else keys)
    ref = ray.put(key_arr)

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[on], value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(pc.fill_null(mask, False if not anti else True))

    return left_ds.map_batches(filt, batch_format="pyarrow")


class BloomFilter:
    """Vectorized Bloom filter over int64/uint64 keys: numpy bit array,
    ``n_hashes`` derived probes per key from two splitmix64 streams
    (Kirsch–Mitzenmacher double hashing). Serializable (ray.put) and
    deterministic."""

    def __init__(self, n_bits: int, n_hashes: int = 4):
        self.n_bits = int(n_bits)
        self.n_hashes = n_hashes
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    def _probes(self, keys: np.ndarray) -> np.ndarray:
        k = np.asarray(keys).astype(np.int64).view(np.uint64)
        h1 = _mix(k)
        h2 = _mix(k ^ _U64(0xA076_1D64_78BD_642F)) | _U64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % _U64(self.n_bits)

    def add(self, keys: np.ndarray) -> None:
        p = self._probes(keys).ravel()
        np.bitwise_or.at(self.bits, (p >> _U64(6)).astype(np.int64),
                         _U64(1) << (p & _U64(63)))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        p = self._probes(keys)
        word = self.bits[(p >> _U64(6)).astype(np.int64)]
        hit = (word >> (p & _U64(63))) & _U64(1)
        return hit.all(axis=0).astype(bool)


def build_key_bloom(ds, on: str, n_bits: int = 1 << 23, n_hashes: int = 4):
    """Aggregate a BloomFilter of a dataset's (integer) key column:
    per-batch filters, an intermediate distributed OR-merge (repartition to
    ≤8 blocks), and a final driver OR of at most 8 filters — driver memory
    is bounded by 8 × n_bits/8 bytes regardless of block count."""

    def or_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
        for blob in batch["bits"].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.large_binary())})

    partial = ds.select_columns([on]).map_batches(
        lambda b: pa.table(
            {
                "bits": pa.array(
                    [_batch_bloom_bits(b, on, n_bits, n_hashes).tobytes()],
                    pa.large_binary(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    merged = partial.repartition(8).map_batches(
        or_merge, batch_format="pyarrow", batch_size=None
    )
    bloom = BloomFilter(n_bits, n_hashes)
    for row in merged.take_all():
        bloom.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return bloom


def _batch_bloom_bits(batch: pa.Table, on: str, n_bits: int, n_hashes: int):
    bf = BloomFilter(n_bits, n_hashes)
    keys = batch[on].drop_null().combine_chunks().to_numpy(zero_copy_only=False)
    if len(keys):
        bf.add(keys)
    return bf.bits


def semi_join_shuffled(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    anti: bool = False,
    num_buckets: int = 64,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
):
    """Distributed semi/anti join for key sides too large to broadcast
    (VERDICT r1 #6): co-shuffle left rows and the right side's DISTINCT keys
    by hash(key) % B, filter per bucket. The right side is pre-deduplicated
    inside each batch (partial combiner) so at most one row per distinct key
    per block crosses the shuffle; nothing lands on the driver. Semantics
    match ``semi_join_filter`` (NOT IN with non-null keys).

    ``bloom_prefilter=True`` (SEMI only, integer keys) drops left rows
    whose key a broadcast Bloom filter of the right keys rules out BEFORE
    the shuffle — at low selectivity the all-to-all moves the ~1% survivors
    plus false positives instead of the whole left side; the exact
    per-bucket filter still runs, so results are identical."""
    import ray

    if bloom_prefilter and not anti:
        # materialize the PROJECTED key column once: the bloom build and the
        # co-shuffle tag both read it, so the (possibly wide) right pipeline
        # executes a single time and only 8 B/row lands in the object store
        right_ds = right_ds.select_columns([right_on]).materialize()
        bloom = build_key_bloom(right_ds, right_on, n_bits=bloom_bits)
        bloom_ref = ray.put(bloom)

        def prefilter(batch: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)
            keys = batch[left_on]
            valid = pc.is_valid(keys)
            arr = pc.fill_null(keys, 0).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            keep = bf.might_contain(arr) & valid.combine_chunks().to_numpy(
                zero_copy_only=False
            )
            return batch.filter(pa.array(keep))

        left_ds = left_ds.map_batches(prefilter, batch_format="pyarrow")

    # A schemaless side is an EMPTY dataset: no shuffle needed. Empty
    # left → nothing to filter; empty right keys → semi keeps nothing,
    # anti keeps everything.
    if left_ds.schema() is None:
        return left_ds
    if right_ds.schema() is None:
        return left_ds if anti else left_ds.limit(0)

    # mixed int/float key pair → route through the float64 promotion the
    # in-bucket comparison implies (see _promote_mixed_key)
    promote = _promote_mixed_key(
        _key_type(left_ds, left_on), _key_type(right_ds, right_on)
    )

    def tag_left(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, left_on, promote)
        return batch.append_column(
            "__bucket", pa.array((h % _U64(num_buckets)).astype(np.int64))
        ).append_column("__side", pa.array(np.zeros(batch.num_rows, np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch[right_on].combine_chunks())
        t = pa.table({"__semi_key": keys})
        h = _key_hash(t, "__semi_key", promote)
        return t.append_column(
            "__bucket", pa.array((h % _U64(num_buckets)).astype(np.int64))
        ).append_column("__side", pa.array(np.ones(len(keys), np.int8)))

    left_t = left_ds.map_batches(tag_left, batch_format="pyarrow")
    right_t = right_ds.map_batches(tag_right, batch_format="pyarrow")

    l_schema = left_ds.schema()
    # mixed pair: the comparison domain IS the promotion — both sides'
    # keys ride the shuffle as float64 (matches the promoted routing
    # above; an int→float cast must be safe=False, it merely rounds >2^53
    # keys exactly like the promotion semantics demand)
    key_type = (pa.float64() if promote
                else dict(zip(l_schema.names, l_schema.types))[left_on])
    l_names = list(l_schema.names)

    def _to_key(col):
        return pc.cast(col, key_type, safe=False) if promote else col.cast(
            key_type
        )

    def align_left(batch: pa.Table) -> pa.Table:
        # left rows carry their OWN key in __semi_key too: the column is
        # then populated on both sides, so pandas never null-pad-upcasts it
        # to float64 (which silently corrupts int keys above 2^53).
        # Null-fill any l_schema column missing from the actual block —
        # Dataset.schema() can report stale pre-projection columns after
        # select_columns-on-map_groups, and a left/right block mismatch
        # inside the groupby shuffle silently corrupts the join.
        cols = {}
        for n, t in zip(l_schema.names, l_schema.types):
            cols[n] = (batch[n] if n in batch.column_names
                       else pa.nulls(batch.num_rows, t))
        cols["__bucket"] = batch["__bucket"]
        cols["__side"] = batch["__side"]
        cols["__semi_key"] = _to_key(batch[left_on])
        return pa.table(cols)

    def align_right(batch: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(batch.num_rows, t) for n, t in zip(l_schema.names, l_schema.types)}
        cols["__bucket"] = batch["__bucket"]
        cols["__side"] = batch["__side"]
        cols["__semi_key"] = _to_key(batch["__semi_key"])
        return pa.table(cols)

    # materialize the union→all-to-all boundary (CLAUDE.md livelock rule:
    # never stream two task-pool branches through a union directly into a
    # shuffle); the two branches still execute concurrently inside the one
    # materialize, and the shuffle would hold every block anyway
    both = left_t.map_batches(align_left, batch_format="pyarrow").union(
        right_t.map_batches(align_right, batch_format="pyarrow")
    ).materialize()

    def filter_bucket(g: pa.Table) -> pa.Table:
        # ARROW-native filtering: no pandas conversion anywhere, so int64
        # keys keep full precision (no float64 upcast) even with nulls
        lmask = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
        left = g.filter(lmask)
        keys = pc.unique(
            pc.drop_null(g.filter(pc.invert(lmask))["__semi_key"].combine_chunks())
        )
        mask = pc.is_in(left["__semi_key"], value_set=keys)
        if anti:
            mask = pc.fill_null(pc.invert(mask), True)
        else:
            mask = pc.fill_null(mask, False)
        out = left.filter(mask)
        # Emit the original left schema, TYPES included: the union's
        # right-side rows carry nulls in every left payload column, and
        # Ray's groupby shuffle can take a pandas path that upcasts those
        # int columns to float64. A chained semi join would then hash the
        # float column via the string fallback while the right keys hash
        # as integers — different buckets, rows silently dropped.
        out = out.select(l_names)
        cols = {}
        for n, t in zip(l_schema.names, l_schema.types):
            col = out[n]
            if not col.type.equals(t):
                if pa.types.is_integer(t) and pa.types.is_floating(col.type):
                    col = pc.if_else(
                        pc.is_nan(col), pa.scalar(None, col.type), col
                    )
                col = col.cast(t)
            cols[n] = col
        return pa.table(cols)

    return both.groupby("__bucket").map_groups(filter_bucket, batch_format="pyarrow")


def _collect_arrow(ds, limit: "int | None" = None) -> "pa.Table | None":
    """Materialize a (small) Dataset to one driver-side Arrow table.

    ``limit`` BOUNDS what the driver will ever hold: batch pulling stops
    as soon as the accumulated row count exceeds it, and the (partial)
    table is returned for the caller's ``num_rows > limit`` rejection
    check. Without this, a size guard placed after collection would
    OOM the driver before it ever ran."""
    tbls, n = [], 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        tbls.append(t)
        n += t.num_rows
        if limit is not None and n > limit:
            break
    return pa.concat_tables(tbls) if tbls else None


def _narrow_probe(ds, cols: "list[str]"):
    """Project to the skew-probe column(s) (IN-KERNEL — never
    ``select_columns`` after a ``map_groups``, per the schema-staleness
    rule) and materialize. ``heavy_hitters`` makes three sketch-bounded
    scans of its input; fed the caller's lazy chain directly, each scan
    re-executes the whole chain (~4× input cost on completely unskewed
    inputs). The materialized projection is key-column-narrow, so the
    chain runs once and the three scans hit cached blocks."""

    def _p(batch: pa.Table) -> pa.Table:
        return batch.select(cols)

    return ds.map_batches(_p, batch_format="pyarrow").materialize()


def _hot_mask_fn(col: str, hot_vals: pa.Array, keep_hot: bool):
    """Batch filter: rows whose ``col`` is (not) in the hot-value set.
    Null keys always route COLD (they match nothing / LEFT-survive there)."""

    def _f(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.is_in(batch[col], value_set=hot_vals), False)
        return batch.filter(m if keep_hot else pc.invert(m))

    return _f


def asof_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str,
    by: str,
    right_by: str,
    direction: str = "backward",
    num_buckets: int = 32,
    hot_denom: "int | None" = 64,
    hot_right_limit: int = 2_000_000,
):
    """Distributed as-of join (the brief's canonical custom operator): for
    each left row, the closest right row at-or-before (``backward``) /
    at-or-after (``forward``) its ``on`` value, within the same ``by`` key.
    Left rows with no match keep nulls (LEFT semantics, matching DuckDB
    ``ASOF LEFT JOIN``).

    Plan: co-shuffle both sides by hash(by) % B (the equality key — every
    (by, right_by) pair lands in one bucket), then one sorted
    ``pandas.merge_asof`` per bucket. Column names of the two sides must be
    disjoint.

    SKEW: a ``by`` key owning 90% of the probe side would land 90% of the
    shuffle in ONE bucket task. When ``hot_denom`` is set, HOT left keys
    (frequency ≥ N/hot_denom, exact Misra-Gries two-pass — sketch-sized,
    no full groupby) bypass the shuffle: their right rows broadcast once
    (pre-sorted) and the hot left rows merge_asof as a pure map, while the
    cold remainder takes the bucketed path. The bypass only engages while
    the hot right side stays broadcast-small (≤ ``hot_right_limit`` rows —
    beyond that a time-axis range partition, not a broadcast, would be the
    tool); output is parity-pinned against the bucketed path by tests."""
    if hot_denom:
        from .groupops import heavy_hitters

        hot = heavy_hitters(_narrow_probe(left_ds, [by]), by, denom=hot_denom)
        if hot.num_rows:
            hot_vals = hot["item"].combine_chunks()
            right_hot = _collect_arrow(
                right_ds.map_batches(
                    _hot_mask_fn(right_by, hot_vals, True),
                    batch_format="pyarrow",
                ),
                limit=hot_right_limit,  # driver never buffers past the cap
            )
            if right_hot is not None and 0 < right_hot.num_rows <= hot_right_limit:
                hot_out = _asof_hot_map(
                    left_ds.map_batches(
                        _hot_mask_fn(by, hot_vals, True), batch_format="pyarrow"
                    ),
                    right_hot,
                    left_ds.schema(),
                    right_ds.schema(),
                    on, right_on, by, right_by, direction,
                )
                cold_out = _asof_bucketed(
                    left_ds.map_batches(
                        _hot_mask_fn(by, hot_vals, False), batch_format="pyarrow"
                    ),
                    right_ds.map_batches(
                        _hot_mask_fn(right_by, hot_vals, False),
                        batch_format="pyarrow",
                    ),
                    on, right_on, by, right_by, direction, num_buckets,
                    left_ds.schema(), right_ds.schema(),
                )
                return hot_out.union(cold_out)
    return _asof_bucketed(
        left_ds, right_ds, on, right_on, by, right_by, direction, num_buckets,
        left_ds.schema(), right_ds.schema(),
    )


def _asof_hot_map(left_hot_ds, right_hot: pa.Table, l_schema, r_schema,
                  on, right_on, by, right_by, direction):
    """Hot-key as-of path: right rows of hot keys broadcast once
    (pre-sorted with the deterministic tie-break), left rows merge_asof
    per batch — no shuffle."""
    import ray

    from .enrich import _cached_get

    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    types_all = dict(zip(l_schema.names, l_schema.types))
    types_all.update(dict(zip(r_schema.names, r_schema.types)))
    all_names = l_names + [n for n in r_names if n not in l_names]
    int_restore = {
        n: f"{'UInt' if pa.types.is_unsigned_integer(t) else 'Int'}{t.bit_width}"
        for n, t in types_all.items()
        if pa.types.is_integer(t)
    }

    def _prep(df: pd.DataFrame, key_cols) -> "tuple[pd.DataFrame, pd.DataFrame]":
        """Mirror the bucketed kernel: segregate null-key rows, restore
        int dtypes (plain numpy ints for the merge keys)."""
        null_keys = pd.Series(False, index=df.index)
        for n in key_cols:
            null_keys |= df[n].isna()
        kept = df[~null_keys].copy()
        for n, dt in int_restore.items():
            if n in kept.columns and kept[n].dtype.kind == "f":
                kept[n] = kept[n].astype(dt.lower() if n in key_cols else dt)
        return kept, df[null_keys]

    r_tiebreak = [n for n in r_names if n not in (right_on, right_by)]
    right_pd, _ = _prep(right_hot.to_pandas(), (right_on, right_by))
    right_pd = right_pd.sort_values(
        [right_on, right_by, *r_tiebreak], kind="mergesort"
    )
    rref = ray.put(right_pd)

    def _to_arrow(df: pd.DataFrame, null_right: bool) -> pa.Table:
        cols = {}
        for n in all_names:
            if null_right and n not in df.columns:
                cols[n] = pa.nulls(len(df), types_all[n])
            else:
                cols[n] = pa.Array.from_pandas(df[n], type=types_all[n], safe=False)
        return pa.table(cols)

    def hot_join(batch: pa.Table) -> pa.Table:
        right = _cached_get(rref)  # per-worker cached deserialization
        left, left_nullkey = _prep(batch.to_pandas(), (on, by))
        out = pd.merge_asof(
            left.sort_values([on, by], kind="mergesort"), right,
            left_on=on, right_on=right_on,
            left_by=by, right_by=right_by,
            direction=direction,
        )
        matched = _to_arrow(out, null_right=False)
        if len(left_nullkey):
            # LEFT semantics: null-on rows survive with null right columns
            return pa.concat_tables(
                [matched, _to_arrow(left_nullkey[l_names], null_right=True)]
            )
        return matched

    return left_hot_ds.map_batches(hot_join, batch_format="pyarrow")


def _asof_bucketed(
    left_ds,
    right_ds,
    on: str,
    right_on: str,
    by: str,
    right_by: str,
    direction: str,
    num_buckets: int,
    l_schema,
    r_schema,
):
    """The bucketed as-of core (see asof_join docstring)."""

    def tag(side: int, key: str):
        def _tag(batch: pa.Table) -> pa.Table:
            from .groupops import hash_columns

            h = hash_columns(batch, [key])
            return batch.append_column(
                "__bucket", pa.array((h % _U64(num_buckets)).astype(np.int64))
            ).append_column("__side", pa.array(np.full(batch.num_rows, side, np.int8)))

        return _tag

    left_t = left_ds.map_batches(tag(0, by), batch_format="pyarrow")
    right_t = right_ds.map_batches(tag(1, right_by), batch_format="pyarrow")

    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    types_all = dict(zip(l_schema.names, l_schema.types))
    types_all.update(dict(zip(r_schema.names, r_schema.types)))
    all_names = l_names + [n for n in r_names if n not in l_names]

    def align(batch: pa.Table) -> pa.Table:
        cols = {}
        for n in all_names:
            cols[n] = (
                batch[n]
                if n in batch.column_names
                else pa.nulls(batch.num_rows, types_all[n])
            )
        cols["__bucket"] = batch["__bucket"]
        cols["__side"] = batch["__side"]
        return pa.table(cols)

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    both = left_t.map_batches(align, batch_format="pyarrow").union(
        right_t.map_batches(align, batch_format="pyarrow")
    ).materialize()

    int_restore = {
        n: f"{'UInt' if pa.types.is_unsigned_integer(t) else 'Int'}{t.bit_width}"
        for n, t in types_all.items()
        if pa.types.is_integer(t)
    }

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # un-do the union null-pad's int→float upcast per side BEFORE the
        # merge: KEY columns go to plain numpy ints (merge_asof requires
        # matching, non-nullable key dtypes — rows whose keys are null are
        # segregated first), other int columns to nullable Int so inputs
        # that legitimately contain nulls don't crash the cast
        def side(mask, names, key_cols):
            df = g[mask][names].copy()
            null_keys = pd.Series(False, index=df.index)
            for n in key_cols:
                null_keys |= df[n].isna()
            kept, dropped = df[~null_keys], df[null_keys]
            kept = kept.copy()
            for n, dt in int_restore.items():
                if n in kept.columns and kept[n].dtype.kind == "f":
                    kept[n] = kept[n].astype(dt.lower() if n in key_cols else dt)
            return kept, dropped

        left, left_nullkey = side(g["__side"] == 0, l_names, (on, by))
        right, _ = side(g["__side"] == 1, r_names, (right_on, right_by))
        # deterministic tie-break: when several right rows share the same
        # (by, on) key, merge_asof picks the LAST in sort order — without a
        # full-payload sort that row depends on bucket-internal arrival
        # order and the output flaps across runs/parallelism levels
        r_tiebreak = [n for n in r_names if n not in (right_on, right_by)]
        out = pd.merge_asof(
            left.sort_values([on, by], kind="mergesort"),
            right.sort_values(
                [right_on, right_by, *r_tiebreak], kind="mergesort"
            ),
            left_on=on,
            right_on=right_on,
            left_by=by,
            right_by=right_by,
            direction=direction,
        )

        # emit Arrow with the explicit output schema: every bucket agrees
        # on types, and from_pandas turns the merge's NaN/NaT padding into
        # true nulls (SQL LEFT JOIN semantics)
        def to_arrow(df: pd.DataFrame, null_right: bool) -> pa.Table:
            cols = {}
            for n in all_names:
                if null_right and n not in df.columns:
                    cols[n] = pa.nulls(len(df), types_all[n])
                else:
                    cols[n] = pa.Array.from_pandas(
                        df[n], type=types_all[n], safe=False
                    )
            return pa.table(cols)

        matched = to_arrow(out, null_right=False)
        if len(left_nullkey):
            # LEFT semantics: null-key left rows survive with null right
            # columns (a NULL equality/inequality key matches nothing)
            return pa.concat_tables(
                [matched, to_arrow(left_nullkey[l_names], null_right=True)]
            )
        return matched

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def bucket_hash_join(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    num_buckets: int = 64,
    how: str = "inner",
):
    """Partitioned hash join: co-shuffle both sides by hash(key) % B, merge
    per bucket. Key columns must be integer-typed; payload columns of the
    two sides must be disjoint (they are concatenated)."""
    # A schemaless side is an EMPTY dataset (e.g. a zero-row materialized
    # group-apply output): an inner/left join against it needs no shuffle
    # at all. The empty result keeps whatever schema the surviving side
    # has — callers wanting a fully-typed empty produce it themselves
    # (repo convention for the propose/verify pipelines).
    if left_ds.schema() is None:
        return left_ds
    if right_ds.schema() is None:
        return left_ds.limit(0) if how == "inner" else left_ds

    # mixed int/float key pair → route through the same float64 promotion
    # the in-bucket kernel compares with (_promote_mixed_key)
    promote = _promote_mixed_key(
        _key_type(left_ds, left_on), _key_type(right_ds, right_on)
    )

    def tag(side: int, on: str):
        def _tag(batch: pa.Table) -> pa.Table:
            h = _key_hash(batch, on, promote)  # int, float or string keys
            return batch.append_column(
                "__bucket", pa.array((h % _U64(num_buckets)).astype(np.int64))
            ).append_column("__side", pa.array(np.full(len(h), side, np.int8)))

        return _tag

    left_t = left_ds.map_batches(tag(0, left_on), batch_format="pyarrow")
    right_t = right_ds.map_batches(tag(1, right_on), batch_format="pyarrow")

    # schema-align the union: each side gets the other's columns as nulls
    l_schema = left_t.schema()
    r_schema = right_t.schema()
    l_names = list(l_schema.names)
    r_names = [n for n in r_schema.names if n not in ("__bucket", "__side")]
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    all_names = l_names + [n for n in r_names if n not in l_names]

    def align(names_present, types):
        def _align(batch: pa.Table) -> pa.Table:
            cols = {}
            for n in all_names:
                if n in batch.column_names:
                    cols[n] = batch[n]
                else:
                    cols[n] = pa.nulls(batch.num_rows, types[n])
            return pa.table(cols)

        return _align

    types_all = dict(l_types)
    types_all.update({n: r_types[n] for n in r_names})
    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    both = left_t.map_batches(align(l_names, types_all), batch_format="pyarrow").union(
        right_t.map_batches(align(r_names, types_all), batch_format="pyarrow")
    ).materialize()

    out_names = [n for n in all_names if n not in ("__bucket", "__side")]
    l_set = set(n for n in l_names if n not in ("__bucket", "__side"))
    r_set = set(r_names)

    def merge_bucket(g: pa.Table) -> pa.Table:
        # Arrow in/out (VERDICT r3 #3): no pandas round-trip, no float64
        # int-upcast to repair after — unmatched sides pad with TRUE nulls
        # via pc.take(null-index), and every output column casts back to
        # the declared type (groupby shuffles can float64-upcast nulled
        # int columns; see CLAUDE.md schema-type rules)
        smask = pc.equal(g["__side"], 0)
        left_t = g.filter(smask)
        right_t = g.filter(pc.invert(smask))
        li, ri = _join_indices(
            [left_t[left_on]], [right_t[right_on]], how
        )
        cols = {}
        for n in out_names:
            t = types_all[n]
            if n in l_set and n in r_set:
                # the coalesced key column (left_on == right_on): left
                # value when present, right value for right-only rows —
                # exactly pandas' same-name key coalescing
                cols[n] = pc.coalesce(
                    _take_pad(left_t[n], li, t), _take_pad(right_t[n], ri, t)
                )
            elif n in l_set:
                cols[n] = _take_pad(left_t[n], li, t)
            else:
                cols[n] = _take_pad(right_t[n], ri, t)
        return pa.table(cols)

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def interval_join(
    left_ds,
    right_ds,
    on: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    right_by: str | None = None,
    granule: int | None = None,
    num_buckets: int = 64,
    hot_denom: "int | None" = 64,
    hot_right_limit: int = 2_000_000,
):
    """Distributed interval (range-containment) join: INNER-join each left
    row to every right interval ``[start, end)`` containing ``left.on``,
    optionally within an equality key (``by`` = ``right_by``).

    SKEW: the co-shuffle key is the (by, granule) CELL, so a hot instant —
    90% of left rows in one granule under one key — lands in ONE bucket
    task. When ``hot_denom`` is set, hot cells (left frequency ≥
    N/hot_denom by the exact Misra-Gries two-pass over the cell hash)
    bypass the shuffle: their interval rows broadcast once and the hot
    left rows merge+filter as a pure map; the cold remainder takes the
    bucketed path. Cells hash identically on both sides, so a hash
    collision only routes extra rows through the broadcast path — never a
    wrong result. The bypass engages only while the hot interval side
    stays broadcast-small (≤ ``hot_right_limit`` exploded rows).

    Plan (the brief's custom-operator recipe — composition of map_batches
    + one bucketed co-shuffle): the join axis is chopped into fixed
    ``granule``-width chunks; each INTERVAL replicates to every granule it
    overlaps (×(len/granule + 1) — size ``granule`` ≥ the typical interval
    length so the factor stays ≈2), each left row maps to exactly ONE
    granule, both sides co-shuffle on hash((by, granule)) % B, and one
    vectorized pandas equi-merge + range filter runs per bucket. Because a
    left row lives in a single granule, a (left, interval) pair can match
    in at most one bucket — no dedup pass needed. Temporal columns are
    compared in their native dtype; granule math uses their int64 view
    (µs for timestamps).

    Payload column names of the two sides must be disjoint."""
    from .groupops import hash_columns

    if granule is None or granule <= 0:
        raise ValueError("granule (int64 units of the join axis) required")

    def _int64(col: "pa.ChunkedArray"):
        t = col.type
        if pa.types.is_date32(t):
            # 32-bit day count: widen through int32 (a direct int64 cast
            # is rejected for date32)
            col = col.cast(pa.int32())
        elif pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
            col = col.cast(pa.int64())
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    gran_i = np.int64(granule)

    def tag_left(batch: pa.Table) -> pa.Table:
        g = _int64(batch[on]) // gran_i
        out = batch.append_column("__gran", pa.array(g))
        h = hash_columns(out, ([by] if by else []) + ["__gran"])
        return out.append_column(
            "__bucket", pa.array((h % _U64(num_buckets)).astype(np.int64))
        ).append_column(
            "__side", pa.array(np.full(batch.num_rows, 0, np.int8))
        )

    def explode_right(batch: pa.Table) -> pa.Table:
        s = _int64(batch[start_col])
        e = _int64(batch[end_col])
        g0 = s // gran_i
        # end is exclusive: an interval touches granules g0 .. (e-1)//granule
        g1 = np.where(e > s, (e - 1) // gran_i, g0 - 1)
        counts = np.maximum(g1 - g0 + 1, 0)
        idx = np.repeat(np.arange(batch.num_rows), counts)
        pos = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        out = batch.take(pa.array(idx)).append_column(
            "__gran", pa.array(g0[idx] + pos)
        )
        h = hash_columns(out, ([right_by] if right_by else []) + ["__gran"])
        return out.append_column(
            "__bucket", pa.array((h % _U64(num_buckets)).astype(np.int64))
        ).append_column(
            "__side", pa.array(np.full(out.num_rows, 1, np.int8))
        )

    left_t = left_ds.map_batches(tag_left, batch_format="pyarrow")
    right_t = right_ds.map_batches(explode_right, batch_format="pyarrow")

    def cell_of(key_col: "str | None"):
        def _cell(batch: pa.Table) -> pa.Table:
            h = hash_columns(batch, ([key_col] if key_col else []) + ["__gran"])
            return batch.append_column("__cell", pa.array(h.astype(np.int64)))

        return _cell

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    types_all = dict(zip(l_schema.names, l_schema.types))
    types_all.update(dict(zip(r_schema.names, r_schema.types)))
    all_names = l_names + [n for n in r_names if n not in l_names]

    def align(batch: pa.Table) -> pa.Table:
        cols = {}
        for n in all_names:
            cols[n] = (
                batch[n]
                if n in batch.column_names
                else pa.nulls(batch.num_rows, types_all[n])
            )
        for n in ("__gran", "__bucket", "__side"):
            cols[n] = batch[n]
        return pa.table(cols)

    int_restore = {
        n: f"{'UInt' if pa.types.is_unsigned_integer(t) else 'Int'}{t.bit_width}"
        for n, t in types_all.items()
        if pa.types.is_integer(t)
    }
    out_names = all_names  # left payload + right payload (incl. interval cols)

    lkeys = (["__gran"] + [by]) if by else ["__gran"]
    rkeys = (["__gran"] + [right_by]) if right_by else ["__gran"]

    hot_out = None
    if hot_denom:
        from .groupops import heavy_hitters

        left_c = left_t.map_batches(cell_of(by), batch_format="pyarrow")
        hot = heavy_hitters(
            _narrow_probe(left_c, ["__cell"]), "__cell", denom=hot_denom
        )
        if hot.num_rows:
            import ray

            from .enrich import _cached_get

            hot_vals = hot["item"].combine_chunks()
            right_c = right_t.map_batches(cell_of(right_by), batch_format="pyarrow")
            right_hot = _collect_arrow(
                right_c.map_batches(
                    _hot_mask_fn("__cell", hot_vals, True), batch_format="pyarrow"
                ),
                limit=hot_right_limit,  # driver never buffers past the cap
            )
            if right_hot is not None and 0 < right_hot.num_rows <= hot_right_limit:

                def _restore_ints(df: pd.DataFrame) -> pd.DataFrame:
                    # match the bucketed kernel's dtype discipline so the
                    # pandas merge sees identical key dtypes on both paths
                    for n, dt in int_restore.items():
                        if n in df.columns and df[n].dtype.kind == "f":
                            df[n] = df[n].astype(dt)
                    return df

                right_pd = _restore_ints(
                    right_hot.select(r_names + ["__gran"]).to_pandas()
                )
                rref = ray.put(right_pd)

                def hot_join(batch: pa.Table) -> pa.Table:
                    right = _cached_get(rref)
                    left = _restore_ints(
                        batch.select(l_names + ["__gran"]).to_pandas()
                    )
                    out = left.merge(
                        right, left_on=lkeys, right_on=rkeys, how="inner"
                    )
                    keep = (out[on] >= out[start_col]) & (out[on] < out[end_col])
                    out = out[keep]
                    return pa.table({
                        n: pa.Array.from_pandas(
                            out[n], type=types_all[n], safe=False
                        )
                        for n in out_names
                    })

                hot_out = left_c.map_batches(
                    _hot_mask_fn("__cell", hot_vals, True), batch_format="pyarrow"
                ).map_batches(hot_join, batch_format="pyarrow")
                # cold remainder continues down the bucketed path
                left_t = left_c.map_batches(
                    _hot_mask_fn("__cell", hot_vals, False), batch_format="pyarrow"
                )
                right_t = right_c.map_batches(
                    _hot_mask_fn("__cell", hot_vals, False), batch_format="pyarrow"
                )

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    both = left_t.map_batches(align, batch_format="pyarrow").union(
        right_t.map_batches(align, batch_format="pyarrow")
    ).materialize()

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        def side(mask, names):
            df = g[mask][names + ["__gran"]].copy()
            for n, dt in int_restore.items():
                if n in df.columns and df[n].dtype.kind == "f":
                    df[n] = df[n].astype(dt)
            return df

        left = side(g["__side"] == 0, l_names)
        right = side(g["__side"] == 1, r_names)
        out = left.merge(right, left_on=lkeys, right_on=rkeys, how="inner")
        keep = (out[on] >= out[start_col]) & (out[on] < out[end_col])
        out = out[keep].drop(columns=["__gran"])
        return out[out_names]

    def run(g: pd.DataFrame) -> pa.Table:
        df = merge_bucket(g)
        # explicit per-column types: empty buckets emit TYPED empty tables
        # (schemaless empties trigger executor schema-divergence warnings)
        return pa.table(
            {
                n: pa.Array.from_pandas(df[n], type=types_all[n], safe=False)
                for n in out_names
            }
        )

    cold_out = both.groupby("__bucket").map_groups(run, batch_format="pandas")
    return hot_out.union(cold_out) if hot_out is not None else cold_out


def skew_hash_join(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    num_buckets: int = 64,
    hot_denom: int = 100,
    hot_right_limit: int = 2_000_000,
):
    """Skew-aware inner hash join: HOT join keys (left-side frequency ≥
    N/hot_denom, found with the exact Misra-Gries two-pass — sketch-sized
    partials, never a full groupby) are routed around the shuffle — their
    right-side rows broadcast once and the hot left rows join as a pure
    map — while the cold remainder takes the normal bucketed hash join.
    A key that owns 30% of the probe side would otherwise land 30% of the
    shuffle in ONE bucket task; here it never enters the shuffle at all.

    Contract: the RIGHT rows of hot keys must be broadcast-small (hot
    keys are ≤ hot_denom by construction; right side is typically the
    dimension side) — guarded by ``hot_right_limit``: past it the driver
    stops collecting and everything takes the bucketed path. Inner-join
    semantics, identical output to ``bucket_hash_join`` (parity-pinned
    by tests)."""
    import ray

    from .enrich import _cached_get
    from .groupops import heavy_hitters

    hot = heavy_hitters(
        _narrow_probe(left_ds, [left_on]), left_on, denom=hot_denom
    )
    hot_keys = set(hot["item"].to_pylist()) if hot.num_rows else set()
    if not hot_keys:
        return bucket_hash_join(left_ds, right_ds, left_on, right_on,
                                num_buckets=num_buckets)

    hot_arr = np.array(sorted(hot_keys), dtype=np.int64)

    def split(on: str, keep_hot: bool):
        def _split(batch: pa.Table) -> pa.Table:
            k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.isin(k, hot_arr)
            return batch.filter(pa.array(m if keep_hot else ~m))

        return _split

    # hot path: broadcast the right rows of hot keys, join as a pure map
    right_hot = _collect_arrow(
        right_ds.map_batches(split(right_on, True), batch_format="pyarrow"),
        limit=hot_right_limit,  # driver never buffers past the cap
    )
    if right_hot is None or right_hot.num_rows > hot_right_limit:
        # hot right side too big to broadcast (or empty): bucketed path
        return bucket_hash_join(left_ds, right_ds, left_on, right_on,
                                num_buckets=num_buckets)
    # broadcast the Arrow table once; workers deserialize once each
    rref = ray.put(right_hot.combine_chunks())

    def hot_join(batch: pa.Table) -> pa.Table:
        # Arrow in/out (VERDICT r4 #4): same _join_indices kernel as
        # broadcast_join — no pandas round-trip, column order matches the
        # cold bucketed path (left columns, then right-only columns)
        r = _cached_get(rref)  # per-worker cached deserialization
        li, ri = _join_indices([batch[left_on]], [r[right_on]], "inner")
        cols = {}
        for n, t in zip(batch.column_names, batch.schema.types):
            cols[n] = _take_pad(batch[n], li, t)
        for n, t in zip(r.column_names, r.schema.types):
            if n == right_on and right_on == left_on:
                continue
            cols[n] = _take_pad(r[n], ri, t)
        return pa.table(cols)

    hot_out = left_ds.map_batches(
        split(left_on, True), batch_format="pyarrow"
    ).map_batches(hot_join, batch_format="pyarrow")

    cold_out = bucket_hash_join(
        left_ds.map_batches(split(left_on, False), batch_format="pyarrow"),
        right_ds.map_batches(split(right_on, False), batch_format="pyarrow"),
        left_on, right_on, num_buckets=num_buckets,
    )
    return hot_out.union(cold_out)
