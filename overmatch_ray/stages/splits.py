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
