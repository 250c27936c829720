"""Cell-encoding stages: the vectorized map_batches kernels that turn the
bounded-radius spatial join into an equi-join on ``cell`` (SURVEY.md §2.4-J1).

- probe side (OSM): one row per feature, its own cell.
- index side (Overture): replicated to the k-ring-1 neighborhood (9 cells),
  because the 100 m match radius is smaller than the 256 m cell edge — every
  ≤100 m pair is guaranteed to share exactly one (probe-cell, replica-cell)
  coincidence, so no post-join dedup is needed.

Both also get ``bucket = splitmix64(cell) % num_buckets`` — the shuffle key
for the bucketed hash join (bounded group count, skew-tolerant: a bucket is
processed with vectorized kernels and chunked pair generation, so hot urban
cells cost time, not memory).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cell import cell_id, kring1_cells
from ..geo import mercator_xy

_U64 = np.uint64


def _mix(cell: np.ndarray) -> np.ndarray:
    z = cell.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def bucket_of(cell: np.ndarray, num_buckets: int) -> np.ndarray:
    return (_mix(cell) % _U64(num_buckets)).astype(np.int64)


def encode_probe_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Add x, y (EPSG:3857), cell, bucket to a batch with lon/lat columns."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    x, y = mercator_xy(lon, lat)
    cell = cell_id(x, y)
    return (
        batch.append_column("x", pa.array(x))
        .append_column("y", pa.array(y))
        .append_column("cell", pa.array(cell.view(np.int64)))
        .append_column("bucket", pa.array(bucket_of(cell, num_buckets)))
    )


def replicate_index_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Replicate each row to its 9 k-ring-1 cells (row count ×9)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    x, y = mercator_xy(lon, lat)
    own = cell_id(x, y)
    cells = kring1_cells(own).ravel()  # (n*9,)
    take = np.repeat(np.arange(batch.num_rows, dtype=np.int64), 9)
    out = batch.take(pa.array(take))
    return (
        out.append_column("x", pa.array(np.repeat(x, 9)))
        .append_column("y", pa.array(np.repeat(y, 9)))
        .append_column("cell", pa.array(cells.view(np.int64)))
        .append_column("bucket", pa.array(bucket_of(cells, num_buckets)))
    )
