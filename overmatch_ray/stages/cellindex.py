"""Cell-encoding kernels: the vectorized map_batches bodies that turn the
bounded-radius spatial join into an equi-join on ``cell`` (SURVEY.md §2.4-J1).

Two side-neutral kernels; the PIPELINE decides which join side gets which:

- ``encode_cells_batch``: one row per feature, its OWN cell.
- ``replicate_kring_batch``: each row replicated to its k-ring-1
  neighborhood (9 cells). Because the 100 m match radius is smaller than
  the 256 m cell edge, a pair within radius always shares exactly one
  (own-cell, replica-cell) coincidence — no post-join dedup needed.

Rule of thumb (CLAUDE.md): replicate the NARROW side — in the conflation
join that is the OSM probe side; the Overture side carries its ~300 B tag
payload through the shuffle exactly once (pipelines/conflate.py).

Both kernels also add ``bucket = splitmix64(cell) % num_buckets`` — the
shuffle key for the bucketed join (bounded group count; hot cells cost
time, not memory, thanks to chunked pair generation in the matcher).
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


def encode_cells_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
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


def replicate_kring_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
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


# backwards-compatible aliases (older call sites / round-1 history)
encode_probe_batch = encode_cells_batch
replicate_index_batch = replicate_kring_batch
