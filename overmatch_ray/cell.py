"""Spatial cell index — the partition key for every wide spatial op.

Plays the role H3 res-9 / S2 level-14 play in SURVEY.md §2.4-J1: a
deterministic uint64 cell id per point, a k-ring neighborhood expansion so a
bounded-radius join becomes an equi-join on ``cell``, and a Hilbert sort key
for locality-preserving ordering within/across cells.

Implementation: a square grid in EPSG:3857 meters (cell edge
``CELL_SIZE_M`` = 256 m > the 100 m match radius, so k-ring-1 replication of
the index side covers the radius exactly — replaces the reference's global
rtree bbox query, /root/reference/scripts/match.py:133-144,212-215). Pure
numpy; no H3/S2 library exists in this environment.

Cell id layout: ``((ix + 2^31) << 32) | (iy + 2^31)`` with
``ix = floor(x / cell_size)`` — invertible, order-free, and hash-friendly.

Real S2 cell ids (the north star's "S2 level-14") live in
``overmatch_ray/s2.py`` — a pure-numpy implementation of the public S2
encoding, used for interop/lineage ids (`s2_cells` query). This square
grid stays the JOIN index because its k-ring-1 ⊇ 100 m guarantee is what
the conflation equi-join relies on.
"""

from __future__ import annotations

import numpy as np

from . import CELL_SIZE_M

_BIAS = np.uint64(1 << 31)
_LO32 = np.uint64(0xFFFFFFFF)


def cell_id(x: np.ndarray, y: np.ndarray, cell_size: float = CELL_SIZE_M) -> np.ndarray:
    """EPSG:3857 meters → uint64 cell id. Vectorized."""
    ix = np.floor(np.asarray(x, np.float64) / cell_size).astype(np.int64)
    iy = np.floor(np.asarray(y, np.float64) / cell_size).astype(np.int64)
    return ((ix.astype(np.uint64) + _BIAS) << np.uint64(32)) | (
        iy.astype(np.uint64) + _BIAS
    )


def cell_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 cell id → (ix, iy) int64 grid coordinates."""
    cell = np.asarray(cell, dtype=np.uint64)
    ix = (cell >> np.uint64(32)).astype(np.int64) - (1 << 31)
    iy = (cell & _LO32).astype(np.int64) - (1 << 31)
    return ix, iy


# (di, dj) offsets for k-ring-1: the cell itself + 8 neighbors.
KRING1 = np.array(
    [(0, 0), (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
    dtype=np.int64,
)


def kring1_cells(cell: np.ndarray) -> np.ndarray:
    """For each input cell, its 9 k-ring-1 cell ids → shape (n, 9) uint64.

    Used to REPLICATE the index (Overture) side of the conflation join so
    every ≤100 m pair lands in at least one shared cell.
    """
    ix, iy = cell_ij(cell)
    nix = ix[:, None] + KRING1[None, :, 0]
    niy = iy[:, None] + KRING1[None, :, 1]
    return ((nix.astype(np.uint64) + _BIAS) << np.uint64(32)) | (
        niy.astype(np.uint64) + _BIAS
    )


def hilbert_key(x: np.ndarray, y: np.ndarray, order: int = 16) -> np.ndarray:
    """Vectorized Hilbert curve index (xy → d) over the mercator square.

    Maps EPSG:3857 coords onto a 2^order × 2^order grid and returns the
    Hilbert distance (uint64). Used as the within-cell sort key for
    candidate-list locality (SURVEY.md §2.4-J1) and for locality-preserving
    output partitioning. Classic public-domain bit-twiddling algorithm
    (Wikipedia "Hilbert curve" xy2d), vectorized with numpy.
    """
    from .geo import MERC_MAX

    n_side = np.int64(1) << order
    scale = (2.0 * MERC_MAX) / float(n_side)
    gx = np.clip(
        np.floor((np.asarray(x, np.float64) + MERC_MAX) / scale), 0, n_side - 1
    ).astype(np.int64)
    gy = np.clip(
        np.floor((np.asarray(y, np.float64) + MERC_MAX) / scale), 0, n_side - 1
    ).astype(np.int64)

    rx = np.zeros_like(gx)
    ry = np.zeros_like(gy)
    d = np.zeros_like(gx, dtype=np.uint64)
    s = n_side >> 1
    while s > 0:
        rx = ((gx & s) > 0).astype(np.int64)
        ry = ((gy & s) > 0).astype(np.int64)
        d += np.uint64(s) * np.uint64(s) * ((np.uint64(3) * rx.astype(np.uint64)) ^ ry.astype(np.uint64))
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        gx_f = np.where(flip, s - 1 - gx, gx)
        gy_f = np.where(flip, s - 1 - gy, gy)
        gx, gy = np.where(swap, gy_f, gx_f), np.where(swap, gx_f, gy_f)
        s >>= 1
    return d
