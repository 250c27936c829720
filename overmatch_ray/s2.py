"""Pure-numpy S2 cell ids — the literal "S2 level-14" index the north star
names (BASELINE.json north_star; SURVEY.md §2.4-J1), implemented from the
public S2 geometry definition (quadratic cube-face projection + Hilbert
curve, as specified in s2geometry's s2cell_id docs) with NO external
library: the container has no s2/h3 package, so the encoder is a
vectorized lookup-table Hilbert walk over numpy arrays.

Role in the engine: `cell.py`'s square EPSG:3857 grid remains the JOIN
index (its k-ring-1 ⊇ 100 m radius guarantee is what the conflation
equi-join needs); S2 ids are the INTEROP / bucketing / lineage cell id —
globally valid (no mercator pole cutoff), hierarchical (one `parent()`
bit-op re-buckets 30 levels), and directly comparable with external S2
tooling. `stages/cellindex.py` stays the hot path; this module is the
standards-compliant id for manifests, checkpoints and cross-system joins.

Layout (public spec): 64 bits = 3 face bits + 60 Hilbert-position bits +
one trailing sentinel 1 at position 2*(30-level). All kernels are
vectorized (8 table-lookup rounds per array, no per-row Python).

Verified against an independent per-level orientation walk (different
code path, 2 bits at a time) plus geometric roundtrip properties in
tests/test_s2.py — byte-level parity with the reference C++ library is
implied by construction (same tables, same bit layout) but cannot be
re-checked in this container; the two-implementation agreement is the
in-repo evidence.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell traversal order per orientation: POS_TO_IJ[r][pos] = ij
# (ij = 2*i + j), and the orientation change each sub-cell applies.
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped + inverted
)
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

# 4-level (4-bit) flattened lookup tables: index = (ij8 << 2) | orient,
# value = (pos8 << 2) | orient  (and the inverse for decode).
_LOOKUP_POS = np.zeros(1 << 10, dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << 10, dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int):
    if level == _LOOKUP_BITS:
        ij = (i << 4) | j
        _LOOKUP_POS[(ij << 2) | orig] = (pos << 2) | orient
        _LOOKUP_IJ[(pos << 2) | orig] = (ij << 2) | orient
        return
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level + 1,
            (i << 1) | (r[idx] >> 1),
            (j << 1) | (r[idx] & 1),
            orig,
            (pos << 2) | idx,
            orient ^ _POS_TO_ORIENT[idx],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)

_U = np.uint64


def _xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp < 0, axis + 3, axis).astype(np.int64)
    # ValidFaceXYZtoUV, vectorized over the 6 cases. Unselected lanes may
    # divide by zero — they are never chosen, so silence them.
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face, u, v


def _face_uv_to_xyz(
    face: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    one = np.ones_like(u)
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    with np.errstate(invalid="ignore"):  # unselected where-branch at |u|=1
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor((1 << MAX_LEVEL) * s), 0, (1 << MAX_LEVEL) - 1
    ).astype(np.int64)


def face_ij_to_cell(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """(face, leaf i, leaf j) → uint64 S2 cell id at ``level``. Vectorized
    8-round lookup walk (the flat-loop form of the public algorithm)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << _U(60)
    bits = face & _U(_SWAP)
    for k in range(7, -1, -1):
        kk = _U(4 * k)
        bits += ((i >> kk) & _U(15)) << _U(6)
        bits += ((j >> kk) & _U(15)) << _U(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> _U(2)) << _U(8 * k)
        bits &= _U(_SWAP | _INVERT)
    leaf = n * _U(2) + _U(1)
    if level >= MAX_LEVEL:
        return leaf
    return cell_parent(leaf, level)


def cell_to_face_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """uint64 cell id → (face, i, j) of the leaf cell the id's sentinel bit
    designates (the cell's center leaf for non-leaf ids)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> _U(61)).astype(np.int64)
    bits = (cell >> _U(61)) & _U(_SWAP)
    i = np.zeros(cell.shape, dtype=np.uint64)
    j = np.zeros(cell.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = 2 if k == 7 else 4
        bits += ((cell >> _U(8 * k + 1)) & _U((1 << (2 * nbits)) - 1)) << _U(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> _U(6)) << _U(4 * k)
        j += ((bits >> _U(2)) & _U(15)) << _U(4 * k)
        bits &= _U(_SWAP | _INVERT)
    return face, i.astype(np.int64), j.astype(np.int64)


def lnglat_to_cell(
    lon_deg: np.ndarray, lat_deg: np.ndarray, level: int = 14
) -> np.ndarray:
    """lon/lat degrees → uint64 S2 cell id at ``level`` (default the north
    star's level 14). Fully vectorized."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    x, y, z = cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return face_ij_to_cell(face, i, j, level)


def cell_to_lnglat(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 cell id → (lon, lat) degrees of the cell CENTER."""
    cell = np.asarray(cell, dtype=np.uint64)
    face, i, j = cell_to_face_ij(cell)
    is_leaf = (cell & _U(1)) == _U(1)
    # GetCenterSiTi: leaf centers sit at odd si/ti; non-leaf centers are
    # even, on the max-level grid the sentinel walk lands next to.
    odd = ((i ^ (cell >> _U(2)).astype(np.int64)) & 1) != 0
    delta = np.where(is_leaf, 1, np.where(odd, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    s = si.astype(np.float64) / (1 << (MAX_LEVEL + 1))
    t = ti.astype(np.float64) / (1 << (MAX_LEVEL + 1))
    x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level of each id (position of the trailing sentinel bit)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + _U(1))
    # lsb is a power of two ≤ 2^60 — float64 log2 is exact there.
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def cell_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at ``level`` (pure bit-op, no re-encode)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = _U(1) << _U(2 * (MAX_LEVEL - level))
    return (cell & ~(lsb - _U(1))) | lsb


def cell_range(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(range_min, range_max) leaf ids covered — containment is the pure
    integer test ``range_min <= leaf <= range_max`` (no geometry)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + _U(1))
    return cell - (lsb - _U(1)), cell + (lsb - _U(1))


def cell_token(cell: np.ndarray) -> list[str]:
    """Canonical hex tokens (trailing zeros stripped), e.g. '89c2599'."""
    cell = np.asarray(cell, dtype=np.uint64).ravel()
    return [format(int(c), "016x").rstrip("0") or "X" for c in cell]


def token_to_cell(tokens: list[str]) -> np.ndarray:
    return np.array(
        [0 if t == "X" else int(t.ljust(16, "0"), 16) for t in tokens],
        dtype=np.uint64,
    )
