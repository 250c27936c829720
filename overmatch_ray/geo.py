"""Vectorized geometry kernels (pure numpy, no shapely/pyproj).

Reproduces the reference's geometry semantics:

- EPSG:4326 → EPSG:3857 (web mercator) projection, because the reference
  computes all match distances in 3857 planar meters
  (/root/reference/scripts/match.py:116-121, :222).
- Euclidean planar distance in those meters.
- WKB point/polygon encode/decode + ray-cast point-in-polygon, replacing the
  reference's shapely ``ST_INTERSECTS`` residual filter
  (/root/reference/scripts/build_query.py:104).
"""

from __future__ import annotations

import struct

import numpy as np

# WGS84 / web-mercator constants (public EPSG:3857 definition).
EARTH_RADIUS_M = 6378137.0
MERC_MAX = np.pi * EARTH_RADIUS_M  # ±20037508.342789244


def mercator_xy(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 lon/lat (degrees) → EPSG:3857 x/y (meters). Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = EARTH_RADIUS_M * np.radians(lon)
    y = EARTH_RADIUS_M * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def inverse_mercator(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 meters → lon/lat degrees. Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS_M)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS_M)) - np.pi / 2.0)
    return lon, lat


def planar_distance(x1, y1, x2, y2) -> np.ndarray:
    """Euclidean distance in the projected plane (reference match.py:222)."""
    dx = np.asarray(x1, dtype=np.float64) - np.asarray(x2, dtype=np.float64)
    dy = np.asarray(y1, dtype=np.float64) - np.asarray(y2, dtype=np.float64)
    return np.hypot(dx, dy)


def parse_wkt_points(wkts) -> tuple[np.ndarray, np.ndarray]:
    """M20: 'POINT(lon lat)' strings → (lon, lat) arrays (the reference's
    SPARQL centroid format, get_osm_ids.py:107-113). Invalid → NaN."""
    import re

    pat = re.compile(r"POINT\s*\(\s*(-?[\d.eE+]+)\s+(-?[\d.eE+]+)\s*\)", re.I)
    n = len(wkts)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    for i, w in enumerate(wkts):
        m = pat.search(w or "")
        if m:
            lon[i] = float(m.group(1))
            lat[i] = float(m.group(2))
    return lon, lat


# ---------------------------------------------------------------------------
# WKB (well-known binary) — little-endian, 2-D only.
# ---------------------------------------------------------------------------

_WKB_POINT = 1
_WKB_POLYGON = 3


def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, float(lon), float(lat))


def wkb_points(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    """Vector-ish WKB point encoder (one bytes object per row)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    head = struct.pack("<BI", 1, _WKB_POINT)
    return [head + struct.pack("<dd", lo, la) for lo, la in zip(lon, lat)]


def parse_wkb_points(blobs) -> tuple[np.ndarray, np.ndarray]:
    """Decode a sequence of WKB POINT blobs → (lon, lat) float64 arrays.

    Vectorized: concatenates the fixed-width blobs and reinterprets the
    coordinate payload with one ``np.frombuffer``.
    """
    n = len(blobs)
    if n == 0:
        return np.empty(0), np.empty(0)
    buf = b"".join(blobs)
    if len(buf) != 21 * n:
        # Mixed / unexpected sizes: fall back to per-row parse.
        lon = np.empty(n)
        lat = np.empty(n)
        for i, b in enumerate(blobs):
            _, _, lon[i], lat[i] = struct.unpack("<BIdd", b[:21])
        return lon, lat
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, 21)
    coords = arr[:, 5:21].copy().view("<f8")
    return coords[:, 0].copy(), coords[:, 1].copy()


_WKB_LINESTRING = 2


def wkb_linestring(coords: np.ndarray) -> bytes:
    """Encode an (N,2) float64 coordinate array as WKB LINESTRING."""
    coords = np.asarray(coords, dtype=np.float64)
    return (
        struct.pack("<BII", 1, _WKB_LINESTRING, len(coords))
        + coords.astype("<f8").tobytes()
    )


def parse_wkb_linestring(blob: bytes) -> np.ndarray:
    """Decode WKB LINESTRING → (N,2) float64 coordinate array."""
    byte_order, geom_type, npts = struct.unpack_from("<BII", blob, 0)
    if geom_type != _WKB_LINESTRING:
        raise ValueError(f"not a WKB linestring (type={geom_type})")
    return (
        np.frombuffer(blob, dtype="<f8", count=npts * 2, offset=9)
        .reshape(npts, 2)
        .copy()
    )


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    """Encode a polygon. ``rings[0]`` is the exterior, rest are holes; each
    ring is an (N,2) float64 array of (lon,lat), closed or open (we close)."""
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not (ring[0] == ring[-1]).all():
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def parse_wkb_polygon(blob: bytes) -> list[np.ndarray]:
    """Decode WKB POLYGON → list of (N,2) rings."""
    byte_order, geom_type, nrings = struct.unpack_from("<BII", blob, 0)
    if geom_type != _WKB_POLYGON:
        raise ValueError(f"not a WKB polygon (type={geom_type})")
    off = 9
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", blob, off)
        off += 4
        ring = np.frombuffer(blob, dtype="<f8", count=npts * 2, offset=off)
        rings.append(ring.reshape(npts, 2).copy())
        off += npts * 16
    return rings


class PackedPolygon:
    """A polygon packed into flat numpy buffers for vectorized ray-cast PIP.

    Broadcast once via ``ray.put`` and probed per batch inside
    ``map_batches`` — the Ray-native replacement for the reference's
    DuckDB ``ST_INTERSECTS(boundary, geometry)`` residual filter
    (/root/reference/scripts/build_query.py:104).
    """

    def __init__(self, rings: list[np.ndarray]):
        xs, ys = [], []
        for ring in rings:
            ring = np.asarray(ring, dtype=np.float64)
            if not (ring[0] == ring[-1]).all():
                ring = np.vstack([ring, ring[:1]])
            xs.append(ring[:, 0])
            ys.append(ring[:, 1])
        # Edge list across all rings: (x1,y1)→(x2,y2) consecutive pairs.
        self.x1 = np.concatenate([x[:-1] for x in xs])
        self.y1 = np.concatenate([y[:-1] for y in ys])
        self.x2 = np.concatenate([x[1:] for x in xs])
        self.y2 = np.concatenate([y[1:] for y in ys])
        allx = np.concatenate(xs)
        ally = np.concatenate(ys)
        self.bounds = (allx.min(), ally.min(), allx.max(), ally.max())

    @classmethod
    def from_wkb(cls, blob: bytes) -> "PackedPolygon":
        return cls(parse_wkb_polygon(blob))

    def contains(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd ray-cast, vectorized over points × edges (chunked so the
        pairwise matrix stays bounded). Boundary points follow the half-open
        crossing rule (deterministic)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = px.shape[0]
        inside = np.zeros(n, dtype=bool)
        xmin, ymin, xmax, ymax = self.bounds
        bbox = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        idx = np.nonzero(bbox)[0]
        if idx.size == 0:
            return inside
        x1, y1, x2, y2 = self.x1, self.y1, self.x2, self.y2
        chunk = max(1, 4_000_000 // max(1, x1.size))
        for s in range(0, idx.size, chunk):
            sel = idx[s : s + chunk]
            qx = px[sel][:, None]
            qy = py[sel][:, None]
            crosses = (y1[None, :] > qy) != (y2[None, :] > qy)
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (qy - y1[None, :]) / (y2[None, :] - y1[None, :])
                xint = x1[None, :] + t * (x2[None, :] - x1[None, :])
            hits = crosses & (qx < xint)
            inside[sel] = (hits.sum(axis=1) % 2).astype(bool)
        return inside
