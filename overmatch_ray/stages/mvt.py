"""Dependency-free Mapbox Vector Tile (MVT) encoding — the binary tile
artifact a map client / PMTiles packer consumes.

The reference ships its tiles through tippecanoe → PMTiles
(/root/reference/scripts/build_pmtiles.py:186-200). Neither tool exists in
this environment, so the engine encodes the MVT protobuf itself from the
public spec (Mapbox Vector Tile spec 2.1: protobuf wire format, zigzag
geometry deltas, command integers). Point features only — the engine's
feature model is points (SURVEY.md §2.1-S15).

Encoding is fully deterministic: property keys sorted, values deduplicated
in first-use order, features pre-ordered by the caller's pinned rank — so
tile bytes are identical across runs and parallelism levels (pinned by
tests/test_postmatch.py tiling determinism).
"""

from __future__ import annotations

import math

import numpy as np

EXTENT = 4096

# protobuf field keys: (field_number << 3) | wire_type
_TILE_LAYER = 26  # Tile.layers = 3, len-delimited
_LAYER_NAME = 10  # Layer.name = 1, len-delimited
_LAYER_FEATURE = 18  # Layer.features = 2, len-delimited
_LAYER_KEY = 26  # Layer.keys = 3, len-delimited
_LAYER_VALUE = 34  # Layer.values = 4, len-delimited
_LAYER_EXTENT = 40  # Layer.extent = 5, varint
_LAYER_VERSION = 120  # Layer.version = 15, varint
_FEATURE_TAGS = 18  # Feature.tags = 2, packed
_FEATURE_TYPE = 24  # Feature.type = 3, varint (POINT = 1)
_FEATURE_GEOM = 34  # Feature.geometry = 4, packed
_VALUE_STRING = 10  # Value.string_value = 1, len-delimited
_VALUE_DOUBLE = 25  # Value.double_value = 3, 64-bit
_VALUE_INT = 32  # Value.int_value = 4, varint
_VALUE_BOOL = 56  # Value.bool_value = 7, varint


def _varint_slow(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# the overwhelming majority of varints in a point tile (tag indices,
# field keys, lengths, zigzagged extent-grid coordinates ≤ 2*4096) fit in
# two bytes — a precomputed table turns the hot encode into a list index
# (bit-identical to the loop; ~1 MB once per process)
_VARINT_TABLE = [_varint_slow(i) for i in range(16384)]


def _varint(n: int) -> bytes:
    if 0 <= n < 16384:
        return _VARINT_TABLE[n]
    return _varint_slow(n)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _ld(key: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _varint(key) + _varint(len(payload)) + payload


def _encode_value(v) -> bytes:
    """MVT Value message for one property value."""
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return _varint(_VALUE_BOOL) + _varint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        # int_value is a plain (two's-complement) varint in the MVT spec
        return _varint(_VALUE_INT) + _varint(int(v))
    if isinstance(v, (float, np.floating)):
        import struct

        return _varint(_VALUE_DOUBLE) + struct.pack("<d", float(v))
    b = str(v).encode()
    return _ld(_VALUE_STRING, b)


def encode_mvt_tile(
    props: "list[dict]",
    px: np.ndarray,
    py: np.ndarray,
    layer_name: str = "overmatch",
    extent: int = EXTENT,
) -> bytes:
    """Encode one tile: parallel lists of per-feature property dicts and
    tile-local integer coordinates (already clipped to [0, extent])."""
    keys: dict[str, int] = {}
    values: dict[bytes, int] = {}
    # memoize value encoding per (type, value): tiles repeat property
    # values heavily and _encode_value dominates the profile otherwise.
    # The type name is part of the key because encoding is type-dependent
    # and e.g. True == 1 under dict equality; floats additionally carry
    # their sign so -0.0 (== and hash-equal to 0.0, but a different
    # IEEE-754 payload) doesn't reuse 0.0's bytes.
    vcache: dict = {}
    feats = []
    vt = _VARINT_TABLE
    type_point = _varint(_FEATURE_TYPE) + _varint(1)  # POINT
    for rec, x, y in zip(props, px, py):
        tags: list[int] = []
        for k in sorted(rec):
            v = rec[k]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            ki = keys.setdefault(k, len(keys))
            if isinstance(v, (float, np.floating)):
                ck = (type(v).__name__, v, math.copysign(1.0, v))
            else:
                ck = (type(v).__name__, v)
            vb = vcache.get(ck)
            if vb is None:
                vb = vcache[ck] = _encode_value(v)
            vi = values.setdefault(vb, len(values))
            tags.extend((ki, vi))
        tag_payload = b"".join([vt[t] if t < 16384 else _varint(t) for t in tags])
        geom = vt[9] + _varint(_zigzag(int(x))) + _varint(_zigzag(int(y)))
        feat = (
            _ld(_FEATURE_TAGS, tag_payload)
            + type_point
            + _ld(_FEATURE_GEOM, geom)
        )
        feats.append(_ld(_LAYER_FEATURE, feat))
    layer = bytearray()
    layer += _varint(_LAYER_VERSION) + _varint(2)
    layer += _ld(_LAYER_NAME, layer_name.encode())
    for f in feats:
        layer += f
    for k in keys:  # insertion order == first-use order (deterministic)
        layer += _ld(_LAYER_KEY, k.encode())
    for vb in values:
        layer += _ld(_LAYER_VALUE, vb)
    layer += _varint(_LAYER_EXTENT) + _varint(extent)
    return bytes(_ld(_TILE_LAYER, bytes(layer)))


def tile_local_coords(
    lon: np.ndarray, lat: np.ndarray, zoom: int, tx: int, ty: int,
    extent: int = EXTENT,
) -> tuple[np.ndarray, np.ndarray]:
    """Web-mercator fractional tile position → integer extent grid."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = float(1 << zoom)
    fx = (lon + 180.0) / 360.0 * n - tx
    lat_r = np.radians(np.clip(lat, -85.051128779807, 85.051128779807))
    fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n - ty
    px = np.clip(np.floor(fx * extent), 0, extent).astype(np.int64)
    py = np.clip(np.floor(fy * extent), 0, extent).astype(np.int64)
    return px, py


def decode_mvt_points(data: bytes) -> "list[dict]":
    """Minimal MVT reader for tests: returns per-feature dicts with
    ``__x``/``__y`` extent coords plus decoded properties."""
    import struct

    def read_varint(buf, i):
        shift = out = 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out, i
            shift += 7

    def parse_value(buf):
        i = 0
        while i < len(buf):
            key, i = read_varint(buf, i)
            fnum, wt = key >> 3, key & 7
            if wt == 2:
                ln, i = read_varint(buf, i)
                return buf[i : i + ln].decode()
            if wt == 1:
                return struct.unpack_from("<d", buf, i)[0]
            v, i = read_varint(buf, i)
            if fnum == 7:
                return bool(v)
            if fnum == 4 and v >= 1 << 63:
                # int_value is a two's-complement varint (encoder masks to
                # 64 bits) — sign-extend so negatives roundtrip
                v -= 1 << 64
            return v
        return None

    feats, keys, values = [], [], []
    i = 0
    key, i = read_varint(data, i)
    assert key == _TILE_LAYER
    ln, i = read_varint(data, i)
    layer = data[i : i + ln]
    i = 0
    raw_feats = []
    while i < len(layer):
        key, i = read_varint(layer, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            _, i = read_varint(layer, i)
            continue
        ln, i = read_varint(layer, i)
        payload = layer[i : i + ln]
        i += ln
        if fnum == 2:
            raw_feats.append(payload)
        elif fnum == 3:
            keys.append(payload.decode())
        elif fnum == 4:
            values.append(parse_value(payload))
    for payload in raw_feats:
        j = 0
        tags, geom = [], []
        while j < len(payload):
            key, j = read_varint(payload, j)
            fnum, wt = key >> 3, key & 7
            if wt == 0:
                _, j = read_varint(payload, j)
                continue
            ln, j = read_varint(payload, j)
            sub = payload[j : j + ln]
            j += ln
            vals, jj = [], 0
            while jj < len(sub):
                v, jj = read_varint(sub, jj)
                vals.append(v)
            if fnum == 2:
                tags = vals
            elif fnum == 4:
                geom = vals
        assert geom[0] == 9  # MoveTo ×1
        zz = lambda u: (u >> 1) ^ -(u & 1)
        rec = {"__x": zz(geom[1]), "__y": zz(geom[2])}
        for ki, vi in zip(tags[::2], tags[1::2]):
            rec[keys[ki]] = values[vi]
        feats.append(rec)
    return feats


def encode_mvt_lines(
    props: "list[dict]",
    lines: "list[list[np.ndarray]]",
    layer_name: str = "overmatch",
    extent: int = EXTENT,
) -> bytes:
    """Encode one tile of LINESTRING features (spec geometry type 2).
    ``lines[i]`` is a list of parts; each part is an (N≥2, 2) int array of
    tile-local extent coords. Parts encode as MoveTo(1)+LineTo(N-1) runs
    with zigzag deltas carried across parts (cursor semantics per spec).
    Same determinism contract as ``encode_mvt_tile``."""
    keys: dict[str, int] = {}
    values: dict[bytes, int] = {}
    feats = []
    for rec, parts in zip(props, lines):
        tags: list[int] = []
        for k in sorted(rec):
            v = rec[k]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            ki = keys.setdefault(k, len(keys))
            vb = _encode_value(v)
            vi = values.setdefault(vb, len(values))
            tags.extend((ki, vi))
        tag_payload = b"".join(_varint(t) for t in tags)
        geom = bytearray()
        cx = cy = 0
        for part in parts:
            part = np.asarray(part, dtype=np.int64)
            if part.shape[0] < 2:
                continue
            geom += _varint((1 << 3) | 1)  # MoveTo, count 1
            geom += _varint(_zigzag(int(part[0, 0]) - cx))
            geom += _varint(_zigzag(int(part[0, 1]) - cy))
            cx, cy = int(part[0, 0]), int(part[0, 1])
            n = part.shape[0] - 1
            geom += _varint((n << 3) | 2)  # LineTo, count n
            for j in range(1, part.shape[0]):
                geom += _varint(_zigzag(int(part[j, 0]) - cx))
                geom += _varint(_zigzag(int(part[j, 1]) - cy))
                cx, cy = int(part[j, 0]), int(part[j, 1])
        feat = (
            _ld(_FEATURE_TAGS, tag_payload)
            + _varint(_FEATURE_TYPE)
            + _varint(2)  # LINESTRING
            + _ld(_FEATURE_GEOM, bytes(geom))
        )
        feats.append(_ld(_LAYER_FEATURE, feat))
    layer = bytearray()
    layer += _varint(_LAYER_VERSION) + _varint(2)
    layer += _ld(_LAYER_NAME, layer_name.encode())
    for f in feats:
        layer += f
    for k in keys:
        layer += _ld(_LAYER_KEY, k.encode())
    for vb in values:
        layer += _ld(_LAYER_VALUE, vb)
    layer += _varint(_LAYER_EXTENT) + _varint(extent)
    return bytes(_ld(_TILE_LAYER, bytes(layer)))


def decode_mvt_lines(data: bytes) -> "list[dict]":
    """Minimal LINESTRING reader for tests: per-feature dicts with
    ``__parts`` (list of (N,2) int lists) plus decoded properties."""

    def read_varint(buf, i):
        shift = out = 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out, i
            shift += 7

    import struct as _struct

    def parse_value(buf):
        i = 0
        while i < len(buf):
            key, i = read_varint(buf, i)
            fnum, wt = key >> 3, key & 7
            if wt == 2:
                ln, i = read_varint(buf, i)
                return buf[i : i + ln].decode()
            if wt == 1:
                return _struct.unpack_from("<d", buf, i)[0]
            v, i = read_varint(buf, i)
            if fnum == 7:
                return bool(v)
            if fnum == 4 and v >= 1 << 63:
                v -= 1 << 64
            return v
        return None

    feats, keys, values = [], [], []
    i = 0
    key, i = read_varint(data, i)
    assert key == _TILE_LAYER
    ln, i = read_varint(data, i)
    layer = data[i : i + ln]
    i = 0
    raw_feats = []
    while i < len(layer):
        key, i = read_varint(layer, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            _, i = read_varint(layer, i)
            continue
        ln, i = read_varint(layer, i)
        payload = layer[i : i + ln]
        i += ln
        if fnum == 2:
            raw_feats.append(payload)
        elif fnum == 3:
            keys.append(payload.decode())
        elif fnum == 4:
            values.append(parse_value(payload))
    zz = lambda u: (u >> 1) ^ -(u & 1)
    for payload in raw_feats:
        j = 0
        tags, geom, ftype = [], [], None
        while j < len(payload):
            key, j = read_varint(payload, j)
            fnum, wt = key >> 3, key & 7
            if wt == 0:
                v, j = read_varint(payload, j)
                if fnum == 3:
                    ftype = v
                continue
            ln, j = read_varint(payload, j)
            sub = payload[j : j + ln]
            j += ln
            vals, jj = [], 0
            while jj < len(sub):
                v, jj = read_varint(sub, jj)
                vals.append(v)
            if fnum == 2:
                tags = vals
            elif fnum == 4:
                geom = vals
        assert ftype == 2
        parts = []
        cx = cy = 0
        k = 0
        cur = None
        while k < len(geom):
            cmd = geom[k]
            cid, cnt = cmd & 7, cmd >> 3
            k += 1
            if cid == 1:  # MoveTo
                for _ in range(cnt):
                    cx += zz(geom[k]); cy += zz(geom[k + 1]); k += 2
                    cur = [[cx, cy]]
                    parts.append(cur)
            elif cid == 2:  # LineTo
                for _ in range(cnt):
                    cx += zz(geom[k]); cy += zz(geom[k + 1]); k += 2
                    cur.append([cx, cy])
        rec = {"__parts": parts}
        for ki, vi in zip(tags[::2], tags[1::2]):
            rec[keys[ki]] = values[vi]
        feats.append(rec)
    return feats


def _signed_area2(ring: np.ndarray) -> int:
    """2× surveyor signed area of an integer ring (no repeated last pt)."""
    x, y = ring[:, 0], ring[:, 1]
    return int(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def encode_mvt_polygons(
    props: "list[dict]",
    polys: "list[list[np.ndarray]]",
    layer_name: str = "overmatch",
    extent: int = EXTENT,
) -> bytes:
    """Encode one tile of POLYGON features (spec geometry type 3).
    ``polys[i]`` is a list of exterior rings ((N≥3, 2) int arrays, first
    vertex not repeated); each encodes as MoveTo(1) + LineTo(N-1) +
    ClosePath(1). Rings are reoriented so the surveyor's-formula area is
    POSITIVE in tile coords (the spec's exterior-ring rule). Same
    determinism contract as the point/line encoders."""
    keys: dict[str, int] = {}
    values: dict[bytes, int] = {}
    feats = []
    for rec, rings in zip(props, polys):
        tags: list[int] = []
        for k in sorted(rec):
            v = rec[k]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            ki = keys.setdefault(k, len(keys))
            vb = _encode_value(v)
            vi = values.setdefault(vb, len(values))
            tags.extend((ki, vi))
        tag_payload = b"".join(_varint(t) for t in tags)
        geom = bytearray()
        cx = cy = 0
        for ring in rings:
            ring = np.asarray(ring, dtype=np.int64)
            if ring.shape[0] < 3 or _signed_area2(ring) == 0:
                continue
            if _signed_area2(ring) < 0:
                ring = ring[::-1]
            geom += _varint((1 << 3) | 1)  # MoveTo ×1
            geom += _varint(_zigzag(int(ring[0, 0]) - cx))
            geom += _varint(_zigzag(int(ring[0, 1]) - cy))
            cx, cy = int(ring[0, 0]), int(ring[0, 1])
            n = ring.shape[0] - 1
            geom += _varint((n << 3) | 2)  # LineTo ×(N-1)
            for j in range(1, ring.shape[0]):
                geom += _varint(_zigzag(int(ring[j, 0]) - cx))
                geom += _varint(_zigzag(int(ring[j, 1]) - cy))
                cx, cy = int(ring[j, 0]), int(ring[j, 1])
            geom += _varint((1 << 3) | 7)  # ClosePath ×1
        feat = (
            _ld(_FEATURE_TAGS, tag_payload)
            + _varint(_FEATURE_TYPE)
            + _varint(3)  # POLYGON
            + _ld(_FEATURE_GEOM, bytes(geom))
        )
        feats.append(_ld(_LAYER_FEATURE, feat))
    layer = bytearray()
    layer += _varint(_LAYER_VERSION) + _varint(2)
    layer += _ld(_LAYER_NAME, layer_name.encode())
    for f in feats:
        layer += f
    for k in keys:
        layer += _ld(_LAYER_KEY, k.encode())
    for vb in values:
        layer += _ld(_LAYER_VALUE, vb)
    layer += _varint(_LAYER_EXTENT) + _varint(extent)
    return bytes(_ld(_TILE_LAYER, bytes(layer)))


def decode_mvt_polygons(data: bytes) -> "list[dict]":
    """Minimal POLYGON reader for tests: per-feature dicts with
    ``__rings`` (list of (N,2) int lists, ClosePath implied) plus
    decoded properties."""

    def read_varint(buf, i):
        shift = out = 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out, i
            shift += 7

    import struct as _struct

    def parse_value(buf):
        i = 0
        while i < len(buf):
            key, i = read_varint(buf, i)
            fnum, wt = key >> 3, key & 7
            if wt == 2:
                ln, i = read_varint(buf, i)
                return buf[i : i + ln].decode()
            if wt == 1:
                return _struct.unpack_from("<d", buf, i)[0]
            v, i = read_varint(buf, i)
            if fnum == 7:
                return bool(v)
            if fnum == 4 and v >= 1 << 63:
                v -= 1 << 64
            return v
        return None

    feats, keys, values = [], [], []
    i = 0
    key, i = read_varint(data, i)
    assert key == _TILE_LAYER
    ln, i = read_varint(data, i)
    layer = data[i : i + ln]
    i = 0
    raw_feats = []
    while i < len(layer):
        key, i = read_varint(layer, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            _, i = read_varint(layer, i)
            continue
        ln, i = read_varint(layer, i)
        payload = layer[i : i + ln]
        i += ln
        if fnum == 2:
            raw_feats.append(payload)
        elif fnum == 3:
            keys.append(payload.decode())
        elif fnum == 4:
            values.append(parse_value(payload))
    zz = lambda u: (u >> 1) ^ -(u & 1)
    for payload in raw_feats:
        j = 0
        tags, geom, ftype = [], [], None
        while j < len(payload):
            key, j = read_varint(payload, j)
            fnum, wt = key >> 3, key & 7
            if wt == 0:
                v, j = read_varint(payload, j)
                if fnum == 3:
                    ftype = v
                continue
            ln, j = read_varint(payload, j)
            sub = payload[j : j + ln]
            j += ln
            vals, jj = [], 0
            while jj < len(sub):
                v, jj = read_varint(sub, jj)
                vals.append(v)
            if fnum == 2:
                tags = vals
            elif fnum == 4:
                geom = vals
        assert ftype == 3
        rings = []
        cx = cy = 0
        k = 0
        cur = None
        while k < len(geom):
            cmd = geom[k]
            cid, cnt = cmd & 7, cmd >> 3
            k += 1
            if cid == 1:
                for _ in range(cnt):
                    cx += zz(geom[k]); cy += zz(geom[k + 1]); k += 2
                    cur = [[cx, cy]]
            elif cid == 2:
                for _ in range(cnt):
                    cx += zz(geom[k]); cy += zz(geom[k + 1]); k += 2
                    cur.append([cx, cy])
            elif cid == 7:
                rings.append(cur)
                cur = None
        rec = {"__rings": rings}
        for ki, vi in zip(tags[::2], tags[1::2]):
            rec[keys[ki]] = values[vi]
        feats.append(rec)
    return feats
