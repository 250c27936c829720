"""PMTiles v3 archive writer/reader — the reference's published tile
artifact (build_pmtiles.py produces a PMTiles pyramid via tippecanoe;
upload_pmtiles.py ships it, S16). Neither tool exists here, so the archive
format is implemented from the public PMTiles v3 spec:

- 127-byte little-endian header (magic "PMTiles", spec version 3);
- tile ids = cumulative-pyramid offset + per-zoom Hilbert index (the
  classic xy2d bit-twiddling, same algorithm as ``cell.hilbert_key``);
- root directory: varint-encoded columns (id deltas, run lengths, byte
  lengths, offsets with the 0="contiguous" shorthand);
- gzip'd directories/metadata (zlib wbits=31 → MTIME=0, deterministic) and
  gzip'd MVT tile payloads.

The write is a streaming single-writer pass over the tile dataset sorted
by tile id (PMTiles is one clustered file by design — same shape as the
reference's tippecanoe step); memory stays bounded by one batch + the
directory, never the pyramid. Deterministic byte-for-byte for a given tile
set (pinned by tests)."""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pyarrow as pa

_MAGIC = b"PMTiles"
_HDR_LEN = 127
_COMPRESSION_NONE = 1
_COMPRESSION_GZIP = 2
_TILETYPE_MVT = 1
_TILETYPE_PNG = 2


def _gzip(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper, MTIME=0
    return co.compress(data) + co.flush()


def _gunzip(data: bytes) -> bytes:
    return zlib.decompress(data, 47)


def zxy_to_tileid(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """PMTiles tile id: sum of 4^k for k<z, plus the Hilbert d of (x, y)
    on the 2^z grid. Vectorized per distinct zoom."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    out = np.zeros(z.shape, dtype=np.uint64)
    for zz in np.unique(z):
        m = z == zz
        base = np.uint64((4**int(zz) - 1) // 3)
        gx, gy = x[m], y[m]
        d = np.zeros(gx.shape, dtype=np.uint64)
        s = np.int64(1) << max(int(zz) - 1, 0) if zz > 0 else np.int64(0)
        while s > 0:
            rx = ((gx & s) > 0).astype(np.int64)
            ry = ((gy & s) > 0).astype(np.int64)
            d += np.uint64(s) * np.uint64(s) * (
                (np.uint64(3) * rx.astype(np.uint64)) ^ ry.astype(np.uint64)
            )
            swap = ry == 0
            flip = swap & (rx == 1)
            gx_f = np.where(flip, s - 1 - gx, gx)
            gy_f = np.where(flip, s - 1 - gy, gy)
            gx, gy = np.where(swap, gy_f, gx_f), np.where(swap, gx_f, gy_f)
            s >>= 1
        out[m] = base + d
    return out


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _serialize_directory(entries: "list[tuple[int, int, int, int]]") -> bytes:
    """entries: (tile_id, offset, length, run_length), sorted by tile_id."""
    out = bytearray(_varint(len(entries)))
    last_id = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last_id)
        last_id = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out += _varint(0)  # contiguous shorthand
        else:
            out += _varint(off + 1)
    return bytes(out)


def _deserialize_directory(buf: bytes) -> "list[tuple[int, int, int, int]]":
    n, i = _read_varint(buf, 0)
    ids, rls, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, i = _read_varint(buf, i)
        last += d
        ids.append(last)
    for _ in range(n):
        v, i = _read_varint(buf, i)
        rls.append(v)
    for _ in range(n):
        v, i = _read_varint(buf, i)
        lens.append(v)
    for k in range(n):
        v, i = _read_varint(buf, i)
        if v == 0:
            offs.append(offs[-1] + lens[k - 1])
        else:
            offs.append(v - 1)
    return list(zip(ids, offs, lens, rls))


_MAX_ROOT_BYTES = 16384  # spec guidance: root directory should fit 16 KB
_LEAF_ENTRIES = 4096


def write_pmtiles(
    tiles_ds,
    path: str,
    metadata: dict | None = None,
    max_root_bytes: int = _MAX_ROOT_BYTES,
    tile_type: str = "mvt",
    tile_col: str = "mvt",
) -> dict:
    """Pack a tile dataset (columns zoom, tx, ty, mvt) into one PMTiles v3
    file. Streams the dataset in tile-id order (Ray sort) through a single
    writer; returns summary stats. ``tile_type="png"`` writes a RASTER
    archive (payload column already PNG-compressed → tile compression
    NONE per spec; MVT payloads are gzipped). If the serialized root directory exceeds
    ``max_root_bytes`` (spec guidance: 16 KB), tile entries spill into leaf
    directories of ``_LEAF_ENTRIES`` each and the root holds one
    run_length=0 pointer per leaf."""

    def add_id(batch: pa.Table) -> pa.Table:
        tid = zxy_to_tileid(
            batch["zoom"].to_numpy(zero_copy_only=False),
            batch["tx"].to_numpy(zero_copy_only=False),
            batch["ty"].to_numpy(zero_copy_only=False),
        )
        # strip schema metadata (pandas-block conversions attach a b'pandas'
        # dict that makes pa.Schema unhashable → Ray sort logs a hash warning)
        return (
            batch.select(["zoom", "tx", "ty", tile_col])
            .append_column("tile_id", pa.array(tid.view(np.int64)))
            .replace_schema_metadata(None)
        )

    ordered = tiles_ds.map_batches(add_id, batch_format="pyarrow").sort("tile_id")

    # stream compressed tile payloads straight to a sidecar spill file —
    # the header/directories need every entry length before the data
    # section's final position is known, but driver MEMORY stays bounded
    # by one batch + the entry list (16 B/tile), never the pyramid
    import os as _os
    import uuid as _uuid

    entries: list[tuple[int, int, int, int]] = []
    # unique per-call sidecar (concurrent writers to the same target can't
    # interleave), removed on ANY exit path. URI outputs (s3://, file://,
    # … — S16's one-config-value upload story, see state.fsio) spill the
    # tile-data stream to local tmp and stream the final assembly to the
    # object store.
    if "://" in str(path):
        import tempfile

        data_path = _os.path.join(
            tempfile.gettempdir(),
            f"pmtiles.{_uuid.uuid4().hex[:12]}.data.tmp",
        )
    else:
        data_path = f"{path}.{_uuid.uuid4().hex[:12]}.data.tmp"
    data_off = 0
    zmin, zmax = 99, 0
    n_addressed = 0
    n_contents = 0
    clustered = True
    # spec v3 tile DEDUPLICATION: identical compressed payloads are stored
    # once and every entry points at the first copy. Driver state is one
    # 16-byte digest per DISTINCT tile — same order as the entry list the
    # directory build already holds.
    import hashlib as _hashlib

    seen: dict[bytes, tuple[int, int]] = {}
    try:
        with open(data_path, "wb") as df:
            for batch in ordered.iter_batches(
                batch_format="pyarrow", batch_size=1024
            ):
                zs = batch["zoom"].to_pylist()
                tids = batch["tile_id"].to_numpy(zero_copy_only=False).view(np.uint64)
                for tid, z, mvt in zip(tids, zs, batch[tile_col].to_pylist()):
                    tid = int(tid)
                    gz = _gzip(mvt) if tile_type == "mvt" else mvt
                    key = _hashlib.md5(gz).digest()
                    hit = seen.get(key)
                    if hit is None:
                        off, ln = data_off, len(gz)
                        df.write(gz)
                        data_off += ln
                        seen[key] = (off, ln)
                        n_contents += 1
                    else:
                        off, ln = hit
                        # reuse only breaks tile-id data order when it
                        # points BEHIND the previous entry (an adjacent
                        # same-blob tile coalesces into the previous
                        # run-length entry and stays clustered)
                        if entries and off < entries[-1][1]:
                            clustered = False
                    # spec RUN-LENGTH coalescing: adjacent ids, same blob →
                    # one entry with run_length+1
                    if entries and entries[-1][1] == off \
                            and entries[-1][2] == ln \
                            and entries[-1][0] + entries[-1][3] == tid:
                        t0, o0, l0, rl = entries[-1]
                        entries[-1] = (t0, o0, l0, rl + 1)
                    else:
                        entries.append((tid, off, ln, 1))
                    zmin, zmax = min(zmin, z), max(zmax, z)
                    n_addressed += 1
        return _assemble_pmtiles(
            path, data_path, entries, metadata, max_root_bytes,
            data_off, n_addressed, n_contents, clustered, tile_type,
            zmin if n_addressed else 0, zmax if n_addressed else 0,
        )
    finally:
        if _os.path.exists(data_path):
            _os.remove(data_path)


def _assemble_pmtiles(path, data_path, entries, metadata, max_root_bytes,
                      data_off, n_addressed, n_contents, clustered,
                      tile_type, zmin, zmax) -> dict:

    root_payload = _serialize_directory(entries)
    leaf_bytes = b""
    if len(_gzip(root_payload)) > max_root_bytes and entries:
        # spill: leaves of _LEAF_ENTRIES tile entries; root points at them
        root_entries = []
        parts = []
        off = 0
        for i in range(0, len(entries), _LEAF_ENTRIES):
            chunk = entries[i : i + _LEAF_ENTRIES]
            leaf = _gzip(_serialize_directory(chunk))
            root_entries.append((chunk[0][0], off, len(leaf), 0))
            parts.append(leaf)
            off += len(leaf)
        leaf_bytes = b"".join(parts)
        root_payload = _serialize_directory(root_entries)
    root = _gzip(root_payload)
    meta = _gzip(
        json.dumps(metadata or {"name": "overmatch"}, sort_keys=True).encode()
    )
    root_off = _HDR_LEN
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    tile_off = leaf_off + len(leaf_bytes)

    hdr = bytearray(_HDR_LEN)
    hdr[0:7] = _MAGIC
    hdr[7] = 3
    struct.pack_into(
        "<QQQQQQQQQQQ",
        hdr,
        8,
        root_off,
        len(root),
        meta_off,
        len(meta),
        leaf_off,
        len(leaf_bytes),
        tile_off,
        data_off,
        n_addressed,  # addressed tiles (sum of run lengths)
        len(entries),  # tile entries (after run-length coalescing)
        n_contents,  # tile contents (distinct blobs after dedup)
    )
    hdr[96] = 1 if clustered else 0
    hdr[97] = _COMPRESSION_GZIP  # internal compression
    hdr[98] = (_COMPRESSION_GZIP if tile_type == "mvt"
               else _COMPRESSION_NONE)  # tile compression
    hdr[99] = _TILETYPE_MVT if tile_type == "mvt" else _TILETYPE_PNG
    hdr[100] = zmin
    hdr[101] = zmax
    struct.pack_into("<iiii", hdr, 102, -180 * 10**7, -85 * 10**7,
                     180 * 10**7, 85 * 10**7)
    hdr[118] = zmin
    struct.pack_into("<ii", hdr, 119, 0, 0)

    # atomic local write (tmp + rename) or a direct object-store stream
    # for URI paths — state.fsio owns both contracts
    from ..state import fsio

    with fsio.open_write_atomic(path) as f:
        f.write(bytes(hdr))
        f.write(root)
        f.write(meta)
        f.write(leaf_bytes)
        with open(data_path, "rb") as df:
            while chunk := df.read(1 << 22):
                f.write(chunk)
    n_leaves = (
        (len(entries) + _LEAF_ENTRIES - 1) // _LEAF_ENTRIES if leaf_bytes else 0
    )
    return {"n_tiles": n_addressed, "n_entries": len(entries),
            "n_contents": n_contents, "bytes": tile_off + data_off,
            "min_zoom": zmin, "max_zoom": zmax, "n_leaves": n_leaves}


def _lookup(entries: "list[tuple[int, int, int, int]]", tid: int):
    """Rightmost entry with tile_id ≤ tid (entries sorted by id)."""
    lo, hi = 0, len(entries)
    while lo < hi:
        mid = (lo + hi) // 2
        if entries[mid][0] <= tid:
            lo = mid + 1
        else:
            hi = mid
    return entries[lo - 1] if lo else None


def read_pmtiles_tile(path: str, z: int, x: int, y: int) -> bytes | None:
    """Minimal reader: header → root directory → (optional leaf) → raw MVT
    bytes. run_length=0 root entries point into the leaf-directory section
    (the spec's spill mechanism)."""
    from ..state import fsio

    with fsio.open_read(path, "rb") as f:
        hdr = f.read(_HDR_LEN)
        if hdr[0:7] != _MAGIC or hdr[7] != 3:
            raise ValueError("not a PMTiles v3 archive")
        (root_off, root_len, _mo, _ml, leaf_off, _ll, tile_off, _dl) = struct.unpack_from(
            "<QQQQQQQQ", hdr, 8
        )
        f.seek(root_off)
        entries = _deserialize_directory(_gunzip(f.read(root_len)))
        tid = int(zxy_to_tileid(np.array([z]), np.array([x]), np.array([y]))[0])
        e = _lookup(entries, tid)
        if e is None:
            return None
        if e[3] == 0:  # leaf pointer
            f.seek(leaf_off + e[1])
            entries = _deserialize_directory(_gunzip(f.read(e[2])))
            e = _lookup(entries, tid)
            if e is None:
                return None
        eid, off, ln, rl = e
        if rl == 0 or not (eid <= tid < eid + rl):
            return None
        f.seek(tile_off + off)
        raw = f.read(ln)
        return _gunzip(raw) if hdr[98] == _COMPRESSION_GZIP else raw
    return None
