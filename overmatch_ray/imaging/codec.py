"""Image codecs + perceptual hashing for the image-caption axis (M24/D4).

The graft's input table carries opaque ``bytes:binary`` image payloads
(BASELINE.json input_hint). No image library (PIL/cv2) exists in this
container, so both codecs are implemented in-repo:

- **PNG** in pure Python over ``zlib`` (spec-true subset: 8-bit RGB,
  filter 0) — lossless, decoded pixels are exactly the source array.
- **Baseline JPEG** (ITU-T T.81 / JFIF) in pure numpy: RGB→YCbCr (BT.601),
  8×8 FDCT, quality-scaled Annex-K quantization tables, zig-zag, DC
  differential + AC run-length coding with the Annex-K.3 standard Huffman
  tables, 0xFF byte stuffing. The encoder emits 4:4:4 interleaved baseline
  JFIF; the decoder additionally handles grayscale, 4:2:0/4:2:2 chroma
  subsampling (box upsample), arbitrary DHT/DQT tables, 16-bit DQT
  precision, and restart intervals — enough to decode any baseline
  sequential JPEG, not just our own output.

Hot-path design (these codecs run inside `map_batches` actor pools over
millions of blobs): the encoder's entropy coder is VECTORIZED — symbols,
code lengths and value bits for a whole image are built as numpy arrays and
bit-packed with ≤26 scatter passes, no per-coefficient Python loop. The
decoder destuffs the entropy segment once into a numpy byte array and
decodes each Huffman symbol with a single 65,536-entry lookup-table probe
(peek 16 bits → (symbol, length)), so the per-symbol Python cost is O(1).

Also: PSNR (the input_hint invariant: decoded pixels allclose, PSNR ≥ 40 dB
for lossy; captions byte-equal), a DCT-based 64-bit perceptual hash for
near-duplicate detection (D4), and a minimal real RIFF/AVI **MJPEG video
container** (writer + demuxer) so frame sampling exercises real
container-level seeking.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (8-bit RGB, filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png expects RGB (h, w, 3)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports the subset we emit
    (8-bit RGB, filter 0; filters 1/2 handled for robustness)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    idat = []
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG subset")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].astype(np.int64).reshape(h, w, 3)
    if np.any(filters):
        for y in range(h):
            f = filters[y]
            if f == 0:
                continue
            if f == 2:  # Up (prior row is implicit zeros on row 0, PNG spec)
                if y > 0:
                    out[y] = (out[y] + out[y - 1]) % 256
            elif f == 1:  # Sub
                for x in range(1, w):
                    out[y, x] = (out[y, x] + out[y, x - 1]) % 256
            else:
                raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8)


# --- baseline JPEG (ITU-T T.81), pure numpy ---------------------------------

# Annex K.1/K.2 example quantization tables (natural row-major order)
_Q_LUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHR = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# zig-zag scan: _ZIG[k] = natural (row-major) index of the k-th zigzag coeff
_ZIG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10,
     17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34,
     27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36,
     29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46,
     53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.3 standard Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM_SPEC = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_DC_CHR_SPEC = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_AC_LUM_SPEC = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA),
)
_AC_CHR_SPEC = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA),
)


def _huff_encode_arrays(spec):
    """Canonical Huffman codes → (code[sym], length[sym]) int64 arrays."""
    bits, vals = spec
    code_arr = np.zeros(256, dtype=np.int64)
    len_arr = np.zeros(256, dtype=np.int64)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            code_arr[vals[k]] = code
            len_arr[vals[k]] = ln
            k += 1
            code += 1
        code <<= 1
    return code_arr, len_arr


_ENC_DC_LUM = _huff_encode_arrays(_DC_LUM_SPEC)
_ENC_AC_LUM = _huff_encode_arrays(_AC_LUM_SPEC)
_ENC_DC_CHR = _huff_encode_arrays(_DC_CHR_SPEC)
_ENC_AC_CHR = _huff_encode_arrays(_AC_CHR_SPEC)

_HUFF_DECODE_CACHE: dict = {}


def _huff_decode_lut(bits, vals):
    """(symbol, code_length) 65,536-entry lookup tables: index with the next
    16 bits of the stream, MSB-aligned. length 0 ⇒ invalid code."""
    key = (bytes(bits), bytes(vals))
    hit = _HUFF_DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            k += 1
            code += 1
        code <<= 1
    # plain Python lists: decoded per-symbol with scalar indexing (hot path)
    out = (sym.tolist(), ln.tolist())
    _HUFF_DECODE_CACHE[key] = out
    return out


_HUFF_DECODE_NP_CACHE: dict = {}


def _huff_decode_lut_np(bits, vals):
    """numpy twin of ``_huff_decode_lut`` for the lane-parallel batch
    decoder: (symbol int16, code_length uint8) 65,536-entry arrays."""
    key = (bytes(bits), bytes(vals))
    hit = _HUFF_DECODE_NP_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            k += 1
            code += 1
        code <<= 1
    _HUFF_DECODE_NP_CACHE[key] = (sym, ln)
    return sym, ln


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT8 = _dct_matrix(8)


def _quality_tables(quality: int):
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qlum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255).astype(np.int64)
    qchr = np.clip((_Q_CHR * scale + 50) // 100, 1, 255).astype(np.int64)
    return qlum, qchr


def _bit_length(x: np.ndarray) -> np.ndarray:
    """bit_length per element for non-negative int64 < 2**24 (float64-exact)."""
    return np.where(x > 0, np.floor(np.log2(np.maximum(x, 1))).astype(np.int64) + 1, 0)


from . import native as _native

# test hook: force the numpy reference paths even when the compiled kernel
# is available (parity tests flip this to compare both implementations)
_FORCE_NUMPY = False


def _use_native() -> bool:
    return _native.LIB is not None and not _FORCE_NUMPY


def _pack_native(codes: np.ndarray, lens: np.ndarray, segs: np.ndarray,
                 nseg: int, trailer: np.ndarray):
    """ctypes shim over ``om_pack_codes`` (see _native.c). Returns
    (out_buffer, per-segment end offsets, total bytes)."""
    lib = _native.LIB
    codes = np.ascontiguousarray(codes, dtype=np.int64)
    lens8 = np.ascontiguousarray(lens, dtype=np.uint8)
    segs32 = np.ascontiguousarray(segs, dtype=np.int32)
    trailer = np.ascontiguousarray(trailer, dtype=np.uint16)
    seg_end = np.zeros(max(nseg, 1), dtype=np.int64)
    total_bits = int(lens.sum()) if lens.size else 0
    # worst case: Σ ceil(seg_bits/8) data bytes ≤ ceil(total/8) + nseg, each
    # byte may stuff to two (0xFF 0x00), plus a 2-byte trailer per segment
    # → 2·ceil + 4·nseg; the old 3·nseg margin was 16 bytes short of the
    # adversarial all-0xFF-stream bound once nseg > 16
    out = np.empty(2 * ((total_bits + 7) // 8) + 4 * nseg + 16, dtype=np.uint8)
    n = lib.om_pack_codes(
        codes.ctypes.data, lens8.ctypes.data, segs32.ctypes.data,
        codes.size, nseg, trailer.ctypes.data, seg_end.ctypes.data,
        out.ctypes.data,
    )
    return out, seg_end, int(n)


def _expand_bits(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Explode (code, len) symbol pairs to one uint8 bit per output bit,
    MSB-first, in symbol order. One vectorized pass over total-bits elements
    (a per-bit-position scatter loop was ~6× slower: max(len) ≈ 26 masked
    passes over every symbol)."""
    total = int(lens.sum())
    sym = np.repeat(np.arange(lens.size), lens)
    o = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    return ((codes[sym] >> (lens[sym] - 1 - o)) & 1).astype(np.uint8)


def _pack_codes(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """MSB-first variable-length bit packing + 0xFF byte stuffing + 1-pad."""
    if _use_native():
        out, _, n = _pack_native(codes, lens,
                                 np.zeros(len(codes), np.int32), 1,
                                 np.zeros(1, np.uint16))
        return out[:n].tobytes()
    total = int(lens.sum())
    bv = _expand_bits(codes, lens)
    pad = (-total) % 8
    if pad:
        bv = np.concatenate([bv, np.ones(pad, np.uint8)])  # pad bits are 1s
    by = np.packbits(bv)
    ff = np.nonzero(by == 0xFF)[0]
    if ff.size:
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


def _pack_codes_segmented(codes: np.ndarray, lens: np.ndarray,
                          segs: np.ndarray, nseg: int) -> bytes:
    """Segmented variant of ``_pack_codes``: symbols carry a NON-DECREASING
    restart-segment id; each segment is byte-aligned (1-padded) and stuffed
    independently, segments join with cycling RSTn markers. Same vectorized
    k-loop as the single-segment packer — the only extra work is offset
    bookkeeping, all numpy."""
    if nseg <= 1:
        return _pack_codes(codes, lens)
    if _use_native():
        trailer = np.zeros(nseg, np.uint16)
        trailer[:-1] = 0xFFD0 + (np.arange(nseg - 1) % 8)
        out, _, n = _pack_native(codes, lens, segs, nseg, trailer)
        return out[:n].tobytes()
    cum = np.cumsum(lens)
    csum0 = cum - lens
    first = np.searchsorted(segs, np.arange(nseg))          # first symbol/seg
    seg_bit0 = csum0[first]                                  # bits before seg
    seg_bits = np.diff(np.append(seg_bit0, cum[-1] if lens.size else 0))
    seg_bytes = (seg_bits + 7) // 8
    seg_byte0 = np.concatenate([[0], np.cumsum(seg_bytes)[:-1]])
    starts = seg_byte0[segs] * 8 + (csum0 - seg_bit0[segs])
    bits = np.ones(int(seg_bytes.sum()) * 8, dtype=np.uint8)
    total = int(lens.sum())
    o = np.arange(total) - np.repeat(csum0, lens)
    bits[np.repeat(starts, lens) + o] = _expand_bits(codes, lens)
    by = np.packbits(bits)
    # global stuffing, then recover segment boundaries in stuffed space
    isff = by == 0xFF
    ff = np.nonzero(isff)[0]
    ends = np.cumsum(seg_bytes)                              # exclusive, orig
    shift = np.searchsorted(ff, ends)                        # stuffed bytes before
    if ff.size:
        by = np.insert(by, ff + 1, 0)
    ends2 = ends + shift
    out = bytearray()
    start = 0
    for i in range(nseg):
        out += by[start:ends2[i]].tobytes()
        if i < nseg - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
        start = ends2[i]
    return bytes(out)


def _entropy_encode(planes: list[np.ndarray], ri: int = 0) -> bytes:
    """Interleaved-MCU (4:4:4) baseline entropy coding, vectorized.

    ``planes`` = per-component (nblocks, 64) int64 zig-zag quantized coeffs.
    Emission order per entry key: (block*3 + comp) * 128 + slot, where the
    DC slot is 0, coefficient k's value sits at 2k, ZRLs before it at 2k-1,
    and EOB at 127 — a stable argsort then yields the exact T.81 stream.
    ``ri`` > 0 splits the stream into restart segments of ``ri`` MCUs (one
    MCU = one block per component in 4:4:4): DC prediction resets and the
    bitstream byte-aligns at each boundary, RSTn markers cycle between.
    """
    tabs = ((_ENC_DC_LUM, _ENC_AC_LUM), (_ENC_DC_CHR, _ENC_AC_CHR),
            (_ENC_DC_CHR, _ENC_AC_CHR))
    keys, codes, lens = [], [], []
    for ci, zz in enumerate(planes):
        (dc_code, dc_len), (ac_code, ac_len) = tabs[ci]
        n = zz.shape[0]
        blk3 = np.arange(n, dtype=np.int64) * 3 + ci
        # DC: differential across this component's blocks (pred starts 0,
        # and resets at every restart-segment boundary)
        diff = np.diff(zz[:, 0], prepend=np.int64(0))
        if ri:
            seg_first = np.arange(0, n, ri)
            diff[seg_first] = zz[seg_first, 0]
        s = _bit_length(np.abs(diff))
        val = np.where(diff >= 0, diff, diff + (np.int64(1) << s) - 1)
        keys.append(blk3 * 128)
        codes.append((dc_code[s] << s) | val)
        lens.append(dc_len[s] + s)
        # AC: run-length symbols per nonzero coefficient
        bi, pos = np.nonzero(zz[:, 1:])
        if bi.size:
            v = zz[bi, pos + 1]
            prev = np.empty_like(pos)
            prev[0] = -1
            same = bi[1:] == bi[:-1]
            prev[1:] = np.where(same, pos[:-1], -1)
            run = pos - prev - 1
            nzrl = run >> 4
            s = _bit_length(np.abs(v))
            sym = ((run & 15) << 4) | s
            val = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
            keys.append((bi * 3 + ci) * 128 + 2 * (pos + 1))
            codes.append((ac_code[sym] << s) | val)
            lens.append(ac_len[sym] + s)
            if nzrl.any():  # 16-zero runs → ZRL symbols just before the coeff
                zb = np.repeat(bi, nzrl)
                zk = np.repeat(pos + 1, nzrl)
                keys.append((zb * 3 + ci) * 128 + 2 * zk - 1)
                codes.append(np.full(zb.shape, ac_code[0xF0]))
                lens.append(np.full(zb.shape, ac_len[0xF0]))
        # EOB wherever the block's final AC coefficient is zero
        eob = np.nonzero(zz[:, 63] == 0)[0]
        keys.append((eob * 3 + ci) * 128 + 127)
        codes.append(np.full(eob.shape, ac_code[0x00]))
        lens.append(np.full(eob.shape, ac_len[0x00]))
    key = np.concatenate(keys)
    order = np.argsort(key, kind="stable")
    ocodes = np.concatenate(codes)[order]
    olens = np.concatenate(lens)[order]
    if not ri:
        return _pack_codes(ocodes, olens)
    nblocks = planes[0].shape[0]
    segs = (key[order] // 384) // ri  # key//384 = block (= MCU in 4:4:4)
    return _pack_codes_segmented(ocodes, olens, segs, -(-nblocks // ri))


def _pack_codes_multi(codes: np.ndarray, lens: np.ndarray, segs: np.ndarray,
                      nseg: int, seg_img: np.ndarray, seg_in_img: np.ndarray,
                      nimg: int) -> "list[bytes]":
    """Multi-image generalization of ``_pack_codes_segmented``: segments
    carry an owning-image id; consecutive segments of the same image join
    with cycling RSTn markers, image boundaries split the output. One
    vectorized pack + stuff over the whole batch's symbols."""
    if _use_native():
        nxt_same = np.zeros(nseg, bool)
        nxt_same[:-1] = seg_img[1:] == seg_img[:-1]
        trailer = np.where(nxt_same, 0xFFD0 + (seg_in_img % 8), 0)
        out, seg_end, _n = _pack_native(codes, lens, segs, nseg, trailer)
        last = np.nonzero(~nxt_same)[0]  # final segment of each image
        res, prev = [], 0
        for s in last.tolist():
            e = int(seg_end[s])
            res.append(out[prev:e].tobytes())
            prev = e
        return res
    cum = np.cumsum(lens)
    csum0 = cum - lens
    first = np.searchsorted(segs, np.arange(nseg))
    seg_bit0 = csum0[first]
    seg_bits = np.diff(np.append(seg_bit0, cum[-1] if lens.size else 0))
    seg_bytes = (seg_bits + 7) // 8
    seg_byte0 = np.concatenate([[0], np.cumsum(seg_bytes)[:-1]])
    starts = seg_byte0[segs] * 8 + (csum0 - seg_bit0[segs])
    bits = np.ones(int(seg_bytes.sum()) * 8, dtype=np.uint8)
    total = int(lens.sum())
    o = np.arange(total) - np.repeat(csum0, lens)
    bits[np.repeat(starts, lens) + o] = _expand_bits(codes, lens)
    by = np.packbits(bits)
    ff = np.nonzero(by == 0xFF)[0]
    ends = np.cumsum(seg_bytes)
    shift = np.searchsorted(ff, ends)
    if ff.size:
        by = np.insert(by, ff + 1, 0)
    ends2 = ends + shift
    out = [bytearray() for _ in range(nimg)]
    start = 0
    for s in range(nseg):
        i = seg_img[s]
        out[i] += by[start:ends2[s]].tobytes()
        if s + 1 < nseg and seg_img[s + 1] == i:
            out[i] += bytes([0xFF, 0xD0 + (seg_in_img[s] % 8)])
        start = ends2[s]
    return [bytes(b) for b in out]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray, quality: int = 98,
                restart_rows: int = 1,
                restart_mcus: "int | None" = None) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes (4:4:4, interleaved,
    Annex-K quant tables scaled by ``quality``, standard Huffman tables).

    ``restart_rows`` > 0 emits a DRI segment + RSTn markers every that many
    MCU rows (default 1). Restart segments cost <0.5% size and make the
    stream decodable by the lane-parallel ``decode_jpeg_batch`` — each
    segment is an independent bitstream lane. 0 disables. ``restart_mcus``
    (any MCU count) overrides the row granularity: the batch decoder's
    sequential step count is the per-segment symbol count, so SHORTER
    segments decode faster at ~2.75 B/segment size overhead."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_jpeg expects RGB (h, w, 3)")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    ycc = (
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    )
    qlum, qchr = _quality_tables(quality)
    H = -(-h // 8) * 8
    W = -(-w // 8) * 8
    planes = []
    for chan, qt in zip(ycc, (qlum, qchr, qchr)):
        p = np.pad(chan, ((0, H - h), (0, W - w)), mode="edge") - 128.0
        blocks = p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = _DCT8 @ blocks @ _DCT8.T  # batched FDCT (broadcast matmul)
        qz = np.rint(coef.reshape(-1, 64) / qt).astype(np.int64)
        planes.append(qz[:, _ZIG])  # zig-zag order
    if restart_mcus is not None:
        ri = min(int(restart_mcus), (H // 8) * (W // 8)) if restart_mcus else 0
    else:
        ri = (W // 8) * restart_rows if restart_rows else 0
    body = _entropy_encode(planes, ri)
    return _jpeg_header(h, w, qlum, qchr, ri) + body + b"\xff\xd9"


def _jpeg_header(h: int, w: int, qlum: np.ndarray, qchr: np.ndarray,
                 ri: int) -> bytes:
    """SOI → SOS marker segments for the 4:4:4 interleaved baseline frame
    this encoder emits (standard Huffman tables, optional DRI)."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _seg(0xDB, bytes([0x00]) + bytes(qlum[_ZIG].astype(np.uint8))
                + bytes([0x01]) + bytes(qchr[_ZIG].astype(np.uint8)))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    dht = b""
    for tcth, (bits, vals) in ((0x00, _DC_LUM_SPEC), (0x10, _AC_LUM_SPEC),
                               (0x01, _DC_CHR_SPEC), (0x11, _AC_CHR_SPEC)):
        dht += bytes([tcth]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, dht)
    if ri:
        out += _seg(0xDD, struct.pack(">H", ri))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return bytes(out)


def encode_jpeg_batch(imgs: "list[np.ndarray]", quality: int = 98,
                      restart_rows: int = 1,
                      restart_mcus: "int | None" = None) -> "list[bytes]":
    """Encode many RGB images at once — bit-identical to per-image
    ``encode_jpeg`` with the same arguments. One batched color transform
    over the concatenated pixels, one FDCT matmul over every 8×8 block of
    every image, one entropy/pack pass over the whole batch's symbols
    (``_pack_codes_multi``); the per-image numpy call overhead of the
    scalar encoder (~40 kernel launches/image) amortizes across the batch.
    Raises on the first invalid image (same errors as ``encode_jpeg``).

    Works in sub-batches bounded by total pixel count: past ~10 MB the
    batch's transient arrays hit transparent-hugepage defrag stalls (8-10×
    measured on this class of host — same effect the batch DECODER's
    per-image IDCT comment records), so bigger isn't faster."""
    out: list = []
    budget = 400_000  # pixels per sub-batch ≈ 24 typical 128² images
    run_px, start = 0, 0
    for i, im in enumerate(imgs):
        px = int(im.shape[0]) * int(im.shape[1]) if im.ndim == 3 else 0
        if run_px and run_px + px > budget:
            out.extend(_encode_jpeg_batch_core(imgs[start:i], quality,
                                               restart_rows, restart_mcus))
            run_px, start = 0, i
        run_px += px
    out.extend(_encode_jpeg_batch_core(imgs[start:], quality, restart_rows,
                                       restart_mcus))
    return out


def _encode_jpeg_batch_core(imgs: "list[np.ndarray]", quality: int,
                            restart_rows: int,
                            restart_mcus: "int | None" = None) -> "list[bytes]":
    nimg = len(imgs)
    if nimg == 0:
        return []
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    for im in imgs:
        if im.ndim != 3 or im.shape[2] != 3:
            raise ValueError("encode_jpeg expects RGB (h, w, 3)")
        if im.shape[0] == 0 or im.shape[1] == 0:
            raise ValueError("empty image")
    qlum, qchr = _quality_tables(quality)
    # one color transform over all pixels of all images
    flat = np.concatenate([im.reshape(-1, 3) for im in imgs]).astype(np.float64)
    r, g, b = flat[:, 0], flat[:, 1], flat[:, 2]
    ycc_flat = (
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    )
    px0 = np.cumsum([0] + [im.shape[0] * im.shape[1] for im in imgs])
    # per-image geometry
    hs = np.array([im.shape[0] for im in imgs], np.int64)
    ws = np.array([im.shape[1] for im in imgs], np.int64)
    Hs, Ws = -(-hs // 8) * 8, -(-ws // 8) * 8
    nblk = (Hs // 8) * (Ws // 8)
    blk0 = np.concatenate([[0], np.cumsum(nblk)])
    if restart_mcus is not None:
        ri_img = (np.minimum(int(restart_mcus), nblk) if restart_mcus
                  else nblk)
    else:
        ri_img = (Ws // 8) * restart_rows if restart_rows else nblk
    nseg_img = -(-nblk // ri_img)
    seg0 = np.concatenate([[0], np.cumsum(nseg_img)])
    nseg = int(seg0[-1])
    seg_img = np.repeat(np.arange(nimg), nseg_img)
    seg_in_img = np.arange(nseg) - seg0[seg_img]
    # per-block vectors
    img_of_blk = np.repeat(np.arange(nimg), nblk)
    blk_in_img = np.arange(int(blk0[-1])) - blk0[img_of_blk]
    ri_blk = ri_img[img_of_blk]
    seg_blk = seg0[img_of_blk] + blk_in_img // ri_blk
    firsts = (blk_in_img % ri_blk) == 0
    # gather padded 8×8 blocks per component, one FDCT + quantize per comp
    planes = []
    for ci, qt in ((0, qlum), (1, qchr), (2, qchr)):
        chunks = []
        for i in range(nimg):
            h, w, H, W = int(hs[i]), int(ws[i]), int(Hs[i]), int(Ws[i])
            chan = ycc_flat[ci][px0[i]:px0[i + 1]].reshape(h, w)
            p = np.pad(chan, ((0, H - h), (0, W - w)), mode="edge") - 128.0
            chunks.append(
                p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
            )
        big = np.concatenate(chunks).reshape(-1, 8, 8)
        coef = _DCT8 @ big @ _DCT8.T
        qz = np.rint(coef.reshape(-1, 64) / qt).astype(np.int64)
        planes.append(qz[:, _ZIG])
    # entropy symbols over the concatenated planes (global block ids)
    tabs = ((_ENC_DC_LUM, _ENC_AC_LUM), (_ENC_DC_CHR, _ENC_AC_CHR),
            (_ENC_DC_CHR, _ENC_AC_CHR))
    n = planes[0].shape[0]
    keys, codes, lens = [], [], []
    for ci, zz in enumerate(planes):
        (dc_code, dc_len), (ac_code, ac_len) = tabs[ci]
        blk3 = np.arange(n, dtype=np.int64) * 3 + ci
        dc = zz[:, 0]
        diff = np.diff(dc, prepend=np.int64(0))
        diff = np.where(firsts, dc, diff)
        s = _bit_length(np.abs(diff))
        val = np.where(diff >= 0, diff, diff + (np.int64(1) << s) - 1)
        keys.append(blk3 * 128)
        codes.append((dc_code[s] << s) | val)
        lens.append(dc_len[s] + s)
        bi, pos = np.nonzero(zz[:, 1:])
        if bi.size:
            v = zz[bi, pos + 1]
            prev = np.empty_like(pos)
            prev[0] = -1
            same = bi[1:] == bi[:-1]
            prev[1:] = np.where(same, pos[:-1], -1)
            run = pos - prev - 1
            nzrl = run >> 4
            s = _bit_length(np.abs(v))
            sym = ((run & 15) << 4) | s
            val = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
            keys.append((bi * 3 + ci) * 128 + 2 * (pos + 1))
            codes.append((ac_code[sym] << s) | val)
            lens.append(ac_len[sym] + s)
            if nzrl.any():
                zb = np.repeat(bi, nzrl)
                zk = np.repeat(pos + 1, nzrl)
                keys.append((zb * 3 + ci) * 128 + 2 * zk - 1)
                codes.append(np.full(zb.shape, ac_code[0xF0]))
                lens.append(np.full(zb.shape, ac_len[0xF0]))
        eob = np.nonzero(zz[:, 63] == 0)[0]
        keys.append((eob * 3 + ci) * 128 + 127)
        codes.append(np.full(eob.shape, ac_code[0x00]))
        lens.append(np.full(eob.shape, ac_len[0x00]))
    key = np.concatenate(keys)
    order = np.argsort(key, kind="stable")
    ocodes = np.concatenate(codes)[order]
    olens = np.concatenate(lens)[order]
    segs = seg_blk[key[order] // 384]
    bodies = _pack_codes_multi(ocodes, olens, segs, nseg, seg_img,
                               seg_in_img, nimg)
    # header DRI mirrors the scalar encoder exactly: 0 when restarts are
    # disabled (restart_mcus=0 or restart_rows=0), else the effective ri
    dri_on = bool(restart_mcus) if restart_mcus is not None else bool(restart_rows)
    out = []
    for i in range(nimg):
        ri = int(ri_img[i]) if dri_on else 0
        out.append(_jpeg_header(int(hs[i]), int(ws[i]), qlum, qchr, ri)
                   + bodies[i] + b"\xff\xd9")
    return out


def _split_segments(data: bytes, off: int) -> "list[np.ndarray]":
    """Split one scan's entropy bytes into destuffed restart segments.

    Vectorized marker scan: 0xFF00 = stuffing (dropped), 0xFFFF = fill,
    0xFFD0-D7 = restart boundary, anything else ends the scan."""
    raw = np.frombuffer(data, dtype=np.uint8)
    n = len(raw)
    ff = np.nonzero(raw[off : n - 1] == 0xFF)[0] + off
    nxt = raw[ff + 1]
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    is_end = (nxt != 0x00) & (nxt != 0xFF) & ~is_rst
    endi = np.nonzero(is_end)[0]
    scan_end = int(ff[endi[0]]) if endi.size else n
    bounds = []
    start = off
    for p in ff[is_rst].tolist():
        if p >= scan_end:
            break
        bounds.append((start, p))
        start = p + 2
    bounds.append((start, scan_end))
    out = []
    for s, e in bounds:
        chunk = raw[s:e]
        if chunk.size:
            isff = chunk == 0xFF
            drop = np.zeros(chunk.size, dtype=bool)
            drop[1:] = isff[:-1] & (chunk[1:] == 0)
            chunk = chunk[~drop]
        out.append(chunk)
    return out


class _EntropyReader:
    """Bit reader over the destuffed entropy segments of one scan.

    Huffman symbols are decoded by peeking 16 MSB-aligned bits via a
    precomputed 24-bit sliding window list, one LUT probe per symbol."""

    __slots__ = ("segs", "seg", "win", "nbits", "pos", "end")

    def __init__(self, data: bytes, off: int):
        self.segs = []
        for chunk in _split_segments(data, off):
            buf = np.zeros(chunk.size + 3, dtype=np.uint32)
            buf[: chunk.size] = chunk
            win = ((buf[:-2] << 16) | (buf[1:-1] << 8) | buf[2:]).tolist()
            self.segs.append((win, chunk.size * 8))
        self.seg = 0
        self.win, self.nbits = self.segs[0]
        self.pos = 0

    def restart(self):
        """Byte-align and advance past the RSTn boundary (next segment)."""
        self.seg += 1
        if self.seg >= len(self.segs):
            raise ValueError("missing restart segment")
        self.win, self.nbits = self.segs[self.seg]
        self.pos = 0

    def peek16(self) -> int:
        p = self.pos
        return (self.win[p >> 3] >> (8 - (p & 7))) & 0xFFFF

    def read(self, k: int) -> int:
        p = self.pos
        if p + k > self.nbits:
            raise ValueError("entropy segment exhausted")
        self.pos = p + k
        return ((self.win[p >> 3] >> (8 - (p & 7))) >> (16 - k)) & ((1 << k) - 1)


def _decode_scan(data, off, frame, qts, hdc, hac, scomps, ri):
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    order = []
    for cs, td, ta in scomps:
        c = next(c for c in comps if c["id"] == cs)
        dsym, dlen = _huff_decode_lut(*hdc[td])
        asym, alen = _huff_decode_lut(*hac[ta])
        order.append((c, dsym, dlen, asym, alen))
    ncomp = len(order)
    # coefficient stores: preallocated zero-filled array('q') buffers —
    # Python-int writes (~4× cheaper than numpy scalar setitem in this
    # loop), zero-copy numpy view afterwards
    from array import array as _pyarr

    coeffs = [
        _pyarr("q", bytes(8 * 64 * mcuy * c["v"] * mcux * c["h"]))
        for c, *_ in order
    ]
    # block index within each component's (grid_y, grid_x) raster
    grid_w = [mcux * c["h"] for c, *_ in order]
    pred = [0] * ncomp
    br = _EntropyReader(data, off)
    # hot loop: bit reads inlined on local (win, pos). The window list is
    # zero-padded by 3 bytes, and zero bits can decode as VALID short
    # Huffman codes — so a slightly-truncated stream would silently emit
    # wrong pixels unless pos is checked against the segment bit length
    # at every segment end (the lane decoder flags pos > end the same way)
    win = br.win
    pos = 0
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            if pos > br.nbits:
                raise ValueError("truncated entropy stream")
            br.restart()
            win = br.win
            pos = 0
            pred = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, (c, dsym, dlen, asym, alen) in enumerate(order):
            buf = coeffs[ci]
            for v in range(c["v"]):
                for hb in range(c["h"]):
                    base = ((my * c["v"] + v) * grid_w[ci] + (mx * c["h"] + hb)) * 64
                    w16 = (win[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                    s = dsym[w16]
                    ln = dlen[w16]
                    if ln == 0:
                        raise ValueError("bad DC huffman code")
                    pos += ln
                    if s:
                        val = ((win[pos >> 3] >> (8 - (pos & 7))) >> (16 - s)) & ((1 << s) - 1)
                        pos += s
                        pred[ci] += val - (1 << s) + 1 if val < (1 << (s - 1)) else val
                    buf[base] = pred[ci]
                    k = 1
                    while k < 64:
                        w16 = (win[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                        rs = asym[w16]
                        ln = alen[w16]
                        if ln == 0:
                            raise ValueError("bad AC huffman code")
                        pos += ln
                        s = rs & 15
                        if s == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC coefficient overflow")
                        val = ((win[pos >> 3] >> (8 - (pos & 7))) >> (16 - s)) & ((1 << s) - 1)
                        pos += s
                        buf[base + k] = val - (1 << s) + 1 if val < (1 << (s - 1)) else val
                        k += 1
    if pos > br.nbits:
        raise ValueError("truncated entropy stream")
    # dequantize + batch IDCT + assemble per component
    planes = []
    for ci, (c, *_t) in enumerate(order):
        zzc = np.frombuffer(coeffs[ci], dtype=np.int64).reshape(-1, 64)
        plane = _comp_plane(zzc, qts[c["tq"]].reshape(64),
                            mcuy * c["v"], grid_w[ci])
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:fh, :fw])
    return _planes_to_rgb(planes)


def _comp_plane(zzc: np.ndarray, qt: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """(nblocks, 64) zig-zag quantized coeffs → (gh·8, gw·8) float plane:
    dequantize, batched IDCT, block raster assembly."""
    nat = np.zeros((zzc.shape[0], 64), dtype=np.int64)
    nat[:, _ZIG] = zzc
    sblocks = (nat * qt).reshape(-1, 8, 8).astype(np.float64)
    pix = _DCT8.T @ sblocks @ _DCT8 + 128.0  # batched IDCT
    return pix.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)


def _planes_to_rgb(planes: "list[np.ndarray]") -> np.ndarray:
    """Cropped full-resolution YCbCr (or lone Y) planes → uint8 RGB."""
    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _parse_jpeg(data: bytes):
    """Marker-segment parse up to SOS → (frame, qts, hdc, hac, scomps, ri,
    scan_off). Shared by the scalar and batch decoders."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    hdc: dict[int, tuple] = {}
    hac: dict[int, tuple] = {}
    frame = None
    ri = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("marker expected")
        m = data[i + 1]
        i += 2
        if m == 0xFF:  # fill byte
            i -= 1
            continue
        if m == 0xD9 or m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        (ln,) = struct.unpack_from(">H", data, i)
        payload = data[i + 2 : i + ln]
        seg_end = i + ln
        if m == 0xDB:
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(payload[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(payload[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIG] = vals
                qts[tq] = nat
        elif m == 0xC4:
            j = 0
            while j < len(payload):
                tc, th = payload[j] >> 4, payload[j] & 15
                j += 1
                bits = bytes(payload[j : j + 16])
                j += 16
                nv = sum(bits)
                vals = bytes(payload[j : j + nv])
                j += nv
                (hdc if tc == 0 else hac)[th] = (bits, vals)
        elif m in (0xC0, 0xC1):
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            comps = []
            for k in range(nc):
                cid, hv, tq = payload[6 + 3 * k], payload[7 + 3 * k], payload[8 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG is supported")
        elif m == 0xDD:
            (ri,) = struct.unpack_from(">H", payload, 0)
        elif m == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scomps = [
                (payload[1 + 2 * k], payload[2 + 2 * k] >> 4, payload[2 + 2 * k] & 15)
                for k in range(ns)
            ]
            return frame, qts, hdc, hac, scomps, ri, seg_end
        i = seg_end
    raise ValueError("no SOS marker found")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG bytes → (h, w, 3) uint8 RGB (grayscale is
    replicated). Handles JFIF/EXIF APPn, multiple DQT/DHT segments, 8/16-bit
    quant precision, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals."""
    frame, qts, hdc, hac, scomps, ri, off = _parse_jpeg(data)
    return _decode_scan(data, off, frame, qts, hdc, hac, scomps, ri)


def decode_jpeg_batch(blobs: "list[bytes]") -> list:
    """Decode many baseline JPEGs at once. Returns a list aligned with
    ``blobs``: an (h, w, 3) uint8 array on success, the Exception instance
    on failure — callers keep per-image quarantine semantics.

    Lane-parallel entropy decode: every restart segment of every image is
    an independent bitstream lane; all lanes advance one Huffman symbol per
    step as numpy vectors, so the per-symbol Python overhead of the scalar
    decoder amortizes across thousands of lanes (our encoder emits one
    restart segment per MCU row precisely to feed this). Images the vector
    path can't take (subsampled chroma, single-lane streams with no
    restarts, any stream anomaly) fall back to the scalar decoder
    one-by-one with identical results and error text."""
    n = len(blobs)
    results: list = [None] * n
    metas = []  # (img_i, frame, qts, comp order params, segments)
    for i, blob in enumerate(blobs):
        try:
            frame, qts, hdc, hac, scomps, ri, off = _parse_jpeg(blob)
            fh, fw, comps = frame
            if any(c["h"] != 1 or c["v"] != 1 for c in comps):
                raise _ScalarFallback()
            mcux, mcuy = -(-fw // 8), -(-fh // 8)
            mcus = mcux * mcuy
            segs = _split_segments(blob, off)
            nseg = -(-mcus // ri) if ri else 1
            if len(segs) != nseg:
                raise _ScalarFallback()
            order = []
            for cs, td, ta in scomps:
                c = next(c for c in comps if c["id"] == cs)
                order.append((c["tq"], hdc[td], hac[ta]))
            metas.append((i, fh, fw, mcux, mcuy, ri, qts, order, segs))
        except _ScalarFallback:
            results[i] = _scalar_or_exc(blobs[i])
        except Exception as e:
            results[i] = e
    if metas:
        gen = _decode_native(metas) if _use_native() else _decode_lanes(metas)
        for i, out in gen:
            results[i] = out if out is not None else _scalar_or_exc(blobs[i])
    return results


def _decode_native(metas):
    """Compiled twin of ``_decode_lanes`` (imaging/_native.c): per-image
    integer entropy decode in C, then the SAME numpy dequant/IDCT/color
    assembly — decoded pixels are bit-identical to the lane decoder's.
    Yields (img_i, rgb | None); None falls back to the scalar path exactly
    like the lane decoder's bad-stream handling."""
    lib = _native.LIB
    # shared table registry (one 65536-entry LUT per distinct DHT spec)
    tab_ids: dict = {}
    tabs: list = []

    def tid_of(spec):
        key = (bytes(spec[0]), bytes(spec[1]))
        t = tab_ids.get(key)
        if t is None:
            t = len(tabs)
            tab_ids[key] = t
            tabs.append(_huff_decode_lut_np(*spec))
        return t

    per_img = []
    for (i, fh, fw, mcux, mcuy, ri, qts, order, segs) in metas:
        dc = np.array([tid_of(d) for _tq, d, _a in order], np.int64) * 65536
        ac = np.array([tid_of(a) for _tq, _d, a in order], np.int64) * 65536
        per_img.append((dc, ac))
    SYM = np.ascontiguousarray(np.concatenate([s for s, _l in tabs]))
    LEN = np.ascontiguousarray(np.concatenate([l for _s, l in tabs]))

    for (i, fh, fw, mcux, mcuy, ri, qts, order, segs), (dc, ac) in zip(
        metas, per_img
    ):
        nc = len(order)
        mcus = mcux * mcuy
        ri_eff = ri if ri else mcus
        sizes = np.array([0] + [s.size for s in segs], np.int64)
        seg_start = np.cumsum(sizes)
        buf = np.concatenate(segs + [np.zeros(16, np.uint8)])
        out = np.zeros(mcus * nc * 64, np.int32)
        ret = lib.om_entropy_decode(
            buf.ctypes.data, seg_start.ctypes.data, len(segs), mcus,
            ri_eff, nc, dc.ctypes.data, ac.ctypes.data, SYM.ctypes.data,
            LEN.ctypes.data, out.ctypes.data,
        )
        if ret != 0:
            yield i, None
            continue
        C = out.reshape(mcus * nc, 64)
        planes = []
        for j, (tq, _d, _a) in enumerate(order):
            zz = C[j::nc]
            planes.append(
                _comp_plane(zz, qts[tq].reshape(64), mcuy, mcux)[:fh, :fw]
            )
        yield i, _planes_to_rgb(planes)


class _ScalarFallback(Exception):
    pass


def _scalar_or_exc(blob: bytes):
    try:
        return decode_jpeg(blob)
    except Exception as e:
        return e


def _decode_lanes(metas):
    """The batch decoder's vector core. ``metas`` rows:
    (img_i, fh, fw, mcux, mcuy, ri, qts, order[(tq, dcspec, acspec)], segs).
    Yields (img_i, rgb | None) — None marks lanes that hit a stream anomaly
    (caller re-runs those images through the scalar path)."""
    # ---- table registry (shared across the batch) ----
    tab_ids: dict = {}
    tab_list: list = []

    def tid_of(spec):
        key = (bytes(spec[0]), bytes(spec[1]))
        t = tab_ids.get(key)
        if t is None:
            t = len(tab_list)
            tab_ids[key] = t
            tab_list.append(_huff_decode_lut_np(*spec))
        return t

    # ---- lanes + global destuffed buffer ----
    nimg = len(metas)
    img_nc = np.empty(nimg, np.int64)
    img_block0 = np.empty(nimg, np.int64)
    bufs, lane_rows = [], []
    tdc_rows, tac_rows = [], []
    nbytes = 0
    nblocks = 0
    for mi, (_i, fh, fw, mcux, mcuy, ri, qts, order, segs) in enumerate(metas):
        nc = len(order)
        img_nc[mi] = nc
        img_block0[mi] = nblocks
        mcus = mcux * mcuy
        tdc = [tid_of(d) for _tq, d, _a in order] + [0] * (3 - nc)
        tac = [tid_of(a) for _tq, _d, a in order] + [0] * (3 - nc)
        step = ri if ri else mcus
        for si, chunk in enumerate(segs):
            first = si * step
            lane_rows.append(
                (mi, nbytes * 8, nbytes * 8 + chunk.size * 8,
                 nblocks + first * nc, min(step, mcus - first))
            )
            tdc_rows.append(tdc)
            tac_rows.append(tac)
            bufs.append(chunk)
            nbytes += chunk.size
        nblocks += mcus * nc
    bufs.append(np.zeros(4, np.uint8))  # final peek-past-end pad
    B = np.concatenate(bufs).astype(np.int32)
    W32 = (B[:-2] << 16) | (B[1:-1] << 8) | B[2:]  # int32: values < 2^24

    # int64 LUTs: per-step gathers then need no astype
    SYM = np.concatenate([s for s, _l in tab_list]).astype(np.int64)
    LEN = np.concatenate([l for _s, l in tab_list]).astype(np.int64)

    lanes = np.array(lane_rows, np.int64).reshape(-1, 5)
    img_of = lanes[:, 0].copy()
    pos = lanes[:, 1].copy()
    end = lanes[:, 2].copy()
    block = lanes[:, 3].copy()
    mcu_left = lanes[:, 4].copy()
    # per-lane table ids in one 6-slot row: [dc0 dc1 dc2 ac0 ac1 ac2] —
    # slot = phase·3 + comp is a single flat gather per step
    t6 = np.concatenate(
        [np.array(tdc_rows, np.int64).reshape(-1, 3),
         np.array(tac_rows, np.int64).reshape(-1, 3)], axis=1
    )
    nl = lanes.shape[0]
    ncomp = img_nc[img_of]
    comp = np.zeros(nl, np.int64)
    k = np.zeros(nl, np.int64)
    phase = np.zeros(nl, np.int64)  # 0 = DC, 1 = AC
    pred = np.zeros((nl, 3), np.int64)

    # zig-zag coeffs, flat-indexed; int32 (baseline coeffs are ≤ 11 bits +
    # quantizer headroom) halves the scatter/gather traffic
    Cf = np.zeros(nblocks * 64, np.int32)
    img_bad = np.zeros(nimg, bool)

    t6f, predf = t6.ravel(), pred.ravel()
    base6 = np.arange(nl) * 6
    base3 = np.arange(nl) * 3
    alive = np.ones(nl, bool)
    nalive = nl
    wmax = W32.size - 1
    while nalive:
        w = (W32[np.minimum(pos >> 3, wmax)] >> (8 - (pos & 7))) & 0xFFFF
        off = t6f[base6 + phase * 3 + comp] * 65536 + w
        L = LEN[off]
        RS = SYM[off]
        bad = (L == 0) & alive
        p2 = pos + L
        # JPEG symbol structure lets every branch share one arithmetic
        # path: DC symbols are the size S directly (S ≤ 11 < 16 ⇒ RS&15
        # == RS, RS>>4 == 0), EOB (0x00) and ZRL (0xF0) both carry S = 0
        # extra bits, and ZRL's run field is 15 so "k += run + 1" is the
        # uniform post-symbol k for normal, ZRL and DC alike.
        S = RS & 15
        m1 = 1 << S
        w2 = (W32[np.minimum(p2 >> 3, wmax)] >> (8 - (p2 & 7))) & 0xFFFF
        val = (w2 >> (16 - S)) & (m1 - 1)
        sval = np.where(val < (m1 >> 1), val - m1 + 1, val)  # S=0 → 0
        is_ac = phase == 1
        eob = is_ac & (RS == 0)
        norm = is_ac & (RS != 0) & (RS != 0xF0)
        # DC: accumulate predictor, write slot 0
        dcm = ~is_ac & alive & ~bad
        pix = base3 + comp
        pnew = predf[pix] + sval
        predf[pix[dcm]] = pnew[dcm]
        Cf[block[dcm] * 64] = pnew[dcm]
        # AC: coefficient lands at k+run (ZRL/EOB write nothing). The alive
        # mask matters: a finished-but-uncompacted lane keeps re-decoding
        # its final bits, so its k grows without meaning — never let it
        # poison the image's bad flag.
        kw = k + (RS >> 4)
        bad |= alive & norm & (kw > 63)
        wok = norm & ~bad & alive
        Cf[block[wok] * 64 + kw[wok]] = sval[wok]
        pos = np.where(alive, p2 + S, pos)
        bad |= alive & (pos > end)
        k2 = kw + 1
        blockdone = (eob | (is_ac & (k2 > 63))) & ~bad
        k = np.where(is_ac, k2, 1)
        phase = 1 - blockdone
        wrap = blockdone & (comp + 1 >= ncomp)
        comp = np.where(wrap, 0, comp + blockdone)
        block = block + blockdone
        mcu_left = mcu_left - wrap
        if bad.any():
            img_bad[img_of[bad]] = True
        newdead = bad | (wrap & (mcu_left == 0))
        if newdead.any():
            alive = alive & ~newdead
            nalive = int(alive.sum())
            if nalive * 8 < pos.size * 7:  # compact at ≥12.5% dead
                (img_of, pos, end, block, mcu_left, ncomp, comp, k,
                 phase) = (a[alive] for a in
                           (img_of, pos, end, block, mcu_left, ncomp,
                            comp, k, phase))
                t6f = t6[alive].ravel()
                t6 = t6f.reshape(-1, 6)
                predf = pred[alive].ravel()
                pred = predf.reshape(-1, 3)
                base6 = base6[: pos.size]
                base3 = base3[: pos.size]
                alive = np.ones(pos.size, bool)
    C = Cf.reshape(nblocks, 64)

    # ---- dequantize + IDCT + assemble per image (per-image working sets
    # stay cache-sized; one whole-batch IDCT was measured slower — its
    # ~100 MB transients stall on hugepage defrag; a CHUNKED variant
    # (32k-block flushes, ~50 MB transients) was also measured 1.9x
    # slower bit-identical — the dequant scatter/repeat materializations
    # dominate, not numpy call overhead) ----
    for mi, (i, fh, fw, mcux, mcuy, _ri, qts, order, _segs) in enumerate(metas):
        if img_bad[mi]:
            yield i, None
            continue
        nc = len(order)
        base = img_block0[mi]
        planes = []
        for j, (tq, _d, _a) in enumerate(order):
            zz = C[base + j : base + mcux * mcuy * nc : nc]
            planes.append(
                _comp_plane(zz, qts[tq].reshape(64), mcuy, mcux)[:fh, :fw]
            )
        yield i, _planes_to_rgb(planes)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by the table's ``fmt`` column ('png' | 'jpeg')."""
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        return decode_jpeg(data)
    raise ValueError(f"unknown image format {fmt!r}")


def decode_image_batch(blobs: "list[bytes]", fmts: "list[str]") -> list:
    """Decode a mixed-format blob list: JPEGs through the lane-parallel
    batch decoder (one call per batch), everything else scalar. Returns
    one entry per input — a (h, w, 3) uint8 array, or the Exception the
    decode raised, so callers quarantine per image. This is THE shared
    decode loop for every actor-pool image stage (DecodeValidate,
    QualityStats, _LumaThumb, _EmbedImages)."""
    n = len(blobs)
    out: list = [None] * n
    jidx = [i for i, f in enumerate(fmts) if f in ("jpeg", "jpg")]
    if jidx:
        for i, r in zip(jidx, decode_jpeg_batch([blobs[i] for i in jidx])):
            out[i] = r
    for i in range(n):
        if out[i] is None:
            try:
                out[i] = decode_image(blobs[i], fmts[i])
            except Exception as e:  # noqa: BLE001 — per-image quarantine
                out[i] = e
    return out


def encode_image(img: np.ndarray, fmt: str, quality: int = 98) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt in ("jpeg", "jpg"):
        return encode_jpeg(img, quality)
    raise ValueError(f"unknown image format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --- perceptual hash (D4) --------------------------------------------------

_PHASH_N = 32
_PHASH_K = 8

_DCT32 = _dct_matrix(_PHASH_N)


def _area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-stochastic resample weights: W[i, j] = fractional
    overlap of source pixel [j, j+1) with destination cell
    [i·src/dst, (i+1)·src/dst), normalized by the cell width. Exact for
    both down- AND up-sampling (the former integer-floor grid produced
    zero-area — hence all-zero — output rows whenever src < dst). When
    src is a multiple of dst the weights reduce to the integer grid, so
    e.g. 32/64 px phashes are unchanged. Cached: thumb/phash loops call
    this with a handful of distinct shapes per batch."""
    key = (src, dst)
    w = _AREA_W_CACHE.get(key)
    if w is None:
        scale = src / dst
        lo = np.arange(dst, dtype=np.float64) * scale
        j = np.arange(src, dtype=np.float64)
        ov = np.minimum(lo[:, None] + scale, j + 1.0) - np.maximum(lo[:, None], j)
        w = np.clip(ov, 0.0, None) / scale
        if len(_AREA_W_CACHE) < 1024:
            _AREA_W_CACHE[key] = w
    return w


_AREA_W_CACHE: dict = {}


def _resize_area(gray: np.ndarray, n: int) -> np.ndarray:
    """Area-mean resample of a (h, w) array to (n, n) — deterministic,
    library-free, exact fractional pixel coverage (separable weight
    matrices, one matmul per axis)."""
    h, w = gray.shape
    return _area_weights(h, n) @ gray @ _area_weights(w, n).T


def phash64(img: np.ndarray) -> int:
    """DCT perceptual hash → signed int64 (column type in the input_hint).

    Classic algorithm: grayscale → 32×32 area resample → 2-D DCT-II → top-left
    8×8 low-frequency block → median threshold (DC excluded) → 64-bit code.
    """
    img = np.asarray(img)
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114]) if img.ndim == 3 else img.astype(np.float64)
    small = _resize_area(gray, _PHASH_N)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:_PHASH_K, :_PHASH_K].ravel()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint8)
    # MSB-first bit pack == the former per-bit shift loop, branch-free
    code = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return code - (1 << 64) if code >= (1 << 63) else code


def phash64_batch(imgs: "list[np.ndarray]") -> np.ndarray:
    """``phash64`` over many images at once — identical values. The
    per-image half (grayscale + area resample) is size-dependent and stays
    per-image; the 32×32 DCT, median threshold and bit pack batch into
    single kernels across the whole list."""
    n = len(imgs)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    smalls = np.empty((n, _PHASH_N, _PHASH_N), dtype=np.float64)
    for i, img in enumerate(imgs):
        img = np.asarray(img)
        gray = (img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                if img.ndim == 3 else img.astype(np.float64))
        smalls[i] = _resize_area(gray, _PHASH_N)
    dct = _DCT32 @ smalls @ _DCT32.T
    block = dct[:, :_PHASH_K, :_PHASH_K].reshape(n, _PHASH_K * _PHASH_K)
    med = np.median(block[:, 1:], axis=1)
    bits = (block > med[:, None]).astype(np.uint8)
    codes = np.packbits(bits, axis=1).astype(np.uint64)
    shifts = np.arange(56, -1, -8, dtype=np.uint64)
    return (codes << shifts).sum(axis=1, dtype=np.uint64).view(np.int64)


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 phash arrays."""
    x = (np.asarray(a, dtype=np.int64).view(np.uint64)
         ^ np.asarray(b, dtype=np.int64).view(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCOUNT8[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
    return cnt


# --- RIFF/AVI MJPEG video container -----------------------------------------
#
# A real, spec-true minimal AVI writer + demuxer (Motion-JPEG: each '00dc'
# chunk is one baseline JPEG frame). Frame sampling seeks at CONTAINER level:
# the demuxer yields (index, jpeg_bytes) without decoding pixels, so skipped
# frames are never entropy-decoded.


def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")


def _riff_list(kind: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + payload)


def encode_video_avi(frames: "list[np.ndarray]", fps: int = 10, quality: int = 98) -> bytes:
    """Encode frames as an AVI/MJPG file (one baseline JPEG per '00dc'
    chunk, AVIF_HASINDEX idx1 index)."""
    jpgs = encode_jpeg_batch(list(frames), quality)
    h, w = (frames[0].shape[0], frames[0].shape[1]) if frames else (0, 0)
    maxbuf = max((len(j) for j in jpgs), default=0)
    avih = _riff_chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // max(fps, 1), maxbuf * fps, 0, 0x10, len(jpgs),
        0, 1, maxbuf, w, h, 0, 0, 0, 0))
    strh = _riff_chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, fps, 0, len(jpgs), maxbuf, 10_000,
        0, 0, 0, w, h))
    # ^ flags, priority, language, initialFrames, scale, rate, start,
    #   length, bufsize, quality, sampleSize, rcFrame (4×int16)
    strf = _riff_chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0))
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi_parts = []
    index_entries = []
    off = 4  # offsets in idx1 are relative to the 'movi' fourcc
    for j in jpgs:
        movi_parts.append(_riff_chunk(b"00dc", j))
        index_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    movi = _riff_list(b"movi", b"".join(movi_parts))
    idx1 = _riff_chunk(b"idx1", b"".join(index_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_walk(data: bytes, off: int, end: int):
    while off + 8 <= end:
        tag = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        body = off + 8
        if body + size > end:
            raise ValueError("truncated RIFF chunk")
        yield tag, body, size
        off = body + size + (size & 1)


def iter_video_frames(data: bytes):
    """Demux an AVI/MJPG payload: yield (frame_index, jpeg_bytes) straight
    from the 'movi' list — container-level seek, no pixel decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    for tag, body, size in _riff_walk(data, 12, end):
        if tag == b"LIST" and data[body : body + 4] == b"movi":
            idx = 0
            for ctag, cbody, csize in _riff_walk(data, body + 4, body + size):
                if ctag[2:4] in (b"dc", b"db"):
                    yield idx, data[cbody : cbody + csize]
                    idx += 1
            return
    raise ValueError("no movi list in AVI")


def video_frame_count(data: bytes) -> int:
    """dwTotalFrames from the AVI main header (no frame parsing)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    for tag, body, size in _riff_walk(data, 12, end):
        if tag == b"LIST" and data[body : body + 4] == b"hdrl":
            for ctag, cbody, csize in _riff_walk(data, body + 4, body + size):
                if ctag == b"avih":
                    return struct.unpack_from("<I", data, cbody + 16)[0]
    raise ValueError("no avih header in AVI")
