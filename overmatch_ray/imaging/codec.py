"""Image codecs + perceptual hashing for the image-caption axis (M24/D4).

The graft's input table carries opaque ``bytes:binary`` image payloads
(BASELINE.json input_hint). No image library (PIL/cv2) exists in this
container, so:

- **PNG** is implemented for real, in pure Python over ``zlib`` (spec-true
  subset: 8-bit RGB, filter 0) — lossless, decoded pixels are exactly the
  source array.
- **"jpeg" is a STUB**: a clearly-marked deterministic fake lossy codec
  (uniform quantization + zlib). It is NOT JPEG; it stands in for the lossy
  path so the Ray-side plumbing (schema, batch sizes, actor signature,
  PSNR≥40 dB invariant) is real and tested. Swap in a real JPEG codec when
  the library is available.

Also: PSNR (the input_hint invariant: decoded pixels allclose, PSNR ≥ 40 dB
for lossy; captions byte-equal) and a DCT-based 64-bit perceptual hash for
near-duplicate detection (D4).
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


# --- STUB lossy codec ------------------------------------------------------

_FAKE_MAGIC = b"FLOSSY01"  # deterministic fake; NOT a real JPEG
_FAKE_Q = 4  # quantization step → worst-case error 2 → PSNR ≈ 47 dB


def encode_fake_lossy(img: np.ndarray) -> bytes:
    """STUB for JPEG encoding (deterministic fake, see module docstring)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_fake_lossy expects RGB (h, w, 3)")
    q = (img.astype(np.uint16) // _FAKE_Q).astype(np.uint8)
    return _FAKE_MAGIC + struct.pack(">III", w, h, _FAKE_Q) + zlib.compress(q.tobytes(), 6)


def decode_fake_lossy(data: bytes) -> np.ndarray:
    if data[:8] != _FAKE_MAGIC:
        raise ValueError("not a fake-lossy payload")
    w, h, q = struct.unpack_from(">III", data, 8)
    raw = np.frombuffer(zlib.decompress(data[20:]), dtype=np.uint8)
    img = raw.reshape(h, w, 3).astype(np.uint16) * q + q // 2
    return np.minimum(img, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by the table's ``fmt`` column ('png' | 'jpeg')."""
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        if data[:8] == _FAKE_MAGIC:
            return decode_fake_lossy(data)
        raise NotImplementedError(
            "real JPEG decoding requires an image library not present in "
            "this container; only the deterministic fake-lossy stub payload "
            "is supported (see overmatch_ray.imaging.codec docstring)"
        )
    raise ValueError(f"unknown image format {fmt!r}")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt in ("jpeg", "jpg"):
        return encode_fake_lossy(img)
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


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(_PHASH_N)


def _resize_area(gray: np.ndarray, n: int) -> np.ndarray:
    """Area-mean resample of a (h, w) array to (n, n) — deterministic,
    library-free."""
    h, w = gray.shape
    ys = (np.arange(n + 1) * h // n).astype(np.int64)
    xs = (np.arange(n + 1) * w // n).astype(np.int64)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    out = (
        csum[ys[1:, None], xs[None, 1:]]
        - csum[ys[:-1, None], xs[None, 1:]]
        - csum[ys[1:, None], xs[None, :-1]]
        + csum[ys[:-1, None], xs[None, :-1]]
    )
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    return out / np.maximum(area, 1)


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


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 phash arrays."""
    x = (np.asarray(a, dtype=np.int64).view(np.uint64)
         ^ np.asarray(b, dtype=np.int64).view(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCOUNT8[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
    return cnt


# --- STUB video container --------------------------------------------------

_FAKE_VIDEO_MAGIC = b"FVIDEO01"  # deterministic fake container; NOT a codec


def encode_fake_video(frames: "list[np.ndarray]") -> bytes:
    """STUB video container: a length-prefixed sequence of PNG frames.
    Stands in for a real video codec (absent in this container) so the
    frame-sampling plumbing is real and testable."""
    parts = [_FAKE_VIDEO_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        png = encode_png(f)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def iter_fake_video(data: bytes):
    """Yield (frame_index, png_bytes) without decoding pixels — sampling can
    skip frames at container level (the point of frame-sampling)."""
    if data[:8] != _FAKE_VIDEO_MAGIC:
        raise ValueError("not a fake-video payload")
    (n,) = struct.unpack_from(">I", data, 8)
    off = 12
    for i in range(n):
        (ln,) = struct.unpack_from(">I", data, off)
        off += 4
        yield i, data[off : off + ln]
        off += ln


def video_frame_count(data: bytes) -> int:
    if data[:8] != _FAKE_VIDEO_MAGIC:
        raise ValueError("not a fake-video payload")
    return struct.unpack_from(">I", data, 8)[0]
