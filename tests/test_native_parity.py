"""Parity of the optional compiled entropy kernels (imaging/_native.c)
against the numpy reference implementations in imaging/codec.py.

The C kernels are integer-exact reimplementations of the same algorithms,
so encoded blobs and decoded pixel arrays must be BIT-IDENTICAL — this is
what makes the fast path safe to enable automatically (synth corpora and
phash values cannot drift with compiler availability)."""

import numpy as np
import pytest

from overmatch_ray.imaging import codec, native

pytestmark = pytest.mark.skipif(
    native.LIB is None, reason="no C compiler / native kernel disabled"
)


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    codec._FORCE_NUMPY = False


def _corpus(n=40, seed=11):
    rng = np.random.default_rng(seed)
    imgs = []
    for i in range(n):
        h = int(rng.integers(8, 150))
        w = int(rng.integers(8, 150))
        kind = i % 4
        if kind == 0:  # smooth gradient
            y, x = np.mgrid[0:h, 0:w]
            g = ((x * 3 + y * 5 + i) % 256).astype(np.uint8)
            img = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1)], axis=-1)
        elif kind == 1:  # uniform noise (worst-case entropy)
            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        elif kind == 2:  # flat + hard edges (long zero runs, ZRL symbols)
            img = np.full((h, w, 3), 128, np.uint8)
            img[: h // 2, : w // 2] = 255
        else:  # sparse impulses (EOB-heavy)
            img = np.zeros((h, w, 3), np.uint8)
            img[rng.integers(0, h, 5), rng.integers(0, w, 5)] = 255
        imgs.append(img)
    return imgs


@pytest.mark.parametrize("quality", [98, 80, 35])
@pytest.mark.parametrize("kw", [{}, {"restart_rows": 0}, {"restart_mcus": 5}])
def test_encode_bit_identity(quality, kw):
    imgs = _corpus(24)
    codec._FORCE_NUMPY = True
    ref_scalar = [codec.encode_jpeg(im, quality, **kw) for im in imgs]
    ref_batch = codec.encode_jpeg_batch(imgs, quality, **kw)
    codec._FORCE_NUMPY = False
    nat_scalar = [codec.encode_jpeg(im, quality, **kw) for im in imgs]
    nat_batch = codec.encode_jpeg_batch(imgs, quality, **kw)
    assert ref_batch == ref_scalar
    assert nat_scalar == ref_scalar
    assert nat_batch == ref_scalar


def test_decode_bit_identity():
    imgs = _corpus(40, seed=23)
    blobs = codec.encode_jpeg_batch(imgs)
    codec._FORCE_NUMPY = True
    ref = codec.decode_jpeg_batch(blobs)
    codec._FORCE_NUMPY = False
    nat = codec.decode_jpeg_batch(blobs)
    for r, g in zip(ref, nat):
        assert not isinstance(r, Exception)
        assert not isinstance(g, Exception)
        assert r.shape == g.shape and (r == g).all()


def test_corrupt_stream_agreement():
    # every corruption must yield the SAME outcome class on both paths:
    # either both decode (bit flip landed in padding) to equal pixels, or
    # both surface an Exception from the shared scalar fallback
    imgs = _corpus(6, seed=5)
    blobs = codec.encode_jpeg_batch(imgs)
    rng = np.random.default_rng(7)
    for b in blobs:
        for _ in range(4):
            bad = bytearray(b)
            pos = int(rng.integers(len(bad) // 2, len(bad) - 2))
            bad[pos] ^= int(rng.integers(1, 255))
            bad = bytes(bad)
            codec._FORCE_NUMPY = True
            r = codec.decode_jpeg_batch([bad])[0]
            codec._FORCE_NUMPY = False
            g = codec.decode_jpeg_batch([bad])[0]
            if isinstance(r, Exception) or isinstance(g, Exception):
                assert type(r) is type(g), (r, g)
            else:
                assert r.shape == g.shape and (r == g).all()


def test_pack_codes_empty_and_tiny():
    z = np.zeros(0, np.int64)
    codec._FORCE_NUMPY = True
    ref = codec._pack_codes(z, z)
    codec._FORCE_NUMPY = False
    assert codec._pack_codes(z, z) == ref
    # single 0xFF-producing symbol exercises stuffing of the padded byte
    codes = np.array([0xFF], np.int64)
    lens = np.array([8], np.int64)
    codec._FORCE_NUMPY = True
    ref = codec._pack_codes(codes, lens)
    codec._FORCE_NUMPY = False
    assert codec._pack_codes(codes, lens) == ref == b"\xff\x00"


def test_ratio_pairs_bit_identity():
    # mixed corpus: unicode, empty, None, exactly-64, >64 (scalar path),
    # non-string oddities — outputs must be bitwise-identical float64
    rng = np.random.default_rng(41)
    pool = ["Joe's Diner", "Starbucks Coffee #123", "", None,
            "Ünïcode Café ☕", "x" * 64, "y" * 70, "x" * 63 + "q",
            "The Corner Bakery & Cafe", 12345, "Quick Mart"]
    a = np.array([pool[int(rng.integers(len(pool)))] for _ in range(5000)],
                 object)
    b = np.array([pool[int(rng.integers(len(pool)))] for _ in range(5000)],
                 object)
    from overmatch_ray import text

    codec._FORCE_NUMPY = True
    ref = text.ratio_pairs(a, b)
    codec._FORCE_NUMPY = False
    got = text.ratio_pairs(a, b)
    assert (ref == got).all()
    # spot-check against the scalar big-int reference
    for i in range(0, 5000, 97):
        sa = a[i] if isinstance(a[i], str) else ("" if a[i] is None else str(a[i]))
        sb = b[i] if isinstance(b[i], str) else ("" if b[i] is None else str(b[i]))
        if len(sa) <= 64 and len(sb) <= 64:
            assert got[i] == text.ratio(sa, sb) or (not sa and not sb)
