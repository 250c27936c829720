"""Image codec + phash invariants (input_hint: decoded pixels allclose,
PSNR ≥ 40 dB for lossy; captions byte-equal; phash dedup pairs).

The JPEG tests include hand-assembled baseline bitstreams built from the
ITU-T T.81 Annex-K code tables written out longhand (independent of the
encoder), so the decoder is checked against the spec, not just against our
own encoder's output.
"""

import struct

import numpy as np
import pytest

from overmatch_ray.imaging.codec import (
    decode_image,
    decode_jpeg,
    decode_png,
    encode_image,
    encode_jpeg,
    encode_png,
    hamming64,
    phash64,
    psnr,
)
from overmatch_ray.synth import images_block


def _img(seed, h=37, w=23):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


class TestPng:
    def test_png_lossless_roundtrip(self):
        img = _img(0)
        assert (decode_png(encode_png(img)) == img).all()

    def test_png_up_filter_first_row(self):
        # spec-valid PNG using filter 2 (Up) on row 0: prior row is implicit
        # zeros — regression for the decoder rejecting it
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


class _Bits:
    """Test-local MSB-first bit writer (spec-table code strings go in)."""

    def __init__(self):
        self.s = ""

    def put(self, bits: str):
        self.s += bits

    def bytes(self) -> bytes:
        s = self.s + "1" * (-len(self.s) % 8)
        out = bytearray(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
        i = 0
        while i < len(out):  # byte stuffing
            if out[i] == 0xFF:
                out.insert(i + 1, 0)
                i += 1
            i += 1
        return bytes(out)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


# T.81 Annex K.3 canonical code words used by the handcrafted vectors:
_DC_LUM_S0 = "00"          # DC luminance, category 0
_DC_LUM_S10 = "11111110"   # DC luminance, category 10
_DC_CHR_S0 = "00"          # DC chrominance, category 0
_EOB_LUM = "1010"          # AC luminance (run,size)=(0,0)
_EOB_CHR = "00"            # AC chrominance (run,size)=(0,0)

_UNIT_DQT = _seg(0xDB, bytes([0x00]) + b"\x01" * 64 + bytes([0x01]) + b"\x01" * 64)

_STD_DHT = b""
from overmatch_ray.imaging.codec import (  # noqa: E402  (specs are public T.81 data)
    _AC_CHR_SPEC,
    _AC_LUM_SPEC,
    _DC_CHR_SPEC,
    _DC_LUM_SPEC,
)

for tcth, (bits, vals) in ((0x00, _DC_LUM_SPEC), (0x10, _AC_LUM_SPEC),
                           (0x01, _DC_CHR_SPEC), (0x11, _AC_CHR_SPEC)):
    _STD_DHT += bytes([tcth]) + bytes(bits) + bytes(vals)
_STD_DHT = _seg(0xC4, _STD_DHT)


class TestJpegSpecVectors:
    """Decode hand-assembled T.81 baseline streams (not encoder output)."""

    def test_grayscale_dc_only_block(self):
        # 8×8 single-component image, unit quant table, one DC coefficient:
        # diff = 576 (category 10, value bits 1001000000) then EOB.
        # IDCT of a lone DC 576 is a constant 576/8 = 72 → +128 = 200.
        bw = _Bits()
        bw.put(_DC_LUM_S10)
        bw.put(format(576, "010b"))
        bw.put(_EOB_LUM)
        data = (
            b"\xff\xd8"
            + _UNIT_DQT
            + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
            + _STD_DHT
            + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bw.bytes()
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert out.shape == (8, 8, 3)
        assert (out == 200).all()

    def test_420_subsampled_constant(self):
        # 16×16 YCbCr 4:2:0: one MCU = 4 Y blocks + 1 Cb + 1 Cr. Constant
        # gray 200 → Y DC diff 576 on the first block, 0 after; Cb/Cr all
        # zero (centered at 128). Exercises the chroma upsample path.
        bw = _Bits()
        bw.put(_DC_LUM_S10 + format(576, "010b") + _EOB_LUM)  # Y block 1
        for _ in range(3):  # Y blocks 2-4: diff 0
            bw.put(_DC_LUM_S0 + _EOB_LUM)
        for _ in range(2):  # Cb, Cr
            bw.put(_DC_CHR_S0 + _EOB_CHR)
        data = (
            b"\xff\xd8"
            + _UNIT_DQT
            + _seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
                   + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
            + _STD_DHT
            + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
            + bw.bytes()
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert out.shape == (16, 16, 3)
        assert (out == 200).all()

    def test_restart_interval(self):
        # two 8×8-blocks-wide grayscale (16×8), DRI=1: RST0 between the
        # MCUs, DC predictor resets so both blocks carry diff 576.
        bw1, bw2 = _Bits(), _Bits()
        for bw in (bw1, bw2):
            bw.put(_DC_LUM_S10 + format(576, "010b") + _EOB_LUM)
        data = (
            b"\xff\xd8"
            + _UNIT_DQT
            + _seg(0xDD, struct.pack(">H", 1))
            + _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
            + _STD_DHT
            + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bw1.bytes()
            + b"\xff\xd0"  # RST0
            + bw2.bytes()
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert out.shape == (8, 16, 3)
        assert (out == 200).all()


class TestJpegCodec:
    def test_lossy_roundtrip_psnr(self):
        # worst case for a lossy codec: uniform noise, several shapes
        # including non-multiples of 8 (pad/crop path)
        for seed, (h, w) in enumerate([(8, 8), (16, 16), (37, 23), (64, 64), (12, 10)]):
            img = _img(seed, h, w)
            back = decode_jpeg(encode_jpeg(img))
            assert back.shape == img.shape
            assert psnr(img, back) >= 40.0

    def test_structured_image_high_psnr_and_compression(self):
        yy, xx = np.mgrid[0:64, 0:64]
        img = np.stack([xx * 4, yy * 4, (xx + yy) * 2], -1).astype(np.uint8)
        data = encode_jpeg(img)
        assert len(data) < 64 * 64 * 3 / 4  # actually compresses
        assert psnr(img, decode_jpeg(data)) >= 50.0

    def test_deterministic(self):
        img = _img(1)
        assert encode_jpeg(img) == encode_jpeg(img.copy())

    def test_markers_are_baseline_jfif(self):
        data = encode_jpeg(_img(2))
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
        assert b"\xff\xc0" in data and b"\xff\xc4" in data and b"\xff\xdb" in data

    def test_decode_dispatch(self):
        img = _img(2)
        assert (decode_image(encode_png(img), "png") == img).all()
        assert psnr(decode_image(encode_image(img, "jpeg"), "jpeg"), img) >= 40.0
        with pytest.raises(ValueError):
            decode_image(b"\x00" * 64, "jpeg")  # not a JPEG
        with pytest.raises(ValueError):
            decode_jpeg(encode_jpeg(img)[:40])  # truncated: no SOS reached

    def test_progressive_rejected(self):
        img = _img(3)
        data = bytearray(encode_jpeg(img))
        i = data.index(b"\xff\xc0")
        data[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))

    def test_restart_markers_lossless(self):
        # restart segments change only the entropy framing: decoded pixels
        # must be bit-identical with and without them
        for seed, (h, w) in enumerate([(8, 8), (37, 23), (96, 72), (64, 160)]):
            img = _img(seed, h, w)
            a = decode_jpeg(encode_jpeg(img, 95, restart_rows=0))
            b = decode_jpeg(encode_jpeg(img, 95, restart_rows=1))
            c = decode_jpeg(encode_jpeg(img, 95, restart_rows=3))
            assert (a == b).all() and (a == c).all()


class TestJpegBatchDecode:
    """The lane-parallel batch decoder must be bit-identical to the scalar
    decoder on every stream, and degrade to it per image on anomalies."""

    def test_parity_mixed_sizes_qualities(self):
        from overmatch_ray.imaging.codec import decode_jpeg_batch

        rng = np.random.default_rng(42)
        blobs = []
        for t in range(48):
            h = int(rng.integers(8, 130))
            w = int(rng.integers(8, 130))
            y, x = np.mgrid[0:h, 0:w]
            base = 128 + 60 * np.sin(x / 7.0 + t) + rng.normal(0, 5, (h, w))
            img = np.stack(
                [base, np.roll(base, 2, 0), np.roll(base, 3, 1)], -1
            ).clip(0, 255).astype(np.uint8)
            blobs.append(
                encode_jpeg(img, int(rng.choice([80, 90, 98])),
                            restart_rows=int(rng.choice([0, 1, 2])))
            )
        outs = decode_jpeg_batch(blobs)
        for b, o in zip(blobs, outs):
            assert isinstance(o, np.ndarray)
            assert (o == decode_jpeg(b)).all()

    def test_errors_come_back_per_image(self):
        from overmatch_ray.imaging.codec import decode_jpeg_batch

        good = encode_jpeg(_img(1, 24, 24))
        outs = decode_jpeg_batch([b"\x00" * 32, good, good[:40]])
        assert isinstance(outs[0], Exception)
        assert isinstance(outs[1], np.ndarray)
        assert isinstance(outs[2], Exception)
        assert (outs[1] == decode_jpeg(good)).all()

    def test_subsampled_falls_back_to_scalar(self):
        # hand-assembled 4:2:0 stream (ineligible for the lane machine)
        # mixed into a batch: result must still match the scalar decoder
        from overmatch_ray.imaging.codec import decode_jpeg_batch

        bw = _Bits()
        bw.put(_DC_LUM_S10 + format(576, "010b") + _EOB_LUM)
        for _ in range(3):
            bw.put(_DC_LUM_S0 + _EOB_LUM)
        for _ in range(2):
            bw.put(_DC_CHR_S0 + _EOB_CHR)
        sub420 = (
            b"\xff\xd8"
            + _UNIT_DQT
            + _seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
                   + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
            + _STD_DHT
            + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
            + bw.bytes()
            + b"\xff\xd9"
        )
        good = encode_jpeg(_img(7, 40, 56))
        outs = decode_jpeg_batch([sub420, good])
        assert (outs[0] == decode_jpeg(sub420)).all()
        assert (outs[1] == decode_jpeg(good)).all()


class TestPhash:
    def test_identical_images_equal_hash(self):
        img = _img(3)
        assert phash64(img) == phash64(img.copy())

    def test_lossy_survives(self):
        img = _img(4, 48, 48)
        back = decode_jpeg(encode_jpeg(img))
        d = hamming64(np.array([phash64(img)]), np.array([phash64(back)]))[0]
        assert d <= 6

    def test_different_images_far(self):
        d = hamming64(np.array([phash64(_img(5))]), np.array([phash64(_img(6))]))[0]
        assert d > 10


class TestTruncatedStream:
    def test_truncated_entropy_raises_both_paths(self):
        """A stream cut short by its last entropy bytes must RAISE, not
        silently decode the zero padding (zero bits form valid short
        Huffman codes, so without the segment-length check the final
        blocks decode to wrong pixels with no error). Scalar and batch
        decoders must agree."""
        from overmatch_ray.imaging.codec import (
            decode_jpeg,
            decode_jpeg_batch,
            encode_jpeg,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        blob = encode_jpeg(img, 95)
        assert decode_jpeg(blob).shape == (40, 56, 3)  # intact is fine
        for cut in (1, 2, 3):
            t = blob[: -2 - cut] + blob[-2:]  # drop entropy, keep EOI
            with pytest.raises(ValueError, match="truncated entropy"):
                decode_jpeg(t)
            (r,) = decode_jpeg_batch([t])
            assert isinstance(r, Exception)


class TestResizeArea:
    """Exact fractional-edge area resampler (r4 review fix: the former
    integer-floor grid emitted all-zero rows whenever src < dst, garbling
    SSIM thumbs / feature vectors / phashes for the 16–31 px corpus)."""

    def test_upsample_no_zero_stripes(self):
        from overmatch_ray.imaging.codec import _resize_area

        g = np.arange(1, 257, dtype=np.float64).reshape(16, 16)
        r = _resize_area(g, 64)
        assert r.shape == (64, 64)
        assert (r > 0).all()  # strictly positive input stays positive

    def test_mean_preserved_both_directions(self):
        from overmatch_ray.imaging.codec import _resize_area

        rng = np.random.default_rng(9)
        for h, w in ((16, 16), (40, 25), (100, 64), (64, 100)):
            g = rng.uniform(0, 255, (h, w))
            for n in (32, 64):
                r = _resize_area(g, n)
                # area resampling conserves total mass exactly
                assert r.mean() == pytest.approx(g.mean(), rel=1e-12)

    def test_integer_grid_equivalence(self):
        """When src is a multiple of dst the fractional weights reduce to
        the integer grid — 32/64 px phashes are unchanged by the fix."""
        from overmatch_ray.imaging.codec import _resize_area

        g = np.random.default_rng(10).uniform(0, 255, (64, 64))
        ref = g.reshape(32, 2, 32, 2).mean(axis=(1, 3))
        assert np.abs(_resize_area(g, 32) - ref).max() < 1e-12


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
                assert r["bytes"][:2] == b"\xff\xd8"  # real JPEG payloads
                # stored phash is from source pixels; decoded pixels must
                # stay within the LOSSY-ROUNDTRIP budget (10 bits — the
                # measured ceiling at q95..98 over this piecewise-smooth
                # corpus, whose DCT coefficients cluster near the median
                # threshold; the dedup BAND threshold stays 6 because it
                # compares source-pixel phashes, which quantization noise
                # never touches)
                src_ph = np.array([r["phash"]])
                dec_ph = np.array([phash64(img)])
                assert hamming64(src_ph, dec_ph)[0] <= 10
            assert isinstance(r["caption"], str) and r["caption"]
        # exact-duplicate pairs every 17th row
        assert rows[17]["phash"] == rows[16]["phash"]
