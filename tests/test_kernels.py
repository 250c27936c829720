"""Unit tests for the pure-numpy kernels: geo, cell index, fuzzy ratio."""

import numpy as np
import pyarrow as pa
import pytest

from overmatch_ray.cell import cell_id, cell_ij, hilbert_key, kring1_cells
from overmatch_ray.geo import (
    PackedPolygon,
    inverse_mercator,
    mercator_xy,
    parse_wkb_points,
    planar_distance,
    wkb_points,
    wkb_polygon,
)
from overmatch_ray.text import lcs_length, ratio, ratio_pairs


def _lcs_dp(a: str, b: str) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a)):
        for j in range(len(b)):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[len(a)][len(b)]


class TestRatio:
    def test_against_dp_random(self):
        rng = np.random.default_rng(7)
        alpha = list("abcde XYZ,éü'&-")
        pairs = []
        for _ in range(300):
            a = "".join(rng.choice(alpha, rng.integers(0, 70)))
            b = "".join(rng.choice(alpha, rng.integers(0, 70)))
            pairs.append((a, b))
        pairs += [("", ""), ("", "a"), ("Starbucks", "Starbucks")]
        got = ratio_pairs([p[0] for p in pairs], [p[1] for p in pairs])
        for i, (a, b) in enumerate(pairs):
            lcs = _lcs_dp(a, b)
            assert lcs_length(a, b) == lcs
            exp = 100.0 if not a and not b else 200.0 * lcs / (len(a) + len(b))
            assert got[i] == pytest.approx(exp)
            assert ratio(a, b) == pytest.approx(exp)

    def test_known_values(self):
        # indel similarity: substitution costs 2 (rapidfuzz fuzz.ratio model)
        assert ratio("abcd", "abcd") == 100.0
        assert ratio("abcd", "abce") == pytest.approx(75.0)
        assert ratio("We, The Pizza", "We The Pizza") == pytest.approx(96.0)


class TestGeo:
    def test_mercator_roundtrip(self):
        lon = np.array([-77.0017, -179.9, 0.0, 120.5])
        lat = np.array([38.8867, -84.9, 0.0, 66.6])
        x, y = mercator_xy(lon, lat)
        lo, la = inverse_mercator(x, y)
        np.testing.assert_allclose(lo, lon)
        np.testing.assert_allclose(la, lat)

    def test_equator_scale(self):
        # at the equator 1° lon ≈ 111.32 km in 3857
        x, _ = mercator_xy(np.array([0.0, 1.0]), np.array([0.0, 0.0]))
        d = planar_distance(x[0], 0.0, x[1], 0.0)
        assert d == pytest.approx(111_319.49, rel=1e-4)

    def test_wkb_point_roundtrip(self):
        lon = np.array([-77.0, 13.5])
        lat = np.array([38.9, -7.25])
        lo, la = parse_wkb_points(wkb_points(lon, lat))
        np.testing.assert_allclose(lo, lon)
        np.testing.assert_allclose(la, lat)

    def test_point_in_polygon(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        poly = PackedPolygon.from_wkb(wkb_polygon([sq]))
        got = poly.contains(np.array([5.0, 15.0, -1.0]), np.array([5.0, 5.0, 5.0]))
        assert got.tolist() == [True, False, False]
        hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
        donut = PackedPolygon([sq, hole])
        got = donut.contains(np.array([5.0, 2.0]), np.array([5.0, 2.0]))
        assert got.tolist() == [False, True]


class TestCell:
    def test_cell_roundtrip(self):
        x = np.array([-8_571_600.1, 0.0, 255.9, -0.1, 1e7])
        y = np.array([4_705_300.2, 0.0, -256.0, 0.1, -1e7])
        c = cell_id(x, y)
        ix, iy = cell_ij(c)
        c2 = cell_id((ix + 0.5) * 256.0, (iy + 0.5) * 256.0)
        np.testing.assert_array_equal(c, c2)

    def test_kring_covers_radius(self):
        # every point within 100 m of p lies in p's k-ring-1 cell set
        rng = np.random.default_rng(3)
        px = rng.uniform(-1e6, 1e6, 200)
        py = rng.uniform(-1e6, 1e6, 200)
        ang = rng.uniform(0, 2 * np.pi, 200)
        r = rng.uniform(0, 100, 200)
        qx, qy = px + r * np.cos(ang), py + r * np.sin(ang)
        pc = cell_id(px, py)
        kr = kring1_cells(cell_id(qx, qy))  # replicate the "index side"
        assert all(pc[i] in kr[i] for i in range(200))

    def test_hilbert_locality(self):
        # adjacent grid points get closer keys than far-apart points on average
        x = np.array([0.0, 10.0, 5e6])
        y = np.array([0.0, 10.0, -5e6])
        k = hilbert_key(x, y)
        assert abs(int(k[0]) - int(k[1])) < abs(int(k[0]) - int(k[2]))
        # deterministic
        np.testing.assert_array_equal(k, hilbert_key(x, y))


class TestExactQuantiles:
    def test_matches_numpy_linear(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import exact_quantiles

        rng = np.random.default_rng(6)
        vals = np.round(rng.uniform(0, 100, 5000), 2)
        t = pa.table({"v": pa.array(vals)})
        ps = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
        out = exact_quantiles(
            ray.data.from_arrow(t).repartition(7), "v", ps
        )
        got = dict(zip(out["p"].to_pylist(), out["q"].to_pylist()))
        for p in ps:
            assert got[p] == round(float(np.quantile(vals, p)), 6), p


class TestWireFormats:
    def test_varint_zigzag_roundtrip(self):
        from hypothesis import given
        from hypothesis import strategies as st

        from overmatch_ray.stages.mvt import _varint, _zigzag

        def read_varint(buf, i=0):
            shift = out = 0
            while True:
                b = buf[i]
                i += 1
                out |= (b & 0x7F) << shift
                if not b & 0x80:
                    return out, i
                shift += 7

        @given(st.integers(min_value=0, max_value=2**64 - 1))
        def roundtrip(n):
            v, i = read_varint(_varint(n))
            assert v == n and i == len(_varint(n))

        roundtrip()

        @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
        def zz(n):
            u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
            assert (u >> 1) ^ -(u & 1) == n

        zz()

    def test_pmtiles_directory_roundtrip(self):
        from hypothesis import given
        from hypothesis import strategies as st

        from overmatch_ray.stages.pmtiles import (
            _deserialize_directory,
            _serialize_directory,
        )

        @given(
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=2**40),
                    st.integers(min_value=1, max_value=2**20),
                    st.integers(min_value=0, max_value=3),
                ),
                max_size=40,
            )
        )
        def roundtrip(rows):
            # build sorted entries with contiguous and gapped offsets mixed
            rows.sort()
            entries, off = [], 0
            for i, (tid_d, ln, gap) in enumerate(rows):
                tid = (entries[-1][0] + 1 + tid_d) if entries else tid_d
                off += gap  # 0 → contiguous shorthand branch
                entries.append((tid, off, ln, 1))
                off += ln
            assert _deserialize_directory(_serialize_directory(entries)) == entries

        roundtrip()


class TestHistogramQuantiles:
    def test_accuracy_and_determinism(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import histogram_quantiles

        rng = np.random.default_rng(8)
        vals = rng.standard_normal(50_000) * 7.3 + 2.1  # continuous doubles
        t = pa.table({"v": pa.array(vals)})
        ps = [0.05, 0.5, 0.95]
        out = histogram_quantiles(
            ray.data.from_arrow(t).repartition(9), "v", ps, bins=4096
        )
        got = dict(zip(out["p"].to_pylist(), out["q"].to_pylist()))
        width = (vals.max() - vals.min()) / 4096
        for p in ps:
            assert abs(got[p] - np.quantile(vals, p)) <= 2 * width, p
        # partitioning-invariant
        out2 = histogram_quantiles(
            ray.data.from_arrow(t).repartition(3), "v", ps, bins=4096
        )
        assert out.to_pylist() == out2.to_pylist()
        # constant column edge
        c = pa.table({"v": pa.array([3.5] * 100)})
        oc = histogram_quantiles(ray.data.from_arrow(c), "v", [0.5])
        assert oc["q"].to_pylist() == [3.5]


class TestWkbLinestring:
    def test_roundtrip(self):
        import numpy as np

        from overmatch_ray.geo import parse_wkb_linestring, wkb_linestring

        coords = np.array([[0.0, 0.0], [11.0, 14.0], [-3.5, 2.25], [1e7, -1e7]])
        blob = wkb_linestring(coords)
        assert blob[0] == 1 and blob[1:5] == (2).to_bytes(4, "little")
        back = parse_wkb_linestring(blob)
        assert np.array_equal(back, coords)

    def test_type_guard(self):
        import numpy as np
        import pytest

        from overmatch_ray.geo import parse_wkb_linestring, wkb_point

        with pytest.raises(ValueError, match="linestring"):
            parse_wkb_linestring(wkb_point(1.0, 2.0))


class TestSkyline2D:
    def test_mask_vs_brute_force(self):
        import numpy as np

        from overmatch_ray.stages.groupops import skyline_2d_mask

        rng = np.random.default_rng(9)
        for n, hi in ((1, 2), (50, 8), (400, 10**6)):
            x = rng.integers(0, hi, n)
            y = rng.integers(0, hi, n)
            m = skyline_2d_mask(x, y)
            dom = (
                (x[:, None] <= x[None, :])
                & (y[:, None] <= y[None, :])
                & ((x[:, None] < x[None, :]) | (y[:, None] < y[None, :]))
            )
            assert (m == ~dom.any(axis=1)).all()
        assert list(skyline_2d_mask(np.array([]), np.array([]))) == []

    def test_duplicates_of_front_point_all_survive(self):
        import numpy as np

        from overmatch_ray.stages.groupops import skyline_2d_mask

        x = np.array([5, 5, 3, 1])
        y = np.array([7, 7, 9, 1])
        assert list(skyline_2d_mask(x, y)) == [True, True, True, False]

    def test_combiner_exactness_any_split(self):
        import numpy as np

        from overmatch_ray.stages.groupops import skyline_2d_mask

        rng = np.random.default_rng(13)
        x = rng.integers(0, 30, 300)
        y = rng.integers(0, 30, 300)
        want = skyline_2d_mask(x, y)
        for parts in (2, 7):
            cand = np.concatenate([
                lo + np.flatnonzero(
                    skyline_2d_mask(x[lo:hi], y[lo:hi]))
                for lo, hi in zip(
                    range(0, 300, 300 // parts),
                    list(range(300 // parts, 300, 300 // parts)) + [300],
                )
            ])
            got = np.zeros(300, bool)
            got[cand[skyline_2d_mask(x[cand], y[cand])]] = True
            assert (got == want).all()
