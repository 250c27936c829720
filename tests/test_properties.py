"""Property-based spot checks (SURVEY.md §5) — hypothesis over the pure
kernels (no Ray session needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from overmatch_ray.cell import cell_id, kring1_cells
from overmatch_ray.functions.tags import (
    clean_website,
    normalize_candidate,
    normalize_phone,
    strip_tracking_params,
)
from overmatch_ray.geo import inverse_mercator, mercator_xy
from overmatch_ray.text import lcs_length, ratio, ratio_pairs

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=80,
)


class TestRatioProperties:
    @given(TEXT, TEXT)
    @settings(max_examples=200, deadline=None)
    def test_bounds_symmetry_identity(self, a, b):
        r = ratio(a, b)
        assert 0.0 <= r <= 100.0
        assert r == ratio(b, a)  # LCS is symmetric
        assert ratio(a, a) == 100.0
        # vectorized kernel agrees with scalar
        assert abs(ratio_pairs([a], [b])[0] - r) < 1e-9

    @given(TEXT, TEXT)
    @settings(max_examples=100, deadline=None)
    def test_lcs_bounds(self, a, b):
        l = lcs_length(a, b)
        assert 0 <= l <= min(len(a), len(b))


class TestGeoProperties:
    @given(
        st.floats(-179.9, 179.9),
        st.floats(-84.9, 84.9),
    )
    @settings(max_examples=200, deadline=None)
    def test_mercator_roundtrip(self, lon, lat):
        x, y = mercator_xy(np.array([lon]), np.array([lat]))
        lo, la = inverse_mercator(x, y)
        assert abs(lo[0] - lon) < 1e-9
        assert abs(la[0] - lat) < 1e-9

    @given(
        st.floats(-1e6, 1e6),
        st.floats(-1e6, 1e6),
        st.floats(0, 100.0),
        st.floats(0, 2 * np.pi),
    )
    @settings(max_examples=200, deadline=None)
    def test_kring_covers_radius(self, x, y, r, ang):
        """Any point within 100 m is inside the k-ring-1 of the other's cell."""
        qx = x + r * np.cos(ang)
        qy = y + r * np.sin(ang)
        pc = cell_id(np.array([x]), np.array([y]))[0]
        kr = kring1_cells(cell_id(np.array([qx]), np.array([qy])))[0]
        assert pc in kr


class TestTagProperties:
    @given(st.text(max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_strip_tracking_idempotent_and_total(self, url):
        once = strip_tracking_params(url)
        assert strip_tracking_params(once) == once  # idempotent
        cw = clean_website(url)  # never raises
        assert cw is None or isinstance(cw, str)

    @given(st.text(alphabet="0123456789()+- .ext", max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_phone_total(self, s):
        out = normalize_phone(s)
        assert out is None or (out.startswith("+1 ") and len(out) == 15)

    @given(
        st.text(max_size=40),
        st.sampled_from(["pizza_restaurant", "bar", "unknown_cat", ""]),
        st.text(alphabet="0123456789 MainSt.", max_size=25),
    )
    @settings(max_examples=150, deadline=None)
    def test_normalize_candidate_total_and_clean(self, name, cat, freeform):
        cand = {
            "names": {"primary": name, "rules": None},
            "categories": {"primary": cat or None},
            "addresses": [
                {"freeform": freeform or None, "country": "US",
                 "region": "DC", "locality": "W", "postcode": "20001"}
            ],
            "phones": [], "websites": [], "socials": [],
            "brand": None, "sources": [],
        }
        tags = normalize_candidate(cand)  # never raises
        for k in ("addr:country", "addr:full", "source"):
            assert k not in tags
        assert all(isinstance(v, str) for v in tags.values())


class TestSpatialKernelProperties:
    """Hypothesis properties for the spatial pair kernel (driver-side —
    the encode + per-bucket fns composed exactly as the Dataset plan
    composes them, single bucket): the k-ring coincidence argument must
    find EVERY ≤radius pair for arbitrary geometry, and in-bucket top-k
    must match a brute-force (distance, id) ranking."""

    @given(
        st.lists(
            st.tuples(
                st.floats(min_value=-80.0, max_value=-70.0,
                          allow_nan=False, allow_infinity=False),
                st.floats(min_value=35.0, max_value=45.0,
                          allow_nan=False, allow_infinity=False),
            ),
            min_size=2, max_size=40,
        ),
        st.floats(min_value=1.0, max_value=255.0),
    )
    @settings(max_examples=60, deadline=None)
    def test_radius_pairs_complete(self, pts, radius):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from overmatch_ray.geo import mercator_xy
        from overmatch_ray.stages.spatial import _bucket_pairs_fn, _encode_side

        lon = np.array([p[0] for p in pts])
        lat = np.array([p[1] for p in pts])
        t = pa.table({
            "id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "lon": pa.array(lon), "lat": pa.array(lat),
        })
        probe = _encode_side("id", "lon", "lat", 1, 0, replicate=False)(t)
        cand = _encode_side("id", "lon", "lat", 1, 1, replicate=True)(t)
        g = pa.concat_tables([probe, cand])
        got = _bucket_pairs_fn(radius, None, False, None)(g).to_pandas()
        x, y = mercator_xy(lon, lat)
        D = np.sqrt((x[:, None] - x[None, :]) ** 2
                    + (y[:, None] - y[None, :]) ** 2)
        exp = {(i, j) for i in range(len(pts)) for j in range(len(pts))
               if D[i, j] <= radius}
        assert set(zip(got.id_a, got.id_b)) == exp

    @given(
        st.lists(
            st.tuples(
                st.floats(min_value=-80.0, max_value=-79.99,
                          allow_nan=False, allow_infinity=False),
                st.floats(min_value=35.0, max_value=35.01,
                          allow_nan=False, allow_infinity=False),
            ),
            min_size=3, max_size=30,
        ),
        st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=60, deadline=None)
    def test_knn_topk_matches_brute(self, pts, k):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from overmatch_ray.geo import mercator_xy
        from overmatch_ray.stages.spatial import _bucket_pairs_fn, _encode_side

        radius = 200.0
        lon = np.array([p[0] for p in pts])
        lat = np.array([p[1] for p in pts])
        t = pa.table({
            "id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "lon": pa.array(lon), "lat": pa.array(lat),
        })
        probe = _encode_side("id", "lon", "lat", 1, 0, replicate=False)(t)
        cand = _encode_side("id", "lon", "lat", 1, 1, replicate=True)(t)
        g = pa.concat_tables([probe, cand])
        got = _bucket_pairs_fn(radius, k, False, 1)(g).to_pandas()
        x, y = mercator_xy(lon, lat)
        D = np.sqrt((x[:, None] - x[None, :]) ** 2
                    + (y[:, None] - y[None, :]) ** 2)
        for i in range(len(pts)):
            cand_i = sorted((D[i, j], j) for j in range(len(pts))
                            if D[i, j] <= radius)[:k]
            mine = got[got.id_a == i].sort_values("knn_rank")
            assert list(mine.id_b) == [j for _, j in cand_i]


class TestMvtGeometryRoundtrips:
    """Property tests for the line/polygon MVT codecs: arbitrary integer
    coordinates (incl. negative and beyond-extent — the spec allows
    out-of-tile geometry) must roundtrip exactly through the zigzag
    cursor encoding."""

    @given(
        st.lists(
            st.lists(
                st.tuples(st.integers(-10**6, 10**6),
                          st.integers(-10**6, 10**6)),
                min_size=2, max_size=6,
            ),
            min_size=1, max_size=4,
        ),
        st.integers(-100, 100),
    )
    @settings(max_examples=60, deadline=None)
    def test_lines_roundtrip(self, parts, prop):
        import numpy as np

        from overmatch_ray.stages.mvt import decode_mvt_lines, encode_mvt_lines

        arrs = [np.array(p, np.int64) for p in parts]
        blob = encode_mvt_lines([{"p": prop}], [arrs])
        out = decode_mvt_lines(blob)
        assert out[0]["p"] == prop
        assert out[0]["__parts"] == [
            [list(pt) for pt in p] for p in parts
        ]

    @given(
        st.lists(
            st.tuples(st.integers(-10**5, 10**5), st.integers(-10**5, 10**5)),
            min_size=3, max_size=8, unique=True,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_polygons_roundtrip_with_orientation(self, pts):
        import numpy as np

        from overmatch_ray.stages.mvt import (
            _signed_area2,
            decode_mvt_polygons,
            encode_mvt_polygons,
        )
        from overmatch_ray.stages.spatial import convex_hull_xy

        x = np.array([p[0] for p in pts], np.float64)
        y = np.array([p[1] for p in pts], np.float64)
        h = convex_hull_xy(x, y)
        if h.size < 3:
            return
        ring = np.column_stack([x[h], y[h]]).astype(np.int64)
        if _signed_area2(ring) == 0:
            return
        blob = encode_mvt_polygons([{"k": 1}], [[ring]])
        out = decode_mvt_polygons(blob)
        got = np.array(out[0]["__rings"][0])
        assert _signed_area2(got) > 0  # exterior-ring spec rule
        assert {tuple(p) for p in got.tolist()} == {
            tuple(p) for p in ring.tolist()
        }
