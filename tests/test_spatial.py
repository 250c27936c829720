"""Spatial neighborhood operators (stages/spatial.py): bounded-radius
kNN join and grid DBSCAN, pinned against brute-force oracles, plus the
chained-semi-join dtype regression the DBSCAN plan exposed."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _toy_points(n=400, seed=42):
    """Three ~1 m-tight 100-point clusters + 100 scattered noise points."""
    rng = np.random.RandomState(seed)
    centers = [(-77.05, 38.85), (-77.048, 38.851), (-77.02, 38.87)]
    lons, lats = [], []
    for cx, cy in centers:
        lons.append(cx + rng.randn(100) * 1e-5)
        lats.append(cy + rng.randn(100) * 1e-5)
    lons.append(-77.1 + rng.rand(100) * 0.1)
    lats.append(38.8 + rng.rand(100) * 0.1)
    lon, lat = np.concatenate(lons), np.concatenate(lats)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(lon),
        "lat": pa.array(lat),
    }), lon, lat


def _dist_matrix(lon, lat):
    from overmatch_ray.geo import mercator_xy

    x, y = mercator_xy(lon, lat)
    return np.sqrt((x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2)


class TestSpatialKnnJoin:
    def test_vs_brute_force_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import spatial_knn_join

        t, lon, lat = _toy_points()
        D = _dist_matrix(lon, lat)
        n, k, radius = t.num_rows, 3, 50.0
        exp_rows = []
        for i in range(n):
            cand = sorted((D[i, j], j) for j in range(n) if D[i, j] <= radius)
            for r, (d, j) in enumerate(cand[:k], 1):
                exp_rows.append((i, j, round(d, 1), r))
        exp = (
            pd.DataFrame(exp_rows, columns=["id_a", "id_b", "dist_m", "knn_rank"])
            .sort_values(["id_a", "knn_rank"])
            .reset_index(drop=True)
        )
        prev = None
        for parts in (3, 11):
            ds = ray.data.from_arrow(t).repartition(parts)
            got = (
                spatial_knn_join(ds, ds, k=k, radius_m=radius)
                .to_pandas()
                .sort_values(["id_a", "knn_rank"])
                .reset_index(drop=True)
            )
            assert got.equals(exp)
            if prev is not None:
                assert got.equals(prev)
            prev = got

    def test_empty_right_side(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import spatial_knn_join

        t, _, _ = _toy_points(n=400)
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "lon": pa.array([], pa.float64()),
            "lat": pa.array([], pa.float64()),
        })
        out = spatial_knn_join(
            ray.data.from_arrow(t), ray.data.from_arrow(empty), k=3, radius_m=50.0
        )
        assert out.count() == 0

    def test_radius_over_cell_size_raises(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import spatial_knn_join

        t, _, _ = _toy_points()
        ds = ray.data.from_arrow(t)
        with pytest.raises(ValueError, match="cell edge"):
            spatial_knn_join(ds, ds, k=3, radius_m=500.0)


def _brute_dbscan(D, eps, min_pts):
    n = D.shape[0]
    neigh = [set(np.nonzero(D[i] <= eps)[0]) - {i} for i in range(n)]
    core = {i for i in range(n) if len(neigh[i]) + 1 >= min_pts}
    lbl = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in neigh[i]:
                if j in core and lbl[j] < lbl[i]:
                    lbl[i] = lbl[j]
                    changed = True
    out = {}
    for i in range(n):
        if i in core:
            out[i] = ("core", lbl[i])
        else:
            cn = sorted(lbl[j] for j in neigh[i] if j in core)
            out[i] = ("border", cn[0]) if cn else ("noise", -1)
    return out


class TestDbscan:
    def test_vs_brute_force_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import dbscan_points

        t, lon, lat = _toy_points()
        D = _dist_matrix(lon, lat)
        exp = _brute_dbscan(D, eps=30.0, min_pts=4)
        prev = None
        for parts in (5, 13):
            ds = ray.data.from_arrow(t).repartition(parts)
            got = dbscan_points(ds, 30.0, 4).to_pandas().set_index("id").sort_index()
            assert len(got) == t.num_rows
            for i, (role, cl) in exp.items():
                assert got.loc[i, "role"] == role, i
                assert got.loc[i, "cluster_id"] == cl, i
            if prev is not None:
                assert got.equals(prev)
            prev = got

    def test_borders_exist_with_loose_min_pts(self, ray_session):
        """A 5-point 'plus' around a hub: hub is core (4 neighbors), arms
        see only the hub → border, distant point → noise."""
        import ray.data

        from overmatch_ray.stages.spatial import dbscan_points

        # 20 m arms around a hub; eps=25 connects hub<->arms but not
        # arm<->arm (28.3 m diagonal, 40 m across). In EPSG:3857 planar
        # meters: x = R·radians(lon) (no cos shrink); y ≈ R·radians(lat)/cos(lat)
        lon0, lat0 = -77.05, 38.85
        deg_m = 6378137.0 * np.pi / 180  # planar meters per degree
        dlon = 20 / deg_m
        dlat = 20 * np.cos(np.radians(lat0)) / deg_m
        lon = np.array([lon0, lon0 + dlon, lon0 - dlon, lon0, lon0, lon0 + 0.01])
        lat = np.array([lat0, lat0, lat0, lat0 + dlat, lat0 - dlat, lat0])
        t = pa.table({
            "id": pa.array(np.arange(6, dtype=np.int64)),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        })
        D = _dist_matrix(lon, lat)
        exp = _brute_dbscan(D, eps=25.0, min_pts=4)
        roles = {r for r, _ in exp.values()}
        assert roles == {"core", "border", "noise"}  # scenario is non-degenerate
        got = (
            dbscan_points(ray.data.from_arrow(t), 25.0, 4)
            .to_pandas()
            .set_index("id")
            .sort_index()
        )
        for i, (role, cl) in exp.items():
            assert got.loc[i, "role"] == role
            assert got.loc[i, "cluster_id"] == cl

    def test_all_noise_short_circuit(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import dbscan_points

        rng = np.random.RandomState(0)
        t = pa.table({
            "id": pa.array(np.arange(50, dtype=np.int64)),
            "lon": pa.array(-77.0 + rng.rand(50) * 1.0),
            "lat": pa.array(38.0 + rng.rand(50) * 1.0),
        })
        got = dbscan_points(ray.data.from_arrow(t), 25.0, 4).to_pandas()
        assert len(got) == 50
        assert (got.role == "noise").all()
        assert (got.cluster_id == -1).all()

    def test_min_pts_guard(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import dbscan_points

        t, _, _ = _toy_points(n=400)
        with pytest.raises(ValueError, match="min_pts"):
            dbscan_points(ray.data.from_arrow(t), 25.0, 1)


class TestChainedSemiJoinTypes:
    """Regression: semi_join_shuffled output must keep the left schema's
    integer dtypes. Ray's groupby shuffle can null-pad-upcast int payload
    columns to float64; a CHAINED semi join then hashes the float column
    via the string fallback while the right keys hash as ints — different
    buckets, rows silently dropped (DBSCAN's core-core edge step)."""

    def test_chain_preserves_types_and_rows(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import semi_join_shuffled
        from overmatch_ray.stages.spatial import radius_pairs

        t, lon, lat = _toy_points()
        D = _dist_matrix(lon, lat)
        ds = ray.data.from_arrow(t).repartition(5)
        pairs = radius_pairs(ds, ds, 30.0, exclude_self=True, emit_dist=False)
        keys = ray.data.from_arrow(
            pa.table({"id": pa.array(np.arange(0, 300, dtype=np.int64))})
        )
        s1 = semi_join_shuffled(pairs, keys, "id_a", "id").materialize()
        assert [str(f) for f in s1.schema().types] == ["int64", "int64"]
        s2 = semi_join_shuffled(s1, keys, "id_b", "id").materialize()
        exp = {
            (i, j)
            for i in range(300)
            for j in range(300)
            if i != j and D[i, j] <= 30.0
        }
        got = set(zip(*(s2.to_pandas()[c] for c in ("id_a", "id_b"))))
        assert got == exp


class TestBboxIntersectionJoin:
    def _toy_boxes(self, n, seed, span=2000.0, wmax=60.0):
        rng = np.random.RandomState(seed)
        cx = rng.rand(n) * span
        cy = rng.rand(n) * span
        hw = 1 + rng.rand(n) * wmax
        hh = 1 + rng.rand(n) * wmax
        return pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "xmin": pa.array(cx - hw),
            "ymin": pa.array(cy - hh),
            "xmax": pa.array(cx + hw),
            "ymax": pa.array(cy + hh),
        })

    def _brute(self, a, b):
        ad, bd = a.to_pandas(), b.to_pandas()
        out = set()
        for _, ra in ad.iterrows():
            for _, rb in bd.iterrows():
                if (ra.xmin <= rb.xmax and rb.xmin <= ra.xmax
                        and ra.ymin <= rb.ymax and rb.ymin <= ra.ymax):
                    out.add((int(ra.id), int(rb.id)))
        return out

    def test_vs_brute_force_each_pair_once(self, ray_session):
        """cell_size smaller than box extents → every box covers MANY
        cells; the canonical-cell rule must still emit each pair exactly
        once (counted, not set-compared)."""
        import ray.data

        from overmatch_ray.stages.spatial import bbox_intersection_join

        a, b = self._toy_boxes(120, 1), self._toy_boxes(150, 2)
        exp = self._brute(a, b)
        for cs in (40.0, 256.0):
            got = bbox_intersection_join(
                ray.data.from_arrow(a).repartition(4),
                ray.data.from_arrow(b).repartition(3),
                cell_size=cs,
            ).to_pandas()
            assert len(got) == len(exp), cs  # once per pair, no dups
            assert set(zip(got.id_a, got.id_b)) == exp
            ov = got.set_index(["id_a", "id_b"]).overlap_m2
            ad = a.to_pandas().set_index("id")
            bd = b.to_pandas().set_index("id")
            for (i, j), v in ov.items():
                ra, rb = ad.loc[i], bd.loc[j]
                expect = (min(ra.xmax, rb.xmax) - max(ra.xmin, rb.xmin)) * (
                    min(ra.ymax, rb.ymax) - max(ra.ymin, rb.ymin)
                )
                assert v == pytest.approx(expect)

    def test_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import bbox_intersection_join

        a, b = self._toy_boxes(100, 3), self._toy_boxes(100, 4)
        prev = None
        for parts in (2, 9):
            got = (
                bbox_intersection_join(
                    ray.data.from_arrow(a).repartition(parts),
                    ray.data.from_arrow(b).repartition(parts),
                )
                .to_pandas()
                .sort_values(["id_a", "id_b"])
                .reset_index(drop=True)
            )
            if prev is not None:
                assert got.equals(prev)
            prev = got

    def test_giant_box_guard(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import bbox_intersection_join

        big = pa.table({
            "id": pa.array([0], pa.int64()),
            "xmin": pa.array([0.0]), "ymin": pa.array([0.0]),
            "xmax": pa.array([1e9]), "ymax": pa.array([1e9]),
        })
        ds = ray.data.from_arrow(big)
        with pytest.raises(Exception, match="covers"):
            bbox_intersection_join(ds, ds, cell_size=256.0).materialize()


class TestTrackLengths:
    def test_vs_pandas_and_partition_invariance(self, ray_session):
        """q_track_lengths' engine plan vs a straight pandas groupby of the
        same decimeter-leg definition."""
        import ray.data

        from overmatch_ray.pipelines.corpus_queries import q_track_lengths

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        from overmatch_ray.geo import mercator_xy

        ev = pq.read_table(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
        ).to_pandas()
        lon = -77.05 + (ev.event_id % 1000) * 1e-4
        lat = 38.85 + ((ev.event_id // 1000) % 1000) * 1e-4
        x, y = mercator_xy(lon.to_numpy(), lat.to_numpy())
        ev = ev.assign(x=x, y=y).sort_values(["user_id", "ts", "event_id"])
        exp = {}
        for uid, g in ev.groupby("user_id"):
            d = np.sqrt(np.diff(g.x.to_numpy()) ** 2 + np.diff(g.y.to_numpy()) ** 2)
            exp[uid] = (len(g), int(np.floor(d * 10).sum()) / 10.0)
        got = q_track_lengths(sf).to_pandas().set_index("user_id").sort_index()
        assert len(got) == len(exp)
        for uid, (n, m) in exp.items():
            assert got.loc[uid, "n_pings"] == n
            assert got.loc[uid, "track_m"] == m


class TestKernelSmoothCounts:
    def test_tiny_grid_manual(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import kernel_smooth_counts

        counts = pa.table({
            "cell_x": pa.array([0, 1], pa.int64()),
            "cell_y": pa.array([0, 0], pa.int64()),
            "n": pa.array([1, 10], pa.int64()),
        })
        got = (
            kernel_smooth_counts(ray.data.from_arrow(counts))
            .to_pandas()
            .set_index(["cell_x", "cell_y"])["heat"]
            .to_dict()
        )
        # kernel 1-2-1/2-4-2/1-2-1: heat(0,0)=4*1+2*10=24, heat(1,0)=2*1+4*10=42,
        # heat(-1,0)=2, heat(2,0)=20, corners (−1,±1)=1 … (2,±1)=10
        assert got[(0, 0)] == 24
        assert got[(1, 0)] == 42
        assert got[(-1, 0)] == 2
        assert got[(2, 0)] == 20
        assert got[(-1, 1)] == 1 and got[(2, -1)] == 10
        assert got[(0, 1)] == 2 * 1 + 1 * 10  # (0,0) w=2 + (1,0) diag w=1
        assert sum(got.values()) == 16 * 11  # kernel mass conservation

    def test_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import kernel_smooth_counts

        rng = np.random.RandomState(7)
        t = pa.table({
            "cell_x": pa.array(rng.randint(0, 30, 500).astype(np.int64)),
            "cell_y": pa.array(rng.randint(0, 30, 500).astype(np.int64)),
            "n": pa.array(rng.randint(1, 9, 500).astype(np.int64)),
        })
        prev = None
        for parts in (2, 11):
            got = (
                kernel_smooth_counts(ray.data.from_arrow(t).repartition(parts))
                .to_pandas()
                .sort_values(["cell_x", "cell_y"])
                .reset_index(drop=True)
            )
            if prev is not None:
                assert got.equals(prev)
            prev = got
        assert got.heat.sum() == 16 * t["n"].to_numpy().sum()


class TestTrianglePointJoin:
    def test_vs_brute_force_multi_cell(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import triangle_point_join

        rng = np.random.RandomState(5)
        nt, npts = 80, 400
        ax = rng.rand(nt) * 1500
        ay = rng.rand(nt) * 1500
        tris = pa.table({
            "id": pa.array(np.arange(nt, dtype=np.int64)),
            "ax": pa.array(ax), "ay": pa.array(ay),
            "bx": pa.array(ax + rng.randn(nt) * 120),
            "by": pa.array(ay + rng.randn(nt) * 120),
            "cx": pa.array(ax + rng.randn(nt) * 120),
            "cy": pa.array(ay + rng.randn(nt) * 120),
        })
        pts = pa.table({
            "id": pa.array(np.arange(npts, dtype=np.int64)),
            "x": pa.array(rng.rand(npts) * 1500),
            "y": pa.array(rng.rand(npts) * 1500),
        })
        td, pd_ = tris.to_pandas(), pts.to_pandas()
        exp = set()
        for _, t in td.iterrows():
            for _, p in pd_.iterrows():
                d1 = (t.bx - t.ax) * (p.y - t.ay) - (t.by - t.ay) * (p.x - t.ax)
                d2 = (t.cx - t.bx) * (p.y - t.by) - (t.cy - t.by) * (p.x - t.bx)
                d3 = (t.ax - t.cx) * (p.y - t.cy) - (t.ay - t.cy) * (p.x - t.cx)
                a2 = (t.bx - t.ax) * (t.cy - t.ay) - (t.by - t.ay) * (t.cx - t.ax)
                if a2 != 0 and ((d1 >= 0 and d2 >= 0 and d3 >= 0)
                                or (d1 <= 0 and d2 <= 0 and d3 <= 0)):
                    exp.add((int(t.id), int(p.id)))
        assert exp  # scenario non-degenerate
        prev = None
        for cs, parts in ((64.0, 3), (256.0, 7)):
            got = triangle_point_join(
                ray.data.from_arrow(tris).repartition(parts),
                ray.data.from_arrow(pts).repartition(parts),
                cell_size=cs,
            ).to_pandas()
            pairs = set(zip(got.tri_id, got.pt_id))
            assert len(got) == len(pairs)  # no duplicate emissions
            assert pairs == exp
            if prev is not None:
                assert pairs == prev
            prev = pairs


class TestSnapPointsToSegments:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import snap_points_to_segments

        rng = np.random.RandomState(9)
        ns, npts, radius = 60, 300, 50.0
        ax = rng.rand(ns) * 1200
        ay = rng.rand(ns) * 1200
        segs = pa.table({
            "id": pa.array(np.arange(ns, dtype=np.int64)),
            "ax": pa.array(ax), "ay": pa.array(ay),
            "bx": pa.array(ax + rng.randn(ns) * 150),
            "by": pa.array(ay + rng.randn(ns) * 150),
        })
        pts = pa.table({
            "id": pa.array(np.arange(npts, dtype=np.int64)),
            "x": pa.array(rng.rand(npts) * 1200),
            "y": pa.array(rng.rand(npts) * 1200),
        })

        sd, pd_ = segs.to_pandas(), pts.to_pandas()
        exp = {}
        for _, p in pd_.iterrows():
            best = None
            for _, s in sd.iterrows():
                den = (s.bx - s.ax) ** 2 + (s.by - s.ay) ** 2
                t = (min(max(((p.x - s.ax) * (s.bx - s.ax)
                              + (p.y - s.ay) * (s.by - s.ay)) / den, 0.0), 1.0)
                     if den > 0 else 0.0)
                d = np.hypot(p.x - (s.ax + t * (s.bx - s.ax)),
                             p.y - (s.ay + t * (s.by - s.ay)))
                if d <= radius:
                    key = (np.floor(d * 10) / 10.0, int(s.id))
                    if best is None or key < best[:2]:
                        best = (*key, t)
            if best is not None:
                exp[int(p.id)] = best
        assert 0 < len(exp) < npts  # some matched, some out of range
        prev = None
        for parts in (3, 8):
            got = (
                snap_points_to_segments(
                    ray.data.from_arrow(pts).repartition(parts),
                    ray.data.from_arrow(segs).repartition(parts),
                    radius_m=radius,
                )
                .to_pandas()
                .set_index("pt_id")
                .sort_index()
            )
            assert set(got.index) == set(exp)
            for pid, (dm, sid, t) in exp.items():
                assert got.loc[pid, "seg_id"] == sid, pid
                assert got.loc[pid, "dist_m"] == dm
                assert got.loc[pid, "t"] == pytest.approx(t, abs=1e-12)
            if prev is not None:
                assert got.equals(prev)
            prev = got

    def test_radius_guard(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import snap_points_to_segments

        pts = ray.data.from_arrow(pa.table({
            "id": pa.array([0], pa.int64()),
            "x": pa.array([0.0]), "y": pa.array([0.0]),
        }))
        segs = ray.data.from_arrow(pa.table({
            "id": pa.array([0], pa.int64()),
            "ax": pa.array([0.0]), "ay": pa.array([0.0]),
            "bx": pa.array([1.0]), "by": pa.array([1.0]),
        }))
        with pytest.raises(ValueError, match="cell edge"):
            snap_points_to_segments(pts, segs, radius_m=500.0)


class TestDouglasPeucker:
    def test_endpoints_and_spike(self):
        from overmatch_ray.stages.spatial import douglas_peucker_mask

        x = np.array([0.0, 1, 2, 3, 4])
        y = np.array([0.0, 0.1, 3, 0.1, 0])
        assert list(douglas_peucker_mask(x, y, 1.0)) == [
            True, False, True, False, True]
        assert list(douglas_peucker_mask(x, y, 5.0)) == [
            True, False, False, False, True]
        # degenerate: 0, 1, 2 points
        assert list(douglas_peucker_mask(x[:0], y[:0], 1.0)) == []
        assert list(douglas_peucker_mask(x[:1], y[:1], 1.0)) == [True]
        assert list(douglas_peucker_mask(x[:2], y[:2], 1.0)) == [True, True]

    def test_error_bound_guarantee(self):
        # every DROPPED point is within tol of the kept edge spanning it
        from overmatch_ray.stages.spatial import douglas_peucker_mask

        rng = np.random.default_rng(42)
        for tol in (5.0, 50.0):
            x = np.cumsum(rng.uniform(0, 30, 300))
            y = np.cumsum(rng.normal(0, 20, 300))
            keep = douglas_peucker_mask(x, y, tol)
            kept_idx = np.flatnonzero(keep)
            assert keep[0] and keep[-1]
            for a, b in zip(kept_idx[:-1], kept_idx[1:]):
                if b - a < 2:
                    continue
                px, py = x[a + 1 : b], y[a + 1 : b]
                dx, dy = x[b] - x[a], y[b] - y[a]
                ll = dx * dx + dy * dy
                t = np.clip(((px - x[a]) * dx + (py - y[a]) * dy) / ll, 0, 1)
                d = np.hypot(px - (x[a] + t * dx), py - (y[a] + t * dy))
                assert (d <= tol).all()

    def test_collinear_collapses_duplicates_survive_shape(self):
        from overmatch_ray.stages.spatial import douglas_peucker_mask

        x = np.arange(100.0)
        y = np.zeros(100)
        assert douglas_peucker_mask(x, y, 0.5).sum() == 2
        # identical points (zero-length chord branch)
        x2 = np.zeros(5)
        y2 = np.zeros(5)
        assert douglas_peucker_mask(x2, y2, 0.5).sum() == 2

    def test_simplify_tracks_stage_partition_invariance(self, ray_session):
        import pandas as pd
        import ray

        from overmatch_ray.stages.spatial import (
            douglas_peucker_mask, simplify_tracks)

        rng = np.random.default_rng(3)
        n = 600
        df = pd.DataFrame(
            {
                "user_id": np.repeat(np.arange(12), 50),
                "t": np.tile(np.arange(50), 12),
                "x": np.cumsum(rng.uniform(0, 40, n)),
                "y": np.cumsum(rng.normal(0, 25, n)),
            }
        )
        want_frames = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values("t")
            keep = douglas_peucker_mask(
                g["x"].to_numpy(), g["y"].to_numpy(), 30.0)
            w = g[keep].copy()
            w["seq"] = np.flatnonzero(keep)
            want_frames.append(w[["user_id", "seq", "x", "y"]])
        want = pd.concat(want_frames).reset_index(drop=True)

        for nblocks in (1, 7):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = (
                simplify_tracks(
                    ds, 30.0, key_col="user_id", order_cols=["t"],
                    num_buckets=8)
                .to_pandas()
                .sort_values(["user_id", "seq"], kind="mergesort")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got, want.sort_values(
                    ["user_id", "seq"], kind="mergesort"
                ).reset_index(drop=True),
                check_dtype=False,
            )

    def test_query_runs_and_is_consistent(self, ray_session):
        from overmatch_ray.pipelines.rows_only import q_simplified_tracks

        df = q_simplified_tracks("/root/testdata/sf0.001").to_pandas()
        assert len(df) == df["user_id"].nunique() > 0
        assert (df["n_kept"] >= 2).all()
        assert (df["n_kept"] <= df["n_points"]).all()
        # sf0.001 tracks are exactly collinear (constant lat) → 2 kept
        assert (df["n_kept"] == 2).all()


class TestConvexHull:
    def test_hull_properties_random(self):
        from overmatch_ray.stages.spatial import convex_hull_xy

        rng = np.random.default_rng(11)
        for n in (3, 10, 200):
            x = rng.uniform(-100, 100, n)
            y = rng.uniform(-100, 100, n)
            hi = convex_hull_xy(x, y)
            hx, hy = x[hi], y[hi]
            m = len(hi)
            assert m >= 3
            # strictly convex CCW: every consecutive triple turns left
            for k in range(m):
                ax, ay = hx[k], hy[k]
                bx, by = hx[(k + 1) % m], hy[(k + 1) % m]
                cx, cy = hx[(k + 2) % m], hy[(k + 2) % m]
                assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0
            # all points inside or on the hull (left of every edge)
            for k in range(m):
                ax, ay = hx[k], hy[k]
                bx, by = hx[(k + 1) % m], hy[(k + 1) % m]
                cross = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
                assert (cross >= -1e-9).all()
            # starts at lexicographic minimum
            lex = np.lexsort((y, x))[0]
            assert hi[0] == lex

    def test_hull_query_matches_direct(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from overmatch_ray.geo import mercator_xy
        from overmatch_ray.pipelines.corpus_queries import _formula_coords
        from overmatch_ray.pipelines.rows_only import q_track_hulls
        from overmatch_ray.stages.spatial import convex_hull_xy

        sf = "/root/testdata/sf0.001"
        got = q_track_hulls(sf).to_pandas().reset_index(drop=True)

        t = pq.read_table(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        ).to_pandas()
        lon, lat = _formula_coords(t["event_id"].to_numpy())
        t["x"], t["y"] = mercator_xy(lon, lat)
        frames = []
        for uid, g in t.groupby("user_id"):
            g = g.sort_values(
                ["x", "y", "event_id"], kind="mergesort"
            ).reset_index(drop=True)
            hi = convex_hull_xy(g["x"].to_numpy(), g["y"].to_numpy())
            hx, hy = g["x"].to_numpy()[hi], g["y"].to_numpy()[hi]
            area2 = (
                float(np.dot(hx, np.roll(hy, -1)) - np.dot(np.roll(hx, -1), hy))
                if len(hi) >= 3 else 0.0
            )
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": uid,
                        "seq": np.arange(len(hi), dtype=np.int64),
                        "event_id": g["event_id"].to_numpy()[hi],
                        "x": hx,
                        "y": hy,
                        "area2": area2,
                    }
                )
            )
        want = pd.concat(frames).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestTrackHausdorff:
    @staticmethod
    def _tracks(seed=7, n_tracks=6, pts_per=25):
        """Tracks jittered around shared centers so some pairs are tight
        (Hausdorff small), others partially diverge (directed asymmetry)."""
        rng = np.random.RandomState(seed)
        rows = []
        for t in range(n_tracks):
            cx = -77.05 + (t % 2) * 0.01  # two bands
            cy = 38.85
            lon = cx + rng.randn(pts_per) * 3e-6
            lat = cy + rng.randn(pts_per) * 3e-6
            if t == 4:  # one outlier point breaks coverage one way
                lon[0] += 0.002
            rows.append((t, lon, lat))
        key = np.concatenate(
            [np.full(pts_per, t, np.int64) for t, _, _ in rows])
        lon = np.concatenate([l for _, l, _ in rows])
        lat = np.concatenate([l for _, _, l in rows])
        pid = np.arange(key.size, dtype=np.int64)
        return pa.table({
            "id": pa.array(pid), "key": pa.array(key),
            "lon": pa.array(lon), "lat": pa.array(lat),
        }), key, lon, lat

    @staticmethod
    def _brute(key, lon, lat, D):
        D2 = _dist_matrix(lon, lat)
        out = {}
        ks = np.unique(key)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                da = D2[np.ix_(key == a, key == b)]
                h_ab = da.min(axis=1)
                h_ba = da.min(axis=0)
                if (h_ab <= D).all() and (h_ba <= D).all():
                    out[(int(a), int(b))] = round(
                        float(max(h_ab.max(), h_ba.max())), 1)
        return out

    def test_matches_bruteforce_and_partition_invariant(self, ray_session):
        import ray

        from overmatch_ray.stages.spatial import track_hausdorff_pairs

        t, key, lon, lat = self._tracks()
        want = self._brute(key, lon, lat, 100.0)
        assert want, "fixture must produce at least one passing pair"
        for nblocks in (1, 7):
            ds = ray.data.from_arrow(t).repartition(nblocks)
            got = {
                (r["key_a"], r["key_b"]): r["hausdorff_m"]
                for r in track_hausdorff_pairs(ds, 100.0).take_all()
            }
            assert got == want, nblocks

    def test_directed_asymmetry_vetoes_pair(self, ray_session):
        """Track 4 has one far outlier: every pair (4, other) must fail
        even though the other direction is fully covered."""
        import ray

        from overmatch_ray.stages.spatial import track_hausdorff_pairs

        t, key, lon, lat = self._tracks()
        want = self._brute(key, lon, lat, 100.0)
        assert not any(4 in p for p in want)
        got = {
            (r["key_a"], r["key_b"])
            for r in track_hausdorff_pairs(
                ray.data.from_arrow(t), 100.0
            ).take_all()
        }
        assert not any(4 in p for p in got)

    def test_empty_input_typed(self, ray_session):
        import ray

        from overmatch_ray.stages.spatial import track_hausdorff_pairs

        t = pa.table({
            "id": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "lon": pa.array([], pa.float64()),
            "lat": pa.array([], pa.float64()),
        })
        out = track_hausdorff_pairs(ray.data.from_arrow(t), 100.0)
        assert out.count() == 0


class TestZonalStats:
    """Raster→vector zonal statistics (stages.spatial.zonal_stats)."""

    # unit square-ish CCW quads in grid units
    Z1 = [(0.2, 0.2), (3.7, 0.3), (3.6, 3.7), (0.3, 3.6)]
    Z2 = [(2.2, 2.2), (5.7, 2.3), (5.6, 5.7), (2.3, 5.6)]  # overlaps Z1
    Z3 = [(90.2, 90.2), (93.7, 90.3), (93.6, 93.7), (90.3, 93.6)]  # empty

    def _raster(self):
        # cells (0..5, 0..5) with heat = 10*x + y at centers (x+.5, y+.5)
        xs, ys = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
        return pa.table({
            "cell_x": pa.array(xs.ravel().astype(np.int64)),
            "cell_y": pa.array(ys.ravel().astype(np.int64)),
            "heat": pa.array((10 * xs + ys).ravel().astype(np.int64)),
        })

    def test_counts_sums_and_overlap_double_count(self, ray_session):
        import ray

        from overmatch_ray.stages.spatial import zonal_stats

        out = {
            r["zone_id"]: r
            for r in zonal_stats(
                ray.data.from_arrow(self._raster()),
                [(1, self.Z1), (2, self.Z2), (3, self.Z3)],
            ).take_all()
        }
        # Z1 contains centers 0.5..3.5 in both axes → cells 0..3 × 0..3
        assert out[1]["n_cells"] == 16
        assert out[1]["total_heat"] == sum(10 * x + y for x in range(4) for y in range(4))
        assert out[1]["max_heat"] == 33
        # Z2 contains cells 2..5 × 2..5 (cells 2..3 × 2..3 counted in BOTH)
        assert out[2]["n_cells"] == 16
        assert out[2]["max_heat"] == 55
        # empty zone is simply absent
        assert 3 not in out

    def test_empty_zone_list(self, ray_session):
        """zones=[] yields an empty result, not a per-task concat crash."""
        import ray

        from overmatch_ray.stages.spatial import zonal_stats

        out = zonal_stats(ray.data.from_arrow(self._raster()), [])
        assert out.count() == 0

    def test_partition_invariance(self, ray_session):
        import ray

        from overmatch_ray.stages.spatial import zonal_stats

        zones = [(1, self.Z1), (2, self.Z2)]
        a = sorted(
            map(tuple, (
                (r["zone_id"], r["n_cells"], r["total_heat"], r["max_heat"])
                for r in zonal_stats(
                    ray.data.from_arrow(self._raster()), zones
                ).take_all()
            ))
        )
        b = sorted(
            map(tuple, (
                (r["zone_id"], r["n_cells"], r["total_heat"], r["max_heat"])
                for r in zonal_stats(
                    ray.data.from_arrow(self._raster()).repartition(7), zones
                ).take_all()
            ))
        )
        assert a == b


class TestArealInterpolate:
    def _boxes(self, rng, n, id0=0):
        x = rng.integers(0, 40, n)
        y = rng.integers(0, 40, n)
        hw = rng.integers(1, 6, n)
        hh = rng.integers(1, 6, n)
        return pa.table({
            "id": pa.array(np.arange(id0, id0 + n, dtype=np.int64)),
            "xmin": pa.array((x - hw).astype(np.float64)),
            "ymin": pa.array((y - hh).astype(np.float64)),
            "xmax": pa.array((x + hw).astype(np.float64)),
            "ymax": pa.array((y + hh).astype(np.float64)),
        })

    def test_matches_bruteforce_and_partition_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import areal_interpolate

        rng = np.random.default_rng(5)
        src = self._boxes(rng, 120).append_column(
            "val", pa.array(rng.integers(1, 50, 120).astype(np.int64))
        )
        dst = self._boxes(rng, 80, id0=1000)

        # brute-force reference with the SAME floored-term rule
        s = {c: src[c].to_numpy() for c in src.column_names}
        d = {c: dst[c].to_numpy() for c in dst.column_names}
        want = {}
        for j in range(80):
            tot = 0
            for i in range(120):
                ox = min(s["xmax"][i], d["xmax"][j]) - max(s["xmin"][i], d["xmin"][j])
                oy = min(s["ymax"][i], d["ymax"][j]) - max(s["ymin"][i], d["ymin"][j])
                if ox >= 0 and oy >= 0:
                    area = (s["xmax"][i] - s["xmin"][i]) * (s["ymax"][i] - s["ymin"][i])
                    tot += int(np.floor(1e6 * float(s["val"][i]) * (ox * oy) / area))
            if tot or any(
                min(s["xmax"][i], d["xmax"][j]) >= max(s["xmin"][i], d["xmin"][j])
                and min(s["ymax"][i], d["ymax"][j]) >= max(s["ymin"][i], d["ymin"][j])
                for i in range(120)
            ):
                want[1000 + j] = tot

        def got(nblocks):
            return {
                r["id"]: r["interp_scaled"]
                for r in areal_interpolate(
                    ray.data.from_arrow(src).repartition(nblocks),
                    ray.data.from_arrow(dst).repartition(nblocks),
                    "val", cell_size=16.0,
                ).take_all()
            }

        a = got(2)
        assert a == want
        assert got(7) == a, "partitioning must not matter"


class TestIdwInterpolate:
    def test_matches_bruteforce_and_partition_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import idw_interpolate

        rng = np.random.default_rng(9)
        ns, nd = 150, 90
        # integer lattice keeps d^2 exact; include coincident points
        sx = rng.integers(0, 30, ns) * 7.0
        sy = rng.integers(0, 30, ns) * 9.0
        v = rng.integers(1, 40, ns)
        dx = rng.integers(0, 30, nd) * 7.0
        dy = rng.integers(0, 30, nd) * 9.0
        src = pa.table({
            "id": pa.array(np.arange(ns, dtype=np.int64)),
            "x": pa.array(sx), "y": pa.array(sy),
            "val": pa.array(v.astype(np.int64)),
        })
        dst = pa.table({
            "id": pa.array(np.arange(1000, 1000 + nd, dtype=np.int64)),
            "x": pa.array(dx), "y": pa.array(dy),
        })

        R2 = 50.0 * 50.0
        want = {}
        for j in range(nd):
            d2 = (sx - dx[j]) ** 2 + (sy - dy[j]) ** 2
            m = (d2 > 0.0) & (d2 <= R2)
            if m.any():
                t = np.floor(1e6 * v[m].astype(np.float64) / d2[m]).astype(np.int64)
                want[1000 + j] = (int(t.sum()), int(m.sum()))

        def got(nblocks):
            return {
                r["id"]: (r["idw_scaled"], r["n_src"])
                for r in idw_interpolate(
                    ray.data.from_arrow(src).repartition(nblocks),
                    ray.data.from_arrow(dst).repartition(nblocks),
                    "val", radius_m=50.0,
                ).take_all()
            }

        a = got(2)
        assert a == want
        assert got(7) == a, "partitioning must not matter"

    def test_radius_beyond_kring_rejected(self, ray_session):
        from overmatch_ray.stages.spatial import idw_interpolate

        with pytest.raises(ValueError, match="k-ring"):
            idw_interpolate(None, None, "v", radius_m=1e9)


class TestResampleTracks:
    def test_matches_reference_and_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import resample_tracks

        rng = np.random.default_rng(13)
        rows = []
        eid = 0
        for uid in range(6):
            n = int(rng.integers(2, 30))
            ts = np.sort(rng.choice(np.arange(0, 10_000, 7), n, replace=False))
            for t in ts:
                rows.append((uid, int(t) * 1000, eid,
                             float(rng.integers(0, 50) * 3),
                             float(rng.integers(0, 50) * 5)))
                eid += 1
        # one user with a DUPLICATE timestamp (tiebreak must decide)
        rows.append((99, 0, eid, 0.0, 0.0)); eid += 1
        rows.append((99, 5000, eid, 10.0, 10.0)); eid += 1
        rows.append((99, 5000, eid, 99.0, 99.0)); eid += 1
        rows.append((99, 9000, eid, 20.0, 20.0)); eid += 1
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "tu": pa.array([r[1] for r in rows], pa.int64()),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "x": pa.array([r[3] for r in rows]),
            "y": pa.array([r[4] for r in rows]),
        })
        STEP = 1000

        # single-process reference (same bracketing rule)
        import collections
        byu = collections.defaultdict(list)
        for r in rows:
            byu[r[0]].append(r)
        want = {}
        for uid, rs in byu.items():
            rs = sorted(rs, key=lambda r: (r[1], r[2]))
            tu = np.array([r[1] for r in rs], dtype=np.int64)
            x = np.array([r[3] for r in rs])
            y = np.array([r[4] for r in rs])
            start = ((tu[0] + STEP - 1) // STEP) * STEP
            for g in range(start, tu[-1], STEP):
                i = int(np.searchsorted(tu, g, side="right")) - 1
                frac = float(g - tu[i]) / float(tu[i + 1] - tu[i])
                want[(uid, g)] = (x[i] + (x[i + 1] - x[i]) * frac,
                                  y[i] + (y[i + 1] - y[i]) * frac)

        def got(nblocks):
            return {
                (r["user_id"], r["t"]): (r["x_i"], r["y_i"])
                for r in resample_tracks(
                    ray.data.from_arrow(t).repartition(nblocks),
                    "user_id", "tu", "x", "y",
                    step_us=STEP, tiebreak_col="event_id",
                ).take_all()
            }

        a = got(2)
        assert a == want
        assert got(9) == a, "partitioning must not matter"
        # exact grid hit at the duplicate ts takes the LAST ping there
        # (searchsorted-right == the SQL half-open span rule)
        assert a[(99, 5000)] == (99.0, 99.0)


class TestMutualNNAssign:
    @staticmethod
    def _reference(lon_a, lat_a, ids_a, lon_b, lat_b, ids_b,
                   radius, rounds):
        """Brute-force iterated mutual-NN: O(n·m) distance matrix, per-round
        per-side argmin with (d, other-id) tie-break, peel, repeat."""
        from overmatch_ray.geo import mercator_xy

        xa, ya = mercator_xy(lon_a, lat_a)
        xb, yb = mercator_xy(lon_b, lat_b)
        d = np.sqrt((xa[:, None] - xb[None, :]) ** 2
                    + (ya[:, None] - yb[None, :]) ** 2)
        pairs = [
            (ids_a[i], ids_b[j], d[i, j])
            for i in range(len(ids_a)) for j in range(len(ids_b))
            if d[i, j] <= radius
        ]
        out = []
        for rnd in range(1, rounds + 1):
            if not pairs:
                break
            best_a = {}
            best_b = {}
            for a, b, dd in pairs:
                if a not in best_a or (dd, b) < (best_a[a][1], best_a[a][0]):
                    best_a[a] = (b, dd)
                if b not in best_b or (dd, a) < (best_b[b][1], best_b[b][0]):
                    best_b[b] = (a, dd)
            matched = [
                (a, b, dd) for a, b, dd in pairs
                if best_a[a][0] == b and best_b[b][0] == a
            ]
            matched = list({(a, b): (a, b, dd)
                            for a, b, dd in matched}.values())
            if not matched:
                break
            out.extend((a, b, round(dd, 1), rnd) for a, b, dd in matched)
            ma = {a for a, _b, _d in matched}
            mb = {b for _a, b, _d in matched}
            pairs = [(a, b, dd) for a, b, dd in pairs
                     if a not in ma and b not in mb]
        return sorted(out)

    def test_vs_brute_force_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import mutual_nn_assign

        rng = np.random.RandomState(7)
        na, nb_ = 120, 150
        lon_a = -77.05 + rng.rand(na) * 4e-3
        lat_a = 38.85 + rng.rand(na) * 4e-3
        lon_b = -77.05 + rng.rand(nb_) * 4e-3
        lat_b = 38.85 + rng.rand(nb_) * 4e-3
        ids_a = np.arange(na, dtype=np.int64)
        ids_b = np.arange(1000, 1000 + nb_, dtype=np.int64)

        def side(ids, lon, lat, blocks):
            return ray.data.from_arrow(pa.table({
                "id": pa.array(ids), "lon": pa.array(lon),
                "lat": pa.array(lat),
            })).repartition(blocks)

        want = self._reference(lon_a, lat_a, ids_a, lon_b, lat_b, ids_b,
                               radius=100.0, rounds=3)
        assert want, "fixture must produce matches"
        rounds_seen = {r for *_x, r in want}
        assert len(rounds_seen) >= 2, "fixture must exercise >1 round"

        for blocks in (1, 7):
            got = mutual_nn_assign(
                side(ids_a, lon_a, lat_a, blocks),
                side(ids_b, lon_b, lat_b, max(1, blocks - 2)),
                radius_m=100.0, rounds=3, num_buckets=8,
            ).to_pandas()
            got_t = sorted(
                (int(r.id_a), int(r.id_b), round(float(r.dist_m), 1),
                 int(r.match_round))
                for r in got.itertuples()
            )
            assert got_t == want

    def test_one_to_one_property(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import mutual_nn_assign

        rng = np.random.RandomState(11)
        n = 200
        tbl = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "lon": pa.array(-77.05 + rng.rand(n) * 3e-3),
            "lat": pa.array(38.85 + rng.rand(n) * 3e-3),
        })
        t2 = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "lon": pa.array(-77.05 + rng.rand(n) * 3e-3),
            "lat": pa.array(38.85 + rng.rand(n) * 3e-3),
        })
        out = mutual_nn_assign(
            ray.data.from_arrow(tbl), ray.data.from_arrow(t2),
            radius_m=100.0, rounds=3, num_buckets=8,
        ).to_pandas()
        assert len(out) > 0
        assert out["id_a"].is_unique and out["id_b"].is_unique

    def test_empty_candidates(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import mutual_nn_assign

        a = ray.data.from_arrow(pa.table({
            "id": pa.array([1], pa.int64()),
            "lon": pa.array([-77.05]), "lat": pa.array([38.85]),
        }))
        b = ray.data.from_arrow(pa.table({
            "id": pa.array([2], pa.int64()),
            "lon": pa.array([-77.5]), "lat": pa.array([38.5]),
        }))
        out = mutual_nn_assign(a, b, radius_m=100.0, num_buckets=8)
        assert out.count() == 0
        # ray to_pandas drops columns on empty datasets; the TYPED contract
        # lives in the schema (joins._key_type relies on it downstream)
        assert out.schema().names == ["id_a", "id_b", "dist_m", "match_round"]


class TestRipleyCounts:
    def test_vs_brute_force_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import ripley_counts

        tbl, lon, lat = _toy_points()
        d = _dist_matrix(lon, lat)
        np.fill_diagonal(d, np.inf)
        radii = [1e-6, 5.0, 50.0]  # first bin exercises the zero path
        want = {r: int((d <= r).sum()) for r in radii}
        n = len(lon)

        for blocks in (1, 6):
            out = ripley_counts(
                ray.data.from_arrow(tbl).repartition(blocks),
                radii, num_buckets=8,
            ).to_pandas().sort_values("radius_m").reset_index(drop=True)
            assert len(out) == 3
            for _, row in out.iterrows():
                r = float(row.radius_m)
                assert int(row.n_pairs) == want[r]
                assert float(row.mean_neighbors) == round(want[r] / n, 6)
        assert want[1e-6] == 0 and want[50.0] > 0


class TestHotspotCells:
    def test_manual_grid_ties_and_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import hotspot_cells

        # grid:      (0,0)=5  (1,0)=3  (5,5)=4  (6,5)=4  (9,0)=2
        # 5 beats 3 → hotspot; the 4/4 tie suppresses both; 2 < min_count
        counts = pa.table({
            "cell_x": pa.array([0, 1, 5, 6, 9], pa.int64()),
            "cell_y": pa.array([0, 0, 5, 5, 0], pa.int64()),
            "n": pa.array([5, 3, 4, 4, 2], pa.int64()),
        })
        for blocks in (1, 4):
            out = hotspot_cells(
                ray.data.from_arrow(counts).repartition(blocks),
                min_count=3, num_buckets=4,
            ).to_pandas().sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
            assert list(map(tuple, out.to_numpy())) == [(0, 0, 5, 3)]

    def test_isolated_cell_nbr_zero(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import hotspot_cells

        counts = pa.table({
            "cell_x": pa.array([100], pa.int64()),
            "cell_y": pa.array([100], pa.int64()),
            "n": pa.array([7], pa.int64()),
        })
        out = hotspot_cells(
            ray.data.from_arrow(counts), min_count=1, num_buckets=4
        ).to_pandas()
        assert list(map(tuple, out.to_numpy())) == [(100, 100, 7, 0)]


class TestMoransI:
    @staticmethod
    def _reference(cells):
        n = len(cells)
        t = sum(v for *_c, v in cells)
        dev = {(cx, cy): n * v - t for cx, cy, v in cells}
        num = w = 0
        for (cx, cy), d in dev.items():
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if (dx, dy) == (0, 0):
                        continue
                    nb = dev.get((cx + dx, cy + dy))
                    if nb is not None:
                        num += d * nb
                        w += 1
        den = sum(d * d for d in dev.values())
        mi = round((n / w) * (num / den), 6) if w and den else float("nan")
        return n, w, num, den, mi

    def test_checkerboard_negative_cluster_positive(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import morans_i

        # checkerboard: high/low alternating → strong negative I
        cb = [(x, y, 9 if (x + y) % 2 == 0 else 1)
              for x in range(4) for y in range(4)]
        # two smooth blobs → positive I
        blob = [(x, y, 10 - abs(x - 1) - abs(y - 1))
                for x in range(4) for y in range(4)]
        for cells, sign in [(cb, -1), (blob, 1)]:
            want = self._reference(cells)
            t = pa.table({
                "cell_x": pa.array([c[0] for c in cells], pa.int64()),
                "cell_y": pa.array([c[1] for c in cells], pa.int64()),
                "n": pa.array([c[2] for c in cells], pa.int64()),
            })
            for blocks in (1, 5):
                out = morans_i(
                    ray.data.from_arrow(t).repartition(blocks),
                    num_buckets=4,
                ).to_pandas()
                got = (int(out.n_cells[0]), int(out.w_pairs[0]),
                       int(out.num[0]), int(out.den[0]),
                       float(out.moran_i[0]))
                assert got == want
                assert np.sign(got[4]) == sign


def _brute_dtw(xa, ya, xb, yb, w):
    """Textbook full-matrix banded DTW on integer coords."""
    n, m = len(xa), len(xb)
    w = max(w, abs(n - m))
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(max(1, i - w), min(m, i + w) + 1):
            c = (xa[i - 1] - xb[j - 1]) ** 2 + (ya[i - 1] - yb[j - 1]) ** 2
            D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    return D[n][m]


class TestDtwPanel:
    def test_kernel_vs_brute_force(self):
        from overmatch_ray.stages.spatial import dtw_cost_int

        rng = np.random.RandomState(3)
        for n, m, w in [(12, 12, 3), (20, 9, 4), (1, 5, 2), (7, 7, 100)]:
            xa = rng.randint(-50, 50, n).astype(np.int64)
            ya = rng.randint(-50, 50, n).astype(np.int64)
            xb = rng.randint(-50, 50, m).astype(np.int64)
            yb = rng.randint(-50, 50, m).astype(np.int64)
            assert dtw_cost_int(xa, ya, xb, yb, w) == _brute_dtw(
                xa.tolist(), ya.tolist(), xb.tolist(), yb.tolist(), w)
        # identical tracks align for free
        xa = np.arange(30, dtype=np.int64)
        assert dtw_cost_int(xa, xa, xa, xa, 4) == 0
        assert dtw_cost_int(np.empty(0, np.int64), np.empty(0, np.int64),
                            xa, xa, 4) == -1

    def test_panel_distributed_vs_direct(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import dtw_cost_int, dtw_panel

        rng = np.random.RandomState(5)
        tracks = {}
        rows = {"user_id": [], "t": [], "x": [], "y": []}
        for uid in (3, 7, 11):
            n = 25 + uid
            x = np.cumsum(rng.randint(-3, 4, n)).astype(np.float64)
            y = np.cumsum(rng.randint(-3, 4, n)).astype(np.float64)
            tracks[uid] = (np.floor(x * 10).astype(np.int64),
                           np.floor(y * 10).astype(np.int64))
            rows["user_id"] += [uid] * n
            rows["t"] += list(range(n))
            rows["x"] += x.tolist()
            rows["y"] += y.tolist()
        pts = pa.table({
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "t": pa.array(rows["t"], pa.int64()),
            "x": pa.array(rows["x"]),
            "y": pa.array(rows["y"]),
        })
        pairs = pa.table({
            "pair_id": pa.array([0, 1, 2], pa.int64()),
            "key_a": pa.array([3, 3, 7], pa.int64()),
            "key_b": pa.array([7, 11, 11], pa.int64()),
        })
        want = {
            (a, b): dtw_cost_int(*tracks[a], *tracks[b], 5)
            for a, b in [(3, 7), (3, 11), (7, 11)]
        }
        for blocks in (1, 4):
            out = dtw_panel(
                ray.data.from_arrow(pts).repartition(blocks), pairs,
                key_col="user_id", order_cols=["t"], band=5, num_buckets=4,
            ).to_pandas().sort_values("pair_id")
            got = {(int(r.key_a), int(r.key_b)): int(r.dtw_cost)
                   for r in out.itertuples()}
            assert got == want
            assert out["n_a"].tolist() == [28, 28, 32]


class TestSegmentCrossingJoin:
    @staticmethod
    def _brute(segs):
        """O(n²) reference: proper crossings between different keys."""
        out = set()
        n = len(segs)
        for i in range(n):
            si, ki, ax1, ay1, ax2, ay2 = segs[i]
            for j in range(i + 1, n):
                sj, kj, bx1, by1, bx2, by2 = segs[j]
                if ki == kj:
                    continue
                d1 = (ax2-ax1)*(by1-ay1) - (ay2-ay1)*(bx1-ax1)
                d2 = (ax2-ax1)*(by2-ay1) - (ay2-ay1)*(bx2-ax1)
                d3 = (bx2-bx1)*(ay1-by1) - (by2-by1)*(ax1-bx1)
                d4 = (bx2-bx1)*(ay2-by1) - (by2-by1)*(ax2-bx1)
                if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
                        and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
                    a, b = ((si, ki), (sj, kj)) if ki < kj else ((sj, kj), (si, ki))
                    out.add((a[0], b[0], a[1], b[1]))
        return out

    def test_vs_brute_force_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import segment_crossing_join

        rng = np.random.RandomState(11)
        n = 400
        x1 = rng.randint(0, 1000, n).astype(np.int64)
        y1 = rng.randint(0, 1000, n).astype(np.int64)
        x2 = x1 + rng.randint(-90, 91, n)
        y2 = y1 + rng.randint(-90, 91, n)
        keep = (x1 != x2) | (y1 != y2)
        segs = [
            (int(i), int(i % 23), int(a), int(b), int(c), int(d))
            for i, (a, b, c, d) in enumerate(zip(x1, y1, x2, y2))
            if keep[i]
        ]
        want = self._brute(segs)
        tbl = pa.table({
            "seg_id": pa.array([s[0] for s in segs], pa.int64()),
            "key": pa.array([s[1] for s in segs], pa.int64()),
            "x1": pa.array([s[2] for s in segs], pa.int64()),
            "y1": pa.array([s[3] for s in segs], pa.int64()),
            "x2": pa.array([s[4] for s in segs], pa.int64()),
            "y2": pa.array([s[5] for s in segs], pa.int64()),
        })
        for blocks, cell in ((1, 100), (4, 100), (4, 64)):
            out = segment_crossing_join(
                ray.data.from_arrow(tbl).repartition(blocks),
                cell_units=cell, num_buckets=8,
            ).to_pandas()
            got = {(int(r.seg_a), int(r.seg_b), int(r.key_a), int(r.key_b))
                   for r in out.itertuples()}
            assert got == want
            assert len(out) == len(got)  # canonical-cell rule → no dupes

    def test_touch_and_collinear_excluded(self, ray_session):
        import ray.data

        from overmatch_ray.stages.spatial import segment_crossing_join

        tbl = pa.table({
            # 0-1 cross; 2 touches 0 at an endpoint (excluded);
            # 3 collinear-overlaps 0 (excluded)
            "seg_id": pa.array([0, 1, 2, 3], pa.int64()),
            "key": pa.array([0, 1, 2, 3], pa.int64()),
            "x1": pa.array([0, 0, 10, 2], pa.int64()),
            "y1": pa.array([0, 10, 10, 2], pa.int64()),
            "x2": pa.array([10, 10, 20, 8], pa.int64()),
            "y2": pa.array([10, 0, 0, 8], pa.int64()),
        })
        out = segment_crossing_join(
            ray.data.from_arrow(tbl), cell_units=8, num_buckets=4
        ).to_pandas()
        # 0-1 cross at (5,5); 3 (interior diagonal) crosses 1 there too;
        # endpoint touch (0-2) and collinear overlap (0-3) are excluded
        assert {(int(r.seg_a), int(r.seg_b)) for r in out.itertuples()} == {
            (0, 1), (1, 3)}


class TestSegmentCrossingGuard:
    def test_hot_cell_raises_loudly(self, ray_session):
        """A degenerate corpus (all segments in one cell) must fail with
        the documented quadratic-blowup guard, not OOM a worker."""
        import ray.data

        from overmatch_ray.stages.spatial import segment_crossing_join

        n = 50
        tbl = pa.table({
            "seg_id": pa.array(np.arange(n, dtype=np.int64)),
            "key": pa.array(np.arange(n, dtype=np.int64)),
            "x1": pa.array(np.zeros(n, np.int64)),
            "y1": pa.array(np.arange(n, dtype=np.int64) % 7),
            "x2": pa.array(np.full(n, 6, np.int64)),
            "y2": pa.array((np.arange(n, dtype=np.int64) * 3) % 7),
        })
        with pytest.raises(Exception) as ei:
            segment_crossing_join(
                ray.data.from_arrow(tbl), cell_units=100, num_buckets=2,
                max_cell_segments=10,
            ).materialize()
        # the loud guard's message survives Ray's task-error wrapping
        assert "max_cell_segments" in str(ei.getrepr())
