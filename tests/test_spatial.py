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
