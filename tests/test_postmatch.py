"""Tests for the match post-pipeline: merge (A1/O1), tracking enrichment
(J2/D1), flatten (M17), deterministic tiling (S15/O6), resumable sink."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _matches_table():
    return pa.table(
        {
            "osm_id": ["node/1", "node/1", "node/2"],
            "overture_id": ["a", "b", "c"],
            "lon": [-77.0, -77.001, -77.1],
            "lat": [38.9, 38.901, 38.95],
            "distance_m": [40.0, 10.0, 99.9],
            "similarity": [0.8, 1.0, 0.61],
            "overture_tags": [
                json.dumps({"name": "A", "phone": "+1 202-555-0101", "cuisine": "pizza"}),
                json.dumps({"name": "B", "website": "https://b.com"}),
                json.dumps({"name": "C"}),
            ],
        }
    )


class TestMerge:
    def test_closest_wins(self, ray_session):
        import ray.data

        from overmatch_ray.stages.enrich import merge_matches, quality_score

        out = {
            r["osm_id"]: r
            for r in merge_matches(ray.data.from_arrow(_matches_table())).take_all()
        }
        r1 = out["node/1"]
        assert r1["match_count"] == 2
        assert r1["best_overture_id"] == "b"  # distance 10 < 40
        merged = json.loads(r1["merged_tags"])
        # closest match ("B") wins the name conflict; farther keys survive
        assert merged["name"] == "B"
        assert merged["cuisine"] == "pizza"
        assert merged["website"] == "https://b.com"
        assert r1["quality"] == pytest.approx(quality_score(1.0, 10.0))
        assert out["node/2"]["match_count"] == 1

    def test_quality_formula(self):
        from overmatch_ray.stages.enrich import quality_score

        # reference formula at sim=1, d=0 → 100; sim=0.6, d=100 → 0
        assert quality_score(1.0, 0.0) == pytest.approx(100.0)
        assert quality_score(0.6, 100.0) == pytest.approx(0.0)
        assert quality_score(0.8, 50.0) == pytest.approx(50.0)


class TestEnrich:
    def test_tracking_join(self, ray_session):
        import ray.data

        from overmatch_ray.stages.enrich import enrich_matches

        osm_track = {"node/1": ("2024-01-01T00:00:00Z", "2024-06-01T00:00:00Z")}
        ovt_track = {"c": ("2024-02-01T00:00:00Z", "2024-02-02T00:00:00Z")}
        rows = {
            (r["osm_id"], r["overture_id"]): r
            for r in enrich_matches(
                ray.data.from_arrow(_matches_table()), osm_track, ovt_track,
                concurrency=1,
            ).take_all()
        }
        r = rows[("node/1", "a")]
        assert r["osm_marked"] and r["osm_first_seen"] == "2024-01-01T00:00:00Z"
        assert not r["overture_marked"] and r["overture_first_seen"] is None
        r2 = rows[("node/2", "c")]
        assert not r2["osm_marked"] and r2["overture_marked"]
        # deterministic content-keyed feature id
        from overmatch_ray.stages.enrich import pair_id

        assert r["feature_id"] == pair_id("node/1", "a")

    def test_flatten(self):
        from overmatch_ray.stages.enrich import flatten_tags_batch

        out = flatten_tags_batch(_matches_table())
        assert "overture_name" in out.column_names
        # pinned vocabulary: absent keys exist as all-null columns
        assert "overture_addr_housenumber" in out.column_names
        assert out["overture_addr_housenumber"].null_count == 3
        assert out["overture_cuisine"].to_pylist() == ["pizza", None, None]


class TestTrackingUpsert:
    def test_first_seen_preserved(self, ray_session):
        import ray.data

        from overmatch_ray.state.checkpoint import upsert_tracking

        gen1 = pa.table(
            {
                "element_id": ["e1", "e2"],
                "first_seen": ["2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"],
                "last_seen": ["2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"],
            }
        )
        gen2 = pa.table(
            {
                "element_id": ["e1", "e3"],
                "first_seen": ["2024-05-01T00:00:00Z", "2024-05-01T00:00:00Z"],
                "last_seen": ["2024-05-01T00:00:00Z", "2024-05-01T00:00:00Z"],
            }
        )
        ds = ray.data.from_arrow(gen1).union(ray.data.from_arrow(gen2))
        out = {r["element_id"]: r for r in upsert_tracking(ds, "now").take_all()}
        assert out["e1"]["first_seen"] == "2024-01-01T00:00:00Z"  # D1: preserved
        assert out["e1"]["last_seen"] == "2024-05-01T00:00:00Z"  # D1: max
        assert out["e3"]["first_seen"] == "2024-05-01T00:00:00Z"


class TestTiles:
    def test_assignment_known_values(self):
        from overmatch_ray.stages.tiles import tile_xy

        # lon 0, lat 0 at z1 → tile (1, 1) (NE of the antimeridian split)
        tx, ty = tile_xy(np.array([0.0]), np.array([0.0]), 1)
        assert (tx[0], ty[0]) == (1, 1)
        tx, ty = tile_xy(np.array([-77.0]), np.array([38.9]), 12)
        assert (tx[0], ty[0]) == (1171, 1566)

    def test_deterministic_across_parallelism(self, ray_session):
        import ray.data

        from overmatch_ray.stages.tiles import build_tiles
        from overmatch_ray.synth import osm_block

        feats = osm_block(np.arange(300)).drop_columns(["addr_housenumber"])

        def run(nblocks):
            ds = ray.data.from_arrow(feats).repartition(nblocks)
            out = build_tiles(ds, zooms=[8, 12], max_per_tile=5).take_all()
            return sorted(
                (r["zoom"], r["tx"], r["ty"], r["n_features"], r["n_dropped"],
                 r["tile"], r["mvt"])
                for r in out
            )

        a, b = run(2), run(9)
        assert a == b, "tile assignment/payload differs across parallelism"
        assert any(t[4] > 0 for t in a), "cap never triggered — weak test"
        # every zoom-8 feature count ≤ cap
        assert all(t[3] <= 5 for t in a)
        # binary MVT payloads byte-identical across parallelism AND decode
        # back to the JSON payload's features
        import json as _json

        from overmatch_ray.stages.mvt import decode_mvt_points

        for t in a:
            fc = _json.loads(t[5])
            pts = decode_mvt_points(t[6])
            assert len(pts) == t[3] == len(fc["features"])
            names_json = sorted(
                f["properties"].get("name") or "" for f in fc["features"]
            )
            names_mvt = sorted(p.get("name") or "" for p in pts)
            assert names_json == names_mvt
            assert all(0 <= p["__x"] <= 4096 and 0 <= p["__y"] <= 4096 for p in pts)

    def test_auto_max_zoom(self, ray_session):
        """tippecanoe -zg analog: denser corpora need deeper max zoom."""
        import ray.data

        from overmatch_ray.stages.tiles import auto_max_zoom
        from overmatch_ray.synth import osm_block

        sparse = ray.data.from_arrow(osm_block(np.arange(200), n_total=200))
        dense = ray.data.from_arrow(osm_block(np.arange(5000), n_total=5000))
        z_sparse = auto_max_zoom(sparse, max_per_tile=50)
        z_dense = auto_max_zoom(dense, max_per_tile=50)
        assert z_dense >= z_sparse
        assert 4 <= z_sparse <= 16 and 4 <= z_dense <= 16

    def test_auto_max_zoom_order_invariant(self, ray_session):
        """The density sample is a hash of osm_id, not first-N: a spatially
        sorted input (dense region first, as a Hilbert-partitioned sink
        produces) must pick the same zoom as the shuffled same input."""
        import pyarrow as pa
        import ray.data

        from overmatch_ray.stages.tiles import auto_max_zoom

        n_dense, n_sparse = 4000, 4000
        ids = np.arange(n_dense + n_sparse)
        lon = np.concatenate([
            10.0 + 0.02 * (ids[:n_dense] % 63) / 63.0,      # one dense ~2km box
            -170.0 + 340.0 * (ids[n_dense:] * 2654435761 % 2**20) / 2**20,
        ])
        lat = np.concatenate([
            50.0 + 0.02 * (ids[:n_dense] // 63) / 63.0,
            -60.0 + 120.0 * (ids[n_dense:] * 40503 % 2**20) / 2**20,
        ])
        t = pa.table({
            "osm_id": pa.array([f"node/{i}" for i in ids], pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        })
        perm = np.argsort((ids * 2654435761) % 2**32, kind="stable")
        sorted_ds = ray.data.from_arrow(t).repartition(8)
        shuffled_ds = ray.data.from_arrow(t.take(pa.array(perm))).repartition(8)
        kw = dict(max_per_tile=50, sample_rows=1500)
        z_sorted = auto_max_zoom(sorted_ds, **kw)
        z_shuffled = auto_max_zoom(shuffled_ds, **kw)
        assert z_sorted == z_shuffled
        # the dense box must actually drive the estimate deep
        assert z_sorted >= 10


class TestResumableSink:
    def test_write_resume_skip(self, ray_session, tmp_path):
        import ray.data

        from overmatch_ray.state.checkpoint import (
            PartitionedSink,
            read_partitioned,
            write_partitioned_resumable,
        )

        out_dir = str(tmp_path / "out")
        t = pa.table(
            {
                "bucket": pa.array([0, 0, 1, 1, 2], pa.int64()),
                "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
        # simulate a killed run: bucket 0 already complete
        sink = PartitionedSink(out_dir, "bucket")
        sink.write_group(pd.DataFrame({"bucket": [0, 0], "v": [1, 2]}))
        assert sink.completed_partitions() == {0}

        receipts = write_partitioned_resumable(
            ray.data.from_arrow(t), out_dir, "bucket"
        ).take_all()
        # resume wrote only buckets 1 and 2
        assert sorted(r["key"] for r in receipts) == [1, 2]
        back = read_partitioned(out_dir).take_all()
        assert sorted(r["v"] for r in back) == [1, 2, 3, 4, 5]
        assert sorted(os.listdir(os.path.join(out_dir, "_manifest"))) == [
            "0.json", "1.json", "2.json",
        ]


class TestSemiJoinShuffled:
    def test_matches_broadcast_path(self, ray_session):
        """VERDICT r1 #6: with the broadcast limit forced to 0 the two semi/
        anti-join queries must run through semi_join_shuffled and produce
        the exact same aggregates as the broadcast path."""
        import ray.data

        from overmatch_ray.pipelines import queries as q

        sf = "/root/testdata/sf0.001"

        def rows(ds):
            return sorted(
                ((r["c_mktsegment"], r["n_customers"]) for r in ds.take_all())
            )

        broadcast_with = rows(q.q_customers_with_orders(sf))
        broadcast_without = rows(q.q_customers_without_orders(sf))
        assert sum(n for _, n in broadcast_with) > 0

        old = q.SEMI_JOIN_BROADCAST_LIMIT
        q.SEMI_JOIN_BROADCAST_LIMIT = 0
        try:
            assert rows(q.q_customers_with_orders(sf)) == broadcast_with
            assert rows(q.q_customers_without_orders(sf)) == broadcast_without
        finally:
            q.SEMI_JOIN_BROADCAST_LIMIT = old

    def test_shuffled_primitive_nulls_and_anti(self, ray_session):
        """Null left keys survive an anti join and never pass a semi join
        (same semantics as semi_join_filter)."""
        import ray.data

        from overmatch_ray.stages.joins import semi_join_shuffled

        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 2, 3, None, 5], pa.int64()),
                    "v": pa.array(["a", "b", "c", "d", "e"]),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array([2, 2, 3, 7], pa.int64())})
        )
        semi = semi_join_shuffled(left, right, "k", "rk")
        assert sorted(r["v"] for r in semi.take_all()) == ["b", "c"]
        anti = semi_join_shuffled(left, right, "k", "rk", anti=True)
        assert sorted(r["v"] for r in anti.take_all()) == ["a", "d", "e"]


class TestHilbertPartitioning:
    def test_bbox_prunes_partitions(self):
        """VERDICT r1 #7: Hilbert-range partition keys must give measurable
        partition pruning — a small bbox touches few Hilbert partitions but
        essentially all hash partitions."""
        from overmatch_ray.pipelines.publish import hilbert_partition
        from overmatch_ray.stages.groupops import hash_columns

        rng = np.random.default_rng(12)
        n, parts = 20000, 16
        lon = rng.uniform(-120, -70, n)
        lat = rng.uniform(25, 48, n)
        t = pa.table(
            {
                "osm_id": pa.array([f"node/{i}" for i in range(n)]),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )
        hil = hilbert_partition(t, parts)["part"].to_numpy()
        hsh = (hash_columns(t, ["osm_id"]) % np.uint64(parts)).astype(np.int64)

        box = (lon > -78) & (lon < -76) & (lat > 38) & (lat < 40)  # DC-ish
        assert box.sum() > 20
        hil_touched = len(np.unique(hil[box]))
        hsh_touched = len(np.unique(hsh[box]))
        assert hil_touched <= parts // 4, f"hilbert touched {hil_touched}"
        assert hsh_touched >= parts - 2, f"hash touched only {hsh_touched}"
        # key is contiguous-range: every partition id in [0, parts)
        assert hil.min() >= 0 and hil.max() < parts


class TestMergeVectorizedParity:
    def test_matches_per_group_oracle(self, ray_session):
        """The vectorized bucket merge must equal the per-element reference
        implementation (merge_matches_group) on a corpus with multi-match
        elements and overlapping tag keys."""
        import json

        import ray.data

        from overmatch_ray.stages.enrich import merge_matches, merge_matches_group

        rng = np.random.default_rng(21)
        n = 400
        osm_ids = [f"node/{int(i)}" for i in rng.integers(0, 120, n)]
        t = pa.table(
            {
                "osm_id": pa.array(osm_ids),
                "overture_id": pa.array([f"ovt-{i}" for i in range(n)]),
                "distance_m": pa.array(np.round(rng.uniform(0, 100, n), 1)),
                "similarity": pa.array(np.round(rng.uniform(0.6, 1.0, n), 2)),
                "overture_tags": pa.array(
                    [
                        json.dumps({"name": f"N{i}", "k%d" % (i % 3): str(i)})
                        if i % 7
                        else ""
                        for i in range(n)
                    ]
                ),
            }
        )
        got = {
            r["osm_id"]: r
            for r in merge_matches(
                ray.data.from_arrow(t), num_buckets=8
            ).take_all()
        }
        df = t.to_pandas()
        for osm_id, sub in df.groupby("osm_id"):
            exp = merge_matches_group(sub).iloc[0].to_dict()
            g = got[osm_id]
            for k, v in exp.items():
                assert g[k] == v, (osm_id, k, g[k], v)
        assert len(got) == df["osm_id"].nunique()


class TestPMTiles:
    def test_roundtrip_and_determinism(self, ray_session, tmp_path):
        """S16/PMTiles: pack the tile pyramid into one PMTiles v3 archive;
        every tile reads back (gunzip → MVT decode) and the file is
        byte-identical across parallelism levels."""
        import hashlib

        import ray.data

        from overmatch_ray.stages.mvt import decode_mvt_points
        from overmatch_ray.stages.pmtiles import read_pmtiles_tile, write_pmtiles
        from overmatch_ray.stages.tiles import build_tiles
        from overmatch_ray.synth import osm_block

        feats = osm_block(np.arange(250)).drop_columns(["addr_housenumber"])

        def run(nblocks, path):
            ds = ray.data.from_arrow(feats).repartition(nblocks)
            tiles = build_tiles(ds, zooms=[6, 10], max_per_tile=50)
            return write_pmtiles(tiles, path), tiles.take_all()

        stats_a, tiles_a = run(2, str(tmp_path / "a.pmtiles"))
        stats_b, _ = run(7, str(tmp_path / "b.pmtiles"))
        assert stats_a["n_tiles"] == len(tiles_a) > 0
        ha = hashlib.sha256(open(tmp_path / "a.pmtiles", "rb").read()).hexdigest()
        hb = hashlib.sha256(open(tmp_path / "b.pmtiles", "rb").read()).hexdigest()
        assert ha == hb, "PMTiles archive not deterministic across parallelism"
        assert stats_a["min_zoom"] == 6 and stats_a["max_zoom"] == 10

        for r in tiles_a:
            raw = read_pmtiles_tile(
                str(tmp_path / "a.pmtiles"), r["zoom"], r["tx"], r["ty"]
            )
            assert raw == r["mvt"]
            assert len(decode_mvt_points(raw)) == r["n_features"]
        # absent tile → None
        assert read_pmtiles_tile(str(tmp_path / "a.pmtiles"), 3, 0, 0) is None

    def test_tileid_known_values(self):
        """PMTiles tile-id spec anchors: z0 → 0; z1 pyramid base 1; the z1
        Hilbert order visits (0,0),(0,1),(1,1),(1,0)."""
        from overmatch_ray.stages.pmtiles import zxy_to_tileid

        z = np.array([0, 1, 1, 1, 1, 2])
        x = np.array([0, 0, 0, 1, 1, 0])
        y = np.array([0, 0, 1, 1, 0, 0])
        ids = zxy_to_tileid(z, x, y)
        assert ids.tolist() == [0, 1, 2, 3, 4, 5]


class TestAsofJoin:
    def test_backward_forward_and_isolation(self, ray_session):
        """asof_join: backward picks at-or-before, forward at-or-after,
        matches never cross the by-key, unmatched rows keep nulls."""
        import ray.data

        from overmatch_ray.stages.joins import asof_join

        left = ray.data.from_arrow(
            pa.table(
                {
                    "eid": pa.array([1, 2, 3, 4], pa.int64()),
                    "t": pa.array([10, 25, 5, 40], pa.int64()),
                    "u": pa.array([1, 1, 2, 3], pa.int64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "p_u": pa.array([1, 1, 2], pa.int64()),
                    "p_t": pa.array([10, 20, 30], pa.int64()),
                    "p_v": pa.array([1.0, 2.0, 3.0]),
                }
            )
        )
        back = {
            r["eid"]: (r["p_t"], r["p_v"])
            for r in asof_join(
                left, right, on="t", right_on="p_t", by="u", right_by="p_u",
                num_buckets=4,
            ).take_all()
        }
        assert back[1] == (10, 1.0)  # exact match allowed
        assert back[2] == (20, 2.0)  # most recent prior
        assert back[3] == (None, None)  # u=2's purchase is later
        assert back[4] == (None, None)  # u=3 has none
        fwd = {
            r["eid"]: r["p_t"]
            for r in asof_join(
                left, right, on="t", right_on="p_t", by="u", right_by="p_u",
                direction="forward", num_buckets=4,
            ).take_all()
        }
        assert fwd[1] == 10 and fwd[2] is None and fwd[3] == 30 and fwd[4] is None


class TestPMTilesLeaves:
    def test_leaf_spill_roundtrip(self, ray_session, tmp_path):
        """Forcing a tiny root budget spills entries into leaf directories;
        every tile must still read back and the archive stays
        deterministic."""
        import hashlib

        import ray.data

        from overmatch_ray.stages.pmtiles import read_pmtiles_tile, write_pmtiles
        from overmatch_ray.stages.tiles import build_tiles
        from overmatch_ray.synth import osm_block

        feats = osm_block(np.arange(400)).drop_columns(["addr_housenumber"])
        tiles = build_tiles(
            ray.data.from_arrow(feats), zooms=[10, 14], max_per_tile=20
        )
        pa_ = str(tmp_path / "leaf.pmtiles")
        stats = write_pmtiles(tiles, pa_, max_root_bytes=64)  # force spill
        assert stats["n_leaves"] >= 1
        rows = tiles.take_all()
        assert stats["n_tiles"] == len(rows) > 10
        for r in rows:
            assert read_pmtiles_tile(pa_, r["zoom"], r["tx"], r["ty"]) == r["mvt"]
        assert read_pmtiles_tile(pa_, 5, 1, 1) is None
        stats2 = write_pmtiles(tiles, str(tmp_path / "b.pmtiles"), max_root_bytes=64)
        ha = hashlib.sha256(open(pa_, "rb").read()).hexdigest()
        hb = hashlib.sha256(open(tmp_path / "b.pmtiles", "rb").read()).hexdigest()
        assert ha == hb and stats2 == stats


class TestReviewRegressions:
    def test_asof_nullable_int_columns_and_null_keys(self, ray_session):
        """Review finding: nullable int payload columns and null join keys
        must not crash asof_join; null-key left rows keep LEFT semantics."""
        import ray.data

        from overmatch_ray.stages.joins import asof_join

        left = ray.data.from_arrow(
            pa.table(
                {
                    "eid": pa.array([1, 2, 3], pa.int64()),
                    "t": pa.array([10, None, 30], pa.int64()),
                    "u": pa.array([1, 1, 1], pa.int64()),
                    "extra": pa.array([7, None, 9], pa.int64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "p_u": pa.array([1, None], pa.int64()),
                    "p_t": pa.array([5, 6], pa.int64()),
                    "p_v": pa.array([1.5, 9.9]),
                }
            )
        )
        out = {
            r["eid"]: r
            for r in asof_join(
                left, right, on="t", right_on="p_t", by="u", right_by="p_u",
                num_buckets=2,
            ).take_all()
        }
        assert out[1]["p_t"] == 5 and out[1]["p_v"] == 1.5
        assert out[2]["p_t"] is None  # null ON key → no match, row kept
        assert out[2]["extra"] is None
        assert out[3]["p_t"] == 5 and out[3]["extra"] == 9

    def test_semi_join_keys_above_2_53(self, ray_session):
        """Review finding: int64 keys above 2^53 must not be compared as
        float64 (adjacent keys would collide)."""
        import ray.data

        from overmatch_ray.stages.joins import semi_join_shuffled

        base = (1 << 60) + 12345678901234567
        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([base, base + 1, base + 2], pa.int64()),
                    "v": pa.array(["a", "b", "c"]),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array([base + 1], pa.int64())})
        )
        semi = semi_join_shuffled(left, right, "k", "rk", num_buckets=2).take_all()
        assert [r["v"] for r in semi] == ["b"]
        assert semi[0]["k"] == base + 1  # exact key value in the output
        anti = semi_join_shuffled(
            left, right, "k", "rk", anti=True, num_buckets=2
        ).take_all()
        assert sorted(r["v"] for r in anti) == ["a", "c"]

    def test_split_thresholds_zero_tail(self):
        """Review finding: a zero-weight tail split after cum=1.0 must get
        nothing (no 9-char hex bound breaking the compare)."""
        from overmatch_ray.stages.splits import split_of, split_thresholds

        th = split_thresholds({"a": 0.5, "b": 0.5, "c": 0.0})
        assert all(len(b) == 8 for _, b in th)
        from collections import Counter

        c = Counter(split_of(str(i), th) for i in range(4000))
        assert c["c"] == 0
        assert abs(c["a"] / 4000 - 0.5) < 0.05 and abs(c["b"] / 4000 - 0.5) < 0.05


class TestSemiJoinNullAndHugeKeys:
    def test_null_keys_with_keys_above_2_53(self, ray_session):
        """Review finding: a null left key must not drag the key column
        through float64 (corrupting adjacent >2^53 keys)."""
        import ray.data

        from overmatch_ray.stages.joins import semi_join_shuffled

        base = (1 << 60) + 987654321987654321 % (1 << 59)
        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([base, base + 1, None, base + 2], pa.int64()),
                    "v": pa.array(["a", "b", "n", "c"]),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array([base + 1], pa.int64())})
        )
        semi = semi_join_shuffled(left, right, "k", "rk", num_buckets=2).take_all()
        assert sorted(r["v"] for r in semi) == ["b"]
        assert semi[0]["k"] == base + 1
        anti = semi_join_shuffled(
            left, right, "k", "rk", anti=True, num_buckets=2
        ).take_all()
        assert sorted(r["v"] for r in anti) == ["a", "c", "n"]  # null kept


class TestBloomPrefilter:
    def test_bloom_properties_and_join_parity(self, ray_session):
        """Bloom pre-filter: no false negatives ever, measured FP rate near
        theory, and the pre-filtered semi join returns exactly the plain
        shuffled join's rows."""
        import ray.data

        from overmatch_ray.stages.joins import (
            BloomFilter,
            build_key_bloom,
            semi_join_shuffled,
        )

        rng = np.random.default_rng(51)
        members = rng.choice(10**9, 5000, replace=False).astype(np.int64)
        bf = BloomFilter(n_bits=1 << 17)
        bf.add(members)
        assert bf.might_contain(members).all(), "false negative!"
        probe = rng.choice(10**9, 20000, replace=False).astype(np.int64)
        outside = probe[~np.isin(probe, members)]
        fp = bf.might_contain(outside).mean()
        assert fp < 0.05, f"false-positive rate {fp} too high for m/n≈26"

        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(
                        np.concatenate([members[:200], outside[:3000]]), pa.int64()
                    ),
                    "v": pa.array(range(3200)),
                }
            )
        ).repartition(4)
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array(members, pa.int64())})
        ).repartition(3)
        plain = sorted(
            r["v"]
            for r in semi_join_shuffled(left, right, "k", "rk").take_all()
        )
        pre = sorted(
            r["v"]
            for r in semi_join_shuffled(
                left, right, "k", "rk", bloom_prefilter=True, bloom_bits=1 << 17
            ).take_all()
        )
        assert pre == plain and len(plain) == 200
        # distributed builder == direct builder
        bf2 = build_key_bloom(right, "rk", n_bits=1 << 17)
        assert (bf2.bits == bf.bits).all()


class TestAdviceR2Regressions:
    """Pins for the round-2 ADVICE findings."""

    def test_mvt_negative_int_roundtrip(self):
        """int_value is a two's-complement varint: negatives must decode
        back as negatives, not huge positives."""
        from overmatch_ray.stages.mvt import decode_mvt_points, encode_mvt_tile

        props = [{"delta": -7, "big": -(2**40), "pos": 12, "zero": 0}]
        raw = encode_mvt_tile(props, np.array([5]), np.array([9]))
        (pt,) = decode_mvt_points(raw)
        assert pt["delta"] == -7
        assert pt["big"] == -(2**40)
        assert pt["pos"] == 12 and pt["zero"] == 0

    def test_mvt_negative_zero_not_memo_collapsed(self):
        """-0.0 is ==/hash-equal to 0.0 but a distinct IEEE-754 payload:
        the per-tile value-encode memo must not reuse 0.0's bytes for it
        (e.g. any float property that rounds to -0.0, like round(-0.01, 1))."""
        import math

        from overmatch_ray.stages.mvt import decode_mvt_points, encode_mvt_tile

        raw = encode_mvt_tile(
            [{"d": 0.0}, {"d": -0.0}], np.array([1, 2]), np.array([3, 4])
        )
        a, b = decode_mvt_points(raw)
        assert math.copysign(1.0, a["d"]) == 1.0
        assert math.copysign(1.0, b["d"]) == -1.0

    def test_sink_scheme_stamp(self, ray_session, tmp_path):
        """Resume under a DIFFERENT partition scheme must refuse (silent
        row loss otherwise); same scheme resumes; a pre-stamp unversioned
        manifest also refuses."""
        import pytest
        import ray.data

        from overmatch_ray.state.checkpoint import (
            PartitionedSink,
            write_partitioned_resumable,
        )

        t = pa.table(
            {
                "bucket": pa.array([0, 1], pa.int64()),
                "v": pa.array([1, 2], pa.int64()),
            }
        )
        out_dir = str(tmp_path / "a")
        write_partitioned_resumable(
            ray.data.from_arrow(t), out_dir, "bucket", scheme="hash-fnv/v1"
        ).take_all()
        # same scheme: resume is a clean no-op rewrite path
        sink = PartitionedSink(out_dir, "bucket", scheme="hash-fnv/v1")
        assert sink.completed_partitions() == {0, 1}
        # different scheme: refuse
        with pytest.raises(ValueError, match="partition-scheme mismatch"):
            PartitionedSink(out_dir, "bucket", scheme="hilbert-range/v2")
        # unversioned pre-existing manifest: refuse when a scheme is claimed
        legacy = str(tmp_path / "b")
        PartitionedSink(legacy, "bucket").write_group(
            pd.DataFrame({"bucket": [0], "v": [1]})
        )
        with pytest.raises(ValueError, match="unversioned manifest"):
            PartitionedSink(legacy, "bucket", scheme="hash-fnv/v1")

    def test_asof_duplicate_right_keys_deterministic(self, ray_session):
        """Several right rows sharing the same (by, on) key: the picked row
        must not depend on input row order / bucket arrival order."""
        import ray.data

        from overmatch_ray.stages.joins import asof_join

        left = ray.data.from_arrow(
            pa.table(
                {
                    "eid": pa.array([1], pa.int64()),
                    "t": pa.array([50], pa.int64()),
                    "u": pa.array([1], pa.int64()),
                }
            )
        )
        dup = pa.table(
            {
                "p_u": pa.array([1, 1, 1], pa.int64()),
                "p_t": pa.array([20, 20, 20], pa.int64()),
                "p_v": pa.array([3.0, 1.0, 2.0]),
            }
        )
        picks = set()
        for order in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
            right = ray.data.from_arrow(
                dup.take(pa.array(order))
            ).repartition(2)
            (row,) = asof_join(
                left, right, on="t", right_on="p_t", by="u", right_by="p_u",
                num_buckets=3,
            ).take_all()
            picks.add(row["p_v"])
        # one deterministic winner regardless of arrival order: the
        # full-payload sort makes merge_asof pick the LAST row = max payload
        assert picks == {3.0}


class TestDirtyTiles:
    def test_classification_and_determinism(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from overmatch_ray.stages.tiles import build_tiles, dirty_tiles

        rng = np.random.RandomState(11)
        n = 400
        feats = pa.table({
            "osm_id": pa.array([f"node/{i}" for i in range(n)]),
            "lon": pa.array(-77.05 + rng.rand(n) * 0.4),
            "lat": pa.array(38.85 + rng.rand(n) * 0.3),
        })
        old_ds = ray.data.from_arrow(feats).repartition(3)
        # new corpus: the western strip vanishes entirely (removed tiles),
        # a modulo-thinning changes others, and a new eastern strip of
        # points appears (added tiles)
        lon = feats["lon"].to_numpy()
        keep = (lon > -76.9) & (np.arange(n) % 7 != 0)
        extra = pa.table({
            "osm_id": pa.array([f"node/{n + i}" for i in range(40)]),
            "lon": pa.array(-76.55 + rng.rand(40) * 0.05),
            "lat": pa.array(38.9 + rng.rand(40) * 0.05),
        })
        import pyarrow as pa_
        new_tbl = pa_.concat_tables([feats.filter(pa.array(keep)), extra])
        new_ds = ray.data.from_arrow(new_tbl).repartition(4)
        old_t = build_tiles(old_ds, zooms=[8, 12], max_per_tile=50).materialize()
        new_t = build_tiles(new_ds, zooms=[8, 12], max_per_tile=50).materialize()
        d = dirty_tiles(old_t, new_t).to_pandas()
        ot = old_t.to_pandas().set_index(["zoom", "tx", "ty"])
        nt = new_t.to_pandas().set_index(["zoom", "tx", "ty"])
        exp = {}
        for k in set(ot.index) | set(nt.index):
            if k not in nt.index:
                exp[k] = "removed"
            elif k not in ot.index:
                exp[k] = "added"
            elif bytes(ot.loc[k, "tile"]) != bytes(nt.loc[k, "tile"]):
                exp[k] = "changed"
        got = {(z, x, y): c for z, x, y, c in
               zip(d.zoom, d.tx, d.ty, d.change_type)}
        assert got == exp
        assert {"changed", "removed", "added"} <= set(got.values())
        # unchanged tiles never appear
        assert len(d) < len(ot) + len(nt)
        d2 = dirty_tiles(old_t, new_t).to_pandas()
        assert sorted(map(tuple, d.itertuples(index=False))) == sorted(
            map(tuple, d2.itertuples(index=False))
        )


class TestMatchDiff:
    """Incremental conflation CDC (VERDICT r4 #5): match_diff
    classification vs a brute-force dict diff, incremental dirty-tile
    rebuild byte-equal to the full rebuild, and a kill/resume of the
    diff's partitioned sink."""

    @staticmethod
    def _matches(n=300):
        import numpy as np
        import pyarrow as pa

        rng = np.random.RandomState(13)
        return pa.table({
            "osm_id": pa.array([f"node/{i}" for i in range(n)]),
            "overture_id": pa.array([f"ovt-{i:06d}" for i in range(n)]),
            "lon": pa.array(-77.05 + rng.rand(n) * 0.4),
            "lat": pa.array(38.85 + rng.rand(n) * 0.3),
            "distance_m": pa.array(np.round(rng.rand(n) * 100, 1)),
            "similarity": pa.array(np.round(0.6 + rng.rand(n) * 0.4, 6)),
            "overture_tags": pa.array(
                [f'{{"name":"poi {i}"}}' for i in range(n)]
            ),
        })

    @staticmethod
    def _perturb(t):
        """All perturbations LOCALIZED to the western strip (lon <
        −76.95) so eastern tiles stay clean — the incremental-vs-full
        test needs genuinely unchanged tiles to prove they are skipped."""
        import numpy as np
        import pyarrow as pa

        n = t.num_rows
        idx = np.arange(n)
        west = t["lon"].to_numpy() < -76.95
        keep = ~(west & (idx % 5 == 0))  # removed
        out = t.filter(pa.array(keep))
        kidx = idx[keep]
        kwest = west[keep]
        tags = out["overture_tags"].to_pylist()
        tags = [
            tg + ' {"edited":1}' if (w and i % 7 == 1) else tg
            for tg, i, w in zip(tags, kidx, kwest)
        ]
        out = out.set_column(
            out.schema.get_field_index("overture_tags"), "overture_tags",
            pa.array(tags, pa.string()),
        )
        add = out.filter(pa.array(kwest & (kidx % 11 == 2)))
        add = add.set_column(
            add.schema.get_field_index("overture_id"), "overture_id",
            pa.array([f"{v}-new" for v in add["overture_id"].to_pylist()]),
        )
        return pa.concat_tables([out, add])

    def test_classification_vs_bruteforce(self, ray_session):
        import ray.data

        from overmatch_ray.stages.enrich import match_diff

        old_t = self._matches()
        new_t = self._perturb(old_t)
        d = match_diff(
            ray.data.from_arrow(old_t).repartition(3),
            ray.data.from_arrow(new_t).repartition(4),
        ).to_pandas()
        # brute force
        def key_rows(t):
            return {
                (o, v): (dm, s, tg)
                for o, v, dm, s, tg in zip(
                    t["osm_id"].to_pylist(), t["overture_id"].to_pylist(),
                    t["distance_m"].to_pylist(), t["similarity"].to_pylist(),
                    t["overture_tags"].to_pylist(),
                )
            }
        om, nm = key_rows(old_t), key_rows(new_t)
        exp = {}
        for k in set(om) | set(nm):
            if k not in nm:
                exp[k] = "removed"
            elif k not in om:
                exp[k] = "added"
            elif (round(om[k][0] * 10) != round(nm[k][0] * 10)
                  or round(om[k][1] * 1e6) != round(nm[k][1] * 1e6)
                  or om[k][2] != nm[k][2]):
                exp[k] = "changed"
        got = {(o, v): c for o, v, c in
               zip(d.osm_id, d.overture_id, d.change_type)}
        assert got == exp
        assert {"added", "removed", "changed"} <= set(got.values())

    def test_incremental_tiles_equal_full_rebuild(self, ray_session):
        import ray.data

        from overmatch_ray.stages.enrich import match_diff
        from overmatch_ray.stages.tiles import build_tiles, incremental_tiles

        old_t = self._matches()
        new_t = self._perturb(old_t)
        old_ds = ray.data.from_arrow(old_t).repartition(3)
        new_ds = ray.data.from_arrow(new_t).repartition(4).materialize()
        diff = match_diff(old_ds, new_ds).materialize()
        inc = incremental_tiles(
            new_ds, diff, zooms=[8, 12], max_per_tile=50
        ).to_pandas()
        full = build_tiles(
            new_ds, zooms=[8, 12], max_per_tile=50
        ).to_pandas()
        dirty_keys = set(map(tuple, inc[["zoom", "tx", "ty"]].to_numpy()))
        assert dirty_keys  # the perturbation must dirty something
        # byte equality with the full rebuild on every dirty tile
        fsub = full[[tuple(k) in dirty_keys for k in
                     full[["zoom", "tx", "ty"]].to_numpy()]]
        a = {tuple(k): bytes(t) for *k, t in
             inc[["zoom", "tx", "ty", "tile"]].itertuples(index=False)}
        b = {tuple(k): bytes(t) for *k, t in
             fsub[["zoom", "tx", "ty", "tile"]].itertuples(index=False)}
        assert a == b
        # and incremental ≪ full: unchanged tiles are never rebuilt
        assert len(inc) < len(full)

    def test_diff_sink_resume(self, ray_session, tmp_path):
        import json
        import os

        import ray.data

        from overmatch_ray.stages.enrich import match_diff
        from overmatch_ray.state.checkpoint import (
            read_partitioned,
            write_partitioned_resumable,
        )

        old_t = self._matches()
        new_t = self._perturb(old_t)
        diff = match_diff(
            ray.data.from_arrow(old_t).repartition(3),
            ray.data.from_arrow(new_t).repartition(4),
        ).map_batches(
            lambda b: b.append_column(
                "part", pa.array(
                    [int(s.rsplit("/", 1)[1]) % 4
                     for s in b["osm_id"].to_pylist()],
                    pa.int64(),
                )
            ),
            batch_format="pyarrow",
        )
        out = str(tmp_path / "diff_sink")
        write_partitioned_resumable(diff, out, "part").materialize()
        # simulate a crash: drop one partition + its manifest
        os.remove(os.path.join(out, "part-1.parquet"))
        os.remove(os.path.join(out, "_manifest", "1.json"))
        before = {f: os.path.getmtime(os.path.join(out, f))
                  for f in os.listdir(out) if f.endswith(".parquet")}
        receipts = write_partitioned_resumable(diff, out, "part").to_pandas()
        # only the missing partition was rewritten
        assert sorted(receipts["key"].tolist()) == [1]
        for f, mt in before.items():
            assert os.path.getmtime(os.path.join(out, f)) == mt
        back = read_partitioned(out).to_pandas()
        want = match_diff(
            ray.data.from_arrow(old_t).repartition(3),
            ray.data.from_arrow(new_t).repartition(4),
        ).to_pandas()
        assert len(back) == len(want)
        assert (
            sorted(zip(back.osm_id, back.overture_id, back.change_type))
            == sorted(zip(want.osm_id, want.overture_id, want.change_type))
        )


class TestPMTilesDedup:
    def test_identical_tiles_stored_once_and_run_length_coalesced(
        self, ray_session, tmp_path
    ):
        """PMTiles v3 dedup + run-length: adjacent tiles with identical
        payloads collapse to one content blob and one run-length entry;
        every addressed tile still reads back byte-exact."""
        import ray.data

        from overmatch_ray.stages.pmtiles import (
            read_pmtiles_tile,
            write_pmtiles,
            zxy_to_tileid,
        )

        same = b"\x1a\x05ditto"  # one shared payload
        uniq = [b"\x1a\x06tile-%d" % i for i in range(3)]
        # z2: 8 adjacent-in-Hilbert tiles share `same`; 3 others unique
        rows = []
        tids = []
        for x in range(4):
            for y in range(2):
                rows.append((2, x, y, same))
        for i, (x, y) in enumerate([(3, 2), (0, 3), (3, 3)]):
            rows.append((2, x, y, uniq[i]))
        t = pa.table({
            "zoom": pa.array([r[0] for r in rows], pa.int64()),
            "tx": pa.array([r[1] for r in rows], pa.int64()),
            "ty": pa.array([r[2] for r in rows], pa.int64()),
            "mvt": pa.array([r[3] for r in rows], pa.large_binary()),
        })
        path = str(tmp_path / "dedup.pmtiles")
        stats = write_pmtiles(ray.data.from_arrow(t), path)
        assert stats["n_tiles"] == len(rows)
        assert stats["n_contents"] == 1 + len(uniq)  # dedup engaged
        assert stats["n_entries"] < stats["n_tiles"]  # RLE engaged
        for z, x, y, mvt in rows:
            assert read_pmtiles_tile(path, z, x, y) == mvt
        assert read_pmtiles_tile(path, 2, 1, 3) is None


class TestRasterHeatTiles:
    @staticmethod
    def _points(n=4000, seed=11):
        rng = np.random.RandomState(seed)
        lon = -77.05 + rng.rand(n) * 0.02
        lat = 38.85 + rng.rand(n) * 0.02
        return lon, lat

    def test_pixel_exact_and_partition_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.imaging.codec import decode_png
        from overmatch_ray.stages.tiles import build_raster_heat_tiles, tile_xy

        lon, lat = self._points()
        t = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
        zoom = 14
        fx, fy = tile_xy(lon, lat, zoom + 8)
        fx, fy = fx.astype(np.int64), fy.astype(np.int64)

        ref: dict = {}
        for x, y in zip(fx, fy):
            key = (int(x) >> 8, int(y) >> 8)
            g = ref.setdefault(key, np.zeros((256, 256), np.int64))
            g[int(y) & 255, int(x) & 255] += 1

        outs = []
        for nblocks in (1, 6):
            rows = build_raster_heat_tiles(
                ray.data.from_arrow(t).repartition(nblocks), zoom
            ).take_all()
            outs.append(
                sorted((r["tx"], r["ty"], r["png"]) for r in rows)
            )
            got = {(r["tx"], r["ty"]): r for r in rows}
            assert set(got) == set(ref)
            for key, grid in ref.items():
                img = decode_png(got[key]["png"])
                want = np.minimum(grid * 32, 255).astype(np.uint8)
                assert (img[:, :, 0] == want).all()
                assert (img[:, :, 1] == want).all()
                assert got[key]["n_points"] == int(grid.sum())
        assert outs[0] == outs[1], "rasters not partition-invariant"

    def test_png_pmtiles_roundtrip(self, ray_session, tmp_path):
        import ray.data

        from overmatch_ray.stages.pmtiles import read_pmtiles_tile, write_pmtiles
        from overmatch_ray.stages.tiles import build_raster_heat_tiles

        lon, lat = self._points(1500, seed=3)
        t = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
        tiles = build_raster_heat_tiles(ray.data.from_arrow(t), 14)
        rows = tiles.take_all()
        path = str(tmp_path / "heat.pmtiles")
        stats = write_pmtiles(
            ray.data.from_items(rows), path, tile_type="png", tile_col="png"
        )
        assert stats["n_tiles"] == len(rows) > 0
        hdr = open(path, "rb").read(127)
        assert hdr[99] == 2 and hdr[98] == 1  # png tiles, compression none
        for r in rows:
            raw = read_pmtiles_tile(path, r["zoom"], r["tx"], r["ty"])
            assert raw == r["png"]


class TestLineTiles:
    @staticmethod
    def _tracks(n_keys=5, pts=40, seed=9):
        rng = np.random.RandomState(seed)
        rows = []
        for k in range(n_keys):
            lon = -77.06 + np.cumsum(rng.randn(pts)) * 2e-4
            lat = 38.84 + np.cumsum(rng.randn(pts)) * 2e-4
            for i in range(pts):
                rows.append((k, i, lon[i], lat[i]))
        return pa.table({
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "seq": pa.array([r[1] for r in rows], pa.int64()),
            "lon": pa.array([r[2] for r in rows], pa.float64()),
            "lat": pa.array([r[3] for r in rows], pa.float64()),
        })

    @staticmethod
    def _brute_segments(t, zoom, extent=4096):
        """All clipped per-tile segments, independent reimplementation."""
        from overmatch_ray.stages.tiles import _clip_segment

        n = float(1 << zoom)
        out = set()
        df = t.to_pandas().sort_values(["key", "seq"])
        for k, g in df.groupby("key"):
            lon = g["lon"].to_numpy(); lat = g["lat"].to_numpy()
            fx = (lon + 180.0) / 360.0 * n
            lr = np.radians(np.clip(lat, -85.051128779807, 85.051128779807))
            fy = (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n
            for i in range(len(g) - 1):
                x0, y0, x1, y1 = fx[i], fy[i], fx[i + 1], fy[i + 1]
                for tx in range(int(min(x0, x1)), int(max(x0, x1)) + 1):
                    for ty in range(int(min(y0, y1)), int(max(y0, y1)) + 1):
                        c = _clip_segment(
                            (x0 - tx) * extent, (y0 - ty) * extent,
                            (x1 - tx) * extent, (y1 - ty) * extent,
                            0.0, float(extent),
                        )
                        if c is None:
                            continue
                        p = tuple(int(np.floor(v + 0.5)) for v in c)
                        if (p[0], p[1]) == (p[2], p[3]):
                            continue
                        out.add((tx, ty, k, i, *p))
        return out

    def test_decode_matches_bruteforce_and_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.stages.mvt import decode_mvt_lines
        from overmatch_ray.stages.tiles import build_line_tiles

        t = self._tracks()
        zoom = 13
        want = self._brute_segments(t, zoom)
        blobs = []
        for nblocks in (1, 6):
            rows = build_line_tiles(
                ray.data.from_arrow(t).repartition(nblocks), zoom
            ).take_all()
            blobs.append(sorted((r["tx"], r["ty"], r["mvt"]) for r in rows))
            got = set()
            for r in rows:
                for f in decode_mvt_lines(r["mvt"]):
                    for part in f["__parts"]:
                        for a, b in zip(part[:-1], part[1:]):
                            got.add((r["tx"], r["ty"], f["key"], None,
                                     a[0], a[1], b[0], b[1]))
            want_nosegidx = {(tx, ty, k, None, *p4)
                             for tx, ty, k, _i, *p4 in want}
            assert got == want_nosegidx
        assert blobs[0] == blobs[1], "line tiles not byte-deterministic"

    def test_clip_segment_properties(self):
        from overmatch_ray.stages.tiles import _clip_segment

        rng = np.random.RandomState(2)
        for _ in range(300):
            x0, y0, x1, y1 = rng.uniform(-200, 4300, 4)
            c = _clip_segment(x0, y0, x1, y1, 0.0, 4096.0)
            if c is None:
                continue
            cx0, cy0, cx1, cy1 = c
            for v in c:
                assert -1e-9 <= v <= 4096 + 1e-9
            # clipped points lie on the original line
            dx, dy = x1 - x0, y1 - y0
            for px, py in ((cx0, cy0), (cx1, cy1)):
                cross = (px - x0) * dy - (py - y0) * dx
                assert abs(cross) < 1e-6 * (abs(dx) + abs(dy) + 1)


class TestHullTiles:
    def test_decode_matches_bruteforce_and_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.stages.mvt import _signed_area2, decode_mvt_polygons
        from overmatch_ray.stages.tiles import _clip_polygon_box, build_hull_tiles
        from overmatch_ray.stages.spatial import convex_hull_xy

        rng = np.random.RandomState(5)
        rows = []
        for k in range(6):
            lon = -77.06 + rng.rand(30) * 0.03 + (k % 2) * 0.01
            lat = 38.84 + rng.rand(30) * 0.03
            for i in range(30):
                rows.append((k, lon[i], lat[i]))
        t = pa.table({
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "lon": pa.array([r[1] for r in rows], pa.float64()),
            "lat": pa.array([r[2] for r in rows], pa.float64()),
        })
        zoom, extent = 13, 4096

        # brute reference: per key hull -> per covered tile clip
        want = {}
        df = t.to_pandas()
        n = float(1 << zoom)
        for k, g in df.groupby("key"):
            lon = g["lon"].to_numpy(); lat = g["lat"].to_numpy()
            fx = (lon + 180.0) / 360.0 * n
            lr = np.radians(np.clip(lat, -85.051128779807, 85.051128779807))
            fy = (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n
            h = convex_hull_xy(fx, fy)
            hx, hy = fx[h], fy[h]
            for tx in range(int(hx.min()), int(hx.max()) + 1):
                for ty in range(int(hy.min()), int(hy.max()) + 1):
                    ring = np.column_stack(
                        [(hx - tx) * extent, (hy - ty) * extent])
                    c = _clip_polygon_box(ring, 0.0, float(extent))
                    if c.shape[0] < 3:
                        continue
                    ir = np.floor(c + 0.5).astype(np.int64)
                    keep = np.ones(ir.shape[0], bool)
                    keep[1:] = (np.diff(ir, axis=0) != 0).any(axis=1)
                    ir = ir[keep]
                    if ir.shape[0] >= 2 and (ir[0] == ir[-1]).all():
                        ir = ir[:-1]
                    if ir.shape[0] < 3:
                        continue
                    want[(tx, ty, int(k))] = {tuple(p) for p in ir.tolist()}

        blobs = []
        for nblocks in (1, 5):
            out = build_hull_tiles(
                ray.data.from_arrow(t).repartition(nblocks), zoom
            ).take_all()
            blobs.append(sorted((r["tx"], r["ty"], r["mvt"]) for r in out))
            got = {}
            for r in out:
                for f in decode_mvt_polygons(r["mvt"]):
                    ring = np.array(f["__rings"][0])
                    assert _signed_area2(ring) > 0  # spec orientation
                    got[(r["tx"], r["ty"], f["key"])] = {
                        tuple(p) for p in ring.tolist()
                    }
            assert got == want
        assert blobs[0] == blobs[1], "hull tiles not byte-deterministic"

    def test_clip_polygon_box_properties(self):
        from overmatch_ray.stages.tiles import _clip_polygon_box

        rng = np.random.RandomState(8)
        for _ in range(200):
            # random convex-ish ring: hull of random points
            from overmatch_ray.stages.spatial import convex_hull_xy

            x = rng.uniform(-1000, 5000, 12)
            y = rng.uniform(-1000, 5000, 12)
            h = convex_hull_xy(x, y)
            if h.size < 3:
                continue
            ring = np.column_stack([x[h], y[h]])
            c = _clip_polygon_box(ring, 0.0, 4096.0)
            for px, py in c:
                assert -1e-6 <= px <= 4096 + 1e-6
                assert -1e-6 <= py <= 4096 + 1e-6


class TestSkewHashJoin:
    def test_parity_with_plain_join_on_skewed_keys(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import bucket_hash_join, skew_hash_join

        rng = np.random.RandomState(4)
        n = 20_000
        # 60% of probe rows share ONE key; rest uniform over 500 keys
        k = np.where(rng.rand(n) < 0.6, 7, rng.randint(0, 500, n)).astype(np.int64)
        left = pa.table({
            "k": pa.array(k),
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        })
        right = pa.table({
            "rk": pa.array(np.arange(500, dtype=np.int64)),
            "rv": pa.array(np.arange(500, dtype=np.int64) * 10),
        })

        def rows(ds):
            return sorted(
                (r["k"], r["lv"], r["rv"]) for r in ds.take_all()
            )

        l4 = ray.data.from_arrow(left).repartition(8)
        r4 = ray.data.from_arrow(right).repartition(2)
        got = rows(skew_hash_join(l4, r4, "k", "rk", hot_denom=100))
        want = rows(bucket_hash_join(l4, r4, "k", "rk"))
        assert got == want and len(got) == n

    def test_no_hot_keys_falls_back(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import skew_hash_join

        left = pa.table({
            "k": pa.array(np.arange(1000, dtype=np.int64) % 997),
            "lv": pa.array(np.arange(1000, dtype=np.int64)),
        })
        right = pa.table({
            "rk": pa.array(np.arange(997, dtype=np.int64)),
            "rv": pa.array(np.arange(997, dtype=np.int64)),
        })
        out = skew_hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "rk", hot_denom=10,
        )
        assert out.count() == 1000

    def test_oversized_hot_right_side_takes_bucketed_path(self, ray_session):
        """When the hot keys' right side exceeds hot_right_limit, the
        broadcast bypass must step aside (the driver stops pulling at the
        cap — it never buffers the oversized side) and the bucketed path
        must still produce the full join."""
        import ray.data

        from overmatch_ray.stages.joins import skew_hash_join

        n = 5_000
        left = pa.table({
            "k": pa.array(np.zeros(n, dtype=np.int64)),  # ONE hot key
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        })
        right = pa.table({
            "rk": pa.array(np.zeros(200, dtype=np.int64)),
            "rv": pa.array(np.arange(200, dtype=np.int64)),
        })
        out = skew_hash_join(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(4),
            "k", "rk", hot_denom=10, hot_right_limit=50,  # 200 > 50
        )
        assert out.count() == n * 200

    def test_float_keys_join_exact(self, ray_session):
        """Float join keys compare EXACT values (bit patterns with -0.0
        normalized): 1.5 must not join 1.2 (the old cast-to-int64 kernel
        truncated both to 1), and -0.0 joins 0.0."""
        import ray.data

        from overmatch_ray.stages.joins import bucket_hash_join

        left = pa.table({
            "k": pa.array([1.5, 1.2, -0.0, 2.25]),
            "lv": pa.array([0, 1, 2, 3], pa.int64()),
        })
        right = pa.table({
            "rk": pa.array([1.5, 0.0, 2.25, 1.0]),
            "rv": pa.array([10, 20, 30, 40], pa.int64()),
        })
        out = bucket_hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "rk", num_buckets=4,
        ).take_all()
        got = sorted((r["lv"], r["rv"]) for r in out)
        assert got == [(0, 10), (2, 20), (3, 30)]  # 1.2 matches nothing

    def test_mixed_int_float_keys_above_2_53(self, ray_session):
        """ADVICE r4: mixed int/float joins compare through float64
        promotion in the kernel, so bucket ROUTING must promote too — an
        int64 key 2^53+1 must meet float64 2^53 (they are equal after
        promotion) instead of hashing to different buckets and silently
        never joining. Both directions, at every bucket count."""
        import ray.data

        from overmatch_ray.stages.joins import (
            bucket_hash_join,
            semi_join_shuffled,
        )

        big = 2**53  # float64(2^53 + 1) == float64(2^53)
        ints = pa.table({
            "k": pa.array([big + 1, big, 7, 2**60 + 3], pa.int64()),
            "lv": pa.array([0, 1, 2, 3], pa.int64()),
        })
        floats = pa.table({
            "rk": pa.array([float(big), 7.0, float(2**60)], pa.float64()),
            "rv": pa.array([10, 20, 30], pa.int64()),
        })
        for nb in (3, 16):
            out = bucket_hash_join(
                ray.data.from_arrow(ints), ray.data.from_arrow(floats),
                "k", "rk", num_buckets=nb,
            ).take_all()
            got = sorted((r["lv"], r["rv"]) for r in out)
            # 2^60+3 rounds to 2^60 under promotion → joins 2^60.0
            assert got == [(0, 10), (1, 10), (2, 20), (3, 30)], got
            # reversed sides: float left, int right
            rev = bucket_hash_join(
                ray.data.from_arrow(floats), ray.data.from_arrow(ints),
                "rk", "k", num_buckets=nb,
            ).take_all()
            got_rev = sorted((r["rv"], r["lv"]) for r in rev)
            assert got_rev == [(10, 0), (10, 1), (20, 2), (30, 3)], got_rev
            # semi join, float left vs int right keys (the broken quadrant)
            semi = semi_join_shuffled(
                ray.data.from_arrow(floats), ray.data.from_arrow(ints),
                "rk", "k", num_buckets=nb,
            ).take_all()
            assert sorted(r["rv"] for r in semi) == [10, 20, 30]


class TestSkewAsofIntervalJoins:
    """VERDICT r4 #8: the Misra-Gries hot-key bypass wired into
    asof_join / interval_join — parity-pinned against the plain bucketed
    path under a 90%-hot-key corpus."""

    @staticmethod
    def _asof_corpus():
        rng = np.random.RandomState(11)
        n = 12_000
        # 90% of left rows under ONE user; a no-right-rows key (777) and
        # null keys exercise LEFT survival on both paths
        u = np.where(rng.rand(n) < 0.9, 5, rng.randint(0, 40, n)).astype(np.int64)
        u[:20] = 777
        t = rng.randint(0, 100_000, n).astype(np.int64)
        left = pa.table({
            "u": pa.array(u).cast(pa.int64()),
            "t": pa.array(t),
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        })
        left = left.set_column(0, "u", pa.array(
            [None if i % 997 == 0 else int(v) for i, v in enumerate(u)],
            pa.int64()))
        m = 3_000
        ru = rng.randint(0, 41, m).astype(np.int64)
        ru[: m // 2] = 5  # the hot key owns half the right side too
        right = pa.table({
            "ru": pa.array(ru),
            "rt": pa.array(rng.randint(0, 100_000, m).astype(np.int64)),
            "rv": pa.array(np.arange(m, dtype=np.int64)),
        })
        return left, right

    def test_asof_hot_key_parity(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import asof_join

        left, right = self._asof_corpus()
        l = ray.data.from_arrow(left).repartition(8)
        r = ray.data.from_arrow(right).repartition(4)

        def rows(ds):
            return sorted(
                ((x["u"] if x["u"] is not None else -1), x["t"], x["lv"],
                 (x["rv"] if x["rv"] is not None else -1))
                for x in ds.take_all()
            )

        got = rows(asof_join(l, r, "t", "rt", "u", "ru", hot_denom=20))
        want = rows(asof_join(l, r, "t", "rt", "u", "ru", hot_denom=None))
        assert got == want and len(got) == left.num_rows

    def test_asof_hot_right_limit_falls_back(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import asof_join

        left, right = self._asof_corpus()
        l = ray.data.from_arrow(left).repartition(4)
        r = ray.data.from_arrow(right).repartition(2)
        # broadcast refused (limit 10 rows) -> identical plain-path result
        out = asof_join(l, r, "t", "rt", "u", "ru", hot_denom=20,
                        hot_right_limit=10)
        assert out.count() == left.num_rows

    def test_interval_hot_cell_parity(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import interval_join

        rng = np.random.RandomState(12)
        n = 12_000
        # 90% of left points inside ONE granule (cell hotspot)
        t = np.where(rng.rand(n) < 0.9,
                     rng.randint(0, 100, n),
                     rng.randint(0, 50_000, n)).astype(np.int64)
        left = pa.table({
            "t": pa.array(t),
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        })
        m = 400
        s = rng.randint(0, 50_000, m).astype(np.int64)
        s[: m // 4] = rng.randint(0, 80, m // 4)  # intervals over the hotspot
        e = s + rng.randint(1, 300, m)
        right = pa.table({
            "s": pa.array(s),
            "e": pa.array(e),
            "rv": pa.array(np.arange(m, dtype=np.int64)),
        })
        l = ray.data.from_arrow(left).repartition(8)
        r = ray.data.from_arrow(right).repartition(2)

        def rows(ds):
            return sorted((x["t"], x["lv"], x["rv"]) for x in ds.take_all())

        got = rows(interval_join(l, r, "t", "s", "e", granule=200,
                                 num_buckets=16, hot_denom=20))
        want = rows(interval_join(l, r, "t", "s", "e", granule=200,
                                  num_buckets=16, hot_denom=None))
        assert got == want and len(got) > 0
