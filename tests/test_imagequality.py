"""Pixel-quality analytics + SSIM near-dup verification (stages/imagequality)."""

import numpy as np
import pyarrow as pa
import pytest

from overmatch_ray.imaging.codec import encode_image, phash64_batch
from overmatch_ray.stages.imagequality import (
    quality_metrics,
    ssim_blocks,
)
from overmatch_ray.synth import images_block

N = 120


@pytest.fixture(scope="module")
def images():
    return images_block(np.arange(N))


class TestQualityMetrics:
    def test_flat_image(self):
        m = quality_metrics(np.full((32, 32, 3), 128, np.uint8))
        assert m["sharpness"] == pytest.approx(0.0, abs=1e-18)
        assert m["brightness"] == pytest.approx(128.0)
        assert m["contrast"] == pytest.approx(0.0, abs=1e-9)
        assert abs(m["entropy"]) == pytest.approx(0.0, abs=1e-12)
        assert m["colorfulness"] == pytest.approx(0.0, abs=1e-9)

    def test_checkerboard_is_sharp(self):
        cb = (((np.indices((32, 32)).sum(axis=0)) % 2) * 255).astype(np.uint8)
        img = np.stack([cb] * 3, axis=-1)
        m = quality_metrics(img)
        assert m["sharpness"] > 1e5  # maximal high-frequency content
        assert m["entropy"] == pytest.approx(1.0)  # two equal-mass bins
        assert m["colorfulness"] == 0.0  # gray

    def test_pure_color_is_colorful(self):
        red = np.zeros((16, 16, 3), np.uint8)
        red[..., 0] = 255
        m = quality_metrics(red)
        assert m["colorfulness"] > 50.0
        assert m["sharpness"] == 0.0

    def test_noise_entropy_near_8(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
        m = quality_metrics(img)
        assert m["entropy"] > 7.0

    def test_tiny_image_no_crash(self):
        m = quality_metrics(np.full((2, 2, 3), 10, np.uint8))
        assert m["sharpness"] == 0.0


class TestSsimBlocks:
    def test_identical_is_one(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 255, (4, 64, 64))
        assert np.allclose(ssim_blocks(a, a.copy()), 1.0)

    def test_unrelated_is_low_and_shifted_is_high(self):
        rng = np.random.default_rng(4)
        a = rng.uniform(0, 255, (1, 64, 64))
        b = rng.uniform(0, 255, (1, 64, 64))
        assert ssim_blocks(a, b)[0] < 0.2
        # small brightness shift: structurally identical
        assert ssim_blocks(a, np.clip(a + 4.0, 0, 255))[0] > 0.9


class TestQualityStats:
    def test_corpus_rows_and_ranges(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.imagequality import quality_stats

        out = quality_stats(
            ray.data.from_arrow(images).repartition(4), concurrency=2,
            batch_size=32,
        ).take_all()
        assert len(out) == N
        assert all(r["decode_ok"] for r in out)
        for r in out:
            assert 0.0 <= r["brightness"] <= 255.0
            assert 0.0 <= r["entropy"] <= 8.0
            assert r["sharpness"] >= 0.0

    def test_corrupt_rows_flagged(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.imagequality import quality_stats

        bad = images.set_column(
            images.schema.get_field_index("bytes"),
            "bytes",
            pa.array([b"junk"] * N, pa.large_binary()),
        )
        out = quality_stats(ray.data.from_arrow(bad), concurrency=1).take_all()
        assert len(out) == N
        assert not any(r["decode_ok"] for r in out)


class TestFilterImages:
    def test_gates_apply(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.imagequality import filter_images

        ds = ray.data.from_arrow(images).repartition(4)
        # permissive gates: the synth corpus (smooth photo-like fields,
        # mid-gray exposure) passes whole
        out = filter_images(
            ds, min_w=1, min_h=1, max_aspect=100.0, min_sharpness=0.0,
            brightness_range=(0.0, 255.0), min_entropy=0.0, concurrency=2,
        )
        rows = out.take_all()
        assert len(rows) == N
        assert "bytes" in out.schema().names  # payload carried for a sink
        # impossible sharpness bar: everything gated
        none = filter_images(ds, min_sharpness=1e12, concurrency=2)
        assert none.count() == 0


class TestSsimVerifyPairs:
    def test_exact_dups_verified_and_unrelated_rejected(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.imagequality import ssim_verify_pairs

        ds = ray.data.from_arrow(images).repartition(4)
        out = ssim_verify_pairs(ds, max_hamming=6, concurrency=2).take_all()
        assert out  # the synth corpus plants exact dups every 17th row
        by_pair = {(r["id_a"], r["id_b"]): r for r in out}
        assert len(by_pair) == len(out)  # pair list is deduplicated
        for r in out:
            assert -1.0 <= r["ssim"] <= 1.0
            if r["hamming"] == 0:  # planted exact duplicate
                assert r["ssim"] == pytest.approx(1.0)
                assert r["verified"]

    def test_given_pairs_ds(self, ray_session):
        """Near-dup (not exact) pair: a mild crop of the same image must
        verify; an unrelated image must not."""
        import ray.data

        from overmatch_ray.stages.imagequality import ssim_verify_pairs

        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, (9, 9)).astype(np.float64)
        yy = np.linspace(0, 8, 80)
        xx = np.linspace(0, 8, 80)
        y0 = np.minimum(yy.astype(int), 7)
        x0 = np.minimum(xx.astype(int), 7)
        fy = (yy - y0)[:, None]
        fx = (xx - x0)[None, :]
        field = (
            base[y0[:, None], x0[None, :]] * (1 - fy) * (1 - fx)
            + base[y0[:, None] + 1, x0[None, :]] * fy * (1 - fx)
            + base[y0[:, None], x0[None, :] + 1] * (1 - fy) * fx
            + base[y0[:, None] + 1, x0[None, :] + 1] * fy * fx
        )
        a = np.stack([field] * 3, axis=-1).clip(0, 255).astype(np.uint8)
        near = a[2:78, 2:78]  # mild crop: same structure
        far = np.stack(
            [rng.integers(0, 256, (80, 80))] * 3, axis=-1
        ).astype(np.uint8)

        imgs = [a, near, far]
        ph = phash64_batch(imgs)
        tbl = pa.table({
            "image_id": pa.array(["a", "b", "c"]),
            "bytes": pa.array([encode_image(i, "png") for i in imgs],
                              pa.large_binary()),
            "w": pa.array([i.shape[1] for i in imgs], pa.int32()),
            "h": pa.array([i.shape[0] for i in imgs], pa.int32()),
            "fmt": pa.array(["png"] * 3),
            "caption": pa.array(["", "", ""]),
            "phash": pa.array(ph, pa.int64()),
        })
        pairs = pa.table({
            "id_a": pa.array(["a", "a"]),
            "id_b": pa.array(["b", "c"]),
            "hamming": pa.array([0, 0], pa.int64()),
        })
        out = ssim_verify_pairs(
            ray.data.from_arrow(tbl),
            pairs_ds=ray.data.from_arrow(pairs),
            concurrency=1,
        ).take_all()
        r = {(x["id_a"], x["id_b"]): x for x in out}
        assert r[("a", "b")]["verified"]
        assert not r[("a", "c")]["verified"]
        assert r[("a", "b")]["ssim"] > 0.8 > r[("a", "c")]["ssim"]

    def test_corrupt_member_pair_survives_unverified(self, ray_session):
        """Contract: EVERY candidate pair emits a row. A pair whose member
        fails decode must come through with ssim null / verified False —
        not silently vanish (unverifiable ≠ never-proposed)."""
        import ray.data

        from overmatch_ray.stages.imagequality import ssim_verify_pairs

        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        blob = encode_image(img, "png")
        ph = phash64_batch([img, img])
        tbl = pa.table({
            "image_id": pa.array(["a", "b", "c"]),
            "bytes": pa.array([blob, blob, b"corrupt"], pa.large_binary()),
            "w": pa.array([40, 40, 40], pa.int32()),
            "h": pa.array([40, 40, 40], pa.int32()),
            "fmt": pa.array(["png"] * 3),
            "caption": pa.array(["", "", ""]),
            "phash": pa.array([ph[0], ph[1], 0], pa.int64()),
        })
        pairs = pa.table({
            "id_a": pa.array(["a", "a"]),
            "id_b": pa.array(["b", "c"]),
            "hamming": pa.array([0, 0], pa.int64()),
        })
        out = ssim_verify_pairs(
            ray.data.from_arrow(tbl),
            pairs_ds=ray.data.from_arrow(pairs),
            concurrency=1,
        ).take_all()
        r = {(x["id_a"], x["id_b"]): x for x in out}
        assert set(r) == {("a", "b"), ("a", "c")}  # no pair dropped
        assert r[("a", "b")]["verified"] and r[("a", "b")]["ssim"] == pytest.approx(1.0)
        assert r[("a", "c")]["ssim"] is None
        assert r[("a", "c")]["verified"] is False


class TestImageEmbeddings:
    def test_unit_norm_and_identical_pixels(self):
        from overmatch_ray.stages.imagequality import image_feature_vector

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        v1 = image_feature_vector(img)
        v2 = image_feature_vector(img.copy())
        assert v1.shape == (74,)
        assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-5)
        assert np.array_equal(v1, v2)  # identical pixels => identical vector
        other = image_feature_vector(255 - img)
        assert float(v1 @ other) < 0.999

    def test_embed_stage_and_knn_finds_planted_dup(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.imagequality import embed_images
        from overmatch_ray.stages.knn import brute_force_topk

        emb = embed_images(
            ray.data.from_arrow(images).repartition(4), concurrency=2
        ).materialize()
        assert emb.count() == N
        # the synth corpus plants an exact duplicate at every 17th row:
        # its nearest neighbor must be its partner at cosine ~1
        queries = pa.Table.from_pylist(
            [r for r in emb.take_all()
             if int(r["vec_id"].rsplit("-", 1)[1]) in (17, 34)]
        )
        out = brute_force_topk(emb, queries, k=1, id_col="vec_id").take_all()
        by_q = {r["query_id"]: r for r in out}
        assert by_q["img-000000000017"]["neighbor_id"] == "img-000000000016"
        assert by_q["img-000000000017"]["cos_sim"] == pytest.approx(1.0)
        assert by_q["img-000000000034"]["neighbor_id"] == "img-000000000033"


class TestBestOfCluster:
    def test_picks_sharpest_member(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.imagequality import best_of_cluster, quality_stats

        ds = ray.data.from_arrow(images).repartition(4)
        # ground truth: per-image sharpness from the same metric path
        sharp = {
            r["image_id"]: r["sharpness"]
            for r in quality_stats(ds, concurrency=2).take_all()
        }
        # synthetic clusters: ids 0-2 -> cluster "c0", ids 3-4 -> "c1"
        members = [f"img-{i:012d}" for i in range(5)]
        clusters = pa.table({
            "image_id": pa.array(members),
            "cluster_id": pa.array(["c0", "c0", "c0", "c1", "c1"]),
        })
        out = best_of_cluster(ds, ray.data.from_arrow(clusters)).take_all()
        got = {r["cluster_id"]: r for r in out}
        assert set(got) == {"c0", "c1"}
        assert got["c0"]["n_members"] == 3
        assert got["c1"]["n_members"] == 2
        best0 = max(members[:3], key=lambda i: (sharp[i], ))
        best1 = max(members[3:5], key=lambda i: (sharp[i], ))
        assert got["c0"]["image_id"] == best0
        assert got["c1"]["image_id"] == best1
        assert got["c0"]["sharpness"] == pytest.approx(sharp[best0])

    def test_corrupt_member_never_representative(self, ray_session):
        """A decode-failed member (sharpness forced 0.0) must not win the
        (sharpness desc, id asc) tiebreak against a legitimate flat image
        that also scores 0.0 — undecodable images can't represent a
        cluster. A cluster of ONLY corrupt members emits no row."""
        import ray.data

        from overmatch_ray.stages.imagequality import best_of_cluster

        flat = np.full((32, 32, 3), 128, np.uint8)  # sharpness exactly 0.0
        tbl = pa.table({
            # corrupt member sorts FIRST on id — the old code picked it
            "image_id": pa.array(["a-corrupt", "b-flat", "z-corrupt"]),
            "bytes": pa.array(
                [b"junk", encode_image(flat, "png"), b"junk"],
                pa.large_binary()),
            "w": pa.array([32, 32, 32], pa.int32()),
            "h": pa.array([32, 32, 32], pa.int32()),
            "fmt": pa.array(["png"] * 3),
            "caption": pa.array(["", "", ""]),
            "phash": pa.array([0, 0, 0], pa.int64()),
        })
        clusters = pa.table({
            "image_id": pa.array(["a-corrupt", "b-flat", "z-corrupt"]),
            "cluster_id": pa.array(["c0", "c0", "c1"]),
        })
        out = best_of_cluster(
            ray.data.from_arrow(tbl), ray.data.from_arrow(clusters)
        ).take_all()
        got = {r["cluster_id"]: r for r in out}
        assert set(got) == {"c0"}  # all-corrupt c1 emits nothing
        assert got["c0"]["image_id"] == "b-flat"
        assert got["c0"]["n_members"] == 1  # decodable members only
