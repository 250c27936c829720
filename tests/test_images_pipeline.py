"""Ray-side image pipeline tests: decode/validate actor stage, dedup, cells."""

import numpy as np
import pyarrow as pa
import pytest

from overmatch_ray.synth import images_block

N = 120


@pytest.fixture(scope="module")
def images():
    return images_block(np.arange(N))


class TestDecodeValidate:
    def test_all_valid(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.images import decode_validate

        out = decode_validate(
            ray.data.from_arrow(images).repartition(4), concurrency=2, batch_size=32
        ).take_all()
        assert len(out) == N
        assert all(r["decode_ok"] for r in out)
        assert all(r["phash_ok"] for r in out)
        # lossless: decoded phash identical; lossy: within tolerance
        assert all(
            r["phash_hamming"] == 0 for r in out if r["fmt"] == "png"
        )
        lossy = [r for r in out if r["fmt"] == "jpeg"]
        assert lossy and all(r["roundtrip_psnr"] >= 40.0 for r in lossy)
        # captions byte-equal per row (input_hint invariant)
        caps = {r["image_id"]: r["caption"] for r in out}
        for r in images.to_pylist():
            assert caps[r["image_id"]] == r["caption"]

    def test_corrupt_rows_quarantined(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.images import decode_validate

        bad = images.set_column(
            images.schema.get_field_index("bytes"),
            "bytes",
            pa.array([b"garbage"] * N, pa.large_binary()),
        )
        out = decode_validate(ray.data.from_arrow(bad), concurrency=1).take_all()
        assert len(out) == N  # quarantined, not dropped
        assert not any(r["decode_ok"] for r in out)
        assert all(r["error"] for r in out)


class TestDedup:
    def test_exact(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.images import dedup_exact

        out = dedup_exact(ray.data.from_arrow(images)).take_all()
        n_unique_phash = len(set(images["phash"].to_pylist()))
        assert len(out) == n_unique_phash
        dups = [r for r in out if r["dup_count"] > 0]
        assert dups, "corpus should contain exact duplicates (every 17th row)"
        # deterministic representative: lexicographically-first id per group
        from collections import defaultdict

        groups = defaultdict(list)
        for i, p in zip(images["image_id"].to_pylist(), images["phash"].to_pylist()):
            groups[p].append(i)
        for r in dups:
            assert r["image_id"] == min(groups[r["phash"]])

    def test_near_dup_pairs(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.images import near_dup_pairs

        pairs = near_dup_pairs(ray.data.from_arrow(images), max_hamming=6).take_all()
        keys = {(r["id_a"], r["id_b"]) for r in pairs}
        assert len(keys) == len(pairs), "pair dedup across bands failed"
        # all exact-dup pairs must be found (hamming 0 ⇒ all bands collide)
        ids = images["image_id"].to_pylist()
        ph = images["phash"].to_pylist()
        expected = {
            tuple(sorted((ids[i], ids[i + 1])))
            for i in range(N - 1)
            if ph[i] == ph[i + 1]
        }
        assert expected and expected <= keys


class TestCells:
    def test_assign(self, ray_session, images):
        import ray.data

        from overmatch_ray.stages.images import assign_cells

        out = assign_cells(ray.data.from_arrow(images), num_buckets=32).take_all()
        assert len(out) == N
        assert all(0 <= r["bucket"] < 32 for r in out)
        assert all("cell" in r for r in out)


class TestFrameSample:
    def test_sampling(self, ray_session):
        import ray.data

        from overmatch_ray.imaging.codec import encode_video_avi, video_frame_count
        from overmatch_ray.stages.images import sample_frames

        rng = np.random.default_rng(4)
        vids = []
        for v in range(6):
            frames = [
                rng.integers(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(17)
            ]
            vids.append(encode_video_avi(frames))
        t = pa.table(
            {
                "video_id": pa.array([f"vid-{v}" for v in range(6)]),
                "bytes": pa.array(vids, pa.large_binary()),
            }
        )
        assert video_frame_count(vids[0]) == 17
        out = sample_frames(
            ray.data.from_arrow(t), stride=5, max_frames=3, concurrency=1
        ).take_all()
        # 17 frames, stride 5 → indices 0,5,10,15 but max_frames=3 → 0,5,10
        per_vid = {}
        for r in out:
            per_vid.setdefault(r["video_id"], []).append(r["frame_index"])
        assert all(sorted(v) == [0, 5, 10] for v in per_vid.values())
        assert len(per_vid) == 6
        assert all(r["w"] == 10 and r["h"] == 12 for r in out)
        assert all(r["error"] is None for r in out)

    def test_corrupt_containers_quarantined(self, ray_session):
        """ADVICE r1: a quarantined video must emit ONLY the frame_index=-1
        sentinel (partial frames dropped), valid videos no sentinel — and a
        corrupt tail AFTER max_frames sampled frames must not quarantine a
        video whose sampled frames all decoded fine."""
        import ray.data

        from overmatch_ray.imaging.codec import encode_video_avi
        from overmatch_ray.stages.images import sample_frames

        rng = np.random.default_rng(7)
        frames = [
            rng.integers(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(17)
        ]
        good = encode_video_avi(frames)
        bad_magic = b"RIFX" + good[4:]
        # truncate mid-movi: the RIFF walk hits an out-of-bounds chunk
        truncated = good[: len(good) // 3]
        # corrupt only the TAIL in place (same length, bit-rot style):
        # stride=5, max_frames=3 samples frames 0,5,10 and stops after
        # yielding frame 11's header — garbage from frame 12's '00dc'
        # chunk on must not affect the result (lazy container walk)
        occ = -1
        for _ in range(13):  # 13th '00dc' tag = frame 12 (idx1 comes later)
            occ = good.index(b"00dc", occ + 1)
        tail_corrupt = good[:occ] + b"\xff" * (len(good) - occ)
        t = pa.table(
            {
                "video_id": pa.array(["ok", "badmagic", "trunc", "tail"]),
                "bytes": pa.array(
                    [good, bad_magic, truncated, tail_corrupt], pa.large_binary()
                ),
            }
        )
        out = sample_frames(
            ray.data.from_arrow(t), stride=5, max_frames=3, concurrency=1
        ).take_all()
        per_vid = {}
        for r in out:
            per_vid.setdefault(r["video_id"], []).append(r)
        assert sorted(r["frame_index"] for r in per_vid["ok"]) == [0, 5, 10]
        assert all(r["error"] is None for r in per_vid["ok"])
        for bad in ("badmagic", "trunc"):
            assert len(per_vid[bad]) == 1, f"{bad}: partial rows must be dropped"
            (row,) = per_vid[bad]
            assert row["frame_index"] == -1 and row["error"]
        # tail corruption past the sampling window: fully valid result
        assert sorted(r["frame_index"] for r in per_vid["tail"]) == [0, 5, 10]
        assert all(r["error"] is None for r in per_vid["tail"])


class TestImageDedupClusters:
    def test_pairs_consistent_and_deterministic(self, ray_session):
        from overmatch_ray.pipelines.rows_only import (
            q_image_dedup_clusters,
            q_image_neardup_pairs,
        )

        sf = "/root/testdata/sf0.001"
        pairs = q_image_neardup_pairs(sf).to_pandas()
        cl = q_image_dedup_clusters(sf).to_pandas()
        cmap = dict(zip(cl.image_id, cl.cluster_id))
        assert len(cl) > 0
        # every paired image is clustered, and pair endpoints agree
        for a, b in zip(pairs.id_a, pairs.id_b):
            assert cmap[a] == cmap[b]
        # cluster label = lexicographically smallest member (img-%012d
        # preserves numeric order)
        for img, c in cmap.items():
            assert c <= img
        cl2 = q_image_dedup_clusters(sf).to_pandas()
        assert cl.sort_values("image_id").reset_index(drop=True).equals(
            cl2.sort_values("image_id").reset_index(drop=True)
        )


class TestTileMosaic:
    def test_deterministic_and_capped(self, ray_session):
        from overmatch_ray.pipelines.rows_only import q_tile_mosaic

        sf = "/root/testdata/sf0.001"
        a = q_tile_mosaic(sf).to_pandas().sort_values(
            ["tx", "ty", "mosaic_rank"]).reset_index(drop=True)
        b = q_tile_mosaic(sf).to_pandas().sort_values(
            ["tx", "ty", "mosaic_rank"]).reset_index(drop=True)
        assert a.equals(b)
        assert len(a) > 0
        per_tile = a.groupby(["tx", "ty"]).size()
        assert per_tile.max() <= 4
        # within a tile, representatives are the (phash, id)-smallest
        for (_, _), g in a.groupby(["tx", "ty"]):
            keys = list(zip(g.phash, g.image_id))
            assert keys == sorted(keys)
            assert list(g.mosaic_rank) == list(range(1, len(g) + 1))


class TestAspectBatches:
    def test_meta_block_matches_full_synth(self):
        import numpy as np

        from overmatch_ray.synth import images_block, images_meta_block

        idx = np.arange(0, 120, dtype=np.int64)
        full = images_block(idx).select(["image_id", "w", "h"])
        meta = images_meta_block(idx)
        assert full.equals(meta)

    def test_query_matches_direct_computation(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from overmatch_ray.pipelines.rows_only import (
            _ASPECT_BUCKETS, q_aspect_batches)
        from overmatch_ray.synth import images_meta_block

        sf = "/root/testdata/sf0.001"
        got = q_aspect_batches(sf).to_pandas().reset_index(drop=True)

        idx = np.sort(
            pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ].to_numpy(zero_copy_only=False)
        )
        t = images_meta_block(idx)
        w = t["w"].to_numpy().astype(float)
        h = t["h"].to_numpy().astype(float)
        logs = np.log(np.array([r for _, r in _ASPECT_BUCKETS]))
        ab = np.argmin(np.abs(np.log(w / h)[:, None] - logs[None, :]), axis=1)
        frames = []
        for bi, (name, _) in enumerate(_ASPECT_BUCKETS):
            ids = idx[ab == bi]
            rank = np.arange(len(ids), dtype=np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "image_id": [f"img-{i:012d}" for i in ids],
                        "aspect_bucket": name,
                        "batch_id": rank // 32,
                        "pos_in_batch": rank % 32,
                    }
                )
            )
        want = (
            pd.concat(frames)
            .sort_values(
                ["aspect_bucket", "batch_id", "pos_in_batch"],
                kind="mergesort",
            )
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestAugment:
    def test_pixel_parity_and_determinism(self, ray_session):
        import ray.data

        from overmatch_ray.imaging.codec import decode_png
        from overmatch_ray.stages.images import Augment, augment_images
        from overmatch_ray.synth import images_block

        t = images_block(np.arange(40, dtype=np.int64), n_total=40)
        runs = []
        for nblocks in (1, 4):
            ds = ray.data.from_arrow(t).repartition(nblocks)
            rows = {r["image_id"]: r
                    for r in augment_images(ds, batch_size=8).take_all()}
            runs.append({k: (v["aug_phash"], v["aug_bytes"]) for k, v in rows.items()})
            src = {iid: (blob, fmt) for iid, blob, fmt in zip(
                t["image_id"].to_pylist(), t["bytes"].to_pylist(),
                t["fmt"].to_pylist())}
            from overmatch_ray.imaging.codec import decode_image

            ops_seen = set()
            for iid, r in rows.items():
                assert r["aug_ok"]
                img = decode_image(*src[iid])
                hflip, vflip, cf = Augment.plan(iid, 0.8)
                if hflip:
                    img = img[:, ::-1]
                if vflip:
                    img = img[::-1]
                if cf < 1.0:
                    h, w = img.shape[:2]
                    ch, cw = max(1, int(h * cf)), max(1, int(w * cf))
                    img = img[(h - ch) // 2:(h - ch) // 2 + ch,
                              (w - cw) // 2:(w - cw) // 2 + cw]
                got = decode_png(r["aug_bytes"])
                assert (got == img).all(), iid
                ops_seen.add(r["aug_ops"])
            assert len(ops_seen) > 2  # the plan actually varies
        assert runs[0] == runs[1], "augmentation not partition-invariant"


class TestShotBoundaries:
    def test_detects_planted_cuts_and_quarantines(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from overmatch_ray.imaging.codec import encode_video_avi
        from overmatch_ray.stages.images import detect_shot_cuts

        def video(cuts, n=10, base0=40, jump=60):
            frames = []
            for f in range(n):
                scene = sum(f >= c for c in cuts)
                frames.append(
                    np.full((16, 16, 3), np.uint8(base0 + jump * scene),
                            np.uint8)
                )
            return encode_video_avi(frames)

        t = pa.table({
            "video_id": pa.array(["a", "b", "bad"], pa.string()),
            "bytes": pa.array(
                [video([3, 7]), video([]), b"RIFFgarbage"],
                pa.large_binary(),
            ),
        })
        rows = detect_shot_cuts(
            ray.data.from_arrow(t), threshold=30.0, concurrency=2,
            batch_size=2,
        ).take_all()
        got = {}
        for r in rows:
            got.setdefault(r["video_id"], []).append(r["cut_frame"])
        assert sorted(got["a"]) == [3, 7]
        assert "b" not in got, "no cuts in a single-scene video"
        assert got["bad"] == [-1], "corrupt container → sentinel row"
