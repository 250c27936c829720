"""Image-axis stages (graft M24/D4/J6): decode/validate, features, dedup.

The input is the input_hint table
(image_id, bytes, w, h, fmt, caption, phash [, lon, lat]). Design rules from
the brief: bytes stay ``large_binary`` in Arrow batches end-to-end, batches
are small (binary payloads), decode runs in an ACTOR POOL (state — the DCT
basis and codec dispatch — built once per actor in __init__), and nothing
converts to pandas.

Stages:
- ``DecodeValidate`` (actor pool): decode per ``fmt``, check the decoded
  shape against (h, w), re-encode/decode roundtrip PSNR (≥40 dB for the
  lossy path — the runtime analog of the input_hint pixel invariant),
  recompute the perceptual hash from decoded pixels and compare to the
  stored ``phash`` column (Hamming ≤ 6). Emits validation + feature
  columns; never drops rows (bad rows are flagged, error-quarantine style —
  SURVEY.md §4 retries note).
- exact dedup (D4): groupby(phash) → keep lexicographically-first image_id,
  count duplicates.
- near-dup candidates: 4×16-bit Hamming bands of phash → explode to
  (band, band_val) rows → groupby → pairs → exact Hamming verify. Two
  images within ``max_hamming`` share ≥1 band with high probability at
  small distances (LSH-style banding).
- cell assignment (J6): same grid-cell encode as the conflation join, so
  images co-partition with features for downstream spatial ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..imaging.codec import encode_image, hamming64, psnr


class DecodeValidate:
    """Actor-pool map_batches callable (stateful stage T5).

    ``max_hamming`` is the LOSSY-ROUNDTRIP phash budget (decoded pixels
    vs the stored source-pixel phash): 10 bits — the measured ceiling of
    JPEG quantization noise over the corpus (median-threshold hashes flip
    near-tied low-frequency coefficients in pairs). Distinct from the
    near-dup BAND threshold (6), which compares source phashes only."""

    def __init__(self, max_hamming: int = 10, min_psnr_db: float = 40.0,
                 select: list | None = None, psnr_sample: int = 1):
        # per-actor state: warm the DCT basis once (module-level lazy const)
        from ..imaging import codec as _codec

        self._codec = _codec
        self.max_hamming = max_hamming
        self.min_psnr_db = min_psnr_db
        # optional output projection, applied INSIDE the actor so no extra
        # task-pool stage competes with the pool for CPUs
        self.select = select
        # check the lossy roundtrip-PSNR invariant on every n-th lossy row
        # (the roundtrip re-encodes + re-decodes — 3× codec work); 1 = every
        # row (default, the strict per-row invariant), bench uses sampling
        self.psnr_sample = max(1, psnr_sample)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import decode_image_batch, decode_jpeg_batch

        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        stored_ph = np.asarray(batch["phash"].to_numpy(zero_copy_only=False))

        n = len(blobs)
        ok = np.zeros(n, dtype=bool)
        dec_ph = np.zeros(n, dtype=np.int64)
        psnrs = np.full(n, np.inf)
        mean_rgb = np.zeros((n, 3), dtype=np.float64)
        errors: list[str | None] = [None] * n

        # phase 1 — decode: JPEGs lane-parallel batched, PNGs scalar;
        # per-image failures come back as Exception objects
        imgs = decode_image_batch(blobs, fmts)

        # phase 2 — shape gate + collect the sampled lossy roundtrips
        rt_idx: list[int] = []
        for i in range(n):
            r = imgs[i]
            if isinstance(r, Exception):
                errors[i] = f"{type(r).__name__}: {r}"
                continue
            if r.shape != (hs[i], ws[i], 3):
                errors[i] = (
                    f"ValueError: shape {r.shape} != ({hs[i]}, {ws[i]}, 3)"
                )
                continue
            if fmts[i] != "png" and i % self.psnr_sample == 0:
                rt_idx.append(i)
        # re-encode the sampled set in one batched pass (bit-identical to
        # per-image encode_image); scalar fallback keeps per-image
        # quarantine if the batch path rejects one
        rt_blobs: list[bytes] = []
        if rt_idx:
            from ..imaging.codec import encode_jpeg_batch

            try:
                rt_blobs = encode_jpeg_batch([imgs[i] for i in rt_idx])
            except Exception:
                kept = []
                for i in rt_idx:
                    try:
                        rt_blobs.append(encode_image(imgs[i], fmts[i]))
                        kept.append(i)
                    except Exception as e:
                        errors[i] = f"{type(e).__name__}: {e}"
                rt_idx = kept

        # phase 3 — roundtrip PSNR invariant (≥ 40 dB), decoded batched
        for i, rr in zip(rt_idx, decode_jpeg_batch(rt_blobs)):
            if isinstance(rr, Exception):
                errors[i] = f"{type(rr).__name__}: {rr}"
                continue
            psnrs[i] = psnr(imgs[i], rr)
            if psnrs[i] < self.min_psnr_db:
                errors[i] = f"ValueError: roundtrip psnr {psnrs[i]:.1f} dB"

        # phase 4 — features for surviving rows (phash batched: one DCT /
        # median / pack kernel across the batch, identical values)
        from ..imaging.codec import phash64_batch

        live = [i for i in range(n) if errors[i] is None]
        if live:
            dec_ph[live] = phash64_batch([imgs[i] for i in live])
        for i in live:
            img = imgs[i]
            # two-stage integer sum: exact same float64 value as
            # .mean(axis=0) (uint8 sums are exact integers), ~15× cheaper
            mean_rgb[i] = img.sum(axis=0, dtype=np.uint32).sum(
                axis=0, dtype=np.int64
            ) / (img.shape[0] * img.shape[1])
            ok[i] = True

        ham = hamming64(dec_ph, stored_ph)
        phash_ok = ok & (ham <= self.max_hamming)
        out = (
            batch.append_column("decode_ok", pa.array(ok))
            .append_column("phash_decoded", pa.array(dec_ph))
            .append_column("phash_hamming", pa.array(ham))
            .append_column("phash_ok", pa.array(phash_ok))
            .append_column("roundtrip_psnr", pa.array(psnrs))
            .append_column("mean_r", pa.array(mean_rgb[:, 0]))
            .append_column("mean_g", pa.array(mean_rgb[:, 1]))
            .append_column("mean_b", pa.array(mean_rgb[:, 2]))
            .append_column("error", pa.array(errors, pa.string()))
        )
        if self.select:
            out = out.select(self.select)
        return out


def decode_validate(images_ds, concurrency=(2, 8), batch_size: int = 256,
                    select: list | None = None, psnr_sample: int = 1):
    """Wire the actor pool. Small batches: payloads are binary-heavy."""
    return images_ds.map_batches(
        DecodeValidate,
        fn_constructor_kwargs={"select": select, "psnr_sample": psnr_sample},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def dedup_exact(images_ds, key: str = "phash", id_col: str = "image_id",
                num_buckets: int = 32):
    """D4 exact dedup: one row per distinct key with the deterministic
    representative (min id) and the duplicate count.

    Bucketed, not ``groupby(key).aggregate(...)``: Ray's sort-based
    aggregate reduce combines GROUPS in Python (~30 µs each — measured
    7-10 s for 224k mostly-singleton phash groups at 16 CPUs, and
    SLOWER with fewer blocks since reduce parallelism shrinks). The
    bucketed plan shuffles the same (key, id) rows once by
    ``hash(key) % B`` and runs ONE vectorized pandas groupby per bucket
    (C-speed): same output, the per-group constant gone (~7 s → ~2 s on
    the same input). Same posture as every other high-cardinality group
    op in this engine (CLAUDE.md rule; ``groupops.bucketed_group_apply``).
    """
    import pandas as pd

    from .groupops import bucketed_group_apply

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(key, sort=True, dropna=False).agg(
            **{id_col: (id_col, "min")}, __n=(id_col, "size")
        ).reset_index()
        agg["dup_count"] = (agg.pop("__n") - 1).astype(np.int64)
        return agg

    return bucketed_group_apply(
        images_ds.select_columns([key, id_col]), [key], kernel,
        num_buckets=num_buckets,
    )


def _band_explode(batch: pa.Table, bands: int = 4) -> pa.Table:
    ph = np.asarray(batch["phash"].to_numpy(zero_copy_only=False)).view(np.uint64)
    ids = batch["image_id"]
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    parts = []
    for b in range(bands):
        val = ((ph >> np.uint64(b * width)) & mask).astype(np.int64)
        parts.append(
            pa.table(
                {
                    "band": pa.array(np.full(len(val), b, dtype=np.int8)),
                    "band_val": pa.array(val),
                    "image_id": ids,
                    "phash": batch["phash"],
                }
            )
        )
    return pa.concat_tables(parts)


def _bucket_band_pairs(g, max_hamming: int, max_group: int = 10_000):
    """Whole-bucket pair generation: recover (band, band_val) runs with
    numpy, emit verified pairs for every run — no per-group dispatch."""
    import pandas as pd

    from .groupops import group_pair_indices

    g = g.sort_values(["band", "band_val", "image_id"], kind="mergesort")
    run = (
        (g[["band", "band_val"]] != g[["band", "band_val"]].shift())
        .any(axis=1)
        .cumsum()
        .to_numpy()
    )
    ia, ib = group_pair_indices(run, max_group)
    if ia.size == 0:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=object), "id_b": pd.Series(dtype=object),
             "hamming": pd.Series(dtype=np.int64)}
        )
    ids = g["image_id"].to_numpy()
    ph = g["phash"].to_numpy()
    ham = hamming64(ph[ia], ph[ib])
    m = ham <= max_hamming
    a, b = ids[ia[m]], ids[ib[m]]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pd.DataFrame({"id_a": lo, "id_b": hi, "hamming": ham[m].astype(np.int64)})


def near_dup_pairs(images_ds, max_hamming: int = 6, bands: int = 4,
                   num_buckets: int = 32):
    """Banded-Hamming near-duplicate pairs (verified exactly), deduplicated
    across bands. Both group steps run bucketed+vectorized."""
    from .groupops import bucketed_group_apply, dedup_pairs

    exploded = images_ds.map_batches(
        lambda b: _band_explode(b, bands), batch_format="pyarrow"
    )
    pairs = bucketed_group_apply(
        exploded,
        ["band", "band_val"],
        lambda g: _bucket_band_pairs(g, max_hamming),
        num_buckets=num_buckets,
    )
    return dedup_pairs(pairs, num_buckets=num_buckets)


class Resize:
    """Actor-pool thumbnail stage (the 'resize / feature-extract' member of
    the multimodal stage family): decode → area-mean resample to a fixed
    square → re-encode PNG. State (target size, DCT warm) per actor."""

    def __init__(self, size: int = 32):
        from ..imaging.codec import _resize_area  # warm import per actor

        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import _resize_area, decode_image_batch, encode_png

        srcs = decode_image_batch(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        )
        thumbs = []
        ok = []
        for img in srcs:
            try:
                if isinstance(img, Exception):
                    raise img
                small = np.stack(
                    [_resize_area(img[..., c].astype(np.float64), self.size)
                     for c in range(3)],
                    axis=-1,
                ).clip(0, 255).astype(np.uint8)
                thumbs.append(encode_png(small))
                ok.append(True)
            except Exception:
                thumbs.append(None)
                ok.append(False)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "thumb_png": pa.array(thumbs, pa.large_binary()),
                "thumb_w": pa.array(
                    np.full(batch.num_rows, self.size, np.int32)),
                "thumb_h": pa.array(
                    np.full(batch.num_rows, self.size, np.int32)),
                "resize_ok": pa.array(ok),
            }
        )


def resize_images(images_ds, size: int = 32, concurrency=(2, 8),
                  batch_size: int = 128):
    return images_ds.map_batches(
        Resize,
        fn_constructor_kwargs={"size": size},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def assign_cells(images_ds, num_buckets: int = 128):
    """J6: images → same cell/bucket space as the conflation join."""
    from .cellindex import encode_cells_batch

    return images_ds.map_batches(
        lambda b: encode_cells_batch(b, num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
    )


class FrameSample:
    """Actor-pool frame-sampling stage (the video member of the multimodal
    family): take every ``stride``-th frame of each AVI/MJPEG payload
    (imaging.codec's real RIFF demuxer + baseline-JPEG decoder), decode only
    the sampled frames, emit one row per sampled frame with its phash.
    Container-level seeking means skipped frames are never entropy-decoded."""

    def __init__(self, stride: int = 5, max_frames: int = 8):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import (decode_jpeg_batch, iter_video_frames,
                                     phash64_batch)

        # pass 1 — demux only (container-level seeking, no pixel work):
        # collect every sampled frame's jpeg bytes across the whole batch
        vids = batch["video_id"].to_pylist()
        picked: list[list] = []  # per video: [(frame_index, jpg_bytes)]
        errs: list[str | None] = [None] * len(vids)
        for vi, blob in enumerate(batch["bytes"].to_pylist()):
            rows: list = []
            try:
                for i, jpg in iter_video_frames(blob):
                    if len(rows) >= self.max_frames:
                        break  # stop reading the container entirely
                    if i % self.stride:
                        continue
                    rows.append((i, jpg))
            except Exception as e:  # quarantine bad containers
                rows = []
                errs[vi] = f"{type(e).__name__}: {e}"
            picked.append(rows)
        # pass 2 — one batched decode over every sampled frame of every
        # video; a decode failure quarantines its WHOLE video (a video is
        # either fully sampled or a single frame_index=-1 sentinel row,
        # never a mix — ADVICE r1), identical error text to the scalar path
        flat = [jpg for rows in picked for (_i, jpg) in rows]
        decoded = decode_jpeg_batch(flat)
        vid_ids, frame_idx, hashes, ws, hs = [], [], [], [], []
        errors: list[str | None] = []
        pos = 0
        for vi, vid in enumerate(vids):
            rows = picked[vi]
            imgs = decoded[pos:pos + len(rows)]
            pos += len(rows)
            err = errs[vi]
            if err is None:
                for r in imgs:
                    if isinstance(r, Exception):
                        err = f"{type(r).__name__}: {r}"
                        break
            if err is not None:
                vid_ids.append(vid)
                frame_idx.append(-1)
                hashes.append(0)
                ws.append(0)
                hs.append(0)
                errors.append(err)
            else:
                phs = phash64_batch(imgs)
                for (i, _jpg), img, ph in zip(rows, imgs, phs):
                    vid_ids.append(vid)
                    frame_idx.append(i)
                    hashes.append(int(ph))
                    ws.append(img.shape[1])
                    hs.append(img.shape[0])
                    errors.append(None)
        return pa.table(
            {
                "video_id": pa.array(vid_ids, pa.string()),
                "frame_index": pa.array(frame_idx, pa.int64()),
                "phash": pa.array(hashes, pa.int64()),
                "w": pa.array(np.array(ws, np.int32)),
                "h": pa.array(np.array(hs, np.int32)),
                "error": pa.array(errors, pa.string()),
            }
        )


def sample_frames(videos_ds, stride: int = 5, max_frames: int = 8,
                  concurrency=(2, 8), batch_size: int = 32):
    """Wire the frame-sampling actor pool (small batches: video payloads)."""
    return videos_ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ShotBoundaries:
    """Shot-cut detection over AVI/MJPEG payloads — the temporal-
    segmentation member of the video family: demux + decode every frame
    (imaging.codec's real RIFF demuxer + baseline-JPEG decoder), compute
    each frame's mean gray level, and emit a cut row at every frame whose
    mean jumps more than ``threshold`` gray levels from its predecessor
    (the classic intensity-delta detector; histogram variants ride the
    same scaffold). Output one row per detected cut: (video_id,
    cut_frame). A corrupt container quarantines its whole video as a
    single ``cut_frame = -1`` sentinel row (the FrameSample convention)."""

    def __init__(self, threshold: float = 30.0):
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import decode_jpeg_batch, iter_video_frames

        vids = batch["video_id"].to_pylist()
        out_vid: list = []
        out_cut: list = []
        for vid, blob in zip(vids, batch["bytes"].to_pylist()):
            try:
                jpgs = [jpg for _i, jpg in iter_video_frames(blob)]
                imgs = decode_jpeg_batch(jpgs)
                means = np.array([
                    im.astype(np.int64).sum() / im.size for im in imgs
                ])
            except Exception:
                out_vid.append(vid)
                out_cut.append(-1)
                continue
            if means.size >= 2:
                cuts = np.flatnonzero(
                    np.abs(np.diff(means)) > self.threshold
                ) + 1
                out_vid.extend([vid] * cuts.size)
                out_cut.extend(cuts.tolist())
        return pa.table({
            "video_id": pa.array(out_vid, pa.string()),
            "cut_frame": pa.array(np.asarray(out_cut, dtype=np.int64)),
        })


def detect_shot_cuts(videos_ds, threshold: float = 30.0,
                     concurrency=(2, 8), batch_size: int = 32):
    """Wire the shot-boundary actor pool (small batches: video payloads)."""
    return videos_ds.map_batches(
        ShotBoundaries,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def caption_consistency(
    images_ds,
    id_col: str = "image_id",
    key: str = "phash",
    caption_col: str = "caption",
    num_buckets: int = 64,
):
    """Cross-modal QA for an image+caption table: inside each group of
    visually-identical images (same perceptual hash), count distinct
    captions — groups with ``n_captions > 1`` carry conflicting labels
    (the standard pre-training consistency sweep over a web-scraped
    image-caption corpus, where mirrors of one image often ship different
    alt-texts).

    Plan: a cheap ``groupby(phash).count()`` finds duplicate groups first;
    their keys (dup groups are a small fraction of a deduped-ish corpus)
    broadcast into a semi-join filter so only dup-group rows — captions
    included — enter the one bucketed shuffle. Output: one row per
    duplicate phash group (representative min id, sizes, consistency
    flag)."""
    import pandas as pd

    from .groupops import bucketed_aggregate, bucketed_group_apply
    from .joins import semi_join_filter

    # bucketed count, not groupby(key).count(): key cardinality ≈ corpus
    # size, and the native aggregate reduce pays ~30 µs/group in Python
    counts = bucketed_aggregate(
        images_ds.select_columns([key]), [key],
        {"__n": (key, "size")}, num_buckets=num_buckets,
    )
    dup_keys = {
        r[key] for r in counts.filter(expr="__n >= 2").take_all()
    }  # bounded: duplicate GROUPS only, not rows
    dups = semi_join_filter(
        images_ds.select_columns([id_col, key, caption_col]), dup_keys, key
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(key)
            .agg(
                image_id=(id_col, "min"),
                n_images=(id_col, "size"),
                n_captions=(caption_col, "nunique"),
            )
            .reset_index()
        )
        agg["consistent"] = agg["n_captions"] == 1
        return agg

    return bucketed_group_apply(dups, [key], per_bucket, num_buckets)


class Augment:
    """Actor-pool augmentation stage (training-time image augmentation,
    REAL pixel work through the repo codec): per image, a deterministic
    id-hash draws the ops — optional horizontal flip, optional vertical
    flip, and a center crop to ``crop_frac`` of each side — then
    re-encode + re-phash. No RNG: the plan is a pure function of
    image_id, so augmented bytes are identical at any parallelism
    (the corpus-determinism contract every synth/split stage follows)."""

    def __init__(self, crop_frac: float = 0.8):
        self.crop_frac = crop_frac

    @staticmethod
    def plan(image_id: str, crop_frac: float):
        """(hflip, vflip, crop_frac_applied) drawn from FNV(image_id)."""
        h = 0xCBF29CE484222325
        for b in image_id.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return bool(h & 1), bool(h & 2), crop_frac if (h & 4) else 1.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import decode_image_batch, encode_png

        ids = batch["image_id"].to_pylist()
        srcs = decode_image_batch(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        )
        out_id, out_bytes, out_ph, out_ops, ok = [], [], [], [], []
        aug_imgs: list = []  # successful augmented pixels, phash batched below
        for iid, img in zip(ids, srcs):
            try:
                if isinstance(img, Exception):
                    raise img
                hflip, vflip, cf = self.plan(iid, self.crop_frac)
                if hflip:
                    img = img[:, ::-1]
                if vflip:
                    img = img[::-1]
                if cf < 1.0:
                    h, w = img.shape[:2]
                    ch = max(1, int(h * cf))
                    cw = max(1, int(w * cf))
                    y0 = (h - ch) // 2
                    x0 = (w - cw) // 2
                    img = img[y0 : y0 + ch, x0 : x0 + cw]
                img = np.ascontiguousarray(img)
                out_bytes.append(encode_png(img))
                aug_imgs.append(img)
                out_ph.append(None)  # placeholder, batch-filled below
                out_ops.append(
                    ("h" if hflip else "")
                    + ("v" if vflip else "")
                    + ("c" if cf < 1.0 else "")
                )
                ok.append(True)
            except Exception:
                out_bytes.append(None)
                out_ph.append(0)
                out_ops.append("")
                ok.append(False)
            out_id.append(iid)
        if aug_imgs:
            from ..imaging.codec import phash64_batch

            phs = iter(phash64_batch(aug_imgs))
            out_ph = [int(next(phs)) if p is None else p for p in out_ph]
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "aug_bytes": pa.array(out_bytes, pa.large_binary()),
            "aug_phash": pa.array(out_ph, pa.int64()),
            "aug_ops": pa.array(out_ops, pa.string()),
            "aug_ok": pa.array(ok, pa.bool_()),
        })


def augment_images(images_ds, crop_frac: float = 0.8,
                   concurrency=(2, 8), batch_size: int = 64):
    """Wire the augmentation actor pool (state in __init__, small batches:
    binary payloads)."""
    return images_ds.map_batches(
        Augment,
        fn_constructor_kwargs={"crop_frac": crop_frac},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
