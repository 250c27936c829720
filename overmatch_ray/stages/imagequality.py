"""Pixel-level image quality analytics + SSIM near-dup verification.

The image-corpus quality sweep of a pretraining-data pipeline: real
decoded-pixel metrics for filtering a web-scraped image+caption table, and
a structural-similarity verification pass over the banded perceptual-hash
near-duplicate candidates (LSH proposes, SSIM confirms — the standard
two-phase shape, same posture as the text-side MinHash→Jaccard verify in
``stages/dedup.py``).

No reference analog (the reference has no image tier; this extends the
graft image axis that ``stages/images.py`` M24/T5/D4 carry). All metrics
are pure numpy over the REAL decoded pixels (the in-repo T.81 JPEG / PNG
codecs), vectorized per image; the per-image Python loop is inherent to
per-blob codecs, identical to ``DecodeValidate``.

Metrics (one row per image):
- ``sharpness``  — variance of the 3×3 Laplacian of luma (the classic
  blur detector; flat/blurred images score near 0)
- ``brightness`` / ``contrast`` — mean / std of BT.601 luma
- ``entropy``    — Shannon entropy (bits) of the 256-bin luma histogram
  (0 for a constant image, ≤8 for uniform noise)
- ``colorfulness`` — Hasler–Süsstrunk metric over the rg/yb opponent axes

Scale notes: ``quality_stats`` is an actor-pool map over the corpus — no
shuffle. ``ssim_verify_pairs`` shuffles only the CANDIDATE subset: a
distributed semi-join keeps candidate images (no driver id set), an actor
pool reduces each to a fixed ``size×size`` luma thumb (size² bytes/row,
~4 KB at the default 64 — the full-resolution bytes never cross a
shuffle), and two bucketed hash joins attach thumbs to the pair list;
SSIM itself is vectorized across the whole pair batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _luma(img: np.ndarray) -> np.ndarray:
    """BT.601 luma as float64, shape (h, w)."""
    f = img.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def quality_metrics(img: np.ndarray) -> dict:
    """All quality metrics for one decoded (h, w, 3) uint8 image."""
    y = _luma(img)
    h, w = y.shape
    brightness = float(y.mean())
    contrast = float(y.std())

    # 3×3 Laplacian on the interior (valid region — no padding bias)
    if h >= 3 and w >= 3:
        lap = (
            4.0 * y[1:-1, 1:-1]
            - y[:-2, 1:-1]
            - y[2:, 1:-1]
            - y[1:-1, :-2]
            - y[1:-1, 2:]
        )
        sharpness = float(lap.var())
    else:
        sharpness = 0.0

    hist = np.bincount(
        np.clip(np.rint(y), 0, 255).astype(np.int64).ravel(), minlength=256
    )
    p = hist[hist > 0] / y.size
    entropy = float(-(p * np.log2(p)).sum())

    f = img.astype(np.float64)
    rg = f[..., 0] - f[..., 1]
    yb = 0.5 * (f[..., 0] + f[..., 1]) - f[..., 2]
    colorfulness = float(
        np.hypot(rg.std(), yb.std()) + 0.3 * np.hypot(rg.mean(), yb.mean())
    )
    return {
        "sharpness": sharpness,
        "brightness": brightness,
        "contrast": contrast,
        "entropy": entropy,
        "colorfulness": colorfulness,
    }


class QualityStats:
    """Actor-pool map_batches callable (stateful stage family T5): decode
    once per image, emit the metric row. ``keep_bytes=True`` carries the
    payload through for a downstream filter→write chain."""

    _METRICS = ("sharpness", "brightness", "contrast", "entropy",
                "colorfulness")

    def __init__(self, keep_bytes: bool = False):
        from ..imaging import codec as _codec  # warm the DCT/zigzag consts

        self._codec = _codec
        self.keep_bytes = keep_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import decode_image_batch

        imgs = decode_image_batch(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        )
        n = len(imgs)
        ok = np.zeros(n, dtype=bool)
        vals = {m: np.zeros(n, dtype=np.float64) for m in self._METRICS}
        for i, img in enumerate(imgs):
            if isinstance(img, Exception):
                continue  # corrupt blob: ok=False row, metrics stay 0
            row = quality_metrics(img)
            for m in self._METRICS:
                vals[m][i] = row[m]
            ok[i] = True

        cols: dict = {
            "image_id": batch["image_id"],
            "w": batch["w"],
            "h": batch["h"],
        }
        if self.keep_bytes:
            cols["bytes"] = batch["bytes"]
            cols["fmt"] = batch["fmt"]
            if "caption" in batch.column_names:
                cols["caption"] = batch["caption"]
        for m in self._METRICS:
            cols[m] = pa.array(vals[m])
        cols["decode_ok"] = pa.array(ok)
        return pa.table(cols)


def quality_stats(images_ds, concurrency=(2, 8), batch_size: int = 128,
                  keep_bytes: bool = False):
    """Per-image quality metrics over an input_hint-schema image table."""
    return images_ds.map_batches(
        QualityStats,
        fn_constructor_kwargs={"keep_bytes": keep_bytes},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def filter_images(
    images_ds,
    min_w: int = 32,
    min_h: int = 32,
    max_aspect: float = 4.0,
    min_sharpness: float = 10.0,
    brightness_range: tuple = (16.0, 240.0),
    min_entropy: float = 1.0,
    concurrency=(2, 8),
    batch_size: int = 128,
):
    """The standard pretraining image-filter chain: resolution / aspect /
    blur / exposure / flatness gates over real decoded pixels. Returns the
    surviving rows (metrics attached, payload kept) — compose with
    ``sources.write_images`` for the cleaned corpus.

    Pure map: no shuffle, streams at any corpus size."""
    import pyarrow.compute as pc

    scored = quality_stats(
        images_ds, concurrency=concurrency, batch_size=batch_size,
        keep_bytes=True,
    )
    lo_b, hi_b = brightness_range

    def gate(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        aspect = np.maximum(w, h) / np.maximum(np.minimum(w, h), 1.0)
        m = (
            batch["decode_ok"].to_numpy(zero_copy_only=False)
            & (w >= min_w)
            & (h >= min_h)
            & (aspect <= max_aspect)
            & (batch["sharpness"].to_numpy(zero_copy_only=False)
               >= min_sharpness)
            & (batch["brightness"].to_numpy(zero_copy_only=False) >= lo_b)
            & (batch["brightness"].to_numpy(zero_copy_only=False) <= hi_b)
            & (batch["entropy"].to_numpy(zero_copy_only=False) >= min_entropy)
        )
        return batch.filter(pa.array(m))

    return scored.map_batches(gate, batch_format="pyarrow")


# --- SSIM verification of near-duplicate candidates -------------------------


def ssim_blocks(a: np.ndarray, b: np.ndarray, block: int = 8) -> np.ndarray:
    """Mean structural similarity over non-overlapping ``block×block``
    windows, vectorized across a stack of pairs.

    a, b: (k, s, s) float64 luma stacks with s % block == 0. Uniform
    windows instead of the 11×11 Gaussian of Wang et al. — deterministic,
    one reshape, and rank-equivalent for the duplicate/non-duplicate
    decision this stage makes. Returns (k,) mean SSIM per pair."""
    k, s, _ = a.shape
    nb = s // block
    av = a.reshape(k, nb, block, nb, block)
    bv = b.reshape(k, nb, block, nb, block)
    axes = (2, 4)
    mu_a = av.mean(axis=axes)
    mu_b = bv.mean(axis=axes)
    var_a = av.var(axis=axes)
    var_b = bv.var(axis=axes)
    cov = (av * bv).mean(axis=axes) - mu_a * mu_b
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    ssim = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return ssim.mean(axis=(1, 2))


class _LumaThumb:
    """Actor-pool stage: decode → area-mean luma thumb, serialized as
    size² uint8 bytes (the only image payload that crosses the pair
    shuffle)."""

    def __init__(self, size: int = 64):
        from ..imaging import codec as _codec

        self._codec = _codec
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import _resize_area, decode_image_batch

        imgs = decode_image_batch(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        )
        n = len(imgs)
        thumbs: list = []
        keep = np.zeros(n, dtype=bool)
        for i, img in enumerate(imgs):
            if isinstance(img, Exception):
                thumbs.append(None)
                continue
            t = _resize_area(_luma(img), self.size)
            thumbs.append(
                np.clip(np.rint(t), 0, 255).astype(np.uint8).tobytes()
            )
            keep[i] = True
        return pa.table(
            {"image_id": batch["image_id"],
             "thumb": pa.array(thumbs, pa.large_binary())}
        ).filter(pa.array(keep))


def ssim_verify_pairs(
    images_ds,
    pairs_ds=None,
    max_hamming: int = 6,
    size: int = 64,
    threshold: float = 0.85,
    num_buckets: int = 32,
    concurrency=(2, 8),
    batch_size: int = 128,
):
    """Verify near-duplicate CANDIDATE pairs with real pixel SSIM.

    pairs_ds: (id_a, id_b[, hamming]) — defaults to the banded-Hamming
    phash candidates from ``stages.images.near_dup_pairs``. Output: one
    row per candidate pair with its ``ssim`` and ``verified`` flag —
    EVERY candidate pair survives: if either member fails decode, the
    pair row comes through with ``ssim`` null and ``verified`` false
    (unverifiable ≠ never-proposed; the thumb joins are LEFT joins).

    Plan (all distributed, nothing on the driver):
      candidate ids  = pairs exploded to one id column (distinct per block)
      candidate imgs = semi_join_shuffled(images, ids)   [bytes stay put]
      thumbs         = actor pool → (image_id, size² luma bytes)
      pair table     = bucket_hash_join ×2 (thumb_a, thumb_b)
      ssim           = vectorized block-SSIM over the stacked pairs
    """
    from .images import near_dup_pairs
    from .joins import bucket_hash_join, semi_join_shuffled

    if pairs_ds is None:
        pairs_ds = near_dup_pairs(
            images_ds, max_hamming=max_hamming, num_buckets=num_buckets
        )
    # the pair list feeds three consumers (id explode + two joins):
    # materialize once — it is the small side by construction
    pairs_ds = pairs_ds.materialize()

    def explode_ids(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [batch["id_a"].combine_chunks().cast(pa.string()),
             batch["id_b"].combine_chunks().cast(pa.string())]
        )
        return pa.table({"image_id": ids.unique()})

    cand_ids = pairs_ds.map_batches(explode_ids, batch_format="pyarrow")
    cand_imgs = semi_join_shuffled(
        images_ds, cand_ids, "image_id", "image_id", num_buckets=num_buckets
    )
    thumbs = cand_imgs.map_batches(
        _LumaThumb,
        fn_constructor_kwargs={"size": size},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    ).materialize()  # actor pool → all-to-all boundary (CLAUDE.md rule)

    def rename(col: str):
        def _r(batch: pa.Table) -> pa.Table:
            return pa.table({col: batch["image_id"], f"thumb{col[-2:]}": batch["thumb"]})

        return _r

    ta = thumbs.map_batches(rename("id_a"), batch_format="pyarrow")
    tb = thumbs.map_batches(rename("id_b"), batch_format="pyarrow")
    j = bucket_hash_join(
        pairs_ds, ta, "id_a", "id_a", num_buckets=num_buckets, how="left"
    )
    j = bucket_hash_join(
        j, tb, "id_b", "id_b", num_buckets=num_buckets, how="left"
    )

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = batch.num_rows
        out = batch.drop_columns(["thumb_a", "thumb_b"])
        if k == 0:
            return out.append_column(
                "ssim", pa.array([], pa.float64())
            ).append_column("verified", pa.array([], pa.bool_()))
        # a pair whose member failed decode has a null thumb (LEFT join):
        # emit it with ssim null / verified False instead of dropping it
        valid = pc.and_(
            pc.is_valid(batch["thumb_a"]), pc.is_valid(batch["thumb_b"])
        )
        vmask = valid.to_numpy(zero_copy_only=False)
        s = np.full(k, np.nan)
        if vmask.any():
            vb = batch.filter(valid)
            kv = vb.num_rows
            a = np.frombuffer(
                b"".join(vb["thumb_a"].to_pylist()), dtype=np.uint8
            ).astype(np.float64).reshape(kv, size, size)
            b = np.frombuffer(
                b"".join(vb["thumb_b"].to_pylist()), dtype=np.uint8
            ).astype(np.float64).reshape(kv, size, size)
            s[np.flatnonzero(vmask)] = np.round(ssim_blocks(a, b), 6)
        return out.append_column(
            "ssim", pa.array(s, mask=~vmask)
        ).append_column(
            "verified",
            pa.array(np.where(vmask, np.greater_equal(s, threshold), False)),
        )

    return j.map_batches(score, batch_format="pyarrow")


# --- image feature embeddings (similarity search over real pixels) ----------


def image_feature_vector(img: np.ndarray) -> np.ndarray:
    """Deterministic 74-dim feature embedding of one decoded image, built
    from real pixel statistics (no learned model exists in this container;
    the vector is the classic pre-deep-learning retrieval descriptor):

    - 36 low-frequency 2D-DCT coefficients of the 32×32 area-mean luma
      thumb (global structure — the same subspace the perceptual hash
      thresholds, kept as magnitudes here)
    - 32-bin luma histogram, density-normalized (tonal distribution)
    - per-channel RGB mean and std, /255 (color layout)

    L2-normalized, so dot product = cosine. Identical pixels ⇒ identical
    vector; the output feeds the ANN family (`stages.knn`) unchanged."""
    from ..imaging.codec import _DCT32, _resize_area

    y = _luma(img)
    thumb = _resize_area(y, 32)
    dct = _DCT32 @ thumb @ _DCT32.T
    f_dct = dct[:6, :6].ravel() / 255.0

    hist = np.bincount(
        np.clip(np.rint(y), 0, 255).astype(np.int64).ravel() >> 3,
        minlength=32,
    )[:32] / y.size

    f = img.astype(np.float64) / 255.0
    rgb = np.concatenate([
        f.reshape(-1, 3).mean(axis=0), f.reshape(-1, 3).std(axis=0)
    ])

    v = np.concatenate([f_dct, hist, rgb])
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


class _EmbedImages:
    """Actor-pool stage: decode → feature embedding (vec_id, embedding)."""

    def __init__(self):
        from ..imaging import codec as _codec  # warm DCT consts per actor

        self._codec = _codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import decode_image_batch

        imgs = decode_image_batch(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        )
        n = len(imgs)
        vecs: list = []
        keep = np.zeros(n, dtype=bool)
        for i, img in enumerate(imgs):
            if isinstance(img, Exception):
                vecs.append(None)
                continue
            vecs.append(image_feature_vector(img))
            keep[i] = True
        return pa.table(
            {"vec_id": batch["image_id"],
             "embedding": pa.array(
                 [v.tolist() if v is not None else None for v in vecs],
                 pa.list_(pa.float32()))}
        ).filter(pa.array(keep))


def embed_images(images_ds, concurrency=(2, 8), batch_size: int = 128):
    """Per-image feature embeddings over an input_hint-schema table.
    Output schema (vec_id, embedding list<float32>) is exactly what the
    ANN stages (`brute_force_topk`, `near_dup_embeddings`, `ivf_topk`,
    `lsh_topk`) consume — image similarity search composes directly."""
    return images_ds.map_batches(
        _EmbedImages,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def best_of_cluster(
    images_ds,
    clusters_ds,
    id_col: str = "image_id",
    cluster_col: str = "cluster_id",
    num_buckets: int = 32,
    concurrency=(2, 8),
    batch_size: int = 128,
):
    """Duplicate-cluster representative selection — the "keep the best
    copy" policy of a pretraining image dedup: for every near-dup cluster
    (``clusters_ds``: one (image_id, cluster_id) row per member), decode
    the MEMBER images only, score them, and keep the member with the
    highest sharpness (ties: lowest id — deterministic at any
    parallelism). Members whose blob fails decode never compete (a
    representative must be decodable); a cluster whose EVERY member
    fails decode emits no row.

    Output: one row per cluster (cluster_id, image_id, sharpness,
    n_members) — n_members counts the decodable members. Scale: cluster
    members are a small fraction of a deduped-ish corpus; the semi-join
    keeps the decode pool off the non-duplicate majority, and the one
    bucketed shuffle carries only (id, cluster, sharpness) triples."""
    import pandas as pd

    from .groupops import bucketed_group_apply
    from .joins import bucket_hash_join, semi_join_shuffled

    clusters_ds = clusters_ds.materialize()  # feeds two consumers
    members = semi_join_shuffled(
        images_ds, clusters_ds, id_col, id_col, num_buckets=num_buckets
    )
    if id_col != "image_id":
        # QualityStats reads the input_hint column names; alias the id in
        def _rn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                ["image_id" if n == id_col else n for n in batch.column_names]
            )

        members = members.map_batches(_rn, batch_format="pyarrow")
    scored = quality_stats(
        members, concurrency=concurrency, batch_size=batch_size
    ).materialize()  # actor pool → all-to-all boundary (CLAUDE.md rule)

    def project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["decode_ok"])  # undecodable ≠ candidate
        return pa.table(
            {id_col: batch["image_id"], "sharpness": batch["sharpness"]}
        )

    slim = scored.map_batches(project, batch_format="pyarrow")
    j = bucket_hash_join(
        clusters_ds, slim, id_col, id_col, num_buckets=num_buckets
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sharpness", id_col], ascending=[False, True], kind="mergesort"
        )
        agg = g.groupby(cluster_col, as_index=False).agg(
            **{id_col: (id_col, "first")},
            sharpness=("sharpness", "first"),
            n_members=(id_col, "size"),
        )
        return agg[[cluster_col, id_col, "sharpness", "n_members"]]

    return bucketed_group_apply(j, [cluster_col], pick, num_buckets)
