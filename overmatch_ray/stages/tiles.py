"""Deterministic vector tiling (S15/O6 analog, Ray-Data-native).

The reference shells out to tippecanoe to build a PMTiles pyramid
(/root/reference/scripts/build_pmtiles.py:186-200) with `-zg` auto zoom and
`--drop-densest-as-needed`. Neither tippecanoe nor a PMTiles writer exists
here, and density-dropping is nondeterministic across runs — a conformance
problem. Our engine therefore:

- assigns features to standard slippy-map tiles (z/x/y web-mercator, the
  same scheme tippecanoe uses) per zoom level, vectorized;
- replaces density dropping with a PINNED rank: per tile, features are
  ordered by (quality desc, osm_id asc) and capped at ``max_per_tile`` —
  deterministic across runs and parallelism levels (SURVEY.md §2.6-O6);
- encodes each tile as a compact JSON FeatureCollection payload (the
  engine-side tile artifact a PMTiles packer would consume).

The tile shuffle key is (zoom, tx, ty) — SURVEY.md §7.4.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa


def tile_xy(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Standard slippy-map tile coordinates at ``zoom``. Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << zoom
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_r = np.radians(np.clip(lat, -85.051128779807, 85.051128779807))
    ty = np.floor(
        (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def assign_tiles_batch(batch: pa.Table, zooms: list[int]) -> pa.Table:
    """Explode each feature row to one row per zoom with (zoom, tx, ty)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    parts = []
    for z in zooms:
        tx, ty = tile_xy(lon, lat, z)
        t = batch.append_column("zoom", pa.array(np.full(len(lon), z, dtype=np.int16)))
        t = t.append_column("tx", pa.array(tx))
        t = t.append_column("ty", pa.array(ty))
        parts.append(t)
    return pa.concat_tables(parts)


def encode_tile_group(g: pd.DataFrame, max_per_tile: int = 500) -> pd.DataFrame:
    """One tile per group: pinned rank + cap + JSON FeatureCollection +
    binary MVT payload (stages.mvt, spec 2.1 protobuf — the artifact a map
    client / PMTiles packer reads)."""
    from .mvt import encode_mvt_tile, tile_local_coords

    if "quality" in g.columns:
        g = g.sort_values(["quality", "osm_id"], ascending=[False, True], kind="mergesort")
    else:
        g = g.sort_values("osm_id", kind="mergesort")
    total = len(g)
    kept = g.head(max_per_tile)
    props_cols = [
        c for c in kept.columns
        if c not in ("zoom", "tx", "ty", "lon", "lat")
    ]
    records = kept[props_cols].to_dict("records")
    features = [
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [lon, lat]},
            "properties": {k: v for k, v in rec.items() if pd.notna(v)},
        }
        for rec, lon, lat in zip(records, kept["lon"], kept["lat"])
    ]
    payload = json.dumps(
        {"type": "FeatureCollection", "features": features},
        separators=(",", ":"),
        sort_keys=True,
    ).encode()
    zoom, tx, ty = int(g["zoom"].iloc[0]), int(g["tx"].iloc[0]), int(g["ty"].iloc[0])
    px, py = tile_local_coords(
        kept["lon"].to_numpy(), kept["lat"].to_numpy(), zoom, tx, ty
    )
    mvt = encode_mvt_tile(
        [{k: v for k, v in rec.items() if pd.notna(v)} for rec in records], px, py
    )
    return pd.DataFrame(
        {
            "zoom": [zoom],
            "tx": [tx],
            "ty": [ty],
            "n_features": np.array([len(kept)], dtype=np.int64),
            "n_dropped": np.array([total - len(kept)], dtype=np.int64),
            "tile": [payload],
            "mvt": [mvt],
        }
    )


def build_tiles(features_ds, zooms: list[int], max_per_tile: int = 500,
                num_buckets: int = 32):
    """features (needs lon, lat, osm_id[, quality]) → tile dataset.

    Tile-id cardinality grows with zoom, so the shuffle is bucketed: one
    callable encodes every tile that hashed into its bucket."""
    from .groupops import bucketed_group_apply

    assigned = features_ds.map_batches(
        assign_tiles_batch, fn_kwargs={"zooms": zooms}, batch_format="pyarrow"
    )

    def encode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = [
            encode_tile_group(sub, max_per_tile)
            for _, sub in g.groupby(["zoom", "tx", "ty"], sort=False)
        ]
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        assigned, ["zoom", "tx", "ty"], encode_bucket, num_buckets=num_buckets
    )


def auto_max_zoom(
    features_ds,
    max_per_tile: int = 500,
    zmin: int = 4,
    zmax: int = 16,
    sample_rows: int = 100_000,
    id_col: str = "osm_id",
) -> int:
    """tippecanoe ``-zg`` analog (reference build_pmtiles.py): pick the
    smallest max zoom whose densest tile holds ≤ ``max_per_tile`` features,
    estimated from a bounded DETERMINISTIC HASH sample (md5-threshold over
    ``id_col`` via stages.splits — the same row set at any parallelism,
    block order, or spatial sort of the input; a first-N ``limit()`` sample
    would cover one region of a Hilbert-partitioned input and bias the
    density estimate), with tile counts scaled by the true sampled
    fraction. The sample is bounded, so the driver never holds O(dataset);
    the full pyramid build stays distributed.
    """
    from .splits import sample_deterministic

    total = features_ds.count()
    if total == 0:
        return zmin
    proj = features_ds.select_columns([id_col, "lon", "lat"])
    frac = min(1.0, sample_rows / total)
    if frac < 1.0:
        proj = sample_deterministic(proj, id_col, frac, salt="auto_max_zoom:")
    sample = proj.select_columns(["lon", "lat"]).take_all()
    if not sample:
        return zmin
    lon = np.array([r["lon"] for r in sample])
    lat = np.array([r["lat"] for r in sample])
    scale = max(1.0, total / len(sample))
    for z in range(zmin, zmax + 1):
        tx, ty = tile_xy(lon, lat, z)
        _, counts = np.unique(tx << np.int64(32) | ty, return_counts=True)
        if counts.max() * scale <= max_per_tile:
            return z
    return zmax


def dirty_tiles(old_tiles_ds, new_tiles_ds, num_buckets: int = 32):
    """Incremental tiling: diff two tile pyramids → (zoom, tx, ty,
    change_type ∈ added/removed/changed). Content equality = sha256 of
    the canonical sorted-JSON payload (byte-deterministic by the tile
    encoder's contract), so a nightly rebuild republishes ONLY dirty
    tiles — the incremental answer to the reference's full-pyramid
    rebuild (scripts/build_pmtiles.py regenerates everything nightly).

    One bucketed outer hash join on the packed (zoom, tx, ty) key; both
    sides are tile MANIFEST rows (key + content hash), never tile
    payloads, so the shuffle is O(#tiles) × 16 B. The key packs into 49
    bits (z ≤ 21, guarded): the join's per-bucket pandas merge upcasts
    int64 to float64, and only ≤2^53 keys survive that exactly (the
    63-bit packing silently zeroed low ty bits — caught by the
    brute-force test)."""
    import hashlib

    from .joins import bucket_hash_join

    def manifest(side: str):
        def _m(batch: pa.Table) -> pa.Table:
            z = batch["zoom"].to_numpy(zero_copy_only=False).astype(np.int64)
            tx = batch["tx"].to_numpy(zero_copy_only=False).astype(np.int64)
            ty = batch["ty"].to_numpy(zero_copy_only=False).astype(np.int64)
            if z.size and z.max() > 21:
                raise ValueError("dirty_tiles packs (z,tx,ty) into 49 bits "
                                 "(z <= 21): keys must stay float64-exact "
                                 "through the join's pandas merge")
            key = (z << np.int64(44)) | (tx << np.int64(22)) | ty
            hs = np.array(
                [
                    int.from_bytes(hashlib.sha256(t).digest()[:8], "big") >> 1
                    for t in batch["tile"].to_pylist()
                ],
                np.int64,
            )
            return pa.table({f"key_{side}": pa.array(key),
                             f"h_{side}": pa.array(hs)})

        return _m

    old_m = old_tiles_ds.map_batches(manifest("old"), batch_format="pyarrow")
    new_m = new_tiles_ds.map_batches(manifest("new"), batch_format="pyarrow")
    joined = bucket_hash_join(
        old_m, new_m, left_on="key_old", right_on="key_new", how="outer",
        num_buckets=num_buckets,
    )

    def classify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        has_old = pc.is_valid(batch["key_old"]).to_numpy(zero_copy_only=False)
        has_new = pc.is_valid(batch["key_new"]).to_numpy(zero_copy_only=False)
        ko = pc.fill_null(batch["key_old"], 0).to_numpy(zero_copy_only=False)
        kn = pc.fill_null(batch["key_new"], 0).to_numpy(zero_copy_only=False)
        ho = pc.fill_null(batch["h_old"], -1).to_numpy(zero_copy_only=False)
        hn = pc.fill_null(batch["h_new"], -2).to_numpy(zero_copy_only=False)
        typ = np.where(
            ~has_old, "added",
            np.where(~has_new, "removed", np.where(ho != hn, "changed", "")),
        )
        keep = typ != ""
        key = np.where(has_old, ko, kn)[keep].astype(np.int64)
        return pa.table(
            {
                "zoom": pa.array(key >> np.int64(44)),
                "tx": pa.array((key >> np.int64(22)) & np.int64((1 << 22) - 1)),
                "ty": pa.array(key & np.int64((1 << 22) - 1)),
                "change_type": pa.array(typ[keep], pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def build_raster_heat_tiles(
    points_ds,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int = 32,
):
    """Raster heat-tile pyramid level: one 256×256 grayscale PNG per web-
    mercator tile at ``zoom``, pixel (px, py) = the point's position on
    the zoom+8 subgrid (the standard slippy-map raster convention),
    intensity = min(255, 32·count) — an integer map of counts, so tiles
    are bit-deterministic at any parallelism.

    Plan: per-batch pixel assignment + (tile, pixel) count COMBINER (the
    shuffle moves touched-pixel counts, never points) → one bucketed
    group-apply rasterizing each tile with the repo's pure-zlib PNG
    encoder (`imaging.codec.encode_png` — the same codec the image
    pipeline validates). Output (zoom, tx, ty, n_points, png)."""
    from ..imaging.codec import encode_png
    from .groupops import bucketed_aggregate, bucketed_group_apply

    def pix(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        fx, fy = tile_xy(lon, lat, zoom + 8)
        fx = fx.astype(np.int64)
        fy = fy.astype(np.int64)
        tx, px = fx >> 8, fx & 255
        ty, py = fy >> 8, fy & 255
        df = pd.DataFrame({"tx": tx, "ty": ty, "px": px, "py": py})
        vc = df.value_counts(sort=False)
        idx = vc.index.to_frame(index=False)
        return pa.table({
            "tx": pa.array(idx["tx"].to_numpy()),
            "ty": pa.array(idx["ty"].to_numpy()),
            "px": pa.array(idx["px"].to_numpy()),
            "py": pa.array(idx["py"].to_numpy()),
            "n": pa.array(vc.to_numpy().astype(np.int64)),
        })

    # bucketed: groups = touched PIXELS (millions at scale), and Ray's
    # native aggregate reduce pays ~30 µs of Python per group — see
    # groupops.bucketed_aggregate. Partial per-batch counts above already
    # shrink the shuffle; this keeps the reduce vectorized too.
    counts = bucketed_aggregate(
        points_ds.map_batches(pix, batch_format="pyarrow"),
        ["tx", "ty", "px", "py"], {"n": ("n", "sum")},
        num_buckets=num_buckets,
    )

    def raster_bucket(g: pd.DataFrame) -> pa.Table:
        out_tx, out_ty, out_n, out_png = [], [], [], []
        for (tx, ty), rows in g.groupby(["tx", "ty"], sort=True):
            grid = np.zeros((256, 256), np.int64)
            grid[rows["py"].to_numpy(), rows["px"].to_numpy()] = (
                rows["n"].to_numpy()
            )
            v = np.minimum(grid * 32, 255).astype(np.uint8)
            img = np.repeat(v[:, :, None], 3, axis=2)
            out_tx.append(int(tx)); out_ty.append(int(ty))
            out_n.append(int(rows["n"].sum()))
            out_png.append(encode_png(img))
        return pa.table({
            "zoom": pa.array([zoom] * len(out_tx), pa.int64()),
            "tx": pa.array(out_tx, pa.int64()),
            "ty": pa.array(out_ty, pa.int64()),
            "n_points": pa.array(out_n, pa.int64()),
            "png": pa.array(out_png, pa.large_binary()),
        })

    return bucketed_group_apply(
        counts, ["tx", "ty"], raster_bucket, num_buckets=num_buckets
    )


def _clip_segment(x0, y0, x1, y1, lo, hi):
    """Liang-Barsky clip of one segment to the [lo, hi]² box. Returns
    (cx0, cy0, cx1, cy1) or None if fully outside."""
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x0 - lo), (dx, hi - x0),
        (-dy, y0 - lo), (dy, hi - y0),
    ):
        if p == 0.0:
            if q < 0.0:
                return None
            continue
        r = q / p
        if p < 0.0:
            if r > t1:
                return None
            if r > t0:
                t0 = r
        else:
            if r < t0:
                return None
            if r < t1:
                t1 = r
    return (x0 + t0 * dx, y0 + t0 * dy, x0 + t1 * dx, y0 + t1 * dy)


def build_line_tiles(
    points_ds,
    zoom: int,
    key_col: str = "key",
    seq_col: str = "seq",
    lon_col: str = "lon",
    lat_col: str = "lat",
    extent: int = 4096,
    num_buckets: int = 32,
):
    """Vector LINE tiles (the tippecanoe linear-feature path): per-key
    polylines (points ordered by ``seq_col``) cut into per-tile MVT
    LineString layers at ``zoom``. Two bucketed shuffles:

    1. per-key segment build — consecutive points become segments in
       global fractional tile coords; each segment replicates to the
       tiles its bbox covers (adjacent tiles for short segments) and is
       Liang-Barsky-clipped to each tile's local box;
    2. per-tile encode — segments grouped by key, CHAINED back into
       maximal polyline parts (consecutive seq + coincident clipped
       endpoints merge), encoded with ``stages.mvt.encode_mvt_lines``.

    Coordinates, clipping and ordering are all deterministic, so tile
    bytes are identical at any parallelism (same contract as the point
    pyramid). Output (zoom, tx, ty, n_keys, n_parts, mvt)."""
    from .groupops import bucketed_group_apply
    from .mvt import encode_mvt_lines

    n_tiles = 1 << zoom

    def segments_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key_col, seq_col], kind="mergesort")
        k = g[key_col].to_numpy()
        lon = g[lon_col].to_numpy()
        lat = g[lat_col].to_numpy()
        n = float(n_tiles)
        fx = (lon + 180.0) / 360.0 * n
        lat_r = np.radians(np.clip(lat, -85.051128779807, 85.051128779807))
        fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
        same = np.zeros(len(g), bool)
        same[:-1] = k[:-1] == k[1:] if len(g) > 1 else False
        idx = np.flatnonzero(same)
        out = {"tx": [], "ty": [], "key": [], "seg": [],
               "x0": [], "y0": [], "x1": [], "y1": []}
        # per-key segment ordinals, vectorized (position within key run)
        run_start = np.zeros(len(g), np.int64)
        if len(g):
            firsts = np.flatnonzero(
                np.concatenate([[True], k[1:] != k[:-1]])
            )
            run_start = firsts[
                np.searchsorted(firsts, np.arange(len(g)), "right") - 1
            ]
        seg_no = np.arange(len(g)) - run_start
        x0a, y0a = fx[idx], fy[idx]
        x1a, y1a = fx[idx + 1], fy[idx + 1]
        # FAST PATH: both endpoints in the same tile (the overwhelmingly
        # common case for GPS-scale segments) — pure-numpy emit, no clip
        tx0, ty0 = np.floor(x0a).astype(np.int64), np.floor(y0a).astype(np.int64)
        tx1, ty1 = np.floor(x1a).astype(np.int64), np.floor(y1a).astype(np.int64)
        one_tile = (tx0 == tx1) & (ty0 == ty1) \
            & (tx0 >= 0) & (tx0 < n_tiles) & (ty0 >= 0) & (ty0 < n_tiles)
        ft = np.flatnonzero(one_tile)
        if ft.size:
            px0 = np.floor((x0a[ft] - tx0[ft]) * extent + 0.5).astype(np.int64)
            py0 = np.floor((y0a[ft] - ty0[ft]) * extent + 0.5).astype(np.int64)
            px1 = np.floor((x1a[ft] - tx0[ft]) * extent + 0.5).astype(np.int64)
            py1 = np.floor((y1a[ft] - ty0[ft]) * extent + 0.5).astype(np.int64)
            keepm = (px0 != px1) | (py0 != py1)
            out["tx"].extend(tx0[ft][keepm].tolist())
            out["ty"].extend(ty0[ft][keepm].tolist())
            out["key"].extend(k[idx[ft][keepm]].astype(np.int64).tolist())
            out["seg"].extend(seg_no[idx[ft][keepm]].tolist())
            out["x0"].extend(px0[keepm].tolist())
            out["y0"].extend(py0[keepm].tolist())
            out["x1"].extend(px1[keepm].tolist())
            out["y1"].extend(py1[keepm].tolist())
        # slow path: boundary-crossing segments only
        for j in np.flatnonzero(~one_tile):
            i = idx[j]
            kk = k[i]
            seg = int(seg_no[i])
            x0, y0, x1, y1 = fx[i], fy[i], fx[i + 1], fy[i + 1]
            for tx in range(int(min(x0, x1)), int(max(x0, x1)) + 1):
                for ty in range(int(min(y0, y1)), int(max(y0, y1)) + 1):
                    if not (0 <= tx < n_tiles and 0 <= ty < n_tiles):
                        continue
                    c = _clip_segment(
                        (x0 - tx) * extent, (y0 - ty) * extent,
                        (x1 - tx) * extent, (y1 - ty) * extent,
                        0.0, float(extent),
                    )
                    if c is None:
                        continue
                    cx0, cy0, cx1, cy1 = (int(np.floor(v + 0.5)) for v in c)
                    if (cx0, cy0) == (cx1, cy1):
                        continue  # degenerate at this zoom
                    out["tx"].append(tx); out["ty"].append(ty)
                    out["key"].append(int(kk)); out["seg"].append(seg)
                    out["x0"].append(cx0); out["y0"].append(cy0)
                    out["x1"].append(cx1); out["y1"].append(cy1)
        return pa.table({
            "tx": pa.array(out["tx"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            "key": pa.array(out["key"], pa.int64()),
            "seg": pa.array(out["seg"], pa.int64()),
            "x0": pa.array(out["x0"], pa.int64()),
            "y0": pa.array(out["y0"], pa.int64()),
            "x1": pa.array(out["x1"], pa.int64()),
            "y1": pa.array(out["y1"], pa.int64()),
        })

    segs = bucketed_group_apply(
        points_ds, [key_col], segments_bucket, num_buckets=num_buckets
    )

    def encode_bucket(g: pd.DataFrame) -> pa.Table:
        rows = {"zoom": [], "tx": [], "ty": [], "n_keys": [],
                "n_parts": [], "mvt": []}
        for (tx, ty), tile in g.groupby(["tx", "ty"], sort=True):
            props, lines = [], []
            total_parts = 0
            for key, trk in tile.sort_values(
                ["key", "seg"], kind="mergesort"
            ).groupby("key", sort=True):
                segarr = trk[["seg", "x0", "y0", "x1", "y1"]].to_numpy()
                parts = []
                cur = None
                prev_seg = None
                for sg, x0, y0, x1, y1 in segarr:
                    if (
                        cur is not None
                        and prev_seg is not None
                        and sg == prev_seg + 1
                        and cur[-1] == [x0, y0]
                    ):
                        cur.append([x1, y1])
                    else:
                        cur = [[x0, y0], [x1, y1]]
                        parts.append(cur)
                    prev_seg = sg
                parts = [np.asarray(p, np.int64) for p in parts]
                props.append({"key": int(key), "n_segs": len(segarr)})
                lines.append(parts)
                total_parts += len(parts)
            rows["zoom"].append(zoom)
            rows["tx"].append(int(tx)); rows["ty"].append(int(ty))
            rows["n_keys"].append(len(props))
            rows["n_parts"].append(total_parts)
            rows["mvt"].append(encode_mvt_lines(props, lines, extent=extent))
        return pa.table({
            "zoom": pa.array(rows["zoom"], pa.int64()),
            "tx": pa.array(rows["tx"], pa.int64()),
            "ty": pa.array(rows["ty"], pa.int64()),
            "n_keys": pa.array(rows["n_keys"], pa.int64()),
            "n_parts": pa.array(rows["n_parts"], pa.int64()),
            "mvt": pa.array(rows["mvt"], pa.large_binary()),
        })

    return bucketed_group_apply(
        segs, ["tx", "ty"], encode_bucket, num_buckets=num_buckets
    )


def _clip_polygon_box(ring: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Sutherland-Hodgman clip of one (convex or simple) ring to the
    [lo, hi]² box. Input/output: (N, 2) float arrays, no repeated last
    vertex; may return fewer than 3 vertices when fully outside."""
    pts = [tuple(p) for p in np.asarray(ring, dtype=np.float64)]
    for axis, bound, keep_ge in (
        (0, lo, True), (0, hi, False), (1, lo, True), (1, hi, False),
    ):
        if not pts:
            break
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin = cur[axis] >= bound if keep_ge else cur[axis] <= bound
            nin = nxt[axis] >= bound if keep_ge else nxt[axis] <= bound
            if cin:
                out.append(cur)
            if cin != nin:
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                out.append((
                    cur[0] + t * (nxt[0] - cur[0]),
                    cur[1] + t * (nxt[1] - cur[1]),
                ))
        pts = out
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def build_hull_tiles(
    points_ds,
    zoom: int,
    key_col: str = "key",
    lon_col: str = "lon",
    lat_col: str = "lat",
    extent: int = 4096,
    num_buckets: int = 32,
):
    """Vector POLYGON tiles: per-key convex-hull footprints clipped into
    per-tile MVT polygon layers at ``zoom`` — the area-feature third of
    the tiling trio (points / lines / polygons). Two bucketed shuffles:
    per-key hull (monotone chain, `spatial.convex_hull_xy`) + bbox tile
    cover + Sutherland-Hodgman box clip, then per-tile deterministic
    encode (`stages.mvt.encode_mvt_polygons`). Output
    (zoom, tx, ty, n_keys, mvt)."""
    from .groupops import bucketed_group_apply
    from .mvt import encode_mvt_polygons
    from .spatial import convex_hull_xy

    n_tiles = 1 << zoom

    def hulls_bucket(g: pd.DataFrame) -> pa.Table:
        out = {"tx": [], "ty": [], "key": [], "ring": []}
        for key, rows in g.groupby(key_col, sort=True):
            lon = rows[lon_col].to_numpy()
            lat = rows[lat_col].to_numpy()
            n = float(n_tiles)
            fx = (lon + 180.0) / 360.0 * n
            lr = np.radians(np.clip(lat, -85.051128779807, 85.051128779807))
            fy = (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n
            hull = convex_hull_xy(fx, fy)
            if hull.size < 3:
                continue
            hx, hy = fx[hull], fy[hull]
            for tx in range(int(hx.min()), int(hx.max()) + 1):
                for ty in range(int(hy.min()), int(hy.max()) + 1):
                    if not (0 <= tx < n_tiles and 0 <= ty < n_tiles):
                        continue
                    ring = np.column_stack(
                        [(hx - tx) * extent, (hy - ty) * extent]
                    )
                    clipped = _clip_polygon_box(ring, 0.0, float(extent))
                    if clipped.shape[0] < 3:
                        continue
                    iring = np.floor(clipped + 0.5).astype(np.int64)
                    # drop consecutive duplicates after rounding
                    keep = np.ones(iring.shape[0], bool)
                    keep[1:] = (np.diff(iring, axis=0) != 0).any(axis=1)
                    iring = iring[keep]
                    if iring.shape[0] >= 2 and (iring[0] == iring[-1]).all():
                        iring = iring[:-1]
                    if iring.shape[0] < 3:
                        continue
                    out["tx"].append(tx); out["ty"].append(ty)
                    out["key"].append(int(key))
                    out["ring"].append(iring.ravel().tolist())
        return pa.table({
            "tx": pa.array(out["tx"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            "key": pa.array(out["key"], pa.int64()),
            "ring": pa.array(out["ring"], pa.list_(pa.int64())),
        })

    hulls = bucketed_group_apply(
        points_ds, [key_col], hulls_bucket, num_buckets=num_buckets
    )

    def encode_bucket(g: pd.DataFrame) -> pa.Table:
        rows = {"zoom": [], "tx": [], "ty": [], "n_keys": [], "mvt": []}
        for (tx, ty), tile in g.groupby(["tx", "ty"], sort=True):
            tile = tile.sort_values("key", kind="mergesort")
            props = [{"key": int(k)} for k in tile["key"]]
            polys = [
                [np.asarray(r, np.int64).reshape(-1, 2)]
                for r in tile["ring"]
            ]
            rows["zoom"].append(zoom)
            rows["tx"].append(int(tx)); rows["ty"].append(int(ty))
            rows["n_keys"].append(len(props))
            rows["mvt"].append(encode_mvt_polygons(props, polys,
                                                   extent=extent))
        return pa.table({
            "zoom": pa.array(rows["zoom"], pa.int64()),
            "tx": pa.array(rows["tx"], pa.int64()),
            "ty": pa.array(rows["ty"], pa.int64()),
            "n_keys": pa.array(rows["n_keys"], pa.int64()),
            "mvt": pa.array(rows["mvt"], pa.large_binary()),
        })

    return bucketed_group_apply(
        hulls, ["tx", "ty"], encode_bucket, num_buckets=num_buckets
    )


def incremental_tiles(
    new_features_ds,
    diff_ds,
    zooms: "list[int]",
    max_per_tile: int = 500,
    num_buckets: int = 32,
):
    """Rebuild ONLY the dirty tiles after a nightly match diff (r4
    VERDICT #5 — the match-side composition of ``enrich.match_diff`` and
    ``dirty_tiles``): every diff row dirties the tile(s) containing its
    new coordinate and, for changed/removed pairs, its old coordinate;
    features of tonight's match table falling in a dirty tile are
    selected by a broadcast key-set filter and re-encoded by the same
    deterministic ``build_tiles`` path.

    Because a tile's bytes are a pure function of exactly the features
    inside it (deterministic cap + ordering — the O6 byte-determinism
    contract), the rebuilt dirty tiles are BYTE-IDENTICAL to the
    corresponding tiles of a full-pyramid rebuild; tests pin that
    equality, which is the incremental path's correctness argument.

    The dirty key set is diff-bounded (≪ #tiles at steady state) and
    broadcasts once via ``ray.put``; the feature scan is one pure map."""
    import ray as _ray

    def dirty_keys_partial(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon_o = batch["lon_old"].to_numpy(zero_copy_only=False)
        lat_o = batch["lat_old"].to_numpy(zero_copy_only=False)
        has_old = ~np.isnan(lon_o)
        keys = []
        for z in zooms:
            tx, ty = tile_xy(lon, lat, z)
            keys.append(
                (np.int64(z) << np.int64(44)) | (tx << np.int64(22)) | ty
            )
            if has_old.any():
                txo, tyo = tile_xy(lon_o[has_old], lat_o[has_old], z)
                keys.append(
                    (np.int64(z) << np.int64(44)) | (txo << np.int64(22)) | tyo
                )
        return pa.table({"k": pa.array(np.unique(np.concatenate(keys)))})

    dirty = np.unique(np.concatenate([
        b["k"].to_numpy(zero_copy_only=False)
        for b in diff_ds.map_batches(
            dirty_keys_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ] or [np.empty(0, np.int64)]))
    dirty_ref = _ray.put(dirty)

    # vectorized sorted-set membership — no Python dict probes
    def in_dirty(batch: pa.Table) -> pa.Table:
        dk = _ray.get(dirty_ref)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(lon), dtype=bool)
        if dk.size:
            for z in zooms:
                tx, ty = tile_xy(lon, lat, z)
                k = (np.int64(z) << np.int64(44)) | (tx << np.int64(22)) | ty
                pos = np.clip(np.searchsorted(dk, k), 0, dk.size - 1)
                keep |= dk[pos] == k
        return batch.filter(pa.array(keep))

    subset = new_features_ds.map_batches(in_dirty, batch_format="pyarrow")
    tiles = build_tiles(
        subset, zooms=zooms, max_per_tile=max_per_tile,
        num_buckets=num_buckets,
    )

    # a feature in a dirty z-a tile may land in a CLEAN z-b tile: keep
    # only tiles whose own key is dirty
    def only_dirty_tiles(batch: pa.Table) -> pa.Table:
        dk = _ray.get(dirty_ref)
        z = batch["zoom"].to_numpy(zero_copy_only=False).astype(np.int64)
        tx = batch["tx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch["ty"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = (z << np.int64(44)) | (tx << np.int64(22)) | ty
        if not dk.size:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(dk, k), 0, dk.size - 1)
        return batch.filter(pa.array(dk[pos] == k))

    return tiles.map_batches(only_dirty_tiles, batch_format="pyarrow")
