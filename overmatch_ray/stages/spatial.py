"""Spatial neighborhood operators over the 256 m EPSG:3857 cell grid:
bounded-radius pair generation, k-nearest-neighbor join, and grid DBSCAN.

All three reuse the conflation join's partitioning (SURVEY.md §2.4-J1,
reference ``scripts/match.py`` neighborhood semantics): probe rows carry
their OWN cell, candidate rows are replicated to the k-ring-1 (9 cells),
so every pair within ``radius_m ≤ CELL_SIZE_M`` meets in exactly one
(probe-cell, replica-cell) coincidence — an equi-join on ``cell``,
bucketed by ``hash(cell) % B`` so the shuffle has a bounded group count.

Scale notes:
- ONE all-to-all per operator core (the bucketed cell co-shuffle); the
  candidate side pays the ×9 replication, so call with the NARROW side as
  ``right_ds`` (CLAUDE.md rule).
- Per-bucket work is numpy searchsorted + vectorized distance; top-k for
  the kNN join happens INSIDE the bucket (a probe's whole disk lives in
  its own cell group), so no second shuffle.
- DBSCAN's label step reuses ``dedup.dedup_clusters`` (driver union-find
  under a 2M-edge bound, distributed min-label propagation above), and
  its core/border joins are `semi_join_shuffled` / `bucket_hash_join` —
  ids, never payloads, cross those shuffles.
"""

from __future__ import annotations

import numpy as np

from .groupops import concat_ranges
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..cell import cell_id, kring1_cells
from ..geo import mercator_xy
from .cellindex import bucket_of


def _auto_buckets(num_buckets: int | None) -> int:
    if num_buckets is not None:
        return num_buckets
    import ray as _ray

    return max(16, 2 * int(_ray.cluster_resources().get("CPU", 32)))


def _encode_side(id_col: str, lon_col: str, lat_col: str, num_buckets: int,
                 side: int, replicate: bool):
    """map_batches kernel → (id, x, y, cell, bucket, side); candidate side
    (side=1) is replicated to its 9 k-ring-1 cells."""

    def _enc(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x, y = mercator_xy(lon, lat)
        if replicate:
            cells = kring1_cells(cell_id(x, y)).ravel()
            rep = np.repeat(np.arange(ids.size), 9)
            ids, x, y = ids[rep], x[rep], y[rep]
        else:
            cells = cell_id(x, y)
        return pa.table(
            {
                "id": pa.array(ids),
                "x": pa.array(x),
                "y": pa.array(y),
                "cell": pa.array(cells.view(np.int64)),
                "bucket": pa.array(bucket_of(cells, num_buckets)),
                "side": pa.array(np.full(ids.size, side, np.int8)),
            }
        )

    return _enc


def _pairs_empty(topk: bool, emit_dist: bool) -> pd.DataFrame:
    cols = {
        "id_a": pd.Series(dtype=np.int64),
        "id_b": pd.Series(dtype=np.int64),
    }
    if emit_dist:
        cols["dist_m"] = pd.Series(dtype=np.float64)
    if topk:
        cols["knn_rank"] = pd.Series(dtype=np.int64)
    return pd.DataFrame(cols)


def _bucket_pairs_fn(radius_m: float, k: int | None, exclude_self: bool,
                     round_to: int | None, emit_dist: bool = True):
    """Per-bucket kernel: probe rows (side 0) vs cell-sorted candidates
    (side 1) via searchsorted; distance filter; optional in-bucket top-k
    with deterministic (distance, id) tie-break.

    Arrow in/out (VERDICT r3 #3): the bucket table's numeric columns read
    zero-copy into numpy and the result is emitted as a pyarrow table —
    no per-bucket pandas frame on either side.

    ``emit_dist=False`` drops dist_m INSIDE the kernel rather than via a
    downstream ``select_columns`` — Dataset.schema() after
    select_columns-on-map_groups can report the pre-projection columns
    while the blocks carry the projected ones, and schema-trusting
    consumers (semi_join_shuffled's union alignment) then corrupt the
    shuffle. Emitting the final shape here keeps blocks and schema in
    agreement."""

    def _emit(ida, idb, d, rank) -> pa.Table:
        cols = {"id_a": pa.array(ida, pa.int64()),
                "id_b": pa.array(idb, pa.int64())}
        if emit_dist:
            cols["dist_m"] = pa.array(d, pa.float64())
        if k is not None:
            cols["knn_rank"] = pa.array(rank, pa.int64())
        return pa.table(cols)

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        am = side == 0
        bm = ~am
        if not am.any() or not bm.any():
            z = np.empty(0, np.int64)
            return _emit(z, z, np.empty(0, np.float64), z)
        cell = g["cell"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        xs = g["x"].to_numpy(zero_copy_only=False)
        ys = g["y"].to_numpy(zero_copy_only=False)
        ac = cell[am]
        order = np.argsort(cell[bm], kind="mergesort")
        bc = cell[bm][order]
        lo = np.searchsorted(bc, ac, "left")
        hi = np.searchsorted(bc, ac, "right")
        counts = hi - lo
        ai = np.repeat(np.arange(ac.size), counts)
        bi = (
            concat_ranges(lo, hi)
            if counts.sum()
            else np.empty(0, np.int64)
        )
        bsel = order[bi]
        ax, ay, ida = xs[am][ai], ys[am][ai], ids[am][ai]
        bx, by, idb = xs[bm][bsel], ys[bm][bsel], ids[bm][bsel]
        # sqrt((dx)^2+(dy)^2) term-for-term == the DuckDB oracle expression
        d = np.sqrt((ax - bx) ** 2 + (ay - by) ** 2)
        m = d <= radius_m
        if exclude_self:
            m &= ida != idb
        ida, idb, d = ida[m], idb[m], d[m]
        rank = None
        if k is not None:
            o = np.lexsort((idb, d, ida))  # (id_a, dist_m, id_b) ascending
            ida, idb, d = ida[o], idb[o], d[o]
            starts = np.flatnonzero(
                np.concatenate([[True], ida[1:] != ida[:-1]])
            ) if ida.size else np.empty(0, np.int64)
            ends = np.concatenate([starts[1:], [ida.size]]) if ida.size else starts
            grp = np.repeat(np.arange(starts.size), ends - starts)
            rank = np.arange(ida.size, dtype=np.int64) - starts[grp] + 1
            keep = rank <= k
            ida, idb, d, rank = ida[keep], idb[keep], d[keep], rank[keep]
        if round_to is not None:
            d = np.round(d, round_to)
        return _emit(ida, idb, d, rank)

    return join_bucket


def _pair_plan(left_ds, right_ds, radius_m, *, left_id, right_id, lon_col,
               lat_col, num_buckets, k, exclude_self, round_to,
               emit_dist=True):
    from .. import CELL_SIZE_M

    if radius_m > CELL_SIZE_M:
        raise ValueError(
            f"radius {radius_m} m exceeds the {CELL_SIZE_M} m cell edge; "
            "the k-ring-1 neighborhood would miss pairs"
        )
    nb = _auto_buckets(num_buckets)
    probe = left_ds.map_batches(
        _encode_side(left_id, lon_col, lat_col, nb, 0, replicate=False),
        batch_format="pyarrow",
    )
    cand = right_ds.map_batches(
        _encode_side(right_id, lon_col, lat_col, nb, 1, replicate=True),
        batch_format="pyarrow",
    )
    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    return (
        probe.union(cand)
        .materialize()
        .groupby("bucket")
        .map_groups(
            _bucket_pairs_fn(radius_m, k, exclude_self, round_to, emit_dist),
            batch_format="pyarrow",
        )
    )


def radius_pairs(
    left_ds,
    right_ds,
    radius_m: float,
    *,
    left_id: str = "id",
    right_id: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int | None = None,
    exclude_self: bool = False,
    round_to: int | None = None,
    emit_dist: bool = True,
):
    """All (left, right) pairs with planar EPSG:3857 distance ≤ radius_m
    → (id_a, id_b, dist_m). ``exclude_self`` drops id_a == id_b (for
    self-joins, where each unordered pair then appears in BOTH directions
    — exactly what neighbor counting wants). ``emit_dist=False`` projects
    dist_m away inside the kernel (see ``_bucket_pairs_fn``)."""
    return _pair_plan(
        left_ds, right_ds, radius_m,
        left_id=left_id, right_id=right_id, lon_col=lon_col, lat_col=lat_col,
        num_buckets=num_buckets, k=None, exclude_self=exclude_self,
        round_to=round_to, emit_dist=emit_dist,
    )


def spatial_knn_join(
    left_ds,
    right_ds,
    k: int,
    radius_m: float,
    *,
    left_id: str = "id",
    right_id: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int | None = None,
    round_to: int | None = 1,
):
    """Bounded-radius k-nearest-neighbor join: for each left point, its k
    nearest right points within ``radius_m`` (ties broken by right id —
    fully deterministic) → (id_a, id_b, dist_m, knn_rank), knn_rank 1-based.

    Top-k runs INSIDE the cell-join bucket — a probe's entire ≤radius disk
    shares its own-cell group, so no per-probe second shuffle. SQL analog:
    ``row_number() OVER (PARTITION BY a.id ORDER BY dist, b.id) <= k``."""
    return _pair_plan(
        left_ds, right_ds, radius_m,
        left_id=left_id, right_id=right_id, lon_col=lon_col, lat_col=lat_col,
        num_buckets=num_buckets, k=k, exclude_self=False, round_to=round_to,
    )


# 3x3 binomial kernel for cell-count smoothing (integer weights → exact
# cross-engine parity of the smoothed sums)
_KERNEL3 = [(-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
            (0, -1, 2), (0, 0, 4), (0, 1, 2),
            (1, -1, 1), (1, 0, 2), (1, 1, 1)]


def kernel_smooth_counts(counts_ds, x_col: str = "cell_x",
                         y_col: str = "cell_y", n_col: str = "n",
                         out_col: str = "heat"):
    """Heatmap smoothing over a per-cell count grid: 3×3 binomial kernel
    (1-2-1 ⊗ 1-2-1) as a raster convolution WITHOUT a raster — each
    (cell, count) row replicates to its 9 neighbors carrying w·count,
    then one groupby sums. The shuffle moves 9 rows per NON-EMPTY cell
    (sparse-grid convolution), never a dense raster; weights are integers
    so the result is exact at any partitioning. Output cells include
    empty cells that have non-empty neighbors — exactly the CROSS JOIN
    kernel-table SQL analog."""
    from ray.data.aggregate import Sum

    def splat(batch: pa.Table) -> pa.Table:
        cx = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = np.array([k[0] for k in _KERNEL3], np.int64)
        dy = np.array([k[1] for k in _KERNEL3], np.int64)
        w = np.array([k[2] for k in _KERNEL3], np.int64)
        return pa.table(
            {
                x_col: pa.array((cx[:, None] + dx[None, :]).ravel()),
                y_col: pa.array((cy[:, None] + dy[None, :]).ravel()),
                "wn": pa.array((n[:, None] * w[None, :]).ravel()),
            }
        )

    out = (
        counts_ds.map_batches(splat, batch_format="pyarrow")
        .groupby([x_col, y_col])
        .aggregate(Sum("wn", alias_name=out_col))
    )

    def cast_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                x_col: batch[x_col].cast(pa.int64()),
                y_col: batch[y_col].cast(pa.int64()),
                out_col: batch[out_col].cast(pa.int64()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow")


def zonal_stats(raster_ds, zones, x_col: str = "cell_x",
                y_col: str = "cell_y", val_col: str = "heat"):
    """Raster→vector ZONAL STATISTICS: aggregate a sparse raster's cell
    values inside each of a small set of convex polygon zones — the
    inverse direction of ``kernel_smooth_counts``'s vector→raster splat,
    completing the north rule's raster↔vector pair.

    ``zones`` = [(zone_id, [(x, y) × 4 CCW])] in GRID units. Plan: zones
    are a tiny driver constant carried in the task closure; every raster
    block tests its cell CENTERS (cell + 0.5) against each zone's four
    half-planes vectorized (K·rows cross products, zero shuffle); only
    the (zone_id, value) survivor rows enter one final tiny groupby.
    Overlapping zones double-count by design (each zone is an independent
    aggregation region). Scale: raster rows stream; the dense zone loop
    is O(K) per block — for thousands of zones route through the bbox
    cell-cover join (``bbox_join``) instead."""
    from ray.data.aggregate import Count, Max, Sum

    def tag(batch: pa.Table) -> pa.Table:
        cx = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64) + 0.5
        cy = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64) + 0.5
        val = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # seed with typed empties: zones=[] must yield an empty result,
        # not a np.concatenate crash in every task
        zid_out = [np.empty(0, np.int64)]
        val_out = [np.empty(0, np.int64)]
        for zid, quad in zones:
            inside = np.ones(cx.shape, bool)
            for (x1, y1), (x2, y2) in zip(quad, quad[1:] + quad[:1]):
                # literal-mirrored with the SQL oracle: same op order
                inside &= ((x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)) > 0
            zid_out.append(np.full(int(inside.sum()), zid, np.int64))
            val_out.append(val[inside])
        return pa.table(
            {
                "zone_id": pa.array(np.concatenate(zid_out)),
                "zval": pa.array(np.concatenate(val_out)),
            }
        )

    out = (
        raster_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("zone_id")
        .aggregate(
            Count(alias_name="n_cells"),
            Sum("zval", alias_name="total_heat"),
            Max("zval", alias_name="max_heat"),
        )
    )

    def cast_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": batch["zone_id"].cast(pa.int64()),
                "n_cells": batch["n_cells"].cast(pa.int64()),
                "total_heat": batch["total_heat"].cast(pa.int64()),
                "max_heat": batch["max_heat"].cast(pa.int64()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow")


_BIAS = np.uint64(1 << 31)


def _pack_ij(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """(ix, iy) grid coords → uint64 cell id (cell.py layout)."""
    return ((ix.astype(np.uint64) + _BIAS) << np.uint64(32)) | (
        iy.astype(np.uint64) + _BIAS
    )


def _cover_side(id_col: str, num_buckets: int, side: int, cell_size: float,
                max_cover: int = 4096):
    """map_batches kernel: replicate each box (id, xmin, ymin, xmax, ymax)
    to EVERY grid cell it touches. Both join sides get the full cover —
    the canonical-cell dedup rule needs the intersection's min-corner cell
    present in both sides' covers."""

    def _cover(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        xmin = batch["xmin"].to_numpy(zero_copy_only=False)
        ymin = batch["ymin"].to_numpy(zero_copy_only=False)
        xmax = batch["xmax"].to_numpy(zero_copy_only=False)
        ymax = batch["ymax"].to_numpy(zero_copy_only=False)
        ix0 = np.floor(xmin / cell_size).astype(np.int64)
        ix1 = np.floor(xmax / cell_size).astype(np.int64)
        iy0 = np.floor(ymin / cell_size).astype(np.int64)
        iy1 = np.floor(ymax / cell_size).astype(np.int64)
        nx = ix1 - ix0 + 1
        ny = iy1 - iy0 + 1
        counts = nx * ny
        if counts.size and counts.max() > max_cover:
            raise ValueError(
                f"a box covers {counts.max()} cells (> {max_cover}); "
                "increase cell_size or pre-split giant geometries"
            )
        tot = int(counts.sum())
        row = np.repeat(np.arange(ids.size), counts)
        start = np.concatenate([[0], np.cumsum(counts)[:-1]]) if ids.size else (
            np.empty(0, np.int64)
        )
        local = np.arange(tot) - np.repeat(start, counts)
        cix = ix0[row] + local % np.maximum(nx[row], 1)
        ciy = iy0[row] + local // np.maximum(nx[row], 1)
        cells = _pack_ij(cix, ciy)
        return pa.table(
            {
                "id": pa.array(ids[row]),
                "xmin": pa.array(xmin[row]),
                "ymin": pa.array(ymin[row]),
                "xmax": pa.array(xmax[row]),
                "ymax": pa.array(ymax[row]),
                "cell": pa.array(cells.view(np.int64)),
                "bucket": pa.array(bucket_of(cells, num_buckets)),
                "side": pa.array(np.full(row.size, side, np.int8)),
            }
        )

    return _cover


def bbox_intersection_join(
    left_ds,
    right_ds,
    *,
    left_id: str = "id",
    right_id: str = "id",
    num_buckets: int | None = None,
    cell_size: float | None = None,
):
    """2D box-intersection join (PBSM / partition-based spatial merge):
    boxes as (id, xmin, ymin, xmax, ymax) in EPSG:3857 planar meters,
    CLOSED-interval overlap semantics — exactly the SQL inequality join
    ``a.xmin <= b.xmax AND b.xmin <= a.xmax AND a.ymin <= b.ymax AND
    b.ymin <= a.ymax``. Output (id_a, id_b, overlap_m2).

    Each box replicates to the grid cells it touches (bounded by box
    extent / cell_size, guarded); candidates meet via the bucketed cell
    equi-join; a pair found in several shared cells is emitted ONCE by the
    canonical-cell rule — keep it only in the cell containing the
    intersection's min corner (that cell is in both covers by
    construction). One all-to-all; no post-shuffle dedup pass."""
    from .. import CELL_SIZE_M

    cs = float(cell_size if cell_size is not None else CELL_SIZE_M)
    nb = _auto_buckets(num_buckets)
    left = left_ds.map_batches(
        _cover_side(left_id, nb, 0, cs), batch_format="pyarrow"
    )
    right = right_ds.map_batches(
        _cover_side(right_id, nb, 1, cs), batch_format="pyarrow"
    )

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow in/out (VERDICT r3 #3): numeric columns read zero-copy
        side = g["side"].to_numpy(zero_copy_only=False)
        am = side == 0
        bm = ~am
        empty = pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "overlap_m2": pa.array([], pa.float64()),
        })
        if not am.any() or not bm.any():
            return empty
        cell = g["cell"].to_numpy(zero_copy_only=False)
        ac = cell[am]
        order = np.argsort(cell[bm], kind="mergesort")
        bc = cell[bm][order]
        lo = np.searchsorted(bc, ac, "left")
        hi = np.searchsorted(bc, ac, "right")
        counts = hi - lo
        if counts.sum() == 0:
            return empty
        ai = np.repeat(np.arange(ac.size), counts)
        bsel = order[concat_ranges(lo, hi)]

        def col(name):
            return g[name].to_numpy(zero_copy_only=False)

        axmin, aymin = col("xmin")[am][ai], col("ymin")[am][ai]
        axmax, aymax = col("xmax")[am][ai], col("ymax")[am][ai]
        bxmin, bymin = col("xmin")[bm][bsel], col("ymin")[bm][bsel]
        bxmax, bymax = col("xmax")[bm][bsel], col("ymax")[bm][bsel]
        ox = np.minimum(axmax, bxmax) - np.maximum(axmin, bxmin)
        oy = np.minimum(aymax, bymax) - np.maximum(aymin, bymin)
        m = (ox >= 0) & (oy >= 0)
        # canonical cell: the one holding the intersection's min corner
        ccell = _pack_ij(
            np.floor(np.maximum(axmin, bxmin) / cs).astype(np.int64),
            np.floor(np.maximum(aymin, bymin) / cs).astype(np.int64),
        ).view(np.int64)
        m &= ccell == ac[ai]
        return pa.table(
            {
                "id_a": pa.array(col("id")[am][ai][m], pa.int64()),
                "id_b": pa.array(col("id")[bm][bsel][m], pa.int64()),
                "overlap_m2": pa.array((ox * oy)[m], pa.float64()),
            }
        )

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    return (
        left.union(right)
        .materialize()
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def areal_interpolate(
    src_ds,
    dst_ds,
    value_col: str,
    *,
    scale: int = 1_000_000,
    src_id: str = "id",
    dst_id: str = "id",
    num_buckets: int | None = None,
    cell_size: float | None = None,
):
    """Area-weighted areal interpolation — the standard polygon-to-polygon
    value transfer (census-tract → grid style), axis-aligned-box geometry:
    each source box spreads its value uniformly over its own area, and a
    target box receives ``Σ_src value · overlap / area_src``.

    Each term is FLOORED onto a 1/``scale`` grid and summed as INTEGERS,
    so the per-target sum is order-free (the decimeter-floor trick) and a
    SQL oracle can mirror it bit-exactly: with integer-valued box edges
    and integer values, ``scale·v·overlap`` is exact in float64 and the
    single division is the only rounding — identical in both engines.

    Shape: the PBSM box join (one all-to-all), then (value, area) attach
    via a bucketed hash join on the src id — pair-count-bounded, the src
    corpus never re-replicates — then a bucketed integer sum per target
    (group count ≈ targets, so the native reduce's per-group Python cost
    is avoided). Output: (``dst_id``, interp_scaled int64)."""
    from .groupops import bucketed_aggregate
    from .joins import bucket_hash_join

    pairs = bbox_intersection_join(
        src_ds, dst_ds, left_id=src_id, right_id=dst_id,
        num_buckets=num_buckets, cell_size=cell_size,
    )

    def payload(batch: pa.Table) -> pa.Table:
        xmin = batch["xmin"].to_numpy(zero_copy_only=False)
        ymin = batch["ymin"].to_numpy(zero_copy_only=False)
        xmax = batch["xmax"].to_numpy(zero_copy_only=False)
        ymax = batch["ymax"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": batch[src_id].cast(pa.int64()),
            "__v": batch[value_col].to_numpy(zero_copy_only=False)
                   .astype(np.float64),
            "__area": pa.array((xmax - xmin) * (ymax - ymin)),
        })

    src_pay = src_ds.map_batches(payload, batch_format="pyarrow")
    joined = bucket_hash_join(
        pairs.materialize(), src_pay, "id_a", "id_a",
        num_buckets=num_buckets or 32,
    )

    def term(batch: pa.Table) -> pa.Table:
        v = batch["__v"].to_numpy(zero_copy_only=False)
        o = batch["overlap_m2"].to_numpy(zero_copy_only=False)
        area = batch["__area"].to_numpy(zero_copy_only=False)
        t = np.floor(float(scale) * v * o / area).astype(np.int64)
        return pa.table({
            dst_id: batch["id_b"].cast(pa.int64()),
            "__t": pa.array(t),
        })

    return bucketed_aggregate(
        joined.map_batches(term, batch_format="pyarrow"),
        [dst_id], {"interp_scaled": ("__t", "sum")},
        num_buckets=num_buckets or 32,
    )


def resample_tracks(
    ds,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    step_us: int,
    num_buckets: int = 32,
    tiebreak_col: str | None = None,
):
    """GPS-track temporal resampling: per key, linearly interpolate the
    track onto a fixed time grid — grid points are the multiples of
    ``step_us`` strictly inside [first ping, last ping), each bracketed
    by its surrounding pings with ``frac = (t−t0)/(t1−t0)`` (the standard
    fleet-telemetry normalization before cross-track analytics; exact
    grid hits take the left ping, frac = 0). Duplicate timestamps need a
    ``tiebreak_col`` for a deterministic ping order (partitioning must
    not matter).

    ``ts_col`` must be int64 epoch MICROSECONDS (cast timestamps before
    the call) so grid arithmetic is integer-exact; with integer-valued
    planar coordinates the whole interpolation chain (one division, one
    multiply, one add — authored in that order) is bit-identical to a
    SQL oracle writing the same expressions. Output rows per key =
    span/step — the CALLER picks a step that bounds it; nothing
    driver-side.

    One bucketed shuffle; each key's grid+searchsorted interpolation is
    vectorized numpy inside the bucket kernel."""
    from .groupops import bucketed_group_apply

    step = int(step_us)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_t, out_x, out_y = [], [], [], []
        for key, sub in g.groupby(key_col, sort=False):
            by = [ts_col, tiebreak_col] if tiebreak_col else [ts_col]
            sub = sub.sort_values(by, kind="mergesort")
            tu = sub[ts_col].to_numpy(dtype=np.int64)
            if tu.size < 2:
                continue
            x = sub[x_col].to_numpy(dtype=np.float64)
            y = sub[y_col].to_numpy(dtype=np.float64)
            start = ((tu[0] + step - 1) // step) * step
            grid = np.arange(start, tu[-1], step, dtype=np.int64)
            if grid.size == 0:
                continue
            idx = np.searchsorted(tu, grid, side="right") - 1
            frac = (grid - tu[idx]).astype(np.float64) \
                / (tu[idx + 1] - tu[idx]).astype(np.float64)
            out_k.extend([key] * grid.size)
            out_t.extend(grid.tolist())
            out_x.extend((x[idx] + (x[idx + 1] - x[idx]) * frac).tolist())
            out_y.extend((y[idx] + (y[idx + 1] - y[idx]) * frac).tolist())
        return pd.DataFrame({
            key_col: np.asarray(out_k),
            "t": np.asarray(out_t, dtype=np.int64),
            "x_i": np.asarray(out_x, dtype=np.float64),
            "y_i": np.asarray(out_y, dtype=np.float64),
        })

    return bucketed_group_apply(ds, [key_col], kernel, num_buckets=num_buckets)


def idw_interpolate(
    src_ds,
    dst_ds,
    value_col: str,
    radius_m: float,
    *,
    scale: int = 1_000_000,
    src_id: str = "id",
    dst_id: str = "id",
    num_buckets: int | None = None,
):
    """Inverse-distance-weighted point interpolation — the point-sample
    sibling of ``areal_interpolate``: every target point receives
    ``Σ_src value / d²`` over the sources within ``radius_m`` (coincident
    points d²=0 are EXCLUDED, standard IDW-at-a-sample semantics), plus
    the contributing-source count. Terms are FLOORED onto a 1/``scale``
    grid and summed as integers — order-free and, with integer-valued
    planar coordinates and integer values, bit-exactly SQL-mirrorable
    (d² is exact, ``scale·v`` is exact, the one division is the only
    rounding). With raw-trig float coordinates the floor grid is subject
    to cross-engine ulps — keep oracle corpora on an integer lattice
    (the ``_formula_boxes`` rule).

    Shape: the k-ring cell co-shuffle of the 100 m conflation join —
    sources replicate ×9 (the NARROW side replicates), targets carry
    their one cell, pairs meet in exactly one bucket group (no dedup
    rule needed: the target's own cell is unique) — then a bucketed
    integer sum per target. Requires ``radius_m`` ≤ the cell size."""
    from .. import CELL_SIZE_M
    from ..cell import cell_id, kring1_cells
    from .groupops import bucketed_aggregate, concat_ranges

    if radius_m > CELL_SIZE_M:
        raise ValueError(
            f"idw_interpolate: radius {radius_m} exceeds the k-ring-1 "
            f"guarantee at cell size {CELL_SIZE_M}"
        )
    r2 = float(radius_m) * float(radius_m)
    nb = _auto_buckets(num_buckets)

    def probe(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "id": batch[dst_id].cast(pa.int64()),
            "x": pa.array(x), "y": pa.array(y),
            "v": pa.array(np.zeros(len(x))),
            "cell": pa.array(cell_id(x, y).view(np.int64)),
            "side": pa.array(np.zeros(len(x), np.int8)),
        })

    def index_side(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch[src_id].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = kring1_cells(cell_id(x, y)).ravel()
        rep = np.repeat(np.arange(ids.size), 9)
        return pa.table({
            "id": pa.array(ids[rep]),
            "x": pa.array(x[rep]), "y": pa.array(y[rep]),
            "v": pa.array(v[rep]),
            "cell": pa.array(cells.view(np.int64)),
            "side": pa.array(np.ones(rep.size, np.int8)),
        })

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    both = dst_ds.map_batches(probe, batch_format="pyarrow").union(
        src_ds.map_batches(index_side, batch_format="pyarrow")
    ).materialize()

    def bucketize(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket",
            pa.array((cell.view(np.uint64) % np.uint64(nb)).astype(np.int64)),
        )

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = g["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "__t": pa.array([], pa.int64()),
            "__one": pa.array([], pa.int64()),
        })
        a_idx = np.flatnonzero(side == 0)
        b_idx = np.flatnonzero(side != 0)
        if a_idx.size == 0 or b_idx.size == 0:
            return empty
        bo = b_idx[np.argsort(cells[b_idx], kind="mergesort")]
        bc = cells[bo]
        lo = np.searchsorted(bc, cells[a_idx], "left")
        hi = np.searchsorted(bc, cells[a_idx], "right")
        counts = hi - lo
        if not counts.sum():
            return empty
        ai = np.repeat(a_idx, counts)
        bi = bo[concat_ranges(lo, hi)]
        d2 = (x[ai] - x[bi]) ** 2 + (y[ai] - y[bi]) ** 2  # SQL form
        m = (d2 > 0.0) & (d2 <= r2)
        if not m.any():
            return empty
        t = np.floor(float(scale) * v[bi][m] / d2[m]).astype(np.int64)
        return pa.table({
            "id": pa.array(ids[ai][m]),
            "__t": pa.array(t),
            "__one": pa.array(np.ones(t.size, np.int64)),
        })

    terms = (
        both.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    out = bucketed_aggregate(
        terms, ["id"],
        {"idw_scaled": ("__t", "sum"), "n_src": ("__one", "sum")},
        num_buckets=nb,
    )
    if dst_id == "id":
        return out

    def ren(batch: pa.Table) -> pa.Table:
        return pa.table({
            dst_id: batch["id"],
            "idw_scaled": batch["idw_scaled"],
            "n_src": batch["n_src"],
        })

    return out.map_batches(ren, batch_format="pyarrow")


def triangle_point_join(
    tri_ds,
    pts_ds,
    *,
    tri_id: str = "id",
    pt_id: str = "id",
    num_buckets: int | None = None,
    cell_size: float | None = None,
):
    """Distributed polygon-containment join, triangle case: triangles as
    (id, ax, ay, bx, by, cx, cy), points as (id, x, y), both in planar
    meters. CLOSED containment via three integer-exact cross-product sign
    tests (all ≥ 0 or all ≤ 0, zero-area triangles match nothing) — the
    same half-plane SQL an oracle can express. Output (tri_id, pt_id).

    Partitioning: triangles replicate to their bbox's cell cover (PBSM,
    guarded), points carry their ONE own cell — so a (triangle, point)
    pair meets in exactly one group and needs no dedup rule. Extends the
    broadcast-only division-polygon PIP (S4/M23, reference
    scripts/get_divisions.py semantics) to polygon sets too large to
    broadcast; general polygons ride the same plan with
    ``geo.PackedPolygon.contains`` as the residual test."""
    from .. import CELL_SIZE_M

    cs = float(cell_size if cell_size is not None else CELL_SIZE_M)
    nb = _auto_buckets(num_buckets)

    def tri_cover(batch: pa.Table) -> pa.Table:
        ids = batch[tri_id].to_numpy(zero_copy_only=False).astype(np.int64)
        ax = batch["ax"].to_numpy(zero_copy_only=False)
        ay = batch["ay"].to_numpy(zero_copy_only=False)
        bx = batch["bx"].to_numpy(zero_copy_only=False)
        by = batch["by"].to_numpy(zero_copy_only=False)
        cx = batch["cx"].to_numpy(zero_copy_only=False)
        cy = batch["cy"].to_numpy(zero_copy_only=False)
        xmin = np.minimum(np.minimum(ax, bx), cx)
        xmax = np.maximum(np.maximum(ax, bx), cx)
        ymin = np.minimum(np.minimum(ay, by), cy)
        ymax = np.maximum(np.maximum(ay, by), cy)
        ix0 = np.floor(xmin / cs).astype(np.int64)
        ix1 = np.floor(xmax / cs).astype(np.int64)
        iy0 = np.floor(ymin / cs).astype(np.int64)
        iy1 = np.floor(ymax / cs).astype(np.int64)
        nx = ix1 - ix0 + 1
        ny = iy1 - iy0 + 1
        counts = nx * ny
        if counts.size and counts.max() > 4096:
            raise ValueError(
                f"a triangle bbox covers {counts.max()} cells (> 4096)"
            )
        tot = int(counts.sum())
        row = np.repeat(np.arange(ids.size), counts)
        start = (np.concatenate([[0], np.cumsum(counts)[:-1]]) if ids.size
                 else np.empty(0, np.int64))
        local = np.arange(tot) - np.repeat(start, counts)
        cells = _pack_ij(
            ix0[row] + local % np.maximum(nx[row], 1),
            iy0[row] + local // np.maximum(nx[row], 1),
        )
        return pa.table(
            {
                "id": pa.array(ids[row]),
                "ax": pa.array(ax[row]), "ay": pa.array(ay[row]),
                "bx": pa.array(bx[row]), "by": pa.array(by[row]),
                "cx": pa.array(cx[row]), "cy": pa.array(cy[row]),
                "px": pa.array(np.zeros(row.size)),
                "py": pa.array(np.zeros(row.size)),
                "cell": pa.array(cells.view(np.int64)),
                "bucket": pa.array(bucket_of(cells, nb)),
                "side": pa.array(np.full(row.size, 1, np.int8)),
            }
        )

    def pt_own(batch: pa.Table) -> pa.Table:
        ids = batch[pt_id].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        cells = _pack_ij(
            np.floor(x / cs).astype(np.int64), np.floor(y / cs).astype(np.int64)
        )
        z = np.zeros(ids.size)
        return pa.table(
            {
                "id": pa.array(ids),
                "ax": pa.array(z), "ay": pa.array(z),
                "bx": pa.array(z), "by": pa.array(z),
                "cx": pa.array(z), "cy": pa.array(z),
                "px": pa.array(x),
                "py": pa.array(y),
                "cell": pa.array(cells.view(np.int64)),
                "bucket": pa.array(bucket_of(cells, nb)),
                "side": pa.array(np.full(ids.size, 0, np.int8)),
            }
        )

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow in/out (VERDICT r3 #3)
        empty = pa.table({
            "tri_id": pa.array([], pa.int64()),
            "pt_id": pa.array([], pa.int64()),
        })
        side = g["side"].to_numpy(zero_copy_only=False)
        pm = side == 0
        tm = ~pm
        if not pm.any() or not tm.any():
            return empty
        cell = g["cell"].to_numpy(zero_copy_only=False)
        pc_ = cell[pm]
        order = np.argsort(cell[tm], kind="mergesort")
        tc = cell[tm][order]
        lo = np.searchsorted(tc, pc_, "left")
        hi = np.searchsorted(tc, pc_, "right")
        counts = hi - lo
        if counts.sum() == 0:
            return empty
        pi = np.repeat(np.arange(pc_.size), counts)
        ti = order[concat_ranges(lo, hi)]

        def col(name):
            return g[name].to_numpy(zero_copy_only=False)

        px, py = col("px")[pm][pi], col("py")[pm][pi]
        ax, ay = col("ax")[tm][ti], col("ay")[tm][ti]
        bx, by = col("bx")[tm][ti], col("by")[tm][ti]
        cx, cy = col("cx")[tm][ti], col("cy")[tm][ti]
        d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        d2 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
        d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inside = (
            ((d1 >= 0) & (d2 >= 0) & (d3 >= 0))
            | ((d1 <= 0) & (d2 <= 0) & (d3 <= 0))
        ) & (area2 != 0)
        return pa.table(
            {
                "tri_id": pa.array(col("id")[tm][ti][inside], pa.int64()),
                "pt_id": pa.array(col("id")[pm][pi][inside], pa.int64()),
            }
        )

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    return (
        pts_ds.map_batches(pt_own, batch_format="pyarrow")
        .union(tri_ds.map_batches(tri_cover, batch_format="pyarrow"))
        .materialize()
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def snap_points_to_segments(
    pts_ds,
    seg_ds,
    radius_m: float,
    *,
    pt_id: str = "id",
    seg_id: str = "id",
    num_buckets: int | None = None,
    cell_size: float | None = None,
):
    """Map-matching primitive: snap each point to its nearest line
    segment within ``radius_m``. Points as (id, x, y); segments as
    (id, ax, ay, bx, by), planar meters. Distance = point-to-segment with
    clamped projection (t ∈ [0,1]); nearest wins with (distance, seg id)
    tie-break → one row (pt_id, seg_id, dist_m, t) per matched point,
    dist_m floored to decimeters (exact cross-engine, track_lengths
    trick); t is the clamped projection parameter.

    Partitioning: segments replicate to their bbox cell cover EXPANDED by
    ``radius_m`` (so any cell whose points can be within radius holds a
    replica; requires radius ≤ cell edge — guarded); points carry their
    ONE cell, so a point's entire candidate set shares one group and the
    per-point argmin is global without a second shuffle — same argument
    as the kNN join's in-bucket top-k."""
    from .. import CELL_SIZE_M

    cs = float(cell_size if cell_size is not None else CELL_SIZE_M)
    if radius_m > cs:
        raise ValueError(
            f"radius {radius_m} m exceeds the {cs} m cell edge; the "
            "expanded cover would miss candidates"
        )
    nb = _auto_buckets(num_buckets)

    def seg_cover(batch: pa.Table) -> pa.Table:
        ids = batch[seg_id].to_numpy(zero_copy_only=False).astype(np.int64)
        ax = batch["ax"].to_numpy(zero_copy_only=False)
        ay = batch["ay"].to_numpy(zero_copy_only=False)
        bx = batch["bx"].to_numpy(zero_copy_only=False)
        by = batch["by"].to_numpy(zero_copy_only=False)
        ix0 = np.floor((np.minimum(ax, bx) - radius_m) / cs).astype(np.int64)
        ix1 = np.floor((np.maximum(ax, bx) + radius_m) / cs).astype(np.int64)
        iy0 = np.floor((np.minimum(ay, by) - radius_m) / cs).astype(np.int64)
        iy1 = np.floor((np.maximum(ay, by) + radius_m) / cs).astype(np.int64)
        nx = ix1 - ix0 + 1
        ny = iy1 - iy0 + 1
        counts = nx * ny
        if counts.size and counts.max() > 4096:
            raise ValueError(
                f"a segment + radius covers {counts.max()} cells (> 4096)"
            )
        tot = int(counts.sum())
        row = np.repeat(np.arange(ids.size), counts)
        start = (np.concatenate([[0], np.cumsum(counts)[:-1]]) if ids.size
                 else np.empty(0, np.int64))
        local = np.arange(tot) - np.repeat(start, counts)
        cells = _pack_ij(
            ix0[row] + local % np.maximum(nx[row], 1),
            iy0[row] + local // np.maximum(nx[row], 1),
        )
        z = np.zeros(row.size)
        return pa.table(
            {
                "id": pa.array(ids[row]),
                "ax": pa.array(ax[row]), "ay": pa.array(ay[row]),
                "bx": pa.array(bx[row]), "by": pa.array(by[row]),
                "px": pa.array(z), "py": pa.array(z),
                "cell": pa.array(cells.view(np.int64)),
                "bucket": pa.array(bucket_of(cells, nb)),
                "side": pa.array(np.full(row.size, 1, np.int8)),
            }
        )

    def pt_own(batch: pa.Table) -> pa.Table:
        ids = batch[pt_id].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        cells = _pack_ij(
            np.floor(x / cs).astype(np.int64), np.floor(y / cs).astype(np.int64)
        )
        z = np.zeros(ids.size)
        return pa.table(
            {
                "id": pa.array(ids),
                "ax": pa.array(z), "ay": pa.array(z),
                "bx": pa.array(z), "by": pa.array(z),
                "px": pa.array(x), "py": pa.array(y),
                "cell": pa.array(cells.view(np.int64)),
                "bucket": pa.array(bucket_of(cells, nb)),
                "side": pa.array(np.full(ids.size, 0, np.int8)),
            }
        )

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow in/out (VERDICT r3 #3)
        empty = pa.table({
            "pt_id": pa.array([], pa.int64()),
            "seg_id": pa.array([], pa.int64()),
            "dist_m": pa.array([], pa.float64()),
            "t": pa.array([], pa.float64()),
        })
        side = g["side"].to_numpy(zero_copy_only=False)
        pm = side == 0
        sm = ~pm
        if not pm.any() or not sm.any():
            return empty
        cell = g["cell"].to_numpy(zero_copy_only=False)
        pc_ = cell[pm]
        order = np.argsort(cell[sm], kind="mergesort")
        sc = cell[sm][order]
        lo = np.searchsorted(sc, pc_, "left")
        hi = np.searchsorted(sc, pc_, "right")
        counts = hi - lo
        if counts.sum() == 0:
            return empty
        pi = np.repeat(np.arange(pc_.size), counts)
        si = order[concat_ranges(lo, hi)]

        def col(name):
            return g[name].to_numpy(zero_copy_only=False)

        px, py = col("px")[pm][pi], col("py")[pm][pi]
        ax, ay = col("ax")[sm][si], col("ay")[sm][si]
        bx, by = col("bx")[sm][si], col("by")[sm][si]
        # clamped projection — expression order mirrored in the SQL oracle
        tnum = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
        tden = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(tden > 0, np.clip(tnum / tden, 0.0, 1.0), 0.0)
        dx = px - (ax + t * (bx - ax))
        dy = py - (ay + t * (by - ay))
        d = np.sqrt(dx * dx + dy * dy)
        m = d <= radius_m
        pt, sg = col("id")[pm][pi][m], col("id")[sm][si][m]
        dist = np.floor(d[m] * 10) / 10.0
        tt = t[m]
        # per-point argmin with (dist, seg_id) tie-break — global because
        # the point's whole candidate set is in this group
        o = np.lexsort((sg, dist, pt))
        pt, sg, dist, tt = pt[o], sg[o], dist[o], tt[o]
        first = np.concatenate([[True], pt[1:] != pt[:-1]]) if pt.size else np.empty(0, bool)
        return pa.table(
            {
                "pt_id": pa.array(pt[first], pa.int64()),
                "seg_id": pa.array(sg[first], pa.int64()),
                "dist_m": pa.array(dist[first], pa.float64()),
                "t": pa.array(tt[first], pa.float64()),
            }
        )

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    return (
        pts_ds.map_batches(pt_own, batch_format="pyarrow")
        .union(seg_ds.map_batches(seg_cover, batch_format="pyarrow"))
        .materialize()
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def dbscan_points(
    ds,
    eps_m: float,
    min_pts: int,
    *,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int | None = None,
):
    """Grid DBSCAN over points: (id, cluster_id, role) with role ∈
    {core, border, noise}; noise has cluster_id = -1. Deterministic
    variant: cluster_id = the smallest core id in the density-connected
    component, and a border point joins the MINIMUM cluster id among its
    core neighbors (classic DBSCAN leaves border assignment order-
    dependent; min-label makes it partitioning-invariant).

    min_pts counts the point itself (standard), and must be ≥ 2 (core
    status is derived from the ε-pair graph, which an isolated point
    never enters).

    Plan: ε-pair self-join (one cell co-shuffle) → per-point degree
    (groupby count) → core-core edges (two shuffled semi joins) →
    connected components (``dedup_clusters``: min-label) → border = min
    core-neighbor cluster (one hash join + groupby min) → noise = anti
    semi join. Every post-pair stage moves (id, id)/(id, label) rows
    only — never point payloads."""
    import ray.data

    from .dedup import dedup_clusters
    from .joins import bucket_hash_join, semi_join_shuffled

    if min_pts < 2:
        raise ValueError("min_pts must be >= 2 (point itself is counted)")

    nb = _auto_buckets(num_buckets)
    # coalesce the pair hub: the cell groupby leaves one block per input
    # block and every downstream all-to-all (degree, 2 semi joins, CC,
    # border join, noise anti) would DOUBLE the block count again —
    # per-block overhead, not data, dominated the chain (46 s → 12.9 s at
    # sf0.1/6k pts together with the cc_edges/border/assigned coalesces). nb scales with cluster CPUs, so block size
    # stays proportional to data at any scale.
    pairs = radius_pairs(
        ds, ds, eps_m,
        left_id=id_col, right_id=id_col, lon_col=lon_col, lat_col=lat_col,
        num_buckets=num_buckets, exclude_self=True, emit_dist=False,
    ).repartition(nb).materialize()

    # degree (neighbors excluding self); core ⇔ degree + 1 >= min_pts.
    # Partial-combined per batch: a point's pairs are emitted by its own
    # cell's group, so per-batch value counts collapse the degree shuffle
    # from |pairs| rows to ~|points| rows before the groupby.
    def deg_partial(batch: pa.Table) -> pa.Table:
        ids, cnt = np.unique(
            batch["id_a"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"id_a": pa.array(ids.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    deg = (
        pairs.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("id_a")
        .sum("n")
    )

    def core_only(batch: pa.Table) -> pa.Table:
        n = batch["sum(n)"].to_numpy(zero_copy_only=False)
        keep = n + 1 >= min_pts
        return pa.table({"id": pa.array(
            batch["id_a"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        )})

    core = (
        deg.map_batches(core_only, batch_format="pyarrow")
        .repartition(max(nb // 4, 1))
        .materialize()
    )

    def as_noise(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "cluster_id": pa.array(np.full(n, -1, np.int64)),
            "role": pa.array(["noise"] * n, pa.string()),
        })

    if core.count() == 0:  # no dense region anywhere → everything is noise
        return ds.select_columns([id_col]).map_batches(
            as_noise, batch_format="pyarrow"
        )

    # core-core ε-edges; self-edges keep isolated cores as singleton
    # clusters. The ε self-join emitted every pair in BOTH directions and
    # dedup_clusters symmetrizes its input anyway — keep only id_a ≤ id_b
    # (a pure map: its mirror always exists) so the component step sees
    # half the edges and the driver fast path keeps its full edge budget.
    def _undirected(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.less_equal(batch["id_a"], batch["id_b"])
        )

    cc_edges = semi_join_shuffled(
        semi_join_shuffled(
            pairs.map_batches(_undirected, batch_format="pyarrow"),
            core, "id_a", "id",
        ),
        core, "id_b", "id",
    )

    def self_edges(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pa.table({"id_a": pa.array(ids), "id_b": pa.array(ids)})

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    cc_edges = cc_edges.union(
        core.map_batches(self_edges, batch_format="pyarrow")
    ).materialize().repartition(nb)
    core_clusters = dedup_clusters(cc_edges)  # (doc_id, cluster_id)

    def as_assign(role: str):
        def _shape(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            key = "doc_id" if "doc_id" in batch.column_names else "id_a"
            cl = ("cluster_id" if "cluster_id" in batch.column_names
                  else "min(cluster_id)")
            return pa.table({
                id_col: batch[key].cast(pa.int64()),
                "cluster_id": batch[cl].cast(pa.int64()),
                "role": pa.array([role] * n, pa.string()),
            })

        return _shape

    core_assign = core_clusters.map_batches(
        as_assign("core"), batch_format="pyarrow"
    )

    # border: non-core with ≥1 core neighbor → min core-neighbor cluster.
    # Materialized (ids only) because the no-border case is legitimate and
    # an EMPTY map_groups product reports schema()=None, which the hash
    # join (rightly) refuses to consume.
    border_cand = semi_join_shuffled(
        pairs, core, "id_a", "id", anti=True
    ).repartition(max(nb // 4, 1)).materialize()
    if border_cand.count() > 0:
        border_assign = (
            bucket_hash_join(
                border_cand, core_clusters, left_on="id_b", right_on="doc_id"
            )
            .groupby("id_a")
            .min("cluster_id")
            .map_batches(as_assign("border"), batch_format="pyarrow")
        )
    else:
        border_assign = ray.data.from_arrow(
            pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "role": pa.array([], pa.string()),
            })
        )

    assigned = (
        core_assign.union(border_assign)
        .repartition(max(nb // 4, 1))
        .materialize()
    )

    points = ds.select_columns([id_col])
    noise = semi_join_shuffled(points, assigned, id_col, id_col, anti=True)

    return assigned.union(
        noise.map_batches(as_noise, batch_format="pyarrow")
    )


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray, tol_m: float) -> np.ndarray:
    """Ramer–Douglas–Peucker keep-mask for ONE polyline (planar meters).

    Segment-clamped distance variant (same kernel as
    ``snap_points_to_segments``): a point survives iff its distance to the
    anchor CHORD exceeds ``tol_m`` (strict — points exactly at the
    tolerance are dropped). Endpoints always kept. Guarantee: every
    dropped point lies within ``tol_m`` of the edge of the simplified
    polyline that spans it — the chord only becomes an edge when no
    interior point exceeds the tolerance (pinned by tests).

    The analog of tippecanoe's per-zoom geometry simplification
    (reference tiling sink, SURVEY.md §2.1-S15) as a standalone operator;
    per-polyline iterative stack, distances vectorized per split — no
    per-point Python in the inner loop.
    """
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    tol2 = float(tol_m) * float(tol_m)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        px, py = x[a + 1 : b], y[a + 1 : b]
        dx, dy = x[b] - x[a], y[b] - y[a]
        ll = dx * dx + dy * dy
        if ll == 0.0:
            d2 = (px - x[a]) ** 2 + (py - y[a]) ** 2
        else:
            t = np.clip(((px - x[a]) * dx + (py - y[a]) * dy) / ll, 0.0, 1.0)
            d2 = (px - (x[a] + t * dx)) ** 2 + (py - (y[a] + t * dy)) ** 2
        im = int(np.argmax(d2))  # first max — deterministic tie-break
        if d2[im] > tol2:
            m = a + 1 + im
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_tracks(
    ds,
    tol_m: float,
    *,
    key_col: str = "user_id",
    order_cols: list[str] | None = None,
    x_col: str = "x",
    y_col: str = "y",
    num_buckets: int = 64,
):
    """Per-key polyline simplification: one bucketed shuffle
    (``groupops.bucketed_group_apply`` — never per-key map_groups), tracks
    sorted by ``order_cols`` inside the kernel, DP mask per track. Emits
    the KEPT points as (key, seq, x, y) — ``seq`` is the 0-based position
    in the ORIGINAL track, so downstream can interleave or diff. Output is
    a deterministic function of the input rows at any parallelism.

    ``order_cols`` is REQUIRED (typically the timestamp): without it the
    within-track point order would be whatever the shuffle delivered —
    not a contract Ray Data makes — so the DP mask and ``seq`` could flap
    across parallelism levels, silently."""
    from .groupops import bucketed_group_apply

    if not order_cols:
        raise ValueError(
            "simplify_tracks: order_cols is required — within-track point "
            "order must come from the data (e.g. ['t']), not from shuffle "
            "arrival order, or the simplification is nondeterministic"
        )
    order = list(order_cols)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order, kind="mergesort")
        keys = g[key_col].to_numpy()
        x = g[x_col].to_numpy(dtype=np.float64)
        y = g[y_col].to_numpy(dtype=np.float64)
        uniq, starts = np.unique(keys, return_index=True)
        ends = np.concatenate([starts[1:], [len(keys)]])
        keep = np.zeros(len(keys), dtype=bool)
        seq = np.zeros(len(keys), dtype=np.int64)
        for s, e in zip(starts, ends):
            keep[s:e] = douglas_peucker_mask(x[s:e], y[s:e], tol_m)
            seq[s:e] = np.arange(e - s)
        return pd.DataFrame(
            {
                key_col: keys[keep],
                "seq": seq[keep],
                x_col: x[keep],
                y_col: y[keep],
            }
        )

    return bucketed_group_apply(ds, [key_col], per_bucket, num_buckets=num_buckets)


def convex_hull_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull of ONE point set (planar).
    Returns indices into the input, CCW starting from the lexicographically
    smallest (x, y) point; strictly convex (collinear boundary points
    dropped). Duplicates are collapsed before the chain walk, so output
    indices are unique; n<3 distinct points return what exists."""
    pts = np.column_stack([x, y])
    order = np.lexsort((y, x))
    keep = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        d = np.diff(pts[order], axis=0)
        keep[1:] = (d != 0).any(axis=1)
    order = order[keep]
    n = len(order)
    if n <= 2:
        return order
    xs, ys = x[order], y[order]

    def chain(idx_range):
        out: list[int] = []
        for i in idx_range:
            while len(out) >= 2:
                ax, ay = xs[out[-2]], ys[out[-2]]
                bx, by = xs[out[-1]], ys[out[-1]]
                cross = (bx - ax) * (ys[i] - ay) - (by - ay) * (xs[i] - ax)
                if cross <= 0:  # clockwise or collinear → drop
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    hull_local = lower[:-1] + upper[:-1]
    return order[np.array(hull_local, dtype=np.int64)]


def hull_by(
    ds,
    *,
    key_col: str,
    id_col: str,
    x_col: str = "x",
    y_col: str = "y",
    num_buckets: int = 32,
):
    """Per-key convex hull footprints over one bucketed shuffle: rows sort
    (key, x, y, id) inside the kernel for determinism, monotone chain per
    key, output one row per hull VERTEX (key, seq CCW from the
    lexicographic minimum, point id, x, y) plus the doubled shoelace area
    `area2` on every row (integer-exact when coordinates are integers;
    floats stay floats). Composes with dbscan_points for cluster
    footprints."""
    from .groupops import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, x_col, y_col, id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        x = g[x_col].to_numpy(dtype=np.float64)
        y = g[y_col].to_numpy(dtype=np.float64)
        ids = g[id_col].to_numpy()
        uniq, starts = np.unique(keys, return_index=True)
        ends = np.concatenate([starts[1:], [len(keys)]])
        frames = []
        for k, s, e in zip(uniq, starts, ends):
            hi = s + convex_hull_xy(x[s:e], y[s:e])
            hx, hy = x[hi], y[hi]
            area2 = float(
                np.dot(hx, np.roll(hy, -1)) - np.dot(np.roll(hx, -1), hy)
            ) if len(hi) >= 3 else 0.0
            frames.append(
                pd.DataFrame(
                    {
                        key_col: k,
                        "seq": np.arange(len(hi), dtype=np.int64),
                        id_col: ids[hi],
                        x_col: hx,
                        y_col: hy,
                        "area2": area2,
                    }
                )
            )
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame(
                {
                    key_col: pd.Series(dtype=np.int64),
                    "seq": pd.Series(dtype=np.int64),
                    id_col: pd.Series(dtype=np.int64),
                    x_col: pd.Series(dtype=np.float64),
                    y_col: pd.Series(dtype=np.float64),
                    "area2": pd.Series(dtype=np.float64),
                }
            )
        )

    return bucketed_group_apply(ds, [key_col], per_bucket, num_buckets=num_buckets)


def track_hausdorff_pairs(
    points_ds,
    max_dist_m: float,
    *,
    key_col: str = "key",
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int | None = None,
    round_to: int | None = 1,
):
    """Bounded symmetric-Hausdorff track-similarity self-join: all
    unordered track pairs (key_a < key_b) whose symmetric Hausdorff
    distance max(h(A→B), h(B→A)) ≤ ``max_dist_m``, where h(A→B) =
    max over a∈A of min over b∈B of planar EPSG:3857 distance — the
    trajectory-dedup / co-travel primitive on top of the same cell
    co-shuffle as the conflation join.

    The radius bound makes the exact semantics distributable: h(A→B) ≤ D
    iff EVERY point of A has a B-point within D, and then each point's
    true min-distance is found inside its own k-ring-1 cell group. Plan:
    one cell co-shuffle (candidates pay the ×9 replication) → per-bucket
    per-(point, other-track) min distance (vectorized, pairs masked to
    ≤ D) → one groupby (key_a, key_b) folding count+max — a pair is
    COVERED iff its count equals |A| (per-track sizes computed as a
    Dataset and bucketed-hash-joined back on key_a; nothing track-scale
    ever reaches the driver) → one
    groupby on the unordered pair requiring both directions. Distances
    evaluate term-for-term like the SQL oracle, so max-of-min picks the
    bit-identical winner. Returns (key_a, key_b, hausdorff_m)."""
    from .. import CELL_SIZE_M

    if max_dist_m > CELL_SIZE_M:
        raise ValueError(
            f"max_dist_m {max_dist_m} exceeds the {CELL_SIZE_M} m cell "
            "edge; the k-ring-1 neighborhood would miss pairs"
        )
    nb = _auto_buckets(num_buckets)

    def enc(side: int, replicate: bool):
        def _enc(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keys = batch[key_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            lon = batch[lon_col].to_numpy(zero_copy_only=False)
            lat = batch[lat_col].to_numpy(zero_copy_only=False)
            x, y = mercator_xy(lon, lat)
            if replicate:
                cells = kring1_cells(cell_id(x, y)).ravel()
                rep = np.repeat(np.arange(ids.size), 9)
                ids, keys, x, y = ids[rep], keys[rep], x[rep], y[rep]
            else:
                cells = cell_id(x, y)
            return pa.table(
                {
                    "id": pa.array(ids),
                    "key": pa.array(keys),
                    "x": pa.array(x),
                    "y": pa.array(y),
                    "cell": pa.array(cells.view(np.int64)),
                    "bucket": pa.array(bucket_of(cells, nb)),
                    "side": pa.array(np.full(ids.size, side, np.int8)),
                }
            )

        return _enc

    probe = points_ds.map_batches(enc(0, False), batch_format="pyarrow")
    cand = points_ds.map_batches(enc(1, True), batch_format="pyarrow")

    def minper_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0]
        b = g[g["side"] == 1].sort_values("cell", kind="mergesort")
        empty = pd.DataFrame({
            "key_a": pd.Series(dtype=np.int64),
            "key_b": pd.Series(dtype=np.int64),
            "pid": pd.Series(dtype=np.int64),
            "min_d": pd.Series(dtype=np.float64),
        })
        if a.empty or b.empty:
            return empty
        bc = b["cell"].to_numpy()
        lo = np.searchsorted(bc, a["cell"].to_numpy(), "left")
        hi = np.searchsorted(bc, a["cell"].to_numpy(), "right")
        counts = hi - lo
        ai = np.repeat(np.arange(len(a)), counts)
        bi = (
            concat_ranges(lo, hi)
            if counts.sum()
            else np.empty(0, np.int64)
        )
        if ai.size == 0:
            return empty
        ax = a["x"].to_numpy()[ai]
        ay = a["y"].to_numpy()[ai]
        bx = b["x"].to_numpy()[bi]
        by = b["y"].to_numpy()[bi]
        ka = a["key"].to_numpy()[ai]
        kb = b["key"].to_numpy()[bi]
        pid = a["id"].to_numpy()[ai]
        # term-for-term the oracle's sqrt((dx)^2 + (dy)^2)
        d = np.sqrt((ax - bx) ** 2 + (ay - by) ** 2)
        m = (d <= max_dist_m) & (ka != kb)
        if not m.any():
            return empty
        df = pd.DataFrame(
            {"key_a": ka[m], "key_b": kb[m], "pid": pid[m], "min_d": d[m]}
        )
        return (
            df.groupby(["key_a", "key_b", "pid"], sort=False, as_index=False)
            ["min_d"].min()
        )

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    minper = (
        probe.union(cand)
        .materialize()
        .groupby("bucket")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                minper_bucket(g.drop(columns="bucket")), preserve_index=False
            ).replace_schema_metadata(None),
            batch_format="pandas",
        )
    )

    # bucketed: (key_a, key_b) cardinality ≈ co-located PAIRS, and Ray's
    # native aggregate reduce pays ~30 µs of Python per group
    from .groupops import bucketed_aggregate

    directed = bucketed_aggregate(
        minper, ["key_a", "key_b"],
        {"n_covered": ("min_d", "size"), "h": ("min_d", "max")},
    )

    # per-track sizes as a DATASET joined back bucketed (r4 VERDICT #1c:
    # the former groupby().count().take_all() broadcast held one row per
    # TRACK on the driver — 1e8–1e9 tracks at fleet scale). bucketed, not
    # native count(): track cardinality ≈ corpus keys.
    from .joins import bucket_hash_join

    def key_only(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"__hkey": pa.array(k)})

    directed_m = directed.materialize()
    if directed_m.count() == 0:  # empty group-apply output has no schema
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
            "hausdorff_m": pa.array([], pa.float64()),
        }))
    sizes = bucketed_aggregate(
        points_ds.map_batches(key_only, batch_format="pyarrow"),
        ["__hkey"], {"__expect": ("__hkey", "size")},
    ).materialize()  # join inputs materialized (schema-probe re-exec pitfall)
    with_size = bucket_hash_join(
        directed_m, sizes, "key_a", "__hkey",
        num_buckets=nb,
    )

    def covered(batch: pa.Table) -> pa.Table:
        ka = batch["key_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        kb = batch["key_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_covered"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        expect = batch["__expect"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = expect == n
        return pa.table({
            "u": pa.array(np.minimum(ka[keep], kb[keep])),
            "v": pa.array(np.maximum(ka[keep], kb[keep])),
            "h": pa.array(h[keep], pa.float64()),
        })

    sym = bucketed_aggregate(  # pair-scale groups again
        with_size.map_batches(covered, batch_format="pyarrow"),
        ["u", "v"], {"ndir": ("h", "size"), "hmax": ("h", "max")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["ndir"], 2)
        t = batch.filter(m)
        h = t["hmax"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            h = np.round(h, round_to)
        return pa.table({
            "key_a": t["u"].cast(pa.int64()),
            "key_b": t["v"].cast(pa.int64()),
            "hausdorff_m": pa.array(h, pa.float64()),
        })

    return sym.map_batches(finish, batch_format="pyarrow")


def mutual_nn_assign(
    left_ds,
    right_ds,
    radius_m: float,
    *,
    rounds: int = 3,
    left_id: str = "id",
    right_id: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int | None = None,
    round_to: int | None = 1,
):
    """Iterated mutual-nearest-neighbor 1:1 assignment — the greedy-free
    one-to-one conflation policy (each left feature matched to at most one
    right feature and vice versa): in each round, pair (a, b) is matched
    iff b is a's nearest unmatched candidate AND a is b's nearest
    unmatched candidate (ties broken by (distance, other id) — fully
    deterministic); matched endpoints are peeled and the rule repeats for
    ``rounds`` rounds. Classic entity-resolution mutual-best matching; the
    reference's matcher keeps multi-matches (scripts/match.py:452-474) —
    this is the 1:1 post-processing policy a dedup-minded consumer of its
    match table applies.

    Scale plan: the candidate graph is built ONCE by the radius-bounded
    cell co-shuffle (``radius_pairs``); every per-round step is bounded by
    the surviving PAIR count, never the point count — two bucketed argmin
    shuffles (per a / per b), one bucketed pair-count shuffle for the
    mutuality check (a pair is mutual ⇔ it appears in both argmin sets),
    and two shuffled ANTI semi joins for the peel. Nothing lands on the
    driver; ``rounds`` is a small literal. Output: (id_a, id_b, dist_m,
    match_round), empty-typed when no candidate survives.

    Oracle form: ``rounds`` unrolled MATERIALIZED CTEs of two row_number()
    windows (PARTITION BY id_a / id_b ORDER BY d, other) + NOT IN peels —
    the distance is the exact literal-mirrored float64 sqrt chain, so both
    engines order identical keys; round(d, round_to) only at emission.
    """
    from .groupops import bucketed_group_apply
    from .joins import semi_join_shuffled

    nb = _auto_buckets(num_buckets)
    pairs = radius_pairs(
        left_ds, right_ds, radius_m,
        left_id=left_id, right_id=right_id, lon_col=lon_col,
        lat_col=lat_col, num_buckets=nb, round_to=None,
    ).materialize()
    # the per-round stages are PAIR-bounded (≪ point count): a quarter of
    # the point-scale bucket count keeps their fixed per-bucket task cost
    # from dominating the 5 shuffles × rounds this plan runs, and the
    # coalesce keeps block counts small across them (CLAUDE.md rule)
    nb = max(8, nb // 4)
    pairs = pairs.repartition(nb).materialize()

    def best_kernel(group_col: str, other_col: str):
        def kern(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values([group_col, "dist_m", other_col],
                              kind="mergesort")
            key = g[group_col].to_numpy()
            if key.size == 0:
                return g[["id_a", "id_b", "dist_m"]]
            first = np.concatenate([[True], key[1:] != key[:-1]])
            return g.iloc[np.flatnonzero(first)][["id_a", "id_b", "dist_m"]]

        return kern

    def mutual_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["id_a", "id_b"], kind="mergesort")
        a = g["id_a"].to_numpy()
        b = g["id_b"].to_numpy()
        if a.size == 0:
            return g[["id_a", "id_b", "dist_m"]]
        # a pair present in BOTH argmin sets appears exactly twice
        same = np.concatenate(
            [[False], (a[1:] == a[:-1]) & (b[1:] == b[:-1])]
        )
        return g.iloc[np.flatnonzero(same)][["id_a", "id_b", "dist_m"]]

    matched_rounds = []
    for rnd in range(1, rounds + 1):
        if pairs.count() == 0:
            break
        best_a = bucketed_group_apply(
            pairs, ["id_a"], best_kernel("id_a", "id_b"), num_buckets=nb
        )
        best_b = bucketed_group_apply(
            pairs, ["id_b"], best_kernel("id_b", "id_a"), num_buckets=nb
        )
        # two all-to-all branches → union → all-to-all: materialize the
        # boundary (CLAUDE.md livelock rule)
        both = best_a.union(best_b).materialize()
        mutual = bucketed_group_apply(
            both, ["id_a", "id_b"], mutual_kernel, num_buckets=nb
        ).materialize()
        if mutual.count() == 0:
            break

        def stamp(batch: pa.Table, _r=rnd) -> pa.Table:
            return batch.append_column(
                "match_round",
                pa.array(np.full(batch.num_rows, _r, np.int64)),
            )

        matched_rounds.append(
            mutual.map_batches(stamp, batch_format="pyarrow").materialize()
        )
        if rnd < rounds:
            rest = semi_join_shuffled(
                pairs, mutual, "id_a", "id_a", anti=True, num_buckets=nb
            )
            pairs = semi_join_shuffled(
                rest, mutual, "id_b", "id_b", anti=True, num_buckets=nb
            ).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["dist_m"].to_numpy(zero_copy_only=False)
        if round_to is not None:
            d = np.round(d, round_to)
        return pa.table({
            "id_a": batch["id_a"].cast(pa.int64()),
            "id_b": batch["id_b"].cast(pa.int64()),
            "dist_m": pa.array(d, pa.float64()),
            "match_round": batch["match_round"].cast(pa.int64()),
        })

    if not matched_rounds:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "dist_m": pa.array([], pa.float64()),
            "match_round": pa.array([], pa.int64()),
        }))
    out = matched_rounds[0]
    for m in matched_rounds[1:]:
        out = out.union(m)
    return out.map_batches(finish, batch_format="pyarrow")


def ripley_counts(
    points_ds,
    radii: "list[float]",
    *,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int | None = None,
):
    """Ripley-K / pair-correlation readout: for each literal radius r,
    the number of ORDERED point pairs (a ≠ b) within r, plus the mean
    neighbor count per point — the spatial-clustering summary statistic
    (K̂(r) up to the area constant). One radius-bounded cell co-shuffle
    at max(radii) generates candidate pairs; each per-bucket batch folds
    its pairs into |radii| cumulative-bin partial rows (searchsorted
    against the sorted radii), so the aggregate shuffle moves |radii|
    rows per block, never pairs. The final division is the mirrored
    ``CAST(n_pairs AS DOUBLE) / n_points`` rounded to 6 dp so the SQL
    oracle compares identical keys. Output: (radius_m, n_pairs,
    mean_neighbors), one row per radius (zero-count radii included)."""
    rads = np.asarray(sorted(float(r) for r in radii), np.float64)
    n_points = points_ds.count()
    pairs = radius_pairs(
        points_ds, points_ds, float(rads[-1]),
        left_id=id_col, right_id=id_col, lon_col=lon_col, lat_col=lat_col,
        num_buckets=num_buckets, exclude_self=True, round_to=None,
    )

    def binfold(batch: pa.Table) -> pa.Table:
        d = batch["dist_m"].to_numpy(zero_copy_only=False)
        # pair counts per cumulative bin: d ≤ rads[i] ⇔ first bin idx ≤ i
        idx = np.searchsorted(rads, d, side="left")
        per_bin = np.bincount(idx, minlength=rads.size)[: rads.size]
        cum = np.cumsum(per_bin)
        return pa.table({
            "radius_m": pa.array(rads, pa.float64()),
            "part": pa.array(cum.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    totals = (
        pairs.map_batches(binfold, batch_format="pyarrow")
        .groupby("radius_m")
        .aggregate(Sum("part", alias_name="n_pairs"))  # |radii| groups
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_pairs = batch["n_pairs"].to_numpy(zero_copy_only=False)
        mean = np.round(n_pairs.astype(np.float64) / float(n_points), 6)
        return pa.table({
            "radius_m": batch["radius_m"],
            "n_pairs": pa.array(n_pairs.astype(np.int64)),
            "mean_neighbors": pa.array(mean, pa.float64()),
        })

    return totals.map_batches(finish, batch_format="pyarrow")


def hotspot_cells(
    counts_ds,
    *,
    x_col: str = "cell_x",
    y_col: str = "cell_y",
    n_col: str = "n",
    min_count: int = 1,
    num_buckets: int = 32,
):
    """Local-maximum hotspot detection over a sparse cell-count grid:
    keep cells whose count is ≥ ``min_count`` AND STRICTLY greater than
    every 3×3 neighbor's (ties suppress both — the standard non-max-
    suppression rule). Same sparse-splat plan as ``kernel_smooth_counts``:
    each non-empty cell emits its own row plus 8 neighbor rows, one
    bucketed max-aggregate folds them, so the shuffle moves ≤ 9 rows per
    non-empty cell and a dense raster never exists. Integer counts →
    exact cross-engine parity. Output: (cell_x, cell_y, n, nbr_max) with
    absent neighborhoods reading 0."""
    from .groupops import bucketed_aggregate

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]

    def splat(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        xs = [x]
        ys = [y]
        own = [n]
        nbr = [np.full(n.size, -1, np.int64)]
        for dx, dy in offs:
            xs.append(x + dx)
            ys.append(y + dy)
            own.append(np.full(n.size, -1, np.int64))
            nbr.append(n)
        return pa.table({
            x_col: pa.array(np.concatenate(xs)),
            y_col: pa.array(np.concatenate(ys)),
            "__own": pa.array(np.concatenate(own)),
            "__nbr": pa.array(np.concatenate(nbr)),
        })

    agg = bucketed_aggregate(
        counts_ds.map_batches(splat, batch_format="pyarrow"),
        [x_col, y_col],
        {"own_n": ("__own", "max"), "nbr_raw": ("__nbr", "max")},
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        own = batch["own_n"].to_numpy(zero_copy_only=False)
        nbr = np.maximum(batch["nbr_raw"].to_numpy(zero_copy_only=False), 0)
        keep = (own >= min_count) & (own > nbr)
        return pa.table({
            x_col: batch[x_col].cast(pa.int64()).filter(pa.array(keep)),
            y_col: batch[y_col].cast(pa.int64()).filter(pa.array(keep)),
            "n": pa.array(own[keep]),
            "nbr_max": pa.array(nbr[keep]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def morans_i(
    counts_ds,
    *,
    x_col: str = "cell_x",
    y_col: str = "cell_y",
    n_col: str = "n",
    num_buckets: int = 32,
):
    """Global Moran's I spatial autocorrelation over a sparse cell-count
    grid with 8-neighborhood binary weights — the classic clustered-vs-
    dispersed statistic, computed EXACTLY: deviations are the n-scaled
    integers ``n·x_i − T`` (no mean division), so the numerator
    Σ w_ij·d_i·d_j, denominator Σ d_i² and pair count W are all integers
    folded with PYTHON ints (per-batch JSON partials, the exact_corr
    pattern — nothing row-scale on the driver). Only the final
    ``(n/W)·(num/den)`` is float, mirrored as the oracle's DOUBLE-cast
    chain. Plan: one bounded aggregate for (n, T), one 9-way sparse splat
    + bucketed aggregate for per-cell neighbor sums — ≤ 9 rows per
    non-empty cell cross the shuffle, a dense raster never exists.
    Output: one row (n_cells, w_pairs, num, den, moran_i)."""
    import json as _json

    from .groupops import bucketed_aggregate

    tot = pa.concat_tables([
        pa.table(b) for b in counts_ds.map_batches(
            lambda b: pa.table({
                "c": pa.array([b.num_rows], pa.int64()),
                "s": pa.array(
                    [int(b[n_col].to_numpy(zero_copy_only=False).sum())
                     if b.num_rows else 0], pa.int64()),
            }),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    ])
    n_cells = int(tot["c"].to_numpy().sum())
    t_sum = int(tot["s"].to_numpy().sum())

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]

    def splat(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (n_cells * batch[n_col].to_numpy(zero_copy_only=False)
             .astype(np.int64) - t_sum)
        xs, ys = [x], [y]
        own = [d]
        ownf = [np.ones(d.size, np.int64)]
        nbr_s = [np.zeros(d.size, np.int64)]
        nbr_c = [np.zeros(d.size, np.int64)]
        for dx, dy in offs:
            xs.append(x + dx)
            ys.append(y + dy)
            own.append(np.zeros(d.size, np.int64))
            ownf.append(np.zeros(d.size, np.int64))
            nbr_s.append(d)
            nbr_c.append(np.ones(d.size, np.int64))
        return pa.table({
            x_col: pa.array(np.concatenate(xs)),
            y_col: pa.array(np.concatenate(ys)),
            "__d": pa.array(np.concatenate(own)),
            "__own": pa.array(np.concatenate(ownf)),
            "__ns": pa.array(np.concatenate(nbr_s)),
            "__nc": pa.array(np.concatenate(nbr_c)),
        })

    agg = bucketed_aggregate(
        counts_ds.map_batches(splat, batch_format="pyarrow"),
        [x_col, y_col],
        {"d": ("__d", "sum"), "own": ("__own", "sum"),
         "ns": ("__ns", "sum"), "nc": ("__nc", "sum")},
        num_buckets=num_buckets,
    )

    def partial(batch: pa.Table) -> pa.Table:
        own = batch["own"].to_numpy(zero_copy_only=False)
        keep = own > 0
        d = batch["d"].to_numpy(zero_copy_only=False)[keep].tolist()
        ns = batch["ns"].to_numpy(zero_copy_only=False)[keep].tolist()
        nc = batch["nc"].to_numpy(zero_copy_only=False)[keep].tolist()
        num = sum(a * b for a, b in zip(d, ns))
        den = sum(a * a for a in d)
        w = sum(nc)
        return pa.table({
            "m": pa.array([_json.dumps([num, den, w])], pa.string()),
        })

    num = den = w = 0
    for b in agg.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s in b["m"].to_pylist():
            pn, pd_, pw = _json.loads(s)
            num += pn; den += pd_; w += pw

    if den == 0 or w == 0:
        mi = float("nan")
    else:
        # mirrored: (CAST(n AS DOUBLE)/W) * (CAST(num AS DOUBLE)/den)
        mi = round((float(n_cells) / float(w))
                   * (float(num) / float(den)), 6)
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "n_cells": pa.array([n_cells], pa.int64()),
        "w_pairs": pa.array([w], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "moran_i": pa.array([mi], pa.float64()),
    }))


def dtw_cost_int(xa: np.ndarray, ya: np.ndarray, xb: np.ndarray,
                 yb: np.ndarray, band: int) -> int:
    """Banded (Sakoe-Chiba) DTW alignment cost between two tracks in
    INTEGER decimeter coordinates: per-step cost is the squared planar
    decimeter distance, so the optimal-path total is an exact int64 —
    deterministic at any partitioning, no float ever enters the DP.
    The band widens automatically to cover a length mismatch
    (max(band, |n−m|) — the standard feasibility adjustment)."""
    n, m = xa.size, xb.size
    if n == 0 or m == 0:
        return -1
    w = max(int(band), abs(n - m))
    INF = np.int64(2**62)
    prev = np.full(m + 1, INF, np.int64)
    prev[0] = 0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF, np.int64)
        jlo = max(1, i - w)
        jhi = min(m, i + w)
        dx = xa[i - 1] - xb[jlo - 1:jhi]
        dy = ya[i - 1] - yb[jlo - 1:jhi]
        cost = dx * dx + dy * dy
        # t[j] = cost + min(prev[j], prev[j-1]) vectorized; the cur[j-1]
        # alternative needs the short sequential band scan (≤ 2w+1 steps)
        t = cost + np.minimum(prev[jlo:jhi + 1], prev[jlo - 1:jhi])
        run = INF
        for k in range(jhi - jlo + 1):
            c = cost[k] + run if run < INF else INF
            run = t[k] if t[k] < c else c
            cur[jlo + k] = run
        prev = cur
    return int(prev[m])


def dtw_panel(
    points_ds,
    pairs,
    *,
    key_col: str = "user_id",
    order_cols: "list[str] | None" = None,
    x_col: str = "x",
    y_col: str = "y",
    band: int = 16,
    num_buckets: int = 32,
):
    """Dynamic-time-warping similarity matrix over a BOUNDED panel of
    tracks — the trajectory-analytics companion to the radius-bounded
    ``track_hausdorff_pairs`` (DTW compares full temporal shape; its
    pair list is quadratic, so this op takes an explicit panel pair
    table rather than pretending to be corpus-scale — the documented
    contract). ``pairs``: pyarrow table (pair_id, key_a, key_b) built
    from a bounded panel (driver-known, like literal radii). Tracks
    NEVER land on the driver: each key's track packs to one
    (key, npts, xs, ys) binary row inside a bucketed group apply
    (decimeter ints, little-endian int64), ships to its pairs via a
    bucketed hash join on the member key, and each pair's banded DTW
    runs inside one final bucketed apply. Costs are exact int64
    (squared decimeter steps) — bit-identical at any parallelism.
    Output: (pair_id, key_a, key_b, n_a, n_b, dtw_cost)."""
    import pandas as pd_
    import ray.data as _rd

    from .groupops import bucketed_group_apply
    from .joins import bucket_hash_join

    if not order_cols:
        raise ValueError("dtw_panel: order_cols is required (see "
                         "simplify_tracks — shuffle order is not a contract)")
    order = list(order_cols)

    def pack_bucket(g: pd_.DataFrame) -> pd_.DataFrame:
        g = g.sort_values([key_col] + order, kind="mergesort")
        keys = g[key_col].to_numpy()
        xq = np.floor(g[x_col].to_numpy(dtype=np.float64) * 10.0).astype(np.int64)
        yq = np.floor(g[y_col].to_numpy(dtype=np.float64) * 10.0).astype(np.int64)
        uniq, starts = np.unique(keys, return_index=True)
        ends = np.concatenate([starts[1:], [len(keys)]])
        return pd_.DataFrame({
            "member": uniq,
            "npts": (ends - starts).astype(np.int64),
            "xs": [xq[s:e].tobytes() for s, e in zip(starts, ends)],
            "ys": [yq[s:e].tobytes() for s, e in zip(starts, ends)],
        })

    packed = bucketed_group_apply(
        points_ds, [key_col], pack_bucket, num_buckets=num_buckets
    ).materialize()

    pid = pairs["pair_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ka = pairs["key_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    kb = pairs["key_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    members = _rd.from_arrow(pa.table({
        "pair_id": pa.array(np.concatenate([pid, pid])),
        "member": pa.array(np.concatenate([ka, kb])),
        "slot": pa.array(np.concatenate([
            np.zeros(pid.size, np.int64), np.ones(pid.size, np.int64)
        ])),
    })).materialize()

    joined = bucket_hash_join(
        members, packed, "member", "member", num_buckets=num_buckets
    )

    def dtw_bucket(g: pd_.DataFrame) -> pd_.DataFrame:
        out = {"pair_id": [], "key_a": [], "key_b": [],
               "n_a": [], "n_b": [], "dtw_cost": []}
        for pair_id, sub in g.groupby("pair_id", sort=True):
            if len(sub) != 2:
                continue  # a member with no track rows → pair incomplete
            sub = sub.sort_values("slot")
            ra, rb = sub.iloc[0], sub.iloc[1]
            xa = np.frombuffer(ra["xs"], np.int64)
            ya = np.frombuffer(ra["ys"], np.int64)
            xb = np.frombuffer(rb["xs"], np.int64)
            yb = np.frombuffer(rb["ys"], np.int64)
            out["pair_id"].append(int(pair_id))
            out["key_a"].append(int(ra["member"]))
            out["key_b"].append(int(rb["member"]))
            out["n_a"].append(int(ra["npts"]))
            out["n_b"].append(int(rb["npts"]))
            out["dtw_cost"].append(dtw_cost_int(xa, ya, xb, yb, band))
        return pd_.DataFrame({k: pd_.Series(v, dtype=np.int64)
                              for k, v in out.items()})

    return bucketed_group_apply(
        joined, ["pair_id"], dtw_bucket, num_buckets=num_buckets
    )


def segment_crossing_join(
    segs_ds,
    *,
    id_col: str = "seg_id",
    key_col: str = "key",
    cell_units: int = 100,
    num_buckets: int | None = None,
    max_cell_segments: int = 100_000,
):
    """Proper-crossing pairs between 2D INTEGER line segments of different
    keys — the trajectory-interaction join ("whose paths crossed?"). Input
    columns: (id_col, key_col, x1, y1, x2, y2), integer grid coordinates
    (|coord| must stay ≲ 2^30 so the int64 orientation cross-products
    cannot overflow). Output one row per unordered segment pair whose
    OPEN interiors intersect (collinear/touching pairs excluded) and
    whose keys differ: (seg_a, seg_b, key_a, key_b) with key_a < key_b —
    exactly the SQL predicate

        (d1>0) <> (d2>0) AND d1<>0 AND d2<>0 AND
        (d3>0) <> (d4>0) AND d3<>0 AND d4<>0

    over the four int64 orientation determinants, so a DuckDB oracle can
    mirror it bit-exactly.

    Shape (PBSM, same plan as ``bbox_intersection_join``): each segment
    replicates to the ``cell_units``-sized grid cells its bbox touches
    (bounded by segment extent — callers pre-filter giant segments), ONE
    bucketed cell co-shuffle, in-bucket vectorized pair generation +
    orientation tests, canonical-cell rule (a pair is emitted only from
    the cell containing the bbox-intersection's min corner) so no second
    dedup shuffle is needed. A cell holding more than
    ``max_cell_segments`` segments raises loudly (quadratic pair blowup)
    instead of OOMing a worker."""
    from .groupops import group_pair_indices

    nb = _auto_buckets(num_buckets)
    cs = int(cell_units)

    def cover(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch["x1"].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch["y1"].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = batch["x2"].to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = batch["y2"].to_numpy(zero_copy_only=False).astype(np.int64)
        xlo, xhi = np.minimum(x1, x2), np.maximum(x1, x2)
        ylo, yhi = np.minimum(y1, y2), np.maximum(y1, y2)
        ix0, ix1 = xlo // cs, xhi // cs
        iy0, iy1 = ylo // cs, yhi // cs
        nx = ix1 - ix0 + 1
        ny = iy1 - iy0 + 1
        counts = nx * ny
        tot = int(counts.sum())
        row = np.repeat(np.arange(ids.size), counts)
        start = (np.concatenate([[0], np.cumsum(counts)[:-1]])
                 if ids.size else np.empty(0, np.int64))
        local = np.arange(tot) - np.repeat(start, counts)
        cix = ix0[row] + local % np.maximum(nx[row], 1)
        ciy = iy0[row] + local // np.maximum(nx[row], 1)
        cells = _pack_ij(cix, ciy).view(np.int64)
        return pa.table({
            "seg_id": pa.array(ids[row]),
            "key": pa.array(key[row]),
            "x1": pa.array(x1[row]), "y1": pa.array(y1[row]),
            "x2": pa.array(x2[row]), "y2": pa.array(y2[row]),
            "xlo": pa.array(xlo[row]), "ylo": pa.array(ylo[row]),
            "xhi": pa.array(xhi[row]), "yhi": pa.array(yhi[row]),
            "cell": pa.array(cells),
            "bucket": pa.array(bucket_of(cells.view(np.uint64), nb)),
        })

    def join_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "seg_a": pa.array([], pa.int64()),
            "seg_b": pa.array([], pa.int64()),
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
        })
        cell = g["cell"].to_numpy(zero_copy_only=False)
        if cell.size < 2:
            return empty
        order = np.argsort(cell, kind="mergesort")
        cell = cell[order]
        runs = np.unique(cell, return_counts=True)[1]
        if runs.max() > max_cell_segments:
            raise ValueError(
                f"segment_crossing_join: a cell holds {runs.max()} segments"
                f" (> {max_cell_segments}); pair blowup would be quadratic —"
                " raise cell_units granularity or pre-split the hot region"
            )
        ia, ib = group_pair_indices(cell, max_group=np.iinfo(np.int64).max)
        if ia.size == 0:
            return empty

        def col(name):
            return g[name].to_numpy(zero_copy_only=False)[order]

        key = col("key")
        ka, kb = key[ia], key[ib]
        m = ka != kb
        if not m.any():
            return empty
        ia, ib, ka, kb = ia[m], ib[m], ka[m], kb[m]
        xlo, xhi, ylo, yhi = col("xlo"), col("xhi"), col("ylo"), col("yhi")
        # bbox overlap (closed) — cheap reject before the determinant work
        m = ((np.maximum(xlo[ia], xlo[ib]) <= np.minimum(xhi[ia], xhi[ib]))
             & (np.maximum(ylo[ia], ylo[ib]) <= np.minimum(yhi[ia], yhi[ib])))
        if not m.any():
            return empty
        ia, ib, ka, kb = ia[m], ib[m], ka[m], kb[m]
        # canonical cell: bbox-intersection min corner must live HERE
        ccell = _pack_ij(
            np.maximum(xlo[ia], xlo[ib]) // cs,
            np.maximum(ylo[ia], ylo[ib]) // cs,
        ).view(np.int64)
        m = ccell == cell[ia]
        if not m.any():
            return empty
        ia, ib, ka, kb = ia[m], ib[m], ka[m], kb[m]
        x1, y1, x2, y2 = col("x1"), col("y1"), col("x2"), col("y2")
        dxa, dya = x2[ia] - x1[ia], y2[ia] - y1[ia]
        dxb, dyb = x2[ib] - x1[ib], y2[ib] - y1[ib]
        d1 = dxa * (y1[ib] - y1[ia]) - dya * (x1[ib] - x1[ia])
        d2 = dxa * (y2[ib] - y1[ia]) - dya * (x2[ib] - x1[ia])
        d3 = dxb * (y1[ia] - y1[ib]) - dyb * (x1[ia] - x1[ib])
        d4 = dxb * (y2[ia] - y1[ib]) - dyb * (x2[ia] - x1[ib])
        m = (((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0)
             & ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0))
        if not m.any():
            return empty
        ia, ib, ka, kb = ia[m], ib[m], ka[m], kb[m]
        sid = col("seg_id")
        sa, sb = sid[ia], sid[ib]
        swap = ka > kb
        return pa.table({
            "seg_a": pa.array(np.where(swap, sb, sa), pa.int64()),
            "seg_b": pa.array(np.where(swap, sa, sb), pa.int64()),
            "key_a": pa.array(np.minimum(ka, kb), pa.int64()),
            "key_b": pa.array(np.maximum(ka, kb), pa.int64()),
        })

    return (
        segs_ds.map_batches(cover, batch_format="pyarrow")
        .materialize()
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
