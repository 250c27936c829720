"""Reproducible scale probes behind the BASELINE.md claims.

Usage: python tools/probes.py {hausdorff|raster|colocation|skewjoin}

Each probe owns its own Ray session (32 CPUs local), synthesizes its
deterministic corpus, runs the stage cold, and prints one line with the
numbers recorded in BASELINE.md. See bench.py (+ GRAFT_SCALE) for the
conflate/spatial-family probes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pyarrow as pa


def _init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def probe_hausdorff():
    """24k tracks × 33 pts at the sf0.1 query's band density."""
    ray = _init()
    import ray.data

    from overmatch_ray.stages.spatial import track_hausdorff_pairs

    n_tracks, pts = 24_000, 33
    n_bands = n_tracks // 3
    n = n_tracks * pts

    def gen(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        track = i // pts
        band = track % n_bands
        eid = (i * 2654435761) % (1 << 31)
        lon = -90.0 + (band % 200) * 0.01 + (eid % 200) * 2e-5
        lat = 30.0 + (band // 200) * 0.01 + ((eid // 200) % 200) * 2e-5
        return pa.table({"id": pa.array(i), "key": pa.array(track),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    pts_ds = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow").materialize()
    t0 = time.time()
    n_pairs = track_hausdorff_pairs(pts_ds, 100.0).count()
    print(f"hausdorff: tracks={n_tracks} points={n} pairs={n_pairs} "
          f"wall={time.time() - t0:.1f}s")


def probe_raster():
    """3M points → z12 PNG heat tiles."""
    ray = _init()
    import ray.data

    from overmatch_ray.stages.tiles import build_raster_heat_tiles

    n = 3_000_000

    def gen(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 2654435761) % (1 << 31)
        lon = -100.0 + (h % 40000) * 1e-4
        lat = 30.0 + ((h // 40000) % 20000) * 1e-4
        return pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})

    pts = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow").materialize()
    t0 = time.time()
    tiles = build_raster_heat_tiles(pts, zoom=12)
    rows = tiles.count()
    print(f"raster: points={n} z12_tiles={rows} wall={time.time() - t0:.1f}s")


def probe_colocation():
    """1M pings with 90-s buckets (density-matched to the query config)."""
    ray = _init()
    import pandas as pd

    import ray.data
    from ray.data.aggregate import Count

    from overmatch_ray.stages.groupops import bucketed_group_apply

    n = 1_000_000

    def gen(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 2654435761) % (1 << 31)
        return pa.table({
            "zone": pa.array(h % 3),
            "bucket": pa.array(((h // 3) % (30 * 86400)) // 90),
            "user_id": pa.array((h // 7) % 15000),
        })

    cells = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow").materialize()

    def pairs_bucket(g: "pd.DataFrame") -> pa.Table:
        out_a, out_b = [], []
        g = g.drop_duplicates(["zone", "bucket", "user_id"])
        for _, cell in g.groupby(["zone", "bucket"], sort=False):
            u = np.sort(cell["user_id"].to_numpy())
            if u.size < 2:
                continue
            ia, ib = np.triu_indices(u.size, k=1)
            out_a.append(u[ia])
            out_b.append(u[ib])
        if not out_a:
            return pa.table({"user_a": pa.array([], pa.int64()),
                             "user_b": pa.array([], pa.int64())})
        return pa.table({"user_a": pa.array(np.concatenate(out_a)),
                         "user_b": pa.array(np.concatenate(out_b))})

    t0 = time.time()
    pairs = bucketed_group_apply(cells, ["zone", "bucket"], pairs_bucket,
                                 num_buckets=64)
    n_pairs = pairs.groupby(["user_a", "user_b"]).aggregate(
        Count(alias_name="n")).count()
    print(f"colocation: pings={n} distinct_pairs={n_pairs} "
          f"wall={time.time() - t0:.1f}s")


def probe_skewjoin():
    """Plain vs skew-aware join: 8M rows, 90% on one key."""
    ray = _init()
    import ray.data

    from overmatch_ray.stages.joins import bucket_hash_join, skew_hash_join

    n = 8_000_000

    def gen(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 2654435761) % (1 << 31)
        k = np.where(h % 10 < 9, 7, h % 5000)
        return pa.table({"k": pa.array(k), "lv": pa.array(i)})

    left = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow").materialize()
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(np.arange(5000, dtype=np.int64)),
        "rv": pa.array(np.arange(5000, dtype=np.int64) * 3),
    })).materialize()
    t0 = time.time()
    n1 = bucket_hash_join(left, right, "k", "rk").count()
    t_plain = time.time() - t0
    t0 = time.time()
    n2 = skew_hash_join(left, right, "k", "rk", hot_denom=100).count()
    t_skew = time.time() - t0
    assert n1 == n2 == n
    print(f"skewjoin: rows={n} plain={t_plain:.1f}s "
          f"skew_aware={t_skew:.1f}s")


def probe_skewasof():
    """Plain vs hot-key-bypass as-of join: 6M left rows, 90% on one user."""
    ray = _init()
    import ray.data

    from overmatch_ray.stages.joins import asof_join

    n = 6_000_000

    def gen(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 2654435761) % (1 << 31)
        u = np.where(h % 10 < 9, 7, h % 4000)
        return pa.table({
            "u": pa.array(u),
            "t": pa.array(h % 1_000_000),
            "lv": pa.array(i),
        })

    left = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow").materialize()
    m = 200_000

    def gen_r(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 40503 + 17) % (1 << 31)
        ru = np.where(h % 10 < 3, 7, h % 4000)  # hot key has right rows too
        return pa.table({
            "ru": pa.array(ru),
            "rt": pa.array(h % 1_000_000),
            "rv": pa.array(i),
        })

    right = ray.data.range(m, override_num_blocks=8).map_batches(
        gen_r, batch_format="pyarrow").materialize()
    t0 = time.time()
    n1 = asof_join(left, right, "t", "rt", "u", "ru", hot_denom=None).count()
    t_plain = time.time() - t0
    t0 = time.time()
    n2 = asof_join(left, right, "t", "rt", "u", "ru", hot_denom=64).count()
    t_skew = time.time() - t0
    assert n1 == n2 == n
    print(f"skewasof: rows={n} plain={t_plain:.1f}s hot_bypass={t_skew:.1f}s "
          f"speedup={t_plain / t_skew:.2f}x")


def probe_skewinterval():
    """Plain vs hot-cell-bypass interval join: 6M left points, 90% inside
    one granule (the hot-instant corpus the r3 verdict asked to probe)."""
    ray = _init()
    import ray.data

    from overmatch_ray.stages.joins import interval_join

    n = 6_000_000

    def gen(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 2654435761) % (1 << 31)
        t = np.where(h % 10 < 9, h % 500, h % 5_000_000)
        return pa.table({"t": pa.array(t), "lv": pa.array(i)})

    left = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow").materialize()
    m = 4_000

    def gen_r(batch):
        i = batch["id"].to_numpy().astype(np.int64)
        h = (i * 69069 + 5) % (1 << 31)
        # few SHORT intervals over the hot instant (bounded join output —
        # the probe stresses shuffle concentration, not output explosion)
        hot = i < 8
        s = np.where(hot, h % 400, h % 5_000_000)
        ln = np.where(hot, 1 + h % 32, 1 + h % 800)
        return pa.table({
            "s": pa.array(s),
            "e": pa.array(s + ln),
            "rv": pa.array(i),
        })

    right = ray.data.range(m, override_num_blocks=4).map_batches(
        gen_r, batch_format="pyarrow").materialize()
    kw = dict(granule=2048, num_buckets=64)
    t0 = time.time()
    n1 = interval_join(left, right, "t", "s", "e", hot_denom=None, **kw).count()
    t_plain = time.time() - t0
    t0 = time.time()
    n2 = interval_join(left, right, "t", "s", "e", hot_denom=64, **kw).count()
    t_skew = time.time() - t0
    assert n1 == n2, (n1, n2)
    print(f"skewinterval: out_rows={n1} plain={t_plain:.1f}s "
          f"hot_bypass={t_skew:.1f}s speedup={t_plain / t_skew:.2f}x")


def probe_defertags():
    """Deferred vs hoisted conflation tag fill at GRAFT_SCALE volume.
    Shortcut for the two-run A/B:

        GRAFT_SCALE=30 GRAFT_STAGES=conflate GRAFT_WARM=0 \\
            GRAFT_DEFER_TAGS={0|1} python bench.py

    Run the bench form for the recorded numbers (this inline variant
    shares one Ray session, so the second leg benefits from page cache)."""
    import os
    import time

    import ray

    _init()
    cache = os.environ.get(
        "GRAFT_CACHE", "/tmp/overmatch_bench/v9-0.1-x30"
    )
    from overmatch_ray.pipelines.conflate import conflate

    results = {}
    for label, defer in (("hoisted", False), ("deferred", True)):
        osm = ray.data.read_parquet(os.path.join(cache, "osm")).repartition(32)
        ovt = ray.data.read_parquet(os.path.join(cache, "overture")).repartition(32)
        t0 = time.time()
        n = conflate(osm, ovt, num_buckets=64, defer_tags=defer).materialize().count()
        results[label] = (time.time() - t0, n)
        print(f"defertags[{label}]: {results[label][0]:.1f}s rows={n}")
    assert results["hoisted"][1] == results["deferred"][1]


PROBES = {
    "defertags": probe_defertags,
    "hausdorff": probe_hausdorff,
    "raster": probe_raster,
    "colocation": probe_colocation,
    "skewjoin": probe_skewjoin,
    "skewasof": probe_skewasof,
    "skewinterval": probe_skewinterval,
}

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else ""
    if name not in PROBES:
        print(f"usage: python tools/probes.py {{{'|'.join(PROBES)}}}")
        sys.exit(2)
    PROBES[name]()
    import ray

    ray.shutdown()
