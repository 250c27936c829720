"""Skew handling: a synthetic dense 'urban' cell (SURVEY.md §7.2-11).

All points land in one grid cell, so one bucket receives the whole corpus;
the matcher must stay vectorized, chunk its pair matrix (exercised by
shrinking the chunk cap), and produce exactly the brute-force result."""

import numpy as np
import pyarrow as pa
import pytest

from overmatch_ray.geo import mercator_xy
from overmatch_ray.text import ratio_pairs

N_OSM = 400
N_OVT = 600


def _dense_corpus():
    rng = np.random.default_rng(21)
    # all inside one 256 m cell: cell corner at a fixed mercator point
    base_lon, base_lat = -77.0, 38.9
    bx, by = mercator_xy(np.array([base_lon]), np.array([base_lat]))
    bx, by = float(bx[0]), float(by[0])
    from overmatch_ray.geo import inverse_mercator

    ox = bx + rng.uniform(5, 120, N_OSM)
    oy = by + rng.uniform(5, 120, N_OSM)
    vx = bx + rng.uniform(5, 120, N_OVT)
    vy = by + rng.uniform(5, 120, N_OVT)
    olon, olat = inverse_mercator(ox, oy)
    vlon, vlat = inverse_mercator(vx, vy)
    names = np.array(["Cafe %d" % (i % 7) for i in range(max(N_OSM, N_OVT))])
    osm = pa.table(
        {
            "osm_id": pa.array([f"node/{i}" for i in range(N_OSM)]),
            "elem_type": pa.array(["node"] * N_OSM),
            "name": pa.array(names[:N_OSM]),
            "addr_housenumber": pa.array([None] * N_OSM, pa.string()),
            "lon": pa.array(olon),
            "lat": pa.array(olat),
        }
    )
    from overmatch_ray.synth import OVERTURE_SCHEMA, overture_block

    # reuse the synthetic overture shape but overwrite geometry and names
    base = overture_block(np.arange(N_OVT))
    k = base.num_rows
    reps = int(np.ceil(N_OVT / max(k, 1)))
    idx = np.tile(np.arange(k), reps)[:N_OVT]
    base = base.take(pa.array(idx))
    base = base.set_column(base.schema.get_field_index("lon"), "lon", pa.array(vlon))
    base = base.set_column(base.schema.get_field_index("lat"), "lat", pa.array(vlat))
    names_col = pa.array(
        [{"primary": n, "rules": None} for n in names[:N_OVT]],
        OVERTURE_SCHEMA.field("names").type,
    )
    base = base.set_column(base.schema.get_field_index("names"), "names", names_col)
    return osm, base, (ox, oy, vx, vy, names)


def test_dense_cell_matches_bruteforce(ray_session):
    import ray.data

    from overmatch_ray.functions.tags import normalize_candidate
    from overmatch_ray.pipelines.conflate import conflate

    osm, ovt, (ox, oy, vx, vy, names) = _dense_corpus()
    got = conflate(
        ray.data.from_arrow(osm).repartition(5),
        ray.data.from_arrow(ovt).repartition(3),
        num_buckets=4,
    ).take_all()

    # brute force with vectorized kernels
    dist = np.hypot(ox[:, None] - vx[None, :], oy[:, None] - vy[None, :])
    ia, ib = np.nonzero(dist <= 100.0)
    sims = ratio_pairs(names[ia], names[ib]) / 100.0
    # housenumber veto cannot fire (osm housenumbers all null)
    keep = sims >= 0.6
    expected = {
        (f"node/{a}", ovt["id"][b].as_py())
        for a, b in zip(ia[keep], ib[keep])
    }
    got_keys = {(r["osm_id"], r["overture_id"]) for r in got}
    assert len(got) == len(got_keys)
    assert got_keys == expected
    assert len(expected) > 5000  # genuinely dense


def test_salting_preserves_result(ray_session):
    """salt=3 must produce exactly the same match set as salt=1 (probe rows
    split across salted buckets, index replicated to all of them)."""
    import ray.data

    from overmatch_ray.pipelines.conflate import conflate

    osm, ovt, _ = _dense_corpus()
    base = {
        (r["osm_id"], r["overture_id"])
        for r in conflate(
            ray.data.from_arrow(osm), ray.data.from_arrow(ovt), num_buckets=4
        ).take_all()
    }
    salted = conflate(
        ray.data.from_arrow(osm), ray.data.from_arrow(ovt), num_buckets=4, salt=3
    ).take_all()
    salted_keys = {(r["osm_id"], r["overture_id"]) for r in salted}
    assert len(salted) == len(salted_keys), "salting introduced duplicate pairs"
    assert salted_keys == base



def test_matcher_chunking_direct(monkeypatch):
    """Exercise match_bucket's multi-chunk pair loop IN-PROCESS (a
    monkeypatch of _PAIR_CHUNK does not reach Ray workers, so this calls the
    group body directly): tiny chunk cap vs default must agree exactly."""
    import pyarrow as pa

    import overmatch_ray.stages.matcher as matcher_mod
    from overmatch_ray.pipelines.conflate import _osm_join_side, _overture_join_side
    from overmatch_ray.stages.matcher import match_bucket

    osm, ovt, _ = _dense_corpus()
    probe = _osm_join_side(osm, num_buckets=1)
    index = _overture_join_side(ovt, num_buckets=1)
    group = pa.concat_tables([probe, index]).combine_chunks()

    baseline = match_bucket(group)
    monkeypatch.setattr(matcher_mod, "_PAIR_CHUNK", 1_000)  # ≫1 chunk
    chunked = match_bucket(group)
    assert chunked.num_rows == baseline.num_rows > 5000
    key = lambda t: sorted(
        zip(t["osm_id"].to_pylist(), t["overture_id"].to_pylist(),
            t["distance_m"].to_pylist(), t["similarity"].to_pylist())
    )
    assert key(chunked) == key(baseline)


def test_auto_salt_dense_cell(ray_session):
    """salt=None (default): the skew pre-pass must detect the one-hot-cell
    corpus (~all rows in one bucket → ratio ≈ num_buckets > 4), pick
    salt > 1, and still match the brute-force oracle exactly."""
    import ray.data

    from overmatch_ray.pipelines.conflate import _auto_salt, conflate

    osm, ovt, (ox, oy, vx, vy, names) = _dense_corpus()
    osm_ds = ray.data.from_arrow(osm).repartition(5)
    picked = _auto_salt(osm_ds, num_buckets=8)
    assert picked > 1, "dense one-cell corpus must trip the skew threshold"

    got = conflate(
        osm_ds, ray.data.from_arrow(ovt).repartition(3), num_buckets=8
    ).take_all()
    dist = np.hypot(ox[:, None] - vx[None, :], oy[:, None] - vy[None, :])
    ia, ib = np.nonzero(dist <= 100.0)
    sims = ratio_pairs(names[ia], names[ib]) / 100.0
    keep = sims >= 0.6
    expected = {
        (f"node/{a}", ovt["id"][b].as_py()) for a, b in zip(ia[keep], ib[keep])
    }
    got_keys = {(r["osm_id"], r["overture_id"]) for r in got}
    assert len(got) == len(got_keys), "auto-salting introduced duplicates"
    assert got_keys == expected


def test_auto_salt_uniform_corpus_stays_one(ray_session):
    """A spatially uniform corpus must NOT salt (no pointless ×S index
    replication)."""
    import ray.data

    from overmatch_ray.pipelines.conflate import _auto_salt, synth_osm_dataset

    ds = synth_osm_dataset(4000, override_num_blocks=4)
    assert _auto_salt(ds, num_buckets=8) == 1
