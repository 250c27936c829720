"""End-to-end conformance: distributed conflation join vs brute-force oracle."""

import numpy as np
import pytest

from overmatch_ray.synth import osm_block, overture_block
from tests.reference_oracle import oracle_matches

N = 400


def _key(m):
    return (m["osm_id"], m["overture_id"])


@pytest.fixture(scope="module")
def corpus():
    idx = np.arange(N)
    return osm_block(idx, n_total=N), overture_block(idx, n_total=N)


@pytest.fixture(scope="module")
def expected(corpus):
    osm, ovt = corpus
    exp = oracle_matches(osm, ovt)
    # the synthesizer must produce a non-trivial corpus: matches, rejects,
    # and at least one of each edge case
    assert len(exp) > 50
    return exp


def test_distributed_matches_oracle(ray_session, corpus, expected):
    import ray.data

    from overmatch_ray.pipelines.conflate import conflate

    osm, ovt = corpus
    got = (
        conflate(
            ray.data.from_arrow(osm).repartition(7),
            ray.data.from_arrow(ovt).repartition(5),
            num_buckets=16,
        )
        .take_all()
    )
    got_by_key = {_key(m): m for m in got}
    exp_by_key = {_key(m): m for m in expected}
    assert len(got) == len(got_by_key), "duplicate (osm_id, overture_id) pairs"
    assert set(got_by_key) == set(exp_by_key)
    for k, e in exp_by_key.items():
        g = got_by_key[k]
        assert g["distance_m"] == pytest.approx(e["distance_m"], abs=1e-9)
        assert g["similarity"] == pytest.approx(e["similarity"], abs=1e-12)
        assert g["lon"] == pytest.approx(e["lon"])
        assert g["lat"] == pytest.approx(e["lat"])
        assert g["overture_tags"] == e["overture_tags"]


def test_output_invariants(ray_session, corpus):
    """Property checks from BASELINE.md: similarity ∈ [0.6, 1], distance ∈
    [0, 100] with 1-decimal rounding, multi-match preserved."""
    import ray.data

    from overmatch_ray.pipelines.conflate import conflate

    osm, ovt = corpus
    got = conflate(
        ray.data.from_arrow(osm), ray.data.from_arrow(ovt), num_buckets=8
    ).take_all()
    sims = np.array([m["similarity"] for m in got])
    dists = np.array([m["distance_m"] for m in got])
    assert ((sims >= 0.6) & (sims <= 1.0)).all()
    assert ((dists >= 0.0) & (dists <= 100.0)).all()
    np.testing.assert_allclose(dists, np.round(dists, 1))
    from collections import Counter

    per_osm = Counter(m["osm_id"] for m in got)
    assert max(per_osm.values()) > 1, "expected at least one multi-match"


def test_edge_cases_present(corpus, expected):
    """The synthetic corpus actually exercises the reference's edge cases."""
    import json

    osm, ovt = corpus
    exp_keys = {(m["osm_id"], m["overture_id"]) for m in expected}
    # veto: ≥1 candidate pair within distance+similarity but housenumber-vetoed
    vetoed = 0
    from overmatch_ray.functions.tags import normalize_candidate
    from overmatch_ray.geo import mercator_xy

    ox, oy = mercator_xy(np.asarray(osm["lon"]), np.asarray(osm["lat"]))
    osm_rows = osm.to_pylist()
    for m in expected:
        tags = json.loads(m["overture_tags"])
        assert "addr:country" not in tags
        assert "addr:full" not in tags
        assert "source" not in tags
        if "website" in tags:
            assert "utm_" not in tags["website"]
            assert "doordash.com" not in tags["website"]
        if "phone" in tags:
            # literal reference semantics: no DASH-format toll-free survives
            assert "+1-800" not in tags["phone"]
    ovt_rows = ovt.to_pylist()
    vx, vy = mercator_xy(np.asarray(ovt["lon"]), np.asarray(ovt["lat"]))
    from tests.reference_oracle import _ratio

    for j, vr in enumerate(ovt_rows):
        tags = normalize_candidate(vr)
        if "addr:housenumber" not in tags:
            continue
        d = np.hypot(ox - vx[j], oy - vy[j])
        for i in np.nonzero(d <= 100.0)[0]:
            r = osm_rows[i]
            if not r.get("name") or not r.get("addr_housenumber"):
                continue
            cname = (vr.get("names") or {}).get("primary") or ""
            if not cname or _ratio(r["name"], cname) < 0.6:
                continue
            if tags["addr:housenumber"] != r["addr_housenumber"]:
                vetoed += 1
                assert (r["osm_id"], vr["id"]) not in exp_keys
    assert vetoed > 0, "corpus has no housenumber-veto case"


def test_empty_sides(ray_session):
    """verify-recipe probe: an empty index or probe side must produce 0
    matches without crashing."""
    import ray.data

    from overmatch_ray.pipelines.conflate import conflate
    from overmatch_ray.synth import osm_block, overture_block

    idx = np.arange(50)
    osm = ray.data.from_arrow(osm_block(idx, 50))
    ovt = ray.data.from_arrow(overture_block(idx, n_total=50))
    empty_osm = osm.filter(expr="lon > 999")
    empty_ovt = ovt.filter(expr="lon > 999")
    assert conflate(empty_osm, ovt, num_buckets=4).count() == 0
    assert conflate(osm, empty_ovt, num_buckets=4).count() == 0
    assert conflate(empty_osm, empty_ovt, num_buckets=4).count() == 0


def test_deferred_tags_parity_and_empty(ray_session, corpus, expected):
    """defer_tags=True (post-match Bloom + hash-join tag fill) must produce
    the EXACT same match set — tags included — as the hoisted mode, and
    survive empty sides (the fill's early-exit path)."""
    import ray.data

    from overmatch_ray.pipelines.conflate import conflate

    osm, ovt = corpus
    got = conflate(
        ray.data.from_arrow(osm).repartition(7),
        ray.data.from_arrow(ovt).repartition(5),
        num_buckets=16,
        defer_tags=True,
    ).take_all()
    got_by_key = {_key(m): m for m in got}
    exp_by_key = {_key(m): m for m in expected}
    assert len(got) == len(got_by_key)
    assert set(got_by_key) == set(exp_by_key)
    for k, e in exp_by_key.items():
        g = got_by_key[k]
        assert g["overture_tags"] == e["overture_tags"]
        assert g["distance_m"] == pytest.approx(e["distance_m"], abs=1e-9)
        assert g["similarity"] == pytest.approx(e["similarity"], abs=1e-12)

    empty_osm = ray.data.from_arrow(osm).filter(expr="lon > 999")
    out = conflate(empty_osm, ray.data.from_arrow(ovt), num_buckets=4,
                   defer_tags=True)
    assert out.count() == 0
    assert "overture_tags" in out.schema().names
