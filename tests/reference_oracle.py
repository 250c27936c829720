"""Single-process brute-force reimplementation of the reference's J1 join
semantics (/root/reference/scripts/match.py:186-407) — the conformance
oracle the distributed pipeline is compared against.

Deliberately naive: O(n×m) distance matrix, an independent O(n·m) DP LCS
for the fuzzy ratio (NOT the engine's bit-parallel kernel), per-row Python
loops. Only the tag pipeline is shared with the engine (it is table-driven
data; its own behavior is pinned by test_tags.py)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from overmatch_ray.functions.tags import normalize_candidate
from overmatch_ray.geo import mercator_xy


def _lcs_dp(a: str, b: str) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a)):
        for j in range(len(b)):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[len(a)][len(b)]


def _ratio(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    return 2.0 * _lcs_dp(a, b) / (len(a) + len(b))


def oracle_matches(
    osm: pa.Table,
    overture: pa.Table,
    buffer_distance: float = 100.0,
    similarity_threshold: float = 0.6,
) -> list[dict]:
    ox, oy = mercator_xy(
        np.asarray(osm["lon"]), np.asarray(osm["lat"])
    )
    vx, vy = mercator_xy(
        np.asarray(overture["lon"]), np.asarray(overture["lat"])
    )
    osm_rows = osm.to_pylist()
    ovt_rows = overture.to_pylist()
    cand_names = [
        ((r.get("names") or {}).get("primary") or "") for r in ovt_rows
    ]
    cand_tags = [normalize_candidate(r) for r in ovt_rows]

    out = []
    for i, row in enumerate(osm_rows):
        name = row.get("name")
        if not name:
            continue
        dist = np.hypot(ox[i] - vx, oy[i] - vy)
        for j in np.nonzero(dist <= buffer_distance)[0]:
            cname = cand_names[j]
            if not cname:
                continue
            sim = _ratio(name, cname)
            if sim < similarity_threshold:
                continue
            tags = cand_tags[j]
            osm_hn = row.get("addr_housenumber")
            if (
                "addr:housenumber" in tags
                and osm_hn
                and tags["addr:housenumber"] != osm_hn
            ):
                continue
            out.append(
                {
                    "osm_id": row["osm_id"],
                    "overture_id": ovt_rows[j]["id"],
                    "lon": ovt_rows[j]["lon"],
                    "lat": ovt_rows[j]["lat"],
                    "distance_m": round(float(dist[j]), 1),
                    "similarity": sim,
                    "overture_tags": json.dumps(
                        tags, separators=(",", ":"), sort_keys=True
                    ),
                }
            )
    return out
