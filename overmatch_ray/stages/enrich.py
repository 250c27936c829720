"""Match post-pipeline: per-element merge (A1/O1), tracking enrichment (J2),
tag flattening (M17) and feature shaping (M18).

Reference semantics reproduced:

- A1: group matches by osm_id → matches list + match_count
  (/root/reference/api/load_matches.py:64-102, 207-212)
- O1/O2: per osm_id, matches sorted ascending by distance; the merged tag
  dict is built farthest-first so the CLOSEST match wins key conflicts
  (/root/reference/front_end/src/components/TagComparisonTable.tsx:84-100),
  and the closest match supplies the quality score
  0.6·(sim−0.6)/0.4 + 0.4·(1−d/100), ×100 (TagComparisonTable.tsx:49-56).
- J2: left-join matches ⟕ tracking on osm_id and overture_id → *_marked,
  *_first_seen, *_last_seen (None when absent)
  (/root/reference/scripts/enrich_matches_with_dynamodb.py:129-167). The
  tracking side is small relative to the corpus → broadcast via ray.put,
  probed per batch (no shuffle).
- M17: overture_tags flattened to 'overture_'-prefixed columns
  (enrich_matches_with_dynamodb.py:108-126).
- M18: feature id — the reference uses the input line number
  (enrich…py:315); we deliberately use a deterministic content key
  hash64(osm_id, overture_id) instead so output is order-free under
  distributed execution (SURVEY.md §4 ordering note).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd
import pyarrow as pa


def quality_score(similarity: float, distance_m: float) -> float:
    """Reference quality metric (TagComparisonTable.tsx:49-56)."""
    return 100.0 * (
        0.6 * (similarity - 0.6) / 0.4 + 0.4 * (1.0 - distance_m / 100.0)
    )


def pair_id(osm_id: str, overture_id: str) -> int:
    """Deterministic 63-bit feature id replacing the reference's line-number
    id (order-free conformance)."""
    h = hashlib.blake2b(
        f"{osm_id}|{overture_id}".encode(), digest_size=8
    ).digest()
    return int.from_bytes(h, "big") >> 1


def merge_matches_group(g: pd.DataFrame) -> pd.DataFrame:
    """A1 + O1 for ONE element: collected match list, closest-wins merged
    tag dict, best match's quality score."""
    g = g.sort_values(["distance_m", "overture_id"], kind="mergesort")
    merged: dict[str, str] = {}
    for tags_json in reversed(list(g["overture_tags"])):
        if tags_json:
            merged.update(json.loads(tags_json))
    best = g.iloc[0]
    return pd.DataFrame(
        {
            "osm_id": [g["osm_id"].iloc[0]],
            "match_count": np.array([len(g)], dtype=np.int64),
            "best_overture_id": [best["overture_id"]],
            "best_distance_m": [float(best["distance_m"])],
            "best_similarity": [float(best["similarity"])],
            "quality": [quality_score(best["similarity"], best["distance_m"])],
            "merged_tags": [json.dumps(merged, separators=(",", ":"), sort_keys=True)],
            "matches": [
                json.dumps(
                    [
                        {
                            "overture_id": r.overture_id,
                            "distance_m": float(r.distance_m),
                            "similarity": float(r.similarity),
                        }
                        for r in g.itertuples()
                    ],
                    separators=(",", ":"),
                )
            ],
        }
    )


def merge_matches(matches_ds, num_buckets: int = 32):
    """A1/O1 merge, bucketed: osm_id cardinality ≈ corpus size, so the
    shuffle groups by hash(osm_id) % B and one callable merges a whole
    bucket of elements. Within the bucket, group boundaries are recovered
    with numpy over ONE sorted frame (no per-group DataFrame construction —
    that cost ~100 µs × |elements| and dominated the postmatch bench
    stage); only the per-row JSON parse/serialize remains row-wise.
    Per-group semantics identical to ``merge_matches_group``."""
    from .groupops import bucketed_group_apply

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["osm_id", "distance_m", "overture_id"], kind="mergesort"
        )
        osm = g["osm_id"].to_numpy()
        dist = g["distance_m"].to_numpy(dtype=np.float64)
        sim = g["similarity"].to_numpy(dtype=np.float64)
        ovt = g["overture_id"].to_numpy()
        tj = g["overture_tags"].to_numpy()
        n = len(g)
        starts = np.flatnonzero(np.concatenate([[True], osm[1:] != osm[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        best = starts  # ascending (distance_m, overture_id) → first is best
        merged_tags = []
        matches_json = []
        for s, e in zip(starts, ends):
            merged: dict = {}
            for j in range(e - 1, s - 1, -1):  # farthest first, closest wins
                if tj[j]:
                    merged.update(json.loads(tj[j]))
            merged_tags.append(
                json.dumps(merged, separators=(",", ":"), sort_keys=True)
            )
            matches_json.append(
                json.dumps(
                    [
                        {
                            "overture_id": ovt[j],
                            "distance_m": float(dist[j]),
                            "similarity": float(sim[j]),
                        }
                        for j in range(s, e)
                    ],
                    separators=(",", ":"),
                )
            )
        return pd.DataFrame(
            {
                "osm_id": osm[best],
                "match_count": (ends - starts).astype(np.int64),
                "best_overture_id": ovt[best],
                "best_distance_m": dist[best],
                "best_similarity": sim[best],
                "quality": 100.0
                * (0.6 * (sim[best] - 0.6) / 0.4 + 0.4 * (1.0 - dist[best] / 100.0)),
                "merged_tags": merged_tags,
                "matches": matches_json,
            }
        )

    return bucketed_group_apply(
        matches_ds, ["osm_id"], merge_bucket, num_buckets=num_buckets
    )


class TrackingEnricher:
    """J2 broadcast enrichment stage: actor-pool map_batches callable.

    ``osm_ref`` / ``overture_ref`` are ``ray.put`` object refs of
    {element_id: (first_seen, last_seen)} dicts, fetched once per actor in
    __init__ (zero-copy from the local object store), probed per batch.
    """

    def __init__(self, osm_ref, overture_ref):
        import ray

        self._osm = ray.get(osm_ref)
        self._ovt = ray.get(overture_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        osm_ids = batch["osm_id"].to_pylist()
        ovt_ids = batch["overture_id"].to_pylist()

        def look(track, ids):
            marked, first, last = [], [], []
            for i in ids:
                rec = track.get(i)
                marked.append(rec is not None)
                first.append(rec[0] if rec else None)
                last.append(rec[1] if rec else None)
            return marked, first, last

        om, of, ol = look(self._osm, osm_ids)
        vm, vf, vl = look(self._ovt, ovt_ids)
        fid = [pair_id(a, b) for a, b in zip(osm_ids, ovt_ids)]
        return (
            batch.append_column("feature_id", pa.array(fid, pa.int64()))
            .append_column("osm_marked", pa.array(om, pa.bool_()))
            .append_column("osm_first_seen", pa.array(of, pa.string()))
            .append_column("osm_last_seen", pa.array(ol, pa.string()))
            .append_column("overture_marked", pa.array(vm, pa.bool_()))
            .append_column("overture_first_seen", pa.array(vf, pa.string()))
            .append_column("overture_last_seen", pa.array(vl, pa.string()))
        )


# per-worker-process cache of fetched broadcast maps (task-based stages
# would deserialize ray.get(dict) per call otherwise)
_BROADCAST_CACHE: dict = {}


def _cached_get(ref):
    import ray

    if ref not in _BROADCAST_CACHE:
        if len(_BROADCAST_CACHE) >= 8:  # bound worker memory across generations
            _BROADCAST_CACHE.clear()
        _BROADCAST_CACHE[ref] = ray.get(ref)
    return _BROADCAST_CACHE[ref]


def enrich_matches(matches_ds, osm_tracking: dict, overture_tracking: dict,
                   concurrency: int | None = None):
    """Wire the J2 join: broadcast both tracking maps once, probe per batch.

    Runs as STATELESS TASKS (elastic, no CPU reservation), not an actor
    pool: an actor pool chained into downstream all-to-all ops can stall a
    small cluster (the pool reserves CPUs the shuffle needs), and the only
    state here is the broadcast lookup dict — cached per worker process.
    ``concurrency`` is accepted for API compatibility and ignored."""
    import ray

    osm_ref = ray.put(osm_tracking)
    ovt_ref = ray.put(overture_tracking)

    def enrich_batch(batch: pa.Table) -> pa.Table:
        enricher = TrackingEnricher.__new__(TrackingEnricher)
        enricher._osm = _cached_get(osm_ref)
        enricher._ovt = _cached_get(ovt_ref)
        return enricher(batch)

    return matches_ds.map_batches(enrich_batch, batch_format="pyarrow")


# The observed OSM tag vocabulary of the reference's golden output
# (data/matches.jsonl key census, BASELINE.md) — the pinned flatten schema.
STANDARD_TAG_KEYS = (
    "name", "amenity", "shop", "cuisine", "phone", "website", "brand",
    "contact:facebook", "contact:twitter", "addr:housenumber", "addr:street",
    "addr:unit", "addr:city", "addr:state", "addr:postcode", "drink:cocktail",
)


def flatten_tags_batch(
    batch: pa.Table, prefix: str = "overture_", keys: tuple[str, ...] = STANDARD_TAG_KEYS
) -> pa.Table:
    """M17: explode the overture_tags JSON into prefixed string columns.

    The key set is PINNED (open-world keys outside it stay in the JSON map
    only) so every batch yields the same schema — per-batch key discovery
    would give batches divergent schemas and break Arrow writers. ':' in
    OSM keys becomes '_' in column names
    (enrich_matches_with_dynamodb.py:108-126 uses the same separator).
    """
    dicts = [json.loads(s) if s else {} for s in batch["overture_tags"].to_pylist()]
    out = batch.drop_columns(["overture_tags"])
    for k in keys:
        col = [d.get(k) for d in dicts]
        out = out.append_column(
            prefix + k.replace(":", "_"), pa.array(col, pa.string())
        )
    return out


def marked_counters(enriched_ds):
    """A3: global counts of osm-marked / overture-marked / both
    (enrich_matches_with_dynamodb.py:283-335) — boolean sums, no shuffle."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        om = batch["osm_marked"]
        vm = batch["overture_marked"]
        both = pc.and_(om, vm)
        return pa.table(
            {
                "n_total": pa.array([batch.num_rows], pa.int64()),
                "n_osm_marked": pa.array([pc.sum(pc.cast(om, pa.int64())).as_py() or 0], pa.int64()),
                "n_overture_marked": pa.array([pc.sum(pc.cast(vm, pa.int64())).as_py() or 0], pa.int64()),
                "n_both_marked": pa.array([pc.sum(pc.cast(both, pa.int64())).as_py() or 0], pa.int64()),
            }
        )

    totals = enriched_ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_total", "n_osm_marked", "n_overture_marked", "n_both_marked"]
    )
    return pa.table(
        {k: pa.array([int(v)], pa.int64()) for k, v in
         (("n_total", totals["sum(n_total)"]),
          ("n_osm_marked", totals["sum(n_osm_marked)"]),
          ("n_overture_marked", totals["sum(n_overture_marked)"]),
          ("n_both_marked", totals["sum(n_both_marked)"]))}
    )


def match_diff(old_ds, new_ds, num_buckets: int = 32):
    """Nightly incremental conflation CDC (r4 VERDICT #5; reference
    semantics: the nightly full rebuild + DynamoDB first_seen/last_seen
    upsert, reference api/db.py:54-91): diff two match tables on the
    EXACT (osm_id, overture_id) pair key → one row per difference with
    ``change_type`` ∈ added / removed / changed.

    - ``changed`` = any of (distance_m, similarity, overture_tags)
      differ; distance/similarity compare as decimeter / 1e-6 ints (the
      match contract's own quantization — no float equality), tags by a
      blake2b content hash folded BEFORE the shuffle (16 B crosses, not
      tag blobs).
    - The join key is the literal pair STRING (osm_id ∥ 0x1F ∥
      overture_id) — exact, no 64-bit-collision misclassification;
      ``bucket_hash_join`` hashes it only for routing.
    - Each output row carries the surviving side's (lon, lat) so
      dirty-tile selection (``stages.tiles.incremental_tiles``) knows
      where to republish.

    One bucketed OUTER hash join; both sides are manifest-shaped
    projections, unchanged pairs are dropped in the classify map, so
    output ≪ input at steady state."""
    import pyarrow.compute as pc

    from .joins import bucket_hash_join

    def manifest(suffix: str):
        def _m(batch: pa.Table) -> pa.Table:
            osm = batch["osm_id"].to_pylist()
            ovt = batch["overture_id"].to_pylist()
            tags = batch["overture_tags"].to_pylist()
            d10 = np.round(
                batch["distance_m"].to_numpy(zero_copy_only=False) * 10.0
            ).astype(np.int64)
            s6 = np.round(
                batch["similarity"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)
            th = [
                hashlib.blake2b(
                    (t or "").encode(), digest_size=8
                ).hexdigest()
                for t in tags
            ]
            return pa.table({
                f"pair_{suffix}": pa.array(
                    [f"{a}\x1f{b}" for a, b in zip(osm, ovt)], pa.string()
                ),
                f"lon_{suffix}": batch["lon"],
                f"lat_{suffix}": batch["lat"],
                f"d10_{suffix}": pa.array(d10),
                f"s6_{suffix}": pa.array(s6),
                f"th_{suffix}": pa.array(th, pa.string()),
            })

        return _m

    old_m = old_ds.map_batches(manifest("o"), batch_format="pyarrow").materialize()
    new_m = new_ds.map_batches(manifest("n"), batch_format="pyarrow").materialize()
    joined = bucket_hash_join(
        old_m, new_m, "pair_o", "pair_n", how="outer",
        num_buckets=num_buckets,
    )

    def classify(batch: pa.Table) -> pa.Table:
        has_o = pc.is_valid(batch["pair_o"]).to_numpy(zero_copy_only=False)
        has_n = pc.is_valid(batch["pair_n"]).to_numpy(zero_copy_only=False)
        same = (
            has_o & has_n
            & (pc.fill_null(batch["d10_o"], -1).to_numpy(zero_copy_only=False)
               == pc.fill_null(batch["d10_n"], -2).to_numpy(zero_copy_only=False))
            & (pc.fill_null(batch["s6_o"], -1).to_numpy(zero_copy_only=False)
               == pc.fill_null(batch["s6_n"], -2).to_numpy(zero_copy_only=False))
            & (pc.fill_null(batch["th_o"], "").to_numpy(zero_copy_only=False)
               == pc.fill_null(batch["th_n"], "!").to_numpy(zero_copy_only=False))
        )
        keep = ~same
        t = batch.filter(pa.array(keep))
        has_o = has_o[keep]
        has_n = has_n[keep]
        typ = np.where(
            ~has_o, "added", np.where(~has_n, "removed", "changed")
        ).astype(object)
        pair = np.where(
            has_n,
            pc.fill_null(t["pair_n"], "").to_numpy(zero_copy_only=False),
            pc.fill_null(t["pair_o"], "").to_numpy(zero_copy_only=False),
        )
        lon = np.where(
            has_n,
            pc.fill_null(t["lon_n"], 0.0).to_numpy(zero_copy_only=False),
            pc.fill_null(t["lon_o"], 0.0).to_numpy(zero_copy_only=False),
        )
        lat = np.where(
            has_n,
            pc.fill_null(t["lat_n"], 0.0).to_numpy(zero_copy_only=False),
            pc.fill_null(t["lat_o"], 0.0).to_numpy(zero_copy_only=False),
        )
        split = [p.split("\x1f", 1) for p in pair.tolist()]
        # old-side coordinate rides along (null for added): a changed pair
        # whose feature MOVED dirties both its old and new tiles
        return pa.table({
            "osm_id": pa.array([s[0] for s in split], pa.string()),
            "overture_id": pa.array([s[1] for s in split], pa.string()),
            "change_type": pa.array(typ, pa.string()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "lon_old": t["lon_o"],
            "lat_old": t["lat_o"],
        })

    return joined.map_batches(classify, batch_format="pyarrow")
