"""Overture-side normalization stages.

The conflation join needs only four candidate fields BEFORE matching —
id, lon/lat, ``names.primary`` (M3) and ``addr:housenumber`` (the M16 veto
input) — so ``overture_join_fields`` extracts exactly those, and the full
M10–M15 tag pipeline (``normalize_tags_batch``) runs AFTER the join over
matched candidates only. That mirrors the reference, which evaluates the
tag pipeline per surviving candidate (/root/reference/scripts/match.py:
250-393): with sparse matching (|matched places| ≪ |places|) deferral does
|places|/|matched| × less tag work AND keeps the ~200 B/row ``tags_json``
payload out of the join's all-to-all shuffle.

``addr:housenumber`` depends ONLY on ``addresses[0].freeform`` (M13 sets
``addr:full`` from it; M14's ``split_address`` yields the housenumber;
nothing later rewrites it), so the join-side extraction below is exactly
the value the full pipeline would produce — pinned by
tests/test_conflation.py's brute-force oracle.

``normalize_overture_batch`` (both at once) remains for callers that want
the hoisted single-pass shape.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tags import normalize_candidate

# Columns the reference strips from the candidate before tag mapping
# (match.py:253-267) — everything else feeds the pipeline.
_DROP_KEYS = ("basic_category", "geometry", "geometry_wkb", "filename",
              "operating_status", "lon", "lat")


def overture_join_fields(batch: pa.Table) -> pa.Table:
    """Full Overture rows → the four join-side fields (no tag pipeline):
    id, lon, lat, name, housenumber. ``housenumber`` reproduces the full
    pipeline's ``addr:housenumber`` bit-for-bit (see module docstring)."""
    from ..functions.tags import split_address

    name = pc.fill_null(pc.struct_field(batch["names"], "primary"), "")
    housenumbers: list = []
    for addrs in batch["addresses"].to_pylist():
        full = ((addrs[0] or {}).get("freeform") if addrs else None) or ""
        hn = None
        if full:
            try:
                hn = split_address(full).get("addr:housenumber")
            except ValueError:
                hn = None
        housenumbers.append(hn)
    return pa.table(
        {
            "id": batch["id"],
            "lon": batch["lon"],
            "lat": batch["lat"],
            "name": name,
            "housenumber": pa.array(housenumbers, pa.string()),
        }
    )


def normalize_tags_batch(batch: pa.Table) -> pa.Table:
    """Full Overture rows → (id, tags_json): the M10–M15 pipeline alone,
    for the post-match tag fill over matched candidates."""
    ids = batch["id"]
    rows = batch.drop_columns(
        [c for c in _DROP_KEYS if c in batch.column_names]
    ).to_pylist()
    tags_json = [
        json.dumps(normalize_candidate(row), separators=(",", ":"),
                   sort_keys=True)
        for row in rows
    ]
    return pa.table({"id": ids, "tags_json": pa.array(tags_json, pa.string())})


def normalize_overture_batch(batch: pa.Table) -> pa.Table:
    """Arrow batch of full Overture rows → compact normalized batch."""
    n = batch.num_rows
    ids = batch["id"]
    lon = batch["lon"]
    lat = batch["lat"]
    # names.primary, "" when missing (match.py:163-169)
    name = pc.fill_null(pc.struct_field(batch["names"], "primary"), "")

    rows = batch.drop_columns([c for c in _DROP_KEYS if c in batch.column_names]).to_pylist()
    tags_json = []
    housenumbers = []
    for row in rows:
        tags = normalize_candidate(row)
        tags_json.append(json.dumps(tags, separators=(",", ":"), sort_keys=True))
        housenumbers.append(tags.get("addr:housenumber"))
    return pa.table(
        {
            "id": ids,
            "lon": lon,
            "lat": lat,
            "name": name,
            "housenumber": pa.array(housenumbers, pa.string()),
            "tags_json": pa.array(tags_json, pa.string()),
        }
    )
