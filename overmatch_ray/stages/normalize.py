"""Overture-side normalization stage.

Runs the full M10–M15 tag pipeline ONCE per Overture place (stateless
``map_batches``), emitting the compact join-side payload:

    id, lon, lat, name, housenumber, tags_json

The reference evaluates the tag pipeline per (osm, candidate) *pair*
(/root/reference/scripts/match.py:250-393); the result only depends on the
candidate, so hoisting it before the join is semantics-preserving and does
|matches|/|places| × less work. The pair-level housenumber veto (M16) stays
in the matcher; ``housenumber`` is extracted here so the veto never parses
JSON in the hot path.
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
