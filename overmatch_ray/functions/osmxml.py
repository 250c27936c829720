"""osmChange changeset XML builder (S17 analog).

The reference's upload path builds an ``<osmChange>`` document from edited
elements (/root/reference/front_end/src/services/xml.ts:5-84). The engine's
enriched-OSM output table (merge_matches) is exactly what that sink
consumes; this module renders it so a changeset-upload client could submit
it. Pure string building, no network."""

from __future__ import annotations

import json
from xml.sax.saxutils import escape, quoteattr


def element_xml(osm_id: str, lon: float, lat: float, tags: dict[str, str],
                changeset: int, version: int = 1) -> str:
    """One <node|way|relation> element with its tag children."""
    elem_type, _, elem_num = str(osm_id).partition("/")
    attrs = f' id="{escape(elem_num)}" changeset="{changeset}" version="{version}"'
    if elem_type == "node":
        attrs += f' lon="{lon!r}" lat="{lat!r}"'
    tag_xml = "".join(
        f"<tag k={quoteattr(str(k))} v={quoteattr(str(v))}/>" for k, v in sorted(tags.items())
    )
    return f"<{elem_type}{attrs}>{tag_xml}</{elem_type}>"


def build_changeset(merged_rows, changeset: int = 1) -> str:
    """merge_matches output rows → one <osmChange> modify document.

    ``merged_rows``: iterable of dicts with osm_id, merged_tags (JSON
    string) and optionally lon/lat. Deterministic order (sorted by osm_id)."""
    rows = sorted(merged_rows, key=lambda r: r["osm_id"])
    body = "".join(
        element_xml(
            r["osm_id"],
            r.get("lon", 0.0),
            r.get("lat", 0.0),
            json.loads(r["merged_tags"]) if r.get("merged_tags") else {},
            changeset,
        )
        for r in rows
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<osmChange version="0.6" generator="overmatch-ray">'
        f"<modify>{body}</modify></osmChange>"
    )
