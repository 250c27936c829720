"""Sources / sinks (SURVEY.md §2.1).

- GeoJSON FeatureCollection reader/writer (S1/S2/S13/S14): the reference's
  on-disk interchange format. Reader flattens features into the engine's
  flat point schema; writer shapes rows back into a FeatureCollection.
- JSONL match reader/writer (S9/S10): line-delimited match records,
  Ray-native (`read_json`/`write_json` equivalents with the reference's
  row shape).
- Lance image-table source (S19): ``read_images`` tries ``lance`` first
  (the input_hint carrier); this container has no lance, so it falls back
  to parquet with the identical schema — the fallback is the tested path.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path, *, columns=None, **kw):
    """``ray.data.read_parquet`` that emits metadata-free block schemas.

    Pandas-written parquet embeds a ``b'pandas'`` schema-metadata dict;
    ``pa.Schema`` with metadata is unhashable in this pyarrow build, which
    defeats Ray's shuffle schema-dedup early exit (``unify_schemas`` falls
    back to a full unify per bundle) and logs "Failed to hash the schemas"
    warnings from every read task. Passing an explicit stripped (and
    column-projected) ``schema=`` from the first file's footer removes the
    metadata at the source — one footer read, no extra pipeline stage. If
    the footer probe fails (directory layouts, mixed schemas), fall back to
    a plain read plus a zero-copy strip stage fused into the read."""
    first = path[0] if isinstance(path, (list, tuple)) else path
    try:
        import pyarrow.parquet as pq

        full = pq.read_schema(first).remove_metadata()
        sch = pa.schema([full.field(c) for c in columns]) if columns else full
        return ray.data.read_parquet(path, columns=columns, schema=sch, **kw)
    except Exception:
        ds = ray.data.read_parquet(path, columns=columns, **kw)
        return ds.map_batches(
            _strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
        )


def _flatten_features(batch: pa.Table, col: str, extra_props: tuple[str, ...]) -> pa.Table:
    """One JSON Feature string per row → the engine's flat point schema."""
    ids, types, names, hns, lons, lats = [], [], [], [], [], []
    extras: dict[str, list] = {k: [] for k in extra_props}
    for s in batch[col].to_pylist():
        ft = json.loads(s)
        props = ft.get("properties") or {}
        fid = props.get("@id") or ft.get("id") or ""
        ids.append(fid)
        # explicit elem_type property wins (write_geojson_seq emits it when
        # the id carries no 'type/123' prefix to re-derive it from)
        types.append(
            props.get("elem_type")
            or (str(fid).split("/")[0] if "/" in str(fid) else "node")
        )
        names.append(props.get("name"))
        hns.append(props.get("addr:housenumber"))
        coords = (ft.get("geometry") or {}).get("coordinates") or [None, None]
        lons.append(coords[0])
        lats.append(coords[1])
        for k in extra_props:
            extras[k].append(props.get(k))
    out = {
        "osm_id": pa.array(ids, pa.string()),
        "elem_type": pa.array(types, pa.string()),
        "name": pa.array(names, pa.string()),
        "addr_housenumber": pa.array(hns, pa.string()),
        "lon": pa.array(lons, pa.float64()),
        "lat": pa.array(lats, pa.float64()),
    }
    for k in extra_props:
        out[k] = pa.array([str(v) if v is not None else None for v in extras[k]],
                          pa.string())
    return pa.table(out)


def read_geojson_points(path: str, extra_props: tuple[str, ...] = ()) -> "ray.data.Dataset":
    """S1/S2: FeatureCollection of Point features → Dataset with
    (osm_id, elem_type, name, addr_housenumber, lon, lat [, extra…]).

    The file-level JSON parse happens once driver-side (a FeatureCollection
    is a single JSON document, not splittable — format-imposed); feature
    flattening is distributed. For large inputs prefer the splittable
    NDJSON layout via ``read_geojson_points_ndjson``."""
    with open(path) as f:
        fc = json.load(f)
    feats = fc.get("features", [])
    rows = ray.data.from_items([{"feature": json.dumps(ft)} for ft in feats])
    return rows.map_batches(
        lambda b: _flatten_features(b, "feature", extra_props),
        batch_format="pyarrow",
    )


def read_geojson_points_ndjson(
    path: str, extra_props: tuple[str, ...] = ()
) -> "ray.data.Dataset":
    """S1/S2 scale path: newline-delimited GeoJSON (one Feature per line,
    a.k.a. GeoJSONSeq) read with ``ray.data.read_text`` — splittable, no
    driver-side parse, each line parsed exactly once inside the batch
    transform (removes the FeatureCollection path's double JSON cost)."""
    rows = ray.data.read_text(path)
    return rows.map_batches(
        lambda b: _flatten_features(b, "text", extra_props),
        batch_format="pyarrow",
    )


def fetch_sparql_json(endpoint: str, query: str, timeout: float = 60.0) -> dict:
    """S5 transport: ``GET <endpoint>?query=<urlencoded>`` returning the
    SPARQL-results JSON (reference scripts/get_osm_ids.py:52-66 uses
    requests; this is the same request in stdlib urllib — no extra dep).
    ``file://`` endpoints (or bare paths) read the canned response
    directly — the no-network test fixture and offline-replay path."""
    from urllib.parse import urlencode, urlparse
    from urllib.request import urlopen

    p = urlparse(endpoint)
    if p.scheme in ("", "file"):
        with open(p.path if p.scheme == "file" else endpoint) as f:
            return json.load(f)
    url = f"{endpoint}?{urlencode({'query': query})}"
    with urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode())


_OSM_URI_PREFIX = "https://www.openstreetmap.org/"


def sparql_osm_source(endpoint: str, query: str) -> "ray.data.Dataset":
    """S5: QLever SPARQL OSM source — bindings with (id, name,
    housenumber?, centroid WKT) become a Dataset with the SAME contract
    as ``read_geojson_points`` (osm_id, elem_type, name,
    addr_housenumber, lon, lat), so the conflation pipeline accepts
    either interchangeably (reference get_osm_ids.py:88-117: URI-prefix
    strip, optional housenumber, POINT centroid parse). Bindings missing
    a required field are skipped, mirroring the reference's
    unexpected-format warning path (get_osm_ids.py:119).

    The result set is API-bounded (the reference pages nothing), so the
    single fetch is driver-side by construction; rows then distribute
    for the downstream batch transforms."""
    from ..geo import parse_wkt_points

    data = fetch_sparql_json(endpoint, query)
    binds = data.get("results", {}).get("bindings", [])
    ids, names, hns, wkts = [], [], [], []
    for b in binds:
        try:
            uri = b["id"]["value"]
            name = b["name"]["value"]
            wkt = b["centroid"]["value"]
        except (KeyError, TypeError):
            continue  # reference: "Unexpected result format" → skip
        ids.append(uri.removeprefix(_OSM_URI_PREFIX))
        names.append(name)
        hns.append(b.get("housenumber", {}).get("value"))
        wkts.append(wkt)
    lon, lat = parse_wkt_points(wkts)
    t = pa.table({
        "osm_id": pa.array(ids, pa.string()),
        "elem_type": pa.array(
            [i.split("/", 1)[0] for i in ids], pa.string()
        ),
        "name": pa.array(names, pa.string()),
        "addr_housenumber": pa.array(hns, pa.string()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
    })
    return ray.data.from_arrow(t)


def write_geojson_features(ds, path: str) -> int:
    """S13/S14: match/feature rows → one FeatureCollection file (compact
    separators like the reference's writer, enrich…py:398-409). Streams
    batches; the file is assembled on the driver (GeoJSON is one document)."""
    n = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow"):
            for row in batch.to_pylist():
                props = {
                    k: v
                    for k, v in row.items()
                    if k not in ("lon", "lat") and v is not None
                }
                feat = {
                    "type": "Feature",
                    "geometry": {
                        "type": "Point",
                        "coordinates": [row["lon"], row["lat"]],
                    },
                    "properties": props,
                }
                f.write(("" if first else ",") + json.dumps(feat, separators=(",", ":")))
                first = False
                n += 1
        f.write("]}")
    return n




def _write_part_files(ds, out_dir: str, suffix: str, row_to_line) -> "ray.data.Dataset":
    """Shared line-sink scaffolding: one part file per block, unique name,
    tmp + atomic rename, (file, rows) receipt rows."""
    os.makedirs(out_dir, exist_ok=True)
    import uuid

    def write_block(batch: pa.Table) -> pa.Table:
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.{suffix}")
        tmp = name + ".tmp"
        with open(tmp, "w") as f:
            for row in batch.to_pylist():
                f.write(row_to_line(row) + "\n")
        os.replace(tmp, name)
        return pa.table(
            {"file": pa.array([name]), "rows": pa.array([batch.num_rows])}
        )

    return ds.map_batches(write_block, batch_format="pyarrow")

def write_geojson_seq(ds, out_dir: str) -> "ray.data.Dataset":
    """S13/S14 scale path: newline-delimited GeoJSON (one Feature per
    line), one part file per block with atomic rename — fully distributed,
    unlike the single-document FeatureCollection writer. Round-trips
    through ``read_geojson_points_ndjson``."""
    # reference GeoJSON property spellings ('@id', 'addr:housenumber') so
    # the NDJSON reader round-trips; elem_type is kept explicitly whenever
    # the id does NOT carry a 'type/123' prefix the reader could re-derive
    key_map = {"osm_id": "@id", "addr_housenumber": "addr:housenumber"}

    def row_to_line(row: dict) -> str:
        skip = {"lon", "lat"}
        if "/" in str(row.get("osm_id", "")):
            skip.add("elem_type")
        props = {
            key_map.get(k, k): v
            for k, v in row.items()
            if k not in skip and v is not None
        }
        feat = {
            "type": "Feature",
            "geometry": {
                "type": "Point",
                "coordinates": [row["lon"], row["lat"]],
            },
            "properties": props,
        }
        return json.dumps(feat, separators=(",", ":"))

    return _write_part_files(ds, out_dir, "geojsonl", row_to_line)


def write_matches_jsonl(matches_ds, out_dir: str):
    """S9: match rows → line-delimited JSON part files (the reference's
    matches.jsonl shape: overture_tags as a nested object)."""
    def row_to_line(row: dict) -> str:
        row = dict(row)
        tags = row.pop("overture_tags", None)
        row["overture_tags"] = json.loads(tags) if tags else {}
        return json.dumps(row, separators=(",", ":"))

    return _write_part_files(matches_ds, out_dir, "jsonl", row_to_line)


def read_matches_jsonl(path_or_dir: str) -> "ray.data.Dataset":
    """S10: read line-delimited match records (skipping unparseable lines,
    like api/load_matches.py:21-41); overture_tags re-serialized to the
    engine's JSON-string column."""
    paths = []
    if os.path.isdir(path_or_dir):
        paths = [
            os.path.join(path_or_dir, f)
            for f in sorted(os.listdir(path_or_dir))
            if f.endswith(".jsonl")
        ]
    else:
        paths = [path_or_dir]
    ds = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch["text"].to_pylist():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue  # skip bad lines (reference behavior)
            d["overture_tags"] = json.dumps(
                d.get("overture_tags") or {}, separators=(",", ":"), sort_keys=True
            )
            rows.append(d)
        if not rows:
            from ..stages.matcher import MATCH_SCHEMA

            return MATCH_SCHEMA.empty_table()
        cols = ["osm_id", "overture_id", "lon", "lat", "distance_m",
                "similarity", "overture_tags"]
        return pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})

    return ds.map_batches(parse, batch_format="pyarrow")


def read_images(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """S19: the Lance image+caption table source. Prefers ``lance`` when the
    library exists (the production carrier per the input_hint); falls back
    to parquet with the identical schema otherwise."""
    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path, columns=columns)
    except ImportError:
        return read_parquet_clean(path, columns=columns)


# the input_hint image+caption table contract (BASELINE.json): bytes ride as
# large_binary (64-bit offsets — a 2 GiB block of image blobs overflows
# 32-bit binary offsets), everything else exactly as declared
IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def write_images(ds: "ray.data.Dataset", path: str,
                 extra_cols: tuple = ("lon", "lat")) -> None:
    """S19 write half: emit an image+caption table in its declared storage
    format. Every batch is normalized to the input_hint column set and
    types (geotag extras kept when present; missing contract columns are an
    error, not a silent schema drift). Prefers the ``lance`` writer when the
    library exists; otherwise partitioned parquet with the identical schema
    — ``read_images`` reads either back."""

    def normalize(batch: pa.Table) -> pa.Table:
        cols = {}
        for f in IMAGES_SCHEMA:
            if f.name not in batch.column_names:
                raise ValueError(f"images table missing contract column {f.name!r}")
            cols[f.name] = batch[f.name].cast(f.type)
        for n in extra_cols:
            if n in batch.column_names:
                cols[n] = batch[n]
        return pa.table(cols)

    out = ds.map_batches(normalize, batch_format="pyarrow")
    try:
        import lance  # noqa: F401

        out.write_lance(path)
    except ImportError:
        out.write_parquet(path)


def read_overture_places(
    path: str,
    columns: list[str] | None = None,
    min_confidence: float | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    categories: list[str] | None = None,
    operating_status: str | None = "open",
) -> "ray.data.Dataset":
    """S3/M23: the Overture place source with PREDICATE PUSHDOWN — the
    Ray-native analog of the reference's DuckDB S3 scan
    (/root/reference/scripts/build_query.py:86-105). bbox / confidence /
    category / status predicates become a pyarrow dataset expression so only
    matching row groups leave storage; the exact point-in-polygon residual
    test stays a downstream map_batches (geo.PackedPolygon)."""
    import pyarrow.compute as pc
    import pyarrow.dataset  # noqa: F401 — expression support

    expr = None

    def conj(e, new):
        return new if e is None else (e & new)

    if min_confidence is not None:
        expr = conj(expr, pc.field("confidence") >= min_confidence)
    if bbox is not None:
        xmin, ymin, xmax, ymax = bbox
        expr = conj(expr, (pc.field("lon") >= xmin) & (pc.field("lon") <= xmax)
                    & (pc.field("lat") >= ymin) & (pc.field("lat") <= ymax))
    if operating_status is not None:
        expr = conj(expr, pc.field("operating_status") == operating_status)
    ds = read_parquet_clean(path, columns=columns, filter=expr)
    if categories:
        cats = set(categories)

        def cat_filter(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pcc

            prim = pcc.struct_field(batch["categories"], "primary")
            return batch.filter(pcc.is_in(prim, value_set=pa.array(list(cats))))

        ds = ds.map_batches(cat_filter, batch_format="pyarrow")
    return ds


# --- Arrow IPC (Feather v2) source/sink ------------------------------------


def write_arrow_ipc(ds, out_dir: str) -> "ray.data.Dataset":
    """Arrow IPC (Feather v2) sink: one .arrow file per block, tmp +
    atomic rename, (file, rows) receipt rows — same crash-safe part-file
    contract as the JSONL sink, but zero-copy columnar on the way back
    in (the interchange format to hand batches to another Arrow-native
    engine without a parquet re-encode)."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.arrow")
        tmp = name + ".tmp"
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, batch.schema) as w:
                w.write_table(batch)
        os.replace(tmp, name)
        return pa.table(
            {"file": pa.array([name]), "rows": pa.array([batch.num_rows])}
        )

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_arrow_ipc(path_or_dir: str, columns=None) -> "ray.data.Dataset":
    """Arrow IPC (Feather v2) source: one READ TASK PER FILE (the file
    list is the split axis — same parallelism story as read_parquet's
    fragments), column projection pushed into the IPC reader so only the
    requested columns are materialized; unreadable files are skipped
    with the JSONL reader's bad-input tolerance (truncated tail files
    from a killed writer must not poison a resume)."""
    if os.path.isdir(path_or_dir):
        paths = sorted(
            os.path.join(path_or_dir, f)
            for f in os.listdir(path_or_dir)
            if f.endswith(".arrow")
        )
    else:
        paths = [path_or_dir]

    def load(batch: pa.Table) -> "pa.Table":
        out = []
        for p in batch["path"].to_pylist():
            try:
                with pa.memory_map(p, "r") as src:
                    t = pa.ipc.open_file(src).read_all()
            except (pa.ArrowInvalid, OSError):
                continue  # skip corrupt/truncated part files
            out.append(t.select(columns) if columns else t)
        if not out:
            return pa.table({})
        combined = pa.concat_tables(out)
        return combined.combine_chunks()

    return ray.data.from_items(
        [{"path": p} for p in paths]
    ).repartition(max(1, len(paths))).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
