"""Deterministic synthetic corpus generators (FIXTURES.md §1/§2/§5).

The reference's conformance corpus is golden data (DC-area OSM amenities ×
Overture places → matches.jsonl). We cannot ship that data, so we synthesize
a corpus with the same *shape and edge cases*: controlled distances around
the 100 m threshold, controlled name similarity around 0.6, housenumber
veto conflicts, toll-free phones, blocklisted/tracking-param websites,
malformed update_times, empty names — so expected join output is computable
by an independent oracle.

All randomness is counter-based (splitmix64 of the row index), NOT stateful
RNG — generation is deterministic per row regardless of batch boundaries,
so these functions can run inside ``ray.data.range(n).map_batches(...)`` at
any parallelism and produce identical corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geo import inverse_mercator, mercator_xy, wkb_points

# DC-ish bbox (matches the reference corpus area) at the base corpus size.
# For larger corpora the span grows like sqrt(n) so spatial density — and
# therefore per-cell candidate counts — stay constant at any scale.
BBOX = (-77.08, 38.82, -76.92, 38.98)
BASE_N = 2000


def corpus_bbox(n_total: int) -> tuple[float, float, float, float]:
    """Bounding box scaled so point density is constant w.r.t. corpus size."""
    cx = (BBOX[0] + BBOX[2]) / 2.0
    cy = (BBOX[1] + BBOX[3]) / 2.0
    s = max(1.0, float(np.sqrt(max(n_total, 1) / BASE_N)))
    hw = (BBOX[2] - BBOX[0]) / 2.0 * s
    hh = (BBOX[3] - BBOX[1]) / 2.0 * s
    return (cx - hw, cy - hh, cx + hw, cy + hh)

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic hash."""
    z = x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _uniform(idx: np.ndarray, salt: int, seed: int = 42) -> np.ndarray:
    """Deterministic U[0,1) per row index."""
    h = _splitmix64(
        idx.astype(np.uint64) * _U64(0x9E3779B97F4A7C15)
        ^ _U64((salt * 0xD1B54A32D192ED03 + seed) & 0xFFFFFFFFFFFFFFFF)
    )
    return h.astype(np.float64) / 18446744073709551616.0


def _hex_id(idx: np.ndarray, salt: int) -> list[str]:
    """uuid-shaped deterministic id per row."""
    a = _splitmix64(idx.astype(np.uint64) ^ _U64(salt))
    b = _splitmix64(a)
    return [
        f"{int(x) >> 32:08x}-{int(x) & 0xFFFF:04x}-4{(int(x) >> 16) & 0xFFF:03x}-"
        f"{int(y) & 0xFFFF:04x}-{int(y) >> 16 & 0xFFFFFFFFFFFF:012x}"
        for x, y in zip(a, b)
    ]


_FIRST = ["Capitol", "Union", "Potomac", "Eastern", "Liberty", "Navy Yard",
          "Barracks", "Garfield", "Anacostia", "Metro", "Dupont", "Federal",
          "Monument", "Harbor", "Senate", "District", "Cherry", "Compass"]
_SECOND = ["Pizza", "Coffee", "Tavern", "Grill", "Diner", "Bakery", "Cantina",
           "Noodle House", "Oyster Bar", "Brewing Co", "Deli", "Bistro",
           "Chophouse", "Creamery", "Kitchen", "Taproom"]
_STREETS = ["Pennsylvania Ave SE", "8th St SE", "Barracks Row", "M St NW",
            "E Capitol St", "Independence Ave SW", "Maryland Ave NE",
            "Constitution Ave NW", "H St NE", "Wisconsin Ave NW"]
_CATEGORIES = ["pizza_restaurant", "coffee_shop", "bar", "pub", "restaurant",
               "fast_food_restaurant", "cocktail_bar", "cafe", "bakery",
               "mexican_restaurant", "italian_restaurant", "thai_restaurant"]


def _pick(pool: list[str], idx: np.ndarray, salt: int) -> np.ndarray:
    h = _splitmix64(idx.astype(np.uint64) ^ _U64(salt))
    return np.array(pool, dtype=object)[(h % _U64(len(pool))).astype(np.int64)]


def poi_name(idx: np.ndarray) -> np.ndarray:
    """Deterministic business name per index."""
    f = _pick(_FIRST, idx, 101)
    s = _pick(_SECOND, idx, 102)
    return np.array([f"{a} {b}" for a, b in zip(f, s)], dtype=object)


def osm_block(idx: np.ndarray, n_total: int | None = None) -> pa.Table:
    """OSM amenity rows for the given global row indices (FIXTURES.md §1).

    ``n_total`` is the corpus size (scales the bbox for constant density);
    defaults to the base box."""
    idx = np.asarray(idx, dtype=np.int64)
    box = corpus_bbox(n_total) if n_total else BBOX
    n = idx.size
    lon = box[0] + (box[2] - box[0]) * _uniform(idx, 1)
    lat = box[1] + (box[3] - box[1]) * _uniform(idx, 2)
    u_type = _uniform(idx, 3)
    elem_type = np.where(u_type < 0.94, "node", np.where(u_type < 0.995, "way", "relation")).astype(object)
    osm_id = np.array([f"{t}/{100000 + i}" for t, i in zip(elem_type, idx)], dtype=object)
    name = poi_name(idx)
    u_name = _uniform(idx, 4)
    name[u_name < 0.02] = None       # must be filtered (match.py:203-206)
    name[(u_name >= 0.02) & (u_name < 0.03)] = ""
    hn = ((_splitmix64(idx.astype(np.uint64) ^ _U64(7)) % _U64(9899)) + _U64(100)).astype(np.int64)
    housenumber = np.array([str(h) for h in hn], dtype=object)
    housenumber[_uniform(idx, 5) > 0.77] = None   # present ~77%
    return pa.table(
        {
            "osm_id": pa.array(osm_id, pa.string()),
            "elem_type": pa.array(elem_type, pa.string()),
            "name": pa.array(name, pa.string()),
            "addr_housenumber": pa.array(housenumber, pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )


_ADDR_TYPE = pa.struct(
    [("freeform", pa.string()), ("country", pa.string()), ("region", pa.string()),
     ("locality", pa.string()), ("postcode", pa.string())]
)
_NAMES_TYPE = pa.struct([("primary", pa.string()), ("rules", pa.string())])
_BRAND_TYPE = pa.struct([("names", _NAMES_TYPE)])
_SOURCES_TYPE = pa.list_(pa.struct([("update_time", pa.string())]))

OVERTURE_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("confidence", pa.float64()),
        ("basic_category", pa.string()),
        ("categories", pa.struct([("primary", pa.string())])),
        ("names", _NAMES_TYPE),
        ("addresses", pa.list_(_ADDR_TYPE)),
        ("phones", pa.list_(pa.string())),
        ("websites", pa.list_(pa.string())),
        ("socials", pa.list_(pa.string())),
        ("brand", _BRAND_TYPE),
        ("sources", _SOURCES_TYPE),
        ("operating_status", pa.string()),
        ("geometry_wkb", pa.binary()),
    ]
)


def overture_block(osm_idx: np.ndarray, max_cands: int = 3, n_total: int | None = None) -> pa.Table:
    """Overture place candidates derived from OSM row indices.

    For OSM row i we emit 0–3 candidates at controlled planar offsets
    (70% < 100 m ⇒ distance-match, else 105–400 m ⇒ reject) with controlled
    name similarity and the FIXTURES.md §2 edge cases. The mapping
    (i, j) → candidate is pure, so any partitioning of indices generates the
    same corpus.
    """
    osm_idx = np.asarray(osm_idx, dtype=np.int64)
    box = corpus_bbox(n_total) if n_total else BBOX
    # candidate count per OSM row: P(k)=[.25,.45,.2,.1]
    u = _uniform(osm_idx, 20)
    k = np.select([u < 0.25, u < 0.70, u < 0.90], [0, 1, 2], default=3)
    parent = np.repeat(osm_idx, k)
    # j-th candidate of its parent (vectorized: stages.groupops.concat_ranges form)
    if parent.size:
        kk = k.astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(kk)[:-1]])
        j = np.arange(int(kk.sum())) - np.repeat(offs, kk)
    else:
        j = np.empty(0, np.int64)
    pair = parent * np.int64(7) + j  # unique per (parent, j), j<7

    # geometry: offset in EPSG:3857 meters from the parent point
    plon = box[0] + (box[2] - box[0]) * _uniform(parent, 1)
    plat = box[1] + (box[3] - box[1]) * _uniform(parent, 2)
    px, py = mercator_xy(plon, plat)
    u_d = _uniform(pair, 21)
    dist = np.where(u_d < 0.7, 95.0 * _uniform(pair, 22), 105.0 + 295.0 * _uniform(pair, 23))
    ang = 2 * np.pi * _uniform(pair, 24)
    lon, lat = inverse_mercator(px + dist * np.cos(ang), py + dist * np.sin(ang))

    # names: 55% identical, 15% light perturbation, 10% empty, 20% unrelated
    base = poi_name(parent)
    u_n = _uniform(pair, 25)
    alt = poi_name(pair + np.int64(1_000_003))
    names = base.copy()
    pert = (u_n >= 0.55) & (u_n < 0.70)
    names[pert] = np.array([f"The {s}" for s in base[pert]], dtype=object)
    names[(u_n >= 0.70) & (u_n < 0.80)] = ""
    unrelated = u_n >= 0.80
    names[unrelated] = alt[unrelated]

    n = pair.size
    hn_parent = ((_splitmix64(parent.astype(np.uint64) ^ _U64(7)) % _U64(9899)) + _U64(100)).astype(np.int64)
    u_hn = _uniform(pair, 26)
    # 60% same housenumber, 20% conflicting (veto case), 20% none
    hn = np.where(u_hn < 0.6, hn_parent, hn_parent + np.int64(1))
    street = _pick(_STREETS, pair, 27)
    unit_u = _uniform(pair, 28)
    freeform = np.array(
        [
            (f"{h} {s} Unit {int(uu * 40) + 1}" if uu < 0.1 else f"{h} {s}")
            if u < 0.8
            else ""
            for h, s, uu, u in zip(hn, street, unit_u, u_hn)
        ],
        dtype=object,
    )
    postcode = np.array(
        [f"200{int(x * 90) + 10:02d}" for x in _uniform(pair, 29)], dtype=object
    )
    addresses = [
        [
            {
                "freeform": f if f else None,
                "country": "US",
                "region": "DC",
                "locality": "Washington",
                "postcode": p,
            }
        ]
        for f, p in zip(freeform, postcode)
    ]

    # phones: 70% normal, 10% toll-free (5% parseable → normalized+kept per
    # the reference's literal filter, 5% with an ext suffix → dropped), 20% none
    u_p = _uniform(pair, 30)
    pdig = _splitmix64(pair.astype(np.uint64) ^ _U64(31)) % _U64(10_000_000)
    phones = [
        (
            [f"(202) {int(d) // 10000:03d}-{int(d) % 10000:04d}"]
            if up < 0.7
            else (
                [f"+1-800-{int(d) // 10000:03d}-{int(d) % 10000:04d}"]
                if up < 0.75
                else ([f"+1-800-{int(d) // 10000:03d}-{int(d) % 10000:04d} ext 9"] if up < 0.8 else [])
            )
        )
        for up, d in zip(u_p, pdig)
    ]

    # websites: 50% normal-with-tracking, 15% mixed-case, 15% blocklisted, 20% none
    u_w = _uniform(pair, 32)
    slug = [s.lower().replace(" ", "").replace(",", "") for s in names]
    websites = []
    for uw, sl, i in zip(u_w, slug, pair):
        if uw < 0.25:
            websites.append([f"https://www.{sl or 'place'}.com/?utm_source=ov&page=menu"])
        elif uw < 0.5:
            # LinkedIn-style lipi tracking param (reference match.py:44)
            websites.append([f"https://www.{sl or 'place'}.com/?lipi=urn{int(i)}&page=menu"])
        elif uw < 0.65:
            websites.append([f"https://WWW.{(sl or 'place').upper()}.com/Menu"])
        elif uw < 0.8:
            websites.append([f"https://www.doordash.com/store/{int(i)}"])
        else:
            websites.append([])
    u_s = _uniform(pair, 33)
    socials = [
        (
            [f"https://www.facebook.com/{int(x)}"]
            if us < 0.5
            else ([f"https://www.twitter.com/{sl or 'place'}"] if us < 0.65 else [])
        )
        for us, x, sl in zip(u_s, pdig, slug)
    ]
    u_b = _uniform(pair, 34)
    brand = [
        {"names": {"primary": nm.split(" ")[0], "rules": None}} if ub < 0.2 and nm else None
        for ub, nm in zip(u_b, names)
    ]
    u_t = _uniform(pair, 35)
    sources = [
        [{"update_time": "2024-03-01T00:00:00.000" if ut < 0.3 else "2024-03-01T12:34:56Z"}]
        for ut in u_t
    ]
    u_r = _uniform(pair, 36)
    rules = np.where(u_r < 0.15, "variant", None)
    u_bc = _uniform(pair, 37)
    basic_category = np.where(u_bc < 0.2, None, "eat_and_drink").astype(object)

    return pa.table(
        {
            "id": pa.array(_hex_id(pair, 40), pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "confidence": pa.array(0.5 + 0.5 * _uniform(pair, 41)),
            "basic_category": pa.array(basic_category, pa.string()),
            "categories": pa.array(
                [{"primary": c} for c in _pick(_CATEGORIES, pair, 42)],
                pa.struct([("primary", pa.string())]),
            ),
            "names": pa.array(
                [{"primary": nm, "rules": r} for nm, r in zip(names, rules)], _NAMES_TYPE
            ),
            "addresses": pa.array(addresses, pa.list_(_ADDR_TYPE)),
            "phones": pa.array(phones, pa.list_(pa.string())),
            "websites": pa.array(websites, pa.list_(pa.string())),
            "socials": pa.array(socials, pa.list_(pa.string())),
            "brand": pa.array(brand, _BRAND_TYPE),
            "sources": pa.array(sources, _SOURCES_TYPE),
            "operating_status": pa.array(["open"] * n, pa.string()),
            "geometry_wkb": pa.array(wkb_points(lon, lat), pa.binary()),
        },
        schema=OVERTURE_SCHEMA,
    )


def images_block(idx: np.ndarray, captions: np.ndarray | None = None, n_total: int | None = None,
                 min_px: int = 16, max_px: int = 64) -> pa.Table:
    """Image+caption rows (input_hint schema + lon/lat geotags).

    Pixels are deterministic per index; every 17th row is an exact duplicate
    of its predecessor (same pixels ⇒ same phash) for D4 dedup tests.
    """
    from .imaging.codec import encode_image, encode_jpeg_batch, phash64_batch

    idx = np.asarray(idx, dtype=np.int64)
    # exact-duplicate content: row i with i%17==0 and i>0 re-renders row i-1
    content_idx = np.where((idx % 17 == 0) & (idx > 0), idx - 1, idx)

    span = _U64(max(max_px - min_px + 1, 1))
    w = (min_px + (_splitmix64(content_idx.astype(np.uint64) ^ _U64(50)) % span)).astype(np.int64)
    h = (min_px + (_splitmix64(content_idx.astype(np.uint64) ^ _U64(51)) % span)).astype(np.int64)
    fmt = np.where(_uniform(content_idx, 52) < 0.5, "png", "jpeg").astype(object)

    imgs = []
    for ci, wi, hi, f in zip(content_idx, w, h, fmt):
        # deterministic gradients + a smooth per-image low-frequency field
        # (photo-like content: bilinear-upsampled 5×5 random grid — real
        # photos are piecewise-smooth, not per-pixel noise, and the smooth
        # field is what makes each image's phash distinct since the
        # perceptual hash thresholds LOW-frequency DCT coefficients)
        yy, xx = np.mgrid[0:hi, 0:wi]
        seedv = int(_splitmix64(np.array([ci], dtype=np.uint64))[0])
        rng = np.random.default_rng(seedv)
        grid = rng.integers(0, 256, (5, 5)).astype(np.float64)
        gy = np.linspace(0.0, 4.0, hi)
        gx = np.linspace(0.0, 4.0, wi)
        y0 = np.minimum(gy.astype(np.int64), 3)
        x0 = np.minimum(gx.astype(np.int64), 3)
        fy = (gy - y0)[:, None]
        fx = (gx - x0)[None, :]
        field = (
            grid[y0[:, None], x0[None, :]] * (1 - fy) * (1 - fx)
            + grid[y0[:, None] + 1, x0[None, :]] * fy * (1 - fx)
            + grid[y0[:, None], x0[None, :] + 1] * (1 - fy) * fx
            + grid[y0[:, None] + 1, x0[None, :] + 1] * fy * fx
        )
        img = np.empty((hi, wi, 3), dtype=np.uint8)
        img[..., 0] = (xx * 255 // max(wi - 1, 1)).astype(np.uint8)
        img[..., 1] = (yy * 255 // max(hi - 1, 1)).astype(np.uint8)
        img[..., 2] = np.clip(np.rint(field), 0, 255).astype(np.uint8)
        imgs.append(img)
    # q95: on this piecewise-smooth content PSNR ≈ 51 dB (the ≥40
    # input-hint invariant holds with 11 dB margin) and the entropy
    # stream is ~27% cheaper to decode than the q98 default. JPEGs go
    # through the batch encoder (bit-identical to scalar encode_image).
    blobs: list = [None] * len(imgs)
    jidx = [i for i, f in enumerate(fmt) if f == "jpeg"]
    for i, b in zip(jidx, encode_jpeg_batch([imgs[i] for i in jidx], quality=95)):
        blobs[i] = b
    for i, f in enumerate(fmt):
        if f != "jpeg":
            blobs[i] = encode_image(imgs[i], f, quality=95)
    hashes = phash64_batch(imgs)

    box = corpus_bbox(n_total) if n_total else BBOX
    lon = box[0] + (box[2] - box[0]) * _uniform(idx, 53)
    lat = box[1] + (box[3] - box[1]) * _uniform(idx, 54)
    if captions is None:
        # half the planted duplicates (every 34th row) are TRUE mirrors —
        # same pixels AND same alt-text as their predecessor — so the
        # caption-consistency sweep sees both consistent and conflicting
        # duplicate groups; the other half (17 mod 34) keep their own
        # caption (the conflicting-label web-mirror case)
        cap_idx = np.where((idx % 34 == 0) & (idx > 0), idx - 1, idx)
        captions = np.array(
            [f"photo #{i} near {s}"
             for i, s in zip(cap_idx, _pick(_STREETS, cap_idx, 55))],
            dtype=object,
        )
    return pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in idx], pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "w": pa.array(w.astype(np.int32), pa.int32()),
            "h": pa.array(h.astype(np.int32), pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": pa.array(list(captions), pa.string()),
            "phash": pa.array(hashes, pa.int64()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )


def images_meta_block(idx: np.ndarray, min_px: int = 16, max_px: int = 64) -> pa.Table:
    """Metadata-only projection of ``images_block`` — identical
    (image_id, w, h) columns WITHOUT rendering pixels, for pipelines that
    only consume shape metadata (aspect bucketing). Must stay formula-
    identical to images_block; pinned by a test."""
    idx = np.asarray(idx, dtype=np.int64)
    content_idx = np.where((idx % 17 == 0) & (idx > 0), idx - 1, idx)
    span = _U64(max(max_px - min_px + 1, 1))
    w = (min_px + (_splitmix64(content_idx.astype(np.uint64) ^ _U64(50)) % span)).astype(np.int64)
    h = (min_px + (_splitmix64(content_idx.astype(np.uint64) ^ _U64(51)) % span)).astype(np.int64)
    return pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in idx], pa.string()),
            "w": pa.array(w.astype(np.int32), pa.int32()),
            "h": pa.array(h.astype(np.int32), pa.int32()),
        }
    )


_DOC_CORE = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "join", "sort", "shuffle", "block", "index",
    "read", "write", "filter", "group", "count", "sum", "spill", "actor",
    "task", "plan", "stage", "stream", "arrow", "pool", "queue", "store",
    "cache", "page", "disk", "net", "cpu", "ram", "node",
]
_DOC_LANGS = ["en", "es", "de", "fr", "zh"]
_DOC_SOURCES = ["web", "wiki", "forum", "docs"]


def docs_block(idx: np.ndarray, n_total: int, mean_tokens: int = 50,
               tail_every: int = 6) -> pa.Table:
    """Deterministic document rows with the testdata schema
    (doc_id, text, lang, source, n_chars) for corpus-scale probes.

    Web-corpus-shaped on the axes the text family stresses:
    - a Zipf-ish CORE vocabulary plus a LONG TAIL of per-corpus words
      ("t<hex>", ~1 tail word per ``tail_every`` tokens, tail-vocab size
      ∝ corpus size) — so distinct-word tables grow with the corpus the
      way Heaps' law says they do, which is exactly what the BPE /
      vocab-join driver-RSS probes need to exercise;
    - a constant planted-duplicate RATE, not constant group size: every
      17th doc re-renders its predecessor (same contract as
      ``images_block``), so dedup pair volume stays linear at any scale.

    Counter-hash deterministic (no RNG state): identical at any batch
    partitioning."""
    idx = np.asarray(idx, dtype=np.int64)
    content_idx = np.where((idx % 17 == 0) & (idx > 0), idx - 1, idx)
    lens = (
        mean_tokens // 2
        + (_splitmix64(content_idx.astype(np.uint64) ^ _U64(70))
           % _U64(mean_tokens)).astype(np.int64)
    )
    texts: list = [None] * len(idx)
    core = np.array(_DOC_CORE, dtype=object)
    for i, (ci, ln) in enumerate(zip(content_idx, lens)):
        pos = np.arange(ln, dtype=np.uint64)
        h = _splitmix64(pos * _U64(0x9E3779B97F4A7C15) ^ _U64(int(ci) * 2654435761 + 71))
        # Zipf-ish core draw: square the uniform so low ranks dominate
        u = h.astype(np.float64) / 2.0**64
        ranks = (u * u * len(core)).astype(np.int64)
        toks = core[ranks].copy()
        tail = np.flatnonzero(pos % _U64(tail_every) == _U64(tail_every - 1))
        if tail.size:
            # tail-word ids spread over a corpus-proportional domain
            tw = _splitmix64(h[tail]) % _U64(max(n_total // 2, 1))
            toks[tail] = np.array(
                [f"t{int(v):x}" for v in tw], dtype=object
            )
        texts[i] = " ".join(toks.tolist())
    return pa.table(
        {
            "doc_id": pa.array(idx),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(_pick(_DOC_LANGS, content_idx, 72), pa.string()),
            "source": pa.array(_pick(_DOC_SOURCES, content_idx, 73), pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
