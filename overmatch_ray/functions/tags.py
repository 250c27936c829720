"""Tag-normalization library: M6–M16 of SURVEY.md §2.2.

Reimplements (behavior-compatible, written fresh) the reference's candidate
tag pipeline that produces each match's ``overture_tags`` payload:

- URL domain lowercasing              (/root/reference/scripts/match.py:19-33)
- tracking-parameter stripping        (match.py:36-49, 63-86)
- website blocklist filter            (match.py:316-368)
- toll-free phone filter              (match.py:376-390)
- Overture→OSM tag schema mapping     (match.py:286, the observed subset of
  the public ``overturetoosm.process_place`` behavior: name/brand/category/
  address/phone/website/social tags, validated against data/matches.jsonl)
- US street-address splitting         (match.py:289-298, observed subset of
  public ``atlus.get_address``: housenumber + expanded street + unit)
- phone normalization                 (match.py:304-314, ``atlus.get_phone``:
  NANP → "+1 AAA-BBB-CCCC")
- key drops + bad-data fixes          (match.py:253-284, 392-393)

The regex pattern, blocklist domains and toll-free prefixes are conformance
constants copied as *data* from the reference so outputs match row-for-row.

Everything here is per-Overture-row (NOT per candidate pair): the engine
normalizes each Overture place exactly once in a stateless ``map_batches``
stage before the spatial join — equivalent output, ~|matches|× less work
than the reference's per-pair evaluation.
"""

from __future__ import annotations

import re

# --- M7: tracking-parameter stripper (pattern semantics = match.py:36-49) ---
_TRACKING_RE = re.compile(
    r"&?(?:"
    r"utm_[^&=]*"
    r"|[a-z_]*(?:id|token|source|ref)"
    r"|_ga"
    r"|hsCtaTracking"
    r"|hsa_[^&=]*"
    r"|_hs[^&=]*"
    r"|ref_?"
    r"|lipi"
    r")(=[^&=]+)"
)
_QMARK_AMP_RE = re.compile(r"\?&")


def strip_tracking_params(url: str) -> str:
    """Drop tracking query params (M7, match.py:63-86 semantics)."""
    if not url:
        return url
    cleaned = _TRACKING_RE.sub("", url)
    return _QMARK_AMP_RE.sub("?", cleaned.rstrip("&?"))


def lowercase_url(url: str) -> str:
    """Lowercase scheme+domain, preserve path case (M6, match.py:19-33)."""
    if "//" in url:
        scheme, rest = url.split("//", 1)
        scheme += "//"
    else:
        scheme, rest = "", url
    domain, _, path = rest.partition("/")
    return scheme + domain.lower() + (("/" + path) if path else "")


# --- M8: website blocklist (conformance data, match.py:318-366) ---
WEBSITE_BLOCKLIST = (
    "ubereats.com", "doordash.com", "grubhub.com",
    "opentable.com", "resy.com",
    "google.com", "g.page", "apple.com", "yelp.com", "groupon.com",
    "eventbrite.com", "musthavemenus.com", "parkopedia.com",
    "toasttab.com", "dineblast.com", "thanx.com", "order.online",
    "digitalpour.com", "waitrapp.com", "culinarycloud.co",
    "bit.ly", "business.site", "spotify.com", "facebook.com",
    "instagram.com", "twitter.com", "x.com", "whitepages.com",
    "yellowpages.com", "yahoo.com", "mapquest.com", "glassdoor.com",
    "restaurant.com", "cortera.com", "finduslocal.com", "redfin.com",
    "dandb.com", "chamberofcommerce.com", "wikidot.com", "...", '"',
)

# --- M9: toll-free prefixes (conformance data, match.py:379-388) ---
# EXACT reference semantics: substring match of the dash-formatted prefixes
# against the final phone tag. The reference's own normalizer emits
# "+1 800-…" (space), so this check only fires on raw-format leftovers
# where normalization failed — and the golden matches.jsonl indeed CONTAINS
# normalized toll-free numbers ("+1 877-…"), confirming the literal
# behavior (tests/test_reference_data.py pins this).
TOLL_FREE_PREFIXES = ("+1-800", "+1-888", "+1-877", "+1-866", "+1-855",
                      "+1-844", "+1-833")


def clean_website(url: str) -> str | None:
    """M8 + M6/M7 combined exactly as applied at match.py:316-374:
    blocklisted → None (tag dropped); else strip-tracking → lowercase."""
    if any(k in url for k in WEBSITE_BLOCKLIST):
        return None
    if not url:
        return url
    return lowercase_url(strip_tracking_params(url).replace("?&", "?").rstrip("?& "))


def is_toll_free(phone: str) -> bool:
    return any(p in phone for p in TOLL_FREE_PREFIXES)


# --- M15: phone normalizer (atlus.get_phone observed behavior) -------------
_DIGITS_RE = re.compile(r"\d")


def normalize_phone(phone: str) -> str | None:
    """NANP number → '+1 202-544-4008' (format seen throughout
    data/matches.jsonl). Returns None when unparseable — the caller keeps
    the original tag, mirroring the reference's ValueError path
    (match.py:304-314)."""
    digits = "".join(_DIGITS_RE.findall(phone))
    if len(digits) == 11 and digits.startswith("1"):
        digits = digits[1:]
    if len(digits) != 10:
        return None
    return f"+1 {digits[0:3]}-{digits[3:6]}-{digits[6:10]}"


# --- M14: street-address splitter (atlus.get_address observed subset) ------
# Abbreviation expansion validated against golden output
# ("305 Pennsylvania Ave SE" → housenumber=305,
#  street="Pennsylvania Avenue Southeast").
STREET_ABBREV = {
    "st": "Street", "st.": "Street",
    "ave": "Avenue", "ave.": "Avenue", "av": "Avenue",
    "rd": "Road", "rd.": "Road",
    "blvd": "Boulevard", "blvd.": "Boulevard",
    "dr": "Drive", "dr.": "Drive",
    "ln": "Lane", "ln.": "Lane",
    "ct": "Court", "ct.": "Court",
    "pl": "Place", "pl.": "Place",
    "hwy": "Highway", "hwy.": "Highway",
    "pkwy": "Parkway", "pkwy.": "Parkway",
    "sq": "Square", "sq.": "Square",
    "ter": "Terrace", "ter.": "Terrace",
    "cir": "Circle", "cir.": "Circle",
    "nw": "Northwest", "ne": "Northeast", "sw": "Southwest", "se": "Southeast",
    "n": "North", "s": "South", "e": "East", "w": "West",
    "n.": "North", "s.": "South", "e.": "East", "w.": "West",
}
_UNIT_MARKERS = {"unit", "ste", "ste.", "suite", "apt", "apt.", "#"}
_HOUSENUMBER_RE = re.compile(r"^\d+[A-Za-z]?$")


def split_address(freeform: str) -> dict[str, str]:
    """'305 Pennsylvania Ave SE Unit 4' →
    {'addr:housenumber': '305', 'addr:street': 'Pennsylvania Avenue
    Southeast', 'addr:unit': '4'}.

    Raises ValueError when no leading housenumber — the caller then keeps
    the unsplit tags (reference behavior, match.py:289-298)."""
    tokens = freeform.replace(",", " ").split()
    if not tokens or not _HOUSENUMBER_RE.match(tokens[0]):
        raise ValueError(f"no housenumber in {freeform!r}")
    out = {"addr:housenumber": tokens[0]}
    street_tokens: list[str] = []
    i = 1
    while i < len(tokens):
        tok = tokens[i]
        low = tok.lower()
        if low in _UNIT_MARKERS:
            if low == "#" and len(tok) > 1:
                out["addr:unit"] = tok[1:]
                i += 1
            elif i + 1 < len(tokens):
                out["addr:unit"] = tokens[i + 1]
                i += 2
            else:
                i += 1
            continue
        if low.startswith("#") and len(tok) > 1:
            out["addr:unit"] = tok[1:]
            i += 1
            continue
        street_tokens.append(STREET_ABBREV.get(low, tok.capitalize() if tok.islower() else tok))
        i += 1
    if street_tokens:
        out["addr:street"] = " ".join(street_tokens)
    return out


# --- M13: Overture category → OSM tags -------------------------------------
# Generated from the taxonomy branch rules in functions/categories.py
# (anchored by the full tagset census of the reference's golden
# data/matches.jsonl output — see build_category_tags for the rules).
from .categories import build_category_tags

CATEGORY_TAGS: dict[str, dict[str, str]] = build_category_tags()


def map_place_to_osm_tags(candidate: dict) -> dict[str, str]:
    """Overture place record → OSM-schema tag dict (M13; the observed subset
    of ``overturetoosm.process_place``, match.py:286). Input is a plain dict
    with the Overture nested fields (names/categories/addresses/phones/
    websites/socials/brand). Emits addr:full / addr:country / source which
    downstream steps pop, to mirror the reference's intermediate shape."""
    tags: dict[str, str] = {}

    names = candidate.get("names") or {}
    if names.get("primary"):
        tags["name"] = names["primary"]

    cats = candidate.get("categories") or {}
    primary = cats.get("primary")
    if primary:
        tags.update(CATEGORY_TAGS.get(primary, {}))

    brand = candidate.get("brand") or {}
    brand_names = brand.get("names") or {}
    if brand_names.get("primary"):
        tags["brand"] = brand_names["primary"]

    addrs = candidate.get("addresses") or []
    if addrs:
        a = addrs[0] or {}
        if a.get("freeform"):
            tags["addr:full"] = a["freeform"]
        if a.get("locality"):
            tags["addr:city"] = a["locality"]
        if a.get("region"):
            tags["addr:state"] = a["region"]
        if a.get("postcode"):
            tags["addr:postcode"] = a["postcode"]
        if a.get("country"):
            tags["addr:country"] = a["country"]

    phones = candidate.get("phones") or []
    if phones and phones[0]:
        tags["phone"] = phones[0]

    websites = candidate.get("websites") or []
    if websites and websites[0]:
        tags["website"] = websites[0]

    for social in candidate.get("socials") or []:
        if not social:
            continue
        if "facebook.com" in social and "contact:facebook" not in tags:
            tags["contact:facebook"] = social
        elif ("twitter.com" in social or "//x.com" in social) and (
            "contact:twitter" not in tags
        ):
            tags["contact:twitter"] = social

    sources = candidate.get("sources") or []
    if sources and (sources[0] or {}).get("update_time"):
        tags["source"] = sources[0]["update_time"]

    return tags


def repair_update_time(ts: str) -> str:
    """Bad-data fix M12: '…00:00:00.000' → '…00:00:00Z' (match.py:279-284)."""
    if ts and "00:00:00.000" in ts:
        return ts.replace("00.000", "00Z")
    return ts


def normalize_candidate(candidate: dict) -> dict[str, str]:
    """The full per-candidate tag pipeline M10–M15 (everything except the
    pair-level housenumber veto M16), in reference order
    (match.py:253-393):

    map to OSM tags → split addr:full → normalize phone → website
    blocklist/cleanup → drop toll-free phone → drop addr:country/addr:full/
    source.
    """
    if "sources" in candidate and candidate["sources"]:
        candidate = dict(candidate)
        candidate["sources"] = [
            {**(s or {}), "update_time": repair_update_time((s or {}).get("update_time", ""))}
            for s in candidate["sources"]
        ]
    tags = map_place_to_osm_tags(candidate)

    full = tags.get("addr:full", "")
    if full:
        try:
            tags.update(split_address(full))
        except ValueError:
            pass

    phone = tags.get("phone", "")
    if phone:
        normalized = normalize_phone(phone)
        if normalized is not None:
            tags["phone"] = normalized

    if "website" in tags:
        cleaned = clean_website(tags["website"])
        if cleaned is None:
            tags.pop("website")
        elif tags["website"]:
            tags["website"] = cleaned

    if "phone" in tags and is_toll_free(tags["phone"]):
        tags.pop("phone")

    for k in ("addr:country", "addr:full", "source"):
        tags.pop(k, None)
    return tags
