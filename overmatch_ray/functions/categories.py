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
