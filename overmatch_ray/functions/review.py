"""Review work-set semantics (J3/J4/D3/O4) — the engine-side equivalent of
the frontend filter equation (/root/reference/front_end/src/App.tsx:128-156):

    work set = OSM elements with ≥1 match
               − seen − uploaded
               − elements ALL of whose matches' overture_ids are skipped

plus the reviewer-order shuffle (O4, seeded Fisher-Yates equivalent via
``Dataset.random_shuffle``) and the distinct-overture-id union (A5/D2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def review_work_set(
    matches_ds,
    seen: set[str],
    uploaded: set[str],
    skipped_overture: set[str],
    num_buckets: int = 16,
):
    """→ Dataset of (osm_id, n_matches, n_unskipped) for elements still
    needing review. Broadcast the three small sets; per-element ALL-skipped
    test needs the element's full match list → bucketed group apply."""
    import ray

    from ..stages.groupops import bucketed_group_apply

    refs = ray.put((frozenset(seen), frozenset(uploaded), frozenset(skipped_overture)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        seen_, uploaded_, skipped_ = ray.get(refs)
        g = g[~g["osm_id"].isin(seen_) & ~g["osm_id"].isin(uploaded_)]
        if g.empty:
            # "string" (not object) so the empty frame converts to an Arrow
            # string column, matching the non-empty blocks' schema
            return pd.DataFrame(
                {"osm_id": pd.Series(dtype="string"),
                 "n_matches": pd.Series(dtype=np.int64),
                 "n_unskipped": pd.Series(dtype=np.int64)}
            )
        g = g.assign(unskipped=~g["overture_id"].isin(skipped_))
        agg = g.groupby("osm_id", sort=False).agg(
            n_matches=("overture_id", "size"), n_unskipped=("unskipped", "sum")
        )
        agg = agg[agg["n_unskipped"] > 0]  # J4: drop ALL-skipped elements
        out = agg.reset_index()
        out["n_unskipped"] = out["n_unskipped"].astype(np.int64)
        return out

    return bucketed_group_apply(
        matches_ds.select_columns(["osm_id", "overture_id"]),
        ["osm_id"],
        per_bucket,
        num_buckets=num_buckets,
    )


def review_order(work_set_ds, seed: int = 42):
    """O4: deterministic seeded shuffle of the work set."""
    return work_set_ds.random_shuffle(seed=seed)


def distinct_overture_ids(matches_ds):
    """A5/D2: the set union of matched overture ids."""
    return matches_ds.unique("overture_id")
