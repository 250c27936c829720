"""The tiling/publish lifecycle (reference §3.2, run_pmtiles) and the
checkpointed conflation run (the `ray job submit` batch with resume).

    matches → tracking enrichment (J2) → tag flatten (M17)
            → deterministic tile pyramid (S15/O6)
            → resumable partitioned tile sink (one partition per zoom)

    conflate → bucket column → resumable partitioned match sink
            (kill the job, rerun, completed buckets are skipped — the
             engine-side analog of load_matches.py --skip-existing)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.enrich import enrich_matches, flatten_tags_batch
from ..stages.tiles import build_tiles
from ..state.checkpoint import write_partitioned_resumable


def publish_tiles(
    matches_ds,
    osm_tracking: dict,
    overture_tracking: dict,
    out_dir: str,
    zooms: list[int] = (8, 12, 14),
    max_per_tile: int = 500,
):
    """Returns the receipt dataset of newly-written zoom partitions."""
    enriched = enrich_matches(matches_ds, osm_tracking, overture_tracking)
    flat = enriched.map_batches(flatten_tags_batch, batch_format="pyarrow")
    tiles = build_tiles(flat, zooms=list(zooms), max_per_tile=max_per_tile)
    return write_partitioned_resumable(tiles, out_dir, "zoom")


def conflate_checkpointed(osm_ds, overture_ds, out_dir: str,
                          num_buckets: int = 64, num_parts: int = 16):
    """Flagship join with a resumable partitioned sink: output partition key
    is a stable hash of osm_id (NOT the join bucket — the sink key must be
    derivable from output rows alone so resume filtering is exact)."""
    from ..stages.groupops import hash_columns
    from .conflate import conflate

    matches = conflate(osm_ds, overture_ds, num_buckets=num_buckets)

    def part(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch, ["osm_id"]) % np.uint64(num_parts)
        return batch.append_column("part", pa.array(h.astype(np.int64)))

    return write_partitioned_resumable(
        matches.map_batches(part, batch_format="pyarrow"), out_dir, "part"
    )
