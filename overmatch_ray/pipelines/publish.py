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
    return write_partitioned_resumable(
        tiles, out_dir, "zoom",
        scheme=f"tiles/zoom-literal/v1/zooms={sorted(set(int(z) for z in zooms))}",
    )


def hilbert_partition(batch: pa.Table, num_parts: int,
                      lon_col: str = "lon", lat_col: str = "lat") -> pa.Table:
    """Assign each row to one of ``num_parts`` CONTIGUOUS Hilbert-curve
    ranges over the mercator square (cell.hilbert_key, order 16). Rows that
    are spatially close share a partition, so a bbox consumer prunes to the
    few partitions whose Hilbert range intersects the box (measured in
    tests/test_postmatch.py::TestHilbertPartitioning) — unlike a hash of
    osm_id, which scatters every box over ALL partitions. Equal d-ranges
    trade balance for locality on clustered data; raise num_parts (ranges
    stay contiguous) if partition-size variance matters more."""
    from ..cell import hilbert_key
    from ..geo import mercator_xy

    x, y = mercator_xy(
        batch[lon_col].to_numpy(zero_copy_only=False),
        batch[lat_col].to_numpy(zero_copy_only=False),
    )
    d = hilbert_key(x, y)  # uint64 in [0, 2^32)
    part = (d * np.uint64(num_parts)) >> np.uint64(32)
    return batch.append_column("part", pa.array(part.astype(np.int64)))


def conflate_checkpointed(osm_ds, overture_ds, out_dir: str,
                          num_buckets: int = 64, num_parts: int = 16):
    """Flagship join with a resumable partitioned sink: output partition key
    is the row's Hilbert range (locality-preserving, SURVEY §2.4-J1; NOT the
    join bucket — the sink key must be derivable from output rows alone so
    resume filtering is exact, and lon/lat are deterministic outputs)."""
    from .conflate import conflate

    matches = conflate(osm_ds, overture_ds, num_buckets=num_buckets)
    return write_partitioned_resumable(
        matches.map_batches(
            lambda b: hilbert_partition(b, num_parts), batch_format="pyarrow"
        ),
        out_dir,
        "part",
        scheme=f"conflate/hilbert16-range/v2/parts={num_parts}",
    )
