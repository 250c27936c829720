"""Flagship conflation pipeline (reference lifecycle §3.1, Ray-Data-first).

    read OSM + Overture
      → [Overture] normalize tags once per place (stateless map_batches)
      → [Overture] k-ring-1 cell replication   (vectorized map_batches)
      → [OSM]      name filter + cell encode    (vectorized map_batches)
      → union → groupby(bucket) → match_bucket  (the only shuffle)
      → match table (osm_id, overture_id, lon, lat, distance_m,
                     similarity, overture_tags)

Scale notes: the single wide op is the bucket groupby; bucket count is
chosen ≈ 4× the CPU count (configurable) so groups are balanced and each is
processed by one vectorized kernel call. Everything else is embarrassingly
parallel map_batches over zero-copy Arrow. Nothing materializes the full
dataset driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.cellindex import encode_cells_batch, replicate_kring_batch
from ..stages.matcher import MATCH_SCHEMA, match_bucket
from ..stages.normalize import (normalize_overture_batch,
                                normalize_tags_batch, overture_join_fields)

# Whether deferred tag normalization pays off is governed by MATCH
# SELECTIVITY, not input size (measured, GRAFT_SCALE=30, 9M×10.3M,
# 4.29M matches — a match-DENSE corpus at ~42% of the index): deferred
# 418 s / 17.9 GiB peak store vs hoisted 326 s / 21.8 GiB. The deferral
# sheds the ~200 B/row tags payload from the big sort (−18% peak store —
# it extends this box's spill boundary from ~scale-50 to ~scale-62) and
# cuts tag CPU to |matched|, but its fill JOIN scales with |matches|, so
# on dense corpora it loses wall time. Real-world conflation is sparse
# (reference corpus: ~2.3k OSM names vs 100k+ places ⇒ ~1% selectivity),
# where both terms favor deferral — callers there pass defer_tags=True
# (or set GRAFT_DEFER_TAGS=1 for bench probes).

# Unified schema both join sides are projected to before the union.
_JOIN_COLS = ["id", "name", "housenumber", "lon", "lat", "tags_json",
              "x", "y", "cell", "bucket", "side"]


def _salted_buckets(batch: pa.Table, salt: int, spread: bool) -> pa.Table:
    """Hot-cell salting (SURVEY.md §7.2-11). With ``salt`` S > 1 the bucket
    space becomes bucket·S + s:

    - probe rows (spread=True) each land in ONE salted bucket, chosen by a
      deterministic hash of the row id → a hot cell's probes split across S
      tasks;
    - index rows (spread=False) are replicated to ALL S salted buckets so
      every probe still sees every candidate. Cost: index shuffle volume ×S
      — enable only for corpora with known hot cells.
    """
    import numpy as np

    from ..stages.groupops import hash_columns

    if salt <= 1:
        return batch
    bucket = batch["bucket"].to_numpy(zero_copy_only=False)
    if spread:
        s = (hash_columns(batch, ["id"]) % np.uint64(salt)).astype(np.int64)
        new_bucket = bucket * salt + s
        return batch.set_column(
            batch.schema.get_field_index("bucket"), "bucket", pa.array(new_bucket)
        )
    take = np.repeat(np.arange(batch.num_rows, dtype=np.int64), salt)
    rep = batch.take(pa.array(take))
    s = np.tile(np.arange(salt, dtype=np.int64), batch.num_rows)
    new_bucket = rep["bucket"].to_numpy(zero_copy_only=False) * salt + s
    return rep.set_column(
        rep.schema.get_field_index("bucket"), "bucket", pa.array(new_bucket)
    )


def _osm_join_side(batch: pa.Table, num_buckets: int) -> pa.Table:
    """OSM probe side: drop no-name rows (match.py:203-206), cell-encode and
    REPLICATE ×9 to the k-ring-1 cells. The probe side is the narrow one
    (no tag payload), so it — not the Overture side — pays the replication:
    shuffle volume stays ≈ |osm|·9·~80 B + |overture|·1·full-payload."""
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.is_valid(batch["name"]), pc.not_equal(pc.fill_null(batch["name"], ""), "")
    )
    batch = batch.filter(mask)
    compact = pa.table(
        {
            "id": batch["osm_id"],
            "name": batch["name"],
            "housenumber": batch["addr_housenumber"],
            "lon": batch["lon"],
            "lat": batch["lat"],
        }
    )
    rep = replicate_kring_batch(compact, num_buckets)
    n = rep.num_rows
    return pa.table(
        {
            "id": rep["id"],
            "name": rep["name"],
            "housenumber": rep["housenumber"],
            "lon": rep["lon"],
            "lat": rep["lat"],
            "tags_json": pa.nulls(n, pa.string()),
            "x": rep["x"],
            "y": rep["y"],
            "cell": rep["cell"],
            "bucket": rep["bucket"],
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        }
    )


def _overture_join_side(batch: pa.Table, num_buckets: int,
                        defer_tags: bool = False) -> pa.Table:
    """Overture index side, single copy, own cell. Hoisted mode runs the
    full M10–M15 tag pipeline here (one pass, tags ride the shuffle);
    deferred mode extracts only the join fields (name + housenumber — the
    M16 veto input) and the tag pipeline runs POST-match over matched
    candidates (see conflate()), so ``tags_json`` crosses as nulls."""
    if defer_tags:
        compact = overture_join_fields(batch)
    else:
        compact = normalize_overture_batch(batch)
    enc = encode_cells_batch(compact, num_buckets)
    n = enc.num_rows
    return pa.table(
        {
            "id": enc["id"],
            "name": enc["name"],
            "housenumber": enc["housenumber"],
            "lon": enc["lon"],
            "lat": enc["lat"],
            "tags_json": (pa.nulls(n, pa.string()) if defer_tags
                          else enc["tags_json"]),
            "x": enc["x"],
            "y": enc["y"],
            "cell": enc["cell"],
            "bucket": enc["bucket"],
            "side": pa.array(np.ones(n, dtype=np.int8)),
        }
    )


def _auto_salt(
    osm_ds: "ray.data.Dataset",
    num_buckets: int,
    threshold: float = 4.0,
    max_salt: int = 8,
) -> int:
    """SURVEY §4 skew pre-pass: per-BUCKET probe-row histogram from a
    lon/lat-only projection (Ray's groupby().count() partial-aggregates, so
    only ≤ num_buckets (bucket, count) rows ever move), then

        salt = ceil(max_count / mean_count)  if the ratio trips
        ``threshold``, clipped to ``max_salt``; else 1.

    The histogram intentionally counts PRE-replication own-cell buckets:
    the ×9 k-ring replication multiplies every bucket's volume about
    equally, so the skew RATIO — the thing salting responds to — is the
    same, and the pre-pass stays one cheap projection of the probe side."""
    from ..stages.cellindex import bucket_of
    from ..cell import cell_id
    from ..geo import mercator_xy

    def tag(batch: pa.Table) -> pa.Table:
        x, y = mercator_xy(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"bucket": pa.array(bucket_of(cell_id(x, y), num_buckets))})

    rows = (
        osm_ds.select_columns(["lon", "lat"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .count()
        .take_all()
    )
    if not rows:
        return 1
    counts = np.array([r["count()"] for r in rows], dtype=np.float64)
    mean = counts.sum() / max(num_buckets, 1)
    ratio = counts.max() / max(mean, 1e-9)
    if ratio <= threshold:
        return 1
    return int(min(max_salt, np.ceil(ratio)))


def conflate(
    osm_ds: "ray.data.Dataset",
    overture_ds: "ray.data.Dataset",
    num_buckets: int | None = None,
    salt: "int | None" = None,
    defer_tags: "bool | None" = None,
) -> "ray.data.Dataset":
    """The J1 spatial+fuzzy conflation join as a Ray Data pipeline.

    SIZING RULE: ``num_buckets`` ∝ total cluster cores (≈ 2× the CPUs
    actually available to the shuffle). The default (None) applies the
    rule automatically from ``ray.cluster_resources()`` at call time, so
    the same code sizes itself on a 4-CPU test session and a 256-node
    cluster; pass an explicit value to pin it. Buckets are the unit of
    join parallelism AND of per-task memory: with a fixed count on a
    growing corpus, per-bucket groups grow linearly and eventually blow
    task heaps; with buckets ≫ cores, the groupby pays per-group
    scheduling for no speedup. Bucket count never changes RESULTS (the
    join is partition-agnostic; pinned by tests), only the physical plan.

    ``salt`` > 1 splits every bucket S ways (probe rows spread, index rows
    replicated ×S) — the straggler mitigation for skewed urban cells.
    ``salt=None`` (default) AUTO-SELECTS it from the ``_auto_salt`` skew
    pre-pass: a cheap probe-side bucket histogram; salting kicks in only
    when one bucket holds > 4× the mean. Pass ``salt=1`` to force it off
    (skips the pre-pass entirely).

    ``defer_tags`` picks WHERE the M10–M15 tag pipeline runs. False
    (default, hoisted): once per place, pre-join — tags ride the shuffle;
    zero extra stages. True (deferred): post-match over MATCHED candidates
    only (the reference's own evaluation point, match.py:250-393) via a
    Bloom-filtered index re-read + hash join — the big sort sheds the
    ~200 B/row tags payload (−18% peak object store measured at
    GRAFT_SCALE=30) and tag CPU drops to |matched|, at the price of a fill
    join that scales with |matches|. Defer on SPARSE-match corpora (the
    real-world case); keep hoisted when a large fraction of places match
    (see the selectivity note above the module constants)."""
    if num_buckets is None:
        import ray as _ray

        num_buckets = max(16, 2 * int(_ray.cluster_resources().get("CPU", 32)))
    if salt is None:
        salt = _auto_salt(osm_ds, num_buckets)
    if defer_tags is None:
        defer_tags = False
    probe = osm_ds.map_batches(
        _osm_join_side,
        fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    index = overture_ds.map_batches(
        _overture_join_side,
        fn_kwargs={"num_buckets": num_buckets, "defer_tags": defer_tags},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if salt > 1:
        probe = probe.map_batches(
            lambda b: _salted_buckets(b, salt, spread=True), batch_format="pyarrow"
        )
        index = index.map_batches(
            lambda b: _salted_buckets(b, salt, spread=False), batch_format="pyarrow"
        )
    # Materialize the shuffle boundary: streaming two task-pool branches
    # through a union straight into the sort-based groupby can LIVELOCK
    # once the branches outgrow the executor's buffer budget (measured at
    # GRAFT_SCALE=30 — 91M union rows: the overture map backpressured on
    # outputs, the Sort waiting on the union to finish, the scheduler
    # thread spinning at 100% with every worker idle; GRAFT_SCALE=10 fit
    # the budget and streamed fine). The sort materializes its input in
    # the object store anyway, so this adds no asymptotic memory — it
    # only breaks the executor's buffer cycle.
    both = probe.materialize().union(index.materialize())
    matched = both.groupby("bucket").map_groups(
        match_bucket, batch_format="pyarrow"
    )
    if not defer_tags:
        return matched
    # narrow (~60 B/row); feeds the bloom build AND the join
    return _fill_tags(matched.materialize(), overture_ds, num_buckets)


def _fill_tags(matches0, overture_ds, num_buckets: int):
    """Post-match tag fill: run M10–M15 over MATCHED candidates only and
    join the result back. Mirrors the reference (tags are computed per
    surviving candidate, match.py:250-393) and keeps the fat ``tags_json``
    payload out of the conflation all-to-all.

    Scale plan: a distributed-built Bloom filter of matched overture-id
    HASHES broadcasts once (fixed MB regardless of corpus size — no driver
    key-set materialization); the places table re-reads through it, so
    only ~|matched| rows (+ ε false positives, dropped by the exact inner
    join) pay the Python tag pipeline and the small tag-fill shuffle."""
    import pyarrow.compute as pc

    from ..stages.groupops import hash_columns
    from ..stages.joins import BloomFilter, bucket_hash_join, build_key_bloom

    if matches0.count() == 0:
        return matches0

    def with_hash(on: str):
        def _h(batch: pa.Table) -> pa.Table:
            h = hash_columns(batch, [on]).view(np.int64)
            return batch.append_column("__kh", pa.array(h))

        return _h

    bloom = build_key_bloom(
        matches0.map_batches(with_hash("overture_id"), batch_format="pyarrow"),
        "__kh",
    )

    import ray as _ray

    from ..stages.enrich import _cached_get

    bloom_ref = _ray.put(bloom)

    def bloom_filt(batch: pa.Table) -> pa.Table:
        bf: BloomFilter = _cached_get(bloom_ref)  # one deserialize/worker
        h = hash_columns(batch, ["id"]).view(np.int64)
        return batch.filter(pa.array(bf.might_contain(h)))

    tags_tbl = (
        overture_ds.map_batches(bloom_filt, batch_format="pyarrow")
        .map_batches(normalize_tags_batch, batch_format="pyarrow")
        .map_batches(
            lambda b: pa.table(
                {"__tid": b["id"], "__tags": b["tags_json"]}
            ),
            batch_format="pyarrow",
        )
    )
    # coalesce before the wide op (CLAUDE.md rule) AND materialize both
    # join inputs: bucket_hash_join's schema() probes would otherwise
    # re-execute these lazy chains (measured 0.8 s → 7.7 s on the same
    # join when fed lazily)
    nparts = max(8, num_buckets // 4)
    joined = bucket_hash_join(
        matches0.map_batches(
            lambda b: b.drop_columns(["overture_tags"]), batch_format="pyarrow"
        ).repartition(nparts).materialize(),
        tags_tbl.repartition(nparts).materialize(),
        left_on="overture_id",
        right_on="__tid",
        num_buckets=num_buckets,
        how="inner",
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "osm_id": batch["osm_id"].cast(pa.string()),
                "overture_id": batch["overture_id"].cast(pa.string()),
                "lon": batch["lon"].cast(pa.float64()),
                "lat": batch["lat"].cast(pa.float64()),
                "distance_m": batch["distance_m"].cast(pa.float64()),
                "similarity": batch["similarity"].cast(pa.float64()),
                "overture_tags": batch["__tags"].cast(pa.string()),
            },
            schema=MATCH_SCHEMA,
        )

    return joined.map_batches(project, batch_format="pyarrow")


# --- synthetic corpus as Ray Datasets (driven by the testdata tables) ------


def synth_osm_dataset(n: int, override_num_blocks: int | None = None) -> "ray.data.Dataset":
    from ..synth import osm_block

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: osm_block(b["id"], n_total=n), batch_format="pyarrow"
    )


def synth_overture_dataset(n_osm: int, override_num_blocks: int | None = None) -> "ray.data.Dataset":
    from ..synth import overture_block

    ds = ray.data.range(n_osm, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: overture_block(b["id"], n_total=n_osm), batch_format="pyarrow"
    )


def synth_images_dataset(n: int, override_num_blocks: int | None = None) -> "ray.data.Dataset":
    from ..synth import images_block

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: images_block(b["id"], n_total=n), batch_format="pyarrow",
        batch_size=512,
    )


def flagship_matches(sf_dir: str, num_buckets: int = 64) -> "ray.data.Dataset":
    """entry()'s pipeline: corpus size + row identity come from the driver
    testdata (customer.parquet keys), geometry/attributes from the
    deterministic synthesizer, then the full conflation join."""
    from ..synth import osm_block, overture_block

    from ..sources import read_parquet_clean

    # raw count first (parquet-metadata fast path), clean read for the data
    n = ray.data.read_parquet(f"{sf_dir}/customer.parquet").count()
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def to_osm(batch: pa.Table) -> pa.Table:
        idx = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return osm_block(idx, n_total=n)

    def to_overture(batch: pa.Table) -> pa.Table:
        idx = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return overture_block(idx, n_total=n)

    osm_ds = cust.map_batches(to_osm, batch_format="pyarrow")
    ovt_ds = cust.map_batches(to_overture, batch_format="pyarrow")
    return conflate(osm_ds, ovt_ds, num_buckets=num_buckets)
