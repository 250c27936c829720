"""Rows-only queries: pipelines whose semantics SQL can't express (spatial
fuzzy conflation, sketch-based dedup, LSH ANN, image decode). The driver
records a rows-only check for these; their correctness is pinned by the
test suite instead (brute-force oracle in tests/reference_oracle.py,
golden unit tests)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..sources import read_parquet_clean as _rpq


def q_conflate_matches(sf_dir: str):
    """The flagship J1 conflation join (tested against tests/reference_oracle)."""
    from .conflate import flagship_matches

    return flagship_matches(sf_dir)


def q_conflate_merged(sf_dir: str):
    """A1/O1: per-osm_id match collection + closest-wins merge + quality."""
    from ..stages.enrich import merge_matches
    from .conflate import flagship_matches

    return merge_matches(flagship_matches(sf_dir))


def q_flagship_tiles(sf_dir: str):
    """S15/O6: deterministic tile pyramid over the merged match features."""
    from ..stages.tiles import build_tiles
    from .conflate import flagship_matches

    return build_tiles(flagship_matches(sf_dir), zooms=[8, 12, 14], max_per_tile=200)


def _images_ds(sf_dir: str):
    """Deterministic image corpus sized by the documents table (graft axis)."""
    from ..synth import images_block

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    # raw read for the size: parquet-metadata fast count, no data pass
    n = ray.data.read_parquet(f"{sf_dir}/documents.parquet").count()

    def to_images(batch: pa.Table) -> pa.Table:
        idx = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return images_block(idx, n_total=n)

    return docs.map_batches(to_images, batch_format="pyarrow", batch_size=256)


def q_images_validate(sf_dir: str):
    """M24: decode/validate actor pool over the image table; emits per-image
    validation + feature columns (bytes dropped from the result)."""
    from ..stages.images import decode_validate

    out = decode_validate(_images_ds(sf_dir), concurrency=2, batch_size=128)
    return out.drop_columns(["bytes"])


def q_phash_full(sf_dir: str):
    """D4: exact perceptual-hash dedup WITH the phash column (the
    SQL-oracled ``phash_dedup`` projects it away — this rows-only
    variant keeps the sketch itself for downstream joins)."""
    from ..stages.images import dedup_exact

    return dedup_exact(_images_ds(sf_dir))


def q_image_neardup_pairs(sf_dir: str):
    """D4 near-dup: banded-Hamming phash pairs."""
    from ..stages.images import near_dup_pairs

    return near_dup_pairs(_images_ds(sf_dir), max_hamming=6)


def q_minhash_est_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidates scored by the ESTIMATED Jaccard
    (matching-minhash fraction) — the sketch-only variant next to the
    SQL-oracled exact-verified ``minhash_pairs``. Rows-only: the
    estimate is a property of the signatures, not of the documents."""
    from ..stages.dedup import minhash_lsh_pairs
    from .corpus_queries import _derived_corpus

    return minhash_lsh_pairs(_derived_corpus(sf_dir), threshold=0.5)


def q_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_pairs
    from .corpus_queries import _derived_corpus

    return simhash_pairs(_derived_corpus(sf_dir), max_hamming=3)


def q_langid_docs(sf_dir: str):
    """Language-ID heuristic over documents (marker-vocabulary n-grams)."""
    from ..stages.textstats import langid_batch

    return (
        _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(langid_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "lang_pred"])
    )


def q_lsh_knn(sf_dir: str):
    """Approximate ANN (hyperplane-LSH buckets) — the scale path next to the
    exact brute-force knn_topk."""
    from ..stages.knn import lsh_topk

    emb = _rpq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow")]
    )
    return lsh_topk(emb, queries, k=5, n_planes=4)


def q_image_cells(sf_dir: str):
    """J6: image→cell assignment stats (images co-partitioned with features)."""
    from ray.data.aggregate import Count

    from ..stages.images import assign_cells

    ds = assign_cells(_images_ds(sf_dir), num_buckets=64)
    return ds.groupby("bucket").aggregate(Count(alias_name="n_images"))


def q_marked_counters(sf_dir: str):
    """A3: global marked counters over the tracking-enriched flagship
    output (deterministic tracking fixture: every 10th element marked)."""
    from ..stages.enrich import enrich_matches, marked_counters
    from .conflate import flagship_matches

    matches = flagship_matches(sf_dir)
    sample = matches.take(200)
    osm_track = {
        r["osm_id"]: ("2024-01-01T00:00:00Z", "2024-06-01T00:00:00Z")
        for i, r in enumerate(sample)
        if i % 10 == 0
    }
    ovt_track = {
        r["overture_id"]: ("2024-02-01T00:00:00Z", "2024-06-01T00:00:00Z")
        for i, r in enumerate(sample)
        if i % 7 == 0
    }
    return marked_counters(enrich_matches(matches, osm_track, ovt_track))


def q_pmtiles_archive(sf_dir: str):
    """S16/PMTiles: pack the flagship tile pyramid into one PMTiles v3
    archive (stages.pmtiles) and report per-zoom tile counts plus the
    archive checksum — deterministic for a given corpus."""
    import hashlib
    import os
    import tempfile

    from ray.data.aggregate import Count

    from ..stages.pmtiles import write_pmtiles
    from ..stages.tiles import build_tiles
    from .conflate import flagship_matches

    # materialize: the tile set is consumed twice (archive pack + per-zoom
    # counts) and is the small projected boundary, not the input
    tiles = build_tiles(
        flagship_matches(sf_dir), zooms=[8, 12], max_per_tile=200
    ).materialize()
    path = os.path.join(tempfile.gettempdir(), "overmatch_flagship.pmtiles")
    stats = write_pmtiles(tiles, path)
    per_zoom = tiles.groupby("zoom").aggregate(Count(alias_name="n_tiles"))
    sha = hashlib.sha256(open(path, "rb").read()).hexdigest()

    def attach(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "archive_sha256", pa.array([sha] * batch.num_rows)
        ).append_column(
            "archive_bytes",
            pa.array([stats["bytes"]] * batch.num_rows, pa.int64()),
        )

    return per_zoom.map_batches(attach, batch_format="pyarrow")


def q_ivf_knn(sf_dir: str):
    """IVF ANN top-k over the embeddings table (k-means coarse quantizer +
    nprobe search — stages.knn.ivf_topk; approximate, recall pinned by
    tests, so rows-only)."""
    from ..stages.knn import ivf_topk, train_ivf_centroids

    emb = _rpq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow")]
    )
    # distributed fixed-point Lloyd: centroids are bit-identical at any
    # parallelism, so training on the FULL corpus is deterministic
    cents = train_ivf_centroids(emb, n_lists=16)
    return ivf_topk(emb, queries, k=5, nprobe=4, centroids=cents)


def q_pq_knn(sf_dir: str):
    """Product-quantization (ADC) ANN top-k over the embeddings table —
    the compressed-corpus scale path next to LSH and IVF
    (stages.knn.pq_topk; approximate, recall pinned by tests, so
    rows-only)."""
    from ..stages.knn import pq_topk

    emb = _rpq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow")]
    )
    return pq_topk(emb, queries, k=5, m_sub=8, n_centroids=64)


def q_nsw_knn(sf_dir: str):
    """Graph ANN (HNSW-class) top-k over the embeddings table: per-IVF-
    list navigable small-world graphs built as a one-shuffle index
    artifact, queried by deterministic beam search
    (stages.graphann.build_nsw_index / nsw_topk; approximate, recall +
    exact-coverage limit pinned by tests, so rows-only)."""
    from ..stages.graphann import build_nsw_index, nsw_topk
    from ..stages.knn import train_ivf_centroids

    emb = _rpq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow")]
    )
    cents = train_ivf_centroids(emb, n_lists=16)
    index = build_nsw_index(emb, cents, M=8)
    return nsw_topk(index, queries, cents, k=5, nprobe=4, ef=48)


def q_winnow_pairs(sf_dir: str):
    """Rolling-hash winnowing fingerprints → near-dup candidate pairs
    (SWA winnowing; fingerprint-set Jaccard is an estimate, so rows-only —
    the guarantee and density properties are pinned by tests)."""
    from ..stages.dedup import winnow_jaccard_pairs
    from .corpus_queries import _derived_corpus

    return winnow_jaccard_pairs(_derived_corpus(sf_dir), threshold=0.5)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the embeddings table: k-means-clustered semantic
    dedup (stages.knn.semantic_dedup — cluster, within-cluster cosine
    near-dup components, keep the member farthest from its centroid).
    Iterative k-means training is not SQL-expressible → rows-only;
    partition-invariance + keep-policy semantics pinned by tests."""
    from ..stages.knn import semantic_dedup

    emb = _rpq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup(emb, threshold=0.92, n_lists=16)


def q_embedding_norm_quantiles(sf_dir: str):
    """Histogram-sketch quantiles of a CONTINUOUS column (embedding L2
    norms) — the scale path where the exact value-count collapse doesn't
    apply (stages.groupops.histogram_quantiles; deterministic, error ≤ one
    bin width — accuracy pinned by tests). Constant-pin oracled: the
    synth embeddings are L2-normalized, so the sketch must return
    exactly 1.0 at every p (see corpus_queries.ORACLE_SQL)."""
    from ..stages.groupops import histogram_quantiles
    from ..stages.knn import _to_matrix

    emb = _rpq(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def norms(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        return pa.table({"norm": pa.array(np.linalg.norm(m, axis=1))})

    return histogram_quantiles(
        emb.map_batches(norms, batch_format="pyarrow"), "norm",
        [0.05, 0.5, 0.95],
    )


def q_corpus_pipeline(sf_dir: str):
    """The text-axis nightly end-to-end (pipelines.run_all.corpus_stages):
    quality/langid filter → exact+minhash dedup → decontaminate+PII scrub
    → split/pack → resumable shard sink, run into a fresh tempdir; returns
    one receipt row per stage (stage, n_rows) — the full composition is
    pinned by tests/test_sources_and_lifecycle.py::TestCorpusStages."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from .run_all import corpus_stages, run_pipeline

    def mod97(b: pa.Table) -> pa.Table:
        rem = pc.subtract(
            b["doc_id"], pc.multiply(pc.divide(b["doc_id"], 97), 97)
        )
        return b.filter(pc.equal(rem, 0))

    bench = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(mod97, batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="overmatch_corpus_")
    try:
        receipts = run_pipeline(
            corpus_stages(sf_dir, out, benchmark_ds=bench, budget=4096),
            {}, out,
        )
        rows = []
        for r in receipts:
            n = r.get("n_rows", r.get("n_clean", r.get("n_unique",
                                                       r.get("n_kept"))))
            rows.append({"stage": r["stage"], "n_rows": int(n)})
        return pa.table({
            "stage": pa.array([r["stage"] for r in rows], pa.string()),
            "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
        })
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_type_distinct_users(sf_dir: str):
    """Per-event-type approximate distinct users (grouped HyperLogLog —
    stages.groupops.approx_distinct_by; ~1.6% standard error at p=12;
    accuracy + partition-invariance pinned by tests). Deterministic →
    constant-pin oracle keyed on corpus size (the `approx_distinct`
    form; see corpus_queries.ORACLE_SQL)."""
    from ..stages.groupops import approx_distinct_by

    ev = _rpq(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return approx_distinct_by(ev, "event_type", "user_id")


def q_image_dedup_clusters(sf_dir: str):
    """Image near-dup CLUSTER formation: the banded-Hamming phash pair
    graph (near_dup_pairs, max_hamming 6) fed through the shared
    connected-components step (dedup_clusters min-label) — keep
    cluster_id, drop the rest, exactly the corpus-dedup final step but on
    the image modality. String image ids ride as their numeric suffix
    (img-%012d) and are restored after."""
    return _image_clusters_from(_images_ds(sf_dir))


def _image_clusters_from(images_ds):
    """Cluster formation over an already-built image dataset (callers that
    consume the corpus twice pass their materialized handle — the synth +
    JPEG encode is the most expensive input stage, never pay it twice)."""
    from ..stages.dedup import dedup_clusters
    from ..stages.images import near_dup_pairs

    import numpy as np
    import pyarrow as pa

    pairs = near_dup_pairs(images_ds, max_hamming=6)

    def to_int(batch: pa.Table) -> pa.Table:
        a = [int(s.rsplit("-", 1)[1]) for s in batch["id_a"].to_pylist()]
        b = [int(s.rsplit("-", 1)[1]) for s in batch["id_b"].to_pylist()]
        return pa.table({
            "id_a": pa.array(np.asarray(a, np.int64)),
            "id_b": pa.array(np.asarray(b, np.int64)),
        })

    clusters = dedup_clusters(pairs.map_batches(to_int, batch_format="pyarrow"))

    def restore(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_pylist()
        c = batch["cluster_id"].to_pylist()
        return pa.table({
            "image_id": pa.array([f"img-{i:012d}" for i in d], pa.string()),
            "cluster_id": pa.array([f"img-{i:012d}" for i in c], pa.string()),
        })

    return clusters.map_batches(restore, batch_format="pyarrow")


def q_tile_mosaic(sf_dir: str):
    """Axes A+B composition: a per-tile image MOSAIC MANIFEST — for every
    z12 slippy tile holding images, the 4 deterministic representatives
    ordered by (phash, image_id). Projection + tile assignment in one
    map, a single bucketed group-apply picks representatives
    (vectorized head-per-tile, no per-tile dispatch). The manifest is
    what a tile-rendering service prefetches; byte-determinism at any
    parallelism is the invariant (same contract as the tile encoder)."""
    from ..stages.groupops import bucketed_group_apply
    from ..stages.tiles import tile_xy

    def to_tiles(batch: pa.Table) -> pa.Table:
        tx, ty = tile_xy(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            12,
        )
        return pa.table(
            {
                "tx": pa.array(tx),
                "ty": pa.array(ty),
                "image_id": batch["image_id"],
                "phash": batch["phash"],
            }
        )

    imgs = _images_ds(sf_dir).map_batches(to_tiles, batch_format="pyarrow")

    def pick(g):
        g = g.sort_values(["tx", "ty", "phash", "image_id"], kind="mergesort")
        r = g.groupby(["tx", "ty"]).cumcount()
        out = g[r < 4].copy()
        out["mosaic_rank"] = (r[r < 4] + 1).astype("int64")
        return out[["tx", "ty", "mosaic_rank", "image_id", "phash"]]

    return bucketed_group_apply(imgs, ["tx", "ty"], pick, num_buckets=32)


def q_dirty_tiles(sf_dir: str):
    """Incremental tiling: the dirty-tile set between the flagship tile
    pyramid and the pyramid of a perturbed corpus (every 5th customer key
    dropped) — only these tiles need republishing
    (stages.tiles.dirty_tiles; manifest-hash diff, payloads never
    shuffle)."""
    from ..stages.tiles import build_tiles, dirty_tiles
    from .conflate import flagship_matches

    # one conflation run feeds BOTH pyramids (the old corpus and its
    # thinned perturbation) — materialize the small match boundary once
    # instead of running the flagship join twice, and coalesce it so both
    # tile builds see 32 blocks (21.6 s → 10.4 s at sf0.1)
    matches = flagship_matches(sf_dir).repartition(32).materialize()
    old = build_tiles(matches, zooms=[8, 12], max_per_tile=200)

    def thin(batch: pa.Table) -> pa.Table:
        # key-derived (partition-invariant) rule: drop osm ids whose
        # numeric suffix ≡ 0 (mod 5) → some tiles change, most don't
        suf = np.array(
            [int(s.rsplit("/", 1)[1]) for s in batch["osm_id"].to_pylist()],
            np.int64,
        )
        return batch.filter(pa.array(suf % 5 != 0))

    new_feats = matches.map_batches(thin, batch_format="pyarrow")
    new = build_tiles(new_feats, zooms=[8, 12], max_per_tile=200)
    return dirty_tiles(old, new)


def _perturbed_matches(matches):
    """Tonight's match table as a deterministic perturbation of last
    night's (key-derived, partition-invariant): osm suffix % 5 == 0
    dropped (removed), % 7 == 1 gets a tag edit (changed), % 11 == 2
    additionally emits a re-keyed overture twin (added)."""
    def perturb(batch: pa.Table) -> pa.Table:
        suf = np.array(
            [int(s.rsplit("/", 1)[1]) for s in batch["osm_id"].to_pylist()],
            np.int64,
        )
        t = batch.filter(pa.array(suf % 5 != 0))
        suf_t = suf[suf % 5 != 0]
        tags = t["overture_tags"].to_pylist()
        tags = [
            (tg or "") + ' {"edited":1}' if s % 7 == 1 else tg
            for tg, s in zip(tags, suf_t)
        ]
        t = t.set_column(
            t.schema.get_field_index("overture_tags"), "overture_tags",
            pa.array(tags, pa.string()),
        )
        add_mask = suf_t % 11 == 2
        if add_mask.any():
            a = t.filter(pa.array(add_mask))
            a = a.set_column(
                a.schema.get_field_index("overture_id"), "overture_id",
                pa.array(
                    [f"{v}-new" for v in a["overture_id"].to_pylist()],
                    pa.string(),
                ),
            )
            t = pa.concat_tables([t, a])
        return t

    return matches.map_batches(perturb, batch_format="pyarrow")


def q_match_diff(sf_dir: str):
    """Nightly incremental conflation CDC (stages.enrich.match_diff):
    diff last night's flagship match table against a deterministic
    perturbation of it → (osm_id, overture_id, change_type, lon, lat).
    One conflation run feeds both sides (materialized once). Rows-only;
    classification semantics are pinned by tests."""
    from ..stages.enrich import match_diff
    from .conflate import flagship_matches

    matches = flagship_matches(sf_dir).repartition(32).materialize()
    out = match_diff(matches, _perturbed_matches(matches))
    return out.map_batches(
        lambda b: pa.table({
            "osm_id": b["osm_id"],
            "overture_id": b["overture_id"],
            "change_type": b["change_type"],
        }),
        batch_format="pyarrow",
    )


def q_incremental_match_tiles(sf_dir: str):
    """Dirty-tile republish after the nightly match diff
    (stages.tiles.incremental_tiles over stages.enrich.match_diff): only
    tiles containing a diff row are rebuilt, byte-identical to the same
    tiles of a full rebuild (equality pinned by tests — that equality IS
    the incremental path's correctness argument)."""
    from ..stages.enrich import match_diff
    from ..stages.tiles import incremental_tiles
    from .conflate import flagship_matches

    matches = flagship_matches(sf_dir).repartition(32).materialize()
    new = _perturbed_matches(matches).materialize()
    diff = match_diff(matches, new).materialize()
    tiles = incremental_tiles(new, diff, zooms=[8, 12], max_per_tile=200)
    return tiles.map_batches(
        lambda b: b.select(["zoom", "tx", "ty", "n_features"])
        if "n_features" in b.column_names else b,
        batch_format="pyarrow",
    )


def q_s2_cells(sf_dir: str):
    """S2 cell encode + hierarchy rollup — the north star's literal
    "S2 level-14" index (overmatch_ray/s2.py, pure-numpy Hilbert-curve
    encoder; no SQL analog, so rows-only; conformance pinned by
    tests/test_s2.py against an independent per-level walk). Events map to
    formula coords, encode to level-14 cells in one vectorized
    map_batches, aggregate per cell (the ONLY shuffle), then attach the
    level-9 ancestor token via the pure bit-op parent — no re-encode, no
    second scan. Top-50 cells by count, deterministic tie-break."""
    from .corpus_queries import _formula_coords
    from .. import s2

    ev = _rpq(f"{sf_dir}/events.parquet", columns=["event_id"])

    def encode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        cell = s2.lnglat_to_cell(lon, lat, level=14)
        return pa.table({"s2_l14": pa.array(cell.view(np.int64))})

    l14 = (
        ev.map_batches(encode, batch_format="pyarrow")
        .groupby("s2_l14")
        .count()
    )

    def tokenize(batch: pa.Table) -> pa.Table:
        c14 = batch["s2_l14"].to_numpy(zero_copy_only=False).view(np.uint64)
        par = s2.cell_parent(c14, 9)
        return pa.table(
            {
                "s2_token": pa.array(s2.cell_token(c14), pa.string()),
                "s2_l9_token": pa.array(s2.cell_token(par), pa.string()),
                "n_events": batch["count()"],
            }
        )

    return (
        l14.map_batches(tokenize, batch_format="pyarrow")
        .sort(["n_events", "s2_token"], descending=[True, False])
        .limit(50)
    )


def q_simplified_tracks(sf_dir: str):
    """Per-user GPS-track Douglas-Peucker simplification at 30 m — the
    tippecanoe-simplification analog as a standalone operator
    (stages.spatial.douglas_peucker_mask; no SQL analog, so rows-only;
    error-bound + invariance pinned by tests/test_spatial.py). One
    bucketed shuffle: tracks sort (ts, event_id) inside the kernel, the
    DP mask and the summary come out of the same pass. simp_dm is the
    simplified-polyline length floored to integer decimeters per leg
    (summation-order-free, the track_lengths trick)."""
    import pandas as pd

    from ..geo import mercator_xy
    from ..stages.groupops import bucketed_group_apply
    from ..stages.spatial import douglas_peucker_mask
    from .corpus_queries import _formula_coords

    ds = _rpq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def add_xy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        x, y = mercator_xy(lon, lat)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    pts = ds.map_batches(add_xy, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        keys = g["user_id"].to_numpy()
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        uniq, starts = np.unique(keys, return_index=True)
        ends = np.concatenate([starts[1:], [len(keys)]])
        n_points = (ends - starts).astype(np.int64)
        n_kept = np.zeros(len(uniq), np.int64)
        simp_dm = np.zeros(len(uniq), np.int64)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            keep = douglas_peucker_mask(x[s:e], y[s:e], tol_m=30.0)
            kx, ky = x[s:e][keep], y[s:e][keep]
            n_kept[gi] = keep.sum()
            d = np.sqrt(np.diff(kx) ** 2 + np.diff(ky) ** 2)
            simp_dm[gi] = int(np.floor(d * 10).astype(np.int64).sum())
        return pd.DataFrame(
            {
                "user_id": uniq,
                "n_points": n_points,
                "n_kept": n_kept,
                "simp_dm": simp_dm,
            }
        )

    return bucketed_group_apply(
        pts, ["user_id"], per_bucket, num_buckets=32
    ).sort("user_id")


_ASPECT_BUCKETS = [("1:1", 1.0), ("4:3", 4 / 3), ("3:4", 3 / 4),
                   ("16:9", 16 / 9), ("9:16", 9 / 16)]


def q_aspect_batches(sf_dir: str):
    """Vision-training batch prep: aspect-ratio bucketing + fixed-size
    batch packing. Each image goes to the aspect bucket minimizing
    |log(w/h) − log(bucket ratio)| (first-min tie-break), then images
    within a bucket pack into training batches of 32 in image_id order —
    per-bucket EXACT ranks via the id-range two-phase scan
    (per-(bucket, range) counts → driver offsets → in-range sort), the
    price_quartiles plan; no global sort, shuffle moves (bucket, range)
    groups. Metadata-only image synth (synth.images_meta_block) — pixel
    bytes never enter this pipeline. Rows-only (w/h derive from splitmix
    synth, not SQL-expressible); packing parity + invariance pinned by
    tests."""
    import pandas as pd

    from ..stages.groupops import bucketed_group_apply
    from ..synth import images_meta_block

    B = 32
    RANGE = 256  # id-suffix granule for the two-phase scan
    names = [n for n, _ in _ASPECT_BUCKETS]
    logs = np.log(np.array([r for _, r in _ASPECT_BUCKETS]))

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def meta(batch: pa.Table) -> pa.Table:
        idx = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = images_meta_block(idx)
        w = t["w"].to_numpy().astype(np.float64)
        h = t["h"].to_numpy().astype(np.float64)
        d = np.abs(np.log(w / h)[:, None] - logs[None, :])
        ab = np.argmin(d, axis=1).astype(np.int64)  # first-min tie-break
        return pa.table(
            {
                "suffix": pa.array(idx),
                "abucket": pa.array(ab),
                "rng": pa.array(idx // RANGE),
            }
        )

    t = docs.map_batches(meta, batch_format="pyarrow").materialize()
    counts = {
        (r["abucket"], r["rng"]): r["count()"]
        for r in t.groupby(["abucket", "rng"]).count().take_all()
    }
    offsets: dict[tuple[int, int], int] = {}
    acc: dict[int, int] = {}
    for ab, rng in sorted(counts):
        offsets[(ab, rng)] = acc.get(ab, 0)
        acc[ab] = acc.get(ab, 0) + counts[(ab, rng)]

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (ab, rng), gr in g.groupby(["abucket", "rng"]):
            gr = gr.sort_values("suffix", kind="mergesort")
            rank = offsets[(int(ab), int(rng))] + np.arange(
                len(gr), dtype=np.int64
            )
            out.append(
                pd.DataFrame(
                    {
                        "image_id": [
                            f"img-{i:012d}" for i in gr["suffix"].to_numpy()
                        ],
                        "aspect_bucket": names[int(ab)],
                        "batch_id": rank // B,
                        "pos_in_batch": rank % B,
                    }
                )
            )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame(
                {
                    "image_id": pd.Series(dtype=str),
                    "aspect_bucket": pd.Series(dtype=str),
                    "batch_id": pd.Series(dtype=np.int64),
                    "pos_in_batch": pd.Series(dtype=np.int64),
                }
            )
        )

    return bucketed_group_apply(
        t, ["abucket", "rng"], rank_bucket, num_buckets=16
    ).sort(["aspect_bucket", "batch_id", "pos_in_batch"])


def q_track_hulls(sf_dir: str):
    """Per-user convex-hull footprint of the GPS track
    (stages.spatial.hull_by — monotone chain per key over one bucketed
    shuffle; no SQL analog in stock DuckDB, so rows-only; hull-property +
    direct-recompute parity pinned by tests). One row per hull vertex
    (CCW, seq 0 = lexicographic min) with the doubled shoelace area."""
    from ..geo import mercator_xy
    from ..stages.spatial import hull_by
    from .corpus_queries import _formula_coords

    ds = _rpq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def add_xy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        x, y = mercator_xy(lon, lat)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    pts = ds.map_batches(add_xy, batch_format="pyarrow")
    return hull_by(
        pts, key_col="user_id", id_col="event_id", num_buckets=32
    ).sort(["user_id", "seq"])


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training over the documents corpus
    (stages.textstats.bpe_train): 12 merge rounds, vocabulary-bounded
    after ONE corpus shuffle; deterministic (count desc, pair lex)
    tie-break. Rows-only (iterative argmax is not SQL-expressible);
    parity with a single-process reference BPE pinned by tests."""
    from ..stages.textstats import bpe_train

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_train(docs, "text", n_merges=12, min_freq=2)


def q_hybrid_search(sf_dir: str):
    """Hybrid retrieval with reciprocal-rank fusion: BM25 lexical top-20
    for [hash, join, scan] fused with exact cosine top-20 around the
    vec_id-0 embedding (the standard RAG-corpus retrieval stack —
    documents and embeddings are parallel tables on the same ids).
    RRF score = Σ 1/(60 + rank) over the lists a doc appears in; fusion
    runs on the two k-bounded ranklists (driver-small by construction),
    the heavy lifting stays in the two streaming retrievers. Oracled:
    corpus_queries._hybrid_oracle_sql composes the two retrievers'
    proven SQL forms and fuses in-SQL (≤ 2 terms per doc, so sum() is
    bit-stable); also pinned by a composition test."""
    from ..stages.knn import brute_force_topk
    from ..stages.textstats import bm25_topk

    K = 20
    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lex = bm25_topk(docs, ["hash", "join", "scan"], k=K).to_pandas()

    emb = _rpq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    probe = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id == 0").iter_batches(
            batch_format="pyarrow")]
    )
    sem = brute_force_topk(emb, probe, k=K)
    sem = (sem.to_pandas() if hasattr(sem, "to_pandas") else sem)

    score: dict[int, float] = {}
    for rank, did in enumerate(lex["doc_id"], start=1):
        score[int(did)] = score.get(int(did), 0.0) + 1.0 / (60 + rank)
    for rank, did in zip(sem["rank"], sem["neighbor_id"]):
        score[int(did)] = score.get(int(did), 0.0) + 1.0 / (60 + int(rank))
    ids = sorted(score, key=lambda d: (-score[d], d))[:10]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "rrf_rank": pa.array(range(1, len(ids) + 1), pa.int64()),
            "rrf_score": pa.array(
                np.round([score[d] for d in ids], 6), pa.float64()
            ),
        }
    )


def q_kmeans_clusters(sf_dir: str):
    """K-means clustering readout over the embeddings corpus: the
    distributed fixed-point-Lloyd trainer (stages.knn.train_ivf_centroids
    — centroids bit-identical at any parallelism, pinned by tests) plus a
    pure-map assignment pass; output one row per cluster with member
    count and mean cosine to its centroid (rounded). Rows-only — the
    iterative training is not SQL-expressible."""
    import ray as _ray
    from ray.data.aggregate import Count, Mean

    from ..stages.knn import _normalize, _to_matrix, train_ivf_centroids

    emb = _rpq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = train_ivf_centroids(emb, n_lists=16)
    cref = _ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = _ray.get(cref)
        m = _normalize(_to_matrix(batch["embedding"]))
        sims = m @ c.T
        best = np.argmax(sims, axis=1)
        return pa.table({
            "cluster_id": pa.array(best.astype(np.int64)),
            "cos_to_centroid": pa.array(sims[np.arange(len(best)), best]),
        })

    out = (
        emb.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Count(alias_name="n_members"),
                   Mean("cos_to_centroid", alias_name="mean_cos"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": batch["cluster_id"].cast(pa.int64()),
            "n_members": batch["n_members"].cast(pa.int64()),
            "mean_cos": pa.array(
                np.round(batch["mean_cos"].to_numpy(zero_copy_only=False), 4)
            ),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_lang_confusion(sf_dir: str):
    """Language QA confusion matrix: declared `lang` column × detected
    language (stages.textstats.langid_batch) with counts — the
    label-quality audit a corpus curator runs before trusting either
    side. One bounded groupby (|langs|² cells). Oracled: reuses the
    generated marker-argmax SQL that proves langid_docs, joined back to
    the declared label (corpus_queries.ORACLE_SQL["lang_confusion"])."""
    from ray.data.aggregate import Count

    from ..stages.textstats import langid_batch

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def detect(batch: pa.Table) -> pa.Table:
        det = langid_batch(batch)
        return pa.table({
            "declared_lang": batch["lang"],
            "detected_lang": det["lang_pred"],
        })

    return (
        docs.map_batches(detect, batch_format="pyarrow")
        .groupby(["declared_lang", "detected_lang"])
        .aggregate(Count(alias_name="n_docs"))
        .map_batches(
            lambda b: pa.table({
                "declared_lang": b["declared_lang"],
                "detected_lang": b["detected_lang"],
                "n_docs": b["n_docs"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def q_contrastive_pairs(sf_dir: str):
    """Contrastive training-pair manifest: POSITIVE pairs from the exact
    n-gram near-dup pair graph (same corpus/threshold as
    `ngram_neardup_pairs`) unioned with HARD NEGATIVES (the most-similar
    different-label vectors per anchor, `stages.knn.hard_negative_topk`)
    — the two halves every contrastive fine-tune needs, shaped as one
    (anchor_id, other_id, pair_type) table. Oracled: the positive half
    reuses the ngram_neardup_pairs SQL verbatim, the negative half the
    hard_negatives form at this manifest's parameters
    (corpus_queries.ORACLE_SQL["contrastive_pairs"])."""
    import pyarrow.compute as _pc

    from ..pipelines.corpus_queries import _NEARDUP_THRESHOLD, _derived_corpus
    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.knn import hard_negative_topk

    pos = ngram_jaccard_pairs(
        _derived_corpus(sf_dir), threshold=_NEARDUP_THRESHOLD, k=3
    ).map_batches(
        lambda b: pa.table({
            "anchor_id": b["id_a"].cast(pa.int64()),
            "other_id": b["id_b"].cast(pa.int64()),
            "pair_type": pa.array(["positive"] * b.num_rows, pa.string()),
        }),
        batch_format="pyarrow",
    )

    emb = _rpq(f"{sf_dir}/embeddings.parquet",
               columns=["vec_id", "embedding", "label"])
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 20").iter_batches(
            batch_format="pyarrow")]
    )
    neg = hard_negative_topk(emb, queries, k=3).map_batches(
        lambda b: pa.table({
            "anchor_id": b["query_id"].cast(pa.int64()),
            "other_id": b["neighbor_id"].cast(pa.int64()),
            "pair_type": pa.array(["hard_negative"] * b.num_rows,
                                  pa.string()),
        }),
        batch_format="pyarrow",
    )
    return pos.union(neg)


def q_raster_tiles(sf_dir: str):
    """Raster heat-tile level over the events geo corpus: 256×256
    grayscale PNG per z14 tile via the repo's pure-zlib PNG codec
    (stages.tiles.build_raster_heat_tiles) — the raster twin of the MVT
    pyramid. Output row per tile: coordinates, point count, payload size
    and sha for pinning. Rows-only (PNG bytes aren't SQL); pixel-exact
    parity with a numpy rasterizer is test-pinned."""
    from .corpus_queries import _formula_coords

    import hashlib

    from ..stages.tiles import build_raster_heat_tiles

    ds = _rpq(f"{sf_dir}/events.parquet", columns=["event_id"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        return pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})

    tiles = build_raster_heat_tiles(
        ds.map_batches(pts, batch_format="pyarrow"), zoom=14
    )

    def summarize(batch: pa.Table) -> pa.Table:
        pngs = batch["png"].to_pylist()
        return pa.table({
            "zoom": batch["zoom"],
            "tx": batch["tx"],
            "ty": batch["ty"],
            "n_points": batch["n_points"],
            "png_bytes": pa.array([len(p) for p in pngs], pa.int64()),
            "png_sha": pa.array(
                [hashlib.sha256(p).hexdigest()[:16] for p in pngs],
                pa.string(),
            ),
        })

    return tiles.map_batches(summarize, batch_format="pyarrow")


def q_raster_pmtiles(sf_dir: str):
    """Raster PMTiles archive: the z14 heat rasters packed into one
    PMTiles v3 file with tile_type=png / tile compression NONE (payloads
    already deflate-compressed by the PNG codec) — the raster publish
    artifact next to the MVT archive. Returns the archive stats row;
    byte-determinism and read-back are test-pinned."""
    from .corpus_queries import _formula_coords

    import os
    import tempfile

    from ..stages.pmtiles import write_pmtiles
    from ..stages.tiles import build_raster_heat_tiles

    ds = _rpq(f"{sf_dir}/events.parquet", columns=["event_id"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        return pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})

    tiles = build_raster_heat_tiles(
        ds.map_batches(pts, batch_format="pyarrow"), zoom=14
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "heat.pmtiles")
        stats = write_pmtiles(tiles, path, tile_type="png", tile_col="png")
    return pa.table({
        "n_tiles": pa.array([stats["n_tiles"]], pa.int64()),
        "n_contents": pa.array([stats["n_contents"]], pa.int64()),
        "min_zoom": pa.array([stats["min_zoom"]], pa.int64()),
        "max_zoom": pa.array([stats["max_zoom"]], pa.int64()),
    })


def q_track_line_tiles(sf_dir: str):
    """Vector LINE tiles of user tracks (stages.tiles.build_line_tiles):
    per-user polylines (pings ordered by ts) clipped into z13 MVT
    LineString tiles — the tippecanoe linear-feature path next to the
    point pyramid. Output per tile: key/part counts + payload size + sha.
    Rows-only; segment-exact parity vs an independent clipper and byte
    determinism are test-pinned."""
    from .corpus_queries import _formula_coords

    import hashlib

    from ..stages.tiles import build_line_tiles

    ev = _rpq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = uid < 50
        eid, uid = eid[m], uid[m]
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[m]
        lon, lat = _formula_coords(eid)
        return pa.table({
            "key": pa.array(uid),
            "seq": pa.array(ts),  # µs timestamps are a valid total order
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        })

    tiles = build_line_tiles(
        ev.map_batches(pts, batch_format="pyarrow"), zoom=15
    )

    def summarize(batch: pa.Table) -> pa.Table:
        blobs = batch["mvt"].to_pylist()
        return pa.table({
            "zoom": batch["zoom"],
            "tx": batch["tx"],
            "ty": batch["ty"],
            "n_keys": batch["n_keys"],
            "n_parts": batch["n_parts"],
            "mvt_bytes": pa.array([len(b) for b in blobs], pa.int64()),
            "mvt_sha": pa.array(
                [hashlib.sha256(b).hexdigest()[:16] for b in blobs],
                pa.string(),
            ),
        })

    return tiles.map_batches(summarize, batch_format="pyarrow")


def q_hull_polygon_tiles(sf_dir: str):
    """Vector POLYGON tiles: per-user convex-hull footprints clipped into
    z13 MVT polygon layers (stages.tiles.build_hull_tiles) — the area
    third of the tiling trio. Rows-only; brute-force clip parity, spec
    ring orientation and byte determinism are test-pinned."""
    from .corpus_queries import _formula_coords

    import hashlib

    from ..stages.tiles import build_hull_tiles

    ev = _rpq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = uid < 50
        eid, uid = eid[m], uid[m]
        lon, lat = _formula_coords(eid)
        return pa.table({
            "key": pa.array(uid),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        })

    tiles = build_hull_tiles(
        ev.map_batches(pts, batch_format="pyarrow"), zoom=13
    )

    def summarize(batch: pa.Table) -> pa.Table:
        blobs = batch["mvt"].to_pylist()
        return pa.table({
            "zoom": batch["zoom"],
            "tx": batch["tx"],
            "ty": batch["ty"],
            "n_keys": batch["n_keys"],
            "mvt_bytes": pa.array([len(b) for b in blobs], pa.int64()),
            "mvt_sha": pa.array(
                [hashlib.sha256(b).hexdigest()[:16] for b in blobs],
                pa.string(),
            ),
        })

    return tiles.map_batches(summarize, batch_format="pyarrow")


def q_video_frames(sf_dir: str):
    """Video frame sampling end-to-end (the multimodal family's video
    member): 100 deterministic AVI/MJPEG videos (12 counter-hash
    baseline-JPEG frames each, real container + real codec from
    imaging.codec) pushed through the `stages.images.FrameSample` ACTOR
    POOL (stride 3, cap 4), one row per sampled frame with its phash.
    SF-invariant input (keys < 100 exist at every SF). Rows-only; sampling
    semantics, quarantine and determinism are test-pinned in
    tests/test_images_pipeline.py."""
    from ..stages.images import FrameSample

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id"]).filter(
        expr="doc_id < 100"
    )

    def synth_videos(batch: pa.Table) -> pa.Table:
        from ..imaging.codec import encode_video_avi

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vids, blobs = [], []
        for d in ids.tolist():
            frames = []
            for f in range(12):
                h = (d * 1_000_003 + f * 2654435761) % (1 << 31)
                rng_val = np.uint8(h % 251)
                img = np.full((16, 16, 3), rng_val, np.uint8)
                img[(h >> 8) % 16, (h >> 16) % 16] = 255  # per-frame mark
                frames.append(img)
            vids.append(f"vid-{d}")
            blobs.append(encode_video_avi(frames))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
        })

    videos = docs.map_batches(synth_videos, batch_format="pyarrow",
                              batch_size=32)
    out = videos.map_batches(
        FrameSample,
        fn_constructor_kwargs={"stride": 3, "max_frames": 4},
        concurrency=2,
        batch_size=16,
        batch_format="pyarrow",
    )
    return out.map_batches(
        lambda b: pa.table({
            "video_id": b["video_id"],
            "frame_index": b["frame_index"].cast(pa.int64()),
            "phash": b["phash"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def q_video_shot_cuts(sf_dir: str):
    """Shot-boundary detection end-to-end (stages.images.ShotBoundaries):
    100 deterministic AVI/MJPEG videos of 12 flat-color frames with TWO
    formula-planted scene cuts each (at 3 + d%4 and 8 + d%3, scene means
    40/100/160 — jumps of ~60 gray levels dwarf the ≤2-level JPEG loss on
    flat frames and the single-pixel uniqueness mark). The detector must
    recover exactly the planted cut positions from DECODED PIXELS, so the
    structure oracle (corpus_queries registers the formula in SQL) pins
    the whole demux→decode→delta pipeline with a hash compare — the
    phash_dedup trick extended to video."""
    from ..stages.images import detect_shot_cuts

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id"]).filter(
        expr="doc_id < 100"
    )

    def synth_scene_videos(batch: pa.Table) -> pa.Table:
        from ..imaging.codec import encode_video_avi

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vids, blobs = [], []
        for d in ids.tolist():
            c1, c2 = 3 + d % 4, 8 + d % 3
            frames = []
            for f in range(12):
                base = 40 + 60 * ((f >= c1) + (f >= c2))
                img = np.full((16, 16, 3), np.uint8(base), np.uint8)
                h = (d * 1_000_003 + f * 2654435761) % (1 << 31)
                img[(h >> 8) % 16, (h >> 16) % 16] = 255  # uniqueness mark
                frames.append(img)
            vids.append(f"vid-{d}")
            blobs.append(encode_video_avi(frames))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
        })

    videos = docs.map_batches(synth_scene_videos, batch_format="pyarrow",
                              batch_size=32)
    out = detect_shot_cuts(videos, threshold=30.0, concurrency=2,
                           batch_size=16)
    return out.map_batches(
        lambda b: pa.table({
            "video_id": b["video_id"],
            "cut_frame": b["cut_frame"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def q_augmented_images(sf_dir: str):
    """Training-time image augmentation through the REAL codec path
    (stages.images.Augment actor pool): per image a deterministic id-hash
    plan (hflip / vflip / center-crop), decode → transform → re-encode →
    re-phash. Output per image: plan, new phash, payload size. Rows-only;
    pixel-level parity with a direct numpy transform and determinism are
    test-pinned."""
    from ..stages.images import augment_images

    out = augment_images(_images_ds(sf_dir), concurrency=2, batch_size=128)

    def summarize(batch: pa.Table) -> pa.Table:
        blobs = batch["aug_bytes"].to_pylist()
        return pa.table({
            "image_id": batch["image_id"],
            "aug_ops": batch["aug_ops"],
            "aug_phash": batch["aug_phash"],
            "aug_bytes_len": pa.array(
                [len(b) if b is not None else 0 for b in blobs], pa.int64()
            ),
            "aug_ok": batch["aug_ok"],
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def q_compacted_sink(sf_dir: str):
    """Sink-maintenance end-to-end: write a keyed dataset through the
    resumable partitioned sink (40 key partitions), COMPACT it
    (state.checkpoint.compact_partitions — bin-packed rewrite, atomic
    swap, scheme restamp), read it back, and report the before/after file
    counts + row conservation. Rows-only (filesystem lifecycle); the
    stale-resume refusal and resume-set preservation are test-pinned."""
    import os
    import tempfile

    from ..state.checkpoint import (
        compact_partitions,
        read_partitioned,
        write_partitioned_resumable,
    )

    ev = _rpq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "k": pa.array(uid % 40),
            "event_id": batch["event_id"].cast(pa.int64()),
        })

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "sink")
        write_partitioned_resumable(
            ev.map_batches(keyed, batch_format="pyarrow"), out, "k",
            scheme="events/user-mod40/v1",
        ).count()
        stats = compact_partitions(out, target_rows=2000)
        rows_back = read_partitioned(out).count()
    return pa.table({
        "files_before": pa.array([stats["files_before"]], pa.int64()),
        "files_after": pa.array([stats["files_after"]], pa.int64()),
        "rows": pa.array([stats["rows"]], pa.int64()),
        "rows_back": pa.array([rows_back], pa.int64()),
    })


def q_corpus_card(sf_dir: str):
    """Dataset datasheet ('corpus card'): one row summarizing the text
    corpus for a release — doc/token counts, language mix entropy, exact
    dedup rate, quality keep rate, PII density — the artifact a data
    steward publishes alongside the shards. Pure composition of already-
    verified stages (each oracle- or test-pinned on its own); everything
    folds to scalars, nothing corpus-sized reaches the driver."""
    from ray.data.aggregate import Count, Sum

    from ..stages.pii import redact_pii
    from ..stages.textstats import quality_batch, token_count_batch

    docs = _rpq(f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "lang"])
    n_docs = docs.count()

    toks = docs.map_batches(token_count_batch, batch_format="pyarrow")
    n_tokens = sum(
        r["s"] for r in toks.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(np.sum(b["n_tokens"].to_numpy(zero_copy_only=False)))],
                pa.int64())}),
            batch_format="pyarrow",
        ).take_all()
    )

    lang_counts = {
        r["lang"]: r["count()"]
        for r in docs.groupby("lang").count().take_all()
    }
    ps = np.array(sorted(lang_counts.values()), np.float64) / n_docs
    lang_entropy = float(-(ps * np.log(ps)).sum())

    from ..stages.dedup import exact_dedup
    from ..stages.textstats import fingerprint_batch

    kept = exact_dedup(
        docs.map_batches(fingerprint_batch, batch_format="pyarrow"),
        "prefix_key",
    ).count()
    dedup_rate = 1.0 - kept / n_docs

    q = docs.map_batches(quality_batch, batch_format="pyarrow")
    n_keep = sum(
        r["s"] for r in q.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(np.sum(b["quality_keep"].to_numpy(
                    zero_copy_only=False)))],
                pa.int64())}),
            batch_format="pyarrow",
        ).take_all()
    )
    quality_keep_rate = n_keep / n_docs

    pii = redact_pii(docs)
    n_pii = sum(
        r["s"] for r in pii.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(sum(
                    int(np.sum(b[c].to_numpy(zero_copy_only=False)))
                    for c in ("n_emails", "n_ips", "n_phones")
                ))], pa.int64())}),
            batch_format="pyarrow",
        ).take_all()
    )

    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "n_languages": pa.array([len(lang_counts)], pa.int64()),
        "lang_entropy": pa.array([round(lang_entropy, 6)], pa.float64()),
        "exact_dedup_rate": pa.array([round(dedup_rate, 6)], pa.float64()),
        "quality_keep_rate": pa.array(
            [round(quality_keep_rate, 6)], pa.float64()),
        "n_pii_hits": pa.array([n_pii], pa.int64()),
    })


def q_image_quality(sf_dir: str):
    """Pixel-level quality metrics over the image corpus: sharpness
    (Laplacian variance), brightness/contrast, histogram entropy,
    colorfulness — real decoded pixels, actor pool, no shuffle."""
    from ..stages.imagequality import quality_stats

    return quality_stats(_images_ds(sf_dir), concurrency=2)


def q_image_filter(sf_dir: str):
    """The pretraining image-filter chain (resolution / aspect / blur /
    exposure / flatness gates over real pixels); survivors with their
    metric columns, payload dropped for the compare."""
    from ..stages.imagequality import filter_images

    out = filter_images(
        _images_ds(sf_dir), concurrency=2,
        min_sharpness=0.5, min_entropy=4.0,
    )
    return out.drop_columns(["bytes"])


def q_neardup_verified(sf_dir: str):
    """Two-phase near-dup: banded phash candidates verified by real
    pixel block-SSIM (LSH proposes, SSIM confirms). The corpus feeds two
    consumers (the phash pair graph + the candidate semi-join), so it is
    materialized once — the synth/encode never runs twice."""
    from ..stages.imagequality import ssim_verify_pairs

    imgs = _images_ds(sf_dir).materialize()
    return ssim_verify_pairs(imgs, max_hamming=6, concurrency=2)


def q_image_embed(sf_dir: str):
    """Per-image feature embeddings (DCT low-freq + luma histogram + RGB
    moments over real decoded pixels) — the (vec_id, embedding) table the
    ANN family consumes."""
    from ..stages.imagequality import embed_images

    return embed_images(_images_ds(sf_dir), concurrency=2)


def q_image_knn(sf_dir: str):
    """Image similarity search end-to-end over real pixels: decode →
    feature embedding → exact cosine top-k against a deterministic query
    subset (every 100th image)."""
    from ..stages.imagequality import embed_images
    from ..stages.knn import brute_force_topk

    emb = embed_images(_images_ds(sf_dir), concurrency=2).materialize()

    def pick(batch: pa.Table) -> pa.Table:
        # bounded-by-construction query set: every 100th image AND
        # counter < 10^5, so q ≤ 1000 no matter the corpus size (the
        # queries table is driver-collected then ray.put-broadcast —
        # it must stay O(1k), not O(corpus/100))
        ids = batch["vec_id"].to_pylist()
        m = np.array(
            [
                int(s.rsplit("-", 1)[1]) % 100 == 0
                and int(s.rsplit("-", 1)[1]) < 100_000
                for s in ids
            ],
            dtype=bool,
        )
        return batch.filter(pa.array(m))

    queries = pa.concat_tables(
        [pa.table(b) for b in emb.map_batches(
            pick, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    )
    return brute_force_topk(emb, queries, k=3, id_col="vec_id")


def q_best_of_cluster(sf_dir: str):
    """Keep-the-best-copy dedup policy: per near-dup cluster, the member
    with the highest pixel sharpness (real decode of members only)."""
    from ..stages.imagequality import best_of_cluster

    imgs = _images_ds(sf_dir).materialize()
    clusters = _image_clusters_from(imgs)  # reuse — no second synth pass
    return best_of_cluster(imgs, clusters)


def q_images_quarantine(sf_dir: str):
    """Error-quarantine sweep: every 50th image blob is deterministically
    corrupted (truncated to 60%, keyed off image_id — partition-invariant)
    before DecodeValidate, making the bad-row path driver-visible (the
    clean-corpus images_validate can only ever report error=None). Rows
    are never dropped — corrupt blobs come back flagged. Output: per-fmt
    (n_images, n_quarantined)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.images import decode_validate

    def corrupt(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out = []
        for i, (iid, b) in enumerate(zip(ids, blobs)):
            # image_id is "img-NNNNNNNNNNNN" — key off the counter
            if int(iid.split("-")[1]) % 50 == 0:
                out.append(b[: max(8, (len(b) * 3) // 5)])
            else:
                out.append(b)
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes",
            pa.array(out, pa.large_binary()),
        )

    validated = decode_validate(
        _images_ds(sf_dir).map_batches(corrupt, batch_format="pyarrow"),
        concurrency=2, batch_size=128,
        select=["image_id", "fmt", "error"],
    )

    def flag(batch: pa.Table) -> pa.Table:
        import numpy as np

        bad = pc.is_valid(batch["error"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "fmt": batch["fmt"],
                "n_images": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_quarantined": pa.array(bad.astype(np.int64)),
            }
        )

    return (
        validated.map_batches(flag, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Sum("n_images", alias_name="n_images"),
                   Sum("n_quarantined", alias_name="n_quarantined"))
    )


def q_dtw_tracks(sf_dir: str):
    """Banded-DTW similarity matrix over a bounded track panel
    (stages.spatial.dtw_panel): md5-thinned users' ping tracks, all
    unordered panel pairs, exact integer decimeter costs. Rows-only —
    DTW's optimal-path DP has no SQL form; the kernel is pinned by
    tests/test_spatial.py's brute-force reference instead. Tracks never
    land on the driver: only the bounded PANEL ID LIST does (like a
    literal radius set), tracks pack and pair inside the shuffle."""
    import hashlib

    from ..geo import mercator_xy
    from ..stages.spatial import dtw_panel

    ev = _rpq(f"{sf_dir}/events.parquet",
              columns=["event_id", "user_id", "ts"])

    # bounded panel: the 24 users with the SMALLEST md5 — a fixed-SIZE
    # deterministic panel at any corpus scale (the pair table is
    # quadratic in the panel, so the panel must not grow with the
    # corpus); the driver holds ONLY these ids, like a literal radius set
    all_users = sorted({
        int(u) for b in ev.map_batches(
            lambda t: pa.table({"u": pa.array(
                np.unique(t["user_id"].to_numpy(zero_copy_only=False)))}),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        for u in b["u"].to_pylist()
    })
    users = sorted(
        sorted(all_users,
               key=lambda u: (hashlib.md5(str(u).encode()).hexdigest(), u))
        [:24]
    )
    panel = set(users)
    pid, ka, kb = [], [], []
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            pid.append(len(pid))
            ka.append(a)
            kb.append(b)
    pairs = pa.table({
        "pair_id": pa.array(pid, pa.int64()),
        "key_a": pa.array(ka, pa.int64()),
        "key_b": pa.array(kb, pa.int64()),
    })

    def add_xy(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(uid, np.asarray(users, np.int64))
        t = batch.filter(pa.array(keep))
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = -77.05 + (eid % 1000) * 1e-4
        lat = 38.85 + ((eid // 1000) % 1000) * 1e-4
        x, y = mercator_xy(lon, lat)
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_id": t["event_id"],
            "x": pa.array(x),
            "y": pa.array(y),
        })

    pts = ev.map_batches(add_xy, batch_format="pyarrow")
    return dtw_panel(pts, pairs, key_col="user_id",
                     order_cols=["ts", "event_id"], band=16)
