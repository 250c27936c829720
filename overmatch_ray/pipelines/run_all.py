"""The batch-lifecycle runner — §2.10 pipeline-step API / §3.1 `run_all`.

The reference drives its nightly rebuild as an ordered list of subprocess
stages (/root/reference/scripts/run_all.py:48-53) and appends per-stage
wall times to a timing log (scripts/match.py:500-541). The engine analog is
declarative: a list of named stages, each a callable over a shared context
dict of Datasets/artifacts, with

- per-stage wall-time instrumentation appended to ``timing.jsonl`` (the
  ``match_timing.log`` analog — append-only, one JSON object per stage);
- stage-level RESUME: each completed stage writes a receipt file; a rerun
  skips receipted stages (run_all's step gating, made crash-safe);
- ``only`` / ``skip`` filters (the reference's comment-out-a-step workflow,
  without editing code).

Stages communicate through the context dict — typically lazy Datasets, so
the runner adds no materialization of its own; a stage decides what to
execute/write.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

Stage = tuple[str, Callable[[dict], dict]]


def run_pipeline(
    stages: "list[Stage]",
    ctx: dict,
    out_dir: str,
    only: "set[str] | None" = None,
    skip: "set[str] | None" = None,
    resume: bool = True,
) -> "list[dict]":
    """Execute stages in order. Returns one receipt dict per executed or
    skipped stage. Receipts persist under ``out_dir/_stages`` so a rerun
    after a crash continues from the first unreceipted stage."""
    os.makedirs(os.path.join(out_dir, "_stages"), exist_ok=True)
    timing_path = os.path.join(out_dir, "timing.jsonl")
    receipts: list[dict] = []
    for name, fn in stages:
        if (only is not None and name not in only) or (skip and name in skip):
            receipts.append({"stage": name, "status": "filtered"})
            continue
        receipt_path = os.path.join(out_dir, "_stages", f"{name}.json")
        if resume and os.path.exists(receipt_path):
            receipts.append(json.load(open(receipt_path)))
            continue
        t0 = time.time()
        summary = fn(ctx) or {}
        elapsed = round(time.time() - t0, 3)
        receipt = {"stage": name, "status": "done", "sec": elapsed, **summary}
        # commit the receipt FIRST (atomic rename), then append the timing
        # line — a crash between the two loses one advisory log line
        # instead of duplicating it on rerun
        tmp = receipt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(receipt, f)
        os.replace(tmp, receipt_path)  # atomic: crash mid-stage leaves no receipt
        with open(timing_path, "a") as f:  # append-only timing log
            f.write(json.dumps(receipt, sort_keys=True) + "\n")
        receipts.append(receipt)
    return receipts


def flagship_stages(
    sf_dir: str,
    out_dir: str,
    zooms: "list[int]" = (8, 12),
    max_per_tile: int = 200,
    num_buckets: int = 64,
) -> "list[Stage]":
    """The reference's nightly rebuild (§3.1/§3.2) as declarative stages:
    conflate → merge → tiles → pmtiles artifact → matches sink.

    Every stage fetches its inputs through ``_ensure_*`` providers that
    recompute missing ctx entries, so resuming after a crash (receipted
    stages skipped, fresh empty ctx) still works: a later stage rebuilds
    the lazy inputs it needs without re-running the receipted stages'
    SIDE EFFECTS (sinks/artifacts are what receipts actually gate)."""

    def _ensure_matches(ctx: dict):
        if "matches" not in ctx:
            from .conflate import flagship_matches

            ctx["matches"] = flagship_matches(
                sf_dir, num_buckets=num_buckets
            ).materialize()
        return ctx["matches"]

    def _ensure_tiles(ctx: dict):
        if "tiles" not in ctx:
            from ..stages.tiles import build_tiles

            ctx["tiles"] = build_tiles(
                _ensure_matches(ctx), zooms=list(zooms), max_per_tile=max_per_tile
            ).materialize()
        return ctx["tiles"]

    def s_conflate(ctx: dict) -> dict:
        return {"n_matches": _ensure_matches(ctx).count()}

    def s_merge(ctx: dict) -> dict:
        from ..stages.enrich import merge_matches

        ctx["merged"] = merge_matches(_ensure_matches(ctx)).materialize()
        return {"n_elements": ctx["merged"].count()}

    def s_tiles(ctx: dict) -> dict:
        return {"n_tiles": _ensure_tiles(ctx).count()}

    def s_pmtiles(ctx: dict) -> dict:
        from ..stages.pmtiles import write_pmtiles

        return write_pmtiles(
            _ensure_tiles(ctx), os.path.join(out_dir, "tiles.pmtiles")
        )

    def s_heat_raster(ctx: dict) -> dict:
        # raster twin of the MVT artifact: match density as z{max_zoom}
        # PNG heat tiles in one PMTiles(png) archive
        from ..stages.pmtiles import write_pmtiles
        from ..stages.tiles import build_raster_heat_tiles

        rasters = build_raster_heat_tiles(
            _ensure_matches(ctx), zoom=max(zooms)
        )
        return write_pmtiles(
            rasters, os.path.join(out_dir, "heat.pmtiles"),
            tile_type="png", tile_col="png",
        )

    def s_matches_sink(ctx: dict) -> dict:
        import shutil

        from ..sources import write_matches_jsonl

        # write into a stage-temp directory and atomically swap it in: a
        # crash mid-write leaves only the temp dir, so a resumed
        # (unreceipted) rerun can never mix two attempts' uuid part files
        final = os.path.join(out_dir, "matches")
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        parts = write_matches_jsonl(_ensure_matches(ctx), tmp).take_all()
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        return {"n_parts": len(parts), "n_rows": sum(p["rows"] for p in parts)}

    return [
        ("conflate", s_conflate),
        ("merge", s_merge),
        ("tiles", s_tiles),
        ("pmtiles", s_pmtiles),
        ("heat_raster", s_heat_raster),
        ("matches_sink", s_matches_sink),
    ]


def corpus_stages(
    sf_dir: str,
    out_dir: str,
    benchmark_ds=None,
    budget: int = 4096,
    fractions: "dict[str, float] | None" = None,
    lsh_threshold: float = 0.5,
    num_buckets: int = 32,
    segment_window: "int | None" = None,
    mix: "tuple[dict, float] | None" = None,
    lm_prune: "float | None" = None,
) -> "list[Stage]":
    """The text-axis nightly: the full training-corpus prep chain as
    declarative resumable stages —

        filter (quality + langid) → dedup (exact fingerprint + minhash-LSH
        near-dup clusters) [→ segment_dedup] → scrub (decontaminate + PII
        redaction) [→ mix] → split_pack (train/val/test + per-split
        token-budget shards) → shards_sink (resumable
        split-shard-partitioned parquet)

    Opt-in stages (all default OFF, stage list unchanged otherwise):
    ``lm_prune=p`` inserts bigram-LM perplexity pruning after scrubbing:
    documents score under the corpus's OWN add-one bigram model
    (stages.textstats.bigram_lm_scores — exact int64 quantized terms),
    and each language keeps only docs at or above its p-quantile of
    per-bigram mean score (filter_by_group_quantile — the calibrated
    FineWeb-style cut, so a global threshold can't wipe out a
    low-resource language);
    ``segment_window`` inserts C4-style sub-document dedup
    (stages.dedup.segment_dedup) after document-level dedup, rewriting
    text and recomputing n_tokens; ``mix=(target_weights,
    budget_fraction)`` inserts static data-mixture resampling
    (stages.splits.domain_mix) on the DETECTED language after scrubbing,
    so packing sees the rebalanced corpus.

    Same contract as ``flagship_stages``: every stage fetches inputs via
    ``_ensure_*`` providers so a resumed run (receipted stages skipped,
    empty ctx) rebuilds lazy inputs without re-running receipted sinks.
    ``benchmark_ds`` is the eval set for decontamination (None → stage
    records skipped). The near-dup DROP set is collected on the driver —
    bounded by the pair graph, same contract as ``dedup_clusters``'s
    broadcast path; swap in ``joins.semi_join_shuffled`` if a corpus's
    near-dup fraction is ever corpus-scale."""
    import pandas as pd
    import pyarrow as pa

    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}

    def _ensure_docs(ctx: dict):
        if "docs" not in ctx:
            from ..sources import read_parquet_clean
            from ..stages.textstats import langid_batch, quality_batch

            ds = read_parquet_clean(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text"],
            )
            ctx["n_in"] = ds.count()
            ds = (
                ds.map_batches(quality_batch, batch_format="pyarrow")
                .filter(expr="quality_keep == True")
                .map_batches(langid_batch, batch_format="pyarrow")
                .select_columns(["doc_id", "text", "lang_pred", "n_tokens"])
            )
            ctx["docs"] = ds.materialize()
        return ctx["docs"]

    def _ensure_unique(ctx: dict):
        if "unique" not in ctx:
            from ..stages.dedup import dedup_clusters, minhash_lsh_pairs
            from ..stages.groupops import bucketed_group_apply
            from ..stages.joins import semi_join_filter
            from ..stages.textstats import fingerprint_batch

            fp = _ensure_docs(ctx).map_batches(
                fingerprint_batch, batch_format="pyarrow"
            )

            def keep_min_id(g: pd.DataFrame) -> pd.DataFrame:
                return g.sort_values(
                    ["fingerprint", "doc_id"], kind="mergesort"
                ).drop_duplicates("fingerprint", keep="first")

            exact = bucketed_group_apply(
                fp, ["fingerprint"], keep_min_id, num_buckets=num_buckets
            ).drop_columns(["fingerprint", "prefix_key"]).materialize()
            ctx["n_after_exact"] = exact.count()

            pairs = minhash_lsh_pairs(exact, threshold=lsh_threshold)
            clusters = dedup_clusters(pairs, num_buckets=num_buckets)
            drop = {
                r["doc_id"]
                for r in clusters.take_all()  # bounded by the pair graph
                if r["doc_id"] != r["cluster_id"]
            }
            ctx["unique"] = (
                semi_join_filter(exact, drop, "doc_id", anti=True).materialize()
                if drop
                else exact
            )
        return ctx["unique"]

    def _ensure_segmented(ctx: dict):
        """unique docs with sub-document dedup applied (or passthrough):
        segment_dedup emits (doc_id, text_dedup) — lang_pred rides back
        via a bucketed join, n_tokens is recomputed on the rewritten
        text so packing budgets stay honest."""
        if not segment_window:
            return _ensure_unique(ctx)
        if "seg" not in ctx:
            from ..stages.dedup import segment_dedup
            from ..stages.joins import bucket_hash_join
            from ..stages.textstats import token_count_batch

            uniq = _ensure_unique(ctx)
            seg = segment_dedup(
                uniq, "text", "doc_id", window=segment_window,
                num_buckets=num_buckets,
            ).materialize()

            def langs_only(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "doc_id": batch["doc_id"],
                    "lang_pred": batch["lang_pred"],
                })

            joined = bucket_hash_join(
                seg, uniq.map_batches(langs_only, batch_format="pyarrow"),
                "doc_id", "doc_id", num_buckets=num_buckets,
            )

            def finish(batch: pa.Table) -> pa.Table:
                t = pa.table({
                    "doc_id": batch["doc_id"],
                    "text": batch["text_dedup"],
                    "lang_pred": batch["lang_pred"],
                })
                return token_count_batch(t)

            ctx["seg"] = joined.map_batches(
                finish, batch_format="pyarrow"
            ).materialize()
        return ctx["seg"]

    def _ensure_clean(ctx: dict):
        if "clean" not in ctx:
            from ..stages.pii import redact_pii

            ds = _ensure_segmented(ctx)
            if benchmark_ds is not None:
                import ray

                from ..stages.decontam import benchmark_gram_set, doc_ngram_hashes

                bench_ref = ray.put(benchmark_gram_set(benchmark_ds, n=8))
                cache: dict = {}

                def drop_contaminated(batch: pa.Table) -> pa.Table:
                    import numpy as np

                    if "b" not in cache:
                        cache["b"] = ray.get(bench_ref)
                    d_idx, grams = doc_ngram_hashes(batch, "text", 8)
                    bad = np.zeros(batch.num_rows, dtype=bool)
                    if grams.size and cache["b"].size:
                        hit = np.isin(grams, cache["b"])
                        bad[np.unique(d_idx[hit])] = True
                    return batch.filter(pa.array(~bad))

                ds = ds.map_batches(drop_contaminated, batch_format="pyarrow")
            ctx["clean"] = redact_pii(ds).materialize()
        return ctx["clean"]

    def _ensure_lm_pruned(ctx: dict):
        """scrubbed docs after bigram-LM perplexity pruning (or
        passthrough): per-doc mean quantized log-prob (score_q //
        n_bigrams — integer, order-free), calibrated per detected
        language so the cut is relative to each language's own
        distribution; docs with no bigram (length < 2) carry the
        minimum score and fall to the cut when lm_prune > 0."""
        if not lm_prune:
            return _ensure_clean(ctx)
        if "lm_pruned" not in ctx:
            from ..stages.groupops import filter_by_group_quantile
            from ..stages.joins import bucket_hash_join
            from ..stages.textstats import bigram_lm_scores

            clean = _ensure_clean(ctx)
            scores = bigram_lm_scores(clean, "text", "doc_id")

            def per_bigram(batch: pa.Table) -> pa.Table:
                import numpy as np

                q = batch["score_q"].to_numpy(zero_copy_only=False)
                n = batch["n_bigrams"].to_numpy(zero_copy_only=False)
                return pa.table({
                    "doc_id": batch["doc_id"],
                    "lm_q": pa.array(
                        (q // np.maximum(n, 1)).astype(np.int64)),
                })

            joined = bucket_hash_join(
                clean,
                scores.map_batches(per_bigram, batch_format="pyarrow"),
                "doc_id", "doc_id", num_buckets=num_buckets, how="left",
            )

            def fill_min(batch: pa.Table) -> pa.Table:
                import numpy as np

                v = batch["lm_q"].to_numpy(zero_copy_only=False)
                v = np.where(
                    pd.isna(v), np.iinfo(np.int64).min, v
                ).astype(np.int64)
                return batch.set_column(
                    batch.column_names.index("lm_q"), "lm_q", pa.array(v))

            filled = joined.map_batches(fill_min, batch_format="pyarrow")
            ctx["lm_pruned"] = filter_by_group_quantile(
                filled, "lang_pred", "lm_q", lm_prune, keep="ge",
                num_buckets=num_buckets,
            ).drop_columns(["lm_q"]).materialize()
        return ctx["lm_pruned"]

    def _ensure_mixed(ctx: dict):
        """scrubbed docs after static-mixture resampling (or passthrough):
        domain_mix on the DETECTED language, keep-rates from measured
        token mass."""
        if not mix:
            return _ensure_lm_pruned(ctx)
        if "mixed" not in ctx:
            from ..stages.splits import domain_mix

            weights, bf = mix
            ctx["mixed"] = domain_mix(
                _ensure_lm_pruned(ctx), "doc_id", "lang_pred", "n_tokens",
                target_weights=weights, budget_fraction=bf,
            ).materialize()
        return ctx["mixed"]

    def _ensure_packed(ctx: dict):
        if "packed" not in ctx:
            from ..stages.joins import bucket_hash_join
            from ..stages.splits import pack_sequences, split_assign

            tagged = split_assign(_ensure_mixed(ctx), "doc_id").materialize()
            parts = []
            for split in fractions:
                sub = tagged.filter(expr=f"split == '{split}'")
                shards = pack_sequences(
                    sub.select_columns(["doc_id", "n_tokens"]),
                    "doc_id", "n_tokens", budget=budget,
                    num_buckets=num_buckets,
                ).drop_columns(["n_tokens"])

                def rename(batch: pa.Table, _s=split) -> pa.Table:
                    return batch.rename_columns(["__rid", "shard_id"])

                joined = bucket_hash_join(
                    sub,
                    shards.map_batches(rename, batch_format="pyarrow"),
                    left_on="doc_id", right_on="__rid",
                    num_buckets=num_buckets,
                ).drop_columns(["__rid"])

                def add_part(batch: pa.Table, _s=split) -> pa.Table:
                    ids = batch["shard_id"].to_pylist()
                    return batch.append_column(
                        "part",
                        pa.array([f"{_s}-{i:05d}" for i in ids], pa.string()),
                    )

                parts.append(
                    joined.map_batches(add_part, batch_format="pyarrow")
                )
            ds = parts[0]
            for p in parts[1:]:
                ds = ds.union(p)
            ctx["packed"] = ds.materialize()
        return ctx["packed"]

    def s_filter(ctx: dict) -> dict:
        n_kept = _ensure_docs(ctx).count()
        return {"n_in": ctx.get("n_in"), "n_kept": n_kept}

    def s_dedup(ctx: dict) -> dict:
        n = _ensure_unique(ctx).count()
        return {"n_after_exact": ctx.get("n_after_exact"), "n_unique": n}

    def s_scrub(ctx: dict) -> dict:
        n = _ensure_clean(ctx).count()
        return {"n_clean": n, "decontaminated": benchmark_ds is not None}

    def s_split_pack(ctx: dict) -> dict:
        return {"n_rows": _ensure_packed(ctx).count()}

    def s_shards_sink(ctx: dict) -> dict:
        from ..state.checkpoint import write_partitioned_resumable

        receipts = write_partitioned_resumable(
            _ensure_packed(ctx),
            os.path.join(out_dir, "shards"),
            "part",
            scheme=f"corpus-pack:budget={budget}:v1",
        ).take_all()
        return {
            "n_partitions": len(receipts),
            "n_rows": sum(r["rows"] for r in receipts),
        }

    def s_segment(ctx: dict) -> dict:
        return {"n_docs": _ensure_segmented(ctx).count(),
                "window": segment_window}

    def s_mix(ctx: dict) -> dict:
        return {"n_docs": _ensure_mixed(ctx).count()}

    def s_lm_prune(ctx: dict) -> dict:
        return {"n_docs": _ensure_lm_pruned(ctx).count(), "p": lm_prune}

    stages: "list[Stage]" = [
        ("filter", s_filter),
        ("dedup", s_dedup),
    ]
    if segment_window:
        stages.append(("segment_dedup", s_segment))
    stages.append(("scrub", s_scrub))
    if lm_prune:
        stages.append(("lm_prune", s_lm_prune))
    if mix:
        stages.append(("mix", s_mix))
    stages += [
        ("split_pack", s_split_pack),
        ("shards_sink", s_shards_sink),
    ]
    return stages


def main(argv: "list[str] | None" = None) -> int:
    """``ray job submit``-style entrypoint: the whole nightly as one driver
    script. On a real cluster:

        ray job submit --address http://head:8265 -- \\
            python -m overmatch_ray.pipelines.run_all \\
            --sf-dir /data/sf1 --out /artifacts/nightly --pipeline both

    Locally (and in tests) it runs against an auto-initialized local Ray.
    Owns its Ray session ONLY when none exists (the driver-contract rule:
    library code never calls ray.init; this is a __main__ script)."""
    import argparse

    p = argparse.ArgumentParser(prog="overmatch-ray-nightly")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True, help="artifact/receipt directory")
    p.add_argument("--pipeline", choices=["flagship", "corpus", "both"],
                   default="flagship")
    p.add_argument("--only", default="", help="comma list of stage names")
    p.add_argument("--skip", default="", help="comma list of stage names")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing stage receipts")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--segment-window", type=int, default=0,
                   help="corpus: insert sub-document segment dedup at this "
                        "token window (0 = off)")
    p.add_argument("--mix", default="",
                   help="corpus: insert static data-mixture resampling — "
                        "'bf:lang=w,lang=w' e.g. '0.6:en=0.4,de=0.3,fr=0.3'")
    p.add_argument("--lm-prune", type=float, default=0.0,
                   help="corpus: insert bigram-LM perplexity pruning — keep "
                        "docs at/above this per-language score quantile "
                        "(0 = off)")
    args = p.parse_args(argv)

    mix = None
    if args.mix:
        bf_s, _, ws = args.mix.partition(":")
        weights = dict(
            (k, float(v)) for k, v in
            (pair.split("=", 1) for pair in ws.split(",") if pair)
        )
        mix = (weights, float(bf_s))

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    only = set(s for s in args.only.split(",") if s) or None
    skip = set(s for s in args.skip.split(",") if s)
    stage_lists: list = []
    if args.pipeline in ("flagship", "both"):
        stage_lists.append(("flagship", flagship_stages(
            args.sf_dir, os.path.join(args.out, "flagship"),
            num_buckets=args.num_buckets)))
    if args.pipeline in ("corpus", "both"):
        stage_lists.append(("corpus", corpus_stages(
            args.sf_dir, os.path.join(args.out, "corpus"),
            segment_window=args.segment_window or None, mix=mix,
            lm_prune=args.lm_prune or None)))

    rc = 0
    for name, stages in stage_lists:
        out_dir = os.path.join(args.out, name)
        receipts = run_pipeline(stages, {}, out_dir, only=only, skip=skip,
                                resume=not args.no_resume)
        for r in receipts:
            print(json.dumps({"pipeline": name, **r}, sort_keys=True))
        if any(r.get("status") not in ("done", "filtered") for r in receipts):
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
