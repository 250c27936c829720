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
        ("matches_sink", s_matches_sink),
    ]
