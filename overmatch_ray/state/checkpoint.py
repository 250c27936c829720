"""Tracking store + resumable partitioned sink (D1/J5/T4 + SURVEY.md §4).

The reference keeps incremental state in DynamoDB: first_seen-preserving
upserts (/root/reference/api/db.py:54-91), a resume anti-join against
already-loaded ids (/root/reference/api/load_matches.py:105-142,176-183).
Our engine's equivalents are Parquet-backed and Ray-native:

- **tracking upsert (D1)**: union of tracking generations →
  groupby(element_id) → min(first_seen) / max(last_seen). A pure shuffle
  aggregate — no mutable store.
- **resumable partitioned sink**: output laid out as one Parquet file per
  partition (bucket), written atomically (tmp file + rename) with a
  sidecar manifest entry (partition key, row count, extra metrics). On
  restart, ``completed_partitions`` feeds an anti-join so finished buckets
  are skipped — "resume mid-shuffle" for a batch pipeline.
"""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import fsio


def upsert_tracking(ds, now_iso: str):
    """D1: merge tracking generations, preserving the earliest first_seen
    and taking the latest last_seen per element_id.

    ``ds`` has columns (element_id, first_seen, last_seen); rows seen in the
    current run should be appended beforehand with
    first_seen = last_seen = now_iso.

    Bucketed aggregate: element_id cardinality ≈ tracked-corpus size, and
    Ray's native aggregate reduce pays a per-group Python constant (see
    ``groupops.bucketed_aggregate``) — per-element min/max runs as one
    vectorized pandas groupby per hash bucket instead.
    """
    from ..stages.groupops import bucketed_aggregate

    return bucketed_aggregate(
        ds, ["element_id"],
        {"first_seen": ("first_seen", "min"),
         "last_seen": ("last_seen", "max")},
    )


class PartitionedSink:
    """Resumable per-partition Parquet writer used inside
    ``groupby(key).map_groups`` — each group becomes one atomic partition
    file plus a manifest entry.

    Layout:
        out_dir/part-<key>.parquet        (atomic: .tmp-* then rename)
        out_dir/_manifest/<key>.json      ({key, rows, metrics, complete})

    ``out_dir`` may be a plain local path OR any fsspec URI (``file://``,
    ``s3://``, …) — S16's object-store upload is this one config value
    (VERDICT r4 #7; see ``state.fsio`` for the URI atomicity contract).
    """

    def __init__(self, out_dir: str, key_col: str, scheme: "str | None" = None):
        self.out_dir = out_dir
        self.key_col = key_col
        fsio.makedirs(fsio.join(out_dir, "_manifest"))
        if scheme is not None:
            self._check_scheme(scheme)

    def _check_scheme(self, scheme: str) -> None:
        """Resume safety: the partition-key scheme (hash function, range
        layout, num_parts) is part of the manifest contract. A resume
        against a directory written under a DIFFERENT scheme would anti-join
        old 'complete' partition ids and silently never write rows the new
        scheme maps to them — so the scheme is stamped in a sentinel and a
        mismatch (or an unstamped non-empty manifest) refuses to resume."""
        spath = fsio.join(self.out_dir, "_manifest", "_scheme.json")
        if fsio.exists(spath):
            recorded = fsio.read_json(spath).get("scheme")
            if recorded != scheme:
                raise ValueError(
                    f"partition-scheme mismatch in {self.out_dir!r}: manifest "
                    f"was written under scheme {recorded!r}, current code uses "
                    f"{scheme!r}. Resuming would silently skip rows — use a "
                    "fresh out_dir (or delete the old output) instead."
                )
            return
        mdir = fsio.join(self.out_dir, "_manifest")
        if any(f.endswith(".json") for f in fsio.listdir(mdir)):
            raise ValueError(
                f"unversioned manifest in {self.out_dir!r} (written by "
                "pre-scheme-stamp code); cannot verify the partition scheme "
                f"matches {scheme!r}. Use a fresh out_dir."
            )
        fsio.write_json_atomic(spath, {"scheme": scheme})

    def completed_partitions(self) -> set:
        mdir = fsio.join(self.out_dir, "_manifest")
        done = set()
        if not fsio.isdir(mdir):
            return done
        for f in fsio.listdir(mdir):
            if f.endswith(".json"):
                try:
                    meta = fsio.read_json(fsio.join(mdir, f))
                except (json.JSONDecodeError, OSError, ValueError):
                    continue  # torn write: treat as incomplete
                if meta.get("complete"):
                    done.add(meta["key"])
        return done

    def write_group(self, group, metrics: dict | None = None) -> pa.Table:
        """map_groups body (Arrow in/out — VERDICT r4 #4: the partition
        block writes straight from the object store with no pandas
        round-trip; direct pandas callers still accepted): write one
        partition atomically, return a 1-row receipt (so the pipeline
        output is the manifest dataset)."""
        if isinstance(group, pd.DataFrame):
            group = pa.Table.from_pandas(group, preserve_index=False)
        group = group.replace_schema_metadata(None)
        key = group[self.key_col][0].as_py()
        fname = fsio.join(self.out_dir, f"part-{key}.parquet")
        with fsio.open_write_atomic(fname) as f:
            pq.write_table(group, f)
        manifest = {
            "key": int(key) if isinstance(key, int) else str(key),
            "rows": int(group.num_rows),
            "metrics": metrics or {},
            "complete": True,
        }
        fsio.write_json_atomic(
            fsio.join(self.out_dir, "_manifest", f"{key}.json"), manifest
        )
        return pa.table(
            {"key": pa.array([manifest["key"]]),
             "rows": pa.array([manifest["rows"]], pa.int64())}
        )


def write_partitioned_resumable(ds, out_dir: str, key_col: str,
                                scheme: "str | None" = None):
    """Write ``ds`` partitioned by ``key_col`` with resume: partitions whose
    manifest entry is already complete are filtered out BEFORE the shuffle
    (J5 anti-join), the rest are grouped and written atomically.

    ``scheme`` names the partition-key derivation (hash fn + layout +
    part count); pass it from any caller whose key is a computed hash/range
    so a resume against an out_dir written under a different derivation is
    refused instead of silently dropping rows.

    Returns the receipt dataset (one row per newly-written partition).
    """
    sink = PartitionedSink(out_dir, key_col, scheme=scheme)
    done = sink.completed_partitions()
    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(list(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch[key_col], value_set=done_arr))
            )

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds.groupby(key_col).map_groups(
        sink.write_group, batch_format="pyarrow"
    )


def read_partitioned(out_dir: str):
    """Read back a partitioned output (only completed partitions). Honors
    the optional manifest ``file`` field (set by ``compact_partitions``
    when several keys share one compacted file) and deduplicates paths."""
    import ray.data

    mdir = fsio.join(out_dir, "_manifest")
    entries = []
    for f in fsio.listdir(mdir):
        if f.endswith(".json") and not f.startswith("_"):
            try:
                m = fsio.read_json(fsio.join(mdir, f))
            except (json.JSONDecodeError, OSError, ValueError):
                continue
            if m.get("complete"):
                entries.append(m)
    files, seen = [], set()
    for m in sorted(entries, key=lambda m: str(m["key"])):
        fname = m.get("file", f"part-{m['key']}.parquet")
        if fname not in seen:
            seen.add(fname)
            files.append(fsio.ray_path(fsio.join(out_dir, fname)))
    from ..sources import read_parquet_clean

    return read_parquet_clean(files)


def compact_partitions(out_dir: str, target_rows: int = 500_000):
    """Small-file COMPACTION of a resumable partitioned output (the
    maintenance half of the checkpoint story): completed part files are
    greedily bin-packed in key order into ~``target_rows`` files, each
    bin rewritten by its own Ray task, then the directory is atomically
    swapped. The scheme stamp gains a ``+compacted`` suffix so a writer
    built for the PRE-compaction layout refuses to resume into it (the
    ADVICE scheme-mismatch rule) — compaction is a terminal layout
    change, not a resume point. Per-key manifests are preserved (reads
    and anti-join resume sets still see every original key).

    Returns {"files_before", "files_after", "rows"}."""
    import ray

    if "://" in str(out_dir):
        raise NotImplementedError(
            "compact_partitions swaps directories with os.replace — run it "
            "against local storage, then sync the compacted layout to the "
            "object store (the sink itself accepts URIs; see state.fsio)"
        )
    mdir = os.path.join(out_dir, "_manifest")
    spath = os.path.join(mdir, "_scheme.json")
    scheme = None
    if os.path.exists(spath):
        scheme = json.load(open(spath)).get("scheme")
    manifests = []
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json") and not f.startswith("_"):
            m = json.load(open(os.path.join(mdir, f)))
            if m.get("complete"):
                manifests.append(m)
    manifests.sort(key=lambda m: (isinstance(m["key"], str), m["key"]))
    files_before = [
        os.path.join(out_dir, f"part-{m['key']}.parquet") for m in manifests
    ]

    # greedy key-ordered bin pack
    bins, cur, cur_rows = [], [], 0
    for m in manifests:
        cur.append(m)
        cur_rows += m["rows"]
        if cur_rows >= target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
    if cur:
        bins.append(cur)

    @ray.remote
    def compact_bin(paths: "list[str]", dest: str) -> int:
        tables = [pq.read_table(p) for p in paths]
        t = pa.concat_tables(tables, promote_options="default")
        tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp)
        os.replace(tmp, dest)
        return t.num_rows

    new_dir = out_dir + f".compact-{uuid.uuid4().hex[:8]}"
    os.makedirs(os.path.join(new_dir, "_manifest"), exist_ok=True)
    futures = []
    for b in bins:
        k0, k1 = b[0]["key"], b[-1]["key"]
        dest = os.path.join(new_dir, f"part-{k0}-{k1}.parquet")
        futures.append(compact_bin.remote(
            [os.path.join(out_dir, f"part-{m['key']}.parquet") for m in b],
            dest,
        ))
    rows = sum(ray.get(futures))
    # per-key manifests carry over, now pointing at their bin file (the
    # resume anti-join set is unchanged; readers dedupe shared files)
    for b in bins:
        k0, k1 = b[0]["key"], b[-1]["key"]
        for m in b:
            m = dict(m, file=f"part-{k0}-{k1}.parquet")
            with open(os.path.join(new_dir, "_manifest",
                                   f"{m['key']}.json"), "w") as f:
                json.dump(m, f)
    new_scheme = (scheme or "unstamped") + "+compacted/v1"
    with open(os.path.join(new_dir, "_manifest", "_scheme.json"), "w") as f:
        json.dump({"scheme": new_scheme}, f)
    # atomic swap: old dir moved aside, new dir takes its place
    old = out_dir + f".pre-compact-{uuid.uuid4().hex[:8]}"
    os.replace(out_dir, old)
    os.replace(new_dir, out_dir)
    import shutil

    shutil.rmtree(old)
    return {
        "files_before": len(files_before),
        "files_after": len(bins),
        "rows": rows,
    }
