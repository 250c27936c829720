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


def upsert_tracking(ds, now_iso: str):
    """D1: merge tracking generations, preserving the earliest first_seen
    and taking the latest last_seen per element_id.

    ``ds`` has columns (element_id, first_seen, last_seen); rows seen in the
    current run should be appended beforehand with
    first_seen = last_seen = now_iso.
    """
    from ray.data.aggregate import Max, Min

    return ds.groupby("element_id").aggregate(
        Min("first_seen", alias_name="first_seen"),
        Max("last_seen", alias_name="last_seen"),
    )


class PartitionedSink:
    """Resumable per-partition Parquet writer used inside
    ``groupby(key).map_groups`` — each group becomes one atomic partition
    file plus a manifest entry.

    Layout:
        out_dir/part-<key>.parquet        (atomic: .tmp-* then rename)
        out_dir/_manifest/<key>.json      ({key, rows, metrics, complete})
    """

    def __init__(self, out_dir: str, key_col: str, scheme: "str | None" = None):
        self.out_dir = out_dir
        self.key_col = key_col
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
        if scheme is not None:
            self._check_scheme(scheme)

    def _check_scheme(self, scheme: str) -> None:
        """Resume safety: the partition-key scheme (hash function, range
        layout, num_parts) is part of the manifest contract. A resume
        against a directory written under a DIFFERENT scheme would anti-join
        old 'complete' partition ids and silently never write rows the new
        scheme maps to them — so the scheme is stamped in a sentinel and a
        mismatch (or an unstamped non-empty manifest) refuses to resume."""
        spath = os.path.join(self.out_dir, "_manifest", "_scheme.json")
        if os.path.exists(spath):
            recorded = json.load(open(spath)).get("scheme")
            if recorded != scheme:
                raise ValueError(
                    f"partition-scheme mismatch in {self.out_dir!r}: manifest "
                    f"was written under scheme {recorded!r}, current code uses "
                    f"{scheme!r}. Resuming would silently skip rows — use a "
                    "fresh out_dir (or delete the old output) instead."
                )
            return
        mdir = os.path.join(self.out_dir, "_manifest")
        if any(f.endswith(".json") for f in os.listdir(mdir)):
            raise ValueError(
                f"unversioned manifest in {self.out_dir!r} (written by "
                "pre-scheme-stamp code); cannot verify the partition scheme "
                f"matches {scheme!r}. Use a fresh out_dir."
            )
        tmp = spath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"scheme": scheme}, f)
        os.replace(tmp, spath)

    def completed_partitions(self) -> set:
        mdir = os.path.join(self.out_dir, "_manifest")
        done = set()
        if not os.path.isdir(mdir):
            return done
        for f in os.listdir(mdir):
            if f.endswith(".json"):
                try:
                    meta = json.load(open(os.path.join(mdir, f)))
                except (json.JSONDecodeError, OSError):
                    continue  # torn write: treat as incomplete
                if meta.get("complete"):
                    done.add(meta["key"])
        return done

    def write_group(self, group: pd.DataFrame, metrics: dict | None = None) -> pd.DataFrame:
        """map_groups body: write one partition atomically, return a
        1-row receipt (so the pipeline output is the manifest dataset)."""
        key = group[self.key_col].iloc[0]
        fname = os.path.join(self.out_dir, f"part-{key}.parquet")
        tmp = fname + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(pa.Table.from_pandas(group, preserve_index=False), tmp)
        os.replace(tmp, fname)  # atomic on POSIX
        manifest = {
            "key": int(key) if hasattr(key, "item") or isinstance(key, int) else str(key),
            "rows": int(len(group)),
            "metrics": metrics or {},
            "complete": True,
        }
        mpath = os.path.join(self.out_dir, "_manifest", f"{key}.json")
        mtmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return pd.DataFrame({"key": [manifest["key"]], "rows": [manifest["rows"]]})


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
    return ds.groupby(key_col).map_groups(sink.write_group, batch_format="pandas")


def read_partitioned(out_dir: str):
    """Read back a partitioned output (only completed partitions)."""
    import ray.data

    sink = PartitionedSink(out_dir, "")
    files = [
        os.path.join(out_dir, f"part-{k}.parquet")
        for k in sorted(sink.completed_partitions(), key=str)
    ]
    from ..sources import read_parquet_clean

    return read_parquet_clean(files)
