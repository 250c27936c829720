"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB — row count,
schema (sorted column names), and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = canon(df)
    # round floats defensively the way a sane driver would
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    # GRAFT_CHECK_CPUS: run the gate at a different parallelism (e.g. 2 or
    # 32) as an end-to-end partition-invariance sweep — every oracle hash
    # must be identical at any level
    ray.init(address="local",
             num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    con = duckdb.connect()
    # bound DuckDB's buffer pool and give it a spill path: a heavy oracle
    # (label_propagation's 256M-row dot join at sf0.1) running next to the
    # live Ray session once drove the box to a hard malloc failure in the
    # NEXT query's oracle — spilling is the correct degradation
    con.execute("SET memory_limit='16GB'")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = m.queries()
    oracles = m.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: engine raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(mine)} rows ({el:.1f}s) [rows-only]")
            n_pass += 1
            continue
        try:
            theirs = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(theirs):
            problems.append(f"rows {len(mine)} != {len(theirs)}")
        if sorted(mine.columns) != sorted(theirs.columns):
            problems.append(
                f"schema {sorted(mine.columns)} != {sorted(theirs.columns)}"
            )
        if not problems and value_hash(mine) != value_hash(theirs):
            problems.append("value-hash mismatch")
            a, b = canon(mine), canon(theirs)
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and len(diff):
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(mine)} rows ({el:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
