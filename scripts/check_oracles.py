"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count, sorted
columns, order-insensitive value hash)."""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            ours = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(ours)} rows, cols={sorted(ours.columns)}")
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {e}")
            failures += 1
            continue
        ok_rows = len(ours) == len(theirs)
        ok_cols = sorted(ours.columns) == sorted(theirs.columns)
        ok_hash = ok_rows and ok_cols and value_hash(ours) == value_hash(theirs)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if not (ok_rows and ok_cols and ok_hash):
            failures += 1
        print(
            f"{status} {name}: rows {len(ours)}/{len(theirs)} cols_match={ok_cols} hash_match={ok_hash}"
        )
        if not ok_hash and ok_rows and ok_cols and len(ours) < 10000:
            a = ours[sorted(ours.columns)].astype(str).apply(tuple, axis=1)
            b = theirs[sorted(theirs.columns)].astype(str).apply(tuple, axis=1)
            sa, sb = set(a), set(b)
            diff = list(sa ^ sb)[:4]
            for d in diff:
                side = "ours" if d in sa else "oracle"
                print(f"        diff({side}): {d}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
