"""Local mimic of the driver's correctness gate: run each queries()
entry at a given sf and compare against oracle_sql() via DuckDB —
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    import time

    import ray

    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    if "--determinism" in args:
        args.remove("--determinism")
        sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
        only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)
        sys.exit(1 if check_determinism(sf_dir, only or None) else 0)
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    # image oracle fixture must match the sf under test (driver default sf0.01)
    os.environ["GEOMEDEA_SF_DIR"] = sf_dir

    import __ray_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    results: dict[str, dict] = {}

    def _rec(name, **kw):
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "wall_s": None}
        row.update(kw)
        results[name] = row

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL {name}: ray error {type(exc).__name__}: {exc}")
            _rec(name, err=f"ray_error: {type(exc).__name__}")
            n_fail += 1
            continue
        dt = round(time.time() - t0, 2)
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            _rec(name, spark_rows=len(got), err="no_oracle", wall_s=dt)
            n_pass += 1
            continue
        want = con.execute(sqls[name]).fetchdf()
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}")
            _rec(name, schema_match=False, spark_rows=len(got),
                 oracle_rows=len(want), wall_s=dt)
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            _rec(name, rows_match=False, schema_match=True,
                 spark_rows=len(got), oracle_rows=len(want), wall_s=dt)
            n_fail += 1
            continue
        gh, wh = value_hash(got), value_hash(want)
        if gh != wh:
            print(f"FAIL {name}: value hash {gh} vs {wh}")
            merged = got[sorted(got.columns)].astype(str).value_counts().subtract(
                want[sorted(want.columns)].astype(str).value_counts(), fill_value=0
            )
            print(merged[merged != 0].head(6))
            _rec(name, rows_match=True, schema_match=True, hash_match=False,
                 spark_rows=len(got), oracle_rows=len(want), wall_s=dt)
            n_fail += 1
            continue
        print(f"ok   {name}: {len(got)} rows, hash match ({dt:.1f}s)")
        _rec(name, rows_match=True, schema_match=True, hash_match=True,
             spark_rows=len(got), oracle_rows=len(want), wall_s=dt)
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} queries)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)




def check_determinism(sf_dir: str, only=None):
    """Run every queries() entry TWICE and compare value hashes —
    catches partitioning/order nondeterminism the single-run gate
    can't see. Usage: python tools/check_correctness.py --determinism [sf_dir]"""
    import time

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    qs = E.queries()
    bad = checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        h1 = value_hash(to_pandas(fn(sf_dir)))
        h2 = value_hash(to_pandas(fn(sf_dir)))
        ok = h1 == h2
        bad += not ok
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {'deterministic' if ok else f'{h1} != {h2}'} ({time.time()-t0:.1f}s)")
    print(f"\n{checked - bad} deterministic, {bad} nondeterministic")
    ray.shutdown()
    return bad


if __name__ == "__main__":
    main()
