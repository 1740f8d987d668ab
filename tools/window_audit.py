"""Audit the driver's 50-entry correctness window (round-4 VERDICT
item 4).

The driver gate only verifies the FIRST 50 ``queries()`` entries each
round (CLAUDE.md round-4 rule), so registry entries can silently live
their whole life outside the window. This tool reports:

1. the current window (first 50 registry keys) and what sits just past
   the cutoff;
2. every registry entry that has NEVER appeared in any round's driver
   artifact (union of CORRECTNESS_r01..r0N.json keys) — the set that
   must reach 0 by end of round (ROUND5.md);
3. eviction-invariant violations: an entry in a past artifact that is
   now outside the window but was never driver-green (rows+schema+hash
   or rows-only pass) in any round — rotating out a never-green row
   hides a regression.

Usage: python tools/window_audit.py [--repo /root/repo] [--window 50]
Exit code 1 if any never-windowed entries remain (CI-style gate).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

WINDOW = 50


def load_artifacts(repo: str) -> dict[str, dict]:
    """round tag -> {query: result} for every CORRECTNESS_rNN.json."""
    out = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r[0-9]*.json"))):
        tag = os.path.basename(path).split(".")[0].replace("CORRECTNESS_", "")
        if "FULL" in tag:
            continue
        with open(path) as f:
            out[tag] = json.load(f)
    return out


def registry_keys(repo: str) -> list[str]:
    sys.path.insert(0, repo)
    import __ray_entry__

    return list(__ray_entry__.queries().keys())


def is_green(res: dict) -> bool:
    """Driver-green: no error, rows match; hash/schema match when the
    query is SQL-oracled. Rows-only entries (deliberately no
    oracle_sql) are recorded as err='no_oracle' with spark_rows — they
    pass when the pipeline ran and produced rows."""
    if res.get("err") == "no_oracle":
        return bool(res.get("spark_rows"))
    if res.get("err"):
        return False
    if not res.get("rows_match"):
        return False
    for k in ("schema_match", "hash_match"):
        v = res.get(k)
        if v is False:
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--window", type=int, default=WINDOW)
    args = ap.parse_args()

    keys = registry_keys(args.repo)
    window = keys[: args.window]
    artifacts = load_artifacts(args.repo)

    ever_windowed: set[str] = set()
    ever_green: set[str] = set()
    for results in artifacts.values():
        for q, res in results.items():
            ever_windowed.add(q)
            if is_green(res):
                ever_green.add(q)

    never_windowed = [k for k in keys if k not in ever_windowed and k not in window]
    pending = [k for k in window if k not in ever_windowed]
    evicted_never_green = sorted(
        q for q in ever_windowed if q not in window and q in set(keys) and q not in ever_green
    )
    stale_artifact_keys = sorted(q for q in ever_windowed if q not in keys)

    print(f"registry entries : {len(keys)}")
    print(f"window size      : {args.window}")
    print(f"rounds seen      : {', '.join(artifacts)}")
    print(f"ever windowed    : {len(ever_windowed & set(keys))}")
    print()
    print(f"in current window, awaiting first driver run ({len(pending)}):")
    for q in pending:
        print(f"  + {q}  (#{keys.index(q) + 1})")
    print()
    print(f"NEVER windowed and NOT in current window ({len(never_windowed)}):")
    for q in never_windowed:
        print(f"  ! {q}  (#{keys.index(q) + 1})")
    if evicted_never_green:
        print()
        print(f"EVICTION VIOLATIONS — outside window but never driver-green ({len(evicted_never_green)}):")
        for q in evicted_never_green:
            print(f"  x {q}")
    if stale_artifact_keys:
        print()
        print(f"artifact keys no longer in registry ({len(stale_artifact_keys)}): "
              + ", ".join(stale_artifact_keys))
    boundary = keys[args.window - 1] if len(keys) >= args.window else keys[-1]
    print(f"\nwindow boundary  : #{args.window} = {boundary}")
    return 1 if (never_windowed or evicted_never_green) else 0


if __name__ == "__main__":
    raise SystemExit(main())
