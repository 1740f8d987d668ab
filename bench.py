#!/usr/bin/env python
"""Benchmark harness (driver contract, SURVEY §6 / BASELINE.md).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the headline pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency T32/(4*T8) — the sandbox stand-in
for the north rule's N-node vs 4N-node cluster comparison (no real
cluster here; see BASELINE.md).

This script OWNS its Ray session (unlike __ray_entry__.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

#: headline = the BASELINE.json metric: spatial-join + tile-assignment
#: over the image+caption table.
HEADLINE = "image_spatial_join_tiles"

#: representative per-query benches (subset of queries(); keep the
#: per-round bench under ~3 min at sf0.1 / 32 cpus).
BENCH_QUERIES = [
    "image_spatial_join_tiles",
    "image_tile_counts",
    "image_phash_dedup",
    "image_decode_stats",
    "bbox_select",
    "knn",
    "pip_join",
    "tile_counts",
    "q1_pricing",
    "revenue_by_nation",
    "doc_quality",
    "dedup_text",
    "ann_topk",
    "minhash_pairs",
]


def _consume(res) -> int:
    """Force full execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    return res.count()  # ray.data.Dataset — executes the pipeline


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _warm_caches(sf_dir: str):
    """Materialize the synthetic image table (a fixture, not a stage
    under test) so generation cost never pollutes timings."""
    from geomedea_ray.pipelines.flagship import image_table_path, n_images_for

    image_table_path(n_images_for(sf_dir))


def run_suite(sf_dir: str, num_cpus: int, names: list[str]) -> dict:
    _init_ray(num_cpus)
    _warm_caches(sf_dir)
    import __ray_entry__ as E

    qs = E.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    head = timings.get(HEADLINE)
    from geomedea_ray.pipelines.flagship import n_images_for

    n_in = n_images_for(sf_dir)
    return {
        "metric": "spatial_join_tiles_wall_s",
        "value": head if head is not None else sum(timings.values()),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "rows": rows,
        "headline_input_rows": n_in,
        "headline_rows_per_s": round(n_in / head, 1) if head else None,
        "total_s": round(sum(timings.values()), 3),
    }


def run_scaling(sf_dir: str) -> dict:
    """Fresh-process runs at 8 and 32 CPUs (N vs 4N stand-in)."""
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
        out[cpus] = json.loads(line)
    t8 = out[8]["headline_rows_per_s"]
    t32 = out[32]["headline_rows_per_s"]
    return {
        "metric": "scaling_efficiency",
        "value": round(t32 / (4 * t8), 3),
        "unit": "ratio",
        "rows_per_s_8cpu": t8,
        "rows_per_s_32cpu": t32,
        "headline": HEADLINE,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "note": "sandbox stand-in for N vs 4N nodes: fresh ray.init at num_cpus=8 vs 32",
    }


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if "--scaling" in sys.argv:
        result = run_scaling(sf_dir)
    elif "--headline-only" in sys.argv:
        result = run_suite(sf_dir, num_cpus, [HEADLINE])
    elif "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
        result = run_suite(sf_dir, num_cpus, names)
    else:
        result = run_suite(sf_dir, num_cpus, BENCH_QUERIES)
    print(json.dumps(result))

    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
