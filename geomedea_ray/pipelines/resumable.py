"""Resumable bulk map over input fragments (north rule: "resumable
from checkpoint with per-partition lineage + metrics").

The 100 TB shape: input = many Parquet fragments; each fragment is
one resume unit. A run processes only fragments without a committed
lineage record, each as ONE Ray Data task that reads the fragment
(column-pruned), applies the batch transform, and atomically publishes
``<out_dir>/part-<fragment-stem>.parquet``. The driver then appends
lineage records (rows, bytes, wall seconds) to the checkpoint log —
see state/checkpoint.py for the commit protocol.

Why a dataset OF fragment descriptors rather than ``read_parquet`` on
the whole directory: resume needs a STABLE partition identity that
survives restarts, and Ray's block/fragment mapping is an executor
detail. One row per fragment → ``map_batches(batch_size=1)`` keeps
scheduling, streaming and retries in Ray Data while making the resume
unit explicit. Fragment count at 100 TB is ~10⁵–10⁶ descriptor rows —
trivially small; the heavy bytes stay inside the tasks.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

from geomedea_ray.state.checkpoint import CheckpointLog, LineageRecord, op_chain_hash

_REC_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("fragment", pa.string()),
        ("out_path", pa.string()),
        ("row_count", pa.int64()),
        ("in_bytes", pa.int64()),
        ("out_bytes", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


def list_fragments(input_dir: str) -> list[str]:
    return sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )


def _process_fragments(
    batch: pa.Table,
    batch_fn: Callable[[pa.Table], pa.Table],
    fn_kwargs: dict,
    out_dir: str,
    columns: list[str] | None,
) -> pa.Table:
    """One task per descriptor row: read → transform → atomic publish."""
    rows = []
    for frag in batch["fragment"].to_pylist():
        t0 = time.perf_counter()
        table = pq.read_table(frag, columns=columns)
        result = batch_fn(table, **fn_kwargs)
        stem = os.path.splitext(os.path.basename(frag))[0]
        out_path = os.path.join(out_dir, f"part-{stem}.parquet")
        tmp = out_path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(result, tmp, compression="zstd")
        os.replace(tmp, out_path)  # atomic publish (commit step 1)
        rows.append(
            {
                "partition_id": stem,
                "fragment": frag,
                "out_path": out_path,
                "row_count": result.num_rows,
                "in_bytes": os.path.getsize(frag),
                "out_bytes": os.path.getsize(out_path),
                "wall_s": round(time.perf_counter() - t0, 4),
            }
        )
    return pa.Table.from_pylist(rows, schema=_REC_SCHEMA)


def resumable_map(
    input_dir: str,
    out_dir: str,
    batch_fn: Callable[[pa.Table], pa.Table],
    *,
    job_id: str,
    log: CheckpointLog | None = None,
    fn_kwargs: dict | None = None,
    columns: list[str] | None = None,
    concurrency: int | None = None,
) -> dict:
    """Run (or resume) the job; returns ``{"processed": n, "skipped":
    n, "records": [...]}``. Safe to re-invoke after any crash."""
    import ray.data

    fn_kwargs = fn_kwargs or {}
    os.makedirs(out_dir, exist_ok=True)
    log = log or CheckpointLog(os.path.join(out_dir, "lineage.jsonl"))
    chash = op_chain_hash(batch_fn, fn_kwargs, columns)

    frags = list_fragments(input_dir)
    done = log.committed(job_id, chash)
    todo = [f for f in frags if os.path.splitext(os.path.basename(f))[0] not in done]
    if not todo:
        return {"processed": 0, "skipped": len(frags), "records": []}

    ds = ray.data.from_items([{"fragment": f} for f in todo])
    result = ds.map_batches(
        _process_fragments,
        fn_kwargs={
            "batch_fn": batch_fn,
            "fn_kwargs": fn_kwargs,
            "out_dir": out_dir,
            "columns": columns,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    )

    # Stream summaries back and commit each lineage record AS ITS
    # PARTITION FINISHES (commit step 2; driver = single log writer).
    # A crash mid-job keeps every record appended so far — resume
    # reruns only unfinished fragments. (take_all-then-append would
    # make the whole job one commit unit, losing partition-level
    # resume entirely.)
    recs = []
    for tbl in result.iter_batches(batch_size=None, batch_format="pyarrow"):  # per-block: no coalescing delay
        for s in tbl.to_pylist():
            rec = LineageRecord(
                job_id=job_id,
                partition_id=s["partition_id"],
                op_chain_hash=chash,
                input_fragments=[s["fragment"]],
                row_count=s["row_count"],
                out_path=s["out_path"],
                metrics={
                    "in_bytes": s["in_bytes"],
                    "out_bytes": s["out_bytes"],
                    "wall_s": s["wall_s"],
                },
            )
            log.append(rec)
            recs.append(rec)
    return {"processed": len(recs), "skipped": len(frags) - len(todo), "records": recs}
