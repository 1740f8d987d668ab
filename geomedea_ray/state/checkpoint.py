"""Checkpoint / lineage log — per-partition resume (north rule;
SURVEY §4 "Checkpoint / resume" row, §7.2 step 9).

The reference has no checkpointing (a killed write restarts from
zero — geomedea/src/writer/mod.rs buffers everything in tempfiles
owned by one process). At 100 TB a job MUST resume at partition
granularity, so every partition of a resumable job appends one
JSONL *lineage record* to a checkpoint log::

    {"job_id": ..., "partition_id": ..., "op_chain_hash": ...,
     "input_fragments": [...], "status": "committed",
     "row_count": N, "out_path": ..., "metrics": {...},
     "attempt": k, "ts": ...}

Commit protocol (idempotent, crash-safe):

1. task writes its output to ``<out>.tmp-<uuid>`` then ``os.replace``
   (atomic publish);
2. the DRIVER appends the lineage record after the task reports
   success (single-writer log — no concurrent appends);
3. resume loads the log and skips partitions whose
   ``(job_id, op_chain_hash, partition_id)`` is committed. A changed
   operator chain (different ``op_chain_hash``) invalidates nothing
   but matches nothing — the job reruns under the new hash.

A partition that crashed between 1 and 2 is simply rerun; its
``os.replace`` republishes the identical output.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class LineageRecord:
    job_id: str
    partition_id: str
    op_chain_hash: str
    status: str = "committed"           # committed | failed
    input_fragments: list[str] = field(default_factory=list)
    row_count: int = 0
    out_path: str = ""
    metrics: dict[str, Any] = field(default_factory=dict)
    attempt: int = 1
    ts: float = 0.0


def _code_fingerprint(code) -> str:
    """Structural, CROSS-PROCESS-stable fingerprint of a code object.

    ``repr(code.co_consts)`` embeds memory addresses for nested code
    objects (lambdas / inner defs), so it differs in every process and
    a batch_fn containing any closure would get a fresh hash per run —
    silently defeating cross-run resume. Instead, recurse into nested
    code objects and hash their structure (bytecode, names, stable
    consts)."""
    h = hashlib.sha256()

    def feed(c) -> None:
        h.update(c.co_code)
        h.update(repr((c.co_names, c.co_varnames, c.co_freevars,
                       c.co_argcount, c.co_kwonlyargcount)).encode())
        for const in c.co_consts:
            if hasattr(const, "co_code"):  # nested code object: recurse
                h.update(b"<code>")
                feed(const)
            else:
                h.update(repr(const).encode())

    feed(code)
    return h.hexdigest()[:12]


def op_chain_hash(*parts: Any) -> str:
    """Stable hash of an operator chain description (fn qualnames +
    kwargs + schema); identifies WHICH computation a lineage record
    certifies, so editing the pipeline never resumes into stale
    outputs. Must be identical across processes/runs for unchanged
    code — nested code objects are hashed structurally."""

    def norm(p: Any) -> str:
        if callable(p):
            name = f"{getattr(p, '__module__', '?')}.{getattr(p, '__qualname__', repr(p))}"
            # fold the BODY in too: editing a function (same qualname,
            # same kwargs) must not resume into stale outputs
            code = getattr(p, "__code__", None) or getattr(
                getattr(p, "__call__", None), "__code__", None
            )
            if code is not None:
                return f"{name}@{_code_fingerprint(code)}"
            return name
        if isinstance(p, dict):
            return json.dumps({k: norm(v) for k, v in sorted(p.items())})
        if isinstance(p, (list, tuple)):
            return json.dumps([norm(v) for v in p])
        return repr(p)

    return hashlib.sha256("|".join(norm(p) for p in parts).encode()).hexdigest()[:16]


class CheckpointLog:
    """Append-only JSONL lineage log, one per job family. The driver
    is the single writer; tasks never touch it."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, rec: LineageRecord) -> None:
        if not rec.ts:
            rec.ts = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def append_all(self, recs: list[LineageRecord]) -> None:
        for r in recs:
            self.append(r)

    def records(self) -> list[LineageRecord]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(LineageRecord(**json.loads(line)))
        return out

    def committed(self, job_id: str, chain_hash: str) -> set[str]:
        """Partition ids already committed for this exact computation."""
        return {
            r.partition_id
            for r in self.records()
            if r.job_id == job_id
            and r.op_chain_hash == chain_hash
            and r.status == "committed"
        }
