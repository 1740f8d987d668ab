"""Checkpoint / lineage: resumable fragment jobs (north rule).

Covers the commit protocol in state/checkpoint.py: atomic publish +
driver-side lineage append; resume skips committed partitions; an
edited operator chain (new op_chain_hash) does not resume into stale
outputs; spatial_write emits per-partition lineage records.
"""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from geomedea_ray.pipelines.resumable import list_fragments, resumable_map
from geomedea_ray.state.checkpoint import CheckpointLog, LineageRecord, op_chain_hash

N_FRAGS = 5
ROWS_PER_FRAG = 100


def _make_double():
    # a closure (not a module-level name) so cloudpickle ships it by
    # value — pytest test modules aren't importable on Ray workers
    def double_x(table: pa.Table, bias: int = 0) -> pa.Table:
        return table.set_column(
            table.schema.get_field_index("x"),
            "x",
            pc.add(pc.multiply(table["x"], 2), bias),
        )

    return double_x


double_x = _make_double()


@pytest.fixture()
def frag_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(N_FRAGS):
        x = np.arange(i * ROWS_PER_FRAG, (i + 1) * ROWS_PER_FRAG, dtype=np.int64)
        pq.write_table(pa.table({"x": x, "junk": x * 0}), d / f"frag-{i:04d}.parquet")
    return str(d)


class TestResumableMap:
    def test_full_run(self, ray_session, frag_dir, tmp_path):
        out = str(tmp_path / "out")
        res = resumable_map(frag_dir, out, double_x, job_id="j1", columns=["x"])
        assert res["processed"] == N_FRAGS and res["skipped"] == 0
        # outputs published with stable per-fragment names
        outs = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
        assert outs == [f"part-frag-{i:04d}.parquet" for i in range(N_FRAGS)]
        # transform applied + column pruning worked
        t = pq.read_table(os.path.join(out, outs[0]))
        assert t.column_names == ["x"]
        assert t["x"].to_pylist()[:3] == [0, 2, 4]

    def test_rerun_skips_everything(self, ray_session, frag_dir, tmp_path):
        out = str(tmp_path / "out")
        resumable_map(frag_dir, out, double_x, job_id="j1", columns=["x"])
        res2 = resumable_map(frag_dir, out, double_x, job_id="j1", columns=["x"])
        assert res2["processed"] == 0 and res2["skipped"] == N_FRAGS

    def test_resume_after_partial_commit(self, ray_session, frag_dir, tmp_path):
        """Simulate a crash: 2 of 5 partitions committed, log knows
        only those; resume processes exactly the other 3."""
        out = str(tmp_path / "out")
        os.makedirs(out)
        log = CheckpointLog(os.path.join(out, "lineage.jsonl"))
        chash = op_chain_hash(double_x, {}, ["x"])
        for i in (0, 3):
            log.append(
                LineageRecord(
                    job_id="j1", partition_id=f"frag-{i:04d}", op_chain_hash=chash
                )
            )
        res = resumable_map(frag_dir, out, double_x, job_id="j1", columns=["x"], log=log)
        assert res["processed"] == N_FRAGS - 2 and res["skipped"] == 2
        done = {r.partition_id for r in res["records"]}
        assert done == {"frag-0001", "frag-0002", "frag-0004"}

    def test_changed_op_chain_reruns(self, ray_session, frag_dir, tmp_path):
        out = str(tmp_path / "out")
        resumable_map(frag_dir, out, double_x, job_id="j1", columns=["x"])
        # same job id, different kwargs → different op_chain_hash → full rerun
        res = resumable_map(
            frag_dir, out, double_x, job_id="j1", columns=["x"], fn_kwargs={"bias": 1}
        )
        assert res["processed"] == N_FRAGS
        t = pq.read_table(os.path.join(out, "part-frag-0000.parquet"))
        assert t["x"].to_pylist()[0] == 1  # new outputs published over old

    def test_lineage_metrics_recorded(self, ray_session, frag_dir, tmp_path):
        out = str(tmp_path / "out")
        resumable_map(frag_dir, out, double_x, job_id="j1", columns=["x"])
        recs = CheckpointLog(os.path.join(out, "lineage.jsonl")).records()
        assert len(recs) == N_FRAGS
        for r in recs:
            assert r.status == "committed"
            assert r.row_count == ROWS_PER_FRAG
            assert r.metrics["out_bytes"] > 0 and r.metrics["wall_s"] >= 0
            assert r.input_fragments and r.input_fragments[0].endswith(".parquet")


class TestSpatialWriteLineage:
    def test_spatial_write_emits_lineage(self, ray_session, tmp_path):
        import ray.data

        from geomedea_ray.pipelines.spatial_write import spatial_write

        rng = np.random.default_rng(7)
        n = 2_000
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "fid": pa.array(np.arange(n), pa.int64()),
                    "lng": rng.uniform(-170, 170, n),
                    "lat": rng.uniform(-80, 80, n),
                }
            )
        )
        out = str(tmp_path / "spatial")
        man = spatial_write(ds, out, tiebreak="fid")
        with open(os.path.join(out, "lineage.jsonl")) as f:
            recs = [json.loads(line) for line in f if line.strip()]
        assert len(recs) == len(man.partitions) > 0
        assert sum(r["row_count"] for r in recs) == n
        by_pid = {r["partition_id"]: r for r in recs}
        for p in man.partitions:
            r = by_pid[p.path]
            assert r["metrics"]["byte_size"] == p.byte_size
            assert r["metrics"]["hilbert_range"] == [p.hilbert_min, p.hilbert_max]


def test_op_chain_hash_stability():
    a = op_chain_hash(double_x, {"k": 1}, ["x"])
    assert a == op_chain_hash(double_x, {"k": 1}, ["x"])
    assert a != op_chain_hash(double_x, {"k": 2}, ["x"])
    assert a != op_chain_hash(double_x, {"k": 1}, ["x", "y"])


_NESTED_FN_SRC = """
import sys
sys.path.insert(0, {repo!r})
from geomedea_ray.state.checkpoint import op_chain_hash

def fn_with_lambda(batch):
    # nested code objects: a lambda AND an inner def — the old
    # repr(co_consts) hash embedded their memory addresses
    f = lambda v: v * 2
    def inner(v):
        return f(v) + 1
    return inner(batch)

print(op_chain_hash(fn_with_lambda, {{"k": 1}}, ["x"]))
"""


def test_op_chain_hash_cross_process_stability():
    """A batch_fn containing a lambda/inner def must hash identically
    in different interpreter processes — otherwise cross-RUN resume
    never matches and silently recomputes everything (round-2 ADVICE
    medium: repr(co_consts) embeds code-object memory addresses)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = _NESTED_FN_SRC.format(repo=repo)
    outs = {
        subprocess.run([sys.executable, "-c", src], capture_output=True,
                       text=True, check=True).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1 and next(iter(outs))


def test_list_fragments_sorted(tmp_path):
    for name in ("b.parquet", "a.parquet", "ignore.txt"):
        (tmp_path / name).write_bytes(b"")
    assert [os.path.basename(p) for p in list_fragments(str(tmp_path))] == [
        "a.parquet",
        "b.parquet",
    ]


class TestRound5Tools:
    def test_window_audit_clean(self):
        """tools/window_audit.py is the rotation gate: exit 0 = every
        registry entry is either in the current window or was
        driver-verified in a past round, and no eviction violations."""
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "window_audit.py")],
            capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "NEVER windowed and NOT in current window (0)" in proc.stdout

    def test_resume_batch_fn_matches_direct_decode(self):
        """The two-node-resume demo's per-partition transform equals a
        direct per-row decode+sum (the demo's row-count check plus this
        keeps the transform honest)."""
        import numpy as np

        from geomedea_ray.functions import codecs
        from geomedea_ray.sources.synth import synth_image_batch
        from tools.submit_job import _resume_batch_fn

        rows = synth_image_batch(np.arange(0, 40, dtype=np.int64))
        out = _resume_batch_fn(rows)
        assert out.num_rows == 40
        got = out["px_sum"].to_numpy()
        for i in range(40):
            px = codecs.decode(rows["bytes"][i].as_py(), rows["fmt"][i].as_py(),
                               rows["w"][i].as_py(), rows["h"][i].as_py())
            assert int(got[i]) == int(px.astype(np.int64).sum())
