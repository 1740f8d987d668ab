"""Demonstrate the north rule's `ray job submit` deployment path.

Starts a head node (`ray start --head`), submits the flagship bench as
a Ray job, waits, prints the job's output tail, tears the cluster
down. Exit 0 iff the job succeeded and printed the bench contract's
single JSON line.

    python tools/submit_job.py [sf_dir]

Two submission transports, picked at runtime:

1. **Job Submission API** (`ray.job_submission.JobSubmissionClient` —
   the `ray job submit` wire path) when the cluster's job server is
   up. In THIS sandbox ray is installed dashboard-minimal (no aiohttp,
   `pip install` forbidden), so the HTTP job server cannot start and
   this transport is unavailable — on real hardware with
   `ray[default]` it is taken.
2. **Detached-driver fallback**: the entrypoint runs as a separate OS
   process that attaches to the already-running cluster by address
   (`GRAFT_USE_CLUSTER=1` → `ray.init(address="auto")` in
   bench._init_ray) — operationally identical to what the job server
   does with a submitted entrypoint (spawn process, point it at the
   cluster, capture logs + exit code); only the REST wrapper is
   missing. The cluster outlives the driver either way, which is the
   property the north rule's deployment clause actually exercises.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DASH = "http://127.0.0.1:8265"


def _job_api_available() -> bool:
    try:
        from ray.job_submission import JobSubmissionClient

        client = JobSubmissionClient(DASH)
        client.list_jobs()
        return True
    except Exception:
        return False


def _submit_via_job_api(env: dict) -> int:
    from ray.job_submission import JobStatus, JobSubmissionClient

    client = JobSubmissionClient(DASH)
    job_id = client.submit_job(
        entrypoint="python bench.py --headline-only",
        runtime_env={"env_vars": {k: env[k] for k in
                                  ("GRAFT_SF_DIR", "RAY_GRAFT_CPUS",
                                   "GRAFT_USE_CLUSTER", "PYTHONPATH")}},
    )
    print(f"submitted via Job API: {job_id}")
    deadline = time.time() + 600
    status = None
    while time.time() < deadline:
        status = client.get_job_status(job_id)
        if status in (JobStatus.SUCCEEDED, JobStatus.FAILED,
                      JobStatus.STOPPED):
            break
        time.sleep(2)
    logs = client.get_job_logs(job_id)
    return _finish(str(status), logs)


def _submit_via_detached_driver(env: dict) -> int:
    print("job server unavailable (dashboard-minimal ray, no aiohttp) — "
          "running the entrypoint as a detached driver attached to the "
          "running cluster (same process model, no REST wrapper)")
    proc = subprocess.run([sys.executable, "bench.py", "--headline-only"],
                          env=env, capture_output=True, text=True,
                          timeout=600, cwd=REPO)
    status = "SUCCEEDED" if proc.returncode == 0 else "FAILED"
    # the bench contract line is the last line of STDOUT (stderr holds
    # Ray worker logs)
    return _finish(status, proc.stdout if proc.returncode == 0
                   else proc.stdout + proc.stderr)


def _finish(status: str, logs: str) -> int:
    lines = [ln for ln in logs.strip().splitlines() if ln.strip()]
    tail = lines[-1] if lines else ""
    print(f"status={status}")
    print(f"last line: {tail[:400]}")
    if "SUCCEEDED" not in status:
        print(logs[-2000:], file=sys.stderr)
        return 1
    json.loads(tail)  # bench contract: ONE JSON line
    print("job-submission deployment path OK")
    return 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    boot_env = dict(os.environ)
    boot_env.pop("RAY_ADDRESS", None)  # head start must not self-connect
    subprocess.run(["ray", "start", "--head", "--num-cpus", "8",
                    "--dashboard-host", "127.0.0.1",
                    "--disable-usage-stats"],
                   check=True, env=boot_env, capture_output=True, text=True)
    try:
        job_env = dict(boot_env)
        job_env.update({"GRAFT_SF_DIR": sf_dir, "RAY_GRAFT_CPUS": "8",
                        "GRAFT_USE_CLUSTER": "1", "PYTHONPATH": REPO})
        if _job_api_available():
            return _submit_via_job_api(job_env)
        return _submit_via_detached_driver(job_env)
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True)


if __name__ == "__main__":
    os.chdir(REPO)
    sys.exit(main())
