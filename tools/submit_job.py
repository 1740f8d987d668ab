"""Demonstrate the north rule's `ray job submit` deployment path.

Starts a head node (`ray start --head`) with the dashboard's job
server on 127.0.0.1, submits the flagship pipeline as a REAL Ray job
through the Job Submission API (the same `ray job submit` wire path a
multi-node cluster uses — the cluster address is the only thing that
changes on real hardware), waits for it, prints its output tail, and
tears the cluster down.

    python tools/submit_job.py [sf_dir]

The submitted entrypoint runs `bench.py --headline-only` over sf_dir
(default sf0.001), connecting to the already-running cluster via
RAY_ADDRESS=auto — exactly how a production submission finds its
cluster. Exit code 0 iff the job reaches SUCCEEDED and printed the
bench contract's JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DASH = "http://127.0.0.1:8265"


def sh(*args: str, check: bool = True, **kw) -> subprocess.CompletedProcess:
    return subprocess.run(args, check=check, capture_output=True,
                          text=True, **kw)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sh("ray", "stop", "--force", check=False)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # head start must not self-connect
    subprocess.run(["ray", "start", "--head", "--num-cpus", "8",
                    "--dashboard-host", "127.0.0.1", "--disable-usage-stats"],
                   check=True, env=env, capture_output=True, text=True)
    try:
        # job server needs a moment to come up
        from ray.job_submission import JobStatus, JobSubmissionClient

        client = None
        for _ in range(30):
            try:
                client = JobSubmissionClient(DASH)
                client.list_jobs()
                break
            except Exception:
                time.sleep(1)
        if client is None:
            print("job server never came up", file=sys.stderr)
            return 2
        job_id = client.submit_job(
            entrypoint=(f"python bench.py --headline-only"),
            runtime_env={
                "working_dir": None,  # repo is local — no packaging needed
                "env_vars": {"GRAFT_SF_DIR": sf_dir,
                             "RAY_GRAFT_CPUS": "8",
                             # bench attaches to THIS cluster instead
                             # of booting its own (bench._init_ray)
                             "GRAFT_USE_CLUSTER": "1",
                             "PYTHONPATH": REPO},
            },
            entrypoint_resources=None,
        )
        print(f"submitted job {job_id}")
        deadline = time.time() + 600
        status = None
        while time.time() < deadline:
            status = client.get_job_status(job_id)
            if status in (JobStatus.SUCCEEDED, JobStatus.FAILED,
                          JobStatus.STOPPED):
                break
            time.sleep(2)
        logs = client.get_job_logs(job_id)
        tail = logs.strip().splitlines()[-1] if logs.strip() else ""
        print(f"status={status}")
        print(f"last line: {tail[:400]}")
        if status != JobStatus.SUCCEEDED:
            print(logs[-2000:], file=sys.stderr)
            return 1
        json.loads(tail)  # bench contract: one JSON line
        print("ray job submit path OK")
        return 0
    finally:
        sh("ray", "stop", "--force", check=False)


if __name__ == "__main__":
    os.chdir(REPO)
    sys.exit(main())
