"""Small shared runtime helpers."""

from __future__ import annotations


def auto_pool(cap: int | None = None, min_actors: int = 1) -> tuple[int, int]:
    """Actor-pool ``concurrency`` sized to the CLUSTER, not a constant.

    A fixed pool size silently caps stage throughput at
    ``size × per-actor rate`` no matter how many CPUs the cluster has
    (a hard-coded ``concurrency=4`` capped the flagship chain at
    ~1.2M rows/s on 8 AND 32 CPUs). Autoscaling from ``min_actors``
    (default 1) also means a small session can never deadlock waiting
    for minimum actors that exceed its CPUs.
    """
    import ray

    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    hi = max(2, n if cap is None else min(cap, n))
    return (min_actors, hi)
