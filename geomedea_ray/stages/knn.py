"""k-nearest-neighbor queries over point datasets.

New work relative to the reference (it has only bbox range queries —
SURVEY §2.5); built per SURVEY §7.2 step 7 as a two-stage top-k:

1. per-batch candidate generation: every batch computes its local
   top-k per query point vectorized (distance matrix against the small
   broadcast query set + ``np.argpartition``) and emits only k rows per
   (query, batch) — the stream shrinks from N to k·Q·B rows with no
   shuffle of the input;
2. a tiny ``groupby(qid).map_groups`` final top-k over the candidates
   (the only shuffle, over k·Q·B rows).

With a spatially-written dataset, candidate generation can further
prune via ``hilbert_range_scan`` windows around each query (the
Hilbert-window path is provided for single-query point lookups).

Distance metrics: 'planar' = squared planar degrees (the exact
expression an SQL oracle reproduces bit-for-bit), 'haversine' = great
circle meters (tested against a scalar oracle in pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.functions.geo import haversine_m

from geomedea_ray.util import auto_pool


class _BatchTopK:
    def __init__(self, queries_ref, k: int, id_col: str, metric: str):
        import ray

        self.queries = (
            ray.get(queries_ref) if not isinstance(queries_ref, list) else queries_ref
        )  # list of (qid, qlng, qlat)
        self.k = k
        self.id_col = id_col
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_qid, out_id, out_dist = [], [], []
        for qid, qlng, qlat in self.queries:
            if self.metric == "planar":
                dx = lng - qlng
                dy = lat - qlat
                d = dx * dx + dy * dy
            elif self.metric == "haversine":
                d = haversine_m(lng, lat, qlng, qlat)
            else:
                raise ValueError(f"unknown metric {self.metric!r}")
            k = min(self.k, len(d))
            if k == 0:
                continue
            # local top-k, then exact ordering among them
            part = np.argpartition(d, k - 1)[:k]
            out_qid.append(np.full(k, qid, np.int64))
            out_id.append(ids[part])
            out_dist.append(d[part])
        if not out_qid:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    self.id_col: batch[self.id_col].slice(0, 0),
                    "dist": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_qid), pa.int64()),
                self.id_col: pa.array(np.concatenate(out_id)),
                "dist": pa.array(np.concatenate(out_dist), pa.float64()),
            }
        )


def knn(
    points_ds,
    queries: list[tuple[int, float, float]],
    k: int,
    id_col: str,
    metric: str = "planar",
    batch_size: int = 16384,
):
    """Top-k nearest points per query. Returns a Dataset with columns
    (qid, <id_col>, dist, rank); ties broken by <id_col> ascending so
    the result is fully deterministic."""
    import ray

    ref = ray.put(queries)
    cands = points_ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs={
            "queries_ref": ref,
            "k": k,
            "id_col": id_col,
            "metric": metric,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(),
        zero_copy_batch=True,
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", id_col], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("qid").map_groups(_final, batch_format="pandas")
