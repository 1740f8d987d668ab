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

With a spatially-written dataset, ``knn_indexed`` serves the same
queries from the packed R-tree instead (expanding-radius range
search — no full scan).

Distance metrics: 'planar' = squared planar degrees (the exact
expression an SQL oracle reproduces bit-for-bit), 'haversine' = great
circle meters (tested against a scalar oracle in pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.functions.geo import haversine_m, planar_sq_dist



class _BatchTopK:
    def __init__(self, queries_ref, k: int, id_col: str, metric: str):
        import ray

        self.queries = (
            ray.get(queries_ref) if not isinstance(queries_ref, list) else queries_ref
        )  # list of (qid, qlng, qlat)
        self.k = k
        self.id_col = id_col
        self.metric = metric
        self._ws: tuple | None = None  # persistent distance workspace

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_qid, out_id, out_dist = [], [], []
        k = min(self.k, len(lng))
        if k and self.metric == "planar" and len(self.queries) > 1:
            # vectorized multi-query path: (n × Qchunk) distance matrix,
            # one axis-0 partition — no per-query Python loop. The query
            # dimension is tiled so each matrix stays ≤ ~4 MB, and the
            # matrices live in a PERSISTENT per-worker workspace written
            # with out= (cached_instance keeps this object alive): the
            # original 320 MB-of-fresh-temporaries version paid
            # first-touch page faults on every batch in every worker —
            # on this VM page zeroing serializes host-side, and 25
            # workers faulting concurrently turned a 0.3 s/batch kernel
            # into a 117 s stage (measured round 4; 14× with buffers)
            qarr = np.asarray([(q[1], q[2]) for q in self.queries], np.float64)
            qids_all = np.asarray([q[0] for q in self.queries], np.int64)
            n = len(lng)
            qchunk = min(len(qarr), max(1, int(5e5 // max(n, 1))))
            if (self._ws is None or self._ws[0].shape[0] < n
                    or self._ws[0].shape[1] < qchunk):
                shape = (max(n, 16384), qchunk)
                self._ws = (np.empty(shape, np.float64),
                            np.empty(shape, np.float64),
                            np.empty(shape, np.float64))
            dxb, dyb, pb = self._ws
            for off in range(0, len(qarr), qchunk):
                qa = qarr[off: off + qchunk]
                qc = len(qa)
                d = dxb[:n, :qc]
                dy = dyb[:n, :qc]
                np.subtract(lng[:, None], qa[None, :, 0], out=d)
                np.subtract(lat[:, None], qa[None, :, 1], out=dy)
                np.multiply(d, d, out=d)
                np.multiply(dy, dy, out=dy)
                np.add(d, dy, out=d)                       # (n, Qc)
                # keep EVERY row tied with the k-th distance — a plain
                # argpartition[:k] drops an arbitrary tied row, making
                # candidate generation batch-layout dependent and able
                # to lose the lower-id row the final tie-break wants
                p = pb[:n, :qc]
                p[...] = d
                p.partition(k - 1, axis=0)
                kth = p[k - 1]                             # (Qc,)
                rows, cols = np.nonzero(d <= kth[None, :])
                out_qid.append(qids_all[off + cols])
                out_id.append(ids[rows])
                out_dist.append(d[rows, cols])
        elif k:
            for qid, qlng, qlat in self.queries:
                if self.metric == "planar":
                    dx = lng - qlng
                    dy = lat - qlat
                    d = dx * dx + dy * dy
                elif self.metric == "haversine":
                    d = haversine_m(lng, lat, qlng, qlat)
                else:
                    raise ValueError(f"unknown metric {self.metric!r}")
                # local top-k INCLUDING ties at the k-th distance (see
                # the vectorized path for why)
                kth = np.partition(d, k - 1)[k - 1]
                sel = np.flatnonzero(d <= kth)
                out_qid.append(np.full(len(sel), qid, np.int64))
                out_id.append(ids[sel])
                out_dist.append(d[sel])
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

    from geomedea_ray.util import cached_instance

    ref = ray.put(queries)

    def _topk(batch):
        inst = cached_instance(
            ("knn", ref.hex(), k, id_col, metric),
            lambda: _BatchTopK(ref, k, id_col, metric),
        )
        return inst(batch)

    cands = points_ds.map_batches(
        _topk, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", id_col], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("qid").map_groups(_final, batch_format="pandas")


def _knn_probe_round(
    dataset_dir: str,
    man,
    rects: dict[int, tuple[float, float, float, float]],
    qxy: dict[int, tuple[float, float]],
    k: int,
    id_col: str,
):
    """ONE distributed pass serving every active query's probe rect:
    partitions are pruned per rect driver-side, each surviving
    partition's parquet file is read ONCE (union of all its rects'
    index positions), rows are emitted qid-tagged, and a tiny
    ``groupby(qid)`` reduces to per-query (top-k rows, count, k-th
    distance). Returns a ≤ |queries|·k-row pandas frame."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    from geomedea_ray.functions.geo import Bounds
    from geomedea_ray.util import cached_instance

    q_bounds = {qid: Bounds.from_degrees(*r) for qid, r in rects.items()}
    part_qids: dict[str, tuple] = {}
    for qid, b in q_bounds.items():
        for p in man.prune_bbox(b):
            part_qids.setdefault(p.path, (p, []))[1].append(qid)
    if not part_qids:
        return pd.DataFrame({"qid": pd.Series([], dtype=np.int64), id_col: [],
                             "dist": pd.Series([], dtype=np.float64),
                             "n": pd.Series([], dtype=np.int64),
                             "dk": pd.Series([], dtype=np.float64)})
    items = [
        {"path": p.path, "index_path": p.index_path, "qids": qids}
        for p, qids in part_qids.values()
    ]
    bounds_ref = ray.put({qid: b.as_tuple() for qid, b in q_bounds.items()})
    qxy_ref = ray.put(dict(qxy))

    def _probe(batch: pa.Table) -> pa.Table:
        from geomedea_ray.state.index import PackedRTree
        from geomedea_ray.util import get_once

        bmap = get_once(bounds_ref)
        out = []
        for row in batch.to_pylist():
            # per-process tree cache keyed by index path only — shared
            # across rects and rounds (ADVICE r1: no per-rect pinning)
            tree = cached_instance(
                ("knn.tree", dataset_dir, row["index_path"]),
                lambda: PackedRTree.load(os.path.join(dataset_dir, row["index_path"])),
            )
            pos_by_qid = {}
            for qid in row["qids"]:
                pos = tree.query_bbox(Bounds(*bmap[qid]))
                if len(pos):
                    pos_by_qid[qid] = pos
            if not pos_by_qid:
                continue
            from geomedea_ray.state.accounting import read_positions

            union = np.unique(np.concatenate(list(pos_by_qid.values())))
            tbl = read_positions(
                os.path.join(dataset_dir, row["path"]), union,
                columns=[id_col, "lng", "lat"],
            )
            for qid, pos in pos_by_qid.items():
                sel = tbl.take(pa.array(np.searchsorted(union, np.sort(pos))))
                out.append(sel.append_column(
                    "qid", pa.array(np.full(sel.num_rows, qid, np.int64))
                ))
        if not out:
            any_path = os.path.join(dataset_dir, batch["path"][0].as_py())
            empty = pq.read_schema(any_path).empty_table().select([id_col, "lng", "lat"])
            return empty.append_column("qid", pa.array([], pa.int64()))
        return pa.concat_tables(out)

    def _summ(g: pd.DataFrame) -> pd.DataFrame:
        from geomedea_ray.util import get_once

        qid = int(g["qid"].iloc[0])
        qlng, qlat = get_once(qxy_ref)[qid]
        d = planar_sq_dist(g["lng"].to_numpy(), g["lat"].to_numpy(), qlng, qlat)
        n = len(g)
        dk = float(np.sqrt(np.partition(d, k - 1)[k - 1])) if n >= k else np.inf
        out = pd.DataFrame({id_col: g[id_col].to_numpy(), "dist": d})
        out = out.sort_values(["dist", id_col], kind="mergesort").head(k)
        out.insert(0, "qid", np.int64(qid))
        out["n"] = np.int64(n)
        out["dk"] = dk
        return out

    cands = ray.data.from_items(items).map_batches(
        _probe, batch_format="pyarrow", batch_size=4
    )
    return cands.groupby("qid").map_groups(_summ, batch_format="pandas").to_pandas()


def knn_indexed(
    dataset_dir: str,
    queries: list[tuple[int, float, float]],
    k: int,
    id_col: str,
    max_radius_deg: float = 360.0,
):
    """Index-backed exact kNN over a spatially-written dataset — the
    packed R-tree answers kNN via the classic expanding-radius range
    search (north star: the per-partition cell index "answers …
    kNN"; SURVEY §7.2 step 7 / §7.5 window-guarantee note):

    1. probe a bbox of radius r around each point (manifest prune +
       packed-index probe);
    2. queries holding < k points double r and go again;
    3. once ≥ k points: d_k = k-th smallest planar distance; if
       sqrt(d_k) > r, one FINAL probe at radius sqrt(d_k) catches any
       closer point outside the square (the square-vs-circle gap —
       without this step results near box corners would be wrong).

    BATCHED rounds (round-1 VERDICT item 6): every round runs ONE
    distributed probe pass over ALL still-active queries — a
    1000-query workload costs O(log) jobs total, not 1000 sequential
    job chains. Radii are density-seeded (E[points in r-box] =
    density·(2r)² ⇒ r₀ ≈ √(k/density), ×1 slack), so most queries
    resolve in 1-2 rounds. Same result (and the same SQL oracle) as
    the full-scan ``knn`` — verified in tests and at the gate.
    """
    import pandas as pd

    from geomedea_ray.functions.geo import dequantize
    from geomedea_ray.state.manifest import Manifest

    man = Manifest.load(dataset_dir)
    ext = dequantize(list(man.extent))
    area = max((ext[2] - ext[0]) * (ext[3] - ext[1]), 1e-9)
    density = max(man.row_count / area, 1e-12)
    r0 = min(max(np.sqrt(k / density), 1e-4), 45.0)

    qxy = {int(qid): (float(qlng), float(qlat)) for qid, qlng, qlat in queries}
    radius = {qid: float(r0) for qid in qxy}
    final_round = {qid: False for qid in qxy}
    results: dict[int, pd.DataFrame] = {}

    active = set(qxy)
    while active:
        # clamp to valid degrees: quantize() wraps int32 past ±214.748°,
        # so an unclamped wide-radius rect near lng ±170 would invert
        # (min > max) and silently prune everything
        rects = {
            qid: (max(qxy[qid][0] - radius[qid], -180.0),
                  max(qxy[qid][1] - radius[qid], -90.0),
                  min(qxy[qid][0] + radius[qid], 180.0),
                  min(qxy[qid][1] + radius[qid], 90.0))
            for qid in active
        }
        summ = _knn_probe_round(dataset_dir, man, rects, qxy, k, id_col)
        by_qid = {int(q): g for q, g in summ.groupby("qid")} if len(summ) else {}
        for qid in list(active):
            g = by_qid.get(qid)
            n = int(g["n"].iloc[0]) if g is not None else 0
            r = radius[qid]
            if final_round[qid]:
                results[qid] = g
                active.discard(qid)
            elif n >= k:
                dk = float(g["dk"].iloc[0])
                if dk <= r or r >= max_radius_deg:
                    results[qid] = g
                    active.discard(qid)
                else:
                    radius[qid] = dk
                    final_round[qid] = True
            elif r >= max_radius_deg:
                results[qid] = g  # fewer than k points in the dataset
                active.discard(qid)
            else:
                radius[qid] = r * 2.0

    frames = []
    for qid, _, _ in queries:
        g = results.get(int(qid))
        if g is None or g.empty:
            continue
        g = g.drop(columns=["n", "dk"]).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        frames.append(g)
    if not frames:
        return pd.DataFrame({"qid": pd.Series([], dtype=np.int64), id_col: [],
                             "dist": pd.Series([], dtype=np.float64),
                             "rank": pd.Series([], dtype=np.int64)})
    return pd.concat(frames, ignore_index=True)


def nn_join(
    left_ds_or_points,
    right_ds,
    k: int = 1,
    left_id_col: str = "qid",
    right_id_col: str = "pid",
    batch_size: int = 16384,
):
    """Nearest-neighbor JOIN: for every LEFT point, its k nearest RIGHT
    points (planar metric). The left side is broadcast (small side —
    100s-1000s of probe points); the right side streams through the
    same two-stage partial-top-k as ``knn`` with the vectorized
    multi-query distance matrix. For a large left side, chunk it and
    run this per chunk (each chunk is an independent broadcast).

    ``left_ds_or_points``: a Dataset with (left_id_col, lng, lat) —
    materialized driver-side (it must broadcast) — or a prebuilt list
    of (id, lng, lat) tuples.
    """
    if hasattr(left_ds_or_points, "take_all"):
        rows = left_ds_or_points.take_all()  # small side by contract
        queries = [(int(r[left_id_col]), float(r["lng"]), float(r["lat"])) for r in rows]
    else:
        queries = list(left_ds_or_points)
    return knn(right_ds, queries, k, id_col=right_id_col, metric="planar",
               batch_size=batch_size)
