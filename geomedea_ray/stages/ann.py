"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — one numpy matmul per batch against
a broadcast query matrix (``ray.put`` once, fetched per actor), local
top-k per batch, tiny final ``groupby(qid)`` top-k. Same two-stage
shape as stages/knn.py: no shuffle of the input, only of k·Q·B
candidate rows.

Scale path: ``build_lsh_buckets`` assigns each vector to a
random-hyperplane LSH bucket; at query time only matching buckets are
scanned (bucket id becomes a Parquet partition key / predicate, an IVF
analogue). Probes still verify with exact cosine.

Ranking is by ``round(cos_sim, 6)`` with vec_id tiebreak so rankings
are stable across summation orders (numpy SIMD vs any oracle's
sequential sum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.util import auto_pool


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # zero-copy path for fixed-length float lists
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _final_topk(k: int, id_col: str, round_decimals: int):
    """Shared final stage: round similarity, rank with id tie-break."""

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["simr"] = g["sim"].round(round_decimals)
        g = g.sort_values(["simr", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", id_col, "rank"]]

    return _final



class _CosineTopK:
    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.qids = q["qids"] if isinstance(q, dict) else np.arange(len(q))
        qm = q["matrix"] if isinstance(q, dict) else q
        self.qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"qid": pa.array([], pa.int64()),
                 self.id_col: batch[self.id_col].slice(0, 0),
                 "sim": pa.array([], pa.float64())}
            )
        m = _emb_matrix(batch, self.emb_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.qnorm.T  # (n, Q)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_qid, out_id, out_sim = [], [], []
        k = min(self.k, sims.shape[0])
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            part = np.argpartition(-col, k - 1)[:k]
            out_qid.append(np.full(k, qid, np.int64))
            out_id.append(ids[part])
            out_sim.append(col[part])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_qid), pa.int64()),
                self.id_col: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim), pa.float64()),
            }
        )


def ann_topk(
    ds,
    query_matrix: np.ndarray,
    qids: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_decimals: int = 6,
    batch_size: int = 4096,
):
    """Exact cosine top-k per query vector. Output columns:
    (qid, <id_col>, rank) — similarity is rounded before ranking and
    dropped from the output so results hash-compare cleanly."""
    import ray

    from geomedea_ray.util import cached_instance

    ref = ray.put({"matrix": np.asarray(query_matrix, np.float64), "qids": np.asarray(qids)})

    def _topk(batch):
        inst = cached_instance(
            ("ann", ref.hex(), k, id_col, emb_col),
            lambda: _CosineTopK(ref, k, id_col, emb_col),
        )
        return inst(batch)

    cands = ds.map_batches(
        _topk, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

    return cands.groupby("qid").map_groups(
        _final_topk(k, id_col, round_decimals), batch_format="pandas"
    )


def add_lsh_bucket(batch: pa.Table, planes: np.ndarray, emb_col: str = "embedding") -> pa.Table:
    """+ ``lsh_bucket`` int64: sign pattern against ``planes`` (d×b).
    Stateless map_batches fn; planes are small enough to close over."""
    m = _emb_matrix(batch, emb_col)
    bits = (m @ planes) > 0  # (n, b)
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    bucket = (bits.astype(np.int64) * weights[None, :]).sum(axis=1)
    return batch.append_column("lsh_bucket", pa.array(bucket, pa.int64()))


def lsh_planes(dim: int, nbits: int = 8, seed: int = 20260817) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, nbits))


def _probe_buckets(qvec: np.ndarray, planes: np.ndarray, nprobe: int) -> np.ndarray:
    """Multiprobe LSH: the query's own bucket plus the buckets reached
    by flipping the lowest-|margin| hyperplane bits (single flips, then
    pairs), ranked by total flipped margin — the standard multiprobe
    sequence, giving IVF-nprobe-style recall control."""
    from itertools import combinations

    proj = qvec @ planes                       # (b,)
    bits = proj > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    base = int((bits.astype(np.int64) * weights).sum())
    margins = np.abs(proj)
    order = np.argsort(margins)
    cands: list[tuple[float, int]] = [(0.0, base)]
    for i in order:
        cands.append((margins[i], base ^ int(weights[i])))
    for i, j in combinations(order[: min(6, len(order))], 2):
        cands.append((margins[i] + margins[j], base ^ int(weights[i]) ^ int(weights[j])))
    cands.sort(key=lambda t: t[0])
    out, seen = [], set()
    for _, b in cands:
        if b not in seen:
            seen.add(b)
            out.append(b)
        if len(out) >= nprobe:
            break
    return np.asarray(out, np.int64)


def ann_topk_lsh(
    ds,
    query_matrix: np.ndarray,
    qids: np.ndarray,
    k: int,
    nbits: int = 8,
    nprobe: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_decimals: int = 6,
    batch_size: int = 4096,
):
    """LSH-bucketed ANN — the scale path (IVF analogue): vectors are
    assigned random-hyperplane buckets; each query exact-scans only its
    ``nprobe`` multiprobe buckets instead of the whole table. With the
    bucket id as a partition/sort key of the stored table this becomes
    partition pruning; here the prune is a vectorized per-batch mask.
    Approximate by design (recall ↑ with nprobe/nbits — measured in
    tests); candidates are verified with exact cosine."""
    import ray

    qm = np.asarray(query_matrix, np.float64)
    dim = qm.shape[1]
    planes = lsh_planes(dim, nbits)
    probe_sets = [_probe_buckets(qm[i], planes, nprobe) for i in range(len(qm))]

    ds = ds.map_batches(
        add_lsh_bucket, fn_kwargs={"planes": planes, "emb_col": emb_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ref = ray.put({"matrix": qm, "qids": np.asarray(qids), "probes": probe_sets})

    class _BucketedTopK:
        def __init__(self):
            q = ray.get(ref)
            self.qids = q["qids"]
            self.qnorm = q["matrix"] / np.linalg.norm(q["matrix"], axis=1, keepdims=True)
            self.probes = q["probes"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch, emb_col)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mn = m / norms
            buckets = batch["lsh_bucket"].to_numpy()
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            out_qid, out_id, out_sim = [], [], []
            for j, qid in enumerate(self.qids):
                mask = np.isin(buckets, self.probes[j])
                if not mask.any():
                    continue
                sims = mn[mask] @ self.qnorm[j]
                kk = min(k, len(sims))
                part = np.argpartition(-sims, kk - 1)[:kk]
                out_qid.append(np.full(kk, qid, np.int64))
                out_id.append(ids[mask][part])
                out_sim.append(sims[part])
            if not out_qid:
                return pa.table(
                    {
                        "qid": pa.array([], pa.int64()),
                        id_col: batch[id_col].slice(0, 0),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_qid), pa.int64()),
                    id_col: pa.array(np.concatenate(out_id)),
                    "sim": pa.array(np.concatenate(out_sim), pa.float64()),
                }
            )

    cands = ds.map_batches(
        _BucketedTopK, batch_format="pyarrow", batch_size=batch_size,
        concurrency=auto_pool(), zero_copy_batch=True,
    )

    return cands.groupby("qid").map_groups(
        _final_topk(k, id_col, round_decimals), batch_format="pandas"
    )
