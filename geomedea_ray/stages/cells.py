"""Hierarchical cell-set operators over the Hilbert-quadtree cell
scheme (functions/hilbert.hilbert_cell_id) — the H3 ``compact`` /
``uncompact`` analogues named by the north star ("H3 compaction ...
run on actor pools"). No reference counterpart (SURVEY §2.5).

``compact_cells``: a set of resolution-``res`` cells → the minimal
mixed-resolution covering set (any 4 sibling cells all present are
replaced by their parent, recursively).

Distributed shape: ONE shuffle — distinct the cell ids, shard by the
TOP-LEVEL quad (cell >> 2(res-1)); every possible merge is contained
inside one top-level subtree, so each shard compacts its subtree
independently with a vectorized per-level numpy loop (≤16 levels).
The rollup runs on an actor pool (state = none today, but the stage
is where per-actor rollup tables would live).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.util import auto_pool


def compact_cell_array(cells: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Single-process compaction of DISTINCT res-``res`` cell ids →
    ``(cell_id, cell_res)`` arrays (the minimal covering set).
    Vectorized per level: siblings found with unique(parent)."""
    cur = np.unique(np.asarray(cells, np.int64))
    out_cells, out_res = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
    r = res
    while r > 0 and len(cur):
        parents = cur >> np.int64(2)
        uniq, counts = np.unique(parents, return_counts=True)
        full = uniq[counts == 4]
        keep = cur[~np.isin(parents, full)]
        out_cells.append(keep)
        out_res.append(np.full(len(keep), r, np.int64))
        cur = full   # now at resolution r-1
        r -= 1
    if len(cur):
        out_cells.append(cur)
        out_res.append(np.full(len(cur), r, np.int64))
    return np.concatenate(out_cells), np.concatenate(out_res)


def uncompact_cell_array(cells: np.ndarray, ress: np.ndarray, res: int) -> np.ndarray:
    """Inverse: expand a mixed-resolution set back to distinct
    res-``res`` cells (each cell → its 4^(res-r) descendants)."""
    out = []
    for c, r in zip(np.asarray(cells, np.int64), np.asarray(ress, np.int64)):
        d = int(res - r)
        base = c << np.int64(2 * d)
        out.append(base + np.arange(1 << (2 * d), dtype=np.int64))
    return np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)


def compact_cells(ds, cell_col: str = "cell_id", res: int = 8,
                  concurrency=None):
    """Dataset-level compaction; returns (cell_id, cell_res) rows.

    distinct (groupby shuffle) → shard on the top-level quad → per
    shard actor compacts its whole subtree vectorized.
    """
    from ray.data.aggregate import Count

    distinct = ds.groupby(cell_col).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    top_shift = np.int64(2 * (res - 1))

    def _shard(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_shard=(df[cell_col].to_numpy(np.int64) >> top_shift))

    class Compactor:
        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            c, r = compact_cell_array(g[cell_col].to_numpy(np.int64), res)
            return pd.DataFrame({"cell_id": c, "cell_res": r})

    compacted = (
        distinct.map_batches(_shard, batch_format="pandas")
        .groupby("_shard")
        .map_groups(
            Compactor, batch_format="pandas",
            concurrency=concurrency if concurrency is not None else auto_pool(),
        )
    )

    # Root-merge epilogue: pass 1 shards on the res-1 top quad, so the
    # ONE merge that crosses shards — 4 res-1 siblings → the res-0
    # root — can never happen there. Route every cell_res<=1 row (at
    # most 4 in the whole output) to shard 0 of a second sharded pass;
    # all other rows hash-spread and pass through untouched.
    n2 = 32

    def _shard2(df: pd.DataFrame) -> pd.DataFrame:
        low = df["cell_res"].to_numpy() <= 1
        s = 1 + (df["cell_id"].to_numpy(np.int64).astype(np.uint64)
                 % np.uint64(n2 - 1)).astype(np.int64)
        s[low] = 0
        return df.assign(_s2=s)

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["_s2"].iloc[0])
        g = g.drop(columns="_s2")
        if shard != 0:
            return g
        low = g[g["cell_res"] <= 1]
        if len(low) == 0:
            return g
        hi = g[g["cell_res"] > 1]
        roots = low[low["cell_res"] == 0]
        r1 = np.unique(low[low["cell_res"] == 1]["cell_id"].to_numpy(np.int64))
        if len(r1) == 4:
            merged = pd.DataFrame({"cell_id": [0], "cell_res": [0]})
            r1 = np.empty(0, np.int64)
        else:
            merged = pd.DataFrame({"cell_id": [], "cell_res": []}, dtype=np.int64)
        keep1 = pd.DataFrame({"cell_id": r1, "cell_res": np.ones(len(r1), np.int64)})
        return pd.concat([hi, roots, keep1, merged], ignore_index=True)

    return (
        compacted.map_batches(_shard2, batch_format="pandas")
        .groupby("_s2")
        .map_groups(_finish, batch_format="pandas")
    )


def salted_group_apply(
    ds,
    key_col: str,
    partial_fn,
    combine_fn,
    salt_factor: int = 16,
    id_col: str | None = None,
):
    """Two-phase group apply for SKEWED keys (north star: "skewed hot
    cells split by salted repartition").

    A plain ``groupby(key)`` ships every row of a hot key to one
    reducer; here phase 1 groups on ``(key, salt)`` where
    ``salt = stable_hash(id) % salt_factor`` — a hot key's rows spread
    over ``salt_factor`` reducers, each producing one PARTIAL row via
    ``partial_fn(group_df) -> row_dict``. Phase 2 groups the (tiny)
    partials on ``key`` alone and merges them with
    ``combine_fn(partials_df) -> row_dict``.

    Correct for any decomposable computation (count/sum/min/max/topk/
    sketches); ``partial_fn``/``combine_fn`` define the algebra. The
    salt is a stable hash of ``id_col`` (or the row's key-local order),
    so reruns produce identical partials.

    Execution is the SHARDED group pattern (CLAUDE.md / stages/dedup.py
    rule: ``groupby(key).map_groups`` pays Ray's per-distinct-key
    machinery — one sort-partitioned Python call per key): both phases
    exchange on ``hash % num_shards`` and resolve the actual
    (key, salt) / key groups with a LOCAL pandas groupby inside each
    shard. The hot key still spreads over ``salt_factor`` distinct
    phase-1 shards (the shard hash covers the salt), which is the whole
    point of salting; the per-group Python cost drops from a Ray block
    round-trip to a local groupby iteration. Measured at sf0.01
    (60k rows, 3.6k tiles, 80% in one tile): 11.5 s → ~1.5 s.
    """
    import pyarrow  # noqa: F401  (ray pandas path)

    from geomedea_ray.functions.text import stable_hash64
    from geomedea_ray.util import auto_shards, coalesce_width, size_hint

    n_shards = auto_shards(size_hint(ds))

    def _mix(col: pd.Series) -> np.ndarray:
        """Stable uint64 hash of a column: splitmix64 finalizer for
        integer dtypes (vectorized, no string materialization),
        stable_hash64 otherwise."""
        if pd.api.types.is_integer_dtype(col):
            z = col.to_numpy().astype(np.uint64, copy=True)
            z += np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return z ^ (z >> np.uint64(31))
        return stable_hash64(col.astype(str)).astype(np.uint64)

    def _salt_and_shard(df: pd.DataFrame) -> pd.DataFrame:
        if id_col is not None:
            salt = (_mix(df[id_col]) % np.uint64(salt_factor)).astype(np.int64)
        else:
            salt = (np.arange(len(df)) % salt_factor).astype(np.int64)
        shard = (
            (_mix(df[key_col]) ^ (salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return df.assign(_salt=salt, _shard=shard)

    def _partial_shard(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (k, _s), grp in g.drop(columns="_shard").groupby(
            [key_col, "_salt"], sort=False
        ):
            row = partial_fn(grp.drop(columns="_salt"))
            row[key_col] = k
            rows.append(row)
        return pd.DataFrame(rows)

    def _combine_shard(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in g.drop(columns="_shard2").groupby(key_col, sort=False):
            row = combine_fn(grp)
            row[key_col] = k
            rows.append(row)
        return pd.DataFrame(rows)

    partials = (
        ds.map_batches(_salt_and_shard, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_partial_shard, batch_format="pandas")
    )
    # phase 2: the partial stream is tiny (≤ salt_factor rows per key);
    # coalesce it so the exchange pays per-block cost on a few blocks
    n2 = coalesce_width(None)

    def _shard2(df: pd.DataFrame) -> pd.DataFrame:
        shard = (_mix(df[key_col]) % np.uint64(n2)).astype(np.int64)
        return df.assign(_shard2=shard)

    return (
        partials.map_batches(_shard2, batch_format="pandas")
        .repartition(n2)
        .groupby("_shard2")
        .map_groups(_combine_shard, batch_format="pandas")
    )
