"""Packed (static, bottom-up) R-tree over Hilbert-sorted leaf bboxes,
as numpy level arrays.

Re-expresses the reference's packed R-tree (reference:
geomedea/src/packed_r_tree/mod.rs:57-180, writer.rs:17-84) for the Ray
engine: one small tree per output partition (leaves = rows in stored
Hilbert order), built bottom-up with BRANCHING_FACTOR=16 via
``np.minimum/maximum.reduceat``, serialized as ``.npz`` beside the
partition's Parquet file. Queries are vectorized top-down level sweeps
(the reference's BFS work-queue — packed_r_tree/reader.rs:25-71 —
becomes one mask + gather per level).

Level math (``nodes_per_level``) matches the reference goldens for
n ∈ {0,1,2,4,15,16,17,32,33,255,256,257}
(reference: packed_r_tree/mod.rs:196-210; ported in
tests/test_index.py).
"""

from __future__ import annotations

import io

import numpy as np

from geomedea_ray.functions.geo import Bounds

#: reference: geomedea/src/packed_r_tree/mod.rs:18
BRANCHING_FACTOR = 16


def nodes_per_level(num_leaves: int) -> list[int]:
    """Level widths, root level FIRST (reference: mod.rs:75-94)."""
    if num_leaves == 0:
        return []
    levels = [num_leaves]
    n = num_leaves
    while n > 1:
        full = n // BRANCHING_FACTOR
        n = full if full * BRANCHING_FACTOR == n else full + 1
        levels.append(n)
    levels.reverse()
    return levels


class PackedRTree:
    """levels[0] = root level … levels[-1] = leaves; each level is a
    dict of 4 int32 arrays (min_lng, min_lat, max_lng, max_lat)."""

    def __init__(self, levels: list[dict[str, np.ndarray]]):
        self.levels = levels

    # -- build ---------------------------------------------------------

    @classmethod
    def build(
        cls,
        min_lng: np.ndarray,
        min_lat: np.ndarray,
        max_lng: np.ndarray,
        max_lat: np.ndarray,
    ) -> "PackedRTree":
        """Bottom-up build from leaf bboxes (scaled int32, in stored
        order). Parent bbox = union of ≤16 children
        (reference: packed_r_tree/writer.rs:44-76)."""
        leaf = {
            "min_lng": np.asarray(min_lng, np.int32),
            "min_lat": np.asarray(min_lat, np.int32),
            "max_lng": np.asarray(max_lng, np.int32),
            "max_lat": np.asarray(max_lat, np.int32),
        }
        levels = [leaf]
        cur = leaf
        while len(cur["min_lng"]) > 1:
            n = len(cur["min_lng"])
            starts = np.arange(0, n, BRANCHING_FACTOR)
            cur = {
                "min_lng": np.minimum.reduceat(cur["min_lng"], starts),
                "min_lat": np.minimum.reduceat(cur["min_lat"], starts),
                "max_lng": np.maximum.reduceat(cur["max_lng"], starts),
                "max_lat": np.maximum.reduceat(cur["max_lat"], starts),
            }
            levels.append(cur)
        levels.reverse()
        return cls(levels)

    @property
    def num_leaves(self) -> int:
        return len(self.levels[-1]["min_lng"]) if self.levels else 0

    def node_count(self) -> int:
        return sum(len(lv["min_lng"]) for lv in self.levels)

    def root_bounds(self) -> Bounds:
        r = self.levels[0]
        return Bounds(
            int(r["min_lng"][0]), int(r["min_lat"][0]), int(r["max_lng"][0]), int(r["max_lat"][0])
        )

    # -- query ---------------------------------------------------------

    def query_bbox(self, q: Bounds) -> np.ndarray:
        """Leaf positions (row indices in stored order) whose bbox
        intersects ``q`` (closed intervals — reference semantics:
        bounds.rs:101-119; NO exact-geometry refinement, matching
        select_bbox — packed_r_tree/reader.rs:36-38).

        Vectorized top-down: at each level keep the surviving node
        positions, expand each to its ≤16 children in the next level.
        """
        if not self.levels or self.num_leaves == 0:
            return np.empty(0, dtype=np.int64)
        cand = np.array([0], dtype=np.int64)
        for depth, lv in enumerate(self.levels):
            hit = cand[
                (lv["max_lng"][cand] >= q.min_lng)
                & (lv["max_lat"][cand] >= q.min_lat)
                & (lv["min_lng"][cand] <= q.max_lng)
                & (lv["min_lat"][cand] <= q.max_lat)
            ]
            if depth == len(self.levels) - 1:
                return hit
            if len(hit) == 0:
                return np.empty(0, dtype=np.int64)
            nxt_len = len(self.levels[depth + 1]["min_lng"])
            starts = hit * BRANCHING_FACTOR
            # expand to children ranges, clipped at level end
            cand = (starts[:, None] + np.arange(BRANCHING_FACTOR)[None, :]).ravel()
            cand = cand[cand < nxt_len]
        return np.empty(0, dtype=np.int64)

    # -- serialization -------------------------------------------------

    def to_bytes(self) -> bytes:
        arrs = {}
        for i, lv in enumerate(self.levels):
            for k, v in lv.items():
                arrs[f"L{i}_{k}"] = v
        buf = io.BytesIO()
        np.savez_compressed(buf, n_levels=np.int64(len(self.levels)), **arrs)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "PackedRTree":
        with np.load(io.BytesIO(data)) as z:
            n = int(z["n_levels"])
            levels = [
                {k: z[f"L{i}_{k}"] for k in ("min_lng", "min_lat", "max_lng", "max_lat")}
                for i in range(n)
            ]
        return cls(levels)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.to_bytes())

    @classmethod
    def load(cls, path: str) -> "PackedRTree":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())
