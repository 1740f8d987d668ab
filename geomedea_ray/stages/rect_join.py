"""Distributed bbox-intersect JOIN (rect × rect) — PBSM (Partition
Based Spatial-Merge, Patel & DeWitt SIGMOD'96, public algorithm): the
spatial join underneath "which detections overlap which annotations"
at planet scale, complementing the point-in-polygon join (stages/pip)
and the 1-D broadcast range join (stages/joins.range_join_pairs).

Shape:
- each rectangle EMITS one row per grid cell it overlaps (flat
  vectorized np.repeat — a rect spanning g cells costs g rows, so
  pick ``cell`` ≳ the typical rect size to keep the blow-up ≤ 4×);
- both sides co-shuffle ONCE on ``hash(cell) % num_shards``;
- inside a shard, one ``pd.merge`` on the cell id yields each cell's
  A×B candidate product, filtered vectorized to true overlaps;
- duplicate pairs (rects meeting in several cells) are eliminated
  with the PBSM REFERENCE-POINT rule — a pair is reported only by
  the cell containing ``(max(ax0,bx0), max(ay0,by0))`` — so there is
  NO distinct/dedup exchange afterwards.

Degenerate touching edges count as intersecting (closed boxes), the
same convention as the reference's bbox-intersects semantics
(geomedea bounds.rs intersects) and the SQL mirror's ``<=``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geomedea_ray.stages.joins import _resolve_shards

#: cell-id packing: cells are addressed as (cx << 32) | cy on int64 —
#: valid while |cx|,|cy| < 2^31 (any realistic grid)
_CY_BITS = 32


def _cells_of(x0, y0, x1, y1, cell: float):
    """Vectorized: for each rect i, the packed ids of every grid cell
    it overlaps, plus the repeat index mapping back to i."""
    cx0 = np.floor(x0 / cell).astype(np.int64)
    cy0 = np.floor(y0 / cell).astype(np.int64)
    cx1 = np.floor(x1 / cell).astype(np.int64)
    cy1 = np.floor(y1 / cell).astype(np.int64)
    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    reps = (nx * ny).astype(np.int64)
    idx = np.repeat(np.arange(len(x0)), reps)
    # per-rect local cell enumeration (row-major inside each rect)
    local = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
    lx = local // np.repeat(ny, reps)
    ly = local % np.repeat(ny, reps)
    cx = np.repeat(cx0, reps) + lx
    cy = np.repeat(cy0, reps) + ly
    return idx, (cx << np.int64(_CY_BITS)) | (cy & np.int64(2**_CY_BITS - 1)), cx, cy


def bbox_intersect_join(
    a_ds,
    b_ds,
    a_cols: tuple[str, str, str, str],
    b_cols: tuple[str, str, str, str],
    a_keep: list[str],
    b_keep: list[str],
    cell: float,
    num_shards: int | None = None,
):
    """Pairs ``(a_keep…, b_keep…)`` for every intersecting (closed)
    rect pair. ``a_cols``/``b_cols`` name (x0, y0, x1, y1). Keep-column
    names must be disjoint across sides."""
    num_shards = _resolve_shards(a_ds, num_shards)

    def _expand(box, keep, side):
        x0c, y0c, x1c, y1c = box

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "_cell": pd.Series([], dtype=np.int64),
                    "_shard": pd.Series([], dtype=np.int64),
                    "_side": pd.Series([], dtype=np.int8),
                    **{c: pd.Series([], dtype=np.float64)
                       for c in ("_x0", "_y0", "_x1", "_y1")},
                    **{c: df[c].iloc[0:0] for c in keep},
                })
            idx, packed, _, _ = _cells_of(
                df[x0c].to_numpy(np.float64), df[y0c].to_numpy(np.float64),
                df[x1c].to_numpy(np.float64), df[y1c].to_numpy(np.float64),
                cell,
            )
            out = pd.DataFrame({
                "_cell": packed,
                "_shard": (packed.astype(np.uint64)
                           % np.uint64(num_shards)).astype(np.int64),
                "_side": np.int8(side),
                "_x0": df[x0c].to_numpy(np.float64)[idx],
                "_y0": df[y0c].to_numpy(np.float64)[idx],
                "_x1": df[x1c].to_numpy(np.float64)[idx],
                "_y1": df[y1c].to_numpy(np.float64)[idx],
            })
            for c in keep:
                out[c] = df[c].to_numpy()[idx]
            return out

        return fn

    a = a_ds.map_batches(_expand(a_cols, a_keep, 0), batch_format="pandas")
    b = b_ds.map_batches(_expand(b_cols, b_keep, 1), batch_format="pandas")
    both = a.union(b)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        # a shard fed by only one side never saw the other side's
        # columns (union schema unification is per-block — same guard
        # as hash_join._merge); emit a typed-where-possible empty
        empty = pd.DataFrame({
            **{c: (df[c].iloc[0:0] if c in df.columns
                   else pd.Series([], dtype=object))
               for c in a_keep + b_keep},
        })
        if not set(a_keep + b_keep) <= set(df.columns):
            return empty
        la = df[df["_side"] == 0]
        lb = df[df["_side"] == 1]
        if len(la) == 0 or len(lb) == 0:
            return empty
        m = la[["_cell", "_x0", "_y0", "_x1", "_y1"] + a_keep].merge(
            lb[["_cell", "_x0", "_y0", "_x1", "_y1"] + b_keep],
            on="_cell", suffixes=("_a", "_b"),
        )
        if len(m) == 0:
            return empty
        hit = (
            (m["_x0_a"] <= m["_x1_b"]) & (m["_x0_b"] <= m["_x1_a"])
            & (m["_y0_a"] <= m["_y1_b"]) & (m["_y0_b"] <= m["_y1_a"])
        )
        # PBSM reference point: report only from the cell that contains
        # the overlap's lower-left corner
        rx = np.maximum(m["_x0_a"].to_numpy(), m["_x0_b"].to_numpy())
        ry = np.maximum(m["_y0_a"].to_numpy(), m["_y0_b"].to_numpy())
        rc = (np.floor(rx / cell).astype(np.int64) << np.int64(_CY_BITS)) | (
            np.floor(ry / cell).astype(np.int64) & np.int64(2**_CY_BITS - 1)
        )
        keep = hit.to_numpy() & (rc == m["_cell"].to_numpy())
        return m.loc[keep, a_keep + b_keep].reset_index(drop=True)

    return both.groupby("_shard").map_groups(_pairs, batch_format="pandas")


def dwithin_join(
    a_ds,
    b_ds,
    a_xy: tuple[str, str],
    b_xy: tuple[str, str],
    a_keep: list[str],
    b_keep: list[str],
    radius: int,
    num_shards: int | None = None,
    dist2_col: str = "dist2",
):
    """Within-distance point JOIN (the ST_DWithin shape): every pair
    ``(a, b)`` with ``(ax-bx)² + (ay-by)² <= radius²``, EXACT — the
    coordinates must be integer-quantized (the engine's int32 grid, or
    any integer units) and every decision is int64 arithmetic, so the
    SQL mirror cannot drift on float rounding.

    Shape (same PBSM grid as :func:`bbox_intersect_join`, specialised
    for points):

    - grid cell side = ``radius``, so a qualifying pair is never more
      than one cell apart on either axis;
    - side A is replicated into its 3×3 cell NEIGHBOURHOOD (9 rows per
      point — pass the smaller side as ``a_ds``), side B emits its own
      cell once;
    - both sides co-shuffle ONCE on ``hash(cell) % num_shards``
      (auto_shards-derived width, never a constant);
    - inside a shard one ``pd.merge`` on the packed cell id yields the
      candidate products, refined vectorized by the integer circle
      predicate. Each qualifying pair is produced exactly once — by
      B's unique home cell — so NO dedup exchange follows.

    Per-shard working set is the points of ~``cells/num_shards`` cells
    (9× the A side), independent of total input size; hot cells are
    the caller's concern (pre-salt with a finer grid if one cell holds
    a whole city). Candidate blow-up is bounded by the true result
    plus same-neighbourhood misses — no all-pairs anywhere.

    Overflow contract: ``|dx|, |dy| <= 2*radius`` inside a merged cell
    pair, so ``dist2`` fits int64 for any ``radius < 2^30``.
    """
    if radius <= 0:
        raise ValueError("radius must be a positive integer")
    num_shards = _resolve_shards(b_ds, num_shards)
    cell = int(radius)
    r2 = int(radius) * int(radius)
    off = np.array([-1, 0, 1], dtype=np.int64)
    nbr_x = np.repeat(off, 3)   # 9 neighbour offsets
    nbr_y = np.tile(off, 3)

    def _expand(xy, keep, side, replicate):
        xc, yc = xy

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "_cell": pd.Series([], dtype=np.int64),
                    "_shard": pd.Series([], dtype=np.int64),
                    "_side": pd.Series([], dtype=np.int8),
                    "_px": pd.Series([], dtype=np.int64),
                    "_py": pd.Series([], dtype=np.int64),
                    **{c: df[c].iloc[0:0] for c in keep},
                })
            x = df[xc].to_numpy(np.int64)
            y = df[yc].to_numpy(np.int64)
            cx = np.floor_divide(x, cell)
            cy = np.floor_divide(y, cell)
            if replicate:
                n = len(x)
                idx = np.repeat(np.arange(n), 9)
                cx = np.repeat(cx, 9) + np.tile(nbr_x, n)
                cy = np.repeat(cy, 9) + np.tile(nbr_y, n)
                x, y = x[idx], y[idx]
            else:
                idx = np.arange(len(x))
            packed = (cx << np.int64(_CY_BITS)) | (cy & np.int64(2**_CY_BITS - 1))
            out = pd.DataFrame({
                "_cell": packed,
                "_shard": (packed.astype(np.uint64)
                           % np.uint64(num_shards)).astype(np.int64),
                "_side": np.int8(side),
                "_px": x,
                "_py": y,
            })
            for c in keep:
                out[c] = df[c].to_numpy()[idx]
            return out

        return fn

    a = a_ds.map_batches(_expand(a_xy, a_keep, 0, True), batch_format="pandas")
    b = b_ds.map_batches(_expand(b_xy, b_keep, 1, False), batch_format="pandas")
    both = a.union(b)

    out_cols = a_keep + b_keep + [dist2_col]

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            **{c: (df[c].iloc[0:0] if c in df.columns
                   else pd.Series([], dtype=object))
               for c in a_keep + b_keep},
            dist2_col: pd.Series([], dtype=np.int64),
        })
        if not set(a_keep + b_keep) <= set(df.columns):
            return empty
        la = df[df["_side"] == 0]
        lb = df[df["_side"] == 1]
        if len(la) == 0 or len(lb) == 0:
            return empty
        m = la[["_cell", "_px", "_py"] + a_keep].merge(
            lb[["_cell", "_px", "_py"] + b_keep],
            on="_cell", suffixes=("_a", "_b"),
        )
        if len(m) == 0:
            return empty
        dx = m["_px_a"].to_numpy() - m["_px_b"].to_numpy()
        dy = m["_py_a"].to_numpy() - m["_py_b"].to_numpy()
        d2 = dx * dx + dy * dy
        keep = d2 <= r2
        out = m.loc[keep, a_keep + b_keep].reset_index(drop=True)
        out[dist2_col] = d2[keep]
        return out[out_cols]

    return both.groupby("_shard").map_groups(_pairs, batch_format="pandas")
