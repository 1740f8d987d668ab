"""Raster-tile ↔ vector assignment + tile pyramid (SURVEY §7.2 step 6).

``tile_aggregate``: assign every feature a tile id at a zoom level
(stages/geocode.tile_batch) and aggregate per tile. The groupby is ONE
hash shuffle on ``tile_id``; count/sum aggregates are pre-reduced per
block by Ray's aggregate machinery, so hot tiles (skewed cells) ship
one partial row per block, not their raw rows — the practical salting
answer for algebraic aggregates (SURVEY §4 skew row).

``tile_pyramid``: rolls base-zoom tile stats up to zoom 0 by repeated
integer-halving of tile coords + re-aggregation. Each level is ≤ 1/4
the previous level's rows — log(z) tiny shuffles, driver never holds
more than the (small) aggregated levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.functions.cells import tile_id
from geomedea_ray.stages.geocode import tile_batch

#: tree-combine applies while 4^zoom ≤ this (zoom ≤ 10); beyond that
#: the per-tile cardinality warrants a real hash/sort groupby
TREE_COMBINE_MAX_TILES = 1 << 20
TREE_FAN = 64


def tile_aggregate(ds, zoom: int, scheme: str = "eq", value_col: str | None = None,
                   lng_col: str = "lng", lat_col: str = "lat"):
    """Per-tile (tile_id, tile_x, tile_y, n [, sum_value]).

    Explicit map-side COMBINE before the shuffle: each batch collapses
    to one partial row per distinct tile (np.unique + reduceat), so the
    groupby moves ~tiles×blocks rows instead of every input row — at
    planet scale the difference between shuffling 10¹² rows and ~10⁶
    partials. The final groupby sums partials (algebraic aggregate)."""
    from ray.data.aggregate import Sum

    ds = ds.map_batches(
        tile_batch,
        fn_kwargs={"zoom": zoom, "scheme": scheme, "lng_col": lng_col, "lat_col": lat_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # schema-stable empty partial: upstream filters can emit
            # empty blocks; starts=[0] would index into a size-0 array
            cols = {
                "tile_id": pa.array([], pa.int64()),
                "tile_x": pa.array([], pa.int32()),
                "tile_y": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
            }
            if value_col is not None:
                cols[f"sum_{value_col}"] = pa.array([], pa.float64())
            return pa.table(cols)
        tid = batch["tile_id"].to_numpy()
        order = np.argsort(tid, kind="stable")
        tid_s = tid[order]
        starts = np.concatenate([[0], np.flatnonzero(tid_s[1:] != tid_s[:-1]) + 1])
        uniq = tid_s[starts]
        counts = np.diff(np.concatenate([starts, [len(tid_s)]]))
        cols = {
            "tile_id": pa.array(uniq, pa.int64()),
            "tile_x": pa.array(batch["tile_x"].to_numpy()[order][starts], pa.int32()),
            "tile_y": pa.array(batch["tile_y"].to_numpy()[order][starts], pa.int32()),
            "n": pa.array(counts, pa.int64()),
        }
        if value_col is not None:
            v = batch[value_col].to_numpy(zero_copy_only=False)[order]
            cols[f"sum_{value_col}"] = pa.array(
                np.add.reduceat(v, starts), pa.float64()
            )
        return pa.table(cols)

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    if (1 << (2 * zoom)) <= TREE_COMBINE_MAX_TILES:
        # TREE combine instead of a groupby sort-shuffle: the partial
        # stream holds ≤ 4^zoom distinct tiles, so a level-1 combine
        # over TREE_FAN coalesced blocks bounds the final single-task
        # input to TREE_FAN × 4^zoom rows regardless of dataset size
        # (measured 3.5× vs groupby().aggregate() at sf0.1 — the sort
        # machinery costs seconds on kilobyte partials). High zooms
        # (4^zoom > cap) fall through to the hash/sort groupby, which
        # scales with tile cardinality.
        agg = {"n": "sum"}
        if value_col is not None:
            agg[f"sum_{value_col}"] = "sum"

        def _combine(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["tile_id", "tile_x", "tile_y"], as_index=False).agg(agg)

        level1 = partials.repartition(TREE_FAN).map_batches(
            _combine, batch_format="pandas", batch_size=None
        )
        return level1.repartition(1).map_batches(
            _combine, batch_format="pandas", batch_size=None
        )

    from ray.data.aggregate import Max

    aggs = [
        Sum("n", alias_name="n"),
        Max("tile_x", alias_name="tile_x"),
        Max("tile_y", alias_name="tile_y"),
    ]
    if value_col is not None:
        aggs.append(Sum(f"sum_{value_col}", alias_name=f"sum_{value_col}"))
    return partials.groupby("tile_id").aggregate(*aggs)


def tile_pyramid(base: pd.DataFrame, base_zoom: int, value_col: str | None = None) -> pd.DataFrame:
    """Roll aggregated base-zoom tiles up to zoom 0 (driver-side — the
    base aggregate has already shrunk the data to ≤ 4^z rows; for
    planet-scale pyramids run the same rollup as repeated Ray
    groupbys). Returns all levels concatenated with a ``zoom`` col."""
    levels = [base.assign(zoom=base_zoom)]
    cur = base
    for z in range(base_zoom - 1, -1, -1):
        parent = cur.copy()
        parent["tile_x"] = parent["tile_x"] // 2
        parent["tile_y"] = parent["tile_y"] // 2
        agg = {"n": "sum"}
        if value_col is not None:
            agg[f"sum_{value_col}"] = "sum"
        cur = parent.groupby(["tile_x", "tile_y"], as_index=False).agg(agg)
        cur["tile_id"] = tile_id(
            cur["tile_x"].to_numpy(), cur["tile_y"].to_numpy(), z
        )
        levels.append(cur.assign(zoom=z))
    out = pd.concat(levels, ignore_index=True)
    return out


class TilePyramidBuilder:
    """Actor-pool stage for per-tile mosaics: receives all rows of one
    tile (via groupby().map_groups) and reduces them to one tile row
    (here: count + mean of a value; a real renderer would compose
    pixels). State (e.g. palette/canvas) lives per actor."""

    def __init__(self, value_col: str | None = None):
        self.value_col = value_col

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        row = {
            "tile_id": [g["tile_id"].iloc[0]],
            "tile_x": [g["tile_x"].iloc[0]],
            "tile_y": [g["tile_y"].iloc[0]],
            "n": [len(g)],
        }
        if self.value_col:
            row[f"mean_{self.value_col}"] = [g[self.value_col].mean()]
        return pd.DataFrame(row)
