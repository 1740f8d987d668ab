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


def tile_partials(ds, zoom: int, scheme: str = "eq", value_col: str | None = None,
                  lng_col: str = "lng", lat_col: str = "lat"):
    """Tile assignment + map-side COMBINE: each batch collapses to one
    partial row per block-local distinct tile (np.unique + reduceat).
    Shared by tile_aggregate and tile_pyramid_from_points."""
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

    return ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)


def tile_aggregate(ds, zoom: int, scheme: str = "eq", value_col: str | None = None,
                   lng_col: str = "lng", lat_col: str = "lat"):
    """Per-tile (tile_id, tile_x, tile_y, n [, sum_value]).

    Explicit map-side COMBINE before the shuffle (tile_partials), so
    the exchange moves ~tiles×blocks rows instead of every input row —
    at planet scale the difference between shuffling 10¹² rows and
    ~10⁶ partials. The final combine sums partials (algebraic)."""
    from ray.data.aggregate import Sum

    partials = tile_partials(ds, zoom, scheme, value_col, lng_col, lat_col)

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


#: levels at or below this zoom are rolled up driver-side (≤ 4^8 ≈
#: 65k tiles — kilobytes); deeper levels stay distributed
PYRAMID_DRIVER_MAX_ZOOM = 8


def tile_pyramid_ds(base_ds, base_zoom: int, value_col: str | None = None,
                    split_zoom: int | None = None, num_shards: int | None = None,
                    pre_aggregated: bool = True):
    """Distributed tile pyramid for DEEP zooms (round-2 VERDICT item 5:
    the driver-side rollup materializes up to 4^z tiles — 2.7e8 at
    z=14).

    ONE shuffle total: base tiles are sharded by their ancestor tile
    at ``split_zoom``, which co-locates every descendant of a
    split-zoom subtree — so ALL levels from base_zoom down to
    split_zoom roll up independently inside each shard (vectorized
    pandas halving, no further exchange). Levels above the split
    (split_zoom-1 … 0) hold ≤ 4^split_zoom total tiles; they are
    finished driver-side from the (small) split-level rows, exactly
    like the shallow-zoom ``tile_pyramid``.

    ``base_ds``: a base-zoom tile set with tile_x/tile_y/n
    [+ sum_<value_col>] columns. ``pre_aggregated=False`` accepts a
    PARTIAL stream (per-block combined, duplicate tiles across blocks
    — e.g. tile_aggregate's map-side partials) and resolves base-tile
    duplicates inside the shard, saving the separate base groupby:
    the ancestor shard already co-locates every row of a base tile.
    Returns a Dataset of all levels
    (zoom, tile_x, tile_y, n [, sum_value], tile_id)."""
    import ray.data

    from geomedea_ray.util import auto_shards, size_hint

    if split_zoom is None:
        split_zoom = min(PYRAMID_DRIVER_MAX_ZOOM, base_zoom)
    if base_zoom <= PYRAMID_DRIVER_MAX_ZOOM:
        # whole pyramid is small — the driver rollup IS the right plan
        base = base_ds.to_pandas()
        if not pre_aggregated:
            agg0 = {"n": "sum"}
            if value_col is not None:
                agg0[f"sum_{value_col}"] = "sum"
            base = base.groupby(["tile_id", "tile_x", "tile_y"],
                                as_index=False).agg(agg0)
        return ray.data.from_pandas(tile_pyramid(base, base_zoom, value_col))

    num_shards = num_shards or auto_shards(size_hint(base_ds))
    agg = {"n": "sum"}
    if value_col is not None:
        agg[f"sum_{value_col}"] = "sum"
    shift = base_zoom - split_zoom

    def _shardit(df: pd.DataFrame) -> pd.DataFrame:
        ax = (df["tile_x"].to_numpy() >> shift).astype(np.uint64)
        ay = (df["tile_y"].to_numpy() >> shift).astype(np.uint64)
        shard = ((ax * np.uint64(0x9E3779B97F4A7C15) ^ ay)
                 % np.uint64(num_shards)).astype(np.int64)
        return df.assign(_shard=shard)

    keep = ["tile_x", "tile_y"] + list(agg)

    def _rollup(g: pd.DataFrame) -> pd.DataFrame:
        cur = g[keep]
        if not pre_aggregated:
            # resolve cross-block duplicates of base tiles in-shard
            cur = cur.groupby(["tile_x", "tile_y"], as_index=False).agg(agg)
        levels = [cur.assign(zoom=base_zoom)]
        for z in range(base_zoom - 1, split_zoom - 1, -1):
            cur = (
                cur.assign(tile_x=cur["tile_x"] // 2, tile_y=cur["tile_y"] // 2)
                .groupby(["tile_x", "tile_y"], as_index=False)
                .agg(agg)
            )
            levels.append(cur.assign(zoom=z))
        out = pd.concat(levels, ignore_index=True)
        out["tile_id"] = tile_id(out["tile_x"].to_numpy(),
                                 out["tile_y"].to_numpy(),
                                 out["zoom"].to_numpy())
        return out

    deep = (
        base_ds.map_batches(_shardit, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_rollup, batch_format="pandas")
        .materialize()  # consumed twice: result + split-level extract
    )
    split_rows = deep.filter(expr=f"zoom == {split_zoom}").to_pandas()
    shallow = tile_pyramid(
        split_rows.drop(columns=["zoom", "tile_id"]), split_zoom, value_col
    )
    shallow = shallow[shallow["zoom"] < split_zoom]
    shallow["tile_id"] = tile_id(shallow["tile_x"].to_numpy(),
                                 shallow["tile_y"].to_numpy(),
                                 shallow["zoom"].to_numpy())
    return deep.union(ray.data.from_pandas(shallow[deep.schema().names]))


def tile_pyramid_from_points(ds, base_zoom: int, scheme: str = "eq",
                             value_col: str | None = None,
                             split_zoom: int | None = None,
                             num_shards: int | None = None):
    """Deep-zoom pyramid straight from the point stream with ONE
    shuffle total: tile assignment + per-block partial combine
    (tile_partials), then the ancestor-sharded rollup consumes the
    PARTIAL stream directly (pre_aggregated=False) — the separate
    base-zoom groupby a tile_aggregate→tile_pyramid_ds chain would pay
    is folded into the shard's first in-shard combine."""
    partials = tile_partials(ds, base_zoom, scheme, value_col)
    return tile_pyramid_ds(partials, base_zoom, value_col,
                           split_zoom=split_zoom, num_shards=num_shards,
                           pre_aggregated=False)


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


# ------------------------------------------------------ raster render

#: rendered tile side = 2^RENDER_SUB_BITS pixels (64×64)
RENDER_SUB_BITS = 6


def tile_render(ds, zoom: int = 6, sub_bits: int = RENDER_SUB_BITS,
                scheme: str = "eq", num_shards: int | None = None,
                lng_col: str = "lng", lat_col: str = "lat"):
    """Distributed RASTER tile rendering — the vector→raster half of
    the north rule's raster↔vector assignment, as a real tile-server
    stage: every zoom-``zoom`` tile that contains points becomes a
    2^sub_bits × 2^sub_bits grayscale PNG (the sandbox's lossless
    ``pngz`` codec) whose pixel (ly, lx) is ``min(count, 255)`` of the
    corresponding zoom+sub_bits subcell (y grows downward — ty already
    does in the eq scheme).

    Shape: ONE exchange, and no separate fine-zoom groupby — the
    PARTIAL subcell counts (tile_partials' map-side combine: ~tiles ×
    blocks rows, never points) shuffle straight to their parent tile's
    shard, where ``np.add.at`` folds duplicate partials while
    scattering into the pixel array (one accumulate + one zlib encode
    per tile). Output: (tile_x, tile_y, n_points, w, h, fmt, bytes) —
    a renderable image table in the engine's own image-column
    convention. (First version aggregated at zoom+sub_bits with
    tile_aggregate before sharding: the z12 sort-exchange alone cost
    ~5 s at sf0.1; folding in-shard removed it — 5.9 → 0.8 s.)

    Per-shard working set is tiles/num_shards × 4^sub_bits bytes,
    independent of point count; the hot-cell case is the COUNT side's
    problem and already handled by tile_partials' map-side combine.
    """
    from geomedea_ray.functions import codecs
    from geomedea_ray.util import auto_shards, size_hint

    side = 1 << sub_bits
    mask = side - 1
    num_shards = num_shards or auto_shards(size_hint(ds))
    fine = tile_partials(ds, zoom + sub_bits, scheme,
                         lng_col=lng_col, lat_col=lat_col)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        px = (df["tile_x"].to_numpy(np.int64) >> sub_bits)
        py = (df["tile_y"].to_numpy(np.int64) >> sub_bits)
        key = (px << 32) | py
        return df.assign(
            _px=px, _py=py,
            _shard=(key.astype(np.uint64) % np.uint64(num_shards))
            .astype(np.int64))

    def _render(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "_px" not in df.columns:
            return pd.DataFrame({
                "tile_x": pd.Series([], dtype=np.int64),
                "tile_y": pd.Series([], dtype=np.int64),
                "n_points": pd.Series([], dtype=np.int64),
                "w": pd.Series([], dtype=np.int32),
                "h": pd.Series([], dtype=np.int32),
                "fmt": pd.Series([], dtype=object),
                "bytes": pd.Series([], dtype=object),
            })
        lx = df["tile_x"].to_numpy(np.int64) & mask
        ly = df["tile_y"].to_numpy(np.int64) & mask
        idx = ly * side + lx
        out_x, out_y, out_n, blobs = [], [], [], []
        for (tpx, tpy), g in df.assign(_i=idx).groupby(
                ["_px", "_py"], sort=False):
            arr = np.zeros(side * side, np.int64)
            np.add.at(arr, g["_i"].to_numpy(),
                      g["n"].to_numpy(np.int64))  # fold partials
            px3 = np.repeat(np.minimum(arr, 255).astype(np.uint8),
                            3).reshape(side, side, 3)  # gray RGB
            blobs.append(codecs.encode(px3, "pngz"))
            out_x.append(tpx)
            out_y.append(tpy)
            out_n.append(int(g["n"].sum()))
        return pd.DataFrame({
            "tile_x": np.asarray(out_x, np.int64),
            "tile_y": np.asarray(out_y, np.int64),
            "n_points": np.asarray(out_n, np.int64),
            "w": np.full(len(out_x), side, np.int32),
            "h": np.full(len(out_x), side, np.int32),
            "fmt": ["pngz"] * len(out_x),
            "bytes": blobs,
        })

    return (
        fine.map_batches(_tag, batch_format="pandas", batch_size=None)
        .repartition(_render_coalesce(num_shards))
        .groupby("_shard").map_groups(_render, batch_format="pandas")
    )


def _render_coalesce(num_shards: int) -> int:
    """Partial streams are kilobyte-sized; the sort-exchange pays
    per-block machinery (CLAUDE.md round-3 rule) — coalesce before the
    shard groupby."""
    return max(8, min(num_shards, 16))
