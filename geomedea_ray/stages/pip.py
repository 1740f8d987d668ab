"""Point-in-polygon join — broadcast small side, actor-pool probe.

The reference's only join-like operation is the implicit bbox semi-join
of select_bbox (reference: geomedea/src/reader.rs:328-346, bbox-only —
packed_r_tree/reader.rs:36-38). Per the north rule this operator adds
the exact refinement: bbox prefilter (reference semantics) THEN an
even-odd raycast (functions/geo.py:point_in_polygon).

Shuffle analysis (SURVEY §7.4): NO shuffle — the polygon side is small
(country/county scale), broadcast once via ``ray.put`` and loaded per
actor in ``__init__``; the point side streams through ``map_batches``.
A hash-partitioned fallback (bucket both sides by cell_id) only becomes
necessary if the polygon side outgrows worker memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomedea_ray.functions.geo import point_in_polygon


class PIPJoiner:
    """Actor: holds the broadcast polygon set; joins each point batch.

    Emits one output row per (point, containing polygon) pair —
    overlapping polygons produce multiple rows (flat join semantics).
    ``exact=False`` reproduces the reference's bbox-only matching.
    """

    def __init__(self, polygons_ref, id_cols: list[str], exact: bool = True):
        import ray

        # one object-store fetch per actor, not per batch
        self.polygons = ray.get(polygons_ref) if not isinstance(polygons_ref, list) else polygons_ref
        self.id_cols = id_cols
        self.exact = exact

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        take_idx: list[np.ndarray] = []
        pids: list[np.ndarray] = []
        names: list[str] = []
        for pid, name, xs, ys, bbox in self.polygons:
            # bbox prefilter = the reference's entire test; cheap mask
            m = (lng >= bbox[0]) & (lng <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
            if not m.any():
                continue
            cand = np.nonzero(m)[0]
            if self.exact:
                inside = point_in_polygon(lng[cand], lat[cand], xs, ys)
                cand = cand[inside]
            if len(cand):
                take_idx.append(cand)
                pids.append(np.full(len(cand), pid, np.int64))
                names.extend([name] * len(cand))
        if not take_idx:
            empty = batch.select(self.id_cols).slice(0, 0)
            return empty.append_column("poly_id", pa.array([], pa.int64())).append_column(
                "poly_name", pa.array([], pa.string())
            )
        idx = np.concatenate(take_idx)
        out = batch.select(self.id_cols).take(pa.array(idx))
        return out.append_column(
            "poly_id", pa.array(np.concatenate(pids), pa.int64())
        ).append_column("poly_name", pa.array(names, pa.string()))


def pip_join(
    points_ds,
    polygons: list,
    id_cols: list[str],
    exact: bool = True,
    concurrency=None,
    batch_size: int = 8192,
):
    """points Dataset (needs lng/lat cols) ⋈ polygon list.

    Default path: plain TASK fn with a per-process broadcast fetch
    (util.get_once) — fuses with the upstream read/maps, so batches
    never round-trip the object store and no pool spawn is paid. Pass
    ``concurrency`` to force the actor-pool path (for polygon sets big
    enough that per-actor residency matters)."""
    import ray

    ref = ray.put(polygons)
    if concurrency is not None:
        return points_ds.map_batches(
            PIPJoiner,
            fn_constructor_kwargs={"polygons_ref": ref, "id_cols": id_cols, "exact": exact},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
        )

    from geomedea_ray.util import get_once

    def _pip(batch):
        joiner = PIPJoiner(get_once(ref), id_cols=id_cols, exact=exact)
        return joiner(batch)

    return points_ds.map_batches(
        _pip, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def pip_join_sharded(
    points_ds,
    polygons: list,
    id_cols: list[str],
    exact: bool = True,
    zoom: int = 4,
    num_shards: int = 64,
):
    """Shuffle-based PIP join — the fallback for polygon sides too big
    to broadcast (module docstring): both sides are co-sharded by
    raster tile at ``zoom`` and each shard raycasts only its local
    (point, polygon) tile pairs.

    - polygon side: each polygon is replicated to every tile its BBOX
      covers (tiles are rectangular — coverage is a trivial integer
      range, unlike Hilbert cells);
    - point side: each point belongs to exactly ONE tile, so every
      (point, polygon) pair is tested exactly once — output equals the
      broadcast ``pip_join`` row-for-row.

    ``polygons`` is the same (pid, name, xs, ys, bbox) list; at true
    scale it would arrive as a Dataset and the explode step would be a
    ``map_batches`` over it — the shard/probe machinery is identical.
    """
    import pandas as pd

    from geomedea_ray.functions.cells import tile_xy_eq
    from geomedea_ray.functions.geo import point_in_polygon

    n_tiles = 1 << zoom

    # driver-side explode (polygon side is a list here): tile -> polys
    tile_polys: dict[int, list] = {}
    for pid, name, xs, ys, bbox in polygons:
        tx0, ty1 = tile_xy_eq(np.array([bbox[0]]), np.array([bbox[1]]), zoom)
        tx1, ty0 = tile_xy_eq(np.array([bbox[2]]), np.array([bbox[3]]), zoom)
        for tx in range(int(tx0[0]), int(tx1[0]) + 1):
            for ty in range(int(ty0[0]), int(ty1[0]) + 1):
                tile_polys.setdefault(tx * n_tiles + ty, []).append(
                    (pid, name, xs, ys, bbox)
                )
    import ray

    tp_ref = ray.put(tile_polys)

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        from geomedea_ray.util import get_once

        tp = get_once(tp_ref)
        out = []
        df = df.sort_values("_tile", kind="mergesort")
        tiles = df["_tile"].to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(tiles[1:] != tiles[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(tiles)]])
        for s, e in zip(starts, ends):
            polys = tp.get(int(tiles[s]))
            if not polys:
                continue
            sub = df.iloc[s:e]
            lng = sub["lng"].to_numpy()
            lat = sub["lat"].to_numpy()
            for pid, name, xs, ys, bbox in polys:
                m = (lng >= bbox[0]) & (lng <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
                if not m.any():
                    continue
                cand = np.nonzero(m)[0]
                if exact:
                    inside = point_in_polygon(lng[cand], lat[cand], xs, ys)
                    cand = cand[inside]
                if len(cand):
                    rows = sub.iloc[cand][id_cols].copy()
                    rows["poly_id"] = np.int64(pid)
                    rows["poly_name"] = name
                    out.append(rows)
        if not out:
            empty = df.iloc[0:0][id_cols].copy()
            empty["poly_id"] = pd.Series([], dtype=np.int64)
            empty["poly_name"] = pd.Series([], dtype=str)
            return empty
        return pd.concat(out, ignore_index=True)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        tx, ty = tile_xy_eq(df["lng"].to_numpy(), df["lat"].to_numpy(), zoom)
        tile = tx.astype(np.int64) * n_tiles + ty
        return df.assign(_tile=tile, _shard=(tile % num_shards).astype(np.int64))

    return (
        points_ds.map_batches(_tag, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_probe, batch_format="pandas")
    )
