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
