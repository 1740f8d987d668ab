"""Geocoding stages: degrees → scaled int32 → Hilbert key → cell ids.

Stateless ``map_batches`` functions (zero-copy Arrow in/out) realizing
the reference's write-path key derivation (reference:
geomedea/src/writer/mod.rs:58-61 bbox, hilbert.rs:70-78 key) as
vectorized batch transforms — W1/W3 in SURVEY §2.2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomedea_ray.functions.cells import tile_id, tile_xy_eq, tile_xy_mercator
from geomedea_ray.functions.geo import quantize
from geomedea_ray.functions.hilbert import hilbert_cell_id, scaled_hilbert


def lnglat_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic geography for the image+caption table: lng from
    the low 32 phash bits, lat from the high 32 (documented formula,
    FIXTURES.md §F6 — the hinted schema has no lng/lat column, so
    geography is derived from content)."""
    u = np.asarray(phash, np.int64).astype(np.uint64)
    # murmur3-style finalizer: phash bits are biased (structured image
    # content), mixing spreads geography world-wide while duplicate
    # phashes still land on identical coordinates
    with np.errstate(over="ignore"):
        u = u ^ (u >> np.uint64(33))
        u = u * np.uint64(0xFF51AFD7ED558CCD)
        u = u ^ (u >> np.uint64(33))
        u = u * np.uint64(0xC4CEB9FE1A85EC53)
        u = u ^ (u >> np.uint64(33))
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.float64)
    hi = ((u >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
    lng = lo / 4294967296.0 * 360.0 - 180.0
    lat = hi / 4294967296.0 * 170.0 - 85.0
    return lng, lat


def add_phash_lnglat(batch: pa.Table) -> pa.Table:
    lng, lat = lnglat_from_phash(batch["phash"].to_numpy())
    return batch.append_column("lng", pa.array(lng, pa.float64())).append_column(
        "lat", pa.array(lat, pa.float64())
    )


def quantize_batch(batch: pa.Table, lng_col: str = "lng", lat_col: str = "lat") -> pa.Table:
    """+ ``lng_i``/``lat_i`` scaled int32 (truncating — F1)."""
    lng_i = quantize(batch[lng_col].to_numpy(zero_copy_only=False))
    lat_i = quantize(batch[lat_col].to_numpy(zero_copy_only=False))
    return batch.append_column("lng_i", pa.array(lng_i, pa.int32())).append_column(
        "lat_i", pa.array(lat_i, pa.int32())
    )


def hilbert_batch(batch: pa.Table, extent: tuple[int, int, int, int],
                  curve: str = "hilbert") -> pa.Table:
    """+ ``hilbert`` uint32 within the global extent (W3). The column
    name stays ``hilbert`` for every curve — manifests, readers and
    cell math are key-compatible; ``curve='morton'`` swaps in the
    Z-order interleave for layout A/B experiments (BASELINE.md)."""
    if curve == "morton":
        from geomedea_ray.functions.hilbert import scaled_morton

        h = scaled_morton(batch["lng_i"].to_numpy(), batch["lat_i"].to_numpy(), extent)
    else:
        h = scaled_hilbert(batch["lng_i"].to_numpy(), batch["lat_i"].to_numpy(), extent)
    return batch.append_column("hilbert", pa.array(h, pa.uint32()))


def cell_batch(batch: pa.Table, res: int, col: str = "cell_id") -> pa.Table:
    """+ Hilbert-quadtree cell id at resolution ``res`` (S2-like)."""
    c = hilbert_cell_id(batch["hilbert"].to_numpy(), res)
    return batch.append_column(col, pa.array(c.astype(np.int64), pa.int64()))


def tile_batch(
    batch: pa.Table,
    zoom: int,
    scheme: str = "eq",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> pa.Table:
    """+ ``tile_x``/``tile_y``/``tile_id`` at ``zoom`` (raster↔vector
    assignment; scheme 'eq' = equirectangular [SQL-oracle-exact],
    'mercator' = slippy XYZ)."""
    lng = batch[lng_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    if scheme == "eq":
        tx, ty = tile_xy_eq(lng, lat, zoom)
    elif scheme == "mercator":
        tx, ty = tile_xy_mercator(lng, lat, zoom)
    else:
        raise ValueError(f"unknown tile scheme {scheme!r}")
    tid = tile_id(tx, ty, zoom)
    return (
        batch.append_column("tile_x", pa.array(tx, pa.int32()))
        .append_column("tile_y", pa.array(ty, pa.int32()))
        .append_column("tile_id", pa.array(tid, pa.int64()))
    )
