"""The flagship pipeline over the image+caption table (BASELINE.json
north_star): geocode → Hilbert spatial sort + packed index → spatial
join (point-in-polygon) + raster-tile assignment.

Input is the deterministic synthetic image table (sources/synth.py,
exact ``input_hint`` schema); geography derives from ``phash`` bits
(stages/geocode.lnglat_from_phash). Scale knob: rows per sf tag —
the 10^12-image design target is exercised structurally (streaming,
partitioned output, no full materialization), tested at 10^3..10^5.
"""

from __future__ import annotations

import os

from geomedea_ray.pipelines import queries as Q
from geomedea_ray.pipelines.spatial_write import spatial_write
from geomedea_ray.pipelines.tiles import tile_aggregate
from geomedea_ray.sources.polygons import polygon_arrays
from geomedea_ray.sources.synth import image_table_path
from geomedea_ray.stages.geocode import add_phash_lnglat, tile_batch
from geomedea_ray.stages.pip import pip_join

CACHE_ROOT = "/tmp/geomedea_ray_cache"

#: image-table rows per testdata scale tag
N_IMAGES = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 120_000}


def n_images_for(sf_dir: str) -> int:
    return N_IMAGES.get(os.path.basename(os.path.normpath(sf_dir)), 2_000)


def images_ds(sf_dir: str, columns: list[str] | None = None):
    """The image+caption table for this scale (cached parquet)."""
    import ray.data

    path = image_table_path(n_images_for(sf_dir))
    return ray.data.read_parquet(path, columns=columns)


def geocoded_images(sf_dir: str, with_bytes: bool = False):
    cols = ["image_id", "phash", "caption"] + (["bytes", "w", "h", "fmt"] if with_bytes else [])
    return images_ds(sf_dir, columns=cols).map_batches(
        add_phash_lnglat, batch_format="pyarrow", zero_copy_batch=True
    )


def image_spatial_dataset(sf_dir: str) -> str:
    """Hilbert-sorted + packed-indexed image table (metadata columns
    only — ``bytes`` stays in the source files and is fetched by id,
    so the sort shuffle moves ~60 B/row instead of ~15 KiB/row)."""
    n = n_images_for(sf_dir)
    out = os.path.join(CACHE_ROOT, f"images_spatial_n{n}")
    if os.path.exists(os.path.join(out, "manifest.json")):
        return out
    spatial_write(geocoded_images(sf_dir), out, tiebreak="image_id")
    return out


def spatial_join_tiles(sf_dir: str, zoom: int = 6):
    """The headline operator chain: PIP join + tile assignment over
    the geocoded image stream (single pass, no shuffle — polygons are
    broadcast, tile id is a stateless map)."""
    ds = geocoded_images(sf_dir)
    ds = ds.map_batches(tile_batch, fn_kwargs={"zoom": zoom}, batch_format="pyarrow",
                        zero_copy_batch=True)
    return pip_join(
        ds, polygon_arrays(), id_cols=["image_id", "caption", "tile_x", "tile_y"], exact=True
    )


def flagship(sf_dir: str):
    """entry() pipeline: join output of the flagship chain."""
    return spatial_join_tiles(sf_dir)


def image_bbox_slice(sf_dir: str, rect_deg=( -60.005, -40.005, 20.005, 30.005)):
    d = image_spatial_dataset(sf_dir)
    return Q.bbox_slice(d, rect_deg, columns=["image_id", "lng", "lat", "hilbert"])


def image_tile_counts(sf_dir: str, zoom: int = 6):
    return tile_aggregate(geocoded_images(sf_dir), zoom).select_columns(
        ["tile_x", "tile_y", "n"]
    )
