"""CSV → feature-table bridge (the most common real ingest the
round-1 VERDICT flagged missing; reference analogue: the geozero
layer's multi-format ingest, geomedea_geozero/src/geozero_writer.rs).

Two geometry conventions:
- a WKT column (``wkt_col``) — any of the 7 geometry types
  (sources/wkt.py parser);
- plain ``lng``/``lat`` float columns (point rows).

All OTHER CSV columns become TYPED ``p_<name>`` property columns with
types taken from the CSV's own Arrow schema (no JSON hop). ``fid_col``
names a stable unique id for the sort tiebreak — CSV blocks carry no
file offsets, so determinism must come from the data."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from geomedea_ray.sources.geojson import parse_features_batch
from geomedea_ray.sources.wkt import parse_wkt


def csv_batch_to_features(batch: pa.Table, fid_col: str,
                          wkt_col: str | None = None,
                          lng_col: str = "lng", lat_col: str = "lat") -> pa.Table:
    """One CSV batch → columnar feature table (map_batches fn)."""
    n = batch.num_rows
    geo_cols = {wkt_col} if wkt_col else {lng_col, lat_col}
    prop_names = [c for c in batch.column_names if c not in geo_cols | {fid_col}]
    prop_types = {}
    for c in prop_names:
        t = batch.schema.field(c).type
        if pa.types.is_boolean(t):
            prop_types[c] = pa.bool_()
        elif pa.types.is_integer(t):
            prop_types[c] = pa.int64()
        elif pa.types.is_floating(t):
            prop_types[c] = pa.float64()
        else:
            prop_types[c] = pa.string()
    props_py = {c: batch[c].to_pylist() for c in prop_names}
    if wkt_col:
        geoms = [parse_wkt(w) for w in batch[wkt_col].to_pylist()]
    else:
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        geoms = [
            {"type": "Point", "coordinates": [float(lng[i]), float(lat[i])]}
            for i in range(n)
        ]
    feats = [
        {
            "type": "Feature",
            "geometry": geoms[i],
            "properties": {c: props_py[c][i] for c in prop_names},
        }
        for i in range(n)
    ]
    t = parse_features_batch(feats, fid_start=0, prop_types=prop_types)
    # stable fid from the data, not the batch offset
    fid = batch[fid_col].cast(pa.int64())
    return t.set_column(t.schema.get_field_index("fid"), "fid", fid)


def read_csv_features(paths: str | list[str], fid_col: str,
                      wkt_col: str | None = None,
                      lng_col: str = "lng", lat_col: str = "lat"):
    """CSV file(s) → Dataset of columnar features (typed props)."""
    import ray.data

    ds = ray.data.read_csv(paths if isinstance(paths, list) else [paths])
    return ds.map_batches(
        csv_batch_to_features,
        fn_kwargs={"fid_col": fid_col, "wkt_col": wkt_col,
                   "lng_col": lng_col, "lat_col": lat_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def features_to_csv_batch(batch: pa.Table) -> pa.Table:
    """Export stage: feature table → (fid, wkt, props_json) rows for a
    ``write_csv`` sink."""
    from geomedea_ray.functions.geo import dequantize
    from geomedea_ray.sources.geojson import _unflatten_geometry
    from geomedea_ray.sources.wkt import format_wkt

    out = []
    for r in batch.to_pylist():
        t = r["geom_type"]
        if t == "Null":
            out.append(format_wkt(None))
        elif r["geom_json"]:
            out.append(format_wkt(json.loads(r["geom_json"])))
        else:
            q = np.asarray(r["coords"], np.int32).reshape(-1, 2)
            out.append(format_wkt(_unflatten_geometry(
                t, dequantize(q), list(r["ring_lens"]), list(r["part_lens"])
            )))
    return pa.table({
        "fid": batch["fid"],
        "wkt": pa.array(out, pa.string()),
        "props_json": batch["props_json"],
    })
