"""GeoJSON ⇄ columnar feature-table bridge (SURVEY §2.1 S4/S5 — the
reference's geozero crate re-expressed as batch transforms).

The reference consumes/produces features through a streaming event API
(reference: geomedea_geozero/src/geozero_writer.rs:67-609 builder
stack, geozero_reader.rs:31-188 replay). Ray-natively neither side
needs events: a *batch* of GeoJSON features is parsed straight into a
columnar feature table, and exported back, inside ``map_batches``.

Columnar feature model (maps the reference's data model, SURVEY §1.4):

    fid:            int64   input sequence (sort tiebreak)
    geom_type:      string  Point|LineString|Polygon|MultiPoint|
                            MultiLineString|MultiPolygon|GeometryCollection
    coords:         list<int32>  flat [lng_i, lat_i, ...] scaled-1e7
                            ints, TRUNCATING quantization (bit-compat
                            with reference geometry/mod.rs:295-297)
    ring_lens:      list<int32>  coordinate-pair count per ring/part
    part_lens:      list<int32>  ring count per part (MultiPolygon);
                            empty for non-nested types
    geom_json:      string  escape hatch: full geometry JSON for
                            GeometryCollection (recursive — kept
                            self-describing rather than modelled
                            columnar; the reference's own geozero
                            bridge similarly punts on nested
                            PropertyValue::Vec/Map, lib.rs:31-32)
    props_json:     string  properties as canonical JSON — faithful to
                            the reference's per-feature self-describing
                            key/value encoding (feature.rs:52-63)
    lng_i, lat_i:   int32   integer bbox center (bounds.rs:90-99
                            integer-division math) — the Hilbert sort
                            key input (writer/mod.rs:58-61)
    bbox_*:         int32   feature bbox (W1) for index leaves

Parsing is per-feature Python (as is the reference's event stream) but
amortized per batch; coordinate quantization is vectorized numpy.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from geomedea_ray.functions.geo import COORD_SCALE, bbox_center_i32, dequantize

GEOM_TYPES = (
    "Point", "LineString", "Polygon", "MultiPoint",
    "MultiLineString", "MultiPolygon", "GeometryCollection",
)

FEATURE_SCHEMA = pa.schema(
    [
        ("fid", pa.int64()),
        ("gj_id", pa.string()),  # GeoJSON Feature "id" member (JSON-encoded; "" = absent)
        ("geom_type", pa.string()),
        ("coords", pa.list_(pa.int32())),
        ("ring_lens", pa.list_(pa.int32())),
        ("part_lens", pa.list_(pa.int32())),
        ("geom_json", pa.string()),
        ("props_json", pa.string()),
        ("lng_i", pa.int32()),
        ("lat_i", pa.int32()),
        ("bbox_min_lng_i", pa.int32()),
        ("bbox_min_lat_i", pa.int32()),
        ("bbox_max_lng_i", pa.int32()),
        ("bbox_max_lat_i", pa.int32()),
    ]
)


def _flatten_geometry(geom: dict) -> tuple[list, list, list]:
    """geometry dict → (flat xy pairs, ring_lens, part_lens)."""
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return [c], [1], []
    if t in ("LineString", "MultiPoint"):
        return list(c), [len(c)], []
    if t in ("Polygon", "MultiLineString"):
        flat, rl = [], []
        for ring in c:
            flat.extend(ring)
            rl.append(len(ring))
        return flat, rl, []
    if t == "MultiPolygon":
        flat, rl, pl = [], [], []
        for poly in c:
            pl.append(len(poly))
            for ring in poly:
                flat.extend(ring)
                rl.append(len(ring))
        return flat, rl, pl
    raise ValueError(f"unsupported geometry type {t!r}")


def _unflatten_geometry(t: str, xy: np.ndarray, ring_lens: list[int],
                        part_lens: list[int]) -> dict:
    """Inverse of _flatten_geometry; ``xy`` is an (n, 2) float array."""
    pts = xy.tolist()
    if t == "Point":
        return {"type": t, "coordinates": pts[0]}
    if t in ("LineString", "MultiPoint"):
        return {"type": t, "coordinates": pts}
    rings, off = [], 0
    for n in ring_lens:
        rings.append(pts[off: off + n])
        off += n
    if t in ("Polygon", "MultiLineString"):
        return {"type": t, "coordinates": rings}
    if t == "MultiPolygon":
        polys, off = [], 0
        for n in part_lens:
            polys.append(rings[off: off + n])
            off += n
        return {"type": t, "coordinates": polys}
    raise ValueError(f"unsupported geometry type {t!r}")


def _scalar_kind(v) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    return "nested"


def _kinds_to_type(ks: set):
    if ks == {"bool"}:
        return pa.bool_()
    if ks == {"int"}:
        return pa.int64()
    if ks in ({"float"}, {"int", "float"}):
        return pa.float64()
    if ks == {"str"}:
        return pa.string()
    return None


def infer_prop_types(features: list[dict]) -> dict:
    """Property keys → Arrow type (F5 typed properties; round-2
    VERDICT item 8 extends it to NESTED values, matching the
    reference's PropertyValue::Vec/Map — feature.rs:179-196 — which
    its own geozero bridge punts on, geomedea_geozero/src/lib.rs:31-32).

    - flat scalars: bool→bool_, int→int64, float→float64, str→string;
      mixed int/float widens to float64
    - list of homogeneous scalars → ``list<elem>`` (PropertyValue::Vec)
    - dict with homogeneous scalar values → ``map<string, value>``
      (PropertyValue::Map)
    Keys with conflicting types, lists-of-lists, or mixed-value dicts
    are left OUT (still reachable via ``props_json``)."""
    kinds: dict[str, set] = {}
    elem_kinds: dict[str, set] = {}
    mapval_kinds: dict[str, set] = {}
    for f in features:
        for k, v in (f.get("properties") or {}).items():
            if v is None:
                continue
            if isinstance(v, list):
                kinds.setdefault(k, set()).add("list")
                for e in v:
                    if e is not None:
                        elem_kinds.setdefault(k, set()).add(_scalar_kind(e))
            elif isinstance(v, dict):
                kinds.setdefault(k, set()).add("map")
                for mv in v.values():
                    if mv is not None:
                        mapval_kinds.setdefault(k, set()).add(_scalar_kind(mv))
            else:
                kinds.setdefault(k, set()).add(_scalar_kind(v))
    out = {}
    for k, ks in sorted(kinds.items()):
        if ks == {"list"}:
            elem = _kinds_to_type(elem_kinds.get(k, set()))
            if elem is not None:
                out[k] = pa.list_(elem)
        elif ks == {"map"}:
            val = _kinds_to_type(mapval_kinds.get(k, set()))
            if val is not None:
                out[k] = pa.map_(pa.string(), val)
        else:
            t = _kinds_to_type(ks)
            if t is not None:
                out[k] = t
        # anything else (conflicting / deep nesting): props_json only
    return out


def parse_features_batch(features: list[dict], fid_start: int = 0,
                         prop_types: dict | None = None) -> pa.Table:
    """A batch of GeoJSON Feature dicts → columnar feature table.
    Quantization is one vectorized numpy pass over the batch's
    concatenated coordinates. ``prop_types`` (key → Arrow type) adds
    one REAL Arrow column ``p_<key>`` per flat scalar property —
    downstream filters touch typed columns, not JSON."""
    n = len(features)
    geom_types, geom_jsons, props, ring_ls, part_ls = [], [], [], [], []
    gj_ids = []
    all_xy: list = []
    counts = np.zeros(n, dtype=np.int64)
    for i, f in enumerate(features):
        geom = f.get("geometry")
        props.append(json.dumps(f.get("properties") or {}, sort_keys=True))
        gj_ids.append(json.dumps(f["id"]) if "id" in f else "")
        if geom is None or geom["type"] == "GeometryCollection":
            geom_types.append("GeometryCollection" if geom else "Null")
            geom_jsons.append(json.dumps(geom, sort_keys=True) if geom else "")
            ring_ls.append([])
            part_ls.append([])
            if geom:  # fold every nested coordinate into the bbox
                sub = []

                def walk(g):
                    if g["type"] == "GeometryCollection":
                        for gg in g["geometries"]:
                            walk(gg)
                    else:
                        flat, _, _ = _flatten_geometry(g)
                        sub.extend(flat)

                walk(geom)
                all_xy.extend(sub)
                counts[i] = len(sub)
            continue
        flat, rl, pl = _flatten_geometry(geom)
        geom_types.append(geom["type"])
        geom_jsons.append("")
        ring_ls.append(rl)
        part_ls.append(pl)
        all_xy.extend(flat)
        counts[i] = len(flat)

    if all_xy:
        xy = np.asarray(all_xy, dtype=np.float64)
        q = np.trunc(xy * float(COORD_SCALE)).astype(np.int64).astype(np.int32)
    else:
        q = np.zeros((0, 2), dtype=np.int32)

    # per-feature bbox over its coordinate slice (W1)
    ends = np.cumsum(counts)
    starts = ends - counts
    minx = np.zeros(n, np.int32); miny = np.zeros(n, np.int32)
    maxx = np.zeros(n, np.int32); maxy = np.zeros(n, np.int32)
    coords_col = []
    for i in range(n):
        s, e = starts[i], ends[i]
        if e > s:
            sl = q[s:e]
            minx[i], miny[i] = sl[:, 0].min(), sl[:, 1].min()
            maxx[i], maxy[i] = sl[:, 0].max(), sl[:, 1].max()
            coords_col.append(sl.reshape(-1) if geom_jsons[i] == "" else [])
        else:
            coords_col.append([])
    cx, cy = bbox_center_i32(minx, miny, maxx, maxy)
    typed_cols = {}
    for key, typ in (prop_types or {}).items():
        vals = []
        for f in features:
            v = (f.get("properties") or {}).get(key)
            if v is not None:
                if pa.types.is_map(typ):
                    # map arrays build from (key, value) pair lists;
                    # sorted for a deterministic on-disk layout
                    v = sorted(v.items())
                elif pa.types.is_floating(typ):
                    v = float(v)
                # list<float64> coerces int elements inside pa.array
            vals.append(v)
        typed_cols[f"p_{key}"] = pa.array(vals, typ)
    return pa.table(
        {
            "fid": pa.array(np.arange(fid_start, fid_start + n), pa.int64()),
            "gj_id": pa.array(gj_ids, pa.string()),
            "geom_type": pa.array(geom_types, pa.string()),
            "coords": pa.array(coords_col, pa.list_(pa.int32())),
            "ring_lens": pa.array(ring_ls, pa.list_(pa.int32())),
            "part_lens": pa.array(part_ls, pa.list_(pa.int32())),
            "geom_json": pa.array(geom_jsons, pa.string()),
            "props_json": pa.array(props, pa.string()),
            "lng_i": pa.array(cx, pa.int32()),
            "lat_i": pa.array(cy, pa.int32()),
            "bbox_min_lng_i": pa.array(minx, pa.int32()),
            "bbox_min_lat_i": pa.array(miny, pa.int32()),
            "bbox_max_lng_i": pa.array(maxx, pa.int32()),
            "bbox_max_lat_i": pa.array(maxy, pa.int32()),
            **typed_cols,
        }
    )


def read_geojson(paths: str | list[str], typed_props: bool = False,
                 prop_types: dict | None = None):
    """GeoJSON file(s) (FeatureCollection or NDJSON of Features) →
    Dataset of columnar features. One task per file (files are the
    resume/parallelism unit, as in pipelines/resumable.py); fids are
    file-offset based so they're stable under any task order.

    ``typed_props=True`` infers flat scalar properties from the FIRST
    file (the conventional schema source — every block must agree on
    its schema) and emits them as real ``p_<key>`` Arrow columns;
    pass ``prop_types`` explicitly to override the inference."""
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)

    if typed_props and prop_types is None:
        prop_types = infer_prop_types(load_geojson_features(paths[0]))

    # count features per file up front (driver, cheap metadata pass is
    # not possible for JSON — use byte offsets × file index instead)
    items = [{"path": p, "file_idx": i} for i, p in enumerate(paths)]

    def _parse(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            feats = load_geojson_features(row["path"])
            if len(feats) >= 10_000_000:
                raise ValueError(
                    f"{row['path']}: {len(feats)} features exceeds the 10M-per-file "
                    "fid block; split the input (fids must stay unique across files)"
                )
            out.append(
                parse_features_batch(feats, fid_start=row["file_idx"] * 10_000_000,
                                     prop_types=prop_types)
            )
        return pa.concat_tables(out) if out else FEATURE_SCHEMA.empty_table()

    return ray.data.from_items(items).map_batches(
        _parse, batch_size=1, batch_format="pyarrow"
    )


def load_geojson_features(path: str) -> list[dict]:
    """FeatureCollection / single Feature / NDJSON → list of Features."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # NDJSON: one Feature per line
        return [json.loads(line) for line in text.splitlines() if line.strip()]
    if doc.get("type") == "FeatureCollection":
        return doc["features"]
    if doc.get("type") == "Feature":
        return [doc]
    # bare geometry
    return [{"type": "Feature", "geometry": doc, "properties": {}}]


def feature_to_geojson(row: dict) -> dict:
    """One columnar feature row → GeoJSON Feature dict (S5 export).

    A point-only store (spatial_write over bare lng/lat columns — no
    parsed-GeoJSON geometry block) exports each row as a Point whose
    properties are every non-internal column."""
    if "geom_type" not in row:
        internal = {"lng", "lat", "lng_i", "lat_i", "hilbert"}
        return {
            "type": "Feature",
            "geometry": {"type": "Point",
                         "coordinates": [row["lng"], row["lat"]]},
            "properties": {k: v for k, v in row.items() if k not in internal},
        }
    t = row["geom_type"]
    if t == "Null":
        geom = None
    elif row["geom_json"]:
        geom = json.loads(row["geom_json"])
    else:
        q = np.asarray(row["coords"], np.int32).reshape(-1, 2)
        geom = _unflatten_geometry(
            t, dequantize(q), list(row["ring_lens"]), list(row["part_lens"])
        )
    out = {
        "type": "Feature",
        "geometry": geom,
        "properties": json.loads(row["props_json"]) if row["props_json"] else {},
    }
    if row.get("gj_id"):
        out["id"] = json.loads(row["gj_id"])
    return out


def to_geojson_batch(batch: pa.Table) -> pa.Table:
    """Export stage: feature table → one GeoJSON Feature string per row
    (compose into a FeatureCollection or NDJSON at the sink)."""
    out = [json.dumps(feature_to_geojson(r), sort_keys=True) for r in batch.to_pylist()]
    fid = (batch["fid"] if "fid" in batch.column_names
           else pa.array(np.zeros(batch.num_rows, np.int64)))
    return pa.table({"fid": fid, "json": pa.array(out, pa.string())})


#: write_geojson refuses above this (single-file GeoJSON is inherently
#: a driver-side collect) — use write_geojson_sharded instead
WRITE_GEOJSON_MAX_ROWS = 200_000


def write_geojson(ds, path: str, max_rows: int = WRITE_GEOJSON_MAX_ROWS) -> int:
    """Small-result sink: collect an exported dataset into ONE
    FeatureCollection file. Inherently driver-side — guarded by
    ``max_rows`` (round-2 VERDICT item 7); large exports go through
    ``write_geojson_sharded``. Returns the feature count."""
    rows = ds.map_batches(to_geojson_batch, batch_format="pyarrow").take(max_rows + 1)
    if len(rows) > max_rows:
        raise ValueError(
            f"write_geojson collects driver-side and the dataset exceeds "
            f"max_rows={max_rows}; use write_geojson_sharded() for large exports"
        )
    feats = [json.loads(r["json"]) for r in rows]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    os.replace(tmp, path)
    return len(feats)


def write_geojson_sharded(ds, out_dir: str) -> dict:
    """Distributed GeoJSON sink: one FeatureCollection file PER
    PARTITION, written inside the tasks (nothing is materialized on
    the driver), plus a ``manifest.json`` recording every shard's file
    name and feature count (written last — the commit marker). A
    retried write task's orphan file is never referenced by the
    manifest and is deleted before the manifest is published."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        feats = [json.loads(s)
                 for s in to_geojson_batch(batch)["json"].to_pylist()]
        name = f"part-{uuid.uuid4().hex[:12]}.geojson"
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"type": "FeatureCollection", "features": feats}, f)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name], pa.string()),
                         "rows": pa.array([len(feats)], pa.int64())})

    summary = ds.map_batches(_write, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    files = sorted(summary.to_dict("records"), key=lambda r: r["path"])
    manifested = {r["path"] for r in files}
    for f in os.listdir(out_dir):
        if f.endswith(".geojson") and f not in manifested:
            os.unlink(os.path.join(out_dir, f))
    manifest = {
        "type": "sharded-geojson",
        "total_rows": int(summary["rows"].sum()),
        "files": files,
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def read_geojson_sharded(out_dir: str, **kwargs):
    """Read a write_geojson_sharded dir back as one Dataset: the
    manifest lists the shard files; each is a normal GeoJSON
    FeatureCollection ingested through read_geojson."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    paths = [os.path.join(out_dir, r["path"]) for r in manifest["files"]]
    # one read_geojson over the file list (ONE read op, one task per
    # shard) — never a union chain, which serializes branches
    return read_geojson(paths, **kwargs)
