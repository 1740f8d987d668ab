"""Differential parity queries over the REFERENCE'S OWN fixture files.

The north rule requires the engine to "match the reference's results on
its own test inputs". These queries ingest the actual files the
reference tests against — ``test_fixtures/places.json`` (1,249 Point
features; geozero_writer.rs:631-651 asserts the first Hilbert-sorted
feature is lng 176.99445209423166 / lat -89.99999981438727) and
``test_fixtures/countries.geojson`` (151 Polygon + 28 MultiPolygon
features; geozero_writer.rs:700-731 asserts select_bbox((24,-4),
(24.5,-3.5)) yields the Polygon named "Democratic Republic of the
Congo" first) — through the FULL distributed pipeline (read_geojson →
quantize → extent → Hilbert key → sorted partitioned write → packed
index → select_all / bbox_slice) and hash-compare every row against a
DuckDB oracle that re-derives the keys INDEPENDENTLY: raw coordinates
go into a parquet fixture parsed by plain ``json`` (no engine code),
and quantization, bbox, integer bbox-center, extent fold, 65535 axis
scaling and the Hilbert d-index are all recomputed in DuckDB BIGINT
math (pipelines/hilbert_sql.hilbert_ctes — one CTE per round of the
branchless public-domain algorithm).

The reference's literal golden assertions (first-row coordinates /
first-row name) live in tests/test_reference_fixtures.py; the gate
rows here extend them to EVERY row: fid, 32-bit Hilbert key, quantized
center and properties must all agree.

Reference: geomedea/src/writer/mod.rs:77-82 (stable hilbert-desc
sort), bounds.rs:91-99 (integer bbox center), writer/hilbert.rs:66-77
(scaled_hilbert over the data extent).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from geomedea_ray.pipelines import queries as Q
from geomedea_ray.pipelines.geo_queries import CACHE_ROOT
from geomedea_ray.pipelines.hilbert_sql import hilbert_ctes

#: the reference checkout's fixture directory (read-only)
REF_FIXTURES = "/root/reference/test_fixtures"

PLACES_JSON = os.path.join(REF_FIXTURES, "places.json")
COUNTRIES_GEOJSON = os.path.join(REF_FIXTURES, "countries.geojson")

PLACES_ROWS = 1249
COUNTRIES_ROWS = 179

#: the reference's test_polygons query rect (geozero_writer.rs:710-713)
COUNTRIES_BBOX = (24.0, -4.0, 24.5, -3.5)


def _require_fixture(path: str) -> str:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"reference fixture {path} not found — these queries run a "
            "differential against the reference checkout's own test inputs"
        )
    return path


# ---------------------------------------------------------------- stores


def places_store() -> str:
    """places.json through the full distributed write path, cached."""
    from geomedea_ray.pipelines.spatial_write import spatial_write
    from geomedea_ray.sources import geojson as GJ
    from geomedea_ray.sources.cache import cached_spatial_dataset

    src = _require_fixture(PLACES_JSON)

    def _build(tmp: str) -> None:
        spatial_write(GJ.read_geojson(src, typed_props=True), tmp,
                      tiebreak="fid")

    return cached_spatial_dataset(
        os.path.join(CACHE_ROOT, "ref_places_store"), _build,
        expected_rows=PLACES_ROWS)


def countries_store() -> str:
    """countries.geojson (Polygon + MultiPolygon) through the same path."""
    from geomedea_ray.pipelines.spatial_write import spatial_write
    from geomedea_ray.sources import geojson as GJ
    from geomedea_ray.sources.cache import cached_spatial_dataset

    src = _require_fixture(COUNTRIES_GEOJSON)

    def _build(tmp: str) -> None:
        spatial_write(GJ.read_geojson(src, typed_props=True), tmp,
                      tiebreak="fid")

    return cached_spatial_dataset(
        os.path.join(CACHE_ROOT, "ref_countries_store"), _build,
        expected_rows=COUNTRIES_ROWS)


# ------------------------------------------------------- oracle fixtures


def _places_raw_path() -> str:
    """Raw (fid, lng, lat, name) parquet straight from the JSON text —
    parsed by the stdlib, not by sources/geojson (the oracle side must
    not share the engine's parse/quantize code)."""
    import pyarrow.parquet as _pq

    from geomedea_ray.sources.cache import cached_file

    src = _require_fixture(PLACES_JSON)

    def _build(tmp: str) -> None:
        feats = json.load(open(src))["features"]
        recs = [
            {
                "fid": i,
                "lng": f["geometry"]["coordinates"][0],
                "lat": f["geometry"]["coordinates"][1],
                "name": f["properties"]["NAME"],
            }
            for i, f in enumerate(feats)
        ]
        _pq.write_table(pa.Table.from_pylist(recs), tmp)

    return cached_file(os.path.join(CACHE_ROOT, "ref_places_raw.parquet"),
                       _build, expected_rows=PLACES_ROWS)


def _countries_raw_paths() -> tuple[str, str]:
    """Two parquet fixtures: every ring coordinate flattened to one row
    (fid, lng, lat) and the per-feature row (fid, name, geom_type)."""
    import pyarrow.parquet as _pq

    from geomedea_ray.sources.cache import cached_file

    src = _require_fixture(COUNTRIES_GEOJSON)

    def _walk_coords(geom: dict) -> list[tuple[float, float]]:
        t, c = geom["type"], geom["coordinates"]
        if t == "Polygon":
            return [tuple(pt) for ring in c for pt in ring]
        if t == "MultiPolygon":
            return [tuple(pt) for poly in c for ring in poly for pt in ring]
        raise ValueError(f"unexpected geometry type {t}")

    feats = json.load(open(src))["features"]
    n_coords = sum(len(_walk_coords(f["geometry"])) for f in feats)

    def _build_coords(tmp: str) -> None:
        recs = [
            {"fid": i, "lng": x, "lat": y}
            for i, f in enumerate(feats)
            for (x, y) in _walk_coords(f["geometry"])
        ]
        _pq.write_table(pa.Table.from_pylist(recs), tmp)

    def _build_feats(tmp: str) -> None:
        recs = [
            {"fid": i, "name": f["properties"]["name"],
             "geom_type": f["geometry"]["type"]}
            for i, f in enumerate(feats)
        ]
        _pq.write_table(pa.Table.from_pylist(recs), tmp)

    coords = cached_file(
        os.path.join(CACHE_ROOT, "ref_countries_coords.parquet"),
        _build_coords, expected_rows=n_coords)
    frows = cached_file(
        os.path.join(CACHE_ROOT, "ref_countries_feats.parquet"),
        _build_feats, expected_rows=COUNTRIES_ROWS)
    return coords, frows


# ------------------------------------------------------------- queries


def q_ref_places_select(sf_dir: str):
    """select_all over the places.json store: every feature with its
    32-bit Hilbert key and quantized coordinates, in stored
    (hilbert-desc) order. ``sf_dir`` is unused — the input is the
    reference checkout's own fixture file."""
    ds = Q.select_all(places_store(),
                      columns=["fid", "hilbert", "lng_i", "lat_i", "p_NAME"])

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "fid": t["fid"],
            "hilbert": t["hilbert"],
            "lng_i": t["lng_i"],
            "lat_i": t["lat_i"],
            "name": t["p_NAME"],
        })

    return ds.map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)


def q_ref_places_select_sql() -> str:
    path = _places_raw_path()
    scale = (
        f"raw AS (SELECT * FROM read_parquet('{path}')),\n"
        "q AS (SELECT fid, name,\n"
        "      CAST(TRUNC(lng * 10000000.0) AS BIGINT) AS lng_i,\n"
        "      CAST(TRUNC(lat * 10000000.0) AS BIGINT) AS lat_i FROM raw),\n"
        "ext AS (SELECT MIN(lng_i) AS minx, MIN(lat_i) AS miny,\n"
        "               MAX(lng_i) AS maxx, MAX(lat_i) AS maxy FROM q),\n"
        "sc AS (SELECT fid, name, lng_i, lat_i,\n"
        "       ((lng_i - minx) * 65535) // GREATEST(maxx - minx, 1) AS x,\n"
        "       ((lat_i - miny) * 65535) // GREATEST(maxy - miny, 1) AS y\n"
        "       FROM q CROSS JOIN ext)"
    )
    return ("WITH " + scale + ",\n" + hilbert_ctes("sc")
            + "\nSELECT fid, hilbert, lng_i, lat_i, name FROM hfin")


def q_ref_countries_bbox(sf_dir: str):
    """The reference's test_polygons select_bbox over the actual
    countries.geojson: features whose bbox intersects
    (24,-4)-(24.5,-3.5) — bounds-intersect on the quantized grid, no
    exact-geometry refinement, exactly the reference semantics."""
    ds = Q.bbox_slice(countries_store(), COUNTRIES_BBOX,
                      columns=["fid", "hilbert", "geom_type", "p_name"])

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "fid": t["fid"],
            "hilbert": t["hilbert"],
            "geom_type": t["geom_type"],
            "name": t["p_name"],
        })

    return ds.map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)


def q_ref_countries_bbox_sql() -> str:
    coords, frows = _countries_raw_paths()
    a, b, c, d = COUNTRIES_BBOX
    scale = (
        f"coords AS (SELECT * FROM read_parquet('{coords}')),\n"
        f"feats AS (SELECT * FROM read_parquet('{frows}')),\n"
        "qc AS (SELECT fid,\n"
        "       CAST(TRUNC(lng * 10000000.0) AS BIGINT) AS lng_i,\n"
        "       CAST(TRUNC(lat * 10000000.0) AS BIGINT) AS lat_i FROM coords),\n"
        "fb AS (SELECT fid, MIN(lng_i) AS fminx, MIN(lat_i) AS fminy,\n"
        "              MAX(lng_i) AS fmaxx, MAX(lat_i) AS fmaxy\n"
        "       FROM qc GROUP BY fid),\n"
        # integer bbox center, bounds.rs:91-99: min + (max-min)/2
        "ctr AS (SELECT *, fminx + (fmaxx - fminx) // 2 AS cx,\n"
        "               fminy + (fmaxy - fminy) // 2 AS cy FROM fb),\n"
        "ext AS (SELECT MIN(fminx) AS minx, MIN(fminy) AS miny,\n"
        "               MAX(fmaxx) AS maxx, MAX(fmaxy) AS maxy FROM fb),\n"
        "sc AS (SELECT fid, fminx, fminy, fmaxx, fmaxy,\n"
        "       ((cx - minx) * 65535) // GREATEST(maxx - minx, 1) AS x,\n"
        "       ((cy - miny) * 65535) // GREATEST(maxy - miny, 1) AS y\n"
        "       FROM ctr CROSS JOIN ext)"
    )
    qminx, qminy = int(a * 1e7), int(b * 1e7)
    qmaxx, qmaxy = int(c * 1e7), int(d * 1e7)
    return (
        "WITH " + scale + ",\n" + hilbert_ctes("sc")
        + f"\nSELECT h.fid, h.hilbert, f.geom_type, f.name"
        + " FROM hfin h JOIN feats f USING (fid)"
        + f" WHERE NOT (h.fmaxx < {qminx} OR h.fminx > {qmaxx}"
        + f" OR h.fmaxy < {qminy} OR h.fminy > {qmaxy})"
    )


def _countries_verts_path() -> str:
    """Vertex-level oracle fixture: one row per ring coordinate WITH
    ring identity and in-ring order (fid, ring_id, vtx_idx, lng, lat)
    — parsed by the stdlib, independent of the engine's geometry
    encoding. ring_id runs over every ring of every polygon part in
    document order (the signed shoelace sum does not care about the
    outer/hole split)."""
    import pyarrow.parquet as _pq

    from geomedea_ray.sources.cache import cached_file

    src = _require_fixture(COUNTRIES_GEOJSON)
    feats = json.load(open(src))["features"]

    def _rings(geom: dict) -> list[list]:
        t, c = geom["type"], geom["coordinates"]
        if t == "Polygon":
            return list(c)
        if t == "MultiPolygon":
            return [ring for poly in c for ring in poly]
        raise ValueError(f"unexpected geometry type {t}")

    n_rows = sum(len(r) for f in feats for r in _rings(f["geometry"]))

    def _build(tmp: str) -> None:
        recs = [
            {"fid": i, "ring_id": ri, "vtx_idx": vi, "lng": x, "lat": y}
            for i, f in enumerate(feats)
            for ri, ring in enumerate(_rings(f["geometry"]))
            for vi, (x, y) in enumerate(ring)
        ]
        _pq.write_table(pa.Table.from_pylist(recs), tmp)

    return cached_file(os.path.join(CACHE_ROOT, "ref_countries_verts.parquet"),
                       _build, expected_rows=n_rows)


def q_ref_countries_area(sf_dir: str):
    """EXACT shoelace signed area (×2) of every country polygon on the
    quantized int32 grid, straight off the ENGINE'S stored geometry
    (flat coords + ring_lens): per feature, area2 = Σ over all rings
    Σᵢ (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ) in arbitrary-precision Python ints (cross
    terms reach ~1.6e18 and ring sums exceed int64 — the SQL mirror
    folds the same pairs in HUGEINT and both sides emit the DECIMAL
    STRING, so the hash cannot drift on overflow or float rounding).
    The per-feature vertex loop is inherent (geometry decode class,
    like a codec); features are embarrassingly parallel across blocks
    and nothing shuffles — a pure map stage over the store."""
    ds = Q.select_all(countries_store(),
                      columns=["fid", "geom_type", "p_name",
                               "coords", "ring_lens"])

    def _area(t: pa.Table) -> pa.Table:
        fids = t["fid"].to_pylist()
        names = t["p_name"].to_pylist()
        gts = t["geom_type"].to_pylist()
        coords = t["coords"].to_pylist()
        rls = t["ring_lens"].to_pylist()
        from geomedea_ray.functions.geo import shoelace_area2

        a2, nv, nr = [], [], []
        for cs, rl in zip(coords, rls):
            a2.append(str(shoelace_area2(cs, rl)))
            nv.append(len(cs) // 2)
            nr.append(len(rl))
        return pa.table({
            "fid": pa.array(fids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "geom_type": pa.array(gts, pa.string()),
            "n_rings": pa.array(nr, pa.int64()),
            "n_vertices": pa.array(nv, pa.int64()),
            "area2": pa.array(a2, pa.string()),
        })

    return ds.map_batches(_area, batch_format="pyarrow")


def q_ref_countries_area_sql() -> str:
    verts = _countries_verts_path()
    _, frows = _countries_raw_paths()
    return f"""
WITH v AS (SELECT * FROM read_parquet('{verts}')),
feats AS (SELECT * FROM read_parquet('{frows}')),
q AS (SELECT fid, ring_id, vtx_idx,
             CAST(TRUNC(lng * 10000000.0) AS BIGINT) AS x,
             CAST(TRUNC(lat * 10000000.0) AS BIGINT) AS y
      FROM v),
t AS (SELECT fid, ring_id, x, y,
             LEAD(x) OVER w AS x2, LEAD(y) OVER w AS y2
      FROM q WINDOW w AS (PARTITION BY fid, ring_id ORDER BY vtx_idx)),
s AS (SELECT fid,
             SUM(CAST(x AS HUGEINT) * y2 - CAST(x2 AS HUGEINT) * y) AS area2,
             COUNT(*) AS n_vertices,
             COUNT(DISTINCT ring_id) AS n_rings
      FROM t GROUP BY fid)
SELECT s.fid, f.name, f.geom_type,
       CAST(s.n_rings AS BIGINT) AS n_rings,
       CAST(s.n_vertices AS BIGINT) AS n_vertices,
       CAST(s.area2 AS VARCHAR) AS area2
FROM s JOIN feats f USING (fid)
"""
