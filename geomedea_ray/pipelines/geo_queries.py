"""Oracle-checkable spatial queries over testdata-derived point sets.

The point set is derived from ``lineitem`` (the largest table) by a
formula both numpy and DuckDB evaluate bit-identically (integer modular
arithmetic + one exact double division — see sources/tables.py for the
reasoning): pid = l_orderkey*8 + l_linenumber,
lng = (pid*7919 % 36000)/100 - 180, lat = (pid*104729 % 17000)/100 - 85.

Each query function takes ``sf_dir`` and returns a Dataset — these are
the entries the driver hash-compares against ``oracle_sql()``. The
spatial dataset (Hilbert sort + packed index + manifest) is built once
per sf_dir and cached under /tmp.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from geomedea_ray.pipelines import queries as Q
from geomedea_ray.pipelines.spatial_write import spatial_write
from geomedea_ray.sources import tables
from geomedea_ray.stages.knn import knn
from geomedea_ray.stages.pip import pip_join
from geomedea_ray.sources.polygons import polygon_arrays

CACHE_ROOT = "/tmp/geomedea_ray_cache"

LINEPOINTS_CTE = """
WITH pts AS (
  SELECT l_orderkey * 8 + l_linenumber AS pid,
         ((l_orderkey * 8 + l_linenumber) * 7919 % 36000) / 100.0 - 180.0 AS lng,
         ((l_orderkey * 8 + l_linenumber) * 104729 % 17000) / 100.0 - 85.0 AS lat
  FROM lineitem
)
"""

#: the fixture query rect (vertices on .005 offsets — off the point grid)
BBOX_RECT = (-60.005, -40.005, 20.005, 30.005)

#: fixed kNN query points
KNN_QUERIES = [(0, 10.005, 20.005), (1, -120.005, -30.005), (2, 150.005, 60.005)]
KNN_K = 5

TILE_ZOOM = 6


def linepoints_batch(batch: pa.Table) -> pa.Table:
    ok = batch["l_orderkey"].to_numpy()
    ln = batch["l_linenumber"].to_numpy().astype(np.int64)
    pid = ok * 8 + ln
    lng = (pid * 7919 % 36000) / 100.0 - 180.0
    lat = (pid * 104729 % 17000) / 100.0 - 85.0
    return pa.table(
        {
            "pid": pa.array(pid, pa.int64()),
            "lng": pa.array(lng, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def linepoints_ds(sf_dir: str):
    return tables.read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"]).map_batches(
        linepoints_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def spatial_dataset(sf_dir: str) -> str:
    """Build (or reuse) the Hilbert-sorted, packed-indexed spatial
    dataset for this sf_dir; returns its directory. Cached via
    cache.cached_spatial_dataset — manifest row counts re-checked
    against parquet footers on every reuse, atomic publish."""
    import pyarrow.parquet as pq

    from geomedea_ray.sources.cache import cached_spatial_dataset

    expected = pq.ParquetFile(tables.path(sf_dir, "lineitem")).metadata.num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    return cached_spatial_dataset(
        os.path.join(CACHE_ROOT, f"linepoints_{tag}"),
        lambda tmp: spatial_write(linepoints_ds(sf_dir), tmp, tiebreak="pid"),
        expected_rows=expected,
    )


# ------------------------------------------------------------ queries

def q_bbox_select_http(sf_dir: str):
    """The SAME select_bbox slice, but read over real HTTP range
    requests: the cached dataset is served by a process-lifetime
    localhost range server (state/http_store) and every index sidecar
    fetch + row-group read in the probe tasks is a ranged GET — the
    reference's remote read path (http_reader.rs:29-187) with actual
    sockets. Shares q_bbox_select's SQL oracle (identical rows)."""
    import pyarrow.compute as pc

    from geomedea_ray.state.http_store import serve_dir

    base_url = serve_dir(spatial_dataset(sf_dir))
    a, b, c, e = BBOX_RECT
    ds = Q.bbox_slice(base_url, BBOX_RECT, columns=["pid", "lng", "lat"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.greater_equal(t["lng"], a), pc.less_equal(t["lng"], c)),
                pc.and_(pc.greater_equal(t["lat"], b), pc.less_equal(t["lat"], e)),
            )
        ),
        batch_format="pyarrow",
    )


def q_bbox_select(sf_dir: str):
    """select_bbox via manifest prune + packed-index probe, then the
    float-rect refinement that the SQL BETWEEN oracle mirrors (the
    index probe is int32 closed-interval — reference semantics; for
    on-grid points the two classifications agree, see
    sources/tables.py)."""
    import pyarrow.compute as pc

    d = spatial_dataset(sf_dir)
    a, b, c, e = BBOX_RECT
    ds = Q.bbox_slice(d, BBOX_RECT, columns=["pid", "lng", "lat"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.greater_equal(t["lng"], a), pc.less_equal(t["lng"], c)),
                pc.and_(pc.greater_equal(t["lat"], b), pc.less_equal(t["lat"], e)),
            )
        ),
        batch_format="pyarrow",
    )


def q_bbox_select_sql() -> str:
    a, b, c, e = BBOX_RECT
    return (
        LINEPOINTS_CTE
        + f"SELECT pid, lng, lat FROM pts WHERE lng >= {a!r} AND lng <= {c!r} "
        f"AND lat >= {b!r} AND lat <= {e!r}"
    )


def q_spatial_count(sf_dir: str):
    import pandas as pd

    d = spatial_dataset(sf_dir)
    return pd.DataFrame({"n": [Q.count(d)]})


Q_SPATIAL_COUNT_SQL = "SELECT COUNT(*) AS n FROM lineitem"


def q_knn(sf_dir: str):
    ds = knn(linepoints_ds(sf_dir), KNN_QUERIES, KNN_K, id_col="pid", metric="planar")
    return ds.select_columns(["qid", "pid", "rank"])


def q_knn_sql() -> str:
    vals = ", ".join(f"({q}, {x!r}, {y!r})" for q, x, y in KNN_QUERIES)
    return (
        LINEPOINTS_CTE
        + f""", q(qid, qlng, qlat) AS (VALUES {vals}),
d AS (SELECT qid, pid,
        (lng - qlng) * (lng - qlng) + (lat - qlat) * (lat - qlat) AS dist
      FROM pts CROSS JOIN q),
r AS (SELECT qid, pid,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, pid) AS "rank"
      FROM d)
SELECT qid, pid, "rank" FROM r WHERE "rank" <= {KNN_K}"""
    )


def q_knn_indexed(sf_dir: str):
    """Same result as q_knn but served by the packed R-tree
    (expanding-radius range search — stages/knn.knn_indexed) instead
    of a full scan; shares q_knn's SQL oracle."""
    from geomedea_ray.stages.knn import knn_indexed

    d = spatial_dataset(sf_dir)
    out = knn_indexed(d, KNN_QUERIES, KNN_K, id_col="pid")
    return out[["qid", "pid", "rank"]]


def q_pip_join(sf_dir: str):
    ds = linepoints_ds(sf_dir)
    out = pip_join(ds, polygon_arrays(), id_cols=["pid"], exact=True)
    return out


def q_pip_join_sql() -> str:
    from geomedea_ray.sources.polygons import POLYGONS, raycast_sql

    selects = []
    for pid_, name, verts in POLYGONS:
        selects.append(
            f"SELECT pid, {pid_} AS poly_id, '{name}' AS poly_name FROM pts "
            f"WHERE {raycast_sql('lng', 'lat', verts)}"
        )
    return LINEPOINTS_CTE + "\nUNION ALL\n".join(selects)


def q_tile_counts(sf_dir: str):
    from geomedea_ray.pipelines.tiles import tile_aggregate

    out = tile_aggregate(linepoints_ds(sf_dir), TILE_ZOOM, scheme="eq")
    return out.select_columns(["tile_x", "tile_y", "n"])


def q_tile_counts_sql() -> str:
    n = float(1 << TILE_ZOOM)
    return (
        LINEPOINTS_CTE
        + f"""SELECT CAST(FLOOR((lng + 180.0) / 360.0 * {n!r}) AS INT) AS tile_x,
       CAST(FLOOR((90.0 - lat) / 180.0 * {n!r}) AS INT) AS tile_y,
       COUNT(*) AS n
FROM pts GROUP BY 1, 2"""
    )


def hotpoints_batch(batch: pa.Table) -> pa.Table:
    """Planted-skew point set: ~80% of rows land in ONE zoom-6 tile
    (tile_x=32, tile_y=31), the rest spread world-wide — the
    "skewed hot cells" case the north star names. Deterministic
    integer-modular coordinates on the .01-degree grid, SQL-mirrored
    exactly (see TILE_COUNTS_HOT_SQL)."""
    ok = batch["l_orderkey"].to_numpy()
    ln = batch["l_linenumber"].to_numpy().astype(np.int64)
    pid = ok * 8 + ln
    hot = (pid % 10) < 8
    # hot coords: lng in [0, 4.99] ⊂ tile_x 32; lat in [.01, 2.49] ⊂ tile_y 31
    lng = np.where(hot, (pid * 31 % 500) / 100.0,
                   (pid * 7919 % 36000) / 100.0 - 180.0)
    lat = np.where(hot, ((pid * 37 % 249) + 1) / 100.0,
                   (pid * 104729 % 17000) / 100.0 - 85.0)
    return pa.table(
        {
            "pid": pa.array(pid, pa.int64()),
            "lng": pa.array(lng, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def hotpoints_ds(sf_dir: str):
    return tables.read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"]).map_batches(
        hotpoints_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def tile_counts_hot(ds, salt_factor: int = 16):
    """Per-tile count + pid checksum over a HOT-KEY distribution via
    salted_group_apply (stages/cells.py): phase 1 groups on
    (tile, salt) so the 80%-tile's rows spread over ``salt_factor``
    reducers; phase 2 merges the tiny partials. The un-salted
    comparison path is a plain groupby().map_groups — measured against
    this in BASELINE.md (§ skew)."""
    from geomedea_ray.stages.cells import salted_group_apply

    n = float(1 << TILE_ZOOM)

    def _tile(batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy()
        lat = batch["lat"].to_numpy()
        tx = np.floor((lng + 180.0) / 360.0 * n).astype(np.int64)
        ty = np.floor((90.0 - lat) / 180.0 * n).astype(np.int64)
        return pa.table(
            {
                "pid": batch["pid"],
                "tile_id": pa.array(tx * (1 << TILE_ZOOM) + ty, pa.int64()),
            }
        )

    keyed = ds.map_batches(_tile, batch_format="pyarrow", zero_copy_batch=True)
    out = salted_group_apply(
        keyed,
        "tile_id",
        partial_fn=lambda g: {"n": np.int64(len(g)),
                              "pid_sum": g["pid"].to_numpy().sum()},
        combine_fn=lambda g: {"n": g["n"].to_numpy().sum(),
                              "pid_sum": g["pid_sum"].to_numpy().sum()},
        salt_factor=salt_factor,
        id_col="pid",
    )

    def _split(df):
        import pandas as pd

        return pd.DataFrame(
            {
                "tile_x": (df["tile_id"] // (1 << TILE_ZOOM)).astype("int64"),
                "tile_y": (df["tile_id"] % (1 << TILE_ZOOM)).astype("int64"),
                "n": df["n"].astype("int64"),
                "pid_sum": df["pid_sum"].astype("int64"),
            }
        )

    return out.map_batches(_split, batch_format="pandas")


def q_tile_counts_hot(sf_dir: str):
    return tile_counts_hot(hotpoints_ds(sf_dir))


def q_tile_counts_hot_sql() -> str:
    n = float(1 << TILE_ZOOM)
    return f"""WITH pts AS (
  SELECT l_orderkey * 8 + l_linenumber AS pid,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 10 < 8
              THEN ((l_orderkey * 8 + l_linenumber) * 31 % 500) / 100.0
              ELSE ((l_orderkey * 8 + l_linenumber) * 7919 % 36000) / 100.0 - 180.0
         END AS lng,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 10 < 8
              THEN (((l_orderkey * 8 + l_linenumber) * 37 % 249) + 1) / 100.0
              ELSE ((l_orderkey * 8 + l_linenumber) * 104729 % 17000) / 100.0 - 85.0
         END AS lat
  FROM lineitem
)
SELECT CAST(FLOOR((lng + 180.0) / 360.0 * {n!r}) AS BIGINT) AS tile_x,
       CAST(FLOOR((90.0 - lat) / 180.0 * {n!r}) AS BIGINT) AS tile_y,
       COUNT(*) AS n,
       CAST(SUM(pid) AS BIGINT) AS pid_sum
FROM pts GROUP BY 1, 2"""


def q_pip_join_sharded(sf_dir: str):
    """Same join as q_pip_join through the SHUFFLE fallback
    (stages/pip.pip_join_sharded — both sides co-sharded by tile, for
    polygon sets too big to broadcast); shares q_pip_join's SQL oracle
    as a differential check of the two execution strategies."""
    from geomedea_ray.stages.pip import pip_join_sharded

    return pip_join_sharded(linepoints_ds(sf_dir), polygon_arrays(), id_cols=["pid"])


def q_tile_pyramid(sf_dir: str):
    """Tile pyramid: base-zoom aggregate rolled up to zoom 0 by
    integer halving (pipelines/tiles.tile_pyramid). The SQL oracle
    recomputes every level DIRECTLY from the points — the identity
    floor(floor(u·2^b)/2^(b-z)) = floor(u·2^z) makes halving and
    direct computation provably equal."""
    from geomedea_ray.pipelines.tiles import tile_aggregate, tile_pyramid

    base = (
        tile_aggregate(linepoints_ds(sf_dir), TILE_ZOOM, scheme="eq")
        .select_columns(["tile_id", "tile_x", "tile_y", "n"])
        .to_pandas()
    )
    out = tile_pyramid(base, TILE_ZOOM)
    return out[["zoom", "tile_x", "tile_y", "n"]]


def q_tile_pyramid_sql(base_zoom: int = TILE_ZOOM) -> str:
    levels = []
    for z in range(base_zoom + 1):
        n = float(1 << z)
        levels.append(
            f"SELECT {z} AS zoom, CAST(FLOOR((lng + 180.0) / 360.0 * {n!r}) AS INT) AS tile_x,\n"
            f"       CAST(FLOOR((90.0 - lat) / 180.0 * {n!r}) AS INT) AS tile_y, COUNT(*) AS n\n"
            f"FROM pts GROUP BY 1, 2, 3"
        )
    return LINEPOINTS_CTE + "\nUNION ALL\n".join(levels)


DEEP_PYRAMID_ZOOM = 12


def q_tile_pyramid_deep(sf_dir: str):
    """The DISTRIBUTED pyramid path (tiles.tile_pyramid_from_points):
    base_zoom 12 > PYRAMID_DRIVER_MAX_ZOOM — ONE shuffle total; deep
    levels roll up inside ancestor-sharded groups (the base-zoom
    combine folded into the shard) and only levels ≤ 8 touch the
    driver. Same per-level direct-from-points SQL oracle as
    q_tile_pyramid (the floor-halving identity)."""
    from geomedea_ray.pipelines.tiles import tile_pyramid_from_points

    out = tile_pyramid_from_points(linepoints_ds(sf_dir), DEEP_PYRAMID_ZOOM,
                                   scheme="eq")
    return out.select_columns(["zoom", "tile_x", "tile_y", "n"])


def q_tile_pyramid_deep_sql() -> str:
    return q_tile_pyramid_sql(DEEP_PYRAMID_ZOOM)


def q_cell_compact(sf_dir: str, res: int = 6):
    """H3-compaction analogue (stages/cells.py): the distinct res-6
    Hilbert-quadtree cells occupied by the point set, compacted to the
    minimal mixed-resolution covering set. Rows-only (iterative —
    not SQL-expressible); exactness vs a brute-force oracle is in
    tests/test_cells.py."""
    from geomedea_ray.pipelines.spatial_write import WORLD_EXTENT
    from geomedea_ray.stages.cells import compact_cells
    from geomedea_ray.stages.geocode import cell_batch, hilbert_batch, quantize_batch

    ds = linepoints_ds(sf_dir)
    ds = ds.map_batches(quantize_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(hilbert_batch, fn_kwargs={"extent": WORLD_EXTENT},
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(cell_batch, fn_kwargs={"res": res}, batch_format="pyarrow",
                        zero_copy_batch=True)
    return compact_cells(ds, res=res)


def _roundtrip_digest(geom_type: str, flat_xy, props: dict) -> str:
    """Canonical per-feature digest: geometry type, coordinate count,
    every dequantized coordinate at fixed 7-decimal precision, and the
    sorted-key property JSON. Both the engine roundtrip (from the
    exported GeoJSON text) and the oracle fixture (straight from the
    POLYGONS spec through the documented trunc-1e7 quantization)
    compute this string — equal digests ⇔ bit-equal float64 coords and
    identical properties."""
    import hashlib
    import json as _json

    coords = ";".join("%.7f,%.7f" % (flat_xy[i], flat_xy[i + 1])
                      for i in range(0, len(flat_xy), 2))
    s = f"{geom_type}|{len(flat_xy) // 2}|{coords}|" + _json.dumps(
        props, sort_keys=True)
    return hashlib.md5(s.encode()).hexdigest()


def geojson_roundtrip_oracle_path() -> str:
    """Parquet digest fixture computed INDEPENDENTLY of the bridge
    code: ring closure, trunc-1e7 quantize, /1e7 dequantize straight
    from the POLYGONS spec — no GeoJSON text, no parse_features_batch,
    no to_geojson_batch (round-3 VERDICT item 5: makes the roundtrip
    hash-checkable and clears the last ``err`` gate row)."""
    import pyarrow.parquet as _pq

    from geomedea_ray.sources.cache import cached_file
    from geomedea_ray.sources.polygons import POLYGONS

    def _build(tmp: str) -> None:
        recs = []
        for pid, name, verts in POLYGONS:
            ring = [list(v) for v in verts] + [list(verts[0])]
            flat = np.asarray([c for v in ring for c in v], np.float64)
            deq = np.trunc(flat * 1e7) / 1e7
            recs.append({
                "name": name,
                "geom_type": "Polygon",
                "n_coords": len(ring),
                "digest": _roundtrip_digest(
                    "Polygon", deq.tolist(),
                    {"name": name, "poly_id": pid}),
            })
        recs.sort(key=lambda r: r["name"])
        _pq.write_table(pa.Table.from_pylist(recs), tmp)

    from geomedea_ray.sources.polygons import POLYGONS as _P
    return cached_file(os.path.join(CACHE_ROOT,
                                    "geojson_roundtrip_oracle.parquet"),
                       _build, expected_rows=len(_P))


def q_geojson_roundtrip_sql() -> str:
    path = geojson_roundtrip_oracle_path()
    return (f"SELECT name, geom_type, n_coords, digest "
            f"FROM read_parquet('{path}') ORDER BY name")


def q_geojson_roundtrip(sf_dir: str):
    """S4/S5 bridge as a driver-visible query: polygon fixture set →
    GeoJSON file → parse (read_geojson) → spatial_write → select_all →
    export; returns per-feature (name, geom_type, n_coords, digest).
    HASH-CHECKED since round 4: the digest canonicalizes every
    roundtripped coordinate + property and is compared against a
    fixture computed independently from the POLYGONS spec
    (geojson_roundtrip_oracle_path)."""
    import json

    import pandas as pd

    from geomedea_ray.pipelines.queries import select_all
    from geomedea_ray.pipelines.spatial_write import spatial_write
    from geomedea_ray.sources import geojson as GJ
    from geomedea_ray.sources.polygons import POLYGONS

    feats = [
        {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [[list(v) for v in verts] + [list(verts[0])]]},
            "properties": {"poly_id": pid, "name": name},
        }
        for pid, name, verts in POLYGONS
    ]
    # per-process scratch paths: two concurrent gate/bench processes
    # must not race on a shared rmtree+rebuild (ADVICE r1)
    scratch = f"/tmp/geomedea_ray_cache/geojson_roundtrip_pid{os.getpid()}"
    src = scratch + "_src.json"
    os.makedirs(os.path.dirname(src), exist_ok=True)
    with open(src, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    out_dir = scratch + "_ds"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    spatial_write(GJ.read_geojson(src), out_dir, tiebreak="fid")
    rows = select_all(out_dir).map_batches(GJ.to_geojson_batch, batch_format="pyarrow").take_all()
    recs = []
    for r in rows:
        f = json.loads(r["json"])
        flat, _, _ = GJ._flatten_geometry(f["geometry"])
        flat_xy = [c for pt in flat for c in pt] if flat and isinstance(
            flat[0], (list, tuple)) else list(flat)
        recs.append(
            {
                "name": f["properties"]["name"],
                "geom_type": f["geometry"]["type"],
                "n_coords": len(flat),
                "digest": _roundtrip_digest(f["geometry"]["type"], flat_xy,
                                            f["properties"]),
            }
        )
    return pd.DataFrame(sorted(recs, key=lambda r: r["name"]))


#: props_select filter constants (shared with the SQL oracle)
PROPS_MIN_CHARS = 100


def _docs_geojson_dataset(sf_dir: str) -> str:
    """Spatially-written feature dataset with TYPED property columns
    (F5): the documents table exported as NDJSON point features
    (geography = the doc-point formula), re-ingested via
    ``read_geojson(typed_props=True)`` and spatial_write'n. Cached per
    sf under /tmp (atomic rename)."""
    import uuid

    import pyarrow.parquet as pq

    from geomedea_ray.sources import geojson as GJ
    from geomedea_ray.sources.tables import doc_lnglat

    from geomedea_ray.sources.cache import cached_spatial_dataset

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(CACHE_ROOT, f"docfeatures_{tag}")
    expected = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows

    def _build(tmp_out: str) -> None:
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "lang", "source", "n_chars"])
        lng, lat = doc_lnglat(t["doc_id"].to_numpy())
        import json as _json

        src = os.path.join(CACHE_ROOT, f"docfeatures_{tag}.ndjson")
        tmp_src = src + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(CACHE_ROOT, exist_ok=True)
        with open(tmp_src, "w") as f:
            for i in range(t.num_rows):
                f.write(_json.dumps({
                    "type": "Feature",
                    "geometry": {"type": "Point",
                                 "coordinates": [float(lng[i]), float(lat[i])]},
                    "properties": {
                        "doc_id": int(t["doc_id"][i].as_py()),
                        "lang": t["lang"][i].as_py(),
                        "source": t["source"][i].as_py(),
                        "n_chars": int(t["n_chars"][i].as_py()),
                    },
                }) + "\n")
        os.replace(tmp_src, src)
        spatial_write(GJ.read_geojson(src, typed_props=True), tmp_out, tiebreak="fid")

    return cached_spatial_dataset(out, _build, expected_rows=expected)


def q_props_select(sf_dir: str):
    """bbox + typed-property filter over a feature dataset — no JSON
    parsing in the filter path (round-1 VERDICT item 9): the packed
    index prunes to the rect, then the predicate runs on real Arrow
    columns ``p_lang``/``p_n_chars``."""
    import pyarrow.compute as pc

    d = _docs_geojson_dataset(sf_dir)
    ds = Q.bbox_slice(d, BBOX_RECT,
                      columns=["p_doc_id", "p_lang", "p_n_chars"])

    def _filt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["p_lang"], "en"),
                       pc.greater_equal(t["p_n_chars"], PROPS_MIN_CHARS))
        t = t.filter(keep)
        return pa.table({"doc_id": t["p_doc_id"], "lang": t["p_lang"],
                         "n_chars": t["p_n_chars"]})

    return ds.map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)


def q_props_select_sql() -> str:
    from geomedea_ray.sources.tables import LAT_SQL, LNG_SQL

    a, b, c, e = BBOX_RECT
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {LNG_SQL} >= {a!r} AND {LNG_SQL} <= {c!r}
  AND {LAT_SQL} >= {b!r} AND {LAT_SQL} <= {e!r}
  AND lang = 'en' AND n_chars >= {PROPS_MIN_CHARS}
"""


#: props_nested filter constant (shared with the SQL oracle)
NESTED_MIN_SCORE0 = 3
#: wider rect than BBOX_RECT so the nested check covers hundreds of
#: rows at the gate scale, not a handful
NESTED_RECT = (-150.005, -70.005, 150.005, 70.005)


def _docs_nested_dataset(sf_dir: str) -> str:
    """Feature dataset with NESTED typed property columns (round-2
    VERDICT item 8 / reference feature.rs:179-196 PropertyValue::Vec/
    Map): each document feature carries ``tags`` (list<string>),
    ``scores`` (list<int64>) and ``meta`` (map<string,string>), all
    deterministic formulas of the documents row so the SQL oracle can
    recompute them from scalars while the Ray side reads the REAL
    Arrow list/map columns."""
    import json as _json
    import uuid

    import pyarrow.parquet as pq

    from geomedea_ray.sources import geojson as GJ
    from geomedea_ray.sources.cache import cached_spatial_dataset
    from geomedea_ray.sources.tables import doc_lnglat

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(CACHE_ROOT, f"docnested_{tag}")
    expected = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows

    def _build(tmp_out: str) -> None:
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "lang", "source", "n_chars"])
        lng, lat = doc_lnglat(t["doc_id"].to_numpy())
        src = os.path.join(CACHE_ROOT, f"docnested_{tag}.ndjson")
        tmp_src = src + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(CACHE_ROOT, exist_ok=True)
        with open(tmp_src, "w") as f:
            for i in range(t.num_rows):
                lang_v = t["lang"][i].as_py()
                source_v = t["source"][i].as_py()
                n_chars = int(t["n_chars"][i].as_py())
                f.write(_json.dumps({
                    "type": "Feature",
                    "geometry": {"type": "Point",
                                 "coordinates": [float(lng[i]), float(lat[i])]},
                    "properties": {
                        "doc_id": int(t["doc_id"][i].as_py()),
                        "tags": [lang_v, source_v],
                        "scores": [n_chars % 7, n_chars % 11],
                        "meta": {"lang": lang_v, "source": source_v},
                    },
                }) + "\n")
        os.replace(tmp_src, src)
        spatial_write(GJ.read_geojson(src, typed_props=True), tmp_out,
                      tiebreak="fid")

    return cached_spatial_dataset(out, _build, expected_rows=expected)


def q_props_nested(sf_dir: str):
    """bbox + NESTED-property filter: the packed index prunes to the
    rect, then the predicate runs on real Arrow ``list<>``/``map<>``
    columns (pc.list_element / pc.map_lookup) — no JSON parsing. The
    SQL oracle recomputes the nested values from the documents scalars
    (the fixture derivation is a pure formula), so the gate
    hash-verifies the whole nested-column path: ingest typing →
    spatial write/sort → parquet → index probe → Arrow kernels."""
    import pyarrow.compute as pc

    d = _docs_nested_dataset(sf_dir)
    ds = Q.bbox_slice(d, NESTED_RECT,
                      columns=["p_doc_id", "p_tags", "p_scores", "p_meta"])

    def _filt(t: pa.Table) -> pa.Table:
        lang = pc.map_lookup(t["p_meta"].combine_chunks(),
                             pa.scalar("lang"), "first")
        s0 = pc.list_element(t["p_scores"], 0)
        keep = pc.and_(pc.equal(lang, "en"),
                       pc.greater_equal(s0, NESTED_MIN_SCORE0))
        t = t.append_column("_lang", lang).append_column("_s0", s0)
        t = t.filter(keep)
        return pa.table({
            "doc_id": t["p_doc_id"],
            "tag0": pc.list_element(t["p_tags"], 0),
            "score0": t["_s0"],
            "score1": pc.list_element(t["p_scores"], 1),
            "meta_source": pc.map_lookup(t["p_meta"].combine_chunks(),
                                         pa.scalar("source"), "first"),
        })

    return ds.map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)


def q_props_nested_sql() -> str:
    from geomedea_ray.sources.tables import LAT_SQL, LNG_SQL

    a, b, c, e = NESTED_RECT
    return f"""
SELECT doc_id, lang AS tag0, n_chars % 7 AS score0, n_chars % 11 AS score1,
       source AS meta_source
FROM documents
WHERE {LNG_SQL} >= {a!r} AND {LNG_SQL} <= {c!r}
  AND {LAT_SQL} >= {b!r} AND {LAT_SQL} <= {e!r}
  AND lang = 'en' AND n_chars % 7 >= {NESTED_MIN_SCORE0}
"""


def _docs_csv_dataset(sf_dir: str) -> str:
    """Same doc-point feature dataset, ingested through the CSV+WKT
    bridge (sources/csv_source.py) — a second ingestion path whose
    result must be identical; cached per sf."""
    import uuid

    import pyarrow.parquet as pq

    from geomedea_ray.sources.csv_source import read_csv_features
    from geomedea_ray.sources.tables import doc_lnglat

    from geomedea_ray.sources.cache import cached_spatial_dataset

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(CACHE_ROOT, f"doccsv_{tag}")
    expected = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows

    def _build(tmp_out: str) -> None:
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "lang", "source", "n_chars"])
        lng, lat = doc_lnglat(t["doc_id"].to_numpy())
        src = os.path.join(CACHE_ROOT, f"doccsv_{tag}.csv")
        os.makedirs(CACHE_ROOT, exist_ok=True)
        tmp_src = src + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp_src, "w") as f:
            f.write("doc_id,lang,source,n_chars,wkt\n")
            for i in range(t.num_rows):
                f.write(
                    f"{t['doc_id'][i].as_py()},{t['lang'][i].as_py()},"
                    f"{t['source'][i].as_py()},{t['n_chars'][i].as_py()},"
                    f"POINT ({float(lng[i])!r} {float(lat[i])!r})\n"
                )
        os.replace(tmp_src, src)
        spatial_write(read_csv_features(src, fid_col="doc_id", wkt_col="wkt"),
                      tmp_out, tiebreak="fid")

    return cached_spatial_dataset(out, _build, expected_rows=expected)


def q_csv_points_select(sf_dir: str):
    """Identical query to q_props_select but over the CSV+WKT-ingested
    dataset — shares its SQL oracle (a differential check that the two
    ingest bridges agree)."""
    import pyarrow.compute as pc

    d = _docs_csv_dataset(sf_dir)
    # doc_id was consumed as the fid (sort tiebreak) by the CSV bridge
    ds = Q.bbox_slice(d, BBOX_RECT, columns=["fid", "p_lang", "p_n_chars"])

    def _filt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["p_lang"], "en"),
                       pc.greater_equal(t["p_n_chars"], PROPS_MIN_CHARS))
        t = t.filter(keep)
        return pa.table({"doc_id": t["fid"], "lang": t["p_lang"],
                         "n_chars": t["p_n_chars"]})

    return ds.map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)


def _docs_fgb_dataset(sf_dir: str) -> str:
    """Same doc-point feature set, ingested through the FlatGeobuf
    bridge (sources/fgb.py) — a THIRD ingestion path whose result must
    be identical to GeoJSON/CSV. The fixture .fgb is written by our own
    spec-level writer (magic + flatbuffer header + size-prefixed
    feature stream), so the differential covers write AND read of the
    wire format; cached per sf."""
    import uuid

    import pyarrow.parquet as pq

    from geomedea_ray.sources.cache import cached_spatial_dataset
    from geomedea_ray.sources.fgb import (read_fgb_features, read_fgb_header,
                                          write_fgb)
    from geomedea_ray.sources.tables import doc_lnglat

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(CACHE_ROOT, f"docfgb_{tag}")
    expected = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows

    def _write_src(tmp_path: str) -> None:
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "lang", "source", "n_chars"])
        lng, lat = doc_lnglat(t["doc_id"].to_numpy())
        feats = [
            {
                "type": "Feature",
                "geometry": {"type": "Point",
                             "coordinates": [float(lng[i]), float(lat[i])]},
                "properties": {
                    "doc_id": int(t["doc_id"][i].as_py()),
                    "lang": t["lang"][i].as_py(),
                    "source": t["source"][i].as_py(),
                    "n_chars": int(t["n_chars"][i].as_py()),
                },
            }
            for i in range(t.num_rows)
        ]
        write_fgb(tmp_path, feats)

    # counted-validation cache (round-3 rule: never trust a bare
    # marker): the FGB header's features_count IS the count check —
    # re-validated on every reuse, atomic tmp+rename publish.
    src = os.path.join(CACHE_ROOT, f"docfgb_{tag}.fgb")
    os.makedirs(CACHE_ROOT, exist_ok=True)
    ok = False
    if os.path.exists(src):
        try:
            ok = read_fgb_header(src)[2] == expected
        except Exception:
            ok = False
        if not ok:
            os.unlink(src)
    if not ok:
        tmp_src = src + f".tmp-{uuid.uuid4().hex[:8]}"
        _write_src(tmp_src)
        if read_fgb_header(tmp_src)[2] != expected:
            raise RuntimeError(f"fgb fixture build produced wrong count "
                               f"at {tmp_src}")
        os.replace(tmp_src, src)

    def _build(tmp_out: str) -> None:
        spatial_write(read_fgb_features(src), tmp_out, tiebreak="fid")

    return cached_spatial_dataset(out, _build, expected_rows=expected)


def q_fgb_points_select(sf_dir: str):
    """Identical query to q_props_select but over the FlatGeobuf-
    ingested dataset — shares its SQL oracle (differential check that
    the FGB bridge agrees with the GeoJSON and CSV bridges; reference
    README.md:30-43 positions FGB as its primary convert target)."""
    import pyarrow.compute as pc

    d = _docs_fgb_dataset(sf_dir)
    ds = Q.bbox_slice(d, BBOX_RECT,
                      columns=["p_doc_id", "p_lang", "p_n_chars"])

    def _filt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["p_lang"], "en"),
                       pc.greater_equal(t["p_n_chars"], PROPS_MIN_CHARS))
        t = t.filter(keep)
        return pa.table({"doc_id": t["p_doc_id"], "lang": t["p_lang"],
                         "n_chars": t["p_n_chars"]})

    return ds.map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)


def q_hilbert_scan(sf_dir: str, limit: int = 1000):
    """Stored-order scan head (R1): the first ``limit`` rows of the
    descending-Hilbert stored order — now HASH-VERIFIED: the oracle
    (pipelines/hilbert_sql.py) reproduces the full integer key
    pipeline (quantize → extent → 65535-scaling → branchless
    interleave) in DuckDB BIGINT math, bit-for-bit vs
    functions/hilbert.hilbert_u32.

    Limit pushdown: partitions are disjoint descending key ranges in
    manifest order and rows within a partition are stored sorted, so
    the head is read file-by-file with early stop — only the
    partition(s) covering the head leave storage."""
    import pandas as pd
    import pyarrow.parquet as pq

    from geomedea_ray.state.manifest import Manifest

    d = spatial_dataset(sf_dir)
    man = Manifest.load(d)
    frames, got = [], 0
    for p in man.partitions:
        pf = pq.ParquetFile(os.path.join(d, p.path))
        for rg in range(pf.metadata.num_row_groups):
            t = pf.read_row_group(rg, columns=["pid", "hilbert"])
            frames.append(t)
            got += t.num_rows
            if got >= limit:
                break
        if got >= limit:
            break
    out = pa.concat_tables(frames).slice(0, limit).to_pandas()
    return pd.DataFrame({"pid": out["pid"], "hilbert": out["hilbert"].astype("int64")})


#: nn_join left-side cap — keeps the ORACLE's cross join bounded
#: (docs × lineitem grows quadratically with sf; ~3e9 pairs at sf0.1
#: stalls DuckDB for tens of minutes). The operator has no such limit;
#: the cap only defines the oracle-checked query.
NN_JOIN_MAX_QID = 200


def q_nn_join(sf_dir: str, k: int = 2):
    """Nearest-neighbor join (stages/knn.nn_join): each of the first
    NN_JOIN_MAX_QID document points → its k nearest lineitem points
    (planar). Left side broadcasts; right side streams."""
    from geomedea_ray.sources.tables import add_doc_points
    from geomedea_ray.stages.knn import nn_join

    docs = tables.read(sf_dir, "documents", columns=["doc_id"]).filter(
        expr=f"doc_id < {NN_JOIN_MAX_QID}"
    ).map_batches(
        add_doc_points, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: t.rename_columns(["qid", "lng", "lat"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = nn_join(docs, linepoints_ds(sf_dir), k=k, right_id_col="pid")
    return out.select_columns(["qid", "pid", "rank"])


def q_nn_join_sql(k: int = 2) -> str:
    from geomedea_ray.sources.tables import LAT_SQL, LNG_SQL

    return (
        LINEPOINTS_CTE
        + f""", q AS (SELECT doc_id AS qid, {LNG_SQL} AS qlng, {LAT_SQL} AS qlat FROM documents
       WHERE doc_id < {NN_JOIN_MAX_QID}),
d AS (SELECT qid, pid,
        (lng - qlng) * (lng - qlng) + (lat - qlat) * (lat - qlat) AS dist
      FROM pts CROSS JOIN q),
r AS (SELECT qid, pid,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, pid) AS "rank"
      FROM d)
SELECT qid, pid, "rank" FROM r WHERE "rank" <= {k}"""
    )


def q_tile_render(sf_dir: str):
    """Raster tile rendering (pipelines/tiles.tile_render): every
    zoom-6 tile rendered as a real 64×64 grayscale pngz image, ONE
    exchange. The gate row is computed by DECODING each emitted PNG
    back to pixels and folding integer checksums (sum, nonzero count,
    position-weighted sum) — so a broken scatter, a wrong y direction
    OR a broken codec all hash-mismatch the oracle, which re-derives
    the same numbers from raw zoom-12 subcell counts in SQL."""
    import pandas as pd

    from geomedea_ray.functions import codecs
    from geomedea_ray.pipelines.tiles import RENDER_SUB_BITS, tile_render

    side = 1 << RENDER_SUB_BITS
    out = tile_render(linepoints_ds(sf_dir), zoom=TILE_ZOOM)

    def _check(df: pd.DataFrame) -> pd.DataFrame:
        w = np.arange(1, side * side + 1, dtype=np.int64)
        sums, nz, wsum = [], [], []
        for b, ww, hh in zip(df["bytes"], df["w"], df["h"]):
            gray = codecs.decode(b, "pngz", int(ww), int(hh))[:, :, 0]
            flat = gray.reshape(-1).astype(np.int64)
            sums.append(int(flat.sum()))
            nz.append(int((flat > 0).sum()))
            wsum.append(int((flat * w).sum()))
        return pd.DataFrame({
            "tile_x": df["tile_x"].to_numpy(np.int64),
            "tile_y": df["tile_y"].to_numpy(np.int64),
            "n_points": df["n_points"].to_numpy(np.int64),
            "px_sum": np.asarray(sums, np.int64),
            "px_nonzero": np.asarray(nz, np.int64),
            "px_weighted": np.asarray(wsum, np.int64),
        })

    return out.map_batches(_check, batch_format="pandas")


def q_tile_render_sql() -> str:
    from geomedea_ray.pipelines.tiles import RENDER_SUB_BITS

    z = TILE_ZOOM + RENDER_SUB_BITS
    n = float(1 << z)
    side = 1 << RENDER_SUB_BITS
    return (
        LINEPOINTS_CTE
        + f""", f AS (
  SELECT CAST(FLOOR((lng + 180.0) / 360.0 * {n!r}) AS BIGINT) AS tx,
         CAST(FLOOR((90.0 - lat) / 180.0 * {n!r}) AS BIGINT) AS ty,
         COUNT(*) AS cnt
  FROM pts GROUP BY 1, 2)
SELECT tx // {side} AS tile_x, ty // {side} AS tile_y,
       CAST(SUM(cnt) AS BIGINT) AS n_points,
       CAST(SUM(LEAST(cnt, 255)) AS BIGINT) AS px_sum,
       CAST(COUNT(*) AS BIGINT) AS px_nonzero,
       CAST(SUM(LEAST(cnt, 255)
                * ((ty % {side}) * {side} + (tx % {side}) + 1)) AS BIGINT)
           AS px_weighted
FROM f GROUP BY 1, 2"""
    )


#: dwithin radius in integer centidegree grid units (0.3°)
DWITHIN_RADIUS = 30


def q_dwithin_join(sf_dir: str):
    """Within-distance point join (stages/rect_join.dwithin_join —
    ST_DWithin shape): every (order point, lineitem point) pair within
    DWITHIN_RADIUS on the integer centidegree grid, with its exact
    int64 squared distance. Order points (the smaller side) replicate
    into the 3×3 cell neighbourhood; lineitem points emit their home
    cell once; ONE co-shuffle on the cell hash, per-shard vectorized
    circle refine — each pair produced exactly once, no dedup pass,
    no all-pairs scan anywhere."""
    import pandas as pd

    from geomedea_ray.stages.rect_join import dwithin_join

    def _opts(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "oid": k,
            "ax": (k * 6007 % 36000) - 18000,
            "ay": (k * 9973 % 17000) - 8500,
        })

    def _lpts(df: pd.DataFrame) -> pd.DataFrame:
        pid = df["l_orderkey"].to_numpy(np.int64) * 8 + df[
            "l_linenumber"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "pid": pid,
            "bx": (pid * 7919 % 36000) - 18000,
            "by": (pid * 104729 % 17000) - 8500,
        })

    a = tables.read(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        _opts, batch_format="pandas")
    b = tables.read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"]
    ).map_batches(_lpts, batch_format="pandas")
    out = dwithin_join(a, b, ("ax", "ay"), ("bx", "by"),
                       ["oid"], ["pid"], radius=DWITHIN_RADIUS)

    def _fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "oid": t["oid"].cast(pa.int64()),
            "pid": t["pid"].cast(pa.int64()),
            "dist2": t["dist2"].cast(pa.int64()),
        })

    return out.map_batches(_fin, batch_format="pyarrow")


def q_dwithin_join_sql() -> str:
    r = DWITHIN_RADIUS
    return f"""
WITH a AS (
  SELECT o_orderkey AS oid,
         (o_orderkey * 6007 % 36000) - 18000 AS ax,
         (o_orderkey * 9973 % 17000) - 8500 AS ay
  FROM orders
),
b AS (
  SELECT l_orderkey * 8 + l_linenumber AS pid,
         ((l_orderkey * 8 + l_linenumber) * 7919 % 36000) - 18000 AS bx,
         ((l_orderkey * 8 + l_linenumber) * 104729 % 17000) - 8500 AS byy
  FROM lineitem
)
SELECT oid, pid,
       (ax - bx) * (ax - bx) + (ay - byy) * (ay - byy) AS dist2
FROM a JOIN b
  ON b.bx BETWEEN a.ax - {r} AND a.ax + {r}
 AND b.byy BETWEEN a.ay - {r} AND a.ay + {r}
WHERE (ax - bx) * (ax - bx) + (ay - byy) * (ay - byy) <= {r * r}
"""


def q_tile_counts_mercator(sf_dir: str):
    """Raster-tile aggregate under the PRODUCTION Web-Mercator scheme
    (functions/cells.tile_xy_mercator). Hash-verified: numpy's and
    DuckDB's libm agree on every gate point at every sf IN THIS
    CONTAINER (verified exhaustively; the tile ids are integers, so a
    disagreement needs a point within ulps of a tile boundary — none
    exist in the deterministic fixture). A scalar-oracle pytest backs
    the kernel independently of libm (tests/test_functions.py)."""
    from geomedea_ray.pipelines.tiles import tile_aggregate

    out = tile_aggregate(linepoints_ds(sf_dir), TILE_ZOOM, scheme="mercator")
    return out.select_columns(["tile_x", "tile_y", "n"])


def q_tile_counts_mercator_sql() -> str:
    n = float(1 << TILE_ZOOM)
    hi = (1 << TILE_ZOOM) - 1
    lat_c = "LEAST(GREATEST(lat, -85.05112878), 85.05112878)"
    ty = (f"FLOOR((1.0 - LN(TAN(RADIANS({lat_c})) + 1.0/COS(RADIANS({lat_c}))) "
          f"/ PI()) / 2.0 * {n!r})")
    tx = f"FLOOR((lng + 180.0) / 360.0 * {n!r})"
    return (
        LINEPOINTS_CTE
        + f"""SELECT CAST(LEAST(GREATEST({tx}, 0), {hi}) AS INT) AS tile_x,
       CAST(LEAST(GREATEST({ty}, 0), {hi}) AS INT) AS tile_y,
       COUNT(*) AS n
FROM pts GROUP BY 1, 2"""
    )


def spatial_dataset_morton(sf_dir: str) -> str:
    """Z-ordered twin of spatial_dataset (spatial_write curve='morton')
    — same rows, same packed indexes, different storage curve; the
    BASELINE.md layout A/B's second arm."""
    import pyarrow.parquet as pq

    from geomedea_ray.sources.cache import cached_spatial_dataset

    expected = pq.ParquetFile(tables.path(sf_dir, "lineitem")).metadata.num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    return cached_spatial_dataset(
        os.path.join(CACHE_ROOT, f"linepoints_morton_{tag}"),
        lambda tmp: spatial_write(linepoints_ds(sf_dir), tmp, tiebreak="pid",
                                  curve="morton"),
        expected_rows=expected,
    )


def q_bbox_select_morton(sf_dir: str):
    """bbox_select against the Z-ORDERED store: the read path (bounds
    prune + packed-index probe) is curve-agnostic, so the result set
    must be identical to the Hilbert layout's — same SQL oracle. What
    differs is I/O: the Morton layout touches more row groups at the
    same selectivity (the Z seam), measured in BASELINE.md."""
    import pyarrow.compute as pc

    d = spatial_dataset_morton(sf_dir)
    a, b, c, e = BBOX_RECT
    ds = Q.bbox_slice(d, BBOX_RECT, columns=["pid", "lng", "lat"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.greater_equal(t["lng"], a), pc.less_equal(t["lng"], c)),
                pc.and_(pc.greater_equal(t["lat"], b), pc.less_equal(t["lat"], e)),
            )
        ),
        batch_format="pyarrow",
    )


def q_geohash_points(sf_dir: str):
    """Standard geohash cell geocoding (functions/cells.geohash_encode
    — Niemeyer's public base32 scheme) over the lineitem point set:
    zero-exchange vectorized map, every 7th point emitted with its
    precision-6 hash. The SQL mirror re-derives the scale → magic-shift
    bit spread → interleave → base32 lookup entirely in BIGINT CTEs;
    the kernel itself is differentially pytested against a scalar
    bisection reference over 24k random points."""
    import pandas as pd

    from geomedea_ray.functions.cells import geohash_encode

    def _gh(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["pid"].to_numpy() % 7 == 0]
        if len(df) == 0:
            return pd.DataFrame({"pid": pd.Series([], dtype=np.int64),
                                 "gh": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "pid": df["pid"].to_numpy(np.int64),
            "gh": geohash_encode(df["lng"].to_numpy(),
                                 df["lat"].to_numpy(), 6),
        })

    return linepoints_ds(sf_dir).map_batches(_gh, batch_format="pandas")


def q_geohash_points_sql() -> str:
    ch = ("SUBSTRING('0123456789bcdefghjkmnpqrstuvwxyz', "
          "CAST((code >> {s}) & 31 AS INT) + 1, 1)")
    concat = " || ".join(ch.format(s=s) for s in (25, 20, 15, 10, 5, 0))
    return (
        LINEPOINTS_CTE
        + """, q AS (
  SELECT pid,
         LEAST(CAST(FLOOR((lng + 180.0) / 360.0 * 32768.0) AS BIGINT),
               32767) AS x,
         LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 32768.0) AS BIGINT),
               32767) AS y
  FROM pts WHERE pid % 7 = 0),
s1 AS (SELECT pid, (x | (x << 16)) & 281470681808895 AS x,
               (y | (y << 16)) & 281470681808895 AS y FROM q),
s2 AS (SELECT pid, (x | (x << 8)) & 71777214294589695 AS x,
               (y | (y << 8)) & 71777214294589695 AS y FROM s1),
s3 AS (SELECT pid, (x | (x << 4)) & 1085102592571150095 AS x,
               (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
s4 AS (SELECT pid, (x | (x << 2)) & 3689348814741910323 AS x,
               (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
s5 AS (SELECT pid, (x | (x << 1)) & 6148914691236517205 AS x,
               (y | (y << 1)) & 6148914691236517205 AS y FROM s4),
c AS (SELECT pid, (x << 1) | y AS code FROM s5)
SELECT pid, """ + concat + " AS gh FROM c"
    )


def q_hex_cell_points(sf_dir: str):
    """H3-style hexagonal cell geocoding (functions/cells.hex_cell —
    axial coords + cube rounding on a plate-carrée plane) over the
    lineitem point set: zero-exchange vectorized map, every 7th point
    (offset 3 — a different slice than geohash_points) emitted with
    its res-5 axial cell. The SQL mirror re-derives axial fractionals
    → cube rounding with every float op in the IDENTICAL IEEE order
    (constants embedded as repr-roundtripped doubles, FLOOR(v+0.5)
    rounding, strict > comparisons), so int64 (hq, hr) hash-match
    bit-for-bit; the kernel also has center-containment and scalar
    differential pytests."""
    import pandas as pd

    from geomedea_ray.functions.cells import hex_cell

    def _hx(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["pid"].to_numpy() % 7 == 3]
        if len(df) == 0:
            return pd.DataFrame({"pid": pd.Series([], dtype=np.int64),
                                 "hq": pd.Series([], dtype=np.int64),
                                 "hr": pd.Series([], dtype=np.int64)})
        q, r = hex_cell(df["lng"].to_numpy(), df["lat"].to_numpy(), 5)
        return pd.DataFrame({"pid": df["pid"].to_numpy(np.int64),
                             "hq": q, "hr": r})

    return linepoints_ds(sf_dir).map_batches(_hx, batch_format="pandas")


def q_hex_cell_points_sql() -> str:
    from geomedea_ray.functions.cells import HEX_SQRT3_3, HEX_TWO_THIRDS

    # res=5 → s = 360/32 = 11.25 (exactly representable); constants as
    # repr-roundtripped doubles via string cast (a bare decimal literal
    # would be DECIMAL-typed — string→DOUBLE parse is correctly rounded)
    c1 = f"CAST('{HEX_SQRT3_3!r}' AS DOUBLE)"
    c2 = f"CAST('{HEX_TWO_THIRDS!r}' AS DOUBLE)"
    return (
        LINEPOINTS_CTE
        + f""", h AS (
  SELECT pid,
         ({c1} * lng - lat / 3.0) / 11.25 AS qf,
         ({c2} * lat) / 11.25 AS rf
  FROM pts WHERE pid % 7 = 3),
h2 AS (SELECT pid, qf, rf, -qf - rf AS yf FROM h),
h3 AS (SELECT pid, qf, rf, yf,
       FLOOR(qf + 0.5) AS rq, FLOOR(yf + 0.5) AS ry,
       FLOOR(rf + 0.5) AS rr FROM h2),
h4 AS (SELECT pid, rq, ry, rr,
       ABS(rq - qf) AS dq, ABS(ry - yf) AS dy, ABS(rr - rf) AS dr
       FROM h3)
SELECT pid,
       CAST(CASE WHEN dq > dy AND dq > dr THEN -ry - rr
                 ELSE rq END AS BIGINT) AS hq,
       CAST(CASE WHEN NOT (dq > dy AND dq > dr) AND NOT (dy > dr)
                 THEN -rq - ry ELSE rr END AS BIGINT) AS hr
FROM h4"""
    )


def q_nearest_segment(sf_dir: str):
    """Map-matching primitive: snap each sampled point to its NEAREST
    LINE SEGMENT (exact point-to-segment projection distance, the op a
    GPS-trace → road-network pipeline runs per ping).

    Segments are a deterministic derivation of the linepoints fixture
    (pid % 11 == 5: endpoint = the point, offset = bounded integer
    hashes of pid — ±0.99°), so both sides rebuild them from lineitem.
    The segment table is the SMALL side (road networks are; 55k rows ×
    32 B at sf0.1): shipped once via ray.put like pip_join's polygons,
    each batch computes the full vectorized distance matrix in
    float-chunked blocks — zero shuffle. Exactness: the projection
    clamp + distance is written in the IDENTICAL IEEE op order as the
    SQL mirror, the winner is (d2, seg_id)-lexicographic, and the
    emitted d2_micro = FLOOR(d2 * 1e6) (floor of identical doubles
    cannot disagree — CLAUDE.md round-4 float-gate rule)."""
    import pandas as pd
    import ray

    from geomedea_ray.util import get_once

    # the point stream feeds TWO consumers (segment derivation, then
    # the snap pass). Deliberately NOT materialized despite the
    # two-consumer rule: the upstream is a trivial 2-int-column read +
    # map, and materializing hands the snap map BLOCK-sized batches —
    # its per-chunk temporaries then blow up into this VM's
    # first-touch page-fault pathology (measured: 3.5 s lazy →
    # 23-104 s materialized at sf0.1). The rule is for NON-trivial
    # upstreams; this one re-runs in milliseconds.
    points = linepoints_ds(sf_dir)

    # small side: segments, resolved driver-side (bounded by contract —
    # pid % 11 stride of the point set; 1.8 MB at sf0.1)
    segs = points.map_batches(
        lambda df: df[df["pid"].to_numpy() % 11 == 5],
        batch_format="pandas").to_pandas()
    sid = segs["pid"].to_numpy(np.int64)
    ax = segs["lng"].to_numpy(np.float64)
    ay = segs["lat"].to_numpy(np.float64)
    dxi = (sid * 131) % 199 - 99
    dyi = (sid * 181) % 199 - 99
    bx = ax + dxi / 100.0
    by = ay + dyi / 100.0
    order = np.argsort(sid, kind="stable")
    seg_ref = ray.put((sid[order], ax[order], ay[order],
                       bx[order], by[order]))

    def _snap(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["pid"].to_numpy() % 37 == 0]
        if len(df) == 0:
            return pd.DataFrame({"pid": pd.Series([], dtype=np.int64),
                                 "seg_id": pd.Series([], dtype=np.int64),
                                 "d2_micro": pd.Series([], dtype=np.int64)})
        sid, ax, ay, bx, by = get_once(seg_ref)
        dx = bx - ax
        dy = by - ay
        len2 = dx * dx + dy * dy
        px_all = df["lng"].to_numpy(np.float64)
        py_all = df["lat"].to_numpy(np.float64)
        n = len(px_all)
        best_sid = np.empty(n, np.int64)
        best_d2 = np.empty(n, np.float64)
        # chunk the (points × segments) matrix to bound temporaries
        for lo in range(0, n, 256):
            px = px_all[lo:lo + 256, None]
            py = py_all[lo:lo + 256, None]
            tn = (px - ax) * dx + (py - ay) * dy
            with np.errstate(invalid="ignore", divide="ignore"):
                t = np.clip(tn / len2, 0.0, 1.0)
            t = np.where(len2 == 0.0, 0.0, t)
            cx = ax + t * dx
            cy = ay + t * dy
            d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
            j = np.argmin(d2, axis=1)  # sid is ascending → argmin's
            # first-minimum == (d2, seg_id)-lexicographic winner
            k = np.arange(d2.shape[0])
            best_sid[lo:lo + 256] = sid[j]
            best_d2[lo:lo + 256] = d2[k, j]
        return pd.DataFrame({
            "pid": df["pid"].to_numpy(np.int64),
            "seg_id": best_sid,
            "d2_micro": np.floor(best_d2 * 1e6).astype(np.int64),
        })

    from geomedea_ray.stages.dedup import dedup_exact

    # explicit batch_size: ~28 filtered points per 1024-row batch keeps
    # the (points × segments) temporaries at ~12 MB — block-sized
    # batches would allocate 100+ MB per chunk and pay the first-touch
    # fault cost on every batch
    snapped = points.map_batches(_snap, batch_format="pandas", batch_size=1024)
    # the point fixture carries duplicate pids (identical coordinates →
    # identical snap rows); the SQL mirror's per-pid rank collapses
    # them, so dedup the (tiny) OUTPUT stream the scale-safe way
    return dedup_exact(snapped, "pid", order_col="seg_id")


def q_nearest_segment_sql() -> str:
    return (
        LINEPOINTS_CTE
        + """, segs AS (
  SELECT pid AS seg_id, lng AS ax, lat AS ay,
         lng + CAST((pid * 131) % 199 - 99 AS DOUBLE) / 100.0 AS bx,
         lat + CAST((pid * 181) % 199 - 99 AS DOUBLE) / 100.0 AS by
  FROM pts WHERE pid % 11 = 5),
p AS (SELECT pid, lng AS px, lat AS py FROM pts WHERE pid % 37 = 0),
d AS (
  SELECT p.pid, s.seg_id,
         (s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay) AS len2,
         (p.px - s.ax) * (s.bx - s.ax) + (p.py - s.ay) * (s.by - s.ay) AS tn,
         p.px, p.py, s.ax, s.ay, s.bx, s.by
  FROM p CROSS JOIN segs s),
c AS (
  SELECT pid, seg_id, px, py,
         ax + (CASE WHEN len2 = 0.0 THEN 0.0
                    ELSE LEAST(GREATEST(tn / len2, 0.0), 1.0) END) * (bx - ax) AS cx,
         ay + (CASE WHEN len2 = 0.0 THEN 0.0
                    ELSE LEAST(GREATEST(tn / len2, 0.0), 1.0) END) * (by - ay) AS cy
  FROM d),
r AS (
  SELECT pid, seg_id,
         (px - cx) * (px - cx) + (py - cy) * (py - cy) AS d2,
         ROW_NUMBER() OVER (PARTITION BY pid
                            ORDER BY (px - cx) * (px - cx) + (py - cy) * (py - cy),
                                     seg_id) AS rn
  FROM c)
SELECT pid, seg_id, CAST(FLOOR(d2 * 1e6) AS BIGINT) AS d2_micro
FROM r WHERE rn = 1"""
    )
