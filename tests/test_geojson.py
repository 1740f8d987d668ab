"""GeoJSON bridge (S4/S5): parse/export roundtrip + full pipeline
through spatial_write and bbox_slice with feature-bbox semantics.

Mirrors the reference's conformance-corpus strategy
(geomedea_geozero/src/geozero_writer.rs:838-1130): roundtrip, compare
after normalization (1e-7 coordinate tolerance = quantization step;
sort features by coordinate sum to absorb Hilbert reordering).
"""

import json

import numpy as np
import pytest

from geomedea_ray.sources import geojson as GJ

FIXTURE_FEATURES = [
    {"type": "Feature", "geometry": {"type": "Point", "coordinates": [-118.2562, 34.1060]},
     "properties": {"name": "LA", "pop": 4}},
    {"type": "Feature", "geometry": {"type": "LineString",
     "coordinates": [[0.0, 0.0], [1.5, 1.5], [3.0, 0.5]]},
     "properties": {"name": "line"}},
    {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [
        [[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0], [-10.0, -10.0]],
        [[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0], [-2.0, -2.0]],
     ]}, "properties": {"name": "square_with_hole", "area": 399.84}},
    {"type": "Feature", "geometry": {"type": "MultiPoint",
     "coordinates": [[5.0, 5.0], [6.0, 6.0]]}, "properties": {}},
    {"type": "Feature", "geometry": {"type": "MultiLineString",
     "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]},
     "properties": {"n": 2}},
    {"type": "Feature", "geometry": {"type": "MultiPolygon", "coordinates": [
        [[[100.0, 40.0], [101.0, 40.0], [101.0, 41.0], [100.0, 40.0]]],
        [[[102.0, 42.0], [103.0, 42.0], [103.0, 43.0], [102.0, 42.0]],
         [[102.2, 42.2], [102.8, 42.2], [102.5, 42.8], [102.2, 42.2]]],
     ]}, "properties": {"name": "two_polys"}},
    {"type": "Feature", "geometry": {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [45.0, 45.0]},
        {"type": "LineString", "coordinates": [[44.0, 44.0], [46.0, 46.0]]},
     ]}, "properties": {"name": "gc"}},
]


def _geom_close(a, b, tol=1e-7):
    if a is None or b is None:
        return a == b
    if a["type"] != b["type"]:
        return False
    if a["type"] == "GeometryCollection":
        return len(a["geometries"]) == len(b["geometries"]) and all(
            _geom_close(x, y, tol) for x, y in zip(a["geometries"], b["geometries"])
        )
    fa, rla, pla = GJ._flatten_geometry(a)
    fb, rlb, plb = GJ._flatten_geometry(b)
    return (
        rla == rlb
        and pla == plb
        and np.allclose(np.asarray(fa, np.float64), np.asarray(fb, np.float64),
                        atol=tol, rtol=0)
    )


class TestParseExportRoundtrip:
    def test_all_geometry_types(self):
        tbl = GJ.parse_features_batch(FIXTURE_FEATURES)
        assert tbl.num_rows == len(FIXTURE_FEATURES)
        for i, row in enumerate(tbl.to_pylist()):
            out = GJ.feature_to_geojson(row)
            src = FIXTURE_FEATURES[i]
            assert out["properties"] == src["properties"]
            assert _geom_close(out["geometry"], src["geometry"]), (
                f"geometry mismatch for {src['geometry']['type']}"
            )

    def test_quantization_golden(self):
        # reference golden: (-118.2562, 34.1060) → (-1182562000, 341060000)
        # (geometry/mod.rs:350-355)
        tbl = GJ.parse_features_batch([FIXTURE_FEATURES[0]])
        coords = tbl["coords"][0].as_py()
        assert coords == [-1182562000, 341060000]

    def test_bbox_and_center(self):
        tbl = GJ.parse_features_batch([FIXTURE_FEATURES[2]])  # ±10° square
        r = tbl.to_pylist()[0]
        assert r["bbox_min_lng_i"] == -100000000 and r["bbox_max_lng_i"] == 100000000
        assert r["lng_i"] == 0 and r["lat_i"] == 0  # integer center

    def test_null_geometry(self):
        tbl = GJ.parse_features_batch(
            [{"type": "Feature", "geometry": None, "properties": {"a": 1}}]
        )
        out = GJ.feature_to_geojson(tbl.to_pylist()[0])
        assert out["geometry"] is None and out["properties"] == {"a": 1}


class TestFilePipeline:
    @pytest.fixture()
    def geojson_file(self, tmp_path):
        p = tmp_path / "fixture.geojson"
        p.write_text(json.dumps({"type": "FeatureCollection", "features": FIXTURE_FEATURES}))
        return str(p)

    def test_read_write_roundtrip_via_spatial_dataset(self, ray_session, geojson_file, tmp_path):
        from geomedea_ray.pipelines.queries import select_all
        from geomedea_ray.pipelines.spatial_write import spatial_write

        ds = GJ.read_geojson(geojson_file)
        out_dir = str(tmp_path / "spatial")
        man = spatial_write(ds, out_dir, tiebreak="fid")
        assert man.row_count == len(FIXTURE_FEATURES)

        out_path = str(tmp_path / "out.geojson")
        n = GJ.write_geojson(select_all(out_dir), out_path)
        assert n == len(FIXTURE_FEATURES)
        got = json.load(open(out_path))["features"]
        # normalize order (Hilbert reorder) by coordinate-sum, like the
        # reference's conformance tests (geozero_writer.rs:838-1130)
        def key(f):
            g = f["geometry"]
            if g is None:
                return 0.0
            return float(np.asarray(json.dumps(g).count(","), np.float64)) + (
                sum(GJ._flatten_geometry(g)[0][0]) if g["type"] != "GeometryCollection" else 99.0
            )
        got_sorted = sorted(got, key=key)
        src_sorted = sorted(
            [{"type": "Feature",
              "geometry": f["geometry"], "properties": f["properties"]}
             for f in FIXTURE_FEATURES], key=key)
        for a, b in zip(got_sorted, src_sorted):
            assert a["properties"] == b["properties"]
            assert _geom_close(a["geometry"], b["geometry"])

    def test_bbox_slice_feature_bbox_semantics(self, ray_session, geojson_file, tmp_path):
        """select_bbox matches on FEATURE BBOX ∩ query only (reference:
        packed_r_tree/reader.rs:36-38 — no exact refinement)."""
        from geomedea_ray.pipelines.queries import bbox_slice
        from geomedea_ray.pipelines.spatial_write import spatial_write

        out_dir = str(tmp_path / "spatial")
        spatial_write(GJ.read_geojson(geojson_file), out_dir, tiebreak="fid")
        # rect covering only the hole of the square polygon: bbox still
        # intersects → polygon IS returned (bbox-only semantics)
        got = bbox_slice(out_dir, (-1.0, -1.0, 1.0, 1.0)).to_pandas()
        names = {json.loads(p).get("name") for p in got["props_json"]}
        assert "square_with_hole" in names
        assert "line" in names  # its bbox [0..3, 0..1.5] intersects
        assert "two_polys" not in names  # far away

    def test_ndjson_input(self, ray_session, tmp_path):
        p = tmp_path / "feats.ndjson"
        p.write_text("\n".join(json.dumps(f) for f in FIXTURE_FEATURES[:3]))
        ds = GJ.read_geojson(str(p))
        assert ds.count() == 3

    def test_sharded_export_roundtrip(self, ray_session, tmp_path):
        """write_geojson_sharded: one FeatureCollection per partition
        written inside the tasks (no driver materialization), manifest
        committed last; read back through one read_geojson list read
        (round-2 VERDICT item 7)."""
        import os

        # multi-partition dataset: replicate the fixture across files
        srcs = []
        for i in range(4):
            p = tmp_path / f"in-{i}.geojson"
            p.write_text(json.dumps(
                {"type": "FeatureCollection", "features": FIXTURE_FEATURES}))
            srcs.append(str(p))
        ds = GJ.read_geojson(srcs)
        out_dir = str(tmp_path / "sharded")
        man = GJ.write_geojson_sharded(ds, out_dir)
        n_src = 4 * len(FIXTURE_FEATURES)
        assert man["total_rows"] == n_src
        assert len(man["files"]) > 1  # genuinely sharded
        assert sum(r["rows"] for r in man["files"]) == n_src
        for r in man["files"]:
            doc = json.load(open(os.path.join(out_dir, r["path"])))
            assert doc["type"] == "FeatureCollection"
            assert len(doc["features"]) == r["rows"]
        back = GJ.read_geojson_sharded(out_dir)
        assert back.count() == n_src

    def test_nested_typed_props(self, ray_session, tmp_path):
        """PropertyValue::Vec/Map analogue (reference feature.rs:179-196):
        homogeneous lists → Arrow list<>, scalar-valued dicts →
        map<string,v>; values readable with pc.list_element /
        pc.map_lookup after a full spatial_write round-trip."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from geomedea_ray.pipelines.queries import select_all
        from geomedea_ray.pipelines.spatial_write import spatial_write

        feats = [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [i * 1.0, i * 0.5]},
             "properties": {"doc_id": i,
                            "tags": ["a" if i % 2 else "b", "web"],
                            "scores": [i % 7, i * 2],
                            "ratio": [0.5 * i, 1],          # mixed int/float → list<f64>
                            "meta": {"k": f"v{i}", "s": "x"},
                            "bad": [[1]] if i == 0 else [[2]],  # list-of-list: stays JSON
                            }}
            for i in range(10)
        ]
        p = tmp_path / "nested.ndjson"
        p.write_text("\n".join(json.dumps(f) for f in feats))
        types = GJ.infer_prop_types(GJ.load_geojson_features(str(p)))
        assert types["tags"] == __import__("pyarrow").list_(
            __import__("pyarrow").string())
        assert types["scores"] == pa.list_(pa.int64())
        assert types["ratio"] == pa.list_(pa.float64())
        assert types["meta"] == pa.map_(pa.string(), pa.string())
        assert "bad" not in types  # deep nesting punts to props_json

        out_dir = str(tmp_path / "spatial")
        spatial_write(GJ.read_geojson(str(p), typed_props=True), out_dir,
                      tiebreak="fid")

        def probe(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["p_doc_id"],
                "tag0": pc.list_element(t["p_tags"], 0),
                "s1": pc.list_element(t["p_scores"], 1),
                "k": pc.map_lookup(t["p_meta"].combine_chunks(),
                                   pa.scalar("k"), "first"),
            })

        got = (select_all(out_dir).map_batches(probe, batch_format="pyarrow")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["tag0"].tolist() == ["b" if i % 2 == 0 else "a" for i in range(10)]
        assert got["s1"].tolist() == [i * 2 for i in range(10)]
        assert got["k"].tolist() == [f"v{i}" for i in range(10)]

    def test_write_geojson_size_guard(self, ray_session, tmp_path):
        p = tmp_path / "in.geojson"
        p.write_text(json.dumps(
            {"type": "FeatureCollection", "features": FIXTURE_FEATURES}))
        from geomedea_ray.pipelines.spatial_write import spatial_write
        from geomedea_ray.pipelines.queries import select_all

        out_dir = str(tmp_path / "spatial")
        spatial_write(GJ.read_geojson(str(p)), out_dir, tiebreak="fid")
        with pytest.raises(ValueError, match="write_geojson_sharded"):
            GJ.write_geojson(select_all(out_dir), str(tmp_path / "o.geojson"),
                             max_rows=2)
