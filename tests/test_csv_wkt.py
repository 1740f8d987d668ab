"""WKT DSL (F8) + CSV ingest bridge + typed property columns (F5)."""

import numpy as np
import pyarrow as pa
import pytest

from geomedea_ray.sources.wkt import format_wkt, parse_wkt

CASES = [
    "POINT (30 10)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
    "MULTIPOINT (10 40, 40 30, 20 20, 30 10)",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
    "((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), "
    "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35), (30 20, 20 15, 20 25, 30 20)))",
    "GEOMETRYCOLLECTION (POINT (40 10), LINESTRING (10 10, 20 20, 10 40), "
    "POLYGON ((40 40, 20 45, 45 30, 40 40)))",
    "POINT EMPTY",
    "LINESTRING EMPTY",
    "MULTIPOLYGON EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
    "GEOMETRYCOLLECTION (POINT EMPTY, POINT (1 2))",
]


class TestWkt:
    @pytest.mark.parametrize("wkt", CASES)
    def test_roundtrip(self, wkt):
        g = parse_wkt(wkt)
        # parse → format → parse is a fixed point
        assert parse_wkt(format_wkt(g)) == g

    def test_point_values(self):
        assert parse_wkt("POINT (-1.5 2.25e1)") == {
            "type": "Point", "coordinates": [-1.5, 22.5]
        }

    def test_bad_type_raises(self):
        with pytest.raises(ValueError):
            parse_wkt("CIRCLE (0 0, 5)")


class TestTypedProps:
    def test_inference_and_columns(self):
        from geomedea_ray.sources.geojson import infer_prop_types, parse_features_batch

        feats = [
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1, 2]},
             "properties": {"name": "a", "pop": 10, "ratio": 0.5, "ok": True,
                            "nested": {"x": 1}, "mixed": "s"}},
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [3, 4]},
             "properties": {"name": "b", "pop": 20, "ratio": 1, "mixed": 3}},
        ]
        pt = infer_prop_types(feats)
        assert pt["name"] == pa.string()
        assert pt["pop"] == pa.int64()
        assert pt["ratio"] == pa.float64()  # int+float widens
        assert pt["ok"] == pa.bool_()
        # round-3: scalar-valued dicts are now typed Arrow map columns
        # (PropertyValue::Map — reference feature.rs:179-196)
        assert pt["nested"] == pa.map_(pa.string(), pa.int64())
        assert "mixed" not in pt     # conflicting scalar types
        t = parse_features_batch(feats, prop_types=pt)
        assert t["p_pop"].to_pylist() == [10, 20]
        assert t["p_ratio"].to_pylist() == [0.5, 1.0]
        assert t["p_ok"].to_pylist() == [True, None]
        assert t["p_nested"].to_pylist() == [[("x", 1)], None]
        assert "nested" in t["props_json"][0].as_py()  # JSON mirror kept


class TestCsvBridge:
    def test_csv_wkt_to_features_and_back(self, ray_session, tmp_path):
        import ray.data

        from geomedea_ray.sources.csv_source import (
            features_to_csv_batch,
            read_csv_features,
        )

        path = tmp_path / "pts.csv"
        path.write_text(
            "id,name,score,wkt\n"
            '1,alpha,0.25,"POINT (10.5 -20.25)"\n'
            '2,beta,1.5,"LINESTRING (0 0, 1 1)"\n'
            '3,gamma,2.0,"POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"\n'
        )
        ds = read_csv_features(str(path), fid_col="id", wkt_col="wkt")
        t = ds.to_pandas().sort_values("fid").reset_index(drop=True)
        assert t["fid"].tolist() == [1, 2, 3]
        assert t["geom_type"].tolist() == ["Point", "LineString", "Polygon"]
        assert t["p_name"].tolist() == ["alpha", "beta", "gamma"]
        assert np.allclose(t["p_score"], [0.25, 1.5, 2.0])
        # export back to WKT: geometry survives (quantized 1e-7 grid)
        back = features_to_csv_batch(pa.Table.from_pandas(t))
        assert back["wkt"][0].as_py().startswith("POINT (10.5 -20.25")

    def test_csv_lnglat_points(self, ray_session, tmp_path):
        from geomedea_ray.sources.csv_source import read_csv_features

        path = tmp_path / "ll.csv"
        path.write_text("pid,lng,lat,tag\n7,1.0,2.0,x\n8,-3.5,4.25,y\n")
        t = read_csv_features(str(path), fid_col="pid").to_pandas()
        t = t.sort_values("fid").reset_index(drop=True)
        assert t["fid"].tolist() == [7, 8]
        assert t["lng_i"].tolist() == [10000000, -35000000]
        assert t["p_tag"].tolist() == ["x", "y"]
