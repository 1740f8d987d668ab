"""FlatGeobuf bridge (sources/fgb.py): FlatBuffers wire-format
goldens, file roundtrip across all supported geometry types, header
parsing, index-skip formula, and a differential vs the GeoJSON bridge
(same features through both bridges ⇒ identical feature tables)."""

import json
import struct

import pyarrow as pa
import pytest

from geomedea_ray.sources.fgb import (
    FBBuilder, FBTable, MAGIC, packed_rtree_size, read_fgb,
    read_fgb_features, read_fgb_header, scan_feature_spans, write_fgb,
    write_fgb_from_dataset,
)

FEATS = [
    {"type": "Feature",
     "geometry": {"type": "Point", "coordinates": [1.5, -2.25]},
     "properties": {"name": "a", "n": 7, "x": 1.5, "ok": True}},
    {"type": "Feature",
     "geometry": {"type": "LineString",
                  "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]},
     "properties": {"name": "b", "n": -3, "x": None, "ok": False}},
    {"type": "Feature",
     "geometry": {"type": "Polygon",
                  "coordinates": [
                      [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
                      [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]]]},
     "properties": {"name": "poly", "n": 0}},
    {"type": "Feature",
     "geometry": {"type": "MultiPoint",
                  "coordinates": [[5.0, 5.0], [6.0, 6.0]]},
     "properties": {"name": "mp"}},
    {"type": "Feature",
     "geometry": {"type": "MultiLineString",
                  "coordinates": [[[0.0, 0.0], [1.0, 0.0]],
                                  [[2.0, 2.0], [3.0, 3.0], [4.0, 4.0]]]},
     "properties": {}},
    {"type": "Feature",
     "geometry": {"type": "MultiPolygon",
                  "coordinates": [
                      [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
                      [[[9.0, 9.0], [10.0, 9.0], [10.0, 10.0], [9.0, 9.0]],
                       [[9.2, 9.2], [9.5, 9.2], [9.5, 9.5], [9.2, 9.2]]]]},
     "properties": {"name": "mpoly", "n": 99}},
    {"type": "Feature", "geometry": None,
     "properties": {"name": "nogeom"}},
    {"type": "Feature",
     "geometry": {"type": "GeometryCollection", "geometries": [
         {"type": "Point", "coordinates": [7.5, -1.25]},
         {"type": "LineString",
          "coordinates": [[0.0, 0.0], [2.5, 2.5]]},
         {"type": "Polygon",
          "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0],
                           [0.0, 0.0]]]},
     ]},
     "properties": {"name": "gc", "n": 5}},
]


class TestFlatBuffersWire:
    """Byte-level invariants of the minimal builder, parsed back by
    the independent FBTable reader AND checked against hand-computed
    layout facts from the public spec."""

    def test_string_layout(self):
        b = FBBuilder()
        off = b.string("hi")
        raw = bytes(reversed(b._b))
        # [u32 len][bytes][NUL] — terminator must be adjacent to bytes
        n = len(raw)
        s = n - off  # from-start position of the string object
        assert struct.unpack_from("<I", raw, s)[0] == 2
        assert raw[s + 4:s + 6] == b"hi"
        assert raw[s + 6] == 0

    def test_scalar_vector_roundtrip(self):
        b = FBBuilder()
        v = b.scalar_vector("d", [1.5, -2.5, 3.25])
        t = b.table([(1, None, v), (6, "B", 1)])
        buf = b.finish_size_prefixed(t)
        (size,) = struct.unpack_from("<I", buf, 0)
        assert size == len(buf) - 4
        tab = FBTable.root(buf[4:])
        assert tab.scalar_vector(1, "d") == [1.5, -2.5, 3.25]
        assert tab.scalar(6, "B", 0) == 1

    def test_table_defaults_and_missing_slots(self):
        b = FBBuilder()
        t = b.table([(8, "Q", 123)])
        buf = b.finish_size_prefixed(t)
        tab = FBTable.root(buf[4:])
        assert tab.scalar(8, "Q", 0) == 123
        assert tab.scalar(2, "B", 0) == 0       # absent slot → default
        assert tab.scalar(9, "H", 16) == 16     # beyond vtable → default
        assert tab.string(0) is None
        assert tab.scalar_vector(1, "d") == []

    def test_scalar_alignment(self):
        """Every 8-byte scalar must land on an 8-aligned from-start
        position (total buffer size is padded to max alignment)."""
        b = FBBuilder()
        t = b.table([(8, "Q", 7), (9, "H", 0), (2, "B", 1)])
        buf = b.finish_size_prefixed(t)
        inner = buf[4:]
        assert len(inner) % 8 == 0
        tab = FBTable.root(inner)
        p = tab._field(8)
        assert p is not None and p % 8 == 0

    def test_offset_vector_of_tables(self):
        b = FBBuilder()
        names = ["alpha", "beta"]
        offs = []
        for i, nm in enumerate(names):
            s = b.string(nm)
            offs.append(b.table([(0, None, s), (1, "B", i + 10)]))
        vec = b.offset_vector(offs)
        root = b.table([(7, None, vec)])
        buf = b.finish_size_prefixed(root)
        tab = FBTable.root(buf[4:])
        cols = tab.table_vector(7)
        assert [(c.string(0), c.scalar(1, "B", 0)) for c in cols] == [
            ("alpha", 10), ("beta", 11)]


class TestFgbFile:
    def test_magic_and_header(self, tmp_path):
        p = str(tmp_path / "t.fgb")
        write_fgb(p, FEATS)
        with open(p, "rb") as f:
            assert f.read(4) == MAGIC[:4]
        columns, header_type, count, _ = read_fgb_header(p)
        assert count == len(FEATS)
        assert header_type == 0  # mixed geometry types → Unknown
        assert [c[0] for c in columns] == ["n", "name", "ok", "x"]

    def test_roundtrip_all_types(self, tmp_path):
        p = str(tmp_path / "t.fgb")
        write_fgb(p, FEATS)
        back = read_fgb(p)
        assert len(back) == len(FEATS)
        for a, b in zip(FEATS, back):
            assert (a["geometry"] is None) == (b["geometry"] is None)
            if a["geometry"]:
                assert a["geometry"] == b["geometry"]
            want = {k: v for k, v in (a["properties"] or {}).items()
                    if v is not None}
            assert want == b["properties"]

    def test_uniform_type_header(self, tmp_path):
        p = str(tmp_path / "pts.fgb")
        pts = [{"type": "Feature",
                "geometry": {"type": "Point", "coordinates": [float(i), 1.0]},
                "properties": {"i": i}} for i in range(5)]
        write_fgb(p, pts)
        _, header_type, count, _ = read_fgb_header(p)
        assert header_type == 1 and count == 5  # Point
        spans = scan_feature_spans(p)
        assert len(spans) == 5
        # spans are contiguous and size-prefix-consistent
        for (o1, n1), (o2, _) in zip(spans, spans[1:]):
            assert o1 + n1 == o2

    def test_not_fgb_rejected(self, tmp_path):
        p = str(tmp_path / "bad.fgb")
        with open(p, "wb") as f:
            f.write(b"PAR1not-a-fgb")
        with pytest.raises(ValueError, match="not a FlatGeobuf"):
            read_fgb_header(p)

    def test_geometrycollection_roundtrip(self, tmp_path):
        """GC encodes as a parts vector of self-describing geometry
        tables (the reference's recursive geozero scheme,
        geozero_writer.rs:206-609) — including NESTED collections."""
        gc = [{"type": "Feature",
               "geometry": {"type": "GeometryCollection", "geometries": [
                   {"type": "Point", "coordinates": [1.0, 2.0]},
                   {"type": "MultiPolygon", "coordinates": [
                       [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]]},
                   {"type": "GeometryCollection", "geometries": [
                       {"type": "LineString",
                        "coordinates": [[-5.0, -5.0], [5.0, 5.0]]}]},
               ]},
               "properties": {"k": 1}}]
        p = str(tmp_path / "gc.fgb")
        write_fgb(p, gc)
        _, header_type, count, _ = read_fgb_header(p)
        assert header_type == 7 and count == 1  # uniform → GC code
        # envelope (header slot 1) folds every nested coordinate
        with open(p, "rb") as f:
            f.read(8)
            (hsize,) = struct.unpack("<I", f.read(4))
            h = FBTable.root(f.read(hsize))
        assert h.scalar_vector(1, "d") == [-5.0, -5.0, 5.0, 5.0]
        back = read_fgb(p)
        assert back[0]["geometry"] == gc[0]["geometry"]
        assert back[0]["properties"] == {"k": 1}

    def test_packed_rtree_size(self):
        # public formula facts: no index at node_size 0 / count 0;
        # a single level collapses to one root chain
        assert packed_rtree_size(0, 16) == 0
        assert packed_rtree_size(100, 0) == 0
        # 100 items, node 16: levels 100 + 7 + 1 = 108 nodes * 40 B
        assert packed_rtree_size(100, 16) == 108 * 40
        assert packed_rtree_size(1, 16) == 1 * 40


class TestFgbRay:
    def test_read_fgb_features_matches_geojson_bridge(self, tmp_path,
                                                      ray_session):
        """Differential: the same features through the FGB bridge and
        the GeoJSON bridge yield IDENTICAL columnar feature tables
        (minus gj_id, which FGB has no analogue for)."""
        from geomedea_ray.sources.geojson import read_geojson

        p = str(tmp_path / "t.fgb")
        write_fgb(p, FEATS)
        gj = str(tmp_path / "t.ndjson")
        with open(gj, "w") as f:
            for feat in FEATS:
                f.write(json.dumps(feat) + "\n")

        t_fgb = pa.concat_tables(
            [pa.table(b) for b in
             read_fgb_features(p).sort("fid").iter_batches(
                 batch_format="pyarrow", batch_size=None)])
        t_gj = pa.concat_tables(
            [pa.table(b) for b in
             read_geojson(gj, typed_props=True).sort("fid").iter_batches(
                 batch_format="pyarrow", batch_size=None)])
        drop = ["gj_id", "geom_json", "props_json"]
        t_fgb = t_fgb.drop_columns([c for c in drop
                                    if c in t_fgb.column_names])
        t_gj = t_gj.drop_columns([c for c in drop if c in t_gj.column_names])
        assert t_fgb.schema.names == t_gj.schema.names
        assert t_fgb.equals(t_gj)

    def test_chunked_read_same_result(self, tmp_path, ray_session):
        p = str(tmp_path / "many.fgb")
        pts = [{"type": "Feature",
                "geometry": {"type": "Point",
                             "coordinates": [float(i % 360 - 180),
                                             float(i % 170 - 85)]},
                "properties": {"i": i, "tag": f"t{i % 3}"}}
               for i in range(257)]
        write_fgb(p, pts)
        one = read_fgb_features(p, target_chunk_rows=10 ** 6)
        many = read_fgb_features(p, target_chunk_rows=50)
        a = one.sort("fid").to_pandas()
        b = many.sort("fid").to_pandas()
        assert len(a) == 257 and a["p_i"].tolist() == b["p_i"].tolist()
        assert a["lng_i"].tolist() == b["lng_i"].tolist()

    def test_export_roundtrip(self, tmp_path, ray_session):
        """Dataset → FGB → Dataset is a fixed point on the feature
        table (S5 export direction)."""
        p1 = str(tmp_path / "src.fgb")
        write_fgb(p1, FEATS[:6])  # export needs a geometry per row
        ds = read_fgb_features(p1)
        p2 = str(tmp_path / "exported.fgb")
        n = write_fgb_from_dataset(ds, p2)
        assert n == 6
        back = read_fgb(p2)
        orig = read_fgb(p1)
        for a, b in zip(orig, back):
            assert a["geometry"]["type"] == b["geometry"]["type"]
