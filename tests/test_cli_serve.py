"""wasm-equivalent serving check (round-3 VERDICT item 9).

The reference's browser layer (geomedea-wasm/src/lib.rs:31-106) serves
`select_bbox` over HTTP as a GeoJSON FeatureCollection. The moral
equivalent here is the CLI path

    python -m geomedea_ray bbox http://…/counties MINLNG MINLAT MAXLNG MAXLAT --geojson=out

— ranged GETs against a remote store, FeatureCollection out — asserted
against the reference's USCounties golden: exactly **140** MultiPolygon
features for the contract rect (http_reader.rs:786-803 shape).
"""

import json

import pytest

from geomedea_ray.__main__ import main
from geomedea_ray.pipelines.spatial_write import spatial_write
from geomedea_ray.sources import fixtures as FX
from geomedea_ray.sources.geojson import parse_features_batch
from geomedea_ray.state.http_store import HttpStoreServer


@pytest.fixture(scope="module")
def counties_http(ray_session, tmp_path_factory):
    import ray.data

    tbl = parse_features_batch(FX.counties_features())
    d = str(tmp_path_factory.mktemp("serve") / "counties")
    spatial_write(ray.data.from_arrow(tbl), d, tiebreak="fid")
    with HttpStoreServer(d) as srv:
        yield srv.base_url


class TestServeBboxGeojson:
    def test_uscounties_golden_140_over_http(self, counties_http, tmp_path, capsys):
        out = str(tmp_path / "sel.geojson")
        rect = [str(v) for v in FX.COUNTIES_BBOX_RECT]
        rc = main(["bbox", counties_http, *rect, f"--geojson={out}"])
        assert rc == 0
        fc = json.load(open(out))
        assert fc["type"] == "FeatureCollection"
        feats = fc["features"]
        assert len(feats) == FX.COUNTIES_BBOX_COUNT == 140
        assert all(f["type"] == "Feature" for f in feats)
        assert all(f["geometry"]["type"] == "MultiPolygon" for f in feats)
        # every feature carries real coordinates (serving layer returns
        # geometry, not just ids)
        assert all(f["geometry"]["coordinates"][0][0] for f in feats)

    def test_stdout_variant_is_parseable(self, counties_http, capsys):
        rect = [str(v) for v in FX.COUNTIES_BBOX_RECT]
        rc = main(["bbox", counties_http, *rect, "--geojson=-"])
        assert rc == 0
        fc = json.loads(capsys.readouterr().out)
        assert len(fc["features"]) == 140

    def test_count_only_still_works(self, counties_http, capsys):
        rect = [str(v) for v in FX.COUNTIES_BBOX_RECT]
        rc = main(["bbox", counties_http, *rect])
        assert rc == 0
        assert "-> 140 rows" in capsys.readouterr().out

    def test_unknown_flag_rejected(self, counties_http, capsys):
        rc = main(["bbox", counties_http, "0", "0", "1", "1", "--nope=x"])
        assert rc == 2
