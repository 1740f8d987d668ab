"""Real HTTP range-read path (state/http_store — round-3 VERDICT item 2).

The reference reads remote datasets over HTTP range requests
(geomedea/src/http_reader.rs); these tests open ACTUAL sockets against
a localhost range-capable server and assert (a) byte-identical results
vs the local path, (b) the measured request/byte ladder matches the
CountingFile simulation, (c) the distributed Ray query operators
(select_all / bbox_slice / hilbert_range_scan / count) work unchanged
over an ``http://`` dataset root.
"""

import numpy as np
import pyarrow as pa
import pytest

from geomedea_ray.pipelines.queries import (
    bbox_slice,
    count,
    hilbert_range_scan,
    select_all,
)
from geomedea_ray.pipelines.spatial_write import spatial_write
from geomedea_ray.state.http_store import (
    HttpRangeFile,
    HttpStoreServer,
    fetch_bytes,
)
from geomedea_ray.state.remote_fs import RangedReadStats, measured_bbox_read


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    """A written spatial dataset + a live range-capable server over it."""
    import ray.data

    rng = np.random.default_rng(23)
    n = 4000
    tbl = pa.table(
        {
            "lng": pa.array(rng.uniform(-179, 179, n), pa.float64()),
            "lat": pa.array(rng.uniform(-84, 84, n), pa.float64()),
            "seq": pa.array(np.arange(n), pa.int64()),
        }
    )
    d = str(tmp_path_factory.mktemp("http_store") / "ds")
    spatial_write(ray.data.from_arrow(tbl).repartition(6), d, tiebreak="seq")
    with HttpStoreServer(d) as srv:
        yield d, srv.base_url, tbl


class TestRangeFile:
    def test_ranged_reads_match_local(self, store, tmp_path):
        d, base, _ = store
        raw = open(f"{d}/manifest.json", "rb").read()
        f = HttpRangeFile(f"{base}/manifest.json")
        assert f.size() == len(raw)
        # middle range
        f.seek(10)
        assert f.read(25) == raw[10:35]
        # tail via seek-from-end (the parquet footer pattern)
        f.seek(-8, 2)
        assert f.read(8) == raw[-8:]
        # read past EOF clamps
        f.seek(len(raw) - 4)
        assert f.read(100) == raw[-4:]
        # full read
        f.seek(0)
        assert f.read() == raw
        f.close()
        assert fetch_bytes(f"{base}/manifest.json") == raw

    def test_404(self, store):
        _, base, _ = store
        with pytest.raises(OSError):
            HttpRangeFile(f"{base}/nope.bin")

    def test_stats_logged(self, store):
        d, base, _ = store
        st = RangedReadStats()
        f = HttpRangeFile(f"{base}/manifest.json", st)
        f.seek(5)
        f.read(10)
        f.close()
        # one HEAD (0-length) + one 10-byte GET
        assert st.requests == 2
        assert st.bytes_read == 10
        assert (f"{base}/manifest.json", 5, 10) in st.ranges


class TestMeasuredHttp:
    def test_ladder_matches_simulation(self, store):
        """The real-socket ladder must agree with the CountingFile
        simulation: same rows, same data bytes, same coalesced request
        count (HEADs are logged as 0-length ranges and merge away)."""
        d, base, _ = store
        rect = (-20.0, -20.0, 20.0, 20.0)
        rows_l, st_l = measured_bbox_read(d, rect)
        rows_h, st_h = measured_bbox_read(base, rect)
        assert st_h["rows"] == st_l["rows"] > 0
        assert sorted(rows_h["seq"].to_pylist()) == sorted(rows_l["seq"].to_pylist())
        assert st_h["bytes_read"] == st_l["bytes_read"]
        assert st_h["requests_coalesced"] == st_l["requests_coalesced"]
        # selectivity ladder still holds over real sockets
        _, tiny = measured_bbox_read(base, (-1.0, -1.0, 1.0, 1.0))
        assert tiny["bytes_read"] <= st_h["bytes_read"]

    def test_server_latency_is_real_wall_time(self, store, tmp_path_factory):
        """With server-side per-request latency, elapsed wall time grows
        with the request count — the reference's 100 ms-RTT story
        through an actual socket, not time.sleep in the client."""
        d, _, _ = store
        with HttpStoreServer(d, latency_s=0.005) as slow:
            rect = (-20.0, -20.0, 20.0, 20.0)
            _, st = measured_bbox_read(slow.base_url, rect)
            assert st["rows"] > 0
            # every GET paid >=5ms at the server; coalesced is a lower
            # bound on the GETs actually issued
            assert st["elapsed_s"] >= 0.005 * st["requests_coalesced"] * 0.5


class TestRayOverHttp:
    def test_count_and_select_all(self, store):
        d, base, tbl = store
        assert count(base) == tbl.num_rows
        got = select_all(base).to_pandas()
        assert len(got) == tbl.num_rows
        assert set(got["seq"]) == set(range(tbl.num_rows))
        # column pruning works remotely too
        two = select_all(base, columns=["seq", "hilbert"]).schema().names
        assert set(two) == {"seq", "hilbert"}

    def test_bbox_slice_http_equals_local(self, store):
        d, base, _ = store
        rect = (-30.0, -15.0, 25.0, 40.0)
        local = bbox_slice(d, rect).to_pandas()
        remote = bbox_slice(base, rect).to_pandas()
        assert sorted(remote["seq"]) == sorted(local["seq"])
        # empty slice returns the schema'd empty dataset
        nothing = bbox_slice(base, (179.9, 83.9, 179.99, 83.99))
        assert nothing.count() == 0

    def test_hilbert_range_scan_http(self, store):
        d, base, _ = store
        lo, hi = 1 << 30, 3 << 30
        local = hilbert_range_scan(d, lo, hi).to_pandas()
        remote = hilbert_range_scan(base, lo, hi).to_pandas()
        assert sorted(remote["seq"]) == sorted(local["seq"])
        pruned = hilbert_range_scan(base, lo, hi, columns=["seq"]).to_pandas()
        assert sorted(pruned["seq"]) == sorted(local["seq"])
