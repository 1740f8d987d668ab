"""Validated fixture caches (sources/cache.py) — the round-2 gate
failed 8/50 queries because doubled /tmp fixture dirs were served
behind a bare _SUCCESS marker; these tests simulate every poisoning
mechanism and assert the loader rebuilds instead of serving it."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomedea_ray.sources.cache import (
    MARKER,
    cached_file,
    cached_table,
    dir_parquet_rows,
    table_is_valid,
)


def _write_rows(tmp_dir: str, n: int, name: str = "part-0.parquet") -> None:
    pq.write_table(
        pa.table({"x": pa.array(np.arange(n, dtype=np.int64))}),
        os.path.join(tmp_dir, name),
    )


class TestCachedTable:
    def test_build_then_reuse(self, tmp_path):
        out = str(tmp_path / "t")
        calls = []

        def build(d):
            calls.append(d)
            _write_rows(d, 10)

        assert cached_table(out, build, expected_rows=10) == out
        assert cached_table(out, build, expected_rows=10) == out
        assert len(calls) == 1  # second call served from cache
        assert dir_parquet_rows(out) == 10
        meta = json.loads(open(os.path.join(out, MARKER)).read())
        assert meta["rows"] == 10

    def test_doubled_dir_is_rebuilt(self, tmp_path):
        """The round-2 failure mode: a second complete parquet
        generation lands in the dir. The loader must detect the
        marker/footer mismatch and rebuild clean."""
        out = str(tmp_path / "t")
        cached_table(out, lambda d: _write_rows(d, 10), expected_rows=10)
        # poison: duplicate the data file under a second write-UUID name
        src = next(f for f in os.listdir(out) if f.endswith(".parquet"))
        shutil.copy(os.path.join(out, src), os.path.join(out, "dup-" + src))
        assert dir_parquet_rows(out) == 20
        assert not table_is_valid(out, expected_rows=10)

        rebuilt = []
        cached_table(out, lambda d: (rebuilt.append(1), _write_rows(d, 10))[1],
                     expected_rows=10)
        assert rebuilt == [1]
        assert dir_parquet_rows(out) == 10

    def test_legacy_ok_marker_is_rebuilt(self, tmp_path):
        """Pre-fix dirs carry a bare 'ok' marker with no count — they
        must never be trusted (ADVICE high: poisoned pre-fix dirs were
        reused forever)."""
        out = str(tmp_path / "t")
        os.makedirs(out)
        _write_rows(out, 10)
        with open(os.path.join(out, MARKER), "w") as f:
            f.write("ok")
        assert not table_is_valid(out)
        cached_table(out, lambda d: _write_rows(d, 10), expected_rows=10)
        assert table_is_valid(out, expected_rows=10)

    def test_duplicated_write_inside_one_build_refuses_publish(self, tmp_path):
        """Mechanism 2 (the one that doubled the already-atomic media
        builder): the build itself writes twice. The pre-publish count
        must refuse the tmp dir rather than rename it into place."""
        out = str(tmp_path / "t")

        def doubled_build(d):
            _write_rows(d, 10, "gen1.parquet")
            _write_rows(d, 10, "gen2.parquet")  # retried write execution

        with pytest.raises(RuntimeError, match="duplicated write"):
            cached_table(out, doubled_build, expected_rows=10)
        assert not os.path.exists(out)  # nothing published
        # no tmp litter either
        assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d]

    def test_missing_expected_rows_still_checks_marker(self, tmp_path):
        out = str(tmp_path / "t")
        cached_table(out, lambda d: _write_rows(d, 5))
        # tamper with the data without updating the marker
        _write_rows(out, 5, "extra.parquet")
        assert not table_is_valid(out)


class TestCachedFile:
    def test_build_reuse_and_revalidate(self, tmp_path):
        out = str(tmp_path / "f.parquet")
        calls = []

        def build(p):
            calls.append(p)
            pq.write_table(pa.table({"x": list(range(7))}), p)

        assert cached_file(out, build, expected_rows=7) == out
        cached_file(out, build, expected_rows=7)
        assert len(calls) == 1
        # stale file with the wrong count is replaced
        pq.write_table(pa.table({"x": list(range(3))}), out)
        cached_file(out, build, expected_rows=7)
        assert pq.ParquetFile(out).metadata.num_rows == 7


class TestCachedSpatialDataset:
    def test_tampered_partition_rebuilds(self, tmp_path, ray_session):
        import ray.data

        from geomedea_ray.pipelines.spatial_write import spatial_write
        from geomedea_ray.sources.cache import (
            cached_spatial_dataset,
            spatial_dataset_is_valid,
        )

        rng = np.random.default_rng(7)
        tbl = pa.table({
            "pid": pa.array(np.arange(500, dtype=np.int64)),
            "lng": pa.array(rng.uniform(-170, 170, 500)),
            "lat": pa.array(rng.uniform(-80, 80, 500)),
        })

        def build(d):
            spatial_write(ray.data.from_arrow(tbl), d, tiebreak="pid")

        out = str(tmp_path / "spatial")
        cached_spatial_dataset(out, build, expected_rows=500)
        assert spatial_dataset_is_valid(out, expected_rows=500)

        # poison: append a duplicate generation of one partition file
        from geomedea_ray.state.manifest import Manifest

        m = Manifest.load(out)
        p0 = os.path.join(out, m.partitions[0].path)
        dup = pq.read_table(p0)
        pq.write_table(pa.concat_tables([dup, dup]), p0)
        assert not spatial_dataset_is_valid(out, expected_rows=500)

        cached_spatial_dataset(out, build, expected_rows=500)
        assert spatial_dataset_is_valid(out, expected_rows=500)
