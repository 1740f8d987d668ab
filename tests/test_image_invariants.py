"""The input_hint per-row invariants, verified through the DISTRIBUTED
pipeline against the single-process oracle (sources/synth.py
oracle_image_rows): decoded-pixel np.allclose (exact for raw/pngz,
PSNR ≥ 40 dB for qnt), EXACT caption equality, exact phash equality.
"""

import numpy as np
import pytest

from geomedea_ray.functions import codecs
from geomedea_ray.sources.synth import image_table_path, oracle_image_rows

N = 2000


@pytest.fixture(scope="module")
def table_rows(ray_session):
    """All rows of the distributed n=2000 image table, keyed by id."""
    import ray.data

    path = image_table_path(N)
    rows = ray.data.read_parquet(path).take_all()
    assert len(rows) == N
    return {r["image_id"]: r for r in rows}


def test_captions_exact_and_pixels_close(table_rows):
    ids = list(range(0, N, 37)) + [0, 1, N - 1]
    oracle = oracle_image_rows(sorted(set(ids))).to_pylist()
    for o in oracle:
        got = table_rows[o["image_id"]]
        assert got["caption"] == o["caption"], "caption must be EXACT"
        assert got["phash"] == o["phash"]
        assert got["fmt"] == o["fmt"] and got["w"] == o["w"] and got["h"] == o["h"]
        a = codecs.decode(got["bytes"], got["fmt"], got["w"], got["h"])
        b = codecs.decode(o["bytes"], o["fmt"], o["w"], o["h"])
        # both sides decode the SAME stored encoding → bit-equal always
        assert np.array_equal(a, b)


def test_lossy_psnr_vs_prequantization_pixels(table_rows):
    """The input_hint per-row invariant against the TRUE pre-encoding
    pixels (synth_pixels): decoded lossy rows (qnt, dct8) must meet
    PSNR >= 40 dB vs the original; raw/pngz must be exactly equal."""
    from geomedea_ray.sources.synth import synth_pixels

    ids = list(range(0, 300))
    oracle = {r["image_id"]: r for r in oracle_image_rows(ids).to_pylist()}
    checked_lossy = checked_lossless = 0
    for iid, o in oracle.items():
        got = table_rows[iid]
        decoded = codecs.decode(got["bytes"], got["fmt"], got["w"], got["h"])
        original = synth_pixels(int(iid.split("-")[1]))
        if got["fmt"] in codecs.LOSSY_FMTS:
            assert codecs.psnr(original, decoded) >= 40.0
            if got["fmt"] == "qnt":
                # |err| <= 2/channel by construction; verify the error
                # bound against the bucket centers
                q = (decoded >> 2) << 2
                assert int(np.abs(decoded.astype(int) - q.astype(int)).max()) <= 3
            checked_lossy += 1
        else:
            assert np.array_equal(decoded, original)
            checked_lossless += 1
        # both sides decode the SAME stored encoding → bit-equal always
        b = codecs.decode(o["bytes"], o["fmt"], o["w"], o["h"])
        assert np.array_equal(decoded, b)
    assert checked_lossy > 100 and checked_lossless > 100


def test_duplicate_rows_share_pixels_and_phash(table_rows):
    """synth plants exact duplicates every DUP_RATE rows (dedup ground
    truth): pixels and phash must match the source row exactly."""
    from geomedea_ray.sources.synth import DUP_BACK, DUP_RATE

    pairs = [(i, i - DUP_BACK) for i in range(DUP_RATE, N, DUP_RATE)][:20]
    for dup, src in pairs:
        a = table_rows[f"img-{dup:012d}"]
        b = table_rows[f"img-{src:012d}"]
        assert a["phash"] == b["phash"]
        pa_ = codecs.decode(a["bytes"], a["fmt"], a["w"], a["h"])
        pb = codecs.decode(b["bytes"], b["fmt"], b["w"], b["h"])
        assert np.array_equal(pa_, pb)


def test_join_output_captions_match_source(ray_session):
    """Captions surviving the flagship spatial-join pipeline are the
    EXACT source captions (join must not mangle or reorder payloads)."""
    from geomedea_ray.pipelines.flagship import spatial_join_tiles

    out = spatial_join_tiles("/root/testdata/sf0.001").take_all()
    assert len(out) > 0
    ids = sorted({int(r["image_id"].split("-")[1]) for r in out})
    oracle = {r["image_id"]: r["caption"] for r in oracle_image_rows(ids).to_pylist()}
    for r in out:
        assert r["caption"] == oracle[r["image_id"]]


def test_mosaic_driver_and_tree_paths_agree(ray_session, monkeypatch):
    """image_tile_mosaic finishes driver-side at zoom <= the pyramid
    gate; the distributed TREE path must stay live and bit-identical
    (integer sums commute)."""
    import geomedea_ray.pipelines.flagship as F
    import geomedea_ray.pipelines.tiles as TL

    sf = "/root/testdata/sf0.001"
    a = F.image_tile_mosaic(sf).to_pandas()
    monkeypatch.setattr(TL, "PYRAMID_DRIVER_MAX_ZOOM", -1)
    b = F.image_tile_mosaic(sf).to_pandas()
    key = ["tile_x", "tile_y"]
    sa = a.sort_values(key).reset_index(drop=True)
    sb = b.sort_values(key).reset_index(drop=True)[sa.columns]
    assert sa.equals(sb)
    assert len(sa) > 1


class TestAugment:
    def _expected_one(self, px: np.ndarray, phash: int):
        """Independent scalar re-derivation of the Augment policy:
        explicit index arithmetic (no np.rot90/np.flip), so a wrong
        flip axis or rotation direction in the stage cannot hide."""
        h, w, _ = px.shape
        if phash & 1:
            px = px[:, [w - 1 - j for j in range(w)], :]
        k = (phash >> 1) & 3
        for _ in range(k):  # one CCW quarter turn per step
            hh, ww, _ = px.shape
            out = np.empty((ww, hh, 3), px.dtype)
            for r in range(ww):
                for c in range(hh):
                    out[r, c] = px[c, ww - 1 - r]
            px = out
        hh, ww, _ = px.shape
        h2, w2 = max(hh // 2, 1), max(ww // 2, 1)
        top, left = (hh - h2) // 2, (ww - w2) // 2
        crop = px[top: top + h2, left: left + w2]
        pack = lambda p: (int(p[0]) << 16) | (int(p[1]) << 8) | int(p[2])
        return {
            "aug_w": w2, "aug_h": h2,
            "aug_sum": int(crop.sum(dtype=np.int64)),
            "c00": pack(crop[0, 0]), "c11": pack(crop[-1, -1]),
        }

    def test_policy_geometry_goldens(self):
        import pyarrow as pa

        from geomedea_ray.stages.images import Augment

        rng = np.random.default_rng(3)
        rows = []
        for i in range(8):  # one per (flip, k) combination
            px = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
            rows.append((f"img{i}", px, i))  # phash=i walks all combos
        batch = pa.table({
            "image_id": pa.array([r[0] for r in rows]),
            "bytes": pa.array([codecs.encode(r[1], "raw") for r in rows],
                              pa.binary()),
            "w": pa.array([8] * 8, pa.int32()),
            "h": pa.array([6] * 8, pa.int32()),
            "fmt": pa.array(["raw"] * 8),
            "phash": pa.array([r[2] for r in rows], pa.int64()),
        })
        out = Augment()(batch).to_pydict()
        for j, (_, px, ph) in enumerate(rows):
            exp = self._expected_one(px, ph)
            for col, v in exp.items():
                assert out[col][j] == v, (j, col, out[col][j], v)

    def test_rot_swaps_dims(self):
        import pyarrow as pa

        from geomedea_ray.stages.images import Augment

        px = np.zeros((16, 32, 3), np.uint8)
        batch = pa.table({
            "image_id": pa.array(["a", "b"]),
            "bytes": pa.array([codecs.encode(px, "raw")] * 2, pa.binary()),
            "w": pa.array([32, 32], pa.int32()),
            "h": pa.array([16, 16], pa.int32()),
            "fmt": pa.array(["raw", "raw"]),
            "phash": pa.array([0, 2], pa.int64()),  # k=0 vs k=1
        })
        out = Augment()(batch).to_pydict()
        assert (out["aug_w"][0], out["aug_h"][0]) == (16, 8)
        assert (out["aug_w"][1], out["aug_h"][1]) == (8, 16)
