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


class TestDct8Properties:
    @given(st.integers(0, 2**31 - 1), st.sampled_from([8, 16, 32, 40, 64]))
    @settings(max_examples=40, deadline=None)
    def test_psnr_floor_and_determinism_any_content(self, seed, size):
        """The 40 dB floor is a worst-case theorem for multiple-of-8
        dims — hold it on ARBITRARY uint8 content, and the encoding
        must be byte-deterministic with an idempotent decode."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        b = codecs.encode(img, "dct8")
        assert b == codecs.encode(img.copy(), "dct8")
        out = codecs.decode(b, "dct8", size, size)
        assert codecs.psnr(img, out) >= 40.0
        assert np.array_equal(out, codecs.decode(b, "dct8", size, size))
        # second generation is a fixed point of the quantization grid
        out2 = codecs.decode(codecs.encode(out, "dct8"), "dct8", size, size)
        assert codecs.psnr(out, out2) >= 40.0

    @given(st.integers(0, 2**31 - 1),
           st.integers(9, 41), st.integers(9, 41))
    @settings(max_examples=25, deadline=None)
    def test_odd_dims_roundtrip(self, seed, w, h):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = codecs.decode(codecs.encode(img, "dct8"), "dct8", w, h)
        assert out.shape == (h, w, 3)
        # padding softens the multiple-of-8 theorem; 38 dB still holds
        # with huge margin in practice (typical ~47)
        assert codecs.psnr(img, out) >= 38.0


class TestHexCellProperties:
    @given(st.lists(st.tuples(st.integers(-15, 15), st.integers(-15, 15)),
                    min_size=1, max_size=40),
           st.integers(2, 8),
           st.floats(min_value=-0.45, max_value=0.45, allow_nan=False),
           st.floats(min_value=-0.45, max_value=0.45, allow_nan=False))
    @settings(max_examples=40, deadline=None)
    def test_perturbed_center_stays_in_cell(self, cells, res, fx, fy):
        """Any point strictly inside a hex's inradius maps to that
        hex: perturb each center by < inradius (inradius = sqrt(3)/2
        · s·… for this axial metric, conservatively 0.45 of the
        center-to-edge distance) and the assignment must not move."""
        from geomedea_ray.functions.cells import hex_cell, hex_center

        q = np.array([c[0] for c in cells])
        r = np.array([c[1] for c in cells])
        lng, lat = hex_center(q, r, res)
        s = 360.0 / float(1 << res)
        # pointy-top hexes: inradius = sqrt(3)/2 * s in this metric's
        # y-units; perturb well inside it
        dl = fx * s * 0.8
        dp = fy * s * 0.8
        m = (np.abs(lng + dl) < 178) & (np.abs(lat + dp) < 88)
        if not m.any():
            return
        q2, r2 = hex_cell(lng[m] + dl, lat[m] + dp, res)
        assert np.array_equal(q2, q[m])
        assert np.array_equal(r2, r[m])

    @given(st.lists(st.tuples(lngs, lats), min_size=1, max_size=60),
           st.integers(0, 10))
    @settings(max_examples=40, deadline=None)
    def test_total_and_deterministic(self, pts, res):
        """Every point gets exactly one cell; vectorized == rerun."""
        from geomedea_ray.functions.cells import hex_cell

        lng = np.array([p[0] for p in pts])
        lat = np.array([p[1] for p in pts])
        q1, r1 = hex_cell(lng, lat, res)
        q2, r2 = hex_cell(lng.copy(), lat.copy(), res)
        assert np.array_equal(q1, q2) and np.array_equal(r1, r2)
        assert q1.dtype == np.int64 and len(q1) == len(pts)


class TestDctPhashProperties:
    @given(st.integers(0, 2**31 - 1), st.sampled_from([32, 64]))
    @settings(max_examples=25, deadline=None)
    def test_lossy_roundtrip_moves_few_bits(self, seed, size):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
        base = np.stack([255 * (0.5 + 0.5 * np.sin(2 * np.pi * xx)),
                         255 * yy, 255 * xx], 2)
        img = np.clip(base + rng.integers(-20, 21, base.shape),
                      0, 255).astype(np.uint8)
        h = codecs.dct_phash(img)
        for fmt in ("qnt", "dct8"):
            rt = codecs.decode(codecs.encode(img, fmt), fmt, size, size)
            d = int(codecs.hamming64(np.array([h]),
                                     np.array([codecs.dct_phash(rt)]))[0])
            assert d <= 10, (seed, size, fmt, d)
