"""Bit-level goldens ported from the reference test suite (FIXTURES.md §F7)
plus property checks on the pure-function layer. No Ray needed."""

import numpy as np
import pytest

from geomedea_ray.functions import cells, codecs, geo, text
from geomedea_ray.functions.hilbert import (
    cell_range,
    hilbert_cell_id,
    hilbert_u32,
    scaled_hilbert,
)


class TestHilbert:
    def test_reference_goldens(self):
        # reference: geomedea/src/writer/hilbert.rs:85-98 — scaled centers of
        # RECT(0 0,1 1) and RECT(2 2,3 3) within their union extent
        ext = geo.Bounds.from_degrees(0, 0, 3, 3)
        c1 = geo.Bounds.from_degrees(0, 0, 1, 1).center()
        c2 = geo.Bounds.from_degrees(2, 2, 3, 3).center()
        h = scaled_hilbert(
            np.array([c1[0], c2[0]]), np.array([c1[1], c2[1]]), ext.as_tuple()
        )
        assert h[0] == 143165576
        assert h[1] == 2720145952

    def test_corners(self):
        # d(0,0)=0; curve is a bijection on the 4-cell grid at 1 bit
        h = hilbert_u32(np.array([0]), np.array([0]))
        assert h[0] == 0

    def test_bijection_small(self):
        xs, ys = np.meshgrid(np.arange(256), np.arange(256))
        # scale 0..255 into the full 16-bit domain corners stay distinct
        h = hilbert_u32(xs.ravel().astype(np.uint32), ys.ravel().astype(np.uint32))
        assert len(np.unique(h)) == 256 * 256

    def test_locality(self):
        # adjacent hilbert indices are adjacent cells (distance 1 in grid)
        n = 1 << 16
        rng = np.random.default_rng(0)
        xs = rng.integers(0, n - 1, 1000).astype(np.uint32)
        ys = rng.integers(0, n - 1, 1000).astype(np.uint32)
        h1 = hilbert_u32(xs, ys)
        h2 = hilbert_u32(xs + 1, ys)
        assert np.abs(h1.astype(np.int64) - h2.astype(np.int64)).min() >= 1

    def test_cell_id_prefix_nesting(self):
        h = np.uint32(0xDEADBEEF)
        for res in range(1, 16):
            parent = hilbert_cell_id(np.array([h]), res)[0]
            child = hilbert_cell_id(np.array([h]), res + 1)[0]
            assert child >> 2 == parent

    def test_cell_range_covers(self):
        h = np.uint32(2720145952)
        for res in (1, 4, 8):
            cid = int(hilbert_cell_id(np.array([h]), res)[0])
            lo, hi = cell_range(cid, res)
            assert lo <= int(h) < hi


class TestGeo:
    def test_quantize_golden(self):
        # reference: geomedea/src/geometry/mod.rs:350-355
        q = geo.quantize([-118.2562, 34.1060])
        assert q[0] == -1182562000
        assert q[1] == 341060000

    def test_quantize_truncates(self):
        # truncation toward zero, not rounding (geometry/mod.rs:295-297)
        assert geo.quantize([0.00000019])[0] == 1
        assert geo.quantize([-0.00000019])[0] == -1

    def test_center_goldens(self):
        # reference: geomedea/src/bounds.rs:127-140
        b = geo.Bounds.from_degrees(0, 0, 3, 3)
        assert b.center() == (15000000, 15000000)  # (1.5, 1.5)
        b2 = geo.Bounds.from_degrees(-3, -6, 1, 2)
        assert b2.center() == (-10000000, -20000000)  # (-1, -2)

    def test_intersects_closed_interval(self):
        a = geo.Bounds.from_degrees(0, 0, 1, 1)
        b = geo.Bounds.from_degrees(1, 1, 2, 2)  # touching corner counts
        assert a.intersects(b)
        c = geo.Bounds.from_degrees(1.0000001, 1.0000001, 2, 2)
        assert not a.intersects(c)

    def test_bbox_intersects_vectorized(self):
        q = geo.Bounds.from_degrees(0, 0, 10, 10)
        minx = geo.quantize([-5.0, 5.0, 11.0])
        miny = geo.quantize([-5.0, 5.0, 11.0])
        maxx = geo.quantize([-1.0, 6.0, 12.0])
        maxy = geo.quantize([-1.0, 6.0, 12.0])
        m = geo.bbox_intersects(minx, miny, maxx, maxy, q)
        assert list(m) == [False, True, False]

    def test_point_in_polygon_triangle(self):
        tri_x = np.array([0.0, 4.0, 0.0])
        tri_y = np.array([0.0, 0.0, 4.0])
        px = np.array([1.0, 3.9, 2.0, -1.0])
        py = np.array([1.0, 3.9, 1.9, 1.0])
        got = geo.point_in_polygon(px, py, tri_x, tri_y)
        assert list(got) == [True, False, True, False]

    def test_haversine_known(self):
        # London->Paris ~343.5 km
        d = geo.haversine_m(
            np.array([-0.1278]), np.array([51.5074]), 2.3522, 48.8566
        )
        assert 340_000 < d[0] < 348_000


class TestCells:
    def test_tile_eq_golden(self):
        tx, ty = cells.tile_xy_eq(np.array([0.0]), np.array([0.0]), 2)
        assert (tx[0], ty[0]) == (2, 2)
        tx, ty = cells.tile_xy_eq(np.array([-180.0]), np.array([90.0]), 3)
        assert (tx[0], ty[0]) == (0, 0)

    def test_tile_mercator_scalar_oracle(self):
        import math

        def slippy(lng, lat, z):
            n = 2**z
            x = int((lng + 180) / 360 * n)
            lat_r = math.radians(lat)
            y = int((1 - math.log(math.tan(lat_r) + 1 / math.cos(lat_r)) / math.pi) / 2 * n)
            return x, y

        rng = np.random.default_rng(1)
        lng = rng.uniform(-179, 179, 200)
        lat = rng.uniform(-80, 80, 200)
        tx, ty = cells.tile_xy_mercator(lng, lat, 10)
        for i in range(200):
            assert (tx[i], ty[i]) == slippy(lng[i], lat[i], 10)

    def test_tile_id_roundtrip(self):
        tx = np.array([5, 100, 2**20])
        ty = np.array([7, 200, 2**21])
        tid = cells.tile_id(tx, ty, 25)
        z, x, y = cells.tile_id_unpack(tid)
        assert list(z) == [25, 25, 25]
        assert list(x) == list(tx)
        assert list(y) == list(ty)

    def test_quadkey(self):
        qk = cells.quadkey(np.array([3]), np.array([5]), 3)
        # standard bing quadkey for (3,5,z3) = "213"
        assert qk[0] == "213"

    def test_parent(self):
        px, py = cells.parent_tile(np.array([7]), np.array([5]), 1)
        assert (px[0], py[0]) == (3, 2)


class TestCodecs:
    def _img(self, w=32, h=32, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def test_raw_pngz_lossless(self):
        img = self._img()
        for fmt in ("raw", "pngz"):
            out = codecs.decode(codecs.encode(img, fmt), fmt, 32, 32)
            assert np.array_equal(out, img)

    def test_qnt_lossy_psnr(self):
        img = self._img(64, 64, 3)
        out = codecs.decode(codecs.encode(img, "qnt"), "qnt", 64, 64)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
        assert codecs.psnr(img, out) >= 40.0  # input_hint invariant

    def test_unknown_fmt_raises(self):
        with pytest.raises(NotImplementedError):
            codecs.encode(self._img(), "jpeg")
        with pytest.raises(ValueError):
            codecs.decode(b"", "bogus", 1, 1)

    def test_dct8_psnr_guarantee_on_adversarial_content(self):
        """PSNR >= 40 dB is a worst-case theorem for multiple-of-8 dims
        (codecs._DCT_QTAB comment): pure uniform noise is the content
        class closest to the adversarial half-step-everywhere case."""
        for seed in range(8):
            img = self._img(64, 64, seed)
            out = codecs.decode(codecs.encode(img, "dct8"), "dct8", 64, 64)
            assert codecs.psnr(img, out) >= 40.0
        # smooth content should land far above the floor
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float64) / 32
        smooth = np.clip(np.stack([255 * xx, 255 * yy, 128 + 0 * xx], 2), 0, 255).astype(np.uint8)
        out = codecs.decode(codecs.encode(smooth, "dct8"), "dct8", 32, 32)
        assert codecs.psnr(smooth, out) >= 46.0

    def test_dct8_deterministic_and_lossy(self):
        img = self._img(32, 32, 11)
        b1, b2 = codecs.encode(img, "dct8"), codecs.encode(img.copy(), "dct8")
        assert b1 == b2, "encode must be byte-deterministic"
        out = codecs.decode(b1, "dct8", 32, 32)
        assert np.array_equal(codecs.decode(b1, "dct8", 32, 32), out)
        assert not np.array_equal(out, img), "dct8 must be genuinely lossy on noise"
        # decode→re-encode is a fixed point (coefficients already on
        # the quantization grid): second-generation loss is zero
        out2 = codecs.decode(codecs.encode(out, "dct8"), "dct8", 32, 32)
        assert codecs.psnr(out, out2) >= 40.0

    def test_dct8_non_multiple_of_8_dims(self):
        """Edge-replicated padding roundtrips odd sizes (the guarantee
        is stated for multiple-of-8; padding keeps a healthy margin)."""
        img = self._img(21, 13, 5)
        out = codecs.decode(codecs.encode(img, "dct8"), "dct8", 21, 13)
        assert out.shape == (13, 21, 3)
        assert codecs.psnr(img, out) >= 40.0

    def test_dct8_matches_definitional_dct(self):
        """The GEMM block transform vs the DIRECT DCT-II definition
        (a(u)a(v) ΣΣ x[i,j] cos((2i+1)uπ/16) cos((2j+1)vπ/16)) — an
        independent oracle for the transform math, and the inverse
        must reconstruct the block (orthonormality)."""
        from geomedea_ray.functions import codecs

        rng = np.random.default_rng(3)
        blocks = rng.normal(scale=50.0, size=(5, 8, 8))
        got = codecs._dct2d_blocks(blocks, codecs._DCT_C)
        i = np.arange(8)
        a = np.full(8, np.sqrt(2.0 / 8.0))
        a[0] = np.sqrt(1.0 / 8.0)
        want = np.zeros_like(got)
        for b in range(5):
            for u in range(8):
                for v in range(8):
                    cu = np.cos((2 * i + 1) * u * np.pi / 16.0)
                    cv = np.cos((2 * i + 1) * v * np.pi / 16.0)
                    want[b, u, v] = a[u] * a[v] * (blocks[b] * np.outer(cu, cv)).sum()
        assert np.allclose(got, want, atol=1e-9)
        back = codecs._dct2d_blocks(got, codecs._DCT_C.T)
        assert np.allclose(back, blocks, atol=1e-9)

    def test_dct8_compresses_fixture_style_content(self):
        """On gradient+noise content (the synth fixture class) dct8
        must actually compress — it is a transform codec, not a stub."""
        rng = np.random.default_rng(2)
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float64) / 64
        base = np.stack([255 * (0.5 + 0.5 * np.sin(2 * np.pi * xx)), 255 * yy, 255 * xx], 2)
        img = np.clip(base + rng.integers(-20, 21, base.shape), 0, 255).astype(np.uint8)
        enc = codecs.encode(img, "dct8")
        assert len(enc) < len(codecs.encode(img, "pngz"))
        assert len(enc) < img.nbytes

    def test_phash_deterministic_and_robust(self):
        img = self._img(64, 64, 7)
        h1 = codecs.average_phash(img)
        h2 = codecs.average_phash(img.copy())
        assert h1 == h2
        # qnt-roundtripped image should have a close phash even for pure
        # noise (worst case: block means hover at the global mean)
        rt = codecs.decode(codecs.encode(img, "qnt"), "qnt", 64, 64)
        assert codecs.hamming64(np.array([h1]), np.array([codecs.average_phash(rt)]))[0] <= 8

    def test_hamming(self):
        assert codecs.hamming64(np.array([0]), np.array([-1]))[0] == 64
        assert codecs.hamming64(np.array([5]), np.array([5]))[0] == 0


class TestText:
    def test_token_count(self):
        assert list(text.token_count(["a b  c", "", "one"])) == [3, 0, 1]

    def test_stable_hash_deterministic(self):
        a = text.stable_hash64(["foo", "bar"])
        b = text.stable_hash64(["foo", "bar"])
        assert np.array_equal(a, b)
        assert a[0] != a[1]

    def test_fingerprint_equality_only_on_same_text(self):
        fp = text.fingerprint64(["hello world", "hello world", "hello worlds"])
        assert fp[0] == fp[1]
        assert fp[0] != fp[2]

    def test_minhash_estimates_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog again and again ok"
        b = "the quick brown fox jumps over the lazy cat again and again ok"
        sig = text.minhash_signature([a, b, a], num_perm=128)
        est_ab = (sig[0] == sig[1]).mean()
        true_ab = text.jaccard_words(a, b)
        assert abs(est_ab - true_ab) < 0.2
        assert (sig[0] == sig[2]).all()

    def test_minhash_bands_shape(self):
        sig = text.minhash_signature(["x y z w v u"], num_perm=64)
        bands = text.minhash_bands(sig, 16)
        assert bands.shape == (1, 16)

    def test_simhash_similarity(self):
        a = "alpha beta gamma delta epsilon zeta eta theta"
        b = "alpha beta gamma delta epsilon zeta eta iota"
        c = "totally different words entirely here now yes"
        h = text.simhash64([a, b, c])
        d_ab = codecs.hamming64(h[:1], h[1:2])[0]
        d_ac = codecs.hamming64(h[:1], h[2:3])[0]
        assert d_ab < d_ac

    def test_detect_lang(self):
        got = text.detect_lang(
            ["the cat and the dog in the house", "le chat et la vache est une", "这是一个中文句子测试", ""]
        )
        assert list(got) == ["en", "fr", "zh", "und"]

    def test_quality_stats(self):
        qs = text.quality_stats(["Hello, World!"])
        assert qs["n_chars"][0] == 13
        assert qs["n_tokens"][0] == 2
        assert 0 < qs["alpha_ratio"][0] < 1
        assert qs["punct_ratio"][0] > 0


class TestGeohash:
    def test_vs_bisection_reference(self):
        """Differential: the vectorized magic-shift encoder vs the
        classic per-bit bisection algorithm (independent derivation),
        3000 random points x 8 precisions incl. odd ones."""
        from geomedea_ray.functions.cells import (GEOHASH_ALPHABET,
                                                  geohash_encode)

        def ref(lng, lat, precision):
            lat_lo, lat_hi = -90.0, 90.0
            lng_lo, lng_hi = -180.0, 180.0
            bits, out, even, ch = 0, [], True, 0
            while len(out) < precision:
                if even:
                    mid = (lng_lo + lng_hi) / 2
                    if lng >= mid:
                        ch, lng_lo = ch * 2 + 1, mid
                    else:
                        ch, lng_hi = ch * 2, mid
                else:
                    mid = (lat_lo + lat_hi) / 2
                    if lat >= mid:
                        ch, lat_lo = ch * 2 + 1, mid
                    else:
                        ch, lat_hi = ch * 2, mid
                even = not even
                bits += 1
                if bits == 5:
                    out.append(GEOHASH_ALPHABET[ch])
                    bits, ch = 0, 0
            return "".join(out)

        rng = np.random.default_rng(5)
        for _ in range(400):
            lng = float(rng.uniform(-180, 180))
            lat = float(rng.uniform(-90, 90))
            for p in (1, 4, 5, 6, 7, 11, 12):
                assert geohash_encode([lng], [lat], p)[0] == ref(lng, lat, p)

    def test_public_goldens(self):
        from geomedea_ray.functions.cells import geohash_encode

        # the canonical Wikipedia example + a 5-char classic
        assert geohash_encode([10.40744], [57.64911], 11)[0] == "u4pruydqqvj"
        assert geohash_encode([-5.6], [42.6], 5)[0] == "ezs42"

    def test_prefix_property(self):
        """A geohash at precision p is a PREFIX of the same point at
        precision p+2 (even steps keep the bit budget aligned)."""
        from geomedea_ray.functions.cells import geohash_encode

        rng = np.random.default_rng(9)
        lng = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-90, 90, 200)
        g4 = geohash_encode(lng, lat, 4)
        g6 = geohash_encode(lng, lat, 6)
        g8 = geohash_encode(lng, lat, 8)
        assert all(b.startswith(a) for a, b in zip(g4, g6))
        assert all(b.startswith(a) for a, b in zip(g6, g8))

    def test_domain_edge_clamps_and_matches_sql_mirror(self):
        """lng=180 / lat=90 scale to 2^15 before the clamp; the engine
        clips to 32767 and the SQL mirror must LEAST() identically
        (round-4 ADVICE: a latent kernel/oracle divergence at the
        domain edge). Differential: the FULL mirror SQL run over a
        substituted boundary-point CTE vs the engine kernel."""
        import duckdb

        from geomedea_ray.functions.cells import geohash_encode
        from geomedea_ray.pipelines.geo_queries import (LINEPOINTS_CTE,
                                                        q_geohash_points_sql)

        pts = [(0, 180.0, 90.0), (7, -180.0, -90.0), (14, 180.0, -90.0),
               (21, 179.999999, 89.999999), (28, 0.0, 0.0)]
        values = ", ".join(f"({pid}, {lng!r}, {lat!r})" for pid, lng, lat in pts)
        # pid % 7 = 0 keeps every row in the mirror's filter
        cte = f"""
WITH pts AS (
  SELECT * FROM (VALUES {values}) AS t(pid, lng, lat)
)
"""
        sql = q_geohash_points_sql()
        assert sql.startswith(LINEPOINTS_CTE)
        sql = cte + sql[len(LINEPOINTS_CTE):]
        want = duckdb.connect().execute(sql + " ORDER BY pid").df()
        got = geohash_encode([p[1] for p in pts], [p[2] for p in pts], 6)
        assert list(want["gh"]) == list(got)
        # the clamp really engaged: 180/90 is the all-ones max cell
        assert got[0] == "zzzzzz"
        assert got[1] == "000000"


class TestHexCells:
    def test_scalar_differential(self):
        """Vectorized hex_cell vs a scalar python re-derivation of the
        same axial + cube-round scheme (float ops in the same order)."""
        import math

        from geomedea_ray.functions.cells import (HEX_SQRT3_3,
                                                  HEX_TWO_THIRDS, hex_cell)

        def ref(lng, lat, res):
            s = 360.0 / float(1 << res)
            qf = (HEX_SQRT3_3 * lng - lat / 3.0) / s
            rf = (HEX_TWO_THIRDS * lat) / s
            yf = -qf - rf
            rq, ry, rr = (math.floor(v + 0.5) for v in (qf, yf, rf))
            dq, dy, dr = abs(rq - qf), abs(ry - yf), abs(rr - rf)
            if dq > dy and dq > dr:
                rq = -ry - rr
            elif not (dy > dr):
                rr = -rq - ry
            return int(rq), int(rr)

        rng = np.random.default_rng(11)
        lng = rng.uniform(-180, 180, 3000)
        lat = rng.uniform(-90, 90, 3000)
        for res in (0, 3, 5, 9):
            q, r = hex_cell(lng, lat, res)
            for i in range(0, 3000, 7):
                assert (int(q[i]), int(r[i])) == ref(float(lng[i]),
                                                     float(lat[i]), res)

    def test_center_containment(self):
        """The planar center of every cell maps back to that cell
        (cube rounding is a true nearest-hex assignment)."""
        from geomedea_ray.functions.cells import hex_cell, hex_center

        for res in (3, 5, 7):
            q = np.arange(-20, 21)
            Q, R = np.meshgrid(q, q)
            lng, lat = hex_center(Q.ravel(), R.ravel(), res)
            m = (np.abs(lng) < 179) & (np.abs(lat) < 89)
            q2, r2 = hex_cell(lng[m], lat[m], res)
            assert np.array_equal(q2, Q.ravel()[m])
            assert np.array_equal(r2, R.ravel()[m])

    def test_neighbor_cells_are_adjacent(self):
        """Points slightly either side of a cell-center midpoint fall
        into the two respective cells (no gaps/overlaps at seams)."""
        from geomedea_ray.functions.cells import hex_cell, hex_center

        lng0, lat0 = hex_center([3], [2], 5)
        lng1, lat1 = hex_center([4], [2], 5)
        eps = 1e-6
        mid = (lng0[0] + lng1[0]) / 2.0
        q, r = hex_cell([mid - eps, mid + eps], [lat0[0], lat0[0]], 5)
        assert (int(q[0]), int(r[0])) == (3, 2)
        assert (int(q[1]), int(r[1])) == (4, 2)

    def test_sql_mirror_differential(self):
        """The FULL mirror SQL over a substituted point CTE vs the
        kernel — including near-seam points where the cube-round fix
        branches matter (pid % 7 == 3 keeps rows in the filter)."""
        import duckdb

        from geomedea_ray.functions.cells import hex_cell, hex_center
        from geomedea_ray.pipelines.geo_queries import (
            LINEPOINTS_CTE, q_hex_cell_points_sql)

        rng = np.random.default_rng(23)
        lngs = list(rng.uniform(-180, 180, 40))
        lats = list(rng.uniform(-90, 90, 40))
        # seam stress: points at and just off cell centers and corners
        cq, cr = hex_center(np.arange(-3, 4), np.arange(-3, 4), 5)
        for a, b in zip(cq, cr):
            lngs += [float(a), float(a) + 5.624999, float(a) - 5.625001]
            lats += [float(b), float(b) + 3.375, float(b) - 3.375001]
        pids = [3 + 7 * i for i in range(len(lngs))]
        values = ", ".join(f"({p}, {x!r}, {y!r})"
                           for p, x, y in zip(pids, lngs, lats))
        cte = f"\nWITH pts AS (\n  SELECT * FROM (VALUES {values}) AS t(pid, lng, lat)\n)\n"
        sql = q_hex_cell_points_sql()
        assert sql.startswith(LINEPOINTS_CTE)
        sql = cte + sql[len(LINEPOINTS_CTE):]
        want = duckdb.connect().execute(sql + " ORDER BY pid").df()
        q, r = hex_cell(np.array(lngs), np.array(lats), 5)
        assert list(want["hq"]) == q.tolist()
        assert list(want["hr"]) == r.tolist()


class TestDctPhash:
    def _img(self, size, seed):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
        base = np.stack([255 * (0.5 + 0.5 * np.sin(2 * np.pi * xx)),
                         255 * yy, 255 * xx], 2)
        return np.clip(base + rng.integers(-20, 21, base.shape),
                       0, 255).astype(np.uint8)

    def test_batch_equals_scalar_and_deterministic(self):
        from geomedea_ray.functions import codecs

        stack = np.stack([self._img(64, s) for s in range(6)])
        b = codecs.dct_phash_batch(stack)
        assert all(int(b[i]) == codecs.dct_phash(stack[i]) for i in range(6))
        assert np.array_equal(b, codecs.dct_phash_batch(stack.copy()))

    def test_robust_to_lossy_codecs(self):
        """The point of a DCT hash: low-frequency coefficients barely
        move under qnt/dct8 quantization noise — hamming stays small
        while distinct images stay far apart."""
        from geomedea_ray.functions import codecs

        for size in (32, 64):
            img = self._img(size, 1)
            h = codecs.dct_phash(img)
            for fmt in ("qnt", "dct8"):
                rt = codecs.decode(codecs.encode(img, fmt), fmt, size, size)
                d = int(codecs.hamming64(np.array([h]),
                                         np.array([codecs.dct_phash(rt)]))[0])
                assert d <= 8, (size, fmt, d)
        a = codecs.dct_phash(self._img(32, 2))
        b = codecs.dct_phash(self._img(32, 3))
        assert int(codecs.hamming64(np.array([a]), np.array([b]))[0]) >= 12

    def test_planted_duplicates_collapse(self):
        """synth's exact pixel duplicates share the dct_phash (dedup
        ground truth, same invariant as the stored average-hash)."""
        from geomedea_ray.functions import codecs
        from geomedea_ray.sources.synth import DUP_BACK, DUP_RATE, synth_pixels

        for dup in range(DUP_RATE, 200, DUP_RATE):
            a = synth_pixels(dup)
            b = synth_pixels(dup - DUP_BACK)
            assert codecs.dct_phash(a) == codecs.dct_phash(b)
