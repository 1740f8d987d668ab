"""Cell compaction (stages/cells.py) vs a brute-force set oracle."""

import numpy as np
import pandas as pd
import pytest

from geomedea_ray.stages.cells import (
    compact_cell_array,
    compact_cells,
    uncompact_cell_array,
)


def oracle_compact(cells: set[int], res: int) -> set[tuple[int, int]]:
    """Reference implementation with plain Python sets."""
    out = set()
    cur = set(cells)
    r = res
    while r > 0 and cur:
        parents = {}
        for c in cur:
            parents.setdefault(c >> 2, []).append(c)
        nxt = set()
        for p, kids in parents.items():
            if len(kids) == 4:
                nxt.add(p)
            else:
                out.update((k, r) for k in kids)
        cur = nxt
        r -= 1
    out.update((c, r) for c in cur)
    return out


class TestCompactArray:
    def test_full_quad_merges(self):
        c, r = compact_cell_array(np.array([0b1000, 0b1001, 0b1010, 0b1011]), res=2)
        assert set(zip(c.tolist(), r.tolist())) == {(0b10, 1)}

    def test_partial_quad_stays(self):
        c, r = compact_cell_array(np.array([0b1000, 0b1001, 0b1010]), res=2)
        assert set(zip(c.tolist(), r.tolist())) == {(0b1000, 2), (0b1001, 2), (0b1010, 2)}

    def test_merge_to_root(self):
        # all 16 res-2 cells of the whole space → single res-0 cell
        c, r = compact_cell_array(np.arange(16), res=2)
        assert c.tolist() == [0] and r.tolist() == [0]

    def test_random_vs_oracle(self):
        rng = np.random.default_rng(3)
        for trial in range(10):
            res = int(rng.integers(2, 9))
            n = int(rng.integers(1, 400))
            cells = np.unique(rng.integers(0, 1 << (2 * res), n))
            c, r = compact_cell_array(cells, res)
            got = set(zip(c.tolist(), r.tolist()))
            assert got == oracle_compact(set(cells.tolist()), res), f"trial {trial}"

    def test_uncompact_roundtrip(self):
        rng = np.random.default_rng(4)
        res = 6
        cells = np.unique(rng.integers(0, 1 << (2 * res), 500))
        c, r = compact_cell_array(cells, res)
        back = uncompact_cell_array(c, r, res)
        # compaction merges only FULL quads, so uncompacting returns
        # exactly the original leaf set
        assert np.array_equal(back, cells)

    def test_duplicates_ignored(self):
        c, r = compact_cell_array(np.array([5, 5, 5]), res=3)
        assert c.tolist() == [5] and r.tolist() == [3]


class TestCompactDataset:
    def test_matches_array_version(self, ray_session):
        import pyarrow as pa
        import ray.data

        rng = np.random.default_rng(9)
        res = 7
        raw = rng.integers(0, 1 << (2 * res), 3000)  # with duplicates
        ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(raw, pa.int64())}))
        got = compact_cells(ds, res=res).to_pandas()
        got_set = set(zip(got["cell_id"], got["cell_res"]))
        c, r = compact_cell_array(np.unique(raw), res)
        assert got_set == set(zip(c.tolist(), r.tolist()))

    def test_full_space_merges_to_root(self, ray_session):
        """The res-0 root merge crosses top-quad shards — the sharded
        pass alone can never produce it (ADVICE r1). Full coverage at
        any res must compact to the single root cell."""
        import pyarrow as pa
        import ray.data

        for res in (1, 2, 3):
            every = np.arange(1 << (2 * res), dtype=np.int64)
            ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(every, pa.int64())}))
            got = compact_cells(ds, res=res).to_pandas()
            assert got["cell_id"].tolist() == [0] and got["cell_res"].tolist() == [0]

    def test_three_top_quads_full(self, ray_session):
        """3 of 4 top quads fully covered: merges stop at res 1 (no
        root), and the epilogue must not invent one."""
        import pyarrow as pa
        import ray.data

        res = 3
        every = np.arange(3 << (2 * res - 2), dtype=np.int64)  # quads 0,1,2
        ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(every, pa.int64())}))
        got = compact_cells(ds, res=res).to_pandas().sort_values("cell_id")
        assert got["cell_id"].tolist() == [0, 1, 2]
        assert got["cell_res"].tolist() == [1, 1, 1]


class TestSaltedGroupApply:
    def test_matches_unsalted_on_hot_key(self, ray_session):
        """90% of rows share one hot key; salted result must equal the
        plain single-reducer computation."""
        import pyarrow as pa
        import ray.data

        from geomedea_ray.stages.cells import salted_group_apply

        rng = np.random.default_rng(8)
        n = 20_000
        keys = np.where(rng.uniform(size=n) < 0.9, 7, rng.integers(0, 50, n))
        vals = rng.normal(size=n)
        ids = np.arange(n)
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(keys, pa.int64()), "v": vals, "id": ids})
        )

        def partial(g):
            return {"n": len(g), "s": float(g["v"].sum()), "mx": float(g["v"].max())}

        def combine(g):
            return {"n": int(g["n"].sum()), "s": float(g["s"].sum()),
                    "mx": float(g["mx"].max())}

        got = salted_group_apply(ds, "k", partial, combine, salt_factor=8,
                                 id_col="id").to_pandas()
        got = got.set_index("k").sort_index()
        import pandas as pd

        df = pd.DataFrame({"k": keys, "v": vals})
        exp = df.groupby("k")["v"].agg(["count", "sum", "max"])
        assert (got["n"] == exp["count"]).all()
        assert np.allclose(got["s"], exp["sum"])
        assert np.allclose(got["mx"], exp["max"])


class TestTileAggregateEmpty:
    def test_empty_and_filtered_input(self, ray_session):
        """Zero-row batches (empty dataset, or a filter that empties a
        block) must produce a schema-stable empty partial, not an
        IndexError (ADVICE r1)."""
        import pyarrow as pa
        import ray.data

        from geomedea_ray.pipelines.tiles import tile_aggregate

        empty = pa.table({"lng": pa.array([], pa.float64()),
                          "lat": pa.array([], pa.float64()),
                          "v": pa.array([], pa.float64())})
        out = tile_aggregate(ray.data.from_arrow(empty), 4, value_col="v").to_pandas()
        assert len(out) == 0  # no IndexError; Ray returns a 0-row frame

        # mixed: one block empties after a filter, another keeps rows
        t = pa.table({"lng": pa.array([10.0, 10.0, -170.0]),
                      "lat": pa.array([5.0, 5.0, 88.0]),
                      "keep": pa.array([True, True, False])})
        ds = ray.data.from_arrow(t).filter(lambda r: r["keep"])
        out = tile_aggregate(ds.drop_columns(["keep"]), 4).to_pandas()
        assert out["n"].sum() == 2


class TestTilePyramidDeepZoom:
    def test_distributed_pyramid_matches_direct_aggregation(self, ray_session):
        """Deep-zoom pyramid (z=12 > PYRAMID_DRIVER_MAX_ZOOM) runs the
        sharded in-shard rollup + driver tail — every level must equal
        a direct tile_aggregate at that zoom (the floor-halving
        identity), with no driver materialization of deep levels."""
        import pyarrow as pa
        import ray.data

        from geomedea_ray.pipelines.tiles import (
            PYRAMID_DRIVER_MAX_ZOOM,
            tile_aggregate,
            tile_pyramid_ds,
        )

        base_zoom = 12
        assert base_zoom > PYRAMID_DRIVER_MAX_ZOOM
        rng = np.random.default_rng(11)
        pts = pa.table({
            "lng": pa.array(rng.uniform(-179.9, 179.9, 5000)),
            "lat": pa.array(rng.uniform(-84.9, 84.9, 5000)),
            "v": pa.array(rng.uniform(0, 10, 5000)),
        })
        ds = ray.data.from_arrow(pts).repartition(4)

        base = tile_aggregate(ds, base_zoom, value_col="v")
        pyr = tile_pyramid_ds(base, base_zoom, value_col="v").to_pandas()
        assert set(pyr["zoom"]) == set(range(base_zoom + 1))
        for z in (base_zoom, 10, 9, 8, 5, 0):
            got = (pyr[pyr["zoom"] == z][["tile_x", "tile_y", "n", "sum_v"]]
                   .sort_values(["tile_x", "tile_y"]).reset_index(drop=True))
            exp = (tile_aggregate(ds, z, value_col="v").to_pandas()
                   [["tile_x", "tile_y", "n", "sum_v"]]
                   .sort_values(["tile_x", "tile_y"]).reset_index(drop=True))
            assert (got[["tile_x", "tile_y", "n"]].to_numpy()
                    == exp[["tile_x", "tile_y", "n"]].to_numpy()).all(), f"zoom {z}"
            assert np.allclose(got["sum_v"], exp["sum_v"])


class TestBboxIntersectJoin:
    def test_matches_bruteforce_with_dedup(self, ray_session):
        import ray.data

        from geomedea_ray.stages.rect_join import bbox_intersect_join

        rng = np.random.default_rng(9)
        na, nb = 120, 40
        ax = rng.uniform(-50, 50, na); ay = rng.uniform(-50, 50, na)
        aw = rng.uniform(0.5, 12, na); ah = rng.uniform(0.5, 12, na)
        bx = rng.uniform(-50, 50, nb); by = rng.uniform(-50, 50, nb)
        bw = rng.uniform(0.5, 12, nb); bh = rng.uniform(0.5, 12, nb)
        a = pd.DataFrame({"a_id": np.arange(na), "ax0": ax, "ay0": ay,
                          "ax1": ax + aw, "ay1": ay + ah})
        b = pd.DataFrame({"b_id": np.arange(nb), "bx0": bx, "by0": by,
                          "bx1": bx + bw, "by1": by + bh})
        out = bbox_intersect_join(
            ray.data.from_pandas(a).repartition(3),
            ray.data.from_pandas(b).repartition(2),
            ("ax0", "ay0", "ax1", "ay1"), ("bx0", "by0", "bx1", "by1"),
            ["a_id"], ["b_id"], cell=8.0, num_shards=5,
        ).to_pandas()
        got = set(zip(out["a_id"], out["b_id"]))
        assert len(got) == len(out), "reference-point dedup failed"
        want = {
            (i, j)
            for i in range(na) for j in range(nb)
            if a["ax0"][i] <= b["bx1"][j] and b["bx0"][j] <= a["ax1"][i]
            and a["ay0"][i] <= b["by1"][j] and b["by0"][j] <= a["ay1"][i]
        }
        assert got == want and len(want) > 50

    def test_touching_edges_and_spanning_rects(self, ray_session):
        import ray.data

        from geomedea_ray.stages.rect_join import bbox_intersect_join

        # rects meet exactly on an edge at a cell boundary; the big A
        # rect spans 4x4 cells — still exactly one reported pair each
        a = pd.DataFrame({"a_id": [1], "x0": [-16.0], "y0": [-16.0],
                          "x1": [16.0], "y1": [16.0]})
        b = pd.DataFrame({"b_id": [7, 8], "u0": [16.0, 30.0], "v0": [0.0, 0.0],
                          "u1": [20.0, 31.0], "v1": [4.0, 1.0]})
        out = bbox_intersect_join(
            ray.data.from_pandas(a), ray.data.from_pandas(b),
            ("x0", "y0", "x1", "y1"), ("u0", "v0", "u1", "v1"),
            ["a_id"], ["b_id"], cell=10.0,
        ).to_pandas()
        assert sorted(zip(out["a_id"], out["b_id"])) == [(1, 7)]


class TestDwithinJoin:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from geomedea_ray.stages.rect_join import dwithin_join

        rng = np.random.default_rng(17)
        na, nb, r = 150, 400, 9
        a = pd.DataFrame({"a_id": np.arange(na),
                          "ax": rng.integers(-100, 100, na),
                          "ay": rng.integers(-100, 100, na)})
        b = pd.DataFrame({"b_id": np.arange(nb),
                          "bx": rng.integers(-100, 100, nb),
                          "by": rng.integers(-100, 100, nb)})
        out = dwithin_join(
            ray.data.from_pandas(a).repartition(3),
            ray.data.from_pandas(b).repartition(2),
            ("ax", "ay"), ("bx", "by"), ["a_id"], ["b_id"],
            radius=r, num_shards=5,
        ).to_pandas()
        got = set(zip(out["a_id"], out["b_id"]))
        assert len(got) == len(out), "pair produced more than once"
        dx = a["ax"].to_numpy()[:, None] - b["bx"].to_numpy()[None, :]
        dy = a["ay"].to_numpy()[:, None] - b["by"].to_numpy()[None, :]
        want_mask = dx * dx + dy * dy <= r * r
        want = set(zip(*np.nonzero(want_mask)))
        assert got == want and len(want) > 100
        # dist2 is the exact integer squared distance
        d2 = {(i, j): dx[i, j] ** 2 + dy[i, j] ** 2 for (i, j) in want}
        for i, j, v in zip(out["a_id"], out["b_id"], out["dist2"]):
            assert d2[(i, j)] == v

    def test_boundary_exact_and_cell_edges(self, ray_session):
        import ray.data

        from geomedea_ray.stages.rect_join import dwithin_join

        # pairs at exactly radius (on-circle) are IN; radius+1 out;
        # points straddling cell boundaries at negative coords
        a = pd.DataFrame({"a_id": [0, 1, 2], "ax": [0, -10, -1],
                          "ay": [0, -10, -1]})
        b = pd.DataFrame({"b_id": [0, 1, 2, 3],
                          "bx": [5, 0, -13, 6],
                          "by": [0, 5, -14, 0]})
        out = dwithin_join(
            ray.data.from_pandas(a), ray.data.from_pandas(b),
            ("ax", "ay"), ("bx", "by"), ["a_id"], ["b_id"], radius=5,
        ).to_pandas()
        got = sorted(zip(out["a_id"], out["b_id"]))
        assert got == [(0, 0), (0, 1), (1, 2)]  # dist2 = 25, 25, 25
        assert set(out["dist2"]) == {25}


class TestTileRender:
    def test_layout_and_png_roundtrip(self, ray_session):
        import ray.data

        from geomedea_ray.functions import codecs
        from geomedea_ray.pipelines.tiles import tile_render

        # zoom 2, 64px tiles -> subcells are zoom-8 cells. Three points:
        # two in one subcell of tile (1,1) (pixel value 2), one in
        # another subcell of the same tile, plus one in tile (0,1).
        # eq scheme: tx = floor((lng+180)/360*4), ty = floor((90-lat)/180*4)
        pts = pd.DataFrame({
            "lng": [10.0, 10.0, 30.0, -100.0],
            "lat": [10.0, 10.0, 40.0, 10.0],
        })
        out = tile_render(ray.data.from_pandas(pts), zoom=2).to_pandas()
        got = {(int(r.tile_x), int(r.tile_y)): r for r in out.itertuples()}
        assert set(got) == {(2, 1), (0, 1)}
        t = got[(2, 1)]
        assert (t.w, t.h, t.fmt) == (64, 64, "pngz")
        px = codecs.decode(t.bytes, "pngz", 64, 64)
        assert px.shape == (64, 64, 3)
        gray = px[:, :, 0].astype(int)
        # subcell of (10, 10) at zoom 8: tx = floor(190/360*256) = 135,
        # ty = floor(80/180*256) = 113 -> local (lx, ly) = (7, 49)
        assert gray[113 & 63, 135 & 63] == 2
        assert gray.sum() == 3  # 2 + 1 in this tile
        assert int(t.n_points) == 3
        t2 = got[(0, 1)]
        px2 = codecs.decode(t2.bytes, "pngz", 64, 64)
        assert px2[:, :, 0].sum() == 1 and int(t2.n_points) == 1

    def test_saturation_clips_at_255(self, ray_session):
        import ray.data

        from geomedea_ray.functions import codecs
        from geomedea_ray.pipelines.tiles import tile_render

        pts = pd.DataFrame({"lng": [10.0] * 300, "lat": [10.0] * 300})
        out = tile_render(ray.data.from_pandas(pts), zoom=2).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        gray = codecs.decode(r["bytes"], "pngz", 64, 64)[:, :, 0]
        assert gray.max() == 255 and int(r["n_points"]) == 300


class TestNearestSegmentSnap:
    def test_matches_bruteforce(self, ray_session):
        """Distributed snap vs a scalar brute-force over the same
        derived segments (projection clamp re-derived independently
        with plain python floats)."""
        from geomedea_ray.pipelines.geo_queries import (linepoints_ds,
                                                        q_nearest_segment)

        sf = "/root/testdata/sf0.001"
        got = q_nearest_segment(sf).to_pandas().sort_values("pid").reset_index(drop=True)
        pts = linepoints_ds(sf).to_pandas()
        segs = pts[pts["pid"] % 11 == 5]
        sid = segs["pid"].to_numpy(np.int64)
        ax = segs["lng"].to_numpy()
        ay = segs["lat"].to_numpy()
        bx = ax + ((sid * 131) % 199 - 99) / 100.0
        by = ay + ((sid * 181) % 199 - 99) / 100.0

        def brute(px, py):
            best = None
            for i in range(len(sid)):
                dx, dy = bx[i] - ax[i], by[i] - ay[i]
                ln2 = dx * dx + dy * dy
                t = 0.0 if ln2 == 0.0 else min(max(((px - ax[i]) * dx + (py - ay[i]) * dy) / ln2, 0.0), 1.0)
                cx, cy = ax[i] + t * dx, ay[i] + t * dy
                d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
                k = (d2, int(sid[i]))
                if best is None or k < best:
                    best = k
            return best

        sample = pts[pts["pid"] % 37 == 0].drop_duplicates("pid")
        assert len(got) == len(sample)
        by_pid = {int(r.pid): (int(r.seg_id), int(r.d2_micro))
                  for r in got.itertuples()}
        checked = 0
        for r in sample.itertuples():
            if checked >= 40:
                break
            d2, s = brute(float(r.lng), float(r.lat))
            assert by_pid[int(r.pid)] == (s, int(np.floor(d2 * 1e6)))
            checked += 1
        assert checked == 40

    def test_projection_clamp_endpoints(self):
        """Points beyond either endpoint snap to the endpoint (t
        clamps), points beside the middle snap to the interior."""
        import duckdb

        from geomedea_ray.pipelines.geo_queries import (LINEPOINTS_CTE,
                                                        q_nearest_segment_sql)

        # one segment (pid=5 → %11==5): substitute a tiny CTE and
        # place probe points (pid%37==0) around it
        seg_pid = 5
        dxi = (seg_pid * 131) % 199 - 99
        dyi = (seg_pid * 181) % 199 - 99
        ax, ay = 10.0, 20.0
        bx, by = ax + dxi / 100.0, ay + dyi / 100.0
        # probes BEYOND each endpoint along the segment direction
        # (t < 0 / t > 1 by construction) and one beside the middle
        dx, dy = bx - ax, by - ay
        probes = [(0, ax - dx, ay - dy), (37, bx + dx, by + dy),
                  (74, (ax + bx) / 2 - dy, (ay + by) / 2 + dx)]
        values = f"({seg_pid}, {ax!r}, {ay!r}), " + ", ".join(
            f"({p}, {x!r}, {y!r})" for p, x, y in probes)
        cte = f"\nWITH pts AS (\n  SELECT * FROM (VALUES {values}) AS t(pid, lng, lat)\n)\n"
        sql = q_nearest_segment_sql()
        assert sql.startswith(LINEPOINTS_CTE)
        out = duckdb.connect().execute(
            cte + sql[len(LINEPOINTS_CTE):] + " ORDER BY pid").df()
        assert list(out["seg_id"]) == [seg_pid] * 3
        ln2 = dx * dx + dy * dy
        # clamped to the endpoints: distance == |d| exactly
        assert int(out["d2_micro"][0]) == int(np.floor(ln2 * 1e6))
        assert int(out["d2_micro"][1]) == int(np.floor(ln2 * 1e6))
        # the perpendicular mid probe projects to the interior at
        # distance |d| as well (offset was the rotated direction)
        assert int(out["d2_micro"][2]) == int(np.floor(ln2 * 1e6))
