"""Packed R-tree: level-math goldens ported from the reference
(packed_r_tree/mod.rs:196-292) + randomized query-vs-bruteforce."""

import numpy as np

from geomedea_ray.functions.geo import Bounds, quantize
from geomedea_ray.state.index import PackedRTree, nodes_per_level


def test_nodes_per_level_reference_goldens():
    # reference: geomedea/src/packed_r_tree/mod.rs:196-210
    assert nodes_per_level(0) == []
    assert nodes_per_level(1) == [1]
    assert nodes_per_level(2) == [1, 2]
    assert nodes_per_level(4) == [1, 4]
    assert nodes_per_level(15) == [1, 15]
    assert nodes_per_level(16) == [1, 16]
    assert nodes_per_level(17) == [1, 2, 17]
    assert nodes_per_level(32) == [1, 2, 32]
    assert nodes_per_level(33) == [1, 3, 33]
    assert nodes_per_level(255) == [1, 16, 255]
    assert nodes_per_level(256) == [1, 16, 256]
    assert nodes_per_level(257) == [1, 2, 17, 257]


def test_node_count_goldens():
    # reference: packed_r_tree/mod.rs:253-259
    for n, total in [(1, 1), (2, 3), (16, 17), (256, 273), (257, 277)]:
        x = np.arange(n, dtype=np.int32)
        t = PackedRTree.build(x, x, x, x)
        assert t.node_count() == total
        assert [len(lv["min_lng"]) for lv in t.levels] == nodes_per_level(n)


def test_build_root_is_union():
    x = quantize([0.0, 5.0, -3.0, 9.5])
    y = quantize([1.0, -2.0, 4.0, 0.0])
    t = PackedRTree.build(x, y, x, y)
    rb = t.root_bounds()
    assert rb.as_tuple() == (int(x.min()), int(y.min()), int(x.max()), int(y.max()))


def test_query_matches_bruteforce():
    rng = np.random.default_rng(7)
    n = 1000
    lng = quantize(rng.uniform(-180, 180, n))
    lat = quantize(rng.uniform(-85, 85, n))
    t = PackedRTree.build(lng, lat, lng, lat)
    for qi in range(20):
        r = np.sort(rng.uniform(-180, 180, 2))
        s = np.sort(rng.uniform(-85, 85, 2))
        q = Bounds.from_degrees(r[0], s[0], r[1], s[1])
        got = set(t.query_bbox(q).tolist())
        want = set(
            np.nonzero(
                (lng >= q.min_lng) & (lng <= q.max_lng) & (lat >= q.min_lat) & (lat <= q.max_lat)
            )[0].tolist()
        )
        assert got == want, f"query {qi}: {len(got)} vs {len(want)}"


def test_query_preserves_stored_order():
    x = quantize(np.linspace(-10, 10, 300))
    t = PackedRTree.build(x, x, x, x)
    q = Bounds.from_degrees(-20, -20, 20, 20)
    pos = t.query_bbox(q)
    assert list(pos) == sorted(pos)


def test_serialization_roundtrip(tmp_path):
    x = quantize(np.linspace(-50, 50, 257))
    t = PackedRTree.build(x, x, x, x)
    p = str(tmp_path / "t.npz")
    t.save(p)
    t2 = PackedRTree.load(p)
    assert t2.node_count() == t.node_count()
    q = Bounds.from_degrees(0, 0, 10, 10)
    assert np.array_equal(t.query_bbox(q), t2.query_bbox(q))


def test_empty_tree():
    t = PackedRTree.build(
        np.array([], np.int32), np.array([], np.int32), np.array([], np.int32), np.array([], np.int32)
    )
    # reference returns no levels for an empty tree (mod.rs:75-77);
    # our build yields a single empty leaf level — queries return nothing
    assert len(t.query_bbox(Bounds.from_degrees(-180, -85, 180, 85))) == 0
