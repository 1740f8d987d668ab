"""connected_components (stages/graph.py) vs a brute-force union-find."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from geomedea_ray.stages.graph import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


#: driver_finish_bytes=0 forces the distributed star rounds; the
#: default takes the driver union-find tail on these tiny edge sets —
#: every test runs BOTH paths
BOTH_PATHS = pytest.mark.parametrize("dfb", [0, None],
                                     ids=["distributed", "driver"])


def _run(edges, dfb=None, **kw):
    if dfb is not None:
        kw["driver_finish_bytes"] = dfb
    df = pd.DataFrame(edges, columns=["a", "b"], dtype=np.int64)
    out = connected_components(ray.data.from_pandas(df), "a", "b", **kw).to_pandas()
    assert out["node"].is_unique
    return dict(zip(out["node"], out["component"]))


@BOTH_PATHS
def test_chain_and_star(ray_session, dfb):
    # chain 0-1-2-3-4 plus star 10-{11,12,13}; isolated pair (20,21)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)]
    assert _run(edges, dfb) == _uf_components(edges)


@BOTH_PATHS
def test_self_loops_and_duplicates(ray_session, dfb):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _run(edges, dfb)
    # self-loop-only nodes carry no merge decision and are dropped
    assert got == {1: 1, 2: 1}


@BOTH_PATHS
def test_long_path_converges_logarithmically(ray_session, dfb):
    # path of 200 nodes: label propagation would need ~200 rounds;
    # large/small-star (and the driver pointer-jumping tail) must
    # finish within MAX_ROUNDS (40) / O(log n) numpy passes
    edges = [(i, i + 1) for i in range(200)]
    got = _run(edges, dfb)
    assert set(got.values()) == {0}
    assert len(got) == 201


@BOTH_PATHS
def test_random_graph_matches_union_find(ray_session, dfb):
    rng = np.random.default_rng(42)
    a = rng.integers(0, 400, 600)
    b = rng.integers(0, 400, 600)
    edges = list(zip(a.tolist(), b.tolist()))
    assert _run(edges, dfb, num_shards=4) == _uf_components(edges)


def test_both_paths_agree(ray_session):
    rng = np.random.default_rng(7)
    edges = list(zip(rng.integers(0, 300, 500).tolist(),
                     rng.integers(0, 300, 500).tolist()))
    assert _run(edges, 0) == _run(edges, None)


def test_id_range_guard(ray_session):
    with pytest.raises(Exception):  # ValueError surfaced through Ray
        _run([(1, 1 << 33)])


class TestPageRankExact:
    def test_matches_scalar_reference(self, ray_session):
        import ray.data

        from geomedea_ray.stages.graph import pagerank_exact

        edges = pd.DataFrame({"src": [0, 1, 2, 2, 3], "dst": [1, 2, 0, 1, 0]})
        nodes = pd.DataFrame({"node": [0, 1, 2, 3]})
        out = (pagerank_exact(ray.data.from_pandas(edges).repartition(2),
                              ray.data.from_pandas(nodes), iters=3)
               .to_pandas().sort_values("node").reset_index(drop=True))

        # independent scalar reference: same integer semantics
        scale, base = 10**9, 3 * 10**9 // 20
        deg = edges.groupby("src").size().to_dict()
        rank = {v: scale for v in nodes["node"]}
        for _ in range(3):
            s = {v: 0 for v in nodes["node"]}
            for _, e in edges.iterrows():
                s[e["dst"]] += rank[e["src"]] // deg[e["src"]]
            rank = {v: base + (17 * s[v]) // 20 for v in nodes["node"]}
        assert out["rank"].tolist() == [rank[v] for v in out["node"]]
        # sink-free graph conserves mass only approximately under
        # floor; sanity: ranks positive and not uniform
        assert (out["rank"] > 0).all() and out["rank"].nunique() > 1

    def test_no_inedge_node_gets_base(self, ray_session):
        import ray.data

        from geomedea_ray.stages.graph import pagerank_exact

        edges = pd.DataFrame({"src": [9], "dst": [1]})
        nodes = pd.DataFrame({"node": [1, 9]})
        out = (pagerank_exact(ray.data.from_pandas(edges),
                              ray.data.from_pandas(nodes), iters=1)
               .to_pandas().set_index("node")["rank"])
        assert out[9] == 3 * 10**9 // 20      # no in-edges → base
        assert out[1] == 3 * 10**9 // 20 + (17 * 10**9) // 20


def test_pagerank_groupby_branch_matches_tree(ray_session, monkeypatch):
    # force the large-domain (Ray groupby) branch and assert it gives
    # the identical ranks the TREE branch gives on the same graph
    import ray.data

    from geomedea_ray.stages import graph as G

    edges = pd.DataFrame({"src": [0, 1, 2, 2, 3, 4],
                          "dst": [1, 2, 0, 1, 0, 2]})
    nodes = pd.DataFrame({"node": [0, 1, 2, 3, 4]})

    def run():
        return (G.pagerank_exact(ray.data.from_pandas(edges).repartition(2),
                                 ray.data.from_pandas(nodes), iters=2)
                .to_pandas().sort_values("node")["rank"].tolist())

    tree = run()
    monkeypatch.setattr(G, "TREE_MAX_NODES", 0)
    grouped = run()
    assert tree == grouped


def test_coalesce_width_grows_with_bytes(ray_session):
    # round-3 verdict: the pre-exchange coalesce width must scale with
    # the measured edge-set size, not sit at a constant 8
    from geomedea_ray.util import COALESCE_TARGET_BYTES, coalesce_width

    small = coalesce_width(1 << 20)            # 1 MB of partials
    big = coalesce_width(256 * COALESCE_TARGET_BYTES)
    assert small <= 16                          # kilobyte regime stays tight
    assert big >= 256                           # one block per ~32 MB
    assert coalesce_width(None) == small        # unknown size = cpu floor


class TestTriangleList:
    def test_matches_bruteforce(self, ray_session):
        import itertools

        import ray.data

        from geomedea_ray.stages.graph import triangle_list

        rng = np.random.default_rng(7)
        n = 60
        edges = set()
        while len(edges) < 220:
            a, b = rng.integers(0, n, 2)
            if a != b:
                edges.add((min(int(a), int(b)), max(int(a), int(b))))
        df = pd.DataFrame(sorted(edges), columns=["id_a", "id_b"])
        out = triangle_list(ray.data.from_pandas(df).repartition(3),
                            "id_a", "id_b", num_shards=5).to_pandas()
        got = set(map(tuple, out[["ta", "tb", "tc"]].to_numpy()))
        assert len(got) == len(out), "triangle produced more than once"
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {
            (a, b, c)
            for a, b, c in itertools.combinations(range(n), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        }
        assert got == want and len(want) > 50

    def test_hub_star_has_no_triangles_and_no_blowup(self, ray_session):
        import ray.data

        from geomedea_ray.stages.graph import triangle_list

        # a 1000-spoke star: the naive u-joins-u wedge generator would
        # emit ~500k wedges from the hub; degree orientation points
        # every edge INTO the hub, so out-degrees are 1 and wedge count
        # is 0 — the output must be empty and fast
        hub = pd.DataFrame({"id_a": np.zeros(1000, np.int64),
                            "id_b": np.arange(1, 1001)})
        out = triangle_list(ray.data.from_pandas(hub).repartition(2),
                            "id_a", "id_b", num_shards=4).to_pandas()
        assert len(out) == 0

    def test_triangle_plus_pendant(self, ray_session):
        import ray.data

        from geomedea_ray.stages.graph import triangle_list

        df = pd.DataFrame({"id_a": [1, 1, 2, 3],
                           "id_b": [2, 3, 3, 4]})
        out = triangle_list(ray.data.from_pandas(df), "id_a",
                            "id_b").to_pandas()
        assert sorted(map(tuple, out[["ta", "tb", "tc"]].to_numpy())) \
            == [(1, 2, 3)]
