"""Cell compaction (stages/cells.py) vs a brute-force set oracle."""

import numpy as np
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
