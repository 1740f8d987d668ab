"""rollup_aggregate (stages/rollup.py) vs pandas brute force."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from geomedea_ray.stages.rollup import ALL_TOKEN, rollup_aggregate


def _expected(df, keys, sums, count_col="n"):
    levels = []
    for lvl in range(len(keys), -1, -1):
        p = df.copy()
        for k in keys[lvl:]:
            p[k] = ALL_TOKEN
        g = p.groupby(keys, as_index=False).agg(
            **{count_col: (keys[0], "size")},
            **{out: (src, "sum") for src, out in sums.items()},
        )
        levels.append(g)
    return pd.concat(levels, ignore_index=True)


def test_rollup_matches_bruteforce_across_blocks(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice([f"s{i}" for i in range(7)], 500),
        "v": rng.integers(0, 1000, 500),
    })
    # many small blocks: level partials must merge ACROSS blocks
    ds = ray.data.from_pandas(df).repartition(13)
    got = (rollup_aggregate(ds, ["a", "b"], sums={"v": "sum_v"})
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    exp = (_expected(df, ["a", "b"], {"v": "sum_v"})
           .sort_values(["a", "b"]).reset_index(drop=True)[got.columns])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # grand total present exactly once
    gt = got[(got["a"] == ALL_TOKEN) & (got["b"] == ALL_TOKEN)]
    assert len(gt) == 1 and int(gt["n"].iloc[0]) == 500


def test_rollup_count_only(ray_session):
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"]})
    got = rollup_aggregate(ray.data.from_pandas(df), ["a", "b"],
                           sums={}).to_pandas()
    assert int(got[(got["a"] == ALL_TOKEN)]["n"].sum()) == 3
    assert len(got) == 3 + 2 + 1


def test_cube_vs_pandas(ray_session):
    from geomedea_ray.stages.rollup import cube_aggregate

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 300),
        "b": rng.choice(["p", "q"], 300),
        "v": rng.integers(0, 100, 300),
    })
    got = (cube_aggregate(ray.data.from_pandas(df).repartition(7),
                          ["a", "b"], sums={"v": "sum_v"})
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # expected: four grouping sets
    parts = []
    for keys in [["a", "b"], ["a"], ["b"], []]:
        if keys:
            g = df.groupby(keys).agg(n=("v", "size"), sum_v=("v", "sum")).reset_index()
        else:
            g = pd.DataFrame({"n": [len(df)], "sum_v": [df["v"].sum()]})
        for k in ["a", "b"]:
            if k not in keys:
                g[k] = ALL_TOKEN
        parts.append(g[["a", "b", "n", "sum_v"]])
    exp = (pd.concat(parts, ignore_index=True)
           .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # per-b margin exists (the set ROLLUP lacks)
    assert ((got["a"] == ALL_TOKEN) & (got["b"] != ALL_TOKEN)).any()


class TestPivot:
    def test_pivot_counts_and_sums(self, ray_session):
        import ray.data

        from geomedea_ray.stages.pivot import pivot_counts

        df = pd.DataFrame({
            "g": ["a", "a", "b", "b", "b", "c"],
            "p": ["x", "y", "x", "x", "z", "q"],  # 'q' not in values → dropped
            "v": [1, 2, 3, 4, 5, 6],
        })
        out = pivot_counts(
            ray.data.from_pandas(df).repartition(3), "g", "p",
            values=["x", "y", "z"], sum_col="v",
        ).to_pandas().sort_values("g").reset_index(drop=True)
        assert out["n_x"].tolist() == [1, 2, 0]
        assert out["n_y"].tolist() == [1, 0, 0]
        assert out["n_z"].tolist() == [0, 1, 0]
        assert out["sum_v_x"].tolist() == [1, 7, 0]
        assert out["sum_v_z"].tolist() == [0, 5, 0]
        assert out["g"].tolist() == ["a", "b", "c"]  # 'c' kept (all cells 0)

    def test_pivot_discovers_values(self, ray_session):
        import ray.data

        from geomedea_ray.stages.pivot import pivot_counts

        df = pd.DataFrame({"g": [1, 1, 2], "p": ["m", "n", "m"]})
        out = pivot_counts(ray.data.from_pandas(df), "g", "p").to_pandas()
        assert sorted(c for c in out.columns if c != "g") == ["n_m", "n_n"]


class TestProfile:
    def test_profile_with_nulls(self, ray_session):
        import ray.data

        from geomedea_ray.stages.profile import profile_table

        df = pd.DataFrame({
            "x": [1.5, None, 3.0, -2.0],
            "c": ["a", "b", None, "a"],
        })
        out = (profile_table(ray.data.from_pandas(df).repartition(2),
                             ["x"], ["c"])
               .to_pandas().set_index(["column", "metric"])["value"])
        assert out[("x", "count")] == 4 and out[("x", "nulls")] == 1
        assert out[("x", "min")] == -2.0 and out[("x", "max")] == 3.0
        assert out[("c", "count")] == 4 and out[("c", "nulls")] == 1
        assert out[("c", "distinct")] == 2
