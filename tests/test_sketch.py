"""Sketch operators (stages/sketch.py): exact-quantile histogram
semantics and the HyperLogLog error bound / merge laws."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geomedea_ray.stages.sketch import (
    HLL_P,
    _hll_registers,
    exact_quantiles,
    hll_distinct,
    hll_estimate,
)


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


class TestExactQuantiles:
    def test_matches_sorted_reference(self, ray_session):
        rng = np.random.default_rng(11)
        n = 20000
        t = pa.table({
            "g": pa.array(rng.integers(0, 5, n), pa.int64()),
            "v": pa.array(rng.poisson(40, n), pa.int64()),
        })
        out = exact_quantiles(_ds(t).repartition(9), "g", "v").to_pandas().set_index("g")
        df = t.to_pandas()
        for g, grp in df.groupby("g"):
            v = np.sort(grp["v"].to_numpy())
            assert out.loc[g, "n"] == len(v)
            for q in (0.25, 0.5, 0.75, 0.99):
                assert out.loc[g, f"p{int(q*100)}"] == v[int(np.ceil(q * len(v))) - 1]

    def test_single_value_group(self, ray_session):
        t = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                      "v": pa.array([7, 7, 7], pa.int64())})
        out = exact_quantiles(_ds(t), "g", "v").to_pandas()
        assert out.iloc[0][["p25", "p50", "p75", "p99"]].tolist() == [7, 7, 7, 7]


class TestHll:
    def test_error_bound_at_p12(self):
        """±5 standard errors (σ ≈ 1.04/√m ≈ 1.6%) over several true
        cardinalities, including the linear-counting range."""
        rng = np.random.default_rng(7)
        for true_n in (50, 500, 5000, 200_000):
            vals = pd.Series(rng.integers(0, 2**62, true_n * 3, dtype=np.int64)).drop_duplicates()
            true = len(vals)
            est = hll_estimate(_hll_registers(vals, HLL_P))
            assert abs(est - true) / true < 5 * 1.04 / np.sqrt(1 << HLL_P), (true, est)

    def test_merge_equals_single_pass(self):
        """Register max-merge law: union of halves == whole."""
        rng = np.random.default_rng(3)
        a = pd.Series(rng.integers(0, 10**9, 5000))
        b = pd.Series(rng.integers(0, 10**9, 5000))
        merged = np.maximum(_hll_registers(a, HLL_P), _hll_registers(b, HLL_P))
        whole = _hll_registers(pd.concat([a, b], ignore_index=True), HLL_P)
        assert np.array_equal(merged, whole)

    def test_distributed_matches_exact_within_bound(self, ray_session):
        rng = np.random.default_rng(5)
        n = 30000
        t = pa.table({
            "g": pa.array(rng.integers(0, 3, n), pa.int64()),
            "u": pa.array(rng.integers(0, 4000, n), pa.int64()),
        })
        out = hll_distinct(_ds(t).repartition(11), "g", "u").to_pandas().set_index("g")
        df = t.to_pandas()
        for g, grp in df.groupby("g"):
            true = grp["u"].nunique()
            est = int(out.loc[g, "n_distinct_hll"])
            assert abs(est - true) / true < 5 * 1.04 / np.sqrt(1 << HLL_P)

    def test_deterministic_across_partitionings(self, ray_session):
        rng = np.random.default_rng(9)
        t = pa.table({"g": pa.array(rng.integers(0, 2, 8000), pa.int64()),
                      "u": pa.array(rng.integers(0, 999, 8000), pa.int64())})
        a = hll_distinct(_ds(t), "g", "u").to_pandas().sort_values("g").reset_index(drop=True)
        b = hll_distinct(_ds(t).repartition(17), "g", "u").to_pandas().sort_values("g").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestHeavyHitters:
    def test_exact_vs_value_counts(self, ray_session):
        import ray.data

        from geomedea_ray.stages.sketch import heavy_hitters

        rng = np.random.default_rng(7)
        # zipf-ish skew: a few hot items + a long tail
        vals = np.concatenate([
            np.repeat([f"hot{i}" for i in range(5)], [400, 300, 200, 120, 80]),
            np.array([f"tail{i}" for i in rng.integers(0, 2000, 3000)]),
        ])
        rng.shuffle(vals)
        df = pd.DataFrame({"v": vals})
        ds = ray.data.from_pandas(df).repartition(7)
        out = heavy_hitters(ds, "v", num=1, den=100)
        vc = df["v"].value_counts()
        expect = vc[100 * vc >= len(df)].sort_index()
        assert list(out["v"]) == list(expect.index)
        assert list(out["n"]) == list(expect.to_numpy())

    def test_partition_invariant(self, ray_session):
        import ray.data

        from geomedea_ray.stages.sketch import heavy_hitters

        df = pd.DataFrame({"v": [f"x{i % 13}" for i in range(997)]})
        a = heavy_hitters(ray.data.from_pandas(df).repartition(2), "v", 1, 20)
        b = heavy_hitters(ray.data.from_pandas(df).repartition(11), "v", 1, 20)
        pd.testing.assert_frame_equal(a, b)


class TestQuantileSelect:
    def test_exact_vs_sort(self, ray_session):
        import ray.data

        from geomedea_ray.stages.sketch import quantile_select

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 8000),
            "v": rng.lognormal(2, 2, 8000) * np.sign(rng.standard_normal(8000)),
        })
        # inject duplicates and exact zeros (bucket-boundary cases)
        df.loc[:500, "v"] = 7.25
        df.loc[600:700, "v"] = 0.0
        out = quantile_select(ray.data.from_pandas(df).repartition(7), "g", "v")
        for _, row in out.iterrows():
            vals = np.sort(df[df["g"] == row["g"]]["v"].to_numpy())
            assert row["n"] == len(vals)
            for q in (0.25, 0.5, 0.75, 0.99):
                rank = int(np.ceil(q * len(vals)))
                assert vals[rank - 1] == row[f"p{int(q*100)}"]

    def test_nan_excluded(self, ray_session):
        import ray.data

        from geomedea_ray.stages.sketch import quantile_select

        df = pd.DataFrame({"g": ["a"] * 10, "v": [1.0] * 5 + [float("nan")] * 5})
        out = quantile_select(ray.data.from_pandas(df), "g", "v", levels=(0.5,))
        assert int(out["n"].iloc[0]) == 5 and out["p50"].iloc[0] == 1.0


class TestCountMin:
    def test_never_underestimates_and_bound(self, ray_session):
        import ray.data

        from geomedea_ray.stages.sketch import cms_build

        rng = np.random.default_rng(13)
        # zipf-ish: value v appears ~20000/(v+1) times
        vals = np.repeat(np.arange(200), (20000 / (np.arange(200) + 1)).astype(int))
        rng.shuffle(vals)
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
        cms = cms_build(ds, "v", width=2048, depth=4)
        import pandas as pd

        truth = pd.Series(vals).value_counts()
        q = truth.index.to_numpy()[:50]
        est = cms.estimate(q)
        true = truth.to_numpy()[:50]
        assert (est >= true).all()  # CMS never underestimates
        # standard bound: overshoot ≤ e/width · N (whp); allow 3 misses
        bound = np.ceil(np.e / 2048 * len(vals))
        assert ((est - true) <= bound).sum() >= 47


class TestKLL:
    def test_rank_error_bound_and_determinism(self):
        from geomedea_ray.stages.sketch import KLLSketch

        rng = np.random.default_rng(13)
        data = np.concatenate([rng.normal(100, 15, 120_000),
                               rng.exponential(50, 80_000)])
        sk1 = KLLSketch().add(data)
        sk2 = KLLSketch().add(data)
        assert sk1.to_bytes() == sk2.to_bytes()  # deterministic
        qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        est = sk1.quantiles(qs)
        sd = np.sort(data)
        for q, e in zip(qs, est):
            # rank of the estimate vs the requested rank
            r = np.searchsorted(sd, e) / len(sd)
            assert abs(r - q) < 0.015, (q, r)

    def test_merge_equals_whole_within_bound(self):
        from geomedea_ray.stages.sketch import KLLSketch

        rng = np.random.default_rng(21)
        data = rng.uniform(0, 1000, 150_000)
        halves = KLLSketch().add(data[:70_000]).merge(
            KLLSketch().add(data[70_000:]))
        qs = [0.1, 0.5, 0.9]
        est = halves.quantiles(qs)
        sd = np.sort(data)
        for q, e in zip(qs, est):
            r = np.searchsorted(sd, e) / len(sd)
            assert abs(r - q) < 0.02, (q, r)
        # state stays ~k log(n/k) floats, not O(n)
        assert sum(len(lv) for lv in halves.levels) < 4000

    def test_bytes_roundtrip(self):
        from geomedea_ray.stages.sketch import KLLSketch

        rng = np.random.default_rng(3)
        sk = KLLSketch().add(rng.normal(size=50_000))
        rt = KLLSketch.from_bytes(sk.to_bytes())
        assert all(np.array_equal(a, b)
                   for a, b in zip(sk.levels, rt.levels))
        assert sk.flips == rt.flips

    def test_distributed_matches_driver_order_invariance(self, ray_session):
        import ray.data

        from geomedea_ray.stages.sketch import kll_quantiles

        rng = np.random.default_rng(8)
        df = pd.DataFrame({"v": rng.normal(0, 1, 40_000)})
        a = kll_quantiles(ray.data.from_pandas(df).repartition(4),
                          "v", [0.5]).to_pandas()
        b = kll_quantiles(ray.data.from_pandas(df).repartition(4),
                          "v", [0.5]).to_pandas()
        assert a.equals(b)  # deterministic across runs
        assert abs(float(a["q50"].iloc[0])) < 0.05  # near true median 0
