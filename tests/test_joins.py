"""Join-family operators (stages/joins.py): edge cases a SQL-oracle
run at sf0.01 may not hit — empty sides, keys on one side only, exact
window boundaries, tie-breaking, sample determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geomedea_ray.stages.joins import (
    asof_join,
    range_join_pairs,
    sample_fraction,
    top_k_per_group,
)


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


class TestAsofJoin:
    def test_basic_and_no_match(self, ray_session):
        left = pa.table({"id": [1, 2, 3], "k": [10, 10, 99], "t": [5, 15, 5]})
        right = pa.table({"id": [7, 8], "k": [10, 10], "t": [4, 10], "v": [0.5, 0.9]})
        out = (
            asof_join(_ds(left), _ds(right), on="t", by="k", right_cols=["id", "v"])
            .to_pandas()
            .sort_values("id")
        )
        # id=1 (t=5) → right t=4; id=2 (t=15) → right t=10; id=3: key 99 has no right
        assert out["id"].tolist() == [1, 2]
        assert out["id_r"].tolist() == [7, 8]
        assert out["v_r"].tolist() == [0.5, 0.9]

    def test_equal_timestamps_match(self, ray_session):
        left = pa.table({"id": [1], "k": [1], "t": [10]})
        right = pa.table({"id": [2], "k": [1], "t": [10], "v": [1.0]})
        out = asof_join(_ds(left), _ds(right), on="t", by="k", right_cols=["id"]).to_pandas()
        assert len(out) == 1 and out["id_r"][0] == 2  # <= is inclusive

    def test_empty_right(self, ray_session):
        left = pa.table({"id": [1], "k": [1], "t": [10]})
        right = pa.table({"id": pa.array([], pa.int64()), "k": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
        out = asof_join(_ds(left), _ds(right), on="t", by="k", right_cols=["id"]).to_pandas()
        assert len(out) == 0


#: broadcast_bytes=0 pins the co-shuffle plan; the default takes the
#: adaptive broadcast path on these tiny right sides — run BOTH plans
JOIN_PLANS = pytest.mark.parametrize("bb", [{"broadcast_bytes": 0}, {}],
                                     ids=["shuffle", "broadcast"])


class TestHashJoin:
    def _join(self, left, right, **kw):
        from geomedea_ray.stages.joins import hash_join

        return hash_join(_ds(left), _ds(right), **kw).to_pandas()

    @JOIN_PLANS
    def test_many_to_many_and_unmatched(self, ray_session, bb):
        left = pa.table({"k": [1, 1, 2, 3], "lv": [10, 11, 20, 30]})
        right = pa.table({"rk": [1, 1, 2, 9], "rv": ["a", "b", "c", "z"]})
        out = self._join(left, right, left_on="k", right_on="rk",
                         right_cols=["rv"], **bb).sort_values(["lv", "rv"])
        # k=1 → 2×2 pairs, k=2 → 1, k=3 and rk=9 drop (inner)
        assert list(zip(out["lv"].astype(int), out["rv"])) == [
            (10, "a"), (10, "b"), (11, "a"), (11, "b"), (20, "c")
        ]

    @JOIN_PLANS
    def test_string_keys_and_empty_right(self, ray_session, bb):
        left = pa.table({"k": ["x", "y"], "lv": [1, 2]})
        right = pa.table({"k": ["y"], "rv": [9]})
        out = self._join(left, right, left_on="k", right_on="k",
                         right_cols=["rv"], **bb)
        assert out["k"].tolist() == ["y"] and int(out["rv"].iloc[0]) == 9
        empty = pa.table({"k": pa.array([], pa.string()), "rv": pa.array([], pa.int64())})
        assert len(self._join(left, empty, left_on="k", right_on="k",
                              right_cols=["rv"], **bb)) == 0

    def test_broadcast_preserves_int_dtypes(self, ray_session):
        # the shuffle plan's union nulls integer payloads to float64;
        # the broadcast plan must NOT (no schema unification)
        left = pa.table({"k": [1, 2], "lv": [10, 20]})
        right = pa.table({"k": [1, 2], "rv": [7, 8]})
        out = self._join(left, right, left_on="k", right_on="k",
                         right_cols=["rv"])
        assert out["rv"].dtype.kind == "i" and out["lv"].dtype.kind == "i"

    def test_key_dtype_survives_shuffle(self, ray_session):
        # the _key rename keeps the join key null-free through the
        # union, so int64 keys must not float-promote
        left = pa.table({"k": [2**40 + 1], "lv": [1]})
        right = pa.table({"rk": [2**40 + 1], "rv": [7]})
        out = self._join(left, right, left_on="k", right_on="rk", right_cols=["rv"])
        assert out["k"].tolist() == [2**40 + 1]

    def test_bloom_prefilter_same_answer(self, ray_session):
        # bloom=True must not change the inner-join result (false
        # positives ride through to the merge and drop there)
        rng = np.random.default_rng(7)
        lk = rng.integers(0, 5000, 4000)
        left = pa.table({"k": lk, "lv": np.arange(4000)})
        rk = np.arange(0, 5000, 10)  # 10% of key space joins
        right = pa.table({"rk": rk, "rv": rk * 2})
        kw = dict(left_on="k", right_on="rk", right_cols=["rv"])
        plain = self._join(left, right, broadcast_bytes=0, **kw)
        bloomed = self._join(left, right, broadcast_bytes=0, bloom=True, **kw)
        key = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            plain.sort_values(key).reset_index(drop=True)[key].astype("int64"),
            bloomed.sort_values(key).reset_index(drop=True)[key].astype("int64"),
        )

    @pytest.mark.parametrize("skw", [dict(skew_den=4), dict(skew_hot_keys=[0])],
                             ids=["detected", "explicit"])
    def test_skew_fragment_replicate_same_answer(self, ray_session, skw):
        # 60% of probe rows on key 0; hot right key is many-to-many
        # (2 rows) so each hot pair must appear exactly once despite
        # replication
        rng = np.random.default_rng(3)
        lk = np.where(rng.random(3000) < 0.6, 0, rng.integers(1, 50, 3000))
        left = pa.table({"k": lk, "lv": np.arange(3000)})
        right = pa.table({"rk": np.r_[0, np.arange(0, 50)],
                          "rv": np.r_[999, np.arange(0, 50) * 2]})
        kw = dict(left_on="k", right_on="rk", right_cols=["rv"],
                  broadcast_bytes=0, num_shards=6)
        plain = self._join(left, right, **kw)
        skewed = self._join(left, right, **skw, **kw)
        key = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            plain.sort_values(key).reset_index(drop=True)[key].astype("int64"),
            skewed.sort_values(key).reset_index(drop=True)[key].astype("int64"),
        )

    def test_outer_keeps_both_unmatched_sides(self, ray_session):
        left = pa.table({"k": [1, 1, 2, 5], "lv": [10, 11, 20, 50]})
        right = pa.table({"rk": [1, 2, 9], "rv": [100, 200, 900]})
        out = self._join(left, right, left_on="k", right_on="rk",
                         right_cols=["rv"], how="outer",
                         left_cols=["lv"])
        got = sorted(
            (int(k), -1 if pd.isna(lv) else int(lv),
             -1 if pd.isna(rv) else int(rv))
            for k, lv, rv in zip(out["k"], out["lv"], out["rv"])
        )
        # k=1 matches twice, k=2 once, k=5 left-only, rk=9 right-only
        assert got == [(1, 10, 100), (1, 11, 100), (2, 20, 200),
                       (5, 50, -1), (9, -1, 900)]

    def test_outer_single_side_shards_align_schema(self, ray_session):
        # force many shards so some shards see rows from ONE side only
        # (the per-block schema-unification hazard: reindex must
        # reconstruct missing columns)
        left = pa.table({"k": [1], "lv": [10]})
        right = pa.table({"rk": np.arange(100, 160), "rv": np.arange(60)})
        out = self._join(left, right, left_on="k", right_on="rk",
                         right_cols=["rv"], how="outer",
                         left_cols=["lv"], num_shards=8)
        assert len(out) == 61
        assert set(out.columns) == {"k", "lv", "rv"}
        assert out["lv"].notna().sum() == 1

    def test_skew_all_keys_hot_degenerate(self, ray_session):
        # tiny blocks make EVERY key a hot candidate (the MG bound is a
        # superset); full replication must still give the exact join
        left = pa.table({"k": [1, 1, 2, 3], "lv": [10, 11, 20, 30]})
        right = pa.table({"rk": [1, 2], "rv": ["a", "c"]})
        out = self._join(left, right, left_on="k", right_on="rk",
                         right_cols=["rv"], broadcast_bytes=0,
                         num_shards=4, skew_den=2)
        out = out.sort_values(["lv", "rv"])
        assert list(zip(out["lv"].astype(int), out["rv"])) == [
            (10, "a"), (11, "a"), (20, "c")
        ]


class TestBloomFilter:
    def test_membership_and_fpr(self, ray_session):
        from geomedea_ray.stages.bloom import bloom_build

        keys = pd.Series(np.arange(0, 100000, 10))  # 10k members
        bf = bloom_build(_ds(pa.table({"k": keys.to_numpy()})), "k")
        assert bf.contains(keys).all()  # no false negatives, ever
        absent = pd.Series(np.arange(1, 100000, 10))  # disjoint 10k
        fpr = bf.contains(absent).mean()
        assert fpr < 0.01, fpr  # 16 bits/key, k=7 → ~0.04% expected

    def test_int_width_normalization(self, ray_session):
        # int32 probe keys must hash like the int64 build keys
        from geomedea_ray.stages.bloom import bloom_build

        bf = bloom_build(_ds(pa.table({"k": np.array([5, 6], np.int64)})), "k")
        assert bf.contains(pd.Series(np.array([5, 6], np.int32))).all()

    def test_string_keys(self, ray_session):
        from geomedea_ray.stages.bloom import bloom_build

        bf = bloom_build(_ds(pa.table({"k": ["abc", "def"]})), "k")
        assert bf.contains(pd.Series(["abc", "def"])).all()
        assert not bf.contains(pd.Series([f"zz{i}" for i in range(200)])).any()


class TestRangeJoin:
    def test_window_boundaries_inclusive(self, ray_session):
        t = pa.table(
            {
                "id": [1, 2, 3, 4, 5],
                "k": [1, 1, 1, 1, 1],
                "t": [0.0, 10.0, 11.0, 5.0, -1.0],
                "side": ["r", "l", "l", "l", "l"],
            }
        )
        out = range_join_pairs(
            _ds(t), on="t", by="k",
            left_filter=lambda df: df["side"] == "l",
            right_filter=lambda df: df["side"] == "r",
            window=10.0, id_col="id",
        ).to_pandas().sort_values("id_l")
        # left t=10 (gap 10, inclusive) and t=5 (gap 5) match; t=11 gap 11 > 10
        # excluded; t=-1 before right excluded
        assert out["id_l"].tolist() == [2, 4]
        assert out["gap"].tolist() == [10.0, 5.0]


class TestTopKPerGroup:
    def test_rank_and_ties(self, ray_session):
        t = pa.table(
            {
                "k": [1, 1, 1, 2, 2],
                "v": [5.0, 9.0, 9.0, 1.0, 2.0],
                "id": [100, 50, 10, 1, 2],
            }
        )
        out = top_k_per_group(_ds(t), by="k", order_col="v", k=2, tiebreak="id").to_pandas()
        out = out.sort_values(["k", "rank"])
        # group 1: two v=9.0 ties → id 10 before id 50; v=5 cut by k=2
        assert out[out["k"] == 1]["id"].tolist() == [10, 50]
        assert out[out["k"] == 1]["rank"].tolist() == [1, 2]
        assert out[out["k"] == 2]["id"].tolist() == [2, 1]


class TestSampleFraction:
    def test_deterministic_and_partition_invariant(self, ray_session):
        t = pa.table({"pid": pa.array(np.arange(10_000), pa.int64())})
        a = set(sample_fraction(_ds(t), "pid", 0.2).to_pandas()["pid"])
        b = set(sample_fraction(_ds(t).repartition(7), "pid", 0.2).to_pandas()["pid"])
        assert a == b                      # partitioning-invariant
        assert 0.15 < len(a) / 10_000 < 0.25
        # pure function of key: same rows selected in a fresh pass
        c = set(sample_fraction(_ds(t), "pid", 0.2).to_pandas()["pid"])
        assert a == c


class TestPipJoinSharded:
    def test_equals_broadcast_pip(self, ray_session):
        """The shuffle-based PIP fallback must equal the broadcast
        join row-for-row on the polygon fixture set."""
        import pyarrow as pa
        import ray.data

        from geomedea_ray.sources.polygons import polygon_arrays
        from geomedea_ray.stages.pip import pip_join, pip_join_sharded

        rng = np.random.default_rng(51)
        n = 20_000
        tbl = pa.table({
            "pid": pa.array(np.arange(n), pa.int64()),
            "lng": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-84, 84, n),
        })
        polys = polygon_arrays()
        a = pip_join(ray.data.from_arrow(tbl), polys, id_cols=["pid"], exact=True).to_pandas()
        b = pip_join_sharded(ray.data.from_arrow(tbl), polys, id_cols=["pid"],
                             exact=True).to_pandas()
        key = lambda df: set(zip(df["pid"], df["poly_id"]))
        assert key(a) == key(b)
        assert len(a) == len(b)


class TestWatermarkLateFlags:
    def test_hand_built_scenario(self, ray_session):
        """arrival order: t=100, 200, 150(on-time), 90(late), 300,
        140(late) with delay 50."""
        import pyarrow as pa
        import ray.data

        from geomedea_ray.stages.joins import watermark_late_flags

        t = pa.table({"eid": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                      "t": pa.array([100, 200, 150, 90, 300, 140], pa.int64())})
        out = watermark_late_flags(ray.data.from_arrow(t), ts_col="t",
                                   arrival_col="eid", delay="50ns", band=2).to_pandas()
        got = dict(zip(out["eid"], out["is_late"]))
        # watermarks: -, 50, 150, 150, 150, 250 → late iff t < wm
        assert got == {0: False, 1: False, 2: False, 3: True, 4: False, 5: True}

    def test_partitioning_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data

        from geomedea_ray.stages.joins import watermark_late_flags

        rng = np.random.default_rng(77)
        n = 5000
        t = pa.table({"eid": pa.array(np.arange(n), pa.int64()),
                      "t": pa.array(rng.integers(0, 10**9, n), pa.int64())})
        a = watermark_late_flags(ray.data.from_arrow(t), "t", "eid", "1000ns",
                                 band=512).to_pandas().sort_values("eid")
        b = watermark_late_flags(ray.data.from_arrow(t).repartition(13), "t", "eid",
                                 "1000ns", band=97).to_pandas().sort_values("eid")
        assert a["is_late"].tolist() == b["is_late"].tolist()
        assert a["watermark_ts"].tolist() == b["watermark_ts"].tolist()


class TestKnnTieBoundary:
    def test_ties_at_kth_distance_keep_lowest_ids(self, ray_session):
        """Four points equidistant from the query, k=2: the final
        tie-break (dist, id) must yield the two LOWEST ids no matter
        how candidate generation batches the input."""
        import pyarrow as pa
        import ray.data

        from geomedea_ray.stages.knn import knn

        # ids deliberately ordered so naive argpartition could keep the
        # wrong subset; distances exactly equal by symmetry
        t = pa.table({
            "pid": pa.array([40, 10, 30, 20, 99], pa.int64()),
            "lng": [1.0, -1.0, 0.0, 0.0, 50.0],
            "lat": [0.0, 0.0, 1.0, -1.0, 50.0],
        })
        for nblocks in (1, 5):
            ds = ray.data.from_arrow(t)
            if nblocks > 1:
                ds = ds.repartition(nblocks)
            out = knn(ds, [(0, 0.0, 0.0)], 2, id_col="pid").to_pandas().sort_values("rank")
            assert out["pid"].tolist() == [10, 20], f"nblocks={nblocks}"


class TestSemiAntiJoin:
    def test_semi_and_anti_partition(self, ray_session):
        """semi ∪ anti = input; semi ∩ anti = ∅; membership exact."""
        from geomedea_ray.stages.joins import distinct_keys, semi_anti_filter

        fact = pa.table({"k": pa.array([2, 2, 5, 7, 7, 7], pa.int64())})
        dim = pa.table({"k": pa.array([1, 2, 3, 5, 6, 7, 8], pa.int64()),
                        "v": ["a", "b", "c", "d", "e", "f", "g"]})
        keys = distinct_keys(_ds(fact), "k")
        assert keys.tolist() == [2, 5, 7]
        semi = semi_anti_filter(_ds(dim), "k", keys).to_pandas()
        anti = semi_anti_filter(_ds(dim), "k", keys, anti=True).to_pandas()
        assert sorted(semi["k"]) == [2, 5, 7]
        assert sorted(anti["k"]) == [1, 3, 6, 8]

    def test_empty_key_set_and_strings(self, ray_session):
        from geomedea_ray.stages.joins import semi_anti_filter

        dim = pa.table({"k": ["x", "y"], "v": [1, 2]})
        semi = semi_anti_filter(_ds(dim), "k", np.array([], dtype=object)).to_pandas()
        anti = semi_anti_filter(_ds(dim), "k", np.array([], dtype=object), anti=True).to_pandas()
        assert len(semi) == 0
        assert sorted(anti["k"]) == ["x", "y"]
        named = semi_anti_filter(_ds(dim), "k", np.array(["y", "z"], dtype=object)).to_pandas()
        assert named["k"].tolist() == ["y"]


class TestCumulativeSum:
    def test_running_total_matches_pandas(self, ray_session):
        from geomedea_ray.stages.joins import cumulative_sum

        rng = np.random.default_rng(3)
        n = 4000
        t = pa.table({
            "id": pa.array(np.arange(n), pa.int64()),
            "u": pa.array(rng.integers(0, 37, n), pa.int64()),
            "t": pa.array(rng.integers(0, 500, n), pa.int64()),
            "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
        })
        out = cumulative_sum(_ds(t).repartition(7), by="u", on="t",
                             val_col="v", id_col="id", out_col="c").to_pandas()
        ref = (
            t.to_pandas().sort_values(["u", "t", "id"], kind="mergesort")
            .assign(c=lambda d: d.groupby("u", sort=False)["v"].cumsum())
        )
        merged = out.set_index("id")["c"].sort_index()
        expect = ref.set_index("id")["c"].sort_index()
        assert merged.equals(expect)

    def test_tie_order_by_id(self, ray_session):
        from geomedea_ray.stages.joins import cumulative_sum

        t = pa.table({"id": pa.array([2, 1], pa.int64()),
                      "u": pa.array([0, 0], pa.int64()),
                      "t": pa.array([5, 5], pa.int64()),
                      "v": pa.array([10, 1], pa.int64())})
        out = cumulative_sum(_ds(t), by="u", on="t", val_col="v",
                             id_col="id", out_col="c").to_pandas().set_index("id")["c"]
        assert out[1] == 1 and out[2] == 11


class TestStratifiedSample:
    def test_per_stratum_rate_and_determinism(self, ray_session):
        from geomedea_ray.stages.joins import SAMPLE_MULT, sample_stratified

        rng = np.random.default_rng(21)
        n = 30000
        strata = np.array(["a", "b", "c"], dtype=object)[rng.integers(0, 3, n)]
        t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                      "s": pa.array(strata, pa.string())})
        fr = {"a": 0.1, "b": 1.0}
        out = sample_stratified(_ds(t).repartition(5), "s", "id", fr,
                                default_fraction=0.0).to_pandas()
        # exact membership: hash predicate per row
        h = (np.arange(n).astype(np.uint64) * np.uint64(SAMPLE_MULT)) % np.uint64(1 << 32)
        lim = np.where(strata == "a", int(0.1 * (1 << 32)),
                       np.where(strata == "b", 1 << 32, 0)).astype(np.uint64)
        expect = np.flatnonzero(h < lim)
        assert sorted(out["id"]) == expect.tolist()
        # stratum c fully dropped, b fully kept
        assert set(out["s"]) == {"a", "b"}
        assert (out["s"] == "b").sum() == (strata == "b").sum()


class TestIntervalJoin:
    def test_stabbing_kernel_overlaps_and_bounds(self):
        from geomedea_ray.stages.joins import _interval_candidates

        # intervals (sorted by start): [0,10) [5,15) [20,25)
        s = np.array([0, 5, 20], np.int64)
        e = np.array([10, 15, 25], np.int64)
        p = np.array([0, 5, 9, 10, 14, 19, 20, 24, 25, -1], np.int64)
        rep, cand = _interval_candidates(p, s, e)
        got = {}
        for r, c in zip(rep, cand):
            got.setdefault(int(p[r]), set()).add(int(c))
        # half-open [s, e): start included, end excluded
        assert got[0] == {0}
        assert got[5] == {0, 1}          # overlap region → both
        assert got[9] == {0, 1}
        assert got[10] == {1}            # end of [0,10) excluded
        assert got[14] == {1}
        assert 19 not in got             # gap
        assert got[20] == {2} and got[24] == {2}
        assert 25 not in got and -1 not in got

    def test_join_replicates_rows_and_maps_ids(self, ray_session):
        from geomedea_ray.stages.joins import interval_join_broadcast

        # caller order NOT sorted by start — ids must map back
        starts = np.array([50, 0], np.int64)
        ends = np.array([60, 10], np.int64)
        t = pa.table({"x": pa.array([5, 55, 100], pa.int64()),
                      "tag": pa.array(["a", "b", "c"])})
        out = interval_join_broadcast(_ds(t), starts, ends, "x").to_pandas()
        assert sorted(zip(out["tag"], out["interval_id"])) == [("a", 1), ("b", 0)]

    def test_aggregate_matches_bruteforce(self, ray_session):
        from geomedea_ray.stages.joins import interval_aggregate_broadcast

        rng = np.random.default_rng(7)
        p = rng.integers(0, 1000, 5000)
        v = rng.integers(1, 9, 5000)
        starts = np.arange(0, 1000, 37, dtype=np.int64)
        ends = starts + 50
        t = pa.table({"x": pa.array(p, pa.int64()), "v": pa.array(v, pa.int64())})
        out = (interval_aggregate_broadcast(_ds(t).repartition(4), starts, ends,
                                            "x", value_col="v")
               .to_pandas().set_index("interval_id"))
        for i, (s0, e0) in enumerate(zip(starts, ends)):
            m = (p >= s0) & (p < e0)
            if m.sum() == 0:
                assert i not in out.index
            else:
                assert out.loc[i, "n"] == m.sum()
                assert out.loc[i, "sum_v"] == v[m].sum()


class TestHoppingWindow:
    def test_each_event_in_exactly_k_windows(self, ray_session):
        import pandas as pd

        from geomedea_ray.pipelines.relational import events_hopping_window

        out = events_hopping_window("/root/testdata/sf0.001").to_pandas()
        ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["ts", "value"])
        assert out["n"].sum() == 2 * len(ev)          # k=2 replicas
        assert out["sum_cents"].sum() == 2 * int(
            np.rint(ev["value"].to_numpy() * 100).sum())
        # window ids are hop-aligned
        assert (out["window_start"] % (30 * 60 * 10**9) == 0).all()


class TestBottomK:
    def test_partition_invariant_and_uniformish(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import SAMPLE_MULT, sample_bottomk

        df = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                           "payload": np.arange(5000) * 3})
        a = sample_bottomk(ray.data.from_pandas(df).repartition(3), "k", 100).to_pandas()
        b = sample_bottomk(ray.data.from_pandas(df).repartition(17), "k", 100).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("k").reset_index(drop=True),
            b.sort_values("k").reset_index(drop=True),
        )
        # matches the brute-force bottom-k of the same hash
        h = (df["k"].to_numpy(np.uint64) * np.uint64(SAMPLE_MULT)) % np.uint64(1 << 32)
        expect = set(df["k"].to_numpy()[np.argsort(h)[:100]])
        assert set(a["k"]) == expect
        assert len(a) == 100


class TestUpsertRolling:
    def test_upsert_latest(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import upsert_latest

        df = pd.DataFrame({
            "k": [1, 2, 3, 1, 2, 1],
            "version": [0, 0, 0, 1, 1, 2],
            "payload": ["a", "b", "c", "a1", "b1", "a2"],
        })
        out = (upsert_latest(ray.data.from_pandas(df).repartition(3), "k", "version")
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert list(out["payload"]) == ["a2", "b1", "c"]
        assert list(out["version"]) == [2, 1, 0]

    def test_rolling_sum_vs_pandas(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import rolling_sum

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "u": rng.integers(0, 9, 400),
            "t": rng.permutation(400),
            "id": np.arange(400),
            "v": rng.integers(0, 50, 400).astype(np.int64),
        })
        out = (rolling_sum(ray.data.from_pandas(df).repartition(5),
                           by="u", on="t", val_col="v", id_col="id",
                           window=4, out_col="r")
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = df.sort_values(["u", "t", "id"]).copy()
        exp["r"] = (exp.groupby("u")["v"].rolling(4, min_periods=1)
                    .sum().to_numpy().astype(np.int64))
        exp = exp.sort_values("id").reset_index(drop=True)
        assert (out["r"].to_numpy() == exp["r"].to_numpy()).all()


class TestBandedPrefixSum:
    def test_exact_vs_numpy(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import banded_prefix_sum

        rng = np.random.default_rng(2)
        # sparse, shuffled ids across several bands
        ids = rng.choice(np.arange(0, 90000, 3), 4000, replace=False)
        df = pd.DataFrame({"i": ids, "v": rng.integers(0, 100, 4000).astype(np.int64)})
        out = (banded_prefix_sum(ray.data.from_pandas(df).repartition(6),
                                 "i", "v")
               .to_pandas().sort_values("i").reset_index(drop=True))
        exp = df.sort_values("i").reset_index(drop=True)
        expected = np.cumsum(exp["v"].to_numpy()) - exp["v"].to_numpy()
        assert (out["cum0"].to_numpy() == expected).all()

    def test_pack_invariants(self, ray_session, sf_dir):
        from geomedea_ray.pipelines.curation import PACK_BUDGET, q_pack_sequences

        out = q_pack_sequences(sf_dir).to_pandas().sort_values("doc_id")
        # offsets are in-budget; bins fill sequentially without gaps
        assert (out["bin_offset"] < PACK_BUDGET).all()
        assert (out["bin_offset"] >= 0).all()
        bins = out["bin_id"].to_numpy()
        assert (np.diff(bins) >= 0).all()
        assert set(np.unique(bins)) == set(range(int(bins.max()) + 1))
        # exclusive prefix: first doc starts at bin 0 offset 0
        assert bins[0] == 0 and out["bin_offset"].iloc[0] == 0


class TestFunnelMatch:
    def test_ordered_semantics(self, ray_session):
        import ray.data

        from geomedea_ray.stages.funnel import funnel_match

        ev = pd.DataFrame({
            "u": [1, 1, 1,           # full funnel in order
                  2, 2,              # B before A: stage stops at 1
                  3, 3, 3, 3,        # A, B, A, C — greedy: A@0,B@1,C@3
                  4],                # only B: user absent (no step-0)
            "t": pd.to_datetime([
                "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:20",
                "2024-01-01 01:10", "2024-01-01 01:20",
                "2024-01-01 02:00", "2024-01-01 02:10", "2024-01-01 02:20", "2024-01-01 02:30",
                "2024-01-01 03:00",
            ]),
            "k": ["A", "B", "C",
                  "B", "A",
                  "A", "B", "A", "C",
                  "B"],
        })
        out = (funnel_match(ray.data.from_pandas(ev).repartition(3),
                            "u", "t", "k", ["A", "B", "C"], num_shards=3)
               .to_pandas().sort_values("u").reset_index(drop=True))
        assert out["u"].tolist() == [1, 2, 3]
        assert out["stage"].tolist() == [3, 1, 3]
        us = lambda s: int(pd.Timestamp(s).value // 1000)
        assert out["t_C"].tolist() == [us("2024-01-01 00:20"), -1,
                                       us("2024-01-01 02:30")]


class TestLeftJoin:
    def _join(self, left, right, **kw):
        from geomedea_ray.stages.joins import hash_join

        return hash_join(_ds(left), _ds(right), **kw).to_pandas()

    @JOIN_PLANS
    def test_left_keeps_unmatched(self, ray_session, bb):
        left = pa.table({"k": [1, 2, 3], "lv": [10, 20, 30]})
        right = pa.table({"rk": [1, 1], "rv": ["a", "b"]})
        out = self._join(left, right, left_on="k", right_on="rk",
                         right_cols=["rv"], how="left", **bb)
        out = out.sort_values(["lv", "rv"], na_position="last")
        assert out["lv"].tolist() == [10, 10, 20, 30]
        assert out["rv"].tolist()[:2] == ["a", "b"]
        assert out["rv"].isna().tolist() == [False, False, True, True]

    @JOIN_PLANS
    def test_left_empty_right(self, ray_session, bb):
        left = pa.table({"k": [5], "lv": [1]})
        empty = pa.table({"rk": pa.array([], pa.int64()),
                          "rv": pa.array([], pa.string())})
        out = self._join(left, empty, left_on="k", right_on="rk",
                         right_cols=["rv"], how="left", **bb)
        assert len(out) == 1 and out["rv"].isna().all()

    def test_bloom_left_rejected(self, ray_session):
        left = pa.table({"k": [1], "lv": [1]})
        right = pa.table({"rk": [1], "rv": [2]})
        with pytest.raises(AssertionError):
            self._join(left, right, left_on="k", right_on="rk",
                       right_cols=["rv"], how="left", bloom=True)


class TestDensify:
    def test_gap_fill_and_bucket_edges(self, ray_session):
        import ray.data

        from geomedea_ray.stages.resample import densify_counts

        ev = pd.DataFrame({
            "u": [1, 1, 2],
            "t": pd.to_datetime(["2024-01-01 00:30",   # bucket lo
                                 "2024-01-01 03:59",   # bucket lo+3
                                 "2024-01-01 01:00"]),  # exact boundary
        })
        out = (densify_counts(ray.data.from_pandas(ev).repartition(2),
                              "u", "t", num_shards=2)
               .to_pandas().sort_values(["k", "b"]).reset_index(drop=True))
        # global range = 4 buckets; 2 users → 8 dense rows
        assert len(out) == 8
        assert out.groupby("k")["b"].count().tolist() == [4, 4]
        u1 = out[out["k"] == 1]["n"].tolist()
        u2 = out[out["k"] == 2]["n"].tolist()
        assert u1 == [1, 0, 0, 1]
        assert u2 == [0, 1, 0, 0]  # boundary event lands in bucket lo+1


class TestCohortRetention:
    def test_multi_cohort_triangle(self, ray_session):
        import ray.data

        from geomedea_ray.stages.resample import cohort_retention

        wk = 7 * 24 * 3600 * 1_000_000
        base = pd.Timestamp("2024-01-04").value // 1000  # µs
        def ts(week): return pd.Timestamp((base + week * wk) * 1000)
        ev = pd.DataFrame({
            "u": [1, 1, 1,   2, 2,   3],
            "t": [ts(0), ts(0), ts(2),   # u1: cohort 0, active 0 & 2 (dup wk0 once)
                  ts(1), ts(2),          # u2: cohort 1, active 1 & 2
                  ts(2)],                # u3: cohort 2
        })
        out = (cohort_retention(ray.data.from_pandas(ev).repartition(2),
                                "u", "t", num_shards=2)
               .to_pandas())
        c0 = out["cohort"].min()
        got = {(int(r["cohort"] - c0), int(r["off"])): int(r["n_users"])
               for _, r in out.iterrows()}
        assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (1, 1): 1, (2, 0): 1}


class TestScd2Intervals:
    def test_versions_and_current_flags(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import scd2_intervals

        log = pd.DataFrame({
            "k": [1, 1, 1, 2],
            "ver": [0, 2, 5, 0],
            "v": ["a", "b", "c", "x"],
        })
        out = (scd2_intervals(ray.data.from_pandas(log).repartition(2),
                              "k", "ver", num_shards=2)
               .to_pandas().sort_values(["k", "ver"]).reset_index(drop=True))
        assert out["valid_to"].tolist() == [2, 5, -1, -1]
        assert out["is_current"].tolist() == [0, 0, 1, 1]
        assert out["v"].tolist() == ["a", "b", "c", "x"]


class TestSortMergeJoin:
    def test_matches_pandas_and_keeps_dtypes(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import sort_merge_join

        rng = np.random.default_rng(31)
        l = pd.DataFrame({"k": rng.integers(0, 200, 500),
                          "lv": rng.integers(0, 10**9, 500)})
        r = pd.DataFrame({"rk": rng.integers(0, 200, 80),
                          "status": rng.choice(list("ABC"), 80),
                          "rv": rng.integers(0, 10**9, 80)})
        out = sort_merge_join(
            ray.data.from_pandas(l).repartition(3),
            ray.data.from_pandas(r).repartition(2),
            "k", "rk", ["status", "rv"], num_shards=4,
        ).to_pandas()
        want = l.merge(r, left_on="k", right_on="rk")[
            ["k", "lv", "status", "rv"]]
        assert out["k"].dtype == np.int64 and out["rv"].dtype == np.int64
        a = out.sort_values(list(out.columns)).reset_index(drop=True)
        b = want.sort_values(list(want.columns)).reset_index(drop=True)
        assert len(a) == len(b) > 150
        assert a[["k", "lv", "status", "rv"]].reset_index(drop=True).equals(
            b.reset_index(drop=True))

    def test_range_shards_cluster_keys(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import sort_merge_join

        # keys 0..999; with range partitioning each output block holds
        # a contiguous key range (the hash plan would interleave)
        l = pd.DataFrame({"k": np.arange(1000), "lv": np.arange(1000)})
        r = pd.DataFrame({"rk": np.arange(1000), "rv": np.arange(1000)})
        ds = sort_merge_join(ray.data.from_pandas(l).repartition(4),
                             ray.data.from_pandas(r).repartition(4),
                             "k", "rk", ["rv"], num_shards=5)
        ranges = []
        for b in ds.iter_batches(batch_format="pandas", batch_size=None):
            if len(b):
                ranges.append((b["k"].min(), b["k"].max()))
        ranges.sort()
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 < b0, "range shards overlap"

    def test_empty_sides(self, ray_session):
        import ray.data

        from geomedea_ray.stages.joins import sort_merge_join

        l = pd.DataFrame({"k": [1, 2], "lv": [10, 20]})
        r = pd.DataFrame({"rk": pd.Series([], dtype=np.int64),
                          "rv": pd.Series([], dtype=np.int64)})
        out = sort_merge_join(ray.data.from_pandas(l),
                              ray.data.from_pandas(r),
                              "k", "rk", ["rv"]).to_pandas()
        assert len(out) == 0

    def test_unprojected_right_extra_columns_dropped(self, ray_session):
        """A right input carrying columns NOT listed in right_cols used
        to leak them through _merge as NaN-upcast left columns; they
        must now be projected away before tagging (round-4 ADVICE)."""
        import ray.data

        from geomedea_ray.stages.joins import sort_merge_join

        l = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                          "lv": np.arange(20, dtype=np.int64) * 3})
        r = pd.DataFrame({"rk": np.arange(0, 20, 2, dtype=np.int64),
                          "rv": np.arange(10, dtype=np.int64),
                          "junk": np.arange(10, dtype=np.int64) * 99,
                          "junk2": list("abcdefghij")})
        out = sort_merge_join(ray.data.from_pandas(l).repartition(2),
                              ray.data.from_pandas(r).repartition(2),
                              "k", "rk", ["rv"], num_shards=3).to_pandas()
        assert sorted(out.columns) == ["k", "lv", "rv"]
        want = l.merge(r[["rk", "rv"]], left_on="k", right_on="rk")[
            ["k", "lv", "rv"]]
        a = out.sort_values("k").reset_index(drop=True)
        b = want.sort_values("k").reset_index(drop=True)
        assert a.equals(b)
        assert a["rv"].dtype == np.int64
