"""VersionedTable (Lance-semantics layer, sources/table_format.py).

Covers: create/append/delete/add_columns version chain, time travel,
deletion-vector merge across successive deletes, schema-evolution
extras with projection routing, offset `take` (row-group-pruned) with
deletions + extras, optimistic-commit conflicts, orphan cleanup,
footer validation.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomedea_ray.sources.table_format import CommitConflict, VersionedTable


def _tbl(lo, hi):
    ids = np.arange(lo, hi, dtype=np.int64)
    return pa.table({
        "k": pa.array(ids),
        "name": pa.array([f"row-{i}" for i in ids], pa.string()),
    })


@pytest.fixture()
def table(ray_session, tmp_path):
    t = VersionedTable.create(str(tmp_path / "vt"))
    t.append_table(_tbl(0, 100))       # v1: one fragment
    t.append_table(_tbl(100, 250))     # v2: second fragment
    return t


class TestVersionChain:
    def test_versions_and_counts(self, table):
        assert table.versions() == [0, 1, 2]
        assert table.count(0) == 0
        assert table.count(1) == 100
        assert table.count() == 250

    def test_read_latest(self, table):
        got = table.read().to_pandas()
        assert sorted(got["k"]) == list(range(250))
        assert set(got.columns) == {"k", "name"}

    def test_read_projection_order(self, table):
        got = table.read(columns=["name", "k"]).schema().names
        assert got == ["name", "k"]

    def test_time_travel_read(self, table):
        assert table.read(version=1).count() == 100
        assert table.read(version=2).count() == 250

    def test_unknown_column_raises(self, table):
        with pytest.raises(KeyError):
            table.read(columns=["nope"]).count()


class TestDelete:
    def test_delete_and_time_travel(self, table):
        v = table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        assert v == 3
        assert table.count() == 125
        got = table.read().to_pandas()
        assert (got["k"] % 2 == 1).all() and len(got) == 125
        # old version unaffected
        assert table.read(version=2).count() == 250

    def test_second_delete_merges_vectors(self, table):
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        table.delete(lambda t: t["k"].to_numpy() < 50, columns=["k"])
        got = table.read().to_pandas()
        assert got["k"].min() >= 51
        assert (got["k"] % 2 == 1).all()
        assert len(got) == 100  # odds in [51, 249]
        # v3 still shows only the first delete
        assert table.read(version=3).count() == 125

    def test_delete_nothing_keeps_null_vector(self, table):
        table.delete(lambda t: t["k"].to_numpy() < 0, columns=["k"])
        man = table.manifest()
        assert all(f["deletion"] is None for f in man["fragments"])
        assert table.count() == 250


class TestAddColumns:
    def test_extras_roundtrip(self, table):
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        got = table.read(columns=["k", "k2"]).to_pandas()
        assert (got["k2"] == got["k"] * 2).all()
        assert table.schema_columns()["k2"] == "int64"

    def test_extras_only_projection(self, table):
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        got = table.read(columns=["k2"]).to_pandas()
        assert sorted(got["k2"]) == [2 * i for i in range(250)]

    def test_extras_computed_before_delete_still_align(self, table):
        # extras are physical-row-aligned: delete AFTER add_columns must
        # filter both consistently
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        got = table.read(columns=["k", "k2"]).to_pandas()
        assert (got["k2"] == got["k"] * 2).all() and len(got) == 125

    def test_shadowing_rejected(self, table):
        with pytest.raises(ValueError):
            table.add_columns(lambda t: pa.table({"k": t["k"]}),
                              input_columns=["k"])


class TestTake:
    def test_take_plain(self, table):
        got = table.take([249, 0, 100], columns=["k"])
        assert got["k"].to_pylist() == [249, 0, 100]
        assert got["off"].to_pylist() == [249, 0, 100]

    def test_take_after_delete_uses_live_offsets(self, table):
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        # live rows are the odds in fragment order: offset i -> k = 2i+1
        got = table.take([0, 1, 124], columns=["k"])
        assert got["k"].to_pylist() == [1, 3, 249]

    def test_take_with_extras(self, table):
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        got = table.take([7, 200], columns=["k", "k2"])
        assert got["k2"].to_pylist() == [14, 400]

    def test_take_out_of_range(self, table):
        with pytest.raises(IndexError):
            table.take([250])

    def test_take_duplicates(self, table):
        got = table.take([5, 5, 3], columns=["k"])
        assert got["k"].to_pylist() == [5, 5, 3]


class TestCommitProtocol:
    def test_conflict_one_winner(self, table):
        man = table.manifest()
        # two writers derive the same next version; second commit fails
        m1 = dict(man, version=man["version"] + 1, parent=man["version"],
                  operation="append")
        m2 = dict(man, version=man["version"] + 1, parent=man["version"],
                  operation="delete")
        table._commit(m1)
        with pytest.raises(CommitConflict):
            table._commit(m2)

    def test_append_schema_mismatch_rejected(self, table):
        with pytest.raises(ValueError):
            table.append_table(pa.table({"z": pa.array([1.0])}))


class TestIncremental:
    def test_added_rows_between_versions(self, table):
        assert table.read_incremental(1).count() == 150  # v2's fragment
        assert table.read_incremental(0).count() == 250
        assert table.read_incremental(2).count() == 0    # nothing after v2

    def test_delete_adds_no_rows(self, table):
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        assert table.read_incremental(2).count() == 0

    def test_rows_come_back_as_at_introduction(self, table):
        # delete AFTER v2 must not retract rows from the v1->v2 delta
        table.delete(lambda t: t["k"].to_numpy() >= 100, columns=["k"])
        got = table.read_incremental(1, 2, columns=["k"]).to_pandas()
        assert sorted(got["k"]) == list(range(100, 250))

    def test_merge_delta_is_source_only(self, table):
        src = pa.table({"k": pa.array([5, 9000], pa.int64()),
                        "name": pa.array(["u", "n"], pa.string())})
        v = table.merge_insert(src, on="k")
        got = table.read_incremental(v - 1, v, columns=["k"]).to_pandas()
        assert sorted(got["k"]) == [5, 9000]

    def test_compact_is_not_a_delta(self, table):
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        v = table.compact()
        assert table.added_fragments(v) == []
        assert table.read_incremental(v - 1, v).count() == 0


class TestTags:
    def test_tag_checkpoint_resume_flow(self, table):
        table.tag("processed")             # head = v2
        table.append_table(_tbl(250, 300))  # v3 arrives later
        got = table.read_incremental("processed", columns=["k"]).to_pandas()
        assert sorted(got["k"]) == list(range(250, 300))
        table.tag("processed")             # advance the checkpoint
        assert table.read_incremental("processed").count() == 0

    def test_tag_resolves_in_reads(self, table):
        table.tag("v1-import", version=1)
        assert table.read(version="v1-import").count() == 100
        assert table.count("v1-import") == 100
        assert table.tags() == {"v1-import": 1}
        table.delete_tag("v1-import")
        assert table.tags() == {}

    def test_bad_tag_names_rejected(self, table):
        import pytest as _pt
        with _pt.raises(ValueError):
            table.tag("a/b")
        with _pt.raises(FileNotFoundError):
            table.tag("x", version=99)


class TestRestore:
    def test_restore_rolls_back_without_rewriting_history(self, table):
        table.delete(lambda t: t["k"].to_numpy() < 200, columns=["k"])
        assert table.count() == 50
        v = table.restore(2)  # pre-delete head
        assert v == 4
        assert table.count() == 250
        assert table.read(version=3).count() == 50  # history intact
        man = table.manifest()
        assert man["operation"] == "restore" and man["restored_from"] == 2

    def test_restore_then_write_continues_chain(self, table):
        table.delete(lambda t: t["k"].to_numpy() < 200, columns=["k"])
        table.restore(2)
        table.append_table(_tbl(250, 260))
        assert table.count() == 260


_CRASH_WRITER_SRC = """
import sys, os
sys.path.insert(0, {repo!r})
import numpy as np, pyarrow as pa
from geomedea_ray.sources.table_format import VersionedTable
t = VersionedTable({root!r})
i = 0
while True:  # appends until SIGKILLed mid-flight
    lo = 1000 + i * 10
    t.append_table(pa.table({{
        "k": pa.array(np.arange(lo, lo + 10, dtype=np.int64)),
        "name": pa.array([f"row-{{j}}" for j in range(lo, lo + 10)]),
    }}))
    print(t.latest_version(), flush=True)
    i += 1
"""


class TestCrashSafety:
    def test_sigkill_mid_append_leaves_consistent_table(self, table):
        """SIGKILL a writer mid-append-loop: the table must stay
        readable at a contiguous version prefix (an uncommitted
        fragment file is an orphan, never a corruption), cleanup must
        sweep the orphans, and writes must resume cleanly."""
        import signal
        import subprocess
        import sys
        import time

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = _CRASH_WRITER_SRC.format(repo=repo, root=table.root)
        proc = subprocess.Popen([sys.executable, "-c", src],
                                stdout=subprocess.PIPE, text=True)
        # wait for a few commits, then kill at an arbitrary moment
        for _ in range(3):
            proc.stdout.readline()
        proc.send_signal(signal.SIGKILL)
        proc.wait()

        vs = table.versions()
        assert vs == list(range(vs[-1] + 1))  # contiguous chain
        assert table.validate()
        n = table.count()
        assert n >= 250 + 30 and (n - 250) % 10 == 0
        assert table.read(columns=["k"]).count() == n
        table.cleanup()  # sweeps any uncommitted fragment file
        assert table.read(columns=["k"]).count() == n
        table.append_table(_tbl(90000, 90010))  # chain continues
        assert table.count() == n + 10


class TestHttpRead:
    @pytest.fixture()
    def served(self, table):
        """The fixture table, dirtied (deletes + extras) and served
        over a REAL localhost range server."""
        from geomedea_ray.state.http_store import HttpStoreServer

        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        with HttpStoreServer(table.root) as srv:
            yield table, VersionedTable(srv.base_url)

    def test_remote_read_equals_local(self, served):
        local, remote = served
        assert remote.is_remote
        assert remote.latest_version() == local.latest_version()
        assert remote.count() == 125
        a = local.read(columns=["k", "k2"]).to_pandas().sort_values("k")
        b = remote.read(columns=["k", "k2"]).to_pandas().sort_values("k")
        assert a.values.tolist() == b.values.tolist()

    def test_remote_time_travel_and_filter(self, served):
        local, remote = served
        assert remote.read(version=2).count() == 250
        got = remote.read(columns=["k"], filter=("k", 0, 20)).to_pandas()
        assert sorted(got["k"]) == list(range(1, 21, 2))

    def test_remote_take_row_group_pruned(self, served):
        local, remote = served
        a = local.take([0, 60, 124], columns=["k", "k2"])
        b = remote.take([0, 60, 124], columns=["k", "k2"])
        assert a.equals(b)

    def test_remote_incremental(self, served):
        _, remote = served
        assert remote.read_incremental(1, 2, columns=["k"]).count() == 150

    def test_remote_validate_and_write_guard(self, served):
        _, remote = served
        assert remote.validate()
        with pytest.raises(ValueError):
            remote.append_table(_tbl(0, 1))
        with pytest.raises(ValueError):
            remote.compact()


class TestMaintenance:
    def test_cleanup_removes_only_orphans(self, table):
        orphan = os.path.join(table.root, "data", "frag-orphan.parquet")
        pq.write_table(_tbl(0, 1), orphan)
        removed = table.cleanup()
        assert removed == ["data/frag-orphan.parquet"]
        assert table.read().count() == 250

    def test_validate_catches_truncation(self, table):
        assert table.validate()
        frag = table.manifest()["fragments"][0]
        pq.write_table(_tbl(0, 3), os.path.join(table.root, frag["path"]))
        assert not table.validate()


def _rename_matched():
    """A FRESH local closure per call: module-level test functions
    pickle by reference and Ray workers cannot import the test module."""
    def fn(m: pa.Table) -> pa.Table:
        new = pa.array([f"upd-{k}" for k in m["k"].to_pylist()], pa.string())
        return m.set_column(m.schema.get_field_index("name"), "name", new)
    return fn  # nested defs are pickled by value (cloudpickle)


class TestUpdate:
    def test_update_replaces_matching_live_rows(self, table):
        v = table.update(lambda t: t["k"].to_numpy() % 50 == 0, ["k"],
                         _rename_matched())
        assert v == 3
        got = table.read().to_pandas().set_index("k")["name"]
        assert got.loc[0] == "upd-0" and got.loc[200] == "upd-200"
        assert got.loc[1] == "row-1"
        assert table.count() == 250  # replace, not grow
        assert table.manifest()["stats"]["updated_rows"] == 5
        assert table.read(version=2).count() == 250  # history intact

    def test_update_composes_with_delete_and_extras(self, table):
        table.delete(lambda t: t["k"].to_numpy() == 50, columns=["k"])
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        table.update(lambda t: t["k"].to_numpy() % 50 == 0, ["k"],
                     _rename_matched())
        got = table.read().to_pandas().set_index("k")
        assert 50 not in got.index          # deleted rows are not revived
        assert got.loc[100, "name"] == "upd-100"
        assert got.loc[100, "k2"] == 200    # extras flow through the rewrite
        assert table.manifest()["stats"]["updated_rows"] == 4

    def test_update_no_match_is_cheap(self, table):
        table.update(lambda t: t["k"].to_numpy() < 0, ["k"], _rename_matched())
        man = table.manifest()
        assert man["stats"]["updated_rows"] == 0
        assert len(man["fragments"]) == 2   # no update fragments minted

    def test_update_schema_violation_rejected(self, table):
        with pytest.raises(Exception):
            table.update(lambda t: t["k"].to_numpy() == 0, ["k"],
                         lambda m: m.select(["k"]))


class TestCompact:
    def _dirty(self, table):
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])

    def test_compact_preserves_reads_and_offsets(self, table):
        self._dirty(table)
        before = table.read(columns=["k", "k2"]).to_pandas()
        take_before = table.take([0, 60, 124], columns=["k", "k2"])
        v = table.compact()
        assert v == 5
        after = table.read(columns=["k", "k2"]).to_pandas()
        assert before.values.tolist() == after.values.tolist()
        assert table.take([0, 60, 124], columns=["k", "k2"]).equals(take_before)

    def test_compact_folds_state(self, table):
        self._dirty(table)
        table.compact()
        man = table.manifest()
        assert all(f["deletion"] is None and not f["extras"]
                   and f["dead"] == 0 for f in man["fragments"])
        # both 125-live-row fragments coalesce under the default target
        assert len(man["fragments"]) == 1
        assert man["stats"]["fragments_before"] == 2

    def test_compact_respects_target_rows(self, table):
        self._dirty(table)
        table.compact(target_rows=60)
        # 125 live rows in bins of <=60: frag1 (50 live) then frag2 (75)
        # splits — consecutive-only binning, no reordering
        assert table.count() == 125
        got = table.read(columns=["k"]).to_pandas()["k"].tolist()
        assert got == sorted(got)  # original fragment order was sorted

    def test_compact_noop_returns_same_version(self, table):
        v0 = table.latest_version()
        assert table.compact(target_rows=120) == v0  # both frags clean & full
        assert table.latest_version() == v0

    def test_time_travel_across_compact(self, table):
        self._dirty(table)
        table.compact()
        assert table.read(version=2).count() == 250  # pre-delete
        assert table.read(version=4, columns=["k"]).count() == 125


class TestMergeInsert:
    def test_update_and_insert(self, table):
        src = pa.table({
            "k": pa.array([5, 10, 9000], pa.int64()),
            "name": pa.array(["upd-5", "upd-10", "new-9000"], pa.string()),
        })
        v = table.merge_insert(src, on="k")
        assert v == 3
        got = table.read().to_pandas().set_index("k")["name"]
        assert got.loc[5] == "upd-5" and got.loc[10] == "upd-10"
        assert got.loc[9000] == "new-9000"
        assert got.loc[6] == "row-6"  # untouched
        assert table.count() == 251  # 250 - 2 updated + 3 source
        st = table.manifest()["stats"]
        assert st == {"updated_rows": 2, "inserted_rows": 1}
        # one atomic version: old head unchanged
        assert table.read(version=2).count() == 250

    def test_key_matching_only_dead_rows_is_insert(self, table):
        table.delete(lambda t: t["k"].to_numpy() == 7, columns=["k"])
        src = pa.table({"k": pa.array([7], pa.int64()),
                        "name": pa.array(["back-7"], pa.string())})
        table.merge_insert(src, on="k")
        assert table.manifest()["stats"] == {"updated_rows": 0,
                                             "inserted_rows": 1}
        got = table.read().to_pandas().set_index("k")["name"]
        assert got.loc[7] == "back-7"

    def test_source_must_cover_schema(self, table):
        with pytest.raises(ValueError):
            table.merge_insert(pa.table({"k": pa.array([1], pa.int64())}),
                               on="k")

    def test_merge_after_schema_evolution(self, table):
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        src = pa.table({"k": pa.array([3], pa.int64()),
                        "name": pa.array(["upd-3"], pa.string()),
                        "k2": pa.array([6], pa.int64())})
        table.merge_insert(src, on="k")
        got = table.read(columns=["k", "name", "k2"]).to_pandas()
        row = got[got["k"] == 3].iloc[0]
        assert row["name"] == "upd-3" and row["k2"] == 6
        assert len(got) == 250


class TestFilterPushdown:
    def test_prune_plan_drops_disjoint_fragments(self, table):
        # fragment 1: k in [0,100); fragment 2: k in [100,250)
        kept, pruned = table.prune_plan(filter=("k", 120, 200))
        assert pruned == 1 and len(kept) == 1
        assert kept[0]["stats"]["k"] == [100, 249]

    def test_filtered_read_exact(self, table):
        got = table.read(columns=["k"], filter=("k", 95, 105)).to_pandas()
        assert sorted(got["k"]) == list(range(95, 106))

    def test_filter_column_not_projected(self, table):
        got = table.read(columns=["name"], filter=("k", 0, 2)).to_pandas()
        assert sorted(got["name"]) == ["row-0", "row-1", "row-2"]
        assert list(got.columns) == ["name"]

    def test_filter_respects_deletions(self, table):
        table.delete(lambda t: (t["k"].to_numpy() & 1) == 0, columns=["k"])
        got = table.read(columns=["k"], filter=("k", 0, 10)).to_pandas()
        assert sorted(got["k"]) == [1, 3, 5, 7, 9]

    def test_open_bounds(self, table):
        assert table.read(columns=["k"], filter=("k", 240, None)).count() == 10
        assert table.read(columns=["k"], filter=("k", None, 9)).count() == 10

    def test_extras_column_stats_prune(self, table):
        table.add_columns(
            lambda t: pa.table({"k2": pa.array(t["k"].to_numpy() * 2)}),
            input_columns=["k"])
        kept, pruned = table.prune_plan(filter=("k2", 0, 100))
        assert pruned == 1  # fragment 2's k2 range is [200, 498]
        got = table.read(columns=["k"], filter=("k2", 0, 100)).to_pandas()
        assert sorted(got["k"]) == list(range(51))

    def test_compact_rebuilds_stats(self, table):
        table.delete(lambda t: t["k"].to_numpy() >= 200, columns=["k"])
        table.compact()
        man = table.manifest()
        assert man["fragments"][0]["stats"]["k"] == [0, 199]

    def test_missing_stats_never_prune(self, table):
        # simulate an old manifest without zone maps
        man = table.manifest()
        for f in man["fragments"]:
            f.pop("stats", None)
        man.update(version=man["version"] + 1, parent=man["version"],
                   operation="append")
        table._commit(man)
        kept, pruned = table.prune_plan(filter=("k", 0, 1))
        assert pruned == 0 and len(kept) == 2
        got = table.read(columns=["k"], filter=("k", 0, 1)).to_pandas()
        assert sorted(got["k"]) == [0, 1]


class TestDistributedWrites:
    def test_append_dataset_blocks_become_fragments(self, ray_session, tmp_path):
        import ray.data

        t = VersionedTable.create(str(tmp_path / "vt2"))
        ds = ray.data.from_arrow(_tbl(0, 1000)).repartition(4)
        t.append_dataset(ds)
        assert len(t.manifest()["fragments"]) == 4
        assert t.count() == 1000
        assert sorted(t.read(columns=["k"]).to_pandas()["k"]) == list(range(1000))

    def test_append_files_order_stable(self, ray_session, tmp_path):
        paths = []
        for i in range(3):
            p = str(tmp_path / f"src-{i}.parquet")
            pq.write_table(_tbl(i * 10, i * 10 + 10), p)
            paths.append(p)
        t = VersionedTable.create(str(tmp_path / "vt3"))
        t.append_files(paths)
        # fragment order follows the path list; take(0) is src-0 row 0
        assert t.take([0, 10, 20], columns=["k"])["k"].to_pylist() == [0, 10, 20]
        # transform variant: filter is row-stable
        t2 = VersionedTable.create(str(tmp_path / "vt4"))
        t2.append_files(paths, fn=lambda tb: tb.filter(
            pa.compute.equal(pa.compute.bit_wise_and(tb["k"], 1), 0)))
        assert t2.read(columns=["k"]).to_pandas()["k"].tolist() != []
        assert t2.count() == 15


class TestVectorIndex:
    """state/vector_index: the table's own IVF-PQ index + incremental
    tail + deletion filter (Lance's index-plus-tail semantics)."""

    def _table(self, tmp_path, n=2000, dim=32):
        rng = np.random.default_rng(23)
        centers = rng.normal(size=(20, dim)) * 3
        vecs = centers[rng.integers(0, 20, n)] + rng.normal(
            size=(n, dim)) * 0.5
        t = VersionedTable.create(str(tmp_path / "vt"))
        t.append_table(pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs.astype(np.float32)),
                                  pa.list_(pa.float32(), dim)),
        }))
        return t, vecs

    def test_index_tail_and_deletions(self, ray_session, tmp_path):
        from geomedea_ray.stages.ann import ann_topk
        from geomedea_ray.state.vector_index import (
            create_vector_index,
            find_vector_index,
            vector_search,
        )

        t, vecs = self._table(tmp_path)
        d = create_vector_index(t, "embedding", id_col="vec_id",
                                version=1, n_lists=20, m_sub=8,
                                k_codes=64, sample_rows=2000)
        assert find_vector_index(t, "embedding")["version"] == 1

        qm = vecs[:3].astype(np.float64)
        qids = np.array([0, 1, 2])
        k = 10

        # v2: append exact copies of the queries (tail-only rows)
        t.append_table(pa.table({
            "vec_id": pa.array([1000000, 1000001, 1000002], pa.int64()),
            "embedding": pa.array(list(vecs[:3].astype(np.float32)),
                                  pa.list_(pa.float32(), 32)),
        }))
        # v3: delete the ORIGINAL query rows
        t.delete(lambda tb: np.isin(tb["vec_id"].to_numpy(), [0, 1, 2]),
                 columns=["vec_id"])

        got = vector_search(t, "embedding", qm, qids, k,
                            nprobe=4, refine=16).to_pandas()
        for i, q in enumerate(qids):
            g = got[got["qid"] == q].sort_values("rank")
            ids = list(g["vec_id"])
            assert len(ids) == k
            # deleted originals excluded (liveness filter)
            assert not set(ids) & {0, 1, 2}
            # the tail copy (exact duplicate of the query) is rank 1 —
            # proves the incremental flat-scan path
            assert ids[0] == 1000000 + i
        # recall vs the exact answer over the LIVE rows at v3
        exact = ann_topk(t.read(columns=["vec_id", "embedding"]),
                         qm, qids, k).to_pandas()
        rec = [
            len(set(exact[exact["qid"] == q]["vec_id"])
                & set(got[got["qid"] == q]["vec_id"])) / k
            for q in qids
        ]
        assert np.mean(rec) >= 0.8, rec

        # time travel: a search AT the index's build version uses the
        # index alone (no tail, no filter) and must return the
        # original rows — including the then-live query rows at rank 1
        at_v1 = vector_search(t, "embedding", qm, qids, k, version=1,
                              nprobe=4, refine=16).to_pandas()
        for q in qids:
            g = at_v1[at_v1["qid"] == q].sort_values("rank")
            assert list(g["vec_id"])[0] == q

    def test_flat_fallback_without_index(self, ray_session, tmp_path):
        from geomedea_ray.stages.ann import ann_topk
        from geomedea_ray.state.vector_index import vector_search

        t, vecs = self._table(tmp_path, n=500)
        qm = vecs[:2].astype(np.float64)
        qids = np.array([0, 1])
        got = vector_search(t, "embedding", qm, qids, 5).to_pandas()
        exact = ann_topk(t.read(columns=["vec_id", "embedding"]),
                         qm, qids, 5).to_pandas()
        ga = got.sort_values(["qid", "rank"]).reset_index(drop=True)
        ea = exact.sort_values(["qid", "rank"]).reset_index(drop=True)
        assert ga.equals(ea)

    def test_index_publish_is_atomic_and_idempotent(self, ray_session,
                                                    tmp_path):
        import os

        from geomedea_ray.state.vector_index import create_vector_index

        t, _ = self._table(tmp_path, n=400)
        d1 = create_vector_index(t, "embedding", id_col="vec_id",
                                 n_lists=8, m_sub=8, sample_rows=400)
        d2 = create_vector_index(t, "embedding", id_col="vec_id",
                                 n_lists=8, m_sub=8, sample_rows=400)
        assert d1 == d2 and os.path.exists(os.path.join(d1, "index.json"))
        assert not [p for p in os.listdir(os.path.dirname(d1))
                    if ".tmp-" in p]
