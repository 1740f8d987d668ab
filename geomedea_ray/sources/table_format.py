"""Versioned table layer with Lance-table semantics (SURVEY §2 "Lance
table" row; BASELINE.json's input_hint names "Lance tables of
image + caption pairs").

The ``pylance`` package is NOT installed in this sandbox, so the
PHYSICAL file encoding substitutes Parquet — documented loudly, and
kept behind this layer so a real Lance backend can slot in — while
the LOGICAL model matches what Lance's public format spec provides
(versioned manifests over immutable fragments, per-fragment deletion
files, schema evolution by column-aligned auxiliary files, time
travel, O(probed-row-groups) ``take``):

    root/
      data/frag-<uuid>.parquet          immutable fragment data
      deletes/frag-<id>-<uuid>.parquet  deletion vector (``pos`` int64,
                                        ascending) — the FULL merged
                                        set as of the referencing
                                        version (old versions keep
                                        pointing at their own files)
      extras/frag-<id>-<uuid>.parquet   schema-evolution columns,
                                        row-aligned with the
                                        fragment's PHYSICAL rows
      _versions/v<N>.json               manifest: fragment list, schema,
                                        parent version, operation
      _latest.json                      advisory pointer (readers fall
                                        back to scanning _versions/)

Commit protocol (Lance's optimistic-concurrency contract): a manifest
is staged to a tmp file and published with ``os.link`` — atomic
create-if-absent, so two writers racing to commit version N produce
exactly one winner; the loser raises :class:`CommitConflict` and can
re-derive against the new head. A retried Ray write task can leave an
orphan fragment file in ``data/``; orphans are never referenced by any
manifest (descriptors come only from the task attempt whose output
block was consumed) and are swept by :meth:`VersionedTable.cleanup`.

Scale notes (100 TB): fragment data never moves through the driver —
append/delete/add_columns run one Ray task per fragment and ship only
kilobyte descriptor rows back; ``read()`` streams one fragment per
task with column projection pushed into the Parquet read; ``take()``
reads only the row groups containing the probed positions. The only
driver-side state is the manifest (O(#fragments) descriptors — the
same contract as Lance's own manifest).
"""

from __future__ import annotations

import json
import os
import uuid as _uuid
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-derive and retry."""


#: column types eligible for fragment zone-map stats (JSON-storable,
#: totally ordered). Binary/nested columns carry no stats (no prune).
_STATS_TYPES = (pa.types.is_integer, pa.types.is_floating,
                pa.types.is_string, pa.types.is_large_string,
                pa.types.is_boolean)


def _table_stats(t: pa.Table) -> dict[str, list]:
    """Exact per-column [min, max] over a fragment's PHYSICAL rows —
    computed from the in-memory table at write time (never from
    Parquet footer stats, whose string min/max may be truncated).
    Physical-row bounds are a superset of live-row bounds, so pruning
    against them is always safe under deletion vectors."""
    import pyarrow.compute as pc

    out: dict[str, list] = {}
    for name in t.column_names:
        col = t[name]
        if not any(p(col.type) for p in _STATS_TYPES):
            continue
        if col.null_count == len(col) or len(col) == 0:
            continue
        mm = pc.min_max(col)
        out[name] = [mm["min"].as_py(), mm["max"].as_py()]
    return out


def _stats_overlap(stats: dict[str, list] | None, col: str,
                   lo, hi) -> bool:
    """True if the fragment MAY contain rows with ``col`` in [lo, hi]
    — missing stats (old manifests, ineligible types) never prune."""
    if not stats or col not in stats:
        return True
    mn, mx = stats[col]
    if lo is not None and mx < lo:
        return False
    if hi is not None and mn > hi:
        return False
    return True


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


# ----------------------------------------------------------------------
# storage shim: a table root is a local directory OR an http:// base
# URL (state/http_store range server) — the whole READ path works over
# real ranged GETs; writes are local-only (a remote writer would need
# a PUT/link protocol the static range server doesn't speak).
# ----------------------------------------------------------------------


def _is_remote(root: str) -> bool:
    return root.startswith("http://") or root.startswith("https://")


def _fs_join(root: str, rel: str) -> str:
    return f"{root.rstrip('/')}/{rel}" if _is_remote(root) else os.path.join(
        root, rel)


def _fs_open(root: str, rel: str):
    """A seekable binary file-like for root/rel (HttpRangeFile issues
    real ranged GETs; Parquet readers over it fetch only the byte
    ranges they need)."""
    if _is_remote(root):
        from geomedea_ray.state.http_store import HttpRangeFile

        return HttpRangeFile(_fs_join(root, rel))
    return open(_fs_join(root, rel), "rb")


def _fs_exists(root: str, rel: str) -> bool:
    if not _is_remote(root):
        return os.path.exists(_fs_join(root, rel))
    try:
        f = _fs_open(root, rel)
        f.close()
        return True
    except OSError:
        return False


def _fs_json(root: str, rel: str) -> dict:
    f = _fs_open(root, rel)  # HttpRangeFile is not a context manager
    try:
        return json.loads(f.read().decode())
    finally:
        f.close()


def _fs_parquet_file(root: str, rel: str) -> pq.ParquetFile:
    return pq.ParquetFile(_fs_open(root, rel))


def _fs_read_table(root: str, rel: str,
                   columns: list[str] | None = None) -> pa.Table:
    if _is_remote(root):
        return _fs_parquet_file(root, rel).read(columns=columns)
    return pq.read_table(_fs_join(root, rel), columns=columns)


class VersionedTable:
    """Handle to a versioned table rooted at ``root``."""

    DATA = "data"
    DELETES = "deletes"
    EXTRAS = "extras"
    VERSIONS = "_versions"

    def __init__(self, root: str):
        """``root`` is a local directory or an ``http(s)://`` base URL
        (read-only: the whole read path — manifests, fragments,
        deletion vectors, extras, row-group-pruned ``take`` — runs
        over real ranged GETs against a range server)."""
        self.root = root
        self.is_remote = _is_remote(root)

    def _require_local(self, op: str) -> None:
        if self.is_remote:
            raise ValueError(
                f"{op} requires a local table root; {self.root!r} is a "
                "read-only http store")

    # ------------------------------------------------------------------
    # creation / manifests
    # ------------------------------------------------------------------

    @classmethod
    def create(cls, root: str) -> "VersionedTable":
        """Initialise an empty table (version 0, no fragments)."""
        for sub in (cls.DATA, cls.DELETES, cls.EXTRAS, cls.VERSIONS):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        t = cls(root)
        t._commit({"version": 0, "parent": None, "operation": "create",
                   "columns": {}, "fragments": []}, expect_version=0)
        return t

    def _version_path(self, v: int) -> str:
        return os.path.join(self.root, self.VERSIONS, f"v{v:08d}.json")

    def _version_rel(self, v: int) -> str:
        return f"{self.VERSIONS}/v{v:08d}.json"

    def versions(self) -> list[int]:
        if self.is_remote:
            # no directory listing over HTTP; versions are contiguous
            # by the commit protocol — probe forward from the advisory
            # pointer (or 0) until the first miss
            try:
                v = int(_fs_json(self.root, "_latest.json")["version"])
            except (OSError, ValueError, KeyError):
                v = 0
            while not _fs_exists(self.root, self._version_rel(v)) and v > 0:
                v -= 1
            while _fs_exists(self.root, self._version_rel(v + 1)):
                v += 1
            if not _fs_exists(self.root, self._version_rel(0)):
                raise FileNotFoundError(f"no versions under {self.root}")
            return list(range(v + 1))
        out = []
        for f in os.listdir(os.path.join(self.root, self.VERSIONS)):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        if self.is_remote:
            return self.versions()[-1]
        # advisory pointer first, authoritative directory scan fallback
        try:
            with open(os.path.join(self.root, "_latest.json")) as f:
                v = int(json.load(f)["version"])
            if os.path.exists(self._version_path(v)):
                vs = self.versions()
                return vs[-1] if vs and vs[-1] > v else v
        except (OSError, ValueError, KeyError):
            pass
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no versions under {self.root}")
        return vs[-1]

    def manifest(self, version: int | str | None = None) -> dict:
        v = self._resolve(version)
        try:
            return _fs_json(self.root, self._version_rel(v))
        except OSError:
            raise FileNotFoundError(
                f"no version {v} under {self.root}") from None

    def _resolve(self, version: int | str | None) -> int:
        """None → latest; str → tag lookup; int passes through."""
        if version is None:
            return self.latest_version()
        if isinstance(version, str):
            return self.tags()[version]
        return version

    # ------------------------------------------------------------------
    # tags (named versions — Lance's tags API). A consumer checkpoints
    # "processed up to" as a tag and resumes with
    # read_incremental(tags()['processed'], ...).
    # ------------------------------------------------------------------

    def tag(self, name: str, version: int | None = None) -> int:
        """Create or move a tag to ``version`` (default: current head).
        Atomic (tmp + rename)."""
        self._require_local("tag")
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid tag name {name!r}")
        v = self.latest_version() if version is None else version
        if not os.path.exists(self._version_path(v)):
            raise FileNotFoundError(f"no version {v} to tag")
        d = os.path.join(self.root, "_tags")
        os.makedirs(d, exist_ok=True)
        _atomic_write_json(os.path.join(d, f"{name}.json"), {"version": v})
        return v

    def tags(self) -> dict[str, int]:
        self._require_local("tags")  # no directory listing over http
        d = os.path.join(self.root, "_tags")
        out: dict[str, int] = {}
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".json"):
                    with open(os.path.join(d, f)) as fh:
                        out[f[:-5]] = int(json.load(fh)["version"])
        return out

    def delete_tag(self, name: str) -> None:
        self._require_local("delete_tag")
        os.unlink(os.path.join(self.root, "_tags", f"{name}.json"))

    def _commit(self, man: dict, expect_version: int | None = None) -> int:
        """Publish ``man`` as the next version via atomic link-if-absent."""
        v = man["version"]
        if expect_version is not None and v != expect_version:
            raise CommitConflict(
                f"derived against version {expect_version}, head moved to {v}")
        tmp = self._version_path(v) + f".stage-{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(man, f)
        try:
            os.link(tmp, self._version_path(v))
        except FileExistsError:
            raise CommitConflict(
                f"version {v} already committed at {self.root}") from None
        finally:
            os.unlink(tmp)
        _atomic_write_json(os.path.join(self.root, "_latest.json"),
                           {"version": v})
        return v

    # ------------------------------------------------------------------
    # schema
    # ------------------------------------------------------------------

    @staticmethod
    def _cols_of(tbl_schema: pa.Schema) -> dict[str, str]:
        return {n: str(tbl_schema.field(n).type) for n in tbl_schema.names}

    def schema_columns(self, version: int | None = None) -> dict[str, str]:
        return dict(self.manifest(version)["columns"])

    # ------------------------------------------------------------------
    # writes (each = one new version)
    # ------------------------------------------------------------------

    def _next_fragment_id(self, man: dict) -> int:
        return 1 + max((f["id"] for f in man["fragments"]), default=-1)

    def append_table(self, tbl: pa.Table) -> int:
        """Driver-side single-fragment append (small batches / tests)."""
        self._require_local("append_table")
        man = self.manifest()
        name = f"frag-{_uuid.uuid4().hex[:12]}.parquet"
        pq.write_table(tbl, os.path.join(self.root, self.DATA, name))
        return self._append_descriptors(
            man, [{"path": f"{self.DATA}/{name}", "rows": tbl.num_rows,
                   "stats": _table_stats(tbl)}],
            self._cols_of(tbl.schema))

    def append_files(self, paths: list[str],
                     fn: Callable[[pa.Table], pa.Table] | None = None) -> int:
        """Distributed order-stable append: ONE fragment per input
        Parquet file, fragment order == ``paths`` order, row order
        preserved within each file (``fn``, when given, transforms each
        file's table row-stably — e.g. a filter). This is the Lance
        "import files" path: data is copied by Ray tasks, never through
        the driver; only (path, rows) descriptors come back."""
        self._require_local("append_files")
        import ray.data

        man = self.manifest()
        root, data, deletes = self.root, self.DATA, self.DELETES

        def _one(batch: pa.Table) -> pa.Table:
            outs = {"ord": [], "path": [], "rows": [], "stats": []}
            for row in batch.to_pylist():
                t = pq.read_table(row["src"])
                if fn is not None:
                    t = fn(t)
                name = f"frag-{_uuid.uuid4().hex[:12]}.parquet"
                pq.write_table(t, os.path.join(root, data, name))
                outs["ord"].append(row["ord"])
                outs["path"].append(f"{data}/{name}")
                outs["rows"].append(t.num_rows)
                outs["stats"].append(json.dumps(_table_stats(t)))
            return pa.table({"ord": pa.array(outs["ord"], pa.int64()),
                             "path": pa.array(outs["path"], pa.string()),
                             "rows": pa.array(outs["rows"], pa.int64()),
                             "stats": pa.array(outs["stats"], pa.string())})

        items = [{"ord": i, "src": p} for i, p in enumerate(paths)]
        descs = (ray.data.from_items(items, override_num_blocks=len(items))
                 .map_batches(_one, batch_format="pyarrow")
                 .take_all())  # one kilobyte row per fragment — bounded
        descs.sort(key=lambda d: d["ord"])
        first = pq.ParquetFile(os.path.join(self.root, descs[0]["path"]))
        return self._append_descriptors(
            man, [{"path": d["path"], "rows": d["rows"],
                   "stats": json.loads(d["stats"])} for d in descs],
            self._cols_of(first.schema_arrow))

    def append_dataset(self, ds) -> int:
        """Distributed append of a Ray Dataset: each block becomes a
        fragment (unordered — Lance appends are unordered too)."""
        self._require_local("append_dataset")
        root, data = self.root, self.DATA
        man = self.manifest()

        def _write(batch: pa.Table) -> pa.Table:
            name = f"frag-{_uuid.uuid4().hex[:12]}.parquet"
            pq.write_table(batch, os.path.join(root, data, name))
            return pa.table({"path": pa.array([f"{data}/{name}"]),
                             "rows": pa.array([batch.num_rows], pa.int64()),
                             "stats": pa.array([json.dumps(
                                 _table_stats(batch))], pa.string())})

        descs = ds.map_batches(_write, batch_format="pyarrow",
                               batch_size=None).take_all()
        schema = pq.ParquetFile(
            os.path.join(root, descs[0]["path"])).schema_arrow
        return self._append_descriptors(
            man, [{"path": d["path"], "rows": d["rows"],
                   "stats": json.loads(d["stats"])} for d in descs],
            self._cols_of(schema))

    def _append_descriptors(self, man: dict, descs: list[dict],
                            cols: dict[str, str]) -> int:
        if man["columns"] and {k: v for k, v in man["columns"].items()
                               if k in cols} != cols:
            raise ValueError(
                f"append schema {cols} incompatible with table schema "
                f"{man['columns']}")
        nid = self._next_fragment_id(man)
        frags = list(man["fragments"]) + [
            {"id": nid + i, "path": d["path"], "rows": int(d["rows"]),
             "deletion": None, "dead": 0, "extras": [],
             "stats": d.get("stats") or {}}
            for i, d in enumerate(descs)
        ]
        return self._commit({
            "version": man["version"] + 1, "parent": man["version"],
            "operation": "append",
            "columns": man["columns"] or cols, "fragments": frags,
        }, expect_version=man["version"] + 1)

    def delete(self, predicate: Callable[[pa.Table], np.ndarray],
               columns: list[str]) -> int:
        """Delete rows where ``predicate`` (a vectorized fn over the
        listed columns, returning a bool mask) holds. One Ray task per
        fragment reads ONLY ``columns``, merges matching positions into
        the fragment's existing deletion vector, and writes a NEW
        deletion file — old versions keep their own (time travel)."""
        self._require_local("delete")
        man = self.manifest()
        frags = self._deleted_fragments(man, predicate, columns)
        return self._commit({
            "version": man["version"] + 1, "parent": man["version"],
            "operation": "delete",
            "columns": man["columns"], "fragments": frags,
        }, expect_version=man["version"] + 1)

    def _deleted_fragments(self, man: dict,
                           predicate: Callable[[pa.Table], np.ndarray],
                           columns: list[str]) -> list[dict]:
        """The fragment list with ``predicate``'s rows folded into each
        fragment's deletion vector (new deletion files written; nothing
        committed — shared by :meth:`delete` and :meth:`merge_insert`)."""
        import ray.data

        if not man["fragments"]:
            return []
        root, deletes = self.root, self.DELETES

        def _one(batch: pa.Table) -> pa.Table:
            out = {"id": [], "deletion": [], "dead": []}
            for row in batch.to_pylist():
                t = pq.read_table(os.path.join(root, row["path"]),
                                  columns=columns)
                mask = np.asarray(predicate(t), bool)
                pos = np.flatnonzero(mask).astype(np.int64)
                if row["deletion"]:
                    old = pq.read_table(
                        os.path.join(root, row["deletion"]))["pos"].to_numpy()
                    pos = np.union1d(pos, old)
                if len(pos) == 0:
                    out["id"].append(row["id"])
                    out["deletion"].append(None)
                    out["dead"].append(0)
                    continue
                name = f"frag-{row['id']}-{_uuid.uuid4().hex[:10]}.parquet"
                pq.write_table(pa.table({"pos": pa.array(pos, pa.int64())}),
                               os.path.join(root, deletes, name))
                out["id"].append(row["id"])
                out["deletion"].append(f"{deletes}/{name}")
                out["dead"].append(len(pos))
            return pa.table({"id": pa.array(out["id"], pa.int64()),
                             "deletion": pa.array(out["deletion"], pa.string()),
                             "dead": pa.array(out["dead"], pa.int64())})

        items = [{"id": f["id"], "path": f["path"], "deletion": f["deletion"]}
                 for f in man["fragments"]]
        descs = (ray.data.from_items(items, override_num_blocks=max(1, len(items)))
                 .map_batches(_one, batch_format="pyarrow")
                 .take_all())
        by_id = {d["id"]: d for d in descs}
        return [dict(f, deletion=by_id[f["id"]]["deletion"],
                     dead=int(by_id[f["id"]]["dead"]))
                for f in man["fragments"]]

    def merge_insert(self, source: pa.Table, on: str) -> int:
        """Lance ``merge_insert`` (``when_matched_update_all`` +
        ``when_not_matched_insert_all``): every live row whose ``on``
        key appears in ``source`` is replaced, the rest of ``source``
        is appended — ONE new version, so readers never observe the
        intermediate deleted state. Implementation mirrors Lance's own
        (per-fragment deletion-vector merge + a fresh fragment holding
        ``source``); ``source`` must carry every table column
        (schema-evolution columns included — the new fragment stores
        them as base columns) and is broadcast into the per-fragment
        tasks, so the contract is source ≪ table (Lance's merge path
        has the same shape; a table-scale source belongs in a hash
        join + rewrite instead). Duplicate ``on`` keys inside
        ``source`` all land; a key matching only DEAD rows is a plain
        insert."""
        self._require_local("merge_insert")
        import pyarrow.compute as pc

        man = self.manifest()
        cols = man["columns"]
        if set(source.column_names) != set(cols):
            raise ValueError(
                f"merge_insert source columns {sorted(source.column_names)} "
                f"!= table columns {sorted(cols)}")
        if on not in cols:
            raise KeyError(f"merge key {on!r} not a table column")
        key_set = source[on].combine_chunks()

        def _matched(t: pa.Table) -> np.ndarray:
            return pc.is_in(t[on], value_set=key_set).to_numpy(
                zero_copy_only=False)

        frags = self._deleted_fragments(man, _matched, columns=[on])
        name = f"frag-{_uuid.uuid4().hex[:12]}.parquet"
        src = source.select(list(cols))
        pq.write_table(src, os.path.join(self.root, self.DATA, name))
        updated = sum(f["dead"] for f in frags) - sum(
            f["dead"] for f in man["fragments"])
        frags.append({"id": self._next_fragment_id(man),
                      "path": f"{self.DATA}/{name}",
                      "rows": source.num_rows,
                      "deletion": None, "dead": 0, "extras": [],
                      "stats": _table_stats(src)})
        return self._commit({
            "version": man["version"] + 1, "parent": man["version"],
            "operation": "merge_insert",
            "stats": {"updated_rows": int(updated),
                      "inserted_rows": int(source.num_rows - updated)},
            "columns": cols, "fragments": frags,
        }, expect_version=man["version"] + 1)

    def update(self, predicate: Callable[[pa.Table], np.ndarray],
               columns: list[str],
               fn: Callable[[pa.Table], pa.Table]) -> int:
        """Lance ``update``: live rows where ``predicate`` (vectorized
        over ``columns``) holds are REPLACED by ``fn(matched_rows)``
        (row-stable, full schema in and out) — implemented as Lance
        does: per-fragment deletion-vector merge + one update fragment
        per touched input fragment, ONE new version. One Ray task per
        fragment; row data never moves through the driver."""
        self._require_local("update")
        import ray.data

        man = self.manifest()
        root, data, deletes = self.root, self.DATA, self.DELETES
        all_cols = list(man["columns"])

        def _one(batch: pa.Table) -> pa.Table:
            out = {"id": [], "deletion": [], "dead": [],
                   "path": [], "rows": [], "stats": []}
            for row in batch.to_pylist():
                frag = json.loads(row["frag"])
                live = _load_fragment(root, man, frag, None, all_cols)
                mask = np.asarray(predicate(live.select(columns)), bool)
                n_hit = int(mask.sum())
                if n_hit == 0:
                    continue
                upd = fn(live.filter(pa.array(mask)))
                if (set(upd.column_names) != set(all_cols)
                        or upd.num_rows != n_hit):
                    raise ValueError(
                        "update fn must return the full schema, row-"
                        f"stable ({n_hit} rows); got {upd.num_rows} × "
                        f"{sorted(upd.column_names)}")
                # matched LIVE rows -> physical positions -> deletion
                if frag["deletion"]:
                    dead = pq.read_table(os.path.join(
                        root, frag["deletion"]))["pos"].to_numpy()
                    phys_live = np.setdiff1d(
                        np.arange(frag["rows"], dtype=np.int64), dead,
                        assume_unique=True)
                else:
                    dead = np.empty(0, np.int64)
                    phys_live = np.arange(frag["rows"], dtype=np.int64)
                pos = np.union1d(phys_live[mask], dead)
                dname = f"frag-{frag['id']}-{_uuid.uuid4().hex[:10]}.parquet"
                pq.write_table(pa.table({"pos": pa.array(pos, pa.int64())}),
                               os.path.join(root, deletes, dname))
                uname = f"frag-{_uuid.uuid4().hex[:12]}.parquet"
                upd = upd.select(all_cols)
                pq.write_table(upd, os.path.join(root, data, uname))
                out["id"].append(frag["id"])
                out["deletion"].append(f"{deletes}/{dname}")
                out["dead"].append(len(pos))
                out["path"].append(f"{data}/{uname}")
                out["rows"].append(upd.num_rows)
                out["stats"].append(json.dumps(_table_stats(upd)))
            return pa.table({
                "id": pa.array(out["id"], pa.int64()),
                "deletion": pa.array(out["deletion"], pa.string()),
                "dead": pa.array(out["dead"], pa.int64()),
                "path": pa.array(out["path"], pa.string()),
                "rows": pa.array(out["rows"], pa.int64()),
                "stats": pa.array(out["stats"], pa.string()),
            })

        frags_in = man["fragments"]
        if not frags_in:
            return man["version"]
        items = [{"frag": json.dumps(f)} for f in frags_in]
        descs = (ray.data.from_items(items, override_num_blocks=len(items))
                 .map_batches(_one, batch_format="pyarrow")
                 .take_all())  # kilobyte descriptors only
        by_id = {d["id"]: d for d in descs}
        frags = []
        updated = 0
        for f in frags_in:
            d = by_id.get(f["id"])
            if d is None:
                frags.append(dict(f))
            else:
                updated += d["dead"] - f["dead"]
                frags.append(dict(f, deletion=d["deletion"],
                                  dead=int(d["dead"])))
        nid = self._next_fragment_id(man)
        for f in frags_in:  # update fragments follow input-frag order
            d = by_id.get(f["id"])
            if d is not None:
                frags.append({"id": nid, "path": d["path"],
                              "rows": int(d["rows"]), "deletion": None,
                              "dead": 0, "extras": [],
                              "stats": json.loads(d["stats"])})
                nid += 1
        return self._commit({
            "version": man["version"] + 1, "parent": man["version"],
            "operation": "update",
            "stats": {"updated_rows": int(updated)},
            "columns": man["columns"], "fragments": frags,
        }, expect_version=man["version"] + 1)

    def compact(self, target_rows: int = 1 << 20,
                row_group_size: int = 4096) -> int:
        """Lance ``compact_files``: rewrite fragments so deletion
        vectors are applied, schema-evolution extras fold into the
        base file, and consecutive small fragments coalesce into bins
        of ≤ ``target_rows`` live rows — live row ORDER is preserved
        (bins are consecutive fragments), so every read/take offset is
        unchanged. Single-fragment bins that are already clean (no
        deletions, no extras) carry over untouched. One Ray task per
        rewritten bin; old versions keep reading the old files (time
        travel). No-op (already compact) returns the current version
        without committing."""
        self._require_local("compact")
        import ray.data

        man = self.manifest()
        root, data = self.root, self.DATA
        bins: list[list[dict]] = []
        cur: list[dict] = []
        cur_rows = 0
        for f in man["fragments"]:
            live = f["rows"] - f["dead"]
            if cur and cur_rows + live > target_rows:
                bins.append(cur)
                cur, cur_rows = [], 0
            cur.append(f)
            cur_rows += live
        if cur:
            bins.append(cur)

        def _clean(f: dict) -> bool:
            return f["deletion"] is None and not f["extras"]

        jobs = [(i, b) for i, b in enumerate(bins)
                if len(b) > 1 or not _clean(b[0])]
        if not jobs:
            return man["version"]

        def _one(batch: pa.Table) -> pa.Table:
            out = {"ord": [], "path": [], "rows": [], "stats": []}
            for row in batch.to_pylist():
                members = json.loads(row["members"])
                t = pa.concat_tables(
                    [_load_fragment(root, man, frag, None)
                     for frag in members])
                name = f"frag-{_uuid.uuid4().hex[:12]}.parquet"
                pq.write_table(t, os.path.join(root, data, name),
                               row_group_size=row_group_size)
                out["ord"].append(row["ord"])
                out["path"].append(f"{data}/{name}")
                out["rows"].append(t.num_rows)
                out["stats"].append(json.dumps(_table_stats(t)))
            return pa.table({"ord": pa.array(out["ord"], pa.int64()),
                             "path": pa.array(out["path"], pa.string()),
                             "rows": pa.array(out["rows"], pa.int64()),
                             "stats": pa.array(out["stats"], pa.string())})

        items = [{"ord": i, "members": json.dumps(b)} for i, b in jobs]
        descs = (ray.data.from_items(items, override_num_blocks=len(items))
                 .map_batches(_one, batch_format="pyarrow")
                 .take_all())  # one kilobyte row per rewritten bin
        by_ord = {d["ord"]: d for d in descs}
        nid = self._next_fragment_id(man)
        frags = []
        for i, b in enumerate(bins):
            if i in by_ord:
                d = by_ord[i]
                frags.append({"id": nid, "path": d["path"],
                              "rows": int(d["rows"]), "deletion": None,
                              "dead": 0, "extras": [],
                              "stats": json.loads(d["stats"])})
                nid += 1
            else:
                frags.append(dict(b[0]))
        return self._commit({
            "version": man["version"] + 1, "parent": man["version"],
            "operation": "compact",
            "stats": {"fragments_before": len(man["fragments"]),
                      "fragments_after": len(bins),
                      "rewritten": len(jobs)},
            "columns": man["columns"], "fragments": frags,
        }, expect_version=man["version"] + 1)

    def add_columns(self, fn: Callable[[pa.Table], pa.Table],
                    input_columns: list[str]) -> int:
        """Schema evolution: one Ray task per fragment reads ONLY
        ``input_columns``, computes the new column(s) for every
        PHYSICAL row (deleted rows included — alignment stays trivial
        and time-travel reads of older deletion states still merge),
        and writes a row-aligned extras file. No existing file is
        rewritten — Lance's add-column semantics."""
        self._require_local("add_columns")
        import ray.data

        man = self.manifest()
        root, extras = self.root, self.EXTRAS

        def _one(batch: pa.Table) -> pa.Table:
            out = {"id": [], "path": [], "cols": [], "stats": []}
            for row in batch.to_pylist():
                t = pq.read_table(os.path.join(root, row["path"]),
                                  columns=input_columns)
                add = fn(t)
                if add.num_rows != t.num_rows:
                    raise ValueError(
                        f"add_columns fn returned {add.num_rows} rows for a "
                        f"{t.num_rows}-row fragment — must be row-aligned")
                name = f"frag-{row['id']}-{_uuid.uuid4().hex[:10]}.parquet"
                pq.write_table(add, os.path.join(root, extras, name))
                out["id"].append(row["id"])
                out["path"].append(f"{extras}/{name}")
                out["cols"].append(json.dumps(add.column_names))
                out["stats"].append(json.dumps(_table_stats(add)))
            return pa.table({"id": pa.array(out["id"], pa.int64()),
                             "path": pa.array(out["path"], pa.string()),
                             "cols": pa.array(out["cols"], pa.string()),
                             "stats": pa.array(out["stats"], pa.string())})

        items = [{"id": f["id"], "path": f["path"]} for f in man["fragments"]]
        descs = (ray.data.from_items(items, override_num_blocks=max(1, len(items)))
                 .map_batches(_one, batch_format="pyarrow")
                 .take_all())
        by_id = {d["id"]: d for d in descs}
        new_cols: dict[str, str] = {}
        frags = []
        for f in man["fragments"]:
            d = by_id[f["id"]]
            cols = json.loads(d["cols"])
            pf = pq.ParquetFile(os.path.join(root, d["path"]))
            for c in cols:
                new_cols[c] = str(pf.schema_arrow.field(c).type)
            frags.append(dict(
                f, extras=list(f["extras"]) + [{"path": d["path"],
                                                "columns": cols,
                                                "stats": json.loads(d["stats"])}]))
        dup = set(new_cols) & set(man["columns"])
        if dup:
            raise ValueError(f"add_columns would shadow existing {sorted(dup)}")
        return self._commit({
            "version": man["version"] + 1, "parent": man["version"],
            "operation": "add_columns",
            "columns": {**man["columns"], **new_cols}, "fragments": frags,
        }, expect_version=man["version"] + 1)

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def count(self, version: int | None = None) -> int:
        """Live row count — manifest metadata only, no I/O."""
        return sum(f["rows"] - f["dead"]
                   for f in self.manifest(version)["fragments"])

    @staticmethod
    def _route_columns(man: dict, frag: dict,
                       columns: list[str] | None) -> tuple[list[str] | None,
                                                           list[tuple[str, list[str]]]]:
        """Split a projection into (base columns, [(extras path, cols)])."""
        extra_of: dict[str, str] = {}
        for ex in frag["extras"]:
            for c in ex["columns"]:
                extra_of[c] = ex["path"]
        if columns is None:
            base = [c for c in man["columns"] if c not in extra_of]
            want_extra = [c for c in man["columns"] if c in extra_of]
        else:
            missing = [c for c in columns if c not in man["columns"]]
            if missing:
                raise KeyError(f"unknown column(s) {missing}; "
                               f"table has {sorted(man['columns'])}")
            base = [c for c in columns if c not in extra_of]
            want_extra = [c for c in columns if c in extra_of]
        by_file: dict[str, list[str]] = {}
        for c in want_extra:
            by_file.setdefault(extra_of[c], []).append(c)
        return base, sorted(by_file.items())

    def prune_plan(self, version: int | None = None,
                   filter: tuple | None = None) -> tuple[list[dict], int]:
        """(fragments that may match, fragments pruned) for a range
        filter ``(col, lo, hi)`` — manifest zone maps only, zero I/O.
        A fragment's stats live on its data descriptor for base columns
        and on the extras entry for schema-evolution columns; missing
        stats never prune (old manifests / ineligible types)."""
        man = self.manifest(version)
        frags = man["fragments"]
        if filter is None:
            return list(frags), 0
        col, lo, hi = filter
        if col not in man["columns"]:
            raise KeyError(f"filter column {col!r} not in table")
        kept = []
        for f in frags:
            stats = dict(f.get("stats") or {})
            for ex in f["extras"]:
                stats.update(ex.get("stats") or {})
            if _stats_overlap(stats, col, lo, hi):
                kept.append(f)
        return kept, len(frags) - len(kept)

    def read(self, version: int | None = None,
             columns: list[str] | None = None,
             filter: tuple | None = None):
        """The table at ``version`` as a streaming Ray Dataset — one
        task per fragment; projection pushed into the Parquet reads;
        deletion vectors applied with one vectorized ``take`` per
        fragment. Output column order follows ``columns``.

        ``filter=(col, lo, hi)`` is an inclusive range predicate
        (``None`` bound = unbounded) applied EXACTLY per fragment,
        with manifest zone maps pruning non-overlapping fragments
        before any task is scheduled — Lance's scalar-filtered scan.
        The filter column need not be projected."""
        import ray.data

        man = self.manifest(version)
        root = self.root
        out_order = list(columns) if columns is not None else list(man["columns"])

        if not out_order:
            raise ValueError("empty projection")
        unknown = [c for c in out_order if c not in man["columns"]]
        if unknown:
            raise KeyError(f"unknown column(s) {unknown}; "
                           f"table has {sorted(man['columns'])}")
        read_cols = out_order
        if filter is not None and filter[0] not in out_order:
            read_cols = out_order + [filter[0]]
        read_arg = None if columns is None and len(read_cols) == len(
            man["columns"]) else read_cols

        def _load(batch: pa.Table) -> pa.Table:
            outs = []
            for row in batch.to_pylist():
                t = _load_fragment(root, man, json.loads(row["frag"]),
                                   read_arg, read_cols)
                if filter is not None:
                    t = _apply_range(t, *filter).select(out_order)
                outs.append(t)
            if not outs:
                return _empty_projection(man, out_order)
            return pa.concat_tables(outs)

        frags, _ = self.prune_plan(version, filter)
        if not frags:
            return ray.data.from_arrow(_empty_projection(man, out_order))
        items = [{"frag": json.dumps(f)} for f in frags]
        return (ray.data.from_items(items, override_num_blocks=len(items))
                .map_batches(_load, batch_format="pyarrow"))

    def take(self, offsets: list[int] | np.ndarray,
             version: int | None = None,
             columns: list[str] | None = None) -> pa.Table:
        """Point lookups by LIVE row offset (fragment order) — Lance's
        ``take``. Reads only the row groups containing the probed
        physical positions (state/accounting.read_positions); extras
        files are probed the same way. Driver-side and k-bounded by
        construction. Output rows follow ``offsets`` order; an ``off``
        column records each row's offset."""
        man = self.manifest(version)
        root = self.root
        req = np.asarray(offsets, np.int64)
        frags = man["fragments"]
        live = np.array([f["rows"] - f["dead"] for f in frags], np.int64)
        cum = np.concatenate([[0], np.cumsum(live)])
        if len(req) and (req.min() < 0 or req.max() >= cum[-1]):
            raise IndexError(f"offset out of range [0, {cum[-1]})")
        frag_of = np.searchsorted(cum, req, side="right") - 1
        out_order = list(columns) if columns is not None else list(man["columns"])
        if not out_order:
            raise ValueError("empty projection")
        pieces = []
        for fi in np.unique(frag_of):
            frag = frags[fi]
            local = np.sort(req[frag_of == fi] - cum[fi])
            if frag["deletion"]:
                dead = _fs_read_table(root, frag["deletion"])["pos"].to_numpy()
                phys_live = np.setdiff1d(
                    np.arange(frag["rows"], dtype=np.int64), dead,
                    assume_unique=True)
                phys = phys_live[local]
            else:
                phys = local
            from geomedea_ray.state.accounting import read_positions

            base, extra_files = self._route_columns(man, frag, columns)
            arrays: dict[str, pa.ChunkedArray] = {}
            if base:
                bt = read_positions("", phys, columns=base,
                                    pf=_fs_parquet_file(root, frag["path"]))
                arrays.update({c: bt[c] for c in base})
            for path, cols in extra_files:
                ex = read_positions("", phys, columns=cols,
                                    pf=_fs_parquet_file(root, path))
                arrays.update({c: ex[c] for c in cols})
            t = pa.table({c: arrays[c] for c in out_order})
            t = t.append_column("off", pa.array(local + cum[fi], pa.int64()))
            pieces.append(t)
        if not pieces:
            e = _empty_projection(man, out_order)
            return e.append_column("off", pa.array([], pa.int64()))
        out = pa.concat_tables(pieces)
        # restore the caller's offset order (k-bounded dict — duplicate
        # offsets map to the same row)
        pos_in_out = {int(o): i for i, o in enumerate(out["off"].to_pylist())}
        return out.take(pa.array([pos_in_out[int(o)] for o in req],
                                 pa.int64()))

    def added_fragments(self, version: int) -> list[dict]:
        """Fragments INTRODUCED by ``version`` (rows appended by an
        append/merge_insert commit). Rewrite commits (compact,
        restore) mint new fragment ids for OLD rows and report none."""
        man = self.manifest(version)
        if man["operation"] in ("compact", "restore"):
            return []
        if man["parent"] is None:
            prev: set[int] = set()
        else:
            prev = {f["id"] for f in self.manifest(man["parent"])["fragments"]}
        return [f for f in man["fragments"] if f["id"] not in prev]

    def read_incremental(self, from_version: int,
                         to_version: int | None = None,
                         columns: list[str] | None = None):
        """Incremental consumption: a streaming Dataset of ONLY the
        rows appended by versions in (from_version, to_version] — the
        100 TB resume shape (a checkpointed consumer processes new
        fragments instead of rescanning the corpus). Rows come back
        as-at-introduction (later deletions NOT applied — an
        incremental consumer has already processed-and-emitted earlier
        rows; retractions are a separate stream by design). ``columns``
        must exist at each fragment's introducing version
        (schema-evolution extras added later are not routed)."""
        import ray.data

        if isinstance(from_version, str):
            from_version = self.tags()[from_version]
        to_v = self._resolve(to_version)
        pairs: list[tuple[dict, dict]] = []  # (introducing manifest, frag)
        for v in self.versions():
            if from_version < v <= to_v:
                man = self.manifest(v)
                pairs.extend((man, f) for f in self.added_fragments(v))
        root = self.root
        if not pairs:
            man = self.manifest(to_v)
            out_order = (list(columns) if columns is not None
                         else list(man["columns"]))
            return ray.data.from_arrow(_empty_projection(man, out_order))

        def _load(batch: pa.Table) -> pa.Table:
            outs = []
            for row in batch.to_pylist():
                man = json.loads(row["man"])
                frag = dict(json.loads(row["frag"]), deletion=None)
                outs.append(_load_fragment(root, man, frag, columns))
            return pa.concat_tables(outs)

        items = [{"man": json.dumps({"columns": m["columns"]}),
                  "frag": json.dumps(f)} for m, f in pairs]
        return (ray.data.from_items(items, override_num_blocks=len(items))
                .map_batches(_load, batch_format="pyarrow"))

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def restore(self, version: int) -> int:
        """Lance ``restore``: make ``version``'s state the NEW head —
        committed as a fresh version (history is never rewritten, so
        a bad job's writes roll back without destroying audit trail).
        Zero data movement: the new manifest references the old
        version's files."""
        self._require_local("restore")
        old = self.manifest(version)
        head = self.manifest()
        return self._commit({
            "version": head["version"] + 1, "parent": head["version"],
            "operation": "restore", "restored_from": version,
            "columns": old["columns"], "fragments": old["fragments"],
        }, expect_version=head["version"] + 1)

    def cleanup(self) -> list[str]:
        """Delete data/deletes/extras files referenced by NO manifest
        (orphans from retried write tasks). Returns removed paths."""
        self._require_local("cleanup")
        referenced: set[str] = set()
        for v in self.versions():
            for f in self.manifest(v)["fragments"]:
                referenced.add(f["path"])
                if f["deletion"]:
                    referenced.add(f["deletion"])
                for ex in f["extras"]:
                    referenced.add(ex["path"])
        removed = []
        for sub in (self.DATA, self.DELETES, self.EXTRAS):
            d = os.path.join(self.root, sub)
            for name in os.listdir(d):
                rel = f"{sub}/{name}"
                if rel not in referenced:
                    os.unlink(os.path.join(d, name))
                    removed.append(rel)
        return removed

    def validate(self) -> bool:
        """Footer-level integrity of the LATEST version (cache gate):
        every fragment/deletion/extras file exists with the row count
        the manifest records."""
        try:
            man = self.manifest()
        except (OSError, ValueError, KeyError):
            return False
        for f in man["fragments"]:
            try:
                if _fs_parquet_file(
                        self.root, f["path"]).metadata.num_rows != f["rows"]:
                    return False
                if f["deletion"] and _fs_parquet_file(
                        self.root, f["deletion"]).metadata.num_rows != f["dead"]:
                    return False
                for ex in f["extras"]:
                    if _fs_parquet_file(
                            self.root, ex["path"]).metadata.num_rows != f["rows"]:
                        return False
            except (OSError, pa.lib.ArrowInvalid):
                return False
        return True


def _apply_range(t: pa.Table, col: str, lo, hi) -> pa.Table:
    """Exact inclusive-range mask (NULLs never match)."""
    import pyarrow.compute as pc

    mask = None
    if lo is not None:
        mask = pc.greater_equal(t[col], lo)
    if hi is not None:
        m2 = pc.less_equal(t[col], hi)
        mask = m2 if mask is None else pc.and_(mask, m2)
    return t if mask is None else t.filter(pc.fill_null(mask, False))


def _load_fragment(root: str, man: dict, frag: dict,
                   columns: list[str] | None,
                   out_order: list[str] | None = None) -> pa.Table:
    """One fragment's LIVE rows: projection routed across base/extras
    files, deletion vector applied with one vectorized take."""
    if out_order is None:
        out_order = list(columns) if columns is not None else list(man["columns"])
    base, extra_files = VersionedTable._route_columns(man, frag, columns)
    arrays: dict[str, pa.ChunkedArray] = {}
    if base:
        bt = _fs_read_table(root, frag["path"], columns=base)
        arrays.update({c: bt[c] for c in base})
    for path, cols in extra_files:
        ex = _fs_read_table(root, path, columns=cols)
        arrays.update({c: ex[c] for c in cols})
    t = pa.table({c: arrays[c] for c in out_order})
    if frag["deletion"]:
        dead = _fs_read_table(root, frag["deletion"])["pos"].to_numpy()
        live = np.setdiff1d(np.arange(frag["rows"], dtype=np.int64), dead,
                            assume_unique=True)
        t = t.take(pa.array(live))
    return t


def _empty_projection(man: dict, out_order: list[str]) -> pa.Table:
    arrs = {c: pa.array([], _parse_type(man["columns"][c])) for c in out_order}
    return pa.table(arrs) if arrs else pa.table({})


_TYPE_MAP = {
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
    "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float": pa.float32(), "double": pa.float64(), "bool": pa.bool_(),
}


def _parse_type(s: str) -> pa.DataType:
    t = _TYPE_MAP.get(s)
    if t is None:
        raise ValueError(f"unsupported column type in manifest: {s!r}")
    return t
