"""Read-path query operators over a written spatial dataset
(SURVEY §2.3: R1 select_all, R2 select_bbox, plus Hilbert-range
slices used by cell queries and kNN candidate generation).

All operators are driver-prune → distributed-probe: the manifest's
per-partition bounds/key ranges stand in for the reference's top index
levels (reference: geomedea/src/packed_r_tree/reader.rs:25-71), and an
actor pool holding loaded packed indexes probes the surviving
partitions (state amortized per actor — SURVEY §7.3).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from geomedea_ray.functions.geo import Bounds
from geomedea_ray.state.index import PackedRTree
from geomedea_ray.state.manifest import Manifest, PartitionMeta


def select_all(dataset_dir: str, columns: list[str] | None = None):
    """Full scan in stored (descending-Hilbert) order (R1 — reference:
    geomedea/src/reader.rs:313-326). Files are passed in manifest
    order; with ``preserve_order`` execution the stream reproduces the
    reference's total order.

    ``dataset_dir`` may be an ``http(s)://`` root (the reference's
    remote select_all — http_reader.rs:89-119): each Ray task then
    streams its partition over real ranged GETs."""
    import ray.data

    man = Manifest.load(dataset_dir)
    if not man.partitions:
        return ray.data.from_items([])
    if _is_url(dataset_dir):
        from geomedea_ray.state.http_store import join_path, open_parquet

        def _fetch(batch: pa.Table) -> pa.Table:
            out = []
            for row in batch.to_pylist():
                pf = open_parquet(join_path(dataset_dir, row["path"]),
                                  size=row["byte_size"] or None)
                out.append(pf.read(columns=columns))
            return pa.concat_tables(out)

        return _parts_dataset(dataset_dir, man.partitions).map_batches(
            _fetch, batch_format="pyarrow", batch_size=1
        )
    paths = [os.path.join(dataset_dir, p.path) for p in man.partitions]
    return ray.data.read_parquet(paths, columns=columns)


def _is_url(path: str) -> bool:
    return path.startswith("http://") or path.startswith("https://")


class _PartitionProbe:
    """Actor: loads a partition's packed index once, probes it per
    query, reads only matching row positions from Parquet.

    The batch it receives is a table of partition descriptors (path,
    index_path), NOT data rows — the probe fans data back out.
    """

    def __init__(self, dataset_dir: str, query: dict, columns: list[str] | None):
        self.dataset_dir = dataset_dir
        self.query = query
        self.columns = columns
        self._index_cache: dict[str, PackedRTree] = {}

    def _tree(self, index_path: str) -> PackedRTree:
        t = self._index_cache.get(index_path)
        if t is None:
            from geomedea_ray.state.http_store import fetch_bytes, join_path

            t = PackedRTree.from_bytes(
                fetch_bytes(join_path(self.dataset_dir, index_path)))
            self._index_cache[index_path] = t
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomedea_ray.state.accounting import read_positions
        from geomedea_ray.state.http_store import join_path, open_parquet

        out: list[pa.Table] = []
        q = Bounds(*self.query["bounds"])
        for row in batch.to_pylist():
            tree = self._tree(row["index_path"])
            pos = tree.query_bbox(q)
            if len(pos) == 0:
                continue
            # page-seek read (R5): only the row groups holding matched
            # positions leave storage — the reference's ranged page
            # fetches (http_reader.rs:121-187), not a full-file read;
            # over an http:// root these are REAL ranged GETs
            pf = open_parquet(join_path(self.dataset_dir, row["path"]),
                              size=row.get("byte_size") or None)
            out.append(read_positions(None, pos, self.columns, pf=pf))
        if not out:
            # empty result with the right schema
            any_path = join_path(self.dataset_dir, batch["path"][0].as_py())
            pf = open_parquet(any_path, size=batch["byte_size"][0].as_py() or None)
            return (pf.schema_arrow.empty_table() if self.columns is None
                    else pf.read(columns=self.columns).slice(0, 0))
        return pa.concat_tables(out)


def _parts_dataset(dataset_dir: str, parts: list[PartitionMeta]):
    import ray.data

    items = [
        {"path": p.path, "index_path": p.index_path, "byte_size": p.byte_size}
        for p in parts
    ]
    return ray.data.from_items(items)


def bbox_slice(
    dataset_dir: str,
    rect_deg: tuple[float, float, float, float],
    columns: list[str] | None = None,
):
    """``select_bbox`` (R2): rows whose feature bbox intersects the
    query rect — closed intervals on scaled int32, NO exact-geometry
    refinement, exactly the reference's semantics (reference:
    geomedea/src/packed_r_tree/reader.rs:36-38, reader.rs:328-346).

    Driver prunes partitions via manifest bounds; an actor pool probes
    surviving partitions' packed indexes and reads only matching rows.
    Result order within each partition is stored (Hilbert-desc) order.
    """
    import ray.data

    q = Bounds.from_degrees(*rect_deg)
    man = Manifest.load(dataset_dir)
    parts = man.prune_bbox(q)
    if not parts:
        if man.partitions:
            from geomedea_ray.state.http_store import join_path, open_parquet

            schema = open_parquet(
                join_path(dataset_dir, man.partitions[0].path),
                size=man.partitions[0].byte_size or None,
            ).schema_arrow
        else:
            schema = pa.schema([])
        return ray.data.from_arrow(schema.empty_table())
    from geomedea_ray.util import cached_instance

    qb = Bounds.from_degrees(*rect_deg).as_tuple()
    cols_key = tuple(columns) if columns else None

    def _probe(batch):
        # task fn + per-process probe cache: loaded packed indexes are
        # reused across calls in the same worker (actor-__init__
        # semantics) while the stage stays fusable/poolsbawn-free
        inst = cached_instance(
            ("queries._PartitionProbe", dataset_dir, qb, cols_key),
            lambda: _PartitionProbe(dataset_dir, {"bounds": qb}, columns),
        )
        return inst(batch)

    return _parts_dataset(dataset_dir, parts).map_batches(
        _probe, batch_format="pyarrow", batch_size=4
    )


def hilbert_range_scan(
    dataset_dir: str,
    lo: int,
    hi: int,
    columns: list[str] | None = None,
):
    """Rows with ``lo <= hilbert < hi`` — the cell-query primitive
    (a Hilbert-quadtree cell is one contiguous key range; SURVEY §7.0).
    Partition prune on manifest key ranges + Parquet row-group
    predicate pushdown on the ``hilbert`` column."""
    import pyarrow.compute as pc
    import ray.data

    man = Manifest.load(dataset_dir)
    parts = [
        p for p in man.partitions
        if p.hilbert_max >= lo and p.hilbert_min < hi
    ]
    if not parts:
        return ray.data.from_items([])
    if _is_url(dataset_dir):
        # remote path: explicit row-group prune on the hilbert column's
        # stats, then an exact filter — same pushdown, ranged GETs
        from geomedea_ray.state.http_store import join_path, open_parquet

        def _scan(batch: pa.Table) -> pa.Table:
            out = []
            for row in batch.to_pylist():
                pf = open_parquet(join_path(dataset_dir, row["path"]),
                                  size=row["byte_size"] or None)
                hidx = pf.schema_arrow.get_field_index("hilbert")
                sel = [
                    g for g in range(pf.metadata.num_row_groups)
                    if (st := pf.metadata.row_group(g).column(hidx).statistics)
                    is None or (st.max >= lo and st.min < hi)
                ]
                if not sel:
                    continue
                t = pf.read_row_groups(sel, columns=columns or None)
                h = t["hilbert"] if "hilbert" in t.column_names else (
                    pf.read_row_groups(sel, columns=["hilbert"])["hilbert"])
                mask = pc.and_(pc.greater_equal(h, pa.scalar(lo, pa.uint32())),
                               pc.less(h, pa.scalar(min(hi, 2**32 - 1), pa.uint32())))
                out.append(t.filter(mask))
            if not out:
                pf = open_parquet(join_path(dataset_dir, batch["path"][0].as_py()),
                                  size=batch["byte_size"][0].as_py() or None)
                base = pf.schema_arrow.empty_table()
                return base.select(columns) if columns else base
            return pa.concat_tables(out)

        return _parts_dataset(dataset_dir, parts).map_batches(
            _scan, batch_format="pyarrow", batch_size=1
        )
    paths = [os.path.join(dataset_dir, p.path) for p in parts]
    flt = (pc.field("hilbert") >= pa.scalar(lo, pa.uint32())) & (
        pc.field("hilbert") < pa.scalar(min(hi, 2**32 - 1), pa.uint32())
    )
    return ray.data.read_parquet(paths, columns=columns, filter=flt)


def count(dataset_dir: str) -> int:
    """Header row_count without touching data (reference header —
    geomedea/src/lib.rs:91-97)."""
    return Manifest.load(dataset_dir).row_count
