"""Measured ranged-read execution (round-2 VERDICT item 3: S3/R3/R4).

The reference's raison d'être is an HTTP reader that fetches only the
index levels + pages a query touches (geomedea/src/http_reader.rs:
29-187, packed_r_tree/reader.rs:85-211). Round 2 shipped exact
*accounting* (state/accounting.py — bytes/row-groups/requests inferred
from metadata); this module closes the loop by EXECUTING reads through
a counting, latency-injecting file layer, so the requests/bytes ladder
is measured against the seeks the Parquet reader actually performs —
footer, metadata, and column-chunk ranges included — not inferred.

- ``RangedReadStats``: every ``read()`` is one ranged GET (offset,
  length); ``coalesced(gap)`` merges adjacent/nearby ranges the way a
  batching HTTP reader would (R4 request batching).
- ``CountingFile``: a raw file object injecting per-request latency
  and bandwidth delay (the reference simulates 100 ms / 50 Mbps in its
  README benchmark; the same parameters reproduce its story here).
- ``measured_bbox_read``: the HttpReader analogue — manifest prune →
  index-sidecar fetch → row-group-pruned Parquet reads, all through
  counting files; returns the rows AND the measured request/byte/time
  stats. ``measured_full_scan`` is the 340 MB-competitor baseline.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geomedea_ray.functions.geo import Bounds
from geomedea_ray.state.accounting import positions_to_row_groups, row_group_layout
from geomedea_ray.state.index import PackedRTree
from geomedea_ray.state.manifest import Manifest


@dataclass
class RangedReadStats:
    """Ranged-GET log: one entry per actual ``read()`` call."""

    ranges: list[tuple[str, int, int]] = field(default_factory=list)  # (file, offset, length)
    sleep_s: float = 0.0

    @property
    def requests(self) -> int:
        return len(self.ranges)

    @property
    def bytes_read(self) -> int:
        return sum(n for _, _, n in self.ranges)

    def coalesced(self, gap: int = 4096) -> int:
        """Request count after merging same-FILE ranges whose gap ≤
        ``gap`` — what a batching remote reader (reference R4) would
        issue. Ranges in different files can never merge."""
        if not self.ranges:
            return 0
        merged = 0
        spans = sorted(self.ranges)
        cur_file, cur_end = None, -1
        for f, off, n in spans:
            if f != cur_file or off > cur_end + gap:
                merged += 1
                cur_file, cur_end = f, off + n
            else:
                cur_end = max(cur_end, off + n)
        return merged

    def add(self, other: "RangedReadStats") -> None:
        self.ranges.extend(other.ranges)
        self.sleep_s += other.sleep_s


class CountingFile:
    """Raw random-access file that logs every read as a ranged request
    and optionally injects per-request latency + bandwidth delay.
    Wrap with ``pa.PythonFile`` for pyarrow readers."""

    def __init__(self, path: str, stats: RangedReadStats,
                 latency_s: float = 0.0, bandwidth_bps: float | None = None):
        self._f = open(path, "rb")
        self._path = path
        self._size = os.fstat(self._f.fileno()).st_size
        self._stats = stats
        self._latency_s = latency_s
        self._bandwidth_bps = bandwidth_bps

    # ---- file protocol (what pa.PythonFile needs) ----
    def read(self, nbytes: int = -1) -> bytes:
        off = self._f.tell()
        data = self._f.read(nbytes)
        self._stats.ranges.append((self._path, off, len(data)))
        delay = self._latency_s
        if self._bandwidth_bps:
            delay += len(data) * 8.0 / self._bandwidth_bps
        if delay > 0:
            time.sleep(delay)
            self._stats.sleep_s += delay
        return data

    def seek(self, offset: int, whence: int = 0) -> int:
        return self._f.seek(offset, whence)

    def tell(self) -> int:
        return self._f.tell()

    def size(self) -> int:
        return self._size

    def close(self) -> None:
        self._f.close()

    @property
    def closed(self) -> bool:
        return self._f.closed

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def flush(self) -> None:
        pass


def counting_parquet_file(path: str, stats: RangedReadStats,
                          latency_s: float = 0.0,
                          bandwidth_bps: float | None = None) -> pq.ParquetFile:
    return pq.ParquetFile(
        pa.PythonFile(CountingFile(path, stats, latency_s, bandwidth_bps))
    )


def _open_any(path_or_url: str, stats: RangedReadStats, latency_s: float,
              bandwidth_bps: float | None, size: int | None = None):
    """CountingFile for local paths, HttpRangeFile (real sockets) for
    http:// — both log into the same stats ledger, so the simulated and
    real ladders are directly comparable. Over HTTP, latency comes from
    the server/network, not injection."""
    if path_or_url.startswith("http://") or path_or_url.startswith("https://"):
        from geomedea_ray.state.http_store import HttpRangeFile

        return HttpRangeFile(path_or_url, stats, size=size)
    return CountingFile(path_or_url, stats, latency_s, bandwidth_bps)


def _join(base: str, rel: str) -> str:
    if base.startswith("http://") or base.startswith("https://"):
        return base.rstrip("/") + "/" + rel.replace(os.sep, "/")
    return os.path.join(base, rel)


def _read_file(path: str, stats: RangedReadStats, latency_s: float,
               bandwidth_bps: float | None, size: int | None = None) -> bytes:
    f = _open_any(path, stats, latency_s, bandwidth_bps, size=size)
    try:
        return f.read()
    finally:
        f.close()


def measured_bbox_read(
    dataset_dir: str,
    rect_deg: tuple[float, float, float, float],
    columns: list[str] | None = None,
    latency_s: float = 0.0,
    bandwidth_bps: float | None = None,
) -> tuple[pa.Table, dict]:
    """Execute a bbox query through counting files, exactly the remote
    read path (reference http_reader.rs): manifest prune (driver
    state), ONE ranged fetch per touched index sidecar, then Parquet
    reads of ONLY the row groups containing matched positions. Returns
    (rows, measured stats)."""
    man = Manifest.load(dataset_dir)
    q = Bounds.from_degrees(*rect_deg)
    stats = RangedReadStats()
    t0 = time.monotonic()
    chunks: list[pa.Table] = []
    for p in man.prune_bbox(q):
        # index sidecar: one full-file ranged fetch (tiny; the
        # reference streams levels — byte count is identical)
        idx_path = _join(dataset_dir, p.index_path)
        tree = PackedRTree.from_bytes(_read_file(
            idx_path, stats, latency_s, bandwidth_bps))
        pos = tree.query_bbox(q)
        if len(pos) == 0:
            continue
        pf = pq.ParquetFile(pa.PythonFile(_open_any(
            _join(dataset_dir, p.path), stats, latency_s, bandwidth_bps,
            size=p.byte_size or None)))
        cum, _ = row_group_layout(pf)
        pos = np.sort(np.asarray(pos, np.int64))
        rg_of = positions_to_row_groups(cum, pos)
        sel = np.unique(rg_of)
        tbl = pf.read_row_groups(sel.tolist(), columns=columns)
        counts = np.diff(cum)
        new_base = np.concatenate([[0], np.cumsum(counts[sel])])[:-1]
        local = pos - cum[rg_of] + new_base[np.searchsorted(sel, rg_of)]
        chunks.append(tbl.take(pa.array(local)))
    elapsed = time.monotonic() - t0
    out = pa.concat_tables(chunks) if chunks else None
    return out, {
        "requests": stats.requests,
        "requests_coalesced": stats.coalesced(),
        "bytes_read": stats.bytes_read,
        "elapsed_s": round(elapsed, 4),
        "simulated_wait_s": round(stats.sleep_s, 4),
        "rows": int(out.num_rows) if out is not None else 0,
    }


def measured_full_scan(
    dataset_dir: str,
    columns: list[str] | None = None,
    latency_s: float = 0.0,
    bandwidth_bps: float | None = None,
) -> tuple[pa.Table, dict]:
    """The no-index competitor baseline: fetch every partition's data
    pages through the same counting layer."""
    man = Manifest.load(dataset_dir)
    stats = RangedReadStats()
    t0 = time.monotonic()
    chunks = []
    for p in man.partitions:
        pf = pq.ParquetFile(pa.PythonFile(_open_any(
            _join(dataset_dir, p.path), stats, latency_s, bandwidth_bps,
            size=p.byte_size or None)))
        chunks.append(pf.read(columns=columns))
    elapsed = time.monotonic() - t0
    out = pa.concat_tables(chunks)
    return out, {
        "requests": stats.requests,
        "requests_coalesced": stats.coalesced(),
        "bytes_read": stats.bytes_read,
        "elapsed_s": round(elapsed, 4),
        "simulated_wait_s": round(stats.sleep_s, 4),
        "rows": int(out.num_rows),
    }
