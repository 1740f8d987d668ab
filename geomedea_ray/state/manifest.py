"""Dataset manifest: the driver-side replacement for the reference's
single-file header + top index levels.

The reference assembles one file (header → packed index → pages)
on a single thread (reference: geomedea/src/writer/mod.rs:111-134).
Distributed, that becomes: each sorted partition writes its own
Parquet file + packed-index sidecar and reports a summary row; the
driver persists those rows as ``manifest.json`` — the "header"
(row/partition counts, global extent) plus the TOP level of the index
(per-partition bounds + Hilbert key range) used for driver-side
partition pruning before any task is launched.

Partitions are listed in descending-Hilbert order, so concatenating
them in manifest order reproduces the reference's total file order
(select_all order — reference: geomedea/src/reader.rs:447-457).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

from geomedea_ray.functions.geo import Bounds

MANIFEST_NAME = "manifest.json"


@dataclass
class PartitionMeta:
    partition_id: int
    path: str                 # parquet file, relative to dataset dir
    index_path: str           # packed R-tree sidecar, relative
    row_count: int
    hilbert_max: int          # first row's key (descending order ⇒ max)
    hilbert_min: int          # last row's key
    bounds: tuple[int, int, int, int]  # scaled int32 (min_lng, min_lat, max_lng, max_lat)
    byte_size: int = 0

    def bbox(self) -> Bounds:
        return Bounds(*self.bounds)


@dataclass
class Manifest:
    version: int
    extent: tuple[int, int, int, int]   # global scaled-int32 extent (reference "header")
    row_count: int
    partitions: list[PartitionMeta] = field(default_factory=list)
    properties: dict = field(default_factory=dict)

    def save(self, dataset_dir: str) -> str:
        p = os.path.join(dataset_dir, MANIFEST_NAME)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": self.version,
                    "extent": list(self.extent),
                    "row_count": self.row_count,
                    "properties": self.properties,
                    "partitions": [asdict(pm) for pm in self.partitions],
                },
                f,
                indent=1,
            )
        os.replace(tmp, p)  # atomic publish
        return p

    @classmethod
    def load(cls, dataset_dir: str) -> "Manifest":
        """``dataset_dir`` may be a local dir or an ``http(s)://`` root
        (the reference's remote-dataset entry point — the header fetch
        of http_reader.rs:29-55 becomes one manifest GET)."""
        if dataset_dir.startswith("http://") or dataset_dir.startswith("https://"):
            from geomedea_ray.state.http_store import fetch_bytes, join_path

            d = json.loads(fetch_bytes(join_path(dataset_dir, MANIFEST_NAME)))
        else:
            with open(os.path.join(dataset_dir, MANIFEST_NAME)) as f:
                d = json.load(f)
        parts = [
            PartitionMeta(**{**pm, "bounds": tuple(pm["bounds"])}) for pm in d["partitions"]
        ]
        return cls(
            version=d["version"],
            extent=tuple(d["extent"]),
            row_count=d["row_count"],
            partitions=parts,
            properties=d.get("properties", {}),
        )

    def prune_bbox(self, q: Bounds) -> list[PartitionMeta]:
        """Driver-side top-level index probe: partitions whose bounds
        intersect the query rect (the analogue of the reference's root
        index levels — packed_r_tree/reader.rs:25-71)."""
        return [pm for pm in self.partitions if pm.bbox().intersects(q)]
