"""The distributed write pipeline (SURVEY §2.2, W1-W7):

    quantize → [extent aggregate] → hilbert key → DESCENDING
    range-partitioned sort → per-partition (Parquet + packed R-tree
    sidecar) → driver manifest

This is the Ray-native re-expression of the reference's
``Writer::finish`` (reference: geomedea/src/writer/mod.rs:68-135):
its in-memory entries Vec + tempfiles + mmap become the sort shuffle;
its single output file becomes one Parquet file + index sidecar per
sorted partition plus a driver-side ``manifest.json``; its
**descending** Hilbert comparator (writer/mod.rs:77-82 — ``hb.cmp(&ha)``)
becomes ``Dataset.sort(..., descending=True)``.

Scale notes: the sort is THE wide step — one range-partitioned shuffle
sampled by Ray; everything downstream (index build, partition write)
reuses its partitioning with no further shuffle. Hilbert keys of
clustered data are skewed in *value* space but Ray's sample-based range
partitioning equalizes *row counts* per partition, which is exactly the
salting-free skew answer for a sort (SURVEY §4).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geomedea_ray.stages.geocode import hilbert_batch, quantize_batch
from geomedea_ray.state.index import PackedRTree
from geomedea_ray.state.manifest import Manifest, PartitionMeta

#: Parquet row-group size ≈ the reference's 64 KiB page goal scaled to
#: Arrow row groups (unit of intra-partition random access, W4/W5;
#: reference: geomedea/src/lib.rs:45-47).
ROW_GROUP_SIZE = 16_384


def compute_extent(ds) -> tuple[int, int, int, int]:
    """Global dataset bounds over the quantized point columns (W2 —
    reference: writer/mod.rs:58-59). A cheap extra pass, exactly like
    the reference's pre-sort extent fold."""
    from ray.data.aggregate import Max, Min

    schema = ds.schema()
    if schema is None:  # empty after a map stage — no rows to fold
        return None
    # project to the fold columns only — Ray pushes the projection into
    # the read where possible, so the extent pass doesn't materialize
    # payload columns (measured 7.7 s → ~2 s on a 1.2M-row table whose
    # rows carry captions)
    fold_cols = (
        ["bbox_min_lng_i", "bbox_min_lat_i", "bbox_max_lng_i", "bbox_max_lat_i"]
        if "bbox_min_lng_i" in schema.names
        else ["lng_i", "lat_i"]
    )
    ds = ds.select_columns([c for c in fold_cols if c in schema.names])
    if "bbox_min_lng_i" in schema.names:
        # feature rows: extent = fold of feature BBOXES, exactly the
        # reference's extent.extend(&bounds) (writer/mod.rs:58-59)
        row = ds.aggregate(
            Min("bbox_min_lng_i", alias_name="min_lng"),
            Min("bbox_min_lat_i", alias_name="min_lat"),
            Max("bbox_max_lng_i", alias_name="max_lng"),
            Max("bbox_max_lat_i", alias_name="max_lat"),
        )
    else:
        row = ds.aggregate(
            Min("lng_i", alias_name="min_lng"),
            Min("lat_i", alias_name="min_lat"),
            Max("lng_i", alias_name="max_lng"),
            Max("lat_i", alias_name="max_lat"),
        )
    if row is None or row.get("min_lng") is None:
        return None  # empty dataset
    return (
        int(row["min_lng"]),
        int(row["min_lat"]),
        int(row["max_lng"]),
        int(row["max_lat"]),
    )


#: Full world extent in scaled units — fixed-extent mode skips the
#: extent pass (keys are then NOT bit-compatible with the reference,
#: which always uses the data extent; used for steady-state appends).
WORLD_EXTENT = (-1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000)


def write_partition(batch: pa.Table, dataset_dir: str,
                    compression: str | None = "zstd",
                    row_group_size: int = ROW_GROUP_SIZE) -> pa.Table:
    """Terminal map_batches fn, one call per sorted block: write the
    block as Parquet + packed-index sidecar, emit one summary row.
    Runs ``batch_size=None`` so a block maps 1:1 to an output
    partition (order within the block is the sort order)."""
    import time

    t0 = time.perf_counter()
    if batch.num_rows == 0:
        return _summary_table([])
    h = batch["hilbert"].to_numpy()
    if "bbox_min_lng_i" in batch.column_names:
        # feature rows carry a real bbox (W1) — index leaves use it
        tree = PackedRTree.build(
            batch["bbox_min_lng_i"].to_numpy(),
            batch["bbox_min_lat_i"].to_numpy(),
            batch["bbox_max_lng_i"].to_numpy(),
            batch["bbox_max_lat_i"].to_numpy(),
        )
    else:
        # point rows: bbox == the point (W1 degenerates)
        lng_i = batch["lng_i"].to_numpy()
        lat_i = batch["lat_i"].to_numpy()
        tree = PackedRTree.build(lng_i, lat_i, lng_i, lat_i)
    rb = tree.root_bounds()
    # filename sorts in descending-hilbert order: invert the first key
    inv = 0xFFFFFFFF - int(h[0])
    stem = f"part-{inv:010x}-{uuid.uuid4().hex[:8]}"
    ppath, ipath = stem + ".parquet", stem + ".rtree.npz"
    # compression + row-group goal mirror the reference's
    # is_compressed flag and DEFAULT_PAGE_SIZE_GOAL knob (lib.rs:45-47,
    # writer/mod.rs:329-339; its benches also run an 8 KiB page goal)
    pq.write_table(
        batch, os.path.join(dataset_dir, ppath), row_group_size=row_group_size,
        compression=compression if compression is not None else "none",
    )
    tree.save(os.path.join(dataset_dir, ipath))
    return _summary_table(
        [
            {
                "path": ppath,
                "index_path": ipath,
                "row_count": batch.num_rows,
                "hilbert_max": int(h[0]),
                "hilbert_min": int(h[-1]),
                "min_lng": rb.min_lng,
                "min_lat": rb.min_lat,
                "max_lng": rb.max_lng,
                "max_lat": rb.max_lat,
                "byte_size": os.path.getsize(os.path.join(dataset_dir, ppath)),
                "wall_s": round(time.perf_counter() - t0, 4),
            }
        ]
    )


_SUMMARY_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("index_path", pa.string()),
        ("row_count", pa.int64()),
        ("hilbert_max", pa.int64()),
        ("hilbert_min", pa.int64()),
        ("min_lng", pa.int32()),
        ("min_lat", pa.int32()),
        ("max_lng", pa.int32()),
        ("max_lat", pa.int32()),
        ("byte_size", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


def _summary_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_SUMMARY_SCHEMA)


def spatial_write(
    ds,
    dataset_dir: str,
    lng_col: str = "lng",
    lat_col: str = "lat",
    tiebreak: str | None = None,
    extent: tuple[int, int, int, int] | None = None,
    properties: dict | None = None,
    compression: str | None = "zstd",
    row_group_size: int = ROW_GROUP_SIZE,
    curve: str = "hilbert",
) -> Manifest:
    """Run the full write pipeline; returns the saved Manifest.

    ``tiebreak``: optional column for deterministic order among equal
    Hilbert keys (the reference's sort is stable by insertion order —
    writer/mod.rs:77-82; Ray's shuffle sort is not, so reproducible
    output needs an explicit key — SURVEY §7.5).

    ``curve``: 'hilbert' (default, reference-bit-compatible) or
    'morton' (Z-order) — the stored layout's space-filling curve; the
    read path (bbox prune + packed index probe) is bounds-based and
    curve-agnostic, so the same queries run against either layout
    (the BASELINE.md A/B).
    """
    os.makedirs(dataset_dir, exist_ok=True)
    schema = ds.schema()
    names = list(schema.names) if schema is not None else []
    if not names:
        # empty input: the reference writes a valid 29-byte empty file
        # (lib.rs:145-151); ours is a valid empty manifest
        man = Manifest(version=1, extent=(0, 0, 0, 0), row_count=0,
                       partitions=[], properties=properties or {})
        man.save(dataset_dir)
        return man
    if "lng_i" not in names:
        ds = ds.map_batches(
            quantize_batch,
            fn_kwargs={"lng_col": lng_col, "lat_col": lat_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # else: rows already carry lng_i/lat_i (e.g. feature tables from
    # sources/geojson.py where they're the integer bbox center —
    # re-quantizing through degrees would break bit-compat)
    if extent is None:
        extent = compute_extent(ds)
    if extent is None:  # schema known but zero rows
        man = Manifest(version=1, extent=(0, 0, 0, 0), row_count=0,
                       partitions=[], properties=properties or {})
        man.save(dataset_dir)
        return man
    ds = ds.map_batches(
        hilbert_batch, fn_kwargs={"extent": extent, "curve": curve},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if tiebreak is None:
        ds = ds.sort("hilbert", descending=True)
    else:
        ds = ds.sort(["hilbert", tiebreak], descending=[True, False])
    summaries = ds.map_batches(
        write_partition,
        fn_kwargs={"dataset_dir": dataset_dir, "compression": compression,
                   "row_group_size": row_group_size},
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()

    summaries.sort(key=lambda r: (-r["hilbert_max"], -r["hilbert_min"], r["path"]))
    parts = [
        PartitionMeta(
            partition_id=i,
            path=r["path"],
            index_path=r["index_path"],
            row_count=r["row_count"],
            hilbert_max=r["hilbert_max"],
            hilbert_min=r["hilbert_min"],
            bounds=(r["min_lng"], r["min_lat"], r["max_lng"], r["max_lat"]),
            byte_size=r["byte_size"],
        )
        for i, r in enumerate(summaries)
    ]
    man = Manifest(
        version=1,
        extent=extent,
        row_count=sum(p.row_count for p in parts),
        partitions=parts,
        properties=properties or {},
    )
    man.save(dataset_dir)

    # per-partition lineage + metrics (north rule; state/checkpoint.py).
    # The manifest is the all-or-nothing commit for a sorted write (sort
    # partitions have no stable pre-run identity), but each partition
    # still logs its lineage record so metrics/audit survive per shard.
    from geomedea_ray.state.checkpoint import CheckpointLog, LineageRecord, op_chain_hash

    chash = op_chain_hash("spatial_write", lng_col, lat_col, tiebreak, extent)
    log = CheckpointLog(os.path.join(dataset_dir, "lineage.jsonl"))
    log.append_all(
        [
            LineageRecord(
                job_id=f"spatial_write:{os.path.basename(os.path.normpath(dataset_dir))}",
                partition_id=p.path,
                op_chain_hash=chash,
                row_count=p.row_count,
                out_path=p.path,
                metrics={
                    "byte_size": p.byte_size,
                    "wall_s": s["wall_s"],
                    "hilbert_range": [p.hilbert_min, p.hilbert_max],
                },
            )
            for p, s in zip(parts, summaries)
        ]
    )
    return man


def spatial_append(
    ds,
    dataset_dir: str,
    lng_col: str = "lng",
    lat_col: str = "lat",
    tiebreak: str | None = None,
    compression: str | None = "zstd",
    row_group_size: int = ROW_GROUP_SIZE,
) -> Manifest:
    """Append new rows to an EXISTING spatial dataset (steady-state
    ingest — the reference is write-once; SURVEY §2.5). The new batch
    runs the same sort+index pipeline under the STORED extent (keys
    stay comparable across appends; out-of-extent coordinates are
    clamped FOR THE KEY ONLY — stored values and partition bounds use
    the true coordinates, so bbox pruning stays exact). New partitions
    are appended to the manifest atomically; partition Hilbert ranges
    of different appends may overlap, so ``select_all`` total order
    weakens to per-append order (bbox/cell queries are unaffected —
    they prune by per-partition bounds/ranges, not global order).
    """

    man = Manifest.load(dataset_dir)
    if man.row_count == 0:
        return spatial_write(ds, dataset_dir, lng_col=lng_col, lat_col=lat_col,
                             tiebreak=tiebreak, compression=compression,
                             row_group_size=row_group_size,
                             properties=man.properties)
    # the KEY extent is the one the FIRST write used — the manifest's
    # ``extent`` grows to the true data bounds on every append, so keys
    # must come from the stashed original or appends after the first
    # would hash under a different grid (incomparable hilbert ranges
    # across partitions → broken range pruning)
    extent = tuple(man.properties.get("key_extent", man.extent))

    if "lng_i" not in (ds.schema().names if ds.schema() is not None else []):
        ds = ds.map_batches(
            quantize_batch, fn_kwargs={"lng_col": lng_col, "lat_col": lat_col},
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def _clamped_hilbert(batch: pa.Table) -> pa.Table:
        from geomedea_ray.functions.hilbert import scaled_hilbert

        gx = np.clip(batch["lng_i"].to_numpy(), extent[0], extent[2])
        gy = np.clip(batch["lat_i"].to_numpy(), extent[1], extent[3])
        h = scaled_hilbert(gx, gy, extent)
        return batch.append_column("hilbert", pa.array(h, pa.uint32()))

    ds = ds.map_batches(_clamped_hilbert, batch_format="pyarrow", zero_copy_batch=True)
    if tiebreak is None:
        ds = ds.sort("hilbert", descending=True)
    else:
        ds = ds.sort(["hilbert", tiebreak], descending=[True, False])
    summaries = ds.map_batches(
        write_partition,
        fn_kwargs={"dataset_dir": dataset_dir, "compression": compression,
                   "row_group_size": row_group_size},
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    summaries.sort(key=lambda r: (-r["hilbert_max"], -r["hilbert_min"], r["path"]))

    next_id = max((p.partition_id for p in man.partitions), default=-1) + 1
    new_parts = [
        PartitionMeta(
            partition_id=next_id + i,
            path=r["path"], index_path=r["index_path"], row_count=r["row_count"],
            hilbert_max=r["hilbert_max"], hilbert_min=r["hilbert_min"],
            bounds=(r["min_lng"], r["min_lat"], r["max_lng"], r["max_lat"]),
            byte_size=r["byte_size"],
        )
        for i, r in enumerate(summaries)
    ]
    # true extent grows with the data (keys stay under the ORIGINAL
    # extent; the manifest records both)
    new_extent = extent
    for p in new_parts:
        new_extent = (min(new_extent[0], p.bounds[0]), min(new_extent[1], p.bounds[1]),
                      max(new_extent[2], p.bounds[2]), max(new_extent[3], p.bounds[3]))
    props = dict(man.properties)
    props.setdefault("key_extent", list(extent))
    man2 = Manifest(
        version=man.version,
        extent=new_extent,
        row_count=man.row_count + sum(p.row_count for p in new_parts),
        partitions=man.partitions + new_parts,
        properties=props,
    )
    man2.save(dataset_dir)  # atomic replace = the append commit point

    from geomedea_ray.state.checkpoint import CheckpointLog, LineageRecord, op_chain_hash

    chash = op_chain_hash("spatial_append", lng_col, lat_col, tiebreak, extent)
    log = CheckpointLog(os.path.join(dataset_dir, "lineage.jsonl"))
    log.append_all(
        [
            LineageRecord(
                job_id=f"spatial_append:{os.path.basename(os.path.normpath(dataset_dir))}",
                partition_id=p.path, op_chain_hash=chash, row_count=p.row_count,
                out_path=p.path,
                metrics={"byte_size": p.byte_size, "wall_s": s["wall_s"],
                         "hilbert_range": [p.hilbert_min, p.hilbert_max]},
            )
            for p, s in zip(new_parts, summaries)
        ]
    )
    return man2


def spatial_compact(dataset_dir: str, tiebreak: str | None = None,
                    compression: str | None = "zstd",
                    row_group_size: int = ROW_GROUP_SIZE) -> Manifest:
    """Maintenance job: rewrite a dataset whose partitions' Hilbert
    ranges overlap (the steady state after ``spatial_append``) into a
    fresh global sort — restores total select_all order and disjoint
    partition key ranges. New partition files are written into the SAME
    directory, the manifest swap is atomic (os.replace), and the old
    partition files are deleted only after the new manifest is live —
    a reader holding the old manifest mid-swap still sees consistent
    data until the final GC step."""
    from geomedea_ray.pipelines.queries import select_all

    man = Manifest.load(dataset_dir)
    old_files = [p.path for p in man.partitions] + [p.index_path for p in man.partitions]
    if not man.partitions:
        return man
    ds = select_all(dataset_dir)
    # strip derived columns; the write pipeline recomputes the key
    # under the TRUE extent (appends may have used a clamped key extent)
    drop = [c for c in ("hilbert",) if c in ds.schema().names]
    if drop:
        ds = ds.map_batches(lambda t: t.drop_columns(drop), batch_format="pyarrow",
                            zero_copy_batch=True)
    props = {k: v for k, v in man.properties.items() if k != "key_extent"}
    man2 = spatial_write(ds, dataset_dir, tiebreak=tiebreak, properties=props,
                         compression=compression, row_group_size=row_group_size)
    for f in old_files:  # GC after the atomic manifest swap
        try:
            os.remove(os.path.join(dataset_dir, f))
        except FileNotFoundError:
            pass
    return man2
