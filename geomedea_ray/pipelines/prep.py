"""The end-to-end training-data preparation pipeline — the composite
100 TB use case the engine exists for (task brief): one streaming run

    read image+caption table
      → decode + phash-integrity verify        (drop corrupt rows)
      → exact dedup on phash                   (ONE hash shuffle)
      → caption quality filter                 (token-count bounds)
      → geocode → tile assignment → PIP join   (broadcast, fused)
      → partitioned parquet by tile prefix + lineage records

Every stage is an existing operator; this module is composition only.
The output directory is resumable-shaped: one file per tile-prefix
partition, a lineage record per partition, `_SUCCESS` marker last.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from geomedea_ray.functions import text as T
from geomedea_ray.pipelines.flagship import images_ds
from geomedea_ray.sources.polygons import polygon_arrays
from geomedea_ray.stages.dedup import dedup_exact
from geomedea_ray.stages.geocode import add_phash_lnglat, tile_batch
from geomedea_ray.stages.images import DecodeStats
from geomedea_ray.stages.pip import pip_join
from geomedea_ray.util import cached_instance

MIN_TOKENS, MAX_TOKENS = 3, 64


def _verify_and_stats(batch: pa.Table) -> pa.Table:
    """Decode-verify: keep rows whose recomputed phash matches
    (integrity), attach pixel stats."""
    stats = cached_instance("prep.DecodeStats", DecodeStats)(batch)
    keep = stats["phash_ok"]
    out = batch.filter(keep)
    s = stats.filter(keep)
    return out.append_column("mean_px", s["mean_px"]).append_column("std_px", s["std_px"])


def _quality_filter(batch: pa.Table) -> pa.Table:
    """Caption quality: token count within [MIN_TOKENS, MAX_TOKENS]."""
    n_tok = T.token_count(batch["caption"].to_pylist())
    ok = (n_tok >= MIN_TOKENS) & (n_tok <= MAX_TOKENS)
    return batch.filter(pa.array(ok)).append_column(
        "n_tokens", pa.array(n_tok[ok], pa.int64())
    )


def training_prep(sf_dir: str, out_dir: str | None = None, zoom: int = 6):
    """Run the full prep chain; returns the prepared Dataset
    (image_id, caption, n_tokens, mean_px, std_px, tile_x, tile_y,
    poly_id, poly_name). If ``out_dir`` is given, also writes
    tile-prefix-partitioned parquet + per-partition lineage."""
    ds = images_ds(sf_dir)  # all columns: bytes flow through decode
    ds = ds.map_batches(_verify_and_stats, batch_format="pyarrow",
                        batch_size=1024, zero_copy_batch=True)
    # bytes are no longer needed after decode-verify: project them out
    # BEFORE the dedup shuffle so the exchange moves ~100 B/row, not 8 KiB
    ds = ds.map_batches(
        lambda t: t.drop_columns(["bytes", "w", "h", "fmt"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ds = dedup_exact(ds, "phash", "image_id")
    ds = ds.map_batches(_quality_filter, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(add_phash_lnglat, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(tile_batch, fn_kwargs={"zoom": zoom}, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = pip_join(
        ds, polygon_arrays(),
        id_cols=["image_id", "caption", "n_tokens", "mean_px", "std_px",
                 "tile_x", "tile_y"],
        exact=True,
    )
    if out_dir is None:
        return out
    return _write_partitioned(out, out_dir, zoom)


def _write_partitioned(ds, out_dir: str, zoom: int):
    """Partitioned sink: one parquet file per tile X-prefix (resume
    unit), lineage record per partition, `_SUCCESS` last."""
    import pyarrow.parquet as pq

    from geomedea_ray.state.checkpoint import CheckpointLog, LineageRecord, op_chain_hash

    os.makedirs(out_dir, exist_ok=True)

    # bucket-key width derived from the CLUSTER (round-2 VERDICT: a
    # fixed >>2 capped write parallelism at ~16 buckets regardless of
    # node count): target ≥ 2 buckets per CPU, bounded by 2^zoom
    import math

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    target = max(16, 2 * cpus)
    shift = max(0, zoom - math.ceil(math.log2(target)))

    def _part(batch: pa.Table) -> pa.Table:
        # partition key: tile_x bucket (resume unit; one file each)
        b = (batch["tile_x"].to_numpy() >> shift).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b, pa.int64()))

    buckets = ds.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True)

    def _write(group):
        import uuid

        b = int(group["_bucket"].iloc[0])
        t = pa.Table.from_pandas(group.drop(columns="_bucket"), preserve_index=False)
        path = os.path.join(out_dir, f"tiles-x{b:03d}.parquet")
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, path)
        import pandas as pd

        return pd.DataFrame([{"bucket": b, "rows": t.num_rows,
                              "bytes": os.path.getsize(path), "path": path}])

    summary = buckets.groupby("_bucket").map_groups(_write, batch_format="pandas").to_pandas()
    log = CheckpointLog(os.path.join(out_dir, "lineage.jsonl"))
    chash = op_chain_hash("training_prep", zoom)
    log.append_all(
        [
            LineageRecord(
                job_id=f"training_prep:{os.path.basename(os.path.normpath(out_dir))}",
                partition_id=f"x{int(r.bucket):03d}", op_chain_hash=chash,
                row_count=int(r.rows), out_path=r.path,
                metrics={"bytes": int(r.bytes)},
            )
            for r in summary.itertuples()
        ]
    )
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return summary.sort_values("bucket").reset_index(drop=True)
