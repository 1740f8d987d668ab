"""JSONL (newline-delimited JSON) source + sink.

The document-corpus interchange format every training-data pipeline
meets (web-crawl dumps, eval sets, annotation exports).  The sink is
distributed — one ``part-*.jsonl`` file per partition written inside
the tasks, a ``manifest.json`` commit marker written last (same
orphan-file discipline as the sharded GeoJSON sink).  The reader is
``ray.data.read_json`` over the manifested files (pyarrow's NDJSON
reader: typed Arrow columns straight from the text, no Python row
loop).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa


def write_jsonl_sharded(ds, out_dir: str) -> dict:
    """Distributed JSONL sink: one file per partition + manifest.
    A retried task's orphan file is never referenced by the manifest
    and is deleted before the manifest is published."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        name = f"part-{uuid.uuid4().hex[:12]}.jsonl"
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "w") as f:
            for row in batch.to_pylist():
                f.write(json.dumps(row, ensure_ascii=False, default=str))
                f.write("\n")
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    summary = ds.map_batches(_write, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    files = sorted(summary.to_dict("records"), key=lambda r: r["path"])
    manifested = {r["path"] for r in files}
    for f in os.listdir(out_dir):
        if f.endswith(".jsonl") and f not in manifested:
            os.unlink(os.path.join(out_dir, f))
    manifest = {
        "type": "sharded-jsonl",
        "total_rows": int(summary["rows"].sum()),
        "files": files,
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def jsonl_is_valid(out_dir: str) -> bool:
    """Manifest-vs-files validation (sources/cache discipline: never
    trust a bare marker): every manifested file exists and the line
    counts match."""
    mpath = os.path.join(out_dir, "manifest.json")
    if not os.path.isfile(mpath):
        return False
    try:
        with open(mpath) as f:
            manifest = json.load(f)
        total = 0
        for r in manifest["files"]:
            p = os.path.join(out_dir, r["path"])
            with open(p, "rb") as f:
                n = sum(1 for _ in f)
            if n != r["rows"]:
                return False
            total += n
        return total == manifest["total_rows"]
    except (OSError, KeyError, ValueError):
        return False


def read_jsonl_sharded(out_dir: str, **kwargs):
    """Read a write_jsonl_sharded dir back as one Dataset (manifested
    files only, one read op — no Dataset.union)."""
    import ray.data

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    paths = [os.path.join(out_dir, r["path"]) for r in manifest["files"]]
    return ray.data.read_json(paths, **kwargs)


def documents_jsonl_path(sf_dir: str,
                         cache_root: str = "/tmp/geomedea_ray_cache") -> str:
    """The documents table exported to sharded JSONL, cached —
    validation re-counts lines against the manifest on every load."""
    import pyarrow.parquet as pq

    from geomedea_ray.sources.cache import cached_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, f"documents_jsonl_{tag}")
    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    def _build(tmp: str) -> None:
        import ray.data

        ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        write_jsonl_sharded(ds, tmp)

    def _validate(d: str) -> bool:
        return jsonl_is_valid(d)

    # cached_table validates parquet footers by default; JSONL dirs
    # carry their own manifest+count validation instead
    return cached_table(out, _build, expected_rows=None, validate=_validate)
