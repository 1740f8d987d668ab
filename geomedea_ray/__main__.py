"""CLI for the spatial dataset format — the reference's binaries as
subcommands (reference: geomedea/src/bin/info.rs:8-32 `info`,
geomedea/src/inspector.rs:148-204 `Inspector`, geomedea_geozero's
convert example).

    python -m geomedea_ray info    <dataset_dir>
    python -m geomedea_ray inspect <dataset_dir>
    python -m geomedea_ray convert <in.geojson> <dataset_dir>
    python -m geomedea_ray export  <dataset_dir> <out.geojson>
    python -m geomedea_ray bbox    <dataset_dir> MINLNG MINLAT MAXLNG MAXLAT [--stats] [--geojson=OUT]
    python -m geomedea_ray decode  <parquet_dir> <out_dir>   # resumable; re-run to resume
    python -m geomedea_ray explain <query> <sf_dir>          # ds.stats() for a gate query
    python -m geomedea_ray lance   <table_root>              # VersionedTable chain/fragments

This entry point OWNS a Ray session (guarded init; the library never
calls ray.init)."""

from __future__ import annotations

import os
import sys


_RAY_OWNED = False  # did THIS process's CLI init the session?


def _ensure_ray():
    global _RAY_OWNED
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        _RAY_OWNED = True
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_info(dataset_dir: str) -> int:
    """Header-level summary (S6 — info.rs prints header/index/section
    sizes; ours prints the manifest equivalents)."""
    from geomedea_ray.functions.geo import dequantize
    from geomedea_ray.state.manifest import Manifest

    man = Manifest.load(dataset_dir)
    ext = [round(float(x), 7) for x in dequantize(list(man.extent))]
    total_bytes = sum(p.byte_size for p in man.partitions)
    print(f"dataset:     {dataset_dir}")
    print(f"version:     {man.version}")
    print(f"rows:        {man.row_count}")
    print(f"partitions:  {len(man.partitions)}")
    print(f"data bytes:  {total_bytes}")
    print(f"extent:      lng [{ext[0]}, {ext[2]}]  lat [{ext[1]}, {ext[3]}]")
    if man.properties:
        print(f"properties:  {man.properties}")
    return 0


def cmd_inspect(dataset_dir: str) -> int:
    """Per-partition annotated dump (S7 — the Inspector's labeled byte
    ranges become per-partition file/index statistics)."""
    from geomedea_ray.functions.geo import dequantize
    from geomedea_ray.state.index import PackedRTree
    from geomedea_ray.state.manifest import Manifest

    man = Manifest.load(dataset_dir)
    cmd_info(dataset_dir)
    print()
    # hilbert range prints max..min — partitions STORE descending
    # Hilbert order (reference writer/mod.rs:77-82), so first..last
    hdr = f"{'part':>4} {'rows':>8} {'bytes':>10} {'hilbert (desc)':>23} {'index nodes':>11} {'levels':>6}  bbox(deg)"
    print(hdr)
    for p in man.partitions:
        tree = PackedRTree.load(os.path.join(dataset_dir, p.index_path))
        b = [round(float(x), 4) for x in dequantize(list(p.bounds))]
        print(
            f"{p.partition_id:>4} {p.row_count:>8} {p.byte_size:>10} "
            f"{p.hilbert_max:>11}..{p.hilbert_min:<11} {tree.node_count():>11} "
            f"{len(tree.levels):>6}  [{b[0]},{b[1]} .. {b[2]},{b[3]}]"
        )
    return 0


def cmd_convert(src: str, dataset_dir: str) -> int:
    """GeoJSON → spatial dataset (S4 + W1-W7 write pipeline)."""
    _ensure_ray()
    from geomedea_ray.pipelines.spatial_write import spatial_write
    from geomedea_ray.sources.geojson import read_geojson

    man = spatial_write(read_geojson(src), dataset_dir, tiebreak="fid",
                        properties={"source": os.path.basename(src)})
    print(f"wrote {man.row_count} features in {len(man.partitions)} partitions to {dataset_dir}")
    return 0


def cmd_export(dataset_dir: str, out_path: str) -> int:
    """Spatial dataset → one GeoJSON FeatureCollection (S5)."""
    _ensure_ray()
    from geomedea_ray.pipelines.queries import select_all
    from geomedea_ray.sources.geojson import write_geojson

    n = write_geojson(select_all(dataset_dir), out_path)
    print(f"exported {n} features to {out_path}")
    return 0


def cmd_bbox(dataset_dir: str, *rect: str) -> int:
    """select_bbox row count (R2; bbox-intersects semantics). Append
    --stats for exact I/O accounting (bytes / row groups / ranged
    requests touched vs full scan — the reference's bytes-fetched
    report, state/accounting.py). Append --geojson=OUT (`-` = stdout)
    to emit the selected features as ONE GeoJSON FeatureCollection —
    the serving shape of the reference's wasm `select_bbox`
    (geomedea-wasm/src/lib.rs:31-106 streams a FeatureCollection to
    the browser); with an http:// dataset root this IS that layer:
    ranged GETs against a remote store, features out."""
    want_stats = "--stats" in rect
    geojson_out = next((a.split("=", 1)[1] for a in rect
                        if a.startswith("--geojson=")), None)
    rect = tuple(x for x in rect if not x.startswith("--"))
    _ensure_ray()
    from geomedea_ray.pipelines.queries import bbox_slice

    r = tuple(float(x) for x in rect)
    sel = bbox_slice(dataset_dir, r)
    if geojson_out is not None:
        from geomedea_ray.sources.geojson import write_geojson

        if geojson_out == "-":
            import tempfile

            with tempfile.NamedTemporaryFile("r", suffix=".geojson") as tf:
                n = write_geojson(sel, tf.name)
                sys.stdout.write(open(tf.name).read() + "\n")
        else:
            n = write_geojson(sel, geojson_out)
        print(f"select_bbox{r} -> {n} features "
              f"({geojson_out if geojson_out != '-' else 'stdout'})",
              file=sys.stderr)
        return 0
    n = sel.count()
    print(f"select_bbox{r} -> {n} rows")
    if want_stats:
        import json as _json

        from geomedea_ray.state.accounting import bbox_scan_stats

        st = bbox_scan_stats(dataset_dir, r)
        pct = 100 * st["bytes_touched"] / max(st["bytes_total"], 1)
        print(f"bytes touched: {st['bytes_touched']:,} / {st['bytes_total']:,} "
              f"({pct:.1f}%), row groups {st['row_groups_touched']}/"
              f"{st['row_groups_total']}, requests {st['requests']}")
        print(_json.dumps(st))
    return 0


def cmd_decode(parquet_dir: str, out_dir: str) -> int:
    """Resumable decode-stats job over an image-table parquet dir
    (pipelines/resumable.py): one lineage record per input fragment;
    a killed run resumes where it stopped — rerun the same command."""
    _ensure_ray()
    from geomedea_ray.pipelines.resumable import resumable_map
    from geomedea_ray.stages.images import DecodeStats

    def _stats(table, **_):
        return DecodeStats()(table)

    res = resumable_map(
        parquet_dir, out_dir, _stats, job_id="cli-decode",
        columns=["image_id", "bytes", "w", "h", "fmt", "phash"],
    )
    print(f"processed {res['processed']} fragment(s), skipped {res['skipped']} "
          f"already-committed; lineage: {out_dir}/lineage.jsonl")
    return 0


def cmd_explain(query: str, sf_dir: str) -> int:
    """Run one registered gate query and print Ray Data's execution
    stats (`ds.stats()`) — the per-stage wall/cpu/heap/row breakdown
    used for every perf audit in BASELINE.md. EXPLAIN-for-Ray-Data."""
    _ensure_ray()
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    queries = entry.queries()
    if query not in queries:
        import difflib

        near = difflib.get_close_matches(query, queries, n=5)
        print(f"unknown query '{query}'; close: {near}")
        print(f"({len(queries)} registered — see SURVEY.md §8)")
        return 2
    res = queries[query](sf_dir)
    if hasattr(res, "stats"):
        res = res.materialize()  # stats belong to the executed plan
        print(res.stats())
        print(f"rows: {res.count()}")
    else:  # driver-side result (pandas)
        print(f"driver-side result: {len(res)} rows (no distributed stats)")
    return 0


def cmd_lance(root: str) -> int:
    """Inspect a VersionedTable: version chain (operation, fragments,
    live rows, schema deltas), tags, and the latest manifest's
    fragment layout — the `info` equivalent for the Lance-semantics
    layer (no Ray session needed: manifests only)."""
    from geomedea_ray.sources.table_format import VersionedTable

    t = VersionedTable(root)
    try:
        vs = t.versions()
    except FileNotFoundError:
        print(f"no VersionedTable at {root}")
        return 2
    tags = {v: name for name, v in t.tags().items()}
    prev_cols: set[str] = set()
    print(f"{'ver':>4} {'operation':<14} {'frags':>5} {'live':>9} "
          f"{'dead':>7}  schema/tags")
    for v in vs:
        man = t.manifest(v)
        frags = man["fragments"]
        live = sum(f["rows"] - f["dead"] for f in frags)
        dead = sum(f["dead"] for f in frags)
        cols = set(man["columns"])
        extras = []
        if cols - prev_cols and prev_cols:
            extras.append("+" + ",".join(sorted(cols - prev_cols)))
        if v in tags:
            extras.append(f"tag:{tags[v]}")
        if man.get("stats"):
            extras.append(str(man["stats"]))
        prev_cols = cols
        print(f"{v:>4} {man['operation']:<14} {len(frags):>5} {live:>9} "
              f"{dead:>7}  {' '.join(extras)}")
    man = t.manifest()
    print(f"\nlatest v{man['version']}: columns = {man['columns']}")
    for f in man["fragments"][:20]:
        zone = f.get("stats") or {}
        first = next(iter(sorted(zone))) if zone else None
        zs = f" zone[{first}]={zone[first]}" if first else ""
        print(f"  frag {f['id']:>3}: {f['rows']:>8} rows, {f['dead']:>6} dead,"
              f" extras={len(f['extras'])}{zs}")
    if len(man["fragments"]) > 20:
        print(f"  ... {len(man['fragments']) - 20} more")
    return 0


COMMANDS = {
    "info": (cmd_info, 1),
    "lance": (cmd_lance, 1),
    "inspect": (cmd_inspect, 1),
    "convert": (cmd_convert, 2),
    "export": (cmd_export, 2),
    "bbox": (cmd_bbox, 5),
    "decode": (cmd_decode, 2),
    "explain": (cmd_explain, 2),
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(__doc__.strip())
        return 2
    fn, nargs = COMMANDS[argv[0]]
    flags = [a for a in argv[1:] if a.startswith("--")]
    known = {"bbox": {"--stats", "--geojson"}}.get(argv[0], set())
    if any(f.split("=", 1)[0] not in known for f in flags):
        bad = [f for f in flags if f.split("=", 1)[0] not in known]
        print(f"error: '{argv[0]}' does not accept {' '.join(bad)}\n")
        print(__doc__.strip())
        return 2
    n_pos = len(argv[1:]) - len(flags)
    if n_pos != nargs:
        print(f"error: '{argv[0]}' takes {nargs} argument(s)\n")
        print(__doc__.strip())
        return 2
    rc = fn(*argv[1:])
    import ray

    # only tear down a session the CLI itself created — an in-process
    # caller (pytest drives main() under the session fixture) keeps its
    if _RAY_OWNED and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
