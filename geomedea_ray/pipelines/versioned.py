"""Gate queries over the VersionedTable (Lance-semantics) layer.

BASELINE.json's input_hint names "Lance tables of image + caption
pairs" as the engine's input format; sources/table_format.py is that
layer (Parquet physical encoding — pylance is absent in the sandbox,
documented there). These queries exercise its FULL lifecycle against
DuckDB oracles:

    v1  import the base image table (one fragment per source file,
        order-stable)
    v2  append derived rows: base rows with rid % 4 == 1,
        image_id prefixed 'app-'  (SQL-mirrorable derivation)
    v3  delete rows with rid % 7 == 0   (deletion vectors; hits base
        AND appended copies of the same rid)
    v4  add_columns caption_len = LENGTH(caption)  (schema evolution)
    v5  compact (deletion vectors applied, extras folded into base
        files, small fragments coalesced — logically a no-op: v5
        reads share v4's oracle)
    v6  merge_insert on image_id: source = base rows with
        rid % 10 == 3, caption suffixed '+u' — matching LIVE rows are
        replaced, keys alive only as deleted rows re-insert, 'app-'
        copies are untouched (distinct key)
    v7  update: live rows with rid % 9 == 5 get caption suffixed '!'
        (caption_len recomputed) — per-fragment delete + update
        fragments, hits base, 'app-' copies AND '+u' merge rows (rid
        parses from the id's last 12 digits in every variant)

``rid`` = the image_id's numeric suffix (``RIGHT(image_id, 12)`` /
``utf8_slice_codeunits(id, -12)``) — uniformly distributed and
non-negative, so ``%`` agrees between numpy and DuckDB. (phash is NOT
usable here: the average-hash of gradient images has structurally
degenerate low bits — all-zero at sf0.001 — which an early version of
this fixture tripped over.)

The oracle mirrors fragment order as (grp, filename, file_row_number):
v1 fragments follow sorted(base files) and v2 fragments re-traverse
the same files in order with a row-stable filter, so DuckDB's
``read_parquet(..., filename=true, file_row_number=true)`` reproduces
the engine's live-offset numbering exactly — which makes even
``take()`` (point lookups by offset) hash-checkable.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from geomedea_ray.pipelines.flagship import CACHE_ROOT, n_images_for
from geomedea_ray.sources.synth import image_table_path
from geomedea_ray.sources.table_format import VersionedTable

#: fixed probe offsets for lance_take (plus first/last live rows)
TAKE_PROBES = (0, 7, 123, 999)


def _base_files(sf_dir: str) -> list[str]:
    n = n_images_for(sf_dir)
    return sorted(glob.glob(os.path.join(image_table_path(n), "*.parquet")))


def _rid(ids: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.utf8_slice_codeunits(ids, start=-12), pa.int64())


def _append_transform(t: pa.Table) -> pa.Table:
    rid = _rid(t["image_id"]).to_numpy()  # pyarrow has no mod kernel
    t = t.filter(pa.array(rid % 4 == 1))
    new_id = pc.binary_join_element_wise(
        pa.array(["app-"] * t.num_rows, pa.string()), t["image_id"], "")
    return t.set_column(t.schema.get_field_index("image_id"), "image_id",
                        new_id)


def _delete_pred(t: pa.Table) -> np.ndarray:
    return (_rid(t["image_id"]).to_numpy() % 7) == 0


def _caption_len(t: pa.Table) -> pa.Table:
    lens = pc.utf8_length(t["caption"]).cast(pa.int64())
    return pa.table({"caption_len": lens})


def _merge_source(files: list[str]) -> pa.Table:
    """merge_insert source: base rows with rid % 10 == 3, caption
    suffixed '+u' (caption_len recomputed) — keys whose live rows
    exist get replaced, keys alive only as v3-deleted rows re-insert."""
    parts = []
    for p in files:
        tb = pq.read_table(p)
        rid = _rid(tb["image_id"]).to_numpy()
        parts.append(tb.filter(pa.array(rid % 10 == 3)))
    t = pa.concat_tables(parts)
    cap = pc.binary_join_element_wise(
        t["caption"].combine_chunks(),
        pa.array(["+u"] * t.num_rows, pa.string()), "")
    t = t.set_column(t.schema.get_field_index("caption"), "caption", cap)
    return t.append_column("caption_len",
                           pc.utf8_length(cap).cast(pa.int64()))


def _update_pred(t: pa.Table) -> np.ndarray:
    return (_rid(t["image_id"]).to_numpy() % 9) == 5


def _update_fn(t: pa.Table) -> pa.Table:
    cap = pc.binary_join_element_wise(
        t["caption"].combine_chunks(),
        pa.array(["!"] * t.num_rows, pa.string()), "")
    t = t.set_column(t.schema.get_field_index("caption"), "caption", cap)
    return t.set_column(t.schema.get_field_index("caption_len"),
                        "caption_len",
                        pc.utf8_length(cap).cast(pa.int64()))


def image_versioned_table(sf_dir: str) -> VersionedTable:
    """The cached 6-version image table for this scale."""
    from geomedea_ray.sources.cache import cached_dir

    files = _base_files(sf_dir)
    n = n_images_for(sf_dir)

    def _build(tmp: str) -> None:
        t = VersionedTable.create(tmp)
        t.append_files(files)                                    # v1
        t.append_files(files, fn=_append_transform)              # v2
        t.delete(_delete_pred, columns=["image_id"])             # v3
        t.add_columns(_caption_len, input_columns=["caption"])   # v4
        t.compact(target_rows=8192)                              # v5
        t.merge_insert(_merge_source(files), on="image_id")      # v6
        t.update(_update_pred, ["image_id"], _update_fn)         # v7

    def _valid(root: str) -> bool:
        t = VersionedTable(root)
        try:
            return (t.versions() == list(range(8))
                    and t.count(1) == n
                    and "caption_len" in t.schema_columns()
                    and t.count(5) == t.count(4)
                    and t.validate())
        except (OSError, ValueError, KeyError):
            return False

    # rev suffix: bump when the version-chain derivation OR the base
    # fixture content changes — validation can't detect a predicate
    # change in an existing build (_r6: dct8 joined the fixture FMTS)
    root = cached_dir(os.path.join(CACHE_ROOT, f"images_lance_n{n}_r6"),
                      _build, _valid)
    return VersionedTable(root)


# ----------------------------------------------------------------------
# gate queries
# ----------------------------------------------------------------------


def _grouped_by_fmt(t: VersionedTable, version: int | None,
                    filter: tuple | None = None) -> pa.Table:
    """Grouped aggregate over (fmt, caption_len, phash) at ``version``
    — one streaming pass, per-block partials, driver combine of ≤ 3
    rows/fragment (fmt has 3 values: contract-small, the tile_counts
    TREE rationale)."""
    ds = t.read(version=version, columns=["fmt", "caption_len", "phash"],
                filter=filter)

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "fmt": batch["fmt"].to_pandas(),
            "caption_len": batch["caption_len"].to_numpy(),
            "phash_lo": batch["phash"].to_numpy() & 0xFFFF,
        })
        g = df.groupby("fmt", sort=True).agg(
            n=("caption_len", "size"),
            sum_caption_len=("caption_len", "sum"),
            sum_phash_lo=("phash_lo", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("fmt", sort=True).sum().reset_index())
    return pa.table({
        "fmt": pa.array(out["fmt"], pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64)),
        "sum_caption_len": pa.array(out["sum_caption_len"].to_numpy(np.int64)),
        "sum_phash_lo": pa.array(out["sum_phash_lo"].to_numpy(np.int64)),
    })


def q_lance_read_latest(sf_dir: str) -> pa.Table:
    """Read the LATEST version (v7: compacted fragments + merge_insert
    + predicate update — deletion vectors, appended merge/update
    fragments, and the schema-evolution column live in every physical
    layout at once), grouped by fmt."""
    return _grouped_by_fmt(image_versioned_table(sf_dir), None)


#: lance_filtered range — the base-id band ['app-…' copies sort below
#: 'img-', so they are excluded by the SAME comparison in both engines]
FILTER_LO, FILTER_HI = "img-000000001000", "img-000000002999"


def q_lance_filtered(sf_dir: str) -> pa.Table:
    """Scalar-filtered scan at the latest version: manifest zone maps
    prune fragments whose [min, max] image_id band misses the range
    BEFORE any task is scheduled (at sf0.01 that drops the app-copy
    bins and far base bins); the exact inclusive-range mask applies
    per fragment. The filter column is NOT projected — pushdown adds
    it to the fragment read and drops it after the mask."""
    return _grouped_by_fmt(image_versioned_table(sf_dir), None,
                           filter=("image_id", FILTER_LO, FILTER_HI))


def q_lance_read_latest_http(sf_dir: str) -> pa.Table:
    """The SAME latest-version grouped read, but with the table root
    served by the localhost range server: every manifest fetch,
    fragment read, deletion-vector load and extras load in the worker
    tasks is a REAL ranged GET (the reference's remote-store story
    applied to the versioned table). Shares lance_read_latest's
    oracle — identical rows over sockets."""
    from geomedea_ray.state.http_store import serve_dir

    t = image_versioned_table(sf_dir)
    return _grouped_by_fmt(VersionedTable(serve_dir(t.root)), None)


def q_lance_compact(sf_dir: str) -> pa.Table:
    """The same grouped aggregate at v5 (post-compaction) — compaction
    is logically a no-op, so this shares v4's oracle expression. The
    physical layout it reads is entirely rewritten files (deletion
    vectors applied, extras folded into base columns, fragments
    coalesced)."""
    return _grouped_by_fmt(image_versioned_table(sf_dir), 5)


def q_lance_time_travel(sf_dir: str) -> pa.Table:
    """Row count of every data version via actual (projected) reads —
    v2's appends visible, v3's deletions applied, v4/v5 unchanged
    (schema evolution + compaction), v6 reflecting the merge."""
    t = image_versioned_table(sf_dir)
    vs = list(range(1, t.latest_version() + 1))
    ns = [t.read(version=v, columns=["image_id"]).count() for v in vs]
    return pa.table({"version": pa.array(vs, pa.int64()),
                     "n": pa.array(ns, pa.int64())})


def q_flagship_lance(sf_dir: str):
    """The flagship headline chain (phash geocode → raster-tile
    assignment → exact PIP join) consuming the VERSIONED TABLE at its
    latest version — the north rule's literal shape: 'spatial join +
    tile assignment over Lance tables of image + caption pairs'. The
    read streams one task per fragment with (image_id, caption, phash)
    projection pushed down; compacted fragments, the merge's deletion
    vectors, and the appended merge fragment all flow through the same
    join."""
    from geomedea_ray.sources.polygons import polygon_arrays
    from geomedea_ray.stages.geocode import add_phash_lnglat, tile_batch
    from geomedea_ray.stages.pip import pip_join

    t = image_versioned_table(sf_dir)
    ds = t.read(columns=["image_id", "caption", "phash"])
    ds = ds.map_batches(add_phash_lnglat, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(tile_batch, fn_kwargs={"zoom": 6},
                        batch_format="pyarrow", zero_copy_batch=True)
    return pip_join(ds, polygon_arrays(),
                    id_cols=["image_id", "caption", "tile_x", "tile_y"],
                    exact=True)


def q_lance_incremental(sf_dir: str) -> pa.Table:
    """Incremental consumption: the appended-row deltas of the two
    row-adding commits (v1→v2 filtered append, v5→v6 merge_insert),
    each grouped by fmt — the checkpointed-consumer shape: only NEW
    fragments are streamed, the corpus is never rescanned."""
    import pandas as pd

    t = image_versioned_table(sf_dir)
    outs = []
    for step, (a, b) in (("v1_v2", (1, 2)), ("v5_v6", (5, 6)),
                         ("v6_v7", (6, 7))):
        ds = t.read_incremental(a, b, columns=["fmt", "phash"])

        def _partial(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "fmt": batch["fmt"].to_pandas(),
                "phash_lo": batch["phash"].to_numpy() & 0xFFFF,
            })
            g = df.groupby("fmt", sort=True).agg(
                n=("phash_lo", "size"),
                sum_phash_lo=("phash_lo", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
        g = parts.groupby("fmt", sort=True).sum().reset_index()
        g.insert(0, "step", step)
        outs.append(g)
    out = pd.concat(outs, ignore_index=True)
    return pa.table({
        "step": pa.array(out["step"], pa.string()),
        "fmt": pa.array(out["fmt"], pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64)),
        "sum_phash_lo": pa.array(out["sum_phash_lo"].to_numpy(np.int64)),
    })


def embeddings_versioned_table(sf_dir: str) -> VersionedTable:
    """The embeddings table imported into the versioned format (one
    fragment; list<float> columns carry no zone maps — skipped by
    design, never a prune hazard)."""
    from geomedea_ray.sources import tables
    from geomedea_ray.sources.cache import cached_dir

    src = tables.path(sf_dir, "embeddings")
    n = pq.ParquetFile(src).metadata.num_rows

    def _build(tmp: str) -> None:
        VersionedTable.create(tmp).append_files([src])

    def _valid(root: str) -> bool:
        t = VersionedTable(root)
        try:
            return t.count() == n and t.validate()
        except (OSError, ValueError, KeyError):
            return False

    root = cached_dir(os.path.join(CACHE_ROOT, f"embeddings_lance_n{n}_r1"),
                      _build, _valid)
    return VersionedTable(root)


def q_ann_topk_lance(sf_dir: str):
    """Exact cosine top-k with the corpus STREAMED FROM the versioned
    table (projection pushdown into the fragment reads) — embeddings
    flow through the north-rule table format too, not just images.
    Shares ann_topk's oracle: identical rows."""
    from geomedea_ray.pipelines.text_queries import ANN_K, ANN_QUERY_IDS
    from geomedea_ray.sources import tables
    from geomedea_ray.stages.ann import ann_topk

    src = pq.read_table(tables.path(sf_dir, "embeddings"))
    mask = np.isin(src["vec_id"].to_numpy(), ANN_QUERY_IDS)
    qm = np.stack([np.asarray(v) for v in
                   src.filter(pa.array(mask))["embedding"].to_pylist()]
                  ).astype(np.float64)
    qids = src.filter(pa.array(mask))["vec_id"].to_numpy()
    t = embeddings_versioned_table(sf_dir)
    ds = t.read(columns=["vec_id", "embedding"])
    out = ann_topk(ds, qm, qids, ANN_K, id_col="vec_id",
                   emb_col="embedding")
    return out.select_columns(["qid", "vec_id", "rank"])


def q_lance_sink(sf_dir: str) -> pa.Table:
    """Round-trip THROUGH the versioned table as a SINK: the flagship
    training_prep output (decode-verify → dedup → quality filter →
    geocode → tile → PIP join) is appended into a fresh table with
    append_dataset (one fragment per block, rows never through the
    driver) and read back grouped by poly_id — the engine WRITES the
    north-rule input format, not just reads it. The table is
    ephemeral (fresh uuid root per call, removed after)."""
    import shutil
    import uuid as _u

    import pandas as pd

    from geomedea_ray.pipelines.prep import training_prep

    ds = training_prep(sf_dir).select_columns(
        ["image_id", "n_tokens", "tile_x", "tile_y", "poly_id"])
    root = os.path.join("/tmp/geomedea_ray_cache",
                        f"lance_sink_{_u.uuid4().hex[:8]}")
    try:
        t = VersionedTable.create(root)
        t.append_dataset(ds)
        got = t.read(columns=["poly_id", "n_tokens", "tile_x"])

        def _partial(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "poly_id": batch["poly_id"].to_numpy(),
                "n_tokens": batch["n_tokens"].to_numpy(),
                "tile_x": batch["tile_x"].to_numpy().astype(np.int64),
            })
            g = df.groupby("poly_id", sort=True).agg(
                n=("n_tokens", "size"), sum_tokens=("n_tokens", "sum"),
                sum_tile_x=("tile_x", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = got.map_batches(_partial, batch_format="pyarrow").to_pandas()
        out = parts.groupby("poly_id", sort=True).sum().reset_index()
        return pa.table({
            "poly_id": pa.array(out["poly_id"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "sum_tokens": pa.array(out["sum_tokens"].to_numpy(np.int64)),
            "sum_tile_x": pa.array(out["sum_tile_x"].to_numpy(np.int64)),
        })
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_lance_take(sf_dir: str) -> pa.Table:
    """Point lookups by live offset at v4 (row-group-pruned reads
    through deletion vectors; extras column merged per probe). The
    oracle mirrors v4's offset numbering; take() on the compacted /
    merged layouts is pytest-covered (offsets preserved by compact)."""
    t = image_versioned_table(sf_dir)
    n_live = t.count(4)
    offs = sorted({*TAKE_PROBES, n_live - 1})
    return t.take(offs, version=4, columns=["image_id", "caption_len"])


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------


def _files_sql(sf_dir: str) -> str:
    return "[" + ", ".join(f"'{p}'" for p in _base_files(sf_dir)) + "]"


#: shared CTE prefix modelling the version chain: base → app (v2) →
#: live (v3/v4/v5) → src + merged (v6)
def _chain_cte(sf_dir: str) -> str:
    return "\nWITH " + _chain_body(sf_dir)


def _chain_body(sf_dir: str) -> str:
    """The chain CTE definitions WITHOUT the leading WITH — composable
    after another CTE list (flagship_lance_sql splices it after the
    image oracle fixture's ``img`` CTE)."""
    return f"""base AS (SELECT image_id, fmt, caption, phash,
                     CAST(RIGHT(image_id, 12) AS BIGINT) AS rid
              FROM read_parquet({_files_sql(sf_dir)})),
app  AS (SELECT 'app-' || image_id AS image_id, fmt, caption, phash, rid
         FROM base WHERE rid % 4 = 1),
allr AS (SELECT * FROM base UNION ALL SELECT * FROM app),
live AS (SELECT * FROM allr WHERE rid % 7 <> 0),
src  AS (SELECT image_id, fmt, caption || '+u' AS caption, phash, rid
         FROM base WHERE rid % 10 = 3),
merged AS (SELECT * FROM live
           WHERE image_id NOT IN (SELECT image_id FROM src)
           UNION ALL SELECT * FROM src),
upd  AS (SELECT image_id, fmt, caption || '!' AS caption, phash, rid
         FROM merged WHERE rid % 9 = 5),
merged2 AS (SELECT image_id, fmt,
                   CASE WHEN rid % 9 = 5 THEN caption || '!'
                        ELSE caption END AS caption,
                   phash, rid
            FROM merged)
"""


_GROUPED = """
SELECT fmt,
       CAST(COUNT(*) AS BIGINT)               AS n,
       CAST(SUM(LENGTH(caption)) AS BIGINT)   AS sum_caption_len,
       CAST(SUM(phash & 65535) AS BIGINT)     AS sum_phash_lo
FROM {rel} GROUP BY fmt ORDER BY fmt
"""


def lance_read_latest_sql(sf_dir: str) -> str:
    return _chain_cte(sf_dir) + _GROUPED.format(rel="merged2")


def lance_compact_sql(sf_dir: str) -> str:
    return _chain_cte(sf_dir) + _GROUPED.format(rel="live")


def lance_sink_sql(sf_dir: str) -> str:
    from geomedea_ray.pipelines.image_sql import training_prep_sql

    n = n_images_for(sf_dir)
    return f"""
SELECT poly_id,
       CAST(COUNT(*) AS BIGINT)       AS n,
       CAST(SUM(n_tokens) AS BIGINT)  AS sum_tokens,
       CAST(SUM(tile_x) AS BIGINT)    AS sum_tile_x
FROM ({training_prep_sql(n)}) tp
GROUP BY poly_id ORDER BY poly_id
"""


def lance_incremental_sql(sf_dir: str) -> str:
    g = ("SELECT '{step}' AS step, fmt, CAST(COUNT(*) AS BIGINT) AS n, "
         "CAST(SUM(phash & 65535) AS BIGINT) AS sum_phash_lo "
         "FROM {rel} GROUP BY fmt")
    return (_chain_cte(sf_dir)
            + g.format(step="v1_v2", rel="app")
            + "\nUNION ALL\n"
            + g.format(step="v5_v6", rel="src")
            + "\nUNION ALL\n"
            + g.format(step="v6_v7", rel="upd")
            + "\nORDER BY step, fmt")


def lance_filtered_sql(sf_dir: str) -> str:
    rel = (f"(SELECT * FROM merged2 WHERE image_id BETWEEN "
           f"'{FILTER_LO}' AND '{FILTER_HI}')")
    return _chain_cte(sf_dir) + _GROUPED.format(rel=rel)


def flagship_lance_sql(sf_dir: str) -> str:
    """PIP join + tile assignment over the v6 row set. lng/lat derive
    only from phash (version-invariant), so the oracle joins each
    merged row back to the image fixture (which carries the
    single-process-derived lng/lat) via its base id — 'app-' copies
    strip the prefix; captions come from the CHAIN (the merge's '+u'
    suffix must flow into the join output)."""
    from geomedea_ray.pipelines.image_sql import (
        _pip_union,
        _tile_exprs,
        img_cte,
    )

    n = n_images_for(sf_dir)
    tx, ty = _tile_exprs()
    return (
        img_cte(n)
        + ", " + _chain_body(sf_dir)
        + f""",
t AS (SELECT m.image_id, m.caption, g.lng AS lng, g.lat AS lat,
             {tx} AS tile_x, {ty} AS tile_y
      FROM merged2 m JOIN img g
        ON g.image_id = CASE WHEN m.image_id LIKE 'app-%'
                             THEN substr(m.image_id, 5)
                             ELSE m.image_id END)
"""
        + _pip_union("image_id, caption, tile_x, tile_y", "FROM t")
    )


def lance_time_travel_sql(sf_dir: str) -> str:
    return _chain_cte(sf_dir) + """
SELECT CAST(1 AS BIGINT) AS version, (SELECT COUNT(*) FROM base) AS n
UNION ALL SELECT 2, (SELECT COUNT(*) FROM allr)
UNION ALL SELECT 3, (SELECT COUNT(*) FROM live)
UNION ALL SELECT 4, (SELECT COUNT(*) FROM live)
UNION ALL SELECT 5, (SELECT COUNT(*) FROM live)
UNION ALL SELECT 6, (SELECT COUNT(*) FROM merged)
UNION ALL SELECT 7, (SELECT COUNT(*) FROM merged2)
ORDER BY version
"""


def lance_take_sql(sf_dir: str) -> str:
    # reproduce the live-offset numbering: fragment order is
    # (grp, filename, file_row_number) by construction of the fixture
    import duckdb  # probe n_live the same way the engine's query does

    files = _files_sql(sf_dir)
    inner = f"""
WITH base AS (SELECT image_id, caption,
                     CAST(RIGHT(image_id, 12) AS BIGINT) AS rid,
                     filename AS fn, file_row_number AS frn
              FROM read_parquet({files}, filename=true, file_row_number=true)),
app  AS (SELECT 'app-' || image_id AS image_id, caption, rid, fn, frn
         FROM base WHERE rid % 4 = 1),
allr AS (SELECT image_id, caption, rid, 0 AS grp, fn, frn FROM base
         UNION ALL
         SELECT image_id, caption, rid, 1, fn, frn FROM app),
live AS (SELECT image_id, caption,
                row_number() OVER (ORDER BY grp, fn, frn) - 1 AS off
         FROM allr WHERE rid % 7 <> 0)
"""
    n_live = duckdb.sql(inner + "SELECT COUNT(*) FROM live").fetchone()[0]
    offs = sorted({*TAKE_PROBES, n_live - 1})
    in_list = ", ".join(str(o) for o in offs)
    return (inner + f"""
SELECT image_id, CAST(LENGTH(caption) AS BIGINT) AS caption_len,
       CAST(off AS BIGINT) AS off
FROM live WHERE off IN ({in_list}) ORDER BY off
""")


# ------------------------------------------- vector index on the table

#: planted-copy id offset for the indexed-search fixture
IDX_PLANT_BASE = 9_000_000


def embeddings_indexed_table(sf_dir: str) -> VersionedTable:
    """The vector-index gate chain (state/vector_index): v1 imports the
    embeddings table and the IVF-PQ index is built AT v1; v2 appends
    exact COPIES of the three ANN query vectors (ids 9M+qid) — these
    live only in the unindexed tail, so finding them proves the
    incremental flat-scan path; v3 DELETES the original query rows —
    excluding them proves the liveness filter. The index is never
    rebuilt."""
    from geomedea_ray.pipelines.text_queries import ANN_QUERY_IDS
    from geomedea_ray.sources import tables
    from geomedea_ray.sources.cache import cached_dir
    from geomedea_ray.state.vector_index import create_vector_index

    src = tables.path(sf_dir, "embeddings")
    n = pq.ParquetFile(src).metadata.num_rows
    qid_list = list(ANN_QUERY_IDS)

    def _build(tmp: str) -> None:
        t = VersionedTable.create(tmp)
        t.append_files([src])                                  # v1
        create_vector_index(t, "embedding", id_col="vec_id", version=1)
        base = pq.read_table(src)
        mask = pc.is_in(base["vec_id"], pa.array(qid_list, pa.int64()))
        rows = base.filter(mask)
        planted = pa.table({
            "vec_id": pc.add(rows["vec_id"], IDX_PLANT_BASE),
            "embedding": rows["embedding"],
            "label": rows["label"],
        }).select(base.column_names)
        t.append_table(planted)                                # v2
        t.delete(lambda tb: np.isin(tb["vec_id"].to_numpy(), qid_list),
                 columns=["vec_id"])                           # v3

    def _valid(root: str) -> bool:
        t = VersionedTable(root)
        try:
            return (t.latest_version() == 3
                    and t.count() == n  # +3 planted, −3 deleted
                    and t.validate()
                    and os.path.exists(os.path.join(
                        root, "_indices", "embedding-v1", "index.json")))
        except (OSError, ValueError, KeyError):
            return False

    root = cached_dir(os.path.join(CACHE_ROOT,
                                   f"embeddings_lance_idx_n{n}_r1"),
                      _build, _valid)
    return VersionedTable(root)


def q_ann_topk_lance_indexed(sf_dir: str):
    """ANN served BY THE VERSIONED TABLE'S OWN INDEX at the latest
    version: the IVF-PQ index built at v1 answers for the indexed
    rows, the v2 appends are exact-scanned through read_incremental,
    and the v3 deletions are filtered out — Lance's index-plus-tail
    search semantics, no rebuild between versions. Rows-only gate
    entry (probe recall is approximate); the planted-copy rank-1,
    deleted-row-exclusion, recall and time-travel properties are
    asserted in tests/test_table_format.py."""
    from geomedea_ray.pipelines.text_queries import ANN_K, ANN_QUERY_IDS
    from geomedea_ray.sources import tables
    from geomedea_ray.state.vector_index import vector_search

    src = pq.read_table(tables.path(sf_dir, "embeddings"))
    mask = np.isin(src["vec_id"].to_numpy(), ANN_QUERY_IDS)
    qm = np.stack([np.asarray(v) for v in
                   src.filter(pa.array(mask))["embedding"].to_pylist()]
                  ).astype(np.float64)
    qids = src.filter(pa.array(mask))["vec_id"].to_numpy()
    t = embeddings_indexed_table(sf_dir)
    out = vector_search(t, "embedding", qm, qids, ANN_K, nprobe=16)
    return out.select_columns(["qid", "vec_id", "rank"])
