"""The flagship pipeline over the image+caption table (BASELINE.json
north_star): geocode → Hilbert spatial sort + packed index → spatial
join (point-in-polygon) + raster-tile assignment.

Input is the deterministic synthetic image table (sources/synth.py,
exact ``input_hint`` schema); geography derives from ``phash`` bits
(stages/geocode.lnglat_from_phash). Scale knob: rows per sf tag —
the 10^12-image design target is exercised structurally (streaming,
partitioned output, no full materialization), tested at 10^3..10^5.
"""

from __future__ import annotations

import os

from geomedea_ray.pipelines import queries as Q
from geomedea_ray.pipelines.spatial_write import spatial_write
from geomedea_ray.pipelines.tiles import tile_aggregate
from geomedea_ray.sources.polygons import polygon_arrays
from geomedea_ray.sources.synth import image_table_path
from geomedea_ray.stages.geocode import add_phash_lnglat, tile_batch
from geomedea_ray.stages.pip import pip_join

CACHE_ROOT = "/tmp/geomedea_ray_cache"

#: image-table rows per testdata scale tag
N_IMAGES = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 120_000}

#: image_similar query rows + k — shared with the SQL oracle (image_sql.py)
IMAGE_SIMILAR_IDS = (0, 1, 2)
IMAGE_SIMILAR_K = 5

#: thumbnail gate-query id cutoff (first 100 zero-padded ids) — shared
#: with the SQL oracle so the two row sets can't desynchronize
THUMB_MAX_ID = "img-000000000100"


def n_images_for(sf_dir: str) -> int:
    return N_IMAGES.get(os.path.basename(os.path.normpath(sf_dir)), 2_000)


def images_ds(sf_dir: str, columns: list[str] | None = None):
    """The image+caption table for this scale (cached parquet)."""
    import ray.data

    path = image_table_path(n_images_for(sf_dir))
    return ray.data.read_parquet(path, columns=columns)


def geocoded_images(sf_dir: str, with_bytes: bool = False,
                    columns: list[str] | None = None):
    """Geocoded image stream. ``columns`` prunes the projection at the
    READ (plus the always-needed ``phash``): an aggregate that never
    looks at ``caption`` must not ship it through the chain."""
    if columns is None:
        cols = ["image_id", "phash", "caption"]
    else:
        cols = list(dict.fromkeys(list(columns) + ["phash"]))
    cols += ["bytes", "w", "h", "fmt"] if with_bytes else []
    return images_ds(sf_dir, columns=cols).map_batches(
        add_phash_lnglat, batch_format="pyarrow", zero_copy_batch=True
    )


def image_spatial_dataset(sf_dir: str) -> str:
    """Hilbert-sorted + packed-indexed image table (metadata columns
    only — ``bytes`` stays in the source files and is fetched by id,
    so the sort shuffle moves ~60 B/row instead of ~15 KiB/row)."""
    from geomedea_ray.sources.cache import cached_spatial_dataset

    n = n_images_for(sf_dir)
    return cached_spatial_dataset(
        os.path.join(CACHE_ROOT, f"images_spatial_n{n}"),
        lambda tmp: spatial_write(geocoded_images(sf_dir), tmp, tiebreak="image_id"),
        expected_rows=n,
    )


def spatial_join_tiles(sf_dir: str, zoom: int = 6):
    """The headline operator chain: PIP join + tile assignment over
    the geocoded image stream (single pass, no shuffle — polygons are
    broadcast, tile id is a stateless map)."""
    ds = geocoded_images(sf_dir)
    ds = ds.map_batches(tile_batch, fn_kwargs={"zoom": zoom}, batch_format="pyarrow",
                        zero_copy_batch=True)
    return pip_join(
        ds, polygon_arrays(), id_cols=["image_id", "caption", "tile_x", "tile_y"], exact=True
    )


def flagship(sf_dir: str):
    """entry() pipeline: join output of the flagship chain."""
    return spatial_join_tiles(sf_dir)


class FullImageChain:
    """One fused task: decode + phash-integrity check → geocode → tile
    → exact PIP join. This is the 100 TB shape of the headline — at
    real scale every row's ``bytes`` flows through the decoder, so the
    scaling benchmark includes it (a metadata-only chain is ~1 µs/row
    and measures executor overhead, not the engine). Fusing the whole
    chain into a single task fn (polygons captured in the closure —
    they're KBs; the ``ray.put`` broadcast + actor pool in
    stages/pip.py is for polygon sets that outgrow a closure) avoids a
    plasma materialization between a task stage and an actor stage."""

    def __init__(self, zoom: int = 6):
        from geomedea_ray.stages.images import DecodeStats
        from geomedea_ray.stages.pip import PIPJoiner

        self.decode = DecodeStats()
        self.joiner = PIPJoiner(
            polygon_arrays(),
            id_cols=["image_id", "caption", "tile_x", "tile_y"],
            exact=True,
        )
        self.zoom = zoom

    def __call__(self, batch):
        stats = self.decode(batch)
        ok = batch.filter(stats["phash_ok"])  # integrity-passing rows join
        return self.joiner(tile_batch(add_phash_lnglat(ok), zoom=self.zoom))


def spatial_join_tiles_scaled(sf_dir: str, repeat: int = 1, zoom: int = 6):
    """The FULL image pipeline (decode-verify + spatial join + tile
    assignment) over a ``repeat``×-replicated input — the
    scaling-bench workload. The image table's parquet fragments are
    listed ``repeat`` times in ONE ``read_parquet`` call so the
    executor sees a single wide read, NOT a ``union`` DAG (measured:
    union serializes branches — 51.7 s vs 3.1 s for the same rows).

    Fragment sizing (sources/synth.py): ~50 MB fragments × repeat give
    the executor enough native blocks for full width WITHOUT
    ``override_num_blocks`` — overriding makes Ray insert SplitBlocks,
    which un-fuses the read from the chain (measured: the split plan
    ships full-column blocks through the object store)."""
    import glob

    import ray
    import ray.data

    files = sorted(glob.glob(os.path.join(image_table_path(n_images_for(sf_dir)),
                                          "*.parquet")))
    # override_num_blocks == the EXACT native fragment count: more
    # makes Ray insert SplitBlocks, fewer coalesces — both break
    # read→map fusion (full-column blocks would round-trip the object
    # store); exact match keeps one fused task per fragment
    flist = files * max(1, repeat)
    base = ray.data.read_parquet(flist, override_num_blocks=len(flist))
    # plain task fn (lazy per-process init), NOT an actor pool: task
    # stages fuse with the read into one task, so full-column blocks
    # never round-trip through the object store
    return base.map_batches(
        _full_chain_fn, fn_kwargs={"zoom": zoom},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


_CHAIN: FullImageChain | None = None


def _full_chain_fn(batch, zoom: int = 6):
    global _CHAIN
    if _CHAIN is None or _CHAIN.zoom != zoom:
        _CHAIN = FullImageChain(zoom)  # once per worker process
    return _CHAIN(batch)


def image_bbox_slice(sf_dir: str, rect_deg=( -60.005, -40.005, 20.005, 30.005)):
    d = image_spatial_dataset(sf_dir)
    return Q.bbox_slice(d, rect_deg, columns=["image_id", "lng", "lat", "hilbert"])


def image_tile_counts(sf_dir: str, zoom: int = 6):
    # tile counting touches only geography — read just (image_id, phash),
    # not the caption column (round-1 VERDICT finding #5)
    return tile_aggregate(
        geocoded_images(sf_dir, columns=["image_id"]), zoom
    ).select_columns(["tile_x", "tile_y", "n"])


def image_tile_mosaic(sf_dir: str, zoom: int = 6):
    """Per-tile image MOSAIC: element-wise integer sum of every
    image's 8×8 grayscale block sums (the thumbnail's exact integer
    form) + image count, grouped by tile — the compose-pixels-per-tile
    shape of a real tile renderer, as a single fused pass:
    decode → thumb_q → geocode → tile → per-block partial vector sums
    → TREE combine (zoom 6 ⇒ ≤4,096 tiles, kilobyte partials).
    Integer-exact, hash-verified against 64 SUM(thumb_q[i]) columns in
    the oracle SQL."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from geomedea_ray.functions import codecs
    from geomedea_ray.pipelines.tiles import PYRAMID_DRIVER_MAX_ZOOM, TREE_FAN
    from geomedea_ray.stages.geocode import lnglat_from_phash, tile_xy_eq
    from geomedea_ray.stages.images import binary_views

    elem_cols = [f"ts{e:02d}" for e in range(64)]

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {"tile_x": pa.array([], pa.int32()),
                    "tile_y": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64())}
            cols.update({c: pa.array([], pa.int64()) for c in elem_cols})
            return pa.table(cols)
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        tq = np.empty((n, 64), np.int64)
        for idxs, stack in codecs.decode_size_groups(blobs, fmts, ws, hs):
            k, h, w, _ = stack.shape
            bh, bw = h // 8, w // 8
            # workspace output (codecs.workspace: first-touch faults)
            g = codecs.workspace("g_u16", np.uint16,
                                 k * h * w).reshape(k, h, w)
            stack.sum(axis=3, dtype=np.uint16, out=g)
            s = g.reshape(k, 8, bh, 8, bw).sum(axis=4, dtype=np.uint32)
            tq[idxs] = s.sum(axis=2, dtype=np.uint32).reshape(k, 64)
        lng, lat = lnglat_from_phash(batch["phash"].to_numpy())
        tx, ty = tile_xy_eq(lng, lat, zoom)
        key = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        starts = np.concatenate([[0], np.flatnonzero(key_s[1:] != key_s[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [n]]))
        sums = np.add.reduceat(tq[order], starts, axis=0)
        cols = {"tile_x": pa.array(tx[order][starts], pa.int32()),
                "tile_y": pa.array(ty[order][starts], pa.int32()),
                "n": pa.array(counts, pa.int64())}
        for e, c in enumerate(elem_cols):
            cols[c] = pa.array(sums[:, e], pa.int64())
        return pa.table(cols)

    partials = images_ds(sf_dir, columns=["bytes", "w", "h", "fmt", "phash"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = {"n": "sum", **{c: "sum" for c in elem_cols}}

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["tile_x", "tile_y"], as_index=False).agg(agg)

    if zoom <= PYRAMID_DRIVER_MAX_ZOOM:
        # ≤ 4^8 distinct tiles (same gate as tiles.py's pyramid tail):
        # the per-block partials are already tile-collapsed, so the
        # driver combine touches ~tiles×blocks rows — the repartition
        # barriers of the TREE combine cost more than they move
        import ray.data

        return ray.data.from_pandas(_combine(partials.to_pandas()))
    level1 = partials.repartition(TREE_FAN).map_batches(
        _combine, batch_format="pandas", batch_size=None)
    return level1.repartition(1).map_batches(
        _combine, batch_format="pandas", batch_size=None)


def image_thumbnails_q(sf_dir: str, max_id: str = THUMB_MAX_ID):
    """Driver-oracled thumbnail query: the first 100 rows' thumbnails in
    LONG INTEGER form (image_id, block_idx, tq) — tq is the exact
    integer block sum the float32 thumbnail is derived from
    (tq = thumb · 3·bh·bw, recovered with rint; error ≪ 0.5 by
    construction), so the hash compare is integer-exact while still
    exercising the real distributed Thumbnail kernel."""
    import numpy as np
    import pyarrow as pa

    from geomedea_ray.stages.images import Thumbnail
    from geomedea_ray.util import cached_instance

    def _long(batch: pa.Table) -> pa.Table:
        th = cached_instance("flagship.Thumbnail", Thumbnail)(batch)
        n = th.num_rows
        thumb = np.asarray(
            th["thumb"].combine_chunks().values.to_numpy(zero_copy_only=False),
            np.float64,
        ).reshape(n, 64)
        ws = batch["w"].to_numpy().astype(np.int64)
        hs = batch["h"].to_numpy().astype(np.int64)
        scale = (3 * (ws // 8) * (hs // 8)).astype(np.float64)
        tq = np.rint(thumb * scale[:, None]).astype(np.int64)
        ids = th["image_id"].take(pa.array(np.repeat(np.arange(n), 64)))
        return pa.table(
            {
                "image_id": ids,
                "block_idx": pa.array(np.tile(np.arange(64, dtype=np.int64), n)),
                "tq": pa.array(tq.reshape(-1), pa.int64()),
            }
        )

    ds = images_ds(sf_dir).filter(expr=f"image_id < '{max_id}'")
    return ds.map_batches(_long, batch_format="pyarrow", zero_copy_batch=True)


def image_augment_q(sf_dir: str):
    """Distributed deterministic augmentation (stages/images.Augment:
    phash-keyed hflip / rot90 / center-crop) over the full image
    table, emitting the integer-exact verification row (dims, channel
    sum, corner probes). Differential oracle: the single-process
    fixture computes the same columns while decoding (same kernel
    class, independently scheduled and batched — the established
    image-family trust model; kernel geometry has its own pytest
    goldens vs hand-rotated arrays)."""
    from geomedea_ray.stages.images import Augment
    from geomedea_ray.util import cached_instance

    def _fn(batch: pa.Table) -> pa.Table:
        return cached_instance("flagship.Augment", Augment)(batch)

    return images_ds(
        sf_dir, columns=["image_id", "bytes", "w", "h", "fmt", "phash"]
    ).map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)


#: ≤3-bit perceptual-hash distance over exact-dedup representatives;
#: with 8 bands × 8 bits the banded candidates are COMPLETE for any
#: threshold ≤ 7 (stages/dedup.hamming_band_pairs), so the output is
#: the exact pair set — shared with the SQL oracle
PHASH_NEARDUP_MAX_HAMMING = 3


def image_phash_neardup(sf_dir: str):
    """NEAR-duplicate image detection: exact phash dedup first (the
    mass-duplicate collapse — running banded LSH on raw rows would
    emit every cross-product of the exact-dup groups), then banded
    Hamming pairs over the surviving representatives
    (stages/dedup.hamming_band_pairs on the 64-bit perceptual hash,
    8×8-bit bands ⇒ exact ≤3 pair set). Output
    (id_a, id_b, hamming), hash-verified against an all-pairs
    bit_count oracle over the image fixture."""
    from geomedea_ray.stages.dedup import hamming_band_pairs, phash_dedup

    reps = phash_dedup(images_ds(sf_dir, columns=["image_id", "phash"]))
    return hamming_band_pairs(
        reps, "phash", "image_id",
        max_hamming=PHASH_NEARDUP_MAX_HAMMING, num_tables=8, max_bucket=None,
    )


def image_brightness_quantiles(sf_dir: str):
    """EXACT distributed quantiles of per-image brightness
    (floor(mean_px)) per format — decode-heavy map + the histogram
    quantile combine (stages/sketch.exact_quantiles: the (fmt,
    brightness) histogram is ≤ formats × 256 rows regardless of image
    count). floor, not round: FLOOR is bit-identical between numpy
    and SQL on exact doubles; ROUND half-rule differs."""
    import pyarrow as pa

    from geomedea_ray.stages.images import decode_stats
    from geomedea_ray.stages.sketch import exact_quantiles

    stats = decode_stats(images_ds(sf_dir))

    def _px(batch: pa.Table) -> pa.Table:
        import numpy as np

        px = np.floor(batch["mean_px"].to_numpy()).astype(np.int64)
        return pa.table({"fmt": batch["fmt"], "px": pa.array(px, pa.int64())})

    return exact_quantiles(
        stats.map_batches(_px, batch_format="pyarrow", zero_copy_batch=True),
        by="fmt", val_col="px", n_name="n_images",
    )


def image_similar(sf_dir: str, k: int = IMAGE_SIMILAR_K,
                  query_ids: tuple[int, ...] = IMAGE_SIMILAR_IDS):
    """Image similarity search: thumbnail features (stages/images.
    Thumbnail — 64-d block-mean embedding) + exact cosine top-k
    (stages/ann.ann_topk). Query vectors are rows ``query_ids`` of the
    same table (self-retrieval: rank 1 is the row itself; planted
    duplicates surface in the top ranks). Deterministic — integer
    block sums, fixed tie-break."""
    import numpy as np

    from geomedea_ray.sources.synth import oracle_image_rows
    from geomedea_ray.stages.ann import ann_topk
    from geomedea_ray.stages.images import Thumbnail, thumbnails

    thumbs = thumbnails(images_ds(sf_dir))

    # query vectors from the row oracle (no extra table scan)
    q_rows = oracle_image_rows(list(query_ids))
    q_thumb = Thumbnail()(q_rows)
    qm = np.stack([np.asarray(v) for v in q_thumb["thumb"].to_pylist()]).astype(np.float64)

    def _rename(t):
        import pyarrow as pa

        return pa.table({"vec_id": t["image_id"], "embedding": t["thumb"]})

    ds = thumbs.map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)
    out = ann_topk(ds, qm, np.asarray(query_ids, np.int64), k)
    return out.select_columns(["qid", "vec_id", "rank"])


#: multimodal packing: ViT patch size + training-sequence token budget
PACK_MM_PATCH = 8
PACK_MM_BUDGET = 1024


def image_pack_multimodal_q(sf_dir: str):
    """ViT-style MULTIMODAL sequence packing — the image-axis analogue
    of curation.q_pack_sequences: every image costs
    ``(w//8)·(h//8)`` patch tokens plus its caption's whitespace token
    count, and the corpus is packed in image_id order into fixed
    1024-token training sequences. Each image gets the sequence id and
    offset where it STARTS (concat-and-chunk semantics — an item may
    straddle a boundary, exactly like LLM text packing).

    Distribution: the exact banded prefix scan
    (stages/joins.banded_prefix_sum — per-band partials, driver carry
    over band summaries only, one band-grouped pass); nothing
    row-sized ever reaches the driver, so the plan is the 100-TB shape
    of a global ordered scan."""
    import numpy as np
    import pandas as pd

    from geomedea_ray.stages.joins import banded_prefix_sum

    ds = images_ds(sf_dir, columns=["image_id", "w", "h", "caption"])

    def _cost(df: pd.DataFrame) -> pd.DataFrame:
        iid = df["image_id"].str.slice(4).astype(np.int64)
        patches = (df["w"].to_numpy(np.int64) // PACK_MM_PATCH) * (
            df["h"].to_numpy(np.int64) // PACK_MM_PATCH)
        # .str.split() (whitespace runs) == SQL's single-space split
        # with the non-empty filter on this corpus (captions are
        # single-space joined)
        ntok = df["caption"].str.split().str.len().to_numpy(np.int64)
        return pd.DataFrame({"iid": iid, "image_id": df["image_id"],
                             "cost": patches + ntok})

    packed = banded_prefix_sum(
        ds.map_batches(_cost, batch_format="pandas"),
        order_col="iid", val_col="cost")

    def _bins(df: pd.DataFrame) -> pd.DataFrame:
        cum0 = df["cum0"].to_numpy(np.int64)
        return pd.DataFrame({
            "image_id": df["image_id"],
            "cost": df["cost"].to_numpy(np.int64),
            "seq_id": cum0 // PACK_MM_BUDGET,
            "seq_offset": cum0 % PACK_MM_BUDGET,
        })

    return packed.map_batches(_bins, batch_format="pandas")


def image_dctphash_dedup(sf_dir: str):
    """Exact image dedup on the TRUE DCT perceptual hash (the public
    pHash scheme — functions/codecs.dct_phash_batch), computed FROM
    DECODED PIXELS by the pipeline rather than read from the table's
    stored average-hash column: the full decode → 32×32 DCT → median
    threshold → hash-shard dedup chain runs distributed, and the
    oracle fixture recomputes the hash single-process (differential,
    like decode_stats' mean_px/phash_rt columns)."""
    import numpy as np
    import pyarrow as pa

    from geomedea_ray.functions import codecs
    from geomedea_ray.stages.dedup import phash_dedup
    from geomedea_ray.stages.images import binary_views

    def _hash(batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        out = np.empty(batch.num_rows, np.int64)
        for idxs, stack in codecs.decode_size_groups(blobs, fmts, ws, hs):
            out[idxs] = codecs.dct_phash_batch(stack)
        return pa.table({"image_id": batch["image_id"],
                         "phash": pa.array(out, pa.int64())})

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"]).map_batches(
        _hash, batch_format="pyarrow", zero_copy_batch=True)
    return phash_dedup(ds)
