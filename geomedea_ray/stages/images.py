"""Image stages over the image+caption table.

Stateful-stage execution (SURVEY §7.3 "decoders run on actor pools"):
the decoder OBJECT still initializes once per worker and serves every
batch that worker processes — but by default it runs as a plain task
fn with a per-process instance cache (util.cached_instance) rather
than a named actor pool, because task stages FUSE with the upstream
read (the wide ``bytes`` blocks never round-trip the object store;
measured 1.6× on decode). Pass ``concurrency=...`` to get a real
actor pool — the right choice when per-actor state is heavy (a loaded
model) or needs GPU placement. Codecs are the sandbox's raw/pngz/qnt
(functions/codecs.py); a real JPEG decoder would slot into the same
stage with no pipeline change (the NotImplementedError branches mark
exactly where).

Batches stay bounded (default 1024 ≈ 12 MiB of 64×64 RGB rows)
because rows are wide; batch_size × concurrency × row width must fit
worker heaps (SURVEY §4 memory row)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomedea_ray.functions import codecs

DEFAULT_BATCH = 1024


def binary_views(col: pa.ChunkedArray | pa.Array) -> list[memoryview]:
    """Zero-copy memoryview slices of a binary column's value buffer —
    avoids materializing one Python bytes copy per row (zlib accepts
    buffer views directly)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # older pyarrow returns a 1-chunk ChunkedArray
        col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    if len(col) == 0:
        return []
    width = 8 if pa.types.is_large_binary(col.type) else 4
    dtype = np.int64 if width == 8 else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=dtype, count=len(col) + 1, offset=col.offset * width)
    buf = memoryview(col.buffers()[2])
    return [buf[offs[i]: offs[i + 1]] for i in range(len(col))]


class DecodeStats:
    """Decode every image; emit per-row pixel statistics + an integrity
    check (recomputed phash vs stored phash — exact for lossless fmts).
    The codec dispatch table is per-actor state."""

    def __init__(self):
        self.decode_groups = codecs.decode_size_groups  # bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        phash = batch["phash"].to_numpy()
        n = len(blobs)
        mean_px = np.empty(n, np.float64)
        std_px = np.empty(n, np.float64)
        phash_rt = np.empty(n, np.int64)
        # vectorized over same-size stacks (codecs.decode_size_groups):
        # per-row Python work is just the zlib call
        for idxs, stack in self.decode_groups(blobs, fmts, ws, hs):
            # integer-sum stats: summing uint8 directly moves ~8× less
            # memory than a float64 copy of every pixel (decode is
            # memory-bandwidth-bound at full node width)
            flat = stack.reshape(len(idxs), -1)
            npx = flat.shape[1]
            s1 = flat.sum(axis=1, dtype=np.int64)
            # square in uint16 (255² = 65025 < 2¹⁶) then widen only in
            # the reduction — einsum with dtype=int64 would materialize
            # an 8-byte copy of every pixel first (~8× the DRAM traffic).
            # Workspace output: a fresh 2 B/px array per batch would pay
            # this VM's pathological first-touch fault cost every batch.
            sq = codecs.workspace("sq_u16", np.uint16,
                                  flat.size).reshape(flat.shape)
            np.square(flat, out=sq, dtype=np.uint16)
            s2 = sq.sum(axis=1, dtype=np.int64)
            mean = s1 / npx
            mean_px[idxs] = mean
            std_px[idxs] = np.sqrt(np.maximum(s2 / npx - mean * mean, 0.0))
            phash_rt[idxs] = codecs.average_phash_batch(stack)
        # integrity threshold per format: lossless decode is bit-exact
        # (recomputed hash must MATCH), only the lossy codec may drift
        thresh = np.where(np.isin(np.asarray(fmts, object),
                                  list(codecs.LOSSY_FMTS)), 8, 0)
        ok = codecs.hamming64(phash_rt, phash) <= thresh
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "mean_px": pa.array(mean_px, pa.float64()),
                "std_px": pa.array(std_px, pa.float64()),
                "phash_rt": pa.array(phash_rt, pa.int64()),
                "phash_ok": pa.array(ok, pa.bool_()),
            }
        )


class Thumbnail:
    """Decode → 8×8 block-mean grayscale thumbnail as a float list —
    the feature-extraction stage shape (model inference would replace
    the block mean)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        feats = np.empty((len(blobs), 64), np.float32)
        for idxs, stack in codecs.decode_size_groups(blobs, fmts, ws, hs):
            k, h, w, _ = stack.shape
            bh, bw = h // 8, w // 8
            # integer block sums (contiguous-axis), float only at the end;
            # workspace output (see codecs.workspace: first-touch faults)
            g = codecs.workspace("g_u16", np.uint16,
                                 k * h * w).reshape(k, h, w)
            stack.sum(axis=3, dtype=np.uint16, out=g)                       # ≤765
            s = g.reshape(k, 8, bh, 8, bw).sum(axis=4, dtype=np.uint32)
            thumb = s.sum(axis=2, dtype=np.uint32).astype(np.float32) / (3 * bh * bw)
            feats[idxs] = thumb.reshape(k, 64)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "thumb": pa.array(list(feats), pa.list_(pa.float32(), 64)),
            }
        )


class Augment:
    """Deterministic geometric augmentation (the training-data
    augment-stage shape: flip / rotate / crop before feature
    extraction), with INTEGER-EXACT verification outputs so the
    distributed application can be hash-gated.

    Policy is derived from the row's content key (phash), so both the
    engine and the single-process oracle fixture agree without any
    RNG: hflip when ``phash & 1``, rot90 by ``k = (phash >> 1) & 3``,
    then a center crop to half the (post-rotation) dimensions.

    Emits per row: augmented dims, the int64 sum of every augmented
    channel value, and the packed RGB of the crop's top-left and
    bottom-right pixels — the corner probes pin the exact geometry
    (a wrong flip axis, rotation direction, or crop offset moves
    them). Work is vectorized per (size-group × flip × k) subset —
    at most 8 numpy transforms per decoded stack, no per-row loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        phash = batch["phash"].to_numpy()
        n = len(blobs)
        aug_w = np.empty(n, np.int64)
        aug_h = np.empty(n, np.int64)
        aug_sum = np.empty(n, np.int64)
        c00 = np.empty(n, np.int64)
        c11 = np.empty(n, np.int64)
        flips = (phash & 1).astype(bool)
        rots = ((phash >> 1) & 3).astype(np.int64)
        for idxs, stack in codecs.decode_size_groups(blobs, fmts, ws, hs):
            gi = np.asarray(idxs)
            gf, gr = flips[gi], rots[gi]
            for fl in (False, True):
                for k in range(4):
                    m = (gf == fl) & (gr == k)
                    if not m.any():
                        continue
                    sub = stack[m]
                    if fl:
                        sub = sub[:, :, ::-1, :]
                    if k:
                        sub = np.rot90(sub, k, axes=(1, 2))
                    _, hh, ww, _ = sub.shape
                    h2, w2 = max(hh // 2, 1), max(ww // 2, 1)
                    top, left = (hh - h2) // 2, (ww - w2) // 2
                    crop = sub[:, top: top + h2, left: left + w2, :]
                    tgt = gi[m]
                    aug_h[tgt], aug_w[tgt] = h2, w2
                    aug_sum[tgt] = crop.sum(axis=(1, 2, 3), dtype=np.int64)
                    p0 = crop[:, 0, 0, :].astype(np.int64)
                    p1 = crop[:, -1, -1, :].astype(np.int64)
                    c00[tgt] = (p0[:, 0] << 16) | (p0[:, 1] << 8) | p0[:, 2]
                    c11[tgt] = (p1[:, 0] << 16) | (p1[:, 1] << 8) | p1[:, 2]
        return pa.table({
            "image_id": batch["image_id"],
            "aug_w": pa.array(aug_w, pa.int64()),
            "aug_h": pa.array(aug_h, pa.int64()),
            "aug_sum": pa.array(aug_sum, pa.int64()),
            "c00": pa.array(c00, pa.int64()),
            "c11": pa.array(c11, pa.int64()),
        })


class Reencode:
    """Transcode every image to ``target_fmt`` (e.g. archive-to-qnt
    compaction). Lossless→lossy transitions preserve PSNR ≥ 40 dB by
    codec construction."""

    def __init__(self, target_fmt: str = "qnt"):
        if target_fmt not in codecs.KNOWN_FMTS:
            raise NotImplementedError(f"target codec {target_fmt!r} unavailable in sandbox")
        self.target = target_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        out = [
            codecs.encode(
                codecs.decode(blobs[i], fmts[i], int(ws[i]), int(hs[i])), self.target
            )
            for i in range(len(blobs))
        ]
        t = batch.drop_columns(["bytes", "fmt"])
        return t.append_column("bytes", pa.array(out, pa.binary())).append_column(
            "fmt", pa.array([self.target] * len(out), pa.string())
        )


def decode_stats(ds, concurrency=None, batch_size: int = DEFAULT_BATCH):
    # default = plain task fn (stage object cached per worker process):
    # fuses with the read so the wide ``bytes`` blocks never round-trip
    # the object store; pass ``concurrency`` for an explicit actor pool
    # (e.g. a decoder that loads a heavy model)
    if concurrency is not None:
        return ds.map_batches(
            DecodeStats, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, zero_copy_batch=True,
        )
    from geomedea_ray.util import cached_instance

    def _fn(batch):
        return cached_instance("images.DecodeStats", DecodeStats)(batch)

    return ds.map_batches(
        _fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def thumbnails(ds, concurrency=None, batch_size: int = DEFAULT_BATCH):
    if concurrency is not None:
        return ds.map_batches(
            Thumbnail, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, zero_copy_batch=True,
        )
    from geomedea_ray.util import cached_instance

    def _fn(batch):
        return cached_instance("images.Thumbnail", Thumbnail)(batch)

    return ds.map_batches(
        _fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
