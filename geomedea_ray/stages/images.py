"""Image stages over the image+caption table — actor-pool
``map_batches`` per SURVEY §7.3 ("geometry decoders … run on actor
pools"). Codecs are the sandbox's raw/pngz/qnt (functions/codecs.py);
a real JPEG decoder would slot into the same actor with no pipeline
change (the NotImplementedError branches mark exactly where).

Batches stay SMALL (default 256) because rows are wide — a 64×64 RGB
row is ~12 KiB encoded; batch_size × concurrency × row width must fit
worker heaps (SURVEY §4 memory row)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomedea_ray.functions import codecs

DEFAULT_BATCH = 256


class DecodeStats:
    """Decode every image; emit per-row pixel statistics + an integrity
    check (recomputed phash vs stored phash — exact for lossless fmts).
    The codec dispatch table is per-actor state."""

    def __init__(self):
        self.decode = codecs.decode  # dispatch bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        phash = batch["phash"].to_numpy()
        n = len(blobs)
        mean_px = np.empty(n, np.float64)
        std_px = np.empty(n, np.float64)
        phash_rt = np.empty(n, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i], int(ws[i]), int(hs[i]))
            mean_px[i] = img.mean()
            std_px[i] = img.std()
            phash_rt[i] = codecs.average_phash(img)
        ok = codecs.hamming64(phash_rt, phash) <= 8  # lossy fmts drift a few bits
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
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        feats = np.empty((len(blobs), 64), np.float32)
        for i in range(len(blobs)):
            img = codecs.decode(blobs[i], fmts[i], int(ws[i]), int(hs[i]))
            gray = img.astype(np.float64).mean(axis=2)
            h, w = gray.shape
            thumb = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
            feats[i] = thumb.reshape(-1)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "thumb": pa.array(list(feats), pa.list_(pa.float32(), 64)),
            }
        )


class Reencode:
    """Transcode every image to ``target_fmt`` (e.g. archive-to-qnt
    compaction). Lossless→lossy transitions preserve PSNR ≥ 40 dB by
    codec construction."""

    def __init__(self, target_fmt: str = "qnt"):
        if target_fmt not in codecs.KNOWN_FMTS:
            raise NotImplementedError(f"target codec {target_fmt!r} unavailable in sandbox")
        self.target = target_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
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


def decode_stats(ds, concurrency=(2, 8), batch_size: int = DEFAULT_BATCH):
    return ds.map_batches(
        DecodeStats, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True,
    )


def thumbnails(ds, concurrency=(2, 8), batch_size: int = DEFAULT_BATCH):
    return ds.map_batches(
        Thumbnail, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True,
    )
