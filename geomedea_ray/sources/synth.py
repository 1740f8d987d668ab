"""Deterministic image+caption table generator (FIXTURES.md §F6).

Produces the exact `input_hint` schema from BASELINE.json:

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Row ``i`` depends ONLY on ``(seed, i)`` — generation is reproducible
under any parallel partitioning. Images are procedural
(gradient + seeded noise) in one of the sandbox codecs raw/pngz/qnt
(functions/codecs.py). ~DUP_RATE of rows are exact pixel duplicates of
an earlier row (same pixels+phash, different image_id) so dedup
operators have real work.

Geography is implicit in the schema (SURVEY §7.0): the geocode stage
derives lng/lat from ``phash`` bits — see
``geomedea_ray.stages.geocode.lnglat_from_phash``.

Generation itself runs as a Ray Data pipeline
(``range(n) → map_batches(synth_batch) → write_parquet``) and is
cached under /tmp keyed by (n, seed).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from geomedea_ray.functions import codecs

SIZES = (32, 64)  # (w == h, divisible by 8 for phash)
# raw/pngz lossless; qnt + dct8 lossy (both with PSNR ≥ 40 dB by
# construction — functions/codecs.py). dct8 joined the mix in round 5
# (VERDICT item 7): the _v2 cache-key suffix below invalidates the
# 3-fmt fixtures.
FMTS = ("raw", "pngz", "qnt", "dct8")
DUP_RATE = 20  # every 20th row duplicates the pixels of row i - 7
DUP_BACK = 7

_WORDS = (
    "aerial urban rural coastal forest desert mountain river lake city "
    "street rooftop harbor bridge field glacier canyon island valley delta "
    "sunset dawn cloudy clear winter summer satellite drone oblique nadir"
).split()


def synth_pixels(i: int, seed: int = 42) -> np.ndarray:
    """The ORIGINAL (pre-encoding) pixels of row ``i`` — the reference
    point for the input_hint per-row invariant (decoded-pixel allclose,
    PSNR ≥ 40 dB for lossy fmts). Duplicate rows resolve to their
    source row's pixels."""
    src = i - DUP_BACK if (i % DUP_RATE == 0 and i >= DUP_BACK) else i
    rng = np.random.default_rng((seed, src))
    size = SIZES[int(rng.integers(0, len(SIZES)))]
    # procedural content: two-axis gradient + band noise
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    base = np.stack(
        [
            255 * (0.5 + 0.5 * np.sin(2 * np.pi * (xx * rng.uniform(0.5, 3) + rng.uniform()))),
            255 * yy,
            255 * xx,
        ],
        axis=2,
    )
    noise = rng.integers(-20, 21, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def synth_image_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate rows for the given global row ids (vector of int64)."""
    image_id, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    for i in ids.tolist():
        src = i - DUP_BACK if (i % DUP_RATE == 0 and i >= DUP_BACK) else i
        pixels = synth_pixels(i, seed=seed)
        size = pixels.shape[0]
        fmt = FMTS[i % len(FMTS)] if src == i else FMTS[src % len(FMTS)]
        cap_rng = np.random.default_rng((seed, src, 1))
        words = [_WORDS[int(w)] for w in cap_rng.integers(0, len(_WORDS), 6)]
        caption = " ".join(words) + f" #{src}"
        image_id.append(f"img-{i:012d}")
        blobs.append(codecs.encode(pixels, fmt))
        ws.append(size)
        hs.append(size)
        fmts.append(fmt)
        captions.append(caption)
        phashes.append(codecs.average_phash(pixels))
    return pa.table(
        {
            "image_id": pa.array(image_id, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def image_table_path(n: int, seed: int = 42, cache_root: str = "/tmp/geomedea_ray_cache") -> str:
    """Materialize (or reuse) the n-row image table as partitioned
    Parquet; returns the directory path. Ray must be initialised.

    Published atomically with a row-count-validated marker via
    sources/cache.cached_table (round-2 VERDICT item 1: the old
    rmtree+write-into-live-dir publish let two concurrent builders
    interleave into a doubled table that was then served forever)."""
    from geomedea_ray.sources.cache import cached_table

    def _build(tmp: str) -> None:
        import ray.data

        def _batch(batch: pa.Table) -> pa.Table:
            return synth_image_batch(batch["id"].to_numpy(), seed=seed)

        # generate wide (parallel), then repartition to FEW LARGE fragments
        # before writing: per-file fixed read cost (~40 ms metadata+assembly)
        # dominates 4k-row fragments and makes every downstream pipeline
        # read-bound; 30k+-row fragments match how a real deployment sizes
        # files (0.5-1 GB) and keep reads ~free relative to transforms
        n_files = max(4, n // 7_500)  # ~50 MB/fragment: big enough to amortize per-file read cost, numerous enough that a 32-CPU read needs no block splitting (splits break read→map fusion)
        (
            ray.data.range(n)
            .map_batches(_batch, batch_format="pyarrow", batch_size=2048)
            .repartition(n_files)
            .write_parquet(tmp)
        )

    return cached_table(
        # _v2: dct8 added to FMTS (round 5) — bytes/fmt columns changed,
        # the name carries the revision (CLAUDE.md round-4 rule)
        os.path.join(cache_root, f"images_n{n}_seed{seed}_v2"), _build, expected_rows=n
    )


def oracle_image_rows(ids: list[int], seed: int = 42) -> pa.Table:
    """Single-process oracle for per-row invariants (decoded-pixel
    allclose / caption equality) — regenerates rows directly."""
    return synth_image_batch(np.asarray(ids, dtype=np.int64), seed=seed)
