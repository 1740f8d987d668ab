"""Deterministic audio/video tables + single-process oracle fixtures
(multimodal brief rows; same fixture pattern as sources/oracle_fixture
— row ``i`` depends only on (seed, i), the distributed table is
generated through Ray, and the ORACLE side regenerates + featurizes
single-process so the driver gate hash-compares the distributed
decode/feature path against an independently scheduled run).

    audio: 16 kHz mono PCM16, 1-2 s seeded sine+noise mixtures
    video: 8-16 frame 32×32 rawrgb moving gradients
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/geomedea_ray_cache"
SR = 16_000

N_AUDIO = {"sf0.001": 200, "sf0.01": 800, "sf0.1": 3000}
N_VIDEO = {"sf0.001": 200, "sf0.01": 800, "sf0.1": 3000}


def n_audio_for(sf_dir: str) -> int:
    return N_AUDIO.get(os.path.basename(os.path.normpath(sf_dir)), 200)


def n_video_for(sf_dir: str) -> int:
    return N_VIDEO.get(os.path.basename(os.path.normpath(sf_dir)), 200)


def synth_audio_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    aid, blobs, srs, counts, fmts = [], [], [], [], []
    for i in ids.tolist():
        rng = np.random.default_rng((seed, 7, i))
        dur = float(rng.uniform(1.0, 2.0))
        n = int(dur * SR)
        t = np.arange(n) / SR
        x = np.zeros(n)
        for _ in range(int(rng.integers(1, 4))):
            x += rng.uniform(0.1, 0.4) * np.sin(
                2 * np.pi * rng.uniform(80, 4000) * t + rng.uniform(0, 2 * np.pi)
            )
        x += rng.normal(scale=0.02, size=n)
        pcm = np.clip(x * 32767 / max(np.abs(x).max(), 1e-9) * 0.8, -32768, 32767)
        aid.append(f"aud-{i:08d}")
        blobs.append(pcm.astype("<i2").tobytes())
        srs.append(SR)
        counts.append(n)
        fmts.append("pcm16")
    return pa.table({
        "audio_id": pa.array(aid, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(srs, pa.int32()),
        "n_samples": pa.array(counts, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
    })


def synth_video_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    vid, blobs, nfs, ws, hs, fpss, fmts = [], [], [], [], [], [], []
    for i in ids.tolist():
        rng = np.random.default_rng((seed, 9, i))
        n_frames = int(rng.integers(8, 17))
        size = 32
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
        phase = rng.uniform(0, 2 * np.pi)
        speed = rng.uniform(0.5, 2.0)
        frames = np.empty((n_frames, size, size, 3), np.uint8)
        for f in range(n_frames):
            r = 255 * (0.5 + 0.5 * np.sin(2 * np.pi * (xx + speed * f / n_frames) + phase))
            g = 255 * yy
            b = np.full_like(yy, (f * 255) // max(n_frames - 1, 1))
            frames[f] = np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
        vid.append(f"vid-{i:08d}")
        blobs.append(frames.tobytes())
        nfs.append(n_frames)
        ws.append(size)
        hs.append(size)
        fpss.append(8.0)
        fmts.append("rawrgb")
    return pa.table({
        "video_id": pa.array(vid, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(nfs, pa.int32()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fps": pa.array(fpss, pa.float32()),
        "fmt": pa.array(fmts, pa.string()),
    })


def _table_path(kind: str, synth_fn, n: int, seed: int) -> str:
    """Materialize via Ray (distributed gen, like the image table).
    Built into a unique temp dir + atomic rename so concurrent
    builders can't publish a half-written table (same pattern as the
    oracle fixtures)."""
    import shutil
    import uuid

    out = os.path.join(CACHE_ROOT, f"{kind}_n{n}_seed{seed}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    import ray.data

    tmp = f"{out}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)

    def _batch(batch: pa.Table) -> pa.Table:
        return synth_fn(batch["id"].to_numpy(), seed=seed)

    (
        ray.data.range(n)
        .map_batches(_batch, batch_format="pyarrow", batch_size=256)
        .repartition(max(4, n // 400))
        .write_parquet(tmp)
    )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out)
    except OSError:  # concurrent builder won
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def audio_table_path(n: int, seed: int = 42) -> str:
    return _table_path("audio", synth_audio_batch, n, seed)


def video_table_path(n: int, seed: int = 42) -> str:
    return _table_path("video", synth_video_batch, n, seed)


# ------------------------------------------------------------- oracles

def audio_oracle_path(n: int, seed: int = 42, win: int = 2048) -> str:
    """Single-process (no Ray) regeneration + featurization — the
    differential oracle for the distributed AudioFeatures stage."""
    out = os.path.join(CACHE_ROOT, f"audio_oracle_n{n}_seed{seed}_w{win}.parquet")
    if os.path.exists(out):
        return out
    from geomedea_ray.stages.media import AudioFeatures

    os.makedirs(CACHE_ROOT, exist_ok=True)
    stage = AudioFeatures(win)
    chunks = []
    for lo in range(0, n, 256):
        rows = synth_audio_batch(np.arange(lo, min(lo + 256, n)), seed=seed)
        chunks.append(stage(rows))
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(pa.concat_tables(chunks), tmp, compression="zstd")
    os.replace(tmp, out)
    return out


def video_oracle_path(n: int, seed: int = 42, k: int = 4) -> str:
    out = os.path.join(CACHE_ROOT, f"video_oracle_n{n}_seed{seed}_k{k}.parquet")
    if os.path.exists(out):
        return out
    from geomedea_ray.stages.media import FrameSample

    os.makedirs(CACHE_ROOT, exist_ok=True)
    stage = FrameSample(k)
    chunks = []
    for lo in range(0, n, 128):
        rows = synth_video_batch(np.arange(lo, min(lo + 128, n)), seed=seed)
        chunks.append(stage(rows))
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(pa.concat_tables(chunks), tmp, compression="zstd")
    os.replace(tmp, out)
    return out


def audio_features_sql(sf_dir: str) -> str:
    path = audio_oracle_path(n_audio_for(sf_dir))
    return (f"SELECT audio_id, \"window\", t0_s, rms, zcr, centroid_hz "
            f"FROM read_parquet('{path}')")


def video_frames_sql(sf_dir: str) -> str:
    path = video_oracle_path(n_video_for(sf_dir))
    return (f"SELECT video_id, frame_idx, ts_s, mean_px "
            f"FROM read_parquet('{path}')")
