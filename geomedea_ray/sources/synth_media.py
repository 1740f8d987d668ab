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
    """Materialize via Ray (distributed gen, like the image table),
    through sources/cache.cached_table: atomic tmp+rename publish AND
    a row-count check before publish + on every load. The round-2
    audio/video caches were doubled despite the old tmp+rename —
    a duplicated ``write_parquet`` execution inside ONE build left two
    UUID generations in the tmp dir, which was renamed whole; only the
    pre-publish count (and load-time re-validation) catches that."""
    from geomedea_ray.sources.cache import cached_table

    def _build(tmp: str) -> None:
        import ray.data

        def _batch(batch: pa.Table) -> pa.Table:
            return synth_fn(batch["id"].to_numpy(), seed=seed)

        (
            ray.data.range(n)
            .map_batches(_batch, batch_format="pyarrow", batch_size=256)
            .repartition(max(4, n // 400))
            .write_parquet(tmp)
        )

    return cached_table(
        os.path.join(CACHE_ROOT, f"{kind}_n{n}_seed{seed}"), _build, expected_rows=n
    )


def audio_table_path(n: int, seed: int = 42) -> str:
    return _table_path("audio", synth_audio_batch, n, seed)


def video_table_path(n: int, seed: int = 42) -> str:
    return _table_path("video", synth_video_batch, n, seed)


# ------------------------------------------------------------- oracles
#
# The oracle features are RE-DERIVED with independent per-window
# SCALAR implementations below — NOT the distributed
# AudioFeatures/FrameSample kernels — so the gate comparison verifies
# the feature math as well as the Ray scheduling/batching (round-2
# ADVICE: the old oracles reused the stage classes, checking only
# plumbing). Bit-exactness of scalar-vs-vectorized holds because every
# reduction runs over the same contiguous window values in the same
# pairwise order (asserted in tests/test_media.py's oracle-equality
# test over many clips).


def expected_audio_windows(n: int, seed: int = 42, win: int = 2048) -> int:
    """Total (clip, window) rows — replays only the duration draw."""
    total = 0
    for i in range(n):
        rng = np.random.default_rng((seed, 7, i))
        total += int(float(rng.uniform(1.0, 2.0)) * SR) // win
    return total


def expected_video_rows(n: int, seed: int = 42, k: int = 4) -> int:
    """Total sampled-frame rows — replays only the n_frames draw."""
    total = 0
    for i in range(n):
        rng = np.random.default_rng((seed, 9, i))
        total += min(k, int(rng.integers(8, 17)))
    return total


def scalar_audio_feature_rows(pcm: np.ndarray, sr: int, win: int) -> list[dict]:
    """Independent per-window scalar featurization (the oracle side):
    one window at a time, plain 1-D numpy — no batching, no reshape."""
    rows = []
    nw = len(pcm) // win
    for j in range(nw):
        x = pcm[j * win: (j + 1) * win].astype(np.float32) / 32768.0
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(win, d=1.0 / float(sr))
        rows.append({
            "window": j,
            "t0_s": float(np.float64(j) * win / float(sr)),
            "rms": float(np.sqrt(np.mean(x * x))),
            "zcr": float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))),
            "centroid_hz": float((spec * freqs).sum() / max(float(spec.sum()), 1e-12)),
        })
    return rows


def scalar_video_frame_rows(frames: np.ndarray, fps: float, k: int) -> list[dict]:
    """Independent per-frame scalar stats (the oracle side)."""
    n = frames.shape[0]
    kk = min(k, n)
    idx = (np.round(np.linspace(0, n - 1, kk)).astype(np.int64)
           if kk > 1 else np.array([0], np.int64))
    rows = []
    for j in idx.tolist():
        f = frames[j]
        rows.append({
            "frame_idx": j,
            "ts_s": float(j / np.float64(fps)),
            "mean_px": float(int(f.reshape(-1).astype(np.int64).sum())
                             / (3.0 * f.shape[0] * f.shape[1])),
        })
    return rows


def audio_oracle_path(n: int, seed: int = 42, win: int = 2048) -> str:
    """Single-process (no Ray) regeneration + INDEPENDENT scalar
    featurization — the differential oracle for the distributed
    AudioFeatures stage. Cached via cached_file: atomic replace,
    row count re-validated on every load."""
    from geomedea_ray.sources.cache import cached_file

    def _build(tmp: str) -> None:
        cols = {"audio_id": [], "window": [], "t0_s": [], "rms": [],
                "zcr": [], "centroid_hz": []}
        for lo in range(0, n, 256):
            tbl = synth_audio_batch(np.arange(lo, min(lo + 256, n)), seed=seed)
            for r in range(tbl.num_rows):
                pcm = np.frombuffer(tbl["bytes"][r].as_py(), dtype="<i2")
                for row in scalar_audio_feature_rows(
                    pcm, tbl["sr"][r].as_py(), win
                ):
                    cols["audio_id"].append(tbl["audio_id"][r].as_py())
                    for key, v in row.items():
                        cols[key].append(v)
        out_t = pa.table({
            "audio_id": pa.array(cols["audio_id"], pa.string()),
            "window": pa.array(cols["window"], pa.int64()),
            "t0_s": pa.array(cols["t0_s"], pa.float64()),
            "rms": pa.array(cols["rms"], pa.float64()),
            "zcr": pa.array(cols["zcr"], pa.float64()),
            "centroid_hz": pa.array(cols["centroid_hz"], pa.float64()),
        })
        pq.write_table(out_t, tmp, compression="zstd")

    return cached_file(
        os.path.join(CACHE_ROOT, f"audio_oracle_n{n}_seed{seed}_w{win}.parquet"),
        _build, expected_rows=expected_audio_windows(n, seed, win),
    )


def video_oracle_path(n: int, seed: int = 42, k: int = 4) -> str:
    from geomedea_ray.sources.cache import cached_file

    def _build(tmp: str) -> None:
        cols = {"video_id": [], "frame_idx": [], "ts_s": [], "mean_px": []}
        for lo in range(0, n, 128):
            tbl = synth_video_batch(np.arange(lo, min(lo + 128, n)), seed=seed)
            for r in range(tbl.num_rows):
                nf = tbl["n_frames"][r].as_py()
                w, h = tbl["w"][r].as_py(), tbl["h"][r].as_py()
                frames = np.frombuffer(
                    tbl["bytes"][r].as_py(), np.uint8
                ).reshape(nf, h, w, 3)
                for row in scalar_video_frame_rows(
                    frames, tbl["fps"][r].as_py(), k
                ):
                    cols["video_id"].append(tbl["video_id"][r].as_py())
                    for key, v in row.items():
                        cols[key].append(v)
        out_t = pa.table({
            "video_id": pa.array(cols["video_id"], pa.string()),
            "frame_idx": pa.array(cols["frame_idx"], pa.int64()),
            "ts_s": pa.array(cols["ts_s"], pa.float64()),
            "mean_px": pa.array(cols["mean_px"], pa.float64()),
        })
        pq.write_table(out_t, tmp, compression="zstd")

    return cached_file(
        os.path.join(CACHE_ROOT, f"video_oracle_n{n}_seed{seed}_k{k}.parquet"),
        _build, expected_rows=expected_video_rows(n, seed, k),
    )


def audio_features_sql(sf_dir: str) -> str:
    path = audio_oracle_path(n_audio_for(sf_dir))
    return (f"SELECT audio_id, \"window\", t0_s, rms, zcr, centroid_hz "
            f"FROM read_parquet('{path}')")


def video_frames_sql(sf_dir: str) -> str:
    path = video_oracle_path(n_video_for(sf_dir))
    return (f"SELECT video_id, frame_idx, ts_s, mean_px "
            f"FROM read_parquet('{path}')")
