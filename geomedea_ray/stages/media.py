"""Audio / video stages over opaque binary columns (task brief
"multimodal columns": binary payload + typed metadata; decode for
codecs absent from this container is STUBBED loudly, the Ray-side
plumbing — schema, actor signature, batch sizing, exploded output
layout — is real and tested).

Schemas (typed metadata alongside the payload, like the image table):

    audio: audio_id:string, bytes:binary (PCM16LE mono), sr:int32,
           n_samples:int32, fmt:string ('pcm16' real | others stubbed)
    video: video_id:string, bytes:binary (concatenated raw frames),
           n_frames:int32, w:int32, h:int32, fps:float32,
           fmt:string ('rawrgb' real | 'h264'/'vp9' stubbed)

Batch sizing: rows are wide (a 10 s PCM16 clip ≈ 320 KB; a 30-frame
64×64 raw video ≈ 368 KB), so the stages default to small batches —
batch_size × concurrency × row width must fit worker heaps (same
arithmetic as stages/images.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomedea_ray.stages.images import binary_views

AUDIO_BATCH = 256
VIDEO_BATCH = 64

#: codecs with a real in-sandbox decode path
REAL_AUDIO_FMTS = {"pcm16"}
REAL_VIDEO_FMTS = {"rawrgb"}


def _decode_audio(view, fmt: str, n_samples: int) -> np.ndarray:
    if fmt in REAL_AUDIO_FMTS:
        return np.frombuffer(view, dtype="<i2", count=n_samples)
    # a real deployment drops pyav/libsndfile in HERE; the stage,
    # schema and batching do not change
    raise NotImplementedError(
        f"audio codec {fmt!r} needs an external decoder not present in this "
        "sandbox (only pcm16 decodes here); plug a decoder into "
        "stages/media._decode_audio"
    )


def _decode_video(view, fmt: str, n_frames: int, w: int, h: int) -> np.ndarray:
    if fmt in REAL_VIDEO_FMTS:
        return np.frombuffer(view, dtype=np.uint8,
                             count=n_frames * h * w * 3).reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        f"video codec {fmt!r} needs an external decoder not present in this "
        "sandbox (only rawrgb decodes here); plug a decoder into "
        "stages/media._decode_video"
    )


class AudioFeatures:
    """Actor-pool stage: windowed audio features per clip — RMS,
    zero-crossing rate and spectral centroid per ``win`` samples
    (vectorized: one reshape + reductions per clip, one rfft batch per
    clip). Output is EXPLODED: one row per (clip, window)."""

    def __init__(self, win: int = 2048):
        self.win = win

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch["bytes"])
        srs = batch["sr"].to_numpy()
        counts = batch["n_samples"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        ids = batch["audio_id"].to_pylist()
        out_id, out_widx, out_t0 = [], [], []
        out_rms, out_zcr, out_cent = [], [], []
        for i in range(len(views)):
            pcm = _decode_audio(views[i], fmts[i], int(counts[i]))
            nw = len(pcm) // self.win
            if nw == 0:
                continue
            x = pcm[: nw * self.win].astype(np.float32).reshape(nw, self.win) / 32768.0
            rms = np.sqrt(np.mean(x * x, axis=1))
            zcr = np.mean(np.signbit(x[:, 1:]) != np.signbit(x[:, :-1]), axis=1)
            spec = np.abs(np.fft.rfft(x, axis=1))
            freqs = np.fft.rfftfreq(self.win, d=1.0 / float(srs[i]))
            cent = (spec * freqs[None, :]).sum(axis=1) / np.maximum(
                spec.sum(axis=1), 1e-12
            )
            out_id.extend([ids[i]] * nw)
            out_widx.append(np.arange(nw, dtype=np.int64))
            out_t0.append(np.arange(nw, dtype=np.float64) * self.win / float(srs[i]))
            out_rms.append(rms.astype(np.float64))
            out_zcr.append(zcr.astype(np.float64))
            out_cent.append(cent.astype(np.float64))
        if not out_id:
            return pa.table({
                "audio_id": pa.array([], pa.string()),
                "window": pa.array([], pa.int64()),
                "t0_s": pa.array([], pa.float64()),
                "rms": pa.array([], pa.float64()),
                "zcr": pa.array([], pa.float64()),
                "centroid_hz": pa.array([], pa.float64()),
            })
        return pa.table({
            "audio_id": pa.array(out_id, pa.string()),
            "window": pa.array(np.concatenate(out_widx)),
            "t0_s": pa.array(np.concatenate(out_t0)),
            "rms": pa.array(np.concatenate(out_rms)),
            "zcr": pa.array(np.concatenate(out_zcr)),
            "centroid_hz": pa.array(np.concatenate(out_cent)),
        })


class FrameSample:
    """Actor-pool stage: sample ``k`` frames evenly from each video and
    emit per-frame integer stats + an 8×8 grayscale thumb (the
    feature-extraction layout a caption/embedding model consumes).
    Output EXPLODED: one row per sampled frame."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch["bytes"])
        nfs = batch["n_frames"].to_numpy()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fps = batch["fps"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        ids = batch["video_id"].to_pylist()
        out = {"video_id": [], "frame_idx": [], "ts_s": [], "mean_px": [],
               "thumb_q": []}
        for i in range(len(views)):
            frames = _decode_video(views[i], fmts[i], int(nfs[i]), int(ws[i]), int(hs[i]))
            n = frames.shape[0]
            k = min(self.k, n)
            # even temporal sampling: frame j·(n-1)/(k-1) (endpoints kept)
            idx = (np.round(np.linspace(0, n - 1, k)).astype(np.int64)
                   if k > 1 else np.array([0], np.int64))
            sel = frames[idx]  # (k, h, w, 3)
            kk, h, w, _ = sel.shape
            s1 = sel.reshape(kk, -1).sum(axis=1, dtype=np.int64)
            g = sel.sum(axis=3, dtype=np.uint16)
            # thumb needs 8×8 blocks: crop to the largest multiple-of-8
            # window (mean_px above still covers the FULL frame) — real
            # frame sizes (e.g. 30×40) are not multiples of 8
            bh, bw = h // 8, w // 8
            if bh == 0 or bw == 0:
                raise ValueError(
                    f"video {ids[i]!r}: frames {h}x{w} too small for an "
                    f"8x8 block thumb (need >= 8x8)"
                )
            g = g[:, : bh * 8, : bw * 8]
            tq = g.reshape(kk, 8, bh, 8, bw).sum(axis=(2, 4), dtype=np.int64)
            out["video_id"].extend([ids[i]] * kk)
            out["frame_idx"].append(idx)
            out["ts_s"].append(idx / np.float64(fps[i]))
            out["mean_px"].append(s1 / (3.0 * h * w))
            out["thumb_q"].extend(tq.reshape(kk, 64).tolist())
        if not out["video_id"]:
            return pa.table({
                "video_id": pa.array([], pa.string()),
                "frame_idx": pa.array([], pa.int64()),
                "ts_s": pa.array([], pa.float64()),
                "mean_px": pa.array([], pa.float64()),
                "thumb_q": pa.array([], pa.list_(pa.int64(), 64)),
            })
        return pa.table({
            "video_id": pa.array(out["video_id"], pa.string()),
            "frame_idx": pa.array(np.concatenate(out["frame_idx"])),
            "ts_s": pa.array(np.concatenate(out["ts_s"])),
            "mean_px": pa.array(np.concatenate(out["mean_px"])),
            "thumb_q": pa.array(out["thumb_q"], pa.list_(pa.int64(), 64)),
        })


def audio_features(ds, win: int = 2048, concurrency=None,
                   batch_size: int = AUDIO_BATCH):
    """Default: fused task fn with a per-process stage instance; pass
    ``concurrency`` for a true actor pool (heavy decoder state)."""
    if concurrency is not None:
        return ds.map_batches(
            AudioFeatures, fn_constructor_kwargs={"win": win},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, zero_copy_batch=True,
        )
    from geomedea_ray.util import cached_instance

    def _fn(batch):
        return cached_instance(("media.AudioFeatures", win),
                               lambda: AudioFeatures(win))(batch)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def frame_sample(ds, k: int = 4, concurrency=None, batch_size: int = VIDEO_BATCH):
    if concurrency is not None:
        return ds.map_batches(
            FrameSample, fn_constructor_kwargs={"k": k},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, zero_copy_batch=True,
        )
    from geomedea_ray.util import cached_instance

    def _fn(batch):
        return cached_instance(("media.FrameSample", k),
                               lambda: FrameSample(k))(batch)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)
