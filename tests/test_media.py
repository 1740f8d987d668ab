"""Audio/video multimodal stages: scalar oracles for the feature
kernels, exploded output layout, stubbed-codec behavior, actor-pool
mode."""

import numpy as np
import pyarrow as pa
import pytest

from geomedea_ray.sources.synth_media import synth_audio_batch, synth_video_batch
from geomedea_ray.stages.media import AudioFeatures, FrameSample, audio_features


class TestAudioFeatures:
    def test_scalar_oracle_one_clip(self):
        """Windowed RMS/ZCR/centroid equal a straightforward per-window
        scalar computation."""
        tbl = synth_audio_batch(np.array([3]))
        win = 2048
        out = AudioFeatures(win)(tbl)
        pcm = np.frombuffer(tbl["bytes"][0].as_py(), dtype="<i2")
        sr = tbl["sr"][0].as_py()
        nw = len(pcm) // win
        assert out.num_rows == nw
        for j in [0, nw // 2, nw - 1]:
            x = pcm[j * win:(j + 1) * win].astype(np.float32) / 32768.0
            assert out["rms"][j].as_py() == pytest.approx(
                float(np.sqrt(np.mean(x * x))), rel=1e-6)
            assert out["zcr"][j].as_py() == pytest.approx(
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))), rel=1e-6)
            spec = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(win, d=1.0 / sr)
            assert out["centroid_hz"][j].as_py() == pytest.approx(
                float((spec * freqs).sum() / spec.sum()), rel=1e-6)
            assert out["t0_s"][j].as_py() == pytest.approx(j * win / sr)

    def test_unknown_codec_raises_loudly(self):
        tbl = synth_audio_batch(np.array([0]))
        bad = tbl.set_column(tbl.schema.get_field_index("fmt"), "fmt",
                             pa.array(["mp3"], pa.string()))
        with pytest.raises(NotImplementedError, match="mp3"):
            AudioFeatures()(bad)

    def test_actor_pool_mode(self, ray_session):
        import ray.data

        tbl = synth_audio_batch(np.arange(20))
        out = audio_features(ray.data.from_arrow(tbl), concurrency=(1, 2)).to_pandas()
        ref = AudioFeatures()(tbl).to_pandas()
        got = out.sort_values(["audio_id", "window"]).reset_index(drop=True)
        ref = ref.sort_values(["audio_id", "window"]).reset_index(drop=True)
        assert got.equals(ref)


class TestFrameSample:
    def test_even_sampling_and_stats(self):
        tbl = synth_video_batch(np.array([5]))
        out = FrameSample(4)(tbl)
        n = tbl["n_frames"][0].as_py()
        idx = np.round(np.linspace(0, n - 1, 4)).astype(int)
        assert out["frame_idx"].to_pylist() == idx.tolist()
        frames = np.frombuffer(tbl["bytes"][0].as_py(), np.uint8).reshape(n, 32, 32, 3)
        for r in range(4):
            f = frames[idx[r]]
            assert out["mean_px"][r].as_py() == pytest.approx(float(f.mean()), rel=1e-9)
            g = f.sum(axis=2, dtype=np.uint16)
            tq = g.reshape(8, 4, 8, 4).sum(axis=(1, 3), dtype=np.int64).reshape(64)
            assert out["thumb_q"][r].as_py() == tq.tolist()
            assert out["ts_s"][r].as_py() == pytest.approx(idx[r] / 8.0)

    def test_unknown_codec_raises_loudly(self):
        tbl = synth_video_batch(np.array([0]))
        bad = tbl.set_column(tbl.schema.get_field_index("fmt"), "fmt",
                             pa.array(["h264"], pa.string()))
        with pytest.raises(NotImplementedError, match="h264"):
            FrameSample()(bad)

    def test_short_video_k_clamped(self):
        tbl = synth_video_batch(np.array([1]))
        out = FrameSample(100)(tbl)
        assert out.num_rows == tbl["n_frames"][0].as_py()

    def test_non_multiple_of_8_frame_dims(self):
        """Real-world sizes (30x40) must not crash the block-sum thumb
        (ADVICE round 2): thumb crops to the 8-multiple window,
        mean_px still covers the FULL frame."""
        h, w, n = 30, 40, 6
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        tbl = pa.table({
            "video_id": pa.array(["v0"], pa.string()),
            "bytes": pa.array([frames.tobytes()], pa.binary()),
            "n_frames": pa.array([n], pa.int32()),
            "w": pa.array([w], pa.int32()),
            "h": pa.array([h], pa.int32()),
            "fps": pa.array([8.0], pa.float32()),
            "fmt": pa.array(["rawrgb"], pa.string()),
        })
        out = FrameSample(4)(tbl)
        assert out.num_rows == 4
        idx = np.round(np.linspace(0, n - 1, 4)).astype(int)
        f0 = frames[idx[0]]
        assert out["mean_px"][0].as_py() == pytest.approx(float(f0.mean()), rel=1e-12)
        # thumb over the cropped 24x40 window
        g = f0[:24, :40].sum(axis=2, dtype=np.uint16)
        tq = g.reshape(8, 3, 8, 5).sum(axis=(1, 3), dtype=np.int64).reshape(64)
        assert out["thumb_q"][0].as_py() == tq.tolist()

    def test_too_small_frames_raise(self):
        frames = np.zeros((2, 4, 4, 3), np.uint8)
        tbl = pa.table({
            "video_id": pa.array(["v0"], pa.string()),
            "bytes": pa.array([frames.tobytes()], pa.binary()),
            "n_frames": pa.array([2], pa.int32()),
            "w": pa.array([4], pa.int32()),
            "h": pa.array([4], pa.int32()),
            "fps": pa.array([8.0], pa.float32()),
            "fmt": pa.array(["rawrgb"], pa.string()),
        })
        with pytest.raises(ValueError, match="too small"):
            FrameSample(2)(tbl)


class TestIndependentOracles:
    """The gate oracles re-derive features with the SCALAR
    implementations in sources/synth_media.py — independent of the
    vectorized stages. The driver gate hash-compares raw float64
    columns, so scalar-vs-vectorized must agree BIT-FOR-BIT (same
    contiguous windows, same pairwise reduction order)."""

    def test_audio_scalar_oracle_bit_exact(self):
        from geomedea_ray.sources.synth_media import scalar_audio_feature_rows

        tbl = synth_audio_batch(np.arange(30))
        got = AudioFeatures(2048)(tbl)
        k = 0
        for r in range(tbl.num_rows):
            pcm = np.frombuffer(tbl["bytes"][r].as_py(), dtype="<i2")
            for row in scalar_audio_feature_rows(pcm, tbl["sr"][r].as_py(), 2048):
                assert got["window"][k].as_py() == row["window"]
                assert got["t0_s"][k].as_py() == row["t0_s"]
                assert got["rms"][k].as_py() == row["rms"]
                assert got["zcr"][k].as_py() == row["zcr"]
                assert got["centroid_hz"][k].as_py() == row["centroid_hz"]
                k += 1
        assert k == got.num_rows

    def test_video_scalar_oracle_bit_exact(self):
        from geomedea_ray.sources.synth_media import scalar_video_frame_rows

        tbl = synth_video_batch(np.arange(30))
        got = FrameSample(4)(tbl)
        k = 0
        for r in range(tbl.num_rows):
            nf = tbl["n_frames"][r].as_py()
            frames = np.frombuffer(tbl["bytes"][r].as_py(), np.uint8).reshape(
                nf, 32, 32, 3
            )
            for row in scalar_video_frame_rows(frames, tbl["fps"][r].as_py(), 4):
                assert got["frame_idx"][k].as_py() == row["frame_idx"]
                assert got["ts_s"][k].as_py() == row["ts_s"]
                assert got["mean_px"][k].as_py() == row["mean_px"]
                k += 1
        assert k == got.num_rows
