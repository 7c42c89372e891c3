"""Alignment: FFT correlation parity vs scipy, stage e2e on WAV inputs."""

import json

import numpy as np
import pytest
from scipy import signal

from video3d_tpu.core import write_wav
from video3d_tpu.ops.correlate import (
    cross_correlate_full,
    find_audio_offset,
    znormalize,
)
from video3d_tpu.stages.align import (
    VideoAligner,
    apply_offset_to_pipeline,
    load_alignment_data,
)
from video3d_tpu.utils import calculate_audio_correlation


def _noise_clip(rng, n, sr=22050):
    """Band-limited noise so correlation peaks are sharp but unambiguous."""
    x = rng.standard_normal(n).astype(np.float32)
    kernel = np.hanning(31).astype(np.float32)
    return np.convolve(x, kernel / kernel.sum(), mode="same")


def test_full_correlation_matches_scipy(rng):
    a = rng.standard_normal(3001).astype(np.float32)
    b = rng.standard_normal(2000).astype(np.float32)
    ours = np.asarray(cross_correlate_full(a, b))
    ref = signal.correlate(a, b, mode="full", method="fft")
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-2 * np.max(np.abs(ref))


@pytest.mark.parametrize("offset_samples", [-4410, 0, 1234, 22050])
def test_find_audio_offset_recovers_known_lag(rng, offset_samples):
    sr = 22050
    base = _noise_clip(rng, sr * 6)
    # audio2 = audio1 delayed by offset_samples (positive: a2 starts later,
    # i.e. a2's content appears offset samples earlier inside a2's timeline)
    n = sr * 4
    start1 = sr  # leave headroom for negative offsets
    a1 = base[start1 : start1 + n]
    a2 = base[start1 + offset_samples : start1 + offset_samples + n]
    t_off, strength, corr = find_audio_offset(a1, a2, sr)
    # a2 content leads a1 by offset: correlate(a2, a1) peaks at -offset
    assert abs(t_off - (-offset_samples / sr)) < 1.5 / sr
    assert strength > 0.5
    assert len(corr) == len(a1) + len(a2) - 1


def test_znormalize_contract(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 5 + 3
    z = np.asarray(znormalize(x))
    assert abs(z.mean()) < 1e-4 and abs(z.std() - 1.0) < 1e-3


def test_calculate_audio_correlation_silent_is_zero():
    assert calculate_audio_correlation(np.zeros(100), np.zeros(100)) == 0.0


def test_calculate_audio_correlation_identical(rng):
    x = rng.standard_normal(1000)
    assert calculate_audio_correlation(x, x) == pytest.approx(1.0, abs=1e-3)


def test_plot_audio_correlation_renders(tmp_path, rng):
    """4-panel sync-analysis PNG (reference utils.py:168-225)."""
    from video3d_tpu.ops.correlate import cross_correlate_full, znormalize
    from video3d_tpu.utils.viz import plot_audio_correlation

    sr = 4000
    a1 = rng.normal(size=sr).astype("float32")
    a2 = rng.normal(size=sr).astype("float32")
    import jax.numpy as jnp

    corr = cross_correlate_full(znormalize(jnp.asarray(a2)),
                                znormalize(jnp.asarray(a1)))
    out = plot_audio_correlation(a1, a2, sr, 0.1, tmp_path, correlation=corr)
    import numpy as np

    assert out.exists() and out.stat().st_size > 10000


def test_video_aligner_e2e_on_wavs(tmp_path, rng):
    """Full stage on WAV inputs (the ffmpeg-less path): recovers the offset,
    writes the reference-schema JSON artifact and the sync plot."""
    sr = 22050
    offset_s = 0.5
    base = _noise_clip(rng, sr * 8)
    a1 = base[sr : sr * 6]
    a2 = base[sr + int(offset_s * sr) : sr * 6 + int(offset_s * sr)]
    write_wav(tmp_path / "v1.wav", a1 * 0.5, sr)
    write_wav(tmp_path / "v2.wav", a2 * 0.5, sr)

    aligner = VideoAligner.__new__(VideoAligner)  # skip video probing for WAVs
    from pathlib import Path

    aligner.video1_path = tmp_path / "v1.wav"
    aligner.video2_path = tmp_path / "v2.wav"
    aligner.work_dir = Path(tmp_path / "work")
    aligner.work_dir.mkdir()
    aligner.video1_info = {"fps": 24.0}
    aligner.video2_info = {"fps": 24.0}

    data = aligner.find_alignment(max_audio_length=10.0)
    assert abs(data["time_offset_seconds"] - (-offset_s)) < 2 / sr
    assert data["correlation_strength"] > 0.6
    assert set(data) == {
        "video1_path", "video2_path", "time_offset_seconds", "offset_frames",
        "correlation_strength", "frame_duration", "video1_fps", "video2_fps",
        "sample_rate", "audio_length_analyzed",
    }
    assert (aligner.work_dir / "alignment_data.json").exists()
    assert (aligner.work_dir / "sync_analysis.png").exists()

    quality = aligner.assess_alignment_quality(data)
    assert quality in {"EXCELLENT", "GOOD", "MODERATE", "POOR"}

    # offset application contract (reference align.py:119-147)
    f = str(aligner.work_dir / "alignment_data.json")
    assert apply_offset_to_pipeline(f, str(tmp_path / "v1.wav"), 10.0) == 10.0
    adj = apply_offset_to_pipeline(f, str(tmp_path / "v2.wav"), 10.0)
    assert adj == pytest.approx(10.0 + data["time_offset_seconds"], abs=1e-9)
    # clamped at zero
    assert apply_offset_to_pipeline(f, str(tmp_path / "v2.wav"), 0.0) >= 0.0
    with pytest.raises(ValueError):
        apply_offset_to_pipeline(f, "unknown.mp4", 0.0)


def test_quality_tiers():
    aligner = VideoAligner.__new__(VideoAligner)
    mk = lambda off, corr: {
        "time_offset_seconds": off,
        "correlation_strength": corr,
        "frame_duration": 1 / 24.0,
    }
    assert aligner.assess_alignment_quality(mk(0.01, 0.2)) == "EXCELLENT"
    assert aligner.assess_alignment_quality(mk(5.0, 0.9)) == "GOOD"
    assert aligner.assess_alignment_quality(mk(5.0, 0.7)) == "MODERATE"
    assert aligner.assess_alignment_quality(mk(5.0, 0.3)) == "POOR"


def test_load_alignment_data_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_alignment_data(str(tmp_path / "nope.json"))
