"""Core media I/O tests: probing, streaming reader, writers, audio, cache."""

import numpy as np
import pytest

from tests.conftest import make_test_video
from video3d_tpu.core import (
    DepthMapWriter,
    VideoReader,
    VideoWriter,
    audio_cache_path,
    content_key,
    depth_cache_dir,
    extract_audio,
    get_video_info,
    list_depth_frames,
    load_audio_for_sync,
    load_depth_png16,
    read_wav,
    save_depth_png16,
    verify_video_compatibility,
    write_wav,
)
from video3d_tpu.core.cache import depth_frame_name, is_depth_cached


def test_probe_video(tmp_path):
    make_test_video(tmp_path / "v.mp4", n_frames=10, width=96, height=48, fps=12.0)
    info = get_video_info(str(tmp_path / "v.mp4"))
    assert info is not None
    assert info["width"] == 96 and info["height"] == 48
    assert abs(info["fps"] - 12.0) < 0.01
    assert info["frames"] == 10
    assert abs(info["duration"] - 10 / 12.0) < 0.1


def test_probe_missing_returns_none(tmp_path):
    assert get_video_info(str(tmp_path / "nope.mp4")) is None


def test_compatibility_gate(tmp_path):
    make_test_video(tmp_path / "a.mp4", n_frames=24, fps=24.0)
    make_test_video(tmp_path / "b.mp4", n_frames=24, fps=24.0, seed=1)
    make_test_video(tmp_path / "c.mp4", n_frames=48, fps=12.0)
    assert verify_video_compatibility(str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4"))
    # fps differs by 12 (>0.1 tolerance, reference utils.py:249)
    assert not verify_video_compatibility(
        str(tmp_path / "a.mp4"), str(tmp_path / "c.mp4")
    )


def test_video_reader_streams_batches(tmp_path):
    frames = make_test_video(tmp_path / "v.mp4", n_frames=11, width=64, height=32)
    reader = VideoReader(str(tmp_path / "v.mp4"), batch_size=4)
    got = []
    for batch, valid in reader:
        assert batch.shape == (4, 32, 64, 3) and batch.dtype == np.uint8
        got.extend(batch[:valid])
    assert len(got) == 11
    # mp4 lossy encode: frames match approximately
    for ref, dec in zip(frames, got):
        assert np.mean(np.abs(ref.astype(int) - dec.astype(int))) < 12


def test_video_reader_start_and_max(tmp_path):
    make_test_video(tmp_path / "v.mp4", n_frames=12, width=64, height=32)
    reader = VideoReader(str(tmp_path / "v.mp4"), start_frame=5, max_frames=4,
                         batch_size=8)
    batches = list(reader)
    assert sum(v for _, v in batches) == 4


def test_video_writer_roundtrip(tmp_path):
    out = tmp_path / "out.mp4"
    with VideoWriter(str(out), width=64, height=32, fps=10.0) as w:
        for i in range(8):
            w.write(np.full((32, 64), i * 30, np.uint8))
    info = get_video_info(str(out))
    assert info["frames"] == 8 and info["width"] == 64


def test_wav_roundtrip(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    write_wav(tmp_path / "a.wav", sig, sr)
    back, sr2 = read_wav(tmp_path / "a.wav")
    assert sr2 == sr
    assert np.max(np.abs(back - sig)) < 1e-3


def test_extract_audio_wav_fallback_and_cache(tmp_path, tmp_work):
    sr = 8000
    sig = np.sin(2 * np.pi * 220 * np.arange(sr * 2) / sr).astype(np.float32) * 0.3
    src = tmp_path / "src.wav"
    write_wav(src, sig, sr)
    out = extract_audio(str(src), tmp_work, duration=1.5)
    audio, sr_out = load_audio_for_sync(out, max_length_seconds=1.0)
    assert sr_out == 22050
    assert len(audio) == 22050
    # second call hits the cache (same path)
    out2 = extract_audio(str(src), tmp_work, duration=1.5)
    assert out2 == out


def test_cache_keys_and_layout(tmp_work):
    key = content_key("/a/b.mp4", 0, 100, "m", True)
    assert len(key) == 16 and all(c in "0123456789abcdef" for c in key)
    d = depth_cache_dir(tmp_work, "/a/b.mp4", 0, 100, "m", True)
    assert d.name == f"depth_{key}"
    a = audio_cache_path(tmp_work, "/a/b.mp4", 300.0, 22050)
    assert a.name.startswith("audio_cache_") and a.suffix == ".wav"
    assert depth_frame_name(7) == "depth_000007.png"


def test_depth_png16_roundtrip_and_writer(tmp_path):
    depth = (np.random.default_rng(0).integers(0, 65536, (24, 32))).astype(np.uint16)
    save_depth_png16(tmp_path / "d.png", depth)
    assert np.array_equal(load_depth_png16(tmp_path / "d.png"), depth)

    cache = tmp_path / "cache"
    batch = np.stack([depth, depth + 1, depth + 2, np.zeros_like(depth)])
    with DepthMapWriter(cache) as w:
        w.put(batch, start_index=0, valid=3)
    files = list_depth_frames(cache)
    assert [f.name for f in files] == [depth_frame_name(i) for i in range(3)]
    assert np.array_equal(load_depth_png16(files[2]), depth + 2)
    assert is_depth_cached(cache, 3)
    assert not is_depth_cached(cache, 4)


def test_depth_writer_rejects_wrong_dtype(tmp_path):
    with pytest.raises(TypeError):
        save_depth_png16(tmp_path / "x.png", np.zeros((4, 4), np.float32))
