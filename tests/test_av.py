"""libav-backed native media I/O (native/avio.cc via core/_native.py).

Covers the in-process replacements for the reference's ffmpeg
subprocesses: video encode (libx264 crf/preset contract of reference
upscale.py:47-63, including the grayscale fast path), streaming decode
with frame-accurate seek (reference depth.py:163-182 seek contract),
and any-codec audio extraction (reference utils.py:41-119 -- the AAC
case that the box-level PCM extractor cannot serve).

All tests skip when the libav runtime isn't present; the framework
falls back to ffmpeg/OpenCV paths covered by test_core_io.py.
"""

import numpy as np
import pytest

from video3d_tpu.core import _native
from video3d_tpu.core.audio import (
    extract_audio,
    load_audio_for_sync,
    read_wav,
    write_wav,
)
from video3d_tpu.core.video import VideoReader, VideoWriter

pytestmark = pytest.mark.skipif(
    _native.av_lib() is None, reason="libav native library not available"
)


def _gray_frames(n=16, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for i in range(n):
        g = yy / h * 120 + xx / w * 60 + 20 * np.sin(i / 3.0)
        g = g + rng.normal(0, 2, (h, w))
        out.append(np.clip(g, 0, 255).astype(np.uint8))
    return out


def test_writer_reader_roundtrip_gray(tmp_path):
    p = str(tmp_path / "g.mp4")
    frames = _gray_frames()
    with _native.AVWriter(p, 96, 64, 24.0, crf=18, preset="veryfast",
                          gray=True) as w:
        for f in frames:
            w.write(f)
    r = _native.AVReader(p)
    assert (r.width, r.height) == (96, 64)
    assert abs(r.fps - 24.0) < 1e-6
    assert r.n_frames == len(frames)
    dec = []
    while True:
        f = r.read()
        if f is None:
            break
        dec.append(f)
    r.close()
    assert len(dec) == len(frames)
    # crf-18 lossy, smooth content: tight bound; also checks the
    # grayscale LUT path maps luma consistently end to end
    err = np.abs(dec[0][..., 0].astype(int) - frames[0].astype(int))
    assert err.mean() < 3.0, err.mean()
    # U=V=128 -> decoded RGB is gray: channels agree
    assert np.abs(dec[0][..., 0].astype(int)
                  - dec[0][..., 2].astype(int)).mean() < 1.5


def test_writer_gray_matches_rgb_path(tmp_path):
    """The gray fast path (LUT luma) must land on the same video as the
    RGB path fed with a replicated-channel frame (same limited-range
    BT.601 luma)."""
    frames = _gray_frames(n=6)
    pg = str(tmp_path / "g.mp4")
    pc = str(tmp_path / "c.mp4")
    with _native.AVWriter(pg, 96, 64, 24.0, gray=True) as w:
        for f in frames:
            w.write(f)
    with _native.AVWriter(pc, 96, 64, 24.0) as w:
        for f in frames:
            w.write(np.repeat(f[..., None], 3, axis=-1))
    ra, rb = _native.AVReader(pg), _native.AVReader(pc)
    a, b = ra.read(), rb.read()
    ra.close(), rb.close()
    assert np.abs(a[..., 0].astype(int) - b[..., 0].astype(int)).mean() < 1.0


def test_reader_seek_frame_accurate(tmp_path):
    p = str(tmp_path / "s.mp4")
    # distinct constant-level frames make frame identity measurable
    levels = [int(10 + 12 * i) for i in range(18)]
    with _native.AVWriter(p, 96, 64, 24.0, gray=True) as w:
        for lv in levels:
            w.write(np.full((64, 96), lv, np.uint8))
    r = _native.AVReader(p)
    assert r.seek(11)
    f = r.read()
    r.close()
    got = int(np.median(f[..., 0]))
    # nearest level must be frame 11's, not a keyframe neighbor
    nearest = min(range(len(levels)), key=lambda i: abs(levels[i] - got))
    assert nearest == 11, (got, levels)


def test_videoreader_videowriter_av_backend(tmp_path):
    p = str(tmp_path / "v.mp4")
    frames = _gray_frames(n=20)
    with VideoWriter(p, 96, 64, 24.0, backend="av") as w:
        for f in frames:
            w.write(f)
    r = VideoReader(p, batch_size=8, backend="av")
    total = sum(valid for _, valid in r)
    assert total == 20
    r2 = VideoReader(p, start_frame=13, batch_size=8, backend="av")
    assert sum(valid for _, valid in r2) == 7


def test_videowriter_av_rejects_mode_switch(tmp_path):
    p = str(tmp_path / "m.mp4")
    w = VideoWriter(p, 96, 64, 24.0, backend="av")
    w.write(np.zeros((64, 96), np.uint8))  # opens in gray mode
    with pytest.raises(ValueError):
        w.write(np.zeros((64, 96, 3), np.uint8))
    w.close()


def test_aac_audio_extraction_and_alignment_offset(tmp_path):
    """Full ffmpeg-less alignment path on AAC audio: encode two M4A
    clips where clip B lags clip A by a known offset, then recover the
    offset through extract_audio + the device correlation (the
    reference needs the ffmpeg binary + librosa for this,
    utils.py:41-134)."""
    rng = np.random.default_rng(3)
    sr = 44100
    offset_s = 0.75
    base = rng.normal(0, 0.2, int(sr * 6)).astype(np.float32)
    # band-limit so AAC keeps the structure
    k = np.ones(16, np.float32) / 16
    base = np.convolve(base, k, mode="same")
    lag = int(offset_s * sr)
    a_sig = base[lag:]
    b_sig = base[: len(base) - lag]  # B starts `offset_s` earlier
    wa, wb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    ma, mb = str(tmp_path / "a.m4a"), str(tmp_path / "b.m4a")
    write_wav(wa, a_sig, sr)
    write_wav(wb, b_sig, sr)
    assert _native.av_wav_to_m4a(wa, ma) is None
    assert _native.av_wav_to_m4a(wb, mb) is None

    pa = extract_audio(ma, tmp_path, duration=6.0, sample_rate=22050)
    pb = extract_audio(mb, tmp_path, duration=6.0, sample_rate=22050)
    audio1, rate = load_audio_for_sync(pa, 6.0)
    audio2, _ = load_audio_for_sync(pb, 6.0)

    from video3d_tpu.ops.correlate import find_audio_offset

    offset, strength, _ = find_audio_offset(audio1, audio2, rate)
    # A's content appears `offset_s` later in B
    assert abs(abs(offset) - offset_s) < 0.01, offset
    assert strength > 0.5, strength


def test_av_mux_video_plus_audio(tmp_path):
    """Stream-copy mux of a video-only MP4 with an M4A audio track; the
    result must still decode as video AND serve audio extraction."""
    vp = str(tmp_path / "v.mp4")
    with VideoWriter(vp, 96, 64, 24.0, backend="av") as w:
        for f in _gray_frames(n=12):
            w.write(f)
    sr = 44100
    sig = np.sin(2 * np.pi * 500 * np.arange(sr) / sr) * 0.3
    wav, m4a = str(tmp_path / "a.wav"), str(tmp_path / "a.m4a")
    write_wav(wav, sig, sr)
    assert _native.av_wav_to_m4a(wav, m4a) is None
    out = str(tmp_path / "av.mp4")
    assert _native.av_mux(vp, m4a, out) is None
    r = VideoReader(out, batch_size=8, backend="av")
    assert sum(valid for _, valid in r) == 12
    wav_out = extract_audio(out, tmp_path, duration=1.0, sample_rate=22050)
    audio, rate = read_wav(wav_out)
    sp = np.abs(np.fft.rfft(audio))
    assert abs(np.argmax(sp) / (len(audio) / rate) - 500) < 5


def test_segment_parallel_x264_concat(tmp_path):
    """Multi-segment x264 encode + native box-level concat: segments
    written by independent AVWriter instances must have byte-identical
    codec config (stsd) so v3d_mp4_concat stitches without re-encode."""
    from video3d_tpu.core.video import SegmentParallelVideoWriter

    p = str(tmp_path / "seg.mp4")
    frames = _gray_frames(n=20)
    with SegmentParallelVideoWriter(
        p, 96, 64, 24.0, workers=2, segment_frames=6, backend="av",
        preset="veryfast",
    ) as w:
        for f in frames:
            w.write(f)
    r = VideoReader(p, batch_size=8, backend="av")
    assert sum(valid for _, valid in r) == 20


def test_av_audio_max_duration(tmp_path):
    sr = 32000
    sig = np.sin(2 * np.pi * 220 * np.arange(sr * 5) / sr) * 0.3
    wav, m4a = str(tmp_path / "d.wav"), str(tmp_path / "d.m4a")
    out = str(tmp_path / "out.wav")
    write_wav(wav, sig, sr)
    assert _native.av_wav_to_m4a(wav, m4a) is None
    assert _native.av_audio_to_wav(m4a, out, 22050, 2.0) is None
    audio, rate = read_wav(out)
    assert rate == 22050
    assert abs(len(audio) - 2 * 22050) <= 1


def test_writer_internal_threads(tmp_path):
    """x264 frame-level threading (VideoWriter threads=N -> avio
    thread_count): a threads=2 encode must produce a decodable stream
    with every frame present and pixels close to the threads=1 output
    (frame threads change encoder scheduling, not the decode contract).
    Throughput scaling needs a multi-core host; this guards the
    contract so the flag is safe to flip when one appears."""
    frames = _gray_frames(n=12)
    paths = {}
    for threads in (1, 2):
        p = str(tmp_path / f"t{threads}.mp4")
        with VideoWriter(p, 96, 64, 24.0, backend="av",
                         preset="veryfast", threads=threads) as w:
            for f in frames:
                w.write(f)
        paths[threads] = p
    for threads, p in paths.items():
        r = VideoReader(p, batch_size=4, backend="av")
        got = sum(valid for _, valid in r)
        assert got == len(frames), (threads, got)
    r1 = VideoReader(paths[1], batch_size=16, backend="av")
    r2 = VideoReader(paths[2], batch_size=16, backend="av")
    b1, n1 = next(iter(r1))
    b2, n2 = next(iter(r2))
    assert n1 == n2 == 12
    assert np.abs(b1.astype(int) - b2.astype(int)).mean() < 2.0


def test_segment_parallel_worker_threads(tmp_path):
    """Segment workers each carrying x264-internal threads compose:
    frames all present after the box-level concat."""
    from video3d_tpu.core.video import SegmentParallelVideoWriter

    p = str(tmp_path / "segt.mp4")
    frames = _gray_frames(n=20)
    with SegmentParallelVideoWriter(
        p, 96, 64, 24.0, workers=2, segment_frames=6, backend="av",
        preset="veryfast", threads=2,
    ) as w:
        for f in frames:
            w.write(f)
    r = VideoReader(p, batch_size=8, backend="av")
    assert sum(valid for _, valid in r) == 20
