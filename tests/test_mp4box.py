"""Native MP4 box-level stream copy (native/mp4box.cc).

Pins the ffmpeg ``-ss .. -t .. -c copy`` contract the reference's
segment extractor relies on (extract_aligned.py:124-133) for hosts
without ffmpeg: cuts start at the previous video keyframe, copied
samples are bit-exact (no re-encode), and the output is a standalone
playable MP4 whose decode matches the source decode frame-for-frame.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from video3d_tpu.core._native import cut_mp4, lib


pytestmark = pytest.mark.skipif(
    lib() is None, reason="native library not built"
)


def write_clip(path, n=96, w=96, h=64, fps=24.0, seed=0):
    """Smooth moving-texture clip: compressible, so the encoder emits
    P-frames and keyframe snapping is actually exercised."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (9, 9), 3)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    assert wr.isOpened()
    for i in range(n):
        wr.write(np.roll(base, i, axis=1))
    wr.release()


def decode_all(path):
    cap = cv2.VideoCapture(str(path))
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f)
    cap.release()
    return out


def test_cut_is_bitexact_streamcopy(tmp_path):
    src = tmp_path / "src.mp4"
    write_clip(src)
    out = tmp_path / "cut.mp4"
    assert cut_mp4(str(src), str(out), 1.3, 1.0) is None

    orig = decode_all(src)
    got = decode_all(out)
    assert len(got) > 0
    # first output frame must exist verbatim in the source decode at or
    # before the requested start (keyframe snap, never after)
    matches = [
        k for k in range(len(orig)) if np.array_equal(orig[k], got[0])
    ]
    assert matches, "first cut frame not found in source decode"
    k = matches[0]
    assert k <= int(1.3 * 24) + 1
    # every following frame matches the source run exactly (stream copy)
    for i, f in enumerate(got):
        assert np.array_equal(orig[k + i], f), f"frame {i} differs"
    # window length: from the snapped keyframe through start+duration
    want = int(round((1.3 + 1.0) * 24)) - k
    assert abs(len(got) - want) <= 2


def test_cut_from_zero_full_duration(tmp_path):
    src = tmp_path / "src.mp4"
    write_clip(src, n=48)
    out = tmp_path / "all.mp4"
    assert cut_mp4(str(src), str(out), 0.0, 2.0) is None
    orig = decode_all(src)
    got = decode_all(out)
    assert len(got) == len(orig)
    assert all(np.array_equal(a, b) for a, b in zip(orig, got))


def test_cut_errors(tmp_path):
    assert cut_mp4(str(tmp_path / "missing.mp4"), str(tmp_path / "o.mp4"),
                   0, 1) is not None
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"this is not an mp4 file at all, not even close")
    assert cut_mp4(str(bad), str(tmp_path / "o.mp4"), 0, 1) is not None
    src = tmp_path / "src.mp4"
    write_clip(src, n=24)
    # window entirely beyond the end selects nothing
    assert cut_mp4(str(src), str(tmp_path / "o.mp4"), 100.0, 1.0) is not None


def test_extract_stage_uses_native_cut(tmp_path, monkeypatch):
    """AlignedExtractor on an ffmpeg-less host stream-copies via the
    native remuxer instead of re-encoding."""
    import json

    from video3d_tpu.stages.extract import AlignedExtractor

    v1 = tmp_path / "sbs.mp4"
    v2 = tmp_path / "movie.mp4"
    write_clip(v1, n=96, seed=1)
    write_clip(v2, n=96, seed=2)
    align = {
        "video1_path": str(v1),
        "video2_path": str(v2),
        "time_offset_seconds": 0.5,
        "correlation_strength": 0.9,
    }
    af = tmp_path / "alignment_data.json"
    af.write_text(json.dumps(align))

    monkeypatch.setattr("shutil.which", lambda name: None)  # no ffmpeg
    ex = AlignedExtractor(str(af))
    res = ex.extract_segment(24, 1.0, output_dir=str(tmp_path / "segs"))
    for name, path in res.items():
        assert path.exists() and path.stat().st_size > 0
        frames = decode_all(path)
        assert len(frames) >= 20
    # video2's window is shifted by the offset: its first frame comes
    # from ~0.5 s later on its own timeline
    orig2 = decode_all(v2)
    got2 = decode_all(res["video2"])
    m = [k for k in range(len(orig2)) if np.array_equal(orig2[k], got2[0])]
    assert m and m[0] <= int((24 / 24.0 + 0.5) * 24) + 1


def test_native_concat_bit_identical(tmp_path):
    """v3d_mp4_concat joins same-codec segments without re-encoding:
    decoded frames must equal each segment's own decode, in order."""
    import cv2

    from video3d_tpu.core._native import concat_mp4, lib

    if lib() is None:
        pytest.skip("native library not built")

    def write(path, n, seed):
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                            24, (128, 64))
        base = np.random.default_rng(seed).integers(
            0, 255, (64, 128, 3), np.uint8)
        base = cv2.GaussianBlur(base, (0, 0), 2)
        for i in range(n):
            w.write(np.roll(base, i * 2, axis=1))
        w.release()

    def dec(p):
        c = cv2.VideoCapture(str(p))
        fs = []
        while True:
            ok, f = c.read()
            if not ok:
                break
            fs.append(f)
        return fs

    segs = [tmp_path / f"seg{i}.mp4" for i in range(3)]
    for i, s in enumerate(segs):
        write(s, 4 + i, i)
    out = tmp_path / "cat.mp4"
    assert concat_mp4([str(s) for s in segs], str(out)) is None
    got = dec(out)
    ref = sum((dec(s) for s in segs), [])
    assert len(got) == len(ref) == 4 + 5 + 6
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_segment_parallel_writer(tmp_path):
    """SegmentParallelVideoWriter output decodes to the same frame count
    and near-identical content as the frames written."""
    from video3d_tpu.core import SegmentParallelVideoWriter, VideoReader

    rng = np.random.default_rng(0)
    import cv2

    base = cv2.GaussianBlur(
        rng.integers(0, 255, (64, 128, 3), np.uint8), (0, 0), 2)
    frames = [np.roll(base, i * 3, axis=1) for i in range(25)]
    out = tmp_path / "seg_par.mp4"
    with SegmentParallelVideoWriter(str(out), 128, 64, 24.0, workers=3,
                                    segment_frames=8) as w:
        for f in frames:
            w.write(f)
    decoded = []
    for batch, valid in VideoReader(str(out), batch_size=8):
        decoded.extend(batch[:valid])
    assert len(decoded) == 25
    diff = np.mean([
        np.abs(d.astype(np.int32) - f.astype(np.int32)).mean()
        for d, f in zip(decoded, frames)
    ])
    assert diff < 8.0  # lossy codec tolerance


# ---------------------------------------------------------------------------
# PCM audio track extraction (ffmpeg-less alignment)


def _minimal_pcm_mp4(path, pcm_bytes, codec=b"sowt", rate=8000, channels=1,
                     bits=16):
    """Hand-built minimal MP4 with one uncompressed audio track."""
    import struct

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    entry = (struct.pack(">I", 36) + codec + b"\x00" * 6 +
             struct.pack(">H", 1) + b"\x00" * 8 +
             struct.pack(">HH", channels, bits) + b"\x00" * 4 +
             struct.pack(">I", rate << 16))
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
    n = len(pcm_bytes)
    stts = box(b"stts", struct.pack(">IIII", 0, 1, 1, n))
    stsc = box(b"stsc", struct.pack(">IIIII", 0, 1, 1, 1, 1))
    stsz = box(b"stsz", struct.pack(">IIII", 0, 0, 1, n))
    mdhd = box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, rate, n, 0, 0))
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"soun" + b"\x00" * 14)

    def make(stco_off):
        stco = box(b"stco", struct.pack(">III", 0, 1, stco_off))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
        return moov

    moov = make(0)
    data_off = len(moov) + 8  # mdat payload position
    moov = make(data_off)
    with open(path, "wb") as f:
        f.write(moov)
        f.write(box(b"mdat", pcm_bytes))


@pytest.mark.parametrize("codec", [b"sowt", b"twos"])
def test_extract_pcm_wav_roundtrip(tmp_path, codec):
    from video3d_tpu.core import _native
    from video3d_tpu.core.audio import read_wav

    if _native.lib() is None or not hasattr(_native.lib(),
                                            "v3d_mp4_extract_pcm"):
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    samples = (rng.uniform(-0.5, 0.5, 4000) * 32767).astype("<i2")
    raw = samples.tobytes()
    if codec == b"twos":  # big-endian samples in the container
        raw = samples.astype(">i2").tobytes()
    mp4 = tmp_path / "a.mp4"
    _minimal_pcm_mp4(str(mp4), raw, codec=codec)
    out = tmp_path / "a.wav"
    err = _native.extract_pcm_wav(str(mp4), str(out))
    assert err is None, err
    audio, sr = read_wav(out)
    assert sr == 8000 and len(audio) == 4000
    np.testing.assert_allclose(audio, samples.astype(np.float32) / 32768.0,
                               atol=1e-4)


def test_extract_audio_uses_native_pcm_without_ffmpeg(tmp_path, monkeypatch):
    """extract_audio on an MP4 with a PCM track works with no ffmpeg."""
    import shutil as _sh

    from video3d_tpu.core import _native
    from video3d_tpu.core.audio import extract_audio, read_wav

    if _native.lib() is None or not hasattr(_native.lib(),
                                            "v3d_mp4_extract_pcm"):
        pytest.skip("native library not built")
    monkeypatch.setattr(_sh, "which", lambda name: None)
    rng = np.random.default_rng(1)
    samples = (rng.uniform(-0.5, 0.5, 16000) * 32767).astype("<i2")
    mp4 = tmp_path / "clip.mp4"
    _minimal_pcm_mp4(str(mp4), samples.tobytes(), rate=16000)
    wav = extract_audio(str(mp4), tmp_path / "work", duration=1.0,
                        sample_rate=8000)
    audio, sr = read_wav(wav)
    assert sr == 8000 and 7800 <= len(audio) <= 8000
