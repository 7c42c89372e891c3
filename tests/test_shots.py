"""Per-shot auto-range: shot detection + per-shot D + shared cache.

The reference runs one global num_disparities=64 for a whole film
(reference depth.py:84-100); process_video_sbs_shots picks D per shot.
These tests build a two-shot SBS clip (different texture AND different
true disparity per shot) and assert the boundary is found, each shot
gets its own narrowed range, and the shared cache decodes to correct
per-shot disparities on ONE film-wide PNG scale.
"""

import numpy as np

from video3d_tpu.core.cache import depth_frame_name
from video3d_tpu.core.depthio import load_depth_png16
from video3d_tpu.core.shots import detect_shots
from video3d_tpu.ops.stereo import SGBMParams
from video3d_tpu.stages.depth import StereoDepthExtractor


def make_two_shot_sbs(path, eye_w=128, height=64, n_a=16, n_b=16,
                      shift_a=4, shift_b=24, fps=24.0):
    import cv2

    rng = np.random.default_rng(7)
    max_shift = max(shift_a, shift_b)
    yy, xx = np.mgrid[0:height, 0:eye_w + max_shift].astype(np.float64)

    def tex(seed_freqs, bias):
        t = np.zeros_like(xx)
        for fx, fy, ph in seed_freqs:
            t += np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
        t = (t - t.min()) / (np.ptp(t) + 1e-9) * 200 + bias
        return t.astype(np.uint8)

    freqs = lambda: [tuple(rng.uniform(0.05, 0.3, 2)) + (rng.uniform(0, 6),)
                     for _ in range(8)]
    tex_a, tex_b = tex(freqs(), 0), tex(freqs(), 55)

    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
        (eye_w * 2, height))
    assert writer.isOpened()
    for pat, n, shift in ((tex_a, n_a, shift_a), (tex_b, n_b, shift_b)):
        for i in range(n):
            p = np.roll(pat, i, axis=0)
            sbs = np.concatenate(
                [p[:, :eye_w], p[:, shift:shift + eye_w]], axis=1)
            writer.write(np.repeat(sbs[..., None], 3, axis=-1))
    writer.release()


def test_detect_shots_finds_cut(tmp_path):
    video = tmp_path / "two.mp4"
    make_two_shot_sbs(video)
    shots = detect_shots(str(video))
    assert shots == [(0, 16), (16, 32)]


def test_detect_shots_single_shot(tmp_path):
    video = tmp_path / "one.mp4"
    make_two_shot_sbs(video, n_b=0)
    assert detect_shots(str(video)) == [(0, 16)]


def test_per_shot_auto_range_processing(tmp_path, capsys):
    video = tmp_path / "two.mp4"
    shift_a, shift_b = 4, 24
    make_two_shot_sbs(video, shift_a=shift_a, shift_b=shift_b)

    ext = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        batch_size=4,
        unsqueeze_anamorphic=False,
        apply_speckle=False,
        params=SGBMParams(num_disparities=48),
    )
    cache = ext.process_video_sbs_shots(str(video), sample_frames=2)
    out = capsys.readouterr().out
    # shot A fits in D=16, shot B needs 32 (24*1.1+2 -> 32)
    assert "2 shots, D in [16, 32] (full range 48)" in out
    # extractor state restored after the run
    assert ext.params.num_disparities == 48
    assert ext._norm_disparities is None

    files = [cache / depth_frame_name(i) for i in range(32)]
    assert all(f.exists() for f in files)

    # both shots decode on the FILM-WIDE scale (base D=48), not their
    # narrowed per-shot ranges
    for idx, shift in ((2, shift_a), (20, shift_b)):
        d = load_depth_png16(files[idx]).astype(np.float64) * 48.0 / 65535.0
        med = np.median(d[8:-8, 80:120])
        assert abs(med - shift) < 2.0, (idx, med, shift)

    # idempotent resume: second call hits the same cache, same files
    mtime = files[0].stat().st_mtime
    assert ext.process_video_sbs_shots(str(video), sample_frames=2) == cache
    assert files[0].stat().st_mtime == mtime
