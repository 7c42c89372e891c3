"""Alignment-offset threading through depth + guided upscale.

The reference leaves offset application to a manual extract_aligned
pre-cut (extract_aligned.py:56-81); the rebuild's guided upscaler newly
*requires* per-frame SBS<->4K correspondence, so run_pipeline threads the
measured offset into the depth stage (SBS start frame) and the upscaler
(4K guide reader start).  These tests pin the offset->start math for both
signs and prove behaviorally that the guided filter reads the correct 4K
guide frames when given ``guide_start_frame``.
"""

import json

import cv2
import numpy as np

from video3d_tpu.core.cache import depth_frame_name
from video3d_tpu.core.depthio import load_depth_png16, save_depth_png16
from video3d_tpu.stages.pipeline import alignment_start_frames
from video3d_tpu.stages.upscale import DepthUpscaler


def _alignment(offset_s, fps1=24.0, fps2=24.0):
    return {
        "time_offset_seconds": offset_s,
        "video1_fps": fps1,
        "video2_fps": fps2,
    }


def test_start_frames_positive_offset():
    # video2 (4K) events lag by 0.5 s: guide reader skips 0.5 s of 4K
    sbs, guide = alignment_start_frames(_alignment(0.5))
    assert (sbs, guide) == (0, 12)


def test_start_frames_negative_offset():
    # video2 leads: SBS depth extraction skips, guide starts at 0
    sbs, guide = alignment_start_frames(_alignment(-0.25))
    assert (sbs, guide) == (6, 0)


def test_start_frames_uses_per_video_fps():
    # conversion uses each video's own frame rate (SBS 24, 4K 30)
    sbs, guide = alignment_start_frames(_alignment(1.0, fps1=24.0, fps2=30.0))
    assert (sbs, guide) == (0, 30)
    sbs, guide = alignment_start_frames(_alignment(-1.0, fps1=24.0, fps2=30.0))
    assert (sbs, guide) == (24, 0)


def test_start_frames_zero_offset():
    assert alignment_start_frames(_alignment(0.0)) == (0, 0)


def _make_edge_guide_video(path, n_frames, width, height, fps, offset_k):
    """4K guide video: frame j has a sharp vertical edge at column
    edge_col(j - offset_k); i.e. guide frame i + offset_k carries the
    edge matching content index i."""
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )
    assert writer.isOpened()
    for j in range(n_frames):
        c = j - offset_k
        edge = 16 + 12 * c
        frame = np.zeros((height, width, 3), np.uint8)
        frame[:, edge:] = 255
        writer.write(frame)
    writer.release()


def _edge_sharpness(row, expect_col, halo=4):
    """Max |gradient| near the expected edge column."""
    lo, hi = max(expect_col - halo, 1), min(expect_col + halo, len(row) - 1)
    return np.abs(np.diff(row.astype(np.float64)))[lo - 1 : hi].max()


def test_guided_upscale_uses_offset_guide_frames(tmp_path):
    """Depth frame i's edge matches guide frame i+k; with
    guide_start_frame=k the guided filter keeps that edge sharp at full
    contrast, while an unshifted guide (wrong frames) blurs it."""
    k = 3
    h, w, H, W = 24, 48, 48, 96
    n_depth = 4
    depth_dir = tmp_path / "depth_feedc0de00000000"
    depth_dir.mkdir()
    for i in range(n_depth):
        edge = (16 + 12 * i) // 2  # depth-res column of content i's edge
        d = np.zeros((h, w), np.uint16)
        d[:, edge:] = 60000
        save_depth_png16(depth_dir / depth_frame_name(i), d)

    video_4k = tmp_path / "movie_4k.mp4"
    _make_edge_guide_video(
        video_4k, n_depth + k, W, H, fps=24.0, offset_k=k
    )

    def run(start, out_name):
        up = DepthUpscaler(
            work_dir=str(tmp_path / out_name),
            method="guided",
            batch_size=2,
            radius=4,
            eps=1e-4,
        )
        out = up.process_depth_upscaling(
            str(depth_dir),
            str(video_4k),
            png16_out=True,
            guide_start_frame=start,
        )
        return [
            load_depth_png16(p) for p in sorted(out.glob("depth_*.png"))
        ]

    aligned = run(k, "out_aligned")
    misaligned = run(0, "out_misaligned")
    assert len(aligned) == n_depth == len(misaligned)

    for i in range(n_depth):
        expect = 16 + 12 * i  # full-res edge column for content i
        mid_a = aligned[i][H // 2]
        mid_m = misaligned[i][H // 2]
        sharp_a = _edge_sharpness(mid_a, expect)
        sharp_m = _edge_sharpness(mid_m, expect)
        # correct guide: edge survives nearly step-sharp; wrong guide
        # frames (edge elsewhere) flatten the transfer coefficients and
        # the depth edge comes out materially blurred
        assert sharp_a > 20000, (i, sharp_a)
        assert sharp_a > 1.5 * sharp_m, (i, sharp_a, sharp_m)


def test_run_pipeline_applies_offset_from_existing_alignment(tmp_path, monkeypatch):
    """skip_alignment + an existing alignment_data.json still threads the
    stored offset into depth (SBS start) and upscale (guide start)."""
    from video3d_tpu.stages import pipeline as pl

    work = tmp_path / "work"
    work.mkdir()
    (work / "alignment_data.json").write_text(
        json.dumps(_alignment(0.5, fps1=24.0, fps2=24.0))
    )

    seen = {}

    class FakeExtractor:
        def __init__(self, **kw):
            pass

        def process_video_sbs(self, video, start_frame=0, max_frames=None,
                              force=False):
            seen["sbs_start"] = start_frame
            d = work / "depth_0000000000000000"
            d.mkdir(exist_ok=True)
            return d

    class FakeUpscaler:
        def __init__(self, **kw):
            pass

        def process_depth_upscaling(self, depth_dir, video_4k, force=False,
                                    max_frames=None, guide_start_frame=0):
            seen["guide_start"] = guide_start_frame
            return work / "depth_4k_x.mp4"

    monkeypatch.setattr(pl, "StereoDepthExtractor", FakeExtractor)
    monkeypatch.setattr(pl, "DepthUpscaler", FakeUpscaler)
    result = pl.run_pipeline(
        "sbs.mp4", "4k.mp4", work_dir=str(work), skip_alignment=True
    )
    assert seen == {"sbs_start": 0, "guide_start": 12}
    assert result["guide_start_frame"] == 12
