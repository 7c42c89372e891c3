"""Fused depth->upscale loop vs the file-coupled stages.

The fused path (stages/fused.py) must produce the SAME depth maps as the
default PNG-coupled pipeline (the round trip it removes is lossless
uint16), and its 4K output must decode to the same frames the unfused
upscaler encodes. Covers VERDICT r2 next-3 (device-resident stage
coupling)."""

import numpy as np
import pytest

from tests.conftest import make_test_video
from tests.test_depth_stage import make_sbs_video
from video3d_tpu.core import VideoReader, get_video_info
from video3d_tpu.stages.depth import StereoDepthExtractor
from video3d_tpu.stages.fused import run_fused_depth_upscale
from video3d_tpu.stages.upscale import DepthUpscaler


def _decode_all(path):
    frames = []
    for batch, valid in VideoReader(str(path), batch_size=4):
        frames.extend(batch[:valid])
    return np.stack(frames)


@pytest.mark.parametrize("temporal_smooth", [None, "median"])
def test_fused_matches_file_coupled(tmp_path, temporal_smooth):
    sbs = tmp_path / "sbs.mp4"
    make_sbs_video(sbs, n_frames=6, shift=5)
    video_4k = tmp_path / "movie4k.mp4"
    make_test_video(video_4k, n_frames=6, width=512, height=128)

    kw = dict(
        guidance="none", batch_size=2, unsqueeze_anamorphic=False,
        apply_speckle=False, temporal_smooth=temporal_smooth,
    )

    # file-coupled reference path
    ex_a = StereoDepthExtractor(work_dir=str(tmp_path / "wa"), **kw)
    cache_a = ex_a.process_video_sbs(str(sbs), max_frames=6)
    up = DepthUpscaler(work_dir=str(tmp_path / "wa"), batch_size=2)
    out_a = up.process_depth_upscaling(str(cache_a), str(video_4k),
                                       max_frames=6)

    # fused path, also emitting the depth cache for comparison
    ex_b = StereoDepthExtractor(work_dir=str(tmp_path / "wb"), **kw)
    res = run_fused_depth_upscale(
        str(sbs), str(video_4k), str(tmp_path / "wb" / "fused.mp4"),
        max_frames=6, extractor=ex_b, batch_size=2,
        cache_depth=True, cache_dir=tmp_path / "wb" / "depth_cache",
    )
    assert res["frames"] == 6

    # depth maps bit-identical (the PNG round trip is lossless)
    from video3d_tpu.core import load_depth_png16, list_depth_frames

    fa = list_depth_frames(cache_a)
    fb = list_depth_frames(tmp_path / "wb" / "depth_cache")
    assert len(fa) == len(fb) == 6
    for pa, pb in zip(fa, fb):
        np.testing.assert_array_equal(load_depth_png16(pa),
                                      load_depth_png16(pb))

    # 4K outputs decode to (near-)identical frames; both encodes see
    # identical input frames, so any difference is codec noise
    da = _decode_all(out_a)
    db = _decode_all(res["output"])
    assert da.shape == db.shape == (6, 128, 512, 3)
    assert np.mean(np.abs(da.astype(np.int32) - db.astype(np.int32))) < 2.0


def test_fused_plain_upscale_no_guide(tmp_path):
    """method='scale' needs no 4K decode stream and must still run."""
    sbs = tmp_path / "sbs.mp4"
    make_sbs_video(sbs, n_frames=4, shift=5)
    video_4k = tmp_path / "movie4k.mp4"
    make_test_video(video_4k, n_frames=4, width=512, height=128)

    ex = StereoDepthExtractor(
        work_dir=str(tmp_path / "w"), guidance="none", batch_size=2,
        unsqueeze_anamorphic=False, apply_speckle=False,
    )
    res = run_fused_depth_upscale(
        str(sbs), str(video_4k), str(tmp_path / "w" / "fused.mp4"),
        max_frames=4, extractor=ex, batch_size=2,
        upscale_method="scale",
    )
    assert res["frames"] == 4
    info = get_video_info(res["output"])
    assert (info["width"], info["height"]) == (512, 128)
