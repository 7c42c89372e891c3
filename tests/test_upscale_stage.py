"""Guided-filter upscale op + upscale/encode stage.

Kernel-level: guided filter must transfer guide edges into the upsampled
depth (the behavior the reference README promises, SURVEY.md SS2.4-3).
Stage-level: artifact contract of upscale.py:75-123 (output naming,
existing-output short-circuit, 4K-source geometry/fps).
"""

import numpy as np

from tests.conftest import make_test_video
from video3d_tpu.core import get_video_info
from video3d_tpu.core.cache import depth_frame_name
from video3d_tpu.core.depthio import save_depth_png16
from video3d_tpu.ops.guided import box_filter, guided_filter, guided_upsample
from video3d_tpu.stages.upscale import DepthUpscaler


def test_box_filter_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 20)).astype(np.float32)
    out = np.asarray(box_filter(x, radius=2))
    # brute-force reference with border clipping
    ref = np.zeros_like(x)
    for i in range(16):
        for j in range(20):
            win = x[0, max(i - 2, 0) : i + 3, max(j - 2, 0) : j + 3]
            ref[0, i, j] = win.mean()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_guided_filter_is_edge_preserving():
    # guide: sharp step edge; src: noisy version of the same step
    h, w = 32, 64
    guide = np.zeros((1, h, w), np.float32)
    guide[:, :, w // 2 :] = 1.0
    rng = np.random.default_rng(1)
    src = guide + rng.normal(0, 0.1, guide.shape).astype(np.float32)
    out = np.asarray(guided_filter(guide, src, radius=4, eps=1e-4))
    # noise suppressed away from the edge...
    flat = out[0, :, 8 : w // 2 - 8]
    assert flat.std() < src[0, :, 8 : w // 2 - 8].std() * 0.5
    # ...while the step survives (sharp transition preserved)
    step = out[0, :, w // 2 + 4].mean() - out[0, :, w // 2 - 4].mean()
    assert step > 0.8


def test_guided_upsample_follows_guide_edges():
    # low-res depth has a blurry edge; the 4K guide has it sharp
    h, w, H, W = 16, 32, 64, 128
    depth = np.zeros((1, h, w), np.uint16)
    depth[:, :, w // 2 :] = 40000
    guide = np.zeros((1, H, W, 3), np.float32)
    guide[:, :, W // 2 :, :] = 255.0
    up = np.asarray(guided_upsample(depth, guide, H, W, radius=2, eps=1e-4))
    assert up.shape == (1, H, W)
    # edge localized at the guide's position within a couple of pixels
    mid_row = up[0, H // 2]
    crossings = np.where(np.diff(mid_row > 20000))[0]
    assert len(crossings) >= 1
    assert abs(int(crossings[0]) - W // 2) <= 3


def test_color_guide_preserves_isoluminant_edges():
    """An edge visible only in chroma (equal luma) is preserved by the
    color guide and invisible to the gray guide."""
    h, w, H, W = 16, 32, 32, 64
    depth = np.zeros((1, h, w), np.uint16)
    depth[:, :, w // 2 :] = 40000
    # two colors with identical BT.601 luma: pure red-ish vs green-ish mix
    # luma(r,g,b) = .299r + .587g + .114b; choose (200, 50, 100) and a
    # second color with the same luma but different hue
    c1 = np.array([200.0, 50.0, 100.0])
    luma = 0.299 * c1[0] + 0.587 * c1[1] + 0.114 * c1[2]
    c2 = np.array([50.0, (luma - 0.299 * 50 - 0.114 * 100) / 0.587, 100.0])
    guide = np.zeros((1, H, W, 3), np.float32)
    guide[:, :, : W // 2] = c1
    guide[:, :, W // 2 :] = c2

    up_color = np.asarray(
        guided_upsample(depth, guide, H, W, radius=2, eps=1e-4,
                        guide_mode="color")
    )
    mid = up_color[0, H // 2]
    crossings = np.where(np.diff(mid > 20000))[0]
    assert len(crossings) >= 1 and abs(int(crossings[0]) - W // 2) <= 3

    # sanity: both modes reproduce the plain geometric step too
    up_gray = np.asarray(
        guided_upsample(depth, guide, H, W, radius=2, eps=1e-4,
                        guide_mode="gray")
    )
    assert up_gray.shape == up_color.shape


def test_color_guide_matches_gray_on_gray_guides():
    """On an achromatic guide the color filter reduces to the gray one."""
    rng = np.random.default_rng(4)
    depth = rng.integers(0, 65535, (1, 12, 24)).astype(np.uint16)
    g = rng.uniform(0, 255, (1, 24, 48, 1)).astype(np.float32)
    guide = np.repeat(g, 3, axis=-1)
    a = np.asarray(guided_upsample(depth, guide, 24, 48, radius=2,
                                   eps=1e-3, guide_mode="gray"))
    b = np.asarray(guided_upsample(depth, guide, 24, 48, radius=2,
                                   eps=1e-3, guide_mode="color"))
    # same structure; small numeric differences from the 3x3 solve's eps
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99


def test_quantized_out_and_pregray_guide_match_reference_path():
    """Transfer-lean paths: device uint8/uint16 quantization must equal
    the host-side conversion it replaces, and a host-precomputed luma
    guide must match the device rgb->gray path (both cut relay/PCIe
    traffic, stages/upscale.py)."""
    rng = np.random.default_rng(7)
    depth = rng.integers(0, 65535, (2, 16, 32)).astype(np.uint16)
    guide = rng.integers(0, 255, (2, 32, 64, 3)).astype(np.float32)

    f32 = np.asarray(guided_upsample(depth, guide, 32, 64, radius=2,
                                     eps=1e-3))
    u16 = np.asarray(guided_upsample(depth, guide, 32, 64, radius=2,
                                     eps=1e-3, out_dtype="uint16"))
    u8 = np.asarray(guided_upsample(depth, guide, 32, 64, radius=2,
                                    eps=1e-3, out_dtype="uint8"))
    assert u16.dtype == np.uint16 and u8.dtype == np.uint8
    np.testing.assert_allclose(u16, np.round(f32), atol=1)
    np.testing.assert_allclose(u8, np.round(f32 / 257.0), atol=1)

    # pre-computed luma plane == device rgb_to_gray (same BT.601 weights)
    luma = (0.299 * guide[..., 0] + 0.587 * guide[..., 1]
            + 0.114 * guide[..., 2]).astype(np.float32)
    a = np.asarray(guided_upsample(depth, luma, 32, 64, radius=2, eps=1e-3))
    np.testing.assert_allclose(a, f32, rtol=1e-4, atol=0.5)

    from video3d_tpu.ops.guided import plain_upsample

    p32 = np.asarray(plain_upsample(depth, 32, 64))
    p8 = np.asarray(plain_upsample(depth, 32, 64, out_dtype="uint8"))
    np.testing.assert_allclose(p8, np.round(p32 / 257.0), atol=1)


def test_upscale_stage_artifacts(tmp_path):
    # depth sequence at 32x64
    depth_dir = tmp_path / "depth_cafebabe00000000"
    depth_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(5):
        d = (rng.uniform(0, 65535, size=(32, 64))).astype(np.uint16)
        save_depth_png16(depth_dir / depth_frame_name(i), d)
    # "4K" source video at 64x128
    video_4k = tmp_path / "movie_4k.mp4"
    make_test_video(video_4k, n_frames=5, width=128, height=64, fps=24.0)

    up = DepthUpscaler(work_dir=str(tmp_path / "out"), method="guided",
                       batch_size=2)
    out = up.process_depth_upscaling(str(depth_dir), str(video_4k))
    assert out.name == f"depth_4k_{depth_dir.name}.mp4"
    info = get_video_info(str(out))
    assert (info["width"], info["height"]) == (128, 64)
    assert info["frames"] == 5

    # existing-output short-circuit (upscale.py:105-107)
    mtime = out.stat().st_mtime
    out2 = up.process_depth_upscaling(str(depth_dir), str(video_4k))
    assert out2 == out and out.stat().st_mtime == mtime

    # plain parity mode also works
    up2 = DepthUpscaler(work_dir=str(tmp_path / "out2"), method="scale",
                        batch_size=2)
    out3 = up2.process_depth_upscaling(str(depth_dir), str(video_4k))
    assert get_video_info(str(out3))["frames"] == 5

    # full-precision PNG16 sequence output
    from video3d_tpu.core.depthio import load_depth_png16 as load16

    out4 = up2.process_depth_upscaling(
        str(depth_dir), str(video_4k), png16_out=True
    )
    pngs = sorted(out4.glob("depth_*.png"))
    assert len(pngs) == 5
    d = load16(pngs[0])
    assert d.dtype == np.uint16 and d.shape == (64, 128)


def test_adaptive_upsample_flat_depth_equals_plain():
    """Where depth has zero gradient the agreement weight is 0, so the
    adaptive mix must reduce to plain interpolation exactly."""
    import jax.numpy as jnp

    from video3d_tpu.ops.guided import adaptive_upsample, plain_upsample

    rng = np.random.default_rng(0)
    depth = jnp.full((2, 16, 32), 30000.0)
    guide = jnp.asarray(
        rng.uniform(0, 255, (2, 64, 128, 3)).astype(np.float32))
    ada = np.asarray(adaptive_upsample(depth, guide, 64, 128, radius=1))
    plain = np.asarray(plain_upsample(depth, 64, 128))
    np.testing.assert_allclose(ada, plain, atol=1e-2)


def test_adaptive_stage_runs(tmp_path):
    depth_dir = tmp_path / "depth_cafebabe00000001"
    depth_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        d = (rng.uniform(0, 65535, size=(32, 64))).astype(np.uint16)
        save_depth_png16(depth_dir / depth_frame_name(i), d)
    video_4k = tmp_path / "movie_4k.mp4"
    make_test_video(video_4k, n_frames=3, width=128, height=64, fps=24.0)

    up = DepthUpscaler(work_dir=str(tmp_path / "out"), method="adaptive",
                       batch_size=2)
    out = up.process_depth_upscaling(str(depth_dir), str(video_4k))
    assert get_video_info(str(out))["frames"] == 3


def test_upscale_stage_segment_parallel_encode(tmp_path):
    """encode_workers > 1 routes through SegmentParallelVideoWriter and
    produces the same frame count/geometry as the single-encoder path;
    preset/crf pass through to the encoder."""
    depth_dir = tmp_path / "depth_0123456789abcdef"
    depth_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(7):
        d = (rng.uniform(0, 65535, size=(32, 64))).astype(np.uint16)
        save_depth_png16(depth_dir / depth_frame_name(i), d)
    video_4k = tmp_path / "movie_4k.mp4"
    make_test_video(video_4k, n_frames=7, width=128, height=64, fps=24.0)

    up = DepthUpscaler(
        work_dir=str(tmp_path / "out"), method="scale", batch_size=2,
        preset="ultrafast", encode_workers=2,
    )
    out = up.process_depth_upscaling(str(depth_dir), str(video_4k))
    info = get_video_info(str(out))
    assert (info["width"], info["height"]) == (128, 64)
    assert info["frames"] == 7
