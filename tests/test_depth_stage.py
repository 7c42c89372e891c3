"""End-to-end depth stage: SBS video -> PNG16 depth cache.

Artifact-contract test in the spirit of the reference's --max-frames smoke
runs (SURVEY.md SS4-d): synthetic SBS clip with a known constant shift
between eyes, asserting cache layout, idempotency and coarse numeric
correctness of the recovered disparity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_test_video
from video3d_tpu.core.cache import depth_frame_name
from video3d_tpu.core.depthio import load_depth_png16
from video3d_tpu.ops.stereo import SGBMParams
from video3d_tpu.stages.depth import StereoDepthExtractor, depth_batch_pipeline


def make_sbs_video(path, n_frames=6, eye_w=128, height=64, shift=6, fps=24.0):
    """SBS clip whose right eye is the left shifted by ``shift`` px."""
    import cv2

    rng = np.random.default_rng(3)
    # smooth textured pattern: sum of random low-frequency sinusoids
    yy, xx = np.mgrid[0:height, 0 : eye_w + shift].astype(np.float64)
    tex = np.zeros_like(xx)
    for _ in range(8):
        fx, fy = rng.uniform(0.05, 0.3, 2)
        ph = rng.uniform(0, 2 * np.pi)
        tex += np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
    tex = ((tex - tex.min()) / (np.ptp(tex) + 1e-9) * 255).astype(np.uint8)

    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (eye_w * 2, height)
    )
    assert writer.isOpened()
    for i in range(n_frames):
        pat = np.roll(tex, i, axis=0)
        # left[x] = pat[x]; right[x] = pat[x + shift] so that the match of
        # left pixel x sits at x - shift in the right view (disparity = shift)
        left = pat[:, :eye_w]
        right = pat[:, shift : shift + eye_w]
        sbs = np.concatenate([left, right], axis=1)
        frame = np.repeat(sbs[..., None], 3, axis=-1)
        writer.write(frame)
    writer.release()


def test_depth_stage_artifacts_and_values(tmp_path):
    video = tmp_path / "sbs.mp4"
    shift = 6
    make_sbs_video(video, n_frames=6, shift=shift)

    ext = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        batch_size=3,
        unsqueeze_anamorphic=False,
        apply_speckle=False,
    )
    cache = ext.process_video_sbs(str(video), max_frames=6)

    # artifact contract: depth_<md5-16>/depth_%06d.png, all frames present
    assert cache.name.startswith("depth_") and len(cache.name) == 6 + 16
    files = [cache / depth_frame_name(i) for i in range(6)]
    assert all(f.exists() for f in files)

    d0 = load_depth_png16(files[0])
    assert d0.dtype == np.uint16 and d0.shape == (64, 128)

    # fixed normalization: uint16 = disp * 65535 / 64
    disp = d0.astype(np.float64) * 64.0 / 65535.0
    interior = disp[8:-8, 80:120]  # right of the invalid strip (x >= D)
    med = np.median(interior)
    assert abs(med - shift) < 2.0, f"median disparity {med} vs true {shift}"

    # idempotent: second call is a cache hit (same dir, files untouched)
    mtime = files[0].stat().st_mtime
    cache2 = ext.process_video_sbs(str(video), max_frames=6)
    assert cache2 == cache
    assert files[0].stat().st_mtime == mtime


def test_guidance_load_failure_degrades_to_stereo_only(tmp_path):
    """Reference contract depth.py:107-114: any guidance-load failure
    silently (with a warning) flips to stereo-only processing."""
    ext = StereoDepthExtractor(
        work_dir=str(tmp_path), guidance="dpt",
        model_checkpoint="definitely/not-a-local-model",
    )
    ext.load_model()
    assert ext.guidance == "none"
    assert ext.model_checkpoint == "stereo_only"
    assert ext._guidance_fn is None

    ext2 = StereoDepthExtractor(
        work_dir=str(tmp_path), guidance="crestereo",
        model_checkpoint=str(tmp_path / "missing_ckpt"),
    )
    ext2.load_model()
    assert ext2.guidance == "none"


def test_per_frame_normalization_parity_mode():
    """normalize='per_frame' reproduces reference depth.py:399-404."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 32, 128, 3), dtype=np.uint8)
    out = np.asarray(
        depth_batch_pipeline(
            frames,
            params=SGBMParams(num_disparities=16),
            unsqueeze=False,
            normalize="per_frame",
            apply_speckle=False,
        )
    )
    # each frame's dynamic range spans the full uint16 scale
    assert out.max(axis=(1, 2)).min() == 65535
    assert out.min(axis=(1, 2)).max() == 0


def test_model_key_covers_speckle_and_sgbm_params(tmp_path):
    """Output-affecting options must change the cache key (ADVICE round-1:
    --no-speckle silently reused the speckled cache)."""
    base = StereoDepthExtractor(work_dir=str(tmp_path / "w"))._model_key()
    nos = StereoDepthExtractor(work_dir=str(tmp_path / "w"), apply_speckle=False)._model_key()
    par = StereoDepthExtractor(
        work_dir=str(tmp_path / "w"), params=SGBMParams(num_disparities=32)
    )._model_key()
    assert base != nos
    assert base != par
    assert nos != par
    # defaults: plain checkpoint name + algorithm version token
    from video3d_tpu.stages.depth import ALGO_VERSION
    assert base == f"stereo_only+a{ALGO_VERSION}"


def test_auto_batch_size_scales_with_memory(monkeypatch):
    """Guardrail for the analytic batch-size model: scales with frame
    volume and precision, never exceeds the measured-flat cap of 8,
    never returns 0 on tiny-memory devices."""
    ext = StereoDepthExtractor(work_dir="/tmp/_abs_test")
    b_1080 = ext._auto_batch_size(1080, 1920)
    assert 1 <= b_1080 <= 8
    # quarter-res frames fit at least as many
    assert ext._auto_batch_size(270, 480) >= b_1080
    # bf16 path has a larger live set -> never a larger batch
    import os
    os.environ["VIDEO3D_TPU_SGM_PRECISION"] = "bf16"
    try:
        assert ext._auto_batch_size(1080, 1920) <= b_1080
    finally:
        del os.environ["VIDEO3D_TPU_SGM_PRECISION"]


def test_auto_disparity_range(tmp_path):
    """The probe narrows the range to the content (shift 6 -> D=16, the
    cv2-legal minimum), the cache key reflects it, and the narrowed run
    still recovers the disparity."""
    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=6, shift=6)
    ext = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        batch_size=3,
        unsqueeze_anamorphic=False,
        apply_speckle=False,
    )
    key_before = ext._model_key()
    d = ext.apply_auto_range(str(video), sample_frames=3)
    assert d == 16, d
    assert ext.params.num_disparities == 16
    assert ext._model_key() != key_before
    assert "num_disparities=16" in ext._model_key()

    cache = ext.process_video_sbs(str(video), max_frames=6)
    disp = load_depth_png16(cache / depth_frame_name(1)).astype(np.float64)
    # fixed normalization now scales by the NARROWED range
    med = np.median(disp[8:-8, 80:120]) * 16.0 / 65535.0
    assert abs(med - 6) < 2.0, med


def test_guidance_blend_weight():
    """stereo_weight generalizes the fixed 0.7/0.3 contract: 1.0 ignores
    guidance entirely, 0.0 passes the learned output through; non-default
    weights get their own cache key."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, size=(1, 32, 128, 3), dtype=np.uint8)
    params = SGBMParams(num_disparities=16)

    def guidance(l, r):
        return np.full((1, 32, 64), 5.0, np.float32) * (l[..., 0] * 0 + 1)

    guidance.stereo = True
    base = np.asarray(depth_batch_pipeline(
        frames, params=params, unsqueeze=False, apply_speckle=False))
    w1 = np.asarray(depth_batch_pipeline(
        frames, params=params, unsqueeze=False, apply_speckle=False,
        guidance_fn=guidance, stereo_weight=1.0, blend="fixed"))
    np.testing.assert_array_equal(base, w1)
    w0 = np.asarray(depth_batch_pipeline(
        frames, params=params, unsqueeze=False, apply_speckle=False,
        guidance_fn=guidance, stereo_weight=0.0, blend="fixed"))
    want = np.round(5.0 * 65535.0 / 16.0)
    assert np.all(np.abs(w0.astype(np.float64) - want) <= 1.0)

    a = StereoDepthExtractor(work_dir="/tmp/bw1")
    b = StereoDepthExtractor(work_dir="/tmp/bw2", stereo_weight=0.5)
    assert a._model_key() != b._model_key()
    assert "+sw=0.5" in b._model_key()


def test_guidance_every_keyframe_reuse():
    """guidance_every=K runs the guidance net on frames 0, K, 2K, ... of
    the batch and reuses each output for the following K-1 frames; K=1 is
    bit-identical to the default; bad values are rejected."""
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 255, size=(6, 32, 128, 3), dtype=np.uint8)
    params = SGBMParams(num_disparities=16)
    seen = []

    def guidance(l, r):
        seen.append(l.shape[0])
        # per-frame constant disparity = 3 + batch index of the KEYFRAME
        idx = jnp.arange(l.shape[0], dtype=jnp.float32)
        return (3.0 + idx)[:, None, None] * jnp.ones(l.shape[:3])

    guidance.stereo = True
    kw = dict(params=params, unsqueeze=False, apply_speckle=False,
              guidance_fn=guidance, stereo_weight=0.0, blend="fixed")
    base = np.asarray(depth_batch_pipeline(jnp.asarray(frames), **kw))
    k1 = np.asarray(depth_batch_pipeline(jnp.asarray(frames),
                                         guidance_every=1, **kw))
    np.testing.assert_array_equal(base, k1)
    k3 = np.asarray(depth_batch_pipeline(jnp.asarray(frames),
                                         guidance_every=3, **kw))
    assert seen[-1] == 2  # 6 frames / every 3 -> 2 keyframes
    scale = 65535.0 / 16.0
    # frames 0-2 reuse keyframe 0 (disp 3), frames 3-5 keyframe 1 (disp 4)
    for t in range(6):
        want = np.round((3.0 + t // 3) * scale)
        got = np.median(k3[t].astype(np.float64))
        assert abs(got - want) <= 1.0, (t, got, want)

    a = StereoDepthExtractor(work_dir="/tmp/gev1", guidance="crestereo",
                             guidance_every=4)
    assert "+gev4" in a._model_key()
    b = StereoDepthExtractor(work_dir="/tmp/gev2", guidance_every=4)
    assert "+gev4" not in b._model_key()  # stereo-only: no guidance run
    with pytest.raises(ValueError):
        StereoDepthExtractor(work_dir="/tmp/gev3", guidance_every=0)


def test_trust_scale_gate_close_to_exact():
    """trust_scale=4 (pooled quarter-res trust field) must track the
    exact full-res gate: same blend within a small tolerance away from
    the trust-boundary pixels, identical where trust saturates."""
    import jax.numpy as jnp

    from video3d_tpu.models.guidance import GuidanceFn
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    rng = np.random.default_rng(11)
    h, w = 64, 256
    # textured SBS with constant disparity 6
    strip = np.clip(rng.normal(128, 45, (h, w // 2 + 6)), 0, 255)
    left = strip[:, 6:]
    right = strip[:, :-6]
    sbs = np.stack([np.concatenate([left, right], axis=1)] * 3, -1)
    frames = np.stack([sbs.astype(np.uint8)] * 2)

    def guide_fn(params, eye):
        # a plausible guide: true disparity with a small constant bias
        return jnp.full(eye.shape[:-1], 6.0) + 0.5

    g = GuidanceFn(guide_fn, None)
    kw = dict(params=SGBMParams(num_disparities=16), unsqueeze=False,
              apply_speckle=False, guidance_fn=g)
    exact = np.asarray(depth_batch_pipeline(frames, trust_scale=1, **kw),
                       np.float32)
    approx = np.asarray(depth_batch_pipeline(frames, trust_scale=4, **kw),
                        np.float32)
    scale = 65535.0 / 16
    diff = np.abs(exact - approx) / scale  # in disparity px
    assert np.median(diff) < 0.15, np.median(diff)
    assert (diff > 1.0).mean() < 0.05, (diff > 1.0).mean()
