"""Golden parity: our SGM matcher vs OpenCV StereoSGBM (SURVEY.md SS4-b).

The reference's entire depth quality rests on cv2.StereoSGBM with the
depth.py:315-325 parameters; these tests check statistical agreement on
synthetic textured scenes with known planar disparity. Agreement is
sub-pixel on medians and per-pixel within a tolerance band (the engines
differ in path count details and fixed-point arithmetic, so bitwise
equality is not expected -- SURVEY.md stereo module docstring).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from video3d_tpu.ops.stereo import SGBMParams, sgbm_disparity  # noqa: E402


def _textured_pair(h=96, w=256, shift=7, seed=0):
    """Smooth random texture; right eye = left shifted by ``shift``."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h, w + shift)).astype(np.float32)
    # low-pass with a separable box to give SGBM gradients to latch onto
    k = np.ones(5, np.float32) / 5
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base
        )
    base = (base - base.min()) / np.ptp(base) * 255
    left = base[:, :w]
    right = base[:, shift : shift + w]
    return left.astype(np.uint8), right.astype(np.uint8)


def _cv2_sgbm(left, right, num_disp=16, block=5, mode=None, speckle=100):
    matcher = cv2.StereoSGBM_create(
        minDisparity=0,
        numDisparities=num_disp,
        blockSize=block,
        P1=8 * 3 * block**2,
        P2=32 * 3 * block**2,
        disp12MaxDiff=1,
        uniquenessRatio=10,
        speckleWindowSize=speckle,
        speckleRange=32,
        # default = single-pass MODE_SGBM, the reference's matcher mode
        # (depth.py:314-324); tests pin MODE_HH when comparing num_paths=8
        mode=cv2.STEREO_SGBM_MODE_SGBM if mode is None else mode,
    )
    return matcher.compute(left, right).astype(np.float32) / 16.0


@pytest.mark.parametrize("shift", [4, 7, 11])
def test_sgbm_agrees_with_cv2_on_planar_scene(shift):
    left, right = _textured_pair(shift=shift, seed=shift)
    nd = 16
    cv_disp = _cv2_sgbm(left, right, num_disp=nd)
    p = SGBMParams(
        num_disparities=nd,
        p1=8 * 3 * 25,
        p2=32 * 3 * 25,
    )
    ours = np.asarray(
        sgbm_disparity(
            jnp.asarray(left[None], jnp.float32),
            jnp.asarray(right[None], jnp.float32),
            p,
        )
    )[0]

    interior = (slice(8, -8), slice(nd + 8, -8))
    cv_i, our_i = cv_disp[interior], ours[interior]
    both_valid = (cv_i >= 0) & (our_i >= 0)
    assert both_valid.mean() > 0.6

    # sub-pixel agreement of the dominant plane
    assert abs(np.median(cv_i[both_valid]) - shift) < 1.0
    assert abs(np.median(our_i[both_valid]) - shift) < 1.0
    assert abs(np.median(cv_i[both_valid]) - np.median(our_i[both_valid])) < 0.5

    # per-pixel band agreement
    close = np.abs(cv_i[both_valid] - our_i[both_valid]) <= 1.0
    assert close.mean() > 0.85, f"only {close.mean():.2%} within 1 disparity"


def test_invalidation_regions_overlap_cv2():
    """Both engines invalidate the left strip and mostly agree on holes."""
    left, right = _textured_pair(shift=5, seed=99)
    nd = 16
    cv_disp = _cv2_sgbm(left, right, num_disp=nd)
    ours = np.asarray(
        sgbm_disparity(
            jnp.asarray(left[None], jnp.float32),
            jnp.asarray(right[None], jnp.float32),
            SGBMParams(num_disparities=nd, p1=600, p2=2400),
        )
    )[0]
    # the strip where the full range cannot be evaluated is invalid in both
    assert (cv_disp[:, :nd] < 0).mean() > 0.9
    assert (ours[:, :nd] < 0).all()


@pytest.mark.parametrize(
    "num_paths,cv_mode_name",
    [(5, "STEREO_SGBM_MODE_SGBM"), (8, "STEREO_SGBM_MODE_HH")],
)
def test_production_scale_parity(num_paths, cv_mode_name):
    """Production config (reference depth.py:315-325): 64 disparities,
    full 960-px eye width (1080p SBS half), P1=600/P2=2400, speckle on.
    5-path vs cv2's single-pass default and 8-path vs MODE_HH."""
    h, w, nd, shift = 160, 960, 64, 23
    left, right = _textured_pair(h=h, w=w, shift=shift, seed=11)
    cv_disp = _cv2_sgbm(
        left, right, num_disp=nd, mode=getattr(cv2, cv_mode_name)
    )
    p = SGBMParams(num_paths=num_paths)  # exact reference params otherwise
    ours = np.asarray(
        sgbm_disparity(
            jnp.asarray(left[None], jnp.float32),
            jnp.asarray(right[None], jnp.float32),
            p,
            apply_speckle=True,
        )
    )[0]

    # joint invalid-strip behavior: everything left of minD+numD invalid
    assert (ours[:, :nd] < 0).all()
    assert (cv_disp[:, :nd] < 0).mean() > 0.9

    interior = (slice(8, -8), slice(nd + 16, -8))
    cv_i, our_i = cv_disp[interior], ours[interior]
    both_valid = (cv_i >= 0) & (our_i >= 0)
    assert both_valid.mean() > 0.8
    # agreement on validity decisions themselves
    assert ((cv_i >= 0) == (our_i >= 0)).mean() > 0.9

    med_cv = np.median(cv_i[both_valid])
    med_us = np.median(our_i[both_valid])
    assert abs(med_cv - shift) < 1.0 and abs(med_us - shift) < 1.0
    assert abs(med_cv - med_us) < 0.25

    close = np.abs(cv_i[both_valid] - our_i[both_valid])
    assert (close <= 1.0).mean() > 0.9, f"{(close <= 1.0).mean():.2%}"
    assert (close <= 0.5).mean() > 0.85, f"{(close <= 0.5).mean():.2%}"
