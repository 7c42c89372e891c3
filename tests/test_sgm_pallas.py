"""Pallas SGM kernels vs the pure-jnp scan reference (SURVEY.md SS7-3).

Runs the TPU kernels in interpreter mode on CPU and checks exact
agreement with ops.stereo's lax.scan implementation, for both layouts,
plus the full D-major WTA path against the standard one.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from video3d_tpu.kernels.sgm import (
    sgm_aggregate_pallas,
    sgm_aggregate_pallas_dmajor,
)
from video3d_tpu.ops.stereo import (
    SGBMParams,
    bt_cost_volume,
    bt_cost_volume_dmajor,
    box_aggregate,
    box_aggregate_hw,
    sgm_aggregate,
    wta_disparity,
    wta_disparity_dmajor,
    xsobel_clip,
)


@pytest.fixture(scope="module")
def cost(rng=None):
    r = np.random.default_rng(0)
    return jnp.asarray(r.uniform(0, 100, (2, 12, 16, 8)).astype(np.float32))


@pytest.mark.parametrize("paths", [2, 4, 5, 8])
def test_pallas_sgm_matches_scan(cost, paths):
    ref = sgm_aggregate(cost, SGBMParams(num_paths=paths, p1=6.0, p2=24.0))
    out = sgm_aggregate_pallas(cost, paths, 6.0, 24.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("paths", [2, 4, 5, 8])
def test_pallas_sgm_dmajor_matches_scan(cost, paths):
    ref = sgm_aggregate(cost, SGBMParams(num_paths=paths, p1=6.0, p2=24.0))
    cost_d = jnp.moveaxis(cost, -1, -2)  # (B, H, D, W)
    out = sgm_aggregate_pallas_dmajor(cost_d, paths, 6.0, 24.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(out, -2, -1)), np.asarray(ref), atol=1e-3
    )


def test_dmajor_cost_volume_and_box_match():
    r = np.random.default_rng(1)
    left = jnp.asarray(r.uniform(0, 255, (1, 16, 32)).astype(np.float32))
    right = jnp.asarray(r.uniform(0, 255, (1, 16, 32)).astype(np.float32))
    ref = box_aggregate(bt_cost_volume(left, right, 8), 5)
    out = box_aggregate_hw(bt_cost_volume_dmajor(left, right, 8), 5)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(out, -2, -1)), np.asarray(ref), rtol=1e-5
    )


def test_fused_cost_volume_matches_xla():
    """Pallas BT+box kernel == bt_cost_volume_dmajor + box_aggregate_hw."""
    from video3d_tpu.kernels.costvol import fused_cost_volume
    from video3d_tpu.ops.stereo import BIG

    r = np.random.default_rng(5)
    left = jnp.asarray(r.uniform(0, 62, (2, 16, 32)).astype(np.float32))
    right = jnp.asarray(r.uniform(0, 62, (2, 16, 32)).astype(np.float32))
    ref = jnp.minimum(box_aggregate_hw(bt_cost_volume_dmajor(left, right, 8), 5), BIG)
    out = fused_cost_volume(left, right, 8, 5, out_dtype=jnp.float32,
                            interpret=True)
    mask = np.asarray(ref) < BIG / 2
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err[mask].max() < 1e-2
    assert ((np.asarray(out) > BIG / 2) == ~mask).all()


@pytest.mark.parametrize("paths", [4, 5, 8])
def test_fused_final_wta_matches_unfused(paths):
    """sgm_wta_pallas_dmajor == aggregate + wta_disparity_dmajor."""
    from video3d_tpu.kernels.sgm import sgm_wta_pallas_dmajor

    r = np.random.default_rng(3)
    left = jnp.asarray(r.uniform(0, 255, (2, 24, 48)).astype(np.float32))
    right = jnp.roll(left, 3, axis=-1)
    p = SGBMParams(num_disparities=8, speckle_window_size=0, num_paths=paths)
    lf, rf = xsobel_clip(left, 31), xsobel_clip(right, 31)
    cost = box_aggregate_hw(bt_cost_volume_dmajor(lf, rf, 8), 5)
    cost = jnp.minimum(cost, 1e9)
    agg = sgm_aggregate_pallas_dmajor(cost, paths, p.p1, p.p2, interpret=True)
    ref = wta_disparity_dmajor(agg, p)
    out = sgm_wta_pallas_dmajor(cost, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dmajor_wta_matches_standard():
    """Full WTA semantics: sub-pixel, uniqueness, LR check, invalidation."""
    r = np.random.default_rng(2)
    left = jnp.asarray(r.uniform(0, 255, (1, 20, 48)).astype(np.float32))
    right = jnp.roll(left, 3, axis=-1)
    p = SGBMParams(num_disparities=8, speckle_window_size=0)
    lf, rf = xsobel_clip(left, 31), xsobel_clip(right, 31)
    agg = sgm_aggregate(box_aggregate(bt_cost_volume(lf, rf, 8), 5), p)
    ref = wta_disparity(agg, p)
    out = wta_disparity_dmajor(jnp.moveaxis(agg, -1, -2), p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_int16_path_matches_f32_reference():
    """Full int16 pipeline (sentinel-free fused cost volume + int16 SGM
    accumulation + fused WTA) vs the f32/BIG-sentinel reference path.

    The only deviation is the post-box round-to-integer of the cost
    (<= 0.5 per window vs a P1=600 smoothness scale), so disparities
    must agree to sub-pixel tolerance on effectively every pixel."""
    from video3d_tpu.kernels.costvol import fused_cost_volume
    from video3d_tpu.kernels.sgm import sgm_wta_pallas_dmajor

    r = np.random.default_rng(7)
    h, w, nd, shift = 24, 96, 16, 4
    base = r.uniform(0, 255, (2, h, w + shift)).astype(np.float32)
    left = jnp.asarray(base[:, :, :w])
    right = jnp.asarray(base[:, :, shift : shift + w])
    p = SGBMParams(num_disparities=nd, speckle_window_size=0)
    lf, rf = xsobel_clip(left, p.prefilter_cap), xsobel_clip(right, p.prefilter_cap)

    cost_f32 = jnp.minimum(
        box_aggregate_hw(bt_cost_volume_dmajor(lf, rf, nd), p.block_size), 1e9
    )
    ref = sgm_wta_pallas_dmajor(cost_f32, p, interpret=True)

    cost_i16 = fused_cost_volume(
        lf, rf, nd, p.block_size, out_dtype=jnp.int16,
        raw_invalid=2.0 * p.prefilter_cap, interpret=True,
    )
    assert cost_i16.dtype == jnp.int16
    assert int(jnp.max(cost_i16)) <= p.block_size**2 * 2 * p.prefilter_cap
    out = sgm_wta_pallas_dmajor(cost_i16, p, interpret=True)

    a, b = np.asarray(ref), np.asarray(out)
    both_valid = (a >= 0) & (b >= 0)
    # validity flips only from cost rounding at decision boundaries
    assert ((a >= 0) != (b >= 0)).mean() < 0.02
    d = np.abs(a - b)[both_valid]
    assert (d < 0.25).mean() > 0.98, f"agree={(d < 0.25).mean()}"
    assert np.median(d) < 0.05


def test_acc_dtype_overflow_guard():
    """int16 accumulation only when the worst-case path total provably
    fits; 8-path MODE_HH at production penalties does not (44.4k > 2^15)
    and must fall back to a float accumulator."""
    from video3d_tpu.kernels.sgm import BIG_I16, acc_dtype_for_params

    p5 = SGBMParams()  # 5-path default, P2=2400, block 5, cap 63
    p8 = SGBMParams(num_paths=8)
    assert acc_dtype_for_params(jnp.int16, p5) == jnp.int16
    assert acc_dtype_for_params(jnp.int16, p8) == jnp.float32
    assert acc_dtype_for_params(jnp.bfloat16, p5) == jnp.float32
    cost_max = p5.block_size**2 * 2 * p5.prefilter_cap
    assert p5.num_paths * (cost_max + p5.p2) < BIG_I16


def test_int16_8path_worst_case_no_overflow():
    """All-max cost volume (the overflow worst case) with 8 paths: the
    int16-cost path must agree with the f32 path instead of wrapping."""
    from video3d_tpu.kernels.sgm import sgm_wta_pallas_dmajor

    h, w, nd = 16, 48, 8
    p = SGBMParams(num_disparities=nd, speckle_window_size=0, num_paths=8)
    cost_max = p.block_size**2 * 2 * p.prefilter_cap
    worst_i16 = jnp.full((1, h, nd, w), cost_max, jnp.int16)
    worst_f32 = worst_i16.astype(jnp.float32)
    out_i = sgm_wta_pallas_dmajor(worst_i16, p, interpret=True)
    out_f = sgm_wta_pallas_dmajor(worst_f32, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_f), atol=1e-3)


@pytest.mark.parametrize("h,w,nd,cap", [(16, 64, 8, 31), (64, 128, 32, 63)])
def test_int16_fused_cost_volume_bit_exact(h, w, nd, cap):
    """The native-int16 (2x-scale) fused cost kernel is BIT-exact against
    jnp.round of the f32 oracle: with the integer-valued prefilter
    (xsobel_clip rounds, like cv2's uint8 LUT) every box total is an
    exact multiple of 0.5, and the kernel's ties-to-even halving equals
    jnp.round on f32 sums (exact below 2**24)."""
    from video3d_tpu.kernels.costvol import fused_cost_volume

    r = np.random.default_rng(11)
    left = xsobel_clip(
        jnp.asarray(r.uniform(0, 255, (2, h, w)).astype(np.float32)), cap
    )
    right = xsobel_clip(
        jnp.asarray(r.uniform(0, 255, (2, h, w)).astype(np.float32)), cap
    )
    ri = 2.0 * cap
    oracle = jnp.round(
        box_aggregate_hw(
            bt_cost_volume_dmajor(left, right, nd, raw_invalid=ri), 5
        )
    ).astype(jnp.int16)
    import os

    os.environ["VIDEO3D_TPU_COSTVOL_NATIVE_I16"] = "1"
    try:
        out = fused_cost_volume(
            left, right, nd, 5, out_dtype=jnp.int16, raw_invalid=ri,
            interpret=True,
        )
    finally:
        del os.environ["VIDEO3D_TPU_COSTVOL_NATIVE_I16"]
    assert (np.asarray(out) == np.asarray(oracle)).all()


@pytest.mark.parametrize("route", ["xla", "mxu"])
@pytest.mark.parametrize("paths", [5, 8])
def test_wmajor_route_matches_legacy_route(paths, route):
    """Horizontal passes on the W-major (B,D,W,H[P]) layout -- native
    int16 sweeps, XLA-permute or MXU identity-matmul transposes --
    produce bit-identical disparities to the legacy swapaxes route."""
    import os

    from video3d_tpu.kernels.costvol import fused_cost_volume
    from video3d_tpu.kernels.sgm import sgm_wta_pallas_dmajor

    r = np.random.default_rng(13)
    h, w, nd, shift = 40, 128, 8, 3
    base = r.uniform(0, 255, (2, h, w + shift)).astype(np.float32)
    left = xsobel_clip(jnp.asarray(base[:, :, :w]), 63)
    right = xsobel_clip(jnp.asarray(base[:, :, shift:shift + w]), 63)
    cost = fused_cost_volume(left, right, nd, 5, out_dtype=jnp.int16,
                             raw_invalid=126.0, interpret=True)
    p = SGBMParams(num_disparities=nd, speckle_window_size=0,
                   num_paths=paths)
    os.environ["VIDEO3D_TPU_SGM_TRANSPOSE"] = "legacy"
    try:
        ref = sgm_wta_pallas_dmajor(cost, p, interpret=True)
        os.environ["VIDEO3D_TPU_SGM_TRANSPOSE"] = route
        out = sgm_wta_pallas_dmajor(cost, p, interpret=True)
    finally:
        os.environ.pop("VIDEO3D_TPU_SGM_TRANSPOSE", None)
    assert (np.asarray(out) == np.asarray(ref)).all()


def test_mxu_transposes_roundtrip():
    from video3d_tpu.kernels.sgm import (
        transpose_from_wmajor,
        transpose_to_wmajor,
    )

    r = np.random.default_rng(17)
    x = jnp.asarray(r.integers(0, 30000, (2, 40, 8, 256)).astype(np.int16))
    t = transpose_to_wmajor(x, interpret=True)
    assert t.shape == (2, 8, 256, 128)
    np.testing.assert_array_equal(
        np.asarray(t)[..., :40], np.asarray(jnp.transpose(x, (0, 2, 3, 1)))
    )
    back = transpose_from_wmajor(t, 40, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("h,w,nd,dtype", [
    (16, 128, 8, "int16"),
    (24, 256, 16, "int16"),
    (16, 128, 8, "bfloat16"),
])
def test_fused_prefilter_bit_exact(h, w, nd, dtype):
    """fused_cost_volume(raw, prefilter_cap=c) == fused_cost_volume of
    xsobel_clip'ed inputs -- the in-kernel streaming Sobel is exact."""
    from video3d_tpu.kernels.costvol import fused_cost_volume

    dt = jnp.int16 if dtype == "int16" else jnp.bfloat16
    inv = 126.0 if dtype == "int16" else 1e9
    r = np.random.default_rng(5)
    raw_l = jnp.asarray(r.uniform(0, 255, (2, h, w)).astype(np.float32))
    raw_r = jnp.asarray(r.uniform(0, 255, (2, h, w)).astype(np.float32))
    want = fused_cost_volume(xsobel_clip(raw_l, 63), xsobel_clip(raw_r, 63),
                             nd, 5, out_dtype=dt, raw_invalid=inv,
                             interpret=True)
    got = fused_cost_volume(raw_l, raw_r, nd, 5, out_dtype=dt,
                            raw_invalid=inv, interpret=True,
                            prefilter_cap=63)
    assert (np.asarray(want) == np.asarray(got)).all()


def test_fused_prefilter_filtered_left_output():
    """return_filtered_left emits exactly xsobel_clip(left) as uint8."""
    from video3d_tpu.kernels.costvol import fused_cost_volume

    r = np.random.default_rng(6)
    h, w, nd = 16, 128, 8
    raw_l = jnp.asarray(r.uniform(0, 255, (2, h, w)).astype(np.float32))
    raw_r = jnp.asarray(r.uniform(0, 255, (2, h, w)).astype(np.float32))
    want_cost = fused_cost_volume(
        xsobel_clip(raw_l, 63), xsobel_clip(raw_r, 63), nd, 5,
        out_dtype=jnp.int16, raw_invalid=126.0, interpret=True)
    cost, lf = fused_cost_volume(
        raw_l, raw_r, nd, 5, out_dtype=jnp.int16, raw_invalid=126.0,
        interpret=True, prefilter_cap=63, return_filtered_left=True)
    assert lf.dtype == jnp.int16 and lf.shape == (2, h, w)
    np.testing.assert_array_equal(
        np.asarray(lf).astype(np.float32),
        np.asarray(xsobel_clip(raw_l, 63)))
    assert (np.asarray(cost) == np.asarray(want_cost)).all()
