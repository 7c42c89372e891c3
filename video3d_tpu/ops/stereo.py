"""Semi-global stereo matching, TPU-native (pure jnp reference path).

Replaces OpenCV's C++ ``StereoSGBM`` (reference: depth.py:315-341) with a
batched, jit-compiled formulation built for XLA/TPU:

* X-Sobel prefilter clipped to ``[-cap, cap]`` and Birchfield-Tomasi
  sampling-invariant pixel cost, matching OpenCV's cost model;
* block (SAD-window) aggregation via ``lax.reduce_window`` box sums;
* semi-global path aggregation as ``lax.scan`` over image columns/rows,
  carrying a (B, rows, D) disparity-vector front -- the scan body is pure
  VPU work vectorized over batch, rows and disparities; diagonal paths
  reuse the row scan with a per-step lateral roll of the carry;
* winner-take-all with quadratic sub-pixel interpolation, uniqueness-ratio
  test and left-right consistency check, reproducing OpenCV's
  invalidation semantics (invalid pixels -> ``min_disparity - 1``, which
  the depth stage clamps to 0 exactly like the reference depth.py:374).

Speckle filtering (value-dependent flood fill, SIMD-hostile) lives in
:mod:`video3d_tpu.ops.speckle` with an exact host pass and an on-device
approximation; deviation is flag-gated (SURVEY.md SS7-v).

Parity with OpenCV is statistical, not bitwise (different path count and
fixed-point details); tests assert sub-pixel agreement against analytic
ground truth and close agreement with cv2 on textured scenes
(SURVEY.md SS4-b).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e9
# out-of-image cost sentinel; kept a Python float so importing this
# module never materializes a device array (backend must stay
# uninitialized until callers pick a platform -- parallel/dryrun.py)
_SOBEL_CAP_BIG = BIG


@dataclasses.dataclass(frozen=True)
class SGBMParams:
    """Matcher configuration; defaults mirror the reference depth.py:315-325."""

    min_disparity: int = 0
    num_disparities: int = 64
    block_size: int = 5
    p1: float = 600.0  # 8 * 3 * block_size**2 (depth.py:319)
    p2: float = 2400.0  # 32 * 3 * block_size**2 (depth.py:320)
    disp12_max_diff: int = 1
    uniqueness_ratio: int = 10
    speckle_window_size: int = 100
    speckle_range: int = 32  # whole disparities, like OpenCV DISP_SCALE units
    prefilter_cap: int = 31
    # 2 = horizontal; 4 = + vertical; 5 = horizontals + downward-only
    # vertical/diagonals (OpenCV single-pass MODE_SGBM -- the reference's
    # default matcher mode, depth.py:314-324); 8 = all (MODE_HH)
    num_paths: int = 5

    def replace(self, **kw) -> "SGBMParams":
        return dataclasses.replace(self, **kw)


INVALID = lambda p: float(p.min_disparity - 1)


# ---------------------------------------------------------------------------
# Cost volume
# ---------------------------------------------------------------------------


def xsobel_clip(gray: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Horizontal Sobel derivative, clipped and shifted to [0, 2*cap].

    OpenCV SGBM prefilters with an x-Sobel response clamped through an
    integer lookup table (uint8 in, uint8 out) before BT costs; like
    cv2's, the output is integer-valued (rounded) -- which also makes
    every downstream BT cost an exact multiple of 0.5, so the fused cost
    kernel can run its ring/box arithmetic natively in int16 at 2x scale
    (kernels/costvol.py) with zero numeric drift. (..., H, W) float32.
    """
    g = gray.astype(jnp.float32)
    gp = jnp.pad(g, [(0, 0)] * (g.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    h, w = g.shape[-2], g.shape[-1]

    def win(dy, dx):
        s = jax.lax.slice_in_dim(gp, dy, dy + h, axis=-2)
        return jax.lax.slice_in_dim(s, dx, dx + w, axis=-1)

    dx = (win(0, 2) - win(0, 0)) + 2.0 * (win(1, 2) - win(1, 0)) + (win(2, 2) - win(2, 0))
    return jnp.round(jnp.clip(dx, -float(cap), float(cap))) + float(cap)


def _bt_bounds(img: jnp.ndarray):
    """Birchfield-Tomasi half-sample lower/upper envelopes along width."""
    prev = jnp.roll(img, 1, axis=-1).at[..., 0].set(img[..., 0])
    nxt = jnp.roll(img, -1, axis=-1).at[..., -1].set(img[..., -1])
    mid_l = 0.5 * (img + prev)
    mid_r = 0.5 * (img + nxt)
    lo = jnp.minimum(jnp.minimum(mid_l, mid_r), img)
    hi = jnp.maximum(jnp.maximum(mid_l, mid_r), img)
    return lo, hi


def bt_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int,
    min_disparity: int = 0,
) -> jnp.ndarray:
    """Per-pixel symmetric BT cost volume (..., H, W, D).

    ``cost[..., x, d]`` compares left pixel x against right pixel
    ``x - (min_disparity + d)``; out-of-frame matches cost BIG so WTA never
    selects them (OpenCV invalidates that border strip).
    """
    l_lo, l_hi = _bt_bounds(left)
    r_lo, r_hi = _bt_bounds(right)
    w = left.shape[-1]
    xs = jnp.arange(w)

    # Build D-major -- (..., D, H, W) -- so every stacked slice keeps W as
    # its minor axis (natural (8, 128) tiling), then transpose once.
    # Stacking along a new minor axis instead would materialize 64
    # (..., 1)-minor copies, each padded 128x by TPU tiling (~1 GB of HLO
    # temps at 1080p).
    slices = []
    for d in range(num_disparities):
        shift = d + min_disparity
        idx = jnp.clip(xs - shift, 0, w - 1)
        r = jnp.take(right, idx, axis=-1)
        rlo = jnp.take(r_lo, idx, axis=-1)
        rhi = jnp.take(r_hi, idx, axis=-1)
        d_lr = jnp.maximum(0.0, jnp.maximum(left - rhi, rlo - left))
        d_rl = jnp.maximum(0.0, jnp.maximum(r - l_hi, l_lo - r))
        cost = jnp.minimum(d_lr, d_rl)
        cost = jnp.where(xs - shift < 0, _SOBEL_CAP_BIG, cost)
        slices.append(cost)
    return jnp.moveaxis(jnp.stack(slices, axis=-3), -3, -1)


def bt_cost_volume_dmajor(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int,
    min_disparity: int = 0,
    raw_invalid: float = _SOBEL_CAP_BIG,
) -> jnp.ndarray:
    """BT cost volume in D-major layout: (..., H, W) -> (..., H, D, W).

    TPU-friendly: every slice along D keeps W minor with natural
    (8, 128) tiling; no (..., 1)-minor temporaries (which pad 128x under
    TPU tiling and OOM at 1080p -- see sgm kernel notes). The (H, D, W)
    ordering also matches the Pallas SGM kernel's (1, 1, D, W) blocks.
    """
    l_lo, l_hi = _bt_bounds(left)
    r_lo, r_hi = _bt_bounds(right)
    w = left.shape[-1]
    xs = jnp.arange(w)

    def shift_right(img, s):
        """img sampled at x - s with left-edge clamp; static slices only
        (jnp.take with an index vector lowers to a gather -- measured
        12.6 ms/frame for the 64 takes at 1080p vs ~2 ms as slices)."""
        if s == 0:
            return img
        edge = jnp.repeat(img[..., :1], s, axis=-1)
        return jnp.concatenate([edge, img[..., :-s]], axis=-1)

    slices = []
    for d in range(num_disparities):
        shift = d + min_disparity
        r = shift_right(right, shift)
        rlo = shift_right(r_lo, shift)
        rhi = shift_right(r_hi, shift)
        d_lr = jnp.maximum(0.0, jnp.maximum(left - rhi, rlo - left))
        d_rl = jnp.maximum(0.0, jnp.maximum(r - l_hi, l_lo - r))
        cost = jnp.minimum(d_lr, d_rl)
        cost = jnp.where(xs - shift < 0, raw_invalid, cost)
        slices.append(cost)
    return jnp.stack(slices, axis=-2)


def box_aggregate_hw(cost: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """SAD-window sum over the H (axis -3) and W (axis -1) of (..., H, D, W)."""
    if block_size <= 1:
        return cost
    pad = block_size // 2
    dims = [1] * cost.ndim
    dims[-3] = block_size
    dims[-1] = block_size
    pads = [(0, 0)] * cost.ndim
    pads[-3] = (pad, pad)
    pads[-1] = (pad, pad)
    return jax.lax.reduce_window(
        cost,
        jnp.zeros((), cost.dtype),
        jax.lax.add,
        tuple(dims),
        (1,) * cost.ndim,
        pads,
    )


def box_aggregate(cost: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """SAD-window aggregation: block_size x block_size sum over (H, W).

    Windowed *sum* (not mean) so OpenCV's P1/P2 magnitudes apply unchanged.
    """
    if block_size <= 1:
        return cost
    pad = block_size // 2
    dims = [1] * cost.ndim
    dims[-3] = block_size  # H
    dims[-2] = block_size  # W
    return jax.lax.reduce_window(
        cost,
        0.0,
        jax.lax.add,
        tuple(dims),
        (1,) * cost.ndim,
        [(0, 0)] * (cost.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)],
    )


# ---------------------------------------------------------------------------
# Semi-global aggregation
# ---------------------------------------------------------------------------


def _sgm_step(l_prev: jnp.ndarray, cost: jnp.ndarray, p1: float, p2: float):
    """One SGM recurrence step over the disparity axis (last axis)."""
    m = jnp.min(l_prev, axis=-1, keepdims=True)
    up = jnp.concatenate(
        [l_prev[..., 1:], jnp.full_like(l_prev[..., :1], BIG)], axis=-1
    )
    dn = jnp.concatenate(
        [jnp.full_like(l_prev[..., :1], BIG), l_prev[..., :-1]], axis=-1
    )
    best = jnp.minimum(jnp.minimum(l_prev, m + p2), jnp.minimum(up, dn) + p1)
    return cost + best - m


def _scan_paths_along(
    cost_seq: jnp.ndarray, p1: float, p2: float, lateral_shift: int = 0
) -> jnp.ndarray:
    """Aggregate along the leading axis of (N, B, R, D) in both directions.

    ``lateral_shift`` rolls the carry along the R axis each step, which
    turns a row-by-row vertical scan into a diagonal path: L(y, x) then
    depends on L(y-1, x -+ 1). Returns the sum of forward and backward
    directional costs, shape (N, B, R, D).
    """

    def shift_carry(l_prev, s):
        if s == 0:
            return l_prev
        rolled = jnp.roll(l_prev, s, axis=-2)
        if s > 0:
            rolled = rolled.at[..., :s, :].set(0.0)
        else:
            rolled = rolled.at[..., s:, :].set(0.0)
        return rolled

    def fwd(l_prev, c):
        l_new = _sgm_step(shift_carry(l_prev, lateral_shift), c, p1, p2)
        return l_new, l_new

    def bwd(l_prev, c):
        l_new = _sgm_step(shift_carry(l_prev, -lateral_shift), c, p1, p2)
        return l_new, l_new

    zero = jnp.zeros_like(cost_seq[0])
    _, l_f = jax.lax.scan(fwd, zero, cost_seq)
    _, l_b = jax.lax.scan(bwd, zero, cost_seq, reverse=True)
    return l_f + l_b


def _scan_paths_one_way(
    cost_seq: jnp.ndarray, p1: float, p2: float, lateral_shift: int = 0
) -> jnp.ndarray:
    """Single-direction variant of :func:`_scan_paths_along` (forward
    along the leading axis only) -- the downward-only directions of
    OpenCV's single-pass MODE_SGBM."""

    def shift_carry(l_prev, s):
        if s == 0:
            return l_prev
        rolled = jnp.roll(l_prev, s, axis=-2)
        if s > 0:
            rolled = rolled.at[..., :s, :].set(0.0)
        else:
            rolled = rolled.at[..., s:, :].set(0.0)
        return rolled

    def fwd(l_prev, c):
        l_new = _sgm_step(shift_carry(l_prev, lateral_shift), c, p1, p2)
        return l_new, l_new

    zero = jnp.zeros_like(cost_seq[0])
    _, l_f = jax.lax.scan(fwd, zero, cost_seq)
    return l_f


def sgm_aggregate(cost: jnp.ndarray, params: SGBMParams) -> jnp.ndarray:
    """Sum of directional path costs S(p, d) over 2/4/8 paths.

    ``cost`` is (B, H, W, D) float32. Horizontal paths scan over W carrying
    (B, H, D); vertical and diagonal paths scan over H carrying (B, W, D).
    """
    p1, p2 = float(params.p1), float(params.p2)
    b, h, w, d = cost.shape

    # horizontal: (W, B, H, D)
    seq_w = jnp.moveaxis(cost, 2, 0)
    total = jnp.moveaxis(_scan_paths_along(seq_w, p1, p2), 0, 2)

    if params.num_paths == 5:
        # OpenCV single-pass MODE_SGBM (the reference's default --
        # StereoSGBM_create with no mode arg, depth.py:314-324): both
        # horizontals + the three downward directions (N, NW, NE); no
        # bottom-up paths.
        seq_h = jnp.moveaxis(cost, 1, 0)  # (H, B, W, D)
        down = (
            _scan_paths_one_way(seq_h, p1, p2)
            + _scan_paths_one_way(seq_h, p1, p2, lateral_shift=1)
            + _scan_paths_one_way(seq_h, p1, p2, lateral_shift=-1)
        )
        return total + jnp.moveaxis(down, 0, 1)

    if params.num_paths >= 4:
        seq_h = jnp.moveaxis(cost, 1, 0)  # (H, B, W, D)
        total = total + jnp.moveaxis(_scan_paths_along(seq_h, p1, p2), 0, 1)

    if params.num_paths >= 8:
        seq_h = jnp.moveaxis(cost, 1, 0)
        diag1 = _scan_paths_along(seq_h, p1, p2, lateral_shift=1)
        diag2 = _scan_paths_along(seq_h, p1, p2, lateral_shift=-1)
        total = total + jnp.moveaxis(diag1 + diag2, 0, 1)

    return total


# ---------------------------------------------------------------------------
# Winner-take-all + validation
# ---------------------------------------------------------------------------


def wta_disparity(agg: jnp.ndarray, params: SGBMParams,
                  return_margin: bool = False):
    """Sub-pixel disparity from the aggregated volume, with validation.

    Returns float32 (B, H, W); invalid pixels are ``min_disparity - 1``
    (callers clamp <=0 to 0 per reference depth.py:374).

    ``return_margin`` also returns the relative uniqueness margin
    ``(second - s_min) / (s_min + 1)`` per pixel -- the same quantity the
    OpenCV uniqueness test thresholds -- as a match-confidence signal for
    the guidance blend (stages/depth.py blend='confidence').
    """
    b, h, w, nd = agg.shape
    d_int = jnp.argmin(agg, axis=-1)  # (B, H, W)
    s_min = jnp.min(agg, axis=-1)

    # quadratic sub-pixel interpolation around the minimum. Neighbor costs
    # are fetched by one-hot contraction over D instead of
    # take_along_axis: a (..., 1)-minor gather pads 128x under TPU tiling
    # (1 GB of temp per gather at 1080p) while the contraction stays in
    # the natural (..., D) layout.
    ds_iota = jax.lax.broadcasted_iota(jnp.int32, agg.shape, agg.ndim - 1)
    onehot = ds_iota == d_int[..., None]
    dn = jnp.concatenate([agg[..., :1], agg[..., :-1]], axis=-1)  # d-1
    up = jnp.concatenate([agg[..., 1:], agg[..., -1:]], axis=-1)  # d+1
    s_m1 = jnp.sum(jnp.where(onehot, dn, 0.0), axis=-1)
    s_p1 = jnp.sum(jnp.where(onehot, up, 0.0), axis=-1)
    denom = s_m1 + s_p1 - 2.0 * s_min
    sub = jnp.where(denom > 1e-6, (s_m1 - s_p1) / (2.0 * denom + 1e-12), 0.0)
    sub = jnp.clip(sub, -0.5, 0.5)
    # no interpolation at the disparity range ends (one-sided neighborhoods)
    sub = jnp.where((d_int == 0) | (d_int == nd - 1), 0.0, sub)
    disp = d_int.astype(jnp.float32) + sub + float(params.min_disparity)

    valid = s_min < BIG / 2  # no in-frame match at any disparity
    # OpenCV leaves the entire left strip where the full disparity range
    # cannot be evaluated invalid (verified against cv2.StereoSGBM: columns
    # x < minDisparity + numDisparities are always invalid)
    xs_full = jnp.arange(w)
    valid &= (xs_full >= params.min_disparity + nd)[None, None, :]

    # uniqueness ratio (OpenCV: any d with |d - d*| > 1 whose cost is within
    # (100 + ratio)% of the minimum invalidates the pixel)
    margin = None
    if params.uniqueness_ratio > 0 or return_margin:
        ds = jnp.arange(nd)
        near = jnp.abs(ds[None, None, None, :] - d_int[..., None]) <= 1
        masked = jnp.where(near, BIG, agg)
        second = jnp.min(masked, axis=-1)
        if params.uniqueness_ratio > 0:
            valid &= second * 100.0 >= s_min * (100.0 + params.uniqueness_ratio)
        if return_margin:
            margin = jnp.clip(second - s_min, 0.0, BIG) / (s_min + 1.0)

    # left-right consistency from the same aggregated volume:
    # S_R(x, d) = S_L(x + d, d); check |d_L(x) - d_R(x - d_L(x))| <= maxdiff.
    # Gather-free formulation: every indexing by disparity is expressed as
    # 64 static W-shifts (XLA slices), which vectorize on TPU, instead of
    # take_along_axis along a non-minor axis (measured 2.4 s/frame at
    # 1080p on v5e -- the original pipeline hot spot).
    if params.disp12_max_diff >= 0:
        # right-view disparity: d_R(x) = argmin_d S_L(x+d, d), computed as
        # a running min over 64 shifted (B, H, W) planes -- fused
        # elementwise updates, no (B, H, W, D) temporary (stacking such a
        # volume at 1080p costs ~0.5-1 GB of HLO temps and OOMs the chip).
        agg_d = jnp.moveaxis(agg, -1, 1)  # (B, D, H, W) view for slicing
        best = jnp.full(disp.shape, BIG, jnp.float32)
        d_right = jnp.zeros(disp.shape, jnp.float32)
        for dd in range(nd):
            shift = dd + params.min_disparity
            plane = agg_d[:, dd]  # (B, H, W)
            if shift > 0:
                plane = jnp.concatenate(
                    [plane[..., shift:], jnp.full_like(plane[..., :shift], BIG)],
                    axis=-1,
                )
            better = plane < best
            best = jnp.where(better, plane, best)
            d_right = jnp.where(better, jnp.float32(dd), d_right)
        # d_R(x - d_L(x)): for each candidate integer disparity dd, shift
        # d_right right by dd and test only where round(d_L) == dd. A
        # 64-way fused select loop -- no (.., 1)-minor gathers, which pad
        # 128x on TPU and OOM at 1080p.
        d_round = jnp.clip(
            jnp.round(disp - params.min_disparity).astype(jnp.int32), 0, nd - 1
        )
        dl = disp - params.min_disparity
        lr_ok = jnp.zeros(disp.shape, bool)
        for dd in range(nd):
            shift = dd + params.min_disparity
            plane = d_right
            if shift > 0:
                plane = jnp.concatenate(
                    [plane[..., :shift], plane[..., :-shift]], axis=-1
                )
            ok_dd = jnp.abs(dl - plane) <= float(params.disp12_max_diff)
            lr_ok |= (d_round == dd) & ok_dd
        valid &= lr_ok

    out = jnp.where(valid, disp, INVALID(params))
    if return_margin:
        return out, margin
    return out


def wta_disparity_dmajor(agg: jnp.ndarray, params: SGBMParams,
                         return_margin: bool = False):
    """WTA + validation on a D-major aggregated volume (B, H, D, W).

    Same semantics as :func:`wta_disparity` (tested equal), but every
    per-disparity access is a (B, H, W) plane slice consumed by fused
    running-min loops -- no (B, H, W, D) temporaries, no gathers. This is
    the TPU-fast path used with the Pallas SGM kernel.
    """
    b, h, nd, w = agg.shape
    min_d = params.min_disparity

    # pass 1: running argmin with neighbor costs (for sub-pixel)
    big = jnp.full((b, h, w), BIG, jnp.float32)
    s_min, d_int = big, jnp.zeros((b, h, w), jnp.int32)
    s_m1 = jnp.full_like(big, BIG)
    s_p1 = jnp.full_like(big, BIG)
    for dd in range(nd):
        plane = agg[:, :, dd]
        better = plane < s_min
        prev_plane = agg[:, :, dd - 1] if dd > 0 else plane
        next_plane = agg[:, :, dd + 1] if dd < nd - 1 else plane
        s_m1 = jnp.where(better, prev_plane, s_m1)
        s_p1 = jnp.where(better, next_plane, s_p1)
        s_min = jnp.where(better, plane, s_min)
        d_int = jnp.where(better, dd, d_int)

    denom = s_m1 + s_p1 - 2.0 * s_min
    sub = jnp.where(denom > 1e-6, (s_m1 - s_p1) / (2.0 * denom + 1e-12), 0.0)
    sub = jnp.clip(sub, -0.5, 0.5)
    sub = jnp.where((d_int == 0) | (d_int == nd - 1), 0.0, sub)
    disp = d_int.astype(jnp.float32) + sub + float(min_d)

    valid = s_min < BIG / 2
    xs_full = jnp.arange(w)
    valid &= (xs_full >= min_d + nd)[None, None, :]

    # pass 2: uniqueness -- best cost outside the +-1 neighborhood
    margin = None
    if params.uniqueness_ratio > 0 or return_margin:
        second = jnp.full_like(big, BIG)
        for dd in range(nd):
            plane = jnp.where(jnp.abs(dd - d_int) <= 1, BIG, agg[:, :, dd])
            second = jnp.minimum(second, plane)
        if params.uniqueness_ratio > 0:
            valid &= second * 100.0 >= s_min * (100.0 + params.uniqueness_ratio)
        if return_margin:
            margin = jnp.clip(second - s_min, 0.0, BIG) / (s_min + 1.0)

    # pass 3: left-right consistency, all static W-shifts
    if params.disp12_max_diff >= 0:
        best = jnp.full_like(big, BIG)
        d_right = jnp.zeros_like(big)
        for dd in range(nd):
            shift = dd + min_d
            plane = agg[:, :, dd]
            if shift > 0:
                plane = jnp.concatenate(
                    [plane[..., shift:], jnp.full_like(plane[..., :shift], BIG)],
                    axis=-1,
                )
            better = plane < best
            best = jnp.where(better, plane, best)
            d_right = jnp.where(better, jnp.float32(dd), d_right)
        d_round = jnp.clip(jnp.round(disp - min_d).astype(jnp.int32), 0, nd - 1)
        dl = disp - min_d
        lr_ok = jnp.zeros(disp.shape, bool)
        for dd in range(nd):
            shift = dd + min_d
            plane = d_right
            if shift > 0:
                plane = jnp.concatenate(
                    [plane[..., :shift], plane[..., :-shift]], axis=-1
                )
            lr_ok |= (d_round == dd) & (
                jnp.abs(dl - plane) <= float(params.disp12_max_diff)
            )
        valid &= lr_ok

    out = jnp.where(valid, disp, INVALID(params))
    if return_margin:
        return out, margin
    return out


# ---------------------------------------------------------------------------
# Full matcher
# ---------------------------------------------------------------------------


def match_confidence(
    margin: jnp.ndarray,
    texture: jnp.ndarray,
    margin_mid: float = 0.5,
    texture_mid: float = 8.0,
) -> jnp.ndarray:
    """Per-pixel stereo-match confidence in [0, 1].

    Product of two squashed signals:

    * ``margin`` -- the relative uniqueness margin of the aggregated
      volume (:func:`wta_disparity` ``return_margin``), which separates
      sharp minima from ambiguous ones *among textured matches*;
    * ``texture`` -- windowed mean |x-sobel| energy of the left view,
      which measures whether there is data evidence at all. This gate is
      essential: in aperture-less (flat) regions the aggregated volume's
      margin is pure smoothness-penalty structure (large!), not
      evidence, so the margin alone is inverted there. OpenCV's own
      StereoBM ``textureThreshold`` is this gate.

    Each signal is squashed by x^2/(x^2 + mid^2) (0.5 at ``mid``,
    quadratic shoulder). Midpoints calibrated by sweep on the eval
    distribution (tools/eval_stereo.py): the blended hybrid's bad1/bad3
    beat both parents (SGM and pure CREStereo) overall *and* on
    low-texture pixels across m0 in [0.25, 1.0] x t0 in [4, 20], with
    the chosen (0.5, 8.0) near the optimum (all-bad1 0.090 vs SGM
    0.209 / CREStereo 0.128 / fixed-0.7 0.125).
    """
    mm = margin * margin
    conf = mm / (mm + float(margin_mid) * float(margin_mid))
    tt = texture * texture
    conf = conf * tt / (tt + float(texture_mid) * float(texture_mid))
    return conf


def texture_energy(lf: jnp.ndarray, cap: int, radius: int = 2) -> jnp.ndarray:
    """Windowed mean |x-sobel| response (sobel units), from the already
    prefiltered view (:func:`xsobel_clip` output, centered at ``cap``)."""
    from video3d_tpu.ops.boxsum import box_sum_2d, window_area

    e = jnp.abs(lf - float(cap))
    h, w = e.shape[-2], e.shape[-1]
    return box_sum_2d(e, radius) / window_area(h, w, radius)


def xla_sgm_fallback_chunk(height: int, width: int,
                           num_disparities: int) -> int:
    """Frames per chunk the pure-XLA SGM fallback can hold live at once.

    Calibrated on the live chip: the fallback's peak live set measured
    ~31 B per cost-volume element (XLA compile report: 16.40 GB needed
    at batch 8, 1080x960x64). Budgets 65% of the device HBM limit at a
    conservative 32 B/element so neighbouring buffers (inputs, guidance,
    XLA temps) keep headroom.
    """
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit", 16 * 2**30)
    except Exception:
        limit = 16 * 2**30
    vol = height * width * num_disparities
    return max(1, int(limit * 0.65 / (vol * 32)))


def pallas_sgm_supported(w: int) -> bool:
    """Whether the Pallas stereo kernels can lower for this width.

    Every kernel in the TPU fast path rolls vectors along the W lane
    axis (the cost kernel's roll-then-stack disparity shifts, the SGM
    sweeps' ``tpu.dynamic_rotate``, the speckle bands); Mosaic only
    lowers those when W is a multiple of the 128-lane tile -- e.g.
    ``--no-unsqueeze`` on 1920-wide SBS gives 960-px eyes, which
    crashed the compiler before this gate. Unaligned widths take the
    pure-XLA formulation instead: bit-identical semantics at any shape
    (it is the CPU parity path), just slower.
    """
    return w % 128 == 0


def fused_cost_supported(params, w: int) -> bool:
    """Whether the FUSED Pallas cost kernel applies: lane-aligned width
    (:func:`pallas_sgm_supported`), min_disparity 0 and a sublane-
    aligned disparity count; other aligned configs use the unfused
    D-major route."""
    return (
        params.min_disparity == 0
        and params.num_disparities % 8 == 0
        and pallas_sgm_supported(w)
    )


def sgbm_disparity(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    params: SGBMParams = SGBMParams(),
    apply_speckle: bool = True,
    return_margin: bool = False,
):
    """Full semi-global matcher: (B, H, W) grayscale pair -> float disparity.

    Equivalent of ``cv2.StereoSGBM.compute(...) / 16.0`` (reference
    depth.py:341): float sub-pixel disparities, invalid = min_disparity - 1.

    ``return_margin`` also returns a per-pixel match confidence in
    [0, 1] (:func:`match_confidence`: texture-gated uniqueness margin)
    -- the signal the depth stage's ``blend='confidence'`` guidance
    mixing uses.
    """
    lf = rf = None
    if (jax.default_backend() == "tpu"
            and pallas_sgm_supported(left_gray.shape[-1])):
        # TPU-fast path: D-major (B, H, D, W) layout end to end -- every
        # per-disparity slice is an (H, W)-minor plane with natural
        # (8, 128) tiling -- plus a 2-byte cost volume and the Pallas SGM
        # kernels. Default precision is int16 (OpenCV's own integer-cost
        # representation): path values are exact integers, and the
        # aggregation picks an accumulator dtype that provably cannot
        # overflow for the given params (kernels.sgm.acc_dtype_for_params:
        # 5-path totals fit int16; 8-path MODE_HH gets f32), so int16
        # halves HBM traffic vs f32 and doubles the rows a VMEM budget
        # holds with no numeric deviation. VIDEO3D_TPU_SGM_PRECISION=bf16
        # restores the round-1 bf16-cost/f32-acc path for A/B comparison.
        import os

        from video3d_tpu.kernels.costvol import fused_cost_volume
        from video3d_tpu.kernels.sgm import sgm_wta_pallas_dmajor

        use_i16 = (
            os.environ.get("VIDEO3D_TPU_SGM_PRECISION", "int16") == "int16"
        )
        if use_i16:
            # sentinel-free: out-of-frame matches cost the max valid
            # per-pixel cost; the WTA strip mask keeps them invalid
            cost_dtype = jnp.int16
            raw_invalid = 2.0 * params.prefilter_cap
        else:
            cost_dtype = jnp.bfloat16
            raw_invalid = BIG
        if fused_cost_supported(params, left_gray.shape[-1]):
            # fused Pallas kernel: x-Sobel prefilter + BT cost + box
            # window in one sweep -- neither the raw volume nor the
            # filtered pair ever materializes in HBM. The confidence
            # path additionally gets the prefiltered left view as a
            # lossless uint8 second output (texture gate) instead of a
            # second full-resolution prefilter pass. Requires lane-
            # aligned width: the kernel's roll-then-stack disparity
            # shifts only lower when W is a multiple of 128 (Mosaic
            # rejects the offset layouts otherwise); unaligned widths
            # (e.g. --no-unsqueeze on 1920-wide SBS -> 960-px eyes)
            # take the XLA D-major route below, which pads freely.
            res = fused_cost_volume(
                left_gray, right_gray, params.num_disparities,
                params.block_size, out_dtype=cost_dtype,
                raw_invalid=raw_invalid,
                prefilter_cap=params.prefilter_cap,
                return_filtered_left=return_margin,
            )
            if return_margin:
                cost, lf = res
                lf = lf.astype(jnp.float32)
            else:
                cost = res
        else:
            lf = xsobel_clip(left_gray, params.prefilter_cap)
            rf = xsobel_clip(right_gray, params.prefilter_cap)
            cost = bt_cost_volume_dmajor(
                lf, rf, params.num_disparities, params.min_disparity,
                raw_invalid=raw_invalid,
            )
            cost = box_aggregate_hw(cost, params.block_size)
            if use_i16:
                cost = jnp.round(cost).astype(jnp.int16)
            else:
                cost = jnp.minimum(cost, BIG).astype(jnp.bfloat16)
        res = sgm_wta_pallas_dmajor(cost, params,
                                    return_margin=return_margin)
        disp, margin = res if return_margin else (res, None)
    else:
        def _xla_chunk(pair):
            lg, rg = pair
            lf_ = xsobel_clip(lg, params.prefilter_cap)
            rf_ = xsobel_clip(rg, params.prefilter_cap)
            cost = bt_cost_volume(
                lf_, rf_, params.num_disparities, params.min_disparity
            )
            cost = box_aggregate(cost, params.block_size)
            # keep the border-invalid strip truly invalid after window sums
            cost = jnp.minimum(cost, BIG)
            agg = sgm_aggregate(cost, params)
            return wta_disparity(agg, params, return_margin=return_margin)

        # The pure-XLA formulation's live set (f32 volume + box-window
        # temps + per-direction scan stacking) is ~32 bytes per cost-
        # volume element -- ~2 GB/frame at 1080p/64D -- so a batch that
        # the Pallas int16 path holds easily OOMs here (measured: 16.40
        # GB at batch 8 on a 15.75 GB chip). Chunk the batch through
        # lax.map so any outer batch size is memory-safe at identical
        # numerics (the map is a scan over vmapped chunks).
        batch = left_gray.shape[0] if left_gray.ndim >= 3 else None
        chunk = xla_sgm_fallback_chunk(
            left_gray.shape[-2], left_gray.shape[-1],
            params.num_disparities,
        )
        if batch is not None and batch > chunk:
            # explicit (n, chunk, H, W) stacking + lax.map keeps exactly
            # one chunk's volume live (scan serializes); the ops need a
            # real batch axis, so vmap-based chunking does not apply
            n_full = batch // chunk
            head = tuple(
                x[: n_full * chunk].reshape((n_full, chunk) + x.shape[1:])
                for x in (left_gray, right_gray)
            )
            res = jax.tree_util.tree_map(
                lambda t: t.reshape((n_full * chunk,) + t.shape[2:]),
                jax.lax.map(_xla_chunk, head),
            )
            if batch > n_full * chunk:
                tail = _xla_chunk((left_gray[n_full * chunk:],
                                   right_gray[n_full * chunk:]))
                res = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=0), res, tail
                )
        else:
            res = _xla_chunk((left_gray, right_gray))
        disp, margin = res if return_margin else (res, None)
    if apply_speckle and params.speckle_window_size > 0:
        disp = _speckle(disp, params)
    if return_margin:
        if lf is None:  # non-fused paths never materialized the prefilter
            lf = xsobel_clip(left_gray, params.prefilter_cap)
        conf = match_confidence(
            margin, texture_energy(lf, params.prefilter_cap)
        )
        return disp, conf
    return disp


@partial(jax.jit, static_argnames=("params", "apply_speckle",
                                   "return_margin"))
def sgbm_disparity_jit(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    params: SGBMParams = SGBMParams(),
    apply_speckle: bool = True,
    return_margin: bool = False,
):
    """One-program :func:`sgbm_disparity` for EAGER call sites.

    The depth pipeline already traces the matcher inside its own jit;
    standalone callers (trainer pseudo-labeling, range probes, eval
    harnesses) previously ran the op-by-op eager composition, where
    every internal numpy constant is an implicitly placed upload --
    which on jax 0.9.0 leaks the buffer per call (core/xfer.py; measured
    +3.2 MB/call at (2, 64, 128)). Under jit the constants are embedded
    at compile time, so repeated calls are leak-free (and dispatch
    once instead of per-op).
    """
    return sgbm_disparity(left_gray, right_gray, params,
                          apply_speckle=apply_speckle,
                          return_margin=return_margin)


def _speckle(disp: jnp.ndarray, params: SGBMParams) -> jnp.ndarray:
    """Banded-vote speckle filter: one Pallas kernel on TPU (bit-identical
    to the jnp formulation, ~6x fewer ms/frame), jnp elsewhere."""
    import math

    kwargs = dict(
        invalid=INVALID(params),
        max_diff=float(params.speckle_range),
        min_region=params.speckle_window_size,
        # band coverage must span the actual disparity range: the kernel
        # default (0, 64) would silently lump every disparity above 64
        # into one band for configs with num_disparities > 64
        value_range=(
            float(params.min_disparity),
            float(params.min_disparity + params.num_disparities),
        ),
    )
    if (jax.default_backend() == "tpu"
            and pallas_sgm_supported(disp.shape[-1])):
        from video3d_tpu.kernels.speckle import (
            speckle_block_rows,
            speckle_filter_pallas,
        )

        radius = max(2, int(math.ceil(math.sqrt(params.speckle_window_size))))
        if speckle_block_rows(disp.shape[-2], radius) is not None:
            return speckle_filter_pallas(disp, **kwargs)
    from video3d_tpu.ops.speckle import speckle_filter_device

    return speckle_filter_device(disp, **kwargs)
