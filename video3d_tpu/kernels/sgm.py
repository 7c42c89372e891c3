"""Pallas TPU kernel: semi-global path aggregation.

Replaces the ``lax.scan`` formulation of :func:`video3d_tpu.ops.stereo.
sgm_aggregate` on TPU. The scan version dispatches ~10k tiny sequential
steps per frame; here each directional sweep is ONE ``pallas_call`` whose
grid walks image rows with the SGM recurrence carries resident in VMEM:

* one row pass computes up to three directions at once (vertical + both
  diagonals) from a single HBM read of the cost row -- the diagonal
  recurrences are the vertical one with the carry laterally rolled one
  pixel per row;
* the opposite sweep is the same kernel with a reversed row index_map;
* horizontal paths reuse the kernel on a (W, H) transposed volume;
* every pass accumulates into the running path-sum via
  ``input_output_aliases`` (read acc row + add + write), so the whole
  8-path aggregation costs ~6 HBM traversals of the cost volume instead
  of 16+ under scan stacking.

Semantics match ops/stereo.py `_sgm_step`/`_scan_paths_along` exactly
(same zero-initialized borders and zero lateral fill), so CPU parity
tests compare against that reference (reference behavior:
cv2.StereoSGBM path aggregation, depth.py:315-341).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
# int16 compute sentinel: above any reachable path value (per-direction
# l_new <= cost_max + P2 ~= 5.6k; 5-path totals <= 28k) yet far enough
# below int16 max that sentinel + P1 cannot wrap.
BIG_I16 = 30000


def _sentinel_for(dtype) -> float:
    return BIG_I16 if jnp.issubdtype(dtype, jnp.integer) else BIG


def _acc_dtype_for(cost_dtype) -> jnp.dtype:
    """Accumulator/carry dtype for a given cost-volume dtype.

    Integer (sentinel-free) cost -> int16 (see :func:`acc_dtype_for_params`
    for the exactness bound); float cost (BIG sentinel) -> f32.
    """
    return jnp.int16 if jnp.issubdtype(cost_dtype, jnp.integer) else jnp.float32


def acc_dtype_for_params(cost_dtype, params) -> jnp.dtype:
    """Accumulator dtype that provably cannot overflow for ``params``.

    A single direction's path value is bounded by cost_max + P2 where
    cost_max = block**2 * 2 * prefilter_cap (BT cost after the x-Sobel
    clip, summed over the matching window); the aggregated total is
    num_paths times that. int16 accumulation is exact iff the total
    stays below the BIG_I16 sentinel (5-path default: 5 * 5550 = 27.8k
    fits; 8-path MODE_HH: 44.4k does NOT -- it gets f32).
    """
    if not jnp.issubdtype(cost_dtype, jnp.integer):
        return jnp.float32
    cost_max = params.block_size**2 * 2 * params.prefilter_cap
    bound = params.num_paths * (cost_max + params.p2)
    return jnp.int16 if bound < BIG_I16 else jnp.float32


def _row_kernel(
    cost_ref,
    acc_ref,
    out_ref,
    carry_ref,
    *,
    shifts: Tuple[int, ...],
    p1: float,
    p2: float,
):
    """One grid step = one image row; carries persist across rows.

    cost_ref/acc_ref/out_ref blocks are (1, 1, W, D); carry_ref is
    (len(shifts), W, D) VMEM scratch.
    """
    y = pl.program_id(1)

    @pl.when(y == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    c = cost_ref[0, 0].astype(jnp.float32)  # (W, D); cost may be bf16
    w = c.shape[0]
    total = acc_ref[0, 0]
    for k, s in enumerate(shifts):
        prev = carry_ref[k]
        if s != 0:
            rolled = pltpu.roll(prev, s % w, axis=0)  # pltpu.roll needs s >= 0
            # zero-fill the wrapped edge row (parity with the jnp
            # reference's shift_carry)
            rows = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 0)
            edge = rows < s if s > 0 else rows >= w + s
            prev = jnp.where(edge, 0.0, rolled)
        m = jnp.min(prev, axis=-1, keepdims=True)
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full_like(prev[:, :1], BIG)], axis=-1
        )
        dn = jnp.concatenate(
            [jnp.full_like(prev[:, :1], BIG), prev[:, :-1]], axis=-1
        )
        best = jnp.minimum(jnp.minimum(prev, m + p2), jnp.minimum(up, dn) + p1)
        l_new = c + best - m
        carry_ref[k] = l_new
        total = total + l_new
    out_ref[0, 0] = total


def _directional_pass(
    cost: jnp.ndarray,
    acc: jnp.ndarray,
    shifts: Tuple[int, ...],
    p1: float,
    p2: float,
    reverse: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sweep over axis 1 of (B, H, W, D), adding path costs into ``acc``."""
    b, h, w, d = cost.shape
    if reverse:
        index_map = lambda i, y: (i, h - 1 - y, 0, 0)
    else:
        index_map = lambda i, y: (i, y, 0, 0)
    spec = pl.BlockSpec((1, 1, w, d), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_row_kernel, shifts=shifts, p1=p1, p2=p2)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        scratch_shapes=[pltpu.VMEM((len(shifts), w, d), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost, acc)


def sgm_aggregate_pallas(
    cost: jnp.ndarray,
    num_paths: int = 8,
    p1: float = 600.0,
    p2: float = 2400.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum of directional SGM path costs over 2/4/8 paths (B, H, W, D).

    Drop-in equivalent of ops.stereo.sgm_aggregate's result. ``cost`` may
    be bf16 (recommended on TPU: halves HBM traffic); path accumulation
    is always f32.
    """
    b, h, w, d = cost.shape

    # horizontal paths on the (W, H) transposed volume
    cost_t = jnp.swapaxes(cost, 1, 2)  # (B, W, H, D)
    acc_t = jnp.zeros(cost_t.shape, jnp.float32)
    acc_t = _directional_pass(cost_t, acc_t, (0,), p1, p2, False, interpret)
    acc_t = _directional_pass(cost_t, acc_t, (0,), p1, p2, True, interpret)
    acc = jnp.swapaxes(acc_t, 1, 2)

    if num_paths == 5:
        return _directional_pass(cost, acc, (0, 1, -1), p1, p2, False, interpret)
    if num_paths >= 4:
        shifts = (0, 1, -1) if num_paths >= 8 else (0,)
        acc = _directional_pass(cost, acc, shifts, p1, p2, False, interpret)
        acc = _directional_pass(cost, acc, shifts, p1, p2, True, interpret)
    return acc


# ---------------------------------------------------------------------------
# D-major layout variant: cost (B, H, D, W)
# ---------------------------------------------------------------------------
#
# On TPU the (..., H, W, D) layout is hostile: D=64 is the minor (lane)
# axis, so every (..., 1)-minor slice or stack pads 128x and the full
# pipeline OOMs at 1080p. In (B, scanline, D, W) layout every kernel
# block is a (D, W) tile -- disparities on sublanes, pixels on lanes --
# which tiles perfectly (and satisfies the Mosaic rule that a block's
# last two dims be 8/128-divisible or span the array).


def _row_kernel_dmajor(
    cost_ref,
    acc_ref,
    out_ref,
    carry_ref,
    *,
    shifts: Tuple[int, ...],
    p1: float,
    p2: float,
    reverse: bool,
):
    """Grid step = RPS scan lines across a block-batch of frames.

    Blocks are (BB, RPS, D, W); the SGM recurrence runs over the
    disparity axis (sublanes), the diagonal lateral roll over the pixel
    axis (lanes). The RPS rows are processed sequentially in-register
    (the recurrence is inherently serial along the scan), which divides
    the grid-step count -- the passes are step-count-bound, not
    bandwidth-bound, at 1080p. Reverse sweeps walk blocks and in-block
    rows backwards.
    """
    y = pl.program_id(1)

    @pl.when(y == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    # compute in f32 (exact: all path values are integers < 2**24) with
    # f32 VMEM carries, so the only dtype conversions in this VPU-issue-
    # bound loop are at the HBM block boundaries (cost/acc/out). Mosaic
    # cannot reduce over int16, so native-int16 compute is not an option.
    ct = jnp.float32
    sent = _sentinel_for(ct)
    p1c = jnp.asarray(p1, ct)
    p2c = jnp.asarray(p2, ct)
    c_all = cost_ref[...].astype(ct)  # (BB, RPS, D, W)
    rps = c_all.shape[1]
    w = c_all.shape[-1]
    rows = range(rps - 1, -1, -1) if reverse else range(rps)
    for r in rows:
        c = c_all[:, r]  # (BB, D, W)
        total = (
            acc_ref[:, r].astype(ct)
            if acc_ref is not None
            else jnp.zeros_like(c)
        )
        for k, s in enumerate(shifts):
            prev = carry_ref[k]  # (BB, D, W)
            if s != 0:
                rolled = pltpu.roll(prev, s % w, axis=2)
                cols = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
                edge = cols < s if s > 0 else cols >= w + s
                prev = jnp.where(edge, jnp.asarray(0, ct), rolled)
            m = jnp.min(prev, axis=1, keepdims=True)  # (BB, 1, W)
            up = jnp.concatenate(
                [prev[:, 1:, :], jnp.full_like(prev[:, :1, :], sent)], axis=1
            )
            dn = jnp.concatenate(
                [jnp.full_like(prev[:, :1, :], sent), prev[:, :-1, :]], axis=1
            )
            best = jnp.minimum(
                jnp.minimum(prev, m + p2c), jnp.minimum(up, dn) + p1c
            )
            l_new = c + best - m
            carry_ref[k] = l_new
            total = total + l_new
        out_ref[:, r] = total.astype(out_ref.dtype)


def _pick_tiling(b: int, h: int, vmem, budget: int,
                 rps_cap: int = 16) -> Tuple[int, int]:
    """(block-batch, rows-per-step) divisor pair minimizing the total
    grid-step count (b/bb)*(h/rps) subject to vmem(bb, rps) <= budget.

    Ties prefer larger rps (smaller carries re-zeroed per frame) then
    smaller bb. ``rps_cap`` bounds in-kernel unrolling (compile time).
    """
    divs_b = [x for x in range(1, b + 1) if b % x == 0]
    divs_h = [x for x in range(1, min(h, rps_cap) + 1) if h % x == 0]
    best = (1, 1)
    best_steps = None
    for bb in divs_b:
        for rps in divs_h:
            if vmem(bb, rps) > budget:
                continue
            steps = (b // bb) * (h // rps)
            key = (steps, -rps, bb)
            if best_steps is None or key < best_steps:
                best_steps = key
                best = (bb, rps)
    return best


def _directional_pass_dmajor(
    cost: jnp.ndarray,
    acc: Optional[jnp.ndarray],
    shifts: Tuple[int, ...],
    p1: float,
    p2: float,
    reverse: bool,
    interpret: bool = False,
    acc_dtype=None,
) -> jnp.ndarray:
    """Sweep over axis 1 (scan lines) of (B, R, D, W), adding into acc.

    ``acc=None`` starts a fresh accumulation (no zeros round-trip
    through HBM for the first pass); ``acc_dtype`` then picks the
    accumulator dtype (callers should use :func:`acc_dtype_for_params`,
    which proves int16 exactness for the given path count/penalties --
    an integer cost volume is sentinel-free, see costvol.
    fused_cost_volume raw_invalid). int16 accumulation halves HBM
    traffic and doubles the rows a VMEM budget can hold, and the kernel
    computes natively in the carry dtype so no per-element conversions
    remain in the sweep.
    """
    b, h, d, w = cost.shape
    if acc is not None:
        acc_dtype = acc.dtype
    elif acc_dtype is None:
        acc_dtype = _acc_dtype_for(cost.dtype)
    ab = jnp.dtype(acc_dtype).itemsize
    # pick (block-batch, rows-per-step) to fill the VMEM budget: carry is
    # len(shifts)*bb*d*w at f32 (compute dtype); cost/acc/out blocks
    # double-buffered at their storage dtypes. Estimate with the PADDED
    # tile dims (lanes round up to 128, sublanes to 8) -- Mosaic allocates
    # padded tiles, and 1080-lane blocks pad 6.7%.
    budget = 14 * 2**20
    dp = -(-d // 8) * 8
    wp = -(-w // 128) * 128

    def vmem(bb, rps):
        # carry + double-buffered cost/acc-in/out blocks + the kernel's
        # f32 staging copy of the cost block (c_all) -- measured scoped
        # allocations match this within ~1 MiB
        return (
            len(shifts) * bb * 4 * dp * wp
            + (bb * rps * (2 * (cost.dtype.itemsize + 2 * ab) + 4)) * dp * wp
        )

    # the sweeps are grid-step-overhead-bound at 1080p (~2 us/step), so
    # choose the (block-batch, rows-per-step) divisor pair minimizing the
    # TOTAL step count (b/bb)*(h/rps) under the VMEM budget -- e.g. at
    # batch 8 on the 1920-line horizontal volumes, bb=2/rps=8 gives 960
    # steps where the old greedy rps-first pick (1, 10) gave 1536
    bb, rps = _pick_tiling(b, h, vmem, budget)

    nblk = h // rps
    if reverse:
        index_map = lambda i, y: (i, nblk - 1 - y, 0, 0)
    else:
        index_map = lambda i, y: (i, y, 0, 0)
    spec = pl.BlockSpec((bb, rps, d, w), index_map, memory_space=pltpu.VMEM)
    if acc is None:
        def kernel_noacc(cost_ref, out_ref, carry_ref):
            _row_kernel_dmajor(
                cost_ref, None, out_ref, carry_ref,
                shifts=shifts, p1=p1, p2=p2, reverse=reverse,
            )

        return pl.pallas_call(
            kernel_noacc,
            grid=(b // bb, nblk),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(cost.shape, acc_dtype),
            scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w), jnp.float32)],
            interpret=interpret,
        )(cost)
    kernel = functools.partial(
        _row_kernel_dmajor, shifts=shifts, p1=p1, p2=p2, reverse=reverse
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bb, nblk),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost, acc)


def _final_wta_kernel_dmajor(
    cost_ref,
    acc_ref,
    disp_ref,
    margin_ref,
    carry_ref,
    *,
    shifts: Tuple[int, ...],
    p1: float,
    p2: float,
    min_disparity: int,
    uniqueness_ratio: int,
    disp12_max_diff: int,
    reverse: bool = True,
):
    """Final sweep fused with winner-take-all.

    Computes the last directions' path costs, adds the accumulated
    passes, and turns the complete per-row total (BB, D, W) directly
    into validated sub-pixel disparity rows -- the aggregated volume
    never round-trips HBM and the separate WTA pass disappears. WTA
    semantics identical to ops.stereo.wta_disparity_dmajor (tested).

    ``reverse=True`` is the 8-path bottom-up closing sweep; ``False``
    is the 5-path (MODE_SGBM) top-down sweep, where the three downward
    directions are the ONLY vertical work, so the fused pass replaces
    both the vertical pass and the WTA.
    """
    y = pl.program_id(1)

    @pl.when(y == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    ct = jnp.float32  # f32 compute, f32 carries (see _row_kernel_dmajor)
    sent = _sentinel_for(ct)
    p1c = jnp.asarray(p1, ct)
    p2c = jnp.asarray(p2, ct)
    c_all = cost_ref[...].astype(ct)  # (BB, RPS, D, W)
    bb, rps, nd, w = c_all.shape
    rows = range(rps - 1, -1, -1) if reverse else range(rps)
    for r in rows:
        c = c_all[:, r]
        total = acc_ref[:, r].astype(ct)
        for k, s in enumerate(shifts):
            prev = carry_ref[k]
            if s != 0:
                rolled = pltpu.roll(prev, s % w, axis=2)
                cols = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
                edge = cols < s if s > 0 else cols >= w + s
                prev = jnp.where(edge, jnp.asarray(0, ct), rolled)
            m = jnp.min(prev, axis=1, keepdims=True)
            up = jnp.concatenate(
                [prev[:, 1:, :], jnp.full_like(prev[:, :1, :], sent)], axis=1
            )
            dn = jnp.concatenate(
                [jnp.full_like(prev[:, :1, :], sent), prev[:, :-1, :]], axis=1
            )
            best = jnp.minimum(
                jnp.minimum(prev, m + p2c), jnp.minimum(up, dn) + p1c
            )
            l_new = c + best - m
            carry_ref[k] = l_new
            total = total + l_new

        # ---- winner-take-all on the complete row total (BB, D, W) ----
        # reductions/selects stay in the compute dtype; only the selected
        # (BB, W) planes are promoted to f32 for the sub-pixel math
        d_iota = jax.lax.broadcasted_iota(jnp.int32, total.shape, 1)
        s_min_k = jnp.min(total, axis=1, keepdims=True)  # (BB, 1, W)
        is_min = total == s_min_k
        d_int = jnp.min(
            jnp.where(is_min, d_iota, nd), axis=1
        )  # (BB, W); first minimum like argmin
        s_min = s_min_k[:, 0].astype(jnp.float32)
        dn_t = jnp.concatenate([total[:, :1], total[:, :-1]], axis=1)
        up_t = jnp.concatenate([total[:, 1:], total[:, -1:]], axis=1)
        onehot = d_iota == d_int[:, None, :]
        zero = jnp.asarray(0, ct)
        s_m1 = jnp.sum(jnp.where(onehot, dn_t, zero), axis=1).astype(
            jnp.float32
        )
        s_p1 = jnp.sum(jnp.where(onehot, up_t, zero), axis=1).astype(
            jnp.float32
        )
        denom = s_m1 + s_p1 - 2.0 * s_min
        sub = jnp.where(
            denom > 1e-6, (s_m1 - s_p1) / (2.0 * denom + 1e-12), 0.0
        )
        sub = jnp.clip(sub, -0.5, 0.5)
        sub = jnp.where((d_int == 0) | (d_int == nd - 1), 0.0, sub)
        disp = d_int.astype(jnp.float32) + sub + float(min_disparity)

        valid = s_min < BIG / 2
        x_iota = jax.lax.broadcasted_iota(jnp.int32, s_min.shape, 1)
        valid &= x_iota >= min_disparity + nd

        if uniqueness_ratio > 0 or margin_ref is not None:
            near = jnp.abs(d_iota - d_int[:, None, :]) <= 1
            second = jnp.min(
                jnp.where(near, jnp.asarray(sent, ct), total), axis=1
            ).astype(jnp.float32)
            if uniqueness_ratio > 0:
                valid &= second * 100.0 >= s_min * (100.0 + uniqueness_ratio)
            if margin_ref is not None:
                # relative uniqueness margin: the guidance blend's
                # confidence signal (stages/depth.py blend='confidence')
                margin_ref[:, r, 0, :] = jnp.maximum(
                    second - s_min, 0.0
                ) / (s_min + 1.0)

        if disp12_max_diff >= 0:
            # right-image WTA via ONE sheared view of the row total:
            # shear[b, d, x] = total[b, d, x + d + min_disparity (mod w)]
            # is exactly the right-disparity hypothesis surface, so the
            # 2*nd sequential lane-rolls collapse to two stride-rolls.
            # Mosaic only lowers small strides, so the required -1
            # per-sublane step becomes: flip the disparity axis with an
            # MXU permutation matmul (exact in f32), then stride +1.
            rev = (
                jax.lax.broadcasted_iota(jnp.int32, (nd, nd), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (nd, nd), 1)
                == nd - 1
            ).astype(jnp.float32)
            flipped = jnp.stack(
                [
                    jnp.dot(rev, total[i], preferred_element_type=jnp.float32)
                    for i in range(bb)
                ]
            )  # flipped[b, d', x] = total[b, nd-1-d', x]
            shear = pltpu.roll(
                flipped,
                (w - min_disparity - (nd - 1)) % w,
                axis=2,
                stride=1,
                stride_axis=1,
            )  # shear[b, d', x] = total[b, d, x + d + md], d = nd-1-d'
            # columns wrapped past the right edge are invalid hypotheses
            d_rev = nd - 1 - d_iota  # original-d index per flipped sublane
            wrap = x_iota[:, None, :] >= w - min_disparity - d_rev
            shear = jnp.where(wrap, jnp.asarray(sent, ct), shear)
            best_r_k = jnp.min(shear, axis=1, keepdims=True)
            # first minimum in ORIGINAL d order = smallest d among ties
            d_right = jnp.min(
                jnp.where(shear == best_r_k, d_rev, nd), axis=1
            ).astype(jnp.float32)  # (BB, W)
            d_round = jnp.clip(
                jnp.round(disp - min_disparity).astype(jnp.int32), 0, nd - 1
            )
            dl = disp - min_disparity
            # gather d_right at x - (d_left + min_disparity): shear the
            # broadcast d_right the opposite way and select plane d_round
            d_right_b = jnp.broadcast_to(d_right[:, None, :], total.shape)
            shear2 = pltpu.roll(
                d_right_b,
                min_disparity % w if min_disparity else 0,
                axis=2,
                stride=1,
                stride_axis=1,
            )
            sel = d_iota == d_round[:, None, :]
            d_right_at = jnp.sum(
                jnp.where(sel, shear2, 0.0), axis=1
            )  # (BB, W)
            lr_ok = jnp.abs(dl - d_right_at) <= float(disp12_max_diff)
            valid &= lr_ok

        disp_ref[:, r, 0, :] = jnp.where(
            valid, disp, float(min_disparity - 1)
        )


def sgm_wta_pallas_dmajor(
    cost: jnp.ndarray,
    params,
    interpret: bool = False,
    return_margin: bool = False,
):
    """Full SGM aggregation + WTA, D-major: (B, H, D, W) cost -> (B, H, W).

    Passes 1-3 accumulate as in :func:`sgm_aggregate_pallas_dmajor`; the
    final reverse vertical pass is fused with WTA so the aggregated
    volume never returns to HBM.
    """
    p1, p2 = float(params.p1), float(params.p2)
    b, h, d, w = cost.shape
    acc_dtype = acc_dtype_for_params(cost.dtype, params)

    cost_t = jnp.swapaxes(cost, 1, 3)  # (B, W, D, H)
    acc_t = _directional_pass_dmajor(
        cost_t, None, (0,), p1, p2, False, interpret, acc_dtype=acc_dtype
    )
    acc_t = _directional_pass_dmajor(cost_t, acc_t, (0,), p1, p2, True, interpret)
    acc = jnp.swapaxes(acc_t, 1, 3)

    final_reverse = True
    if params.num_paths == 5:
        # MODE_SGBM (reference default): both horizontals + the three
        # downward directions. The downward directions ARE the final
        # (top-down) sweep, fused with WTA -- no separate vertical pass.
        shifts = (0, 1, -1)
        final_reverse = False
    elif params.num_paths >= 4:
        shifts = (0, 1, -1) if params.num_paths >= 8 else (0,)
        acc = _directional_pass_dmajor(
            cost, acc, shifts, p1, p2, False, interpret
        )
    else:
        # horizontal-only: the "final" pass contributes no new directions,
        # so run plain WTA on the accumulated volume instead
        from video3d_tpu.ops.stereo import wta_disparity_dmajor

        return wta_disparity_dmajor(acc, params,
                                    return_margin=return_margin)

    # final pass fused with WTA (tighter budget: the in-kernel
    # WTA needs scratch headroom for its temporaries -- a few (bb, D, W)
    # f32 planes beyond the block estimate)
    budget = int(10.5 * 2**20)
    ab = acc.dtype.itemsize
    dp = -(-d // 8) * 8
    wp = -(-w // 128) * 128

    def vmem(bb, rps):
        return (
            len(shifts) * bb * 4 * dp * wp
            + (bb * rps * (2 * (cost.dtype.itemsize + ab) + 4)) * dp * wp
        )

    bb, rps = _pick_tiling(b, h, vmem, budget, rps_cap=10)
    nblk = h // rps
    if final_reverse:
        index_map = lambda i, y: (i, nblk - 1 - y, 0, 0)
    else:
        index_map = lambda i, y: (i, y, 0, 0)
    spec = pl.BlockSpec((bb, rps, d, w), index_map, memory_space=pltpu.VMEM)
    disp_spec = pl.BlockSpec(
        (bb, rps, 1, w), index_map, memory_space=pltpu.VMEM
    )
    common = dict(
        shifts=shifts,
        p1=p1,
        p2=p2,
        min_disparity=int(params.min_disparity),
        uniqueness_ratio=int(params.uniqueness_ratio),
        disp12_max_diff=int(params.disp12_max_diff),
        reverse=final_reverse,
    )
    if return_margin:
        def kernel_m(cost_ref, acc_ref, disp_ref, margin_ref, carry_ref):
            _final_wta_kernel_dmajor(cost_ref, acc_ref, disp_ref,
                                     margin_ref, carry_ref, **common)

        disp, margin = pl.pallas_call(
            kernel_m,
            grid=(b // bb, nblk),
            in_specs=[spec, spec],
            out_specs=(disp_spec, disp_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, 1, w), jnp.float32),
                jax.ShapeDtypeStruct((b, h, 1, w), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w),
                                       jnp.float32)],
            interpret=interpret,
        )(cost, acc)
        return disp[:, :, 0, :], margin[:, :, 0, :]

    def kernel(cost_ref, acc_ref, disp_ref, carry_ref):
        _final_wta_kernel_dmajor(cost_ref, acc_ref, disp_ref, None,
                                 carry_ref, **common)

    disp = pl.pallas_call(
        kernel,
        grid=(b // bb, nblk),
        in_specs=[spec, spec],
        out_specs=disp_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w), jnp.float32)],
        interpret=interpret,
    )(cost, acc)
    return disp[:, :, 0, :]


def sgm_aggregate_pallas_dmajor(
    cost: jnp.ndarray,
    num_paths: int = 8,
    p1: float = 600.0,
    p2: float = 2400.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """SGM path aggregation, D-major layout: (B, H, D, W) -> (B, H, D, W).

    f32 accumulator; ``cost`` may be bf16 (halves HBM traffic); path
    accumulation is always f32. Horizontal paths reuse the same kernel
    on the (B, W, D, H) transpose.
    """
    b, h, d, w = cost.shape

    cost_t = jnp.swapaxes(cost, 1, 3)  # (B, W, D, H)
    acc_t = _directional_pass_dmajor(cost_t, None, (0,), p1, p2, False, interpret)
    acc_t = _directional_pass_dmajor(cost_t, acc_t, (0,), p1, p2, True, interpret)
    acc = jnp.swapaxes(acc_t, 1, 3)

    if num_paths == 5:
        # MODE_SGBM direction set: + downward-only vertical/diagonals
        return _directional_pass_dmajor(
            cost, acc, (0, 1, -1), p1, p2, False, interpret
        )
    if num_paths >= 4:
        shifts = (0, 1, -1) if num_paths >= 8 else (0,)
        acc = _directional_pass_dmajor(cost, acc, shifts, p1, p2, False, interpret)
        acc = _directional_pass_dmajor(cost, acc, shifts, p1, p2, True, interpret)
    return acc
