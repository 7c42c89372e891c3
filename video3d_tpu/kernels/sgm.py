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


def _acc_dtype_for(cost_dtype) -> jnp.dtype:
    """Accumulator/carry dtype for a given cost-volume dtype.

    Integer (sentinel-free) cost -> int16: path values are exact
    integers bounded by 8 * (block**2 * 2*cap + P2) ~= 31.6k < 2**15.
    Float cost (BIG sentinel) -> f32.
    """
    return jnp.int16 if jnp.issubdtype(cost_dtype, jnp.integer) else jnp.float32


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

    c_all = cost_ref[...].astype(jnp.float32)  # (BB, RPS, D, W)
    rps = c_all.shape[1]
    w = c_all.shape[-1]
    rows = range(rps - 1, -1, -1) if reverse else range(rps)
    for r in rows:
        c = c_all[:, r]  # (BB, D, W)
        total = (
            acc_ref[:, r].astype(jnp.float32)
            if acc_ref is not None
            else jnp.zeros_like(c)
        )
        for k, s in enumerate(shifts):
            prev = carry_ref[k].astype(jnp.float32)  # (BB, D, W)
            if s != 0:
                rolled = pltpu.roll(prev, s % w, axis=2)
                cols = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
                edge = cols < s if s > 0 else cols >= w + s
                prev = jnp.where(edge, 0.0, rolled)
            m = jnp.min(prev, axis=1, keepdims=True)  # (BB, 1, W)
            up = jnp.concatenate(
                [prev[:, 1:, :], jnp.full_like(prev[:, :1, :], BIG)], axis=1
            )
            dn = jnp.concatenate(
                [jnp.full_like(prev[:, :1, :], BIG), prev[:, :-1, :]], axis=1
            )
            best = jnp.minimum(
                jnp.minimum(prev, m + p2), jnp.minimum(up, dn) + p1
            )
            l_new = c + best - m
            carry_ref[k] = l_new.astype(carry_ref.dtype)
            total = total + l_new
        out_ref[:, r] = total.astype(out_ref.dtype)


def _directional_pass_dmajor(
    cost: jnp.ndarray,
    acc: Optional[jnp.ndarray],
    shifts: Tuple[int, ...],
    p1: float,
    p2: float,
    reverse: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sweep over axis 1 (scan lines) of (B, R, D, W), adding into acc.

    ``acc=None`` starts a fresh accumulation (no zeros round-trip
    through HBM for the first pass). The accumulator/carry dtype follows
    the cost dtype: an integer cost volume (int16, sentinel-free -- see
    costvol.fused_cost_volume raw_invalid) uses int16 accumulation
    (OpenCV's own representation; exact, since every path value is an
    integer <= 8 * (cost_max + P2) < 2**15), halving HBM traffic and
    doubling the rows a VMEM budget can hold.
    """
    b, h, d, w = cost.shape
    acc_dtype = acc.dtype if acc is not None else _acc_dtype_for(cost.dtype)
    ab = jnp.dtype(acc_dtype).itemsize
    # pick (block-batch, rows-per-step) to fill the VMEM budget: carry is
    # len(shifts)*bb*d*w at acc dtype; cost/acc/out blocks double-buffered
    budget = 14 * 2**20

    def vmem(bb, rps):
        return (
            len(shifts) * bb * ab * d * w
            + 2 * (bb * rps * (cost.dtype.itemsize + 2 * ab)) * d * w
        )

    bb = 1
    rps = 1
    for cand in (10, 8, 6, 5, 4, 3, 2):
        if h % cand == 0 and vmem(1, cand) <= budget:
            rps = cand
            break
    while bb * 2 <= b and b % (bb * 2) == 0 and vmem(bb * 2, rps) <= budget:
        bb *= 2

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
            scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w), acc_dtype)],
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
        scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w), acc.dtype)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost, acc)


def _final_wta_kernel_dmajor(
    cost_ref,
    acc_ref,
    disp_ref,
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

    c_all = cost_ref[...].astype(jnp.float32)  # (BB, RPS, D, W)
    bb, rps, nd, w = c_all.shape
    rows = range(rps - 1, -1, -1) if reverse else range(rps)
    for r in rows:
        c = c_all[:, r]
        total = acc_ref[:, r].astype(jnp.float32)
        for k, s in enumerate(shifts):
            prev = carry_ref[k].astype(jnp.float32)
            if s != 0:
                rolled = pltpu.roll(prev, s % w, axis=2)
                cols = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
                edge = cols < s if s > 0 else cols >= w + s
                prev = jnp.where(edge, 0.0, rolled)
            m = jnp.min(prev, axis=1, keepdims=True)
            up = jnp.concatenate(
                [prev[:, 1:, :], jnp.full_like(prev[:, :1, :], BIG)], axis=1
            )
            dn = jnp.concatenate(
                [jnp.full_like(prev[:, :1, :], BIG), prev[:, :-1, :]], axis=1
            )
            best = jnp.minimum(
                jnp.minimum(prev, m + p2), jnp.minimum(up, dn) + p1
            )
            l_new = c + best - m
            carry_ref[k] = l_new.astype(carry_ref.dtype)
            total = total + l_new

        # ---- winner-take-all on the complete row total (BB, D, W) ----
        d_iota = jax.lax.broadcasted_iota(jnp.int32, total.shape, 1)
        s_min_k = jnp.min(total, axis=1, keepdims=True)  # (BB, 1, W)
        is_min = total == s_min_k
        d_int = jnp.min(
            jnp.where(is_min, d_iota, nd), axis=1
        )  # (BB, W); first minimum like argmin
        s_min = s_min_k[:, 0]
        dn_t = jnp.concatenate([total[:, :1], total[:, :-1]], axis=1)
        up_t = jnp.concatenate([total[:, 1:], total[:, -1:]], axis=1)
        onehot = d_iota == d_int[:, None, :]
        s_m1 = jnp.sum(jnp.where(onehot, dn_t, 0.0), axis=1)
        s_p1 = jnp.sum(jnp.where(onehot, up_t, 0.0), axis=1)
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

        if uniqueness_ratio > 0:
            near = jnp.abs(d_iota - d_int[:, None, :]) <= 1
            second = jnp.min(jnp.where(near, BIG, total), axis=1)
            valid &= second * 100.0 >= s_min * (100.0 + uniqueness_ratio)

        if disp12_max_diff >= 0:
            # lane-dim shifts as rolls + iota masks: Mosaic cannot concat
            # lane slices at non-128-aligned offsets ("result/input
            # offset mismatch on non-concat dimension")
            best_r = jnp.full_like(s_min, BIG)
            d_right = jnp.zeros_like(s_min)
            for dd in range(nd):
                shift = dd + min_disparity
                plane = total[:, dd]  # (BB, W)
                if shift > 0:
                    rolled = pltpu.roll(plane, (w - shift) % w, axis=1)
                    plane = jnp.where(x_iota >= w - shift, BIG, rolled)
                better = plane < best_r
                best_r = jnp.where(better, plane, best_r)
                d_right = jnp.where(better, jnp.float32(dd), d_right)
            d_round = jnp.clip(
                jnp.round(disp - min_disparity).astype(jnp.int32), 0, nd - 1
            )
            dl = disp - min_disparity
            lr_ok = jnp.zeros(disp.shape, bool)
            for dd in range(nd):
                shift = dd + min_disparity
                plane = d_right
                if shift > 0:
                    # wrapped head lands only on x < shift, always inside
                    # the invalid strip (x < min_disparity + nd)
                    plane = pltpu.roll(plane, shift, axis=1)
                lr_ok |= (d_round == dd) & (
                    jnp.abs(dl - plane) <= float(disp12_max_diff)
                )
            valid &= lr_ok

        disp_ref[:, r, 0, :] = jnp.where(
            valid, disp, float(min_disparity - 1)
        )


def sgm_wta_pallas_dmajor(
    cost: jnp.ndarray,
    params,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full SGM aggregation + WTA, D-major: (B, H, D, W) cost -> (B, H, W).

    Passes 1-3 accumulate as in :func:`sgm_aggregate_pallas_dmajor`; the
    final reverse vertical pass is fused with WTA so the aggregated
    volume never returns to HBM.
    """
    p1, p2 = float(params.p1), float(params.p2)
    b, h, d, w = cost.shape

    cost_t = jnp.swapaxes(cost, 1, 3)  # (B, W, D, H)
    acc_t = _directional_pass_dmajor(cost_t, None, (0,), p1, p2, False, interpret)
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

        return wta_disparity_dmajor(acc, params)

    # final pass fused with WTA (tighter budget: the in-kernel
    # WTA needs scratch headroom for its temporaries)
    budget = 9 * 2**20
    ab = acc.dtype.itemsize

    def vmem(bb, rps):
        return (
            len(shifts) * bb * ab * d * w
            + 2 * bb * rps * (cost.dtype.itemsize + ab) * d * w
        )

    rps = 1
    for cand in (10, 8, 6, 4, 3, 2):
        if h % cand == 0 and vmem(1, cand) <= budget:
            rps = cand
            break
    bb = 1
    while bb * 2 <= b and b % (bb * 2) == 0 and vmem(bb * 2, rps) <= budget:
        bb *= 2
    nblk = h // rps
    if final_reverse:
        index_map = lambda i, y: (i, nblk - 1 - y, 0, 0)
    else:
        index_map = lambda i, y: (i, y, 0, 0)
    spec = pl.BlockSpec((bb, rps, d, w), index_map, memory_space=pltpu.VMEM)
    disp_spec = pl.BlockSpec(
        (bb, rps, 1, w), index_map, memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _final_wta_kernel_dmajor,
        shifts=shifts,
        p1=p1,
        p2=p2,
        min_disparity=int(params.min_disparity),
        uniqueness_ratio=int(params.uniqueness_ratio),
        disp12_max_diff=int(params.disp12_max_diff),
        reverse=final_reverse,
    )
    disp = pl.pallas_call(
        kernel,
        grid=(b // bb, nblk),
        in_specs=[spec, spec],
        out_specs=disp_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((len(shifts), bb, d, w), acc.dtype)],
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
