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
# MXU identity-matmul layout transposes
# ---------------------------------------------------------------------------
#
# The horizontal SGM sweeps need a W-major volume; XLA's swapaxes costs
# ~2 ms/frame each way at 1080p (bench_profile.json transpose_cost/
# transpose_acc). In-kernel Mosaic transposes are unavailable (both
# jnp.transpose forms crash or get rejected by the tiling rules, and
# 16-bit lane rotates don't lower). What DOES lower is transpose-as-
# matmul: dot_general(X, I) contracting lhs axis 0 computes X^T inside
# the MXU operand load -- no transpose/rotate ops anywhere. For exact
# int-valued data the product must avoid the MXU's bf16 rounding, so X
# splits into hi/lo bytes (both exact in bf16), transposed by two bf16
# identity matmuls and recombined in f32 (exact: each dot row has ONE
# nonzero product).
#
# Layout choice: the W-major volume is (B, D, W, HP) with HP = H padded
# to a lane multiple -- each grid step transposes a (HB, D, WB) input
# block to (D, WB, HB) with ONE batched dot per matmul (full-tile
# writes), and the horizontal sweep reads (bb, D, rps, HP) blocks whose
# last two dims (rps, HP) tile legally. Lanes >= H carry garbage that
# no consumer reads back (sweep lanes are independent; the inverse
# transpose writes only real rows).

_TILE = 128


def _mxu_t_kernel_fwd(x_ref, o_ref, *, exact_split: bool):
    """(1, HB, D, WB) block -> (1, D, WB, HB): out[d,w,h] = in[h,d,w]."""
    dn = (((0,), (0,)), ((), ()))
    xs = x_ref[0].astype(jnp.float32)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1)
    )
    if exact_split:
        hi = jnp.floor(xs * (1.0 / 256.0))
        lo = xs - hi * 256.0
        eye_b = eye.astype(jnp.bfloat16)
        t_hi = jax.lax.dot_general(hi.astype(jnp.bfloat16), eye_b, dn,
                                   preferred_element_type=jnp.float32)
        t_lo = jax.lax.dot_general(lo.astype(jnp.bfloat16), eye_b, dn,
                                   preferred_element_type=jnp.float32)
        out = t_hi * 256.0 + t_lo
    else:
        out = jax.lax.dot_general(xs, eye.astype(jnp.float32), dn,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _mxu_t_kernel_bwd(x_ref, o_ref, *, exact_split: bool):
    """(1, D, WB, HB) block -> (1, HB, D, WB): out[h,d,w] = in[d,w,h]."""
    dn = (((1,), (2,)), ((), ()))
    xs = x_ref[0].astype(jnp.float32)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1)
    )
    if exact_split:
        hi = jnp.floor(xs * (1.0 / 256.0))
        lo = xs - hi * 256.0
        eye_b = eye.astype(jnp.bfloat16)
        t_hi = jax.lax.dot_general(eye_b, hi.astype(jnp.bfloat16), dn,
                                   preferred_element_type=jnp.float32)
        t_lo = jax.lax.dot_general(eye_b, lo.astype(jnp.bfloat16), dn,
                                   preferred_element_type=jnp.float32)
        out = t_hi * 256.0 + t_lo
    else:
        out = jax.lax.dot_general(eye.astype(jnp.float32), xs, dn,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def transpose_to_wmajor(cost: jnp.ndarray, exact_split: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """(B, H, D, W) -> (B, D, W, HP) via MXU identity matmuls.

    Values must be non-negative integers < 2**15 (int16 cost / integer-
    valued f32 accumulators) for the exact hi/lo split. HP = H rounded
    up to 128; lanes >= H are garbage by contract.
    """
    b, h, d, w = cost.shape
    hp = -(-h // _TILE) * _TILE
    kern = functools.partial(_mxu_t_kernel_fwd, exact_split=exact_split)
    in_spec = pl.BlockSpec((1, _TILE, d, _TILE),
                           lambda i, y, z: (i, y, 0, z),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, d, _TILE, _TILE),
                            lambda i, y, z: (i, 0, z, y),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(b, hp // _TILE, w // _TILE),
        in_specs=[in_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, d, w, hp), cost.dtype),
        interpret=interpret,
    )(cost)


def transpose_from_wmajor(acc_t: jnp.ndarray, h: int,
                          exact_split: bool = True,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, D, W, HP) -> (B, H, D, W), inverse of :func:`transpose_to_wmajor`."""
    b, d, w, hp = acc_t.shape
    kern = functools.partial(_mxu_t_kernel_bwd, exact_split=exact_split)
    in_spec = pl.BlockSpec((1, d, _TILE, _TILE),
                           lambda i, y, z: (i, 0, z, y),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _TILE, d, _TILE),
                            lambda i, y, z: (i, y, 0, z),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(b, hp // _TILE, w // _TILE),
        in_specs=[in_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d, w), acc_t.dtype),
        interpret=interpret,
    )(acc_t)


def _vmin(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise min that lowers for int16 on Mosaic.

    `jnp.minimum` emits `arith.minsi`, which Mosaic fails to legalize
    for packed i16 vectors (observed: "failed to legalize operation
    'arith.minsi'" on vector<8x128x2xi16>); the compare+select pair
    lowers fine and is the same VPU cost."""
    if jnp.issubdtype(a.dtype, jnp.integer):
        return jnp.where(a < b, a, b)
    return jnp.minimum(a, b)


def _tree_min_axis1(x: jnp.ndarray) -> jnp.ndarray:
    """Min over axis 1 (a MAJOR axis) via pairwise halving -- elementwise
    minimums only (no reduce ops, no lane/sublane shuffles)."""
    n = x.shape[1]
    while n > 1:
        half = n // 2
        a = _vmin(x[:, :half], x[:, half:2 * half])
        if n % 2:
            a = jnp.concatenate([a, x[:, 2 * half:]], axis=1)
        x = a
        n = x.shape[1]
    return x  # (BB, 1, HL)


def _row_kernel_wmajor(
    cost_ref,
    acc_ref,
    out_ref,
    carry_ref,
    *,
    p1: float,
    p2: float,
    reverse: bool,
):
    """Horizontal sweep on the (B, D, W, HL) layout.

    Blocks are (BB, D, RPS, HL): scan lines (W positions) at axis 2,
    disparity on a MAJOR axis, lanes = independent image rows. Every op
    is elementwise / major-axis slicing -- no lane rotates, no sublane
    shuffles, no reduce ops. Carries are f32 (exact for integer-valued
    costs; native int16 does not legalize on current Mosaic, see
    :func:`_wmajor_carry_dtype`); cost/acc HBM blocks stay int16.
    Shift set is (0,): diagonals belong to the vertical sweeps.
    """
    y = pl.program_id(1)

    @pl.when(y == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    ct = carry_ref.dtype
    sent = jnp.asarray(_sentinel_for(ct), ct)
    p1c = jnp.asarray(p1, ct)
    p2c = jnp.asarray(p2, ct)
    rps = cost_ref.shape[2]
    rows = range(rps - 1, -1, -1) if reverse else range(rps)
    for r in rows:
        c = cost_ref[:, :, r].astype(ct)  # (BB, D, HL); int16: no-op cast
        prev = carry_ref[...]  # (BB, D, HL)
        m = _tree_min_axis1(prev)  # (BB, 1, HL)
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full_like(prev[:, :1], sent)], axis=1
        )
        dn = jnp.concatenate(
            [jnp.full_like(prev[:, :1], sent), prev[:, :-1]], axis=1
        )
        best = _vmin(_vmin(prev, m + p2c), _vmin(up, dn) + p1c)
        l_new = c + best - m
        carry_ref[...] = l_new
        total = (
            l_new if acc_ref is None
            else acc_ref[:, :, r].astype(ct) + l_new
        )
        out_ref[:, :, r] = total.astype(out_ref.dtype)


def _wmajor_carry_dtype(cost_dtype, acc_dtype, p1: float, p2: float):
    """Always f32: native-int16 sweeps do not lower on current Mosaic.

    Measured on the round-3 toolchain: `arith.minsi` AND `arith.cmpi`
    both fail to legalize for i16 vectors of every shape tried (3D
    (1,D,HL) packed vector<8x128x2xi16>, plain 2D (D,HL) tiles, with and
    without broadcasts/slices) -- so neither jnp.minimum nor a
    compare+select formulation of the SGM min runs in int16. f32 compute
    is exact here regardless (all path values are integers < 2**24);
    int16 remains the HBM storage dtype for cost/acc blocks."""
    del cost_dtype, acc_dtype, p1, p2
    return jnp.float32


def _directional_pass_wmajor(
    cost_t: jnp.ndarray,
    acc_t,
    p1: float,
    p2: float,
    reverse: bool,
    interpret: bool = False,
    acc_dtype=None,
):
    """Horizontal sweep over axis 2 (W) of (B, D, W, HL), adding into acc.

    HL is the lane axis (image rows) and may be any size: the block
    spans it whole (Mosaic's block rule admits spanning dims), so the
    unpadded H works directly.
    """
    b, d, w, hl = cost_t.shape
    if acc_t is not None:
        acc_dtype = acc_t.dtype
    elif acc_dtype is None:
        acc_dtype = _acc_dtype_for(cost_t.dtype)
    ct = _wmajor_carry_dtype(cost_t.dtype, acc_dtype, p1, p2)
    cb = jnp.dtype(ct).itemsize
    ab = jnp.dtype(acc_dtype).itemsize
    budget = 14 * 2**20
    dp = -(-d // 8) * 8
    hp = -(-hl // 128) * 128

    def vmem(bb, rps):
        if rps % 8 and rps != w:
            # rps is a second-to-last block dim in this layout: Mosaic
            # requires it 8-divisible (or spanning)
            return 1 << 62
        # carry + double-buffered cost/acc-in/out blocks + row staging
        return (
            bb * cb * dp * hp
            + (bb * rps * (2 * (cost_t.dtype.itemsize + 2 * ab) + cb))
            * dp * hp
        )

    bb, rps = _pick_tiling(b, w, vmem, budget)
    nblk = w // rps
    if reverse:
        index_map = lambda i, y: (i, 0, nblk - 1 - y, 0)
    else:
        index_map = lambda i, y: (i, 0, y, 0)
    spec = pl.BlockSpec((bb, d, rps, hl), index_map, memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bb, d, hl), ct)]
    kernel = functools.partial(_row_kernel_wmajor, p1=p1, p2=p2,
                               reverse=reverse)
    if acc_t is None:
        def kernel_noacc(cost_ref, out_ref, carry_ref):
            kernel(cost_ref, None, out_ref, carry_ref)

        return pl.pallas_call(
            kernel_noacc,
            grid=(b // bb, nblk),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(cost_t.shape, acc_dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(cost_t)
    return pl.pallas_call(
        kernel,
        grid=(b // bb, nblk),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(acc_t.shape, acc_t.dtype),
        scratch_shapes=scratch,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost_t, acc_t)


def _horizontal_passes_wmajor(cost: jnp.ndarray, p1: float, p2: float,
                              acc_dtype, interpret: bool = False,
                              route: str = "xla"):
    """Both horizontal sweeps on the (B, D, W, H) W-major layout.

    The sweeps themselves run native-int16 (see _row_kernel_wmajor).
    ``route`` picks the layout change: "xla" = jnp.transpose permutes
    (measured ~1.5-2 ms/frame each way at 1080p, bandwidth-pattern
    bound); "mxu" = the Pallas identity-matmul kernels (exact, but the
    int16<->f32 widening makes them slower on current Mosaic -- kept
    for A/B and future toolchains).
    """
    h = cost.shape[1]
    if route == "mxu" and cost.shape[3] % _TILE == 0:
        cost_t = transpose_to_wmajor(cost, interpret=interpret)
    else:
        cost_t = jnp.transpose(cost, (0, 2, 3, 1))  # (B, D, W, H)
    acc_t = _directional_pass_wmajor(cost_t, None, p1, p2, False,
                                     interpret, acc_dtype=acc_dtype)
    acc_t = _directional_pass_wmajor(cost_t, acc_t, p1, p2, True, interpret)
    if route == "mxu" and cost.shape[3] % _TILE == 0:
        return transpose_from_wmajor(acc_t, h, interpret=interpret)
    return jnp.transpose(acc_t, (0, 3, 1, 2))


def _sweep_compiler_params():
    """Megacore-style grid splitting for the sweep kernels (A/B hook).

    Axis 0 of the sweep grids (frame blocks) is embarrassingly parallel
    -- each frame block owns its carry scratch, and the serial
    recurrence only spans axis 1. The ``parallel`` marking lets
    multi-TensorCore chips (v4/v5p megacore) split the grid across
    cores. Default ON: output verified bit-identical on-chip, and the
    chained h_passes A/B measured 4.55 vs 4.83 ms/frame with the hint
    on v5e's single TensorCore (neutral-to-positive there, a ~2x
    step-count win wherever megacore exists). Set
    ``VIDEO3D_TPU_SGM_MEGACORE=0`` to disable for A/B.
    """
    import os

    if os.environ.get("VIDEO3D_TPU_SGM_MEGACORE", "1") == "1":
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    return None


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
    nd = c_all.shape[2]
    w = c_all.shape[-1]
    d_io = jax.lax.broadcasted_iota(jnp.int32, c_all.shape[0:1] + c_all.shape[2:], 1)
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
            # d+-1 neighbors as sublane rotates (vs slice+pad concats:
            # one shifted copy each instead of two slice copies + fill)
            up = jnp.where(d_io == nd - 1, sent,
                           pltpu.roll(prev, nd - 1, axis=1))
            dn = jnp.where(d_io == 0, sent, pltpu.roll(prev, 1, axis=1))
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
    cparams = _sweep_compiler_params()
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
            compiler_params=cparams,
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
        compiler_params=cparams,
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
    import os

    p1, p2 = float(params.p1), float(params.p2)
    b, h, d, w = cost.shape
    acc_dtype = acc_dtype_for_params(cost.dtype, params)

    # Horizontal passes. Default = legacy (B, W, D, H) swapaxes route:
    # the round-3 A/B (tools/profile_sgm.py h_passes_legacy/
    # h_passes_wmajor) measured the alternative W-major (B, D, W, H)
    # route 3x SLOWER at production shapes (14.8 vs 4.8 ms/frame
    # chained) -- its hoped-for native-int16 sweeps don't lower at all
    # (arith.minsi/cmpi fail to legalize for i16 vectors, see
    # _wmajor_carry_dtype), and with f32 carries its (rps, HL)-tiled
    # blocks stream worse than the legacy (D, H) tiles. The route stays
    # available for A/B on future toolchains:
    # VIDEO3D_TPU_SGM_TRANSPOSE: legacy (default) | xla | mxu.
    route = os.environ.get("VIDEO3D_TPU_SGM_TRANSPOSE", "legacy")
    use_wmajor = (
        jnp.issubdtype(cost.dtype, jnp.integer)
        and d % 8 == 0
        and route in ("xla", "mxu")
    )
    if use_wmajor:
        acc = _horizontal_passes_wmajor(cost, p1, p2, acc_dtype, interpret,
                                        route=route)
    else:
        cost_t = jnp.swapaxes(cost, 1, 3)  # (B, W, D, H)
        acc_t = _directional_pass_dmajor(
            cost_t, None, (0,), p1, p2, False, interpret, acc_dtype=acc_dtype
        )
        acc_t = _directional_pass_dmajor(
            cost_t, acc_t, (0,), p1, p2, True, interpret
        )
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
