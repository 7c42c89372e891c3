"""Pallas TPU kernel: fused BT cost volume + SAD box aggregation.

Builds the box-aggregated Birchfield-Tomasi cost volume straight from the
prefiltered gray pair in one sweep -- the raw per-pixel cost volume never
exists in HBM (in XLA the two stages cost ~10 ms/frame at 1080p and
materialize an extra 265 MB bf16 volume).

Shape contract: gray in (B, H, W) f32 -> cost out (B, H, D, W) bf16,
identical (to bf16 rounding) to
``box_aggregate_hw(bt_cost_volume_dmajor(l, r, D), block) `` clamped to
BIG, as consumed by the SGM kernels.

Mechanics per grid step (one image row y, block-batched over frames):

* compute the raw BT cost row (D, W): the left/right rows and their BT
  half-sample envelopes enter as (1, W) tiles; the 64 disparity shifts
  are lane rolls masked with BIG on the out-of-frame strip, stacked along
  sublanes;
* push it into a 5-deep VMEM ring buffer and update the running vertical
  sum (add newest, subtract oldest) -- rows outside the image contribute
  the zero padding of ``reduce_window``;
* the horizontal 5-tap sum is 4 shifted adds (lane rolls, zero-masked at
  edges) on the vertical sum; emitted for output row y - 2.

The grid runs H + 2*pad steps so the last rows flush out of the ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _bt_envelope(row: jnp.ndarray):
    """Half-sample min/max envelopes along W of a (BB, 1, W) row.

    Edge clamping via iota masks (Mosaic cannot concat lane slices at
    unaligned offsets).
    """
    w = row.shape[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, row.shape, 2)
    prev = jnp.where(cols == 0, row, pltpu.roll(row, 1, axis=2))
    nxt = jnp.where(cols == w - 1, row, pltpu.roll(row, w - 1, axis=2))
    mid_l = 0.5 * (row + prev)
    mid_r = 0.5 * (row + nxt)
    lo = jnp.minimum(jnp.minimum(mid_l, mid_r), row)
    hi = jnp.maximum(jnp.maximum(mid_l, mid_r), row)
    return lo, hi


def _coldiff(row: jnp.ndarray) -> jnp.ndarray:
    """Edge-replicated central difference along W of a (BB, 1, W) row:
    d(x) = g(x+1) - g(x-1), matching ``jnp.pad(mode='edge')``."""
    w = row.shape[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, row.shape, 2)
    nxt = jnp.where(cols == w - 1, row, pltpu.roll(row, w - 1, axis=2))
    prv = jnp.where(cols == 0, row, pltpu.roll(row, 1, axis=2))
    return nxt - prv


def _cost_kernel(
    left_ref,
    right_ref,
    out_ref,
    ring_ref,
    vsum_ref,
    stage_ref,
    dl_ref,
    dr_ref,
    lf_out_ref,
    lf_stage_ref,
    *,
    num_disp: int,
    pad: int,
    h: int,
    rps: int,
    raw_invalid: float,
    cap,
):
    """Blocks: left/right (BB, RPS, 1, W); out (BB, RPS, D, W).

    ``lf_out_ref`` (optional, (BB, RPS, 1, W) int16): the in-stream
    prefiltered LEFT rows, emitted with their own lag-1 staging -- the
    confidence-blend path consumes them (texture energy) without a
    second full-resolution prefilter pass. Values are exact integers in
    [0, 2*cap], so int16 is lossless (Mosaic cannot cast f32->uint8
    in-kernel).

    Grid step s reads input rows [s*rps, s*rps + rps) and emits the out
    block s-1 (aggregated rows lag the inputs by ``lag``): with
    pre-filtered inputs (``cap is None``) lag = pad; with raw gray
    inputs (``cap`` set) the kernel also runs the x-Sobel prefilter
    in-stream -- the column-difference rows d(y) live in a 2-row VMEM
    ring (dl/dr) and the filtered row y-1 = d(y-2) + 2 d(y-1) + d(y)
    (vertical edges replicated, exactly ops.stereo.xsobel_clip) -- so
    lag = pad + 1 and the separate prefilter stage plus its HBM
    round-trip disappear. Rows belonging to block s-1 are written
    straight into out_ref (pre-seeded from the staging buffer); later
    rows go to the staging buffer for the next step. All staging
    indices are static (lag and rps are compile-time).
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        ring_ref[...] = jnp.zeros_like(ring_ref)
        vsum_ref[...] = jnp.zeros_like(vsum_ref)

    # seed the out block(s) with the rows staged during the previous step
    out_ref[...] = stage_ref[...]
    if lf_out_ref is not None:
        lf_out_ref[...] = lf_stage_ref[...]

    # native-int16 arithmetic is bit-exact (see _cost_row_step_i16) but
    # requires 16-bit lane rotates, which current Mosaic cannot lower
    # ("Rotate with non-32-bit data" on tpu.dynamic_rotate) -- so the
    # f32-compute path stays the default even for int16 output, and the
    # int16 path is opt-in for interpret mode / future Mosaic versions.
    import os

    use_i16 = (
        jnp.issubdtype(out_ref.dtype, jnp.integer)
        and os.environ.get("VIDEO3D_TPU_COSTVOL_NATIVE_I16") == "1"
    )
    row_step = _cost_row_step_i16 if use_i16 else _cost_row_step
    lag = pad if cap is None else pad + 1
    for i in range(rps):
        y = s * rps + i  # input-row index (traced via s)
        if cap is None:
            lf, rf, y_f = left_ref[:, i], right_ref[:, i], y
        else:
            dl_new = _coldiff(left_ref[:, i])
            dr_new = _coldiff(right_ref[:, i])
            # bottom edge: rows past the image replicate d(h-1)
            dl_new = jnp.where(y < h, dl_new, dl_ref[1])
            dr_new = jnp.where(y < h, dr_new, dr_ref[1])

            @pl.when(y == 0)  # top edge: d(-1) = d(0)
            def _():
                dl_ref[0] = dl_new
                dl_ref[1] = dl_new
                dr_ref[0] = dr_new
                dr_ref[1] = dr_new

            capf = float(cap)

            def filt(d_ref, d_new):
                dx = d_ref[0] + 2.0 * d_ref[1] + d_new
                return jnp.round(jnp.clip(dx, -capf, capf)) + capf

            lf = filt(dl_ref, dl_new)
            rf = filt(dr_ref, dr_new)
            if lf_out_ref is not None:
                lf8 = lf.astype(jnp.int16)

                @pl.when(y >= 1)
                def _():
                    # lag-1 staging: row y-1; i==0 belongs to block s-1
                    if i == 0:
                        lf_out_ref[:, rps - 1] = lf8
                    else:
                        lf_stage_ref[:, i - 1] = lf8

            dl_ref[0] = dl_ref[1]
            dl_ref[1] = dl_new
            dr_ref[0] = dr_ref[1]
            dr_ref[1] = dr_new
            y_f = y - 1  # filtered-row index the BT/ring stage consumes

        @pl.when(y_f >= 0)
        def _():
            row_step(
                lf,  # (BB, 1, W)
                rf,
                out_ref,
                ring_ref,
                vsum_ref,
                stage_ref,
                y=y_f,
                i=i,
                num_disp=num_disp,
                pad=pad,
                lag=lag,
                h=h,
                rps=rps,
                raw_invalid=raw_invalid,
            )


def _cost_row_step_i16(
    l_row,
    r_row,
    out_ref,
    ring_ref,
    vsum_ref,
    stage_ref,
    *,
    y,
    i: int,
    num_disp: int,
    pad: int,
    lag: int,
    h: int,
    rps: int,
    raw_invalid: float,
):
    """Integer twin of :func:`_cost_row_step`: all ring/box arithmetic in
    native int16 at 2x scale.

    The prefiltered rows are integer-valued (ops.stereo.xsobel_clip
    rounds, like cv2's uint8 LUT), so BT half-sample envelopes are exact
    multiples of 0.5 -- at 2x scale every cost, vertical ring sum and
    5-tap box total is an exact int16 (bound: 25 * 2 * 2*prefilter_cap
    = 12.6k << 32767). Emission halves back to the 1x contract with
    ties-to-even, reproducing ``jnp.round`` of the f32 oracle BIT-EXACTLY
    (f32 sums of half-integers below 2**24 are exact). int16 tiles halve
    the VPU vreg count of this instruction-bound kernel vs the f32 path.
    """
    ring_slots = 2 * pad + 1
    bb, _, w = l_row.shape
    i16 = jnp.int16
    zero = jnp.asarray(0, i16)
    l1 = l_row.astype(i16)  # exact: integer-valued f32 in [0, 2*cap]
    r1 = r_row.astype(i16)

    def env2(row):  # 2x-scaled BT envelopes of a (BB, 1, W) int row
        cols = jax.lax.broadcasted_iota(jnp.int32, row.shape, 2)
        prev = jnp.where(cols == 0, row, pltpu.roll(row, 1, axis=2))
        nxt = jnp.where(cols == w - 1, row, pltpu.roll(row, w - 1, axis=2))
        two = row + row
        lo2 = jnp.minimum(jnp.minimum(row + prev, row + nxt), two)
        hi2 = jnp.maximum(jnp.maximum(row + prev, row + nxt), two)
        return lo2, hi2

    l_lo2, l_hi2 = env2(l1)
    r_lo2, r_hi2 = env2(r1)
    l2 = l1 + l1
    r2 = r1 + r1
    sub = 8

    def stack8(row):  # (BB, 1, W) -> (BB, 8, W) with row k shifted by k
        return jnp.concatenate(
            [row if k == 0 else pltpu.roll(row, k, axis=2) for k in range(sub)],
            axis=1,
        )

    r_base = stack8(r2)
    rlo_base = stack8(r_lo2)
    rhi_base = stack8(r_hi2)
    d_iota8 = jax.lax.broadcasted_iota(jnp.int32, (bb, sub, w), 1)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (bb, sub, w), 2)
    inv2 = jnp.asarray(int(round(2.0 * raw_invalid)), i16)
    pieces = []
    for j in range(num_disp // sub):
        if j == 0:
            r_d, rlo_d, rhi_d = r_base, rlo_base, rhi_base
        else:
            r_d = pltpu.roll(r_base, sub * j, axis=2)
            rlo_d = pltpu.roll(rlo_base, sub * j, axis=2)
            rhi_d = pltpu.roll(rhi_base, sub * j, axis=2)
        d_lr = jnp.maximum(zero, jnp.maximum(l2 - rhi_d, rlo_d - l2))
        d_rl = jnp.maximum(zero, jnp.maximum(r_d - l_hi2, l_lo2 - r_d))
        cost = jnp.minimum(d_lr, d_rl)
        cost = jnp.where(cols8 < d_iota8 + sub * j, inv2, cost)
        pieces.append(cost)
    raw = jnp.concatenate(pieces, axis=1)  # (BB, D, W), 2x scale
    raw = jnp.where(y < h, raw, zero)

    slot = jax.lax.rem(y, ring_slots)
    oldest = ring_ref[slot]
    vsum = vsum_ref[...] + raw - oldest
    vsum_ref[...] = vsum
    ring_ref[slot] = raw

    @pl.when(y >= pad)
    def _():
        wcols = jax.lax.broadcasted_iota(jnp.int32, vsum.shape, 2)
        total = vsum
        for dx in range(1, pad + 1):
            left_sh = pltpu.roll(vsum, dx, axis=2)
            total = total + jnp.where(wcols < dx, zero, left_sh)
            right_sh = pltpu.roll(vsum, w - dx, axis=2)
            total = total + jnp.where(wcols >= w - dx, zero, right_sh)
        # ties-to-even halving back to 1x: round(t/2) == (t + (t>>1 & 1)) >> 1
        # for non-negative t (t=5 -> 2, t=7 -> 4, matching jnp.round)
        half = jnp.right_shift(total, 1)
        val = jnp.right_shift(
            total + jnp.bitwise_and(half, jnp.asarray(1, i16)), 1
        ).astype(out_ref.dtype)
        if i < lag:
            out_ref[:, rps - lag + i] = val
        else:
            stage_ref[:, i - lag] = val


def _cost_row_step(
    l_row,
    r_row,
    out_ref,
    ring_ref,
    vsum_ref,
    stage_ref,
    *,
    y,
    i: int,
    num_disp: int,
    pad: int,
    lag: int,
    h: int,
    rps: int,
    raw_invalid: float,
):
    """Process filtered row ``y`` (= s*rps + i) and emit aggregated row
    ``y - pad`` into out_ref (if it belongs to the current out block,
    i.e. i < pad) or the staging buffer (otherwise)."""
    ring_slots = 2 * pad + 1
    bb, _, w = l_row.shape

    # raw BT cost row (BB, D, W); rows beyond the image contribute zeros.
    # Built in sublane-full (BB, 8, W) tiles: 8 pre-shifted copies of the
    # right row stacked on sublanes, then whole-tile lane rolls of 8 give
    # shifts 8j..8j+7 per tile -- 8+D/8 rolls on full tiles instead of D
    # rolls on 1-sublane rows (which left 7/8 of the VPU idle).
    l_lo, l_hi = _bt_envelope(l_row)
    r_lo, r_hi = _bt_envelope(r_row)
    sub = 8
    assert num_disp % sub == 0

    def stack8(row):  # (BB, 1, W) -> (BB, 8, W) with row k shifted by k
        return jnp.concatenate(
            [row if k == 0 else pltpu.roll(row, k, axis=2) for k in range(sub)],
            axis=1,
        )

    r_base = stack8(r_row)
    rlo_base = stack8(r_lo)
    rhi_base = stack8(r_hi)
    d_iota8 = jax.lax.broadcasted_iota(jnp.int32, (bb, sub, w), 1)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (bb, sub, w), 2)
    pieces = []
    for j in range(num_disp // sub):
        if j == 0:
            r_d, rlo_d, rhi_d = r_base, rlo_base, rhi_base
        else:
            r_d = pltpu.roll(r_base, sub * j, axis=2)
            rlo_d = pltpu.roll(rlo_base, sub * j, axis=2)
            rhi_d = pltpu.roll(rhi_base, sub * j, axis=2)
        d_lr = jnp.maximum(0.0, jnp.maximum(l_row - rhi_d, rlo_d - l_row))
        d_rl = jnp.maximum(0.0, jnp.maximum(r_d - l_hi, l_lo - r_d))
        cost = jnp.minimum(d_lr, d_rl)
        cost = jnp.where(cols8 < d_iota8 + sub * j, raw_invalid, cost)
        pieces.append(cost)
    raw = jnp.concatenate(pieces, axis=1)  # (BB, D, W)
    raw = jnp.where(y < h, raw, jnp.zeros_like(raw))

    # ring update: vertical running sum over the last (2*pad+1) rows
    slot = jax.lax.rem(y, ring_slots)
    oldest = ring_ref[slot]
    vsum = vsum_ref[...] + raw - oldest
    vsum_ref[...] = vsum
    ring_ref[slot] = raw

    # horizontal 5-tap: shifted adds with zero edge masking. Emission
    # starts at y == pad: the top rows' windows are correct because
    # missing rows above the image contributed zeros to vsum. The
    # emitted row y - pad belongs to out block s-1 when i < pad (slot
    # rps - pad + i) and to the staging buffer otherwise (slot i - pad);
    # both slot indices are static.
    @pl.when(y >= pad)
    def _():
        wcols = jax.lax.broadcasted_iota(jnp.int32, vsum.shape, 2)
        total = vsum
        for dx in range(1, pad + 1):
            left_sh = pltpu.roll(vsum, dx, axis=2)  # value from x - dx
            total = total + jnp.where(wcols < dx, 0.0, left_sh)
            right_sh = pltpu.roll(vsum, w - dx, axis=2)  # from x + dx
            total = total + jnp.where(wcols >= w - dx, 0.0, right_sh)
        total = jnp.minimum(total, BIG)
        if jnp.issubdtype(out_ref.dtype, jnp.integer):
            total = jnp.round(total)
        val = total.astype(out_ref.dtype)
        if i < lag:
            out_ref[:, rps - lag + i] = val
        else:
            stage_ref[:, i - lag] = val


def fused_cost_volume(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disp: int,
    block_size: int = 5,
    out_dtype=jnp.bfloat16,
    raw_invalid: float = BIG,
    interpret: bool = False,
    prefilter_cap=None,
    return_filtered_left: bool = False,
):
    """(B, H, W) f32 pair -> (B, H, D, W) box-aggregated BT cost volume.

    ``raw_invalid`` is the per-pixel cost charged where the match would
    fall outside the right image (x - d < 0). The default BIG reproduces
    the f32 sentinel contract; for an int16 volume pass the max valid
    per-pixel cost (2 * prefilter_cap) so box sums stay within the
    integer range -- the WTA's geometric strip mask keeps those columns
    invalid regardless (ops/stereo.py wta semantics).

    ``prefilter_cap``: when set, the inputs are RAW grayscale and the
    x-Sobel prefilter (ops.stereo.xsobel_clip, clip at this cap) runs
    inside the kernel's row stream -- bit-identical output, one less
    pipeline stage and no filtered-pair HBM round-trip (~2 ms/frame at
    1080p: the standalone prefilter ran at 16 GB/s on both eyes).

    ``return_filtered_left`` (requires ``prefilter_cap``): also emit the
    prefiltered left view as a lossless int16 (B, H, W) second output
    (values are exact integers <= 2*cap) for the confidence-blend
    texture gate -- returns ``(cost, lf)``.
    """
    assert not return_filtered_left or prefilter_cap is not None
    b, h, w = left_gray.shape
    pad = block_size // 2
    out_bytes = jnp.dtype(out_dtype).itemsize
    import os

    integer = jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer) and (
        os.environ.get("VIDEO3D_TPU_COSTVOL_NATIVE_I16") == "1"
    )
    if integer:
        # int16-2x path bound: the whole box total must fit int16
        assert 2 * raw_invalid * block_size**2 < 32767, (
            "int16 cost path overflows for raw_invalid="
            f"{raw_invalid}, block_size={block_size}"
        )
    ring_bytes = 2 if integer else 4  # ring/vsum live in the compute dtype

    # rows per grid step: the passes were step-count-bound at one row
    # per step (~1082 steps x ~4 us at 1080p); deeper steps amortize.
    # Constraint: rps >= pad for the static staging slot math. The VMEM
    # model adds the measured scheduler overhead beyond the ring/stage/
    # block estimate: ~2 MiB of row temporaries plus ~0.8 MiB per unit
    # of block-batch (scoped-allocation reports: D=16/bb=4/rps=12 hit
    # 17.0 MiB where the bare estimate said 11.8).
    budget = 15 * 2**20

    lag = pad if prefilter_cap is None else pad + 1

    def vmem(bb, rps):
        if rps < lag:
            return 1 << 62  # illegal: staging slot math needs rps >= lag
        ring = (2 * pad + 2) * bb * ring_bytes * num_disp * w  # ring + vsum
        stage = bb * rps * out_bytes * num_disp * w
        blocks = 2 * bb * rps * out_bytes * num_disp * w  # out dbl-buffered
        return (
            ring + stage + blocks + 2 * 2**20 + bb * int(0.8 * 2**20)
        )

    from video3d_tpu.kernels.sgm import _pick_tiling

    bb, rps = _pick_tiling(b, h, vmem, budget, rps_cap=12)
    if rps < lag:  # no legal pick: fall back to minimum-legal tiling
        bb, rps = 1, lag

    nblk = h // rps
    steps = nblk + 1  # one extra step flushes the last pad rows

    # gray as (B, H, 1, W) so row blocks are (bb, rps, 1, w): the block's
    # last two dims (1, w) span their array dims (Mosaic block rule)
    left_gray = left_gray[:, :, None, :]
    right_gray = right_gray[:, :, None, :]
    row_map = lambda i, s: (i, jnp.minimum(s, nblk - 1), 0, 0)
    out_map = lambda i, s: (i, jnp.maximum(s - 1, 0), 0, 0)
    gray_spec = pl.BlockSpec((bb, rps, 1, w), row_map, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bb, rps, num_disp, w), out_map, memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((2 * pad + 1, bb, num_disp, w),
                   jnp.int16 if integer else jnp.float32),
        pltpu.VMEM((bb, num_disp, w),
                   jnp.int16 if integer else jnp.float32),
        pltpu.VMEM((bb, rps, num_disp, w), out_dtype),
        pltpu.VMEM((2, bb, 1, w), jnp.float32),  # dl ring
        pltpu.VMEM((2, bb, 1, w), jnp.float32),  # dr ring
    ]
    if return_filtered_left:
        scratch.append(pltpu.VMEM((bb, rps, 1, w), jnp.int16))

        def kernel(l_ref, r_ref, o_ref, lf_ref, ring, vsum, stage, dl, dr,
                   lf_stage):
            _cost_kernel(
                l_ref, r_ref, o_ref, ring, vsum, stage, dl, dr,
                lf_ref, lf_stage,
                num_disp=num_disp, pad=pad, h=h, rps=rps,
                raw_invalid=float(raw_invalid),
                cap=float(prefilter_cap),
            )

        lf_spec = pl.BlockSpec((bb, rps, 1, w), out_map,
                               memory_space=pltpu.VMEM)
        cost, lf = pl.pallas_call(
            kernel,
            grid=(b // bb, steps),
            in_specs=[gray_spec, gray_spec],
            out_specs=(out_spec, lf_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, num_disp, w), out_dtype),
                jax.ShapeDtypeStruct((b, h, 1, w), jnp.int16),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(left_gray, right_gray)
        return cost, lf[:, :, 0, :]

    def kernel(l_ref, r_ref, o_ref, ring, vsum, stage, dl, dr):
        _cost_kernel(
            l_ref, r_ref, o_ref, ring, vsum, stage, dl, dr, None, None,
            num_disp=num_disp, pad=pad, h=h, rps=rps,
            raw_invalid=float(raw_invalid),
            cap=None if prefilter_cap is None else float(prefilter_cap),
        )

    return pl.pallas_call(
        kernel,
        grid=(b // bb, steps),
        in_specs=[gray_spec, gray_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, num_disp, w), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(left_gray, right_gray)
