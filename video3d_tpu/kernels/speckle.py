"""Pallas TPU kernel: banded-window speckle filtering.

Device-exact replacement for :func:`video3d_tpu.ops.speckle.
speckle_filter_device` (the jit-safe approximation of OpenCV's
``filterSpeckles``, reference depth.py:323-324): disparities are
quantized into bands of width ``max_diff``; a pixel survives if at least
``min_region`` valid pixels in its (2r+1)^2 window lie in its own or an
adjacent band.

The jnp formulation costs ~1.8 ms/frame at 1080p (cumsum scans plus
band selects, all HBM round-trips).  Here the whole filter is ONE
pallas_call that walks row blocks top-down:

* a 3-slot VMEM ring holds the band masks of the previous/current/next
  row blocks, so every output row sees its full +-r row window without
  re-reading HBM;
* per-band column sums over the 21-row window are maintained
  incrementally (add row y+r, subtract row y-r-1) in a persistent VMEM
  carry -- two ops per row instead of a cumsum scan;
* the horizontal window sum runs as 2r masked lane-rolls on the whole
  (rows, W) tile, then band-conditional support selection and
  invalidation fuse into the block write.

Input is read twice through two BlockSpecs on the same array (a
lookahead block feeding the ring and the emission block), which is how
Pallas expresses a halo without overlapping block shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _speckle_kernel(
    look_ref,  # (1, R, W) lookahead block j = min(r, nblk-1)
    emit_ref,  # (1, R, W) emission block o = max(r-1, 0)
    out_ref,  # (1, R, W)
    ring_ref,  # (n_bands * 3, R, W) band masks of blocks {o-1, o, o+1}
    colsum_ref,  # (n_bands, 1, W) running 21-row column sums
    boxbuf_ref,  # (n_bands, R, W) column sums, overwritten by window sums
    *,
    n_bands: int,
    radius: int,
    invalid: float,
    max_diff: float,
    lo_v: float,
    min_region: int,
    h: int,
):
    r_step = pl.program_id(1)
    nblk = pl.num_programs(1) - 1
    rr_rows = look_ref.shape[1]  # R
    w = look_ref.shape[2]

    def band_masks(block):  # (R, W) -> list of n_bands (R, W) f32 masks
        valid = block != invalid
        band = jnp.clip(
            jnp.floor((block - lo_v) / max_diff).astype(jnp.int32),
            0,
            n_bands - 1,
        )
        return [
            ((band == k) & valid).astype(jnp.float32) for k in range(n_bands)
        ]

    # --- ring maintenance: store arriving block's band masks ------------
    j = jnp.minimum(r_step, nblk - 1)
    slot_j = j % 3
    look = look_ref[0]
    for k, mask in enumerate(band_masks(look)):
        ring_ref[pl.ds(k * 3 + slot_j, 1), :, :] = mask[None]

    # --- prologue: seed the column sums with rows [0, radius-1] ---------
    @pl.when(r_step == 1)
    def _():
        for k in range(n_bands):
            s = jnp.zeros((1, w), jnp.float32)
            for g in range(radius):  # rows 0..radius-1 live in block 0
                s = s + ring_ref[k * 3, g, :][None]
            colsum_ref[k] = s

    # --- emission: compute output block o = r_step - 1 ------------------
    @pl.when(r_step > 0)
    def _():
        o = r_step - 1

        def ring_row(k, blk_off, local):
            # band-k mask row at global row (o + blk_off)*R + local
            slot = (o + blk_off) % 3
            return ring_ref[pl.ds(k * 3 + slot, 1), local, :]  # (1, W)

        for rr in range(rr_rows):
            y = o * rr_rows + rr  # traced global row
            # add row y + radius (zero past the bottom edge)
            g_add = rr + radius
            add_off, add_local = divmod(g_add, rr_rows)
            # subtract row y - radius - 1 (zero above the top edge)
            g_sub = rr - radius - 1
            sub_off, sub_local = divmod(g_sub, rr_rows)  # python floordiv
            for k in range(n_bands):
                s = colsum_ref[k]
                add = ring_row(k, add_off, add_local)
                s = s + jnp.where(y + radius < h, add, 0.0)
                sub = ring_row(k, sub_off, sub_local)
                s = s - jnp.where(y - radius - 1 >= 0, sub, 0.0)
                colsum_ref[k] = s
                boxbuf_ref[k, rr : rr + 1, :] = s

        # horizontal window sum: 2r masked lane-rolls, processed in
        # 8-row strips written back IN-PLACE into boxbuf (the rolls are
        # strip-local along lanes, so overwriting is safe) -- both the
        # strip granularity and the in-place reuse keep the Mosaic
        # scoped-vmem stack under its 16 MB budget at 1080p
        strip = 8 if rr_rows % 8 == 0 else rr_rows
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 1)
        # [x-r, x+r] lane-window sum as 2r independent masked rolls.
        # A log2(w)-step prefix-scan formulation (window =
        # cs[x+r] - cs[x-r-1], fewer rolls at radius 10: 13 vs 20) was
        # A/B'd ON CHIP and DELETED: the scan's serial dependence lost
        # ~8% to the independent rolls (1.16 vs 1.08 ms/frame full
        # speckle on v5e, 2026-08) -- the VPU hides independent
        # roll+select issue slots better than a dependent chain.
        for k in range(n_bands):
            for g in range(0, rr_rows, strip):
                col = boxbuf_ref[k, g : g + strip, :]
                acc = col
                for s in range(1, radius + 1):
                    right = pltpu.roll(col, s, axis=1)  # = col[x-s]
                    acc = acc + jnp.where(x_iota >= s, right, 0.0)
                    left = pltpu.roll(col, w - s, axis=1)  # col[x+s]
                    acc = acc + jnp.where(x_iota < w - s, left, 0.0)
                boxbuf_ref[k, g : g + strip, :] = acc

        disp = emit_ref[0]
        valid = disp != invalid
        band = jnp.clip(
            jnp.floor((disp - lo_v) / max_diff).astype(jnp.int32),
            0,
            n_bands - 1,
        )
        support = jnp.zeros((rr_rows, w), jnp.float32)
        for k in range(n_bands):
            s_k = boxbuf_ref[k]
            if k > 0:
                s_k = s_k + boxbuf_ref[k - 1]
            if k < n_bands - 1:
                s_k = s_k + boxbuf_ref[k + 1]
            support = jnp.where(band == k, s_k, support)
        keep = valid & (support >= float(min_region))
        out_ref[0] = jnp.where(keep, disp, jnp.float32(invalid))


def speckle_filter_pallas(
    disp: jnp.ndarray,
    invalid: float,
    max_diff: float,
    min_region: int,
    value_range: tuple = (0.0, 64.0),
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded-window speckle filter, one Pallas kernel (B, H, W).

    Bit-identical to ops.speckle.speckle_filter_device (tested in
    interpret mode); requires H divisible by a row-block size > radius.
    Callers should fall back to the jnp version when
    :func:`speckle_block_rows` returns None.
    """
    if min_region <= 0:
        return disp
    b, h, w = disp.shape
    radius = max(2, int(math.ceil(math.sqrt(float(min_region)))))
    rows = speckle_block_rows(h, radius)
    if rows is None:
        raise ValueError(f"no row-block size for H={h}, radius={radius}")
    lo_v, hi_v = float(value_range[0]), float(value_range[1])
    n_bands = max(1, int(math.ceil((hi_v - lo_v) / float(max_diff)))) + 1

    nblk = h // rows
    look_spec = pl.BlockSpec(
        (1, rows, w),
        lambda i, r: (i, jnp.minimum(r, nblk - 1), 0),
        memory_space=pltpu.VMEM,
    )
    emit_spec = pl.BlockSpec(
        (1, rows, w),
        lambda i, r: (i, jnp.maximum(r - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _speckle_kernel,
        n_bands=n_bands,
        radius=radius,
        invalid=float(invalid),
        max_diff=float(max_diff),
        lo_v=lo_v,
        min_region=int(min_region),
        h=h,
    )
    disp32 = disp.astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b, nblk + 1),
        in_specs=[look_spec, emit_spec],
        out_specs=emit_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_bands * 3, rows, w), jnp.float32),
            pltpu.VMEM((n_bands, 1, w), jnp.float32),
            pltpu.VMEM((n_bands, rows, w), jnp.float32),
        ],
        interpret=interpret,
    )(disp32, disp32)


def speckle_block_rows(h: int, radius: int) -> int | None:
    """Row-block size: Mosaic requires the block's sublane dim be a
    multiple of 8 or span the whole array, so pick the largest multiple
    of 8 dividing ``h`` in (radius, 72] (the kernel is grid-step-bound,
    so deeper blocks win until the ring + block buffers near the VMEM
    budget); small frames (h <= 128) run as one full-height block.
    None -> caller uses the jnp fallback."""
    for cand in range(72, radius, -8):
        if cand % 8 == 0 and h % cand == 0:
            return cand
    if radius < h <= 128:
        return h
    return None
