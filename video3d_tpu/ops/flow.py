"""Dense optical flow + flow-guided temporal depth smoothing.

The reference saves depth per frame with no temporal filtering — its own
README lists temporal consistency as an unexploited advantage
(/root/reference/readme.md:17). The median-of-3 in
:mod:`video3d_tpu.parallel.temporal` fixes isolated flicker but blurs
across motion; this module adds the stronger filter: a causal
exponential moving average carried ALONG the motion field, so static
regions integrate over many frames while moving content is warped into
alignment first and scene cuts / occlusions fall back to the current
frame via a photometric-residual gate.

TPU-first construction:

* coarse-to-fine block matching over a resize-matmul pyramid — every
  candidate displacement is a STATIC edge-replicated shift, costs are
  windowed SADs via integral-image box sums (:mod:`ops.boxsum`), and the
  sub-pixel refinement is a softargmin over the (2s+1)^2 candidate grid:
  no gathers anywhere in the estimation loop;
* the only gathers in the whole filter are the two bilinear warps
  (previous smoothed depth + previous guide), which genuinely need
  spatially-varying sampling; they are one `map_coordinates` each per
  frame, on (H, W) planes;
* the per-frame recurrence runs as `lax.scan` over the batch's time
  axis inside one jitted program; the carry crosses batch boundaries on
  device (no host round-trip between batches).

Flow convention: ``flow`` maps CURRENT-frame pixel x to its source in
the PREVIOUS frame, i.e. ``cur(x) ~= prev(x + flow(x))`` (backward
flow, the form a backward warp consumes directly).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from video3d_tpu.ops.boxsum import box_sum_2d, window_area


def shift_edge(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[..., y, x] = img[..., y+dy, x+dx], edge-replicated (static)."""
    # A shift past the axis length is all edge rows/cols: clamp so the
    # slice+repeat construction below keeps the output shape (happens at
    # the coarsest pyramid levels of tiny guides, where warp_r > h).
    dy = max(-img.shape[-2], min(dy, img.shape[-2]))
    dx = max(-img.shape[-1], min(dx, img.shape[-1]))
    if dy:
        if dy > 0:
            img = jnp.concatenate(
                [img[..., dy:, :], jnp.repeat(img[..., -1:, :], dy, axis=-2)],
                axis=-2,
            )
        else:
            img = jnp.concatenate(
                [jnp.repeat(img[..., :1, :], -dy, axis=-2), img[..., :dy, :]],
                axis=-2,
            )
    if dx:
        if dx > 0:
            img = jnp.concatenate(
                [img[..., :, dx:], jnp.repeat(img[..., :, -1:], dx, axis=-1)],
                axis=-1,
            )
        else:
            img = jnp.concatenate(
                [jnp.repeat(img[..., :, :1], -dx, axis=-1), img[..., :, :dx]],
                axis=-1,
            )
    return img


def warp_bilinear(img: jnp.ndarray, flow_y: jnp.ndarray,
                  flow_x: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp (H, W) ``img`` by flow: out(x) = img(x + flow(x)).

    Bilinear, border-clamped, via ``map_coordinates`` (gather). On TPU a
    2 MPix gather costs ~40 ms — use only at small sizes (the pyramid
    levels inside :func:`estimate_flow`); production warps go through
    :func:`warp_bilinear_shifts`.
    """
    h, w = img.shape[-2], img.shape[-1]
    yy, xx = jnp.mgrid[0:h, 0:w]
    coords = [yy + flow_y, xx + flow_x]
    return jax.scipy.ndimage.map_coordinates(img, coords, order=1,
                                             mode="nearest")


def _warp_axis_shifts(img: jnp.ndarray, f: jnp.ndarray, r: int,
                      axis_y: bool) -> jnp.ndarray:
    """1-D linear resample along one axis via static shifts.

    out = sum_k relu(1 - |f - k|) * shift(img, k) for k in [-r, r]: the
    hat weights select the two bilinear taps around the fractional
    offset, every shift is static (edge-replicated), and no gathers are
    emitted. ``f`` must already be clamped to [-r, r].
    """
    acc = jnp.zeros_like(img)
    for k in range(-r, r + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(f - k))
        acc = acc + w * (shift_edge(img, k, 0) if axis_y
                         else shift_edge(img, 0, k))
    return acc


def warp_bilinear_shifts(img: jnp.ndarray, flow_y: jnp.ndarray,
                         flow_x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Gather-free backward warp, flow clamped to [-r, r] px per axis.

    Separable: vertical linear resample by ``flow_y`` then horizontal by
    ``flow_x`` (exact for bilinear when the flow field is constant; for
    the smooth upsampled fields used here the separation error is
    negligible). Callers clamp flow with the SAME r they pass here so
    downstream residual gates see exactly the warp that was applied.

    On TPU this routes through the Pallas kernels (kernels/warp.py):
    the XLA shift-stack materializes 2*(2r+1) full-size intermediates in
    HBM, the kernels read each plane once. Elsewhere (and for shapes
    with no Mosaic-legal tiling) the XLA formulation runs; both are
    numerically identical.
    """
    if jax.default_backend() == "tpu" and img.ndim == 2:
        try:
            from video3d_tpu.kernels.warp import warp_bilinear_shifts_pallas

            return warp_bilinear_shifts_pallas(img, flow_y, flow_x, r)
        except ValueError:
            pass  # no legal tiling for this shape: XLA fallback
    fy = jnp.clip(flow_y, -r, r)
    fx = jnp.clip(flow_x, -r, r)
    return _warp_axis_shifts(_warp_axis_shifts(img, fy, r, True), fx, r,
                             False)


def _flow_level(cur: jnp.ndarray, prev: jnp.ndarray, fy: jnp.ndarray,
                fx: jnp.ndarray, search: int, radius: int,
                tau: float) -> tuple:
    """One refinement at one pyramid level: SAD over the static candidate
    grid around the warped previous frame, softargmin sub-pixel update."""
    h, w = cur.shape
    prev_w = warp_bilinear(prev, fy, fx)
    area = window_area(h, w, radius)
    costs = []
    offs = []
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            cand = shift_edge(prev_w, dy, dx)
            costs.append(box_sum_2d(jnp.abs(cur - cand), radius) / area)
            offs.append((dy, dx))
    c = jnp.stack(costs, axis=0)  # (K, h, w) mean abs diff per window
    cmin = jnp.min(c, axis=0, keepdims=True)
    wgt = jax.nn.softmax(-(c - cmin) / tau, axis=0)
    dys = jnp.asarray([o[0] for o in offs], jnp.float32)[:, None, None]
    dxs = jnp.asarray([o[1] for o in offs], jnp.float32)[:, None, None]
    ry = jnp.sum(wgt * dys, axis=0)
    rx = jnp.sum(wgt * dxs, axis=0)
    # smooth the residual so flat regions inherit their neighborhood
    sr = 2
    sarea = window_area(h, w, sr)
    ry = box_sum_2d(ry, sr) / sarea
    rx = box_sum_2d(rx, sr) / sarea
    return fy + ry, fx + rx


def _resize_bl(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    from video3d_tpu.ops.image import resize2d

    return resize2d(img, h, w, method="bilinear")


def _flow_level_fast(cur: jnp.ndarray, prev: jnp.ndarray, fy: jnp.ndarray,
                     fx: jnp.ndarray, search: int, radius: int, tau: float,
                     warp_r: int, use_pallas: bool,
                     interpret: bool = False) -> tuple:
    """One refinement level, gather-free: the warp is the bounded shift
    stack (flow clamped to ±warp_r) instead of an unbounded gather.

    ``use_pallas`` routes the warp through kernels/warp.py and the
    match+softargmin+smooth through kernels/flowmatch.py (one fused
    kernel, zero HBM intermediates); otherwise the same math runs as
    XLA ops (CPU tests, odd shapes). Both routes are numerically
    equivalent up to f32 association order.
    """
    fy = jnp.clip(fy, -warp_r, warp_r)
    fx = jnp.clip(fx, -warp_r, warp_r)
    prev_w = warp_bilinear_shifts(prev, fy, fx, warp_r)
    if use_pallas:
        from video3d_tpu.kernels.flowmatch import flow_match_pallas

        return flow_match_pallas(cur, prev_w, fy, fx, search=search,
                                 radius=radius, tau=tau,
                                 interpret=interpret)
    h, w = cur.shape
    area = window_area(h, w, radius)
    costs = []
    offs = []
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            cand = shift_edge(prev_w, dy, dx)
            costs.append(box_sum_2d(jnp.abs(cur - cand), radius) / area)
            offs.append((dy, dx))
    c = jnp.stack(costs, axis=0)
    cmin = jnp.min(c, axis=0, keepdims=True)
    wgt = jax.nn.softmax(-(c - cmin) / tau, axis=0)
    dys = jnp.asarray([o[0] for o in offs], jnp.float32)[:, None, None]
    dxs = jnp.asarray([o[1] for o in offs], jnp.float32)[:, None, None]
    ry = jnp.sum(wgt * dys, axis=0)
    rx = jnp.sum(wgt * dxs, axis=0)
    sarea = window_area(h, w, 2)
    ry = box_sum_2d(ry, 2) / sarea
    rx = box_sum_2d(rx, 2) / sarea
    return fy + ry, fx + rx


def estimate_flow_fast(cur: jnp.ndarray, prev: jnp.ndarray,
                       max_flow: int, levels: int = 3, search: int = 2,
                       radius: int = 3, tau: float = 2.0,
                       use_pallas: bool | None = None,
                       interpret: bool = False) -> tuple:
    """Gather-free :func:`estimate_flow` for flow fields the caller will
    clamp to ±``max_flow`` px anyway (the flow-EMA contract).

    Identical coarse-to-fine structure, but each level's incoming flow
    is clamped to the level-scaled bound r_lvl = ceil(max_flow / 2^lvl)
    + search and the per-level warp is the bounded shift stack — so the
    whole estimator runs without a single gather and every level lowers
    to two fused Pallas kernels on TPU. Motion beyond ±max_flow
    saturates instead of being tracked; the flow-EMA residual gate then
    degrades those pixels to passthrough, which is the same motion-
    masking contract the filter already documents.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    h, w = cur.shape[-2], cur.shape[-1]
    sizes = [(h, w)]
    for _ in range(levels - 1):
        ph, pw = sizes[-1]
        sizes.append((max(2, -(-ph // 2)), max(2, -(-pw // 2))))
    pyr = [(cur, prev)]
    for ph, pw in sizes[1:]:
        c, p = pyr[-1]
        pyr.append((_resize_bl(c, ph, pw), _resize_bl(p, ph, pw)))

    ph, pw = sizes[-1]
    fy = jnp.zeros((ph, pw), jnp.float32)
    fx = jnp.zeros((ph, pw), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        c, p = pyr[lvl]
        lh, lw = sizes[lvl]
        if lvl < levels - 1:
            sy = lh / sizes[lvl + 1][0]
            sx = lw / sizes[lvl + 1][1]
            fy = _resize_bl(fy, lh, lw) * sy
            fx = _resize_bl(fx, lh, lw) * sx
        r_lvl = -(-int(max_flow) // (2 ** lvl)) + search
        iters = 2 if lvl == levels - 1 else 1
        for _ in range(iters):
            fy, fx = _flow_level_fast(c, p, fy, fx, search, radius, tau,
                                      r_lvl, use_pallas, interpret)
    return fy, fx


def estimate_flow(cur: jnp.ndarray, prev: jnp.ndarray, levels: int = 3,
                  search: int = 2, radius: int = 3,
                  tau: float = 2.0) -> tuple:
    """Dense backward flow cur->prev for (H, W) grayscale in [0, 255].

    Coarse-to-fine over ``levels`` octaves; per level the displacement is
    refined by softargmin block matching over a (2*search+1)^2 static
    candidate grid (one extra refinement at the coarsest level to settle
    large motion). Captures ~search * (2^levels + ... + 1) px of motion.
    Returns (flow_y, flow_x) float32 at the input resolution.
    """
    h, w = cur.shape[-2], cur.shape[-1]
    sizes = [(h, w)]
    for _ in range(levels - 1):
        ph, pw = sizes[-1]
        sizes.append((max(2, -(-ph // 2)), max(2, -(-pw // 2))))
    pyr = [(cur, prev)]
    for ph, pw in sizes[1:]:
        c, p = pyr[-1]
        pyr.append((_resize_bl(c, ph, pw), _resize_bl(p, ph, pw)))

    ph, pw = sizes[-1]
    fy = jnp.zeros((ph, pw), jnp.float32)
    fx = jnp.zeros((ph, pw), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        c, p = pyr[lvl]
        lh, lw = sizes[lvl]
        if lvl < levels - 1:
            sy = lh / sizes[lvl + 1][0]
            sx = lw / sizes[lvl + 1][1]
            fy = _resize_bl(fy, lh, lw) * sy
            fx = _resize_bl(fx, lh, lw) * sx
        iters = 2 if lvl == levels - 1 else 1
        for _ in range(iters):
            fy, fx = _flow_level(c, p, fy, fx, search, radius, tau)
    return fy, fx


class FlowEMAParams(NamedTuple):
    """Flow-EMA smoothing knobs (all static under jit).

    ``alpha_min``: weight of the current frame where the warp residual is
    zero (1 - alpha_min is the temporal integration strength).
    ``gain``: residual (mean abs intensity diff, 0-255 scale) to alpha
    slope; at residual >= (1-alpha_min)/gain the filter passes the
    current frame through (scene cut / occlusion).
    ``max_warp``: full-resolution flow clamp in px/frame for the
    gather-free warp; faster motion loses temporal smoothing via the
    residual gate — intentional, since motion masking hides flicker on
    fast-moving content anyway.
    ``d_gate_t0``/``d_gate_gain``: the DEPTH-residual gate. The
    photometric gate above runs at guide resolution and cannot see
    sub-guide-pixel misalignment, which is exactly what smears moving
    depth edges (round-3 eval: flow edge_rmse 3.27 vs 1.24 unfiltered).
    This gate compares the warped previous *depth* against the current
    frame at FULL resolution: where the box-filtered |cur - warp(prev)|
    exceeds ``d_gate_t0``x its frame mean, alpha ramps to passthrough at
    slope ``d_gate_gain``. The frame-mean normalization makes it
    scale-free (works on uint16-scaled or raw disparity) and adaptive:
    global warp error raises the bar, so only locally-coherent
    disagreement (edges, occlusions) fires. Isolated salt outliers are
    diluted by the box filter and keep their temporal smoothing.
    Measured (tools/eval_temporal.py, 9 seed x noise conditions): edge
    RMSE improves in all 9 (e.g. 2.14 -> 1.11 at the default condition,
    beating unfiltered 1.24 and median 2.01) with flicker and post-cut
    error unchanged or better. ``d_gate_gain=0`` disables.
    """

    alpha_min: float = 0.35
    gain: float = 0.08
    levels: int = 3
    search: int = 2
    max_warp: int = 16
    d_gate_t0: float = 1.0
    d_gate_gain: float = 1.0


def _ema_step(p: FlowEMAParams, carry, x):
    prev_out, prev_g = carry  # (H, W) f32 depth, (hq, wq) f32 guide
    depth, g = x
    hq, wq = g.shape
    h, w = depth.shape
    sy, sx = h / hq, w / wq
    # clamp the flow at GUIDE scale to what the full-res warp can apply,
    # so the photometric residual gates on the warp actually used
    rq = max(1, int(round(p.max_warp / max(sy, sx))))
    fy, fx = estimate_flow_fast(g, prev_g, max_flow=rq, levels=p.levels,
                                search=p.search)
    fy = jnp.clip(fy, -rq, rq)
    fx = jnp.clip(fx, -rq, rq)
    prev_g_w = warp_bilinear_shifts(prev_g, fy, fx, rq)
    resid = box_sum_2d(jnp.abs(g - prev_g_w), 2) / window_area(hq, wq, 2)
    alpha_q = jnp.clip(p.alpha_min + p.gain * resid, p.alpha_min, 1.0)

    fy_f = _resize_bl(fy, h, w) * sy
    fx_f = _resize_bl(fx, h, w) * sx
    alpha = _resize_bl(alpha_q, h, w)
    prev_warp = warp_bilinear_shifts(prev_out, fy_f, fx_f, p.max_warp)
    if p.d_gate_gain > 0.0:
        # depth-residual gate (see FlowEMAParams): full-res, scale-free
        rd = box_sum_2d(jnp.abs(depth - prev_warp), 2) / window_area(h, w, 2)
        a_d = jnp.clip((rd / (jnp.mean(rd) + 1e-6) - p.d_gate_t0)
                       * p.d_gate_gain, 0.0, 1.0)
        alpha = jnp.maximum(alpha, a_d)
    out = alpha * depth + (1.0 - alpha) * prev_warp
    return (out, g), out


@partial(jax.jit, static_argnames=("params",))
def flow_ema_scan(carry, depth: jnp.ndarray, guide: jnp.ndarray,
                  params: FlowEMAParams = FlowEMAParams()):
    """Run the causal flow-EMA over a (T, H, W) depth batch.

    ``guide``: (T, hq, wq) float32 grayscale of the SAME frames at
    reduced (flow) resolution. ``carry`` is the tuple returned by the
    previous call (frame -1's smoothed depth + guide); the stream head
    is handled by :class:`video3d_tpu.parallel.temporal.TemporalFlowEMAStream`,
    which emits frame 0 unfiltered and seeds the carry from it.
    Returns (new_carry, (T, H, W) float32 filtered).
    """
    depth = depth.astype(jnp.float32)
    guide = guide.astype(jnp.float32)
    if carry is None:
        carry = (depth[0], guide[0])
    return jax.lax.scan(partial(_ema_step, params), carry, (depth, guide))
