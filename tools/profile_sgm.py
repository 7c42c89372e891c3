"""Per-stage profile of the SGM depth pipeline on the real chip.

Times each stage of the TPU depth path in isolation (dependency-chained
fori_loop per stage, one checksum readback -- the same methodology as
bench.py: naive block_until_ready through the device relay reports
early, and per-iteration host syncs measure relay RTT, not kernel time).

Emits a JSON table: per-stage ms/frame, the stage's minimum HBM traffic
(bytes moved per frame under perfect reuse), and the implied effective
bandwidth -- so perf gaps are measured, not guessed (round-1 verdict).

Usage: python tools/profile_sgm.py [--h 1080] [--w 1920] [--batch 8]
       [--iters 4] [--out bench_profile.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, n_iters, perturb_idx=0):
    """Median-free single timing of n_iters dependency-chained calls."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(*xs):
        def body(_, carry):
            xs, acc = carry
            out = fn(*xs)
            s = jnp.sum(out.astype(jnp.float32) if out.dtype != jnp.uint16
                        else out.astype(jnp.uint32)).astype(jnp.float32)
            x0 = xs[perturb_idx]
            eps = (s % 2.0).astype(x0.dtype)
            xs = tuple(
                x + eps if i == perturb_idx else x for i, x in enumerate(xs)
            )
            return xs, acc + s

        (_, acc) = lax.fori_loop(0, n_iters, body, (xs, jnp.float32(0.0)))
        return acc

    args = tuple(jax.device_put(a) for a in args)
    float(loop(*args))  # compile + warmup
    rtt = _launch_rtt()
    t0 = time.perf_counter()
    float(loop(*args))
    dt = time.perf_counter() - t0
    if dt < 10 * rtt:
        # launch-dominated measurement (seen when the dev relay degrades
        # to ~40 ms RTT): amplify by dispatching the SAME compiled loop
        # m times -- async launches pipeline on the device, so the RTT
        # is paid once, not m times, and no recompile is needed
        m = min(64, max(2, int(10 * rtt / max(dt - rtt, rtt / 10))))
        t0 = time.perf_counter()
        outs = [loop(*args) for _ in range(m)]
        for o in outs:
            o.block_until_ready()
        total = time.perf_counter() - t0
        return max(total - rtt, total / 20) / m / n_iters
    return max(dt - rtt, dt / 20) / n_iters


_RTT_CACHE = []


def _launch_rtt() -> float:
    """One program-launch + scalar-readback round trip (seconds).

    On this dev host the chip sits behind a relay with a ~35-45 ms RTT;
    without subtracting it every chain_time row is inflated by
    rtt / n_iters (1+ ms/frame at batch 8 / 4 iters), polluting absolute
    ms-per-frame and implied-GB/s numbers."""
    if not _RTT_CACHE:
        import jax
        import jax.numpy as jnp

        nop = jax.jit(lambda: jnp.float32(0.0))
        float(nop())  # compile
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(nop())
            samples.append(time.perf_counter() - t0)
        _RTT_CACHE.append(min(samples))
    return _RTT_CACHE[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="bench_profile.json")
    ap.add_argument("--stages", default="all",
                    help="comma-separated stage names, or 'all'")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video3d_tpu.kernels.costvol import fused_cost_volume
    from video3d_tpu.kernels.sgm import (
        _directional_pass_dmajor,
        _horizontal_passes_wmajor,
        sgm_wta_pallas_dmajor,
    )
    from video3d_tpu.ops.stereo import (
        SGBMParams,
        _speckle,
        sgbm_disparity,
        xsobel_clip,
    )
    from video3d_tpu.stages.depth import depth_batch_pipeline

    p = SGBMParams()
    b, h, w, d = args.batch, args.h, args.w, p.num_disparities
    rng = np.random.default_rng(0)
    gl = rng.uniform(0, 63, (b, h, w)).astype(np.float32)
    gr = rng.uniform(0, 63, (b, h, w)).astype(np.float32)
    frames = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)

    # mirror the production precision choice (ops/stereo.py TPU path)
    import os as _os

    use_i16 = _os.environ.get("VIDEO3D_TPU_SGM_PRECISION", "int16") == "int16"
    cost_dtype = jnp.int16 if use_i16 else jnp.bfloat16
    raw_invalid = 2.0 * p.prefilter_cap if use_i16 else 1e9
    cost = fused_cost_volume(
        gl, gr, d, p.block_size, out_dtype=cost_dtype, raw_invalid=raw_invalid
    )
    cost_t = jnp.swapaxes(cost, 1, 3)
    acc_t = _directional_pass_dmajor(cost_t, None, (0,), p.p1, p.p2, False)
    acc = jnp.swapaxes(acc_t, 1, 3)
    disp = jnp.asarray(rng.uniform(-1, 63, (b, h, w)).astype(np.float32))
    jax.block_until_ready((cost, cost_t, acc_t, acc))

    vol = h * w * d  # elements per frame
    cb = cost.dtype.itemsize  # cost bytes/elem
    ab = acc.dtype.itemsize  # acc bytes/elem

    stages = {
        # name: (fn, args, min HBM bytes moved per frame)
        "xsobel": (lambda x: xsobel_clip(x, p.prefilter_cap), (gl,),
                   2 * h * w * 4),
        "costvol_fused": (
            lambda a, bb: fused_cost_volume(
                a, bb, d, p.block_size, out_dtype=cost_dtype,
                raw_invalid=raw_invalid),
            (gl, gr), 2 * h * w * 4 + vol * cb),
        # production path: raw gray in, x-Sobel prefilter fused into the
        # same sweep (replaces xsobel x2 + costvol_fused + 4 HBM trips)
        "costvol_fused_sobel": (
            lambda a, bb: fused_cost_volume(
                a, bb, d, p.block_size, out_dtype=cost_dtype,
                raw_invalid=raw_invalid, prefilter_cap=p.prefilter_cap),
            (gl, gr), 2 * h * w * 4 + vol * cb),
        "transpose_cost": (lambda c: jnp.swapaxes(c, 1, 3), (cost,),
                           2 * vol * cb),
        "h_fwd_pass": (
            lambda c: _directional_pass_dmajor(c, None, (0,), p.p1, p.p2,
                                               False),
            (cost_t,), vol * cb + vol * ab),
        "h_bwd_pass": (
            lambda c, a: _directional_pass_dmajor(c, a, (0,), p.p1, p.p2,
                                                  True),
            (cost_t, acc_t), vol * cb + 2 * vol * ab),
        "transpose_acc": (lambda a: jnp.swapaxes(a, 1, 3), (acc_t,),
                          2 * vol * ab),
        # A/B: both horizontal sweeps INCLUDING the layout round-trip,
        # legacy (B,W,D,H) route vs W-major (B,D,W,H) route
        "h_passes_legacy": (
            lambda c: jnp.swapaxes(
                _directional_pass_dmajor(
                    jnp.swapaxes(c, 1, 3),
                    _directional_pass_dmajor(
                        jnp.swapaxes(c, 1, 3), None, (0,), p.p1, p.p2,
                        False),
                    (0,), p.p1, p.p2, True),
                1, 3),
            (cost,),
            2 * vol * cb + (vol * cb + vol * ab) + (vol * cb + 2 * vol * ab)
            + 2 * vol * ab),
        "h_passes_wmajor": (
            lambda c: _horizontal_passes_wmajor(c, p.p1, p.p2, acc.dtype),
            (cost,),
            2 * vol * cb + (vol * cb + vol * ab) + (vol * cb + 2 * vol * ab)
            + 2 * vol * ab),
        "v_fwd_pass3": (
            lambda c, a: _directional_pass_dmajor(c, a, (0, 1, -1), p.p1,
                                                  p.p2, False),
            (cost, acc), vol * cb + 2 * vol * ab),
        "sgm_wta_all_passes": (
            lambda c: sgm_wta_pallas_dmajor(c, p), (cost,),
            # cost transpose + hfwd + hbwd + acc transpose + final fused
            # WTA (5-path default; see kernels/sgm.py)
            2 * vol * cb + (vol * cb + vol * ab) + (vol * cb + 2 * vol * ab)
            + 2 * vol * ab + (vol * cb + vol * ab)),
        "sgm_full": (
            lambda a, bb: sgbm_disparity(a, bb, p, apply_speckle=False),
            (gl, gr), None),
        "speckle": (
            lambda x: _speckle(x, p),  # Pallas kernel on TPU, jnp elsewhere
            (disp,), 2 * h * w * 4),
        "pipeline_full": (
            lambda f: depth_batch_pipeline(
                f, params=p, unsqueeze=True, normalize="fixed",
                apply_speckle=True, guidance_fn=None),
            (frames,), None),
    }

    want = None if args.stages == "all" else set(args.stages.split(","))
    results = {}
    for name, (fn, fargs, traffic) in stages.items():
        if want is not None and name not in want:
            continue
        sec = chain_time(fn, fargs, args.iters)
        ms = sec / b * 1e3
        row = {"ms_per_frame": round(ms, 3)}
        if traffic:
            row["min_gb_per_frame"] = round(traffic / 1e9, 3)
            row["implied_gbps"] = round(traffic / 1e9 / (ms / 1e3), 1)
        results[name] = row
        print(name, row, flush=True)

    out = {
        "config": {"h": h, "w": w, "batch": b, "num_disp": d,
                   "cost_dtype": str(cost.dtype), "acc_dtype": str(acc.dtype)},
        "stages": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
