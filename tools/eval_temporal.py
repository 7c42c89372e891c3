"""Temporal-smoothing quality eval: none vs median-of-3 vs flow-EMA.

The reference has no temporal filtering (its depth flickers frame to
frame; readme.md:17 leaves the stereo advantage unused). This harness
quantifies the repo's two smoothers on a synthetic moving scene with
exact per-frame ground truth: a textured background plus albedo slabs
translating at different velocities, a hard scene CUT mid-stream, and
a noisy "measured" depth stream (Gaussian + salt outliers, the failure
modes speckle filtering leaves behind).

Reported per method, in disparity units:
* rmse        — accuracy against GT over the whole stream;
* flicker     — mean |out[t] - out[t-1]| on pixels that are STATIC in
                GT (the visible shimmer DIBR consumers care about);
* edge_rmse   — error on a dilated band around moving-object edges
                (where naive smoothing smears);
* postcut_rmse— error on the 2 frames after the cut (median drags the
                old scene in; flow-EMA's photometric gate should reset).

Usage: python tools/eval_temporal.py [--frames 32] [--out eval_temporal.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_stream(rng, T, h, w, max_d, cut_at):
    """Moving slab scene; returns (img (T,h,w), gt (T,h,w))."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def layout():
        objs = []
        for _ in range(int(rng.integers(3, 5))):
            objs.append(dict(
                ph=int(rng.integers(h // 6, h // 2)),
                pw=int(rng.integers(w // 8, w // 3)),
                y0=float(rng.integers(0, h)),
                x0=float(rng.integers(0, w)),
                d=float(rng.uniform(10, max_d - 2)),
                alb=float(rng.uniform(20, 235)),
                vx=float(rng.uniform(-2.5, 2.5)),
                vy=float(rng.uniform(-0.8, 0.8)),
                ellipse=bool(rng.random() < 0.5),
            ))
        bg_d = float(rng.uniform(2, 8))
        bg_alb = float(rng.uniform(40, 120))
        tex = rng.normal(0, 6, (h, w)).astype(np.float32)
        return objs, bg_d, bg_alb, tex

    objs, bg_d, bg_alb, tex = layout()
    imgs, gts = [], []
    for t in range(T):
        if t == cut_at:  # hard scene cut
            objs, bg_d, bg_alb, tex = layout()
        d = np.full((h, w), bg_d, np.float32)
        img = np.full((h, w), bg_alb, np.float32) + tex
        for o in sorted(objs, key=lambda o: o["d"]):
            cy = (o["y0"] + o["vy"] * (t % cut_at if cut_at else t)) % h
            cx = (o["x0"] + o["vx"] * (t % cut_at if cut_at else t)) % w
            if o["ellipse"]:
                m = (((yy - cy) / (o["ph"] / 2)) ** 2
                     + ((xx - cx) / (o["pw"] / 2)) ** 2) <= 1
            else:
                m = (np.abs(yy - cy) <= o["ph"] / 2) \
                    & (np.abs(xx - cx) <= o["pw"] / 2)
            d = np.where(m, o["d"], d)
            img = np.where(m, o["alb"] + tex, img)
        imgs.append(np.clip(img, 0, 255).astype(np.float32))
        gts.append(d)
    return np.stack(imgs), np.stack(gts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--max-disparity", type=int, default=64)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--outlier-frac", type=float, default=0.01)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="eval_temporal.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from video3d_tpu.ops.image import resize2d
    from video3d_tpu.parallel.temporal import (
        TemporalFlowEMAStream,
        TemporalMedianStream,
    )

    T, h, w = args.frames, args.h, args.w
    cut_at = T // 2
    rng = np.random.default_rng(args.seed)
    imgs, gt = render_stream(rng, T, h, w, args.max_disparity, cut_at)

    noisy = gt + rng.normal(0, args.noise, gt.shape)
    salt = rng.uniform(size=gt.shape) < args.outlier_frac
    noisy = np.where(salt, noisy + rng.choice([-8.0, 8.0], gt.shape),
                     noisy).astype(np.float32)
    d_scale = 65535.0 / args.max_disparity
    noisy16 = np.clip(noisy * d_scale, 0, 65535).astype(np.uint16)
    from video3d_tpu.ops.flow import FlowEMAParams

    guides = {
        4: np.asarray(
            resize2d(jnp.asarray(imgs), h // 4, w // 4, method="bilinear")),
        2: np.asarray(
            resize2d(jnp.asarray(imgs), h // 2, w // 2, method="bilinear")),
    }

    def run_stream(kind):
        if kind == "none":
            return noisy16.astype(np.float32)
        med = TemporalMedianStream() if kind == "median" else None
        ema = None
        if kind == "flow":
            ema, guide = TemporalFlowEMAStream(), guides[4]
        elif kind == "flow-fine":  # half-res flow, one extra level
            ema = TemporalFlowEMAStream(FlowEMAParams(levels=4))
            guide = guides[2]
        elif kind == "flow-nogate":  # ablation: depth-residual gate off
            ema = TemporalFlowEMAStream(
                FlowEMAParams(levels=4, d_gate_gain=0.0))
            guide = guides[2]
        outs = []
        for i in range(0, T, args.batch):
            db = noisy16[i:i + args.batch]
            if med is not None:
                o = med.push(db)
            else:
                o = ema.push(db, guide[i:i + args.batch])
            if o is not None:
                outs.append(np.asarray(o, np.float32))
        if med is not None:
            o = med.flush()
            if o is not None:
                outs.append(np.asarray(o, np.float32))
        return np.concatenate(outs, axis=0)

    # masks
    static = np.abs(np.diff(gt, axis=0)) < 1e-6  # (T-1, h, w)
    gy, gx = np.gradient(gt, axis=(1, 2))
    moving_edges = np.hypot(gy, gx) > 1.0
    moving_edges = np.stack(
        [ndi.binary_dilation(e, iterations=2) for e in moving_edges])

    table = {}
    for kind in ("none", "median", "flow", "flow-fine", "flow-nogate"):
        out = run_stream(kind) / d_scale
        assert out.shape[0] == T, (kind, out.shape)
        err = np.abs(out - gt)
        tdiff = np.abs(np.diff(out, axis=0))
        postcut = err[cut_at:cut_at + 2]
        table[kind] = {
            "rmse": round(float(np.sqrt((err ** 2).mean())), 4),
            "flicker": round(float(tdiff[static].mean()), 4),
            "edge_rmse": round(
                float(np.sqrt((err[moving_edges] ** 2).mean())), 4),
            "postcut_rmse": round(float(np.sqrt((postcut ** 2).mean())), 4),
        }
    print(f"[temporal] {T} frames {h}x{w}, noise sigma {args.noise} + "
          f"{args.outlier_frac:.0%} outliers, cut @ {cut_at}")
    print(f"{'method':>8} | {'RMSE':>6} {'flicker':>8} {'edgeRMSE':>9} "
          f"{'postcut':>8}")
    for kind, r in table.items():
        print(f"{kind:>8} | {r['rmse']:6.3f} {r['flicker']:8.4f} "
              f"{r['edge_rmse']:9.3f} {r['postcut_rmse']:8.3f}")

    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "metrics": table}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
