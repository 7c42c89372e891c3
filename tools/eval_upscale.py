"""Upscale-stage quality eval: guided filter vs plain resize on GT.

The reference upscales depth with a plain ffmpeg ``scale`` filter
(reference upscale.py:47-63); this repo's default is a guided filter
conditioned on the 4K RGB frame (ops/guided.py). This harness
quantifies that choice on analytic ground truth: the perceptual-cue
renderer (cli/train_mono.py) produces a high-resolution image + exact
disparity; the disparity is downsampled to simulate the depth stage's
working resolution and upsampled back by each method against the
high-res image as guide.  Metrics are reported overall and on a
depth-EDGE band (dilated GT gradient mask) — the region where plain
interpolation smears across object boundaries and guided filtering is
supposed to win.

Usage: python tools/eval_upscale.py [--scenes 8] [--scale 4]
       [--out eval_upscale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--max-disparity", type=int, default=64)
    ap.add_argument("--radius", type=int, default=None,
                    help="guided-filter radius AT DEPTH RESOLUTION. The "
                         "window is solved on the low-res depth grid, so "
                         "the production default (8 at 1080p depth) "
                         "corresponds to radius ~= 8 * depth_h / 1080 "
                         "here; default scales accordingly (min 1)")
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=20240818)
    ap.add_argument("--out", default="eval_upscale.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from video3d_tpu.cli.train_mono import mono_cue_batch
    from video3d_tpu.ops.guided import (
        adaptive_upsample,
        guided_upsample,
        plain_upsample,
    )
    from video3d_tpu.ops.image import resize2d

    depth_h = args.h // args.scale
    radius = args.radius or max(1, round(8 * depth_h / 1080))
    d_scale = 65535.0 / args.max_disparity

    def slab_batch(rng):
        """Albedo-boundary scenes: piecewise-planar depth whose slabs
        have DISTINCT albedo (real objects differ in reflectance) plus
        mild surface texture — the regime edge-guided upsampling is
        designed for, complementing the cue renderer where foreground
        and ground share a texture tile (camouflage: boundaries carry
        texture change but little mean contrast)."""
        yy, xx = np.mgrid[0:args.h, 0:args.w].astype(np.float32)
        imgs, gts = [], []
        for _ in range(args.scenes):
            d = np.full((args.h, args.w),
                        float(rng.uniform(2, 10)), np.float32)
            img = np.full_like(d, float(rng.uniform(40, 120)))
            for _ in range(int(rng.integers(3, 7))):
                ph = int(rng.integers(args.h // 6, args.h // 2))
                pw = int(rng.integers(args.w // 8, args.w // 2))
                y0 = int(rng.integers(0, args.h - ph))
                x0 = int(rng.integers(0, args.w - pw))
                d_s = float(rng.uniform(8, args.max_disparity - 2))
                if rng.random() < 0.5:
                    cy, cx = y0 + ph / 2, x0 + pw / 2
                    m = (((yy - cy) / (ph / 2)) ** 2
                         + ((xx - cx) / (pw / 2)) ** 2) <= 1
                else:
                    m = np.zeros_like(d, bool)
                    m[y0:y0 + ph, x0:x0 + pw] = True
                d = np.where(m, d_s, d)
                img = np.where(m, float(rng.uniform(20, 235)), img)
            img = img + rng.normal(0, rng.uniform(3, 10), img.shape)
            imgs.append(np.clip(img, 0, 255).astype(np.float32))
            gts.append(d)
        rgb = np.repeat(np.stack(imgs)[..., None], 3, axis=-1)
        return rgb, np.stack(gts)

    result = {}
    for cond, kw in (
        ("albedo_slabs", None),  # guided's design case
        ("camouflage_crisp", dict(p_defocus=0.0, p_haze=0.0)),
        ("camouflage_soft", {}),  # default cue probabilities
    ):
        rng = np.random.default_rng(args.seed)
        if kw is None:
            left, gt = slab_batch(rng)
        else:
            left, _, gt, _ = mono_cue_batch(
                rng, args.scenes, args.h, args.w, args.max_disparity,
                **kw)
        gt16 = jnp.asarray(gt * d_scale)  # uint16-scale GT, full res
        lo = resize2d(gt16, depth_h, args.w // args.scale,
                      method="bilinear")  # depth at working resolution
        guide = jnp.asarray(left)  # (B, H, W, 3) the "4K" RGB source

        ups = {
            "plain_bilinear": plain_upsample(lo, args.h, args.w),
            "guided_gray": guided_upsample(lo, guide, args.h, args.w,
                                           radius=radius, eps=args.eps,
                                           guide_mode="gray"),
            "guided_color": guided_upsample(lo, guide, args.h, args.w,
                                            radius=radius, eps=args.eps,
                                            guide_mode="color"),
            "adaptive": adaptive_upsample(lo, guide, args.h, args.w,
                                          radius=radius, eps=args.eps),
        }

        # depth-edge band: dilated GT gradient mask (where interpolation
        # smears across boundaries)
        gy, gx = np.gradient(gt, axis=(1, 2))
        edges = (np.hypot(gy, gx) > 1.0)
        edges = np.stack(
            [ndi.binary_dilation(e, iterations=3) for e in edges])

        table = {}
        for name, up in ups.items():
            err = np.abs(np.asarray(up) / d_scale - gt)  # disparity px
            table[name] = {
                "rmse": round(float(np.sqrt((err ** 2).mean())), 4),
                "bad1": round(float((err > 1.0).mean()), 4),
                "edge_rmse": round(
                    float(np.sqrt((err[edges] ** 2).mean())), 4),
                "edge_bad1": round(float((err[edges] > 1.0).mean()), 4),
            }
        result[cond] = table
        print(f"\n[upscale/{cond}] {args.scenes} scenes "
              f"{args.h}x{args.w}, x{args.scale} restore, radius "
              f"{radius} @ depth res, edge band {edges.mean():.1%}")
        print(f"{'method':>16} | {'RMSE':>6} {'bad1':>7} | edge: "
              f"{'RMSE':>6} {'bad1':>7}")
        for name, r in table.items():
            print(f"{name:>16} | {r['rmse']:6.3f} {r['bad1']:7.4f} "
                  f"|       {r['edge_rmse']:6.3f} {r['edge_bad1']:7.4f}")

    with open(args.out, "w") as f:
        json.dump({"config": {**vars(args), "radius_used": radius},
                   "metrics": result}, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
