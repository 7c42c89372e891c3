"""Stereo quality eval: SGM vs CREStereo vs hybrid on analytic GT.

Builds a fixed synthetic eval set (spatially-varying disparity warps
with low-texture regions, exact ground truth -- the generator in
video3d_tpu.cli.train_crestereo with held-out seeds), then reports
end-point error and bad-pixel rates overall and on low-texture pixels
(where block matching starves and learned guidance must win -- the
reference's motivation for a neural backend, CREStereo_model.txt:1-2).

Invalid predictions count as bad (D1-style); EPE is over valid pixels.
Low texture = box-averaged x-gradient energy below a threshold.

Usage: python tools/eval_stereo.py [--ckpt crestereo_ckpt] [--scenes 16]
       [--out eval_stereo.json] [--cv2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def low_texture_mask(left_gray: np.ndarray, radius: int = 5,
                     thresh: float = 4.0) -> np.ndarray:
    """Pixels whose windowed mean |x-gradient| is below ``thresh``."""
    import jax.numpy as jnp

    from video3d_tpu.ops.boxsum import box_sum_2d, window_area

    g = np.abs(np.diff(left_gray, axis=-1, prepend=left_gray[..., :1]))
    h, w = g.shape[-2:]
    mean = np.asarray(
        box_sum_2d(jnp.asarray(g), radius) / window_area(h, w, radius)
    )
    return mean < thresh


def metrics(pred: np.ndarray, gt: np.ndarray, invalid: float,
            mask: np.ndarray = None) -> dict:
    sel = np.ones(gt.shape, bool) if mask is None else mask
    n = int(sel.sum())
    valid = (pred != invalid) & sel
    err = np.abs(pred - gt)
    bad1 = float(((err > 1.0) & valid).sum() + (sel & ~valid).sum()) / n
    bad3 = float(((err > 3.0) & valid).sum() + (sel & ~valid).sum()) / n
    epe = float(err[valid].mean()) if valid.any() else float("nan")
    return {
        "epe": round(epe, 3),
        "bad1": round(bad1, 4),
        "bad3": round(bad3, 4),
        "coverage": round(float(valid.sum()) / n, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="CREStereo orbax checkpoint dir (skipped if absent)")
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--max-disparity", type=int, default=32)
    ap.add_argument("--seed", type=int, default=12345)  # held out from training
    ap.add_argument("--out", default="eval_stereo.json")
    ap.add_argument("--cv2", action="store_true",
                    help="Also evaluate OpenCV StereoSGBM")
    args = ap.parse_args()

    import jax.numpy as jnp

    from video3d_tpu.cli.train_crestereo import synthetic_batch
    from video3d_tpu.ops.image import rgb_to_gray
    from video3d_tpu.ops.stereo import SGBMParams, sgbm_disparity

    rng = np.random.default_rng(args.seed)
    left, right, gt, _ = synthetic_batch(
        rng, args.scenes, args.h, args.w, args.max_disparity
    )
    gl = np.asarray(rgb_to_gray(jnp.asarray(left)))
    lowtex = low_texture_mask(gl)
    print(f"eval set: {args.scenes} scenes {args.h}x{args.w}, "
          f"low-texture fraction {lowtex.mean():.2f}")

    params = SGBMParams(num_disparities=args.max_disparity)
    invalid = float(params.min_disparity - 1)
    preds = {}

    gr = rgb_to_gray(jnp.asarray(right))
    sgm_j, conf_j = sgbm_disparity(
        jnp.asarray(gl), gr, params, apply_speckle=True, return_margin=True
    )
    preds["sgm"] = np.asarray(sgm_j)

    if args.ckpt and os.path.isdir(args.ckpt):
        from video3d_tpu.models.crestereo import load_crestereo_guidance

        cre_fn = load_crestereo_guidance(os.path.abspath(args.ckpt))
        cre = np.asarray(cre_fn(jnp.asarray(left), jnp.asarray(right)))
        preds["crestereo"] = cre
        sgm = preds["sgm"]
        # reference blend contract (0.7 stereo + 0.3 guidance,
        # depth.py:363); guidance fills SGM holes entirely
        preds["hybrid_fixed"] = np.where(
            sgm != invalid, 0.7 * sgm + 0.3 * cre, cre
        )
        # shipped default: confidence-weighted blend (stages/depth.py
        # blend='confidence' -- texture-gated uniqueness margin)
        conf = np.where(sgm != invalid, np.asarray(conf_j), 0.0)
        preds["hybrid_conf"] = conf * np.maximum(sgm, 0.0) + (1 - conf) * cre
    else:
        print("no CREStereo checkpoint -- evaluating SGM only")

    if args.cv2:
        try:
            import cv2

            matcher = cv2.StereoSGBM_create(
                minDisparity=0, numDisparities=args.max_disparity,
                blockSize=params.block_size, P1=int(params.p1),
                P2=int(params.p2),
                disp12MaxDiff=params.disp12_max_diff,
                uniquenessRatio=params.uniqueness_ratio,
                speckleWindowSize=params.speckle_window_size,
                speckleRange=params.speckle_range,
            )
            outs = []
            for i in range(args.scenes):
                d = matcher.compute(
                    gl[i].astype(np.uint8), np.asarray(gr)[i].astype(np.uint8)
                ).astype(np.float32) / 16.0
                outs.append(np.where(d < 0, invalid, d))
            preds["cv2_sgbm"] = np.stack(outs)
        except Exception as e:
            print(f"cv2 eval skipped: {e}")

    table = {}
    for name, pred in preds.items():
        table[name] = {
            "all": metrics(pred, gt, invalid),
            "low_texture": metrics(pred, gt, invalid, lowtex),
        }

    print(f"\n{'method':>10} | {'EPE':>6} {'bad1':>7} {'bad3':>7} {'cov':>6}"
          f" | low-tex: {'EPE':>6} {'bad1':>7} {'bad3':>7}")
    for name, m in table.items():
        a, lt = m["all"], m["low_texture"]
        print(f"{name:>10} | {a['epe']:6.2f} {a['bad1']:7.3f} "
              f"{a['bad3']:7.3f} {a['coverage']:6.2f} |          "
              f"{lt['epe']:6.2f} {lt['bad1']:7.3f} {lt['bad3']:7.3f}")

    result = {
        "config": {
            "scenes": args.scenes, "h": args.h, "w": args.w,
            "max_disparity": args.max_disparity, "seed": args.seed,
            "low_texture_fraction": round(float(lowtex.mean()), 3),
        },
        "metrics": table,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
