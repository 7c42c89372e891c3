"""Keyframe-guidance (``--guidance-every K``) temporal quality eval.

The depth stage can run its neural guidance on every Kth frame and
reuse the result for the K-1 frames in between
(stages/depth.py depth_batch_pipeline ``guidance_every``): guidance is
a low-frequency prior, per-frame SSI alignment re-anchors its scale on
each frame's confident stereo, and the trust gate hands stale
(disagreeing) pixels back to stereo. That reasoning needs measured
evidence before K>1 can be a documented default: staleness could pulse
(quality dips between keyframes -> flicker) or ghost (stale guidance
dragging moving edges).

This harness renders a TEMPORAL stereo stream with exact per-frame
ground truth (moving textured slabs, analytic disparity; the left eye
is sampled at x - d + max_disp so left pixel x matches right pixel
x - d exactly, same construction as tools/eval_stereo.py), runs the
REAL depth pipeline (depth_batch_pipeline with the bundled CREStereo
checkpoint) at K in {1, 2, 4} plus stereo-only, and reports:

* rmse / bad1    — accuracy against GT over the whole stream;
* flicker        — mean |out[t] - out[t-1]| on GT-static pixels (any
                   keyframe "pulse" shows up here);
* edge_rmse      — error on a dilated band around moving-object edges
                   (stale-guidance ghosting shows up here);
* kphase_spread  — max-min of per-phase rmse, phase = frame index mod
                   K (direct measure of between-keyframe quality dips).

The reference runs its DPT guidance on every frame with no reuse
option (reference depth.py:348).

Usage: python tools/eval_keyframe.py [--ckpt crestereo_ckpt]
       [--frames 24] [--out eval_keyframe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_stereo_stream(rng, T, h, w, max_d):
    """(T, h, w) left/right uint8-range grayscale + (T, h, w) float GT.

    Moving layered-parallax scenes: textured background plane plus 3-5
    textured slabs at distinct disparities, each translating with its
    own velocity. The right view crops a wider texture strip; the left
    view is the exact warp left(x) = strip(x - d(x) + max_d), so GT is
    analytic for any d, discontinuities included.
    """
    import scipy.ndimage as ndi

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    strip_w = w + max_d

    def smooth_tex(sw, scale, lo, hi):
        t = rng.normal(0, 1, (h, sw)).astype(np.float32)
        t = ndi.gaussian_filter(t, scale)
        t -= t.min()
        t /= max(t.max(), 1e-6)
        return lo + t * (hi - lo)

    base = smooth_tex(strip_w, rng.uniform(1.5, 3.0), 30, 225)
    bg_d = float(rng.uniform(2, 10))
    objs = []
    for _ in range(int(rng.integers(3, 6))):
        ph = int(rng.integers(h // 6, h // 2))
        pw = int(rng.integers(w // 8, w // 3))
        objs.append(dict(
            ph=ph, pw=pw,
            y0=float(rng.integers(0, h - ph)),
            x0=float(rng.integers(0, w - pw)),
            d=float(rng.uniform(bg_d + 6, max_d - 4)),
            vx=float(rng.uniform(-2.5, 2.5)),
            vy=float(rng.uniform(-1.0, 1.0)),
            tex=smooth_tex(strip_w, rng.uniform(1.0, 4.0), 20, 235),
        ))
    lefts, rights, gts = [], [], []
    for t in range(T):
        d = np.full((h, strip_w), bg_d, np.float32)
        scene = base.copy()
        for o in sorted(objs, key=lambda o: o["d"]):
            cy = (o["y0"] + o["vy"] * t) % max(h - o["ph"], 1)
            cx = (o["x0"] + o["vx"] * t) % max(strip_w - o["pw"], 1)
            m = (np.abs(yy[:, :1] - cy - o["ph"] / 2) <= o["ph"] / 2)
            mrow = np.abs(np.arange(strip_w, dtype=np.float32)
                          - cx - o["pw"] / 2) <= o["pw"] / 2
            mask = m & mrow[None, :]
            d = np.where(mask, o["d"], d)
            scene = np.where(mask, o["tex"], scene)
        right = scene[:, max_d:]
        dr = d[:, max_d:]
        xs = np.arange(w, dtype=np.float32)[None, :] - dr + max_d
        left = np.stack([
            np.interp(xs[r], np.arange(strip_w, dtype=np.float32), scene[r])
            for r in range(h)
        ])
        lefts.append(np.clip(left, 0, 255))
        rights.append(np.clip(right, 0, 255))
        gts.append(dr)
    return np.stack(lefts), np.stack(rights), np.stack(gts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--max-disparity", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--ckpt", default="crestereo_ckpt")
    ap.add_argument("--out", default="eval_keyframe.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from video3d_tpu.models.crestereo import load_crestereo_guidance
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    params = SGBMParams()
    d_scale = 65535.0 / params.num_disparities
    cre_fn = load_crestereo_guidance(os.path.abspath(args.ckpt))

    T = args.frames
    rng = np.random.default_rng(args.seed)
    configs = [("stereo_only", None), ("K1", 1), ("K2", 2), ("K4", 4)]
    acc = {name: [] for name, _ in configs}

    for s in range(args.scenes):
        lg, rg, gt = render_stereo_stream(rng, T, args.h, args.w,
                                          args.max_disparity)
        # depth_batch_pipeline takes SBS RGB uint8; splice L|R (already
        # full width per eye -> unsqueeze=False keeps geometry exact)
        sbs = np.concatenate([lg, rg], axis=2).astype(np.uint8)
        sbs = np.repeat(sbs[..., None], 3, axis=-1)

        static = np.abs(np.diff(gt, axis=0)) < 1e-6
        gy, gx = np.gradient(gt, axis=(1, 2))
        me = np.hypot(gy, gx) > 1.0
        me = np.stack([ndi.binary_dilation(e, iterations=2) for e in me])

        for name, kev in configs:
            outs = []
            for i in range(0, T, args.batch):
                fb = jnp.asarray(sbs[i:i + args.batch])
                o = depth_batch_pipeline(
                    fb, params, unsqueeze=False,
                    guidance_fn=None if kev is None else cre_fn,
                    guidance_params=(None if kev is None
                                     else cre_fn.params),
                    guidance_every=kev or 1,
                )
                outs.append(np.asarray(o, np.float32))
            out = np.concatenate(outs) / d_scale
            err = np.abs(out - gt)
            tdiff = np.abs(np.diff(out, axis=0))
            k = kev or 1
            phase_rmse = [
                float(np.sqrt((err[p::k] ** 2).mean())) for p in range(k)
            ]
            # PERCEPTUAL phase check (r4 verdict task 7): does the
            # fraction of visibly-wrong pixels (bad1) swing with the
            # frame's phase inside a keyframe group -- overall, and on
            # the moving-object edge band where stale-guidance ghosting
            # would concentrate? kphase_spread (RMSE) can be driven by
            # a few large-error pixels; a bad1 swing is what a viewer
            # would see as pulsing.
            phase_bad1 = [
                float((err[p::k] > 1.0).mean()) for p in range(k)
            ]
            phase_bad1_edge = [
                float((err[p::k][me[p::k]] > 1.0).mean()) for p in range(k)
            ]
            acc[name].append(dict(
                rmse=float(np.sqrt((err ** 2).mean())),
                bad1=float((err > 1.0).mean()),
                flicker=float(tdiff[static].mean()),
                edge_rmse=float(np.sqrt((err[me] ** 2).mean())),
                kphase_spread=float(max(phase_rmse) - min(phase_rmse)),
                kphase_bad1_spread=float(
                    max(phase_bad1) - min(phase_bad1)),
                kphase_bad1_edge_spread=float(
                    max(phase_bad1_edge) - min(phase_bad1_edge)),
            ))

    table = {}
    for name, rows in acc.items():
        table[name] = {
            k: round(float(np.mean([r[k] for r in rows])), 4)
            for k in rows[0]
        }
    print(f"[keyframe] {args.scenes} scenes x {T} frames "
          f"{args.h}x{args.w}, ckpt={args.ckpt}, batch={args.batch}")
    hdr = f"{'config':>12} | {'RMSE':>6} {'bad1':>6} {'flicker':>8} " \
          f"{'edgeRMSE':>9} {'Kspread':>8} {'Kbad1':>7} {'KbadE':>7}"
    print(hdr)
    for name, r in table.items():
        print(f"{name:>12} | {r['rmse']:6.3f} {r['bad1']:6.3f} "
              f"{r['flicker']:8.4f} {r['edge_rmse']:9.3f} "
              f"{r['kphase_spread']:8.4f} {r['kphase_bad1_spread']:7.4f} "
              f"{r['kphase_bad1_edge_spread']:7.4f}")
    # Documented K policy (r4 verdict task 7): keyframe reuse is only a
    # legitimate default while the PERCEPTUAL phase artifact stays
    # small -- kphase_bad1_edge_spread <= 0.05 (<=5 % of moving-edge
    # pixels swinging between good/bad with frame phase) AND bad1
    # within 0.01 of K=1. If a config crosses either bound, drop K to
    # the largest value that passes (K=1 always passes: spread == 0).
    for name, r in table.items():
        if name.startswith("K") and name != "K1":
            r["phase_artifact_ok"] = bool(
                r["kphase_bad1_edge_spread"] <= 0.05
                and r["bad1"] - table["K1"]["bad1"] <= 0.01
            )
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "metrics": table}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
