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


def ood_batch(rng: np.random.Generator, batch: int, h: int, w: int,
              max_disp: int):
    """Out-of-distribution eval scenes: DISJOINT from the training
    generator (train_crestereo.synthetic_batch) in both texture and
    geometry statistics.

    Textures are gratings / checkerboards / flat cartoon rectangles /
    blocky nearest-zoom noise / ramps-with-dots -- none of which the
    Gaussian-smoothed-noise training distribution contains. Disparity is
    PIECEWISE-PLANAR: a slanted background plane plus 2-4 foreground
    rectangles at distinct slanted planes, with sharp discontinuities
    (training fields are C1-smooth spline warps). Ground truth stays
    exact: right eye is a crisp crop of the scene, left eye is sampled
    at x - d(y,x) + max_disp, so left pixel x matches right pixel x - d
    for ANY field d, discontinuous included.
    """
    import scipy.ndimage as ndi

    ws = w + max_disp
    yy, xx = np.mgrid[0:h, 0:ws].astype(np.float32)

    def texture(kind):
        if kind == 0:  # sinusoidal grating, random angle/frequency
            f = rng.uniform(0.02, 0.15)
            th = rng.uniform(0, np.pi)
            ph = rng.uniform(0, 2 * np.pi)
            g = np.sin(2 * np.pi * f * (np.cos(th) * xx + np.sin(th) * yy) + ph)
            return (127.5 + rng.uniform(60, 120) / 2 * g).astype(np.float32)
        if kind == 1:  # checkerboard + mild noise
            c = int(rng.integers(4, 17))
            g = (((yy // c) + (xx // c)) % 2) * rng.uniform(90, 180) + 40
            return (g + rng.normal(0, 4, g.shape)).astype(np.float32)
        if kind == 2:  # flat cartoon rectangles (zero interior texture)
            g = np.full((h, ws), float(rng.uniform(60, 190)), np.float32)
            for _ in range(int(rng.integers(8, 20))):
                ph_, pw_ = int(rng.integers(h // 8, h // 2)), int(
                    rng.integers(ws // 10, ws // 3))
                y0 = int(rng.integers(0, h - ph_))
                x0 = int(rng.integers(0, ws - pw_))
                g[y0:y0 + ph_, x0:x0 + pw_] = float(rng.uniform(20, 235))
            return g
        if kind == 3:  # blocky nearest-neighbour zoom noise
            c = int(rng.integers(3, 9))
            coarse = rng.uniform(20, 235, (h // c + 1, ws // c + 1))
            return ndi.zoom(coarse, c, order=0)[:h, :ws].astype(np.float32)
        # ramp + speckle dots
        g = (xx / ws * rng.uniform(120, 200) + rng.uniform(20, 60))
        n_dots = int(rng.integers(40, 160))
        ys = rng.integers(0, h, n_dots)
        xs = rng.integers(0, ws, n_dots)
        g[ys, xs] = rng.uniform(0, 255, n_dots)
        return g.astype(np.float32)

    def plane(lo, hi):
        a = rng.uniform(lo, hi)
        by = rng.uniform(-1.0, 1.0) * (hi - lo) / 2
        bx = rng.uniform(-1.0, 1.0) * (hi - lo) / 2
        return a + by * (yy[:, :w] / h - 0.5) + bx * (xx[:, :w] / w - 0.5)

    lefts, rights, gts = [], [], []
    for _ in range(batch):
        base = texture(int(rng.integers(0, 5)))
        d = plane(1.5, max(3.0, max_disp * 0.35))
        for _ in range(int(rng.integers(2, 5))):  # foreground slabs
            ph_, pw_ = int(rng.integers(h // 5, h // 2)), int(
                rng.integers(w // 6, w // 2))
            y0 = int(rng.integers(0, h - ph_))
            x0 = int(rng.integers(0, w - pw_))
            fg = plane(max_disp * 0.45, max_disp - 1.0)
            d[y0:y0 + ph_, x0:x0 + pw_] = fg[y0:y0 + ph_, x0:x0 + pw_]
        d = np.clip(d, 1.0, max_disp - 1.0).astype(np.float32)
        left = ndi.map_coordinates(
            base, [yy[:, :w], xx[:, :w] - d + max_disp], order=1,
            mode="nearest")
        lefts.append(left.astype(np.float32))
        rights.append(base[:, max_disp:])
        gts.append(d)
    rgb = lambda g: np.repeat(np.stack(g)[..., None], 3, axis=-1)
    return rgb(lefts), rgb(rights), np.stack(gts)


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


def conf_trust_blend(sgm, conf, guide, invalid, trust_scale=1):
    """The pipeline's confidence blend, through the EXACT product
    numerics (stages/depth.py confidence_trust_blend) -- replaces the
    earlier numpy mirror so eval rows cannot drift from shipping code.
    ``conf`` is the stereo margin already zeroed on invalid pixels;
    the product function re-derives the same mask from ``sgm`` (valid
    disparities are >= min_disparity, invalid is min_disparity - 1)."""
    import jax.numpy as jnp

    from video3d_tpu.stages.depth import confidence_trust_blend

    return np.asarray(confidence_trust_blend(
        jnp.asarray(sgm), jnp.asarray(conf), jnp.asarray(guide),
        min_disparity=float(invalid + 1), trust_scale=trust_scale,
    ))


def compute_preds(left, right, args, params, cre_fn):
    """All methods' disparity predictions for one eval set."""
    import jax.numpy as jnp

    from video3d_tpu.ops.image import rgb_to_gray
    from video3d_tpu.ops.stereo import sgbm_disparity

    invalid = float(params.min_disparity - 1)
    gl = np.asarray(rgb_to_gray(jnp.asarray(left)))
    gr = rgb_to_gray(jnp.asarray(right))
    preds = {}
    sgm_j, conf_j = sgbm_disparity(
        jnp.asarray(gl), gr, params, apply_speckle=True, return_margin=True
    )
    preds["sgm"] = np.asarray(sgm_j)
    from video3d_tpu.ops.fill import fill_holes

    # --fill-holes contract: background-extension occlusion fill
    preds["sgm_filled"] = np.asarray(fill_holes(sgm_j, invalid))

    if cre_fn is not None:
        cre = np.asarray(cre_fn(jnp.asarray(left), jnp.asarray(right)))
        preds["crestereo"] = cre
        sgm = preds["sgm"]
        # reference blend contract (0.7 stereo + 0.3 guidance,
        # depth.py:363); guidance fills SGM holes entirely
        preds["hybrid_fixed"] = np.where(
            sgm != invalid, 0.7 * sgm + 0.3 * cre, cre
        )
        # shipped default: confidence-weighted blend with per-pixel
        # local-agreement trust (stages/depth.py blend='confidence')
        conf = np.where(sgm != invalid, np.asarray(conf_j), 0.0)
        preds["hybrid_conf"] = conf_trust_blend(sgm, conf, cre, invalid)
        # quarter-res trust gate (--trust-scale 4 in cli/depth.py):
        # ~0.5 ms/frame cheaper at 1080p; this row is its quality gate
        preds["hybrid_conf_ts4"] = conf_trust_blend(sgm, conf, cre,
                                                    invalid, trust_scale=4)
        # --fill-holes COMPOSED with the confidence blend: the product
        # runs the background-extension fill BEFORE the blend
        # (stages/depth.py:216-223), so the blend's stereo base is the
        # filled map and untrusted holes degrade to background
        # extension instead of 0. Margin stays RAW (not re-zeroed) at
        # filled pixels, exactly as in the product path.
        preds["hybrid_conf_filled"] = conf_trust_blend(
            preds["sgm_filled"], np.asarray(conf_j), cre, invalid)
    preds["_conf"] = np.where(preds["sgm"] != invalid, np.asarray(conf_j),
                              0.0)

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
            for i in range(left.shape[0]):
                d = matcher.compute(
                    gl[i].astype(np.uint8), np.asarray(gr)[i].astype(np.uint8)
                ).astype(np.float32) / 16.0
                outs.append(np.where(d < 0, invalid, d))
            preds["cv2_sgbm"] = np.stack(outs)
        except Exception as e:
            print(f"cv2 eval skipped: {e}")
    return preds, gl


def evaluate_set(name, left, right, gt, args, params, cre_fn,
                 mono_fn=None):
    invalid = float(params.min_disparity - 1)
    preds, gl = compute_preds(left, right, args, params, cre_fn)
    if mono_fn is not None:
        import jax.numpy as jnp

        from video3d_tpu.models.mono import ssi_align

        raw = np.asarray(mono_fn(jnp.asarray(left)))
        vall = np.ones_like(gt)
        # MiDaS protocol: mono depth is affine-free; align to GT per
        # image before metrics (upper bound of the guidance signal)
        s, t = ssi_align(jnp.asarray(raw), jnp.asarray(gt),
                         jnp.asarray(vall))
        preds["mono_ssi"] = raw * np.asarray(s) + np.asarray(t)
        # shipped pipeline behavior (stages/depth.py mono contract):
        # confidence-weighted SSI alignment of mono onto the confident
        # SGM disparities, min-max fallback when the fit degenerates,
        # then the confidence blend
        mn = raw.min(axis=(1, 2), keepdims=True)
        mx = raw.max(axis=(1, 2), keepdims=True)
        guide_mm = ((raw - mn) / np.maximum(mx - mn, 1e-6)
                    * args.max_disparity)
        sgm = preds["sgm"]
        conf = np.where(sgm != invalid, preds.pop("_conf"), 0.0) \
            if "_conf" in preds else np.where(sgm != invalid, 0.7, 0.0)
        s, t = ssi_align(jnp.asarray(raw),
                         jnp.asarray(np.maximum(sgm, 0.0)),
                         jnp.asarray(conf))
        s, t = np.asarray(s), np.asarray(t)
        guide = np.where(s > 0.0,
                         np.clip(raw * s + t, 0.0, args.max_disparity),
                         guide_mm)
        preds["hybrid_conf_mono"] = conf_trust_blend(sgm, conf, guide,
                                                     invalid)
    lowtex = low_texture_mask(gl)
    print(f"\n[{name}] {left.shape[0]} scenes "
          f"{left.shape[1]}x{left.shape[2]}, "
          f"low-texture fraction {lowtex.mean():.2f}")
    preds.pop("_conf", None)
    table = {}
    for mname, pred in preds.items():
        table[mname] = {
            "all": metrics(pred, gt, invalid),
            "low_texture": metrics(pred, gt, invalid, lowtex),
        }
    print(f"{'method':>12} | {'EPE':>6} {'bad1':>7} {'bad3':>7} {'cov':>6}"
          f" | low-tex: {'EPE':>6} {'bad1':>7} {'bad3':>7}")
    for mname, m in table.items():
        a, lt = m["all"], m["low_texture"]
        print(f"{mname:>12} | {a['epe']:6.2f} {a['bad1']:7.3f} "
              f"{a['bad3']:7.3f} {a['coverage']:6.2f} |          "
              f"{lt['epe']:6.2f} {lt['bad1']:7.3f} {lt['bad3']:7.3f}")
    return table, float(lowtex.mean())


def lr_consistency_clip(args, params, cre_fn):
    """Pseudo-scored eval on a held-out rendered parallax clip (no GT):
    left-right consistency per method plus cross-method agreement with
    cv2.

    LR consistency: predict d_L on (L, R) and d_R on the mirrored pair
    (flip R, flip L) -- the same matcher predicts the right eye's
    disparity -- then check |d_L(x) - d_R(x - d_L(x))| <= 1 wherever both
    are valid. A matcher that hallucinates on real-structured content
    fails its own round trip, no ground truth needed.
    """
    import jax.numpy as jnp

    from video3d_tpu.ops.image import rgb_to_gray

    rng = np.random.default_rng(args.seed + 999)
    # held-out "footage": layered parallax scenes from the OOD texture
    # families, rendered per frame with moving foreground slabs
    left, right, _ = ood_batch(rng, args.clip_frames, args.h, args.w,
                               args.max_disparity)
    preds_l, _ = compute_preds(left, right, args, params, cre_fn)
    # mirrored pair: flip x AND swap eyes -> matcher sees the right eye
    # as a "left" image with the same positive-disparity convention
    left_m = right[:, :, ::-1].copy()
    right_m = left[:, :, ::-1].copy()
    preds_r, _ = compute_preds(left_m, right_m, args, params, cre_fn)
    preds_l.pop("_conf", None)  # internal aux, not a method row
    preds_r.pop("_conf", None)

    invalid = float(params.min_disparity - 1)
    h, w = left.shape[1], left.shape[2]
    xs = np.arange(w)[None, None, :]
    out = {}
    for mname, d_l in preds_l.items():
        d_r = preds_r[mname][:, :, ::-1]  # back to right-eye coords
        xi = np.clip(np.round(xs - np.maximum(d_l, 0.0)).astype(int), 0, w - 1)
        d_r_at = np.take_along_axis(d_r, xi, axis=2)
        valid = (d_l != invalid) & (d_r_at != invalid) & \
            (xs - np.maximum(d_l, 0.0) >= 0)
        err = np.abs(d_l - d_r_at)
        lr_bad1 = float(((err > 1.0) & valid).sum()) / max(valid.sum(), 1)
        row = {
            "lr_bad1": round(lr_bad1, 4),
            "coverage": round(float((d_l != invalid).mean()), 4),
        }
        if "cv2_sgbm" in preds_l and mname != "cv2_sgbm":
            cv = preds_l["cv2_sgbm"]
            both = (d_l != invalid) & (cv != invalid)
            agree = float(((np.abs(d_l - cv) <= 1.0) & both).sum()) / max(
                both.sum(), 1)
            row["cv2_agree1"] = round(agree, 4)
        out[mname] = row
    print(f"\n[clip] {args.clip_frames} held-out parallax frames "
          f"(no GT; LR round-trip + cv2 cross-check)")
    for mname, row in out.items():
        print(f"{mname:>12} | lr_bad1 {row['lr_bad1']:.3f} "
              f"cov {row['coverage']:.3f}"
              + (f" cv2_agree1 {row['cv2_agree1']:.3f}"
                 if "cv2_agree1" in row else ""))
    return out


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
    ap.add_argument("--mono", default=None,
                    help="MonoDepthLite checkpoint dir (adds mono_ssi + "
                         "hybrid_conf_mono rows)")
    ap.add_argument("--no-ood", action="store_true",
                    help="Skip the out-of-distribution set")
    ap.add_argument("--no-clip", action="store_true",
                    help="Skip the LR-consistency clip score")
    ap.add_argument("--clip-frames", type=int, default=8)
    args = ap.parse_args()

    from video3d_tpu.cli.train_crestereo import synthetic_batch
    from video3d_tpu.ops.stereo import SGBMParams

    params = SGBMParams(num_disparities=args.max_disparity)
    cre_fn = None
    if args.ckpt and os.path.isdir(args.ckpt):
        from video3d_tpu.models.crestereo import load_crestereo_guidance

        cre_fn = load_crestereo_guidance(os.path.abspath(args.ckpt))
    else:
        print("no CREStereo checkpoint -- evaluating SGM only")
    mono_fn = None
    if args.mono and os.path.isdir(args.mono):
        from video3d_tpu.models.mono import make_mono_guidance

        mono_fn = make_mono_guidance(os.path.abspath(args.mono))

    rng = np.random.default_rng(args.seed)
    left, right, gt, _ = synthetic_batch(
        rng, args.scenes, args.h, args.w, args.max_disparity
    )
    table, ltf = evaluate_set("in-dist", left, right, gt, args, params,
                              cre_fn, mono_fn)
    result = {
        "config": {
            "scenes": args.scenes, "h": args.h, "w": args.w,
            "max_disparity": args.max_disparity, "seed": args.seed,
            "low_texture_fraction": ltf,
        },
        "metrics": table,
    }
    if not args.no_ood:
        rng_o = np.random.default_rng(args.seed + 1)
        lo, ro, go = ood_batch(rng_o, args.scenes, args.h, args.w,
                               args.max_disparity)
        ood_table, ood_ltf = evaluate_set("OOD", lo, ro, go, args, params,
                                          cre_fn, mono_fn)
        result["ood_metrics"] = ood_table
        result["ood_low_texture_fraction"] = ood_ltf
    if mono_fn is not None:
        # held-out perceptual-cue scenes (cli/train_mono.py renderer,
        # eval-only seed): the set where a monocular net CAN in
        # principle recover depth from appearance — mono_ssi here
        # measures learned cues, not layout priors; the stereo rows
        # stay meaningful because the renderer emits true layered
        # parallax pairs
        from video3d_tpu.cli.train_mono import mono_cue_batch

        rng_c = np.random.default_rng(args.seed + 2)
        lc, rc, gc, _ = mono_cue_batch(rng_c, args.scenes, args.h,
                                       args.w, args.max_disparity)
        cue_table, cue_ltf = evaluate_set("mono-cues", lc, rc, gc, args,
                                          params, cre_fn, mono_fn)
        result["mono_cues_metrics"] = cue_table
        result["mono_cues_low_texture_fraction"] = cue_ltf
    if not args.no_clip:
        result["clip_lr_consistency"] = lr_consistency_clip(args, params,
                                                            cre_fn)
    result["notes"] = {
        "trust_scale_4": (
            "hybrid_conf_ts4 = the confidence blend with the trust field "
            "pooled 4x (--trust-scale 4): ~0.5 ms/frame cheaper at 1080p "
            "(1.01 vs 1.57 ms measured), EPE equal-or-better everywhere, "
            "bad1 +0.007..0.009 on the OOD/mono-cues families -- kept "
            "OPT-IN (default --trust-scale 1) because the trust gate's "
            "value is exactly its OOD discrimination"
        ),
    }

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
