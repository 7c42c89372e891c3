"""CLI: distill MonoDepthLite from the SGM matcher (monocular guidance).

The reference's monocular slot requires downloading ``Intel/dpt-large``
(depth.py:74-82); this trains the self-hosted alternative: the left eye
of SBS footage (or the synthetic curriculum) with the classical SGM
matcher's disparities as pseudo-labels, scale-and-shift-invariant loss
(models/mono.py). Checkpoints plug into ``video-3d-depth --guidance
mono``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from video3d_tpu.cli.train_crestereo import (
    synthetic_batch,
    synthetic_batch_v2,
    video_batch,
)


def mono_cue_batch(rng: np.random.Generator, batch: int, h: int, w: int,
                   max_disparity: int, p_texgrad: float = 0.85,
                   p_defocus: float = 0.85, p_haze: float = 0.85):
    """Perceptual-cue curriculum for monocular distillation.

    The stereo curricula (v1/v2) draw texture and disparity
    independently, so a MONOCULAR net trained on them can only learn
    layout priors (ground-plane ramps, occlusion layering) — appearance
    carries zero depth signal by construction. This generator renders
    scenes where the classic monocular cues are all monotone in
    disparity, the way the reference's DPT-large learned them from real
    photos (reference depth.py:74-82 is the slot this feeds):

    - ground plane: disparity rises linearly below a sampled horizon
      (height-in-visual-field cue);
    - texture gradient: surface texture is sampled at a spatial scale
      proportional to 1/d, so far surfaces look finer;
    - relative size: standing objects are scaled by d_obj and their feet
      sit on the ground line for their depth;
    - defocus: blur increases toward the far plane;
    - aerial haze: far pixels lose contrast toward a light veil.

    Each cue is independently dropped ~15% of the time so the net
    cannot over-rely on any single one.

    Unlike the earlier mono-only draft, this renders a TRUE stereo
    pair with layered parallax: the scene (image + depth) is painted
    on an extended canvas in RIGHT-eye coordinates with every object
    shifted left by its own disparity, the right eye is a crisp crop,
    and the left eye is sampled at ``x - d(y,x) + max_disparity``
    (the exact-GT scheme of :func:`synthetic_batch`).  The pair is
    therefore usable by the stereo matchers/CREStereo too, and the
    stereo rows of the mono-cues eval set (tools/eval_stereo.py) are
    meaningful.
    """
    import scipy.ndimage as ndi

    ms = int(max_disparity)
    wc = w + ms  # canvas width (right-eye coords, extended left)
    yy, xx = np.mgrid[0:h, 0:wc].astype(np.float32)  # canvas grid
    yyl, xxl = np.mgrid[0:h, 0:w].astype(np.float32)  # left grid
    lefts, rights, gts = [], [], []
    for _ in range(batch):
        d_far = float(rng.uniform(0.5, max(1.0, max_disparity * 0.06)))
        d_near = float(rng.uniform(max_disparity * 0.55,
                                   max_disparity - 1.0))
        y_h = float(rng.uniform(0.15, 0.45)) * h  # horizon row
        use_texgrad = rng.random() < p_texgrad
        use_defocus = rng.random() < p_defocus
        use_haze = rng.random() < p_haze

        # ground plane: d linear in y below the horizon (true for a
        # plane under perspective since d ~ 1/Z ~ y - y_horizon); the
        # ramp depends only on y, so it is the same in canvas and
        # left coordinates
        ramp = np.clip((yy[:, :1] - y_h) / max(h - y_h, 1.0), 0.0, 1.0)
        d_row = (d_far + (d_near - d_far) * ramp).astype(np.float32)
        d_canvas = d_row * np.ones((1, wc), np.float32)
        d_left = d_row * np.ones((1, w), np.float32)

        # textures sampled at scale ∝ 1/d (texture gradient)
        tile_g = ndi.gaussian_filter(
            rng.uniform(0, 255, (h, wc)).astype(np.float32),
            rng.uniform(1.0, 2.0), mode="wrap")
        tile_o = ndi.gaussian_filter(
            rng.uniform(0, 255, (h, wc)).astype(np.float32),
            rng.uniform(0.8, 1.6), mode="wrap")

        def sample(tile, scale_map):
            return ndi.map_coordinates(
                tile, [yy * scale_map, xx * scale_map], order=1,
                mode="wrap")

        scale = (d_near / np.maximum(d_canvas, 0.5)) if use_texgrad \
            else np.ones_like(d_canvas)
        img = sample(tile_g, scale).astype(np.float32)

        # standing objects, far-to-near so near occludes far; each is
        # painted at left coords into d_left and at canvas coords
        # (shifted left by its disparity) into the image + d_canvas,
        # which is exactly where the right eye sees it
        n_obj = int(rng.integers(2, 6))
        depths = np.sort(rng.uniform(d_far + 0.5, d_near, n_obj))
        base_h = rng.uniform(0.25, 0.5) * h
        for d_obj in depths:
            rel = (d_obj - d_far) / max(d_near - d_far, 1e-6)
            y_base = y_h + rel * (h - y_h)  # feet on its ground line
            oh = base_h * (d_obj / d_near) * rng.uniform(0.7, 1.3)
            ow = oh * rng.uniform(0.5, 1.5)
            x0f = rng.uniform(-0.1 * w, w - 0.4 * ow)
            y0, y1 = int(max(y_base - oh, 0)), int(min(y_base, h))
            if y1 <= y0 or int(min(x0f + ow, w)) <= int(max(x0f, 0)):
                continue
            sc = (d_near / d_obj) if use_texgrad else 1.0
            otex = sample(tile_o, np.full_like(d_canvas, sc))
            if rng.random() < 0.3:  # sometimes low-texture objects
                otex = float(rng.uniform(40, 215)) + 0.05 * (
                    otex - otex.mean())
            shift = ms - d_obj  # left coords -> canvas coords
            if rng.random() < 0.5:  # ellipse mask
                cy, cx = (y0 + y1) / 2, (x0f + x0f + ow) / 2
                ry = max((y1 - y0) / 2, 1)
                rx = max(ow / 2, 1)
                el = lambda gy, gx, cxx: (((gy - cy) / ry) ** 2
                                          + ((gx - cxx) / rx) ** 2) <= 1
                ml = el(yyl, xxl, cx) & (yyl <= y_base)
                mc = el(yy, xx, cx + shift) & (yy <= y_base)
            else:
                ml = np.zeros((h, w), bool)
                ml[y0:y1, int(max(x0f, 0)):int(min(x0f + ow, w))] = True
                mc = np.zeros((h, wc), bool)
                mc[y0:y1, int(max(x0f + shift, 0)):
                   int(min(x0f + ow + shift, wc))] = True
            img = np.where(mc, otex, img)
            d_canvas = np.where(mc, np.float32(d_obj), d_canvas)
            d_left = np.where(ml, np.float32(d_obj), d_left)

        d_n = (d_canvas - d_far) / max(d_near - d_far, 1e-6)  # 0=far
        if use_defocus:
            blur = ndi.gaussian_filter(img, rng.uniform(2.0, 4.0))
            wgt = (1.0 - d_n) ** 1.5
            img = img * (1 - wgt) + blur * wgt
        if use_haze:
            veil = float(rng.uniform(150, 230))
            k = float(rng.uniform(0.2, 0.6))
            img = img * (1 - k * (1 - d_n)) + veil * k * (1 - d_n)
        img = np.clip(img, 0, 255).astype(np.float32)

        # exact-GT sampling scheme of synthetic_batch: left pixel x
        # matches right pixel x - d for ANY field d_left
        left = ndi.map_coordinates(
            img, [yyl, xxl - d_left + ms], order=1, mode="nearest")
        lefts.append(left.astype(np.float32))
        rights.append(img[:, ms:])
        gts.append(d_left.astype(np.float32))

    rgb = lambda g: np.repeat(np.stack(g)[..., None], 3, axis=-1)
    return (rgb(lefts), rgb(rights), np.stack(gts),
            np.ones((batch, h, w), np.float32))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-train-mono",
        description="Distill the MonoDepthLite guidance model from SGM",
    )
    p.add_argument("--video", default=None,
                   help="SBS clip for SGM-pseudo-labeled crops")
    p.add_argument("--synthetic", action="store_true",
                   help="mix in synthetic curriculum batches (exact GT)")
    p.add_argument("--video-every", type=int, default=2,
                   help="with both sources, every Nth batch is footage")
    p.add_argument("--data", default="cues", choices=("v1", "v2", "cues"),
                   help="synthetic curriculum: v1/v2 are the stereo "
                        "generators (appearance independent of depth — "
                        "layout priors only); 'cues' renders monocular "
                        "perceptual cues monotone in disparity")
    p.add_argument("--out", default="mono_ckpt")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop", type=int, nargs=2, default=(128, 256))
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--max-disparity", type=int, default=64)
    p.add_argument("--smooth-weight", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save-every", type=int, default=0)
    p.add_argument("--steps-per-call", type=int, default=32,
                   help="optimizer steps per device dispatch (see "
                        "train-crestereo: amortizes the per-call relay "
                        "round-trip; 1 = legacy loop)")
    p.add_argument("--init-from", default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.synthetic and not args.video:
        print("Provide --video for distillation or --synthetic")
        return 1

    import jax
    import optax

    from video3d_tpu.models.mono import (
        MonoDepthLite,
        load_checkpoint,
        save_checkpoint,
        train_step,
    )
    from video3d_tpu.ops.stereo import SGBMParams

    rng = np.random.default_rng(args.seed)
    h, w = args.crop
    model = MonoDepthLite(width=args.width)
    synth_fn = {"v1": synthetic_batch, "v2": synthetic_batch_v2,
                "cues": mono_cue_batch}[args.data]

    next_video_batch = None
    if args.video:
        from video3d_tpu.core import VideoReader

        def frame_gen():
            while True:
                for f in VideoReader(args.video, batch_size=1).frames():
                    yield f

        frames_iter = frame_gen()
        sgm_params = SGBMParams(num_disparities=args.max_disparity)

        def next_video_batch():
            return video_batch(frames_iter, rng, args.batch_size, h, w,
                               sgm_params)

    if args.video and args.synthetic:
        step_box = [0]

        def next_batch():
            step_box[0] += 1
            if step_box[0] % max(args.video_every, 1) == 0:
                return next_video_batch()
            return synth_fn(rng, args.batch_size, h, w,
                            min(args.max_disparity, w // 4))
    elif args.video:
        next_batch = next_video_batch
    else:
        def next_batch():
            return synth_fn(rng, args.batch_size, h, w,
                            min(args.max_disparity, w // 4))

    left, _, gt, valid = next_batch()
    params = model.init(jax.random.key(args.seed), left)
    if args.init_from:
        restored = load_checkpoint(str(Path(args.init_from).resolve()))
        params = jax.tree.map(
            lambda init, saved: jax.numpy.asarray(saved, init.dtype),
            params, restored,
        )
        print(f"Warm-started from {args.init_from}")
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"MonoDepthLite: {n_params/1e6:.2f} M params, crop {h}x{w}, "
          f"batch {args.batch_size}")

    warmup = max(1, min(300, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.02,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)

    from video3d_tpu.core.xfer import to_device as _to_dev

    def compact(rgb, gt, valid):
        # compact dtypes cut relay traffic (see train_crestereo); the
        # EXPLICIT placement avoids the jax 0.9.0 implicit-transfer leak
        # that grows host RSS by the batch size every step (core/xfer.py)
        return (_to_dev(np.clip(np.round(rgb), 0, 255).astype(np.uint8)),
                _to_dev(gt.astype(np.float16)),
                _to_dev(valid.astype(np.float16)))

    K = max(1, args.steps_per_call)
    t0 = time.time()
    if K == 1:
        for step in range(1, args.steps + 1):
            params, opt_state, loss = train_step(
                model, tx, params, opt_state,
                *compact(left, gt, valid),
                smooth_weight=args.smooth_weight,
            )
            if step % args.log_every == 0 or step == args.steps:
                print(f"step {step:5d}  loss {float(loss):9.4f}  "
                      f"({step / (time.time() - t0):.2f} steps/s)",
                      flush=True)
            if args.save_every and step % args.save_every == 0 \
                    and step != args.steps:
                save_checkpoint(str(Path(args.out).resolve()), params)
                print(f"  [ckpt @ step {step}]", flush=True)
            left, _, gt, valid = next_batch()
    else:
        import math

        from video3d_tpu.models.mono import train_step_k
        from video3d_tpu.utils.prefetch import BatchPrefetcher

        total = math.ceil(args.steps / K) * K
        if total != args.steps:
            print(f"steps rounded up to {total} "
                  f"(multiple of --steps-per-call {K})")
        with BatchPrefetcher(next_batch, depth=2 * K) as fetch:
            done = 0
            pending = [(left, gt, valid)]
            while done < total:
                while len(pending) < K:
                    b = fetch()
                    pending.append((b[0], b[2], b[3]))
                stacked = tuple(np.stack(x) for x in zip(*pending))
                pending.clear()
                params, opt_state, losses = train_step_k(
                    model, tx, params, opt_state, *compact(*stacked),
                    smooth_weight=args.smooth_weight,
                )
                done += K
                print(f"step {done:5d}  loss "
                      f"{float(losses[-1]):9.4f}  "
                      f"({done / (time.time() - t0):.2f} steps/s)",
                      flush=True)
                if args.save_every and done % args.save_every < K \
                        and done < total:
                    save_checkpoint(str(Path(args.out).resolve()), params)
                    print(f"  [ckpt @ step {done}]", flush=True)

    out = str(Path(args.out).resolve())
    save_checkpoint(out, params)
    print(f"Checkpoint saved: {out}")
    print(f"Use it with: video-3d-depth <video> --guidance mono "
          f"--model {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
