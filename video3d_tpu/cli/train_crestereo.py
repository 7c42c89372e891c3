"""CLI: train the CREStereo-lite guidance model.

The reference shipped no trainable models (its CREStereo integration was
gitignored, SURVEY.md SS2.4-4); this tool closes the loop: it trains
:class:`video3d_tpu.models.crestereo.CREStereoLite` either on

* **self-training data from an SBS video** -- crops of real left/right
  eye pairs, pseudo-labeled by the classical SGM matcher (valid pixels
  only), so a checkpoint can be bootstrapped from the same footage the
  pipeline will process; or
* **synthetic stereo** (``--synthetic``) -- random smooth textures with
  known planar shifts and exact ground truth.

Checkpoints save with orbax and plug straight into
``video-3d-depth --guidance crestereo --model <ckpt>``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def synthetic_batch(rng: np.random.Generator, batch: int, h: int, w: int,
                    max_shift: int, warp: bool = True,
                    low_texture: bool = True):
    """Synthetic stereo curriculum with analytic ground truth.

    ``warp=False`` reproduces the original constant-shift pairs;
    ``warp=True`` uses a SMOOTH spatially-varying disparity field d(y,x)
    defined on LEFT-image coordinates: the right eye is a crisp crop of
    the scene and the left eye is sampled at x - d(y,x) + max_shift, so
    left pixel x matches right pixel x - d exactly -- the GT is exact
    for ANY field, not a small-gradient approximation.  ``low_texture``
    stamps near-constant rectangles into the scene: the regions where
    block matching starves for signal and learned guidance must win.
    """
    import scipy.ndimage as ndi

    lefts, rights, gts = [], [], []
    for _ in range(batch):
        base = rng.uniform(0, 255, (h, w + max_shift)).astype(np.float32)
        base = ndi.gaussian_filter(base, rng.uniform(1.0, 2.5))
        base = (base - base.min()) / (np.ptp(base) + 1e-6) * 255
        if low_texture:
            for _ in range(int(rng.integers(1, 4))):
                ph = int(rng.integers(h // 6, h // 2))
                pw = int(rng.integers(w // 6, w // 2))
                y0 = int(rng.integers(0, h - ph))
                x0 = int(rng.integers(0, base.shape[1] - pw))
                flat = float(rng.uniform(40, 215))
                patch = base[y0 : y0 + ph, x0 : x0 + pw]
                base[y0 : y0 + ph, x0 : x0 + pw] = (
                    flat + 0.02 * (patch - patch.mean())
                )
        if warp:
            knots = rng.uniform(0.0, 1.0, (4, 5))
            field = ndi.zoom(knots, (h / 4.0, w / 5.0), order=3)[:h, :w]
            lo = float(rng.uniform(1.0, max(2.0, max_shift / 3)))
            hi = float(rng.uniform(lo + 1.0, max_shift))
            d = lo + (hi - lo) * (field - field.min()) / (
                np.ptp(field) + 1e-6
            )
        else:
            d = np.full((h, w), float(rng.integers(1, max_shift)), np.float32)
        # right = crisp crop at column offset max_shift; left sampled at
        # scene column max_shift + x - d(y,x) => left pixel x matches
        # right pixel x - d exactly (GT exact for any field d)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        left = ndi.map_coordinates(base, [yy, xx - d + max_shift], order=1,
                                   mode="nearest")
        lefts.append(left.astype(np.float32))
        rights.append(base[:, max_shift:])
        gts.append(d.astype(np.float32))
    rgb = lambda g: np.repeat(np.stack(g)[..., None], 3, axis=-1)
    return rgb(lefts), rgb(rights), np.stack(gts), np.ones((batch, h, w), np.float32)


def synthetic_batch_v2(rng: np.random.Generator, batch: int, h: int,
                       w: int, max_shift: int):
    """Diversified synthetic curriculum (round-3 recipe).

    The v1 generator (:func:`synthetic_batch`) draws every scene from one
    family -- Gaussian-smoothed noise with a C1-smooth disparity field --
    and the OOD eval (tools/eval_stereo.py) showed a checkpoint trained
    on it collapses on anything structurally different. v2 samples each
    scene from a texture family in {smooth noise, multi-octave noise,
    noisy gratings, textured patchwork, ramp+blobs} and a geometry in
    {smooth spline field, piecewise-planar slabs with sharp
    discontinuities}. Checkerboards, flat cartoon rectangles and
    nearest-zoom block textures remain EVAL-ONLY families so the OOD
    eval still measures generalization, not memorization.
    """
    import scipy.ndimage as ndi

    ws = w + max_shift
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def norm255(g):
        return ((g - g.min()) / (np.ptp(g) + 1e-6) * 255).astype(np.float32)

    def tex_smooth():
        g = rng.uniform(0, 255, (h, ws)).astype(np.float32)
        return norm255(ndi.gaussian_filter(g, rng.uniform(1.0, 2.5)))

    def tex_octaves():
        g = np.zeros((h, ws), np.float32)
        for cell, amp in ((64, 1.0), (16, 0.5), (4, 0.25)):
            coarse = rng.uniform(-1, 1, (h // cell + 2, ws // cell + 2))
            g += amp * ndi.zoom(coarse, cell, order=3)[:h, :ws]
        return norm255(g)

    def tex_grating():
        gy, gx = np.mgrid[0:h, 0:ws].astype(np.float32)
        f = rng.uniform(0.02, 0.12)
        th = rng.uniform(0, np.pi)
        g = np.sin(2 * np.pi * f * (np.cos(th) * gx + np.sin(th) * gy))
        n = ndi.gaussian_filter(
            rng.uniform(-1, 1, (h, ws)).astype(np.float32), 1.5)
        return norm255(g + rng.uniform(0.2, 0.6) * n)

    def tex_patchwork():
        g = tex_octaves()
        for _ in range(int(rng.integers(5, 12))):
            ph = int(rng.integers(h // 8, h // 2))
            pw = int(rng.integers(ws // 10, ws // 3))
            y0 = int(rng.integers(0, h - ph))
            x0 = int(rng.integers(0, ws - pw))
            patch = (tex_smooth() if rng.random() < 0.5 else tex_grating())
            g[y0:y0 + ph, x0:x0 + pw] = patch[y0:y0 + ph, x0:x0 + pw]
        return g

    def tex_blobs():
        gy, gx = np.mgrid[0:h, 0:ws].astype(np.float32)
        g = gx / ws * rng.uniform(100, 200)
        coarse = rng.uniform(0, 1, (h // 16 + 2, ws // 16 + 2))
        coarse = (coarse > 0.92) * rng.uniform(100, 255)
        g += ndi.gaussian_filter(
            ndi.zoom(coarse, 16, order=1)[:h, :ws], rng.uniform(2, 5))
        return norm255(g)

    families = (tex_smooth, tex_octaves, tex_grating, tex_patchwork,
                tex_blobs)

    def smooth_field():
        knots = rng.uniform(0.0, 1.0, (4, 5))
        field = ndi.zoom(knots, (h / 4.0, w / 5.0), order=3)[:h, :w]
        lo = float(rng.uniform(1.0, max(2.0, max_shift / 3)))
        hi = float(rng.uniform(lo + 1.0, max_shift))
        return lo + (hi - lo) * (field - field.min()) / (
            np.ptp(field) + 1e-6)

    def planar_field():
        def plane(lo, hi):
            a = rng.uniform(lo, hi)
            return (a + rng.uniform(-.5, .5) * (hi - lo) * (yy / h - 0.5)
                    + rng.uniform(-.5, .5) * (hi - lo) * (xx / w - 0.5))
        d = plane(1.5, max(3.0, max_shift * 0.35))
        for _ in range(int(rng.integers(1, 5))):
            ph = int(rng.integers(h // 5, h // 2))
            pw = int(rng.integers(w // 6, w // 2))
            y0 = int(rng.integers(0, h - ph))
            x0 = int(rng.integers(0, w - pw))
            fg = plane(max_shift * 0.45, max_shift - 1.0)
            d[y0:y0 + ph, x0:x0 + pw] = fg[y0:y0 + ph, x0:x0 + pw]
        return d

    lefts, rights, gts = [], [], []
    for _ in range(batch):
        base = families[int(rng.integers(0, len(families)))]()
        if rng.random() < 0.6:  # low-texture stamping, as in v1
            for _ in range(int(rng.integers(1, 4))):
                ph = int(rng.integers(h // 6, h // 2))
                pw = int(rng.integers(w // 6, w // 2))
                y0 = int(rng.integers(0, h - ph))
                x0 = int(rng.integers(0, base.shape[1] - pw))
                flat = float(rng.uniform(40, 215))
                patch = base[y0:y0 + ph, x0:x0 + pw]
                base[y0:y0 + ph, x0:x0 + pw] = (
                    flat + 0.02 * (patch - patch.mean()))
        d = smooth_field() if rng.random() < 0.5 else planar_field()
        d = np.clip(d, 1.0, max_shift - 1.0).astype(np.float32)
        left = ndi.map_coordinates(base, [yy, xx - d + max_shift],
                                   order=1, mode="nearest")
        lefts.append(left.astype(np.float32))
        rights.append(base[:, max_shift:])
        gts.append(d)
    rgb = lambda g: np.repeat(np.stack(g)[..., None], 3, axis=-1)
    return (rgb(lefts), rgb(rights), np.stack(gts),
            np.ones((batch, h, w), np.float32))


def video_batch(frames_iter, rng, batch, crop_h, crop_w, sgm_params):
    """Sample eye-pair crops from SBS frames, pseudo-label with SGM."""
    import jax.numpy as jnp

    from video3d_tpu.ops.image import rgb_to_gray, split_sbs, unsqueeze_width
    from video3d_tpu.ops.stereo import sgbm_disparity_jit
    from video3d_tpu.core.xfer import to_device

    lefts, rights = [], []
    while len(lefts) < batch:
        frame = next(frames_iter)  # (H, W, 3) uint8
        l, r = split_sbs(to_device(frame.astype(np.float32)))
        # materialize to host BEFORE the random crop: an eager jnp slice
        # lowers to lax.slice with STATIC start indices, so every
        # distinct (y0, x0) would compile and cache a fresh XLA
        # executable -- an unbounded leak that OOM-killed the round-4
        # 20k-step run at 82 GB RSS. The fixed-shape device work above
        # (split/unsqueeze) compiles once; the crop is numpy.
        l = np.asarray(jnp.moveaxis(unsqueeze_width(jnp.moveaxis(l, -1, 0)), 0, -1))
        r = np.asarray(jnp.moveaxis(unsqueeze_width(jnp.moveaxis(r, -1, 0)), 0, -1))
        h, w = l.shape[0], l.shape[1]
        y0 = int(rng.integers(0, max(h - crop_h, 1)))
        x0 = int(rng.integers(0, max(w - crop_w, 1)))
        lefts.append(l[y0 : y0 + crop_h, x0 : x0 + crop_w])
        rights.append(r[y0 : y0 + crop_h, x0 : x0 + crop_w])
    left = np.stack(lefts)
    right = np.stack(rights)
    gl = rgb_to_gray(to_device(left))
    gr = rgb_to_gray(to_device(right))
    disp = np.asarray(sgbm_disparity_jit(gl, gr, sgm_params, apply_speckle=True))
    valid = (disp >= 0).astype(np.float32)
    gt = np.maximum(disp, 0.0)
    return left, right, gt, valid


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-train-crestereo",
        description="Train the CREStereo-lite guidance model",
    )
    p.add_argument("--video", default=None,
                   help="SBS video for self-training (pseudo-labels from SGM)")
    p.add_argument("--synthetic", action="store_true",
                   help="Train on synthetic textures with exact ground truth")
    p.add_argument("--out", default="crestereo_ckpt",
                   help="Checkpoint output directory (orbax)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--crop", type=int, nargs=2, default=(128, 256),
                   metavar=("H", "W"))
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--iters", type=int, default=6,
                   help="GRU refinement iterations")
    p.add_argument("--max-disparity", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data", default="v2", choices=("v1", "v2", "v2cues"),
                   help="Synthetic curriculum: v1 = smooth-noise scenes "
                        "(round-2 recipe), v2 = diversified families + "
                        "piecewise-planar geometry (default), v2cues = "
                        "v2 with every 3rd batch from the perceptual-cue "
                        "layered-parallax renderer (train_mono)")
    p.add_argument("--video-every", type=int, default=4,
                   help="With BOTH --video and --synthetic: every Nth "
                        "batch is SGM-pseudo-labeled footage (self-"
                        "training mix)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save-every", type=int, default=0,
                   help="checkpoint to --out every N steps (0 = only at "
                        "the end); long runs survive interruption")
    p.add_argument("--steps-per-call", type=int, default=32,
                   help="optimizer steps per device dispatch (lax.scan "
                        "over stacked batches). Each jitted call pays a "
                        "multi-second relay round-trip on tunneled dev "
                        "hosts while the step itself computes in ms; "
                        "K>1 amortizes it (~20x measured). 1 = legacy "
                        "one-step-per-call loop")
    p.add_argument("--init-from", default=None,
                   help="warm-start from an existing checkpoint directory")
    p.add_argument("--dp", action="store_true",
                   help="Data-parallel training over all visible devices "
                        "(batch sharded on a frames mesh, params/optimizer "
                        "replicated; gradients reduce over ICI). "
                        "batch size must be divisible by the device count.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.synthetic and not args.video:
        print("Provide --video for self-training or --synthetic")
        return 1

    import jax
    import optax

    from video3d_tpu.models.crestereo import (
        CREStereoConfig,
        CREStereoLite,
        save_checkpoint,
        train_step,
    )
    from video3d_tpu.ops.stereo import SGBMParams

    rng = np.random.default_rng(args.seed)
    h, w = args.crop
    cfg = CREStereoConfig(iters=args.iters, max_disparity=args.max_disparity)
    model = CREStereoLite(cfg)

    if args.data == "v2cues":
        # lazy import: train_mono imports this module at top level
        from video3d_tpu.cli.train_mono import mono_cue_batch

        cue_box = [0]

        def synth_fn(rng_, b, hh, ww, ms):
            cue_box[0] += 1
            if cue_box[0] % 3 == 0:
                return mono_cue_batch(rng_, b, hh, ww, ms)
            return synthetic_batch_v2(rng_, b, hh, ww, ms)
    else:
        synth_fn = synthetic_batch if args.data == "v1" \
            else synthetic_batch_v2
    next_video_batch = None
    if args.video:
        from video3d_tpu.core import VideoReader

        def frame_gen():
            while True:  # loop over the clip
                for f in VideoReader(args.video, batch_size=1).frames():
                    yield f

        frames_iter = frame_gen()
        sgm_params = SGBMParams(num_disparities=args.max_disparity)

        def next_video_batch():
            return video_batch(frames_iter, rng, args.batch_size, h, w,
                               sgm_params)

    if args.video and args.synthetic:
        # self-training mix: mostly synthetic-with-GT, every Nth batch
        # real footage pseudo-labeled by the SGM matcher (valid px only)
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

    left, right, gt, valid = next_batch()
    params = model.init(jax.random.key(args.seed), left, right)
    if args.init_from:
        from video3d_tpu.models.crestereo import load_checkpoint

        restored = load_checkpoint(str(Path(args.init_from).resolve()))
        params = jax.tree.map(
            lambda init, saved: jax.numpy.asarray(saved, init.dtype),
            params, restored,
        )
        print(f"Warm-started from {args.init_from}")
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"CREStereo-lite: {n_params/1e6:.2f} M params, "
          f"crop {h}x{w}, batch {args.batch_size}")

    # explicit placement on every host->device batch upload: implicitly
    # placed jit arguments LEAK the transferred buffer on jax 0.9.0
    # (core/xfer.py) -- this is what OOM-killed the round-4 20k-step run
    from video3d_tpu.core.xfer import to_device as _to_dev

    put_batch = lambda *xs: tuple(_to_dev(x) for x in xs)
    if args.dp:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from video3d_tpu.parallel.mesh import frames_mesh

        devs = jax.devices()
        if args.batch_size % len(devs):
            print(f"--dp: batch size {args.batch_size} must be "
                  f"divisible by {len(devs)} devices")
            return 1
        mesh = frames_mesh(devs)
        batch_sh = NamedSharding(mesh, P("frames"))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        put_batch = lambda *xs: tuple(
            jax.device_put(x, batch_sh) for x in xs
        )
        print(f"Data-parallel over {len(devs)} devices")
    # RAFT-style optimization: warmup + cosine decay, global-norm clip
    warmup = max(1, min(500, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.02,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)
    if args.dp:
        opt_state = jax.device_put(
            opt_state, jax.sharding.NamedSharding(mesh, P())
        )

    def compact(left, right, gt, valid):
        """Compact transfer dtypes: eyes quantize to uint8 (real video IS
        uint8 -- training on quantized frames matches deployment), labels
        and validity to f16 (abs precision ~0.03 px at d < 64). Cuts
        host->device traffic 3.5x; train_step casts back to f32 on
        device. On this dev host the relay moves ~17 MB/s, so the f32
        batch (8 MB) was the step-rate ceiling."""
        return (np.clip(np.round(left), 0, 255).astype(np.uint8),
                np.clip(np.round(right), 0, 255).astype(np.uint8),
                gt.astype(np.float16), valid.astype(np.float16))

    K = max(1, args.steps_per_call)
    t0 = time.time()
    if K == 1:
        for step in range(1, args.steps + 1):
            left, right, gt, valid = put_batch(
                *compact(left, right, gt, valid))
            params, opt_state, loss = train_step(
                model, tx, params, opt_state, left, right, gt, valid
            )
            if step % args.log_every == 0 or step == args.steps:
                print(f"step {step:5d}  loss {float(loss):9.4f}  "
                      f"({step / (time.time() - t0):.2f} steps/s)",
                      flush=True)
            if args.save_every and step % args.save_every == 0 \
                    and step != args.steps:
                save_checkpoint(str(Path(args.out).resolve()), params)
                print(f"  [ckpt @ step {step}]", flush=True)
            left, right, gt, valid = next_batch()
    else:
        import math

        from video3d_tpu.models.crestereo import train_step_k
        from video3d_tpu.utils.prefetch import BatchPrefetcher

        put_stacked = lambda *xs: tuple(_to_dev(x) for x in xs)
        if args.dp:
            stacked_sh = NamedSharding(mesh, P(None, "frames"))
            put_stacked = lambda *xs: tuple(
                jax.device_put(x, stacked_sh) for x in xs
            )
        total = math.ceil(args.steps / K) * K
        if total != args.steps:
            print(f"steps rounded up to {total} "
                  f"(multiple of --steps-per-call {K})")
        # host gen overlaps the in-flight device call via a thread
        with BatchPrefetcher(next_batch, depth=2 * K) as fetch:
            done = 0
            pending = [(left, right, gt, valid)]  # reuse the init batch
            while done < total:
                while len(pending) < K:
                    pending.append(fetch())
                stacked = tuple(np.stack(x) for x in zip(*pending))
                pending.clear()
                batch_dev = put_stacked(*compact(*stacked))
                params, opt_state, losses = train_step_k(
                    model, tx, params, opt_state, *batch_dev
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
    print(f"Use it with: video-3d-depth <video> --guidance crestereo "
          f"--model {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
