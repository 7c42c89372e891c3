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
    p.add_argument("--data", default="v2", choices=("v1", "v2"))
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
    synth_fn = synthetic_batch if args.data == "v1" else synthetic_batch_v2

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

    def compact(rgb, gt, valid):  # cut relay traffic (see train_crestereo)
        return (np.clip(np.round(rgb), 0, 255).astype(np.uint8),
                gt.astype(np.float16), valid.astype(np.float16))

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
