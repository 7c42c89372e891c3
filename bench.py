"""Headline benchmark: SBS-1080p depth extraction throughput (frames/sec).

Runs the full on-device depth pipeline (SBS split, 2x Lanczos unsqueeze,
BT cost volume, 8-path SGM over 64 disparities, sub-pixel WTA + LR/
uniqueness checks, uint16 quantization) on synthetic 1080p SBS frames on
one chip, steady-state (post-compile), and prints ONE JSON line.

Baseline context (BASELINE.md): the reference publishes no numbers; its
depth path is a sequential per-frame OpenCV SGBM loop (depth.py:329-376)
measured at single-digit fps on desktop CPUs for 1080p/64-disparity
inputs. ``vs_baseline`` is reported against the BASELINE.json north-star
target of 62.5 fps/chip (=500 fps on a v5e-8 pod via linear frame
sharding).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_FPS_PER_CHIP = 500.0 / 8.0  # BASELINE.md north star, per chip


def main() -> None:
    import jax

    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    # 1080p SBS: 1920x1080 frame, two 960-wide eyes unsqueezed to 1920.
    h, w = 1080, 1920
    batch = 8  # block-batched SGM passes amortize per-scanline overhead
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(batch, h, w, 3), dtype=np.uint8)

    import jax.numpy as jnp
    from jax import lax

    # One compiled program runs n_iters pipeline evaluations chained by a
    # data dependency (each iteration's input is perturbed by the previous
    # checksum), then a single checksum is read back. This measures pure
    # device throughput: async completion through the device relay has
    # been observed to report early, and per-iteration host syncs pay the
    # relay round-trip instead of the kernel time.
    n_iters = 8

    @jax.jit
    def bench_loop(x0):
        def body(_, carry):
            x, acc = carry
            out = depth_batch_pipeline(
                x,
                params=SGBMParams(),
                unsqueeze=True,
                normalize="fixed",
                apply_speckle=True,
                guidance_fn=None,
            )
            s = jnp.sum(out.astype(jnp.uint32))
            x = x ^ (s % 2).astype(jnp.uint8)
            return x, acc + s

        return lax.fori_loop(0, n_iters, body, (x0, jnp.uint32(0)))[1]

    x = jax.device_put(frames)
    assert int(bench_loop(x)) > 0  # compile + warmup
    t0 = time.perf_counter()
    checksum = int(bench_loop(x))
    dt = time.perf_counter() - t0
    assert checksum > 0
    fps = batch * n_iters / dt

    print(
        json.dumps(
            {
                "metric": "sbs1080p_depth_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / TARGET_FPS_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
