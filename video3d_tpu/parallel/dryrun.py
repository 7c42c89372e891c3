"""Multi-chip dryrun body: frame-sharded inference + dp-sharded training.

Runs the frame-sharded depth pipeline (with ppermute temporal halo
exchange) and a full dp-sharded CREStereo training step on an n-device
mesh. When fewer than n real devices exist, the platform is forced to
virtual CPU devices *before any JAX backend initializes* — the host
sitecustomize pins ``JAX_PLATFORMS=axon`` at interpreter boot, so this
module must run in a fresh process (``python -m
video3d_tpu.parallel.dryrun N``) or be imported before anything calls
``jax.devices()``.

Validates that the multi-chip sharding layout (SURVEY.md §2.3: dp over a
``frames`` mesh, temporal halo via two ppermute rings, replicated model
params) compiles and executes without n real chips.
"""

from __future__ import annotations

import os
import sys


def _force_virtual_devices(n_devices: int) -> None:
    """Force n virtual CPU devices. MUST run before backend init."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the sitecustomize may have imported jax already with the platform
    # pinned via env; jax.config wins as long as no backend initialized
    jax.config.update("jax_platforms", "cpu")


def run_body(n_devices: int) -> None:
    """The dryrun itself; assumes >= n_devices JAX devices exist."""
    import jax
    import numpy as np

    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices, have {len(devs)} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count)"
    )

    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.parallel.mesh import frames_mesh
    from video3d_tpu.parallel.sharded import sharded_depth_pipeline

    mesh = frames_mesh(devs[:n_devices])
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255, size=(2 * n_devices, 32, 128, 3), dtype=np.uint8
    )
    out = sharded_depth_pipeline(
        frames,
        mesh=mesh,
        params=SGBMParams(num_disparities=16, speckle_window_size=0),
        unsqueeze=True,
        apply_speckle=False,
        temporal_filter=True,
    )
    out.block_until_ready()
    assert out.shape == (2 * n_devices, 32, 128)
    assert out.dtype.name == "uint16"
    print(
        f"dryrun_multichip OK: {n_devices} devices, out {out.shape} "
        f"{out.dtype}, sharding {out.sharding}"
    )

    # guidance + flow-EMA smoothing variant: exercises the neural-
    # guidance blend (replicated params under pjit partitioning) and the
    # causal flow-EMA's warm-up halo exchange (flow_ema_sharded: one
    # ppermute ring per input) on the same mesh — the round-3 features'
    # multi-chip path (VERDICT r3 item 10)
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video3d_tpu.models.crestereo import (
        CREStereoConfig,
        CREStereoLite,
        train_step,
    )
    from video3d_tpu.models.guidance import GuidanceFn

    cfg = CREStereoConfig.tiny()
    model = CREStereoLite(cfg)
    g_left = jnp.asarray(
        rng.uniform(0, 255, (1, 32, 128, 3)).astype(np.float32)
    )
    g_params = model.init(
        jax.random.key(1), g_left, jnp.roll(g_left, -2, axis=2)
    )

    def _cre_apply(p, left, right):
        return model.apply(p, left, right)

    guidance = GuidanceFn(_cre_apply, g_params, stereo=True)
    halo = 2
    frames_per_dev = 4  # > halo: each shard warms on neighbor frames
    frames_g = rng.integers(
        0, 255, size=(frames_per_dev * n_devices, 32, 128, 3),
        dtype=np.uint8,
    )
    out_g = sharded_depth_pipeline(
        frames_g,
        mesh=mesh,
        params=SGBMParams(num_disparities=16, speckle_window_size=0),
        unsqueeze=True,
        apply_speckle=False,
        guidance_fn=guidance,
        guidance_params=g_params,
        temporal_filter="flow",
        flow_halo=halo,
    )
    out_g.block_until_ready()
    assert out_g.shape == (frames_per_dev * n_devices, 32, 128)
    assert out_g.dtype.name == "uint16"
    print(
        f"dryrun_multichip guidance+flow OK: {n_devices} devices, out "
        f"{out_g.shape} {out_g.dtype}, halo {halo}"
    )

    # full TRAINING step of the CREStereo guidance model, dp-sharded over
    # the frames mesh (params/opt replicated, batch sharded)
    left = jnp.asarray(
        rng.uniform(0, 255, (n_devices, 32, 64, 3)).astype(np.float32)
    )
    right = jnp.roll(left, -3, axis=2)
    params = model.init(jax.random.key(0), left, right)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    batch_sharding = NamedSharding(mesh, P("frames"))
    replicated = NamedSharding(mesh, P())
    left = jax.device_put(left, batch_sharding)
    right = jax.device_put(right, batch_sharding)
    gt = jax.device_put(jnp.full((n_devices, 32, 64), 3.0), batch_sharding)
    valid = jax.device_put(jnp.ones((n_devices, 32, 64)), batch_sharding)
    params = jax.device_put(params, replicated)
    opt_state = jax.device_put(opt_state, replicated)

    params, opt_state, loss = train_step(
        model, tx, params, opt_state, left, right, gt, valid
    )
    jax.block_until_ready(params)
    assert float(loss) > 0.0
    print(
        f"dryrun_multichip train step OK: loss {float(loss):.3f}, "
        f"dp-sharded batch over {n_devices} devices"
    )


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    n_devices = int(argv[0]) if argv else 8
    _force_virtual_devices(n_devices)
    run_body(n_devices)


if __name__ == "__main__":
    main()
