"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests use
XLA's host-platform virtual devices (SURVEY.md SS4-c). Must be set before
jax is imported anywhere.
"""

import os

# Hard override: the host env pins JAX_PLATFORMS to the real TPU tunnel
# (axon) and its sitecustomize imports jax at interpreter boot, so env
# vars set here are too late -- force the platform through jax.config
# (backends are still uninitialized when conftest runs).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_work(tmp_path):
    work = tmp_path / "work"
    work.mkdir()
    return work


def make_test_video(path, n_frames=12, width=128, height=64, fps=24.0, seed=0):
    """Write a small deterministic test video with cv2 (textured frames)."""
    import cv2

    # smooth content (gradients) so lossy mp4v encode stays near-exact
    yy, xx = np.mgrid[0:height, 0:width]
    base = np.stack(
        [
            (xx * 255 // max(width - 1, 1)),
            (yy * 255 // max(height - 1, 1)),
            ((xx + yy + seed * 37) * 255 // max(width + height - 2, 1)) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )
    assert writer.isOpened()
    frames = []
    for i in range(n_frames):
        frame = np.roll(base, i * 3, axis=1)
        frame[:8, :, :] = i * 9 % 256  # frame-index stripe
        frames.append(frame)
        writer.write(frame[..., ::-1])  # write expects BGR
    writer.release()
    return frames
