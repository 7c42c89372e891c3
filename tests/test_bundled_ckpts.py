"""The bundled checkpoints must load through the product guidance path.

The repo ships trained weights (``mono_ckpt/``, ``crestereo_ckpt/``) that
the depth stage resolves by default for ``--guidance mono|crestereo``
(stages/depth.py, the bundled-path fallback mirroring the reference's
default-model behavior, reference depth.py:60-82). Checkpoint promotion
swaps these directories wholesale; this test catches a promotion that
leaves a structurally incompatible or corrupt artifact behind.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load(guidance: str):
    from video3d_tpu.stages.depth import StereoDepthExtractor

    ex = StereoDepthExtractor(guidance=guidance)
    ex.load_model()
    # load_model soft-falls-back to stereo-only on failure; for the
    # BUNDLED artifacts a fallback means the shipped weights are broken
    assert ex._guidance_fn is not None, (
        f"bundled {guidance} checkpoint failed to load (soft fallback hit)"
    )
    return ex._guidance_fn


@pytest.mark.skipif(not (REPO / "mono_ckpt").is_dir(),
                    reason="mono_ckpt not bundled")
def test_bundled_mono_ckpt_loads_and_infers():
    fn = _load("mono")
    out = np.asarray(fn(np.random.default_rng(0)
                        .random((1, 128, 256, 3), dtype=np.float32)))
    assert out.shape == (1, 128, 256)
    assert np.isfinite(out).all()
    # a trained (non-degenerate) net varies over the image
    assert float(out.std()) > 1e-3


@pytest.mark.skipif(not (REPO / "crestereo_ckpt").is_dir(),
                    reason="crestereo_ckpt not bundled")
def test_bundled_crestereo_ckpt_loads_and_infers():
    fn = _load("crestereo")
    rng = np.random.default_rng(0)
    left = rng.random((1, 128, 256, 3), dtype=np.float32)
    right = np.roll(left, -4, axis=2)  # constant 4-px disparity
    out = np.asarray(fn(left, right))
    assert out.shape == (1, 128, 256)
    assert np.isfinite(out).all()
    # on a rolled pair the net should see roughly the planted disparity
    inner = out[:, 16:-16, 32:-32]
    assert 1.0 < float(np.median(inner)) < 12.0
