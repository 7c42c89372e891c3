"""Pallas speckle kernel vs the jnp banded-vote reference.

The kernel must be bit-identical to ops.speckle.speckle_filter_device
(itself validated against the exact host flood-fill oracle in
test_stereo.py) across block boundaries, frame edges, and invalid
pixels.  Interpret mode on CPU.
"""

import numpy as np
import pytest

from video3d_tpu.kernels.speckle import (
    speckle_block_rows,
    speckle_filter_pallas,
)
from video3d_tpu.ops.speckle import speckle_filter_device


def _random_disp(rng, b, h, w, invalid=-1.0):
    disp = rng.uniform(0, 64, (b, h, w)).astype(np.float32)
    disp[rng.uniform(size=disp.shape) < 0.3] = invalid
    return disp


def _blobby_disp(rng, b, h, w, invalid=-1.0):
    """Smooth background + small outlier blobs (the speckle failure mode)."""
    disp = np.full((b, h, w), 20.0, np.float32)
    disp += rng.normal(0, 2.0, disp.shape).astype(np.float32)
    for bi in range(b):
        for _ in range(6):
            y, x = rng.integers(0, h - 3), rng.integers(0, w - 3)
            disp[bi, y : y + 2, x : x + 3] = 60.0  # isolated 6-px blob
    disp[rng.uniform(size=disp.shape) < 0.1] = invalid
    return disp


@pytest.mark.parametrize(
    "h,w,min_region",
    [
        (80, 128, 9),  # two row blocks (rows=40, radius=3)
        (240, 160, 9),  # four row blocks
        (48, 128, 9),  # single block (nblk=1 lookahead edge case)
        (80, 128, 25),  # radius 5
        (80, 128, 100),  # radius 10: production default
        (240, 256, 100),  # radius 10 across several row blocks
    ],
)
def test_pallas_speckle_matches_device(h, w, min_region):
    rng = np.random.default_rng(0)
    disp = _random_disp(rng, 2, h, w)
    ref = np.asarray(
        speckle_filter_device(disp, invalid=-1.0, max_diff=32.0,
                              min_region=min_region)
    )
    out = np.asarray(
        speckle_filter_pallas(disp, invalid=-1.0, max_diff=32.0,
                              min_region=min_region, interpret=True)
    )
    np.testing.assert_array_equal(out, ref)


def test_pallas_speckle_removes_blobs_keeps_surface():
    # max_diff=8 -> 9 bands, so the 60-valued blobs (band 7) are far from
    # the ~20 background (band 2) and get no adjacent-band support
    rng = np.random.default_rng(1)
    disp = _blobby_disp(rng, 1, 80, 128)
    out = np.asarray(
        speckle_filter_pallas(disp, invalid=-1.0, max_diff=8.0,
                              min_region=9, interpret=True)
    )
    ref = np.asarray(
        speckle_filter_device(disp, invalid=-1.0, max_diff=8.0,
                              min_region=9)
    )
    np.testing.assert_array_equal(out, ref)
    # blobs (value 60, band 1 vs background band 0) are invalidated
    assert not (out == 60.0).any()
    # the smooth surface survives
    assert (np.abs(out - 20.0) < 10).mean() > 0.5


def test_block_rows_selection():
    assert speckle_block_rows(1080, 10) == 72  # largest 8-multiple divisor
    assert speckle_block_rows(80, 3) == 40
    assert speckle_block_rows(48, 10) == 48
    assert speckle_block_rows(2160, 10) == 72  # 4K
    assert speckle_block_rows(22, 10) == 22  # full-height single block
    assert speckle_block_rows(11, 10) == 11
    assert speckle_block_rows(13, 12) == 13
    assert speckle_block_rows(10, 10) is None
    assert speckle_block_rows(1000, 10) == 40


def test_min_region_zero_is_identity():
    rng = np.random.default_rng(2)
    disp = _random_disp(rng, 1, 48, 64)
    out = speckle_filter_pallas(disp, -1.0, 32.0, 0, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), disp)
