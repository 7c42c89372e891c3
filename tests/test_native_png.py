"""Native C++ PNG16 codec (native/png16.cc via core/_native.py).

Round-trips, cv2 interoperability both directions, batch-to-files API,
and the DepthMapWriter integration. Skipped wholesale if the toolchain
could not build the library (cv2 fallback covers those hosts).
"""

import numpy as np
import pytest

from video3d_tpu.core import _native

pytestmark = pytest.mark.skipif(
    _native.lib() is None, reason="native library unavailable"
)


def test_roundtrip_random_and_smooth():
    rng = np.random.default_rng(0)
    for img in (
        rng.integers(0, 65536, (64, 96)).astype(np.uint16),
        (np.outer(np.arange(64), np.arange(96)) % 65536).astype(np.uint16),
        np.zeros((8, 128), np.uint16),
        np.full((8, 128), 65535, np.uint16),
    ):
        data = _native.encode_png16(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        back = _native.decode_png16(data)
        np.testing.assert_array_equal(back, img)


def test_cv2_interop(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (48, 64)).astype(np.uint16)
    # cv2 reads ours
    (tmp_path / "a.png").write_bytes(_native.encode_png16(img))
    np.testing.assert_array_equal(
        cv2.imread(str(tmp_path / "a.png"), cv2.IMREAD_UNCHANGED), img
    )
    # we read cv2's
    cv2.imwrite(str(tmp_path / "b.png"), img)
    np.testing.assert_array_equal(
        _native.decode_png16((tmp_path / "b.png").read_bytes()), img
    )


def test_batch_encode_to_files(tmp_path):
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 65536, (5, 32, 40)).astype(np.uint16)
    paths = [str(tmp_path / f"f{i}.png") for i in range(5)]
    assert _native.encode_batch_to_files(batch, paths) == 0
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(
            _native.decode_png16(open(p, "rb").read()), batch[i]
        )


def test_depth_writer_uses_native(tmp_path):
    from video3d_tpu.core.depthio import DepthMapWriter, load_depth_png16

    rng = np.random.default_rng(3)
    batch = rng.integers(0, 65536, (4, 16, 24)).astype(np.uint16)
    with DepthMapWriter(tmp_path) as w:
        w.put(batch, 10, 3)  # only 3 valid, offset 10
    files = sorted(tmp_path.glob("depth_*.png"))
    assert [f.name for f in files] == [
        "depth_000010.png", "depth_000011.png", "depth_000012.png"
    ]
    np.testing.assert_array_equal(load_depth_png16(files[1]), batch[1])


def test_decode_rejects_garbage():
    assert _native.decode_png16(b"not a png at all") is None
