"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md SS4-c).

Covers the frames-axis mesh, the sharded depth pipeline (dp over frames),
and the temporal median halo exchange -- checked exactly against the
single-device local implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video3d_tpu.ops.stereo import SGBMParams
from video3d_tpu.parallel import (
    frames_mesh,
    sharded_depth_pipeline,
    temporal_median3,
)
from video3d_tpu.parallel.mesh import shard_frames
from video3d_tpu.parallel.temporal import temporal_median3_local


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return frames_mesh(devs[:8])


def test_temporal_median_matches_local(mesh8):
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0, 100, (16, 8, 32)).astype(np.float32))
    ref = np.asarray(temporal_median3_local(depth))
    sharded = jax.device_put(depth, shard_frames(mesh8))
    out = np.asarray(jax.jit(lambda d: temporal_median3(d, mesh8))(sharded))
    np.testing.assert_allclose(out, ref)


def test_sharded_depth_pipeline_matches_single_device(mesh8):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(8, 32, 128, 3), dtype=np.uint8)
    p = SGBMParams(num_disparities=16, speckle_window_size=0)

    from video3d_tpu.stages.depth import depth_batch_pipeline

    ref = np.asarray(
        depth_batch_pipeline(
            jnp.asarray(frames), params=p, unsqueeze=True, apply_speckle=False
        )
    )
    out = np.asarray(
        sharded_depth_pipeline(
            frames, mesh=mesh8, params=p, unsqueeze=True, apply_speckle=False
        )
    )
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (8, 32, 128)


def test_sharded_with_temporal_filter_runs(mesh8):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(16, 32, 128, 3), dtype=np.uint8)
    p = SGBMParams(num_disparities=16, speckle_window_size=0)
    out = sharded_depth_pipeline(
        frames, mesh=mesh8, params=p, unsqueeze=False, apply_speckle=False,
        temporal_filter=True,
    )
    out = np.asarray(out)
    assert out.shape == (16, 32, 64) and out.dtype == np.uint16


def test_temporal_median_stream_matches_whole_stream():
    from video3d_tpu.parallel.temporal import TemporalMedianStream

    rng = np.random.default_rng(3)
    stream = jnp.asarray(rng.uniform(0, 100, (11, 4, 8)).astype(np.float32))
    ref = np.asarray(temporal_median3_local(stream))
    s = TemporalMedianStream()
    outs = []
    # uneven batch sizes, including a size-1 tail
    for chunk in (stream[:4], stream[4:7], stream[7:10], stream[10:]):
        out = s.push(chunk)
        if out is not None:
            outs.append(np.asarray(out))
    outs.append(np.asarray(s.flush()))
    np.testing.assert_allclose(np.concatenate(outs), ref)


def test_depth_stage_temporal_median(tmp_path):
    from tests.test_depth_stage import make_sbs_video
    from video3d_tpu.stages.depth import StereoDepthExtractor

    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=5, shift=4)
    ext = StereoDepthExtractor(
        work_dir=str(tmp_path / "w"), batch_size=2,
        unsqueeze_anamorphic=False, apply_speckle=False, temporal_median=True,
    )
    cache = ext.process_video_sbs(str(video), max_frames=5)
    files = sorted(cache.glob("depth_*.png"))
    assert len(files) == 5


def test_stage_timer_and_memory_stats():
    from video3d_tpu.utils.profiling import StageTimer, device_memory_stats

    t = StageTimer()
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    assert set(t.timings) == {"a", "b"}
    assert "a" in t.summary()
    stats = device_memory_stats()
    assert "bytes_in_use" in stats
