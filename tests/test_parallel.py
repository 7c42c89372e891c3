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


def test_flow_ema_sharded_matches_stream_within_halo_bound(mesh8):
    """Sharded flow-EMA (ppermute warm-up halos) vs the exact single
    stream: interior frames must agree to the documented decay bound
    (alpha_min>=0.35 => carry mismatch decays by >=0.65/frame; with an
    8-frame halo the boundary error is ~0.03 of the carry scale)."""
    from video3d_tpu.ops.flow import FlowEMAParams, flow_ema_scan
    from video3d_tpu.parallel.temporal import flow_ema_sharded

    rng = np.random.default_rng(5)
    T, h, w = 32, 16, 32
    base = rng.uniform(20, 80, (h, w)).astype(np.float32)
    depth = np.stack([base + rng.normal(0, 2, (h, w)) for _ in range(T)])
    guide = np.stack(
        [base * 2 + rng.normal(0, 1, (h, w)) for _ in range(T)]
    ).astype(np.float32)
    p = FlowEMAParams(levels=2)

    # exact single-stream reference: frame 0 passthrough seeds the carry
    # (same head contract as TemporalFlowEMAStream / _local_scan)
    _, ref_tail = flow_ema_scan(
        (jnp.asarray(depth[0]), jnp.asarray(guide[0])),
        jnp.asarray(depth[1:]), jnp.asarray(guide[1:]), p,
    )
    ref = np.concatenate([depth[:1], np.asarray(ref_tail)], axis=0)

    out = np.asarray(
        flow_ema_sharded(
            jnp.asarray(depth), jnp.asarray(guide), mesh8, halo=3, params=p
        )
    )
    assert out.shape == (T, h, w)
    # interior agreement: carry mismatch (noise-scale, sigma=2) decays
    # by >= (1 - alpha_min) = 0.65 per halo frame => 0.65^3 * ~6 ~= 1.6
    err = np.abs(out - ref)
    assert err.max() < 2.5, err.max()
    assert err.mean() < 0.25, err.mean()


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


def test_frame_ranges_partitioning():
    from video3d_tpu.parallel.multihost import frame_ranges, host_frame_slice

    assert frame_ranges(10, 3) == [(0, 4), (4, 3), (7, 3)]
    assert frame_ranges(6, 3) == [(0, 2), (2, 2), (4, 2)]
    assert frame_ranges(2, 4) == [(0, 1), (1, 1), (2, 0), (2, 0)]
    # covers the stream exactly
    rs = frame_ranges(1001, 7)
    assert sum(c for _, c in rs) == 1001
    assert rs[0][0] == 0 and all(
        rs[i][0] + rs[i][1] == rs[i + 1][0] for i in range(6)
    )
    assert host_frame_slice(10, process_index=1, process_count=3) == (4, 3)


def test_multihost_sharded_depth_cache(tmp_path):
    """Three simulated hosts fill one shared cache with global numbering."""
    from unittest import mock

    from tests.test_depth_stage import make_sbs_video
    from video3d_tpu.stages.depth import StereoDepthExtractor

    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=7, shift=4)

    caches = []
    for host in range(3):
        ext = StereoDepthExtractor(
            work_dir=str(tmp_path / "w"), batch_size=2,
            unsqueeze_anamorphic=False, apply_speckle=False,
        )
        with mock.patch("jax.process_index", return_value=host), mock.patch(
            "jax.process_count", return_value=3
        ):
            caches.append(ext.process_video_sbs_sharded(str(video)))
    assert len(set(caches)) == 1  # one shared dir
    files = sorted(caches[0].glob("depth_*.png"))
    assert [f.name for f in files] == [f"depth_{i:06d}.png" for i in range(7)]


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


def test_dp_training_on_virtual_mesh(tmp_path):
    """CREStereo training with --dp shards the batch over the 8-device
    CPU mesh and still optimizes (the dryrun's layout through the real
    CLI surface)."""
    from video3d_tpu.cli.train_crestereo import main

    rc = main([
        "--synthetic", "--steps", "4", "--batch-size", "8",
        "--crop", "32", "64", "--iters", "2", "--max-disparity", "16",
        "--dp", "--log-every", "1",
        "--out", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    assert (tmp_path / "ckpt").is_dir()
