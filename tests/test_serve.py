"""Depth server: ping, job processing (warm pipeline), error handling,
shutdown -- over a real UNIX socket with the server in a subprocess."""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from tests.test_depth_stage import make_sbs_video
from video3d_tpu.cli.serve import _client


def _launch_server(tmp_path, n_devices=1, extra_args=()):
    sock = str(tmp_path / "srv.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if n_devices > 1:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}"
        )
    else:
        env.pop("XLA_FLAGS", None)
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # jax.config call, not env: the host sitecustomize may pin the
    # platform to a real TPU regardless of JAX_PLATFORMS
    boot = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from video3d_tpu.cli.serve import main; "
        "sys.exit(main(sys.argv[1:]))"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", boot,
         "--socket", sock, "--work-dir", str(tmp_path / "w"),
         # stereo-only: these tests exercise job/pool mechanics, not the
         # guidance backend (which defaults to the hybrid since round 5)
         "--guidance", "none",
         "--no-unsqueeze", "--batch-size", "2", *extra_args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for the socket
    for _ in range(300):
        if Path(sock).exists():
            break
        if proc.poll() is not None:
            raise RuntimeError(proc.stdout.read())
        time.sleep(0.1)
    else:
        proc.kill()
        raise RuntimeError("server socket never appeared")
    return sock, proc


def _stop_server(sock, proc):
    if proc.poll() is None:
        try:
            _client(sock, {"cmd": "shutdown"})
        except Exception:
            proc.kill()
        proc.wait(timeout=30)


@pytest.fixture
def server(tmp_path):
    sock, proc = _launch_server(tmp_path)
    yield sock
    _stop_server(sock, proc)


def test_serve_ping_job_error_shutdown(server, tmp_path):
    sock = server
    assert _client(sock, {"cmd": "ping"}) == {"ok": True, "pong": True}

    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=4, shift=4)
    resp = _client(sock, {"video": str(video), "max_frames": 4})
    assert resp["ok"], resp
    assert resp["frames"] == 4
    assert Path(resp["cache_dir"]).exists()

    # second job on the warm pipeline (cache hit for same request)
    t0 = time.time()
    resp2 = _client(sock, {"video": str(video), "max_frames": 4})
    assert resp2["ok"] and resp2["cache_dir"] == resp["cache_dir"]
    assert time.time() - t0 < 10  # warm + cached

    # bad request is reported, server keeps serving
    bad = _client(sock, {"video": "/nonexistent.mp4"})
    assert not bad["ok"] and "error" in bad
    assert _client(sock, {"cmd": "ping"})["ok"]

    # per-job temporal_smooth override: distinct cache, default restored
    resp3 = _client(
        sock,
        {"video": str(video), "max_frames": 4, "temporal_smooth": "median"},
    )
    assert resp3["ok"], resp3
    assert resp3["cache_dir"] != resp["cache_dir"]
    # a later job without the option uses the server default again
    resp4 = _client(sock, {"video": str(video), "max_frames": 4})
    assert resp4["ok"] and resp4["cache_dir"] == resp["cache_dir"]
    badts = _client(
        sock,
        {"video": str(video), "max_frames": 4, "temporal_smooth": "bogus"},
    )
    assert not badts["ok"] and "temporal_smooth" in badts["error"]

    # per-job fill_holes: distinct cache key, default restored after
    resp5 = _client(
        sock, {"video": str(video), "max_frames": 4, "fill_holes": True}
    )
    assert resp5["ok"], resp5
    assert resp5["cache_dir"] not in (resp["cache_dir"],
                                      resp3["cache_dir"])
    resp6 = _client(sock, {"video": str(video), "max_frames": 4})
    assert resp6["ok"] and resp6["cache_dir"] == resp["cache_dir"]


def test_serve_multichip_fanout(tmp_path):
    """One job sharded across a virtual 8-device mesh: the serve device
    pool fans the frame range out chip-per-slice into one shared cache,
    bit-identical to a single-device run (VERDICT r2 item 9)."""
    sock, proc = _launch_server(tmp_path, n_devices=8)
    try:
        st = _client(sock, {"cmd": "status"})
        assert st["ok"] and st["devices_total"] == 8
        assert st["devices_free"] == 8

        video = tmp_path / "sbs.mp4"
        make_sbs_video(video, n_frames=16, shift=4)
        resp = _client(sock, {"video": str(video), "max_frames": 16})
        assert resp["ok"], resp
        assert resp["frames"] == 16
        assert resp["devices_used"] == 8
        fan_dir = Path(resp["cache_dir"])
        assert sorted(p.name for p in fan_dir.glob("depth_*.png")) == [
            f"depth_{i:06d}.png" for i in range(16)
        ]

        # all devices back in the pool after the job
        st = _client(sock, {"cmd": "status"})
        assert st["devices_free"] == 8

        # single-device run of the same job -> bit-identical frames
        resp1 = _client(
            sock, {"video": str(video), "max_frames": 16, "devices": 1}
        )
        assert resp1["ok"] and resp1["devices_used"] == 1
        one_dir = Path(resp1["cache_dir"])
        assert one_dir != fan_dir  # separate cache-key spaces
        for i in range(16):
            a = (fan_dir / f"depth_{i:06d}.png").read_bytes()
            b = (one_dir / f"depth_{i:06d}.png").read_bytes()
            assert a == b, f"frame {i} differs between fanout and single"

        # resubmit hits the shared fanout cache
        resp2 = _client(sock, {"video": str(video), "max_frames": 16})
        assert resp2["ok"] and resp2["cache_dir"] == str(fan_dir)
    finally:
        _stop_server(sock, proc)


def test_serve_async_jobs(tmp_path):
    """Async submit returns immediately; job_status walks queued ->
    running -> done with the sync response under 'result'; 'jobs'
    lists it; unknown ids error."""
    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=6, shift=4)
    sock, proc = _launch_server(tmp_path)
    try:
        sub = _client(sock, {"video": str(video), "max_frames": 4,
                             "async": True})
        assert sub["ok"] and sub["state"] == "queued"
        jid = sub["job_id"]

        deadline = time.time() + 240
        st = None
        while time.time() < deadline:
            st = _client(sock, {"cmd": "job_status", "job_id": jid})
            assert st["ok"], st
            if st["state"] in ("done", "error"):
                break
            time.sleep(0.5)
        assert st["state"] == "done", st
        res = st["result"]
        assert res["ok"] and res["frames"] == 4
        assert Path(res["cache_dir"]).is_dir()

        listing = _client(sock, {"cmd": "jobs"})
        assert listing["ok"]
        assert any(j["job_id"] == jid and j["state"] == "done"
                   for j in listing["jobs"])

        bad = _client(sock, {"cmd": "job_status", "job_id": "nope"})
        assert not bad["ok"] and "unknown job_id" in bad["error"]

        # async error path: bad video lands in state=error
        sub2 = _client(sock, {"video": "/nonexistent.mp4", "async": True})
        jid2 = sub2["job_id"]
        deadline = time.time() + 60
        while time.time() < deadline:
            st2 = _client(sock, {"cmd": "job_status", "job_id": jid2})
            if st2["state"] in ("done", "error"):
                break
            time.sleep(0.2)
        assert st2["state"] == "error" and not st2["result"]["ok"]
    finally:
        _stop_server(sock, proc)
