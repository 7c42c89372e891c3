"""CLI: depth-extraction server -- keeps the compiled pipeline hot.

Every CLI invocation is a fresh process that pays the XLA compile of the
depth program (tens of seconds; minutes through a remote-compile
tunnel). For production serving, this daemon compiles once and processes
jobs submitted over a UNIX socket, line-delimited JSON:

    request:  {"video": "...", "max_frames": 100, "start_frame": 0,
               "force": false, "work_dir": "...",
               "temporal_smooth": "none|median|flow", "devices": K,
               "fill_holes": true}
              (work_dir / temporal_smooth / devices optional; a job's
              first use of a new temporal_smooth value compiles that
              variant once, then it stays hot)
    response: {"ok": true, "cache_dir": "...", "frames": N,
               "seconds": S, "devices_used": K}
              |  {"ok": false, "error": "..."}

Multi-chip serving: the server owns a pool of all visible devices. Each
job acquires up to ``--fanout`` free chips (at least one, waiting if the
pool is empty) and fans its frame range out across them -- contiguous
per-chip slices with halo-correct seams into one shared cache
(StereoDepthExtractor.process_video_sbs_fanout). Requests are handled
on threads, so small jobs run concurrently on different chips while
``ping``/``status`` stay responsive; jobs queue on the device pool when
the pod is busy.

Async jobs: add ``"async": true`` to a job request and the server
replies immediately with ``{"ok": true, "job_id": "...", "state":
"queued"}``; the job runs on a worker thread (queueing on the device
pool like any other). Poll with ``{"cmd": "job_status", "job_id":
"..."}`` -- ``state`` walks queued -> running -> done|error and the
final response appears under ``"result"``; ``{"cmd": "jobs"}`` lists
all jobs this server has seen.

Also usable as a client: ``video-3d-serve --submit job.json`` (or
``--submit -`` reading JSON from stdin) sends one request and prints the
response. ``{"cmd": "ping"}`` health-checks; ``{"cmd": "status"}``
reports pool occupancy; ``{"cmd": "shutdown"}`` stops the server.

The reference has no serving story (single-shot scripts); this is the
runtime component a deployment needs around the TPU compute path.
"""

from __future__ import annotations

import argparse
import copy
import json
import queue
import socket
import socketserver
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-serve",
        description="Serve depth extraction over a UNIX socket "
        "(compile once, process many; jobs fan out over the device pool)",
    )
    p.add_argument("--socket", default="/tmp/video3d_tpu.sock")
    p.add_argument("--work-dir", default="temp_depth_server",
                   help="Default work dir for jobs that don't set one")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--guidance", choices=["none", "dpt", "crestereo", "mono"],
                   default="crestereo",
                   help="Guidance backend for all jobs (resolved once at "
                        "boot). Default matches the depth CLI's bundled "
                        "hybrid; pass 'none' for stereo-only throughput")
    p.add_argument("--model", default="Intel/dpt-large")
    p.add_argument("--no-unsqueeze", action="store_true")
    p.add_argument("--temporal-smooth", default=None,
                   choices=("none", "median", "flow"),
                   help="Default temporal depth filtering for jobs that "
                        "don't set one")
    p.add_argument("--blend", default="confidence",
                   choices=("confidence", "fixed"),
                   help="Guidance mixing mode (see video-3d-depth --blend)")
    p.add_argument("--fanout", type=int, default=None,
                   help="Max devices one job may fan out over (default: "
                        "all visible devices; jobs can lower it per-"
                        "request with 'devices')")
    p.add_argument("--submit", default=None, metavar="JOB_JSON",
                   help="Client mode: send one request (a JSON file, an "
                   "inline JSON string, or '-' for stdin) and exit")
    return p


def _client(sock_path: str, payload: dict) -> dict:
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(sock_path)
        s.sendall((json.dumps(payload) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode())


class DevicePool:
    """Pool of jax devices jobs draw from.

    ``acquire(k)`` blocks for one device, then opportunistically grabs
    up to k-1 more without waiting -- a lone small job gets the whole
    pod, concurrent jobs split it, and arrivals during a busy period
    queue on the blocking get.
    """

    def __init__(self, devices):
        self._q: "queue.Queue" = queue.Queue()
        for d in devices:
            self._q.put(d)
        self.total = len(devices)

    def acquire(self, k: int):
        devs = [self._q.get()]
        while len(devs) < k:
            try:
                devs.append(self._q.get_nowait())
            except queue.Empty:
                break
        return devs

    def release(self, devs) -> None:
        for d in devs:
            self._q.put(d)

    def free(self) -> int:
        return self._q.qsize()


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.submit is not None:
        raw = args.submit
        if raw == "-":
            raw = sys.stdin.read()
        elif Path(raw).exists():
            raw = Path(raw).read_text()
        resp = _client(args.socket, json.loads(raw))
        print(json.dumps(resp))
        return 0 if resp.get("ok") else 1

    import jax

    from video3d_tpu.stages.depth import StereoDepthExtractor

    extractor = StereoDepthExtractor(
        work_dir=args.work_dir,
        batch_size=args.batch_size,
        guidance=args.guidance,
        model_checkpoint=args.model,
        unsqueeze_anamorphic=not args.no_unsqueeze,
        temporal_smooth=args.temporal_smooth,
        blend=args.blend,
    )
    # resolve guidance once at boot; per-job shallow copies share the
    # loaded model (and the process-wide jit cache)
    extractor.load_model()

    pool = DevicePool(jax.devices())
    fanout_cap = args.fanout if args.fanout else pool.total

    sock_path = Path(args.socket)
    if sock_path.exists():
        sock_path.unlink()

    import itertools
    import threading

    jobs: dict = {}  # job_id -> {"state", "submitted", "result"?}
    jobs_lock = threading.Lock()
    job_seq = itertools.count(1)

    def execute(req: dict) -> dict:
        """Run one depth job to completion; returns the response dict.
        Raises on invalid requests (validated BEFORE any state is
        touched)."""
        t0 = time.time()
        ts = req.get("temporal_smooth")
        if ts is not None and ts not in ("none", "median", "flow"):
            raise ValueError(f"bad temporal_smooth: {ts}")
        fh = req.get("fill_holes")
        if "video" not in req:
            raise ValueError("request missing 'video'")
        want = int(req.get("devices", fanout_cap))
        if want < 1:
            raise ValueError(f"bad devices: {want}")
        # per-job options go on a shallow copy -- concurrent jobs must
        # not see each other's overrides (the server object itself is
        # never mutated after boot)
        job_ex = extractor
        if req.get("work_dir") or ts is not None or fh is not None:
            job_ex = copy.copy(extractor)
            if req.get("work_dir"):
                job_ex.work_dir = Path(req["work_dir"])
                job_ex.work_dir.mkdir(parents=True, exist_ok=True)
            if ts is not None:
                job_ex.temporal_smooth = ts
                job_ex.temporal_median = ts == "median"
            if fh is not None:
                job_ex.fill_holes = bool(fh)
        devs = pool.acquire(min(want, fanout_cap))
        try:
            cache = job_ex.process_video_sbs_fanout(
                req["video"],
                devs,
                start_frame=int(req.get("start_frame", 0)),
                max_frames=req.get("max_frames"),
                force=bool(req.get("force", False)),
            )
        finally:
            pool.release(devs)
        n = len(list(Path(cache).glob("depth_*.png")))
        return {
            "ok": True,
            "cache_dir": str(cache),
            "frames": n,
            "seconds": round(time.time() - t0, 3),
            "devices_used": len(devs),
        }

    def run_async(job_id: str, req: dict) -> None:
        with jobs_lock:
            jobs[job_id]["state"] = "running"
        try:
            result = execute(req)
        except Exception as e:
            with jobs_lock:
                jobs[job_id].update(
                    state="error",
                    result={"ok": False,
                            "error": f"{type(e).__name__}: {e}"},
                )
            return
        with jobs_lock:
            jobs[job_id].update(state="done", result=result)

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            line = self.rfile.readline()
            if not line:
                return
            try:
                req = json.loads(line.decode())
            except json.JSONDecodeError as e:
                self._reply({"ok": False, "error": f"bad json: {e}"})
                return
            if req.get("cmd") == "ping":
                self._reply({"ok": True, "pong": True})
                return
            if req.get("cmd") == "status":
                with jobs_lock:
                    active = sum(
                        1 for j in jobs.values()
                        if j["state"] in ("queued", "running")
                    )
                self._reply({
                    "ok": True,
                    "devices_total": pool.total,
                    "devices_free": pool.free(),
                    "fanout": fanout_cap,
                    "jobs_active": active,
                })
                return
            if req.get("cmd") == "job_status":
                with jobs_lock:
                    job = jobs.get(req.get("job_id"))
                    job = dict(job) if job else None
                if job is None:
                    self._reply({"ok": False,
                                 "error": f"unknown job_id: "
                                          f"{req.get('job_id')}"})
                else:
                    self._reply({"ok": True,
                                 "job_id": req["job_id"], **job})
                return
            if req.get("cmd") == "jobs":
                with jobs_lock:
                    listing = [
                        {"job_id": k, "state": v["state"],
                         "submitted": v["submitted"]}
                        for k, v in jobs.items()
                    ]
                self._reply({"ok": True, "jobs": listing})
                return
            if req.get("cmd") == "shutdown":
                self._reply({"ok": True, "stopping": True})
                self.server._shutdown_requested = True
                return
            if req.get("async"):
                job_id = f"job-{next(job_seq)}"
                with jobs_lock:
                    jobs[job_id] = {"state": "queued",
                                    "submitted": round(time.time(), 3)}
                threading.Thread(
                    target=run_async, args=(job_id, req), daemon=True
                ).start()
                self._reply({"ok": True, "job_id": job_id,
                             "state": "queued"})
                return
            try:
                self._reply(execute(req))
            except Exception as e:  # report, keep serving
                self._reply({"ok": False, "error": f"{type(e).__name__}: {e}"})

        def _reply(self, obj):
            self.wfile.write((json.dumps(obj) + "\n").encode())

    class Server(socketserver.ThreadingMixIn, socketserver.UnixStreamServer):
        daemon_threads = True
        _shutdown_requested = False

        def service_actions(self):
            if self._shutdown_requested:
                raise KeyboardInterrupt

    print(f"video3d_tpu depth server on {sock_path} "
          f"(guidance={args.guidance}, devices={pool.total}, "
          f"fanout<={fanout_cap}); jobs are line-delimited JSON")
    with Server(str(sock_path), Handler) as srv:
        try:
            srv.serve_forever(poll_interval=0.2)
        except KeyboardInterrupt:
            pass
        finally:
            if sock_path.exists():
                sock_path.unlink()
    print("server stopped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
