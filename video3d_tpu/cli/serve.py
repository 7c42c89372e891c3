"""CLI: depth-extraction server -- keeps the compiled pipeline hot.

Every CLI invocation is a fresh process that pays the XLA compile of the
depth program (tens of seconds; minutes through a remote-compile
tunnel). For production serving, this daemon compiles once and processes
jobs submitted over a UNIX socket, line-delimited JSON:

    request:  {"video": "...", "max_frames": 100, "start_frame": 0,
               "force": false, "work_dir": "...",
               "temporal_smooth": "none|median|flow"}
              (work_dir / temporal_smooth optional; a job's first use of
              a new temporal_smooth value compiles that variant once,
              then it stays hot)
    response: {"ok": true, "cache_dir": "...", "frames": N,
               "seconds": S}  |  {"ok": false, "error": "..."}

Also usable as a client: ``video-3d-serve --submit job.json`` (or
``--submit -`` reading JSON from stdin) sends one request and prints the
response. ``{"cmd": "ping"}`` health-checks; ``{"cmd": "shutdown"}``
stops the server.

The reference has no serving story (single-shot scripts); this is the
runtime component a deployment needs around the TPU compute path.
"""

from __future__ import annotations

import argparse
import json
import socket
import socketserver
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-serve",
        description="Serve depth extraction over a UNIX socket "
        "(compile once, process many)",
    )
    p.add_argument("--socket", default="/tmp/video3d_tpu.sock")
    p.add_argument("--work-dir", default="temp_depth_server",
                   help="Default work dir for jobs that don't set one")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--guidance", choices=["none", "dpt", "crestereo"],
                   default="none")
    p.add_argument("--model", default="Intel/dpt-large")
    p.add_argument("--no-unsqueeze", action="store_true")
    p.add_argument("--temporal-smooth", default=None,
                   choices=("none", "median", "flow"),
                   help="Default temporal depth filtering for jobs that "
                        "don't set one")
    p.add_argument("--blend", default="confidence",
                   choices=("confidence", "fixed"),
                   help="Guidance mixing mode (see video-3d-depth --blend)")
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

    sock_path = Path(args.socket)
    if sock_path.exists():
        sock_path.unlink()

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
            if req.get("cmd") == "shutdown":
                self._reply({"ok": True, "stopping": True})
                self.server._shutdown_requested = True
                return
            try:
                t0 = time.time()
                # Validate the whole request BEFORE touching extractor
                # state: a bad field must not leave a half-applied
                # override behind for later jobs (the server keeps
                # serving after errors).
                ts = req.get("temporal_smooth")
                if ts is not None and ts not in ("none", "median", "flow"):
                    raise ValueError(f"bad temporal_smooth: {ts}")
                if "video" not in req:
                    raise ValueError("request missing 'video'")
                # a per-job override must not leak into later jobs that
                # omit it -- restore the server default after
                default_work_dir = extractor.work_dir
                default_smooth = extractor.temporal_smooth
                try:
                    if req.get("work_dir"):
                        extractor.work_dir = Path(req["work_dir"])
                        extractor.work_dir.mkdir(parents=True, exist_ok=True)
                    if ts is not None:
                        extractor.temporal_smooth = ts
                        extractor.temporal_median = ts == "median"
                    cache = extractor.process_video_sbs(
                        req["video"],
                        start_frame=int(req.get("start_frame", 0)),
                        max_frames=req.get("max_frames"),
                        force=bool(req.get("force", False)),
                    )
                finally:
                    extractor.work_dir = default_work_dir
                    extractor.temporal_smooth = default_smooth
                    extractor.temporal_median = default_smooth == "median"
                n = len(list(Path(cache).glob("depth_*.png")))
                self._reply({
                    "ok": True,
                    "cache_dir": str(cache),
                    "frames": n,
                    "seconds": round(time.time() - t0, 3),
                })
            except Exception as e:  # report, keep serving
                self._reply({"ok": False, "error": f"{type(e).__name__}: {e}"})

        def _reply(self, obj):
            self.wfile.write((json.dumps(obj) + "\n").encode())

    class Server(socketserver.UnixStreamServer):
        _shutdown_requested = False

        def service_actions(self):
            if self._shutdown_requested:
                raise KeyboardInterrupt

    print(f"video3d_tpu depth server on {sock_path} "
          f"(guidance={args.guidance}); jobs are line-delimited JSON")
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
