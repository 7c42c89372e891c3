"""Shot-boundary detection for per-shot processing.

The reference pipeline processes a film with one global disparity range
(reference depth.py:84-100 hardcodes ``num_disparities=64``).  Stereo
content varies a lot by shot — close-ups use large disparities, wide
establishing shots tiny ones — and SGM cost is linear in D, so picking
D per shot (instead of per film) compounds the --auto-range win.  This
module supplies the shot segmentation; the per-shot probe + dispatch
live in stages/depth.py (``process_video_sbs_shots``).

Detection is the classic downsampled-luma difference test: a cut is a
frame whose mean absolute luma change spikes well above the local
activity level.  It runs in the host decode thread (IO-bound — the
8x8-strided luma diff is trivia next to PNG/H.264 decode) and needs no
device round-trips, keeping the TPU free for the depth programs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _luma_small(batch: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 RGB -> (B, h', w') float32 luma, 8x strided."""
    small = batch[:, ::8, ::8, :].astype(np.float32)
    return small @ np.array([0.299, 0.587, 0.114], np.float32)


def detect_shots(
    video_path: str,
    start_frame: int = 0,
    max_frames: Optional[int] = None,
    threshold: float = 24.0,
    rel_factor: float = 2.0,
    min_shot_len: int = 12,
    batch_size: int = 32,
) -> List[Tuple[int, int]]:
    """Segment ``video_path`` into shots; returns [(start, end), ...).

    A boundary is declared at frame t when the mean |luma(t) - luma(t-1)|
    exceeds BOTH ``threshold`` (absolute, 0-255 scale) and ``rel_factor``
    times the rolling median difference of the surrounding ±12 frames —
    the absolute gate keeps static shots quiet, the relative gate keeps
    high-motion shots from fragmenting.  Shots shorter than
    ``min_shot_len`` are merged into their predecessor.  Frame indices
    are absolute (include ``start_frame``), covering exactly
    [start_frame, start_frame + n_read).
    """
    from video3d_tpu.core.video import VideoReader

    reader = VideoReader(
        str(video_path), start_frame=start_frame, max_frames=max_frames,
        batch_size=batch_size,
    )
    diffs: List[float] = []
    prev_last = None
    n_read = 0
    for batch, valid in reader:
        if not valid:
            break
        luma = _luma_small(batch[:valid])
        if prev_last is not None:
            pair = np.concatenate([prev_last[None], luma], axis=0)
        else:
            pair = luma
        d = np.abs(np.diff(pair, axis=0)).mean(axis=(1, 2))
        diffs.extend(float(x) for x in d)
        prev_last = luma[-1]
        n_read += int(valid)
    if n_read == 0:
        return []
    if not diffs:  # single frame
        return [(start_frame, start_frame + n_read)]

    diffs_arr = np.asarray(diffs, np.float32)  # diffs_arr[i] = |f[i+1]-f[i]|
    cuts: List[int] = []
    win = 12
    for i, d in enumerate(diffs_arr):
        if d < threshold:
            continue
        lo, hi = max(0, i - win), min(len(diffs_arr), i + win + 1)
        neighborhood = np.delete(diffs_arr[lo:hi], i - lo)
        local = float(np.median(neighborhood)) if neighborhood.size else 0.0
        if d >= rel_factor * max(local, 1.0):
            cuts.append(i + 1)  # first frame of the new shot (relative)

    bounds = [0] + cuts + [n_read]
    shots: List[Tuple[int, int]] = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if shots and e - s < min_shot_len:
            shots[-1] = (shots[-1][0], e)  # merge short shot backwards
        else:
            shots.append((s, e))
    # a short FIRST shot can only merge forward
    if len(shots) > 1 and shots[0][1] - shots[0][0] < min_shot_len:
        shots[1] = (shots[0][0], shots[1][1])
        shots.pop(0)
    return [(start_frame + s, start_frame + e) for s, e in shots]
