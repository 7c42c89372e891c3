"""Render a synthetic SBS training clip for CREStereo self-training.

The self-training mix (``video-3d-train-crestereo --video ... --synthetic``)
pseudo-labels real footage with the SGM matcher. This sandbox has no real
footage (zero egress), so this tool renders the closest stand-in: a
side-by-side clip of layered-parallax scenes with TEMPORAL structure
(foreground slabs translating across frames, textures persisting between
frames) so the pseudo-labeling path sees video-shaped data.

Textures come from the v2 curriculum families
(train_crestereo.synthetic_batch_v2) — the eval-only OOD families of
tools/eval_stereo.py (checkerboards, flat cartoon rectangles, blocky
nearest-zoom noise) are deliberately NOT rendered here, so the OOD eval
keeps measuring generalization.

Reference intent: the reference trains nothing and ships no data tooling
(SURVEY.md §2.4-4); this supports the first-party CREStereo replacement.
"""

from __future__ import annotations

import argparse

import numpy as np


def render_clip(path: str, frames: int, h: int, w: int, max_disp: int,
                seed: int, fps: float = 24.0, scenes: int = 8) -> None:
    import cv2
    import scipy.ndimage as ndi

    from video3d_tpu.cli.train_crestereo import synthetic_batch_v2

    rng = np.random.default_rng(seed)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (2 * w, h))
    if not wr.isOpened():
        raise RuntimeError(f"cannot open VideoWriter for {path}")
    per_scene = max(1, frames // scenes)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    written = 0
    while written < frames:
        # one static scene (texture + base disparity) from the curriculum
        left0, right0, d0, _ = synthetic_batch_v2(rng, 1, h, w, max_disp)
        base = right0[0, :, :, 0]  # scene texture, right-eye crop origin
        # re-derive the full scene strip so slabs can move over it
        strip = np.pad(base, ((0, 0), (max_disp, 0)), mode="edge")
        d_bg = d0[0]
        # 1-3 moving foreground slabs with per-frame translation
        n_slabs = int(rng.integers(1, 4))
        slabs = []
        for _ in range(n_slabs):
            ph = int(rng.integers(h // 5, h // 2))
            pw = int(rng.integers(w // 6, w // 2))
            y0 = float(rng.integers(0, h - ph))
            x0 = float(rng.integers(0, w - pw))
            vy = float(rng.uniform(-2.0, 2.0))
            vx = float(rng.uniform(-4.0, 4.0))
            dfg = float(rng.uniform(max_disp * 0.45, max_disp - 1.0))
            slabs.append([y0, x0, ph, pw, vy, vx, dfg])
        for _ in range(per_scene):
            if written >= frames:
                break
            d = d_bg.copy()
            for s in slabs:
                y0, x0, ph, pw, vy, vx, dfg = s
                yi = int(np.clip(y0, 0, h - ph))
                xi = int(np.clip(x0, 0, w - pw))
                d[yi:yi + ph, xi:xi + pw] = dfg
                s[0] = (y0 + vy) % max(h - ph, 1)
                s[1] = (x0 + vx) % max(w - pw, 1)
            d = np.clip(d, 1.0, max_disp - 1.0)
            left = ndi.map_coordinates(strip, [yy, xx - d + max_disp],
                                       order=1, mode="nearest")
            sbs = np.concatenate([left, base], axis=1)
            sbs8 = np.clip(sbs, 0, 255).astype(np.uint8)
            wr.write(cv2.cvtColor(sbs8, cv2.COLOR_GRAY2BGR))
            written += 1
    wr.release()
    print(f"wrote {written} SBS frames ({2 * w}x{h}) to {path}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("out")
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--max-disparity", type=int, default=64)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--scenes", type=int, default=12)
    a = p.parse_args()
    render_clip(a.out, a.frames, a.height, a.width, a.max_disparity,
                a.seed, scenes=a.scenes)


if __name__ == "__main__":
    main()
