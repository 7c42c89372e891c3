"""Hybrid stereo depth extraction stage (reference: depth.py:20-476).

One canonically named extractor with pluggable guidance backends
(``guidance='none'|'dpt'|'crestereo'``), resolving the reference's broken
``IGEVStereoDepthExtractor`` import (SURVEY.md SS2.4-1/4).

TPU-first design: the whole per-batch pipeline -- SBS split, Lanczos
unsqueeze, grayscale, semi-global matching, optional neural-guidance blend,
normalization to uint16 -- is ONE jitted program over a static-shaped frame
batch. Host decode (VideoReader's background thread) overlaps device
compute; PNG16 encode runs on a host thread pool (DepthMapWriter). Contrast
the reference's fully sequential per-frame Python loop (depth.py:329-376).

Numeric contract reproduced (SURVEY.md SS2.5):
* SBS split with even-width check, 2x Lanczos-4 unsqueeze on by default
  (depth.py:254, :263-266, :31);
* SGBM params minDisparity=0, numDisparities=64, blockSize=5, P1=600,
  P2=2400, disp12MaxDiff=1, uniquenessRatio=10, speckle 100/32
  (depth.py:315-325); disparity is float sub-pixel like cv2's /16.0;
* hybrid blend 0.7*stereo + 0.3*mono with mono scaled to [0, 64]
  (depth.py:358-363); clamp <=0 -> 0 (depth.py:374);
* uint16 PNG output; default normalization is FIXED-RANGE
  (0..numDisparities) for inter-frame depth-scale consistency, with
  ``normalize='per_frame'`` reproducing the reference's per-frame min-max
  (depth.py:399-404; deviation rationale SURVEY.md SS2.4-8);
* md5 cache key (video, start, count, model, unsqueeze) and completeness
  check (depth.py:116-140).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video3d_tpu.core import DepthMapWriter, VideoReader, get_video_info
from video3d_tpu.core.cache import create_work_directory, depth_cache_dir
from video3d_tpu.core.xfer import to_device
from video3d_tpu.ops.image import rgb_to_gray, split_sbs, unsqueeze_width
from video3d_tpu.ops.stereo import (SGBMParams, sgbm_disparity,
                                    sgbm_disparity_jit)

# Guidance blend weights and mono scale (reference depth.py:358-363).
STEREO_WEIGHT = 0.7
MONO_WEIGHT = 0.3

# Bumped whenever the matcher's numeric output changes for identical
# inputs/options (e.g. the int16 cost volume + MODE_SGBM 5-path default
# in v2), so stale caches from older binaries never alias new runs.
ALGO_VERSION = 2


def confidence_trust_blend(
    disp: jnp.ndarray,
    margin: jnp.ndarray,
    guide: jnp.ndarray,
    *,
    min_disparity: float = 0.0,
    trust_scale: int = 1,
) -> jnp.ndarray:
    """Confidence-weighted stereo/guidance mixing (the ``blend='confidence'``
    default of :func:`depth_batch_pipeline`).

    The stereo weight per pixel is the texture-gated SGM uniqueness
    margin (ops.stereo.match_confidence) -- where block matching is
    certain (textured surfaces) the geometric stereo answer dominates;
    where it starves (low texture, occlusions, invalidated pixels) the
    learned backend takes over entirely. Replaces the reference's fixed
    0.7/0.3 (depth.py:358-363), which our eval shows dilutes the
    learned backend exactly where it wins (eval_stereo.json:
    hybrid-fixed low-tex bad1 0.235 vs pure CREStereo 0.079).

    Per-pixel guidance TRUST from local agreement: the blend hands
    low-confidence pixels to the guide only where the guide reproduces
    the nearby confident-stereo structure (any guide type -- CREStereo
    predicts disparity directly, mono/DPT after SSI alignment). A
    collapsed or out-of-distribution guide fails this check exactly
    where it would do damage and the frame degrades toward stereo-only
    (holes -> 0, the reference's invalid value) instead of being
    polluted. Measured (eval_stereo.json, bundled CREStereo, 2 px
    agreement tolerance): OOD hybrid bad1 0.62 -> 0.404 / bad3
    0.44 -> 0.272 (beats SGM's 0.345 at full coverage) while the
    in-dist win holds (bad1 0.094, best of all methods).

    ``trust_scale`` in {1, 2, 4}: >1 computes the trust field on an
    s-pooled grid (box-sum cost /s^2, same spatial support) and
    bilinearly expands the ratio. Module-level so the quality evals
    (tools/eval_stereo.py) gate reduced-resolution trust through the
    exact product numerics.
    """
    from video3d_tpu.ops.boxsum import box_sum_2d

    conf = jnp.where(disp > min_disparity - 0.5, margin, 0.0)
    stereo_pos = jnp.maximum(disp, 0.0)
    agree = jnp.where(jnp.abs(guide - stereo_pos) <= 2.0, conf, 0.0)
    conf_mass = jnp.sum(conf, axis=(-2, -1), keepdims=True)
    q_frame = jnp.where(
        conf_mass >= 32.0,  # else: nothing to judge -> trust
        jnp.sum(agree, axis=(-2, -1), keepdims=True)
        / jnp.maximum(conf_mass, 1e-6),
        1.0,
    )
    r_t = 8
    if trust_scale > 1:
        # reduced-resolution trust field: agreement mass is
        # low-frequency (r=8 box), so pool agree/conf s x s,
        # window at r_t/s, and bilinearly expand the ratio.
        # Cuts the gate's box-sum cost ~s^2; same support.
        from video3d_tpu.ops.image import resize2d

        s = int(trust_scale)
        bb = agree.shape[0]
        hh, ww = agree.shape[-2], agree.shape[-1]
        hq, wq = hh // s, ww // s

        def pool(a):
            return a[:, : hq * s, : wq * s].reshape(
                bb, hq, s, wq, s
            ).sum(axis=(2, 4))

        num = box_sum_2d(pool(agree), max(1, r_t // s))
        den = box_sum_2d(pool(conf), max(1, r_t // s))
        area = box_sum_2d(
            jnp.full((bb, hq, wq), float(s * s)), max(1, r_t // s)
        )
        trust_q = jnp.where(den > 0.02 * area,
                            num / jnp.maximum(den, 1e-6), q_frame)
        trust = resize2d(trust_q, hh, ww, method="bilinear")
    else:
        num = box_sum_2d(agree, r_t)
        den = box_sum_2d(conf, r_t)
        area = box_sum_2d(jnp.ones_like(conf), r_t)
        trust = jnp.where(den > 0.02 * area,
                          num / jnp.maximum(den, 1e-6), q_frame)
    conf = 1.0 - (1.0 - conf) * jnp.clip(trust, 0.0, 1.0)
    return conf * stereo_pos + (1.0 - conf) * guide


@partial(
    jax.jit,
    static_argnames=(
        "params",
        "unsqueeze",
        "normalize",
        "apply_speckle",
        "guidance_fn",
        "return_guide",
        "guide_scale",
        "guidance_every",
        "stereo_weight",
        "blend",
        "norm_disparities",
        "fill_holes",
        "trust_scale",
    ),
)
def depth_batch_pipeline(
    frames: jnp.ndarray,
    params: SGBMParams = SGBMParams(),
    unsqueeze: bool = True,
    normalize: str = "fixed",
    apply_speckle: bool = True,
    guidance_fn: Optional[Callable] = None,
    guidance_params=None,
    return_guide: bool = False,
    guide_scale: int = 4,
    guidance_every: int = 1,
    stereo_weight: float = STEREO_WEIGHT,
    blend: str = "confidence",
    norm_disparities: Optional[int] = None,
    fill_holes: bool = False,
    trust_scale: int = 1,
) -> jnp.ndarray:
    """uint8 SBS RGB batch (B, H, W, 3) -> uint16 depth batch (B, H, W').

    W' is W (unsqueezed anamorphic) or W//2. Entirely on-device; one XLA
    program. ``guidance_fn``, when given, maps the float32 RGB left-eye
    batch (B, H, W', 3) in [0, 255] to relative depth (B, H, W') and is
    blended 0.7/0.3 after scaling to [0, num_disparities].

    ``guidance_params``: the guidance network's weight pytree, passed as
    a TRACED argument so large models aren't baked into the compiled
    program as constants (models/guidance.py); when None, ``guidance_fn``
    may be a plain closure that carries its own weights.

    ``return_guide``: also return the reduced-resolution left-eye
    grayscale (B, ceil(H/s), ceil(W'/s)) float32 for s=``guide_scale``
    — the motion guide the flow-EMA temporal smoother consumes
    (ops/flow.py), computed inside the same program so no second
    decode/upload is needed. Scale 4 is the throughput default; scale 2
    halves the flow granularity (finer motion edges, ~4x flow cost).
    """
    left, right = split_sbs(frames)  # (B, H, W/2, 3) uint8
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    if unsqueeze:
        # resample each RGB channel's width: (B, H, W/2, 3) -> (B, H, W, 3)
        left = jnp.moveaxis(
            unsqueeze_width(jnp.moveaxis(left, -1, 1)), 1, -1
        )
        right = jnp.moveaxis(
            unsqueeze_width(jnp.moveaxis(right, -1, 1)), 1, -1
        )
    gl = rgb_to_gray(left)
    gr = rgb_to_gray(right)
    want_margin = guidance_fn is not None and blend == "confidence"
    res = sgbm_disparity(gl, gr, params, apply_speckle=apply_speckle,
                         return_margin=want_margin)
    disp, margin = res if want_margin else (res, None)

    if fill_holes:
        # background-extension occlusion fill (ops/fill.py). Runs
        # BEFORE the guidance blend: the confidence margin at former
        # holes stays ~0, so guidance still owns them when present;
        # stereo-only output gains full coverage.
        from video3d_tpu.ops.fill import fill_holes as _fill

        disp = _fill(disp, float(params.min_disparity - 1))

    if guidance_fn is not None:
        # keyframe guidance: run the (expensive) neural net on every Kth
        # frame of the batch and reuse its output for the K-1 frames in
        # between. Guidance is a low-frequency prior; the SSI alignment
        # below re-anchors its scale on EACH frame's confident stereo
        # and the trust gate hands disagreeing (stale) pixels back to
        # stereo, so staleness degrades toward stereo-only, never
        # pollutes. The cadence restarts at each batch boundary.
        kev = max(1, int(guidance_every))
        b = left.shape[0]

        def _apply(g_fn, *eyes):
            sub = tuple(e[::kev] for e in eyes) if kev > 1 else eyes
            out = (
                g_fn(*sub, params=guidance_params)
                if guidance_params is not None
                else g_fn(*sub)
            )
            if kev > 1:
                out = jnp.repeat(out, kev, axis=0)[:b]
            return out

        if getattr(guidance_fn, "stereo", False):
            # stereo guidance (e.g. CREStereo) predicts true disparity in
            # pixels from both eyes; blend directly
            guide = _apply(guidance_fn, left, right)
        else:
            mono = _apply(guidance_fn, left)  # (B, H, W') relative depth
            # reference contract: normalize to [0, num_disparities] per
            # frame (depth.py:358-360). Min-max is scale-arbitrary (the
            # frame's mono range always maps to the FULL disparity
            # range), which our eval shows wrecks the blend
            # (eval_stereo.json hybrid_conf_mono before this fix:
            # low-tex EPE 11.3 vs 0.6 for the stereo hybrid).
            mmin = jnp.min(mono, axis=(-2, -1), keepdims=True)
            mmax = jnp.max(mono, axis=(-2, -1), keepdims=True)
            guide = (
                (mono - mmin) / jnp.maximum(mmax - mmin, 1e-6)
                * float(params.num_disparities)
            )
            if blend == "confidence":
                # mono depth is affine-free: least-squares (s, t) align
                # it per frame onto the *confident* SGM disparities
                # (weights = the same texture-gated uniqueness margin
                # the blend uses), so the guide lands in true disparity
                # units. Degenerate fits (flat mono, no confident
                # stereo, anti-correlated s<=0) fall back to the
                # reference min-max contract.
                from video3d_tpu.models.mono import ssi_align

                conf_w = jnp.where(
                    disp > float(params.min_disparity) - 0.5, margin, 0.0
                )
                s, t = ssi_align(mono, jnp.maximum(disp, 0.0), conf_w)
                g_ssi = jnp.clip(mono * s + t, 0.0,
                                 float(params.num_disparities))
                guide = jnp.where(s > 0.0, g_ssi, guide)
        if blend == "confidence":
            disp = confidence_trust_blend(
                disp, margin, guide,
                min_disparity=float(params.min_disparity),
                trust_scale=trust_scale,
            )
        else:
            # reference blend contract 0.7/0.3 (depth.py:358-363);
            # stereo_weight=0 hands the frame to the learned backend
            disp = stereo_weight * disp + (1.0 - stereo_weight) * guide

    disp = jnp.maximum(disp, 0.0)  # clamp invalid/negative (depth.py:374)

    if normalize == "per_frame":
        # reference behavior: per-frame min-max to full uint16 (depth.py:399-404)
        dmin = jnp.min(disp, axis=(-2, -1), keepdims=True)
        dmax = jnp.max(disp, axis=(-2, -1), keepdims=True)
        scaled = (disp - dmin) / jnp.maximum(dmax - dmin, 1e-6) * 65535.0
    else:
        # fixed disparity range keeps inter-frame scale consistent;
        # norm_disparities overrides the denominator so per-shot
        # narrowed runs (process_video_sbs_shots) still encode every
        # shot on the film-wide scale
        scaled = disp * (65535.0 / float(
            norm_disparities or params.num_disparities))
    out = jnp.clip(scaled, 0.0, 65535.0).astype(jnp.uint16)
    if return_guide:
        from video3d_tpu.ops.image import resize2d

        h, w = gl.shape[-2], gl.shape[-1]
        s = int(guide_scale)
        guide = resize2d(gl, -(-h // s), -(-w // s), method="bilinear")
        return out, guide
    return out


class StereoDepthExtractor:
    """Stereo depth from SBS video with optional neural guidance.

    The intended surface of the reference's ``HybridStereoDepthExtractor``
    (depth.py:20-58) minus the CUDA hard-requirement: TPU/CPU chosen by
    JAX automatically; guidance degrades to stereo-only on any load
    failure, mirroring depth.py:107-114.
    """

    def __init__(
        self,
        work_dir: str = "temp_depth",
        batch_size: Optional[int] = None,
        guidance: str = "none",
        model_checkpoint: str = "Intel/dpt-large",
        unsqueeze_anamorphic: bool = True,
        normalize: str = "fixed",
        apply_speckle: bool = True,
        temporal_median: bool = False,
        temporal_smooth: Optional[str] = None,
        flow_scale: int = 4,
        stereo_weight: float = STEREO_WEIGHT,
        blend: str = "confidence",
        fill_holes: Optional[bool] = None,
        guidance_every: int = 4,
        trust_scale: int = 1,
        params: SGBMParams = SGBMParams(),
    ):
        """``guidance_every``: run the neural guidance on every Kth frame
        and reuse it in between (per-frame SSI alignment re-anchors its
        scale; the trust gate hands stale pixels back to stereo). The
        default K=4 is the DOCUMENTED hybrid configuration: measured on
        the keyframe temporal eval (tools/eval_keyframe.py,
        eval_keyframe.json) K=4 matches K=1 on accuracy (RMSE +5%, bad1
        +0.4pt) with LOWER flicker (0.51 vs 0.71) and equal moving-edge
        error, at ~30% higher hybrid throughput (bench_profile_hybrid).
        ``guidance_every=1`` restores the reference's per-frame neural
        inference (reference depth.py:348)."""
        self.work_dir = create_work_directory(work_dir)
        self.batch_size = batch_size
        self.guidance = guidance
        # the CLI's --model default names the DPT checkpoint; for the
        # crestereo backend resolve that default to the bundled trained
        # checkpoint at the repo root (shipped by tools/eval_stereo.py's
        # training recipe) so --guidance crestereo works out of the box
        if guidance == "crestereo" and model_checkpoint == "Intel/dpt-large":
            bundled = Path(__file__).resolve().parents[2] / "crestereo_ckpt"
            model_checkpoint = str(bundled)
        if guidance == "mono" and model_checkpoint == "Intel/dpt-large":
            bundled = Path(__file__).resolve().parents[2] / "mono_ckpt"
            model_checkpoint = str(bundled)
        self.model_checkpoint = model_checkpoint if guidance != "none" else "stereo_only"
        self.unsqueeze_anamorphic = bool(unsqueeze_anamorphic)
        self.normalize = normalize
        self.apply_speckle = bool(apply_speckle)
        # temporal_smooth in {None/'none', 'median', 'flow'};
        # temporal_median=True is the back-compat spelling of 'median'
        if temporal_smooth is None:
            temporal_smooth = "median" if temporal_median else "none"
        if temporal_smooth not in ("none", "median", "flow"):
            raise ValueError(
                f"temporal_smooth must be none|median|flow: {temporal_smooth}"
            )
        self.temporal_smooth = temporal_smooth
        self.temporal_median = temporal_smooth == "median"
        # flow granularity: motion is estimated on a 1/flow_scale guide,
        # so edges in the smoothed stream are flow_scale-px quantized; 2
        # halves the ghosting band around moving edges at ~4x flow cost
        if flow_scale not in (2, 4):
            raise ValueError(f"flow_scale must be 2 or 4: {flow_scale}")
        self.flow_scale = int(flow_scale)
        self.stereo_weight = float(stereo_weight)
        if blend not in ("confidence", "fixed"):
            raise ValueError(f"blend must be confidence|fixed: {blend}")
        self.blend = blend
        self.fill_holes = fill_holes
        if guidance_every < 1:
            raise ValueError(f"guidance_every must be >= 1: {guidance_every}")
        self.guidance_every = int(guidance_every)
        if trust_scale not in (1, 2, 4):
            raise ValueError(f"trust_scale must be 1, 2 or 4: {trust_scale}")
        self.trust_scale = int(trust_scale)
        self.params = params
        self._guidance_fn: Optional[Callable] = None
        self._guidance_loaded = False
        # fixed-normalization denominator override; set while processing
        # per-shot narrowed ranges so the PNG scale stays film-wide
        self._norm_disparities: Optional[int] = None

    # -- guidance backends -------------------------------------------------

    @property
    def fill_holes(self) -> bool:
        """Background-extension occlusion fill (ops/fill.py), AUTO by
        default: ON whenever a guidance net is active, OFF for
        stereo-only (reference parity: holes ship as 0, reference
        depth.py:374).

        The fill runs BEFORE the confidence blend, so it is the blend's
        stereo base -- untrusted/hole pixels degrade to background
        extension instead of 0. Quality-gated in eval_stereo.json
        (hybrid_conf_filled vs hybrid_conf, bundled ckpt): in-dist bad1
        0.060 vs 0.094, OOD 0.345 vs 0.404, rendered-clip LR bad1 0.256
        vs 0.411 -- better on every family, so it IS the default hybrid.
        Explicit True/False (CLI --fill-holes/--no-fill-holes) overrides.
        Guidance soft-fallback to stereo-only also reverts the auto fill,
        keeping the parity contract."""
        if self._fill_holes_opt is not None:
            return self._fill_holes_opt
        return self.guidance not in ("none", "stereo_only")

    @fill_holes.setter
    def fill_holes(self, v) -> None:
        self._fill_holes_opt = None if v is None else bool(v)

    def load_model(self) -> None:
        """Resolve the guidance backend once (reference depth.py:60-114).

        Failure at any point degrades to stereo-only with a warning, the
        same soft-fallback contract as the reference.
        """
        if self._guidance_loaded:
            return
        self._guidance_loaded = True
        if self.guidance in ("none", "stereo_only"):
            return
        try:
            if self.guidance == "dpt":
                from video3d_tpu.models.dpt import load_dpt_guidance

                self._guidance_fn = load_dpt_guidance(self.model_checkpoint)
            elif self.guidance == "crestereo":
                from video3d_tpu.models.crestereo import (
                    load_crestereo_guidance,
                )

                self._guidance_fn = load_crestereo_guidance(
                    self.model_checkpoint
                )
            elif self.guidance == "mono":
                from video3d_tpu.models.mono import make_mono_guidance

                self._guidance_fn = make_mono_guidance(
                    self.model_checkpoint
                )
            else:
                raise ValueError(f"Unknown guidance backend: {self.guidance}")
            print(f"Guidance model loaded: {self.guidance}")
        except Exception as e:  # degrade like reference depth.py:107-114
            print(f"Warning: guidance load failed ({e}); using stereo only")
            self.guidance = "none"
            self.model_checkpoint = "stereo_only"
            self._guidance_fn = None

    def _auto_batch_size(self, height: int, width: int) -> int:
        """Batch size from device memory (reference autotunes from VRAM,
        depth.py:86-102).

        The peak live set is during the horizontal SGM passes: the cost
        volume in both layouts plus the accumulator, all H*W'*D, at the
        active precision's byte widths (int16 cost/acc on the default
        TPU path, bf16 cost + f32 acc under
        VIDEO3D_TPU_SGM_PRECISION=bf16), plus ~1.5x headroom for XLA
        transpose double-buffering. Capped at 8: measured throughput is
        flat past batch 8 at 1080p (the Pallas kernels' internal
        block-batching already amortizes grid-step overhead), so larger
        batches only add latency and decode buffering.
        """
        import os

        try:
            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit", 16 * 2**30)
        except Exception:
            limit = 16 * 2**30
        w_eye = width // 2 * (2 if self.unsqueeze_anamorphic else 1)
        vol = height * w_eye * self.params.num_disparities
        if os.environ.get("VIDEO3D_TPU_SGM_PRECISION", "int16") == "int16":
            per_frame = int((2 + 2 + 2) * vol * 1.5)
        else:
            per_frame = int((2 + 2 + 4) * vol * 1.5)
        b = max(1, int(limit * 0.75 / per_frame))
        return min(b, 8)

    # -- main entry ---------------------------------------------------------

    def _slice_halos(self, lo: int, hi: int, job_lo: int,
                     job_hi: int) -> tuple:
        """Decode halos for the sub-range [lo, hi) of a job [job_lo, job_hi).

        Temporal smoothers need context frames at interior seams so sliced
        runs match an unsliced one: median-of-3 needs one frame each side
        (bit-exact); the causal flow EMA needs a 24-frame left warm-up
        (error bound 0.65**24 of full scale, ~2 uint16 counts --
        documented approximation). Halo frames are computed but not
        written (``write_range``).
        """
        if self.temporal_median:
            h_l, h_r = 1, 1
        elif self.temporal_smooth == "flow":
            h_l, h_r = 24, 0
        else:
            h_l, h_r = 0, 0
        halo_lo = min(h_l, lo - job_lo)
        halo_hi = h_r if hi < job_hi else 0
        return halo_lo, halo_hi

    def process_video_sbs_fanout(
        self,
        video_path: str,
        devices,
        start_frame: int = 0,
        max_frames: Optional[int] = None,
        force: bool = False,
    ) -> Path:
        """One job fanned out over local devices (serve's multi-chip path).

        Splits [start_frame, start_frame + n) into one contiguous range
        per device and runs the single-chip streaming pipeline on each in
        its own thread, pinned via ``jax.default_device`` (thread-local),
        all writing globally-numbered frames into one shared cache with
        halo-correct seams -- the in-process analogue of the multi-host
        frame partitioning (:meth:`process_video_sbs_sharded`), so the
        two paths share the ``+multihost`` cache-key space.

        Reference has no serving/fan-out story (single-shot scripts,
        depth.py:433-449); this is the pod-scale serving component.
        """
        import threading

        info = get_video_info(str(video_path))
        if info is None:
            raise RuntimeError(f"Cannot probe video: {video_path}")
        n_total = info["frames"] - start_frame if info["frames"] else None
        n = (
            min(n_total, max_frames)
            if (n_total is not None and max_frames is not None)
            else (max_frames if max_frames is not None else n_total)
        )
        k = max(1, min(len(devices), n if n is not None else 1))
        if k == 1 or n is None:
            # unknown stream length cannot be pre-partitioned
            with jax.default_device(devices[0]):
                return self.process_video_sbs(
                    video_path, start_frame=start_frame,
                    max_frames=max_frames, force=force,
                )
        cache = depth_cache_dir(
            self.work_dir, str(video_path), start_frame, n,
            self._model_key() + "+multihost", self.unsqueeze_anamorphic,
        )
        from video3d_tpu.core.cache import is_depth_cached_range

        if not force and is_depth_cached_range(cache, start_frame, n):
            print(f"Using cached depth maps: {cache}")
            return cache
        self.load_model()  # once, before the per-device threads

        job_lo, job_hi = start_frame, start_frame + n
        errors = []

        def run_slice(i: int, dev) -> None:
            lo = job_lo + (i * n) // k
            hi = job_lo + ((i + 1) * n) // k
            halo_lo, halo_hi = self._slice_halos(lo, hi, job_lo, job_hi)
            try:
                with jax.default_device(dev):
                    self.process_video_sbs(
                        video_path,
                        start_frame=lo - halo_lo,
                        max_frames=(hi - lo) + halo_lo + halo_hi,
                        force=force,
                        cache_dir=cache,
                        index_offset=lo - halo_lo,
                        write_range=(lo, hi),
                    )
            except Exception as e:  # noqa: BLE001 -- reported by joiner
                errors.append((i, e))

        threads = [
            threading.Thread(target=run_slice, args=(i, d), daemon=True)
            for i, d in enumerate(devices[:k])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            i, e = errors[0]
            raise RuntimeError(
                f"fan-out slice {i}/{k} failed ({len(errors)} of {k} "
                f"slices errored): {type(e).__name__}: {e}"
            ) from e
        return cache

    def process_video_sbs_sharded(
        self,
        video_path: str,
        max_frames: Optional[int] = None,
        force: bool = False,
    ) -> Path:
        """Multi-host variant: this host processes its contiguous share of
        the frame stream into a SHARED cache dir with globally numbered
        frames (SURVEY.md SS2.3: frame-range work partitioning; recovery =
        reassign ranges, completed frames are skipped via the cache)."""
        from video3d_tpu.parallel.multihost import host_frame_slice

        info = get_video_info(str(video_path))
        if info is None:
            raise RuntimeError(f"Cannot probe video: {video_path}")
        n_total = info["frames"]
        n = min(n_total, max_frames) if max_frames is not None else n_total
        start, count = host_frame_slice(n)
        # shared cache key covers the WHOLE stream so all hosts agree
        cache = depth_cache_dir(
            self.work_dir, str(video_path), 0, n,
            self._model_key() + "+multihost", self.unsqueeze_anamorphic,
        )
        halo_lo, halo_hi = self._slice_halos(start, start + count, 0, n)
        print(
            f"Host {__import__('jax').process_index()}: frames "
            f"[{start}, {start + count}) of {n} -> {cache}"
        )
        return self.process_video_sbs(
            video_path,
            start_frame=start - halo_lo,
            max_frames=count + halo_lo + halo_hi,
            force=force,
            cache_dir=cache,
            index_offset=start - halo_lo,
            write_range=(start, start + count),
        )

    def estimate_disparity_range(
        self,
        video_path: str,
        start_frame: int = 0,
        n_frames: Optional[int] = None,
        sample_frames: int = 6,
    ) -> int:
        """Probe a frame sample at the configured (full) disparity range
        and return the smallest cv2-legal range (multiple of 16) covering
        the content, with ~10% + 2 px headroom over the 99.5th
        percentile of valid disparities.

        Stereo content rarely uses the full 64-px default range; SGM
        cost is linear in D, so narrowing 64 -> 32 nearly halves the
        matcher's work. The probe is a handful of frames spread across
        the clip (one extra compile at the probe batch shape).
        """
        info = get_video_info(str(video_path))
        if info is None:
            raise RuntimeError(f"Cannot probe video: {video_path}")
        total = info["frames"] - start_frame
        if n_frames is not None:
            total = min(total, n_frames)
        k = max(1, min(sample_frames, total))
        picks = [start_frame + (i * total) // k for i in range(k)]
        return self._probe_range_at(video_path, picks)

    def _probe_range_at(self, video_path: str, picks) -> int:
        """Probe the disparity range over explicit frame indices (the
        shared core of :meth:`estimate_disparity_range` and the per-shot
        planner :meth:`process_video_sbs_shots`)."""
        frames = []
        for p in picks:
            reader = VideoReader(
                str(video_path), start_frame=p, max_frames=1, batch_size=1
            )
            for batch, valid in reader:
                if valid:
                    frames.append(batch[0])
                break
        if not frames:
            return self.params.num_disparities
        batch = to_device(np.stack(frames))
        left, right = split_sbs(batch.astype(jnp.float32))
        if self.unsqueeze_anamorphic:
            left = jnp.moveaxis(
                unsqueeze_width(jnp.moveaxis(left, -1, 1)), 1, -1
            )
            right = jnp.moveaxis(
                unsqueeze_width(jnp.moveaxis(right, -1, 1)), 1, -1
            )
        # jitted entry: the eager composition leaks per call on
        # jax 0.9.0 (core/xfer.py) and this probe runs once per shot
        disp = np.asarray(
            sgbm_disparity_jit(
                rgb_to_gray(left), rgb_to_gray(right), self.params,
                apply_speckle=self.apply_speckle,
            )
        )
        valid = disp >= self.params.min_disparity
        if not valid.any():
            return self.params.num_disparities
        p = float(np.percentile(disp[valid], 99.5))
        need = int(np.ceil((p * 1.1 + 2.0) / 16.0) * 16)
        return int(np.clip(need, 16, self.params.num_disparities))

    def apply_auto_range(self, video_path: str, start_frame: int = 0,
                         n_frames: Optional[int] = None,
                         sample_frames: int = 6) -> int:
        """Narrow ``params.num_disparities`` to the probed range
        (:meth:`estimate_disparity_range`); returns the chosen D. The
        cache key reflects any non-default range, so narrowed runs never
        alias full-range caches."""
        import dataclasses

        d = self.estimate_disparity_range(
            video_path, start_frame, n_frames, sample_frames
        )
        if d != self.params.num_disparities:
            print(
                f"Auto disparity range: {self.params.num_disparities} -> {d}"
            )
            self.params = dataclasses.replace(
                self.params, num_disparities=d
            )
        return d

    def process_video_sbs_shots(
        self,
        video_path: str,
        start_frame: int = 0,
        max_frames: Optional[int] = None,
        force: bool = False,
        sample_frames: int = 4,
        shot_threshold: float = 24.0,
        min_shot_len: int = 12,
    ) -> Path:
        """Per-shot auto-range: segment the clip into shots
        (core/shots.py), probe the smallest cv2-legal disparity range
        per shot, and process each shot at its own D into ONE shared,
        globally-numbered cache (the multi-host cache machinery reused
        per shot).

        Beyond the SGM-cost-is-linear-in-D win this also RESETS the
        temporal smoother at every cut — exactly where temporal
        smoothing must not leak (the reference smooths blindly across
        cuts, depth.py:399-407).  Distinct D values are multiples of 16,
        so at most D_max/16 programs ever compile.  Cost: one extra
        decode pass for the planner (host-IO-bound; the 8x8-strided
        luma diff is trivia next to the decode itself) before
        processing starts.
        """
        import dataclasses
        import hashlib

        from video3d_tpu.core.shots import detect_shots

        shots = detect_shots(
            str(video_path), start_frame=start_frame,
            max_frames=max_frames, threshold=shot_threshold,
            min_shot_len=min_shot_len,
        )
        if not shots:
            raise RuntimeError(f"No frames to process: {video_path}")
        n_frames = shots[-1][1] - start_frame

        plans = []
        for s, e in shots:
            k = max(1, min(sample_frames, e - s))
            picks = [s + (i * (e - s)) // k for i in range(k)]
            # pad to a fixed probe batch so every shot reuses one compile
            picks += [picks[-1]] * (sample_frames - len(picks))
            plans.append((s, e, self._probe_range_at(video_path, picks)))
        ds = [d for _, _, d in plans]
        print(
            f"Per-shot ranges: {len(plans)} shots, D in "
            f"[{min(ds)}, {max(ds)}] (full range "
            f"{self.params.num_disparities})"
        )

        plan_key = hashlib.md5(repr(plans).encode()).hexdigest()[:10]
        cache = depth_cache_dir(
            self.work_dir,
            str(video_path),
            start_frame,
            n_frames,
            self._model_key() + f"+shots={plan_key}",
            self.unsqueeze_anamorphic,
        )
        base = self.params
        try:
            # every shot encodes on the film-wide scale regardless of
            # its narrowed matcher range
            self._norm_disparities = base.num_disparities
            for s, e, d in plans:
                self.params = dataclasses.replace(
                    base, num_disparities=d
                )
                self.process_video_sbs(
                    video_path,
                    start_frame=s,
                    max_frames=e - s,
                    force=force,
                    cache_dir=cache,
                    index_offset=s - start_frame,
                )
        finally:
            self.params = base
            self._norm_disparities = None
        return cache

    def _model_key(self) -> str:
        """Cache-key component covering every output-affecting option, so
        e.g. a ``--no-speckle`` run never aliases a speckled cache."""
        model_key = f"{self.model_checkpoint}+a{ALGO_VERSION}"
        if self.normalize != "fixed":
            model_key += f"+norm={self.normalize}"
        if self.temporal_median:
            model_key += "+tmedian"
        elif self.temporal_smooth == "flow":
            model_key += "+tflow"
            if self.flow_scale != 4:
                model_key += f"@{self.flow_scale}"
        if not self.apply_speckle:
            model_key += "+nospeckle"
        if self.stereo_weight != STEREO_WEIGHT:
            model_key += f"+sw={self.stereo_weight:g}"
        if self.guidance not in ("none", "stereo_only") and \
                self.blend == "confidence":
            # never alias round-2 caches computed with the fixed blend
            model_key += "+blend=conf"
        if self.fill_holes:
            model_key += "+fill"
        if self.guidance_every != 1 and \
                self.guidance not in ("none", "stereo_only"):
            model_key += f"+gev{self.guidance_every}"
        default_params = SGBMParams()
        if self.params != default_params:
            import dataclasses

            diff = ",".join(
                f"{f.name}={getattr(self.params, f.name)}"
                for f in dataclasses.fields(SGBMParams)
                if getattr(self.params, f.name) != getattr(default_params, f.name)
            )
            model_key += f"+sgbm({diff})"
        return model_key

    def process_video_sbs(
        self,
        video_path: str,
        start_frame: int = 0,
        max_frames: Optional[int] = None,
        force: bool = False,
        cache_dir: Optional[Path] = None,
        index_offset: int = 0,
        write_range: Optional[tuple] = None,
    ) -> Path:
        """Extract depth maps for a frame range; returns the cache dir.

        Idempotent: on a complete cache hit returns immediately unless
        ``force`` (reference depth.py:433-437). ``cache_dir``/
        ``index_offset`` support shared multi-host caches with global
        frame numbering (see :meth:`process_video_sbs_sharded`).
        ``write_range`` (global [lo, hi)) restricts which computed frames
        are written -- used to drop temporal-median halo frames at
        multi-host seams.
        """
        info = get_video_info(str(video_path))
        if info is None:
            raise RuntimeError(f"Cannot probe video: {video_path}")
        n_total = info["frames"] - start_frame if info["frames"] else None
        n_frames = (
            min(n_total, max_frames)
            if (n_total is not None and max_frames is not None)
            else (max_frames if max_frames is not None else n_total)
        )

        if cache_dir is not None:
            cache = Path(cache_dir)
        else:
            # cache key parts extend the reference's (video, start, count,
            # model, unsqueeze) [depth.py:119-120] with the output-affecting
            # options the reference doesn't have, so variants don't collide
            cache = depth_cache_dir(
                self.work_dir,
                str(video_path),
                start_frame,
                n_frames if n_frames is not None else "all",
                self._model_key(),
                self.unsqueeze_anamorphic,
            )
        from video3d_tpu.core.cache import is_depth_cached_range

        check_lo, check_n = index_offset, n_frames
        if write_range is not None:
            check_lo, check_n = write_range[0], write_range[1] - write_range[0]
        if (
            not force
            and check_n is not None
            and is_depth_cached_range(cache, check_lo, check_n)
        ):
            print(f"Using cached depth maps: {cache}")
            return cache

        self.load_model()
        batch = self.batch_size or self._auto_batch_size(
            info["height"], info["width"]
        )
        print(
            f"Extracting depth: {n_frames if n_frames is not None else '?'} frames, "
            f"batch={batch}, guidance={self.guidance}"
        )

        reader = VideoReader(
            str(video_path),
            start_frame=start_frame,
            max_frames=n_frames,
            batch_size=batch,
        )
        done = 0
        written = index_offset
        t0 = time.time()
        smoother = None
        if self.temporal_median:
            from video3d_tpu.parallel.temporal import TemporalMedianStream

            smoother = TemporalMedianStream()
        elif self.temporal_smooth == "flow":
            from video3d_tpu.ops.flow import FlowEMAParams
            from video3d_tpu.parallel.temporal import TemporalFlowEMAStream

            # one extra pyramid level at flow_scale 2 keeps the coarsest
            # level at the same absolute resolution as the default
            smoother = TemporalFlowEMAStream(FlowEMAParams(
                levels=3 + (self.flow_scale == 2)))
        with DepthMapWriter(cache) as writer:
            # one batch in flight: the previous batch's device->host
            # readback (+ PNG encode scheduling) overlaps the current
            # batch's device compute -- decode thread / TPU / readback /
            # PNG pool form a 4-stage pipeline
            pending = None  # (device_array, start_index, valid)

            def drain(p):
                arr, start, n_valid = p
                if write_range is not None:
                    # clip to the writable window (drop halo frames)
                    lo = max(start, write_range[0])
                    hi = min(start + n_valid, write_range[1])
                    if hi <= lo:
                        return
                    arr = arr[lo - start : hi - start]
                    start, n_valid = lo, hi - lo
                writer.put(np.asarray(arr), start, n_valid)

            guidance_params = getattr(self._guidance_fn, "params", None)
            want_guide = self.temporal_smooth == "flow"
            for frames, valid in reader:
                # explicit placement: an implicit upload here leaks the
                # full batch every iteration on jax 0.9.0 (core/xfer.py)
                # -- ~50 MB/batch at 1080p, terabytes over a film
                depth = depth_batch_pipeline(
                    to_device(frames),
                    params=self.params,
                    unsqueeze=self.unsqueeze_anamorphic,
                    normalize=self.normalize,
                    apply_speckle=self.apply_speckle,
                    guidance_fn=self._guidance_fn,
                    guidance_params=guidance_params,
                    return_guide=want_guide,
                    guide_scale=self.flow_scale,
                    guidance_every=self.guidance_every,
                    trust_scale=self.trust_scale,
                    stereo_weight=self.stereo_weight,
                    blend=self.blend,
                    norm_disparities=self._norm_disparities,
                    fill_holes=self.fill_holes,
                )  # async dispatch; do host work before blocking on it
                if want_guide:
                    depth, guide = depth
                if smoother is not None:
                    out = (
                        smoother.push(depth[:valid], guide[:valid])
                        if want_guide
                        else smoother.push(depth[:valid])
                    )
                    if out is not None:
                        if pending is not None:
                            drain(pending)
                        pending = (out, written, out.shape[0])
                        written += out.shape[0]
                else:
                    if pending is not None:
                        drain(pending)
                    pending = (depth, index_offset + done, valid)
                done += valid
                if done % 100 < valid:
                    dt = time.time() - t0
                    print(f"  {done} frames ({done / max(dt, 1e-9):.1f} fps)")
            if smoother is not None:
                out = smoother.flush()
                if out is not None:
                    if pending is not None:
                        drain(pending)
                    pending = (out, written, out.shape[0])
            if pending is not None:
                drain(pending)
        dt = time.time() - t0
        print(
            f"Depth extraction done: {done} frames in {dt:.1f}s "
            f"({done / max(dt, 1e-9):.1f} fps) -> {cache}"
        )
        return cache
