"""Per-stage profile of the HYBRID depth path (SGM + DPT guidance).

Breaks the hybrid 1080p configuration (bench.py bench_hybrid) into its
device stages so the gap to the 62.5 fps/chip per-chip target is
attributable: the DPT-large forward at its 384x384 bf16 inference
resolution, the ViT backbone alone (24 blocks, 577 tokens), the neck +
fusion + head remainder, the stereo-only baseline, and the full fused
hybrid program. Methodology = tools/profile_sgm.py (dependency-chained
fori_loop, one checksum readback).

Usage: python tools/profile_hybrid.py [--batch 4] [--iters 3]
       [--out bench_profile_hybrid.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_sgm import chain_time  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--out", default="bench_profile_hybrid.json")
    ap.add_argument("--tiny", action="store_true",
                    help="DPTConfig.tiny + small frames (CPU smoke test)")
    args = ap.parse_args()
    if args.tiny:
        args.h, args.w = 96, 160

    import jax

    if args.tiny:
        # tiny is the CPU smoke path; the axon sitecustomize pins
        # JAX_PLATFORMS at boot, so force CPU via jax.config (the tiny
        # w=160 frames have no legal costvol tiling on real TPU anyway)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from video3d_tpu.models.dpt import (
        DPTConfig,
        ViTBackbone,
        random_dpt_guidance,
    )
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    b, h, w = args.batch, args.h, args.w
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    eye = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)

    cfg = DPTConfig.tiny() if args.tiny else DPTConfig.dpt_large()
    infer = 64 if args.tiny else 384
    guidance = random_dpt_guidance(cfg=cfg, seed=0, infer_size=infer)
    stages = {}

    def record(name, ms):
        stages[name] = {"ms_per_frame": round(ms * 1e3 / b, 3)}
        print(name, stages[name], flush=True)

    # (1) full DPT guidance: 1080p eye -> resize -> bf16 DPT -> resize
    record(
        "dpt_guidance_full",
        chain_time(lambda p, x: guidance(x, params=p),
                   (guidance.params, eye), args.iters, perturb_idx=1),
    )

    # (2) ViT backbone alone at the bf16 inference resolution
    backbone = ViTBackbone(cfg)
    px384 = rng.uniform(-1, 1, (b, infer, infer, 3)).astype(np.float32)
    bb_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        backbone.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, infer, infer, 3), jnp.float32)),
    )

    def bb_fn(p, x):
        taps, _ = backbone.apply(p, x.astype(jnp.bfloat16))
        return taps[-1].astype(jnp.float32)

    record("vit_backbone_24blocks",
           chain_time(bb_fn, (bb_params, px384), args.iters, perturb_idx=1))
    stages["neck_fusion_head_resizes"] = {
        "ms_per_frame": round(
            stages["dpt_guidance_full"]["ms_per_frame"]
            - stages["vit_backbone_24blocks"]["ms_per_frame"], 3),
        "derived": "dpt_guidance_full - vit_backbone",
    }

    # (2b) attention-op A/B at the backbone's shapes (per frame-layer)
    n_heads = cfg.num_attention_heads
    hd = cfg.hidden_size // n_heads
    toks = (infer // cfg.patch_size) ** 2 + 1
    qkv = tuple(
        jnp.asarray(
            rng.standard_normal((b, n_heads, toks, hd)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(3)
    )
    sm = 1.0 / hd ** 0.5
    try:
        from video3d_tpu.kernels.attention import (
            attention_multihead,
            attention_oneblock,
        )

        attn_iters = max(args.iters, 64)  # sub-ms op: drown the launch RTT
        record("attn_multihead",
               chain_time(lambda q, k, v: attention_multihead(q, k, v, sm)
                          .astype(jnp.float32).sum(axis=(1, 2, 3)),
                          qkv, attn_iters))
        record("attn_oneblock",
               chain_time(lambda q, k, v: attention_oneblock(q, k, v, sm)
                          .astype(jnp.float32).sum(axis=(1, 2, 3)),
                          qkv, attn_iters))
    except Exception as e:  # toolchain gap: record and move on
        stages["attn_kernels"] = {"error": repr(e)}

    def attn_xla(q, k, v):
        a = jax.nn.softmax(
            jnp.einsum("bnqd,bnkd->bnqk", q, k,
                       preferred_element_type=jnp.float32) * sm, axis=-1)
        return jnp.einsum(
            "bnqk,bnkd->bnqd", a.astype(v.dtype), v
        ).astype(jnp.float32).sum(axis=(1, 2, 3))

    record("attn_xla_einsum", chain_time(attn_xla, qkv,
                                         max(args.iters, 64)))

    # (3) stereo-only baseline and (4) the full fused hybrid program
    def stereo_fn(x):
        return depth_batch_pipeline(
            x, params=SGBMParams(), unsqueeze=True, normalize="fixed",
            apply_speckle=True, guidance_fn=None)

    record("stereo_only_pipeline",
           chain_time(stereo_fn, (frames,), args.iters))

    def hybrid_fn(x, p):
        return depth_batch_pipeline(
            x, params=SGBMParams(), unsqueeze=True, normalize="fixed",
            apply_speckle=True, guidance_fn=guidance, guidance_params=p)

    record("hybrid_full_pipeline",
           chain_time(hybrid_fn, (frames, guidance.params), args.iters))
    stages["blend_and_overlap"] = {
        "ms_per_frame": round(
            stages["hybrid_full_pipeline"]["ms_per_frame"]
            - stages["stereo_only_pipeline"]["ms_per_frame"]
            - stages["dpt_guidance_full"]["ms_per_frame"], 3),
        "derived": "hybrid - stereo_only - dpt (negative = XLA overlap)",
    }
    hyb_ms = stages["hybrid_full_pipeline"]["ms_per_frame"]
    stages["hybrid_fps_per_chip"] = {"fps": round(1e3 / hyb_ms, 1)}

    # (5) keyframe guidance: DPT on every 4th frame (--guidance-every 4)
    def hybrid_gev4_fn(x, p):
        return depth_batch_pipeline(
            x, params=SGBMParams(), unsqueeze=True, normalize="fixed",
            apply_speckle=True, guidance_fn=guidance, guidance_params=p,
            guidance_every=4)

    record("hybrid_gev4_pipeline",
           chain_time(hybrid_gev4_fn, (frames, guidance.params),
                      args.iters))
    g4 = stages["hybrid_gev4_pipeline"]["ms_per_frame"]
    stages["hybrid_gev4_fps_per_chip"] = {"fps": round(1e3 / g4, 1)}

    out = {"config": {"batch": b, "h": h, "w": w,
                      "dpt": "large/384/bf16 random-init"},
           "stages": stages}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
