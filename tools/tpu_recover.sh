#!/bin/bash
# Round-3 TPU recovery sequence: run the moment the axon tunnel is back.
# Order matters: A/B profiles need an idle chip, so they run BEFORE the
# (long) background trainings launch. Logs to /tmp/tpu_recover.log.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# 0) sanity: one real device
timeout 300 python3 -c "import jax; print(jax.devices())" || exit 1

# 1) kernel profile refresh (includes the NEW speckle prefix-scan path;
#    if the speckle row regresses or the kernel fails to lower, see
#    kernels/speckle.py use_prefix)  [~6 min incl compiles]
timeout 2400 python3 tools/profile_sgm.py --out bench_profile.json \
    2>&1 | tail -20

# 2) batch-16 tiling A/B (ROADMAP perf 4)
timeout 2400 python3 tools/profile_sgm.py --batch 16 \
    --out /tmp/profile_b16.json 2>&1 | tail -20

# 3) hybrid-path attribution (fused attention shipped round 3; target
#    >= 62.5 fps/chip)
timeout 2400 python3 tools/profile_hybrid.py \
    --out bench_profile_hybrid.json 2>&1 | tail -10

# 4) launch the two background trainings (timeshare the chip)
nohup python3 -m video3d_tpu.cli.train_crestereo --synthetic \
    --video /root/repo/data/train_clip.mp4 --video-every 4 --data v2cues \
    --init-from /root/repo/crestereo_ckpt_v2 --steps 20000 --batch-size 8 \
    --crop 128 256 --iters 6 --save-every 1000 --steps-per-call 32 \
    --seed 1 --out /root/repo/crestereo_ckpt_v2 \
    > /tmp/train_v2c.log 2>&1 &
echo $! > /tmp/train_v2c.pid
nohup python3 -m video3d_tpu.cli.train_mono --synthetic --data cues \
    --video /root/repo/data/train_clip.mp4 --video-every 4 --steps 6000 \
    --batch-size 8 --crop 128 256 --width 32 --save-every 500 \
    --steps-per-call 32 --seed 3 --out /root/repo/mono_ckpt_v2 \
    > /tmp/train_mono2.log 2>&1 &
echo $! > /tmp/train_mono2.pid
echo "RECOVERY SEQUENCE DONE; trainers launched"
