#!/bin/bash
# Round-4 TPU quality-artifact queue (VERDICT items 5, 6, 9).
# Run sequentially so jobs never contend for the single chip.
set -x
cd /root/repo

ARGS="RelativeL2Luminance Adam 0.01 0.99 0 0 64 6 21 14 4"
TAIL="1.0 1 1 0.0 32"

# 1. NRC quality on scenes 0 and 5 at 1080p (upstream goldens exist):
#    24 online frames, per-frame CompareNrc/CompareMc (fresh ref-camera
#    frame semantics), tpu_tuned operating point.
timeout 4800 python -m nrc_hpm_tpu.app $ARGS 0 $TAIL --tpu-tuned \
    --frames 24 --renderer both --out output/convergence_s0_r4 \
    > /tmp/conv_s0_r4.log 2>&1
timeout 4800 python -m nrc_hpm_tpu.app $ARGS 5 $TAIL --tpu-tuned \
    --frames 24 --renderer both --out output/convergence_s5_r4 \
    > /tmp/conv_s5_r4.log 2>&1

# 2. ReSTIR at resolution (carried from round 2).
timeout 3000 python experiments/restir_960.py > /tmp/restir_960_r4.log 2>&1

# 3. Thicken the noisy presets' low-res goldens to 1024 frames
#    (scenes 1/2 are the heavy-tailed point-light presets).
GOLDEN_FRAMES=1024 timeout 3000 python experiments/make_goldens.py 1 2 \
    > /tmp/goldens_12_r4.log 2>&1

echo QUEUE_DONE
