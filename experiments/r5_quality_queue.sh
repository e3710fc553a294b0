#!/bin/bash
# Round-5 TPU quality-artifact queue (VERDICT items 1-done, 4).
# Run sequentially so jobs never contend for the single chip.
set -x
cd /root/repo

ARGS="RelativeL2Luminance Adam 0.01 0.99 0 0 64 6 21 14 4"
TAIL="1.0 1 1 0.0 32"

# 1. Scene-4 convergence re-run at the round-5 operating point: the
#    VERDICT item-1 "Done" gate requires matching round-4 MSE after the
#    perf changes (matched 24-frame protocol of quality_2x13 etc).
timeout 4800 python -m nrc_hpm_tpu.app $ARGS 4 $TAIL --tpu-tuned \
    --frames 24 --renderer both --out output/convergence_s4_r5 \
    > /tmp/conv_s4_r5.log 2>&1

# 2. Scene-0 bias probes (VERDICT item 4): the -0.204 NRC relBias on the
#    brightest preset.  Hypothesis A: RelativeL2Luminance under-predicts
#    bright regions -> swap to plain L2.  Hypothesis B: the 8.0 target
#    clamp truncates bright target mass (scene 0 radiance ~2x scene 4)
#    -> raise the clamp to 16.
L2ARGS="L2 Adam 0.01 0.99 0 0 64 6 21 14 4"
timeout 4800 python -m nrc_hpm_tpu.app $L2ARGS 0 $TAIL --tpu-tuned \
    --frames 24 --renderer both --out output/convergence_s0_L2_r5 \
    > /tmp/conv_s0_L2_r5.log 2>&1
timeout 4800 python -m nrc_hpm_tpu.app $ARGS 0 $TAIL --tpu-tuned \
    --target-clamp 16 \
    --frames 24 --renderer both --out output/convergence_s0_clamp16_r5 \
    > /tmp/conv_s0_c16_r5.log 2>&1

# 3. Interactive-point quality trace (VERDICT item 2): the 480x270
#    online point that measured 168 ms/frame = 5.95 fps
#    (output/interactive_sweep_r5.json) gets a 24-frame per-frame
#    Compare run vs the upstream scene-4 golden (pooled 1080p -> 270p).
IARGS="RelativeL2Luminance Adam 0.01 0.99 0 0 64 6 17 11 2 4 1.0 1 1 0.0 32"
timeout 3600 python -m nrc_hpm_tpu.app $IARGS --tpu-tuned \
    --width 480 --height 270 \
    --frames 24 --renderer both --out output/interactive_quality_r5 \
    > /tmp/interactive_q_r5.log 2>&1

echo QUEUE_DONE
