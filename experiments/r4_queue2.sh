#!/bin/bash
# Round-4 TPU queue 2: bootstrap-bias probe, kernel decomp, 2^13 quality
# probe, final bench with the 8-stage profile.
set -x
cd /root/repo

ARGS="RelativeL2Luminance Adam 0.01 0.99 0 0 64 6 21 14 4 4 1.0 1 1 0.0 32"

# 1. Cache-bootstrapped train targets on the scene-4 convergence protocol
#    (VERDICT r3 item 8): does steady-state relBias move from -0.114
#    toward MC's -0.016?  Baseline = output/convergence_r3 (same protocol,
#    flag off).
timeout 4000 python -m nrc_hpm_tpu.app $ARGS --tpu-tuned --cache-bootstrap \
    --frames 24 --renderer nrc --out output/convergence_s4_bootstrap_r4 \
    > /tmp/conv_boot_r4.log 2>&1

# 2. Fused encode+MLP kernel decomposition (VERDICT r3 item 7 evidence).
timeout 2400 python experiments/fused_kernel_decomp.py \
    > /tmp/fused_decomp_r4.log 2>&1

# 2b. Scene-5 re-run with the golden-era env estimator: relBias vs the
#     upstream golden should collapse from +0.45 to ~0 (BASELINE.md,
#     upstream-golden inconsistency).
ARGS5="RelativeL2Luminance Adam 0.01 0.99 0 0 64 6 21 14 4 5 1.0 1 1 0.0 32"
timeout 4800 python -m nrc_hpm_tpu.app $ARGS5 --tpu-tuned --env-fixed16 \
    --frames 24 --renderer both --out output/convergence_s5_fixed16_r4 \
    > /tmp/conv_s5f_r4.log 2>&1

# 3. Quality probe at 2^13 tables (the rowsweep cost scales with table
#    rows; 2^13 would halve the sweep — is quality parity preserved?)
timeout 4000 python -m nrc_hpm_tpu.app $ARGS --log2-hashmap 13 \
    --frames 24 --renderer nrc --out output/quality_2x13 \
    > /tmp/quality_2x13_r4.log 2>&1

echo QUEUE2_DONE
