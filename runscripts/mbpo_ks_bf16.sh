#!/bin/bash
# bf16-limb fast-mode product receipt (VERDICT r4 item 7): the flagship
# ECC'24 50k run with the env hot loop on the lane-packed Pallas kernel in
# bf16_3x limb precision.  The mode is gated offline by the 400-period
# attractor-statistics test (results/bf16_fidelity_3x.json,
# evaluation/bf16_gate.py); this run demonstrates it inside the product
# loop — the learning curve should statistically match the fp32 receipt
# (results/ks50k_r4).  Reference contrast: the hot loop it accelerates is
# /root/reference/pdegym/kuramoto/kuramoto.py:83-90,118-129 (scipy RK4).
set -e
cd "$(dirname "$0")/.."
exec bash runscripts/mbpo_ks.sh \
    --solver pallas_packed \
    --env_config '{"pallas_precision": "bf16_3x"}' \
    --run_dir runs/ks50k_bf16 "$@"
