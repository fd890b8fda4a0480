#!/bin/bash
# Burgers MBRL experiment — the capability the reference advertises but
# lacks (pdegym/__init__.py:2 imports a missing package).
#
# Burgers per-step rewards are ~1000x smaller than KS (the field damps to
# ~0), so a fixed SAC entropy weight (alpha=0.2) eventually dominates the
# objective and drives the policy toward max-entropy forcing — the collapse
# seen in results/burgers20k (round 1).  Automatic entropy tuning
# (target = -dim(A)) keeps the entropy term scaled to the reward signal.
set -e
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}"
cd "$(dirname "$0")/.."

python -m pdecontrol_tpu.mbrl.script \
    --env_id BurgersEnv-v0 \
    --factory KSAutoRegConvolutionalLSTM \
    --training '{"tau": 5, "initial": {"tbtt": 10, "patience": 10, "batch_size": 64}, "iterations": {"tbtt": 10, "patience": 5, "batch_size": 64}}' \
    --trainer '{"initial": {"min_steps": 250, "max_steps": 2000}, "iterations": {"min_steps": 50, "max_steps": 250}}' \
    --curriculum '{"scheduler": "LinearScheduler", "steptype": "iteration", "start": 0, "stop": 10, "vmin": 15, "vmax": 15}' \
    --loss MSELoss \
    --learning_starts 5000 \
    --total_timesteps 20000 \
    --rollout_length_schedule '{"scheduler": "LinearScheduler", "steptype": "iteration", "start": 0, "stop": 200, "vmin": 3, "vmax": 7}' \
    --policy_train_steps_per_sample 10 \
    --surrogate_train_freq 500 \
    --automatic_entropy_tuning \
    --checkpoint_freq 200 \
    --run_dir runs/burgers20k "$@"
