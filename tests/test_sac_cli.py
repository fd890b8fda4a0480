"""Model-free SAC trainer CLI smoke test."""

import json
import os


def test_sac_train_cli(tmp_path):
    from pdecontrol_tpu.sac.train import main

    run_dir = tmp_path / "sac"
    rc = main([
        "--run_dir", str(run_dir),
        "--env_config", json.dumps({"n": 16, "cfg_steps": 5, "t_max": 0.04}),
        "--num_envs", "2",
        "--total_timesteps", "40",
        "--learning_starts", "16",
        "--batch_size", "8",
        "--pool_size", "8",
        "--chunk", "5",
        "--eval_freq", "20",
        "--num_eval_episodes", "2",
    ])
    assert rc == 0
    path = os.path.join(run_dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(path)]
    assert records
    assert records[-1]["num_steps_sampled"] >= 40
    assert any("eval_return_mean" in r for r in records)
