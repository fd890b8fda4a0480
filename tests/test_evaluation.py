"""Offline generate/evaluate pipeline tests (tiny configs)."""

import pytest
import json
import os

import numpy as np


@pytest.mark.slow
def test_generate_and_evaluate(tmp_path):
    from pdecontrol_tpu.evaluation.generate import generate

    data = generate(
        "KuramotoSivashinskyEnv-v0",
        episodes=6,
        config={"n": 16, "cfg_steps": 5, "t_max": 0.08},  # 16-step episodes
        seed=0,
    )
    assert data["obs"].shape == (6, 16, 1, 16)
    assert data["truncated"][:, -1].all()
    assert not data["truncated"][:, :-1].any()
    # nxtobs consistency: obs[t+1] == nxtobs[t] within an episode.
    np.testing.assert_allclose(data["obs"][:, 1:], data["nxtobs"][:, :-1],
                               rtol=1e-5)

    path = tmp_path / "data.npz"
    np.savez_compressed(path, **data)

    from pdecontrol_tpu.evaluation.evaluate import build_parser, main

    out = tmp_path / "eval_out"
    rc = main([
        "--env_id", "KuramotoSivashinskyEnv-v0",
        "--env_config", json.dumps({"n": 16, "cfg_steps": 5, "t_max": 0.08}),
        "--data", str(path),
        "--factory", "KSAutoRegConvolutionalLSTM",
        "--target_length", "4",
        "--splits", "3",
        "--max_folds", "1",
        "--training", json.dumps({"tau": 2, "tbtt": 1000000, "batch_size": 4,
                                  "patience": 2, "max_epochs": 3}),
        "--output", str(out),
        "--store",
    ])
    assert rc == 0
    summary = json.load(open(out / "summary.json"))
    assert len(summary) == 1
    assert np.isfinite(summary[0]["MSE"])
    assert np.isfinite(summary[0]["val_loss"])

    fold = np.load(out / "fold0_metrics.npz")
    assert fold["nrmse"].shape == (6,)  # tau + target_length
    assert "l2_loss_derivs-derivative-0" in fold
    assert os.path.exists(out / "fold0_model.pkl")


def test_metric_battery_shapes():
    import jax
    import jax.numpy as jnp

    from pdecontrol_tpu.data.types import Sample
    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky
    from pdecontrol_tpu.envs.transforms import Identity, SampleTransform
    from pdecontrol_tpu.models import factories
    from pdecontrol_tpu.train.metrics import surrogate_metric_battery

    env = KuramotoSivashinsky.create(n=16, cfg_steps=5, dtype=jnp.float64)
    model = factories.make("KSAutoRegConvolutionalLSTM", delta=env.delta, N=16)
    key = jax.random.PRNGKey(0)
    states = jax.random.normal(key, (3, 7, 1, 16), jnp.float32)
    actions = jax.random.uniform(key, (3, 7, 1, 4), dtype=jnp.float32)
    params = model.init(key, states[:, :2], actions)["params"]

    batch = Sample(obs=states, actions=actions)
    m = surrogate_metric_battery(
        model, params, batch, SampleTransform(), Identity(), env, tau=2
    )
    assert m["MSE"].shape == ()
    assert m["l2_loss"].shape == (7,)
    assert m["nrmse_rews"].shape == (7,)
    assert m["l1_loss_derivs-derivative-2"].shape == (7,)
    assert np.isfinite(np.asarray(m["MSE"]))


def test_evaluate_sub_budget_masks_not_shapes(tmp_path):
    """--total restricts fold indices, not array shapes (budget sweeps reuse
    one compiled program): a 0.5 budget over 6 episodes folds over the first
    3 while the replay keeps all 6 rows."""
    from pdecontrol_tpu.evaluation.generate import generate

    data = generate(
        "KuramotoSivashinskyEnv-v0",
        episodes=6,
        config={"n": 16, "cfg_steps": 5, "t_max": 0.08},
        seed=0,
    )
    path = tmp_path / "data.npz"
    np.savez_compressed(path, **data)

    from pdecontrol_tpu.evaluation.evaluate import main

    out = tmp_path / "eval_budget"
    rc = main([
        "--env_id", "KuramotoSivashinskyEnv-v0",
        "--env_config", json.dumps({"n": 16, "cfg_steps": 5, "t_max": 0.08}),
        "--data", str(path),
        "--factory", "KSAutoRegConvolutionalLSTM",
        "--target_length", "4",
        "--splits", "3",
        "--max_folds", "1",
        "--total", "0.5",
        "--training", json.dumps({"tau": 2, "tbtt": 1000000, "batch_size": 4,
                                  "patience": 2, "max_epochs": 2}),
        "--output", str(out),
    ])
    assert rc == 0
    summary = json.load(open(out / "summary.json"))
    assert len(summary) == 1 and np.isfinite(summary[0]["MSE"])


def test_curriculum_flag_honored():
    """--curriculum builds the requested scheduler; the default is a
    constant window of target_length (one compiled program per fold)."""
    import json as _json

    from pdecontrol_tpu.evaluation.evaluate import make_curriculum
    from pdecontrol_tpu.train.schedulers import (
        ConstantLengthScheduler, LinearScheduler,
    )

    c = make_curriculum("{}", 30)
    assert isinstance(c, ConstantLengthScheduler)
    assert int(c(iteration=0, epoch=50, step=0)) == 30

    lin = make_curriculum(_json.dumps({
        "scheduler": "LinearScheduler", "steptype": "epoch",
        "start": 0, "stop": 100, "vmin": 25, "vmax": 50,
    }), 30)
    assert isinstance(lin, LinearScheduler)
    assert int(lin(iteration=0, epoch=0, step=0)) == 25
    assert int(lin(iteration=0, epoch=100, step=0)) == 50
