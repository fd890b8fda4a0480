"""Gym-style adapter tests."""

import numpy as np
import pytest

from pdecontrol_tpu.envs import gym_compat


def test_make_and_episode():
    env = gym_compat.make(
        "KuramotoSivashinskyEnv-v0",
        config={"n": 16, "cfg_steps": 4, "t_max": 0.02},  # 5-step episodes
        pool_size=4,
    )
    obs = env.reset(seed=0)
    assert obs.shape == (1, 16)
    assert env.max_episode_steps == 5

    done = False
    steps = 0
    while not done:
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        assert obs.shape == (1, 16)
        assert np.isfinite(reward)
        assert not terminated
        done = truncated
        steps += 1
    assert steps == 5
    assert info["step"] == 5

    # reset starts a new episode
    obs2, info = env.reset(return_info=True)
    assert info["step"] == 0


def test_sb3_variant_flattens():
    env = gym_compat.make(
        "KuramotoSivashinskyEnvSB3-v0",
        config={"n": 16, "cfg_steps": 4, "t_max": 0.02},
        pool_size=4,
    )
    obs = env.reset(seed=1)
    assert obs.shape == (16,)
    assert env.action_space.shape == (4,)
    obs, r, te, tr, info = env.step(np.zeros(4, np.float32))
    assert obs.shape == (16,)


def test_unknown_env():
    with pytest.raises(KeyError):
        gym_compat.make("NopeEnv-v0")


def test_burgers_registered():
    env = gym_compat.make(
        "BurgersEnv-v0", config={"n": 16, "cfg_steps": 4, "t_max": 0.02}
    )
    obs = env.reset(seed=2)
    obs, r, te, tr, info = env.step(env.action_space.sample())
    assert np.isfinite(r)
