"""WorldModel (imagined env) unit tests."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from pdecontrol_tpu.data import replay as R
from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky
from pdecontrol_tpu.mbrl.transform_sets import ControllerTransforms
from pdecontrol_tpu.mbrl.world import WorldModel
from pdecontrol_tpu.models import factories
from pdecontrol_tpu.models.surrogate import init_ensemble


def _setup(key, num_envs=4, tau=2, objective="dissipation"):
    env = KuramotoSivashinsky.create(n=16, cfg_steps=5, t_max=0.25,
                                     objective=objective)  # 50 steps
    tr = ControllerTransforms.create(env, dtype=jnp.float32)

    # Fill a small real replay with random-env episodes.
    rep = R.create(6, env.max_episode_steps, 2, env.obs_shape,
                   env.action_shape, jnp.float32)
    pool = jax.random.uniform(key, (4, env.n), minval=-0.4, maxval=0.4)
    state = env.reset_from_pool(key, pool, (2,))
    for t in range(10):
        key, ka = jax.random.split(key)
        a = jax.random.uniform(ka, (2, 1, 4), minval=-1, maxval=1)
        obs = env.observe(state)
        state, out = env.vec_step(state, a, pool)
        rep = R.write_step(rep, obs, a, out.reward, out.terminated,
                           out.truncated, out.info["final_obs"],
                           out.info["step"].astype(jnp.int32))
    tr = tr.replace(oscaling=tr.oscaling.update(rep.obs_seq[:2, :10].reshape(-1, 1, 16)))

    module = factories.make("KSAutoRegConvolutionalLSTM", delta=env.delta, N=env.n)
    ex_s = jnp.zeros((1, tau, 1, env.n))
    ex_a = jnp.zeros((1, tau, 1, env.n))
    ens = init_ensemble(module, key, 2, ex_s, ex_a, 2)
    world = WorldModel(module, num_envs, env.max_episode_steps,
                       env.reward_fn, tau)
    return env, tr, rep, module, ens, world


@pytest.mark.slow
def test_reset_and_step_shapes():
    key = jax.random.PRNGKey(0)
    env, tr, rep, module, ens, world = _setup(key)

    wstate = world.reset(key, ens, rep, tr)
    assert wstate.obs.shape == (4, 1, 16)
    assert int(wstate.simulated) == 0
    # Member hidden carries stacked along M.
    h_leaves = jax.tree.leaves(wstate.hidden)
    assert all(l.shape[0] == 2 for l in h_leaves)

    action = jnp.zeros((4, 1, 4))
    wstate2, (obs, reward, term, trunc, final) = world.step(
        key, wstate, ens, action, tr, jnp.asarray(5), rep
    )
    assert obs.shape == (4, 1, 16)
    assert reward.shape == (4,)
    assert not bool(term.any())
    assert not bool(trunc.any())
    assert int(wstate2.simulated) == 1
    assert np.isfinite(np.asarray(reward)).all()


def test_horizon_truncation_and_batch_reset():
    key = jax.random.PRNGKey(1)
    env, tr, rep, module, ens, world = _setup(key)

    wstate = world.reset(key, ens, rep, tr)
    horizon = jnp.asarray(2)
    for t in range(2):
        key, ks = jax.random.split(key)
        wstate, (obs, reward, term, trunc, final) = world.step(
            ks, wstate, ens, jnp.zeros((4, 1, 4)), tr, horizon, rep
        )
    # All sub-envs truncate together at the horizon, and the batch resets.
    assert bool(trunc.all())
    assert int(wstate.simulated) == 0  # fresh after batch auto-reset
    # The returned obs is the fresh post-reset obs, not the final one.
    assert obs.shape == final.shape




@pytest.mark.parametrize("objective", ["dissipation", ""])
def test_rewards_match_env_reward_fn(objective):
    """Step reward == env.reward_fn on inverse-transformed obs + field —
    for BOTH reward channels of the reference quirk (kuramoto.py:72):
    truthy string -> l2control, '' -> the paper's dissipation+power
    integrand.  The imagined-reward path must dispatch per objective."""
    key = jax.random.PRNGKey(2)
    env, tr, rep, module, ens, world = _setup(key, objective=objective)
    wstate = world.reset(key, ens, rep, tr)
    action = jax.random.uniform(key, (4, 1, 4), minval=-1, maxval=1)
    wstate2, (obs, reward, term, trunc, final) = world.step(
        key, wstate, ens, action, tr, jnp.asarray(5), rep
    )
    phys_obs = tr.world_to_raw_obs(final)
    env_action = tr.agent_to_env_action(action)
    phi = env.action_to_phi(env_action)
    expect = env.reward_fn(phys_obs, phi[:, None, :])
    np.testing.assert_allclose(np.asarray(reward), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)
    if objective == "":
        # The two channels must be genuinely different rewards on the same
        # data, else this parametrisation tests nothing.
        l2env = KuramotoSivashinsky.create(n=16, cfg_steps=5, t_max=0.25,
                                           objective="dissipation")
        alt = l2env.reward_fn(phys_obs, phi[:, None, :])
        assert not np.allclose(np.asarray(expect), np.asarray(alt))
