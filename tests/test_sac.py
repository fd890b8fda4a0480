"""SAC tests: log-prob correctness, update mechanics, learning on a toy task."""

import jax
import jax.numpy as jnp
import numpy as np

from pdecontrol_tpu.data.types import Sample
from pdecontrol_tpu.sac.nets import GaussianPolicy
from pdecontrol_tpu.sac.sac import SAC, SACConfig


def _batch(key, b=32, n=8, jets=4):
    ks = jax.random.split(key, 4)
    obs = jax.random.normal(ks[0], (b, 1, n))
    actions = jax.random.uniform(ks[1], (b, 1, jets), minval=-1, maxval=1)
    nxtobs = jax.random.normal(ks[2], (b, 1, n))
    rewards = jax.random.normal(ks[3], (b,))
    return Sample(
        obs=obs, actions=actions, nxtobs=nxtobs, rewards=rewards,
        terminated=jnp.zeros((b,), bool), truncated=jnp.zeros((b,), bool),
        steps=jnp.zeros((b,), jnp.int32),
    )


def test_policy_logprob_matches_analytic():
    """Squashed-Gaussian log-prob equals the analytic normal + tanh
    correction, summed over channel/action dims (policies.py:119-123)."""
    key = jax.random.PRNGKey(0)
    policy = GaussianPolicy(achannels=1, asize=4)
    obs = jax.random.normal(key, (5, 1, 8))
    params = policy.init(key, obs)["params"]

    mean, log_std = policy.apply({"params": params}, obs)
    action, log_prob, det = policy.apply(
        {"params": params}, obs, key, method=GaussianPolicy.sample
    )
    assert action.shape == (5, 1, 4)
    assert log_prob.shape == (5, 1)

    # Recover x_t = atanh(action) and check the density by hand.
    y = np.clip(np.asarray(action), -1 + 1e-7, 1 - 1e-7)
    x = np.arctanh(y)
    m, ls = np.asarray(mean), np.asarray(log_std)
    normal = -0.5 * ((x - m) / np.exp(ls)) ** 2 - ls - 0.5 * np.log(2 * np.pi)
    corr = np.log(1.0 - y**2 + 1e-6)
    expect = (normal - corr).sum(axis=(1, 2)).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(log_prob), expect, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(det), np.tanh(m), rtol=1e-6)
    # log-std clamp range
    assert (ls >= -20.0).all() and (ls <= 2.0).all()


def test_update_moves_params_and_soft_target():
    key = jax.random.PRNGKey(1)
    agent = SAC((1, 8), (1, 4), SACConfig(target_update_interval=2))
    state = agent.init(key)
    batch = _batch(key)

    upd = jax.jit(agent.update)
    state1, m1 = upd(state, batch, jax.random.PRNGKey(2))
    assert int(state1.updates) == 1
    assert np.isfinite(float(m1["qf_loss"]))

    # Params moved:
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.critic_params, state1.critic_params)
    assert max(jax.tree.leaves(d)) > 0

    # Soft update happened at update 0 (updates % interval == 0):
    td = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                      state.target_params, state1.target_params)
    assert max(jax.tree.leaves(td)) > 0
    # ... but not at update 1 (1 % 2 != 0):
    state2, _ = upd(state1, batch, jax.random.PRNGKey(3))
    td2 = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                       state1.target_params, state2.target_params)
    assert max(jax.tree.leaves(td2)) == 0.0


def test_alpha_tuning():
    key = jax.random.PRNGKey(4)
    agent = SAC((1, 8), (1, 4), SACConfig(automatic_entropy_tuning=True))
    assert agent.config.target_entropy == -4.0
    state = agent.init(key)
    state1, m = jax.jit(agent.update)(state, _batch(key), key)
    assert float(jnp.abs(state1.log_alpha - state.log_alpha)) > 0
    assert np.isfinite(float(m["alpha_loss"]))


def test_sac_learns_simple_control():
    """SAC improves on a trivial 'match the target' reward within a few
    hundred updates — end-to-end learning sanity."""
    key = jax.random.PRNGKey(5)
    agent = SAC((1, 4), (1, 2), SACConfig(lr=3e-3))
    state = agent.init(key)

    def make_batch(k):
        ks = jax.random.split(k, 3)
        obs = jax.random.normal(ks[0], (128, 1, 4))
        actions = jax.random.uniform(ks[1], (128, 1, 2), minval=-1, maxval=1)
        target = jnp.tanh(obs[:, :, :2])
        rewards = -jnp.sum((actions - target) ** 2, axis=(1, 2))
        return Sample(obs=obs, actions=actions, nxtobs=obs, rewards=rewards,
                      terminated=jnp.zeros((128,), bool),
                      truncated=jnp.zeros((128,), bool),
                      steps=jnp.zeros((128,), jnp.int32))

    batches = jax.vmap(make_batch)(jax.random.split(key, 300))
    state, metrics = jax.jit(agent.update_many)(state, batches, key)

    # Evaluate: deterministic action should be close to tanh(obs[:2]).
    kk = jax.random.PRNGKey(99)
    obs = jax.random.normal(kk, (256, 1, 4))
    act = agent.select_action(state, obs, kk, deterministic=True)
    err = float(jnp.mean((act - jnp.tanh(obs[:, :, :2])) ** 2))
    assert err < 0.05, f"policy did not learn (mse {err:.3f})"


def test_update_many_scan_matches_loop():
    key = jax.random.PRNGKey(6)
    agent = SAC((1, 8), (1, 4))
    state = agent.init(key)
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_batch(jax.random.PRNGKey(i)) for i in range(3)],
    )
    s_scan, _ = jax.jit(agent.update_many)(state, batches, key)

    s_loop, k = state, key
    for i in range(3):
        k, ku = jax.random.split(k)
        s_loop, _ = agent.update(s_loop, jax.tree.map(lambda x: x[i], batches), ku)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     s_scan.policy_params, s_loop.policy_params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_reward_scale_equals_prescaled_rewards():
    """reward_scale=s inside the update produces exactly the same new state
    as scaling the batch rewards by s with reward_scale=1 (only the soft-Q
    update sees scaled rewards)."""
    key = jax.random.PRNGKey(7)
    batch = _batch(key)
    s = 500.0

    def run(cfg, b):
        sac = SAC((1, 8), (1, 4), cfg, -jnp.ones((1, 4)), jnp.ones((1, 4)))
        state = sac.init(jax.random.PRNGKey(1))
        return sac.update(state, b, jax.random.PRNGKey(2))

    st_scaled, m_scaled = run(SACConfig(reward_scale=s), batch)
    st_manual, m_manual = run(
        SACConfig(), batch.replace(rewards=batch.rewards * s)
    )
    for a, b_ in zip(jax.tree.leaves(st_scaled.critic_params),
                     jax.tree.leaves(st_manual.critic_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)
    np.testing.assert_allclose(
        float(m_scaled["qf_loss"]), float(m_manual["qf_loss"]), rtol=1e-6
    )
