"""ControllerTransforms wiring tests (reference setup_transforms paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky
from pdecontrol_tpu.mbrl.transform_sets import ControllerTransforms


def _tr(key=0):
    env = KuramotoSivashinsky.create(n=32, cfg_steps=5, dtype=jnp.float64)
    tr = ControllerTransforms.create(env, dtype=jnp.float64)
    k = jax.random.PRNGKey(key)
    obs = jax.random.normal(k, (6, 1, 32), jnp.float64)
    tr = tr.replace(oscaling=tr.oscaling.update(obs))
    return env, tr, obs


def test_obs_roundtrip():
    env, tr, obs = _tr()
    world = tr.raw_to_world_obs(obs)
    np.testing.assert_allclose(
        np.asarray(tr.world_to_raw_obs(world)), np.asarray(obs), rtol=1e-9
    )
    # With stride-1 sensors, agent obs == world obs.
    np.testing.assert_allclose(
        np.asarray(tr.world_to_agent_obs(world)), np.asarray(world)
    )
    # Obs scaled into [-1, 1] after fitting on this batch.
    assert float(jnp.max(jnp.abs(world))) <= 1.0 + 1e-9


def test_action_paths():
    env, tr, _ = _tr(1)
    a = jax.random.uniform(jax.random.PRNGKey(2), (5, 1, 4), jnp.float64,
                           minval=-1, maxval=1)
    # Agent->env is identity for the [-1,1] KS action space (frozen bounds).
    env_a = tr.agent_to_env_action(a)
    np.testing.assert_allclose(np.asarray(env_a), np.asarray(a), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(tr.env_action_to_agent(env_a)), np.asarray(a), rtol=1e-12
    )

    # env action -> world field -> physical forcing field == forcing(action).
    wact = tr.env_action_to_world(env_a)
    assert wact.shape == (5, 1, 32)
    assert float(jnp.max(jnp.abs(wact))) <= 1.0 + 1e-9  # pdescaling to [-1,1]
    phi = tr.world_action_to_phys_field(wact)
    np.testing.assert_allclose(
        np.asarray(phi), np.asarray(tr.forcing.apply(env_a)), rtol=1e-9,
        atol=1e-12,
    )


def test_sample_bridges():
    env, tr, obs = _tr(3)
    from pdecontrol_tpu.data.types import Sample

    a = jax.random.uniform(jax.random.PRNGKey(4), (6, 1, 4), jnp.float64,
                           minval=-1, maxval=1)
    s = Sample(obs=obs, actions=a, nxtobs=obs, rewards=jnp.zeros(6),
               terminated=jnp.zeros(6, bool), truncated=jnp.zeros(6, bool),
               steps=jnp.zeros(6, jnp.int32))

    world = tr.replay_to_world(s)
    assert world.actions.shape == (6, 1, 32)  # forcing fields
    agent = tr.replay_to_agent(s)
    np.testing.assert_allclose(np.asarray(agent.actions), np.asarray(a),
                               rtol=1e-12)
    # Inverse bridge returns to raw space.
    back = tr.replay_to_world.inv(world)
    np.testing.assert_allclose(np.asarray(back.obs), np.asarray(obs), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(back.actions), np.asarray(a),
                               rtol=1e-6, atol=1e-8)
