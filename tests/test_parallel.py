"""Multi-device (8 virtual CPU devices) sharding tests."""

import jax
import numpy as np


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_env_step_matches_single_device():
    import jax.numpy as jnp

    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky
    from pdecontrol_tpu.parallel import mesh as meshlib

    env = KuramotoSivashinsky.create(n=16, cfg_steps=4, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    pool = jax.random.uniform(key, (4, env.n), minval=-0.4, maxval=0.4, dtype=jnp.float64)
    state = env.reset_from_pool(key, pool, batch_shape=(16,))
    actions = jax.random.uniform(key, (16, 1, 4), minval=-1, maxval=1, dtype=jnp.float64)

    _, out_single = jax.jit(env.step)(state, actions)

    mesh = meshlib.make_mesh(8)
    data = meshlib.data_sharding(mesh)
    sharded_state = state.replace(u=jax.device_put(state.u, data))
    _, out_sharded = jax.jit(env.step)(sharded_state, jax.device_put(actions, data))

    np.testing.assert_allclose(
        np.asarray(out_single.obs), np.asarray(out_sharded.obs), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_single.reward), np.asarray(out_sharded.reward), rtol=1e-12
    )
