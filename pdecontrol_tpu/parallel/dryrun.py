"""Multi-chip dry run: one sharded step of the training pipeline on tiny shapes.

Used by ``__graft_entry__.dryrun_multichip`` and the CPU-mesh tests.  Round-1
scope: vectorised env collection sharded over the ``data`` axis.  Extended to
the full MBRL composite (surrogate grad step over ensemble ``model`` axis +
SAC update) as those stages land.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pdecontrol_tpu.parallel import mesh as meshlib


def run(n_devices: int) -> None:
    mesh = meshlib.make_mesh(n_devices)
    data = meshlib.data_sharding(mesh)

    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky

    # Tiny shapes: small grid, few sub-steps, batch divisible by the mesh.
    env = KuramotoSivashinsky.create(n=16, cfg_steps=4, dtype=jnp.float32)
    batch = 2 * n_devices

    key = jax.random.PRNGKey(0)
    pool = jax.random.uniform(key, (8, env.n), minval=-0.4, maxval=0.4)
    state = env.reset_from_pool(key, pool, batch_shape=(batch,))
    state = state.replace(u=jax.device_put(state.u, data))

    @jax.jit
    def collect(state, actions, pool):
        state, out = env.vec_step(state, actions, pool)
        return state, out.reward

    actions = jax.device_put(jnp.zeros((batch, 1, 4)), data)
    state, rewards = collect(state, actions, pool)
    jax.block_until_ready(rewards)
    assert rewards.shape == (batch,)
    print(f"[dryrun] env collect OK on {n_devices} devices: rewards {rewards.shape}")
