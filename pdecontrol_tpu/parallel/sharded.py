"""Sharded training-step builders over a device mesh.

The reference's parallelism is a pool of env subprocesses (SURVEY §2.5);
here the same three hot paths become sharded jitted programs over a
``Mesh(data, model)``:

  * env collection — env batch over ``data`` (DP over environments);
  * ensemble surrogate training — members over ``model`` (the EP analogue:
    true ensemble parallelism, each member trains on its own bootstrap
    batch), batches over ``data``;
  * SAC updates — batch over ``data`` with replicated parameters (gradients
    all-reduce over ICI automatically via jit's partitioner).

These builders are exercised by ``dryrun_multichip`` on a virtual CPU mesh
and are the composition points for real multi-chip runs.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from pdecontrol_tpu.parallel import mesh as meshlib

Array = jax.Array


def sharded_collect_fn(mesh, env, nsteps: int):
    """Batched env stepping with the env axis sharded over ``data``."""
    data = NamedSharding(mesh, P(meshlib.DATA_AXIS))

    @jax.jit
    def run(state, actions, pool):
        def body(state, a):
            state, out = env.vec_step(state, a, pool)
            return state, out.reward

        state, rewards = jax.lax.scan(body, state, actions)
        return state, rewards

    def place(state, actions, pool):
        state = state.replace(u=jax.device_put(state.u, data))
        actions = jax.device_put(
            actions, NamedSharding(mesh, P(None, meshlib.DATA_AXIS))
        )
        return state, actions, pool

    return run, place


def sharded_ensemble_train_fn(mesh, trainer):
    """One vmapped gradient step for ALL ensemble members at once: stacked
    params + per-member batches sharded over ``model`` via ``shard_map``.

    shard_map (not plain GSPMD propagation) because member training is
    embarrassingly parallel — each device runs its local members' convs
    unpartitioned.  GSPMD partitioning of the member-grouped convolutions
    that vmap emits miscompiles (deterministic O(1) numeric divergence,
    verified on the CPU backend), so the member axis must never be sharded
    through a convolution.
    """
    model_s = NamedSharding(mesh, P(meshlib.MODEL_AXIS))

    def one(state, states, actions, und, lr):
        return trainer.train_step(state, states, actions, und, lr)

    vstep = jax.vmap(one, in_axes=(0, 0, 0, None, None))
    m, r = P(meshlib.MODEL_AXIS), P()
    sharded = jax.shard_map(
        vstep, mesh=mesh, in_specs=(m, m, m, r, r), out_specs=(m, m),
        check_vma=False,
    )
    run = jax.jit(sharded)

    def place(stacked_state, batch_states, batch_actions):
        stacked_state = jax.tree.map(
            lambda x: jax.device_put(x, model_s), stacked_state
        )
        batch_states = jax.device_put(batch_states, model_s)
        batch_actions = jax.device_put(batch_actions, model_s)
        return stacked_state, batch_states, batch_actions

    return run, place


def sharded_sac_update_fn(mesh, sac):
    """SAC update with the batch sharded over ``data`` and replicated
    parameters (XLA inserts the gradient all-reduce)."""
    data = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def run(sac_state, batch, key):
        return sac.update(sac_state, batch, key)

    def place(sac_state, batch):
        sac_state = jax.tree.map(lambda x: jax.device_put(x, repl), sac_state)
        batch = jax.tree.map(lambda x: jax.device_put(x, data), batch)
        return sac_state, batch

    return run, place
