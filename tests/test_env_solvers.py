"""Env-level solver-backend equivalence: the ``solver=`` product modes.

The headline bench number must be attainable through the product env API,
so `KuramotoSivashinsky.step` with ``solver="pallas"``/``"pallas_packed"``
must match the XLA path at fp32 round-off for BOTH objectives (the pallas
kernels run in interpret mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdecontrol_tpu.envs.kuramoto import EnvState, KuramotoSivashinsky


def _env(solver, objective):
    # legacy_objective=False so the objective string is honored literally
    # (the quirk path is covered by test_solver.py).
    return KuramotoSivashinsky.create(
        cfg_steps=25,
        objective=objective,
        legacy_objective=False,
        dtype=jnp.float32,
        solver=solver,
        pallas_interpret=True,
    )


def _state(env, batch=8, seed=0):
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (batch, env.n), minval=-1.0, maxval=1.0,
                           dtype=jnp.float32)
    return EnvState(u=u, step=jnp.zeros((batch,), jnp.int32),
                    key=jax.random.PRNGKey(seed + 1))


@pytest.mark.parametrize("solver", ["pallas", "pallas_packed"])
@pytest.mark.parametrize("objective", ["l2control", "dissipation"])
def test_env_step_solver_matches_xla(solver, objective):
    ref_env = _env("xla", objective)
    env = _env(solver, objective)
    state = _state(ref_env)
    key = jax.random.PRNGKey(42)
    actions = jax.random.uniform(key, (3, 8, 1, ref_env.num_jets),
                                 minval=-1.0, maxval=1.0, dtype=jnp.float32)

    ref_state, test_state = state, state
    for t in range(actions.shape[0]):
        ref_state, ref_out = ref_env.step(ref_state, actions[t])
        test_state, test_out = env.step(test_state, actions[t])
        np.testing.assert_allclose(
            np.asarray(test_out.obs), np.asarray(ref_out.obs),
            rtol=3e-5, atol=3e-6,
        )
        np.testing.assert_allclose(
            np.asarray(test_out.reward), np.asarray(ref_out.reward),
            rtol=3e-5, atol=3e-6,
        )
        np.testing.assert_array_equal(np.asarray(test_out.truncated),
                                      np.asarray(ref_out.truncated))


def test_env_packed_odd_batch_falls_back():
    """Odd flat batches can't lane-pack; the dispatch silently uses the
    general fused kernel instead (shape-static decision)."""
    env = _env("pallas_packed", "l2control")
    ref_env = _env("xla", "l2control")
    state = _state(env, batch=5)
    action = jnp.full((5, 1, env.num_jets), 0.3, jnp.float32)
    _, out = env.step(state, action)
    _, ref_out = ref_env.step(state, action)
    np.testing.assert_allclose(np.asarray(out.obs), np.asarray(ref_out.obs),
                               rtol=3e-5, atol=3e-6)


def test_env_unbatched_pallas_step():
    env = _env("pallas", "dissipation")
    ref_env = _env("xla", "dissipation")
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (env.n,), minval=-1.0, maxval=1.0,
                           dtype=jnp.float32)
    state = EnvState(u=u, step=jnp.zeros((), jnp.int32),
                     key=jax.random.PRNGKey(8))
    action = jnp.full((1, env.num_jets), -0.2, jnp.float32)
    _, out = env.step(state, action)
    _, ref_out = ref_env.step(state, action)
    assert out.reward.shape == ()
    np.testing.assert_allclose(np.asarray(out.obs), np.asarray(ref_out.obs),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(out.reward),
                               np.asarray(ref_out.reward),
                               rtol=3e-5, atol=3e-6)


def test_create_rejects_unknown_solver_and_f64():
    with pytest.raises(ValueError):
        KuramotoSivashinsky.create(solver="bogus")
    with pytest.raises(ValueError):
        KuramotoSivashinsky.create(solver="pallas", dtype=jnp.float64)


def test_packed_kernel_dissipation_matches_xla():
    """Kernel-level check for the new dissipation path of the packed
    kernel (interpret mode)."""
    from pdecontrol_tpu.ops.kuramoto import KSOperators, ks_control_period
    from pdecontrol_tpu.ops.pallas_ks_packed import ks_control_period_packed

    ops = KSOperators.create(64, 22.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (8, 64), minval=-1, maxval=1,
                           dtype=jnp.float32)
    phi = 0.2 * jnp.cos(2 * jnp.pi * jnp.arange(64) / 64)[None, :].astype(
        jnp.float32
    ).repeat(8, 0)
    u_ref, r_ref = ks_control_period(ops, u, phi, 1e-3, 20, "dissipation")
    u_pk, r_pk = ks_control_period_packed(ops, u, phi, 1e-3, 20,
                                          "dissipation", interpret=True)
    np.testing.assert_allclose(np.asarray(u_pk), np.asarray(u_ref),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(r_pk), np.asarray(r_ref),
                               rtol=3e-5, atol=3e-6)
