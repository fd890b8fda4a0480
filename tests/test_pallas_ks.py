"""Pallas fused KS kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdecontrol_tpu.ops.kuramoto import KSOperators, ks_control_period
from pdecontrol_tpu.ops.pallas_ks import ks_control_period_pallas


@pytest.mark.parametrize("objective", ["l2control", "dissipation"])
def test_pallas_matches_xla(objective):
    ops = KSOperators.create(64, 22.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (8, 64), minval=-1.0, maxval=1.0,
                           dtype=jnp.float32)
    phi = 0.3 * jnp.sin(2 * jnp.pi * jnp.arange(64) / 64)[None, :].astype(
        jnp.float32
    ).repeat(8, 0)

    u_ref, r_ref = ks_control_period(ops, u, phi, 1e-3, 20, objective)
    u_pal, r_pal = ks_control_period_pallas(
        ops, u, phi, 1e-3, 20, objective, block=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=2e-5, atol=2e-6)


def test_pallas_block_divisor_fallback():
    ops = KSOperators.create(64, 22.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (12, 64), minval=-1, maxval=1, dtype=jnp.float32)
    phi = jnp.zeros((12, 64), jnp.float32)
    u1, r1 = ks_control_period_pallas(ops, u, phi, 1e-3, 4, block=8,
                                      interpret=True)
    u2, r2 = ks_control_period(ops, u, phi, 1e-3, 4, "l2control")
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=2e-5,
                               atol=2e-6)
