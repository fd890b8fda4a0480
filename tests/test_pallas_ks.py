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


def test_packed_kernel_matches_xla():
    from pdecontrol_tpu.ops.pallas_ks_packed import ks_control_period_packed

    ops = KSOperators.create(64, 22.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (8, 64), minval=-1, maxval=1, dtype=jnp.float32)
    phi = 0.2 * jnp.cos(2 * jnp.pi * jnp.arange(64) / 64)[None, :].astype(
        jnp.float32
    ).repeat(8, 0)

    u_ref, r_ref = ks_control_period(ops, u, phi, 1e-3, 20, "l2control")
    # interpret-mode pallas on CPU requires replacing the mosaic call;
    # validate the packed math through the public API on whatever backend
    # the test session uses (CPU -> interpret unsupported, so emulate):
    from pdecontrol_tpu.ops import pallas_ks_packed as P

    wl, wu = P.packed_matrices(ops)
    b, n = u.shape
    x = np.asarray(u).reshape(b // 2, 2 * n)
    ph = np.asarray(phi).reshape(b // 2, 2 * n)

    def rhs(x):
        lin = x @ wl
        y = (x * x) @ wu
        ux = np.where(x < 0, y[:, : 2 * n], y[:, 2 * n :])
        return lin - 0.5 * ux + ph

    acc = np.zeros((b // 2, 2), np.float32)
    for _ in range(20):
        acc[:, 0] -= (x[:, :n] ** 2).mean(axis=1)
        acc[:, 1] -= (x[:, n:] ** 2).mean(axis=1)
        k1 = rhs(x)
        k2 = rhs(x + 1e-3 * k1 / 2)
        k3 = rhs(x + 1e-3 * k2 / 2)
        k4 = rhs(x + 1e-3 * k3)
        x = x + 1e-3 * (k1 + 2 * k2 + 2 * k3 + k4) / 6
    u_pack = x.reshape(b, n)
    r_pack = (acc / 20).reshape(b)
    np.testing.assert_allclose(u_pack, np.asarray(u_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(r_pack, np.asarray(r_ref), rtol=2e-5, atol=2e-6)


def test_packed_precision_limbs_consistent():
    """bf16 limb splitting is exact: hi + lo == x in float32, and
    W_hi + W_lo reconstructs W."""
    ops = KSOperators.create(64, 22.0, dtype=jnp.float32)
    from pdecontrol_tpu.ops import pallas_ks_packed as P

    wl, wu = P.packed_matrices(ops)
    for w in (wl, wu):
        wj = jnp.asarray(w)
        hi = wj.astype(jnp.bfloat16).astype(jnp.float32)
        lo = wj - hi
        np.testing.assert_array_equal(np.asarray(hi + lo), np.asarray(wj))

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128), jnp.float32)
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (x - hi).astype(jnp.bfloat16).astype(jnp.float32)
    # two-limb reconstruction error ~2^-17 relative
    err = float(jnp.max(jnp.abs(hi + lo - x) / (jnp.abs(x) + 1e-9)))
    assert err < 2**-15
