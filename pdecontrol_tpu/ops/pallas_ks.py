"""Fused Pallas TPU kernel for the KS control period.

The XLA path (``ops.kuramoto.ks_control_period``) round-trips ``u`` through
HBM on every one of the 250 RK4 sub-steps.  This kernel keeps the state
tile, the stencil operators and the forcing resident in VMEM for the whole
control period, so the loop is compute-bound on the MXU instead of
HBM-bandwidth-bound:

  * one fused derivative matmul per RHS evaluation:
    ``[Bt, 2N] @ [2N, 4N]`` with X = [u | u^2] and a block-diagonal stencil
    matrix produces (u_xx, u_xxxx, upwind_fwd(u^2), upwind_bwd(u^2)) in a
    single full-depth MXU pass (contraction 128 for N = 64);
  * the 250-step RK4 loop is a ``fori_loop`` inside the kernel — zero HBM
    traffic between sub-steps;
  * the per-sub-step reward (either objective) accumulates in VMEM.

Numerics are identical to the XLA path (same coefficient tables, same
arithmetic ordering) — verified in tests against the golden solver.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdecontrol_tpu.ops.kuramoto import L2CONTROL, KSOperators

Array = jax.Array


def fused_stencil_matrix(ops: KSOperators) -> np.ndarray:
    """Block-diagonal ``[2N, 4N]`` operator: rows [0, N) hold the central
    stack (-> u_xx | u_xxxx), rows [N, 2N) the upwind stack
    (-> fwd | bwd), so ``[u | u^2] @ W`` yields all four derivative fields."""
    n = ops.n
    w = np.zeros((2 * n, 4 * n), np.float32)
    w[:n, : 2 * n] = np.asarray(ops.central, np.float32)
    w[n:, 2 * n :] = np.asarray(ops.upwind, np.float32)
    return w


def _kernel(u_ref, phi_ref, w_ref, u_out_ref, rew_out_ref, *, n, dt,
            cfg_steps, objective, inv_n):
    u = u_ref[:]
    phi = phi_ref[:]
    w = w_ref[:]

    def rhs(u):
        x = jnp.concatenate([u, u * u], axis=1)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        u_xx = y[:, :n]
        u_xxxx = y[:, n : 2 * n]
        fwd = y[:, 2 * n : 3 * n]
        bwd = y[:, 3 * n :]
        u_x = jnp.where(u < 0, fwd, bwd)
        return -u_xxxx - u_xx - 0.5 * u_x + phi, u_x, u_xx

    def body(_, carry):
        u, acc = carry
        k1, u_x, u_xx = rhs(u)
        if objective == L2CONTROL:
            r = -jnp.sum(u * u, axis=1, keepdims=True) * inv_n
        else:
            r = -(
                jnp.mean(u_xx * u_xx, axis=1, keepdims=True)
                + jnp.mean(u_x * u_x, axis=1, keepdims=True)
                + jnp.mean(u * phi, axis=1, keepdims=True)
            )
        acc = acc + r
        k2, _, _ = rhs(u + dt * k1 / 2.0)
        k3, _, _ = rhs(u + dt * k2 / 2.0)
        k4, _, _ = rhs(u + dt * k3)
        u = u + dt * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
        return u, acc

    acc0 = jnp.zeros((u.shape[0], 1), jnp.float32)
    u, acc = jax.lax.fori_loop(0, cfg_steps, body, (u, acc0))
    u_out_ref[:] = u
    rew_out_ref[:] = acc / cfg_steps


@functools.partial(
    jax.jit,
    static_argnames=("dt", "cfg_steps", "objective", "block", "interpret"),
)
def _call(u, phi, w, dt, cfg_steps, objective, block, interpret):
    b, n = u.shape
    grid = (b // block,)
    kern = functools.partial(
        _kernel, n=int(n), dt=dt, cfg_steps=cfg_steps, objective=objective,
        inv_n=1.0 / int(n),
    )
    flops_per_rhs = 2 * block * (2 * int(n)) * (4 * int(n))
    u_out, rew = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, int(n)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, int(n)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * int(n), 4 * int(n)), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, int(n)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, int(n)), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * cfg_steps * flops_per_rhs * grid[0],
            bytes_accessed=2 * b * int(n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(u, phi, w)
    return u_out, rew[:, 0]


def ks_control_period_pallas(
    ops: KSOperators,
    u: Array,
    phi: Array,
    dt: float,
    cfg_steps: int,
    objective: str = L2CONTROL,
    block: int = 256,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in fused replacement for ``ks_control_period`` (float32, batched
    ``u``/``phi`` of shape [B, N] with B a multiple of ``block`` — callers
    pad or shrink ``block`` as needed)."""
    if u.ndim != 2:
        raise ValueError(f"expected batched [B, N] state, got {u.shape}")
    b = u.shape[0]
    block = min(block, b)
    if b % block != 0:
        # Shrink to the largest divisor <= block (powers of two cover the
        # common batch sizes).
        while b % block != 0:
            block //= 2
        block = max(block, 1)
    w = jnp.asarray(fused_stencil_matrix(ops))
    phi = jnp.broadcast_to(phi, u.shape)
    return _call(
        u.astype(jnp.float32), phi.astype(jnp.float32), w, dt,
        cfg_steps, objective, block, interpret,
    )
