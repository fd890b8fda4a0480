"""Lane-packed Pallas KS kernel: two batch rows per 128-lane register.

The baseline kernel (``pallas_ks``) operates on ``[B, N=64]`` tiles, using
only half of each 128-lane TPU vector register for every elementwise op —
and the RK4 update is elementwise-dominated once the matmuls run at low
pass counts.  Since a row-major ``[B, 64]`` array *is* a ``[B/2, 128]``
array bit-for-bit, this kernel reinterprets the state so that

  * every VPU op processes two environment rows per register (2x VPU
    throughput),
  * derivative matmuls use block-diagonal packed operators
    (``[128, 128]`` linear term, ``[128, 256]`` upwind term) — the same
    useful FLOPs as the unpacked fused operator,
  * the per-row reward (either objective; dissipation adds one packed
    u_xx matmul per sub-step) reduces the two lane halves separately.

Matmul precision is selectable:
  * ``"highest"`` — 6-pass float32 (bit-comparable to the XLA path),
  * ``"bf16_3x"`` — manual 3-pass bfloat16 splitting (x = hi + lo;
    x@W ~= hi@W_hi + hi@W_lo + lo@W_hi), ~2^-18 relative per product,
  * ``"bf16_4x"`` — adds the lo@W_lo term (fp32-grade for this stencil),
  * ``"bf16"``    — single pass (fastest, for statistics-only workloads).

Operator layout under limb precision — measured pitfall: the bf16 modes
must NOT use the pre-summed linear operator ``-(c_xx + c_xxxx)``.  Its
4th-derivative coefficients (O(1e2-1e3)) dominate the 2nd-derivative ones
(O(1e1)), so the summed matrix's two-limb bf16 representation carries a
systematic ~1e-4 relative perturbation of the *anti-diffusion* (u_xx)
operator — an effective-viscosity shift that drains the chaotic attractor
(measured: -1.7e-5 mean signed energy error per RK4 sub-step; -2%% mean
energy, -5%% <u_x^2> over 400 periods — caught by
``evaluation/bf16_gate.py``).  The bf16 modes therefore use a separate
block layout ``[2N, 4N]`` (``-c_xx`` | ``-c_xxxx``) summed post-dot in
float32, which restores unbiased statistics (+2.4e-6 per sub-step, gate
PASS) at ~4/3 the linear-matmul FLOPs; ``highest`` keeps the fused
``[2N, 2N]`` operator (f32 carries both scales fine).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdecontrol_tpu.ops.kuramoto import DISSIPATION, L2CONTROL, KSOperators

Array = jax.Array


def packed_matrices(ops: KSOperators) -> Tuple[np.ndarray, np.ndarray]:
    """(W_lin [2N, 2N], W_up [2N, 4N]) block-diagonal packed operators.

    With X = packed ``[B/2, 2N]`` (lanes [0, N) = even row, [N, 2N) = odd):
      X @ W_lin   -> packed ``-(u_xx + u_xxxx)`` per row;
      (X*X) @ W_up -> packed ``fwd | bwd`` upwind derivatives of u^2
                      (cols [0, 2N) fwd-packed, [2N, 4N) bwd-packed).
    """
    n = ops.n
    cen = np.asarray(ops.central, np.float64)  # [N, 2N] right-mult layout
    up = np.asarray(ops.upwind, np.float64)  # [N, 2N] fwd | bwd

    a = -(cen[:, :n] + cen[:, n:])  # [N, N] linear term
    w_lin = np.zeros((2 * n, 2 * n), np.float32)
    w_lin[:n, :n] = a
    w_lin[n:, n:] = a

    w_up = np.zeros((2 * n, 4 * n), np.float32)
    w_up[:n, :n] = up[:, :n]  # fwd, even row
    w_up[n:, n : 2 * n] = up[:, :n]  # fwd, odd row
    w_up[:n, 2 * n : 3 * n] = up[:, n:]  # bwd, even row
    w_up[n:, 3 * n :] = up[:, n:]  # bwd, odd row
    return w_lin, w_up


def packed_linear_separate(ops: KSOperators) -> np.ndarray:
    """``[2N, 4N]`` separate-block linear operator for the bf16-limb modes:
    cols ``[0, 2N)`` give packed ``-u_xx``, cols ``[2N, 4N)`` packed
    ``-u_xxxx``; the kernel sums the halves post-dot in float32.  Keeping
    the two derivative scales in separate bf16-rounded blocks avoids the
    systematic effective-viscosity bias of the pre-summed operator (see
    module docstring)."""
    n = ops.n
    cen = np.asarray(ops.central, np.float64)
    w = np.zeros((2 * n, 4 * n), np.float32)
    w[:n, :n] = -cen[:, :n]  # -c_xx, even row
    w[n:, n : 2 * n] = -cen[:, :n]  # -c_xx, odd row
    w[:n, 2 * n : 3 * n] = -cen[:, n:]  # -c_xxxx, even row
    w[n:, 3 * n :] = -cen[:, n:]  # -c_xxxx, odd row
    return w


def packed_uxx_matrix(ops: KSOperators) -> np.ndarray:
    """Packed ``[2N, 2N]`` block-diagonal u_xx operator — only needed by the
    dissipation objective, which scores mean(u_xx^2) on the pre-step state."""
    n = ops.n
    cen = np.asarray(ops.central, np.float64)
    w = np.zeros((2 * n, 2 * n), np.float32)
    w[:n, :n] = cen[:, :n]
    w[n:, n:] = cen[:, :n]
    return w


def _make_dot(precision: str):
    if precision == "highest":
        def dot(x, w, w_lo):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        return dot
    if precision == "bf16":
        def dot(x, w, w_lo):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return dot
    if precision == "bf16_3x":
        def dot(x, w, w_lo):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            y = jax.lax.dot_general(hi, w, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(hi, w_lo, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(lo, w, dn, preferred_element_type=jnp.float32)
            return y
        return dot
    if precision == "bf16_4x":
        # Full two-limb product: adds the lo x lo term (~2^-21 relative,
        # fp32-grade for this stencil), at 4/6 the passes of HIGHEST.
        def dot(x, w, w_lo):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            y = jax.lax.dot_general(hi, w, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(hi, w_lo, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(lo, w, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(lo, w_lo, dn, preferred_element_type=jnp.float32)
            return y
        return dot
    raise ValueError(f"unknown precision {precision!r}")


def _kernel(u_ref, phi_ref, wl_ref, wu_ref, wl_lo_ref, wu_lo_ref, wxx_ref,
            wxx_lo_ref, u_out_ref, rew_out_ref, *, n, dt, cfg_steps,
            objective, precision):
    x = u_ref[:]  # [Bt/2, 2N] packed
    phi = phi_ref[:]
    wl, wu = wl_ref[:], wu_ref[:]
    wl_lo, wu_lo = wl_lo_ref[:], wu_lo_ref[:]
    wxx, wxx_lo = wxx_ref[:], wxx_lo_ref[:]
    dot = _make_dot(precision)

    def rhs(x):
        lin = dot(x, wl, wl_lo)
        if lin.shape[-1] == 4 * n:  # separate-block layout (bf16 modes)
            lin = lin[:, : 2 * n] + lin[:, 2 * n :]
        s = x * x
        y = dot(s, wu, wu_lo)
        ux = jnp.where(x < 0, y[:, : 2 * n], y[:, 2 * n :])
        return lin - 0.5 * ux + phi, ux, lin

    def halves_mean(v):
        # per-original-row mean over the two packed lane halves -> [Bt/2, 2]
        a = jnp.sum(v[:, :n], axis=1, keepdims=True)
        b = jnp.sum(v[:, n:], axis=1, keepdims=True)
        return jnp.concatenate([a, b], axis=1) * (1.0 / n)

    def body(_, carry):
        x, acc = carry
        # Reward on the pre-step state (kuramoto.py:82-96).
        k1, ux, _ = rhs(x)
        if objective == L2CONTROL:
            r = -halves_mean(x * x)
        else:  # DISSIPATION: -(mean(u_xx^2) + mean(u_x^2) + mean(u*phi))
            uxx = dot(x, wxx, wxx_lo)
            r = -(halves_mean(uxx * uxx) + halves_mean(ux * ux)
                  + halves_mean(x * phi))
        acc = acc + r
        k2, _, _ = rhs(x + dt * k1 / 2.0)
        k3, _, _ = rhs(x + dt * k2 / 2.0)
        k4, _, _ = rhs(x + dt * k3)
        x = x + dt * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
        return x, acc

    acc0 = jnp.zeros((x.shape[0], 2), jnp.float32)
    x, acc = jax.lax.fori_loop(0, cfg_steps, body, (x, acc0))
    u_out_ref[:] = x
    rew_out_ref[:] = acc / cfg_steps


@functools.partial(
    jax.jit,
    static_argnames=("dt", "cfg_steps", "objective", "block", "precision",
                     "interpret"),
)
def _call(u2, phi2, wl, wu, wl_lo, wu_lo, wxx, wxx_lo, dt, cfg_steps,
          objective, block, precision, interpret):
    b2, n2 = u2.shape
    n = n2 // 2
    grid = (b2 // block,)
    kern = functools.partial(
        _kernel, n=n, dt=dt, cfg_steps=cfg_steps, objective=objective,
        precision=precision,
    )
    u_out, rew = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wl.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wu.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wl.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wu.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wxx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wxx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b2, n2), jnp.float32),
            jax.ShapeDtypeStruct((b2, 2), jnp.float32),
        ],
        interpret=interpret,
    )(u2, phi2, wl, wu, wl_lo, wu_lo, wxx, wxx_lo)
    return u_out, rew


def ks_control_period_packed(
    ops: KSOperators,
    u: Array,
    phi: Array,
    dt: float,
    cfg_steps: int,
    objective: str = L2CONTROL,
    block: int = 1024,
    precision: str = "highest",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Packed fused control period, both objectives (dissipation adds one
    packed u_xx matmul per sub-step on the pre-step state)."""
    if objective not in (L2CONTROL, DISSIPATION):
        raise ValueError(f"unknown objective {objective!r}")
    b, n = u.shape
    if b % 2:
        raise ValueError("batch must be even for lane packing")
    wl, wu = packed_matrices(ops)
    if precision != "highest":
        # bf16-limb modes need the derivative scales in separate bf16
        # blocks (see module docstring: pre-summing biases the attractor).
        wl = packed_linear_separate(ops)
    wl = jnp.asarray(wl)
    wu = jnp.asarray(wu)
    wxx = jnp.asarray(packed_uxx_matrix(ops))
    wl_lo = wl - wl.astype(jnp.bfloat16).astype(jnp.float32)
    wu_lo = wu - wu.astype(jnp.bfloat16).astype(jnp.float32)
    wxx_lo = wxx - wxx.astype(jnp.bfloat16).astype(jnp.float32)

    u2 = u.astype(jnp.float32).reshape(b // 2, 2 * n)
    phi2 = jnp.broadcast_to(phi, u.shape).astype(jnp.float32).reshape(
        b // 2, 2 * n
    )
    block = min(block, u2.shape[0])
    while u2.shape[0] % block != 0:
        block //= 2
    u_out, rew = _call(u2, phi2, wl, wu, wl_lo, wu_lo, wxx, wxx_lo, dt,
                       cfg_steps, objective, block, precision, interpret)
    return u_out.reshape(b, n), rew.reshape(b)
