"""Surrogate evaluation metric battery.

Jitted re-design of the reference ``test_step``
(``/root/reference/pdecontrol/surrogates/training.py:176-271``): open-loop
free-run from a tau warmup, then

  * state metrics: MSE, L1/L2 norms per horizon step, relative L1/L2, NRMSE
    (norms over the spatial axis, averaged over batch and channels);
  * reward metrics: the env reward recomputed from true vs predicted states
    with the forcing field from the logged actions, scored per step with
    L1/L2/relative/NRMSE over the batch axis;
  * derivative metrics: the env's spatial derivatives (u_x upwind-of-u^2,
    u_xx, u_xxxx) recomputed on true vs predicted states.

All metrics are computed in *unscaled* (physical) space
(training.py:191-193).  The per-sample Python loops of the reference
(training.py:214-233) are batched evaluations here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from pdecontrol_tpu.data.types import Sample
from pdecontrol_tpu.envs.transforms import Normalize, SampleTransform

Array = jax.Array

EPS = 1e-12


def _state_metrics(prefix: str, outputs: Array, states: Array) -> Dict[str, Array]:
    diff = outputs - states
    l1 = jnp.sum(jnp.abs(diff), axis=3)
    l2 = jnp.sqrt(jnp.sum(diff**2, axis=3))
    s1 = jnp.sum(jnp.abs(states), axis=3)
    s2 = jnp.sqrt(jnp.sum(states**2, axis=3))
    return {
        f"{prefix}l1_loss": jnp.mean(l1, axis=(0, 2)),
        f"{prefix}l2_loss": jnp.mean(l2, axis=(0, 2)),
        f"{prefix}l1_loss_scaled": jnp.mean(l1 / (s1 + EPS), axis=(0, 2)),
        f"{prefix}l2_loss_scaled": jnp.mean(l2 / (s2 + EPS), axis=(0, 2)),
        f"{prefix}nrmse": jnp.mean(l2**2 / (s2**2 + EPS), axis=(0, 2)),
    }


def surrogate_metric_battery(
    module,
    params,
    batch: Sample,
    stransf: SampleTransform,
    und: Normalize,
    env,
    tau: int,
) -> Dict[str, Array]:
    """Full test battery on a transformed batch ([B, T, C, H] obs/actions)."""
    states, actions = batch.obs, batch.actions

    roll = module.apply(
        {"params": params}, states[:, :tau], actions, dscaling=und.inv
    )
    # IC-augmented prediction sequence (training.py:186-189).
    outputs = jnp.concatenate([states[:, :1], roll.outputs[:, :-1]], axis=1)

    states_u = stransf.otransf.inverse(states)
    outputs_u = stransf.otransf.inverse(outputs)

    metrics: Dict[str, Array] = {"MSE": jnp.mean((outputs_u - states_u) ** 2)}
    metrics.update(_state_metrics("", outputs_u, states_u))

    # ---- reward metrics (training.py:204-225)
    env_actions = stransf.atransf.inverse(actions)
    phi = env.forcing.apply(env_actions)  # [B, T, C, H]
    b, t = states.shape[:2]
    rews = env.reward_fn(states_u.reshape((b * t,) + states_u.shape[2:]),
                         phi.reshape((b * t,) + phi.shape[2:])).reshape(b, t)
    pred = env.reward_fn(outputs_u.reshape((b * t,) + outputs_u.shape[2:]),
                         phi.reshape((b * t,) + phi.shape[2:])).reshape(b, t)
    dr = rews - pred
    r1 = jnp.sum(jnp.abs(dr), axis=0)
    r2 = jnp.sqrt(jnp.sum(dr**2, axis=0))
    n1 = jnp.sum(jnp.abs(rews), axis=0)
    n2 = jnp.sqrt(jnp.sum(rews**2, axis=0))
    metrics.update({
        "l1_loss_rews": r1,
        "l2_loss_rews": r2,
        "l1_loss_scaled_rews": r1 / (n1 + EPS),
        "l2_loss_scaled_rews": r2 / (n2 + EPS),
        "nrmse_rews": r2**2 / (n2**2 + EPS),
    })

    # ---- derivative metrics (training.py:227-248)
    if hasattr(env, "ops") and hasattr(env.ops, "central"):
        from pdecontrol_tpu.ops.kuramoto import ks_derivatives

        derivs_fn = lambda u: jnp.stack(ks_derivatives(env.ops, u), axis=2)
    else:
        from pdecontrol_tpu.ops.burgers import burgers_derivatives

        derivs_fn = lambda u: jnp.stack(burgers_derivatives(env.ops, u), axis=2)

    dt_true = derivs_fn(states_u.astype(env.dtype))  # [B, T, D, C, H]
    dt_pred = derivs_fn(outputs_u.astype(env.dtype))
    dd = dt_pred - dt_true
    d1 = jnp.sum(jnp.abs(dd), axis=4)
    d2 = jnp.sqrt(jnp.sum(dd**2, axis=4))
    t1 = jnp.sum(jnp.abs(dt_true), axis=4)
    t2 = jnp.sqrt(jnp.sum(dt_true**2, axis=4))
    names = ("l1_loss_derivs", "l2_loss_derivs", "l1_loss_scaled_derivs",
             "l2_loss_scaled_derivs", "nrms_derivs")
    values = (
        jnp.mean(d1, axis=(0, 3)),
        jnp.mean(d2, axis=(0, 3)),
        jnp.mean(d1 / (t1 + EPS), axis=(0, 3)),
        jnp.mean(d2 / (t2 + EPS), axis=(0, 3)),
        jnp.mean(d2**2 / (t2**2 + EPS), axis=(0, 3)),
    )
    for name, val in zip(names, values):  # val: [T, D]
        for d in range(val.shape[1]):
            metrics[f"{name}-derivative-{d}"] = val[:, d]

    metrics["states"] = states_u
    metrics["outputs"] = outputs_u
    metrics["actions"] = env_actions
    return metrics
