"""Training losses incl. physics-informed variants.

Reference: ``/root/reference/pdecontrol/surrogates/phyloss/phyloss.py``.
Losses are pure elementwise functions (reduction="none" semantics); the
string registry mirrors the reference's ``getattr(phyloss, name)`` lookup
(mbrl.py:213).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from pdecontrol_tpu.ops.burgers import BurgersOperators, burgers_rhs

Array = jax.Array


def mse_loss(pred: Array, target: Array, **_) -> Array:
    return (pred - target) ** 2


class PhyPDELoss:
    """MSE between a predicted sequence and its own one-step physics
    evolution, shifted by one frame (phyloss.py:13-25)."""

    def __init__(self, phyevolve: Callable[[Array], Array]):
        self.phyevolve = phyevolve

    def __call__(self, augmented: Array, *args, **kwargs) -> Array:
        phytargets = self.phyevolve(augmented)
        phytargets = jnp.concatenate(
            (augmented[:, -1:, :, :], phytargets[:, :-1, :, :]), axis=1
        )
        return (augmented - phytargets) ** 2


class BurgersPhyPDELoss(PhyPDELoss):
    """Physics loss with the Burgers FD residual + Heun step
    (phyloss.py:36-89); consumes the env scenario's ``dx``/``dt``/``nu``."""

    def __init__(self, dx: float, dt: float, nu: float, N: int = 64, **_):
        self.dx, self.dt, self.nu = dx, dt, nu
        self.ops = BurgersOperators.create(N, N * dx, nu)

    def residual(self, u: Array) -> Array:
        b, t, c, h = u.shape
        flat = u.reshape(b * t * c, h)
        out = burgers_rhs(self.ops, flat, jnp.zeros_like(flat))
        return out.reshape(b, t, c, h)

    def phyevolve(self, u: Array) -> Array:
        utilde = u + 0.5 * self.dt * self.residual(u)
        return u + self.dt * self.residual(utilde)


def make_loss(name: str, scenario: Dict) -> Callable[..., Array]:
    """Resolve a loss by name with scenario kwargs filtered in (the
    reference's ``ignore_extra_keywords`` splat, mbrl.py:213-216)."""
    if name == "MSELoss":
        return mse_loss
    if name == "BurgersPhyPDELoss":
        keys = {k: scenario[k] for k in ("dx", "dt", "nu", "N") if k in scenario}
        return BurgersPhyPDELoss(**keys)
    raise KeyError(f"unknown loss {name!r}")
