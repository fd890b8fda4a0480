"""Training losses incl. physics-informed variants.

Reference: ``/root/reference/pdecontrol/surrogates/phyloss/phyloss.py``.
Losses are pure elementwise functions (reduction="none" semantics); the
name lookup in :func:`make_loss` mirrors the reference's
``getattr(phyloss, name)`` resolution (mbrl.py:213) with
``ignore_extra_keywords``-style kwargs filtering (mbrl.py:214).
"""

from __future__ import annotations

import inspect
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from pdecontrol_tpu.ops.burgers import BurgersOperators, burgers_rhs
from pdecontrol_tpu.ops.kuramoto import KSOperators, ks_rhs

Array = jax.Array


def mse_loss(pred: Array, target: Array, **_) -> Array:
    return (pred - target) ** 2


class PhyPDELoss:
    """MSE between a predicted sequence and its own one-step physics
    evolution, shifted by one frame (phyloss.py:13-25).

    Subclasses supply ``residual`` (the unforced PDE right-hand side on
    ``[B, T, C, H]``); ``phyevolve`` is one Heun step of it, matching the
    reference's explicit two-stage update (phyloss.py:74-86).  The
    reference's base class is abstract and cannot run by name; here
    ``make_loss("PhyPDELoss", scenario)`` dispatches to the scenario's PDE
    family (``nu`` present -> Burgers, else Kuramoto-Sivashinsky) so the
    name stays usable from the CLI.
    """

    def __init__(self, dt: float):
        self.dt = dt

    def residual(self, u: Array) -> Array:  # pragma: no cover - abstract
        raise NotImplementedError

    def phyevolve(self, u: Array) -> Array:
        utilde = u + 0.5 * self.dt * self.residual(u)
        return u + self.dt * self.residual(utilde)

    def __call__(self, augmented: Array, *args, **kwargs) -> Array:
        phytargets = self.phyevolve(augmented)
        phytargets = jnp.concatenate(
            (augmented[:, -1:, :, :], phytargets[:, :-1, :, :]), axis=1
        )
        return (augmented - phytargets) ** 2


class KSPhyPDELoss(PhyPDELoss):
    """Physics loss for Kuramoto-Sivashinsky: unforced KS residual
    (``-u_xxxx - u_xx - 0.5 * upwind((u^2)_x)``, ops/kuramoto.py) under the
    shared Heun evolution.  No reference counterpart (the reference ships
    only the Burgers residual, phyloss.py:36-89); consumes the env
    scenario's ``L``/``N``/``dt``."""

    def __init__(self, L: float, dt: float, N: int = 64, **_):
        super().__init__(dt)
        self.ops = KSOperators.create(N, L)

    def residual(self, u: Array) -> Array:
        b, t, c, h = u.shape
        flat = u.reshape(b * t * c, h)
        out = ks_rhs(self.ops, flat, jnp.zeros_like(flat))
        return out.reshape(b, t, c, h)


class BurgersPhyPDELoss(PhyPDELoss):
    """Physics loss with the Burgers FD residual + Heun step
    (phyloss.py:36-89); consumes the env scenario's ``dx``/``dt``/``nu``."""

    def __init__(self, dx: float, dt: float, nu: float, N: int = 64, **_):
        super().__init__(dt)
        self.dx, self.nu = dx, nu
        self.ops = BurgersOperators.create(N, N * dx, nu)

    def residual(self, u: Array) -> Array:
        b, t, c, h = u.shape
        flat = u.reshape(b * t * c, h)
        out = burgers_rhs(self.ops, flat, jnp.zeros_like(flat))
        return out.reshape(b, t, c, h)


# Name registry: every loss in this module is resolvable by its class/alias
# name, mirroring the reference's module-level getattr (mbrl.py:213).
REGISTRY: Dict[str, Callable] = {
    "MSELoss": lambda **_: mse_loss,
    "KSPhyPDELoss": KSPhyPDELoss,
    "BurgersPhyPDELoss": BurgersPhyPDELoss,
}


def make_loss(name: str, scenario: Dict) -> Callable[..., Array]:
    """Resolve a loss by name with scenario kwargs filtered in (the
    reference's ``ignore_extra_keywords`` splat, mbrl.py:213-216).

    ``"PhyPDELoss"`` dispatches on the scenario: Burgers when ``nu`` is
    present, KS otherwise — the base class itself has no residual."""
    if name == "PhyPDELoss":
        name = "BurgersPhyPDELoss" if "nu" in scenario else "KSPhyPDELoss"
    if name not in REGISTRY:
        raise KeyError(f"unknown loss {name!r}; have {sorted(REGISTRY)}")
    ctor = REGISTRY[name]
    sig = inspect.signature(ctor)
    accepts_any = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )
    kwargs = {
        k: v
        for k, v in scenario.items()
        if accepts_any or k in sig.parameters
    }
    return ctor(**kwargs)
