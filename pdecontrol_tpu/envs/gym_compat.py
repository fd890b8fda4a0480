"""Gym-style stateful adapter over the functional envs.

The reference exposes its environments through the gym registry
(``pdegym/kuramoto/__init__.py:26-37``: ``KuramotoSivashinskyEnv-v0`` plus
an SB3 variant with flattened spaces).  This module provides the equivalent
imperative interface — ``make(env_id)`` returning an object with
``reset()``/``step(action)`` in the new (5-tuple) gym step API — for users
migrating hand-written loops or third-party agents.  Internally each call is
a jitted functional step; the adapter just carries the state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_REGISTRY: Dict[str, Any] = {}


class Space:
    """Minimal Box-like space."""

    def __init__(self, low, high, shape, seed: int = 0):
        self.low, self.high, self.shape = low, high, tuple(shape)
        self._rng = np.random.default_rng(seed)

    def sample(self) -> np.ndarray:
        lo = self.low if np.ndim(self.low) else np.full(self.shape, self.low)
        hi = self.high if np.ndim(self.high) else np.full(self.shape, self.high)
        lo = np.nan_to_num(lo, neginf=-1.0)
        hi = np.nan_to_num(hi, posinf=1.0)
        return self._rng.uniform(lo, hi, size=self.shape).astype(np.float32)


class GymEnv:
    """Stateful single-env adapter (new gym step API: 5-tuple)."""

    def __init__(self, env, flatten: bool = False, exact_reset: bool = False,
                 pool_size: int = 64, seed: int = 0):
        self.env = env
        self.flatten = flatten
        self.exact_reset = exact_reset
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._pool = None
        self._pool_size = pool_size
        self._step = jax.jit(env.step)

        oshape = env.obs_shape[1:] if flatten else env.obs_shape
        ashape = env.action_shape[1:] if flatten else env.action_shape
        self.observation_space = Space(-np.inf, np.inf, oshape, seed)
        self.action_space = Space(env.action_low, env.action_high, ashape, seed)

    @property
    def unwrapped(self):
        return self.env

    @property
    def scenario(self):
        return self.env.scenario

    @property
    def max_episode_steps(self) -> int:
        return self.env.max_episode_steps

    def reset(self, seed: Optional[int] = None, return_info: bool = False):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        if self.exact_reset:
            self._state = self.env.reset(k)
        else:
            if self._pool is None:
                self._key, kp = jax.random.split(self._key)
                maker = _pool_maker(self.env)
                self._pool = maker(self.env, kp, self._pool_size)
            self._state = self.env.reset_from_pool(k, self._pool)
        obs = np.asarray(jax.device_get(self.env.observe(self._state)))
        obs = obs[0] if self.flatten else obs
        if return_info:
            return obs, {"step": 0}
        return obs

    def step(self, action) -> Tuple[np.ndarray, float, bool, bool, Dict]:
        action = jnp.asarray(np.asarray(action, np.float32))
        if self.flatten:
            action = action[None]
        self._state, out = self._step(self._state, action)
        obs = np.asarray(jax.device_get(out.obs))
        obs = obs[0] if self.flatten else obs
        info = {"step": int(jax.device_get(out.info["step"]))}
        return (
            obs,
            float(jax.device_get(out.reward)),
            bool(jax.device_get(out.terminated)),
            bool(jax.device_get(out.truncated)),
            info,
        )


def _pool_maker(env):
    from pdecontrol_tpu.envs import burgers, kuramoto

    if isinstance(env, kuramoto.KuramotoSivashinsky):
        return kuramoto.make_reset_pool
    return lambda e, k, n: burgers.make_reset_pool(e, k, n)


def register(env_id: str, builder) -> None:
    _REGISTRY[env_id] = builder


def make(env_id: str, config: Optional[Dict] = None, **kwargs) -> GymEnv:
    """Reference ``pdegym.kuramoto.make`` equivalent (TimeLimit semantics are
    native to the functional env's truncation counter)."""
    if env_id not in _REGISTRY:
        raise KeyError(f"unknown env {env_id!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[env_id](config or {}, **kwargs)


def _build_ks(config, **kwargs):
    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky

    return GymEnv(KuramotoSivashinsky.create(**config), **kwargs)


def _build_ks_sb3(config, **kwargs):
    # SB3 variant: flattened obs/action spaces (pdegym/kuramoto/__init__.py:15-23).
    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky

    return GymEnv(KuramotoSivashinsky.create(**config), flatten=True, **kwargs)


def _build_burgers(config, **kwargs):
    from pdecontrol_tpu.envs.burgers import Burgers

    return GymEnv(Burgers.create(**config), **kwargs)


register("KuramotoSivashinskyEnv-v0", _build_ks)
register("KuramotoSivashinskyEnvSB3-v0", _build_ks_sb3)
register("BurgersEnv-v0", _build_burgers)
