"""Simple agents (reference ``pdecontrol/mbrl/utils.py:19-36``).

``RandomAgent`` samples uniform actions; ``ActionRepeatAgent`` replays a
fixed action sequence — used for the open-loop surrogate evaluation
(mbrl.py:498-506).  Both expose the same ``select_action(state, obs, key)``
call signature as the SAC agent so workers are agent-agnostic.
"""

from __future__ import annotations

import jax

Array = jax.Array


class RandomAgent:
    def __init__(self, action_shape, low: float = -1.0, high: float = 1.0):
        self.action_shape = tuple(action_shape)
        self.low, self.high = low, high

    def select_action(self, state, obs: Array, key: Array,
                      deterministic: bool = False) -> Array:
        return jax.random.uniform(
            key, (obs.shape[0],) + self.action_shape,
            minval=self.low, maxval=self.high, dtype=obs.dtype,
        )


class ActionRepeatAgent:
    """Replays ``actions`` of shape [B, T, C, A]; the step pointer is the
    traced argument so it composes with ``lax.scan``."""

    def __init__(self, actions: Array):
        assert actions.ndim == 4
        self.actions = actions

    def action_at(self, t: Array) -> Array:
        return jax.lax.dynamic_index_in_dim(self.actions, t, axis=1,
                                            keepdims=False)
