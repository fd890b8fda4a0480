"""Autoregressive PDE surrogates: teacher-forced + free-running rollout as
one ``lax.scan``.

Re-designs ``/root/reference/pdecontrol/surrogates/surrogate.py`` (and the
per-step Python loops of ``transition.py``) as a single fused scan over time
with a per-step teacher-forcing mask:

  * **AutoReg** mode (surrogate.py:58-133): encode states/actions; during the
    warmup the hidden state is overwritten with the encoded ground truth and
    the Euler residual update anchors on the ground-truth state
    ``u_{t+1} = u_t + delta * dscale(dec(latent))`` (surrogate.py:100-103);
    afterwards the model free-runs on its own predictions
    (surrogate.py:109-119).  The re-encoded previous output is
    gradient-stopped, mirroring ``.detach()`` at surrogate.py:103,115.
  * **Latent** mode (surrogate.py:136-206): integration happens in latent
    space ``z_{t+1} = z_t + delta * f(z, a)`` with decode-to-state per step;
    per-step deltas are recovered afterwards by differencing the decoded
    trajectory (surrogate.py:197-198).

Action-time alignment: the reference maps action timestamps onto solver
timepoints with ``searchsorted`` (surrogate.py:88-89).  In every in-loop use
the grids are uniform and 1:1; ``align_actions`` reproduces the general
mapping host-side (it is static) for offline evaluation.

The ensemble is the stacked-parameter ``vmap`` analogue of the reference's
module list (surrogate.py:22-55): all members advance in one program, and
per-batch-element elite selection is a gather.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from pdecontrol_tpu.data.types import ModelRollout
from pdecontrol_tpu.envs.transforms import Identity, Transform
from pdecontrol_tpu.models.blocks import batched_apply
from pdecontrol_tpu.models.transition import TransitionCell

Array = jax.Array

AUTOREG = "autoreg"
LATENT = "latent"


def align_actions(times: np.ndarray, delta: float) -> np.ndarray:
    """Host-side action->timepoint index map (surrogate.py:88-89)."""
    times = np.asarray(times).reshape(-1)
    timepoints = np.arange(times[0], times[-1] + delta, delta)
    return np.searchsorted(times, timepoints, side="right") - 1


class PDESurrogate(nn.Module):
    """One surrogate (encoder + transition cell + decoder) with a fused
    rollout.  ``delta`` is the control-period length (= surrogate step)."""

    state_encoder: nn.Module
    state_decoder: nn.Module
    action_encoder: nn.Module
    cell: TransitionCell
    delta: float
    mode: str = AUTOREG

    def __call__(
        self,
        states: Array,
        actions: Array,
        dscaling: Transform = Identity(),
        hidden: Any = None,
        reencode: Any = None,
    ) -> ModelRollout:
        return self.rollout(states, actions, dscaling, hidden, reencode)

    def rollout(
        self,
        states: Array,
        actions: Array,
        dscaling: Transform = Identity(),
        hidden: Any = None,
        reencode: Any = None,
    ) -> ModelRollout:
        """Teacher-force over ``states`` then free-run to ``actions`` length.

        states  [B, Tw, C, H] — warmup ground truth (Tw may be 1 for pure
                continuation from a given state).
        actions [B, T, Ca, A] with T >= Tw; steps [0, Tw) are teacher-forced,
                [Tw, T) free-run.
        reencode: optional static bool array [T] (or True for all steps).
                At marked free-run steps the model *self-forces*: the hidden
                state is overwritten with the gradient-stopped re-encoding of
                its own previous output, and that output (detached) anchors
                the Euler update.  This reproduces two reference behaviours
                exactly: the world-env's repeated 1-step rollouts (each call
                re-enters the teacher-forcing branch on the previous
                prediction, world/world.py:159-161 -> surrogate.py:97-107)
                and the TBPTT chunk boundaries (detached ``dslast`` fed back
                as the next chunk's warmup, training.py:86-98).
        Returns ``ModelRollout`` with per-step ``outputs``/``deltas``/latents
        (time length T) and the final transition carry.
        """
        b, tw = states.shape[:2]
        t_total = actions.shape[1]
        actions = actions.astype(states.dtype)

        if reencode is None:
            reencode_np = np.zeros(t_total, bool)
        elif reencode is True:
            reencode_np = np.ones(t_total, bool)
        else:
            reencode_np = np.asarray(reencode, bool)
        reencode_any = bool(reencode_np.any())

        lstates = batched_apply(self.state_encoder, states)
        lactions = batched_apply(self.action_encoder, actions)
        # NOTE (measured, r3): hoisting the carry-independent input-gate
        # projections out of the scan (the cuDNN-LSTM trick) LOSES ~35%
        # TBPTT throughput at this model size — the 4x-larger per-step xs
        # slice plus its saved residuals cost more HBM traffic than the tiny
        # in-scan x-conv saves (136 vs 216 train_steps/s on v5e).  Keep the
        # projections in-scan.

        pad = t_total - tw
        if pad > 0:
            zpad = lambda x: jnp.concatenate(
                [x, jnp.zeros((b, pad) + x.shape[2:], x.dtype)], axis=1
            )
            states_p, lstates_p = zpad(states), zpad(lstates)
        else:
            states_p, lstates_p = states, lstates

        if hidden is None:
            hidden = self.cell.init_carry(b, states.dtype)

        tf_flags = (jnp.arange(t_total) < tw)[None, :].repeat(b, axis=0)
        re_flags = jnp.asarray(reencode_np)[None, :].repeat(b, axis=0)

        if self.mode == AUTOREG:
            carry0 = (hidden, states[:, 0])

            def step(mdl, carry, xs):
                hidden, prev = carry
                state_gt, lstate_gt, laction, tf, re = xs
                tfb = tf[:, None, None]
                reb = re[:, None, None]

                if reencode_any:
                    # Self-forcing step: detach the carried state/hidden (the
                    # reference detaches dslast and the hidden between TBPTT
                    # chunks, training.py:86-98).
                    prev = jnp.where(reb, jax.lax.stop_gradient(prev), prev)
                    hidden = jax.tree.map(
                        lambda h: jnp.where(
                            re.reshape((-1,) + (1,) * (h.ndim - 1)),
                            jax.lax.stop_gradient(h),
                            h,
                        ),
                        hidden,
                    )

                if mdl.cell.needs_prev_latent or reencode_any:
                    # Two distinct detach semantics from the reference:
                    # self-forcing (TBPTT boundary) encodes the *detached*
                    # output but keeps encoder-weight gradients
                    # (training.py:86-98 -> surrogate.py:80); the plain
                    # free-run `inlast` detaches the encoder *output*
                    # (surrogate.py:103,115).
                    raw = mdl.state_encoder(jax.lax.stop_gradient(prev))
                    prev_lat = jnp.where(reb, raw, jax.lax.stop_gradient(raw))
                    lstate_in = jnp.where(tfb, lstate_gt, prev_lat)
                else:
                    # LSTM-family cells ignore lstate when not forcing
                    # (reference transition() ignores `states`), so skip the
                    # per-step re-encode the reference computes and discards.
                    prev_lat = lstate_gt
                    lstate_in = lstate_gt

                force = jnp.logical_or(tf, re)
                hidden, outlat = mdl.cell(hidden, laction, lstate_in, force)
                outdelta = mdl.state_decoder(outlat)
                base = jnp.where(tfb, state_gt, prev)
                out = base + mdl.delta * dscaling.apply(outdelta)
                inlat = jnp.where(tfb, lstate_gt, prev_lat)
                return (hidden, out), (out, outdelta, outlat, inlat)

            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            (hidden, _), (outputs, outdeltas, outlats, inlats) = scan(
                self, carry0, (states_p, lstates_p, lactions, tf_flags, re_flags)
            )
            return ModelRollout(
                outputs=outputs,
                inlatents=inlats,
                outlatents=outlats,
                deltas=outdeltas,
                hidden=hidden,
            )

        elif self.mode == LATENT:
            carry0 = (hidden, lstates[:, 0], states[:, 0])

            def step(mdl, carry, xs):
                hidden, inlatent, prev_out = carry
                lstate_gt, laction, tf, re = xs
                tfb = tf[:, None, None]

                if reencode_any:
                    # Self-forcing: re-anchor the integrated latent on the
                    # (detached) re-encoding of the previous decoded output —
                    # what the reference's repeated 1-step world rollouts do
                    # (surrogate.py:158-160 run the encoder on the previous
                    # outputs at every call).
                    reb = re[:, None, None]
                    relat = mdl.state_encoder(jax.lax.stop_gradient(prev_out))
                    inlatent = jnp.where(reb, relat, inlatent)
                    hidden = jax.tree.map(
                        lambda h: jnp.where(
                            re.reshape((-1,) + (1,) * (h.ndim - 1)),
                            jax.lax.stop_gradient(h),
                            h,
                        ),
                        hidden,
                    )

                lstate_in = jnp.where(tfb, lstate_gt, inlatent)
                force = jnp.logical_or(tf, re)
                hidden, outlat = mdl.cell(hidden, laction, lstate_in, force)
                nxtlatent = inlatent + mdl.delta * outlat
                out = mdl.state_decoder(nxtlatent)
                inlat = jnp.where(tfb, lstate_gt, inlatent)
                return (hidden, nxtlatent, out), (out, outlat, inlat)

            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            (hidden, _, _), (outputs, outlats, inlats) = scan(
                self, carry0, (lstates_p, lactions, tf_flags, re_flags)
            )
            # Per-step deltas recovered from the decoded trajectory
            # (surrogate.py:197-198), mapped back through the delta scaling.
            augmented = jnp.concatenate([states[:, :1], outputs], axis=1)
            deltas = dscaling.inverse(jnp.diff(augmented, axis=1) / self.delta)
            return ModelRollout(
                outputs=outputs,
                inlatents=inlats,
                outlatents=outlats,
                deltas=deltas,
                hidden=hidden,
            )

        raise ValueError(f"unknown mode {self.mode!r}")


class EnsembleState(struct.PyTreeNode):
    """Stacked ensemble parameters + elite bookkeeping.

    ``params`` leaves have a leading member axis M.  ``elite_mask`` is a
    boolean [M] marking the current elites (reference ``PDEEnsemble``,
    surrogate.py:22-55).
    """

    params: Any
    elite_mask: Array
    num_elites: int = struct.field(pytree_node=False)

    @property
    def num_members(self) -> int:
        return int(self.elite_mask.shape[0])


def init_ensemble(
    module: PDESurrogate,
    key: Array,
    num_members: int,
    example_states: Array,
    example_actions: Array,
    num_elites: Optional[int] = None,
) -> EnsembleState:
    keys = jax.random.split(key, num_members)

    def init_one(k):
        return module.init(k, example_states, example_actions)["params"]

    params = jax.vmap(init_one)(keys)
    if num_elites is None:
        num_elites = num_members
    return EnsembleState(
        params=params,
        elite_mask=jnp.ones((num_members,), bool),
        num_elites=num_elites,
    )


def ensemble_rollout(
    module: PDESurrogate,
    ens: EnsembleState,
    states: Array,
    actions: Array,
    dscaling: Transform = Identity(),
    hidden: Any = None,
) -> ModelRollout:
    """Run every member on the same batch (vmapped over stacked params);
    outputs have a leading member axis M."""

    def run(params, hidden_m):
        return module.apply(
            {"params": params}, states, actions, dscaling=dscaling, hidden=hidden_m
        )

    if hidden is None:
        return jax.vmap(run, in_axes=(0, None))(ens.params, None)
    return jax.vmap(run)(ens.params, hidden)


def select_elites(key: Array, ens: EnsembleState, outputs: Array) -> Tuple[Array, Array]:
    """Random elite member per batch element (surrogate.py:44-46).

    ``outputs`` [M, B, ...] -> gathered [B, ...] plus the member indices.
    """
    m, b = outputs.shape[:2]
    logits = jnp.where(ens.elite_mask, 0.0, -jnp.inf)
    members = jax.random.categorical(key, logits, shape=(b,))
    return outputs[members, jnp.arange(b)], members


def update_elites(ens: EnsembleState, scores: Array) -> EnsembleState:
    """Keep the ``num_elites`` lowest-scoring members (surrogate.py:53-55)."""
    order = jnp.argsort(scores)
    mask = jnp.zeros_like(ens.elite_mask).at[order[: ens.num_elites]].set(True)
    return ens.replace(elite_mask=mask)
