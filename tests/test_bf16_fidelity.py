"""bf16 fast-mode attractor gate: machinery tests (CPU).

The real fidelity receipt runs on the TPU chip
(``python -m pdecontrol_tpu.evaluation.bf16_gate``) and is stored at
``results/bf16_fidelity.json``; these tests pin the gate's statistics
plumbing and pass/fail logic so the receipt is trustworthy.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky
from pdecontrol_tpu.evaluation.bf16_gate import compare, rollout_stats


def _tiny_stats(seed=0):
    env = KuramotoSivashinsky.create(n=32, cfg_steps=10, dtype=jnp.float32,
                                     solver="xla")
    return rollout_stats(env, jax.random.PRNGKey(seed), batch=8,
                         transient=3, periods=6)


def test_rollout_stats_shapes_and_determinism():
    a, b = _tiny_stats(), _tiny_stats()
    assert a["spectrum"].shape == (32 // 2 + 1,)
    for k in ("mean_energy", "mean_ux2", "mean_uxx2"):
        assert np.isfinite(a[k]) and a[k] > 0
        assert a[k] == b[k]
    np.testing.assert_array_equal(a["spectrum"], b["spectrum"])


def test_compare_pass_and_fail_logic():
    s = _tiny_stats()
    ok = compare(s, s, rtol_means=0.02, rtol_spec=0.10)
    assert ok["ok"]
    assert ok["spectrum"]["max_rel_err"] == 0.0
    # A 5% energy bias must trip the 2% gate.
    bad = copy.deepcopy(s)
    bad["mean_energy"] *= 1.05
    v = compare(s, bad, rtol_means=0.02, rtol_spec=0.10)
    assert not v["ok"] and not v["mean_energy"]["ok"]
    assert v["mean_ux2"]["ok"]
    # A tail-only spectrum deviation (below the 1e-4-of-peak band) must NOT
    # trip the gate — only dynamically relevant bins are compared.
    tail = copy.deepcopy(s)
    spec = tail["spectrum"].copy()
    weak = spec < 1e-4 * spec.max()
    assert weak.any()
    spec[weak] *= 10.0
    tail["spectrum"] = spec
    assert compare(s, tail, rtol_means=0.02, rtol_spec=0.10)["ok"]
