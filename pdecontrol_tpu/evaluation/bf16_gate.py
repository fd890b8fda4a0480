"""Attractor-statistics fidelity gate for the bf16-limb fast solver modes.

The ``pallas_packed`` solver's bfloat16-limb precisions trade matmul passes
for speed (``bf16`` 1 pass < ``bf16_3x`` 3 < ``bf16_4x`` 4 < ``highest`` 6)
and carry growing per-period error.  On a chaotic attractor trajectories
decorrelate no matter the precision, so the meaningful fidelity statement is
STATISTICAL: long-run attractor statistics must match full-precision ones.
This gate runs both solvers through the product env API
(``KuramotoSivashinsky.step``) for ``--periods`` control periods (after a
discarded transient) on a ``--batch``-wide ensemble and compares

- mean energy            ``E = <u^2>``
- mean dissipation terms ``<u_x^2>``, ``<u_xx^2>`` (the reward's fields)
- the energy spectrum    ``<|rfft(u)|^2>`` over resolved wavenumbers

between the candidate precision (``--precision``) and the fp32 XLA solver.
Exit status 0 = within tolerances; the verdict JSON goes to stdout and
(with ``--output``) to disk.  RESULTS.md cites this gate for the fast-mode
product claims; run it on the TPU chip, e.g.:

    python -m pdecontrol_tpu.evaluation.bf16_gate --precision bf16_4x \
        --output results/bf16_fidelity_4x.json

No reference counterpart (the reference integrates fp64 NumPy only,
kuramoto.py:83-90); tolerances are set by the KS literature convention that
attractor means are reproducible to a few percent at these sample sizes.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict

import numpy as np


def rollout_stats(env, key, batch: int, transient: int, periods: int) -> Dict:
    """Free-attractor rollout through jitted ``env.step``; returns attractor
    statistics over ``periods`` post-transient control periods."""
    import jax
    import jax.numpy as jnp

    from pdecontrol_tpu.envs.kuramoto import EnvState
    from pdecontrol_tpu.ops.kuramoto import ks_derivatives

    ku, _ = jax.random.split(key)
    state = EnvState(
        u=jax.random.uniform(ku, (batch, env.n), minval=-1.0, maxval=1.0,
                             dtype=jnp.float32),
        step=jnp.zeros((batch,), jnp.int32),
        key=key,
    )
    actions = jnp.zeros((batch, 1, env.num_jets), jnp.float32)

    @jax.jit
    def run(state):
        def burn(st, _):
            st, _ = env.step(st, actions)
            return st, None

        state, _ = jax.lax.scan(burn, state, None, length=transient)

        def collect(st, _):
            st, _ = env.step(st, actions)
            u = st.u
            u_x, u_xx, _ = ks_derivatives(env.ops, u)
            spec = jnp.abs(jnp.fft.rfft(u, axis=-1)) ** 2
            return st, (
                jnp.mean(u * u),
                jnp.mean(u_x * u_x),
                jnp.mean(u_xx * u_xx),
                jnp.mean(spec, axis=0),
            )

        _, (e, dx, dxx, spec) = jax.lax.scan(
            collect, state, None, length=periods
        )
        return (jnp.mean(e), jnp.mean(dx), jnp.mean(dxx),
                jnp.mean(spec, axis=0))

    e, dx, dxx, spec = jax.device_get(run(state))
    return {
        "mean_energy": float(e),
        "mean_ux2": float(dx),
        "mean_uxx2": float(dxx),
        "spectrum": np.asarray(spec),
    }


def compare(fp32: Dict, bf16: Dict, rtol_means: float, rtol_spec: float) -> Dict:
    """Relative-error comparison; the spectrum is compared bin-wise on
    wavenumbers carrying at least 1e-4 of the peak power (the dynamically
    relevant band — hyperviscous tail bins hold no energy and only noise)."""
    checks = {}
    for k in ("mean_energy", "mean_ux2", "mean_uxx2"):
        rel = abs(bf16[k] - fp32[k]) / abs(fp32[k])
        checks[k] = {"fp32": fp32[k], "fast": bf16[k],
                     "rel_err": rel, "tol": rtol_means,
                     "ok": bool(rel <= rtol_means)}
    s32, s16 = fp32["spectrum"], bf16["spectrum"]
    band = s32 >= 1e-4 * s32.max()
    rel = np.abs(s16[band] - s32[band]) / s32[band]
    checks["spectrum"] = {
        "bins_compared": int(band.sum()),
        "max_rel_err": float(rel.max()),
        "mean_rel_err": float(rel.mean()),
        "tol": rtol_spec,
        "ok": bool(rel.max() <= rtol_spec),
    }
    checks["ok"] = all(v["ok"] for v in checks.values())
    return checks


def run_gate(batch: int = 512, transient: int = 100, periods: int = 400,
             rtol_means: float = 0.02, rtol_spec: float = 0.10,
             seed: int = 0, precision: str = "bf16_4x") -> Dict:
    import jax
    import jax.numpy as jnp

    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky

    key = jax.random.PRNGKey(seed)
    envs = {
        "fp32": KuramotoSivashinsky.create(dtype=jnp.float32, solver="xla"),
        "fast": KuramotoSivashinsky.create(
            dtype=jnp.float32, solver="pallas_packed",
            pallas_precision=precision,
        ),
    }
    stats = {
        name: rollout_stats(env, key, batch, transient, periods)
        for name, env in envs.items()
    }
    verdict = compare(stats["fp32"], stats["fast"], rtol_means, rtol_spec)
    verdict["config"] = {
        "batch": batch, "transient_periods": transient, "periods": periods,
        "total_agent_steps": batch * periods, "precision": precision,
    }
    return verdict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--transient", type=int, default=100)
    p.add_argument("--periods", type=int, default=400)
    p.add_argument("--rtol_means", type=float, default=0.02)
    p.add_argument("--rtol_spec", type=float, default=0.10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", type=str, default="bf16_4x",
                   choices=("bf16", "bf16_3x", "bf16_4x"))
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args(argv)

    verdict = run_gate(args.batch, args.transient, args.periods,
                       args.rtol_means, args.rtol_spec, args.seed,
                       args.precision)
    blob = json.dumps(verdict, indent=2)
    print(blob)
    if args.output:
        with open(args.output, "w") as f:
            f.write(blob + "\n")
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
