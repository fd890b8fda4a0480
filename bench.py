"""Headline benchmark: batched Kuramoto–Sivashinsky env throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = agent env-steps/sec (each = one full control period: 250 RK4
               sub-steps x 4 RHS evals on N=64, the reference's per-step
               cost, kuramoto.py:83-90) across a vectorised batch on one TPU
               chip, at full float32 fidelity (lane-packed Pallas kernel,
               HIGHEST-precision matmuls).
vs_baseline  = speedup over the reference-equivalent NumPy/SciPy integrator
               measured on this host, scaled by the reference's 10
               env-worker processes (--cpus default, script.py:33), i.e.
               value / (10 x single-process scipy-oracle steps/sec).

Secondary numbers (stderr): bf16_3x packed kernel (3-pass bfloat16,
~1.5e-3 relative per period — statistics-faithful), pure-XLA path, and the
native C++ single-core integrator.
"""

import json
import os
import sys
import time

import numpy as np


def _time(fn, u, phi, iters):
    x, r = fn(u, phi)
    import jax

    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, r = fn(x, phi)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def bench_tpu(batch: int, iters: int = 10):
    import jax
    import jax.numpy as jnp

    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky

    env = KuramotoSivashinsky.create(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (batch, env.n), minval=-1.0, maxval=1.0)
    phi = jnp.zeros((batch, env.n), jnp.float32)

    results = {}

    try:
        from pdecontrol_tpu.ops.pallas_ks_packed import ks_control_period_packed

        for prec in ("highest", "bf16_3x"):
            dt = _time(
                lambda u, phi, p=prec: ks_control_period_packed(
                    env.ops, u, phi, env.dt, env.cfg_steps, block=1024,
                    precision=p,
                ),
                u, phi, iters,
            )
            results[f"pallas_packed_{prec}"] = batch / dt
    except Exception as e:  # noqa: BLE001
        print(f"[bench] packed pallas unavailable: {e}", file=sys.stderr)

    try:
        from pdecontrol_tpu.ops.kuramoto import ks_control_period

        f = jax.jit(
            lambda u, phi: ks_control_period(
                env.ops, u, phi, env.dt, env.cfg_steps, "l2control"
            )
        )
        results["xla"] = batch / _time(f, u, phi, iters)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] xla path failed: {e}", file=sys.stderr)

    return results


def bench_tbtt(batch: int = 64, length: int = 20, iters: int = 20) -> float:
    """Secondary: surrogate TBPTT training steps/sec (BASELINE.md 'also
    tracked') on the flagship conv-LSTM at the reference's tau/tbtt."""
    import jax
    import jax.numpy as jnp

    from pdecontrol_tpu.models import factories
    from pdecontrol_tpu.train.losses import mse_loss
    from pdecontrol_tpu.train.trainer import SurrogateTrainer, TrainConfig

    model = factories.make("KSAutoRegConvolutionalLSTM", delta=0.25)
    trainer = SurrogateTrainer(model, mse_loss, TrainConfig(tau=5, tbtt=10,
                                                            batch_size=batch))
    key = jax.random.PRNGKey(0)
    states = jax.random.normal(key, (batch, length, 1, 64), jnp.float32)
    actions = jax.random.uniform(key, (batch, length, 1, 64),
                                 dtype=jnp.float32, minval=-1, maxval=1)
    tstate = trainer.init(key, states[:, :5], actions)

    from pdecontrol_tpu.envs.transforms import Identity

    step = jax.jit(
        lambda st: trainer.train_step(st, states, actions, Identity(),
                                      jnp.asarray(1e-3))[0]
    )
    tstate = step(tstate)
    jax.block_until_ready(tstate.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        tstate = step(tstate)
    jax.block_until_ready(tstate.params)
    return iters / (time.perf_counter() - t0)


def bench_oracle(steps: int = 3) -> float:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracles import KSOracle

    oracle = KSOracle()
    rng = np.random.default_rng(0)
    u = rng.uniform(-1, 1, size=64)
    phi = 0.1 * np.sin(2 * np.pi * np.arange(64) / 64)
    oracle.control_period(u, phi)  # warm
    t0 = time.perf_counter()
    for _ in range(steps):
        u, _ = oracle.control_period(u, phi)
    return steps / (time.perf_counter() - t0)


def bench_native(steps: int = 50) -> float:
    from pdecontrol_tpu.utils import native

    rng = np.random.default_rng(0)
    u = rng.uniform(-1, 1, size=(1, 64))
    phi = np.zeros((1, 64))
    native.ks_control_period(u, phi, 22.0 / 64, 1e-3, 250)  # warm/build
    t0 = time.perf_counter()
    for _ in range(steps):
        u, _ = native.ks_control_period(u, phi, 22.0 / 64, 1e-3, 250)
    return steps / (time.perf_counter() - t0)


def main():
    batch = int(os.environ.get("BENCH_BATCH", 16384))
    results = bench_tpu(batch)
    for name, sps in sorted(results.items()):
        print(f"[bench] {name}: {sps:,.0f} agent_steps/s (B={batch})",
              file=sys.stderr)

    try:
        tbtt_sps = bench_tbtt()
        print(f"[bench] surrogate TBPTT: {tbtt_sps:,.1f} train_steps/s "
              f"(B=64, T=20, conv-LSTM)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] tbtt bench failed: {e}", file=sys.stderr)

    oracle_sps = bench_oracle()
    print(f"[bench] scipy oracle (reference-equivalent, 1 core): "
          f"{oracle_sps:.2f} agent_steps/s", file=sys.stderr)
    try:
        native_sps = bench_native()
        print(f"[bench] native C++ (1 core): {native_sps:.1f} agent_steps/s",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] native unavailable: {e}", file=sys.stderr)

    headline = results.get(
        "pallas_packed_highest", results.get("xla", 0.0)
    )
    ref_equivalent = 10.0 * oracle_sps
    out = {
        "metric": "ks_env_steps_per_sec",
        "value": round(headline, 1),
        "unit": "agent_steps/s",
        "vs_baseline": round(headline / ref_equivalent, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
