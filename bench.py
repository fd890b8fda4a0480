"""Headline benchmark: batched Kuramoto–Sivashinsky env throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = agent env-steps/sec (each = 250 RK4 sub-steps x 4 RHS evals on
               N=64, the reference's per-step cost; kuramoto.py:83-90) across
               a large vectorised batch on one TPU chip.
vs_baseline  = speedup over the reference-equivalent NumPy/SciPy integrator
               measured on this host, scaled by the reference's 10 env-worker
               processes (--cpus default, script.py:33) — i.e. value /
               (10 x single-process oracle steps/sec).
"""

import json
import sys
import time

import numpy as np


def bench_tpu(batch: int = 4096, steps: int = 64) -> float:
    import jax
    import jax.numpy as jnp

    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky

    env = KuramotoSivashinsky.create(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (batch, env.n), minval=-1.0, maxval=1.0)

    try:
        from pdecontrol_tpu.ops.pallas_ks import ks_control_period_pallas

        def agent_step(u, action):
            phi = env.action_to_phi(action)
            u, rew = ks_control_period_pallas(
                env.ops, u, phi, env.dt, env.cfg_steps, env.effective_objective
            )
            return u, rew

        backend = "pallas"
    except Exception:  # noqa: BLE001 - fall back to the pure-XLA path
        from pdecontrol_tpu.ops.kuramoto import ks_control_period

        def agent_step(u, action):
            phi = env.action_to_phi(action)
            u, rew = ks_control_period(
                u=u, phi=phi, ops=env.ops, dt=env.dt, cfg_steps=env.cfg_steps,
                objective=env.effective_objective,
            )
            return u, rew

        backend = "xla"

    @jax.jit
    def run(u, actions):
        def body(u, a):
            u, rew = agent_step(u, a)
            return u, rew

        u, rews = jax.lax.scan(body, u, actions)
        return u, rews

    actions = jax.random.uniform(key, (steps, batch, 1, 4), minval=-1, maxval=1)

    # Warm-up / compile.
    u1, _ = run(u, actions[:2])
    jax.block_until_ready(u1)

    t0 = time.perf_counter()
    u2, rews = run(u, actions)
    jax.block_until_ready(rews)
    dt = time.perf_counter() - t0

    print(f"[bench] backend={backend} batch={batch} steps={steps} wall={dt:.3f}s",
          file=sys.stderr)
    return batch * steps / dt


def bench_oracle(steps: int = 3) -> float:
    sys.path.insert(0, "tests")
    from oracles import KSOracle

    oracle = KSOracle()
    rng = np.random.default_rng(0)
    u = rng.uniform(-1, 1, size=64)
    phi = 0.1 * np.sin(2 * np.pi * np.arange(64) / 64)

    # warm caches
    oracle.control_period(u, phi)
    t0 = time.perf_counter()
    for _ in range(steps):
        u, _ = oracle.control_period(u, phi)
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    tpu_sps = bench_tpu()
    oracle_sps = bench_oracle()
    ref_equivalent = 10.0 * oracle_sps  # 10 worker processes in the reference
    out = {
        "metric": "ks_env_steps_per_sec",
        "value": round(tpu_sps, 1),
        "unit": "agent_steps/s",
        "vs_baseline": round(tpu_sps / ref_equivalent, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
