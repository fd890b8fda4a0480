"""Stage 5 of the multi-chip dry run: MULTI-PROCESS readiness.

Two OS processes x 4 virtual CPU devices each run ONE sharded collect and
ONE ensemble-train step over the 8-device GLOBAL mesh, exercising the
host-boundary assumptions a real pod slice (one process per host) makes:

  * the mesh is built from ``jax.devices()`` (global), every process
    dispatches the same program;
  * host PRNG seeds are process-identical, so traced keys agree;
  * replicated outputs are pullable from every process and agree bitwise;
  * pulling a data-SHARDED array must raise (non-addressable shards) —
    loud, never silently process-local;
  * file I/O happens on the primary process only.

Run via ``parallel/dryrun.py`` (stage 5) or directly:
``python -m pdecontrol_tpu.parallel.dryrun_mp <pid> <nprocs> <port> <dir>``.

Reference contrast: the reference's only multi-process surface is gym's
AsyncVectorEnv pipe pool (SURVEY §2.5); it has no distributed backend.
"""

from __future__ import annotations

import json
import os
import sys


def child(process_id: int, num_processes: int, port: int, outdir: str,
          local_devices: int = 4) -> None:
    # Backend setup must precede first jax use (sitecustomize pre-imports
    # jax, but backends initialise lazily — same trick as tests/conftest).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pdecontrol_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", num_processes, process_id,
                           local_device_count=local_devices)

    import jax.numpy as jnp
    import numpy as np

    from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky
    from pdecontrol_tpu.envs.transforms import Identity
    from pdecontrol_tpu.models import factories
    from pdecontrol_tpu.parallel import mesh as meshlib
    from pdecontrol_tpu.parallel.sharded import (
        sharded_collect_fn,
        sharded_ensemble_train_fn,
    )
    from pdecontrol_tpu.train.losses import mse_loss
    from pdecontrol_tpu.train.trainer import SurrogateTrainer, TrainConfig

    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )
    assert jax.local_device_count() == local_devices
    model_parallel = 2
    mesh = meshlib.make_mesh(n_global, model_parallel=model_parallel)
    data_size = n_global // model_parallel

    # Same seed on every process: traced keys must be identical, or the
    # processes would dispatch DIFFERENT programs (undetectable locally —
    # the cross-process checksum below pins it).
    key = jax.random.PRNGKey(0)

    # ---- sharded env collect over the global mesh -----------------------
    env = KuramotoSivashinsky.create(n=16, cfg_steps=4, dtype=jnp.float32)
    batch = 2 * data_size
    pool = jax.random.uniform(key, (8, env.n), minval=-0.4, maxval=0.4)
    state = env.reset_from_pool(key, pool, batch_shape=(batch,))
    actions = jax.random.uniform(key, (3, batch, 1, 4), minval=-1, maxval=1)
    collect, place_c = sharded_collect_fn(mesh, env, nsteps=3)
    state, actions, pool = place_c(state, actions, pool)
    state, rewards = collect(state, actions, pool)
    jax.block_until_ready(rewards)

    # Replicated scalar pull: allowed from every process, and must agree
    # bitwise across processes (parent asserts).
    rmean = jax.jit(
        jnp.mean,
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
    )(rewards)
    rmean_host = float(np.asarray(jax.device_get(rmean)))

    # Data-sharded pull: spans non-addressable devices -> must fail LOUDLY.
    sharded_pull_raised = False
    try:
        np.asarray(rewards)
    except Exception:
        sharded_pull_raised = True

    # ---- ensemble train step (members over ``model``) -------------------
    module = factories.make("KSAutoRegConvolutionalLSTM", delta=env.delta,
                            N=env.n)
    trainer = SurrogateTrainer(module, mse_loss,
                               TrainConfig(tau=2, tbtt=3, batch_size=batch))
    members = 2 * model_parallel
    ex_s = jnp.zeros((1, 2, 1, env.n))
    ex_a = jnp.zeros((1, 5, 1, env.n))
    stacked = jax.vmap(lambda k: trainer.init(k, ex_s, ex_a))(
        jax.random.split(key, members)
    )
    bs = jax.random.normal(key, (members, batch, 5, 1, env.n))
    ba = jax.random.uniform(key, (members, batch, 5, 1, env.n))
    train, place_t = sharded_ensemble_train_fn(mesh, trainer)
    stacked, bs, ba = place_t(stacked, bs, ba)
    stacked, metrics = train(stacked, bs, ba, Identity(), jnp.asarray(1e-3))
    jax.block_until_ready(metrics["train_loss"])
    tmean = jax.jit(
        jnp.mean,
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
    )(metrics["train_loss"])
    tmean_host = float(np.asarray(jax.device_get(tmean)))

    # ---- primary-only file I/O ------------------------------------------
    from pdecontrol_tpu.parallel.distributed import is_primary

    if is_primary():
        with open(os.path.join(outdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"collect_reward_mean": rmean_host}) + "\n")

    with open(os.path.join(outdir, f"proc{process_id}.json"), "w") as f:
        json.dump({
            "process_id": process_id,
            "global_devices": len(jax.devices()),
            "rmean": rmean_host,
            "train_loss_mean": tmean_host,
            "sharded_pull_raised": sharded_pull_raised,
            "primary": bool(is_primary()),
        }, f)
    print(f"[dryrun-mp] process {process_id} OK "
          f"(rmean={rmean_host:.6f}, train={tmean_host:.6f})", flush=True)
    distributed.shutdown()


if __name__ == "__main__":
    child(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
