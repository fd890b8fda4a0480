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


def _learn_config(run_dir: str, data_parallel: int, model_parallel: int):
    """Tiny full-loop config over a (data, model) mesh — the stage-4 shapes
    with checkpointing enabled so the primary-only save path is exercised."""
    from pdecontrol_tpu.mbrl.config import MBPOConfig

    ds = data_parallel
    return MBPOConfig(
        run_dir=run_dir,
        env_config={"n": 16, "cfg_steps": 5, "t_max": 0.04},
        data_parallel=ds,
        model_parallel=model_parallel,
        num_envs=2 * ds,
        total_timesteps=8 * ds + 4 * ds,
        learning_starts=8 * ds,
        capacity=512,
        pool_size=8,
        surrogate_train_freq=4 * ds,
        policy_train_steps_per_sample=1,
        model_rollouts_per_sample=2,
        model_rollouts_batch_size=2 * ds,
        model_buffer_store_iterations=2,
        model_buffer_max_capacity=64,
        num_dynamics_models=2 * model_parallel,
        num_elite_models=2 * model_parallel,
        policy_batch_size=4 * ds,
        agent_eval_freq=1,
        num_eval_episodes=2,
        surrogate_eval_horizon=3,
        logging_freq=0,
        status_report_freq=100,
        checkpoint_freq=1,
        rollout_length_schedule={
            "scheduler": "ConstantLengthScheduler", "length": 2
        },
        training={"tau": 2, "tbtt": 4, "patience": 1, "batch_size": 4,
                  "min_steps": 1, "max_steps": 2},
        curriculum={"scheduler": "ConstantLengthScheduler", "length": 3},
        precompile_horizons=False,
    )


def child_learn(process_id: int, num_processes: int, port: int, outdir: str,
                local_devices: int = 4) -> None:
    """Stage 6 child: the FULL product ``learn()`` under the multi-process
    runtime (VERDICT r4 missing #4 — stage 5 was one step deep; the
    controller's primary-only metrics/checkpoint/plot I/O and pipelined
    flush had never run under 2 real processes).

    Each process gets a DIFFERENT run_dir: the primary-only I/O rule then
    becomes falsifiable — a non-primary process that writes anything leaves
    files in its own (otherwise untouched) tree for the parent to find.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pdecontrol_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", num_processes, process_id,
                           local_device_count=local_devices)

    from pdecontrol_tpu.mbrl.controller import PDEModelBasedController
    from pdecontrol_tpu.parallel.distributed import is_primary

    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global
    run_dir = os.path.join(
        outdir,
        f"run_p{process_id}" if num_processes > 1 else "run_single",
    )
    cfg = _learn_config(run_dir, data_parallel=n_global // 2,
                        model_parallel=2)
    ctl = PDEModelBasedController(cfg)
    assert ctl.mesh is not None
    ctl.learn()

    files = []
    if os.path.isdir(run_dir):
        for root, _, names in os.walk(run_dir):
            files += [os.path.relpath(os.path.join(root, f), run_dir)
                      for f in names]

    # Multi-process checkpoint ROUND-TRIP: restore runs on EVERY process
    # from the primary's snapshot (the shared-run_dir rule,
    # parallel/distributed.py).  The primary first waits for its async
    # save to be durable, then a cross-process barrier releases the
    # non-primaries to read.  The restored counters and (replicated)
    # ensemble params must match the live final state.
    restore_ok = False
    try:
        import numpy as np
        from jax.experimental import multihost_utils

        from pdecontrol_tpu.utils import checkpoint as C
        from pdecontrol_tpu.utils.checkpoint import CheckpointManager

        if ctl.ckpt is not None and is_primary():
            ctl.ckpt.wait()
        multihost_utils.sync_global_devices("stage6-ckpt-durable")
        primary_run = os.path.join(
            outdir, "run_p0" if num_processes > 1 else "run_single")
        mgr = CheckpointManager(os.path.join(primary_run, "checkpoints"))
        snap = mgr.restore(C.controller_state(ctl))
        assert int(snap["counters"]["iteration"]) == int(ctl.iteration)
        live_leaf = np.asarray(jax.device_get(
            jax.tree.leaves(ctl.ensemble.params)[0]))
        rest_leaf = np.asarray(jax.tree.leaves(snap["ensemble"].params)[0])
        assert np.allclose(live_leaf, rest_leaf), "restored params mismatch"
        restore_ok = True
    except Exception as e:  # noqa: BLE001
        print(f"[dryrun-mp] restore round-trip failed on process "
              f"{process_id}: {e}", flush=True)

    with open(os.path.join(outdir, f"learn_proc{process_id}.json"), "w") as f:
        json.dump({
            "process_id": process_id,
            "primary": bool(is_primary()),
            "iteration": int(ctl.iteration),
            "num_pol_updates": int(ctl.num_pol_updates),
            "run_dir": run_dir,
            "files": sorted(files),
            "restore_ok": restore_ok,
        }, f)
    print(f"[dryrun-mp] learn process {process_id} OK "
          f"({ctl.iteration} iterations, {len(files)} files)", flush=True)
    distributed.shutdown()


if __name__ == "__main__":
    _mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    _fn = child_learn if _mode == "learn" else child
    _fn(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
