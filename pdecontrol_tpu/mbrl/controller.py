"""MBPO-style model-based controller: the ``learn()`` loop on device.

Re-designs ``/root/reference/pdecontrol/mbrl/mbrl.py`` (PDEModelBasedController)
without gym/Lightning/subprocesses: each stage of the loop — experience
collection, surrogate retraining, imagined rollouts, SAC updates, evaluation
— is a jitted program over pytree state; the Python level only sequences
stages and applies host-side schedules/early stopping.

Loop structure (reference ``learn``, mbrl.py:384-449):
  warmup with random actions (``learning_starts``) ->
  iterate: collect ``num_envs x rollout_length`` real samples ->
    every ``surrogate_train_freq`` samples: refit the delta Normalize over
    the whole replay (mbrl.py:597-602), retrain every ensemble member with
    early stopping on the unscaled free-run val loss, update elites ->
    imagined rollouts from replay starting states at the scheduled horizon ->
    ``policy_train_steps_per_sample x samples`` SAC updates on a uniform
    mixture of real + imagined transitions (mbrl.py:529-566) ->
    periodic policy / surrogate evaluation + status table.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdecontrol_tpu.data import replay as R
from pdecontrol_tpu.envs import burgers as burgers_env
from pdecontrol_tpu.envs import kuramoto as ks_env
from pdecontrol_tpu.mbrl.config import MBPOConfig
from pdecontrol_tpu.mbrl.transform_sets import ControllerTransforms
from pdecontrol_tpu.mbrl.world import WorldModel
from pdecontrol_tpu.models import factories
from pdecontrol_tpu.models.surrogate import (
    EnsembleState,
    ensemble_rollout,
    init_ensemble,
    update_elites,
)
from pdecontrol_tpu.sac.sac import SAC, SACConfig
from pdecontrol_tpu.train.losses import make_loss
from pdecontrol_tpu.train.schedulers import Scheduler
from pdecontrol_tpu.train.trainer import SurrogateTrainer, TrainConfig, TrainerState
from pdecontrol_tpu.utils.logging import MetricsLogger

Array = jax.Array

ENVS = {
    "KuramotoSivashinskyEnv-v0": (ks_env.KuramotoSivashinsky, ks_env.make_reset_pool),
    "BurgersEnv-v0": (burgers_env.Burgers, burgers_env.make_reset_pool),
}

STATUS_HEADERS = [
    "iteration", "time", "num_ensemble_updates", "num_pol_updates",
    "num_steps_sampled", "eval_return_mean", "world_return_mean", "horizon",
    "world_buffer_samples", "train_loss", "val_loss", "sac_qf_loss",
    "sac_policy_loss",
]


class PDEModelBasedController:
    def __init__(self, config: MBPOConfig, logger: Optional[MetricsLogger] = None):
        self.config = config
        self.logger = logger or MetricsLogger(config.run_dir, config.use_wandb,
                                              config.project, config.name,
                                              config.to_dict())
        cfg = config

        env_cls, make_pool = ENVS[cfg.env_id]
        self.env = env_cls.create(**cfg.env_config)
        self.key = jax.random.PRNGKey(cfg.seed)

        # Runtime accounting (mbrl.py:88-97).
        self.samples_per_iteration = cfg.num_envs * cfg.rollout_length
        self.num_pol_updates_per_iteration = int(
            cfg.policy_train_steps_per_sample * self.samples_per_iteration
        )
        self.sur_train_freq = max(
            int(cfg.surrogate_train_freq / self.samples_per_iteration), 1
        )
        self.iteration = 0
        self.num_ensemble_updates = 0
        self.num_pol_updates = 0

        self.schedule = Scheduler.factory(cfg.rollout_length_schedule)
        self.curriculum = Scheduler.factory(cfg.curriculum)

        # Transforms + reset pool.
        self.tr = ControllerTransforms.create(self.env, dtype=self.env.dtype)
        self.key, kpool = jax.random.split(self.key)
        self.pool = make_pool(self.env, kpool, cfg.pool_size)

        # Surrogate ensemble + per-member trainers.
        delta = self.env.delta
        self.module = factories.make(
            cfg.factory, delta=delta, **{**self.env.scenario, **cfg.model}
        )
        self.loss_fn = make_loss(cfg.loss, self.env.scenario)
        tau = cfg.training.get("tau", 5)
        self.tau = tau

        ex_states = jnp.zeros((1, tau, *self.env.obs_shape), self.env.dtype)
        ex_actions = jnp.zeros(
            (1, tau + 1, *self._world_action_shape()), self.env.dtype
        )
        self.key, kens = jax.random.split(self.key)
        self.ensemble: EnsembleState = init_ensemble(
            self.module, kens, cfg.num_dynamics_models, ex_states, ex_actions,
            cfg.num_elite_models,
        )
        self.train_cfgs = {
            phase: self._phase_train_config(phase) for phase in ("initial", "iterations")
        }
        self.trainer = SurrogateTrainer(
            self.module, self.loss_fn, self.train_cfgs["initial"]
        )
        self.member_states: List[TrainerState] = [
            TrainerState(
                params=jax.tree.map(lambda x: x[m], self.ensemble.params),
                opt_state=None,
                global_step=jnp.zeros((), jnp.int32),
            )
            for m in range(cfg.num_dynamics_models)
        ]
        for m, st in enumerate(self.member_states):
            self.member_states[m] = st.replace(
                opt_state=self.trainer.opt.init(st.params)
            )

        # Replays.
        ep_len = self.env.max_episode_steps
        rows = max(cfg.capacity // ep_len, cfg.num_envs + 2)
        self.replay = R.create(rows, ep_len, cfg.num_envs, self.env.obs_shape,
                               self.env.action_shape, self.env.dtype)
        h_max = self._max_horizon()
        w_rows = min(
            cfg.model_buffer_store_iterations
            * cfg.model_rollouts_per_sample
            * self.samples_per_iteration,
            max(cfg.model_buffer_max_capacity // max(h_max, 1), 1),
        )
        w_rows = max(w_rows, cfg.model_rollouts_batch_size + 2)
        self.world_replay = R.create(
            w_rows, h_max + 2, cfg.model_rollouts_batch_size,
            self.env.obs_shape, self.env.action_shape, self.env.dtype,
        )

        # SAC agent.
        sac_cfg = SACConfig(
            gamma=cfg.gamma, tau=cfg.sac_tau, alpha=cfg.alpha, lr=cfg.lr,
            hidden=cfg.hidden_size,
            target_update_interval=cfg.target_update_interval,
            automatic_entropy_tuning=cfg.automatic_entropy_tuning,
        )
        self.sac = SAC(self.env.obs_shape, self.env.action_shape, sac_cfg,
                       self.env.action_low, self.env.action_high)
        self.key, ksac = jax.random.split(self.key)
        self.sac_state = self.sac.init(ksac)

        # World model.
        self.world = WorldModel(
            self.module, cfg.model_rollouts_batch_size,
            self.env.max_episode_steps, self.env.reward_fn, tau,
        )

        # Env states (collect + eval).
        self.key, k1, k2 = jax.random.split(self.key, 3)
        self.env_state = self.env.reset_from_pool(k1, self.pool, (cfg.num_envs,))
        # Initial reset updates the running obs scaling (vec_wrappers.py:181-184).
        self.tr = self.tr.replace(
            oscaling=self.tr.oscaling.update(self.env.observe(self.env_state))
        )

        self._collect_jit = {}
        self._world_jit = {}
        self._policy_jit = {}
        self._eval_jit = None
        self._sur_eval_jit = None
        self._start_time = time.time()

        # Checkpoint / resume (a subsystem the reference lacks; SURVEY §5).
        self.ckpt = None
        if cfg.checkpoint_freq or cfg.resume:
            from pdecontrol_tpu.utils.checkpoint import CheckpointManager

            self.ckpt = CheckpointManager(f"{cfg.run_dir}/checkpoints")
            if cfg.resume and self.ckpt.latest_step() is not None:
                from pdecontrol_tpu.utils import checkpoint as C

                state = self.ckpt.restore(C.controller_state(self))
                C.load_controller_state(self, state)
                print(f"[resume] restored iteration {self.iteration}")

    # ------------------------------------------------------------- plumbing
    def _world_action_shape(self):
        n_world = self.env.n // self.tr.world_sensor.stride
        return (self.env.obs_shape[0], n_world)

    def _phase_train_config(self, phase: str) -> TrainConfig:
        cfg = self.config
        base = {k: v for k, v in cfg.training.items()
                if k not in ("initial", "iterations")}
        base.update(cfg.training.get(phase, {}))
        trainer_base = {k: v for k, v in cfg.trainer.items()
                        if k not in ("initial", "iterations")}
        trainer_base.update(cfg.trainer.get(phase, {}))
        merged = {**base, **trainer_base}
        fields = TrainConfig._fields
        return TrainConfig(**{k: v for k, v in merged.items() if k in fields})

    def _max_horizon(self) -> int:
        h = 1
        total_iters = max(
            int(self.config.total_timesteps / max(self.samples_per_iteration, 1)),
            1,
        )
        for it in (0, total_iters // 2, total_iters):
            h = max(h, int(self.schedule(iteration=it)))
        return h

    @property
    def num_world_rollouts(self) -> int:
        return int(self.config.model_rollouts_per_sample * self.samples_per_iteration)

    @property
    def num_steps_sampled(self) -> int:
        return self.iteration * self.samples_per_iteration

    # ------------------------------------------------------------ collection
    def _collect_fn(self, nsteps: int, random: bool, update_scaling: bool = True):
        key_ = (nsteps, random, update_scaling)
        if key_ in self._collect_jit:
            return self._collect_jit[key_]

        env, sac = self.env, self.sac

        @jax.jit
        def run(env_state, tr, sac_state, replay, pool, key):
            def body(carry, _):
                env_state, tr, replay, key = carry
                key, ka, ks = jax.random.split(key, 3)
                raw_obs = env.observe(env_state)
                if random:
                    action = jax.random.uniform(
                        ka, (raw_obs.shape[0],) + env.action_shape,
                        minval=env.action_low, maxval=env.action_high,
                        dtype=raw_obs.dtype,
                    )
                else:
                    agent_obs = tr.raw_to_agent_obs(raw_obs)
                    action = sac.select_action(sac_state, agent_obs, ka)
                env_action = tr.agent_to_env_action(action)
                env_state, out = env.vec_step(env_state, env_action, pool)
                if update_scaling:
                    # update-then-apply ordering preserved: the *next* loop
                    # iteration reads obs through the updated scaling
                    # (vec_wrappers.py:157-160); running min/max updates are
                    # idempotent so the extra finals update is exact.
                    osc = tr.oscaling.update(out.obs)
                    osc = osc.update(out.info["final_obs"])
                    tr = tr.replace(oscaling=osc)
                replay = R.write_step(
                    replay, raw_obs, env_action, out.reward, out.terminated,
                    out.truncated, out.info["final_obs"],
                    out.info["step"].astype(jnp.int32),
                )
                return (env_state, tr, replay, key), out.reward

            (env_state, tr, replay, key), rewards = jax.lax.scan(
                body, (env_state, tr, replay, key), None, length=nsteps
            )
            return env_state, tr, replay, rewards

        self._collect_jit[key_] = run
        return run

    def collect(self, nsteps: int, random: bool = False) -> Array:
        self.key, k = jax.random.split(self.key)
        run = self._collect_fn(nsteps, random)
        self.env_state, self.tr, self.replay, rewards = run(
            self.env_state, self.tr, self.sac_state, self.replay, self.pool, k
        )
        return rewards

    # ------------------------------------------------------ surrogate train
    def update_delta_transform(self) -> None:
        """Refit the delta Normalize over the whole replay (mbrl.py:597-602)."""
        otransf = self.tr.replay_to_world.otransf
        mean, var = R.delta_statistics(self.replay, otransf, self.env.delta)
        und = self.tr.undscaling.reset()
        und = und.replace(
            mean=und.mean + mean.astype(und.mean.dtype),
            var=und.var + var.astype(und.var.dtype),
            count=und.count + 1,
        )
        self.tr = self.tr.replace(undscaling=und)

    def update_surrogates(self) -> Dict[str, float]:
        cfg = self.config
        phase = "initial" if self.iteration <= 0 else "iterations"
        tc = self.train_cfgs[phase]
        self.trainer.config = self.train_cfgs[phase]

        # Train/val split over episodes with any data (mbrl.py:570-573).
        fill = np.asarray(jax.device_get(self.replay.fill))
        rows = np.where(fill > 0)[0]
        rng = np.random.default_rng(self.iteration)
        rng.shuffle(rows)
        # The val split must be able to produce at least one window at the
        # fit's starting length, else validation (and hence elite scores and
        # early stopping) would silently run on all-zero gathers.  Short
        # in-progress episodes stay in train, where the window-count weights
        # already exclude them from sampling.
        length0 = tc.tau + int(self.curriculum(iteration=self.iteration,
                                               epoch=0, step=0))
        ok = rows[fill[rows] >= length0]
        short = rows[fill[rows] < length0]
        if len(ok) == 0:
            raise ValueError(
                f"no episode long enough for a length-{length0} window "
                f"(fills={fill[rows].tolist()})"
            )
        n_val = max(int(len(rows) * cfg.val_split_ratio), 1)
        n_val = min(n_val, max(len(ok) - 1, 1))
        val_rows = ok[:n_val]
        train_rows = np.concatenate([ok[n_val:], short])
        if len(train_rows) == 0:  # degenerate tiny-replay fallback
            train_rows = val_rows
        train_mask = jnp.zeros((self.replay.num_rows,), bool).at[train_rows].set(True)
        val_mask = jnp.zeros((self.replay.num_rows,), bool).at[val_rows].set(True)

        scores, logs = [], {}
        if cfg.vmap_ensemble_training:
            # All members advance in one vmapped program (ensemble
            # parallelism; per-member early stopping preserved by masking).
            self.key, k = jax.random.split(self.key)
            stacked_states, val_losses, logs = self.trainer.fit_ensemble(
                self.member_states, self.replay, train_mask, val_mask,
                self.tr.undscaling, self.tr.replay_to_world, self.curriculum,
                self.iteration, k,
                min_steps=tc.min_steps, max_steps=tc.max_steps,
                patience=tc.patience,
            )
            self.member_states = [
                jax.tree.map(lambda x: x[m], stacked_states)
                for m in range(cfg.num_dynamics_models)
            ]
            scores = [float(v) for v in val_losses]
        else:
            for m in range(cfg.num_dynamics_models):
                self.key, k = jax.random.split(self.key)
                state, val_loss, mlogs = self.trainer.fit(
                    self.member_states[m], self.replay, train_mask, val_mask,
                    self.tr.undscaling, self.tr.replay_to_world,
                    self.curriculum, self.iteration, k,
                    min_steps=tc.min_steps, max_steps=tc.max_steps,
                    patience=tc.patience,
                )
                self.member_states[m] = state
                scores.append(val_loss)
                logs = mlogs
        # Write member params back into the stacked ensemble + elites.
        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[st.params for st in self.member_states],
        )
        self.ensemble = self.ensemble.replace(params=stacked)
        self.ensemble = update_elites(self.ensemble, jnp.asarray(scores))
        self.num_ensemble_updates += 1
        return {"val_loss": float(np.mean(scores)), **logs,
                "elite_scores": scores}

    # -------------------------------------------------------- world rollouts
    def _world_fn(self, horizon: int):
        if horizon in self._world_jit:
            return self._world_jit[horizon]
        sac, world = self.sac, self.world

        @jax.jit
        def run(key, ens, sac_state, replay, world_replay, tr):
            kreset, kloop = jax.random.split(key)
            wstate = world.reset(kreset, ens, replay, tr)

            def body(carry, _):
                wstate, world_replay, key = carry
                key, ka, ks = jax.random.split(key, 3)
                prev_obs = wstate.obs
                prev_t = wstate.timesteps
                agent_obs = tr.world_to_agent_obs(prev_obs)
                action = sac.select_action(sac_state, agent_obs, ka)
                wstate, (obs, reward, term, trunc, final_obs) = world.step(
                    ks, wstate, ens, action, tr, jnp.asarray(horizon), replay
                )
                world_replay = R.write_step(
                    world_replay, prev_obs, action, reward, term, trunc,
                    final_obs, (prev_t + 1).astype(jnp.int32),
                )
                return (wstate, world_replay, key), reward

            (wstate, world_replay, _), rewards = jax.lax.scan(
                body, (wstate, world_replay, kloop), None, length=horizon
            )
            return world_replay, rewards

        self._world_jit[horizon] = run
        return run

    def imagine(self, horizon: int) -> Array:
        rounds = max(
            math.ceil(self.num_world_rollouts / self.config.model_rollouts_batch_size),
            1,
        )
        run = self._world_fn(horizon)
        rewards = []
        for _ in range(rounds):
            self.key, k = jax.random.split(self.key)
            self.world_replay, rew = run(
                k, self.ensemble, self.sac_state, self.replay,
                self.world_replay, self.tr,
            )
            rewards.append(rew)
        return jnp.concatenate(rewards)

    # --------------------------------------------------------- policy update
    def _policy_fn(self, n_updates: int):
        if n_updates in self._policy_jit:
            return self._policy_jit[n_updates]
        sac, batch_size = self.sac, self.config.policy_batch_size

        @jax.jit
        def run(sac_state, replay, world_replay, tr, key):
            p_imag = world_replay.ntimesteps.astype(jnp.float32) / jnp.maximum(
                world_replay.ntimesteps + replay.ntimesteps, 1
            ).astype(jnp.float32)

            def body(carry, _):
                sac_state, key = carry
                key, k1, k2, k3, ku = jax.random.split(key, 5)
                real = tr.replay_to_agent(
                    R.sample_transitions(replay, k1, batch_size)
                )
                imag = tr.world_replay_to_agent(
                    R.sample_transitions(world_replay, k2, batch_size)
                )
                pick = jax.random.uniform(k3, (batch_size,)) < p_imag

                def sel(a, b):
                    m = pick.reshape((-1,) + (1,) * (a.ndim - 1))
                    return jnp.where(m, a, b)

                batch = jax.tree.map(sel, imag, real)
                batch = batch.replace(
                    obs=batch.obs.astype(jnp.float32),
                    actions=batch.actions.astype(jnp.float32),
                    nxtobs=batch.nxtobs.astype(jnp.float32),
                    rewards=batch.rewards.astype(jnp.float32),
                )
                sac_state, metrics = sac.update(sac_state, batch, ku)
                return (sac_state, key), metrics

            (sac_state, _), metrics = jax.lax.scan(
                body, (sac_state, key), None, length=n_updates
            )
            return sac_state, jax.tree.map(lambda x: x[-1], metrics)

        self._policy_jit[n_updates] = run
        return run

    def update_policy(self) -> Dict[str, Array]:
        n = self.num_pol_updates_per_iteration
        run = self._policy_fn(n)
        self.key, k = jax.random.split(self.key)
        self.sac_state, metrics = run(
            self.sac_state, self.replay, self.world_replay, self.tr, k
        )
        self.num_pol_updates += n
        return metrics

    # ------------------------------------------------------------ evaluation
    def evaluate_policy(self) -> Dict[str, float]:
        """10 deterministic episodes on fresh envs with frozen scaling
        (mbrl.py:462-465)."""
        if self._eval_jit is None:
            env, sac = self.env, self.sac
            nsteps = self.env.max_episode_steps

            @jax.jit
            def run(key, sac_state, tr, pool, n_eval_key):
                state = env.reset_from_pool(n_eval_key, pool,
                                            (self.config.num_eval_episodes,))

                def body(carry, _):
                    state, key = carry
                    key, ka = jax.random.split(key)
                    obs = tr.raw_to_agent_obs(env.observe(state))
                    action = sac.select_action(sac_state, obs, ka,
                                               deterministic=True)
                    state, out = env.step(state, tr.agent_to_env_action(action))
                    return (state, key), out.reward

                (_, _), rewards = jax.lax.scan(body, (state, key), None,
                                               length=nsteps)
                returns = jnp.sum(rewards, axis=0)
                return jnp.mean(returns), jnp.std(returns)

            self._eval_jit = run
        self.key, k1, k2 = jax.random.split(self.key, 3)
        mean, std = self._eval_jit(k1, self.sac_state, self.tr, self.pool, k2)
        return {"eval_return_mean": float(mean), "eval_return_std": float(std)}

    def evaluate_surrogate(self, horizon: int = 30) -> Dict[str, float]:
        """Open-loop replay of logged actions through the world model vs the
        logged truth (mbrl.py:474-527), scored as MSE in world space."""
        if self._sur_eval_jit is None:
            module, tau = self.module, self.tau

            @jax.jit
            def run(key, ens, replay, tr):
                batch = R.sample_windows(
                    replay, key, 8, tau + horizon, rows_mask=replay.complete
                )
                batch = tr.replay_to_world(batch)
                roll = ensemble_rollout(
                    module, ens, batch.obs[:, :tau], batch.actions,
                    dscaling=tr.undscaling.inv,
                )
                from pdecontrol_tpu.models.surrogate import select_elites

                outputs, _ = select_elites(key, ens, roll.outputs)
                err = jnp.mean(
                    (outputs[:, tau:] - batch.obs[:, tau:]) ** 2
                )
                hstep = jnp.mean(
                    (outputs - batch.obs) ** 2, axis=(0, 2, 3)
                )
                return err, hstep, batch.obs[0], outputs[0], batch.actions[0]

            self._sur_eval_jit = run
        self.key, k = jax.random.split(self.key)
        if int(jax.device_get(self.replay.ncomplete)) == 0:
            return {}
        err, hstep, truth, pred, acts = self._sur_eval_jit(
            k, self.ensemble, self.replay, self.tr
        )
        self._save_plots(truth, pred, acts, hstep)
        return {"surrogate_open_loop_mse": float(err)}

    def _save_plots(self, truth, pred, acts, hstep) -> None:
        """wandb-callback analogue: persist open-loop comparison plots
        (reference VisPDECallback / evaluate_surrogate pdeplot,
        mbrl.py:519-527)."""
        if self.config.logging_freq <= 0:
            return
        try:
            import os

            from pdecontrol_tpu.viz import plots

            d = os.path.join(self.config.run_dir, "plots")
            os.makedirs(d, exist_ok=True)
            img = plots.pdeplot(jax.device_get(truth), jax.device_get(pred),
                                jax.device_get(acts))
            img.save(os.path.join(d, f"surrogate_iter{self.iteration}.png"))
            plots.hstepplot(jax.device_get(hstep)).save(
                os.path.join(d, f"hstep_iter{self.iteration}.png")
            )
            if self.logger.wandb is not None:
                self.logger.wandb.log(
                    {"surrogate_open_loop": self.logger.wandb.Image(img)},
                    commit=False,
                )
        except Exception:  # plotting must never kill training
            pass

    # ------------------------------------------------------------------ main
    def learn(self) -> None:
        cfg = self.config
        self.logger.log({"start": self._start_time}, commit=False)

        # Random warmup (mbrl.py:388-391).
        warmup_steps = max(cfg.learning_starts // cfg.num_envs, 1)
        self.collect(warmup_steps, random=True)
        self.logger.log(self.evaluate_policy(), commit=False)

        total_iters = max(
            int((cfg.total_timesteps - cfg.learning_starts)
                / max(self.samples_per_iteration, 1)),
            0,
        )

        while self.num_steps_sampled < cfg.total_timesteps - cfg.learning_starts:
            rewards = self.collect(cfg.rollout_length, random=False)

            if self.iteration % self.sur_train_freq == 0:
                self.update_delta_transform()
                logs = self.update_surrogates()
                self.logger.log(
                    {"num_ensemble_updates": self.num_ensemble_updates, **logs},
                    commit=False,
                )

            horizon = int(self.schedule(iteration=self.iteration))
            imag_rewards = self.imagine(horizon)

            pol_metrics = self.update_policy()

            if self.iteration % cfg.agent_eval_freq == 0:
                self.logger.log(self.evaluate_policy(), commit=False)
                self.logger.log(self.evaluate_surrogate(), commit=False)
                wmean, wstd = R.episode_returns(self.world_replay)
                self.logger.log(
                    {"world_return_mean": float(wmean),
                     "world_return_std": float(wstd)},
                    commit=False,
                )

            self.logger.log(
                {
                    "iteration": self.iteration,
                    "num_steps_sampled": self.num_steps_sampled
                    + cfg.learning_starts,
                    "horizon": horizon,
                    "world_buffer_samples": int(
                        jax.device_get(self.world_replay.ntimesteps)
                    ),
                    "collect_reward_mean": float(jnp.mean(rewards)),
                    "imagined_reward_mean": float(jnp.mean(imag_rewards)),
                    "num_pol_updates": self.num_pol_updates,
                    "sac_qf_loss": float(pol_metrics["qf_loss"]),
                    "sac_policy_loss": float(pol_metrics["policy_loss"]),
                    "time": time.time() - self._start_time,
                },
                commit=True,
            )
            self.iteration += 1

            if self.iteration % cfg.status_report_freq == 0:
                print(self.logger.table(STATUS_HEADERS), flush=True)

            if self.ckpt is not None and cfg.checkpoint_freq and (
                self.iteration % cfg.checkpoint_freq == 0
            ):
                self.save_checkpoint()

        if self.ckpt is not None and cfg.checkpoint_freq:
            self.save_checkpoint()

    def save_checkpoint(self) -> None:
        from pdecontrol_tpu.utils import checkpoint as C

        self.ckpt.save(self.iteration, C.controller_state(self))
