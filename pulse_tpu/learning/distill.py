"""PULSE online distillation: student VAE imitates a frozen teacher while
the env runs on the student's deterministic actions.

Re-designs the reference's kin-loss path (amp_agent.py:771-849 _optimize_kin
+ only_kin_loss play_steps amp_agent.py:367-371 and the distillation env
humanoid_im_distill.py:143-231): per epoch, roll the env with student mu
actions, query the frozen teacher on the same observations for gt_action,
then minimize

    L = RMSE(student_mu, gt_action)
      + kld_coef(t) * KL(posterior || learned prior)        (annealed)
      + ar1_coef * KL(posterior_t || AR(1) prediction)      (temporal prior)
      + prior_reg * ||prior_mu||^2

with a separate Adam (kin_lr) over the full VAE (encoder+prior+decoder).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pulse_tpu.learning.networks import PulseVAE, kl_multi
from pulse_tpu.learning.running_norm import RunningMeanStd


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    num_envs: int = 64
    horizon_length: int = 32
    minibatch_size: int = 1024
    mini_epochs: int = 2
    kin_lr: float = 5e-4
    grad_norm: float = 50.0
    # VAE regularization (env_im_vae.yaml:22-31)
    kld_coefficient: float = 0.01
    kld_coefficient_min: float = 0.001
    kld_anneal_start: int = 2500
    kld_anneal_end: int = 5000
    ar1_coefficient: float = 0.005
    ar1_rho: float = 0.95
    prior_reg_coefficient: float = 0.0001
    normalize_input: bool = True


@struct.dataclass
class DistillState:
    params: Any
    opt_state: Any
    obs_rms: RunningMeanStd
    env_state: Any
    key: jax.Array
    epoch: jax.Array
    # live PMCP clip-sampling weights (see ppo.TrainState.motion_prob)
    motion_prob: Any = None


class DistillAgent:
    """Distills `teacher_fn(obs) -> action` into a PulseVAE student."""

    def __init__(
        self,
        env,
        teacher_fn: Callable[[jax.Array], jax.Array],
        config: DistillConfig | None = None,
        network: PulseVAE | None = None,
    ):
        self.env = env
        self.teacher_fn = teacher_fn
        self.config = config or DistillConfig()
        self.network = network or PulseVAE(
            action_dim=env.action_dim, self_obs_dim=env.self_obs_dim
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.config.grad_norm),
            optax.adam(self.config.kin_lr),
        )

    def init(self, key: jax.Array) -> DistillState:
        cfg = self.config
        k_env, k_net, k_next = jax.random.split(key, 3)
        env_state = self.env.reset(jax.random.split(k_env, cfg.num_envs))
        obs0 = jnp.zeros((1, self.env.obs_dim))
        z0 = jnp.zeros((1, self.network.latent_dim))
        params = self.network.init(k_net, obs0, z0)["params"]
        motion = getattr(self.env, "motion", None)
        return DistillState(
            params=params,
            opt_state=self.optimizer.init(params),
            obs_rms=RunningMeanStd.create(self.env.obs_dim),
            env_state=env_state,
            key=k_next,
            epoch=jnp.zeros((), jnp.int32),
            # copied: the train loop donates this state (see ppo.init)
            motion_prob=None if motion is None else jnp.array(motion.sampling_prob),
        )

    # ------------------------------------------------------------------ #

    def _student_action(self, params, obs_rms, obs, z_noise):
        obs_n = obs_rms.normalize(obs) if self.config.normalize_input else obs
        out = self.network.apply({"params": params}, obs_n, z_noise)
        return out

    def rollout(self, ds: DistillState):
        """Env driven by deterministic student actions; collects obs +
        teacher labels (≙ HumanoidImDistill.step computing kin_dict)."""
        cfg = self.config

        def scan_step(carry, _):
            env_state, key = carry
            key, k_z = jax.random.split(key)
            obs = env_state.obs
            z_noise = jax.random.normal(
                k_z, (obs.shape[0], self.network.latent_dim)
            )
            out = self._student_action(ds.params, ds.obs_rms, obs, z_noise)
            action = jnp.clip(out["action_mu"], -1.0, 1.0)
            gt_action = self.teacher_fn(obs)
            next_env_state = self.env.step(env_state, action, ds.motion_prob)
            return (next_env_state, key), {
                "obs": obs,
                "gt_action": gt_action,
                "z_noise": z_noise,
            }

        key, k_roll = jax.random.split(ds.key)
        (env_state, _), traj = jax.lax.scan(
            scan_step, (ds.env_state, k_roll), None, length=cfg.horizon_length
        )
        return ds.replace(env_state=env_state, key=key), traj

    # ------------------------------------------------------------------ #

    def kld_coef(self, epoch: jax.Array) -> jax.Array:
        """Linear anneal kld_coefficient -> kld_coefficient_min over
        [anneal_start, anneal_end] epochs (≙ amp_agent.py:823-831)."""
        cfg = self.config
        frac = jnp.clip(
            (epoch - cfg.kld_anneal_start)
            / max(cfg.kld_anneal_end - cfg.kld_anneal_start, 1),
            0.0,
            1.0,
        )
        return cfg.kld_coefficient + frac * (
            cfg.kld_coefficient_min - cfg.kld_coefficient
        )

    def _loss(self, params, batch, epoch, axis_name=None):
        """With `axis_name` (the DP path), every batch mean is the GLOBAL
        mean via pmean. This matters beyond cosmetics: bc is sqrt(MSE) —
        non-linear in the mean — so averaging per-shard gradients of
        per-shard losses would NOT equal the global gradient. With global
        means inside the loss, each device's grad carries the 1/D factor
        from pmean's VJP and a psum reassembles the exact global gradient."""
        cfg = self.config

        def gmean(x):
            m = jnp.mean(x)
            return jax.lax.pmean(m, axis_name) if axis_name else m
        # obs arrive pre-normalized (and pre-cast to the network compute
        # dtype) from update() — the stats are constant across the epoch's
        # gradient steps, so normalizing once outside the minibatch scans
        # is identical and cheaper
        obs_n = batch["obs"]          # [n, T_pair=2, O]: (prev, curr) pairs
        z_noise = batch["z_noise"]
        gt = batch["gt_action"]

        out_prev = self.network.apply({"params": params}, obs_n[:, 0], z_noise[:, 0])
        out = self.network.apply({"params": params}, obs_n[:, 1], z_noise[:, 1])

        bc = jnp.sqrt(gmean((out["action_mu"] - gt[:, 1]) ** 2))
        kld = gmean(
            kl_multi(
                out["post_mu"], out["post_logvar"],
                out["prior_mu"], out["prior_logvar"],
            )
        )
        # AR(1) temporal prior: posterior_t vs rho * z_{t-1} (amp_agent.py:792-808)
        z_prev = out_prev["post_mu"]
        ar1 = gmean(
            kl_multi(
                out["post_mu"], out["post_logvar"],
                cfg.ar1_rho * z_prev, jnp.zeros_like(out["post_logvar"]),
            )
        )
        prior_reg = gmean(jnp.sum(out["prior_mu"] ** 2, axis=-1))

        total = (
            bc
            + self.kld_coef(epoch) * kld
            + cfg.ar1_coefficient * ar1
            + cfg.prior_reg_coefficient * prior_reg
        )
        return total, {"bc_loss": bc, "kld": kld, "ar1": ar1, "prior_reg": prior_reg}

    def update(self, ds: DistillState, traj) -> tuple[DistillState, dict]:
        mesh = getattr(self.env, "mesh", None)
        if mesh is not None:
            return self._update_dp(mesh, ds, traj)
        cfg = self.config
        # derive from the trajectory, not the config: in joint RL+kin mode
        # the rollout comes from the AMP agent (its own horizon)
        T, B = traj["obs"].shape[:2]
        # consecutive (t-1, t) pairs for the AR1 prior
        def pair(x):
            return jnp.stack([x[:-1], x[1:]], axis=2).reshape(
                (T - 1) * B, 2, *x.shape[2:]
            )

        obs_rms = (
            ds.obs_rms.update(traj["obs"].reshape(-1, traj["obs"].shape[-1]))
            if cfg.normalize_input
            else ds.obs_rms
        )
        if cfg.normalize_input:
            traj = dict(traj)
            o = obs_rms.normalize(traj["obs"])
            net_dtype = getattr(self.network, "dtype", None)
            if net_dtype is not None:
                o = o.astype(net_dtype)
            traj["obs"] = o
        flat = {k: pair(v) for k, v in traj.items()}
        N = flat["obs"].shape[0]
        mb = min(cfg.minibatch_size, N)
        num_mb = N // mb

        def mini_epoch(carry, key):
            params, opt_state = carry
            perm = jax.random.permutation(key, N)
            shuffled = jax.tree.map(lambda x: x[perm], flat)

            def mb_step(carry, i):
                params, opt_state = carry
                batch = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb), shuffled
                )
                (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    params, batch, ds.epoch
                )
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(num_mb)
            )
            return (params, opt_state), metrics

        key, k_upd = jax.random.split(ds.key)
        keys = jax.random.split(k_upd, cfg.mini_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            mini_epoch, (ds.params, ds.opt_state), keys
        )
        ds = ds.replace(
            params=params,
            opt_state=opt_state,
            obs_rms=obs_rms,
            key=key,
            epoch=ds.epoch + 1,
        )
        return ds, jax.tree.map(jnp.mean, metrics)

    def _update_dp(self, mesh, ds: DistillState, traj):
        """Data-parallel kin update: per-shard minibatching under shard_map
        with pmean'd gradients/moments — see ppo.py _update_dp for why GSPMD
        can't partition the global-shuffle path (full-rollout all-gather)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec

        cfg = self.config
        ax = mesh.axis_names[0]
        D = mesh.devices.size
        T, B = traj["obs"].shape[:2]
        N = (T - 1) * B
        mb_global = min(cfg.minibatch_size, N)
        if B % D or mb_global % D:
            raise ValueError(
                f"DP update needs num_envs ({B}) and minibatch_size "
                f"({mb_global}) divisible by the mesh size ({D})"
            )

        def local_update(params, opt_state, obs_rms, key, epoch, traj):
            Nl = N // D

            def pair(x):
                return jnp.stack([x[:-1], x[1:]], axis=2).reshape(
                    Nl, 2, *x.shape[2:]
                )

            if cfg.normalize_input:
                o = traj["obs"].reshape(-1, traj["obs"].shape[-1])
                m = jax.lax.pmean(o.mean(axis=0), ax)
                e2 = jax.lax.pmean(jnp.mean(o * o, axis=0), ax)
                obs_rms = obs_rms.update_moments(
                    m, jnp.maximum(e2 - m * m, 0.0), T * B
                )
                traj = dict(traj)
                on = obs_rms.normalize(traj["obs"])
                net_dtype = getattr(self.network, "dtype", None)
                if net_dtype is not None:
                    on = on.astype(net_dtype)
                traj["obs"] = on
            flat = {k: pair(v) for k, v in traj.items()}
            mb = mb_global // D
            num_mb = Nl // mb

            def mini_epoch(carry, key):
                params, opt_state = carry
                perm = jax.random.permutation(key, Nl)
                shuffled = jax.tree.map(lambda x: x[perm], flat)

                def mb_step(carry, i):
                    params, opt_state = carry
                    batch = jax.tree.map(
                        lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb),
                        shuffled,
                    )
                    # loss terms are GLOBAL means (axis_name) and each
                    # device's grad carries pmean's 1/D VJP factor, so psum
                    # — not pmean — reassembles the exact global gradient
                    (loss, metrics), grads = jax.value_and_grad(
                        self._loss, has_aux=True
                    )(params, batch, epoch, axis_name=ax)
                    grads = jax.lax.psum(grads, ax)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, params
                    )
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), metrics

                (params, opt_state), metrics = jax.lax.scan(
                    mb_step, (params, opt_state), jnp.arange(num_mb)
                )
                return (params, opt_state), metrics

            key, k_upd = jax.random.split(key)
            keys = jax.random.split(k_upd, cfg.mini_epochs)
            (params, opt_state), metrics = jax.lax.scan(
                mini_epoch, (params, opt_state), keys
            )
            return (
                params, opt_state, obs_rms, key,
                jax.tree.map(jnp.mean, metrics),
            )

        data_p = PartitionSpec(None, ax)
        rep = PartitionSpec()
        params, opt_state, obs_rms, key, metrics = shard_map(
            local_update,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, data_p),
            out_specs=(rep, rep, rep, rep, rep),
        )(ds.params, ds.opt_state, ds.obs_rms, ds.key, ds.epoch, traj)
        ds = ds.replace(
            params=params,
            opt_state=opt_state,
            obs_rms=obs_rms,
            key=key,
            epoch=ds.epoch + 1,
        )
        return ds, metrics

    def train_epoch(self, ds: DistillState):
        ds, traj = self.rollout(ds)
        ds, metrics = self.update(ds, traj)
        return ds, metrics
