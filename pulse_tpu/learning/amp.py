"""AMP: adversarial motion prior — discriminator, style rewards, buffers.

Re-designs phc/learning/amp_agent.py:36 (AMPAgent) as pure jitted pieces:
  - demo fetches sample the motion library directly on device
    (≙ fetch_amp_obs_demo, humanoid_amp.py:215-284)
  - demo/replay buffers are fixed-size device ring/reservoir buffers
    (≙ replay_buffer.py:3-84, amp_agent.py:975-1057)
  - discriminator loss = BCE + logit L2 + R1 gradient penalty on demo +
    weight decay (≙ _disc_loss, amp_agent.py:895-952)
  - style reward = -log(1 - sigmoid(D)) (≙ _calc_disc_rewards,
    amp_agent.py:1027-1041), mixed with the task reward by
    task_reward_w/disc_reward_w (≙ _combine_rewards, amp_agent.py:1011-1016)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pulse_tpu.env import kernels
from pulse_tpu.learning.networks import Discriminator
from pulse_tpu.learning.running_norm import RunningMeanStd
from pulse_tpu.motion.motion_lib import get_motion_state, sample_motions, sample_time


@dataclasses.dataclass(frozen=True)
class AMPConfig:
    disc_units: tuple = (1024, 512)
    disc_coef: float = 5.0
    disc_logit_reg: float = 0.01
    disc_grad_penalty: float = 5.0
    disc_reward_scale: float = 2.0
    disc_weight_decay: float = 0.0001
    # separate optimizer: reference folds disc_coef=5 into a shared update
    # (amp_agent.py:605-760); an equivalent standalone lr is 5 * 2e-5
    disc_learning_rate: float = 1e-4
    amp_batch_size: int = 512
    amp_buffer_size: int = 16384     # device-resident (reference: 200k host)
    replay_keep_prob: float = 0.01
    task_reward_w: float = 0.5
    disc_reward_w: float = 0.5
    # AMP-obs dropout: zero a random contiguous chunk of disc inputs during
    # training (≙ amp_dropout / ModelAMPContinuous joint dropout,
    # amp_models.py:62-107)
    amp_dropout: bool = False
    amp_dropout_prob: float = 0.3
    amp_dropout_frac: float = 0.2


@struct.dataclass
class RingBuffer:
    """Fixed-size device buffer with wraparound insert + uniform sampling."""

    data: jax.Array     # [N, dim]
    head: jax.Array     # [] int32
    size: jax.Array     # [] int32

    @classmethod
    def create(cls, capacity: int, dim: int) -> "RingBuffer":
        return cls(
            data=jnp.zeros((capacity, dim)),
            head=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def push(self, batch: jax.Array) -> "RingBuffer":
        n = batch.shape[0]
        cap = self.capacity
        idx = (self.head + jnp.arange(n)) % cap
        return self.replace(
            data=self.data.at[idx].set(batch),
            head=(self.head + n) % cap,
            size=jnp.minimum(self.size + n, cap),
        )

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        idx = jax.random.randint(key, (n,), 0, jnp.maximum(self.size, 1))
        return self.data[idx]


@struct.dataclass
class AMPState:
    disc_params: Any
    disc_opt_state: Any
    amp_rms: RunningMeanStd
    demo_buffer: RingBuffer
    replay_buffer: RingBuffer
    # dynamic reward mix (device scalars so the getup schedule can flip them
    # between epochs without retracing — ≙ amp_agent.py:568-575 setting
    # _task_reward_w/_disc_reward_w from the getup schedule)
    task_reward_w: jax.Array = None
    disc_reward_w: jax.Array = None


class AMPModule:
    """Composable AMP piece used by AMPAgent/DistillAgent."""

    def __init__(self, env, config: AMPConfig | None = None):
        self.env = env
        self.config = config or AMPConfig()
        self.disc = Discriminator(units=self.config.disc_units)
        self.optimizer = optax.adam(self.config.disc_learning_rate)

    def init(self, key: jax.Array) -> AMPState:
        cfg = self.config
        dim = self.env.amp_obs_dim
        k_net, k_demo = jax.random.split(key)
        params = self.disc.init(k_net, jnp.zeros((1, dim)))["params"]
        state = AMPState(
            disc_params=params,
            disc_opt_state=self.optimizer.init(params),
            amp_rms=RunningMeanStd.create(dim),
            demo_buffer=RingBuffer.create(cfg.amp_buffer_size, dim),
            replay_buffer=RingBuffer.create(cfg.amp_buffer_size, dim),
            task_reward_w=jnp.asarray(cfg.task_reward_w),
            disc_reward_w=jnp.asarray(cfg.disc_reward_w),
        )
        demo = self.fetch_demo(k_demo, cfg.amp_buffer_size // 4)
        return state.replace(demo_buffer=state.demo_buffer.push(demo))

    # ------------------------------------------------------------------ #

    def fetch_demo(self, key: jax.Array, n: int) -> jax.Array:
        """Sample stacked AMP observation windows from the motion library
        (≙ fetch_amp_obs_demo/build_amp_obs_demo, humanoid_amp.py:215-284):
        each demo is num_amp_obs_steps consecutive frames, newest first."""
        k1, k2 = jax.random.split(key)
        motion = self.env.motion
        S = getattr(self.env.config, "num_amp_obs_steps", 1)
        dt = self.env.model.config.control_dt
        ids = sample_motions(k1, motion, n)
        t0 = sample_time(k2, motion, ids, truncate_time=dt * (S - 1)) + dt * (S - 1)
        return self._build_demo_steps(ids, t0, S)

    def _build_demo_steps(self, ids: jax.Array, t0: jax.Array, steps: int) -> jax.Array:
        """AMP obs for `steps` consecutive frames ending at t0, newest first
        (≙ build_amp_obs_demo_steps, humanoid_amp.py:232-284). [n, steps*dim].

        When the disc obs carry shape/limb channels, each demo row gets ITS
        OWN clip's [gender, betas] + limb weights from the motion store
        (≙ motion_bodies/motion_limb_weights threaded through
        _compute_amp_observations_from_state) — zeros here would let the
        discriminator separate agent vs demo by the shape channel alone."""
        dt = self.env.model.config.control_dt
        times = t0[:, None] - jnp.arange(steps, dtype=jnp.float32)[None, :] * dt
        flat_ids = jnp.repeat(ids, steps)
        st = get_motion_state(self.env.motion, flat_ids, times.reshape(-1))
        obs = self.env.amp_obs_from_motion_state(
            st, self._demo_shape_rows(flat_ids)
        )
        return obs.reshape(ids.shape[0], -1)

    def _demo_shape_rows(self, flat_ids: jax.Array) -> jax.Array | None:
        """Per-sample [n, shape_extra_dim] rows gathered from the store's
        per-clip shape params, laid out like the env's combined shape row
        ([gender+betas 11?] ++ [limb 10?]); None when the disc obs carry no
        shape channels."""
        cfg = self.env.config
        if not (
            getattr(cfg, "has_shape_obs_disc", False)
            or getattr(cfg, "has_limb_weight_obs", False)
        ):
            return None
        m = self.env.motion
        parts = []
        if getattr(cfg, "has_shape_obs", False):
            parts.append(m.shape_params[flat_ids])
        if getattr(cfg, "has_limb_weight_obs", False):
            parts.append(m.limb_weights[flat_ids])
        return jnp.concatenate(parts, axis=-1)

    def fetch_demo_enc_pair(self, key: jax.Array, n: int, enc_steps: int = 30):
        """CALM-style encoder/discriminator demo pair (≙
        fetch_amp_obs_demo_enc_pair, humanoid_amp.py:836-857): one long
        `enc_steps` window per motion plus a short num_amp_obs_steps window
        sampled inside it. Returns (ids, enc_times, enc_obs, times, obs)."""
        k1, k2, k3 = jax.random.split(key, 3)
        motion = self.env.motion
        S = getattr(self.env.config, "num_amp_obs_steps", 1)
        dt = self.env.model.config.control_dt
        enc_window = dt * (enc_steps - 1)
        ids = sample_motions(k1, motion, n)
        lengths = motion.motion_lengths[ids]
        enc_t = sample_time(k2, motion, ids, truncate_time=enc_window)
        enc_t = enc_t + jnp.minimum(lengths, enc_window)
        sub_window = jnp.minimum(lengths, enc_window) - dt * S
        t = enc_t - jax.random.uniform(k3, (n,)) * jnp.maximum(sub_window, 0.0)
        enc_obs = self._build_demo_steps(ids, enc_t, enc_steps)
        obs = self._build_demo_steps(ids, t, S)
        return ids, enc_t, enc_obs, t, obs

    def fetch_demo_pair(self, key: jax.Array, n: int, enc_steps: int = 30):
        """Two nearby long windows from the same motion (≙
        fetch_amp_obs_demo_pair, humanoid_amp.py:859-881) — the positive
        pair for a CALM-style motion encoder. Returns
        (ids, t0, obs0, t1, obs1)."""
        k1, k2, k3 = jax.random.split(key, 3)
        motion = self.env.motion
        dt = self.env.model.config.control_dt
        enc_window = dt * (enc_steps - 1)
        ids = sample_motions(k1, motion, n)
        lengths = motion.motion_lengths[ids]
        t0 = sample_time(k2, motion, ids, truncate_time=enc_window)
        t0 = t0 + jnp.minimum(lengths, enc_window)
        t1 = jnp.minimum(t0 + jax.random.uniform(k3, (n,)) * 0.5, lengths)
        obs0 = self._build_demo_steps(ids, t0, enc_steps)
        obs1 = self._build_demo_steps(ids, t1, enc_steps)
        return ids, t0, obs0, t1, obs1

    # ------------------------------------------------------------------ #

    def disc_reward(self, amp_state: AMPState, amp_obs: jax.Array) -> jax.Array:
        """Style reward from discriminator logits."""
        obs_n = amp_state.amp_rms.normalize(amp_obs)
        logits = self.disc.apply({"params": amp_state.disc_params}, obs_n)
        prob = jax.nn.sigmoid(logits)
        return -jnp.log(jnp.maximum(1.0 - prob, 1e-4)) * self.config.disc_reward_scale

    def combine_rewards(
        self, task_r: jax.Array, disc_r: jax.Array, amp_state: AMPState | None = None
    ) -> jax.Array:
        """task/style mix (≙ _combine_rewards, amp_agent.py:1011-1016).
        With an AMPState, the state's dynamic weights apply (getup schedule
        flips them between epochs)."""
        if amp_state is not None and amp_state.task_reward_w is not None:
            return (
                amp_state.task_reward_w * task_r
                + amp_state.disc_reward_w * disc_r
            )
        cfg = self.config
        return cfg.task_reward_w * task_r + cfg.disc_reward_w * disc_r

    # ------------------------------------------------------------------ #

    def _disc_loss(self, params, agent_obs, demo_obs, rms):
        cfg = self.config
        agent_n = rms.normalize(agent_obs)
        demo_n = rms.normalize(demo_obs)

        agent_logits = self.disc.apply({"params": params}, agent_n)
        def demo_forward(x):
            return self.disc.apply({"params": params}, x)

        demo_logits, demo_vjp = jax.vjp(demo_forward, demo_n)
        loss_agent = jnp.mean(jax.nn.softplus(agent_logits))       # -log(1-sig)
        loss_demo = jnp.mean(jax.nn.softplus(-demo_logits))        # -log(sig)
        bce = 0.5 * (loss_agent + loss_demo)

        # R1-style gradient penalty on demo samples (amp_agent.py:934-940)
        (grad_demo,) = demo_vjp(jnp.ones_like(demo_logits))
        grad_pen = jnp.mean(jnp.sum(grad_demo**2, axis=-1))

        # logit-layer L2 + global weight decay (amp_agent.py:920-931)
        flat = jax.tree_util.tree_leaves(params)
        wd = sum(jnp.sum(p**2) for p in flat if p.ndim == 2)
        # final logit layer is the Discriminator's own top-level Dense
        logit_reg = jnp.sum(params["Dense_0"]["kernel"] ** 2)

        total = (
            bce
            + 0.5 * cfg.disc_grad_penalty * grad_pen
            + cfg.disc_logit_reg * logit_reg
            + cfg.disc_weight_decay * wd
        )
        acc_agent = jnp.mean((agent_logits < 0).astype(jnp.float32))
        acc_demo = jnp.mean((demo_logits > 0).astype(jnp.float32))
        return total, {
            "disc_loss": bce,
            "disc_grad_pen": grad_pen,
            "disc_acc_agent": acc_agent,
            "disc_acc_demo": acc_demo,
        }

    def update(
        self, amp_state: AMPState, key: jax.Array, rollout_amp_obs: jax.Array
    ) -> tuple[AMPState, dict]:
        """One discriminator update from rollout data + buffers."""
        mesh = getattr(self.env, "mesh", None)
        if mesh is not None:
            return self._update_dp(mesh, amp_state, key, rollout_amp_obs)
        cfg = self.config
        n = cfg.amp_batch_size
        flat = rollout_amp_obs.reshape(-1, rollout_amp_obs.shape[-1])
        k_demo_new, k_demo, k_replay, k_agent, k_mix = jax.random.split(key, 5)

        # refresh demo buffer with fresh motion samples
        demo_new = self.fetch_demo(k_demo_new, n)
        demo_buffer = amp_state.demo_buffer.push(demo_new)
        demo_obs = demo_buffer.sample(k_demo, n)

        # agent batch: current rollout mixed with replay
        idx = jax.random.randint(k_agent, (n,), 0, flat.shape[0])
        agent_obs = flat[idx]
        replay_obs = amp_state.replay_buffer.sample(k_replay, n)
        use_replay = (
            jax.random.uniform(k_mix, (n, 1)) < 0.5
        ) & (amp_state.replay_buffer.size > 0)
        agent_mix = jnp.where(use_replay, replay_obs, agent_obs)

        if cfg.amp_dropout:
            k_drop, k_where = jax.random.split(jax.random.fold_in(key, 9))
            dim = agent_mix.shape[-1]
            width = max(int(dim * cfg.amp_dropout_frac), 1)
            start = jax.random.randint(k_where, (), 0, max(dim - width, 1))
            idx = jnp.arange(dim)
            mask = ((idx < start) | (idx >= start + width)).astype(agent_mix.dtype)
            apply = (
                jax.random.uniform(k_drop, (agent_mix.shape[0], 1))
                < cfg.amp_dropout_prob
            )
            agent_mix = jnp.where(apply, agent_mix * mask, agent_mix)
            demo_obs = jnp.where(apply, demo_obs * mask, demo_obs)

        rms = amp_state.amp_rms.update(jnp.concatenate([flat, demo_new]))
        (loss, metrics), grads = jax.value_and_grad(self._disc_loss, has_aux=True)(
            amp_state.disc_params, agent_mix, demo_obs, rms
        )
        updates, opt_state = self.optimizer.update(
            grads, amp_state.disc_opt_state, amp_state.disc_params
        )
        params = optax.apply_updates(amp_state.disc_params, updates)

        replay_buffer = amp_state.replay_buffer.push(agent_obs)
        return (
            amp_state.replace(
                disc_params=params,
                disc_opt_state=opt_state,
                amp_rms=rms,
                demo_buffer=demo_buffer,
                replay_buffer=replay_buffer,
            ),
            metrics,
        )

    def _update_dp(
        self, mesh, amp_state: AMPState, key: jax.Array, rollout_amp_obs
    ) -> tuple[AMPState, dict]:
        """Data-parallel discriminator update. The host path's agent-batch
        gather (flat[idx] over the flattened [T*B] rollout) forces GSPMD to
        all-gather the FULL amp-obs tensor onto every device (see ppo.py
        _update_dp); here each device draws amp_batch_size/D agent rows
        from its OWN rollout shard under shard_map, demo/replay batches are
        drawn replicated and sliced per device, and gradients + rms moments
        are pmean'd (≙ horovod allreduce around the disc step,
        common_agent.py:112-127). Buffers stay replicated: the demo push is
        identical on every device; the replay push concatenates the
        per-device agent rows (P(ax) out-spec == all-gather of a small
        [batch, AO] block)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec

        cfg = self.config
        ax = mesh.axis_names[0]
        D = mesh.devices.size
        n = cfg.amp_batch_size
        T, B = rollout_amp_obs.shape[:2]
        if B % D or n % D:
            raise ValueError(
                f"DP disc update needs num_envs ({B}) and amp_batch_size "
                f"({n}) divisible by the mesh size ({D})"
            )
        nl = n // D
        k_demo_new, k_demo, k_replay, k_agent, k_mix, k_drop = (
            jax.random.split(key, 6)
        )
        # demo fetch/push/sample are replicated work on replicated state
        # (same key everywhere); they sample the motion store, not the
        # sharded rollout
        demo_new = self.fetch_demo(k_demo_new, n)
        demo_buffer = amp_state.demo_buffer.push(demo_new)
        demo_full = demo_buffer.sample(k_demo, n)
        replay_full = amp_state.replay_buffer.sample(k_replay, n)

        def local_disc(params, opt_state, amp_rms, replay_size,
                       k_agent, k_mix, k_drop,
                       demo_full, replay_full, demo_new, amp_obs):
            d = jax.lax.axis_index(ax)
            flat = amp_obs.reshape(-1, amp_obs.shape[-1])
            Nl = flat.shape[0]
            # same idx values per device, different shards -> distinct rows
            idx = jax.random.randint(k_agent, (nl,), 0, Nl)
            agent_obs = flat[idx]
            demo_obs = jax.lax.dynamic_slice_in_dim(demo_full, d * nl, nl)
            replay_obs = jax.lax.dynamic_slice_in_dim(replay_full, d * nl, nl)
            use_replay = (
                jax.random.uniform(jax.random.fold_in(k_mix, d), (nl, 1)) < 0.5
            ) & (replay_size > 0)
            agent_mix = jnp.where(use_replay, replay_obs, agent_obs)

            if cfg.amp_dropout:
                k_apply, k_where = jax.random.split(k_drop)
                dim = agent_mix.shape[-1]
                width = max(int(dim * cfg.amp_dropout_frac), 1)
                start = jax.random.randint(k_where, (), 0, max(dim - width, 1))
                cols = jnp.arange(dim)
                mask = ((cols < start) | (cols >= start + width)).astype(
                    agent_mix.dtype
                )
                apply = (
                    jax.random.uniform(
                        jax.random.fold_in(k_apply, d), (nl, 1)
                    )
                    < cfg.amp_dropout_prob
                )
                agent_mix = jnp.where(apply, agent_mix * mask, agent_mix)
                demo_obs = jnp.where(apply, demo_obs * mask, demo_obs)

            # rms moments of [global rollout rows ++ demo_new], no gather
            m_f = jax.lax.pmean(flat.mean(axis=0), ax)
            e2_f = jax.lax.pmean(jnp.mean(flat * flat, axis=0), ax)
            Nf = Nl * D
            m_d = demo_new.mean(axis=0)
            e2_d = jnp.mean(demo_new * demo_new, axis=0)
            tot = Nf + n
            m = (Nf * m_f + n * m_d) / tot
            e2 = (Nf * e2_f + n * e2_d) / tot
            rms = amp_rms.update_moments(m, jnp.maximum(e2 - m * m, 0.0), tot)

            (loss, metrics), grads = jax.value_and_grad(
                self._disc_loss, has_aux=True
            )(params, agent_mix, demo_obs, rms)
            grads = jax.lax.pmean(grads, ax)
            metrics = jax.lax.pmean(metrics, ax)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rms, metrics, agent_obs

        rep = PartitionSpec()
        params, opt_state, rms, metrics, agent_rows = shard_map(
            local_disc,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, rep, rep, rep, rep, rep,
                      PartitionSpec(None, ax)),
            out_specs=(rep, rep, rep, rep, PartitionSpec(ax)),
        )(
            amp_state.disc_params, amp_state.disc_opt_state,
            amp_state.amp_rms, amp_state.replay_buffer.size,
            k_agent, k_mix, k_drop,
            demo_full, replay_full, demo_new, rollout_amp_obs,
        )
        replay_buffer = amp_state.replay_buffer.push(agent_rows)
        return (
            amp_state.replace(
                disc_params=params,
                disc_opt_state=opt_state,
                amp_rms=rms,
                demo_buffer=demo_buffer,
                replay_buffer=replay_buffer,
            ),
            metrics,
        )
