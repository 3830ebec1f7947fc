"""PPO trainer: rollout + GAE + clipped-surrogate updates, fully jitted.

Re-designs the reference's rl-games fork (phc/learning/common_agent.py:34
CommonAgent: train_epoch/play_steps/discount_values/calc_gradients) as one
pure function `train_epoch(TrainState) -> (TrainState, metrics)`:

  - rollout is a lax.scan over the horizon with the vmapped env step inside,
    so sim + policy inference stay on device with zero host transfer
    (≙ play_steps, amp_agent.py:341 — the reference's hot loop)
  - GAE uses the reference's terminate-masked bootstrap (common_agent.py:
    323-325: next value is zeroed on early termination, not on timeout)
  - minibatch epochs are a scan over shuffled slices (≙ prepare_dataset +
    train_actor_critic, common_agent.py:357-477)

The same TrainState/`train_epoch` pair shards over a device mesh by placing
env states and params with jax.sharding (see pulse_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pulse_tpu.learning.networks import ActorCritic
from pulse_tpu.learning.running_norm import RunningMeanStd


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """≙ im_z_fit.yaml config section defaults."""

    num_envs: int = 64
    horizon_length: int = 32
    minibatch_size: int = 512
    mini_epochs: int = 6
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 2e-5
    e_clip: float = 0.2
    critic_coef: float = 5.0
    bounds_loss_coef: float = 10.0
    entropy_coef: float = 0.0
    grad_norm: float = 50.0
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    truncate_grads: bool = True
    # BPTT sequence length for recurrent networks (≙ seq_len / seq_length in
    # the rl-games RNN path, amp_agent.py:40-44); horizon must divide by it
    seq_len: int = 4
    # gradient steps normalize obs with the stats FROZEN at epoch start while
    # the running stats still accumulate the rollout — the reference's
    # temp_running_mean trick (amp_agent.py:578-603, default on,
    # humanoid.py:105), keeping the loss's obs identical to the rollout's
    temp_running_mean: bool = True


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    env_state: Any
    key: jax.Array
    epoch: jax.Array
    hidden: Any = None      # recurrent carry [B, ...] (RNN networks only)
    # live PMCP clip-sampling weights [M], threaded into the env step's
    # auto-resets so update_{hard,soft}_sampling_weight is a device write
    # instead of a retrace (≙ motion_lib_base.py:378-384); None for envs
    # without a motion store
    motion_prob: Any = None


@struct.dataclass
class Rollout:
    obs: jax.Array          # [T, B, O] (raw)
    actions: jax.Array      # [T, B, A]
    neglogp: jax.Array      # [T, B]
    values: jax.Array       # [T, B] (denormalized)
    rewards: jax.Array      # [T, B]
    dones: jax.Array        # [T, B]
    terminates: jax.Array   # [T, B]
    amp_obs: jax.Array      # [T, B, AO]
    mus: jax.Array          # [T, B, A]
    # recurrent extras (≙ rl-games mb_rnn_states, amp_agent.py:192-339):
    # carry at each step's entry (pre done-mask) + the entry done flag so
    # BPTT replay reproduces the rollout's hidden-state resets exactly
    hiddens: Any = None     # pytree of [T, B, H]
    prev_dones: jax.Array | None = None  # [T, B]


def gaussian_neglogp(mu, log_sigma, action):
    d = action - mu
    return 0.5 * jnp.sum((d / jnp.exp(log_sigma)) ** 2, axis=-1) + jnp.sum(
        log_sigma
    ) + 0.5 * mu.shape[-1] * jnp.log(2 * jnp.pi)


class PPOAgent:
    """Owns static pieces (env, network, optimizer, config); all methods that
    touch data are pure and jittable."""

    def __init__(
        self,
        env,
        config: PPOConfig | None = None,
        network: ActorCritic | None = None,
        reward_fn: Callable | None = None,
    ):
        self.env = env
        self.config = config or PPOConfig()
        self.network = network or ActorCritic(action_dim=env.action_dim)
        self.recurrent = bool(getattr(self.network, "is_recurrent", False))
        if self.recurrent and self.config.horizon_length % self.config.seq_len:
            raise ValueError("horizon_length must be divisible by seq_len")
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.config.grad_norm)
            if self.config.truncate_grads
            else optax.identity(),
            optax.adam(self.config.learning_rate),
        )
        # hook for AMP-style reward mixing: (train_state, rollout) -> rewards
        self.reward_fn = reward_fn

    # ------------------------------------------------------------------ #

    def init(self, key: jax.Array) -> TrainState:
        cfg = self.config
        k_env, k_net, k_next = jax.random.split(key, 3)
        env_state = self.env.reset(jax.random.split(k_env, cfg.num_envs))
        obs0 = jnp.zeros((1, self.env.obs_dim))
        hidden = None
        if self.recurrent:
            variables = self.network.init(
                k_net, self.network.initial_carry((1,)), obs0
            )
            hidden = self.network.initial_carry((cfg.num_envs,))
        else:
            variables = self.network.init(k_net, obs0)
        params = variables["params"]
        motion = getattr(self.env, "motion", None)
        return TrainState(
            hidden=hidden,
            params=params,
            opt_state=self.optimizer.init(params),
            obs_rms=RunningMeanStd.create(self.env.obs_dim),
            value_rms=RunningMeanStd.create(1),
            env_state=env_state,
            key=k_next,
            epoch=jnp.zeros((), jnp.int32),
            # copy: ts is donated by the train loop, and donating the store's
            # own sampling_prob buffer would delete it out from under the
            # trace constants that still reference it
            motion_prob=None if motion is None else jnp.array(motion.sampling_prob),
        )

    # ------------------------------------------------------------------ #

    def _apply(self, params, obs_norm):
        mu, log_sigma, value_norm = self.network.apply({"params": params}, obs_norm)
        return mu, log_sigma, value_norm

    def _policy_step(self, ts: TrainState, env_state, key):
        obs = env_state.obs
        obs_norm = ts.obs_rms.normalize(obs) if self.config.normalize_input else obs
        mu, log_sigma, value_norm = self._apply(ts.params, obs_norm)
        value = (
            ts.value_rms.denormalize(value_norm[..., None])[..., 0]
            if self.config.normalize_value
            else value_norm
        )
        eps = jax.random.normal(key, mu.shape)
        action = mu + jnp.exp(log_sigma) * eps
        neglogp = gaussian_neglogp(mu, log_sigma, action)
        return action, mu, neglogp, value

    def rollout(self, ts: TrainState) -> tuple[TrainState, Rollout, jax.Array]:
        cfg = self.config

        def scan_step(carry, _):
            env_state, key = carry
            key, k_act = jax.random.split(key)
            action, mu, neglogp, value = self._policy_step(ts, env_state, k_act)
            next_env_state = self.env.step(
                env_state, jnp.clip(action, -1.0, 1.0), ts.motion_prob
            )
            out = Rollout(
                obs=env_state.obs,
                actions=action,
                neglogp=neglogp,
                values=value,
                rewards=next_env_state.reward,
                dones=next_env_state.done,
                terminates=next_env_state.terminate,
                amp_obs=next_env_state.amp_obs,
                mus=mu,
            )
            return (next_env_state, key), out

        key, k_roll = jax.random.split(ts.key)
        (env_state, _), traj = jax.lax.scan(
            scan_step, (ts.env_state, k_roll), None, length=cfg.horizon_length
        )
        # bootstrap value of the final observation
        obs_norm = (
            ts.obs_rms.normalize(env_state.obs)
            if cfg.normalize_input
            else env_state.obs
        )
        _, _, last_value_norm = self._apply(ts.params, obs_norm)
        last_value = (
            ts.value_rms.denormalize(last_value_norm[..., None])[..., 0]
            if cfg.normalize_value
            else last_value_norm
        )
        ts = ts.replace(env_state=env_state, key=key)
        return ts, traj, last_value

    # ------------------------------------------------------------------ #
    # recurrent (RNN/BPTT) path — ≙ play_steps_rnn, amp_agent.py:192-339
    # ------------------------------------------------------------------ #

    def _rnn_forward(self, params, hidden, obs_norm, done):
        return self.network.apply({"params": params}, hidden, obs_norm, done)

    def rollout_rnn(self, ts: TrainState) -> tuple[TrainState, Rollout, jax.Array]:
        cfg = self.config

        def scan_step(carry, _):
            env_state, key, hidden = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs
            obs_norm = ts.obs_rms.normalize(obs) if cfg.normalize_input else obs
            # env_state.done marks a fresh post-auto-reset obs: the cell's
            # memory of the previous episode is cleared inside the network
            new_hidden, (mu, log_sigma, value_norm) = self._rnn_forward(
                ts.params, hidden, obs_norm, env_state.done
            )
            value = (
                ts.value_rms.denormalize(value_norm[..., None])[..., 0]
                if cfg.normalize_value
                else value_norm
            )
            eps = jax.random.normal(k_act, mu.shape)
            action = mu + jnp.exp(log_sigma) * eps
            neglogp = gaussian_neglogp(mu, log_sigma, action)
            next_env_state = self.env.step(
                env_state, jnp.clip(action, -1.0, 1.0), ts.motion_prob
            )
            out = Rollout(
                obs=obs,
                actions=action,
                neglogp=neglogp,
                values=value,
                rewards=next_env_state.reward,
                dones=next_env_state.done,
                terminates=next_env_state.terminate,
                amp_obs=next_env_state.amp_obs,
                mus=mu,
                hiddens=hidden,
                prev_dones=env_state.done,
            )
            return (next_env_state, key, new_hidden), out

        key, k_roll = jax.random.split(ts.key)
        (env_state, _, hidden), traj = jax.lax.scan(
            scan_step, (ts.env_state, k_roll, ts.hidden), None,
            length=cfg.horizon_length,
        )
        obs_norm = (
            ts.obs_rms.normalize(env_state.obs)
            if cfg.normalize_input
            else env_state.obs
        )
        _, (_, _, last_value_norm) = self._rnn_forward(
            ts.params, hidden, obs_norm, env_state.done
        )
        last_value = (
            ts.value_rms.denormalize(last_value_norm[..., None])[..., 0]
            if cfg.normalize_value
            else last_value_norm
        )
        ts = ts.replace(env_state=env_state, key=key, hidden=hidden)
        return ts, traj, last_value

    def _loss_rnn(self, params, batch, obs_rms, value_rms):
        """PPO losses over [mb, L] sequences replayed through the cell with
        the rollout-time initial carry (truncated BPTT)."""
        cfg = self.config
        obs = batch["obs"]
        obs_norm = obs_rms.normalize(obs) if cfg.normalize_input else obs

        def cell_step(carry, xs):
            obs_t, done_t, act_t = xs
            carry, (mu, log_sigma, value) = self._rnn_forward(
                params, carry, obs_t, done_t
            )
            neglogp = gaussian_neglogp(mu, log_sigma, act_t)
            return carry, (mu, neglogp, value, jnp.sum(log_sigma))

        xs = (
            jnp.swapaxes(obs_norm, 0, 1),           # [L, mb, O]
            jnp.swapaxes(batch["prev_dones"], 0, 1),
            jnp.swapaxes(batch["actions"], 0, 1),
        )
        _, (mu, neglogp, value_norm, sum_ls) = jax.lax.scan(
            cell_step, batch["hidden"], xs
        )
        neglogp = jnp.swapaxes(neglogp, 0, 1).reshape(-1)
        value_norm = jnp.swapaxes(value_norm, 0, 1).reshape(-1)
        mu_flat = jnp.swapaxes(mu, 0, 1).reshape(-1, mu.shape[-1])

        ratio = jnp.exp(batch["neglogp"].reshape(-1) - neglogp)
        adv = batch["advantages"].reshape(-1)
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        a_loss = -jnp.minimum(surr1, surr2).mean()

        target = (
            batch["returns_norm"] if cfg.normalize_value else batch["returns"]
        ).reshape(-1)
        c_loss = 0.5 * jnp.mean((value_norm - target) ** 2)

        soft = 1.1
        b_loss = jnp.mean(
            jnp.sum(
                jnp.clip(mu_flat - soft, 0.0, None) ** 2
                + jnp.clip(mu_flat + soft, None, 0.0) ** 2,
                axis=-1,
            )
        )
        entropy = sum_ls[0] + 0.5 * mu.shape[-1] * jnp.log(2 * jnp.pi * jnp.e)
        total = (
            a_loss
            + cfg.critic_coef * c_loss
            + cfg.bounds_loss_coef * b_loss
            - cfg.entropy_coef * entropy
        )
        return total, {
            "a_loss": a_loss, "c_loss": c_loss, "b_loss": b_loss, "entropy": entropy,
        }

    def update_rnn(self, ts: TrainState, traj: Rollout, advantages, returns):
        """Minibatches are whole length-seq_len sequences (≙ the rl-games
        sequential AMPDataset format, amp_datasets.py:44-96).

        NOTE: no shard_map DP variant yet — under a mesh this path still
        compiles (GSPMD re-shards through the sequence shuffle, correct but
        gather-heavy like the pre-_update_dp ff path). The PULSE pipeline
        uses feed-forward networks throughout; add an _update_dp_rnn
        mirroring update()'s if RNN policies ever train multi-chip."""
        cfg = self.config
        T, B = traj.rewards.shape
        L = cfg.seq_len
        n_seq = (T // L) * B

        def to_seq(x):
            # [T, B, ...] -> [n_seq, L, ...]: contiguous time chunks per env
            x = x.reshape(T // L, L, B, *x.shape[2:])
            x = jnp.moveaxis(x, 2, 1)
            return x.reshape(n_seq, L, *x.shape[3:])

        obs_rms = (
            ts.obs_rms.update(traj.obs.reshape(T * B, -1))
            if cfg.normalize_input
            else ts.obs_rms
        )
        loss_obs_rms = ts.obs_rms if cfg.temp_running_mean else obs_rms
        value_rms = (
            ts.value_rms.update(returns.reshape(T * B, 1))
            if cfg.normalize_value
            else ts.value_rms
        )
        if cfg.normalize_advantage:
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        seqs = {
            "obs": to_seq(traj.obs),
            "actions": to_seq(traj.actions),
            "neglogp": to_seq(traj.neglogp),
            "advantages": to_seq(advantages),
            "returns": to_seq(returns),
            "prev_dones": to_seq(traj.prev_dones),
            # carry at each sequence's first step, replayed as-is (stale
            # hiddens across mini-epochs — the standard truncated-BPTT trade)
            "hidden": jax.tree.map(
                lambda h: h.reshape(T // L, L, B, -1)[:, 0].reshape(n_seq, -1),
                traj.hiddens,
            ),
        }
        seqs["returns_norm"] = value_rms.normalize(
            seqs["returns"].reshape(-1, 1)
        ).reshape(n_seq, L)

        mb = max(min(cfg.minibatch_size // L, n_seq), 1)
        num_mb = n_seq // mb

        def mini_epoch(carry, key):
            params, opt_state = carry
            perm = jax.random.permutation(key, n_seq)
            shuffled = jax.tree.map(lambda x: x[perm], seqs)

            def mb_step(carry, i):
                params, opt_state = carry
                batch = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb), shuffled
                )
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_rnn, has_aux=True
                )(params, batch, loss_obs_rms, value_rms)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(num_mb)
            )
            return (params, opt_state), metrics

        key, k_upd = jax.random.split(ts.key)
        keys = jax.random.split(k_upd, cfg.mini_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            mini_epoch, (ts.params, ts.opt_state), keys
        )
        ts = ts.replace(
            params=params,
            opt_state=opt_state,
            obs_rms=obs_rms,
            value_rms=value_rms,
            key=key,
            epoch=ts.epoch + 1,
        )
        return ts, jax.tree.map(jnp.mean, metrics)

    # ------------------------------------------------------------------ #

    def compute_gae(self, traj: Rollout, last_value: jax.Array):
        """≙ discount_values (common_agent.py:480-490): early termination
        zeroes the bootstrap; episode-end (timeout) keeps it.

        The backward recurrence a_t = delta_t + c_t * a_{t+1} is a linear
        first-order recurrence, solved with an associative scan (log2(T)
        parallel passes) instead of T sequential scan steps — the
        sequential version cost ~10 ms/epoch of launch-bound tiny kernels
        on v5e (tools/profile_train.py)."""
        cfg = self.config
        next_values = jnp.concatenate([traj.values[1:], last_value[None]], axis=0)
        # the value after a done belongs to the NEXT episode; bootstrap with
        # the pre-reset convention of the reference: next_value comes from the
        # stored next obs value, masked by terminate
        not_term = 1.0 - traj.terminates.astype(jnp.float32)
        not_done = 1.0 - traj.dones.astype(jnp.float32)
        delta = traj.rewards + cfg.gamma * next_values * not_term - traj.values
        c = cfg.gamma * cfg.tau * not_done

        def combine(a, b):
            # reverse=True is flip -> forward scan -> flip, so `a` is the
            # accumulated suffix (later wall-clock times), `b` the new element
            c_a, d_a = a
            c_b, d_b = b
            return c_a * c_b, d_b + c_b * d_a

        # backward-in-time recurrence a_t = delta_t + c_{t+1} a_{t+1}: the
        # reverse scan's cumulative affine composition applied to 0 is the
        # d component (reverse=True spares four [T, B] array flips)
        _, advantages = jax.lax.associative_scan(
            combine, (c, delta), reverse=True
        )
        returns = advantages + traj.values
        return advantages, returns

    # ------------------------------------------------------------------ #

    def _loss(self, params, batch, value_rms):
        cfg = self.config
        # obs arrive pre-normalized (and pre-cast to the network compute
        # dtype) from update() — see the comment there
        mu, log_sigma, value_norm = self._apply(params, batch["obs_norm"])
        neglogp = gaussian_neglogp(mu, log_sigma, batch["actions"])

        ratio = jnp.exp(batch["neglogp"] - neglogp)
        adv = batch["advantages"]
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        a_loss = -jnp.minimum(surr1, surr2).mean()

        target = batch["returns_norm"] if cfg.normalize_value else batch["returns"]
        c_loss = 0.5 * jnp.mean((value_norm - target) ** 2)

        # bound loss (≙ common_agent bound_loss: penalize |mu| beyond 1.1)
        soft = 1.1
        b_loss = jnp.mean(
            jnp.sum(
                jnp.clip(mu - soft, 0.0, None) ** 2
                + jnp.clip(mu + soft, None, 0.0) ** 2,
                axis=-1,
            )
        )

        entropy = jnp.sum(log_sigma + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        total = (
            a_loss
            + cfg.critic_coef * c_loss
            + cfg.bounds_loss_coef * b_loss
            - cfg.entropy_coef * entropy
        )
        metrics = {
            "a_loss": a_loss,
            "c_loss": c_loss,
            "b_loss": b_loss,
            "entropy": entropy,
        }
        return total, metrics

    def update(self, ts: TrainState, traj: Rollout, advantages, returns):
        mesh = getattr(self.env, "mesh", None)
        if mesh is not None:
            return self._update_dp(mesh, ts, traj, advantages, returns)
        cfg = self.config
        T, B = traj.rewards.shape
        N = T * B
        flat_obs = traj.obs.reshape(N, -1)
        obs_rms = ts.obs_rms.update(flat_obs) if cfg.normalize_input else ts.obs_rms
        loss_obs_rms = ts.obs_rms if cfg.temp_running_mean else obs_rms
        # Normalize ONCE per epoch with the loss stats (constant across all
        # mini-epoch/minibatch steps) instead of inside every gradient step,
        # and store in the network's compute dtype: with a bf16 trunk the
        # first Dense casts its input to bf16 anyway, so values are
        # bit-identical while the 6x shuffle gathers move half the bytes.
        obs_for_loss = (
            loss_obs_rms.normalize(flat_obs) if cfg.normalize_input else flat_obs
        )
        net_dtype = getattr(self.network, "dtype", None)
        if net_dtype is not None:
            obs_for_loss = obs_for_loss.astype(net_dtype)
        flat = {
            "obs_norm": obs_for_loss,
            "actions": traj.actions.reshape(N, -1),
            "neglogp": traj.neglogp.reshape(N),
            "advantages": advantages.reshape(N),
            "returns": returns.reshape(N),
        }
        value_rms = (
            ts.value_rms.update(returns.reshape(N, 1))
            if cfg.normalize_value
            else ts.value_rms
        )
        flat["returns_norm"] = value_rms.normalize(flat["returns"][:, None])[:, 0]
        if cfg.normalize_advantage:
            adv = flat["advantages"]
            flat["advantages"] = (adv - adv.mean()) / (adv.std() + 1e-8)

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
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, batch, value_rms)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(num_mb)
            )
            return (params, opt_state), metrics

        key, k_upd = jax.random.split(ts.key)
        keys = jax.random.split(k_upd, cfg.mini_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            mini_epoch, (ts.params, ts.opt_state), keys
        )
        ts = ts.replace(
            params=params,
            opt_state=opt_state,
            obs_rms=obs_rms,
            value_rms=value_rms,
            key=key,
            epoch=ts.epoch + 1,
        )
        return ts, jax.tree.map(jnp.mean, metrics)

    def _update_dp(self, mesh, ts: TrainState, traj: Rollout, advantages, returns):
        """The update phase under data parallelism: shard_map over the mesh,
        each device minibatching its OWN rollout shard, gradients pmean'd
        before a replicated optimizer step — the reference's horovod
        semantics (hvd.allreduce around calc_gradients, common_agent.py:
        112-127) in the XLA collective model.

        Why not let GSPMD partition the single-chip update()? Its global
        shuffle of the flattened [T*B] rollout is a data-dependent gather
        across the sharded env axis, so GSPMD must all-gather the FULL
        rollout onto every device (measured 857 MB/epoch @ 3072 envs/2320-d
        amp obs — caught by tools/check_partitioning.py). Shuffling within
        shards keeps the rollout resident and trades only cross-device
        minibatch mixing — which DP training never had: each horovod worker
        shuffles only its local rollout too. Running-stat and advantage
        moments are pmean'd so normalizers stay bit-identical to the
        gathered computation (up to float association); the same PRNG key
        drives every device's permutation, keeping all replicated state
        provably synchronized."""
        from jax import shard_map
        from jax.sharding import PartitionSpec

        cfg = self.config
        ax = mesh.axis_names[0]
        D = mesh.devices.size
        T, B = traj.rewards.shape
        N = T * B
        mb_global = min(cfg.minibatch_size, N)
        if B % D or mb_global % D:
            raise ValueError(
                f"DP update needs num_envs ({B}) and minibatch_size "
                f"({mb_global}) divisible by the mesh size ({D})"
            )

        def pmoments(x, axis_name):
            """Global (mean, var) of a sharded row batch via pmean."""
            m = jax.lax.pmean(jnp.mean(x, axis=0), axis_name)
            e2 = jax.lax.pmean(jnp.mean(x * x, axis=0), axis_name)
            return m, jnp.maximum(e2 - m * m, 0.0)

        def local_update(params, opt_state, epoch_obs_rms, value_rms, key,
                         traj, advantages, returns):
            Nl = N // D
            flat_obs = traj.obs.reshape(Nl, -1)
            obs_rms = epoch_obs_rms
            if cfg.normalize_input:
                gm, gv = pmoments(flat_obs, ax)
                obs_rms = obs_rms.update_moments(gm, gv, N)
            # epoch-start stats for the loss under temp_running_mean
            loss_obs_rms = epoch_obs_rms if cfg.temp_running_mean else obs_rms
            obs_for_loss = (
                loss_obs_rms.normalize(flat_obs)
                if cfg.normalize_input
                else flat_obs
            )
            net_dtype = getattr(self.network, "dtype", None)
            if net_dtype is not None:
                obs_for_loss = obs_for_loss.astype(net_dtype)
            flat = {
                "obs_norm": obs_for_loss,
                "actions": traj.actions.reshape(Nl, -1),
                "neglogp": traj.neglogp.reshape(Nl),
                "advantages": advantages.reshape(Nl),
                "returns": returns.reshape(Nl),
            }
            if cfg.normalize_value:
                gm, gv = pmoments(returns.reshape(Nl, 1), ax)
                value_rms = value_rms.update_moments(gm, gv, N)
            flat["returns_norm"] = value_rms.normalize(
                flat["returns"][:, None]
            )[:, 0]
            if cfg.normalize_advantage:
                adv = flat["advantages"]
                am, av = pmoments(adv[:, None], ax)
                flat["advantages"] = (adv - am[0]) / (jnp.sqrt(av[0]) + 1e-8)

            mb = mb_global // D
            num_mb = Nl // mb

            def mini_epoch(carry, key):
                params, opt_state = carry
                # the SAME key on every device: replicated state stays
                # provably replicated; the data under the permutation is the
                # device's own shard, so minibatches still differ
                perm = jax.random.permutation(key, Nl)
                shuffled = jax.tree.map(lambda x: x[perm], flat)

                def mb_step(carry, i):
                    params, opt_state = carry
                    batch = jax.tree.map(
                        lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb),
                        shuffled,
                    )
                    (loss, metrics), grads = jax.value_and_grad(
                        self._loss, has_aux=True
                    )(params, batch, value_rms)
                    grads = jax.lax.pmean(grads, ax)
                    metrics = jax.lax.pmean(metrics, ax)
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
                params, opt_state, obs_rms, value_rms, key,
                jax.tree.map(jnp.mean, metrics),
            )

        data_p = PartitionSpec(None, ax)
        rep = PartitionSpec()
        params, opt_state, obs_rms, value_rms, key, metrics = shard_map(
            local_update,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, data_p, data_p, data_p),
            out_specs=(rep, rep, rep, rep, rep, rep),
        )(
            ts.params, ts.opt_state, ts.obs_rms, ts.value_rms, ts.key,
            traj, advantages, returns,
        )
        ts = ts.replace(
            params=params,
            opt_state=opt_state,
            obs_rms=obs_rms,
            value_rms=value_rms,
            key=key,
            epoch=ts.epoch + 1,
        )
        return ts, metrics

    # ------------------------------------------------------------------ #

    def train_epoch(self, ts: TrainState):
        """One full PPO epoch: rollout horizon steps on all envs + update."""
        roll = self.rollout_rnn if self.recurrent else self.rollout
        ts, traj, last_value = roll(ts)
        if self.reward_fn is not None:
            traj = traj.replace(rewards=self.reward_fn(ts, traj))
        advantages, returns = self.compute_gae(traj, last_value)
        upd = self.update_rnn if self.recurrent else self.update
        ts, metrics = upd(ts, traj, advantages, returns)
        metrics = dict(metrics)
        metrics["reward_mean"] = traj.rewards.mean()
        metrics["episode_done_frac"] = traj.dones.mean()
        return ts, metrics
