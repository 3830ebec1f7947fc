"""HumanoidIm: the core motion-imitation environment, TPU-native.

Re-designs the reference's HumanoidIm class tower (phc/env/tasks/
humanoid_im.py:34, BaseTask->Humanoid->HumanoidAMP->HumanoidAMPTask->
HumanoidIm) as a pure-functional env: `state' = step(state, action)` where
physics, reference-motion lookup, observation, reward, termination, and
auto-reset (reference-state-init) are all traced into one XLA program and
vmapped over the env axis. There are no buffers to poke and no host syncs —
the Isaac Gym process boundary (humanoid.py:1246-1297) disappears entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.env import kernels
from pulse_tpu.env.domain_rand import DRConfig, apply_noise
from pulse_tpu.motion.motion_lib import MotionData, get_motion_state, sample_motions, sample_time
from pulse_tpu.ops import quat as q_ops
from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import (
    PhysicsState,
    dof_pos_from_state,
    dof_vel_from_state,
    state_from_kinematics,
    state_from_motion_ref,
)
from pulse_tpu.physics.step import physics_step


DEFAULT_KEY_BODIES = ("R_Ankle", "L_Ankle", "R_Wrist", "L_Wrist")
DEFAULT_RESET_BODIES = (
    "Pelvis", "L_Hip", "L_Knee", "R_Hip", "R_Knee", "Torso", "Spine", "Chest",
    "Neck", "Head", "L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand",
    "R_Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand",
)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """≙ env_im*.yaml knobs that shape the jitted program."""

    episode_length: int = 300
    # actuation mode (≙ env.control_mode, humanoid.py:89-94,1222-1297):
    # 'isaac_pd' implicit stable-PD drives (default), 'pd' explicit PD
    # torques recomputed per substep, 'force' raw torques scaled by motor
    # effort (MJCF gear=500) × power_scale
    control_mode: str = "isaac_pd"
    power_scale: float = 1.0
    motor_effort: float = 500.0
    termination_distance: float = 0.25
    enable_early_termination: bool = True
    use_mean_termination: bool = True
    num_traj_samples: int = 1          # future ref steps in task obs (fut_tracks)
    traj_sample_timestep: float = 1.0 / 30.0
    local_root_obs: bool = True
    root_height_obs: bool = True
    state_init: str = "Random"         # Default | Start | Random | Hybrid
    hybrid_init_prob: float = 0.5
    power_reward: bool = False
    power_coefficient: float = 0.0005
    cycle_motion: bool = False
    obs_v: int = 6                  # imitation task-obs version (humanoid_im.py:708-851)
    self_obs_v: int = 1             # 1 plain / 2 +5-step history / 3 +foot force
                                    # sensors (humanoid.py:1137-1213, 1735-1849)
    self_obs_hist_steps: int = 5
    obs_noise_std: float = 0.0      # training-time obs perturbation (humanoid_im.py:691-692)
    # far-goal mode (≙ zero_out_far, humanoid_im.py:763-776,870-892): when
    # the character strays beyond the threshold from the reference, the
    # imitation obs collapse to a point goal and the reward becomes
    # walk-toward-the-reference; imitation termination is suspended
    zero_out_far: bool = False
    zero_out_far_distance: float = 5.0
    # occlusion training (≙ _update_occl_training, humanoid_im.py:1047-1058):
    # randomly blank a contiguous chunk of the task obs to robustify against
    # missing/occluded tracking input
    occlusion_prob: float = 0.0
    occlusion_frac: float = 0.25
    num_amp_obs_steps: int = 10     # discriminator window (humanoid_amp.py:91)
    # disc obs version (≙ amp_obs_v, humanoid_amp.py:303-307): v2 adds
    # heading-local key-body VELOCITIES after the key positions
    amp_obs_v: int = 1
    # append [gender, betas(10)] to the DISC obs (≙ has_shape_obs_disc,
    # humanoid.py:267 — reference default follows has_shape_obs). Requires
    # has_shape_obs: the channel slices the same per-env shape row.
    has_shape_obs_disc: bool = False
    # shape conditioning channels (≙ has_shape_obs / has_limb_weight_obs,
    # humanoid.py:266-267,1166-1177): append [gender, betas(10)] and the 10
    # limb length/mass group sums to the self obs; rows come from
    # enable_shape_variation (zeros until then)
    has_shape_obs: bool = False
    has_limb_weight_obs: bool = False
    # full domain-randomization surface (≙ BaseTask.apply_randomizations,
    # base_task.py:518-697): scheduled gaussian/uniform additive/scaling
    # obs+action noise with held correlated draws — env/domain_rand.py.
    # None disables (and keeps the fused post-physics kernels eligible).
    dr: "DRConfig | None" = None
    key_bodies: Sequence[str] = DEFAULT_KEY_BODIES
    reset_bodies: Sequence[str] = DEFAULT_RESET_BODIES
    # bodies the task obs/reward track; None -> all (subset = VR-style
    # sparse tracking, ≙ track_bodies / humanoid_im.py:62-69)
    track_bodies: Sequence[str] | None = None
    # use the Pallas mega-kernel physics step when eligible (TPU backend,
    # isaac_pd, no terrain/self-collision/shape-variation, batch divisible
    # by its env block) — physics/substep_pallas.py
    use_pallas_physics: bool = True
    # reward specs (humanoid_im.py:55)
    k_pos: float = 100.0
    k_rot: float = 10.0
    k_vel: float = 0.1
    k_ang_vel: float = 0.1
    w_pos: float = 0.5
    w_rot: float = 0.3
    w_vel: float = 0.1
    w_ang_vel: float = 0.1


@struct.dataclass
class EnvState:
    """Per-env state pytree (batched by vmap at the wrapper level)."""

    physics: PhysicsState
    key: jax.Array
    motion_id: jax.Array       # i32 []
    start_time: jax.Array      # f32 []
    progress: jax.Array        # i32 []
    obs: jax.Array             # [obs_dim]
    reward: jax.Array          # []
    reward_raw: jax.Array      # [4]
    done: jax.Array            # bool []
    terminate: jax.Array       # bool []
    amp_hist: jax.Array        # [S, amp_obs_dim_single] newest first
    recovery_counter: jax.Array = 0  # steps of termination grace (getup)
    self_obs_hist: jax.Array | None = None  # [H, single] for self_obs_v == 2
    # static per-env shape conditioning row ([gender+betas?] ++ [limb
    # weights?] per the config flags); survives auto-resets, replaced only
    # by enable_shape_variation resampling
    shape_obs: jax.Array | None = None
    # domain-randomization state (cfg.dr != None): held correlated noise
    # draws (≙ dr_randomizations[...]['corr'], base_task.py:582-589) and a
    # never-resetting step counter driving schedules + refresh frequency
    # (≙ gym.get_frame_count, base_task.py:527)
    dr_corr_obs: jax.Array | None = None
    dr_corr_act: jax.Array | None = None
    dr_step: jax.Array | None = None

    @property
    def amp_obs(self) -> jax.Array:
        """Stacked discriminator observation (humanoid_amp.py:116-120)."""
        return self.amp_hist.reshape(*self.amp_hist.shape[:-2], -1)


class HumanoidImEnv:
    """Bundles (physics model, motion data, config) and exposes pure
    reset/step functions. Instances hold no mutable state."""

    def __init__(self, model: Model, motion: MotionData, config: EnvConfig | None = None):
        self.model = model
        self.batched_model = None   # set by enable_shape_variation
        # DP mesh for the shard_map'd Pallas hot path (set by the trainer /
        # dryrun when envs are sharded over devices); interpret=True forces
        # the kernel's interpreter so the sharded path is testable on CPU
        self.mesh = None
        self._pallas_interpret = False
        self.motion = motion
        self.config = config or EnvConfig()
        if self.config.control_mode not in ("isaac_pd", "pd", "force"):
            raise ValueError(
                f"unknown control_mode {self.config.control_mode!r}; "
                "expected isaac_pd | pd | force"
            )
        # Pallas mega-kernel eligibility (see step()). Subclasses that
        # override step_one (perturbations, coupled props) keep the vmap
        # path — the kernel only replaces the base physics.
        from pulse_tpu.physics.substep_pallas import supported as _pallas_ok

        self._pallas_eligible = (
            self.config.use_pallas_physics
            and self.config.control_mode == "isaac_pd"
            and _pallas_ok(model)
            and type(self).step_one is HumanoidImEnv.step_one
        )
        names = None
        # body name resolution comes from the skeleton the model was built
        # from; Model does not carry names, so the env resolves via spec names
        from pulse_tpu.assets import load_smpl_humanoid  # default naming

        self._names = load_smpl_humanoid().skeleton.node_names
        self.key_body_ids = np.asarray(
            [self._names.index(n) for n in self.config.key_bodies], np.int32
        )
        self.reset_body_ids = np.asarray(
            [self._names.index(n) for n in self.config.reset_bodies], np.int32
        )
        if self.config.track_bodies is None:
            self.track_body_ids = np.arange(model.num_bodies, dtype=np.int32)
        else:
            self.track_body_ids = np.asarray(
                [self._names.index(n) for n in self.config.track_bodies], np.int32
            )
        J = model.num_bodies
        self.num_bodies = J
        self.self_obs_dim_single = (
            (1 if self.config.root_height_obs else 0) + (J - 1) * 3 + J * 6 + J * 3 + J * 3
        )
        if self.config.self_obs_v == 3:
            # + force "sensors" on the contact feet (≙ v3 sensor channel,
            # humanoid.py:1793-1849): force + torque per ankle
            self.sensor_body_ids = np.asarray(
                [self._names.index(n) for n in ("L_Ankle", "R_Ankle")], np.int32
            )
            self.self_obs_dim_single += 6 * len(self.sensor_body_ids)
        # shape conditioning channels (humanoid.py:1166-1177 obs tail)
        self.shape_extra_dim = (11 if self.config.has_shape_obs else 0) + (
            10 if self.config.has_limb_weight_obs else 0
        )
        self.self_obs_dim_single += self.shape_extra_dim
        self._shape_obs_table = None   # [N, shape_extra_dim], set by
        #                                enable_shape_variation
        if self.config.self_obs_v == 2:
            self.self_obs_dim = self.config.self_obs_hist_steps * self.self_obs_dim_single
        else:
            self.self_obs_dim = self.self_obs_dim_single
        T = self.config.num_traj_samples
        Jt = len(self.track_body_ids)
        obs_v = self.config.obs_v
        if obs_v == 6:
            self.task_obs_dim = T * Jt * 24
        elif obs_v == 7:
            self.task_obs_dim = T * Jt * 9
        elif obs_v == 8:
            self.task_obs_dim = Jt * 15 + T * Jt * 15
        elif obs_v == 9:
            self.task_obs_dim = T * (Jt * 18 + 6)
        else:
            raise ValueError(f"unsupported obs_v {obs_v}")
        self.obs_dim = self.self_obs_dim + self.task_obs_dim
        D = model.num_dof
        if self.config.amp_obs_v not in (1, 2):
            raise ValueError(f"unsupported amp_obs_v {self.config.amp_obs_v}")
        if self.config.has_shape_obs_disc and not self.config.has_shape_obs:
            raise ValueError("has_shape_obs_disc requires has_shape_obs")
        K = len(self.key_body_ids)
        # [root_h?, rot 6, vel 3, ang vel 3, dof tan-norm 2D, dof vel D,
        #  key pos 3K, key vel 3K (v2), shape 11?, limb 10?]
        self.amp_obs_dim_single = (
            (1 if self.config.root_height_obs else 0)
            + 6 + 3 + 3 + 2 * D + D + 3 * K
            + (3 * K if self.config.amp_obs_v == 2 else 0)
            + (11 if self.config.has_shape_obs_disc else 0)
            + (10 if self.config.has_limb_weight_obs else 0)
        )
        self.amp_obs_dim = self.config.num_amp_obs_steps * self.amp_obs_dim_single
        self.action_dim = D
        # Precomputed per-frame AMP obs: resets / demo fetches become pure
        # gathers instead of 10 motion-state recomputations per env per step.
        # Gated by size so AMASS-scale stores fall back to on-the-fly.
        self.amp_frame_table = None
        if int(motion.num_frames_total) * self.amp_obs_dim_single <= 64_000_000:
            self.amp_frame_table = self._build_amp_frame_table()

    def _build_amp_frame_table(self) -> jax.Array:
        """AMP obs of every stored motion frame, one batched call. [F, A].
        Holds the motion-derived channels only — the per-env shape/limb
        disc channels (static across frames) are appended at gather time."""
        from pulse_tpu.ops import quat as _q

        m = self.motion
        F = m.gts.shape[0]
        dof_pos = _q.quat_to_exp_map(m.lrs[:, 1:]).reshape(F, -1)
        args = (
            m.gts[:, 0],
            m.grs[:, 0],
            m.gvs[:, 0],
            m.gavs[:, 0],
            dof_pos,
            m.dvs,
            m.gts[:, self.key_body_ids],
        )
        kw = dict(
            local_root_obs=self.config.local_root_obs,
            root_height_obs=self.config.root_height_obs,
        )
        if self.config.amp_obs_v == 2:
            return kernels.build_amp_observations_smpl_v2(
                *args, m.gvs[:, self.key_body_ids], **kw
            )
        return kernels.build_amp_observations_smpl(*args, **kw)

    def _disc_extra_parts(self, shape_obs):
        """Slices of the shape row(s) for the disc obs trailing channels
        ([gender+betas 11] iff has_shape_obs_disc, [limb 10] iff
        has_limb_weight_obs — ≙ the shape_params/limb_weight_params args of
        build_amp_observations_smpl*, humanoid_amp.py:924-1017). Accepts a
        single per-env row [E] or per-sample rows [n, E] (the demo path,
        where each sample carries its own clip's params)."""
        cfg = self.config
        shape = limb = None
        if cfg.has_shape_obs_disc or cfg.has_limb_weight_obs:
            row = (
                shape_obs
                if shape_obs is not None
                else jnp.zeros(self.shape_extra_dim)
            )
            rows = row if row.ndim == 2 else row[None]
            if cfg.has_shape_obs_disc:
                shape = rows[:, :11]
            if cfg.has_limb_weight_obs:
                limb = rows[:, -10:]
        return shape, limb

    def amp_obs_from_motion_state(self, st: dict, shape_obs=None) -> jax.Array:
        """Disc obs rows [n, A] from a get_motion_state dict — the demo
        fetch / RSI window path. Demo shape channels come from `shape_obs`:
        a single row [E] (agent-side windows) or per-sample rows [n, E]
        (demo fetch, each sample carrying its own clip's gender+betas —
        ≙ motion_bodies in build_amp_obs_demo, humanoid_amp.py:253-284);
        zeros when None."""
        n = st["root_pos"].shape[0]
        shape_p, limb_p = self._disc_extra_parts(shape_obs)
        kw = dict(
            local_root_obs=self.config.local_root_obs,
            root_height_obs=self.config.root_height_obs,
            shape_params=None
            if shape_p is None
            else jnp.broadcast_to(shape_p, (n, shape_p.shape[-1])),
            limb_weight_params=None
            if limb_p is None
            else jnp.broadcast_to(limb_p, (n, limb_p.shape[-1])),
        )
        args = (
            st["root_pos"],
            st["root_rot"],
            st["root_vel"],
            st["root_ang_vel"],
            st["dof_pos"],
            st["dof_vel"],
            st["rg_pos"][:, self.key_body_ids],
        )
        if self.config.amp_obs_v == 2:
            return kernels.build_amp_observations_smpl_v2(
                *args, st["body_vel"][:, self.key_body_ids], **kw
            )
        return kernels.build_amp_observations_smpl(*args, **kw)

    # ------------------------------------------------------------------ #
    # reference state lookup
    # ------------------------------------------------------------------ #

    def _motion_time(self, state: EnvState) -> jax.Array:
        """In-clip time; with cycle_motion the time wraps (the positional
        continuation is handled by _cycle_offset)."""
        t = state.start_time + state.progress.astype(jnp.float32) * self.model.config.control_dt
        if self.config.cycle_motion:
            length = self.motion.motion_lengths[state.motion_id]
            t = jnp.mod(t, jnp.maximum(length, 1e-6))
        return t

    def _cycle_offset(self, state: EnvState) -> jax.Array | None:
        """World-space offset accumulated over motion cycles so the cycled
        reference continues from where the clip ended instead of teleporting
        back to the start (≙ motion cycling + global offset,
        humanoid_im.py:1125-1150)."""
        if not self.config.cycle_motion:
            return None
        m = self.motion
        raw_t = state.start_time + state.progress.astype(jnp.float32) * self.model.config.control_dt
        length = jnp.maximum(m.motion_lengths[state.motion_id], 1e-6)
        cycles = jnp.floor(raw_t / length)
        start = m.length_starts[state.motion_id]
        last = start + m.motion_num_frames[state.motion_id] - 1
        delta = m.gts[last, 0] - m.gts[start, 0]
        return (cycles * delta).at[2].set(0.0)

    def _ref_state(
        self, motion_id: jax.Array, t: jax.Array, offset: jax.Array | None = None
    ) -> dict:
        """Single-time reference state ([...] scalars in, [J,...] out)."""
        st = get_motion_state(
            self.motion, motion_id[None], t[None],
            offset=None if offset is None else offset[None],
        )
        return {k: v[0] for k, v in st.items()}

    def _ref_track(
        self, motion_id: jax.Array, t: jax.Array, offset: jax.Array | None = None
    ) -> dict:
        """Future-track reference states for task obs: [T, J, ...]."""
        T = self.config.num_traj_samples
        offsets = jnp.arange(T, dtype=jnp.float32) * self.config.traj_sample_timestep
        times = t + offsets
        ids = jnp.broadcast_to(motion_id, (T,))
        off = None if offset is None else jnp.broadcast_to(offset, (T, 3))
        return get_motion_state(self.motion, ids, times, offset=off)

    # ------------------------------------------------------------------ #
    # reset (reference state init, ≙ humanoid_im.py:921-989)
    # ------------------------------------------------------------------ #

    def _sample_init_time(self, key, motion_id):
        cfg = self.config
        if cfg.state_init == "Start":
            return jnp.zeros(())
        t_rand = sample_time(key, self.motion, motion_id[None])[0]
        if cfg.state_init == "Random":
            return t_rand
        if cfg.state_init == "Hybrid":
            k1, k2 = jax.random.split(key)
            use_start = jax.random.uniform(k1) > cfg.hybrid_init_prob
            return jnp.where(use_start, 0.0, sample_time(k2, self.motion, motion_id[None])[0])
        return jnp.zeros(())  # Default

    def reset_one(
        self,
        key: jax.Array,
        model: Model | None = None,
        shape_obs: jax.Array | None = None,
        with_obs: bool = True,
        sampling_prob: jax.Array | None = None,
    ) -> EnvState:
        k_motion, k_time, k_next = jax.random.split(key, 3)
        motion_id = sample_motions(k_motion, self.motion, 1, prob=sampling_prob)[0]
        start_time = self._sample_init_time(k_time, motion_id)
        return self._reset_to(
            k_next, motion_id, start_time, model, shape_obs, with_obs
        )

    def reset_to_one(
        self, key: jax.Array, motion_id: jax.Array, start_time: jax.Array
    ) -> EnvState:
        """Deterministic reset onto a specific clip/time — the eval path
        (≙ begin_seq_motion_samples, humanoid_im.py:439-448)."""
        return self._reset_to(key, motion_id, start_time)

    def _reset_to(
        self,
        k_next,
        motion_id,
        start_time,
        model: Model | None = None,
        shape_obs: jax.Array | None = None,
        with_obs: bool = True,
    ) -> EnvState:
        model = self.model if model is None else model
        if shape_obs is None and self.shape_extra_dim:
            shape_obs = jnp.zeros(self.shape_extra_dim)
        ref = self._ref_state(motion_id, start_time)
        if self.batched_model is None:
            # tables already carry the FK'd bodies — reset is pure gathers
            physics = state_from_motion_ref(model, ref)
        else:
            # per-env shapes: the shared motion tables don't match the
            # env's skeleton, so FK through the env's own model
            physics = state_from_kinematics(
                model,
                ref["root_pos"],
                ref["root_rot"],
                ref["dof_pos"],
                ref["root_vel"],
                ref["root_ang_vel"],
                ref["dof_vel"],
            )
        state = EnvState(
            physics=physics,
            key=k_next,
            motion_id=motion_id,
            start_time=start_time,
            progress=jnp.zeros((), jnp.int32),
            obs=jnp.zeros(self.obs_dim),
            reward=jnp.zeros(()),
            reward_raw=jnp.zeros(4),
            done=jnp.zeros((), bool),
            terminate=jnp.zeros((), bool),
            amp_hist=self._init_amp_hist(motion_id, start_time, shape_obs),
            recovery_counter=jnp.zeros((), jnp.int32),
            shape_obs=shape_obs,
        )
        if self.config.dr is not None:
            state = state.replace(
                dr_corr_obs=jax.random.normal(
                    jax.random.fold_in(k_next, 29), (self.obs_dim,)
                ),
                dr_corr_act=jax.random.normal(
                    jax.random.fold_in(k_next, 31), (self.action_dim,)
                ),
                dr_step=jnp.zeros((), jnp.int32),
            )
        if self.config.self_obs_v == 2:
            single = self._self_obs_single(state)
            state = state.replace(
                self_obs_hist=jnp.tile(
                    single[None], (self.config.self_obs_hist_steps, 1)
                )
            )
        # with_obs=False: the auto-reset path computes obs once on the merged
        # state in _finish_step instead
        if with_obs:
            state = state.replace(obs=self._observe(state))
        return state

    def _init_amp_hist(self, motion_id, start_time, shape_obs=None) -> jax.Array:
        """Fill the discriminator window from the motion's past frames
        (≙ _init_amp_obs_ref path on RSI resets)."""
        S = self.config.num_amp_obs_steps
        dt = self.model.config.control_dt
        times = jnp.maximum(start_time - jnp.arange(S, dtype=jnp.float32) * dt, 0.0)
        ids = jnp.broadcast_to(motion_id, (S,))
        if self.amp_frame_table is not None:
            # nearest-frame gather from the precomputed table
            m = self.motion
            num_frames = m.motion_num_frames[ids]
            mdt = m.motion_dt[ids]
            f = jnp.clip(
                jnp.round(times / mdt).astype(jnp.int32), 0, num_frames - 1
            )
            rows = self.amp_frame_table[m.length_starts[ids] + f]
            shape_p, limb_p = self._disc_extra_parts(shape_obs)
            extras = [p for p in (shape_p, limb_p) if p is not None]
            if extras:
                extra = jnp.concatenate(extras, axis=-1)
                rows = jnp.concatenate(
                    [rows, jnp.broadcast_to(extra, (S, extra.shape[-1]))], -1
                )
            return rows
        st = get_motion_state(self.motion, ids, times)
        return self.amp_obs_from_motion_state(st, shape_obs)

    # ------------------------------------------------------------------ #
    # observations
    # ------------------------------------------------------------------ #

    def _self_obs_single(self, state: EnvState) -> jax.Array:
        cfg = self.config
        ph = state.physics
        so = kernels.compute_humanoid_self_obs_max(
            ph.body_pos[None],
            ph.body_rot[None],
            ph.body_vel[None],
            ph.body_ang_vel[None],
            local_root_obs=cfg.local_root_obs,
            root_height_obs=cfg.root_height_obs,
        )[0]
        if cfg.self_obs_v == 3:
            # foot force sensors: net contact force + torque proxy
            f = ph.contact_force[self.sensor_body_ids].reshape(-1)
            so = jnp.concatenate([so, f, jnp.zeros_like(f)])
        if self.shape_extra_dim:
            extra = (
                state.shape_obs
                if state.shape_obs is not None
                else jnp.zeros(self.shape_extra_dim)
            )
            so = jnp.concatenate([so, extra])
        return so

    def _observe(self, state: EnvState, far: jax.Array | None = None) -> jax.Array:
        cfg = self.config
        ph = state.physics
        if cfg.self_obs_v == 2:
            self_obs = state.self_obs_hist.reshape(-1)
        else:
            self_obs = self._self_obs_single(state)
        # task obs targets the NEXT control step (humanoid_im.py:708-729),
        # restricted to the tracked-body subset (VR-style sparse tracking
        # when configured, humanoid_im.py:62-69)
        t_next = self._motion_time(state) + self.model.config.control_dt
        ref = self._ref_track(state.motion_id, t_next, self._cycle_offset(state))
        tb = self.track_body_ids
        obs_v = cfg.obs_v
        if obs_v == 6:
            task_obs = kernels.compute_imitation_observations_v6(
                ph.root_pos[None], ph.root_rot[None],
                ph.body_pos[None, tb], ph.body_rot[None, tb],
                ph.body_vel[None, tb], ph.body_ang_vel[None, tb],
                ref["rg_pos"][None][:, :, tb], ref["rb_rot"][None][:, :, tb],
                ref["body_vel"][None][:, :, tb], ref["body_ang_vel"][None][:, :, tb],
            )[0]
        elif obs_v == 7:
            task_obs = kernels.compute_imitation_observations_v7(
                ph.root_pos[None], ph.root_rot[None],
                ph.body_pos[None, tb], ph.body_vel[None, tb],
                ref["rg_pos"][None][:, :, tb], ref["body_vel"][None][:, :, tb],
            )[0]
        elif obs_v == 8:
            task_obs = kernels.compute_imitation_observations_v8(
                ph.root_pos[None], ph.root_rot[None],
                ph.body_pos[None, tb], ph.body_rot[None, tb],
                ph.body_vel[None, tb], ph.body_ang_vel[None, tb],
                ref["rg_pos"][None][:, :, tb], ref["rb_rot"][None][:, :, tb],
                ref["body_vel"][None][:, :, tb], ref["body_ang_vel"][None][:, :, tb],
            )[0]
        else:  # v9
            task_obs = kernels.compute_imitation_observations_v9(
                ph.root_pos[None], ph.root_rot[None],
                ph.body_pos[None, tb], ph.body_rot[None, tb],
                ph.body_vel[None, tb], ph.body_ang_vel[None, tb],
                ref["rg_pos"][None][:, :, tb], ref["rb_rot"][None][:, :, tb],
                ref["body_vel"][None, :, 0], ref["body_ang_vel"][None, :, 0],
            )[0]
        if cfg.zero_out_far:
            if far is None:
                far = self._far_from_ref(state)
            # point goal: heading-local vector to the reference root
            heading_inv = q_ops.calc_heading_quat_inv(ph.root_rot)
            goal = q_ops.quat_rotate(
                heading_inv, ref["rg_pos"][0, 0] - ph.root_pos
            )
            point_obs = jnp.zeros_like(task_obs).at[0:3].set(goal)
            task_obs = jnp.where(far, point_obs, task_obs)
        return jnp.concatenate([self_obs, task_obs])

    def _far_from_ref(self, state: EnvState) -> jax.Array:
        t = self._motion_time(state)
        ref = self._ref_state(state.motion_id, t, self._cycle_offset(state))
        d = jnp.linalg.norm(
            ref["root_pos"][0:2] - state.physics.root_pos[0:2]
        )
        return d > self.config.zero_out_far_distance

    def _amp_obs(self, state: EnvState) -> jax.Array:
        ph = state.physics
        shape_p, limb_p = self._disc_extra_parts(state.shape_obs)
        args = (
            ph.root_pos[None],
            ph.root_rot[None],
            ph.body_vel[None, 0],
            ph.body_ang_vel[None, 0],
            dof_pos_from_state(ph)[None],
            dof_vel_from_state(ph)[None],
            ph.body_pos[None, self.key_body_ids],
        )
        kw = dict(
            local_root_obs=self.config.local_root_obs,
            root_height_obs=self.config.root_height_obs,
            shape_params=shape_p,
            limb_weight_params=limb_p,
        )
        if self.config.amp_obs_v == 2:
            return kernels.build_amp_observations_smpl_v2(
                *args, ph.body_vel[None, self.key_body_ids], **kw
            )[0]
        return kernels.build_amp_observations_smpl(*args, **kw)[0]

    # ------------------------------------------------------------------ #
    # step
    # ------------------------------------------------------------------ #

    def action_to_pd_target(self, action: jax.Array, model: Model | None = None) -> jax.Array:
        """≙ humanoid.py:1392-1394."""
        model = self.model if model is None else model
        return model.pd_action_offset + model.pd_action_scale * action

    def _termination(self, state: EnvState, ref: dict, pass_time: jax.Array):
        """Reset/terminate flags; overridable (getup adds a grace window)."""
        cfg = self.config
        reset, terminate = kernels.compute_humanoid_im_reset(
            state.progress[None],
            state.physics.body_pos[None, self.reset_body_ids],
            ref["rg_pos"][None, self.reset_body_ids],
            pass_time[None],
            termination_distance=cfg.termination_distance,
            use_mean=cfg.use_mean_termination,
            enable_early_termination=cfg.enable_early_termination,
        )
        return reset[0], terminate[0]

    def _dr_action_noise(self, state: EnvState, action: jax.Array) -> jax.Array:
        """DR action noise, applied before the motor mapping (≙ the
        pre-physics noise_lambda call, base_task.py:217-218)."""
        dr = self.config.dr
        if dr is None or dr.actions is None:
            return action
        return apply_noise(
            dr.actions,
            action,
            state.dr_corr_act,
            jax.random.fold_in(state.key, 41),
            state.dr_step,
        )

    def motor_actions_one(self, state: EnvState, action: jax.Array) -> jax.Array:
        """Action-pathway hook: map the policy's action to motor action
        space. Identity here; MCP overrides it to blend frozen primitives
        (≙ humanoid_im_mcp.py:60-70). Both step_one and the batched Pallas
        step route through it, so overriding the pathway keeps every path
        correct."""
        return action

    def step_one(
        self,
        state: EnvState,
        action: jax.Array,
        model: Model | None = None,
        sampling_prob: jax.Array | None = None,
    ) -> EnvState:
        model = self.model if model is None else model
        action = self._dr_action_noise(state, action)
        action = self.motor_actions_one(state, action)
        mode = self.config.control_mode
        if mode == "force":
            from pulse_tpu.physics.step import physics_step_torque

            tau = action * (self.config.motor_effort * self.config.power_scale)
            physics = physics_step_torque(model, state.physics, tau)
            # power penalty / bookkeeping still sees the PD-target convention
            pd_target = self.action_to_pd_target(action, model)
        elif mode == "pd":
            from pulse_tpu.physics.step import physics_step_pd_explicit

            pd_target = self.action_to_pd_target(action, model)
            physics = physics_step_pd_explicit(model, state.physics, pd_target)
        else:  # isaac_pd (default, the reference's training configuration)
            pd_target = self.action_to_pd_target(action, model)
            physics = physics_step(model, state.physics, pd_target)
        return self._finish_step(state, physics, pd_target, model, sampling_prob)

    def _finish_step(
        self,
        state: EnvState,
        physics,
        pd_target: jax.Array,
        model: Model,
        sampling_prob: jax.Array | None = None,
    ) -> EnvState:
        """Everything after the physics advance: reward, termination, obs,
        auto-reset. Split out so variants (projectiles, coupled props) can
        substitute their own physics while reusing the bookkeeping."""
        cfg = self.config
        progress = state.progress + 1
        state = state.replace(physics=physics, progress=progress)

        t = self._motion_time(state)
        ref = self._ref_state(state.motion_id, t, self._cycle_offset(state))

        tb = self.track_body_ids
        reward, reward_raw = kernels.compute_imitation_reward(
            physics.body_pos[None, tb],
            physics.body_rot[None, tb],
            physics.body_vel[None, tb],
            physics.body_ang_vel[None, tb],
            ref["rg_pos"][None][:, tb],
            ref["rb_rot"][None][:, tb],
            ref["body_vel"][None][:, tb],
            ref["body_ang_vel"][None][:, tb],
            k_pos=cfg.k_pos, k_rot=cfg.k_rot, k_vel=cfg.k_vel, k_ang_vel=cfg.k_ang_vel,
            w_pos=cfg.w_pos, w_rot=cfg.w_rot, w_vel=cfg.w_vel, w_ang_vel=cfg.w_ang_vel,
        )
        reward, reward_raw = reward[0], reward_raw[0]
        if cfg.power_reward:
            # PD torque proxy: kp*(target-dof) - kd*dof_vel
            dof = dof_pos_from_state(physics)
            dof_vel = dof_vel_from_state(physics)
            kp = jnp.repeat(model.joint_kp, 3)
            kd = jnp.repeat(model.joint_kd, 3)
            tau = kp * (pd_target - dof) - kd * dof_vel
            reward = reward + kernels.compute_power_penalty(
                tau[None], dof_vel[None], cfg.power_coefficient
            )[0]

        far = None
        if cfg.zero_out_far:
            # computed ONCE per step and threaded through termination and
            # observation (was recomputed up to 3x, each a full
            # get_motion_state gather)
            far = self._far_from_ref(state)
            d = jnp.linalg.norm(ref["root_pos"][0:2] - physics.root_pos[0:2])
            loc_reward = jnp.exp(-1.0 * d * d)  # compute_location_reward scale
            reward = jnp.where(far, loc_reward, reward)

        length = self.motion.motion_lengths[state.motion_id]
        pass_time = (
            jnp.zeros((), bool)
            if cfg.cycle_motion
            else t >= length
        )
        if cfg.cycle_motion:
            pass_time = progress >= cfg.episode_length
        reset, terminate = self._termination(state, ref, pass_time)
        if cfg.zero_out_far:
            # in far-goal mode the imitation-distance termination is off
            terminate = terminate & ~far
            reset = pass_time | terminate

        stepped = state.replace(
            reward=reward,
            reward_raw=reward_raw,
            done=reset,
            terminate=terminate,
        )
        amp_hist = jnp.roll(state.amp_hist, 1, axis=0).at[0].set(
            self._amp_obs(stepped)
        )
        if cfg.self_obs_v == 2:
            stepped = stepped.replace(
                self_obs_hist=jnp.roll(state.self_obs_hist, 1, axis=0)
                .at[0]
                .set(self._self_obs_single(stepped))
            )
        stepped = stepped.replace(amp_hist=amp_hist)

        # In-graph auto-reset: branch-free select between stepped and fresh
        # (the per-env shape row is static across resets, so it carries over).
        # The observation is computed ONCE, on the post-select state — obs is
        # the most expensive part of the step after physics, and computing it
        # for both branches doubled that cost.
        k_reset, k_keep = jax.random.split(state.key)
        fresh = self.reset_one(
            k_reset, model, state.shape_obs, with_obs=False,
            sampling_prob=sampling_prob,
        )
        next_state = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(reset, (1,) * a.ndim) if a.ndim else reset, a, b
            ),
            fresh,
            stepped.replace(key=k_keep),
        )

        # _observe recomputes far from next_state when zero_out_far is on:
        # the pre-reset `far` above would be stale for just-reset envs
        obs = self._observe(next_state)
        if cfg.dr is not None:
            # refresh the held correlated draws every `frequency` steps
            # (≙ do_nonenv_randomize, base_task.py:527-541; dr_step==0 on
            # the first step ≙ first_randomization) and tick the schedule
            # counter — overriding whatever the auto-reset merge picked.
            refresh = (state.dr_step % cfg.dr.frequency) == 0
            # fold constants differ from _reset_to's (29/31): state.key is
            # the reset key right after a reset, and reusing the same folds
            # would make the first refresh a no-op redraw of the same values
            corr_obs = jnp.where(
                refresh,
                jax.random.normal(
                    jax.random.fold_in(state.key, 43), (self.obs_dim,)
                ),
                state.dr_corr_obs,
            )
            corr_act = jnp.where(
                refresh,
                jax.random.normal(
                    jax.random.fold_in(state.key, 47), (self.action_dim,)
                ),
                state.dr_corr_act,
            )
            next_state = next_state.replace(
                dr_corr_obs=corr_obs,
                dr_corr_act=corr_act,
                dr_step=state.dr_step + 1,
            )
            if cfg.dr.observations is not None:
                obs = apply_noise(
                    cfg.dr.observations,
                    obs,
                    corr_obs,
                    jax.random.fold_in(state.key, 37),
                    state.dr_step,
                )
        if cfg.obs_noise_std > 0:
            k_noise, _ = jax.random.split(jax.random.fold_in(state.key, 17))
            obs = obs + cfg.obs_noise_std * jax.random.normal(k_noise, obs.shape)
        if cfg.occlusion_prob > 0:
            k_occ, k_pos = jax.random.split(jax.random.fold_in(state.key, 19))
            width = max(int(self.task_obs_dim * cfg.occlusion_frac), 1)
            start = self.self_obs_dim + jax.random.randint(
                k_pos, (), 0, max(self.task_obs_dim - width, 1)
            )
            idx = jnp.arange(self.obs_dim)
            keep = (idx < start) | (idx >= start + width)
            occlude = jax.random.uniform(k_occ) < cfg.occlusion_prob
            obs = jnp.where(occlude & ~keep, 0.0, obs)

        # keep the step's reward/done visible to the learner
        return next_state.replace(
            obs=obs, reward=reward, reward_raw=reward_raw,
            done=reset, terminate=terminate,
        )

    # ------------------------------------------------------------------ #
    # batched API
    # ------------------------------------------------------------------ #

    def reset(self, keys: jax.Array) -> EnvState:
        if self._shape_obs_table is not None:
            return jax.vmap(self.reset_one)(
                keys, self.batched_model, self._shape_obs_table
            )
        if self.batched_model is None:
            return jax.vmap(self.reset_one)(keys)
        return jax.vmap(self.reset_one)(keys, self.batched_model)

    def reset_to(self, keys: jax.Array, motion_ids: jax.Array, times: jax.Array) -> EnvState:
        return jax.vmap(self.reset_to_one)(keys, motion_ids, times)

    def step(
        self,
        states: EnvState,
        actions: jax.Array,
        sampling_prob: jax.Array | None = None,
    ) -> EnvState:
        B = actions.shape[0]
        if (
            self._pallas_eligible
            and (jax.default_backend() == "tpu" or self._pallas_interpret)
            and (B % 1024 == 0 or self.mesh is not None)
            # multi-chip without an explicit mesh must fall back to the vmap
            # path: GSPMD cannot partition an unsharded pallas_call, so the
            # kernel is only safe single-chip or under our own shard_map
            and (self.mesh is not None or jax.device_count() == 1)
        ):
            # one kernel for all substeps of the whole batch (launch/copy
            # bound otherwise — see physics/substep_pallas.py). Under a DP
            # mesh, shard_map runs the kernel per device shard (GSPMD can't
            # partition a pallas_call by itself). With shape variation /
            # prop DR, the per-env model leaves enter the kernel as block
            # inputs (build_model_rows) instead of forcing the XLA fallback.
            from pulse_tpu.physics.substep_pallas import (
                pallas_physics_step,
                sharded_pallas_physics_step,
            )

            bm = self.batched_model
            model_rows = None if bm is None else self._batched_model_rows(B)
            actions = jax.vmap(self._dr_action_noise)(states, actions)
            actions = jax.vmap(self.motor_actions_one)(states, actions)
            pd_target = self.action_to_pd_target(
                actions, self.model if bm is None else bm
            )
            if bm is None and self._fused_step_ok():
                # the ref motion state at the post-step time depends only on
                # (motion_id, progress), so gather it BEFORE physics and let
                # the reward/AMP stage ride the physics kernel — one launch,
                # no boundary repack of the stepped body state
                from pulse_tpu.env import pallas_obs as pobs

                t = self._motion_time(
                    states.replace(progress=states.progress + 1)
                )
                ref = get_motion_state(self.motion, states.motion_id, t)
                e = self._fused_consts
                if self.mesh is not None:
                    fused_out = pobs.sharded_pallas_step_reward_amp(
                        self.model, e, self.mesh, states.physics, pd_target,
                        ref, interpret=self._pallas_interpret,
                    )
                else:
                    fused_out = pobs.pallas_step_reward_amp(
                        self.model, e, states.physics, pd_target, ref,
                        interpret=self._pallas_interpret,
                    )
                physics, reward, raw, dmean, dmax, amp_row = fused_out
                return self._finish_step_fused(
                    states, physics, sampling_prob,
                    ra=(reward, raw, dmean, dmax, amp_row),
                )
            if self.mesh is not None:
                physics = sharded_pallas_physics_step(
                    self.model, self.mesh, states.physics, pd_target,
                    model_rows, interpret=self._pallas_interpret,
                )
            else:
                physics = pallas_physics_step(
                    self.model, states.physics, pd_target,
                    model_rows=model_rows, interpret=self._pallas_interpret,
                )
            if bm is None:
                return jax.vmap(
                    lambda s, p, t: self._finish_step(
                        s, p, t, self.model, sampling_prob
                    )
                )(states, physics, pd_target)
            # per-env models: the post-physics bookkeeping (resets FK through
            # the env's own skeleton) threads the batched model through
            return jax.vmap(
                lambda s, p, t, m: self._finish_step(s, p, t, m, sampling_prob)
            )(states, physics, pd_target, bm)
        # sampling_prob is shared across envs: closing over it inside the
        # vmapped lambda is in_axes=None broadcasting
        if self.batched_model is None:
            return jax.vmap(
                lambda s, a: self.step_one(s, a, sampling_prob=sampling_prob)
            )(states, actions)
        return jax.vmap(
            lambda s, a, m: self.step_one(s, a, m, sampling_prob=sampling_prob)
        )(states, actions, self.batched_model)

    # ------------------------------------------------------------------ #
    # fused Pallas post-physics path (env/pallas_obs.py): reward + AMP obs
    # + termination distances in one kernel on the stepped state, the
    # observation in a second kernel on the post-merge state. Covers the
    # training hot path (obs v6 / self-obs v1 / amp v1-v2, T=1, no far/
    # cycle/power/occlusion/noise extras); everything else keeps the
    # per-env XLA _finish_step.
    # ------------------------------------------------------------------ #

    def _fused_step_ok(self) -> bool:
        cfg = self.config
        t = type(self)
        default_surface = (
            cfg.obs_v == 6
            and cfg.self_obs_v == 1
            and cfg.amp_obs_v in (1, 2)
            and cfg.num_traj_samples == 1
            and not cfg.cycle_motion
            and not cfg.zero_out_far
            and not cfg.power_reward
            and cfg.occlusion_prob == 0
            and cfg.obs_noise_std == 0
            and cfg.dr is None
            and self.shape_extra_dim == 0
            and np.array_equal(
                np.asarray(self.track_body_ids),
                np.arange(self.model.num_bodies),
            )
        )
        # subclasses that override any stage the kernels replace must keep
        # the per-env path (getup termination windows, perturb physics, ...)
        unoverridden = (
            t._finish_step is HumanoidImEnv._finish_step
            and t._termination is HumanoidImEnv._termination
            and t._observe is HumanoidImEnv._observe
            and t._amp_obs is HumanoidImEnv._amp_obs
            and t._self_obs_single is HumanoidImEnv._self_obs_single
            and t.step_one is HumanoidImEnv.step_one
        )
        return default_surface and unoverridden

    @property
    def _fused_consts(self) -> dict:
        e = getattr(self, "_fused_consts_cache", None)
        if e is None:
            from pulse_tpu.env.pallas_obs import env_consts_from

            e = env_consts_from(self)
            self._fused_consts_cache = e
        return e

    def _finish_step_fused(
        self,
        states: EnvState,
        physics,
        sampling_prob: jax.Array | None = None,
        ra: tuple | None = None,
    ) -> EnvState:
        """Batched _finish_step with the pallas_obs kernels in place of
        the XLA reward/amp/obs pipelines. Semantically identical to
        vmap(_finish_step) on the supported surface (golden-tested in
        tests/test_pallas_obs.py). When `ra` is given, the reward/AMP
        stage already rode the physics kernel (pallas_step_reward_amp —
        the step() hot path) and only termination/merge/obs remain."""
        from pulse_tpu.env import pallas_obs as pobs

        cfg = self.config
        model = self.model
        e = self._fused_consts
        B = states.progress.shape[0]

        progress = states.progress + 1
        stepped = states.replace(physics=physics, progress=progress)
        t = self._motion_time(stepped)
        if ra is not None:
            reward, reward_raw, dmean, dmax, amp_row = ra
        elif self.mesh is not None:
            ref = get_motion_state(self.motion, stepped.motion_id, t)
            reward, reward_raw, dmean, dmax, amp_row = (
                pobs.sharded_pallas_reward_amp(
                    e, self.mesh, physics, ref, interpret=self._pallas_interpret
                )
            )
        else:
            ref = get_motion_state(self.motion, stepped.motion_id, t)
            reward, reward_raw, dmean, dmax, amp_row = pobs.pallas_reward_amp(
                e, physics, ref, interpret=self._pallas_interpret
            )

        # termination on the kernel's distances (≙ compute_humanoid_im_reset)
        length = self.motion.motion_lengths[stepped.motion_id]
        pass_time = t >= length
        dist = dmean if cfg.use_mean_termination else dmax
        fallen = (dist > cfg.termination_distance) & (progress > 1)
        if not cfg.enable_early_termination:
            fallen = jnp.zeros_like(fallen)
        terminate = fallen
        reset = pass_time | terminate

        amp_hist = jnp.roll(states.amp_hist, 1, axis=1).at[:, 0].set(amp_row)
        stepped = stepped.replace(
            reward=reward,
            reward_raw=reward_raw,
            done=reset,
            terminate=terminate,
            amp_hist=amp_hist,
        )

        ks = jax.vmap(jax.random.split)(states.key)
        k_reset, k_keep = ks[:, 0], ks[:, 1]
        fresh = jax.vmap(
            lambda k: self.reset_one(
                k, with_obs=False, sampling_prob=sampling_prob
            )
        )(k_reset)
        merged = jax.tree.map(
            lambda a, b: jnp.where(
                reset.reshape((B,) + (1,) * (a.ndim - 1)), a, b
            ),
            fresh,
            stepped.replace(key=k_keep),
        )

        t_next = self._motion_time(merged) + model.config.control_dt
        ref_next = get_motion_state(self.motion, merged.motion_id, t_next)
        if self.mesh is not None:
            obs = pobs.sharded_pallas_observe(
                e, self.mesh, merged.physics, ref_next,
                interpret=self._pallas_interpret,
            )
        else:
            obs = pobs.pallas_observe(
                e, merged.physics, ref_next, interpret=self._pallas_interpret
            )
        return merged.replace(
            obs=obs, reward=reward, reward_raw=reward_raw,
            done=reset, terminate=terminate,
        )

    def _batched_model_rows(self, B: int) -> jax.Array:
        """Flattened per-env model rows for the Pallas kernel, cached per
        batched_model identity (shape/prop resampling swaps the model)."""
        bm = self.batched_model
        cached = getattr(self, "_model_rows_cache", None)
        if cached is None or cached[0] is not bm or cached[1].shape[0] != B:
            from pulse_tpu.physics.substep_pallas import build_model_rows

            self._model_rows_cache = (bm, build_model_rows(bm, B))
        return self._model_rows_cache[1]

    def _ctor_kwargs(self) -> dict:
        """Extra constructor kwargs beyond (model, motion, config).
        Subclasses with additional ctor args override this so with_config
        can rebuild them faithfully."""
        return {}

    def with_config(self, config):
        """Rebuild this env with a different config, preserving subclass
        ctor args and post-construction state (shape variation, mesh).
        Used by run_eval to switch early termination off without silently
        dropping e.g. HumanoidAMPGetupEnv.termination_height."""
        new = type(self)(self.model, self.motion, config, **self._ctor_kwargs())
        for attr in (
            "batched_model",
            "_shape_obs_table",
            "_shape_variation_args",
            "_prop_rand_base",
            "_prop_rand_args",
            "mesh",
            "_pallas_interpret",
        ):
            if hasattr(self, attr):
                setattr(new, attr, getattr(self, attr))
        return new

    def enable_shape_variation(
        self,
        key: jax.Array,
        num_envs: int,
        scale_range=(0.9, 1.1),
        smpl_model=None,
        beta_std: float = 1.0,
    ) -> None:
        """Give every env its own body shape (≙ has_shape_variation +
        periodic shape resampling, humanoid.py:918-1035 / amp_agent.py:
        557-579). Call again with a new key to resample.

        With `smpl_model` (a pulse_tpu.smpl.SMPLModel), per-env skeletons are
        generated from sampled SMPL betas — the reference's SMPL_Robot path;
        without it, isotropic scale factors. Fills the per-env shape/limb
        obs rows when the config flags ask for them."""
        # remember the mode so a periodic resample (resample_shapes) replays
        # the same arguments — the reference's resample_motions keeps the
        # SMPL-beta mode across resamples rather than reverting to scales
        self._shape_variation_args = dict(
            num_envs=num_envs, scale_range=scale_range,
            smpl_model=smpl_model, beta_std=beta_std,
        )
        from pulse_tpu.physics.shape_variation import (
            limb_weight_params,
            models_from_betas,
            vary_model_scales,
        )

        if smpl_model is None:
            self.batched_model = vary_model_scales(
                self.model, key, num_envs, scale_range
            )
            betas = jnp.zeros((num_envs, 10))
        else:
            betas = beta_std * jax.random.normal(key, (num_envs, 10))
            self.batched_model = models_from_betas(
                self.model, smpl_model, betas, self._names
            )
        if self.shape_extra_dim:
            parts = []
            if self.config.has_shape_obs:
                gender = jnp.zeros((num_envs, 1))      # neutral
                parts.append(jnp.concatenate([gender, betas], axis=-1))
            if self.config.has_limb_weight_obs:
                parts.append(
                    limb_weight_params(
                        self.batched_model.local_translation,
                        self.batched_model.body_mass,
                        self._names,
                    )
                )
            self._shape_obs_table = jnp.concatenate(parts, axis=-1)

    def resample_shapes(self, key: jax.Array) -> None:
        """Redraw every env's body shape in the SAME mode (SMPL betas or
        isotropic scales) that enable_shape_variation was originally called
        with (≙ the periodic shape resample in amp_agent.py:557-579)."""
        args = getattr(self, "_shape_variation_args", None)
        if args is None:
            raise RuntimeError(
                "resample_shapes before enable_shape_variation"
            )
        self.enable_shape_variation(key, **args)
        # shape resampling rebuilds the batched model: it becomes the new
        # pre-DR base, and any physical-property DR re-layers on top
        self._prop_rand_base = None
        if getattr(self, "_prop_rand_args", None) is not None:
            k, n = self._prop_rand_args
            self.randomize_physical_props(jax.random.fold_in(k, 1), n)

    def randomize_physical_props(self, key: jax.Array, num_envs: int) -> None:
        """Per-env physical-property DR (≙ the actor_params half of
        apply_randomizations, base_task.py:643-686: rigid_shape friction,
        rigid_body mass, dof_properties stiffness/damping): uniform
        multipliers from cfg.dr layered onto the current batched model
        (composing with shape variation) or the base model. Host-side at
        build/epoch granularity — call again to re-randomize."""
        dr = self.config.dr
        if dr is None or not (
            dr.friction_range or dr.mass_range or dr.gain_range
        ):
            return
        from pulse_tpu.env.domain_rand import randomize_model_props

        # re-randomize from the pre-DR base, not the already-multiplied
        # model — repeated calls must not compound the multipliers
        base = getattr(self, "_prop_rand_base", None)
        if base is None:
            base = (
                self.batched_model if self.batched_model is not None else self.model
            )
        self._prop_rand_base = base
        self.batched_model = randomize_model_props(
            base,
            key,
            num_envs,
            friction_range=dr.friction_range,
            mass_range=dr.mass_range,
            gain_range=dr.gain_range,
        )
        self._prop_rand_args = (key, num_envs)
