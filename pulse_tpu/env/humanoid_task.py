"""Downstream task environments (speed / reach / trajectory-follow).

Re-designs the reference's HumanoidAMPTask subclasses (phc/env/tasks/
humanoid_speed.py:23, humanoid_reach.py:19, humanoid_traj.py:21) as pure
functional envs sharing one base: RSI resets from the motion library,
physics stepping, max-coordinate self obs, generic contact-based fall
termination (humanoid.py:1572-1608), AMP obs for the style reward, and
in-graph auto-reset. Subclasses define the task state, its per-step update,
task obs, and task reward.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.env import kernels
from pulse_tpu.motion.motion_lib import MotionData, get_motion_state, sample_motions, sample_time
from pulse_tpu.ops import quat as q
from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import (
    dof_pos_from_state,
    dof_vel_from_state,
    state_from_kinematics,
)
from pulse_tpu.physics.step import physics_step
from pulse_tpu.env.humanoid_im import DEFAULT_KEY_BODIES


DEFAULT_CONTACT_BODIES = ("R_Ankle", "L_Ankle", "R_Toe", "L_Toe")


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    episode_length: int = 300
    termination_height: float = 0.15
    enable_early_termination: bool = True
    local_root_obs: bool = True
    root_height_obs: bool = True
    state_init: str = "Random"
    num_amp_obs_steps: int = 10
    key_bodies: tuple = DEFAULT_KEY_BODIES
    contact_bodies: tuple = DEFAULT_CONTACT_BODIES
    power_reward: bool = False
    power_coefficient: float = 0.0005
    # speed task
    tar_speed_min: float = 0.0
    tar_speed_max: float = 5.0
    speed_change_steps_min: int = 100
    speed_change_steps_max: int = 200
    # reach task
    reach_body: str = "R_Hand"
    tar_reach_dist_max: float = 0.8
    tar_reach_height_min: float = 0.2
    tar_reach_height_max: float = 2.0
    reach_change_steps_min: int = 64
    reach_change_steps_max: int = 128
    # traj task
    num_traj_segments: int = 8
    traj_segment_duration: float = 2.0
    traj_num_samples: int = 10
    traj_sample_timestep: float = 0.5
    traj_speed_min: float = 0.0
    traj_speed_max: float = 3.0
    traj_sharp_turn_prob: float = 0.15


@struct.dataclass
class TaskEnvState:
    physics: Any
    key: jax.Array
    progress: jax.Array
    task: Any                 # task-specific pytree
    obs: jax.Array
    reward: jax.Array
    reward_raw: jax.Array
    done: jax.Array
    terminate: jax.Array
    amp_hist: jax.Array        # [S, amp_obs_dim_single] newest first

    @property
    def amp_obs(self) -> jax.Array:
        return self.amp_hist.reshape(*self.amp_hist.shape[:-2], -1)


class HumanoidTaskEnv:
    """Base: subclasses override task_obs_dim and the _task_* hooks."""

    task_obs_dim: int = 0
    reward_raw_dim: int = 1

    def __init__(self, model: Model, motion: MotionData, config: TaskConfig | None = None):
        self.model = model
        self.motion = motion
        self.config = config or TaskConfig()
        from pulse_tpu.assets import load_smpl_humanoid

        self._names = load_smpl_humanoid().skeleton.node_names
        self.key_body_ids = np.asarray(
            [self._names.index(n) for n in self.config.key_bodies], np.int32
        )
        self.non_contact_body_ids = np.asarray(
            [
                i
                for i, n in enumerate(self._names)
                if n not in self.config.contact_bodies
            ],
            np.int32,
        )
        J = model.num_bodies
        self.self_obs_dim = (
            (1 if self.config.root_height_obs else 0) + (J - 1) * 3 + J * 6 + J * 3 + J * 3
        )
        self.obs_dim = self.self_obs_dim + self.task_obs_dim
        D = model.num_dof
        self.amp_obs_dim_single = (
            (1 if self.config.root_height_obs else 0)
            + 6 + 3 + 3 + 2 * D + D + 3 * len(self.key_body_ids)
        )
        self.amp_obs_dim = self.config.num_amp_obs_steps * self.amp_obs_dim_single
        self.action_dim = D

    def _ctor_kwargs(self) -> dict:
        """Extra ctor kwargs beyond (model, motion, config); subclasses with
        more args override so with_config rebuilds them faithfully."""
        return {}

    def with_config(self, config):
        """Rebuild this env with a different config, preserving subclass
        ctor args (used by run_eval's early-termination-off rebuild)."""
        return type(self)(self.model, self.motion, config, **self._ctor_kwargs())

    # ---- task hooks (override) --------------------------------------- #

    def _reset_task(self, key: jax.Array, physics) -> Any:
        return jnp.zeros(0)

    def _update_task(self, state: TaskEnvState) -> Any:
        return state.task

    def _task_obs(self, state: TaskEnvState) -> jax.Array:
        return jnp.zeros(0)

    def _task_reward(self, prev_state: TaskEnvState, state: TaskEnvState) -> tuple:
        r = jnp.zeros(())
        return r, r[None]

    # ---- shared machinery -------------------------------------------- #

    def _self_obs(self, physics) -> jax.Array:
        return kernels.compute_humanoid_self_obs_max(
            physics.body_pos[None],
            physics.body_rot[None],
            physics.body_vel[None],
            physics.body_ang_vel[None],
            local_root_obs=self.config.local_root_obs,
            root_height_obs=self.config.root_height_obs,
        )[0]

    def _observe(self, state: TaskEnvState) -> jax.Array:
        return jnp.concatenate([self._self_obs(state.physics), self._task_obs(state)])

    def _amp_obs(self, physics) -> jax.Array:
        return kernels.build_amp_observations_smpl(
            physics.root_pos[None],
            physics.root_rot[None],
            physics.body_vel[None, 0],
            physics.body_ang_vel[None, 0],
            dof_pos_from_state(physics)[None],
            dof_vel_from_state(physics)[None],
            physics.body_pos[None, self.key_body_ids],
            local_root_obs=self.config.local_root_obs,
            root_height_obs=self.config.root_height_obs,
        )[0]

    def reset_one(self, key: jax.Array, sampling_prob=None) -> TaskEnvState:
        k_motion, k_time, k_task, k_next = jax.random.split(key, 4)
        motion_id = sample_motions(k_motion, self.motion, 1, prob=sampling_prob)[0]
        if self.config.state_init == "Start":
            t0 = jnp.zeros(())
        else:
            t0 = sample_time(k_time, self.motion, motion_id[None])[0]
        ref = {k: v[0] for k, v in get_motion_state(
            self.motion, motion_id[None], t0[None]
        ).items()}
        physics = state_from_kinematics(
            self.model,
            ref["root_pos"], ref["root_rot"], ref["dof_pos"],
            ref["root_vel"], ref["root_ang_vel"], ref["dof_vel"],
        )
        task = self._reset_task(k_task, physics)
        state = TaskEnvState(
            physics=physics,
            key=k_next,
            progress=jnp.zeros((), jnp.int32),
            task=task,
            obs=jnp.zeros(self.obs_dim),
            reward=jnp.zeros(()),
            reward_raw=jnp.zeros(self.reward_raw_dim),
            done=jnp.zeros((), bool),
            terminate=jnp.zeros((), bool),
            amp_hist=self._init_amp_hist(motion_id, t0),
        )
        return state.replace(obs=self._observe(state))

    def _init_amp_hist(self, motion_id, start_time) -> jax.Array:
        S = self.config.num_amp_obs_steps
        dt = self.model.config.control_dt
        times = jnp.maximum(start_time - jnp.arange(S, dtype=jnp.float32) * dt, 0.0)
        ids = jnp.broadcast_to(motion_id, (S,))
        st = get_motion_state(self.motion, ids, times)
        return self.amp_obs_from_motion_state(st)

    def amp_obs_from_motion_state(self, st: dict, shape_obs=None) -> jax.Array:
        """Disc obs rows [n, A] from a get_motion_state dict (the demo
        fetch path of learning/amp.py; task envs use v1 disc obs)."""
        return kernels.build_amp_observations_smpl(
            st["root_pos"],
            st["root_rot"],
            st["root_vel"],
            st["root_ang_vel"],
            st["dof_pos"],
            st["dof_vel"],
            st["rg_pos"][:, self.key_body_ids],
            local_root_obs=self.config.local_root_obs,
            root_height_obs=self.config.root_height_obs,
        )

    def action_to_pd_target(self, action: jax.Array) -> jax.Array:
        return self.model.pd_action_offset + self.model.pd_action_scale * action

    def step_one(
        self, state: TaskEnvState, action: jax.Array, sampling_prob=None
    ) -> TaskEnvState:
        cfg = self.config
        prev_state = state
        pd_target = self.action_to_pd_target(action)
        physics = physics_step(self.model, state.physics, pd_target)
        progress = state.progress + 1
        state = state.replace(physics=physics, progress=progress)
        state = state.replace(task=self._update_task(state))

        reward, reward_raw = self._task_reward(prev_state, state)
        if cfg.power_reward:
            dof = dof_pos_from_state(physics)
            dof_vel = dof_vel_from_state(physics)
            kp = jnp.repeat(self.model.joint_kp, 3)
            kd = jnp.repeat(self.model.joint_kd, 3)
            tau = kp * (pd_target - dof) - kd * dof_vel
            reward = reward + kernels.compute_power_penalty(
                tau[None], dof_vel[None], cfg.power_coefficient
            )[0]

        body_pos_term = physics.body_pos
        if self.model.has_terrain:
            # measure fall heights relative to the local ground
            from pulse_tpu.env.terrain import terrain_height

            gz = terrain_height(
                self.model.terrain_heights,
                self.model.terrain_cell,
                self.model.terrain_origin,
                physics.body_pos[:, 0:2],
            )
            body_pos_term = physics.body_pos.at[:, 2].add(-gz)
        reset, terminate = kernels.compute_humanoid_reset(
            progress[None],
            physics.contact_force[None],
            body_pos_term[None],
            self.non_contact_body_ids,
            cfg.termination_height,
            cfg.episode_length,
            cfg.enable_early_termination,
        )
        reset, terminate = reset[0], terminate[0]

        stepped = state.replace(
            reward=reward, reward_raw=reward_raw, done=reset, terminate=terminate
        )
        amp_hist = jnp.roll(state.amp_hist, 1, axis=0).at[0].set(self._amp_obs(physics))
        stepped = stepped.replace(obs=self._observe(stepped), amp_hist=amp_hist)

        k_reset, k_keep = jax.random.split(state.key)
        fresh = self.reset_one(k_reset, sampling_prob)
        nxt = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(reset, (1,) * a.ndim) if a.ndim else reset, a, b
            ),
            fresh,
            stepped.replace(key=k_keep),
        )
        return nxt.replace(
            reward=reward, reward_raw=reward_raw, done=reset, terminate=terminate
        )

    def reset(self, keys: jax.Array) -> TaskEnvState:
        return jax.vmap(self.reset_one)(keys)

    def step(
        self, states: TaskEnvState, actions: jax.Array, sampling_prob=None
    ) -> TaskEnvState:
        return jax.vmap(
            lambda s, a: self.step_one(s, a, sampling_prob)
        )(states, actions)


# --------------------------------------------------------------------------- #
# Speed (≙ humanoid_speed.py:23; obs :311-325, reward :328-344)
# --------------------------------------------------------------------------- #

class HumanoidSpeedEnv(HumanoidTaskEnv):
    """Run along +x at a commanded speed."""

    task_obs_dim = 3
    reward_raw_dim = 1

    def _sample_speed(self, key):
        cfg = self.config
        k1, k2 = jax.random.split(key)
        speed = jax.random.uniform(
            k1, (), minval=cfg.tar_speed_min, maxval=cfg.tar_speed_max
        )
        change = jax.random.randint(
            k2, (), cfg.speed_change_steps_min, cfg.speed_change_steps_max
        )
        return speed, change

    def _reset_task(self, key, physics):
        speed, change = self._sample_speed(key)
        return {
            "tar_speed": speed,
            "change_step": change,
            "key": jax.random.fold_in(key, 1),
        }

    def _update_task(self, state):
        task = state.task
        k1, k2 = jax.random.split(task["key"])
        speed, change = self._sample_speed(k1)
        switch = state.progress >= task["change_step"]
        return {
            "tar_speed": jnp.where(switch, speed, task["tar_speed"]),
            "change_step": jnp.where(
                switch, state.progress + change, task["change_step"]
            ),
            "key": k2,
        }

    def _task_obs(self, state):
        # local +x target dir + speed (compute_speed_observations, :311-325)
        heading_inv = q.calc_heading_quat_inv(state.physics.root_rot)
        tar_dir = q.quat_rotate(heading_inv, jnp.asarray([1.0, 0.0, 0.0]))
        return jnp.concatenate([tar_dir[0:2], state.task["tar_speed"][None]])

    def _task_reward(self, prev_state, state):
        # compute_speed_reward (:328-344) on finite-difference root velocity
        dt = self.model.config.control_dt
        root_vel = (state.physics.root_pos - prev_state.physics.root_pos) / dt
        tar_speed = prev_state.task["tar_speed"]
        tar_err = tar_speed - root_vel[0]
        tangent_err = root_vel[1]
        r = jnp.exp(-0.25 * (tar_err**2 + 0.1 * tangent_err**2))
        return r, r[None]


# --------------------------------------------------------------------------- #
# Reach (≙ humanoid_reach.py:19; obs compute_location_observations, reward :239)
# --------------------------------------------------------------------------- #

class HumanoidReachEnv(HumanoidTaskEnv):
    """Touch a 3D point with a designated body (default R_Hand)."""

    task_obs_dim = 3
    reward_raw_dim = 1

    def __init__(self, model, motion, config=None):
        super().__init__(model, motion, config)
        self.reach_body_id = self._names.index(self.config.reach_body)

    def _sample_target(self, key, root_pos):
        cfg = self.config
        k1, k2, k3, k4 = jax.random.split(key, 4)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        r = jax.random.uniform(k2, (), minval=0.0, maxval=cfg.tar_reach_dist_max)
        h = jax.random.uniform(
            k3, (), minval=cfg.tar_reach_height_min, maxval=cfg.tar_reach_height_max
        )
        tar = jnp.stack(
            [root_pos[0] + r * jnp.cos(theta), root_pos[1] + r * jnp.sin(theta), h]
        )
        change = jax.random.randint(
            k4, (), cfg.reach_change_steps_min, cfg.reach_change_steps_max
        )
        return tar, change

    def _reset_task(self, key, physics):
        tar, change = self._sample_target(key, physics.root_pos)
        return {
            "tar_pos": tar,
            "change_step": change,
            "key": jax.random.fold_in(key, 1),
        }

    def _update_task(self, state):
        task = state.task
        k1, k2 = jax.random.split(task["key"])
        tar, change = self._sample_target(k1, state.physics.root_pos)
        switch = state.progress >= task["change_step"]
        return {
            "tar_pos": jnp.where(switch, tar, task["tar_pos"]),
            "change_step": jnp.where(
                switch, state.progress + change, task["change_step"]
            ),
            "key": k2,
        }

    def _task_obs(self, state):
        heading_inv = q.calc_heading_quat_inv(state.physics.root_rot)
        local_tar = q.quat_rotate(
            heading_inv, state.task["tar_pos"] - state.physics.root_pos
        )
        return local_tar

    def _task_reward(self, prev_state, state):
        pos = state.physics.body_pos[self.reach_body_id]
        err = jnp.sum((state.task["tar_pos"] - pos) ** 2)
        r = jnp.exp(-4.0 * err)
        return r, r[None]


# --------------------------------------------------------------------------- #
# Trajectory following (≙ humanoid_traj.py:21 + util/traj_generator.py:36-208)
# --------------------------------------------------------------------------- #

class HumanoidTrajEnv(HumanoidTaskEnv):
    """Follow a procedurally generated 2D waypoint trajectory.

    The TrajGenerator's random segment headings/speeds with sharp-turn
    probability (traj_generator.py:36-208) become per-env device arrays;
    position queries are piecewise-linear interpolation (calc_pos:158)."""

    reward_raw_dim = 1

    def __init__(self, model, motion, config=None):
        super().__init__(model, motion, config)
        self.task_obs_dim = 2 * self.config.traj_num_samples
        self.obs_dim = self.self_obs_dim + self.task_obs_dim

    def _gen_traj(self, key, start_xy):
        cfg = self.config
        S = cfg.num_traj_segments
        k1, k2, k3 = jax.random.split(key, 3)
        # random walk headings with occasional sharp turns
        d_theta = jax.random.uniform(k1, (S,), minval=-1.0, maxval=1.0) * 0.7
        sharp = jax.random.uniform(k2, (S,)) < cfg.traj_sharp_turn_prob
        d_theta = jnp.where(
            sharp, jax.random.uniform(k3, (S,), minval=-jnp.pi, maxval=jnp.pi), d_theta
        )
        theta = jnp.cumsum(d_theta)
        speeds = jax.random.uniform(
            jax.random.fold_in(key, 7), (S,),
            minval=cfg.traj_speed_min, maxval=cfg.traj_speed_max,
        )
        seg_len = speeds * cfg.traj_segment_duration
        deltas = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1) * seg_len[:, None]
        verts = jnp.concatenate(
            [start_xy[None], start_xy[None] + jnp.cumsum(deltas, axis=0)], axis=0
        )  # [S+1, 2]
        return verts

    def _traj_pos(self, verts, t):
        """Piecewise-linear position at time(s) t."""
        cfg = self.config
        seg = jnp.clip(t / cfg.traj_segment_duration, 0.0, cfg.num_traj_segments - 1e-4)
        i0 = seg.astype(jnp.int32)
        frac = seg - i0
        return verts[i0] * (1 - frac[..., None]) + verts[i0 + 1] * frac[..., None]

    def _reset_task(self, key, physics):
        verts = self._gen_traj(key, physics.root_pos[0:2])
        return {"verts": verts}

    def _task_obs(self, state):
        cfg = self.config
        t = state.progress.astype(jnp.float32) * self.model.config.control_dt
        times = t + jnp.arange(cfg.traj_num_samples) * cfg.traj_sample_timestep
        tar = self._traj_pos(state.task["verts"], times)          # [N, 2]
        root_pos = state.physics.root_pos
        heading_inv = q.calc_heading_quat_inv(state.physics.root_rot)
        tar3 = jnp.concatenate([tar, jnp.zeros_like(tar[:, :1])], axis=-1)
        local = q.quat_rotate(
            heading_inv[None], tar3 - root_pos[None, :].at[:, 2].set(0.0)
        )
        return local[:, 0:2].reshape(-1)

    def _task_reward(self, prev_state, state):
        t = state.progress.astype(jnp.float32) * self.model.config.control_dt
        tar = self._traj_pos(state.task["verts"], t)
        diff = tar - state.physics.root_pos[0:2]
        r = jnp.exp(-2.0 * jnp.sum(diff * diff))
        return r, r[None]
