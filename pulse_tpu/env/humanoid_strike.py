"""Strike task: knock over a target box.

≙ phc/env/tasks/humanoid_strike.py:17-375 (HumanoidStrike/Z): a free box
target spawns near the humanoid; the policy is rewarded for approaching it
(velocity-toward-target term) and tipping it over (target-up-axis term,
compute_strike_reward:296-328), with full reward once the target has tipped
past the success angle. Strike obs = target pos/rot/vel/angvel in the
heading-local frame (compute_strike_observations:270-293).

The target is a pulse_tpu.physics.prop free rigid body with two-way contact
(physics_step_with_prop), replacing Isaac Gym's second actor.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.env.humanoid_task import HumanoidTaskEnv, TaskConfig, TaskEnvState
from pulse_tpu.ops import quat as q
from pulse_tpu.physics.prop import PropSpec, PropState, make_prop_state
from pulse_tpu.physics.step import physics_step_with_prop


class HumanoidStrikeEnv(HumanoidTaskEnv):
    """Knock over a target box with a designated strike body (R_Hand)."""

    task_obs_dim = 15   # 3 pos + 6 rot + 3 vel + 3 ang vel
    reward_raw_dim = 2

    def __init__(self, model, motion, config: TaskConfig | None = None,
                 prop_spec: PropSpec | None = None,
                 strike_bodies=("R_Hand", "L_Hand", "R_Wrist", "L_Wrist",
                                "R_Elbow", "L_Elbow")):
        super().__init__(model, motion, config)
        self.prop_spec = prop_spec or PropSpec()
        self.strike_bodies = tuple(strike_bodies)
        self.strike_body_ids = np.asarray(
            [self._names.index(n) for n in strike_bodies], np.int32
        )

    def _ctor_kwargs(self) -> dict:
        return {"prop_spec": self.prop_spec,
                "strike_bodies": self.strike_bodies}

    # ------------------------------------------------------------------ #

    def _reset_task(self, key, physics):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        dist = jax.random.uniform(k2, (), minval=1.2, maxval=2.5)
        heading = q.calc_heading(physics.root_rot)
        ang = heading + theta * 0.35   # mostly in front
        pos = physics.root_pos[0:2] + dist * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        prop = make_prop_state(
            jnp.concatenate([pos, jnp.asarray([self.prop_spec.half_extents[2]])])
        )
        return {
            "prop": prop,
            "prop_contact": jnp.zeros(3),
            "prev_root_pos": physics.root_pos,
        }

    def _update_task(self, state):
        return state.task  # prop advances inside step_one

    def _task_obs(self, state):
        ph = state.physics
        prop: PropState = state.task["prop"]
        heading_inv = q.calc_heading_quat_inv(ph.root_rot)
        local_pos = prop.pos - ph.root_pos
        local_pos = local_pos.at[2].set(prop.pos[2])  # keep absolute height
        local_pos = q.quat_rotate(heading_inv, local_pos)
        local_rot = q.quat_to_tan_norm(q.quat_mul(heading_inv, prop.rot))
        local_vel = q.quat_rotate(heading_inv, prop.lin_vel)
        local_ang_vel = q.quat_rotate(heading_inv, prop.ang_vel)
        return jnp.concatenate([local_pos, local_rot, local_vel, local_ang_vel])

    def _task_reward(self, prev_state, state):
        """compute_strike_reward semantics (humanoid_strike.py:296-328)."""
        prop: PropState = state.task["prop"]
        dt = self.model.config.control_dt

        up = jnp.asarray([0.0, 0.0, 1.0])
        tar_up = q.quat_rotate(prop.rot, up)
        tar_rot_err = jnp.dot(up, tar_up)
        tar_rot_r = jnp.maximum(1.0 - tar_rot_err, 0.0)

        root_pos = state.physics.root_pos
        prev_root_pos = prev_state.physics.root_pos
        tar_dir = prop.pos[0:2] - root_pos[0:2]
        tar_dir = tar_dir / jnp.maximum(jnp.linalg.norm(tar_dir), 1e-6)
        root_vel = (root_pos - prev_root_pos) / dt
        tar_dir_speed = jnp.dot(tar_dir, root_vel[0:2])
        vel_err = jnp.maximum(1.0 - tar_dir_speed, 0.0)
        vel_r = jnp.where(
            tar_dir_speed <= 0, 0.0, jnp.exp(-4.0 * vel_err * vel_err)
        )

        reward = 0.6 * tar_rot_r + 0.4 * vel_r
        succ = tar_rot_err < 0.2
        reward = jnp.where(succ, 1.0, reward)
        return reward, jnp.stack([tar_rot_r, vel_r])

    # ------------------------------------------------------------------ #

    def step_one(
        self, state: TaskEnvState, action: jax.Array, sampling_prob=None
    ) -> TaskEnvState:
        pd_target = self.action_to_pd_target(action)
        physics, prop, prop_contact = physics_step_with_prop(
            self.model, self.prop_spec, state.physics, state.task["prop"], pd_target
        )
        state = state.replace(
            physics=physics,
            task={
                "prop": prop,
                "prop_contact": prop_contact,
                "prev_root_pos": state.task["prev_root_pos"],
            },
        )
        # reuse the base bookkeeping minus the physics step: inline it
        cfg = self.config
        progress = state.progress + 1
        state = state.replace(progress=progress)
        # prev root pos for the approach-velocity term is tracked in the task
        pseudo_prev = state.replace(
            physics=state.physics.replace(root_pos=state.task["prev_root_pos"])
        )
        reward, reward_raw = self._task_reward(pseudo_prev, state)

        from pulse_tpu.env import kernels

        reset, terminate = kernels.compute_humanoid_reset(
            progress[None],
            physics.contact_force[None],
            physics.body_pos[None],
            self.non_contact_body_ids,
            cfg.termination_height,
            cfg.episode_length,
            cfg.enable_early_termination,
        )
        reset, terminate = reset[0], terminate[0]

        stepped = state.replace(
            reward=reward, reward_raw=reward_raw, done=reset, terminate=terminate,
            task={**state.task, "prev_root_pos": physics.root_pos},
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
