"""Pure-AMP getup env: style-reward locomotion with fall recovery.

≙ phc/env/tasks/humanoid_amp_getup.py:41-210 (HumanoidAMPGetup): the
HumanoidAMP base env (NO imitation task observation — the policy sees only
its self obs; learning pressure comes entirely from the discriminator's
style reward) plus the fall-state reset curriculum and recovery-step
termination grace. The reference's task reward here is the constant 1
(compute_humanoid_reward, humanoid.py:1567-1570); the AMP agent's reward
mix supplies the style term.

Reuses HumanoidImGetupEnv's fall-state generation/reset machinery; only the
observation surface, the reward, and the termination rule change:
termination is the generic contact-based fall check
(compute_humanoid_reset, humanoid.py:1572-1608) instead of the
imitation-distance rule.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.env import kernels
from pulse_tpu.env.humanoid_im import EnvState
from pulse_tpu.env.humanoid_im_getup import GetupConfig, HumanoidImGetupEnv


class HumanoidAMPGetupEnv(HumanoidImGetupEnv):
    def __init__(self, model, motion, config: GetupConfig | None = None,
                 termination_height: float = 0.15):
        super().__init__(model, motion, config)
        # no task obs: the policy observes only its own state
        self.task_obs_dim = 0
        self.obs_dim = self.self_obs_dim
        self.termination_height = float(termination_height)
        # bodies that must not touch the ground (everything but feet/toes)
        feet = {"L_Ankle", "R_Ankle", "L_Toe", "R_Toe"}
        self.non_contact_body_ids = np.asarray(
            [i for i, n in enumerate(self._names) if n not in feet], np.int32
        )

    def _ctor_kwargs(self) -> dict:
        return {"termination_height": self.termination_height}

    def _observe(self, state: EnvState, far=None) -> jax.Array:
        cfg = self.config
        if cfg.self_obs_v == 2:
            return state.self_obs_hist.reshape(-1)
        return self._self_obs_single(state)

    def _finish_step(self, state, physics, pd_target, model) -> EnvState:
        out = super()._finish_step(state, physics, pd_target, model)
        # constant task reward (humanoid.py:1567-1570); the AMP mix adds style
        return out.replace(
            reward=jnp.ones_like(out.reward),
            reward_raw=jnp.ones_like(out.reward_raw),
        )

    def _termination(self, state: EnvState, ref, pass_time):
        """Generic fall termination + recovery grace (≙ humanoid_amp_getup
        _compute_reset:164-178 over compute_humanoid_reset)."""
        cfg = self.config
        reset, fallen = kernels.compute_humanoid_reset(
            state.progress[None],
            state.physics.contact_force[None],
            state.physics.body_pos[None],
            jnp.asarray(self.non_contact_body_ids),
            self.termination_height,
            cfg.episode_length,
            enable_early_termination=cfg.enable_early_termination,
        )
        reset, terminate = reset[0], fallen[0]
        in_grace = state.progress < state.recovery_counter
        terminate = terminate & ~in_grace
        reset = pass_time | (state.progress >= cfg.episode_length - 1) | terminate
        return reset, terminate
