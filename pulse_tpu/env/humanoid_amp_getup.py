"""Pure-AMP envs: style-reward locomotion, with and without fall recovery.

≙ phc/env/tasks/humanoid_amp.py (HumanoidAMP, the plain AMP env) and
phc/env/tasks/humanoid_amp_getup.py:41-210 (HumanoidAMPGetup): the
HumanoidAMP base env (NO imitation task observation — the policy sees only
its self obs; learning pressure comes entirely from the discriminator's
style reward), and for the getup variant the fall-state reset curriculum
plus recovery-step termination grace. The reference's task reward here is
the constant 1 (compute_humanoid_reward, humanoid.py:1567-1570); the AMP
agent's reward mix supplies the style term.

Reuses HumanoidImGetupEnv's fall-state generation/reset machinery for the
getup variant; only the observation surface, the reward, and the
termination rule change: termination is the generic contact-based fall
check (compute_humanoid_reset, humanoid.py:1572-1608) instead of the
imitation-distance rule.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.env import kernels
from pulse_tpu.env.humanoid_im import EnvState, HumanoidImEnv
from pulse_tpu.env.humanoid_im_getup import GetupConfig, HumanoidImGetupEnv


class _AMPSurfaceMixin:
    """Shared AMP observation / reward / fall-check surface.

    ≙ HumanoidAMP's obs+reward overrides (humanoid_amp.py) layered over the
    Humanoid fall termination (compute_humanoid_reset, humanoid.py:1572-1608).
    """

    def _init_amp_surface(self, termination_height: float) -> None:
        # no task obs: the policy observes only its own state
        self.task_obs_dim = 0
        self.obs_dim = self.self_obs_dim
        self.termination_height = float(termination_height)
        # bodies that must not touch the ground (everything but feet/toes)
        feet = {"L_Ankle", "R_Ankle", "L_Toe", "R_Toe"}
        self.non_contact_body_ids = np.asarray(
            [i for i, n in enumerate(self._names) if n not in feet], np.int32
        )

    def _observe(self, state: EnvState, far=None) -> jax.Array:
        cfg = self.config
        if cfg.self_obs_v == 2:
            return state.self_obs_hist.reshape(-1)
        return self._self_obs_single(state)

    def _finish_step(self, state, physics, pd_target, model, sampling_prob=None) -> EnvState:
        out = super()._finish_step(state, physics, pd_target, model, sampling_prob)
        # constant task reward (humanoid.py:1567-1570); the AMP mix adds style
        return out.replace(
            reward=jnp.ones_like(out.reward),
            reward_raw=jnp.ones_like(out.reward_raw),
        )

    def _fall_check(self, state: EnvState):
        """Generic contact-based fall termination (compute_humanoid_reset)."""
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
        return reset[0], fallen[0]


class HumanoidAMPEnv(_AMPSurfaceMixin, HumanoidImEnv):
    """Plain AMP env: style reward only, motion-sampled RSI resets, no
    getup curriculum (≙ HumanoidAMP, humanoid_amp.py)."""

    def __init__(self, model, motion, config=None,
                 termination_height: float = 0.15):
        super().__init__(model, motion, config)
        self._init_amp_surface(termination_height)

    def _ctor_kwargs(self) -> dict:
        return {"termination_height": self.termination_height}

    def _termination(self, state: EnvState, ref, pass_time):
        _, terminate = self._fall_check(state)
        reset = (
            pass_time
            | (state.progress >= self.config.episode_length - 1)
            | terminate
        )
        return reset, terminate


class HumanoidAMPGetupEnv(_AMPSurfaceMixin, HumanoidImGetupEnv):
    """AMP + fall-state resets + recovery grace (≙ HumanoidAMPGetup)."""

    def __init__(self, model, motion, config: GetupConfig | None = None,
                 termination_height: float = 0.15):
        super().__init__(model, motion, config)
        self._init_amp_surface(termination_height)

    def _ctor_kwargs(self) -> dict:
        return {"termination_height": self.termination_height}

    def _termination(self, state: EnvState, ref, pass_time):
        """Fall termination + recovery grace (≙ humanoid_amp_getup
        _compute_reset:164-178 over compute_humanoid_reset)."""
        cfg = self.config
        _, terminate = self._fall_check(state)
        in_grace = state.progress < state.recovery_counter
        terminate = terminate & ~in_grace
        reset = pass_time | (state.progress >= cfg.episode_length - 1) | terminate
        return reset, terminate
