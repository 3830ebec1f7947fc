"""Projectile perturbations: robustness fault-injection during imitation.

≙ the reference's projectile system (humanoid.py:129-173, flags.add_proj):
small dense boxes are periodically launched at the humanoid to perturb it
during training/eval. Here a free prop (physics/prop.py) with full two-way
contact is relaunched every `proj_interval` control steps from a random
direction aimed at the torso with randomized speed. The projectile rides
alongside the env state as a separate pytree (it deliberately survives env
auto-resets — it simply gets relaunched on its own cadence).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pulse_tpu.env.humanoid_im import EnvConfig, EnvState, HumanoidImEnv
from pulse_tpu.physics.prop import PropSpec, PropState
from pulse_tpu.physics.step import physics_step_with_prop


@dataclasses.dataclass(frozen=True)
class PerturbConfig(EnvConfig):
    proj_interval: int = 60          # steps between launches
    proj_speed_min: float = 5.0
    proj_speed_max: float = 12.0
    proj_distance: float = 2.0       # launch distance from the pelvis
    proj_half_extents: tuple = (0.06, 0.06, 0.06)
    proj_density: float = 400.0


class HumanoidImPerturbEnv(HumanoidImEnv):
    """HumanoidIm + periodic projectiles.

    API: reset(keys) -> (EnvState, PropState); step((states, projs), actions)
    -> (EnvState, PropState)."""

    def __init__(self, model, motion, config: PerturbConfig | None = None):
        super().__init__(model, motion, config or PerturbConfig())
        cfg: PerturbConfig = self.config
        self.proj_spec = PropSpec(
            half_extents=cfg.proj_half_extents, density=cfg.proj_density,
            friction=0.5,
        )

    def _launch(self, key, root_pos) -> PropState:
        cfg: PerturbConfig = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        height = jax.random.uniform(k2, (), minval=0.6, maxval=1.6)
        speed = jax.random.uniform(
            k3, (), minval=cfg.proj_speed_min, maxval=cfg.proj_speed_max
        )
        pos = jnp.stack(
            [
                root_pos[0] + cfg.proj_distance * jnp.cos(theta),
                root_pos[1] + cfg.proj_distance * jnp.sin(theta),
                height,
            ]
        )
        target = root_pos.at[2].set(0.9)
        d = target - pos
        vel = d / jnp.maximum(jnp.linalg.norm(d), 1e-6) * speed
        return PropState(
            pos=pos,
            rot=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
            lin_vel=vel,
            ang_vel=jnp.zeros(3),
        )

    # ------------------------------------------------------------------ #

    def step_proj_one(
        self, state: EnvState, proj: PropState, action: jax.Array,
        sampling_prob=None,
    ) -> tuple[EnvState, PropState]:
        cfg: PerturbConfig = self.config
        model = self.model
        pd_target = self.action_to_pd_target(action, model)
        physics, proj, _ = physics_step_with_prop(
            model, self.proj_spec, state.physics, proj, pd_target
        )
        out = self._finish_step(state, physics, pd_target, model, sampling_prob)

        relaunch = (state.progress % cfg.proj_interval) == (cfg.proj_interval - 1)
        fresh = self._launch(jax.random.fold_in(state.key, 33), physics.root_pos)
        proj = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(relaunch, (1,) * a.ndim) if a.ndim else relaunch, a, b
            ),
            fresh,
            proj,
        )
        return out, proj

    def reset(self, keys: jax.Array):
        states = jax.vmap(self.reset_one)(keys)
        projs = jax.vmap(self._launch)(
            jax.vmap(lambda k: jax.random.fold_in(k, 31))(keys),
            states.physics.root_pos,
        )
        return states, projs

    def step(self, carry, actions, sampling_prob=None):
        states, projs = carry
        return jax.vmap(
            lambda s, p, a: self.step_proj_one(s, p, a, sampling_prob)
        )(states, projs, actions)
