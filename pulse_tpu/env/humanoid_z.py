"""Latent-action wrapper: downstream policies act in PULSE z space.

≙ phc/env/tasks/humanoid_z.py:22-177 (HumanoidZ mixin): the task policy
outputs a 32-dim latent; the env shifts it by the frozen prior's mean on the
current self obs (compute_z_actions, humanoid_z.py:100-104), decodes with
the frozen PULSE decoder to motor actions, and steps the underlying task
env. Self obs are normalized with the frozen running stats captured at
distillation time (humanoid_z.py:87).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.learning.networks import PulseVAE
from pulse_tpu.learning.running_norm import RunningMeanStd


@struct.dataclass
class FrozenZModel:
    """Frozen decoder+prior weights and input stats from a PULSE checkpoint."""

    params: Any                  # full PulseVAE params (only prior/decoder used)
    obs_rms: RunningMeanStd      # stats over the FULL distill obs
    use_vae_prior: bool = struct.field(pytree_node=False, default=True)


class ZActionWrapper:
    """Wraps a task env so actions are latents (action_dim = latent_dim)."""

    def __init__(self, env, network: PulseVAE, frozen: FrozenZModel):
        self.env = env
        self.network = network
        self.frozen = frozen
        self.action_dim = network.latent_dim
        # pass-through surface
        self.obs_dim = env.obs_dim
        self.amp_obs_dim = env.amp_obs_dim
        self.self_obs_dim = env.self_obs_dim
        self.motion = env.motion
        self.model = env.model
        self.config = env.config
        self.key_body_ids = env.key_body_ids

    def decode_z(self, self_obs_raw: jax.Array, action_z: jax.Array) -> jax.Array:
        """z -> motor action (compute_z_actions, humanoid_z.py:81-155)."""
        # normalize with frozen stats (slice the self-obs part of the rms)
        mean = self.frozen.obs_rms.mean[: self.network.self_obs_dim]
        var = self.frozen.obs_rms.var[: self.network.self_obs_dim]
        self_obs = jnp.clip(
            (self_obs_raw - mean) / jnp.sqrt(var + 1e-5), -5.0, 5.0
        )
        if self.frozen.use_vae_prior:
            prior_mu, _ = self.network.apply(
                {"params": self.frozen.params}, self_obs, method=PulseVAE.prior_params
            )
            action_z = prior_mu + action_z
        return self.network.apply(
            {"params": self.frozen.params}, self_obs, action_z,
            method=PulseVAE.decode,
        )

    def reset(self, keys: jax.Array):
        return self.env.reset(keys)

    def __getattr__(self, name):
        # proxy the rest of the env surface (reset_to, reset_to_one, ...) so
        # a Z-wrapped imitation env reaches the im_eval motion sweep instead
        # of silently falling back to episode-return eval
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.env, name)

    def with_config(self, config):
        """Rebuild the wrapped env with a new config, keeping the wrapper."""
        return ZActionWrapper(
            self.env.with_config(config), self.network, self.frozen
        )

    def step(self, states, action_z: jax.Array, sampling_prob=None):
        self_obs_raw = states.obs[..., : self.network.self_obs_dim]
        motor_action = self.decode_z(self_obs_raw, action_z)
        return self.env.step(
            states, jnp.clip(motor_action, -1.0, 1.0), sampling_prob
        )
