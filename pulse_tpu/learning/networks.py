"""Policy / value / discriminator / PULSE-VAE networks in flax.linen.

Re-designs the reference's rl-games network builders:
  - ActorCritic   ≙ A2CBuilder.Network + AMPBuilder (network_builder.py:126,
                    amp_network_builder.py:11): separate actor/critic MLPs,
                    fixed log-sigma head (const -2.9, im_z_fit.yaml:20-23)
  - Discriminator ≙ AMPBuilder._build_disc (amp_network_builder.py:230-249)
  - PulseVAE      ≙ AMPZBuilder (amp_network_z_builder.py:14-598): encoder
                    z_mlp on [self+task obs] -> (mu, logvar), prior MLP on
                    self obs -> (mu, logvar), decoder MLP on [self obs, z].

All MLPs are plain Dense+SiLU stacks — ideal MXU work at batch 3072+; keep
them batched and let XLA fuse activations into the matmuls.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


_ACT = {
    "relu": nn.relu,
    "silu": nn.silu,
    "elu": nn.elu,
    "tanh": jnp.tanh,
    "gelu": nn.gelu,
}


class MLP(nn.Module):
    units: Sequence[int]
    activation: str = "silu"
    dtype: object = None          # compute dtype (bf16 on TPU); params stay f32

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for u in self.units:
            x = act(nn.Dense(u, dtype=self.dtype)(x))
        return x


class ActorCritic(nn.Module):
    """Separate actor/critic towers; gaussian policy with fixed sigma."""

    action_dim: int
    actor_units: Sequence[int] = (2048, 1536, 1024)
    critic_units: Sequence[int] = (2048, 1536, 1024)
    activation: str = "silu"
    init_sigma: float = -2.9
    learn_sigma: bool = False
    # bf16 compute (f32 params/outputs): MXU runs 2x faster; heads stay f32
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        mu = nn.Dense(self.action_dim, kernel_init=nn.initializers.variance_scaling(
            0.01, "fan_in", "truncated_normal"))(
            MLP(self.actor_units, self.activation, dtype=self.dtype)(obs).astype(jnp.float32)
        )
        value = nn.Dense(1)(
            MLP(self.critic_units, self.activation, dtype=self.dtype)(obs).astype(jnp.float32)
        )[..., 0]
        if self.learn_sigma:
            log_sigma = self.param(
                "log_sigma", nn.initializers.constant(self.init_sigma), (self.action_dim,)
            )
        else:
            log_sigma = jnp.full((self.action_dim,), self.init_sigma)
        return mu, log_sigma, value


class Discriminator(nn.Module):
    """AMP discriminator: MLP -> single logit."""

    units: Sequence[int] = (1024, 512)
    activation: str = "relu"

    @nn.compact
    def __call__(self, amp_obs):
        h = MLP(self.units, self.activation)(amp_obs)
        # symmetric uniform init on the logit layer (≙ torch's
        # uniform_(-1, 1) DISC_LOGIT_INIT_SCALE; flax's `uniform` is
        # positive-only and would bias the disc to "demo" everywhere)
        return nn.Dense(
            1,
            kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_in", "uniform"
            ),
        )(h)[..., 0]


class Encoder(nn.Module):
    """PULSE posterior encoder: [self_obs, task_obs] -> (z_mu, z_logvar)."""

    latent_dim: int = 32
    units: Sequence[int] = (2048, 1536, 1024)
    activation: str = "silu"

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.units, self.activation)(obs)
        z_mu = nn.Dense(self.latent_dim, name="z_mu")(h)
        z_logvar = nn.Dense(self.latent_dim, name="z_logvar")(h)
        return z_mu, z_logvar


class Prior(nn.Module):
    """PULSE learned prior on self obs -> (mu, logvar), with the logvar
    clamp of the clamped-prior variant (use_vae_clamped_prior,
    env_im_vae.yaml:26-27)."""

    latent_dim: int = 32
    units: Sequence[int] = (1024, 512)
    activation: str = "silu"
    logvar_clamp_max: float = 2.0

    @nn.compact
    def __call__(self, self_obs):
        h = MLP(self.units, self.activation)(self_obs)
        mu = nn.Dense(self.latent_dim, name="prior_mu")(h)
        logvar = jnp.clip(
            nn.Dense(self.latent_dim, name="prior_logvar")(h),
            -8.0,
            self.logvar_clamp_max,
        )
        return mu, logvar


class Decoder(nn.Module):
    """PULSE decoder: [self_obs, z] -> motor action (exp-map PD targets)."""

    action_dim: int
    units: Sequence[int] = (1024, 1024, 512)
    activation: str = "silu"

    @nn.compact
    def __call__(self, self_obs, z):
        h = MLP(self.units, self.activation)(jnp.concatenate([self_obs, z], axis=-1))
        return nn.Dense(self.action_dim)(h)


class PulseVAE(nn.Module):
    """Full PULSE network (≙ AMPZBuilder z_type='vae' + use_vae_prior):
    action mu = decoder(self_obs, prior_mu + eps*sigma_post shifted
    posterior sample); critic runs on the full obs separately."""

    action_dim: int
    latent_dim: int = 32
    self_obs_dim: int = 358
    encoder_units: Sequence[int] = (2048, 1536, 1024)
    prior_units: Sequence[int] = (1024, 512)
    decoder_units: Sequence[int] = (1024, 1024, 512)
    critic_units: Sequence[int] = (2048, 1536, 1024)
    activation: str = "silu"
    init_sigma: float = -2.9

    def setup(self):
        self.encoder = Encoder(self.latent_dim, self.encoder_units, self.activation)
        self.prior = Prior(self.latent_dim, self.prior_units, self.activation)
        self.decoder = Decoder(self.action_dim, self.decoder_units, self.activation)
        self.critic = MLP(self.critic_units, self.activation)
        self.critic_head = nn.Dense(1)

    def __call__(self, obs, z_noise):
        """Full pass: returns action mu, posterior/prior params, value."""
        self_obs = obs[..., : self.self_obs_dim]
        post_mu, post_logvar = self.encoder(obs)
        prior_mu, prior_logvar = self.prior(self_obs)
        z = post_mu + jnp.exp(0.5 * post_logvar) * z_noise
        # vae-prior shift: decode around the prior mean (humanoid_z.py:100-104)
        action = self.decoder(self_obs, prior_mu + z)
        value = self.critic_head(self.critic(obs))[..., 0]
        return {
            "action_mu": action,
            "post_mu": post_mu,
            "post_logvar": post_logvar,
            "prior_mu": prior_mu,
            "prior_logvar": prior_logvar,
            "value": value,
        }

    def encode(self, obs):
        return self.encoder(obs)

    def decode(self, self_obs, z):
        return self.decoder(self_obs, z)

    def prior_params(self, self_obs):
        return self.prior(self_obs)

    def value(self, obs):
        return self.critic_head(self.critic(obs))[..., 0]


class SeptActorCritic(nn.Module):
    """Separate self-obs / task-obs encoder towers merged before the heads.

    ≙ phc/learning/amp_network_sept_builder.py:19-165 (AMPSeptBuilder): the
    self observation and the task observation pass through their own MLPs
    whose features concatenate into the actor trunk; the critic runs on the
    full observation."""

    action_dim: int
    self_obs_dim: int
    self_units: Sequence[int] = (1024, 512)
    task_units: Sequence[int] = (1024, 512)
    actor_units: Sequence[int] = (1024, 512)
    critic_units: Sequence[int] = (2048, 1024)
    activation: str = "silu"
    init_sigma: float = -2.9

    @nn.compact
    def __call__(self, obs):
        self_obs = obs[..., : self.self_obs_dim]
        task_obs = obs[..., self.self_obs_dim :]
        h_self = MLP(self.self_units, self.activation, name="self_enc")(self_obs)
        h_task = MLP(self.task_units, self.activation, name="task_enc")(task_obs)
        h = MLP(self.actor_units, self.activation, name="actor")(
            jnp.concatenate([h_self, h_task], axis=-1)
        )
        mu = nn.Dense(self.action_dim)(h)
        value = nn.Dense(1)(MLP(self.critic_units, self.activation, name="critic")(obs))[..., 0]
        log_sigma = jnp.full((self.action_dim,), self.init_sigma)
        return mu, log_sigma, value


def kl_multi(mu0, logvar0, mu1, logvar1):
    """KL(N0 || N1) per-dim summed (≙ phc/learning/loss_functions.py kl_multi)."""
    var0 = jnp.exp(logvar0)
    var1 = jnp.exp(logvar1)
    return 0.5 * jnp.sum(
        logvar1 - logvar0 + (var0 + (mu0 - mu1) ** 2) / var1 - 1.0, axis=-1
    )
