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


class ConvEncoder(nn.Module):
    """Small conv stack for grid-shaped observation channels
    (≙ the rl-games A2CBuilder CNN option, network_builder.py:180 — unused
    by the shipped configs but part of the framework surface; the natural
    consumer here is the terrain height-map obs)."""

    channels: Sequence[int] = (16, 32)
    kernels: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    activation: str = "silu"
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # x [..., H, W, C] (channels-last; callers add the channel dim)
        act = _ACT[self.activation]
        for ch, k, s in zip(self.channels, self.kernels, self.strides):
            x = act(
                nn.Conv(ch, (k, k), strides=(s, s), dtype=self.dtype)(x)
            )
        return x.reshape(*x.shape[:-3], -1)


class CNNActorCritic(nn.Module):
    """Actor-critic whose obs tail is a grid (e.g. the 16x16 height map):
    conv-encode the grid, concatenate with the flat obs, then MLP heads."""

    action_dim: int
    grid_shape: tuple = (16, 16)
    conv_channels: Sequence[int] = (16, 32)
    actor_units: Sequence[int] = (1024, 512)
    critic_units: Sequence[int] = (1024, 512)
    activation: str = "silu"
    init_sigma: float = -2.9
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        gh, gw = self.grid_shape
        flat, grid = obs[..., : -gh * gw], obs[..., -gh * gw :]
        grid = grid.reshape(*grid.shape[:-1], gh, gw)[..., None]
        enc = ConvEncoder(self.conv_channels, dtype=self.dtype, name="conv")
        feat = jnp.concatenate([flat, enc(grid).astype(jnp.float32)], axis=-1)
        mu = nn.Dense(
            self.action_dim,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(MLP(self.actor_units, self.activation, dtype=self.dtype)(feat).astype(jnp.float32))
        value = nn.Dense(1)(
            MLP(self.critic_units, self.activation, dtype=self.dtype)(feat).astype(jnp.float32)
        )[..., 0]
        log_sigma = jnp.full((self.action_dim,), self.init_sigma)
        return mu, log_sigma, value


class RNNActorCritic(nn.Module):
    """Recurrent actor-critic: shared MLP trunk -> LSTM -> separate heads.

    ≙ the rl-games RNN option (network_builder.py:94 _build_rnn + the BPTT
    rollout amp_agent.py:192-339). The reference's shipped configs use MLPs,
    but the option is part of the framework surface. The carry is reset on
    episode boundaries via the `done` flag, replacing rl-games'
    masked-hidden-state machinery with an in-graph where-select.
    """

    action_dim: int
    trunk_units: Sequence[int] = (1024, 512)
    rnn_size: int = 256
    activation: str = "silu"
    init_sigma: float = -2.9
    learn_sigma: bool = False
    dtype: object = jnp.bfloat16

    is_recurrent = True

    @nn.compact
    def __call__(self, carry, obs, done=None):
        """One time step. carry: (c, h) [..., rnn_size]; obs [..., O];
        done [...] bool resets the carry BEFORE the cell runs (the first
        obs of a new episode must not see the old episode's memory).
        Returns (carry', (mu, log_sigma, value))."""
        if done is not None:
            mask = (1.0 - done.astype(jnp.float32))[..., None]
            carry = jax.tree.map(lambda c: c * mask, carry)
        x = MLP(self.trunk_units, self.activation, dtype=self.dtype)(obs)
        x = x.astype(jnp.float32)
        cell = nn.OptimizedLSTMCell(self.rnn_size)
        carry, x = cell(carry, x)
        mu = nn.Dense(
            self.action_dim,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(x)
        value = nn.Dense(1)(x)[..., 0]
        if self.learn_sigma:
            log_sigma = self.param(
                "log_sigma", nn.initializers.constant(self.init_sigma), (self.action_dim,)
            )
        else:
            log_sigma = jnp.full((self.action_dim,), self.init_sigma)
        return carry, (mu, log_sigma, value)

    def initial_carry(self, batch_shape: tuple = ()) -> tuple:
        zeros = jnp.zeros(batch_shape + (self.rnn_size,))
        return (zeros, zeros)


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
    """PULSE posterior encoder: [self_obs, task_obs] -> (z_mu, z_logvar).

    Structure mirrors AMPZBuilder._build_z_mlp (amp_network_z_builder.py:
    489-511): activated MLP trunk, then an UNactivated bottleneck Linear to
    latent_dim*5 (the z_mlp's appended output layer), then the z_mu /
    z_logvar head Linears — so reference VAE checkpoints import 1:1."""

    latent_dim: int = 32
    units: Sequence[int] = (2048, 1536, 1024)
    activation: str = "silu"
    dtype: object = None          # bf16 trunk for training; heads stay f32

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.units, self.activation, dtype=self.dtype)(obs)
        h = h.astype(jnp.float32)
        h = nn.Dense(self.latent_dim * 5, name="z_proj")(h)
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
    dtype: object = None

    @nn.compact
    def __call__(self, self_obs):
        h = MLP(self.units, self.activation, dtype=self.dtype)(self_obs)
        h = h.astype(jnp.float32)
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
    dtype: object = None

    @nn.compact
    def __call__(self, self_obs, z):
        h = MLP(self.units, self.activation, dtype=self.dtype)(
            jnp.concatenate([self_obs, z], axis=-1)
        )
        return nn.Dense(self.action_dim)(h.astype(jnp.float32))


class ZEmbedding(nn.Module):
    """Latent-embedding head for the non-gaussian z spaces
    (≙ form_embedding, amp_network_z_builder.py:79-223):

      - 'sphere':        project the encoder output onto the norm-R sphere
      - 'vq_vae':        nearest-codebook quantization (straight-through)
      - 'vq_vae_hybrid': quantized code ⊕ small continuous residual channel
                         (uniform-clipped at 0.1)
      - 'vq_vae_res':    sphere-quantized code scaled by a positive
                         per-dim gain (sin(z)+1)

    Takes the shared encoder feature and an external CodebookState (the
    codebook lives in the train state so EMA updates stay functional).
    Returns (z, extras) where extras carries quantizer losses/indices.
    """

    latent_dim: int = 32
    z_type: str = "sphere"
    embedding_norm: float = 5.0

    @nn.compact
    def __call__(self, feat, codebook=None):
        from pulse_tpu.learning.vq_quantizer import project_to_norm, quantize

        if self.z_type == "sphere":
            z = nn.Dense(self.latent_dim, name="z_proj")(feat)
            return project_to_norm(z, self.embedding_norm, "sphere"), {}
        if self.z_type == "vq_vae":
            z = nn.Dense(self.latent_dim, name="z_quant")(feat)
            z_q, idx, losses = quantize(codebook, z)
            return z_q, {"indexes": idx, "z_before_quant": z, **losses}
        if self.z_type == "vq_vae_hybrid":
            z = nn.Dense(self.latent_dim, name="z_quant")(feat)
            z_var = nn.Dense(self.latent_dim, name="z_var")(feat)
            z_q, idx, losses = quantize(codebook, z)
            z_var = project_to_norm(z_var, 0.1, "uniform")
            out = jnp.concatenate([z_q, z_var], axis=-1)
            return out, {"indexes": idx, "z_before_quant": z, **losses}
        if self.z_type == "vq_vae_res":
            z = nn.Dense(self.latent_dim, name="z_quant")(feat)
            z_var = nn.Dense(self.latent_dim, name="z_var")(feat)
            z_q, idx, losses = quantize(
                codebook, project_to_norm(z, self.embedding_norm, "sphere")
            )
            z_q = project_to_norm(z_q, self.embedding_norm, "sphere")
            out = z_q * (jnp.sin(z_var) + 1.0)
            return out, {"indexes": idx, "z_before_quant": z, **losses}
        raise ValueError(f"unknown z_type {self.z_type!r}")


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
    # None (f32) by default so reference .pth imports stay bit-faithful;
    # the training builder passes bf16 (2x MXU on the distill update)
    dtype: object = None

    def setup(self):
        self.encoder = Encoder(
            self.latent_dim, self.encoder_units, self.activation, self.dtype
        )
        self.prior = Prior(
            self.latent_dim, self.prior_units, self.activation, dtype=self.dtype
        )
        self.decoder = Decoder(
            self.action_dim, self.decoder_units, self.activation, self.dtype
        )
        self.critic = MLP(self.critic_units, self.activation, dtype=self.dtype)
        self.critic_head = nn.Dense(1)

    def __call__(self, obs, z_noise):
        """Full pass: returns action mu, posterior/prior params, value."""
        self_obs = obs[..., : self.self_obs_dim]
        post_mu, post_logvar = self.encoder(obs)
        prior_mu, prior_logvar = self.prior(self_obs)
        z = post_mu + jnp.exp(0.5 * post_logvar) * z_noise
        # vae-prior shift: decode around the prior mean (humanoid_z.py:100-104)
        action = self.decoder(self_obs, prior_mu + z)
        value = self.critic_head(self.critic(obs).astype(jnp.float32))[..., 0]
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
        return self.critic_head(self.critic(obs).astype(jnp.float32))[..., 0]


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
    # optional pointnet channel (≙ _build_pointnet + the point_net forward,
    # amp_network_sept_builder.py:52-59,133-161): the LAST
    # num_points*point_dim entries of the task obs are a variable-content
    # point set (e.g. topk nearby people); each point passes through a
    # shared per-point MLP and the features max-pool into one embedding
    num_points: int = 0
    point_dim: int = 0
    point_units: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        self_obs = obs[..., : self.self_obs_dim]
        task_obs = obs[..., self.self_obs_dim :]
        feats = []
        if self.num_points > 0:
            pts_flat = task_obs[..., -self.num_points * self.point_dim :]
            task_obs = task_obs[..., : -self.num_points * self.point_dim]
            pts = pts_flat.reshape(
                *pts_flat.shape[:-1], self.num_points, self.point_dim
            )
            h_pts = MLP(self.point_units, self.activation, name="point_net")(pts)
            feats.append(jnp.max(h_pts, axis=-2))
        h_self = MLP(self.self_units, self.activation, name="self_enc")(self_obs)
        h_task = MLP(self.task_units, self.activation, name="task_enc")(task_obs)
        h = MLP(self.actor_units, self.activation, name="actor")(
            jnp.concatenate([h_self, h_task, *feats], axis=-1)
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
