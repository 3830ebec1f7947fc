"""Vector quantization for the VQ-VAE z-space variant.

≙ phc/learning/vq_quantizer.py:6-166 (Quantizer + EMAVectorQuantizer):
nearest-codebook-entry lookup with straight-through gradients; the EMA
variant updates the codebook with exponential moving averages instead of a
codebook loss. Both are pure functions over explicit state pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CodebookState:
    codebook: jax.Array        # [K, D]
    ema_counts: jax.Array      # [K]
    ema_means: jax.Array       # [K, D]


def create_codebook(key: jax.Array, num_codes: int, dim: int) -> CodebookState:
    cb = jax.random.normal(key, (num_codes, dim)) * 0.1
    return CodebookState(
        codebook=cb, ema_counts=jnp.ones(num_codes), ema_means=cb
    )


def quantize(state: CodebookState, z: jax.Array) -> tuple[jax.Array, jax.Array, dict]:
    """Nearest-entry quantization with straight-through estimator.

    z [..., D] -> (z_q with ST gradients, indices, losses dict)."""
    flat = z.reshape(-1, z.shape[-1])
    d = (
        jnp.sum(flat**2, axis=-1, keepdims=True)
        - 2.0 * flat @ state.codebook.T
        + jnp.sum(state.codebook**2, axis=-1)[None, :]
    )
    idx = jnp.argmin(d, axis=-1)
    z_q = state.codebook[idx].reshape(z.shape)
    commit_loss = jnp.mean(jnp.sum((z - jax.lax.stop_gradient(z_q)) ** 2, axis=-1))
    codebook_loss = jnp.mean(
        jnp.sum((jax.lax.stop_gradient(z) - z_q) ** 2, axis=-1)
    )
    # straight-through: gradients flow to the encoder as if identity
    z_st = z + jax.lax.stop_gradient(z_q - z)
    losses = {"commit_loss": commit_loss, "codebook_loss": codebook_loss}
    return z_st, idx.reshape(z.shape[:-1]), losses


def ema_update(
    state: CodebookState, z: jax.Array, idx: jax.Array, decay: float = 0.99
) -> CodebookState:
    """EMA codebook update (≙ EMAVectorQuantizer)."""
    K, D = state.codebook.shape
    flat = z.reshape(-1, D)
    onehot = jax.nn.one_hot(idx.reshape(-1), K)                     # [N, K]
    counts = jnp.sum(onehot, axis=0)
    means = onehot.T @ flat
    new_counts = decay * state.ema_counts + (1 - decay) * counts
    new_means = decay * state.ema_means + (1 - decay) * means
    # Laplace-smoothed normalization
    n = jnp.sum(new_counts)
    stable_counts = (new_counts + 1e-5) / (n + K * 1e-5) * n
    codebook = new_means / stable_counts[:, None]
    return CodebookState(
        codebook=codebook, ema_counts=new_counts, ema_means=new_means
    )


def project_to_norm(x: jax.Array, norm: float = 5.0, z_type: str = "sphere") -> jax.Array:
    """Sphere / uniform latent projection (≙ phc/utils/torch_utils.py:38-44)."""
    if z_type == "sphere":
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) / norm + 1e-8)
    if z_type == "uniform":
        return jnp.clip(x, -norm, norm)
    return x
