"""Running mean/std normalization as a pure pytree.

≙ phc/utils/running_mean_std.py (freezeable RunningMeanStd): parallel-variance
(Chan et al.) batched updates, clamp to ±5 on normalize (vec_task.py:154 obs
clamp uses the same bound), and a `frozen` flag for the distillation trick of
freezing input stats (amp_agent.py:578-603).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jax.Array
    var: jax.Array
    count: jax.Array
    frozen: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, dim: int) -> "RunningMeanStd":
        return cls(mean=jnp.zeros(dim), var=jnp.ones(dim), count=jnp.asarray(1e-4))

    def update(self, batch: jax.Array) -> "RunningMeanStd":
        batch = batch.reshape(-1, batch.shape[-1])
        return self.update_moments(
            jnp.mean(batch, axis=0), jnp.var(batch, axis=0), batch.shape[0]
        )

    def update_moments(self, b_mean, b_var, b_count) -> "RunningMeanStd":
        """Chan-merge precomputed batch moments. The distributed update path
        computes per-shard moments, pmean's them across the mesh, and merges
        here — numerically the same Chan merge as update() on the gathered
        batch, without materializing it on any device."""
        if self.frozen:
            return self
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return self.replace(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jax.Array, clip: float = 5.0) -> jax.Array:
        return jnp.clip(
            (x - self.mean) / jnp.sqrt(self.var + 1e-5), -clip, clip
        )

    def denormalize(self, x: jax.Array) -> jax.Array:
        return x * jnp.sqrt(self.var + 1e-5) + self.mean

    def freeze(self) -> "RunningMeanStd":
        return self.replace(frozen=True)
