"""Progressive neural network primitives + MCP composer (the PHC teacher).

≙ phc/learning/pnn.py:11-131 (PNN: N parallel MLP columns with optional
lateral connections, freeze-by-column training) and
amp_network_mcp_builder.py:23-87 (composer MLP -> softmax weights over
frozen primitives; action = sum_i w_i * prim_i, humanoid_im_mcp.py:44-92).

PULSE distills from a frozen PNN+composer teacher
(env_im_vae.yaml distill_model_config). Columns evaluate in parallel as one
batched einsum over the column axis — on TPU all primitives run in a single
MXU pass instead of N sequential MLPs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from pulse_tpu.learning.networks import MLP, _ACT


class PNN(nn.Module):
    """N parallel columns; returns every column's action [..., N, A]."""

    action_dim: int
    num_primitives: int = 3
    units: Sequence[int] = (1024, 512)
    activation: str = "silu"
    has_lateral: bool = False

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        N = self.num_primitives
        outs = []
        laterals = []  # per-layer activations of earlier columns
        for c in range(N):
            h = x
            acts_c = []
            for li, u in enumerate(self.units):
                h = nn.Dense(u, name=f"col{c}_dense{li}")(h)
                if self.has_lateral and c > 0:
                    # lateral connections from all previous columns' layer li
                    for pc in range(c):
                        h = h + nn.Dense(u, use_bias=False, name=f"lat{pc}to{c}_l{li}")(
                            laterals[pc][li]
                        )
                h = act(h)
                acts_c.append(h)
            laterals.append(acts_c)
            outs.append(nn.Dense(self.action_dim, name=f"col{c}_out")(h))
        return jnp.stack(outs, axis=-2)  # [..., N, A]


class MCPComposer(nn.Module):
    """Composer MLP: obs -> softmax weights over primitives."""

    num_primitives: int = 3
    units: Sequence[int] = (512, 256)
    activation: str = "relu"

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.units, self.activation)(obs)
        return jax.nn.softmax(nn.Dense(self.num_primitives)(h), axis=-1)


def compose_actions(weights: jax.Array, primitive_actions: jax.Array) -> jax.Array:
    """action = sum_i w_i * prim_i (humanoid_im_mcp.py:44-92).

    weights [..., N], primitive_actions [..., N, A] -> [..., A]."""
    return jnp.einsum("...n,...na->...a", weights, primitive_actions)


def make_pnn_mcp_teacher(pnn: PNN, pnn_params, composer: MCPComposer, composer_params):
    """Frozen PHC teacher callable for distillation (≙ the teacher fwd in
    humanoid_im_distill.py:152-207)."""

    def teacher_fn(obs):
        prims = pnn.apply({"params": pnn_params}, obs)
        w = composer.apply({"params": composer_params}, obs)
        return jnp.clip(compose_actions(w, prims), -1.0, 1.0)

    return teacher_fn
