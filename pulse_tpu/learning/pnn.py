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
    # column_inputs=True: x carries a per-column axis [..., N, obs] — used
    # when separately-trained columns each keep their OWN input normalizer
    # (stacked RunningMeanStd leaves broadcast the per-column normalize);
    # the reference's PNN instead shares one running_mean_std across columns
    # (phc/learning/pnn.py:60-66), which is only exact when every column was
    # trained under the same stats.
    column_inputs: bool = False

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        N = self.num_primitives
        outs = []
        laterals = []  # per-layer activations of earlier columns
        for c in range(N):
            h = x[..., c, :] if self.column_inputs else x
            acts_c = []
            for li, u in enumerate(self.units):
                h = nn.Dense(u, name=f"col{c}_dense{li}")(h)
                if self.has_lateral and c > 0 and li > 0:
                    # Lateral connections mirror the reference exactly
                    # (phc/learning/pnn.py:96-103): layer li's pre-activation
                    # receives, from every previous column pc, a bias-free
                    # linear map of that column's layer li-1 ACTIVATION
                    # (u[c-1][pc][li-1]); the first hidden layer and the
                    # output layer have no laterals.
                    for pc in range(c):
                        h = h + nn.Dense(
                            u, use_bias=False, name=f"lat{pc}to{c}_l{li}"
                        )(laterals[pc][li - 1])
                h = act(h)
                acts_c.append(h)
            laterals.append(acts_c)
            outs.append(nn.Dense(self.action_dim, name=f"col{c}_out")(h))
        return jnp.stack(outs, axis=-2)  # [..., N, A]


class MCPComposer(nn.Module):
    """Composer MLP: obs -> weights over primitives.

    `final` controls the weight head:
      - "softmax": the trained MCP policy head (amp_network_mcp_builder.py:53-55)
      - an activation name ("relu"/"silu"): the reference's DISTILL-TEACHER
        reconstruction — load_mcp_mlp (network_loader.py:36-39) rebuilds the
        composer from the state dict, where the parameterless softmax is lost,
        and appends a plain activation instead; PULSE is distilled from THAT
        teacher, so checkpoint-parity requires reproducing it.
    """

    num_primitives: int = 3
    units: Sequence[int] = (512, 256)
    activation: str = "relu"
    final: str = "softmax"

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.units, self.activation)(obs)
        logits = nn.Dense(self.num_primitives)(h)
        if self.final == "softmax":
            return jax.nn.softmax(logits, axis=-1)
        return _ACT[self.final](logits)


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
