"""HumanoidImMCP: policy outputs composer weights over frozen PNN primitives.

≙ phc/env/tasks/humanoid_im_mcp.py:13-92 (+ the Getup variant,
humanoid_im_mcp_getup.py): the action space becomes the N composer weights;
each step evaluates the frozen PNN primitives on the current observation and
executes the weighted blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulse_tpu.env.humanoid_im import EnvState, HumanoidImEnv
from pulse_tpu.env.humanoid_im_getup import HumanoidImGetupEnv
from pulse_tpu.learning.pnn import PNN, compose_actions


class _MCPMixin:
    """Overrides the action pathway: weights -> blended primitive action."""

    def init_mcp(self, pnn: PNN, pnn_params, obs_rms=None, gate_temp=1.0):
        self.pnn = pnn
        self.pnn_params = pnn_params
        # reference checkpoints run the PNN on running_mean_std-normalized
        # obs (AMPMCPBuilder forward); frozen stats ride along when imported
        self.pnn_obs_rms = obs_rms
        self.action_dim = pnn.num_primitives
        # gate logits arrive CLIPPED to [-1, 1] (PPO clips actions before
        # env.step, and im_eval clips mu): at temp 1 the softmax can reach at
        # most e^2/(e^2 + (N-1)) of one column (~0.6 at N=6), so the composer
        # can never hand full control to a specialist. The reference has no
        # such bound — its composer softmax sits INSIDE the network
        # (amp_network_mcp_builder.py:53-55). gate_temp scales the clipped
        # logits so +-1 actions express near-one-hot routing (temp 4 ->
        # max weight ~0.997 at N=6).
        self.gate_temp = gate_temp

    def _ctor_kwargs(self) -> dict:
        return {
            "pnn": self.pnn,
            "pnn_params": self.pnn_params,
            "obs_rms": self.pnn_obs_rms,
            "gate_temp": self.gate_temp,
        }

    def motor_actions_one(self, state: EnvState, weights: jax.Array) -> jax.Array:
        """weights -> blended primitive motor action (the hook the batched
        Pallas step also routes through — see HumanoidImEnv.step)."""
        obs = state.obs
        if self.pnn.column_inputs:
            # per-column input stats: pnn_obs_rms leaves are stacked
            # [N, obs]; broadcasting the normalize gives each frozen column
            # the exact normalizer it was trained under
            obs = obs[..., None, :]
        if self.pnn_obs_rms is not None:
            obs = self.pnn_obs_rms.normalize(obs)
        elif self.pnn.column_inputs:
            obs = jnp.broadcast_to(
                obs, obs.shape[:-2] + (self.pnn.num_primitives, obs.shape[-1])
            )
        prims = self.pnn.apply({"params": self.pnn_params}, obs)
        w = jax.nn.softmax(weights * self.gate_temp, axis=-1)
        return jnp.clip(compose_actions(w, prims), -1.0, 1.0)


class HumanoidImMCPEnv(_MCPMixin, HumanoidImEnv):
    # signature (model, motion, config, **ctor_kwargs) so with_config's
    # rebuild `type(self)(model, motion, config, **self._ctor_kwargs())`
    # round-trips the frozen primitives
    def __init__(self, model, motion, config=None, *, pnn: PNN, pnn_params,
                 obs_rms=None, gate_temp=1.0):
        super().__init__(model, motion, config)
        self.init_mcp(pnn, pnn_params, obs_rms, gate_temp)


class HumanoidImMCPGetupEnv(_MCPMixin, HumanoidImGetupEnv):
    def __init__(self, model, motion, config=None, *, pnn: PNN, pnn_params,
                 obs_rms=None, gate_temp=1.0):
        super().__init__(model, motion, config)
        self.init_mcp(pnn, pnn_params, obs_rms, gate_temp)
