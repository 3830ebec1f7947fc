"""Checkpointing: orbax save/restore of train states + checkpoint surgery.

≙ rl-games save/restore (full model+optimizer+running-stats weights,
amp_agent.py:107-121, common_agent.py:142-150 `Humanoid_%08d` snapshots,
epoch=-1 latest resolution run_hydra.py:324-334) and the reference's
checkpoint-surgery loaders that rebuild frozen submodels from state dicts
(phc/learning/network_loader.py:54-176). Also provides a torch-state-dict
importer so pretrained reference MLP weights (plain Linear stacks) can seed
our flax modules.
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np
import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """epoch=-1 semantics: newest step under ckpt_dir."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_checkpoint(path: str, target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


# --------------------------------------------------------------------------- #
# surgery: frozen submodels from a distill checkpoint (≙ network_loader.py)
# --------------------------------------------------------------------------- #

def extract_frozen_z_model(distill_state) -> "FrozenZModel":
    """Pull the frozen decoder/prior/stats out of a DistillState — the piece
    downstream Z tasks load (≙ load_z_decoder/load_z_encoder,
    network_loader.py:76-176)."""
    from pulse_tpu.env.humanoid_z import FrozenZModel

    return FrozenZModel(
        params=jax.tree.map(lambda x: x, distill_state.params),
        obs_rms=distill_state.obs_rms.freeze(),
    )


# --------------------------------------------------------------------------- #
# torch interop: import reference-pretrained MLP stacks
# --------------------------------------------------------------------------- #

def torch_linear_stack_to_flax(
    state_dict: dict, prefix: str, layer_names: list[str] | None = None
) -> dict:
    """Convert a torch Sequential of Linear layers ({prefix}.0.weight, ...)
    into flax MLP params ({"Dense_0": {"kernel": W.T, "bias": b}}, ...).

    Torch Linear stores [out, in]; flax Dense stores [in, out]."""
    layers = {}
    idxs = sorted(
        {
            int(m.group(1))
            for k in state_dict
            if (m := re.fullmatch(re.escape(prefix) + r"\.(\d+)\.weight", k))
        }
    )
    for j, i in enumerate(idxs):
        w = np.asarray(state_dict[f"{prefix}.{i}.weight"])
        b = np.asarray(state_dict[f"{prefix}.{i}.bias"])
        layers[f"Dense_{j}"] = {"kernel": w.T, "bias": b}
    return layers


# --------------------------------------------------------------------------- #
# reference .pth checkpoint import (≙ phc/learning/network_loader.py)
#
# The reference distills from pretrained torch checkpoints whose state-dict
# key names come from the rl-games builders (amp_network_z_builder.py:469-557,
# pnn.py, amp_network_mcp_builder.py). These functions read a reference
# `Humanoid_*.pth` file and produce param pytrees for the corresponding
# pulse_tpu flax modules, so reference-trained PHC teachers / PULSE decoders
# drop straight into our distillation and Z-task paths.
# --------------------------------------------------------------------------- #

def load_torch_checkpoint(path: str) -> dict:
    """torch.load a reference checkpoint -> {'model': {key: np.ndarray}, ...}.

    ≙ rl-games torch_ext.load_checkpoint (map_location cpu); tensors are
    converted to numpy so nothing downstream needs torch."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = dict(ckpt)
    model = {}
    for k, v in ckpt.get("model", {}).items():
        model[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    out["model"] = model
    return out


def _linear(sd: dict, name: str) -> dict:
    return {
        "kernel": np.asarray(sd[f"{name}.weight"]).T,
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def import_z_encoder(sd: dict) -> dict:
    """a2c_network.z_mlp/z_mu/z_logvar -> params for networks.Encoder
    (≙ load_z_encoder, network_loader.py:78-103). The z_mlp's LAST Linear is
    the unactivated latent_dim*5 bottleneck (our Encoder's `z_proj`)."""
    prefix = "a2c_network._task_mlp" if "a2c_network._task_mlp.0.weight" in sd else "a2c_network.z_mlp"
    stack = torch_linear_stack_to_flax(sd, prefix)
    z_proj = stack.pop(f"Dense_{len(stack) - 1}")
    return {
        "MLP_0": stack,
        "z_proj": z_proj,
        "z_mu": _linear(sd, "a2c_network.z_mu"),
        "z_logvar": _linear(sd, "a2c_network.z_logvar"),
    }


def import_z_prior(sd: dict) -> dict:
    """a2c_network.z_prior(_mu/_logvar) -> params for networks.Prior
    (≙ load_z_decoder's prior branch, network_loader.py:163-176)."""
    return {
        "MLP_0": torch_linear_stack_to_flax(sd, "a2c_network.z_prior"),
        "prior_mu": _linear(sd, "a2c_network.z_prior_mu"),
        "prior_logvar": _linear(sd, "a2c_network.z_prior_logvar"),
    }


def import_z_decoder(sd: dict) -> dict:
    """a2c_network.actor_mlp + a2c_network.mu -> params for networks.Decoder
    (≙ load_z_decoder, network_loader.py:141-155)."""
    return {
        "MLP_0": torch_linear_stack_to_flax(sd, "a2c_network.actor_mlp"),
        "Dense_0": _linear(sd, "a2c_network.mu"),
    }


def import_critic(sd: dict) -> tuple[dict, dict]:
    """a2c_network.critic_mlp + a2c_network.value -> (trunk, head) params."""
    return (
        torch_linear_stack_to_flax(sd, "a2c_network.critic_mlp"),
        _linear(sd, "a2c_network.value"),
    )


def import_pulse_vae(sd: dict) -> dict:
    """Full PULSE network params (networks.PulseVAE) from a reference
    im_z/distill checkpoint."""
    critic, critic_head = import_critic(sd)
    return {
        "encoder": import_z_encoder(sd),
        "prior": import_z_prior(sd),
        "decoder": import_z_decoder(sd),
        "critic": critic,
        "critic_head": critic_head,
    }


def import_actor_critic(sd: dict) -> dict:
    """Plain AMP/PPO checkpoint (a2c_network.actor_mlp/mu/critic_mlp/value)
    -> params for networks.ActorCritic (compact module order: MLP_0 = actor
    trunk, Dense_0 = mu head, MLP_1 = critic trunk, Dense_1 = value head)."""
    critic, critic_head = import_critic(sd)
    params = {
        "MLP_0": torch_linear_stack_to_flax(sd, "a2c_network.actor_mlp"),
        "Dense_0": _linear(sd, "a2c_network.mu"),
        "MLP_1": critic,
        "Dense_1": critic_head,
    }
    if "a2c_network.sigma" in sd:
        params["log_sigma"] = np.asarray(sd["a2c_network.sigma"])
    return params


def import_pnn(sd: dict, prefix: str = "a2c_network.pnn") -> tuple[dict, dict]:
    """Reference PNN (actors.{c}.{2*li} Sequential + u.{c-1}.{pc}.{k} lateral
    stacks, phc/learning/pnn.py:11-131) -> (params for learning.pnn.PNN,
    info dict {num_primitives, units, has_lateral, action_dim}).

    Reference Sequential interleaves activations, so Linear layers sit at
    even indices; the final Linear is the action head. Lateral u[c-1][pc][k]
    maps column pc's layer-k activation into column c's layer-(k+1)
    pre-activation — only k=0 is active in the reference forward
    (pnn.py:96-103), matching our `lat{pc}to{c}_l{li}` for li>=1."""
    actor_keys = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            if (m := re.fullmatch(re.escape(prefix) + r"\.actors\.(\d+)\.(\d+)\.weight", k))
        }
    )
    if not actor_keys:
        raise KeyError(f"no PNN actors under {prefix!r}")
    num_cols = max(c for c, _ in actor_keys) + 1
    seq_idxs = sorted({i for c, i in actor_keys if c == 0})
    params: dict = {}
    for c in range(num_cols):
        for li, i in enumerate(seq_idxs[:-1]):
            params[f"col{c}_dense{li}"] = _linear(sd, f"{prefix}.actors.{c}.{i}")
        params[f"col{c}_out"] = _linear(sd, f"{prefix}.actors.{c}.{seq_idxs[-1]}")

    has_lateral = any(
        re.fullmatch(re.escape(prefix) + r"\.u\..*\.weight", k) for k in sd
    )
    if has_lateral:
        for k in sd:
            m = re.fullmatch(
                re.escape(prefix) + r"\.u\.(\d+)\.(\d+)\.(\d+)\.weight", k
            )
            if not m:
                continue
            c = int(m.group(1)) + 1      # u[i] feeds column i+1
            pc = int(m.group(2))
            li = int(m.group(3)) + 1     # u[..][k] feeds layer k+1
            params[f"lat{pc}to{c}_l{li}"] = {"kernel": np.asarray(sd[k]).T}

    units = [np.asarray(sd[f"{prefix}.actors.0.{i}.weight"]).shape[0] for i in seq_idxs[:-1]]
    action_dim = np.asarray(sd[f"{prefix}.actors.0.{seq_idxs[-1]}.weight"]).shape[0]
    info = {
        "num_primitives": num_cols,
        "units": tuple(units),
        "has_lateral": has_lateral,
        "action_dim": action_dim,
    }
    return params, info


def import_mcp_composer(sd: dict, prefix: str = "a2c_network.composer") -> dict:
    """Composer MLP -> params for learning.pnn.MCPComposer
    (≙ load_mcp_mlp(mlp_name='composer'), network_loader.py:11-52)."""
    stack = torch_linear_stack_to_flax(sd, prefix)
    n = len(stack)
    head = stack.pop(f"Dense_{n - 1}")
    return {"MLP_0": stack, "Dense_0": head}


def _stack_units(sd: dict, prefix: str) -> list[int]:
    idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(re.escape(prefix) + r"\.(\d+)\.weight", k))
    )
    return [np.asarray(sd[f"{prefix}.{i}.weight"]).shape[0] for i in idxs]


def pulse_vae_spec_from_torch(sd: dict) -> dict:
    """Infer the PulseVAE constructor kwargs from a reference checkpoint's
    weight shapes, so arbitrary reference network sizes import without
    hand-matching YAMLs."""
    latent_dim = np.asarray(sd["a2c_network.z_mu.weight"]).shape[0]
    action_dim = np.asarray(sd["a2c_network.mu.weight"]).shape[0]
    self_obs_dim = (
        np.asarray(sd["a2c_network.actor_mlp.0.weight"]).shape[1] - latent_dim
    )
    return {
        "action_dim": int(action_dim),
        "latent_dim": int(latent_dim),
        "self_obs_dim": int(self_obs_dim),
        # the z_mlp's final Linear is the latent*5 bottleneck, not a unit
        "encoder_units": tuple(_stack_units(sd, "a2c_network.z_mlp")[:-1]),
        "prior_units": tuple(_stack_units(sd, "a2c_network.z_prior")),
        "decoder_units": tuple(_stack_units(sd, "a2c_network.actor_mlp")),
        "critic_units": tuple(_stack_units(sd, "a2c_network.critic_mlp")),
    }


def import_running_mean_std(sd: dict, prefix: str = "running_mean_std"):
    """rl-games RunningMeanStd buffers -> our RunningMeanStd pytree."""
    from pulse_tpu.learning.running_norm import RunningMeanStd
    import jax.numpy as jnp

    return RunningMeanStd(
        mean=jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"]), jnp.float32),
        var=jnp.asarray(np.asarray(sd[f"{prefix}.running_var"]), jnp.float32),
        count=jnp.asarray(np.asarray(sd[f"{prefix}.count"]), jnp.float32),
    )
