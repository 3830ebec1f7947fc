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
