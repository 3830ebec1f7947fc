"""Motion retargeting between skeletons.

≙ poselib SkeletonState.retarget_to (skeleton3d.py:717-908): transfer a
motion across skeletons with different proportions by (1) mapping joints by
name, (2) carrying local rotations through per-skeleton rest ("t")-pose
corrections, and (3) scaling root translation by the leg-length ratio.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.kinematics.skeleton import SkeletonTree, forward_kinematics
from pulse_tpu.ops import quat as q


def _leg_length(tree: SkeletonTree) -> float:
    """Root-to-foot chain length used as the height scale."""
    names = tree.node_names
    length = 0.0
    for foot in ("L_Ankle", "L_Foot", "L_Toe"):
        if foot in names:
            j = names.index(foot)
            while tree.parent_indices[j] >= 0:
                length += float(np.linalg.norm(tree.local_translation[j]))
                j = int(tree.parent_indices[j])
            break
    return length or 1.0


def retarget_motion(
    source_tree: SkeletonTree,
    target_tree: SkeletonTree,
    local_rotation: jax.Array,      # [T, Js, 4] on the source skeleton
    root_translation: jax.Array,    # [T, 3]
    joint_mapping: dict[str, str] | None = None,
    source_tpose: jax.Array | None = None,   # [Js, 4] rest-pose local rots
    target_tpose: jax.Array | None = None,   # [Jt, 4]
) -> tuple[jax.Array, jax.Array]:
    """Returns (local_rotation [T, Jt, 4], root_translation [T, 3]) on the
    target skeleton. Unmapped target joints hold their t-pose rotation."""
    mapping = joint_mapping or {
        n: n for n in target_tree.node_names if n in source_tree.node_names
    }
    Js = source_tree.num_joints
    Jt = target_tree.num_joints
    T = local_rotation.shape[0]

    src_t = (
        source_tpose
        if source_tpose is not None
        else q.quat_identity((Js,))
    )
    tgt_t = (
        target_tpose
        if target_tpose is not None
        else q.quat_identity((Jt,))
    )

    # carry the DELTA from the source t-pose into the target t-pose frame
    out = jnp.tile(tgt_t[None], (T, 1, 1))
    for tgt_name, src_name in mapping.items():
        ti = target_tree.index(tgt_name)
        si = source_tree.index(src_name)
        delta = q.quat_mul_norm(local_rotation[:, si], q.quat_inverse(src_t[si]))
        out = out.at[:, ti].set(q.quat_mul_norm(delta, tgt_t[ti]))

    scale = _leg_length(target_tree) / _leg_length(source_tree)
    root_t = root_translation * scale
    return out, root_t
