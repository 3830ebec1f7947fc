"""Motion retargeting between skeletons.

Two levels:
  - `retarget_motion`: quick local-rotation-delta carry + leg-length root
    scale (kept from round 1 for simple same-topology cases);
  - `retarget_to`: the full poselib algorithm (SkeletonState.retarget_to,
    skeleton3d.py:717-860): reduce the source skeleton to the mapped
    joints (reconnecting through dropped chains), align frames with
    rotation_to_target, carry GLOBAL-rotation deltas relative to the two
    t-poses onto the target skeleton, fill unmapped target joints from
    their nearest mapped ancestor, scale the root trajectory, and return
    local rotations on the target tree.
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


# --------------------------------------------------------------------------- #
# full retarget_to (≙ skeleton3d.py:717-860)
# --------------------------------------------------------------------------- #

def keep_nodes(
    tree: SkeletonTree, keep_names: list[str]
) -> tuple[SkeletonTree, list[int]]:
    """Reduced SkeletonTree containing only `keep_names` (original order),
    children reconnected through dropped chains with local translations
    accumulated along the rest pose (≙ SkeletonTree.keep_nodes_by_names /
    drop_nodes_by_names, skeleton3d.py:213-251 — the reference estimates
    chain offsets from the motion's average pairwise translation; bones are
    rigid per link, so the rest-pose chain accumulation is the same
    quantity for rigid skeletons)."""
    keep = [n for n in tree.node_names if n in set(keep_names)]
    old_idx = [tree.node_names.index(n) for n in keep]
    rest = rest_joints_of(tree)
    new_parents = []
    new_local = []
    for n in keep:
        i = tree.node_names.index(n)
        p = int(tree.parent_indices[i])
        while p >= 0 and tree.node_names[p] not in keep:
            p = int(tree.parent_indices[p])
        if p < 0:
            new_parents.append(-1)
            new_local.append(np.asarray(tree.local_translation[i]))
        else:
            new_parents.append(keep.index(tree.node_names[p]))
            new_local.append(rest[i] - rest[p])
    return SkeletonTree(tuple(keep), np.asarray(new_parents), np.asarray(new_local)), old_idx


def rest_joints_of(tree: SkeletonTree) -> np.ndarray:
    J = tree.num_joints
    out = np.zeros((J, 3))
    for i in range(J):
        p = int(tree.parent_indices[i])
        out[i] = (out[p] if p >= 0 else 0.0) + np.asarray(tree.local_translation[i])
    return out


def retarget_to(
    source_tree: SkeletonTree,
    local_rotation: jax.Array,       # [T, Js, 4]
    root_translation: jax.Array,     # [T, 3]
    joint_mapping: dict[str, str],   # source name -> target name
    source_tpose_local: jax.Array,   # [Js, 4]
    source_tpose_root: jax.Array,    # [3]
    target_tree: SkeletonTree,
    target_tpose_local: jax.Array,   # [Jt, 4]
    target_tpose_root: jax.Array,    # [3]
    rotation_to_target: jax.Array,   # [4] t_R_s frame alignment
    scale_to_target: float,
) -> tuple[jax.Array, jax.Array]:
    """Full-fidelity port of SkeletonState.retarget_to (skeleton3d.py:
    717-860). Returns (local_rotation [T, Jt, 4], root_translation [T, 3])
    on the target skeleton."""
    from pulse_tpu.kinematics.skeleton import global_to_local

    T = local_rotation.shape[0]
    Jt = target_tree.num_joints

    # STEP 1: reduce source to the mapped joints (state + tpose carry their
    # GLOBAL rotations onto the reduced tree — _transfer_to semantics)
    red_tree, old_idx = keep_nodes(source_tree, list(joint_mapping))
    g_state, _ = forward_kinematics(source_tree, local_rotation, root_translation)
    g_tpose, _ = forward_kinematics(
        source_tree, source_tpose_local[None], source_tpose_root[None]
    )
    red_state_g = g_state[:, old_idx]
    red_tpose_g = g_tpose[0, old_idx]

    # STEP 2: rotate everything into the target frame (the reference
    # multiplies the root local rotation, which IS the root global)
    rtt = rotation_to_target
    red_state_g = q.quat_mul_norm(jnp.broadcast_to(rtt, red_state_g.shape), red_state_g)
    red_tpose_g = q.quat_mul_norm(jnp.broadcast_to(rtt, red_tpose_g.shape), red_tpose_g)
    state_root = q.quat_rotate(rtt, root_translation)
    tpose_root = q.quat_rotate(rtt, source_tpose_root)

    # STEP 3: scale the root trajectory
    root_diff = (state_root - tpose_root) * scale_to_target

    # STEP 4: re-apply the tpose-relative global rotation to the target tpose
    tgt_tpose_g, _ = forward_kinematics(
        target_tree, target_tpose_local[None], target_tpose_root[None]
    )
    tgt_tpose_g = tgt_tpose_g[0]
    # per reduced-source joint: its target joint's tpose global rotation
    tgt_of = [target_tree.index(joint_mapping[n]) for n in red_tree.node_names]
    diff = q.quat_mul_norm(red_state_g, q.quat_inverse(red_tpose_g[None]))
    new_global_red = q.quat_mul_norm(diff, tgt_tpose_g[jnp.asarray(tgt_of)][None])

    # STEP 5: every target joint takes the rotation of its nearest mapped
    # ancestor (skeleton3d.py:845-852)
    mapped_targets = {joint_mapping[n]: k for k, n in enumerate(red_tree.node_names)}
    pick = []
    for name in target_tree.node_names:
        j = target_tree.index(name)
        while name not in mapped_targets:
            j = int(target_tree.parent_indices[j])
            name = target_tree.node_names[j]
        pick.append(mapped_targets[name])
    new_global = new_global_red[:, jnp.asarray(pick)]            # [T, Jt, 4]

    new_root = target_tpose_root[None] + root_diff
    new_local = global_to_local(target_tree, new_global)
    return new_local, new_root
