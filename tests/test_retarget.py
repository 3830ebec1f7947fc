"""Retargeting golden tests against the LIVE poselib retarget_to
(skeleton3d.py:717-860) via the reference shim."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import reference_shim as rs
from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.kinematics.retarget import keep_nodes, retarget_to
from pulse_tpu.kinematics.skeleton import SkeletonTree, forward_kinematics
from pulse_tpu.ops import quat as q

from scipy.spatial.transform import Rotation as sRot


@pytest.fixture(scope="module")
def src_tree():
    return load_smpl_humanoid().skeleton


@pytest.fixture(scope="module")
def tgt_tree(src_tree):
    """Same topology, different proportions (1.25x limbs)."""
    return SkeletonTree(
        src_tree.node_names,
        src_tree.parent_indices,
        np.asarray(src_tree.local_translation) * 1.25,
    )


def to_poselib_tree(tree):
    rs.install()
    from poselib.poselib.skeleton.skeleton3d import SkeletonTree as PTree

    return PTree(
        list(tree.node_names),
        torch.from_numpy(np.asarray(tree.parent_indices)).long(),
        torch.from_numpy(np.asarray(tree.local_translation)).float(),
    )


def rand_quats(rng, *shape):
    flat = int(np.prod(shape))
    return sRot.random(flat, random_state=rng).as_quat().astype(np.float32).reshape(*shape, 4)


@pytest.mark.parametrize("partial", [False, True])
def test_retarget_matches_poselib(src_tree, tgt_tree, partial):
    rs.install()
    from poselib.poselib.skeleton.skeleton3d import SkeletonState

    rng = np.random.RandomState(0)
    T, J = 5, src_tree.num_joints
    # small rotations around identity so the motion is plausible
    local = sRot.from_rotvec(
        0.4 * rng.randn(T * J, 3)
    ).as_quat().astype(np.float32).reshape(T, J, 4)
    root_t = (np.asarray([0, 0, 0.93]) + 0.05 * rng.randn(T, 3)).astype(np.float32)

    names = list(src_tree.node_names)
    if partial:
        for drop in ("L_Hand", "R_Hand", "L_Toe", "R_Toe"):
            names.remove(drop)
    mapping = {n: n for n in names}

    src_tpose_local = np.tile([0, 0, 0, 1.0], (J, 1)).astype(np.float32)
    tgt_tpose_local = np.tile([0, 0, 0, 1.0], (J, 1)).astype(np.float32)
    src_tpose_root = np.asarray([0, 0, 0.93], np.float32)
    tgt_tpose_root = np.asarray([0, 0, 1.17], np.float32)
    rot_to_tgt = sRot.from_euler("z", 30, degrees=True).as_quat().astype(np.float32)
    scale = 1.25

    # ---- poselib ----
    pstate = SkeletonState.from_rotation_and_root_translation(
        to_poselib_tree(src_tree), torch.from_numpy(local), torch.from_numpy(root_t),
        is_local=True,
    )
    want = pstate.retarget_to(
        mapping,
        torch.from_numpy(src_tpose_local),
        torch.from_numpy(src_tpose_root),
        to_poselib_tree(tgt_tree),
        torch.from_numpy(tgt_tpose_local),
        torch.from_numpy(tgt_tpose_root),
        torch.from_numpy(rot_to_tgt),
        scale,
    )
    want_local = want.local_rotation.numpy()
    want_root = want.root_translation.numpy()

    # ---- ours ----
    got_local, got_root = retarget_to(
        src_tree, jnp.asarray(local), jnp.asarray(root_t), mapping,
        jnp.asarray(src_tpose_local), jnp.asarray(src_tpose_root),
        tgt_tree, jnp.asarray(tgt_tpose_local), jnp.asarray(tgt_tpose_root),
        jnp.asarray(rot_to_tgt), scale,
    )
    got_local, got_root = np.asarray(got_local), np.asarray(got_root)

    np.testing.assert_allclose(got_root, want_root, atol=1e-5)
    sign = np.sign(np.sum(got_local * want_local, axis=-1, keepdims=True))
    np.testing.assert_allclose(got_local * sign, want_local, atol=2e-5)


def test_keep_nodes(src_tree):
    keep = [n for n in src_tree.node_names if n not in ("L_Knee", "R_Knee")]
    red, old_idx = keep_nodes(src_tree, keep)
    assert "L_Knee" not in red.node_names
    # ankle reconnects to hip with the summed chain offset
    ia = red.node_names.index("L_Ankle")
    assert red.node_names[red.parent_indices[ia]] == "L_Hip"
    full = np.asarray(src_tree.local_translation)
    i_knee = src_tree.node_names.index("L_Knee")
    i_ankle = src_tree.node_names.index("L_Ankle")
    np.testing.assert_allclose(
        red.local_translation[ia], full[i_knee] + full[i_ankle], atol=1e-6
    )
