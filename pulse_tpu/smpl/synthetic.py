"""Schema-exact synthetic SMPL model data.

The real SMPL release pickles are licensed and not shipped in this
container, but the whole shape pipeline (load_smpl_model -> shaped_joints /
lbs -> skeleton_from_betas -> per-env physics models) must be executable and
testable. This module fabricates a model with the exact schema of a SMPL
release pickle (the keys `load_smpl_model` reads: v_template, shapedirs,
J_regressor, weights, kintree_table — smpl/body_model.py:54-72 ≙ the
external smpl_sim SMPL_Parser's inputs), constructed so that:

  - at betas = 0, the regressed rest joints EQUAL the given skeleton's
    joints (so the zero-shape physics model reproduces the default humanoid
    bit-exactly), and
  - beta[0] acts like a stature component (uniform ±5%/unit scale about the
    pelvis) with smaller random smooth components behind it, so shape
    variation is non-degenerate.

A real SMPL_NEUTRAL.pkl drops into the same `load_smpl_model` call.
"""

from __future__ import annotations

import pickle

import numpy as np

from pulse_tpu.kinematics.skeleton import SkeletonTree


def rest_joints(tree: SkeletonTree) -> np.ndarray:
    """Global joint positions of the rest pose (identity rotations)."""
    J = tree.num_joints
    joints = np.zeros((J, 3), np.float64)
    for i in range(J):
        p = int(tree.parent_indices[i])
        base = joints[p] if p >= 0 else 0.0
        joints[i] = base + np.asarray(tree.local_translation[i], np.float64)
    return joints


def synthetic_smpl_data(
    tree: SkeletonTree,
    num_surface_verts: int = 256,
    num_betas: int = 10,
    seed: int = 0,
) -> dict:
    """Build the SMPL pickle dict. Vertex layout: the first J vertices are
    joint anchors (J_regressor selects them exactly); the rest are 'surface'
    vertices hung off random bodies at small offsets so LBS height-fix has
    geometry to work with.

    Joints are emitted in SMPL CANONICAL order (SMPL_JOINT_NAMES,
    body_model.py) — real release pickles use that order, so everything
    downstream must do the name-based reorder either way. `tree` may be in
    any order (e.g. the MJCF humanoid's depth-first order)."""
    from pulse_tpu.smpl.body_model import SMPL_JOINT_NAMES

    rng = np.random.RandomState(seed)
    J = tree.num_joints
    # permute tree joints into SMPL canonical order
    perm = np.asarray([tree.node_names.index(n) for n in SMPL_JOINT_NAMES[:J]])
    inv = np.empty(J, np.int64)
    inv[perm] = np.arange(J)
    joints = rest_joints(tree)[perm]
    parents = np.asarray(
        [
            -1 if int(tree.parent_indices[orig]) < 0 else int(inv[int(tree.parent_indices[orig])])
            for orig in perm
        ]
    )
    tree = SkeletonTree(
        tuple(SMPL_JOINT_NAMES[:J]),
        parents,
        np.asarray(
            [
                joints[i] - (joints[parents[i]] if parents[i] >= 0 else 0.0)
                for i in range(J)
            ]
        ),
    )

    surf_body = rng.randint(0, J, num_surface_verts)
    surf_off = rng.uniform(-0.09, 0.09, (num_surface_verts, 3))
    v_template = np.concatenate([joints, joints[surf_body] + surf_off], axis=0)
    V = v_template.shape[0]

    # J_regressor: joint j = anchor vertex j, exactly
    J_regressor = np.zeros((J, V), np.float64)
    J_regressor[np.arange(J), np.arange(J)] = 1.0

    # skinning weights: anchors follow their joint; surface verts follow
    # their body with a little parent blend
    weights = np.zeros((V, J), np.float64)
    weights[np.arange(J), np.arange(J)] = 1.0
    for k, b in enumerate(surf_body):
        p = int(tree.parent_indices[b])
        if p >= 0:
            weights[J + k, b] = 0.8
            weights[J + k, p] = 0.2
        else:
            weights[J + k, b] = 1.0

    # shapedirs: component 0 = stature (5%/unit uniform scale about pelvis);
    # the rest are smooth random per-body displacement fields (2 cm/unit)
    shapedirs = np.zeros((V, 3, num_betas), np.float64)
    shapedirs[:, :, 0] = 0.05 * (v_template - joints[0])
    body_of_vert = np.concatenate([np.arange(J), surf_body])
    for s in range(1, num_betas):
        per_body = rng.uniform(-0.02, 0.02, (J, 3))
        shapedirs[:, :, s] = per_body[body_of_vert]

    kintree_table = np.zeros((2, J), np.int64)
    kintree_table[0] = np.asarray(tree.parent_indices, np.int64)
    kintree_table[0, 0] = 2**32 - 1  # the release pickles store uint32(-1)
    kintree_table[1] = np.arange(J)

    # triangles over consecutive surface verts on the same body, so mesh
    # renderers (scripts/render_smpl_mesh.py) have real polygons to draw
    faces = []
    order = np.argsort(surf_body, kind="stable")
    for a, b, c in zip(order[:-2], order[1:-1], order[2:]):
        if surf_body[a] == surf_body[b] == surf_body[c]:
            faces.append((J + a, J + b, J + c))
    faces = np.asarray(faces if faces else np.zeros((0, 3)), np.int64)

    return {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "J_regressor": J_regressor,
        "weights": weights,
        "kintree_table": kintree_table,
        "f": faces,
    }


def write_smpl_pickle(path: str, tree: SkeletonTree, **kwargs) -> str:
    with open(path, "wb") as fh:
        pickle.dump(synthetic_smpl_data(tree, **kwargs), fh)
    return path
