"""Left/right motion mirroring augmentation.

≙ the optional mirror augmentation in the reference's AMASS conversion
(convert_amass_isaac.py left_to_right_index remap): reflect the motion
across the character's sagittal (xz) plane by swapping L_*/R_* joints and
conjugating rotations appropriately.

For a reflection across the y=0 plane, a rotation (x, y, z, w) maps to
(-x, y, -z, w) after the left/right joint swap, and translations negate y.
"""

from __future__ import annotations

import numpy as np

from pulse_tpu.kinematics.skeleton import SkeletonTree


def mirror_index(tree: SkeletonTree) -> np.ndarray:
    """Joint permutation swapping L_ and R_ prefixed bodies."""
    names = tree.node_names
    idx = []
    for n in names:
        if n.startswith("L_"):
            idx.append(names.index("R_" + n[2:]))
        elif n.startswith("R_"):
            idx.append(names.index("L_" + n[2:]))
        else:
            idx.append(names.index(n))
    return np.asarray(idx, np.int32)


def mirror_clip(tree: SkeletonTree, clip: dict) -> dict:
    """Return the left/right mirrored version of a clip."""
    perm = mirror_index(tree)
    lr = np.asarray(clip["local_rotation"])[:, perm].copy()
    # conjugate each rotation by the reflection M = diag(1,-1,1): the axis
    # mirrors (ax,-ay,az) and the angle negates, so (x,y,z,w) -> (-x,y,-z,w)
    lr[..., 0] *= -1.0
    lr[..., 2] *= -1.0
    rt = np.asarray(clip["root_translation"]).copy()
    rt[:, 1] *= -1.0
    return {"fps": clip["fps"], "local_rotation": lr, "root_translation": rt}
