"""Tiny articulated test robots.

The SMPL humanoid's 24-body Pallas kernel is too large to interpret or
compile on CPU in reasonable time (its tree passes unroll per body); these
small chains exercise the SAME kernel builder, ABA passes, and shard_map
composition at a size the 8-device virtual CPU mesh can afford — used by
__graft_entry__.dryrun_multichip to prove the sharded Pallas path end to
end without TPU hardware.
"""

from __future__ import annotations

import numpy as np

from pulse_tpu.assets.robot_spec import RobotSpec
from pulse_tpu.kinematics.skeleton import SkeletonTree


def make_toy_chain_spec(num_bodies: int = 3) -> RobotSpec:
    """A vertical chain of sphere-bodied links with ball joints: body 0 is
    the floating root at ~1 m, each child hangs 0.25 m below its parent.
    Same field conventions as the SMPL humanoid spec."""
    J = num_bodies
    names = tuple(f"link{i}" for i in range(J))
    parents = np.asarray([-1] + list(range(J - 1)), np.int32)
    local_t = np.zeros((J, 3), np.float32)
    local_t[1:, 2] = -0.25

    r = 0.08
    mass = 1.0
    inertia_s = (2.0 / 5.0) * mass * r * r  # solid sphere
    return RobotSpec(
        skeleton=SkeletonTree(names, parents, local_t),
        joint_stiffness=np.full(J - 1, 50.0, np.float32),
        joint_damping=np.full(J - 1, 5.0, np.float32),
        joint_armature=np.full(J - 1, 0.01, np.float32),
        dof_lower=np.full(3 * (J - 1), -np.pi, np.float32),
        dof_upper=np.full(3 * (J - 1), np.pi, np.float32),
        geom_body=np.arange(J, dtype=np.int32),
        geom_type=np.zeros(J, np.int32),          # spheres
        geom_pos=np.zeros((J, 3), np.float32),
        geom_quat=np.tile(np.asarray([0, 0, 0, 1.0], np.float32), (J, 1)),
        geom_size=np.tile(np.asarray([r, 0.0, 0.0], np.float32), (J, 1)),
        geom_density=np.full(J, 1000.0, np.float32),
        geom_friction=np.full(J, 1.0, np.float32),
        body_mass=np.full(J, mass, np.float32),
        body_com=np.zeros((J, 3), np.float32),
        body_inertia=np.tile(
            (inertia_s * np.eye(3, dtype=np.float32))[None], (J, 1, 1)
        ),
    )
