from pulse_tpu.kinematics.skeleton import (
    SkeletonTree,
    forward_kinematics,
    global_to_local,
    compute_linear_velocity,
    compute_angular_velocity,
)
