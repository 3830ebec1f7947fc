from pulse_tpu.physics.model import Model, PhysicsConfig, build_model
from pulse_tpu.physics.state import (
    PhysicsState,
    state_from_kinematics,
    dof_pos_from_state,
    dof_vel_from_state,
)
from pulse_tpu.physics.step import physics_step
