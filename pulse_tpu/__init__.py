"""pulse_tpu — a TPU-native physics-based humanoid control framework.

A from-scratch JAX/XLA re-design of the capabilities of PULSE
(ZhengyiLuo/PULSE, ICLR 2024): GPU-vectorized humanoid motion imitation,
VAE latent-space distillation, and downstream hierarchical RL — rebuilt as a
single pure-functional, fully jitted pipeline in which articulated rigid-body
physics, reference-motion lookup, observation/reward kernels, and the learner
all trace into one XLA program vmapped over thousands of humanoids.

Subpackages
-----------
ops         batched quaternion / transform math (≙ poselib rotation3d + phc torch_utils)
kinematics  skeleton trees, forward kinematics, motion representation (≙ poselib)
assets      humanoid robot specs (MJCF import, SMPL humanoid tables)
motion      device-resident motion library (≙ phc/utils/motion_lib_*)
physics     articulated rigid-body dynamics core (replaces Isaac Gym)
env         task environments as pure functions (≙ phc/env/tasks)
learning    PPO/AMP/VAE-distillation learners and networks (≙ phc/learning)
parallel    device-mesh sharding utilities (pjit / shard_map)
utils       config tree, flags, checkpointing, profiling
"""

__version__ = "0.1.0"
