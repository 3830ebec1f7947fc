from pulse_tpu.env import kernels
from pulse_tpu.env.humanoid_im import HumanoidImEnv, EnvConfig, EnvState
