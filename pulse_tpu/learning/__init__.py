from pulse_tpu.learning import networks, ppo, amp, distill
from pulse_tpu.learning.running_norm import RunningMeanStd
