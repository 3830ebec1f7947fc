from pulse_tpu.utils.flags import flags
from pulse_tpu.utils.benchmarking import timeit, Timer
