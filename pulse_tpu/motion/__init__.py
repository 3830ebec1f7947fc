from pulse_tpu.motion.motion_lib import (
    MotionData,
    build_motion_data,
    get_motion_state,
    sample_motions,
    sample_time,
    sample_time_interval,
    update_hard_sampling_weight,
    update_soft_sampling_weight,
)
from pulse_tpu.motion.synthetic import make_synthetic_clips
