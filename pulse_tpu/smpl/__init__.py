from pulse_tpu.smpl.body_model import SMPLModel, load_smpl_model, SMPL_JOINT_NAMES
