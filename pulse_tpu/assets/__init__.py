import os

from pulse_tpu.assets.robot_spec import RobotSpec, GeomType
from pulse_tpu.assets.mjcf import parse_mjcf

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def load_smpl_humanoid() -> RobotSpec:
    """The mean-shape SMPL humanoid (24 bodies, 23 ball joints, 69 dof).

    Loaded from the committed JSON spec (generated once by
    tools/import_mjcf.py from a SMPL-humanoid MJCF; ≙ the reference's static
    asset phc/data/assets/mjcf/smpl_humanoid.xml)."""
    return RobotSpec.load(os.path.join(_DATA_DIR, "smpl_humanoid.json"))
