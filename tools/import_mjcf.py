"""CLI: convert an MJCF robot description into a pulse_tpu RobotSpec JSON.

Usage: python tools/import_mjcf.py <in.xml> <out.json>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulse_tpu.assets.mjcf import parse_mjcf


def main():
    src, dst = sys.argv[1], sys.argv[2]
    spec = parse_mjcf(src)
    spec.save(dst)
    print(
        f"{dst}: {spec.num_bodies} bodies, {spec.num_joints} ball joints, "
        f"{spec.num_dof} dof, {len(spec.geom_body)} geoms, "
        f"total mass {spec.body_mass.sum():.2f} kg"
    )


if __name__ == "__main__":
    main()
