"""Kinematic motion playback — no physics, pure FK (BASELINE config #1).

≙ scripts/vis/vis_motion.py:236-300 (MotionLib playback through the Isaac
viewer) re-imagined headless: sample the motion library along its timeline,
dump global body positions/rotations to .npz, and optionally render a
matplotlib stick-figure animation.

Usage:
  python scripts/play_motion.py [--motion_file f.mtn] [--clip 0] \
      [--out playback.npz] [--render playback.mp4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion_file", default="")
    ap.add_argument("--clip", type=int, default=0)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--out", default="playback.npz")
    ap.add_argument("--render", default="")
    args = ap.parse_args()

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.motion import build_motion_data, get_motion_state, make_synthetic_clips
    from pulse_tpu.motion.loader import load_motion_file

    spec = load_smpl_humanoid()
    tree = spec.skeleton
    if args.motion_file:
        clips = load_motion_file(args.motion_file, tree)
    else:
        clips = make_synthetic_clips(tree, num_clips=max(args.clip + 1, 1))
    data = build_motion_data(tree, clips)

    length = float(data.motion_lengths[args.clip])
    times = np.arange(0.0, length, 1.0 / args.fps, dtype=np.float32)
    ids = jnp.full(times.shape, args.clip, jnp.int32)
    st = get_motion_state(data, ids, jnp.asarray(times))
    body_pos = np.asarray(st["rg_pos"])
    body_rot = np.asarray(st["rb_rot"])
    np.savez(
        args.out,
        body_pos=body_pos,
        body_rot=body_rot,
        times=times,
        node_names=np.asarray(tree.node_names),
        parents=tree.parent_indices,
    )
    print(f"wrote {args.out}: {len(times)} frames x {body_pos.shape[1]} bodies")

    if args.render:
        render(args.render, body_pos, tree, args.fps)


def render(path: str, body_pos: np.ndarray, tree, fps: float):
    """Stick-figure animation (≙ poselib visualization/plt plotters)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    parents = tree.parent_indices
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    def draw(i):
        ax.clear()
        p = body_pos[i]
        for j in range(1, len(parents)):
            pa = parents[j]
            ax.plot(
                [p[pa, 0], p[j, 0]], [p[pa, 1], p[j, 1]], [p[pa, 2], p[j, 2]], "b-"
            )
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], c="r", s=8)
        c = p[0]
        ax.set_xlim(c[0] - 1, c[0] + 1)
        ax.set_ylim(c[1] - 1, c[1] + 1)
        ax.set_zlim(0, 2)
        ax.set_title(f"frame {i}")

    anim = animation.FuncAnimation(fig, draw, frames=len(body_pos), interval=1000 / fps)
    anim.save(path, writer=animation.FFMpegWriter(fps=fps) if path.endswith(".mp4") else "pillow")
    print(f"rendered {path}")


if __name__ == "__main__":
    main()
