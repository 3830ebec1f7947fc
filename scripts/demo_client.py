"""Interactive demo viewer/driver client for scripts/demo_server.py.

≙ the reference's demo clients (scripts/ws_client.py viewer +
video_to_pose_server.py driver, humanoid_im_demo.py clip switching): connect
to a running demo server, optionally switch the driven motion clip, and
either print frame summaries or render a live matplotlib stick figure.

Usage:
  python scripts/demo_client.py [--port 8765] [--frames 300]
      [--motion K] [--time T]       # switch the server onto clip K at T s
      [--render out.mp4|out.gif]    # save a stick-figure animation
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--motion", type=int, default=-1)
    ap.add_argument("--time", type=float, default=0.0)
    ap.add_argument("--render", default="")
    args = ap.parse_args()

    from pulse_tpu.utils.pose_server import PoseClient

    client = PoseClient(host=args.host, port=args.port)
    if args.motion >= 0:
        client.send({"cmd": "motion", "id": args.motion, "time": args.time})
        print(f"requested motion {args.motion} @ {args.time}s")

    frames = []
    for i in range(args.frames):
        frame = client.recv()
        frames.append(frame)
        if i % 30 == 0:
            bp = np.asarray(frame["body_pos"])
            print(
                f"t={frame['t']:7.3f}s reward={frame['reward']:.3f} "
                f"root=({bp[0, 0]:+.2f},{bp[0, 1]:+.2f},{bp[0, 2]:+.2f})"
            )
    client.close()

    if args.render:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.animation as anim
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(5, 5))
        ax = fig.add_subplot(projection="3d")
        pts = np.asarray([f["body_pos"] for f in frames])

        def draw(i):
            ax.cla()
            p = pts[i]
            ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=12)
            c = pts[i, 0]
            ax.set_xlim(c[0] - 1, c[0] + 1)
            ax.set_ylim(c[1] - 1, c[1] + 1)
            ax.set_zlim(0, 2)
            ax.set_title(f"t={frames[i]['t']:.2f}s")

        a = anim.FuncAnimation(fig, draw, frames=len(frames), interval=33)
        a.save(args.render, writer="pillow" if args.render.endswith(".gif") else None)
        print(f"wrote {args.render}")


if __name__ == "__main__":
    main()
