"""PNN progressive curriculum: advance to the next primitive column.

≙ the reference's scripts/pmcp/forward_pmcp.py:55-59: after training
primitive k on the current (hard-negative) motion set, copy column k's
weights into column k+1 as its initialization and emit the failed-motion
set that the next stage trains on.

Usage:
  python scripts/forward_pmcp.py --ckpt output/phc/ckpt --column 0 \
      --failed failed.json --out output/phc_next
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def copy_pnn_column(params: dict, src: int, dst: int) -> dict:
    """Copy every col{src}_* parameter subtree onto col{dst}_*."""
    out = dict(params)
    pat = re.compile(rf"^col{src}_(.+)$")
    for name in list(params):
        m = pat.match(name)
        if m:
            out[f"col{dst}_{m.group(1)}"] = jax.tree.map(lambda x: x, params[name])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--column", type=int, default=0)
    ap.add_argument("--failed", default="")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pulse_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    # restore as a raw pytree (StandardCheckpointer can restore without target
    # when metadata is present)
    import orbax.checkpoint as ocp

    path = latest_checkpoint(args.ckpt) or args.ckpt
    state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    params = state["params"] if "params" in state else state
    params = copy_pnn_column(params, args.column, args.column + 1)
    if "params" in state:
        state["params"] = params
    save_checkpoint(args.out, 0, state)
    print(f"copied column {args.column} -> {args.column + 1}; wrote {args.out}")

    if args.failed:
        with open(args.failed) as fh:
            failed = json.load(fh)
        n_failed = sum(failed) if isinstance(failed, list) else len(failed)
        print(f"next stage trains on {n_failed} failed motions")


if __name__ == "__main__":
    main()
