"""Metric logging: JSONL always; wandb / tensorboard when available.

≙ the reference's observability stack (wandb init run_hydra.py:305-314,
tensorboardX scalars common_agent.py:152-168, console epoch lines). JSONL is
the source of truth (hermetic environments have no network); wandb and
tensorboard attach when importable and configured.
"""

from __future__ import annotations

import json
import os
from typing import Any


class MetricLogger:
    def __init__(self, out_dir: str, exp_name: str = "default",
                 use_wandb: bool = False, wandb_project: str = "pulse_tpu"):
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=wandb_project, name=exp_name, dir=out_dir,
                    mode=os.environ.get("WANDB_MODE", "offline"),
                )
            except Exception:
                self._wandb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
        except Exception:
            self._tb = None

    def log(self, metrics: dict[str, Any], step: int) -> None:
        row = {k: (float(v) if hasattr(v, "item") or isinstance(v, float) else v)
               for k, v in metrics.items()}
        row["epoch"] = step
        with open(self.jsonl_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(row, step=step)
        if self._tb is not None:
            for k, v in row.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
