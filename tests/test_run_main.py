"""End-to-end CLI: tiny training runs through pulse_tpu.run.main."""

import json
import os

import pytest

from pulse_tpu import run as run_mod


class TestMain:
    def test_train_loop_and_checkpoint(self, tmp_path, monkeypatch):
        out = str(tmp_path / "out")
        run_mod.main([
            "env=im", "learning=im_ppo", "num_envs=2", "max_epochs=2",
            "log_frequency=1", "save_frequency=0", f"output_dir={out}",
            "exp_name=t", "env.num_synthetic_clips=1",
            "learning.horizon_length=3", "learning.minibatch_size=6",
            "learning.mini_epochs=1",
            "learning.actor_units=[16]", "learning.critic_units=[16]",
        ])
        metrics = [
            json.loads(l) for l in open(os.path.join(out, "t", "metrics.jsonl"))
        ]
        assert len(metrics) == 2
        assert "reward_mean" in metrics[0]
        # final checkpoint written
        from pulse_tpu.utils.checkpoint import latest_checkpoint

        assert latest_checkpoint(os.path.join(out, "t", "ckpt")) is not None

    def test_resume_from_checkpoint(self, tmp_path):
        out = str(tmp_path / "out2")
        args = [
            "env=im", "learning=im_ppo", "num_envs=2", "max_epochs=2",
            "log_frequency=1", "save_frequency=0", f"output_dir={out}",
            "exp_name=t", "env.num_synthetic_clips=1",
            "learning.horizon_length=3", "learning.minibatch_size=6",
            "learning.mini_epochs=1",
            "learning.actor_units=[16]", "learning.critic_units=[16]",
        ]
        run_mod.main(args)
        # resume (epoch=-1 -> latest) and continue to epoch 3
        run_mod.main(args + ["epoch=-1", "max_epochs=3"])
        metrics = [
            json.loads(l) for l in open(os.path.join(out, "t", "metrics.jsonl"))
        ]
        assert metrics[-1]["epoch"] == 2
