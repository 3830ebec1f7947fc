"""Legacy argparse entry: flag translation parity with the reference's
get_args surface (phc/utils/config.py:208-473)."""

import pytest

from pulse_tpu.legacy_cli import (
    _ENV_TO_LEARNING,
    _TASK_TO_ENV,
    build_parser,
    translate,
)
from pulse_tpu.utils.config import load_config


def _overrides(argv):
    return translate(build_parser().parse_args(argv))


def test_reference_invocation_translates():
    ov = _overrides(
        [
            "--task", "HumanoidIm", "--num_envs", "1024", "--test",
            "--epoch", "-1", "--motion_file", "data/x.pkl",
            "--experiment", "phc_x", "--seed", "7",
            "--horizon_length", "16", "--minibatch_size", "2048",
            "--max_iterations", "500",
        ]
    )
    assert "env=im" in ov and "learning=im_ppo" in ov
    assert "num_envs=1024" in ov and "test=true" in ov and "epoch=-1" in ov
    assert "env.motion_file=data/x.pkl" in ov
    assert "exp_name=phc_x" in ov and "seed=7" in ov
    assert "learning.horizon_length=16" in ov
    assert "learning.minibatch_size=2048" in ov
    assert "max_epochs=500" in ov


@pytest.mark.parametrize("task", sorted(_TASK_TO_ENV))
def test_every_task_maps_to_loadable_config(task):
    """Every legacy --task value must translate to overrides the strict
    config loader accepts (typos would raise)."""
    ov = _overrides(["--task", task, "--num_envs", "2"])
    cfg = load_config(ov)
    assert cfg["num_envs"] == 2


def test_isaac_only_flags_are_accepted_noops(capsys):
    ov = _overrides(["--task", "Humanoid", "--headless", "--horovod",
                     "--rl_device", "cuda:0"])
    assert ov[0] == "env=im"
    out = capsys.readouterr().out
    assert "not applicable" in out


def test_every_mapped_env_has_explicit_learning_pairing():
    """A task whose env group misses _ENV_TO_LEARNING silently falls back
    to im_ppo — require the pairing to be explicit."""
    missing = sorted(set(_TASK_TO_ENV.values()) - set(_ENV_TO_LEARNING))
    assert not missing, f"env groups without a learning pairing: {missing}"


def test_llc_checkpoint_translates_to_pnn_checkpoint():
    ov = _overrides(["--task", "HumanoidImMCP", "--llc_checkpoint", "pnn.pth"])
    assert "env=im_mcp" in ov
    assert "env.pnn_checkpoint=pnn.pth" in ov
    # and the strict loader accepts it (im_mcp.yaml declares the key)
    cfg = load_config(ov)
    assert cfg["env"]["pnn_checkpoint"] == "pnn.pth"


def test_unknown_task_errors():
    with pytest.raises(SystemExit):
        _overrides(["--task", "ShadowHand"])
