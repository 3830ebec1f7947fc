"""Config wiring: every shipped env/learning combo must build."""

import jax
import pytest

from pulse_tpu.utils.config import load_config
from pulse_tpu import run as run_mod


ENVS = [
    "im", "im_getup", "im_vae", "im_vr", "speed", "reach", "traj",
    "strike", "pedestrian_terrain", "speed_z", "reach_z", "traj_z", "strike_z",
]


class TestConfigTree:
    @pytest.mark.parametrize("env_name", ENVS)
    def test_env_builds(self, env_name):
        cfg = load_config([f"env={env_name}", "num_envs=2"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        assert env.obs_dim > 300
        assert env.action_dim in (69, 32)

    @pytest.mark.parametrize("learning_name,env_name", [
        ("im_ppo", "im"),
        ("im_amp", "im"),
        ("im_z_fit", "im_vae"),
        ("pulse_z_task", "speed_z"),
    ])
    def test_agent_builds(self, learning_name, env_name):
        cfg = load_config(
            [f"env={env_name}", f"learning={learning_name}", "num_envs=2"]
        )
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        agent = run_mod.build_agent_from_cfg(cfg, env)
        assert agent is not None

    def test_dotted_overrides(self):
        cfg = load_config(["env=im", "env.episode_length=123", "seed=7"])
        assert cfg["env"]["episode_length"] == 123
        assert cfg["seed"] == 7
