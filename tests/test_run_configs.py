"""Config wiring: every shipped env/learning combo must build."""

import jax
import pytest

from pulse_tpu.utils.config import load_config
from pulse_tpu import run as run_mod


# every shipped env YAML must build — enumerate the directory so a new
# config can't ship untested
import glob as _glob
import os as _os

_CFG_DIR = _os.path.join(
    _os.path.dirname(run_mod.__file__), "configs", "env"
)
ENVS = sorted(
    _os.path.splitext(_os.path.basename(p))[0]
    for p in _glob.glob(_os.path.join(_CFG_DIR, "*.yaml"))
)
assert "im" in ENVS and "amp_getup" in ENVS and "im_shape" in ENVS


class TestConfigTree:
    @pytest.mark.parametrize("env_name", ENVS)
    def test_env_builds(self, env_name):
        cfg = load_config([f"env={env_name}", "num_envs=2"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        assert env.obs_dim > 300
        # 69 motor dofs / 32 latent z / 3 MCP composer weights
        assert env.action_dim in (69, 32, 3)

    @pytest.mark.parametrize("learning_name,env_name", [
        ("im_ppo", "im"),
        ("im_amp", "im"),
        ("im_amp", "amp"),
        ("im_ppo", "im_mcp"),
        ("im_z_fit", "im_vae"),
        ("pulse_z_task", "speed_z"),
        ("pulse_z_task", "im_z"),
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

    def test_unknown_override_raises(self):
        """A typoed override must error, not be silently ignored."""
        with pytest.raises(KeyError):
            load_config(["env=im", "env.episod_length=123"])
        with pytest.raises(KeyError):
            load_config(["env=im", "nonexistent_top=1"])
        with pytest.raises(KeyError):
            load_config(["env=im", "env.reward_specs.k_posz=1"])


class TestKnobPlumbing:
    """Every EnvConfig knob must be reachable from the YAML/CLI surface
    (round-1 VERDICT weak #5: unreachable features rot)."""

    def _env(self, *ov):
        cfg = load_config(["env=im", "num_envs=2", *ov])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        return run_mod.build_env_from_cfg(cfg, model, motion)

    def test_self_obs_v(self):
        e1 = self._env()
        e2 = self._env("env.self_obs_v=2", "env.self_obs_hist_steps=3")
        assert e2.config.self_obs_v == 2
        assert e2.self_obs_dim == 3 * e1.self_obs_dim_single

    def test_obs_noise_and_occlusion(self):
        env = self._env(
            "env.obs_noise_std=0.01", "env.occlusion_prob=0.5",
            "env.occlusion_frac=0.1",
        )
        assert env.config.obs_noise_std == 0.01
        assert env.config.occlusion_prob == 0.5
        assert env.config.occlusion_frac == 0.1

    def test_zero_out_far(self):
        env = self._env("env.zero_out_far=true", "env.zero_out_far_distance=2.5")
        assert env.config.zero_out_far
        assert env.config.zero_out_far_distance == 2.5

    def test_num_amp_obs_steps(self):
        env = self._env("env.num_amp_obs_steps=4")
        assert env.amp_obs_dim == 4 * env.amp_obs_dim_single

    def test_use_pallas_physics(self):
        env = self._env("env.use_pallas_physics=false")
        assert not env._pallas_eligible

    def test_body_lists(self):
        env = self._env(
            'env.key_bodies=["L_Hand","R_Hand"]',
            'env.reset_bodies=["Pelvis","Head"]',
            'env.track_bodies=["Head","L_Hand","R_Hand"]',
        )
        assert len(env.key_body_ids) == 2
        assert len(env.reset_body_ids) == 2
        assert len(env.track_body_ids) == 3

    def test_reward_specs(self):
        env = self._env("env.reward_specs.k_pos=50.0", "env.reward_specs.w_rot=0.4")
        assert env.config.k_pos == 50.0
        assert env.config.w_rot == 0.4

    def test_shape_obs_flags(self):
        env = self._env("env.has_shape_obs=true", "env.has_limb_weight_obs=true")
        assert env.shape_extra_dim == 21

    def test_shape_variation(self):
        env = self._env("env.shape_variation=true")
        assert env.batched_model is not None

    def test_control_mode(self):
        env = self._env("env.control_mode=force", "env.power_scale=0.5")
        assert env.config.control_mode == "force"
        assert env.config.power_scale == 0.5


class TestWithConfig:
    """run_eval rebuilds envs via with_config; subclass ctor args and
    post-construction state must survive (round-2 VERDICT weak #6)."""

    @pytest.mark.parametrize("env_name", ENVS)
    def test_with_config_preserves_type_and_args(self, env_name):
        import dataclasses as dc

        cfg = load_config([f"env={env_name}", "num_envs=2"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        inner = getattr(env, "env", env)  # unwrap Z
        new = env.with_config(
            dc.replace(inner.config, enable_early_termination=False)
        )
        new_inner = getattr(new, "env", new)
        assert type(new) is type(env)
        assert type(new_inner) is type(inner)
        assert not new_inner.config.enable_early_termination
        assert new.obs_dim == env.obs_dim
        assert new.action_dim == env.action_dim
        # subclass ctor args survive the rebuild
        for attr in ("termination_height", "strike_bodies", "sensor_mode"):
            if hasattr(inner, attr):
                assert getattr(new_inner, attr) == getattr(inner, attr)

    def test_with_config_keeps_shape_variation(self):
        import dataclasses as dc
        import jax as _jax

        cfg = load_config(["env=im", "num_envs=2", "env.shape_variation=true"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        assert env.batched_model is not None
        new = env.with_config(
            dc.replace(env.config, enable_early_termination=False)
        )
        assert new.batched_model is not None
        # resample still works on the rebuilt env (args carried over)
        new.resample_shapes(_jax.random.PRNGKey(3))


class TestAmpObsV2:
    """amp_obs_v=2 disc obs (≙ build_amp_observations_smpl_v2,
    humanoid_amp.py:973-1017): key-body velocity channel + shape/limb
    trailing channels wiring."""

    def _env(self, *ov):
        cfg = load_config(["env=im", "num_envs=2", *ov])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        return run_mod.build_env_from_cfg(cfg, model, motion)

    def test_dims_and_reset(self):
        import numpy as np

        e1 = self._env()
        env = self._env("env.amp_obs_v=2")
        K = len(env.key_body_ids)
        assert env.amp_obs_dim_single == e1.amp_obs_dim_single + 3 * K
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = env.reset(keys)
        assert state.amp_obs.shape == (2, env.amp_obs_dim)
        assert np.all(np.isfinite(np.asarray(state.amp_obs)))
        out = env.step(state, 0.0 * state.obs[:, : env.action_dim])
        assert np.all(np.isfinite(np.asarray(out.amp_obs)))

    def test_disc_shape_channels(self):
        import numpy as np

        env = self._env(
            "env.amp_obs_v=2", "env.has_shape_obs=true",
            "env.has_shape_obs_disc=true", "env.has_limb_weight_obs=true",
            "env.shape_variation=true",
        )
        e0 = self._env("env.amp_obs_v=2")
        assert env.amp_obs_dim_single == e0.amp_obs_dim_single + 11 + 10
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = env.reset(keys)
        assert np.all(np.isfinite(np.asarray(state.amp_obs)))
        # the two envs carry different shapes -> different disc rows
        rows = np.asarray(state.amp_hist[:, 0, -21:])
        assert not np.allclose(rows[0], rows[1])

    def test_disc_flag_requires_shape_obs(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._env("env.has_shape_obs_disc=true")
