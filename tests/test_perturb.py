"""Projectile perturbation env tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env.humanoid_im_perturb import HumanoidImPerturbEnv, PerturbConfig
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


class TestPerturb:
    def test_projectiles_fly_and_relaunch(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImPerturbEnv(
            model, motion,
            PerturbConfig(num_amp_obs_steps=2, proj_interval=3),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        states, projs = jax.jit(env.reset)(keys)
        assert projs.pos.shape == (2, 3)
        # projectile starts ~proj_distance away
        d0 = np.linalg.norm(
            np.asarray(projs.pos[:, :2] - states.physics.root_pos[:, :2]), axis=-1
        )
        np.testing.assert_allclose(d0, 2.0, atol=0.1)
        step = jax.jit(env.step)
        p_prev = np.asarray(projs.pos)
        for i in range(4):
            (states, projs) = step((states, projs), jnp.zeros((2, env.action_dim)))
            assert np.all(np.isfinite(np.asarray(states.obs)))
        # projectile moved
        assert np.abs(np.asarray(projs.pos) - p_prev).max() > 0.05
