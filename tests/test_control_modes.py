"""Control-mode parity tests (≙ humanoid.py:1222-1297): the env supports
'isaac_pd' (implicit stable-PD, default), 'pd' (explicit PD torques
recomputed per substep), and 'force' (raw torques scaled by motor effort ×
power_scale)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import HumanoidImEnv, EnvConfig
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.step import physics_step_torque


@pytest.fixture(scope="module")
def parts():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    tree = spec.skeleton
    clips = make_synthetic_clips(tree, num_clips=1, seconds=1.5)
    motion = build_motion_data(tree, clips)
    return model, motion


@pytest.mark.parametrize("mode", ["pd", "force"])
def test_mode_steps_finite(parts, mode):
    model, motion = parts
    env = HumanoidImEnv(model, motion, EnvConfig(control_mode=mode))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    state = jax.jit(env.reset)(keys)
    step = jax.jit(env.step)
    act = jnp.zeros((2, env.action_dim))
    for _ in range(3):
        state = step(state, act)
    assert np.all(np.isfinite(np.asarray(state.obs)))
    assert np.all(np.isfinite(np.asarray(state.physics.root_pos)))
    # nothing launched into orbit
    assert np.asarray(state.physics.root_pos[:, 2]).max() < 3.0


def test_zero_torque_is_passive(parts):
    """With zero actuation the humanoid is a ragdoll: it collapses (root
    well below standing) and passive damping keeps the collapse from
    injecting energy (no bounce above the start height). Drives the physics
    directly so env auto-resets can't re-teleport mid-test."""
    model, motion = parts
    env = HumanoidImEnv(model, motion, EnvConfig(control_mode="force"))
    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(1), 1))
    ph = jax.tree.map(lambda x: x[0], state.physics)
    h0 = float(ph.root_pos[2])
    tau = jnp.zeros((69,))
    step = jax.jit(lambda s: physics_step_torque(model, s, tau))
    heights = []
    for _ in range(30):
        ph = step(ph)
        heights.append(float(ph.root_pos[2]))
    assert min(heights[-5:]) < h0 - 0.3, heights
    assert max(heights) < h0 + 0.25, heights


def test_force_mode_scales_with_effort(parts):
    """Same action, larger torque -> different trajectory (the scale matters)."""
    model, motion = parts
    key = jax.random.PRNGKey(2)
    act = 0.1 * jax.random.normal(key, (1, 69))
    outs = []
    for ps in (0.1, 1.0):
        env = HumanoidImEnv(model, motion, EnvConfig(control_mode="force", power_scale=ps))
        state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(3), 1))
        state = jax.jit(env.step)(state, act)
        outs.append(np.asarray(state.physics.joint_omega))
    assert np.abs(outs[0] - outs[1]).max() > 1e-3


def test_torque_step_respects_limits(parts):
    """Huge constant torque must still leave the state finite (clip at
    torque_limit + implicitly-damped joint-limit springs keep it stable)."""
    model, motion = parts
    env = HumanoidImEnv(model, motion, EnvConfig(control_mode="force"))
    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(4), 1))
    ph = state.physics
    tau = jnp.full((69,), 1e6)
    out = jax.jit(lambda s: physics_step_torque(model, s, tau))(
        jax.tree.map(lambda x: x[0], ph)
    )
    assert np.all(np.isfinite(np.asarray(out.joint_rot)))
    assert np.all(np.isfinite(np.asarray(out.root_pos)))
