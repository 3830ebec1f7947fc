"""Golden parity for the fused Pallas post-physics path (env/pallas_obs.py).

The fused path must be semantically identical to the per-env XLA
_finish_step on the supported surface. Both paths here consume the SAME
XLA-computed physics output, so the comparison isolates exactly the new
kernels (reward/amp/termination + observation) and the batched auto-reset
merge — and stays affordable: the obs kernels in interpret mode are a few
thousand elementwise ops, unlike the physics mega-kernel (whose interpret
cost keeps tests/test_pallas_substep.py opt-in).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import EnvConfig, HumanoidImEnv
from pulse_tpu.env import pallas_obs as pobs
from pulse_tpu.motion import build_motion_data
from pulse_tpu.motion.synthetic import make_synthetic_clips
from pulse_tpu.ops import quat as q_ops
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.step import physics_step


# ------------------------------------------------------------------ #
# tile-helper parity (plain arrays — the helpers are shape-generic)
# ------------------------------------------------------------------ #

def _rand_quats(n, seed=0, near_vertical=False):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    if near_vertical:
        # +x rotated near straight up: the heading-degenerate corner
        base = q_ops.quat_from_angle_axis(
            jnp.full((n,), np.pi / 2 - 1e-4), jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
        )
        jitter = 1e-5 * rng.standard_normal((n, 4)).astype(np.float32)
        q = np.asarray(base) + jitter
    return np.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


@pytest.mark.parametrize("near_vertical", [False, True])
def test_heading_inv_helper(near_vertical):
    q = _rand_quats(256, seed=1, near_vertical=near_vertical)
    s, w = pobs._heading_inv_sz([q[:, 0], q[:, 1], q[:, 2], q[:, 3]])
    got = np.stack([np.zeros_like(s), np.zeros_like(s), s, w], axis=-1)
    want = np.asarray(q_ops.calc_heading_quat_inv(jnp.asarray(q)))
    # quaternion sign is a gauge choice — compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True) + 1e-12)
    # half-angle sqrt formulation vs atan2+sin/cos: ~3e-5 f32 noise in the
    # generic case; near-vertical the heading itself is ill-conditioned
    # (read off ~1e-5-magnitude xy components), so only agreement of the
    # ill-posed answer is checked, not precision
    atol = 5e-3 if near_vertical else 1e-4
    np.testing.assert_allclose(got * sign, want, atol=atol)


def test_hz_mul_and_rot_helpers():
    rng = np.random.default_rng(2)
    q = _rand_quats(256, seed=3)
    h = np.asarray(q_ops.calc_heading_quat_inv(jnp.asarray(q)))
    v = rng.standard_normal((256, 3)).astype(np.float32)
    s, w = h[:, 2], h[:, 3]
    got_mul = np.stack(pobs._hz_mul(s, w, [q[:, k] for k in range(4)]), -1)
    want_mul = np.asarray(q_ops.quat_mul(jnp.asarray(h), jnp.asarray(q)))
    np.testing.assert_allclose(got_mul, want_mul, atol=1e-5)
    got_rot = np.stack(pobs._hz_rot(s, w, [v[:, k] for k in range(3)]), -1)
    want_rot = np.asarray(q_ops.quat_rotate(jnp.asarray(h), jnp.asarray(v)))
    np.testing.assert_allclose(got_rot, want_rot, atol=1e-5)


def test_tan_norm_and_quat_angle_helpers():
    q = _rand_quats(512, seed=4)
    comp = [q[:, k] for k in range(4)]
    got = np.stack(pobs._tan_norm(comp), axis=-1)
    want = np.asarray(q_ops.quat_to_tan_norm(jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # sign invariance
    got_neg = np.stack(pobs._tan_norm([-c for c in comp]), axis=-1)
    np.testing.assert_allclose(got_neg, got, atol=1e-6)
    ang = np.asarray(pobs._quat_angle(comp))
    want_ang = np.asarray(q_ops.quat_angle(jnp.asarray(q)))
    np.testing.assert_allclose(ang, want_ang, atol=1e-4)


def test_amp_obs_dim_matches_env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    for amp_v in (1, 2):
        env = HumanoidImEnv(model, motion, EnvConfig(amp_obs_v=amp_v))
        e = pobs.env_consts_from(env)
        assert (
            pobs.amp_obs_dim(e["J"], len(e["key_ids"]), amp_v, e["root_height_obs"])
            == env.amp_obs_dim_single
        )


# ------------------------------------------------------------------ #
# full fused-path parity (interpret-mode kernels, B = one tile block)
# ------------------------------------------------------------------ #

@pytest.fixture(scope="module")
def im_setup():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
    clips = make_synthetic_clips(spec.skeleton, num_clips=3, seconds=2.0)
    motion = build_motion_data(spec.skeleton, clips)
    return model, motion


def test_fused_finish_step_parity(im_setup):
    model, motion = im_setup
    B = 1024
    env = HumanoidImEnv(model, motion, EnvConfig())
    assert env._fused_step_ok()
    env._pallas_interpret = True

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = env.reset(keys)
    # drive with actions large enough that some envs terminate -> both
    # branches of the auto-reset merge are exercised
    actions = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, env.action_dim))
    pd = env.action_to_pd_target(actions)
    physics = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(
        model, states.physics, pd
    )

    want = jax.jit(
        jax.vmap(lambda s, p, t: env._finish_step(s, p, t, model))
    )(states, physics, pd)
    got = jax.jit(env._finish_step_fused)(states, physics)

    assert bool(jnp.any(want.done)), "no resets -> merge untested; adjust actions"
    np.testing.assert_allclose(
        np.asarray(got.reward), np.asarray(want.reward), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.reward_raw), np.asarray(want.reward_raw), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(got.done), np.asarray(want.done))
    np.testing.assert_array_equal(
        np.asarray(got.terminate), np.asarray(want.terminate)
    )
    np.testing.assert_allclose(
        np.asarray(got.obs), np.asarray(want.obs), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.amp_hist), np.asarray(want.amp_hist), atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(got.motion_id), np.asarray(want.motion_id)
    )
    np.testing.assert_allclose(
        np.asarray(got.physics.root_pos), np.asarray(want.physics.root_pos),
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(got.key), np.asarray(want.key))


def test_fused_amp_v2_parity(im_setup):
    model, motion = im_setup
    B = 1024
    env = HumanoidImEnv(model, motion, EnvConfig(amp_obs_v=2))
    assert env._fused_step_ok()
    env._pallas_interpret = True
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    states = env.reset(keys)
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (B, env.action_dim))
    pd = env.action_to_pd_target(actions)
    physics = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(
        model, states.physics, pd
    )
    want = jax.jit(
        jax.vmap(lambda s, p, t: env._finish_step(s, p, t, model))
    )(states, physics, pd)
    got = jax.jit(env._finish_step_fused)(states, physics)
    np.testing.assert_allclose(
        np.asarray(got.amp_hist[:, 0]), np.asarray(want.amp_hist[:, 0]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.obs), np.asarray(want.obs), atol=2e-4
    )


def test_one_launch_step_trace_parity(im_setup):
    """The one-launch hot path (env.step -> pallas_step_reward_amp) must
    trace to the same output structure as the per-env step_one path.
    eval_shape only — no kernel execution, so it stays fast on CPU; the
    numeric parity of the one-launch kernel is pinned on device by
    tools/check_pallas_tpu.py step_fused_check (and the opt-in interpret
    test below)."""
    model, motion = im_setup
    B = 1024
    env = HumanoidImEnv(model, motion, EnvConfig())
    env._pallas_interpret = True
    assert env._fused_step_ok()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.eval_shape(env.reset, keys)
    actions = jax.ShapeDtypeStruct((B, env.action_dim), jnp.float32)

    got = jax.eval_shape(env.step, states, actions)
    want = jax.eval_shape(
        lambda s, a: jax.vmap(env.step_one)(s, a), states, actions
    )
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(
        want
    )
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.skipif(
    not __import__("os").environ.get("PULSE_RUN_SLOW"),
    reason="interpret-mode physics kernel costs minutes/call on CPU; "
    "tools/check_pallas_tpu.py --only step covers this on real TPU",
)
def test_one_launch_step_interpret_parity(im_setup):
    """Numeric parity of the one-launch step kernel (physics + reward/AMP
    fused) against the two-launch composition, in interpret mode (opt-in:
    the physics half is the expensive interpret kernel)."""
    from pulse_tpu.physics.substep_pallas import pallas_physics_step

    model, motion = im_setup
    B = 1024
    env = HumanoidImEnv(model, motion, EnvConfig())
    env._pallas_interpret = True
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    states = env.reset(keys)
    actions = 0.5 * jax.random.normal(
        jax.random.PRNGKey(5), (B, env.action_dim)
    )
    got = jax.jit(env.step)(states, actions)

    def two_launch(states, actions):
        acts = jax.vmap(env._dr_action_noise)(states, actions)
        acts = jax.vmap(env.motor_actions_one)(states, acts)
        pd = env.action_to_pd_target(acts, env.model)
        physics = pallas_physics_step(
            env.model, states.physics, pd, interpret=True
        )
        return env._finish_step_fused(states, physics)

    want = jax.jit(two_launch)(states, actions)
    np.testing.assert_allclose(
        np.asarray(got.reward), np.asarray(want.reward), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.obs), np.asarray(want.obs), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.amp_hist[:, 0]), np.asarray(want.amp_hist[:, 0]),
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(got.done), np.asarray(want.done)
    )


def test_fused_eligibility_gates(im_setup):
    model, motion = im_setup
    # non-default surfaces fall back to the per-env path
    for cfg in [
        EnvConfig(obs_v=7),
        EnvConfig(self_obs_v=2),
        EnvConfig(num_traj_samples=3),
        EnvConfig(cycle_motion=True),
        EnvConfig(zero_out_far=True),
        EnvConfig(power_reward=True),
        EnvConfig(obs_noise_std=0.1),
        EnvConfig(occlusion_prob=0.5),
        EnvConfig(track_bodies=("Pelvis", "Head")),
    ]:
        assert not HumanoidImEnv(model, motion, cfg)._fused_step_ok(), cfg

    # subclasses overriding a replaced stage must not take the fused path
    from pulse_tpu.env.humanoid_im_getup import GetupConfig, HumanoidImGetupEnv

    getup = HumanoidImGetupEnv(model, motion, GetupConfig(num_fall_states=8))
    assert not getup._fused_step_ok()
