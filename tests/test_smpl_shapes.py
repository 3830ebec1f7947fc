"""SMPL-beta shape pipeline end to end.

Covers VERDICT round-1 item 5: the schema-exact synthetic SMPL pickle
actually exercises load_smpl_model (smpl/body_model.py:54-79), beta=0
reproduces the default physics model bit-exactly, nonzero betas give
per-env skeletons/masses, and the shape/limb-weight obs channels reach the
env observation (≙ humanoid.py:918-1035,1166-1177)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env.humanoid_im import EnvConfig, HumanoidImEnv
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.shape_variation import (
    LIMB_WEIGHT_GROUPS,
    limb_weight_params,
    models_from_betas,
)
from pulse_tpu.smpl.body_model import (
    SMPL_JOINT_NAMES,
    load_smpl_model,
    shaped_joints,
    skeleton_from_betas,
)
from pulse_tpu.smpl.synthetic import rest_joints, write_smpl_pickle


@pytest.fixture(scope="module")
def spec():
    return load_smpl_humanoid()


@pytest.fixture(scope="module")
def smpl(spec, tmp_path_factory):
    """The synthetic model, round-tripped through a real pickle file so
    load_smpl_model's parsing path (incl. the uint32(-1) root parent) runs."""
    path = tmp_path_factory.mktemp("smpl") / "SMPL_NEUTRAL.pkl"
    write_smpl_pickle(str(path), spec.skeleton)
    return load_smpl_model(str(path))


def test_pickle_schema(smpl, spec):
    J = spec.skeleton.num_joints
    assert smpl.num_joints == J
    assert smpl.parents[0] == -1
    assert np.all(smpl.parents[1:] >= 0)
    assert smpl.shapedirs.shape[2] == 10
    assert smpl.weights.shape == (smpl.v_template.shape[0], J)


def test_zero_beta_joints_match_default(smpl, spec):
    """beta=0 regressed joints == the default skeleton's rest joints."""
    joints = np.asarray(shaped_joints(smpl, jnp.zeros(10)))
    want = rest_joints(spec.skeleton)
    perm = [spec.skeleton.node_names.index(n) for n in SMPL_JOINT_NAMES]
    np.testing.assert_allclose(joints, want[perm], atol=1e-6)


def test_skeleton_from_betas(smpl, spec):
    tree0 = skeleton_from_betas(smpl, np.zeros(10))
    # zero shape: local translations match the default skeleton by name
    for i, name in enumerate(tree0.node_names):
        j = spec.skeleton.node_names.index(name)
        np.testing.assert_allclose(
            tree0.local_translation[i], spec.skeleton.local_translation[j], atol=1e-6
        )
    # stature beta stretches the skeleton
    tree_tall = skeleton_from_betas(smpl, np.asarray([2.0] + [0.0] * 9))
    h0 = rest_joints(tree0)[:, 2].max() - rest_joints(tree0)[:, 2].min()
    h1 = rest_joints(tree_tall)[:, 2].max() - rest_joints(tree_tall)[:, 2].min()
    assert h1 > h0 * 1.05


@pytest.fixture(scope="module")
def model(spec):
    return build_model(spec, PhysicsConfig())


def test_models_from_betas_zero_identity(model, smpl, spec):
    names = spec.skeleton.node_names
    batched = models_from_betas(model, smpl, jnp.zeros((3, 10)), names)
    np.testing.assert_allclose(
        np.asarray(batched.local_translation[0]),
        np.asarray(model.local_translation),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(batched.body_mass[0]), np.asarray(model.body_mass), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(batched.spatial_inertia[0]),
        np.asarray(model.spatial_inertia),
        rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(batched.joint_kp[0]), np.asarray(model.joint_kp), rtol=1e-6
    )


def test_models_from_betas_variation(model, smpl, spec):
    names = spec.skeleton.node_names
    betas = jnp.asarray([[2.0] + [0.0] * 9, [-2.0] + [0.0] * 9])
    batched = models_from_betas(model, smpl, betas, names)
    m_tall, m_short = np.asarray(batched.total_mass)
    assert m_tall > np.asarray(model.total_mass) > m_short
    # taller humanoid gets stronger PD gains (pd_scale = mass ratio)
    assert np.all(np.asarray(batched.joint_kp[0]) > np.asarray(batched.joint_kp[1]))
    # bones differ per env
    assert not np.allclose(
        np.asarray(batched.local_translation[0]),
        np.asarray(batched.local_translation[1]),
    )


def test_limb_weight_params(model, spec):
    names = spec.skeleton.node_names
    lw = np.asarray(
        limb_weight_params(model.local_translation, model.body_mass, names)
    )
    assert lw.shape == (10,)
    assert np.all(lw > 0)
    # mass halves sum to total mass
    np.testing.assert_allclose(lw[5:].sum(), float(model.total_mass), rtol=1e-5)
    # left/right symmetry of the default model
    np.testing.assert_allclose(lw[0], lw[1], rtol=5e-2)
    np.testing.assert_allclose(lw[3], lw[4], rtol=5e-2)
    assert len(LIMB_WEIGHT_GROUPS) == 5


def test_env_with_beta_shapes_and_shape_obs(model, smpl):
    spec = load_smpl_humanoid()
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.5)
    motion = build_motion_data(spec.skeleton, clips)
    cfg = EnvConfig(
        episode_length=30,
        has_shape_obs=True,
        has_limb_weight_obs=True,
        use_pallas_physics=False,
    )
    env = HumanoidImEnv(model, motion, cfg)
    assert env.shape_extra_dim == 21
    N = 4
    env.enable_shape_variation(
        jax.random.PRNGKey(0), N, smpl_model=smpl, beta_std=1.0
    )
    assert env._shape_obs_table.shape == (N, 21)
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    state = jax.jit(env.reset)(keys)
    assert state.obs.shape == (N, env.obs_dim)
    # the shape rows actually appear in the obs (self-obs tail)
    tail = np.asarray(state.obs[:, env.self_obs_dim - 21 : env.self_obs_dim])
    np.testing.assert_allclose(tail, np.asarray(env._shape_obs_table), atol=1e-5)
    step = jax.jit(env.step)
    actions = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (N, env.action_dim))
    s2 = step(state, actions)
    assert bool(jnp.all(jnp.isfinite(s2.obs)))
    # rows survive the step (and any auto-reset)
    tail2 = np.asarray(s2.obs[:, env.self_obs_dim - 21 : env.self_obs_dim])
    np.testing.assert_allclose(tail2, np.asarray(env._shape_obs_table), atol=1e-5)


def test_gendered_smpl(spec, tmp_path):
    """GenderedSMPL triple (≙ smpl_parser_{n,m,f}, motion_lib_smpl.py:46-70)
    with fallback to neutral when gendered pickles are absent."""
    from pulse_tpu.smpl.body_model import GenderedSMPL

    d = tmp_path / "smpl"
    d.mkdir()
    write_smpl_pickle(str(d / "SMPL_NEUTRAL.pkl"), spec.skeleton)
    write_smpl_pickle(str(d / "SMPL_MALE.pkl"), spec.skeleton, seed=1)
    g = GenderedSMPL.load(str(d))
    assert g.male is not None and g.female is None
    assert g.for_gender("neutral") is g.neutral
    assert g.for_gender("male") is g.male
    assert g.for_gender("female") is g.neutral  # fallback
    assert g.for_gender(1) is g.male
