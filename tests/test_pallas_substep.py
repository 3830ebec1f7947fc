"""Golden tests: the Pallas mega-kernel physics step must reproduce the XLA
path (vmap(physics_step) over fused_substep) on identical inputs.

The interpret-mode tests are OPT-IN (PULSE_RUN_SLOW=1): on CPU, eager
interpret dispatches the unrolled kernel's tile ops one by one (minutes
per call) and jitting it instead sends XLA:CPU a straight-line program it
takes >15 min to compile. The AUTHORITATIVE kernel verification is
tools/check_pallas_tpu.py, which compiles the real Mosaic lowering on the
TPU and checks parity against the XLA path plus the shard_map/padded
composition — run it after any kernel change (and the driver's bench run
exercises the kernel every round)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

slow = pytest.mark.skipif(
    not os.environ.get("PULSE_RUN_SLOW"),
    reason="interpret-mode kernel run costs minutes/call on CPU; "
    "tools/check_pallas_tpu.py covers the kernel on real TPU",
)

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.step import physics_step
from pulse_tpu.physics.substep_pallas import (
    ENVS_PER_BLOCK,
    pallas_physics_step,
    supported,
)


@pytest.fixture(scope="module")
def model():
    # single substep / single control step: interpret-mode kernel calls cost
    # minutes PER SUBSTEP on CPU, and the golden comparison is equally valid
    # at one substep (the XLA reference uses the same config). The full
    # 4-substep kernel is exercised with the real Mosaic lowering on TPU by
    # tools/check_pallas_tpu.py.
    return build_model(
        load_smpl_humanoid(), PhysicsConfig(substeps=1, control_freq_inv=1)
    )


def _random_states(model, key, B):
    """Plausible random batched states near standing."""
    from pulse_tpu.physics.state import state_from_kinematics

    ks = jax.random.split(key, 6)
    D = model.num_dof
    root_pos = jnp.asarray([0.0, 0.0, 0.95]) + 0.1 * jax.random.normal(ks[0], (B, 3))
    root_rot = jax.random.normal(ks[1], (B, 4)) * 0.1 + jnp.asarray([0, 0, 0, 1.0])
    dof = 0.3 * jax.random.normal(ks[2], (B, D))
    root_vel = 0.5 * jax.random.normal(ks[3], (B, 3))
    root_ang = 0.5 * jax.random.normal(ks[4], (B, 3))
    dof_vel = 0.5 * jax.random.normal(ks[5], (B, D))
    return jax.vmap(state_from_kinematics, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        model, root_pos, root_rot, dof, root_vel, root_ang, dof_vel
    )


def test_supported_gate(model):
    assert supported(model, ENVS_PER_BLOCK)
    assert not supported(model, ENVS_PER_BLOCK + 1)


@slow
def test_matches_xla_step(model):
    B = ENVS_PER_BLOCK
    state = _random_states(model, jax.random.PRNGKey(0), B)
    pd = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, model.num_dof))

    ref = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(model, state, pd)
    out = pallas_physics_step(model, state, pd, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out.root_pos), np.asarray(ref.root_pos), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.root_rot), np.asarray(ref.root_rot), atol=2e-4
    )
    # quaternions can differ by sign per env; compare via |dot| ~ 1
    dots = np.abs(
        np.sum(np.asarray(out.joint_rot) * np.asarray(ref.joint_rot), axis=-1)
    )
    assert dots.min() > 1 - 1e-5
    np.testing.assert_allclose(
        np.asarray(out.joint_omega), np.asarray(ref.joint_omega), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.root_vel6), np.asarray(ref.root_vel6), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.body_pos), np.asarray(ref.body_pos), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.body_vel), np.asarray(ref.body_vel), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.body_ang_vel), np.asarray(ref.body_ang_vel), atol=5e-3
    )
    # contact forces: compare where significant (N-scale)
    cf_r = np.asarray(ref.contact_force)
    cf_o = np.asarray(out.contact_force)
    np.testing.assert_allclose(cf_o, cf_r, atol=1.0)


@slow
def test_multi_step_stability(model):
    """Several kernel steps keep a standing humanoid near its reference
    (PD holds the pose) — catches integration/order bugs the single-step
    comparison might mask."""
    B = ENVS_PER_BLOCK
    state = _random_states(model, jax.random.PRNGKey(2), B)
    from pulse_tpu.physics.state import dof_pos_from_state

    pd = jax.vmap(dof_pos_from_state)(state)
    s = state
    for _ in range(2):
        s = pallas_physics_step(model, s, pd, interpret=True)
    assert np.all(np.isfinite(np.asarray(s.root_pos)))
    assert np.asarray(s.root_pos[:, 2]).min() > 0.2


class TestShardedPallas:
    """The shard_map-wrapped kernel path (DP mesh composition) and the
    batch-padding wrapper, in interpret mode. Interpret-mode kernel calls
    cost minutes each on CPU, so this keeps to ONE kernel invocation per
    test and a 1-device mesh; the real Mosaic lowering of the sharded path
    runs on TPU via tools/check_pallas_tpu.py."""

    @slow
    def test_padded_matches_exact(self, model):
        from pulse_tpu.physics.substep_pallas import pallas_physics_step_padded

        B = 48  # deliberately not a tile multiple
        state = _random_states(model, jax.random.PRNGKey(3), B)
        pd = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (B, model.num_dof))
        ref = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(model, state, pd)
        out = pallas_physics_step_padded(model, state, pd, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out.root_pos), np.asarray(ref.root_pos), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.body_pos), np.asarray(ref.body_pos), atol=5e-4
        )

    @slow
    def test_env_step_kernel_path_under_mesh(self, model):
        """HumanoidImEnv.step routes through the sharded kernel when a mesh
        is set, and matches the vmap path."""
        from jax.sharding import Mesh
        from pulse_tpu.env.humanoid_im import EnvConfig, HumanoidImEnv
        from pulse_tpu.assets import load_smpl_humanoid
        from pulse_tpu.motion import build_motion_data, make_synthetic_clips

        spec = load_smpl_humanoid()
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(model, motion, EnvConfig(episode_length=30))
        B = 4
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        state = env.reset(keys)
        actions = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (B, env.action_dim))

        ref = env.step(state, actions)  # vmap path (no mesh, cpu)

        env.mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        env._pallas_interpret = True
        assert env._pallas_eligible
        out = env.step(state, actions)
        np.testing.assert_allclose(
            np.asarray(out.physics.root_pos),
            np.asarray(ref.physics.root_pos),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out.reward), np.asarray(ref.reward), atol=1e-3
        )


class TestBatchedModelRows:
    """Per-env model leaves as kernel block inputs (shape variation / prop
    DR on the Pallas hot path — round-3 VERDICT #8)."""

    def test_rows_layout_matches_consts(self, model):
        """build_model_rows must lay values out exactly where _model_tiles
        reads them: broadcasting the SHARED model into rows and slicing any
        row must reproduce _extract_consts' values."""
        from pulse_tpu.physics.substep_pallas import (
            _extract_consts,
            _model_rows_layout,
            build_model_rows,
        )

        B = 2
        rows = np.asarray(build_model_rows(model, B))
        assert np.array_equal(rows[0], rows[1])  # shared model -> same rows
        c = _extract_consts(model)
        J = model.num_bodies
        P = len(c["cp_radius"])
        lay, n_model = _model_rows_layout(J, P)
        assert rows.shape == (B, n_model)
        r = rows[0]
        for b in range(J):
            np.testing.assert_allclose(
                r[lay["lt"][0] + 3 * b : lay["lt"][0] + 3 * b + 3],
                c["lt"][b], rtol=1e-6)
            assert abs(r[lay["mass"][0] + b] - c["mass"][b]) < 1e-6
        for j in range(J - 1):
            assert abs(r[lay["kp"][0] + j] - c["kp"][j]) < 1e-5
            np.testing.assert_allclose(
                r[lay["dof_lower"][0] + 3 * j : lay["dof_lower"][0] + 3 * j + 3],
                c["dof_lower"][j], rtol=1e-6)
        for i in range(P):
            assert abs(r[lay["cp_radius"][0] + i] - c["cp_radius"][i]) < 1e-6
            assert abs(r[lay["cp_friction"][0] + i] - c["cp_friction"][i]) < 1e-6
        # Isym must reconstruct the A block of the spatial inertia
        I6 = np.asarray(model.spatial_inertia)
        idx = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        for b in range(J):
            got = r[lay["Isym"][0] + 6 * b : lay["Isym"][0] + 6 * b + 6]
            want = [I6[b, i, k] for i, k in idx]
            np.testing.assert_allclose(got, want, rtol=1e-6)

    @slow
    def test_varied_batch_matches_xla(self):
        """Toy-chain parity: the kernel fed per-env model rows must match
        vmap(physics_step) over the SAME per-env-varied models (interpret
        mode; full-size humanoid verified on TPU by check_pallas_tpu.py)."""
        from pulse_tpu.assets.toy import make_toy_chain_spec
        from pulse_tpu.physics.shape_variation import vary_model_scales
        from pulse_tpu.physics.state import state_from_kinematics
        from pulse_tpu.physics.substep_pallas import (
            build_model_rows,
            pallas_physics_step_padded,
        )

        spec = make_toy_chain_spec(3)
        m = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
        B = 4
        bm = vary_model_scales(m, jax.random.PRNGKey(0), B, (0.8, 1.2))
        D = m.num_dof
        state = jax.vmap(state_from_kinematics, in_axes=(0, 0, 0, 0, 0, 0, 0))(
            bm,
            jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1)),
            jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1)),
            0.1 * jnp.ones((B, D)),
            jnp.zeros((B, 3)),
            jnp.zeros((B, 3)),
            jnp.zeros((B, D)),
        )
        pd = 0.1 * jnp.ones((B, D))
        rows = build_model_rows(bm, B)
        out = pallas_physics_step_padded(m, state, pd, rows, interpret=True)
        ref = jax.jit(jax.vmap(physics_step, in_axes=(0, 0, 0)))(bm, state, pd)
        np.testing.assert_allclose(
            np.asarray(out.body_pos), np.asarray(ref.body_pos), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.body_vel), np.asarray(ref.body_vel), atol=5e-3
        )
