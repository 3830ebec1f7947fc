"""Domain randomization (env/domain_rand.py ≙ BaseTask.apply_randomizations,
/root/reference/phc/env/tasks/base_task.py:518-697).

The noise algebra is pinned against a numpy transliteration of the
reference's noise_lambda closures (base_task.py:582-590, 608-616) fed the
SAME random draws; the env integration checks held-vs-refreshed correlated
draws, schedule ticking across auto-resets, and that the whole DR step
stays jittable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulse_tpu.env.domain_rand import (
    DRConfig,
    DRSpec,
    apply_noise,
    dr_config_from_dict,
    randomize_model_props,
    schedule_scaling,
)


class TestScheduleScaling:
    def test_linear(self):
        # ≙ base_task.py:556-558: 1/sched_step * min(last_step, sched_step)
        spec = DRSpec(schedule="linear", schedule_steps=100)
        assert float(schedule_scaling(spec, jnp.asarray(0))) == 0.0
        assert float(schedule_scaling(spec, jnp.asarray(50))) == pytest.approx(0.5)
        assert float(schedule_scaling(spec, jnp.asarray(100))) == 1.0
        assert float(schedule_scaling(spec, jnp.asarray(500))) == 1.0

    def test_constant(self):
        # ≙ base_task.py:559-560: 0 until schedule_steps, then 1
        spec = DRSpec(schedule="constant", schedule_steps=10)
        assert float(schedule_scaling(spec, jnp.asarray(9))) == 0.0
        assert float(schedule_scaling(spec, jnp.asarray(10))) == 1.0

    def test_none(self):
        assert float(schedule_scaling(DRSpec(), jnp.asarray(0))) == 1.0

    def test_bad_spec_raises(self):
        with pytest.raises(ValueError):
            DRSpec(distribution="poisson")
        with pytest.raises(ValueError):
            DRSpec(operation="divide")
        with pytest.raises(ValueError):
            DRSpec(schedule="exponential")


def _reference_noise(spec: DRSpec, tensor, corr_raw, fresh, step):
    """Numpy transliteration of apply_randomizations' scheduled params +
    noise_lambda (base_task.py:548-617), given the same draws. `fresh` is
    the per-call draw (randn for gaussian, rand for uniform)."""
    if spec.schedule == "linear":
        s = min(step, spec.schedule_steps) / spec.schedule_steps
    elif spec.schedule == "constant":
        s = 0.0 if step < spec.schedule_steps else 1.0
    else:
        s = 1.0
    a, b = spec.range
    ac, bc = spec.range_correlated
    if spec.distribution == "gaussian":
        if spec.operation == "additive":
            mu, var, mu_c, var_c = a * s, b * s, ac * s, bc * s
        else:
            mu = a * s + 1.0 * (1.0 - s)
            var = b * s
            mu_c = ac * s + 1.0 * (1.0 - s)
            var_c = bc * s
        noise = (corr_raw * var_c + mu_c) + fresh * var + mu
    else:
        if spec.operation == "additive":
            lo, hi, lo_c, hi_c = a * s, b * s, ac * s, bc * s
        else:
            lo = a * s + 1.0 * (1.0 - s)
            hi = b * s + 1.0 * (1.0 - s)
            lo_c = ac * s + 1.0 * (1.0 - s)
            hi_c = bc * s + 1.0 * (1.0 - s)
        noise = (corr_raw * (hi_c - lo_c) + lo_c) + fresh * (hi - lo) + lo
    if spec.operation == "additive":
        return tensor + noise
    return tensor * noise


SPECS = [
    DRSpec("gaussian", "additive", (0.01, 0.05), (0.002, 0.03)),
    DRSpec("gaussian", "scaling", (1.0, 0.05), (1.0, 0.02),
           schedule="linear", schedule_steps=100),
    DRSpec("uniform", "additive", (-0.02, 0.02), (-0.01, 0.01),
           schedule="constant", schedule_steps=5),
    DRSpec("uniform", "scaling", (0.9, 1.1), (0.95, 1.05),
           schedule="linear", schedule_steps=50),
]


class TestNoiseFormulaParity:
    @pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.distribution}-{s.operation}")
    @pytest.mark.parametrize("step", [0, 3, 7, 1000])
    def test_matches_reference_lambda(self, spec, step):
        key = jax.random.PRNGKey(step + 5)
        tensor = jnp.linspace(-1.0, 1.0, 16)
        corr = jax.random.normal(jax.random.PRNGKey(1), (16,))
        got = apply_noise(spec, tensor, corr, key, jnp.asarray(step))
        # reproduce apply_noise's internal per-call draw
        if spec.distribution == "gaussian":
            fresh = jax.random.normal(key, tensor.shape)
        else:
            fresh = jax.random.uniform(key, tensor.shape)
        want = _reference_noise(
            spec, np.asarray(tensor), np.asarray(corr), np.asarray(fresh), step
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_defaults_are_noop_ish(self):
        """With range (0,0) / no correlated range, additive gaussian noise is
        exactly zero — the spec algebra has no hidden offsets."""
        spec = DRSpec("gaussian", "additive", (0.0, 0.0), (0.0, 0.0))
        t = jnp.ones(8)
        out = apply_noise(spec, t, jnp.ones(8), jax.random.PRNGKey(0), jnp.asarray(3))
        np.testing.assert_allclose(np.asarray(out), 1.0)


@pytest.fixture(scope="module")
def env_pair():
    """(DR env, no-DR env) on the same tiny model/motion."""
    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1))
    clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    dr = DRConfig(
        observations=DRSpec("gaussian", "additive", (0.0, 0.01), (0.0, 0.005)),
        actions=DRSpec("gaussian", "additive", (0.0, 0.02)),
        frequency=3,
    )
    env = HumanoidImEnv(model, motion, EnvConfig(episode_length=20, dr=dr))
    base = HumanoidImEnv(model, motion, EnvConfig(episode_length=20))
    return env, base


class TestEnvIntegration:
    B = 4

    def _roll(self, env, n):
        keys = jax.random.split(jax.random.PRNGKey(0), self.B)
        state = jax.jit(env.reset)(keys)
        step = jax.jit(env.step)
        states = [state]
        for i in range(n):
            a = 0.05 * jax.random.normal(
                jax.random.PRNGKey(100 + i), (self.B, env.action_dim)
            )
            state = step(state, a)
            states.append(state)
        return states

    def test_dr_changes_obs_and_physics(self, env_pair):
        env, base = env_pair
        s_dr = self._roll(env, 2)
        s_plain = self._roll(base, 2)
        # obs noise applied (post-physics, ≙ base_task.py:233-234)
        assert not np.allclose(
            np.asarray(s_dr[1].obs), np.asarray(s_plain[1].obs)
        )
        # action noise perturbs the dynamics (pre-physics, ≙ :217-218)
        assert not np.allclose(
            np.asarray(s_dr[2].physics.body_pos),
            np.asarray(s_plain[2].physics.body_pos),
        )

    def test_corr_held_between_refreshes(self, env_pair):
        env, _ = env_pair
        states = self._roll(env, 7)
        # dr_step ticks every step and never resets
        for i, st in enumerate(states):
            assert int(st.dr_step[0]) == i
        # frequency=3: refresh fires on steps where pre-step dr_step % 3 == 0
        # (steps 1, 4, 7 — first one ≙ first_randomization); held otherwise
        c = [np.asarray(st.dr_corr_obs) for st in states]
        assert not np.allclose(c[0], c[1])      # refreshed (dr_step was 0)
        np.testing.assert_array_equal(c[1], c[2])  # held
        np.testing.assert_array_equal(c[2], c[3])  # held
        assert not np.allclose(c[3], c[4])      # refreshed (dr_step was 3)
        np.testing.assert_array_equal(c[4], c[5])
        np.testing.assert_array_equal(c[5], c[6])
        assert not np.allclose(c[6], c[7])      # refreshed (dr_step was 6)

    def test_no_dr_fields_absent(self, env_pair):
        _, base = env_pair
        keys = jax.random.split(jax.random.PRNGKey(0), self.B)
        st = jax.jit(base.reset)(keys)
        assert st.dr_corr_obs is None and st.dr_step is None

    def test_fused_path_gated_off(self, env_pair):
        env, base = env_pair
        assert not env._fused_step_ok()
        # the gate is the dr knob, not something else about this config
        assert base._fused_step_ok()


class TestPhysicalProps:
    def test_multipliers_in_range_and_consistent(self):
        from pulse_tpu.assets import load_smpl_humanoid
        from pulse_tpu.physics import PhysicsConfig, build_model

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        N = 8
        out = randomize_model_props(
            model, jax.random.PRNGKey(0), N,
            friction_range=(0.7, 1.3), mass_range=(0.8, 1.2),
            gain_range=(0.9, 1.1),
        )
        fr = np.asarray(out.cp_friction) / np.asarray(model.cp_friction)[None]
        assert fr.shape[0] == N and fr.min() >= 0.7 and fr.max() <= 1.3
        # one multiplier per env (rigid_shape-level, not per-contact-point)
        assert np.allclose(fr, fr[:, :1])
        mr = np.asarray(out.body_mass) / np.asarray(model.body_mass)[None]
        assert mr.min() >= 0.8 and mr.max() <= 1.2
        np.testing.assert_allclose(
            np.asarray(out.total_mass),
            np.asarray(out.body_mass).sum(-1),
            rtol=1e-6,
        )
        gr = np.asarray(out.joint_kp) / np.asarray(model.joint_kp)[None]
        assert gr.min() >= 0.9 and gr.max() <= 1.1

    def test_env_rerandomize_does_not_compound(self):
        """randomize_physical_props twice must re-draw from the pre-DR
        base, not multiply onto the previous draw."""
        from pulse_tpu.assets import load_smpl_humanoid
        from pulse_tpu.env import EnvConfig, HumanoidImEnv
        from pulse_tpu.motion import build_motion_data, make_synthetic_clips
        from pulse_tpu.physics import PhysicsConfig, build_model

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig(substeps=1))
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        dr = DRConfig(friction_range=(0.5, 2.0))
        env = HumanoidImEnv(model, motion, EnvConfig(dr=dr))
        for i in range(4):
            env.randomize_physical_props(jax.random.PRNGKey(i), 4)
            fr = np.asarray(env.batched_model.cp_friction) / np.asarray(
                model.cp_friction
            )[None]
            assert fr.min() >= 0.5 and fr.max() <= 2.0

    def test_composes_with_batched_model(self):
        from pulse_tpu.assets import load_smpl_humanoid
        from pulse_tpu.physics import PhysicsConfig, build_model
        from pulse_tpu.physics.shape_variation import vary_model_scales

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        N = 4
        batched = vary_model_scales(model, jax.random.PRNGKey(1), N, (0.9, 1.1))
        out = randomize_model_props(
            batched, jax.random.PRNGKey(2), N, mass_range=(0.5, 0.6)
        )
        mr = np.asarray(out.body_mass) / np.asarray(batched.body_mass)
        assert mr.min() >= 0.5 and mr.max() <= 0.6
        # untouched leaves pass through
        np.testing.assert_array_equal(
            np.asarray(out.cp_friction), np.asarray(batched.cp_friction)
        )


class TestConfigPlumbing:
    def test_yaml_schema_round_trip(self):
        d = {
            "frequency": 600,
            "observations": {
                "distribution": "gaussian", "operation": "additive",
                "range": [0.0, 0.002], "range_correlated": [0.0, 0.001],
                "schedule": "linear", "schedule_steps": 3000,
            },
            "actions": {"range": [0.0, 0.02]},
            "friction_range": [0.7, 1.3],
            "mass_range": None,
        }
        dr = dr_config_from_dict(d)
        assert dr.frequency == 600
        assert dr.observations.schedule == "linear"
        assert dr.observations.range == (0.0, 0.002)
        assert dr.actions.distribution == "gaussian"
        assert dr.actions.range == (0.0, 0.02)
        assert dr.friction_range == (0.7, 1.3)
        assert dr.mass_range is None and dr.gain_range is None

    def test_run_builds_dr_env(self):
        from pulse_tpu.utils.config import load_config
        from pulse_tpu import run as run_mod

        cfg = load_config(["env=im", "env.randomize=true", "num_envs=2"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        assert env.config.dr is not None
        assert env.config.dr.observations is not None
        assert env.config.dr.friction_range == (0.7, 1.3)
        # friction_range ships in the default params -> per-env batched model
        assert env.batched_model is not None
        assert env.batched_model.cp_friction.shape[0] == 2
