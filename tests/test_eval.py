"""im_eval harness tests (success rate + MPJPE machinery)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import EnvConfig, HumanoidImEnv
from pulse_tpu.eval import im_eval
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


@pytest.fixture(scope="module")
def env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    return HumanoidImEnv(
        model, motion,
        EnvConfig(enable_early_termination=False, num_amp_obs_steps=2),
    )


class TestImEval:
    def test_random_policy_metrics(self, env):
        def policy_fn(obs):
            return jnp.zeros((obs.shape[0], env.action_dim))

        result = im_eval(env, policy_fn, batch_size=2, collect_pa=True)
        assert 0.0 <= result.success_rate <= 1.0
        assert result.failed_motions.shape == (2,)
        for v in (result.mpjpe_g, result.mpjpe_l, result.mpjpe_pa,
                  result.vel_dist, result.accel_dist):
            assert np.isfinite(v) and v >= 0
        # a zero-action policy cannot track a moving walk clip for a full
        # second within 0.5 m mean distance
        assert result.mpjpe_g > 10.0  # mm

    def test_boundary_step_not_scored(self, env):
        """The step whose post-step clock t == clip length is the step the
        env auto-resets on (pass_time is `t >= length`, humanoid_im.py);
        im_eval must not score that post-reset state. Regression for the
        phantom final-step drift (~= the clip's total travel) that failed
        translating clips whose mean error was 60-170 mm: the scored-step
        count per clip must equal #{i : (i+1)*dt < length} computed with the
        same float32 arithmetic as the env clock, never one more."""

        def policy_fn(obs):
            return jnp.zeros((obs.shape[0], env.action_dim))

        result = im_eval(env, policy_fn, batch_size=2, collect_pa=False)
        dt = np.float32(env.model.config.control_dt)
        lengths = np.asarray(env.motion.motion_lengths, np.float32)
        max_steps = int(np.ceil(float(lengths.max()) / dt))
        steps = (np.float32(np.arange(1, max_steps + 1)) * dt)[None, :]
        expected = (steps < lengths[:, None]).sum(axis=1)
        np.testing.assert_array_equal(result.per_motion_steps, expected)
        # the boundary case actually occurs in this fixture (t == length
        # exactly for some step) — otherwise this test pins nothing
        assert any(
            np.any(np.float32(np.arange(1, max_steps + 1)) * dt == l)
            for l in lengths
        )

    def test_track_bodies_subset_env(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(
            model, motion,
            EnvConfig(track_bodies=("Head", "L_Hand", "R_Hand"), num_amp_obs_steps=2),
        )
        assert env.task_obs_dim == 1 * 3 * 24
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        out = jax.jit(env.step)(state, jnp.zeros((2, env.action_dim)))
        assert out.obs.shape == (2, env.obs_dim)
        assert np.all(np.isfinite(np.asarray(out.obs)))


class TestSelfObsVariants:
    def _mk(self, **kw):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        return HumanoidImEnv(model, motion, EnvConfig(num_amp_obs_steps=2, **kw))

    def test_self_obs_v2_history(self):
        env = self._mk(self_obs_v=2)
        assert env.self_obs_dim == 5 * 358
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        assert state.obs.shape == (2, env.obs_dim)
        # at reset the history is the current frame repeated
        h = np.asarray(state.self_obs_hist)
        np.testing.assert_allclose(h[:, 0], h[:, 1])
        out = jax.jit(env.step)(state, jnp.zeros((2, env.action_dim)))
        h2 = np.asarray(out.self_obs_hist)
        # after one step the newest entry differs from the oldest
        assert np.abs(h2[:, 0] - h2[:, -1]).max() > 1e-5

    def test_self_obs_v3_sensors(self):
        env = self._mk(self_obs_v=3)
        assert env.self_obs_dim == 358 + 12
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        out = jax.jit(env.step)(state, jnp.zeros((2, env.action_dim)))
        assert np.all(np.isfinite(np.asarray(out.obs)))


class TestZeroOutFar:
    def test_far_mode_switches_obs_and_reward(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(
            model, motion,
            EnvConfig(zero_out_far=True, zero_out_far_distance=1.0,
                      num_amp_obs_steps=2),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        # teleport one env 10 m away: it enters far mode
        ph = state.physics
        far_pos = ph.root_pos.at[0, 0].add(10.0)
        far_body = ph.body_pos.at[0, :, 0].add(10.0)
        state = state.replace(
            physics=ph.replace(root_pos=far_pos, body_pos=far_body)
        )
        out = jax.jit(env.step)(state, jnp.zeros((2, env.action_dim)))
        # far env: not terminated despite huge imitation distance
        assert not bool(out.terminate[0])
        # near env keeps ordinary tracking semantics
        assert np.all(np.isfinite(np.asarray(out.obs)))
        # far env's task obs is the sparse point goal (mostly zeros)
        task = np.asarray(out.obs[0, env.self_obs_dim:])
        assert np.count_nonzero(np.abs(task) > 1e-6) <= 3


class TestCycleMotion:
    def test_cycle_offset_continues_position(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(
            model, motion,
            EnvConfig(cycle_motion=True, state_init="Start", num_amp_obs_steps=2),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 1)
        state = jax.jit(env.reset)(keys)
        # progress past the clip end (30 frames = 1 s clip)
        s40 = state.replace(progress=jnp.full((1,), 40, jnp.int32))
        off = jax.vmap(env._cycle_offset)(s40)
        # one full cycle: offset equals the clip's net root displacement
        import jax as _jax
        delta = np.asarray(motion.gts[int(motion.motion_num_frames[0]) - 1, 0]
                           - motion.gts[0, 0])
        np.testing.assert_allclose(np.asarray(off[0])[:2], delta[:2], atol=1e-4)
        assert float(off[0][2]) == 0.0
        # the referenced root position at wrapped time includes the offset
        t = jax.vmap(env._motion_time)(s40)
        ref = jax.vmap(lambda mid, tt, oo: env._ref_state(mid, tt, oo))(
            s40.motion_id, t, off
        )
        raw = jax.vmap(lambda mid, tt: env._ref_state(mid, tt))(s40.motion_id, t)
        np.testing.assert_allclose(
            np.asarray(ref["root_pos"][0]),
            np.asarray(raw["root_pos"][0]) + np.asarray(off[0]),
            atol=1e-5,
        )


class TestOcclusion:
    def test_occlusion_zeroes_task_obs_chunk(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(
            model, motion,
            EnvConfig(occlusion_prob=1.0, occlusion_frac=0.25, num_amp_obs_steps=2),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        out = jax.jit(env.step)(state, jnp.zeros((2, env.action_dim)))
        task = np.asarray(out.obs[:, env.self_obs_dim:])
        width = int(env.task_obs_dim * 0.25)
        # a contiguous zero run of at least `width` exists in each env
        for row in task:
            zeros = np.abs(row) < 1e-9
            best = run = 0
            for z in zeros:
                run = run + 1 if z else 0
                best = max(best, run)
            assert best >= width, best


class TestTaskEval:
    """test=true for task and Z-wrapped envs (round-1 VERDICT weak #7:
    only Im envs could be eval'd)."""

    def _run_test_mode(self, *ov):
        from pulse_tpu import run as run_mod

        return run_mod.main([
            "num_envs=2", "test=true", "max_epochs=1",
            "learning.actor_units=[16]", "learning.critic_units=[16]",
            "env.episode_length=20", *ov,
        ])

    def test_speed_test_mode(self, tmp_path):
        r = self._run_test_mode(
            "env=speed", f"output_dir={tmp_path}", "exp_name=sp"
        )
        assert r.episodes >= 0
        assert np.isfinite(r.reward_per_step)

    def test_speed_z_test_mode(self, tmp_path):
        r = self._run_test_mode(
            "env=speed_z", "learning=pulse_z_task",
            f"output_dir={tmp_path}", "exp_name=spz",
        )
        assert np.isfinite(r.reward_per_step)

    def test_torch_pth_z_checkpoint(self, tmp_path):
        """A reference-format .pth drops in as the frozen Z model."""
        import torch
        import torch.nn as nn

        def mlp_seq(in_dim, units, final=None):
            layers = []
            for u in units:
                layers += [nn.Linear(in_dim, u), nn.SiLU()]
                in_dim = u
            if final is not None:
                layers.append(nn.Linear(in_dim, final))
            return nn.Sequential(*layers)

        # sizes must match the env surface: self_obs 358, latent 32
        from pulse_tpu import run as run_mod
        from pulse_tpu.utils.config import load_config

        cfg = load_config(["env=speed_z", "num_envs=2"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        inner = run_mod.build_env_from_cfg(cfg, model, motion).env
        so, od, L, A = inner.self_obs_dim, inner.obs_dim, 32, inner.action_dim

        torch.manual_seed(0)
        mods = {
            "a2c_network.z_mlp": mlp_seq(od, (64, 48), final=L * 5),
            "a2c_network.z_mu": nn.Linear(L * 5, L),
            "a2c_network.z_logvar": nn.Linear(L * 5, L),
            "a2c_network.z_prior": mlp_seq(so, (32, 24)),
            "a2c_network.z_prior_mu": nn.Linear(24, L),
            "a2c_network.z_prior_logvar": nn.Linear(24, L),
            "a2c_network.actor_mlp": mlp_seq(so + L, (64, 48)),
            "a2c_network.mu": nn.Linear(48, A),
            "a2c_network.critic_mlp": mlp_seq(od, (32,)),
            "a2c_network.value": nn.Linear(32, 1),
        }
        sd = {}
        for name, mod in mods.items():
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v
        sd["running_mean_std.running_mean"] = torch.zeros(od, dtype=torch.float64)
        sd["running_mean_std.running_var"] = torch.ones(od, dtype=torch.float64)
        sd["running_mean_std.count"] = torch.tensor(100.0)
        pth = str(tmp_path / "Humanoid_00000100.pth")
        torch.save({"model": sd, "epoch": 100}, pth)

        r = self._run_test_mode(
            "env=speed_z", "learning=pulse_z_task",
            f"env.z_checkpoint={pth}",
            f"output_dir={tmp_path}", "exp_name=spz_pth",
        )
        assert np.isfinite(r.reward_per_step)


def test_procrustes_jnp_matches_numpy():
    """The in-graph batched procrustes equals the host reference impl."""
    from pulse_tpu.eval.im_eval import _procrustes_aligned_err, _procrustes_err_jnp

    rng = np.random.RandomState(0)
    gt = rng.randn(6, 24, 3).astype(np.float32)
    pred = (1.1 * gt + 0.05 * rng.randn(6, 24, 3) + 0.3).astype(np.float32)
    got = np.asarray(_procrustes_err_jnp(jnp.asarray(pred), jnp.asarray(gt)))
    for i in range(6):
        want = _procrustes_aligned_err(pred[i : i + 1], gt[i : i + 1])
        np.testing.assert_allclose(got[i], want, rtol=1e-4)
