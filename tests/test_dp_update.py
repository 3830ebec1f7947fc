"""Data-parallel update path (shard_map per-shard minibatching).

Why this exists: GSPMD cannot keep the env axis sharded through the update
phase's global shuffle — compiling the reference-scale train_epoch over an
8-device mesh showed the FULL rollout all-gathered onto every device
(tools/check_partitioning.py). The DP path (_update_dp in ppo.py, and its
amp/distill siblings) shuffles within shards and pmeans gradients/moments,
matching the reference's horovod semantics (common_agent.py:112-127
allreduce around calc_gradients).

Equivalence pin: with ONE minibatch covering the whole batch and one mini
epoch, the permutation is irrelevant, so the DP update must numerically
match the single-device update (gradient pmean over equal shards == global
gradient mean; running-stat moments pmean == global moments).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.learning.networks import ActorCritic
from pulse_tpu.learning.ppo import PPOAgent, PPOConfig, Rollout, TrainState
from pulse_tpu.learning.running_norm import RunningMeanStd
from pulse_tpu.parallel import make_mesh

T, B, O, A = 4, 16, 9, 5


class _DummyEnv:
    """update() never touches the env beyond .mesh; rollouts aren't run."""

    obs_dim = O
    action_dim = A
    amp_obs_dim = 7

    def __init__(self, mesh=None):
        self.mesh = mesh


def _traj(key):
    ks = jax.random.split(key, 8)
    shp = lambda *s: (T, B) + s
    return Rollout(
        obs=jax.random.normal(ks[0], shp(O)),
        actions=jax.random.normal(ks[1], shp(A)),
        neglogp=jax.random.normal(ks[2], shp()),
        values=jax.random.normal(ks[3], shp()),
        rewards=jax.random.normal(ks[4], shp()),
        dones=jnp.zeros(shp(), bool),
        terminates=jnp.zeros(shp(), bool),
        amp_obs=jax.random.normal(ks[5], shp(7)),
        mus=jax.random.normal(ks[6], shp(A)),
    )


def _state(agent, key):
    net = agent.network
    params = net.init(key, jnp.zeros((1, O)))["params"]
    return TrainState(
        params=params,
        opt_state=agent.optimizer.init(params),
        obs_rms=RunningMeanStd.create(O),
        value_rms=RunningMeanStd.create(1),
        env_state=None,
        key=jax.random.PRNGKey(3),
        epoch=jnp.zeros((), jnp.int32),
    )


def _agents(cfg):
    net = ActorCritic(action_dim=A, actor_units=(16,), critic_units=(16,))
    host = PPOAgent(_DummyEnv(), cfg, net)
    dp = PPOAgent(_DummyEnv(make_mesh(8)), cfg, net)
    return host, dp


def test_dp_update_matches_host_single_minibatch():
    cfg = PPOConfig(num_envs=B, horizon_length=T, minibatch_size=T * B,
                    mini_epochs=1)
    host, dp = _agents(cfg)
    ts = _state(host, jax.random.PRNGKey(0))
    traj = _traj(jax.random.PRNGKey(1))
    adv = jax.random.normal(jax.random.PRNGKey(2), (T, B))
    ret = jax.random.normal(jax.random.PRNGKey(4), (T, B))

    ts_h, m_h = jax.jit(host.update)(ts, traj, adv, ret)
    ts_d, m_d = jax.jit(dp.update)(ts, traj, adv, ret)

    for a, b in zip(jax.tree.leaves(ts_h.params), jax.tree.leaves(ts_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ts_h.obs_rms.mean), np.asarray(ts_d.obs_rms.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ts_h.obs_rms.var), np.asarray(ts_d.obs_rms.var), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ts_h.value_rms.mean), np.asarray(ts_d.value_rms.mean),
        atol=1e-5,
    )
    for k in m_h:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_d[k]), atol=1e-4, err_msg=k
        )


def test_dp_update_multi_minibatch_runs_and_stats_match():
    """Shuffle semantics differ (within-shard vs global), so params diverge
    by design — but the running-stat updates are moment-exact and every
    output must be finite and truly replicated."""
    cfg = PPOConfig(num_envs=B, horizon_length=T, minibatch_size=(T * B) // 4,
                    mini_epochs=2)
    host, dp = _agents(cfg)
    ts = _state(host, jax.random.PRNGKey(0))
    traj = _traj(jax.random.PRNGKey(1))
    adv = jax.random.normal(jax.random.PRNGKey(2), (T, B))
    ret = jax.random.normal(jax.random.PRNGKey(4), (T, B))

    ts_h, _ = jax.jit(host.update)(ts, traj, adv, ret)
    ts_d, m_d = jax.jit(dp.update)(ts, traj, adv, ret)
    np.testing.assert_allclose(
        np.asarray(ts_h.obs_rms.mean), np.asarray(ts_d.obs_rms.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ts_h.obs_rms.var), np.asarray(ts_d.obs_rms.var), atol=1e-5
    )
    for leaf in jax.tree.leaves(ts_d.params):
        assert np.isfinite(np.asarray(leaf)).all()
    for k, v in m_d.items():
        assert np.isfinite(float(v)), k


def test_dp_distill_update_matches_host_single_minibatch():
    from pulse_tpu.learning.distill import (
        DistillAgent, DistillConfig, DistillState,
    )
    from pulse_tpu.learning.networks import PulseVAE

    Z = 4
    net = PulseVAE(
        action_dim=A, latent_dim=Z, self_obs_dim=5,
        encoder_units=(8,), prior_units=(8,), decoder_units=(8,),
        critic_units=(8,),
    )
    cfg = DistillConfig(num_envs=B, horizon_length=T,
                        minibatch_size=(T - 1) * B, mini_epochs=1)
    teacher = lambda obs: jnp.zeros(obs.shape[:-1] + (A,))
    host = DistillAgent(_DummyEnv(), teacher, cfg, net)
    dp = DistillAgent(_DummyEnv(make_mesh(8)), teacher, cfg, net)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, O)),
                      jnp.zeros((1, Z)))["params"]
    ds = DistillState(
        params=params,
        opt_state=host.optimizer.init(params),
        obs_rms=RunningMeanStd.create(O),
        env_state=None,
        key=jax.random.PRNGKey(3),
        epoch=jnp.zeros((), jnp.int32),
    )
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    traj = {
        "obs": jax.random.normal(ks[0], (T, B, O)),
        "gt_action": jax.random.normal(ks[1], (T, B, A)),
        "z_noise": jax.random.normal(ks[2], (T, B, Z)),
    }
    ds_h, m_h = jax.jit(host.update)(ds, traj)
    ds_d, m_d = jax.jit(dp.update)(ds, traj)
    for a, b in zip(jax.tree.leaves(ds_h.params), jax.tree.leaves(ds_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ds_h.obs_rms.mean), np.asarray(ds_d.obs_rms.mean), atol=1e-5
    )
    for k in m_h:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_d[k]), atol=1e-4, err_msg=k
        )


def test_dp_amp_disc_update_runs_and_rms_matches_host():
    """Agent-row sampling is per-shard in DP (by design), so disc params
    differ from the host update — but the rms moments (global rollout rows
    ++ demo rows) and the replicated demo buffer must match exactly."""
    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.learning.amp import AMPConfig, AMPModule
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
    clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    env = HumanoidImEnv(model, motion, EnvConfig())
    cfg = AMPConfig(disc_units=(16,), amp_batch_size=16, amp_buffer_size=64)
    host = AMPModule(env, cfg)
    amp0 = host.init(jax.random.PRNGKey(0))
    AO = env.amp_obs_dim
    rollout = jax.random.normal(jax.random.PRNGKey(1), (T, B, AO))
    key = jax.random.PRNGKey(2)

    st_h, m_h = jax.jit(host.update)(amp0, key, rollout)
    env.mesh = make_mesh(8)
    dp = AMPModule(env, cfg)
    st_d, m_d = jax.jit(dp.update)(amp0, key, rollout)

    np.testing.assert_allclose(
        np.asarray(st_h.amp_rms.mean), np.asarray(st_d.amp_rms.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_h.amp_rms.var), np.asarray(st_d.amp_rms.var),
        rtol=1e-5, atol=1e-5,
    )
    # demo pushes are replicated work with the same key -> identical buffers
    np.testing.assert_allclose(
        np.asarray(st_h.demo_buffer.data), np.asarray(st_d.demo_buffer.data),
        atol=1e-6,
    )
    assert int(st_h.replay_buffer.size) == int(st_d.replay_buffer.size)
    for leaf in jax.tree.leaves(st_d.disc_params):
        assert np.isfinite(np.asarray(leaf)).all()
    for k, v in m_d.items():
        assert np.isfinite(float(v)), k


def test_dp_update_rejects_indivisible_shapes():
    cfg = PPOConfig(num_envs=B, horizon_length=T, minibatch_size=T * B - 4,
                    mini_epochs=1)
    _, dp = _agents(cfg)
    ts = _state(dp, jax.random.PRNGKey(0))
    traj = _traj(jax.random.PRNGKey(1))
    adv = ret = jnp.zeros((T, B))
    with pytest.raises(ValueError, match="divisible"):
        dp.update(ts, traj, adv, ret)
