"""AMP agent parity machinery (round-1 VERDICT item 9):
recurrent AMP rollouts, the getup reward-weight schedule + periodic shape
resample (pre_epoch), the frozen running-mean trick, and joint RL+kin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import EnvConfig, HumanoidImEnv
from pulse_tpu.learning.amp import AMPConfig
from pulse_tpu.learning.amp_agent import AMPAgent
from pulse_tpu.learning.networks import ActorCritic, RNNActorCritic
from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


@pytest.fixture(scope="module")
def env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    return HumanoidImEnv(model, motion, EnvConfig(episode_length=20))


N_ENVS = 4


def small_ppo_cfg(**kw):
    return PPOConfig(
        num_envs=N_ENVS, horizon_length=4, minibatch_size=8, mini_epochs=1,
        seq_len=2, **kw,
    )


def small_amp_cfg():
    return AMPConfig(amp_batch_size=8, amp_buffer_size=64, disc_units=(32,))


def test_rnn_amp_train_epoch(env):
    """The RNN/BPTT rollout reaches AMP (round 1 hardcoded feedforward)."""
    net = RNNActorCritic(
        action_dim=env.action_dim, trunk_units=(32,), rnn_size=16
    )
    agent = AMPAgent(env, small_ppo_cfg(), small_amp_cfg(), net)
    assert agent.ppo.recurrent
    ts = agent.init(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(agent.train_epoch)(ts)
    assert np.isfinite(float(metrics["reward_mean"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    # a second epoch continues from the carried hidden state
    ts, metrics = jax.jit(agent.train_epoch)(ts)
    assert np.isfinite(float(metrics["reward_mean"]))


def test_getup_weight_schedule(env):
    agent = AMPAgent(
        env, small_ppo_cfg(),
        small_amp_cfg(),
        ActorCritic(action_dim=env.action_dim, actor_units=(32,), critic_units=(32,)),
        getup_update_epoch=100,
    )
    ts = agent.init(jax.random.PRNGKey(0))
    # during the getup phase: pure style reward
    assert float(ts.amp.task_reward_w) == 0.0
    assert float(ts.amp.disc_reward_w) == 1.0
    ts = agent.pre_epoch(ts, 50)
    assert float(ts.amp.task_reward_w) == 0.0
    ts = agent.pre_epoch(ts, 101)
    assert float(ts.amp.task_reward_w) == 0.5
    assert float(ts.amp.disc_reward_w) == 0.5
    # combine_rewards uses the dynamic weights
    task_r, disc_r = jnp.ones(3), jnp.zeros(3)
    np.testing.assert_allclose(
        np.asarray(agent.amp.combine_rewards(task_r, disc_r, ts.amp)), 0.5
    )


def test_getup_env_phase_flip(env):
    from pulse_tpu.env.humanoid_im_getup import GetupConfig, HumanoidImGetupEnv

    genv = HumanoidImGetupEnv(
        env.model, env.motion,
        GetupConfig(episode_length=20, fall_init_prob=0.1,
                    recovery_episode_prob=0.3, num_fall_states=4,
                    fall_settle_steps=3),
    )
    changed = genv.set_getup_phase(False)
    assert changed
    assert genv.config.fall_init_prob == 1.0
    assert genv.config.recovery_episode_prob == 0.0
    assert not genv.set_getup_phase(False)  # idempotent
    assert genv.set_getup_phase(True)
    assert genv.config.fall_init_prob == 0.1
    assert genv.config.recovery_episode_prob == 0.3


def test_shape_resample_schedule(env):
    agent = AMPAgent(
        env, small_ppo_cfg(), small_amp_cfg(),
        ActorCritic(action_dim=env.action_dim, actor_units=(32,), critic_units=(32,)),
        shape_resampling_interval=10,
    )
    env.enable_shape_variation(jax.random.PRNGKey(0), N_ENVS)
    before = np.asarray(env.batched_model.body_mass)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.pre_epoch(ts, 5)   # not on the interval
    np.testing.assert_array_equal(np.asarray(env.batched_model.body_mass), before)
    assert not agent.needs_retrace
    ts = agent.pre_epoch(ts, 11)  # interval hit (epoch % 10 == 1)
    assert agent.needs_retrace
    assert not np.array_equal(np.asarray(env.batched_model.body_mass), before)
    env.batched_model = None  # restore module fixture


def test_temp_running_mean_freezes_loss_stats(env):
    """Gradient steps must normalize with the epoch-start stats while the
    running stats still advance (≙ amp_agent.py:578-603)."""
    net = ActorCritic(action_dim=env.action_dim, actor_units=(32,), critic_units=(32,))
    agent_frozen = PPOAgent(env, small_ppo_cfg(temp_running_mean=True), net)
    agent_live = PPOAgent(env, small_ppo_cfg(temp_running_mean=False), net)
    ts0 = agent_frozen.init(jax.random.PRNGKey(0))

    ts_f, _ = jax.jit(agent_frozen.train_epoch)(ts0)
    ts_l, _ = jax.jit(agent_live.train_epoch)(ts0)
    # stats advance identically (same rollout)…
    np.testing.assert_allclose(
        np.asarray(ts_f.obs_rms.mean), np.asarray(ts_l.obs_rms.mean), atol=1e-6
    )
    # …but the gradient step differs because the loss saw different stats
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts_f.params, ts_l.params
    )
    assert max(jax.tree.leaves(d)) > 0


def test_joint_rl_kin_agent(env):
    from pulse_tpu.learning.amp_agent import JointAMPDistillAgent
    from pulse_tpu.learning.distill import DistillAgent, DistillConfig
    from pulse_tpu.learning.networks import PulseVAE

    net = ActorCritic(action_dim=env.action_dim, actor_units=(32,), critic_units=(32,))
    amp_agent = AMPAgent(env, small_ppo_cfg(), small_amp_cfg(), net)
    vae = PulseVAE(
        action_dim=env.action_dim, latent_dim=8, self_obs_dim=env.self_obs_dim,
        encoder_units=(32,), prior_units=(16,), decoder_units=(32,),
        critic_units=(32,),
    )

    def teacher(obs):
        return jnp.zeros(obs.shape[:-1] + (env.action_dim,))

    dc = DistillConfig(
        num_envs=N_ENVS, horizon_length=4, minibatch_size=8, mini_epochs=1
    )
    joint = JointAMPDistillAgent(amp_agent, DistillAgent(env, teacher, dc, vae))
    ts = joint.init(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(joint.train_epoch)(ts)
    assert np.isfinite(float(metrics["reward_mean"]))
    assert any(k.startswith("kin_") for k in metrics)


def test_joint_mode_single_rollout(env):
    """The joint RL+kin epoch must roll the env EXACTLY ONCE (≙ the
    reference computing kin_dict inside play_steps, amp_agent.py:637-654 —
    round-2 VERDICT missing #5: two independent rollouts doubled env cost
    and trained BC on different states than RL saw)."""
    from pulse_tpu.learning.amp_agent import JointAMPDistillAgent
    from pulse_tpu.learning.distill import DistillAgent, DistillConfig
    from pulse_tpu.learning.networks import PulseVAE

    horizon = 4

    calls = {"n": 0}
    real_step = env.step

    class CountingEnv:
        def __getattr__(self, name):
            return getattr(env, name)

        def step(self, states, actions, sampling_prob=None):
            calls["n"] += 1
            return real_step(states, actions, sampling_prob)

    cenv = CountingEnv()
    net = ActorCritic(action_dim=env.action_dim, actor_units=(32,), critic_units=(32,))
    amp_agent = AMPAgent(cenv, small_ppo_cfg(), small_amp_cfg(), net)
    vae = PulseVAE(
        action_dim=env.action_dim, latent_dim=8, self_obs_dim=env.self_obs_dim,
        encoder_units=(32,), prior_units=(16,), decoder_units=(32,),
        critic_units=(32,),
    )

    def teacher(obs):
        return jnp.zeros(obs.shape[:-1] + (env.action_dim,))

    dc = DistillConfig(
        num_envs=N_ENVS, horizon_length=horizon, minibatch_size=8, mini_epochs=1
    )
    joint = JointAMPDistillAgent(amp_agent, DistillAgent(cenv, teacher, dc, vae))
    ts = joint.init(jax.random.PRNGKey(0))
    calls["n"] = 0
    # trace (not run) the epoch: each env.step call site appears once
    jax.make_jaxpr(joint.train_epoch)(ts)
    # the rollout scans over the horizon with ONE traced step call; a second
    # independent rollout would double this
    assert calls["n"] == 1, f"env.step traced {calls['n']} times, want 1"


def test_demo_shape_channels_carry_clip_betas():
    """has_shape_obs_disc demo rows must carry each CLIP's own
    [gender, betas] from the motion store — not zeros, which would hand the
    discriminator a trivial agent-vs-demo tell on shape-varied training
    (≙ motion_bodies in build_amp_obs_demo, humanoid_amp.py:253-284)."""
    from pulse_tpu.learning.amp import AMPModule

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=3, seconds=1.0)
    rng = np.random.default_rng(3)
    shape_rows = rng.normal(size=(3, 11)).astype(np.float32)
    for c, row in zip(clips, shape_rows):
        c["shape_params"] = row
    motion = build_motion_data(spec.skeleton, clips)
    np.testing.assert_array_equal(np.asarray(motion.shape_params), shape_rows)

    env = HumanoidImEnv(
        model,
        motion,
        EnvConfig(has_shape_obs=True, has_shape_obs_disc=True),
    )
    amp = AMPModule(env, small_amp_cfg())
    demo = jax.jit(lambda k: amp.fetch_demo(k, 16))(jax.random.PRNGKey(0))
    assert demo.shape == (16, env.amp_obs_dim)
    S, A = env.config.num_amp_obs_steps, env.amp_obs_dim_single
    rows = np.asarray(demo).reshape(16, S, A)
    shape_channel = rows[..., A - 11 : A]   # trailing [gender, betas] block
    # every demo row's shape channel matches exactly one clip's stored row,
    # and it is constant across the window's steps
    for i in range(16):
        np.testing.assert_array_equal(
            shape_channel[i], np.tile(shape_channel[i, 0], (S, 1))
        )
        dists = np.abs(shape_rows - shape_channel[i, 0]).max(axis=1)
        assert dists.min() < 1e-6, f"demo {i} shape row matches no clip"
    # with 16 draws over 3 uniform clips, more than one clip appears
    matched = {int(np.argmin(np.abs(shape_rows - shape_channel[i, 0]).max(axis=1))) for i in range(16)}
    assert len(matched) > 1
