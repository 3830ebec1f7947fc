"""End-to-end PULSE distillation smoke + loss behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import EnvConfig, HumanoidImEnv
from pulse_tpu.learning.distill import DistillAgent, DistillConfig
from pulse_tpu.learning.networks import ActorCritic, PulseVAE
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


@pytest.fixture(scope="module")
def setup():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.5)
    motion = build_motion_data(spec.skeleton, clips)
    env = HumanoidImEnv(model, motion, EnvConfig(num_amp_obs_steps=2))

    teacher_net = ActorCritic(action_dim=env.action_dim, actor_units=(32,), critic_units=(32,))
    tparams = teacher_net.init(jax.random.PRNGKey(3), jnp.zeros((1, env.obs_dim)))["params"]

    def teacher_fn(obs):
        mu, _, _ = teacher_net.apply({"params": tparams}, obs)
        return jnp.clip(mu, -1.0, 1.0)

    student = PulseVAE(
        action_dim=env.action_dim, latent_dim=8, self_obs_dim=env.self_obs_dim,
        encoder_units=(64,), prior_units=(32,), decoder_units=(64,), critic_units=(32,),
    )
    agent = DistillAgent(
        env, teacher_fn,
        DistillConfig(num_envs=4, horizon_length=4, minibatch_size=8, mini_epochs=1),
        student,
    )
    return env, agent


class TestDistill:
    def test_train_epoch_runs(self, setup):
        env, agent = setup
        ds = agent.init(jax.random.PRNGKey(0))
        train = jax.jit(agent.train_epoch)
        ds, metrics = train(ds)
        assert np.isfinite(float(metrics["bc_loss"]))
        assert np.isfinite(float(metrics["kld"]))
        assert float(metrics["kld"]) >= 0
        assert int(ds.epoch) == 1

    def test_bc_loss_decreases(self, setup):
        env, agent = setup
        ds = agent.init(jax.random.PRNGKey(1))
        train = jax.jit(agent.train_epoch)
        ds, m0 = train(ds)
        first = float(m0["bc_loss"])
        for _ in range(8):
            ds, m = train(ds)
        assert float(m["bc_loss"]) < first, (first, float(m["bc_loss"]))

    def test_kld_anneal_schedule(self, setup):
        env, agent = setup
        c0 = float(agent.kld_coef(jnp.asarray(0)))
        c_mid = float(agent.kld_coef(jnp.asarray(3750)))
        c_end = float(agent.kld_coef(jnp.asarray(10000)))
        assert c0 == pytest.approx(0.01)
        assert c_end == pytest.approx(0.001)
        assert c_end < c_mid < c0
