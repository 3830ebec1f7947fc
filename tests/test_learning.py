"""Learning-layer tests: GAE semantics, running norm, ring buffers,
networks, and end-to-end PPO improvement on a toy control problem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import struct

from pulse_tpu.learning.amp import AMPConfig, AMPModule, RingBuffer
from pulse_tpu.learning.networks import (
    ActorCritic,
    Discriminator,
    PulseVAE,
    kl_multi,
)
from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
from pulse_tpu.learning.running_norm import RunningMeanStd


class TestRunningMeanStd:
    def test_converges_to_batch_stats(self, rng):
        x = rng.normal(loc=3.0, scale=2.0, size=(4096, 8))
        rms = RunningMeanStd.create(8)
        for i in range(4):
            rms = rms.update(jnp.asarray(x[i * 1024 : (i + 1) * 1024]))
        np.testing.assert_allclose(rms.mean, x.mean(0), atol=0.1)
        np.testing.assert_allclose(jnp.sqrt(rms.var), x.std(0), atol=0.1)

    def test_frozen(self, rng):
        rms = RunningMeanStd.create(4).freeze()
        rms2 = rms.update(jnp.asarray(rng.normal(size=(64, 4))))
        np.testing.assert_allclose(rms2.mean, rms.mean)


class TestRingBuffer:
    def test_push_wraparound(self):
        buf = RingBuffer.create(8, 2)
        buf = buf.push(jnp.arange(12.0).reshape(6, 2))
        assert int(buf.size) == 6
        buf = buf.push(jnp.arange(12.0, 24.0).reshape(6, 2))
        assert int(buf.size) == 8
        # newest items present
        assert 22.0 in np.asarray(buf.data)

    def test_sample_in_range(self):
        buf = RingBuffer.create(16, 2).push(jnp.ones((4, 2)) * 7)
        s = buf.sample(jax.random.PRNGKey(0), 32)
        np.testing.assert_allclose(s, 7.0)


class TestNetworks:
    def test_actor_critic_shapes(self):
        net = ActorCritic(action_dim=69, actor_units=(64,), critic_units=(64,))
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((3, 100)))
        mu, log_sigma, value = net.apply(v, jnp.zeros((3, 100)))
        assert mu.shape == (3, 69)
        assert log_sigma.shape == (69,)
        np.testing.assert_allclose(log_sigma, -2.9)
        assert value.shape == (3,)

    def test_pulse_vae_shapes(self):
        net = PulseVAE(
            action_dim=69, latent_dim=8, self_obs_dim=20,
            encoder_units=(32,), prior_units=(32,), decoder_units=(32,),
            critic_units=(32,),
        )
        obs = jnp.zeros((5, 50))
        z = jnp.zeros((5, 8))
        v = net.init(jax.random.PRNGKey(0), obs, z)
        out = net.apply(v, obs, z)
        assert out["action_mu"].shape == (5, 69)
        assert out["post_mu"].shape == (5, 8)
        assert out["prior_logvar"].shape == (5, 8)
        assert out["value"].shape == (5,)

    def test_kl_multi_zero_for_identical(self):
        mu = jnp.ones((4, 8))
        logvar = jnp.zeros((4, 8)) - 0.3
        np.testing.assert_allclose(kl_multi(mu, logvar, mu, logvar), 0.0, atol=1e-6)

    def test_kl_multi_positive(self, rng):
        mu0 = jnp.asarray(rng.normal(size=(16, 8)))
        kl = kl_multi(mu0, jnp.zeros((16, 8)), jnp.zeros((16, 8)), jnp.zeros((16, 8)))
        assert np.all(np.asarray(kl) >= 0)


# --------------------------------------------------------------------------- #
# toy env to exercise the full PPO machinery quickly
# --------------------------------------------------------------------------- #

@struct.dataclass
class ToyState:
    pos: jax.Array
    target: jax.Array
    t: jax.Array
    key: jax.Array
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    terminate: jax.Array
    amp_obs: jax.Array


class ToyEnv:
    """Point chases target; reward = -|pos-target|^2. PPO must get >2x better."""

    obs_dim = 4
    action_dim = 2
    amp_obs_dim = 1

    def _obs(self, pos, target):
        return jnp.concatenate([pos, target - pos])

    def reset_one(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        pos = jax.random.uniform(k1, (2,), minval=-1, maxval=1)
        target = jax.random.uniform(k2, (2,), minval=-1, maxval=1)
        return ToyState(
            pos=pos, target=target, t=jnp.zeros((), jnp.int32), key=k3,
            obs=self._obs(pos, target), reward=jnp.zeros(()),
            done=jnp.zeros((), bool), terminate=jnp.zeros((), bool),
            amp_obs=jnp.zeros(1),
        )

    def step_one(self, s, a):
        pos = s.pos + 0.1 * a
        t = s.t + 1
        reward = -jnp.sum((pos - s.target) ** 2)
        done = t >= 16
        k1, k2 = jax.random.split(s.key)
        fresh = self.reset_one(k1)
        stepped = s.replace(
            pos=pos, t=t, key=k2, obs=self._obs(pos, s.target),
            reward=reward, done=done, terminate=jnp.zeros((), bool),
        )
        out = jax.tree.map(
            lambda a_, b_: jnp.where(
                jnp.reshape(done, (1,) * a_.ndim) if a_.ndim else done, a_, b_
            ),
            fresh, stepped,
        )
        return out.replace(reward=reward, done=done)

    def reset(self, keys):
        return jax.vmap(self.reset_one)(keys)

    def step(self, states, actions):
        return jax.vmap(self.step_one)(states, actions)


class TestPPO:
    def test_ppo_improves_toy(self):
        env = ToyEnv()
        cfg = PPOConfig(
            num_envs=64, horizon_length=16, minibatch_size=256, mini_epochs=2,
            learning_rate=3e-3, critic_coef=1.0, bounds_loss_coef=0.0,
        )
        net = ActorCritic(
            action_dim=2, actor_units=(64, 64), critic_units=(64, 64),
            init_sigma=-1.0,
        )
        agent = PPOAgent(env, cfg, net)
        ts = agent.init(jax.random.PRNGKey(0))
        train = jax.jit(agent.train_epoch)
        ts, m0 = train(ts)
        r_first = float(m0["reward_mean"])
        for _ in range(60):
            ts, m = train(ts)
        r_last = float(m["reward_mean"])
        assert r_last > r_first * 0.5 and r_last > -0.6, (r_first, r_last)

    def test_gae_hand_example(self):
        env = ToyEnv()
        agent = PPOAgent(env, PPOConfig(num_envs=1, horizon_length=3))
        from pulse_tpu.learning.ppo import Rollout

        traj = Rollout(
            obs=jnp.zeros((3, 1, 4)),
            actions=jnp.zeros((3, 1, 2)),
            neglogp=jnp.zeros((3, 1)),
            values=jnp.asarray([[1.0], [1.0], [1.0]]),
            rewards=jnp.asarray([[1.0], [1.0], [1.0]]),
            dones=jnp.asarray([[0.0], [0.0], [0.0]]),
            terminates=jnp.asarray([[0.0], [0.0], [0.0]]),
            amp_obs=jnp.zeros((3, 1, 1)),
            mus=jnp.zeros((3, 1, 2)),
        )
        adv, ret = agent.compute_gae(traj, jnp.asarray([1.0]))
        g, t = 0.99, 0.95
        # hand-rolled
        deltas = [1 + g * 1 - 1] * 3
        a2 = deltas[2]
        a1 = deltas[1] + g * t * a2
        a0 = deltas[0] + g * t * a1
        np.testing.assert_allclose(adv[:, 0], [a0, a1, a2], rtol=1e-5)
        np.testing.assert_allclose(ret[:, 0], np.asarray([a0, a1, a2]) + 1.0, rtol=1e-5)

    def test_gae_terminate_masks_bootstrap(self):
        env = ToyEnv()
        agent = PPOAgent(env, PPOConfig(num_envs=1, horizon_length=2))
        from pulse_tpu.learning.ppo import Rollout

        traj = Rollout(
            obs=jnp.zeros((2, 1, 4)),
            actions=jnp.zeros((2, 1, 2)),
            neglogp=jnp.zeros((2, 1)),
            values=jnp.asarray([[0.5], [0.7]]),
            rewards=jnp.asarray([[1.0], [1.0]]),
            dones=jnp.asarray([[1.0], [0.0]]),
            terminates=jnp.asarray([[1.0], [0.0]]),
            amp_obs=jnp.zeros((2, 1, 1)),
            mus=jnp.zeros((2, 1, 2)),
        )
        adv, _ = agent.compute_gae(traj, jnp.asarray([2.0]))
        g, t = 0.99, 0.95
        # step1: delta1 = 1 + g*2 - 0.7 ; step0 terminated: delta0 = 1 - 0.5,
        # recursion cut by done
        d1 = 1 + g * 2 - 0.7
        d0 = 1 - 0.5
        np.testing.assert_allclose(adv[:, 0], [d0, d1], rtol=1e-5)


class TestAMP:
    def test_disc_separates_distributions(self):
        """Discriminator trained on shifted gaussians should separate them."""

        class FakeEnv:
            amp_obs_dim = 8

        amp = AMPModule.__new__(AMPModule)
        amp.env = FakeEnv()
        amp.config = AMPConfig(disc_units=(32, 32), disc_learning_rate=1e-3)
        amp.disc = Discriminator(units=(32, 32))
        import optax

        amp.optimizer = optax.adam(1e-3)

        key = jax.random.PRNGKey(0)
        params = amp.disc.init(key, jnp.zeros((1, 8)))["params"]
        opt_state = amp.optimizer.init(params)
        rms = RunningMeanStd.create(8)

        @jax.jit
        def step(params, opt_state, key):
            k1, k2 = jax.random.split(key)
            agent = jax.random.normal(k1, (256, 8)) + 2.0
            demo = jax.random.normal(k2, (256, 8)) - 2.0
            (loss, metrics), grads = jax.value_and_grad(
                amp._disc_loss, has_aux=True
            )(params, agent, demo, rms)
            updates, opt_state = amp.optimizer.update(grads, opt_state, params)
            import optax as _o

            params = _o.apply_updates(params, updates)
            return params, opt_state, metrics

        for i in range(100):
            params, opt_state, metrics = step(
                params, opt_state, jax.random.PRNGKey(i)
            )
        assert float(metrics["disc_acc_agent"]) > 0.9
        assert float(metrics["disc_acc_demo"]) > 0.9
