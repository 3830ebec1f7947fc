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

    def step(self, states, actions, sampling_prob=None):
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


class TestDemoFetchers:
    """CALM-style enc-pair demo fetches (≙ humanoid_amp.py:833-881)."""

    @pytest.fixture(scope="class")
    def amp_env(self):
        from pulse_tpu.assets import load_smpl_humanoid
        from pulse_tpu.env import HumanoidImEnv, EnvConfig
        from pulse_tpu.motion import build_motion_data, make_synthetic_clips
        from pulse_tpu.physics import PhysicsConfig, build_model

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=2.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(model, motion, EnvConfig(num_amp_obs_steps=4))
        return env

    def test_fetch_demo_enc_pair(self, amp_env):
        amp = AMPModule(amp_env)
        ids, enc_t, enc_obs, t, obs = jax.jit(
            lambda k: amp.fetch_demo_enc_pair(k, 16, enc_steps=8)
        )(jax.random.PRNGKey(0))
        single = amp_env.amp_obs_dim // 4
        assert enc_obs.shape == (16, 8 * single)
        assert obs.shape == (16, 4 * single)
        assert np.all(np.isfinite(np.asarray(enc_obs)))
        # the short window lies inside the long one
        assert np.all(np.asarray(t) <= np.asarray(enc_t) + 1e-6)

    def test_fetch_demo_pair(self, amp_env):
        amp = AMPModule(amp_env)
        ids, t0, obs0, t1, obs1 = jax.jit(
            lambda k: amp.fetch_demo_pair(k, 16, enc_steps=8)
        )(jax.random.PRNGKey(1))
        assert obs0.shape == obs1.shape
        lengths = np.asarray(amp_env.motion.motion_lengths)[np.asarray(ids)]
        assert np.all(np.asarray(t1) <= lengths + 1e-6)
        assert np.all(np.asarray(t1) >= np.asarray(t0) - 1e-6)
        assert np.all(np.isfinite(np.asarray(obs0)))


class TestRNNPPO:
    """Recurrent actor-critic + truncated-BPTT PPO (≙ the rl-games RNN
    option: network_builder.py:94 _build_rnn, amp_agent.py:192-339)."""

    def test_rnn_cell_resets_on_done(self):
        from pulse_tpu.learning.networks import RNNActorCritic

        net = RNNActorCritic(action_dim=2, trunk_units=(16,), rnn_size=8)
        obs = jnp.ones((3, 4))
        carry0 = net.initial_carry((3,))
        params = net.init(jax.random.PRNGKey(0), carry0, obs)["params"]
        carry1, _ = net.apply({"params": params}, carry0, obs)
        # done on env 1 only: its output must equal a fresh-carry output
        done = jnp.asarray([False, True, False])
        carry2, (mu_d, _, _) = net.apply({"params": params}, carry1, obs, done)
        _, (mu_fresh, _, _) = net.apply({"params": params}, carry0, obs)
        np.testing.assert_allclose(mu_d[1], mu_fresh[1], rtol=1e-5)
        assert np.abs(np.asarray(mu_d[0] - mu_fresh[0])).max() > 1e-7

    def test_rnn_ppo_improves_toy(self):
        from pulse_tpu.learning.networks import RNNActorCritic

        env = ToyEnv()
        cfg = PPOConfig(
            num_envs=64, horizon_length=16, minibatch_size=256, mini_epochs=2,
            learning_rate=3e-3, critic_coef=1.0, bounds_loss_coef=0.0,
            seq_len=4,
        )
        net = RNNActorCritic(
            action_dim=2, trunk_units=(64,), rnn_size=64, init_sigma=-1.0,
            dtype=jnp.float32,
        )
        agent = PPOAgent(env, cfg, net)
        assert agent.recurrent
        ts = agent.init(jax.random.PRNGKey(0))
        train = jax.jit(agent.train_epoch)
        ts, m0 = train(ts)
        r_first = float(m0["reward_mean"])
        for _ in range(80):
            ts, m = train(ts)
        r_last = float(m["reward_mean"])
        assert r_last > r_first * 0.6 and r_last > -0.8, (r_first, r_last)


class TestZEmbedding:
    """Non-gaussian z spaces (≙ form_embedding, amp_network_z_builder.py:79-223)."""

    @pytest.mark.parametrize("z_type", ["sphere", "vq_vae", "vq_vae_hybrid", "vq_vae_res"])
    def test_shapes_and_semantics(self, z_type):
        from pulse_tpu.learning.networks import ZEmbedding
        from pulse_tpu.learning.vq_quantizer import create_codebook

        net = ZEmbedding(latent_dim=8, z_type=z_type, embedding_norm=3.0)
        feat = jax.random.normal(jax.random.PRNGKey(0), (5, 16))
        cb = create_codebook(jax.random.PRNGKey(1), 32, 8)
        params = net.init(jax.random.PRNGKey(2), feat, cb)["params"]
        z, extras = net.apply({"params": params}, feat, cb)
        if z_type == "sphere":
            assert z.shape == (5, 8)
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(z), axis=-1), 3.0, rtol=1e-4
            )
        elif z_type == "vq_vae":
            assert z.shape == (5, 8)
            assert "commit_loss" in extras and extras["indexes"].shape == (5,)
        elif z_type == "vq_vae_hybrid":
            assert z.shape == (5, 16)  # code ⊕ residual
            # residual channel clipped at 0.1
            assert np.abs(np.asarray(z[:, 8:])).max() <= 0.1 + 1e-6
        elif z_type == "vq_vae_res":
            assert z.shape == (5, 8)
            # gain in [0, 2] scales a norm-3 code
            assert np.linalg.norm(np.asarray(z), axis=-1).max() <= 6.0 + 1e-4

    def test_vq_gradients_flow_straight_through(self):
        from pulse_tpu.learning.networks import ZEmbedding
        from pulse_tpu.learning.vq_quantizer import create_codebook

        net = ZEmbedding(latent_dim=4, z_type="vq_vae")
        feat = jnp.ones((2, 8))
        cb = create_codebook(jax.random.PRNGKey(1), 16, 4)
        params = net.init(jax.random.PRNGKey(2), feat, cb)["params"]

        def loss(p):
            z, _ = net.apply({"params": p}, feat, cb)
            return jnp.sum(z**2)

        g = jax.grad(loss)(params)
        gmax = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g))
        assert gmax > 0.0


class TestSeptPointnet:
    def test_pointnet_channel(self):
        from pulse_tpu.learning.networks import SeptActorCritic

        net = SeptActorCritic(
            action_dim=3, self_obs_dim=10,
            self_units=(16,), task_units=(16,), actor_units=(16,),
            critic_units=(16,), num_points=4, point_dim=3, point_units=(8,),
        )
        obs = jax.random.normal(jax.random.PRNGKey(0), (2, 10 + 5 + 12))
        params = net.init(jax.random.PRNGKey(1), obs)["params"]
        mu, ls, v = net.apply({"params": params}, obs)
        assert mu.shape == (2, 3) and v.shape == (2,)
        # max-pool => permuting the points must not change the output
        pts = obs[:, -12:].reshape(2, 4, 3)
        perm = pts[:, [2, 0, 3, 1], :].reshape(2, 12)
        obs2 = jnp.concatenate([obs[:, :-12], perm], axis=-1)
        mu2, _, _ = net.apply({"params": params}, obs2)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), rtol=1e-5)


class TestCNN:
    def test_cnn_actor_critic(self):
        from pulse_tpu.learning.networks import CNNActorCritic

        net = CNNActorCritic(
            action_dim=4, grid_shape=(8, 8), conv_channels=(4, 8),
            actor_units=(32,), critic_units=(32,), dtype=jnp.float32,
        )
        obs = jax.random.normal(jax.random.PRNGKey(0), (3, 20 + 64))
        params = net.init(jax.random.PRNGKey(1), obs)["params"]
        mu, ls, v = net.apply({"params": params}, obs)
        assert mu.shape == (3, 4) and v.shape == (3,)
        assert "conv" in params
        # grid content must influence the output
        obs2 = obs.at[:, -64:].add(1.0)
        mu2, _, _ = net.apply({"params": params}, obs2)
        assert np.abs(np.asarray(mu - mu2)).max() > 1e-6


class TestGAEAssociativeScan:
    def test_matches_sequential_reference(self):
        """compute_gae's associative-scan recurrence must equal the naive
        sequential backward scan (the reference's discount_values loop,
        common_agent.py:480-490) to float tolerance."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from pulse_tpu.learning.ppo import PPOAgent, PPOConfig, Rollout

        rng = np.random.RandomState(0)
        T, B = 17, 5
        rewards = rng.randn(T, B).astype(np.float32)
        values = rng.randn(T, B).astype(np.float32)
        last_value = rng.randn(B).astype(np.float32)
        dones = (rng.rand(T, B) < 0.2)
        terms = dones & (rng.rand(T, B) < 0.5)
        cfg = PPOConfig(gamma=0.97, tau=0.9)

        class _Env:
            obs_dim = 3
            action_dim = 2

            def reset(self, keys):
                raise NotImplementedError

        agent = PPOAgent.__new__(PPOAgent)
        agent.config = cfg
        traj = Rollout(
            obs=jnp.zeros((T, B, 3)), actions=jnp.zeros((T, B, 2)),
            neglogp=jnp.zeros((T, B)), values=jnp.asarray(values),
            rewards=jnp.asarray(rewards), dones=jnp.asarray(dones),
            terminates=jnp.asarray(terms), amp_obs=jnp.zeros((T, B, 1)),
            mus=jnp.zeros((T, B, 2)),
        )
        adv, ret = agent.compute_gae(traj, jnp.asarray(last_value))

        # naive sequential reference
        next_values = np.concatenate([values[1:], last_value[None]], 0)
        want = np.zeros((T, B), np.float32)
        last_gae = np.zeros(B, np.float32)
        for t in reversed(range(T)):
            nt = 1.0 - terms[t].astype(np.float32)
            nd = 1.0 - dones[t].astype(np.float32)
            delta = rewards[t] + cfg.gamma * next_values[t] * nt - values[t]
            last_gae = delta + cfg.gamma * cfg.tau * nd * last_gae
            want[t] = last_gae
        np.testing.assert_allclose(np.asarray(adv), want, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ret), want + values, atol=1e-5)
