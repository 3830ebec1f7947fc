"""MCP env surface: weights -> blended-primitive actions through every
step path (round-3 regression: a _ctor_kwargs insertion orphaned
`self.action_dim = pnn.num_primitives` behind a return, and the batched
Pallas branch bypassed the weight blending entirely; the action pathway is
now the motor_actions_one hook both paths share)."""

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import EnvConfig, HumanoidImEnv
from pulse_tpu.env.humanoid_im_mcp import HumanoidImMCPEnv
from pulse_tpu.learning.pnn import PNN, compose_actions
from pulse_tpu.motion import build_motion_data
from pulse_tpu.motion.synthetic import make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


def _mcp_env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
    clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    probe = HumanoidImEnv(model, motion, EnvConfig())
    pnn = PNN(action_dim=probe.action_dim, num_primitives=3, units=(32, 32))
    params = pnn.init(jax.random.PRNGKey(0), jnp.zeros((1, probe.obs_dim)))[
        "params"
    ]
    return HumanoidImMCPEnv(model, motion, EnvConfig(), pnn=pnn, pnn_params=params)


def test_mcp_action_dim_and_step():
    env = _mcp_env()
    # the composer policy's action space is the primitive weights
    assert env.action_dim == 3

    B = 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = env.reset(keys)
    weights = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
    nxt = jax.jit(env.step)(states, weights)
    assert nxt.obs.shape == (B, env.obs_dim)

    # the executed motor action is the softmax-blended primitive output
    motor = jax.vmap(env.motor_actions_one)(states, weights)
    prims = jax.vmap(lambda o: env.pnn.apply({"params": env.pnn_params}, o))(
        states.obs
    )
    want = jnp.clip(
        compose_actions(jax.nn.softmax(weights, axis=-1), prims), -1.0, 1.0
    )
    np.testing.assert_allclose(np.asarray(motor), np.asarray(want), atol=1e-6)


def test_mcp_per_column_norm_matches_shared():
    """column_inputs + stacked per-column RunningMeanStd == the shared-rms
    path when every column's stats are identical (the per-column normalizer
    is a strict generalization used by tools/curriculum.py's composer)."""
    from pulse_tpu.learning.running_norm import RunningMeanStd

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
    clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
    motion = build_motion_data(spec.skeleton, clips)
    probe = HumanoidImEnv(model, motion, EnvConfig())
    rms = RunningMeanStd.create(probe.obs_dim).replace(
        mean=jnp.linspace(-0.5, 0.5, probe.obs_dim),
        var=jnp.linspace(0.5, 2.0, probe.obs_dim),
    )
    N = 3
    key = jax.random.PRNGKey(0)
    shared = PNN(action_dim=probe.action_dim, num_primitives=N, units=(32, 32))
    params = shared.init(key, jnp.zeros((1, probe.obs_dim)))["params"]
    percol = PNN(
        action_dim=probe.action_dim, num_primitives=N, units=(32, 32),
        column_inputs=True,
    )
    stacked = rms.replace(
        mean=jnp.tile(rms.mean[None], (N, 1)), var=jnp.tile(rms.var[None], (N, 1))
    ).freeze()

    env_a = HumanoidImMCPEnv(
        model, motion, EnvConfig(), pnn=shared, pnn_params=params,
        obs_rms=rms.freeze(),
    )
    env_b = HumanoidImMCPEnv(
        model, motion, EnvConfig(), pnn=percol, pnn_params=params,
        obs_rms=stacked,
    )
    B = 4
    states = env_a.reset(jax.random.split(jax.random.PRNGKey(1), B))
    weights = jax.random.normal(jax.random.PRNGKey(2), (B, N))
    a = jax.vmap(env_a.motor_actions_one)(states, weights)
    b = jax.vmap(env_b.motor_actions_one)(states, weights)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # distinct per-column stats actually reach their columns: perturbing
    # only column 0's mean changes the blend iff column 0 has weight
    stacked2 = stacked.replace(mean=stacked.mean.at[0].add(1.0))
    env_c = HumanoidImMCPEnv(
        model, motion, EnvConfig(), pnn=percol, pnn_params=params,
        obs_rms=stacked2,
    )
    c = jax.vmap(env_c.motor_actions_one)(states, weights)
    assert not np.allclose(np.asarray(b), np.asarray(c))


def test_mcp_gate_temp_routing():
    """gate_temp lets [-1,1]-clipped gate logits express near-one-hot
    routing: at temp 1 a +-1 one-hot logit tops out at softmax weight
    ~0.6 (N=3), so the blend never hands full control to one column; at
    temp 8 the same logits route >0.999 to the chosen column and the motor
    action matches that column's primitive output."""
    env1 = _mcp_env()
    env8 = HumanoidImMCPEnv(
        env1.model, env1.motion, EnvConfig(),
        pnn=env1.pnn, pnn_params=env1.pnn_params, gate_temp=8.0,
    )
    B = 4
    states = env1.reset(jax.random.split(jax.random.PRNGKey(1), B))
    # representable optimum under the action clip: 2*onehot - 1
    weights = jnp.tile(jnp.array([[1.0, -1.0, -1.0]]), (B, 1))
    prims = jax.vmap(lambda o: env1.pnn.apply({"params": env1.pnn_params}, o))(
        states.obs
    )
    col0 = jnp.clip(prims[:, 0, :], -1.0, 1.0)
    hot = jax.vmap(env8.motor_actions_one)(states, weights)
    np.testing.assert_allclose(np.asarray(hot), np.asarray(col0), atol=1e-3)
    blend = jax.vmap(env1.motor_actions_one)(states, weights)
    # temp 1 cannot: the off columns keep ~40% of the blend
    assert np.abs(np.asarray(blend) - np.asarray(col0)).max() > 1e-2

    # gate_temp survives with_config's rebuild (ctor kwargs round-trip)
    import dataclasses as dc

    assert env8.with_config(
        dc.replace(env8.config, enable_early_termination=False)
    ).gate_temp == 8.0


def test_mcp_with_config_roundtrip():
    import dataclasses as dc

    env = _mcp_env()
    new = env.with_config(dc.replace(env.config, enable_early_termination=False))
    assert type(new) is HumanoidImMCPEnv
    assert new.action_dim == 3
    assert new.pnn is env.pnn
    assert not new.config.enable_early_termination
