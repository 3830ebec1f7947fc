"""Round-trip tests for the reference .pth checkpoint importer.

Builds torch modules EXACTLY as the reference's rl-games builders lay them
out (amp_network_z_builder.py:489-557 z_mlp/z_prior/actor_mlp layout,
phc/learning/pnn.py PNN actors+laterals, network_loader.py:11-52 composer
reconstruction), saves a state dict under the reference key names, imports
with pulse_tpu.utils.checkpoint, and checks the flax forward matches the
torch forward to float32 precision.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from pulse_tpu.learning.networks import ActorCritic, Decoder, Encoder, Prior, PulseVAE
from pulse_tpu.learning.pnn import PNN, MCPComposer
from pulse_tpu.utils import checkpoint as ck

OBS, SELF_OBS, EMB, ACT_DIM = 20, 12, 8, 10
UNITS = (32, 16)
PRIOR_UNITS = (24, 12)


def mlp_seq(in_dim, units, act=nn.SiLU, final=None):
    layers = []
    for u in units:
        layers += [nn.Linear(in_dim, u), act()]
        in_dim = u
    if final is not None:
        layers.append(nn.Linear(in_dim, final))
    return nn.Sequential(*layers)


def sd_numpy(prefix, module):
    return {
        f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()
    }


@pytest.fixture(scope="module")
def torch_vae():
    torch.manual_seed(0)
    # z_mlp: activated trunk + UNactivated Linear to emb*5 (builder :489-492)
    z_mlp = mlp_seq(OBS, UNITS, final=EMB * 5)
    z_mu = nn.Linear(EMB * 5, EMB)
    z_logvar = nn.Linear(EMB * 5, EMB)
    z_prior = mlp_seq(SELF_OBS, PRIOR_UNITS)
    z_prior_mu = nn.Linear(PRIOR_UNITS[-1], EMB)
    z_prior_logvar = nn.Linear(PRIOR_UNITS[-1], EMB)
    actor_mlp = mlp_seq(SELF_OBS + EMB, UNITS)
    mu = nn.Linear(UNITS[-1], ACT_DIM)
    critic_mlp = mlp_seq(OBS, UNITS)
    value = nn.Linear(UNITS[-1], 1)
    sd = {}
    for name, mod in [
        ("a2c_network.z_mlp", z_mlp), ("a2c_network.z_mu", z_mu),
        ("a2c_network.z_logvar", z_logvar), ("a2c_network.z_prior", z_prior),
        ("a2c_network.z_prior_mu", z_prior_mu),
        ("a2c_network.z_prior_logvar", z_prior_logvar),
        ("a2c_network.actor_mlp", actor_mlp), ("a2c_network.mu", mu),
        ("a2c_network.critic_mlp", critic_mlp), ("a2c_network.value", value),
    ]:
        sd.update(sd_numpy(name, mod))
    mods = dict(
        z_mlp=z_mlp, z_mu=z_mu, z_logvar=z_logvar, z_prior=z_prior,
        z_prior_mu=z_prior_mu, z_prior_logvar=z_prior_logvar,
        actor_mlp=actor_mlp, mu=mu, critic_mlp=critic_mlp, value=value,
    )
    return sd, mods


def test_load_torch_checkpoint_roundtrip(tmp_path, torch_vae):
    sd, _ = torch_vae
    path = tmp_path / "Humanoid_00000100.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}, "epoch": 100}, path)
    ckpt = ck.load_torch_checkpoint(str(path))
    assert ckpt["epoch"] == 100
    assert set(ckpt["model"]) == set(sd)
    np.testing.assert_array_equal(ckpt["model"]["a2c_network.mu.weight"], sd["a2c_network.mu.weight"])


def test_import_encoder(torch_vae):
    sd, m = torch_vae
    rng = np.random.RandomState(1)
    obs = rng.randn(5, OBS).astype(np.float32)
    with torch.no_grad():
        h = m["z_mlp"](torch.from_numpy(obs))
        want_mu = m["z_mu"](h).numpy()
        want_lv = m["z_logvar"](h).numpy()
    enc = Encoder(latent_dim=EMB, units=UNITS, activation="silu")
    params = ck.import_z_encoder(sd)
    got_mu, got_lv = enc.apply({"params": params}, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lv), want_lv, atol=1e-5)


def test_import_prior(torch_vae):
    sd, m = torch_vae
    rng = np.random.RandomState(2)
    sobs = rng.randn(5, SELF_OBS).astype(np.float32)
    with torch.no_grad():
        h = m["z_prior"](torch.from_numpy(sobs))
        want_mu = m["z_prior_mu"](h).numpy()
        want_lv = m["z_prior_logvar"](h).numpy()
    prior = Prior(latent_dim=EMB, units=PRIOR_UNITS, activation="silu")
    params = ck.import_z_prior(sd)
    got_mu, got_lv = prior.apply({"params": params}, jnp.asarray(sobs))
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, atol=1e-5)
    # our Prior clamps logvar (clamped-prior variant); apply same clamp
    np.testing.assert_allclose(np.asarray(got_lv), np.clip(want_lv, -8.0, 2.0), atol=1e-5)


def test_import_decoder(torch_vae):
    sd, m = torch_vae
    rng = np.random.RandomState(3)
    sobs = rng.randn(5, SELF_OBS).astype(np.float32)
    z = rng.randn(5, EMB).astype(np.float32)
    with torch.no_grad():
        want = m["mu"](m["actor_mlp"](torch.from_numpy(np.concatenate([sobs, z], -1)))).numpy()
    dec = Decoder(action_dim=ACT_DIM, units=UNITS, activation="silu")
    params = ck.import_z_decoder(sd)
    got = dec.apply({"params": params}, jnp.asarray(sobs), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_import_pulse_vae_full(torch_vae):
    sd, m = torch_vae
    rng = np.random.RandomState(4)
    obs = rng.randn(5, OBS).astype(np.float32)
    noise = rng.randn(5, EMB).astype(np.float32)
    vae = PulseVAE(
        action_dim=ACT_DIM, latent_dim=EMB, self_obs_dim=SELF_OBS,
        encoder_units=UNITS, prior_units=PRIOR_UNITS, decoder_units=UNITS,
        critic_units=UNITS, activation="silu",
    )
    params = ck.import_pulse_vae(sd)
    out = vae.apply({"params": params}, jnp.asarray(obs), jnp.asarray(noise))
    with torch.no_grad():
        to = torch.from_numpy(obs)
        ts = to[:, :SELF_OBS]
        h = m["z_mlp"](to)
        post_mu, post_lv = m["z_mu"](h), m["z_logvar"](h)
        ph = m["z_prior"](ts)
        prior_mu = m["z_prior_mu"](ph)
        z = post_mu + torch.exp(0.5 * post_lv) * torch.from_numpy(noise)
        want_action = m["mu"](m["actor_mlp"](torch.cat([ts, prior_mu + z], -1))).numpy()
        want_value = m["value"](m["critic_mlp"](to)).numpy()[:, 0]
    np.testing.assert_allclose(np.asarray(out["action_mu"]), want_action, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["value"]), want_value, atol=1e-5)


def test_import_actor_critic(torch_vae):
    sd, m = torch_vae
    # reuse critic stack; build an actor on full obs for this test
    torch.manual_seed(5)
    actor_mlp = mlp_seq(OBS, UNITS)
    mu = nn.Linear(UNITS[-1], ACT_DIM)
    sd2 = dict(sd)
    sd2.update(sd_numpy("a2c_network.actor_mlp", actor_mlp))
    sd2.update(sd_numpy("a2c_network.mu", mu))
    sd2["a2c_network.sigma"] = np.full((ACT_DIM,), -2.9, np.float32)
    rng = np.random.RandomState(6)
    obs = rng.randn(5, OBS).astype(np.float32)
    with torch.no_grad():
        want_mu = mu(actor_mlp(torch.from_numpy(obs))).numpy()
        want_v = m["value"](m["critic_mlp"](torch.from_numpy(obs))).numpy()[:, 0]
    ac = ActorCritic(
        action_dim=ACT_DIM, actor_units=UNITS, critic_units=UNITS,
        activation="silu", learn_sigma=True, dtype=jnp.float32,
    )
    params = ck.import_actor_critic(sd2)
    got_mu, log_sigma, got_v = ac.apply({"params": params}, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_sigma), -2.9)


class RefTorchPNN(nn.Module):
    """The reference PNN rebuilt verbatim in plain torch (pnn.py:11-131):
    actors = Sequential[L, act, L, act, L]; lateral u[i][j] = bias-free
    [Linear(units0->units1), Linear(units1->out)]; forward uses only the
    first lateral layer, at the second hidden layer's pre-activation."""

    def __init__(self, in_dim, units, out_dim, num_cols, act=nn.ReLU):
        super().__init__()
        assert len(units) == 2
        self.num_cols = num_cols
        self.actors = nn.ModuleList(
            [mlp_seq(in_dim, units, act=act, final=out_dim) for _ in range(num_cols)]
        )
        self.u = nn.ModuleList()
        for i in range(num_cols - 1):
            row = nn.ModuleList()
            for _ in range(i + 1):
                row.append(
                    nn.Sequential(
                        nn.Linear(units[0], units[1], bias=False),
                        nn.Linear(units[1], out_dim, bias=False),
                    )
                )
            self.u.append(row)

    def forward(self, x):
        cache1, outs = [], []
        for c in range(self.num_cols):
            a = self.actors[c]
            act1 = a[:2](x)
            lat = sum(
                (self.u[c - 1][pc][0](cache1[pc]) for pc in range(c)),
                torch.zeros(()),
            )
            act2 = a[3](a[2](act1) + lat)
            outs.append(a[4](act2))
            cache1.append(act1)
        return outs


def test_import_pnn_lateral():
    torch.manual_seed(7)
    in_dim, units, out_dim, n_cols = OBS, (32, 16), ACT_DIM, 3
    ref = RefTorchPNN(in_dim, units, out_dim, n_cols)
    sd = sd_numpy("a2c_network.pnn", ref)
    params, info = ck.import_pnn(sd)
    assert info["num_primitives"] == n_cols
    assert info["units"] == units
    assert info["has_lateral"]
    assert info["action_dim"] == out_dim
    rng = np.random.RandomState(8)
    x = rng.randn(5, in_dim).astype(np.float32)
    with torch.no_grad():
        want = torch.stack(ref(torch.from_numpy(x)), dim=1).numpy()
    pnn = PNN(
        action_dim=out_dim, num_primitives=n_cols, units=units,
        activation="relu", has_lateral=True,
    )
    got = np.asarray(pnn.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_import_pnn_no_lateral():
    torch.manual_seed(9)
    actors = [mlp_seq(OBS, UNITS, final=ACT_DIM) for _ in range(2)]
    sd = {}
    for c, a in enumerate(actors):
        sd.update(sd_numpy(f"a2c_network.pnn.actors.{c}", a))
    params, info = ck.import_pnn(sd)
    assert not info["has_lateral"]
    rng = np.random.RandomState(10)
    x = rng.randn(4, OBS).astype(np.float32)
    with torch.no_grad():
        want = torch.stack([a(torch.from_numpy(x)) for a in actors], 1).numpy()
    pnn = PNN(action_dim=ACT_DIM, num_primitives=2, units=UNITS, activation="silu")
    got = np.asarray(pnn.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_import_composer_distill_teacher_quirk():
    """load_mcp_mlp (network_loader.py:36-39) appends a plain activation in
    place of the trained softmax; the distill teacher runs THAT network."""
    torch.manual_seed(11)
    comp = mlp_seq(OBS, (24,), act=nn.ReLU, final=3)
    sd = sd_numpy("a2c_network.composer", comp)
    rng = np.random.RandomState(12)
    x = rng.randn(5, OBS).astype(np.float32)
    with torch.no_grad():
        want = torch.relu(comp(torch.from_numpy(x))).numpy()
    mod = MCPComposer(num_primitives=3, units=(24,), activation="relu", final="relu")
    got = np.asarray(mod.apply({"params": ck.import_mcp_composer(sd)}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_import_running_mean_std():
    rng = np.random.RandomState(13)
    sd = {
        "running_mean_std.running_mean": rng.rand(OBS).astype(np.float64),
        "running_mean_std.running_var": (1 + rng.rand(OBS)).astype(np.float64),
        "running_mean_std.count": np.asarray(12345.0),
    }
    rms = ck.import_running_mean_std(sd)
    x = rng.randn(4, OBS).astype(np.float32)
    want = np.clip(
        (x - sd["running_mean_std.running_mean"])
        / np.sqrt(sd["running_mean_std.running_var"] + 1e-5),
        -5, 5,
    )
    np.testing.assert_allclose(np.asarray(rms.normalize(jnp.asarray(x))), want, atol=1e-5)


def test_pnn_teacher_from_pth(tmp_path):
    """build_teacher_from_cfg consumes reference PNN+composer .pth
    checkpoints (≙ humanoid_im_distill.py:57-61)."""
    from pulse_tpu import run as run_mod
    from pulse_tpu.utils.config import load_config

    cfg = load_config(["env=im_vae", "learning=im_z_fit", "num_envs=2",
                       "env.num_fall_states=4", "env.fall_settle_steps=2"])
    spec, model = run_mod.build_model_from_cfg(cfg)
    motion = run_mod.build_motion_from_cfg(cfg, spec)
    env = run_mod.build_env_from_cfg(cfg, model, motion)

    torch.manual_seed(21)
    in_dim, units, A = env.obs_dim, (32, 16), env.action_dim
    ref = RefTorchPNN(in_dim, units, A, 2)
    sd = sd_numpy("a2c_network.pnn", ref)
    comp = mlp_seq(in_dim, (16,), act=nn.ReLU, final=2)
    sd.update(sd_numpy("a2c_network.composer", comp))
    sd["running_mean_std.running_mean"] = np.zeros(in_dim)
    sd["running_mean_std.running_var"] = np.ones(in_dim)
    sd["running_mean_std.count"] = np.asarray(10.0)
    pth = str(tmp_path / "Humanoid_00000001.pth")
    torch.save({"model": {k: torch.as_tensor(v) for k, v in sd.items()}}, pth)

    cfg["learning"]["teacher_pnn_checkpoint"] = pth
    teacher = run_mod.build_teacher_from_cfg(cfg, env)
    rng = np.random.RandomState(0)
    obs = rng.randn(3, in_dim).astype(np.float32)
    act = np.asarray(teacher(jnp.asarray(obs)))
    assert act.shape == (3, A)
    # matches the torch chain: relu(composer) weights over PNN columns
    with torch.no_grad():
        prims = torch.stack(ref(torch.from_numpy(obs)), dim=1)
        w = torch.relu(comp(torch.from_numpy(obs)))
        want = np.clip((w[:, :, None] * prims).sum(1).numpy(), -1, 1)
    np.testing.assert_allclose(act, want, atol=1e-5)
