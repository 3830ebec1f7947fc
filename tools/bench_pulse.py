"""PULSE three-stage quality benchmark: teacher -> distilled student ->
downstream Z tasks + prior sampling, with committed numbers for every stage.

≙ the PULSE paper's central claims, measured hermetically on the synthetic
suite (no external data, fixed seeds):

  stage 1  PPO imitation teacher on the standard synthetic clips
           (≙ PHC stage, im_eval success/MPJPE — phc/learning/im_amp.py)
  stage 2  online distillation into the PulseVAE
           (≙ _optimize_kin, amp_agent.py:771-849) and the STUDENT's own
           im_eval — the student must track nearly as well as its teacher
  stage 3  downstream tasks on the frozen decoder: speed_z + reach_z
           episode returns via task_eval (≙ amp_players.py run loop), and
           prior-sampling stability (≙ README.MD:87-92 random motion
           sampling: % of envs still upright after K steps)

Stage snapshots are pickled under --out for tunnel-flake resume.

Usage:
  python tools/bench_pulse.py --teacher_epochs 1000 --distill_epochs 3000 \
      --task_epochs 800 --envs 2048 --out output/pulse_stages
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PULSE_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["PULSE_PLATFORM"]
    jax.config.update("jax_platforms", os.environ["PULSE_PLATFORM"])

import jax.numpy as jnp


def _save(path, tree):
    with open(path, "wb") as fh:
        pickle.dump(jax.device_get(tree), fh)


def _load(path):
    with open(path, "rb") as fh:
        return jax.tree.map(jnp.asarray, pickle.load(fh))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_epochs", type=int, default=1000)
    ap.add_argument("--distill_epochs", type=int, default=3000)
    ap.add_argument("--task_epochs", type=int, default=800)
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_clips", type=int, default=8)
    ap.add_argument("--minibatch", type=int, default=16384,
                    help="reference default; lower only for CPU smokes")
    ap.add_argument("--prior_steps", type=int, default=300)
    ap.add_argument("--out", default="output/pulse_stages")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import dataclasses as dc

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.env.humanoid_task import HumanoidReachEnv, HumanoidSpeedEnv, TaskConfig
    from pulse_tpu.env.humanoid_z import FrozenZModel, ZActionWrapper
    from pulse_tpu.eval.im_eval import im_eval
    from pulse_tpu.eval.task_eval import task_eval
    from pulse_tpu.learning.amp import AMPConfig
    from pulse_tpu.learning.amp_agent import AMPAgent
    from pulse_tpu.learning.distill import DistillAgent, DistillConfig
    from pulse_tpu.learning.networks import ActorCritic, PulseVAE
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=args.num_clips)
    motion = build_motion_data(spec.skeleton, clips)
    M = motion.num_motions
    env = HumanoidImEnv(model, motion, EnvConfig())
    eval_env = env.with_config(
        dc.replace(env.config, enable_early_termination=False)
    )
    steps_per_epoch = args.envs * args.horizon
    report = {"envs": args.envs, "seed": args.seed, "num_clips": M,
              "epochs": {"teacher": args.teacher_epochs,
                         "distill": args.distill_epochs,
                         "task": args.task_epochs}}

    # ---------------- stage 1: teacher ---------------------------------- #
    net = ActorCritic(action_dim=env.action_dim)
    agent = PPOAgent(
        env,
        PPOConfig(num_envs=args.envs, horizon_length=args.horizon,
                  minibatch_size=args.minibatch, mini_epochs=6, learning_rate=2e-5),
        net,
    )
    snap = os.path.join(args.out, "teacher.pkl")
    ts = agent.init(jax.random.PRNGKey(args.seed))
    if os.path.exists(snap):
        saved = _load(snap)
        ts = ts.replace(
            params=saved["params"],
            obs_rms=ts.obs_rms.replace(mean=saved["rms_mean"],
                                       var=saved["rms_var"],
                                       count=saved["rms_count"]),
        )
        print("[teacher] restored", snap, flush=True)
    else:
        train = jax.jit(agent.train_epoch, donate_argnums=0)
        t0 = time.time()
        for epoch in range(args.teacher_epochs):
            ts, metrics = train(ts)
            if epoch % 100 == 0:
                print(f"[teacher] epoch={epoch} "
                      f"reward={float(metrics['reward_mean']):.4f} "
                      f"fps={steps_per_epoch*(epoch+1)/(time.time()-t0):,.0f}",
                      flush=True)
        jax.block_until_ready(jax.tree.leaves(ts)[0])
        _save(snap, {"params": ts.params, "rms_mean": ts.obs_rms.mean,
                     "rms_var": ts.obs_rms.var, "rms_count": ts.obs_rms.count})

    t_params = jax.tree.map(jnp.asarray, jax.device_get(ts.params))
    t_rms = ts.obs_rms

    def teacher_policy(obs):
        mu, _, _ = net.apply({"params": t_params}, t_rms.normalize(obs))
        return jnp.clip(mu, -1.0, 1.0)

    r_t = im_eval(eval_env, teacher_policy, batch_size=min(M, 64))
    report["teacher"] = {
        "success_rate": round(r_t.success_rate, 4),
        "mpjpe_g_mm": round(r_t.mpjpe_g, 2),
        "mpjpe_pa_mm": round(r_t.mpjpe_pa, 2),
    }
    print("[teacher]", json.dumps(report["teacher"]), flush=True)

    # ---------------- stage 2: distillation ------------------------------ #
    vae = PulseVAE(action_dim=env.action_dim, self_obs_dim=env.self_obs_dim)
    dagent = DistillAgent(
        env,
        teacher_policy,
        DistillConfig(num_envs=args.envs, horizon_length=args.horizon,
                      minibatch_size=args.minibatch, mini_epochs=2,
                      kld_anneal_start=args.distill_epochs // 2,
                      kld_anneal_end=args.distill_epochs),
        vae,
    )
    snap = os.path.join(args.out, "student.pkl")
    ds = dagent.init(jax.random.PRNGKey(args.seed + 1))
    if os.path.exists(snap):
        saved = _load(snap)
        ds = ds.replace(
            params=saved["params"],
            obs_rms=ds.obs_rms.replace(mean=saved["rms_mean"],
                                       var=saved["rms_var"],
                                       count=saved["rms_count"]),
        )
        print("[distill] restored", snap, flush=True)
    else:
        dtrain = jax.jit(dagent.train_epoch, donate_argnums=0)
        t0 = time.time()
        for epoch in range(args.distill_epochs):
            ds, metrics = dtrain(ds)
            if epoch % 200 == 0:
                print(f"[distill] epoch={epoch} "
                      f"bc={float(metrics['bc_loss']):.4f} "
                      f"kld={float(metrics['kld']):.4f} "
                      f"fps={steps_per_epoch*(epoch+1)/(time.time()-t0):,.0f}",
                      flush=True)
        jax.block_until_ready(jax.tree.leaves(ds)[0])
        _save(snap, {"params": ds.params, "rms_mean": ds.obs_rms.mean,
                     "rms_var": ds.obs_rms.var, "rms_count": ds.obs_rms.count})

    s_params = jax.tree.map(jnp.asarray, jax.device_get(ds.params))
    s_rms = ds.obs_rms

    def student_policy(obs):
        # deterministic: z = posterior mean (zero reparam noise)
        out = vae.apply(
            {"params": s_params}, s_rms.normalize(obs),
            jnp.zeros(obs.shape[:-1] + (vae.latent_dim,)),
        )
        return jnp.clip(out["action_mu"], -1.0, 1.0)

    r_s = im_eval(eval_env, student_policy, batch_size=min(M, 64))
    report["student"] = {
        "success_rate": round(r_s.success_rate, 4),
        "mpjpe_g_mm": round(r_s.mpjpe_g, 2),
        "mpjpe_pa_mm": round(r_s.mpjpe_pa, 2),
        "success_gap_vs_teacher": round(r_t.success_rate - r_s.success_rate, 4),
        "mpjpe_pa_gap_mm": round(r_s.mpjpe_pa - r_t.mpjpe_pa, 2),
    }
    print("[student]", json.dumps(report["student"]), flush=True)

    # ---------------- stage 3a: prior-sampling stability ------------------ #
    frozen = FrozenZModel(params=s_params, obs_rms=s_rms.freeze())
    free_env = env.with_config(
        dc.replace(env.config, enable_early_termination=False, cycle_motion=True)
    )

    @jax.jit
    def prior_step(state, key):
        obs_n = s_rms.normalize(state.obs)
        self_obs = obs_n[..., : vae.self_obs_dim]
        prior_mu, prior_logvar = vae.apply(
            {"params": s_params}, self_obs, method=PulseVAE.prior_params
        )
        eps = jax.random.normal(key, prior_mu.shape)
        z = prior_mu + jnp.exp(0.5 * prior_logvar) * eps
        action = vae.apply(
            {"params": s_params}, self_obs, z, method=PulseVAE.decode
        )
        return free_env.step(state, jnp.clip(action, -1.0, 1.0))

    B_pr = 256
    state = free_env.reset(jax.random.split(jax.random.PRNGKey(3), B_pr))
    key = jax.random.PRNGKey(4)
    for _ in range(args.prior_steps):
        key, k = jax.random.split(key)
        state = prior_step(state, k)
    root_z = np.asarray(state.physics.root_pos[:, 2])
    upright = float(np.mean((root_z > 0.3) & np.isfinite(root_z)))
    report["prior_sampling"] = {
        "envs": B_pr,
        "steps": args.prior_steps,
        "upright_frac": round(upright, 4),
        "finite": bool(np.isfinite(np.asarray(state.physics.body_pos)).all()),
    }
    print("[prior]", json.dumps(report["prior_sampling"]), flush=True)

    # ---------------- stage 3b: downstream Z tasks ------------------------ #
    def train_z_task(name, make_env):
        task_env = ZActionWrapper(make_env(), vae, frozen)
        z_net = ActorCritic(action_dim=task_env.action_dim,
                            actor_units=(1024, 512), critic_units=(1024, 512))
        z_agent = AMPAgent(
            task_env,
            PPOConfig(num_envs=args.envs, horizon_length=args.horizon,
                      minibatch_size=args.minibatch, mini_epochs=6,
                      learning_rate=2e-5),
            AMPConfig(task_reward_w=0.5, disc_reward_w=0.5),
            z_net,
        )
        snap = os.path.join(args.out, f"{name}.pkl")
        zts = z_agent.init(jax.random.PRNGKey(args.seed + 7))
        if os.path.exists(snap):
            saved = _load(snap)
            zts = zts.replace(ppo=zts.ppo.replace(
                params=saved["params"],
                obs_rms=zts.ppo.obs_rms.replace(
                    mean=saved["rms_mean"], var=saved["rms_var"],
                    count=saved["rms_count"]),
            ))
            print(f"[{name}] restored", snap, flush=True)
        else:
            ztrain = jax.jit(z_agent.train_epoch, donate_argnums=0)
            t0 = time.time()
            for epoch in range(args.task_epochs):
                zts, metrics = ztrain(zts)
                if epoch % 100 == 0:
                    print(f"[{name}] epoch={epoch} "
                          f"reward={float(metrics['reward_mean']):.4f} "
                          f"fps={steps_per_epoch*(epoch+1)/(time.time()-t0):,.0f}",
                          flush=True)
            jax.block_until_ready(jax.tree.leaves(zts)[0])
            _save(snap, {"params": zts.ppo.params,
                         "rms_mean": zts.ppo.obs_rms.mean,
                         "rms_var": zts.ppo.obs_rms.var,
                         "rms_count": zts.ppo.obs_rms.count})
        zp, zr = zts.ppo.params, zts.ppo.obs_rms

        def z_policy(obs):
            mu, _, _ = z_net.apply({"params": zp}, zr.normalize(obs))
            return jnp.clip(mu, -1.0, 1.0)

        r = task_eval(task_env, z_policy, batch_size=min(args.envs, 512))
        out = {
            "return_mean": round(r.return_mean, 2),
            "length_mean": round(r.length_mean, 1),
            "terminate_rate": round(r.terminate_rate, 4),
            "reward_per_step": round(r.reward_per_step, 4),
        }
        print(f"[{name}]", json.dumps(out), flush=True)
        return out

    report["speed_z"] = train_z_task(
        "speed_z",
        lambda: HumanoidSpeedEnv(model, motion, TaskConfig(episode_length=300)),
    )
    report["reach_z"] = train_z_task(
        "reach_z",
        lambda: HumanoidReachEnv(model, motion, TaskConfig(episode_length=300)),
    )

    print(json.dumps(report, indent=2))
    with open(os.path.join(args.out, "pulse_stages.json"), "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
