"""CLI entry point: config-driven training / evaluation.

≙ phc/run_hydra.py:270-345 (hydra main: seed, checkpoint resolution, runner
build) re-imagined: `python -m pulse_tpu.run env=im learning=im_ppo
num_envs=64 max_epochs=200 exp_name=smoke` composes the YAML config tree,
builds env + agent, jits the train epoch (optionally over a device mesh),
and runs the training loop with JSONL metric logging and orbax checkpoints.
`test=true` runs the im_eval harness instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_model_from_cfg(cfg):
    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.physics import PhysicsConfig, build_model

    sim = cfg["sim"]
    pc = PhysicsConfig(
        dt=float(sim["dt"]),
        substeps=int(sim["substeps"]),
        control_freq_inv=int(sim["control_freq_inv"]),
        gravity=float(sim["gravity"]),
        contact_stiffness=float(sim["contact_stiffness"]),
        contact_damping=float(sim["contact_damping"]),
        friction_regularization=float(sim["friction_regularization"]),
        limit_stiffness=float(sim["limit_stiffness"]),
        limit_damping=float(sim["limit_damping"]),
        kp_scale=float(sim["kp_scale"]),
        kd_scale=float(sim["kd_scale"]),
    )
    spec = load_smpl_humanoid()
    return spec, build_model(spec, pc)


def build_motion_from_cfg(cfg, spec):
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.motion.loader import load_motion_file

    motion_file = cfg["env"].get("motion_file", "")
    if motion_file:
        clips = load_motion_file(motion_file, spec.skeleton)
    else:
        clips = make_synthetic_clips(
            spec.skeleton, num_clips=int(cfg["env"].get("num_synthetic_clips", 4))
        )
    return build_motion_data(spec.skeleton, clips)


def _build_dr(e):
    """env.randomize + env.randomization_params → DRConfig
    (≙ apply_randomizations' dr_params schema, base_task.py:518-697)."""
    if not bool(e.get("randomize", False)):
        return None
    from pulse_tpu.env.domain_rand import dr_config_from_dict

    return dr_config_from_dict(dict(e.get("randomization_params") or {}))


def build_env_from_cfg(cfg, model, motion):
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.env.humanoid_im import DEFAULT_KEY_BODIES, DEFAULT_RESET_BODIES
    from pulse_tpu.env.humanoid_task import (
        HumanoidReachEnv,
        HumanoidSpeedEnv,
        HumanoidTrajEnv,
        TaskConfig,
    )

    e = cfg["env"]
    task = e["task"]
    # imitation-family registry (≙ parse_task.py:29-44 task names):
    # plain classes vs getup-curriculum variants; Demo names are the same
    # envs driven live via utils/pose_server.py + scripts/demo_server.py
    im_plain = (
        "HumanoidIm", "HumanoidImDistill", "HumanoidImDemo", "HumanoidImZ",
        "HumanoidAMP", "HumanoidImMCP", "HumanoidImMCPDemo",
    )
    im_getup = (
        "HumanoidImGetup", "HumanoidImDistillGetup", "HumanoidAMPGetup",
        "HumanoidImMCPGetup",
    )
    if task in im_plain + im_getup:
        common = dict(
            episode_length=int(e["episode_length"]),
            termination_distance=float(e["termination_distance"]),
            enable_early_termination=bool(e["enable_early_termination"]),
            use_mean_termination=bool(e["use_mean_termination"]),
            num_traj_samples=int(e["num_traj_samples"]),
            traj_sample_timestep=float(e["traj_sample_timestep"]),
            local_root_obs=bool(e["local_root_obs"]),
            root_height_obs=bool(e["root_height_obs"]),
            state_init=str(e["state_init"]),
            hybrid_init_prob=float(e["hybrid_init_prob"]),
            power_reward=bool(e["power_reward"]),
            power_coefficient=float(e["power_coefficient"]),
            cycle_motion=bool(e["cycle_motion"]),
            control_mode=str(e.get("control_mode", "isaac_pd")),
            power_scale=float(e.get("power_scale", 1.0)),
            obs_v=int(e.get("obs_v", 6)),
            self_obs_v=int(e.get("self_obs_v", 1)),
            self_obs_hist_steps=int(e.get("self_obs_hist_steps", 5)),
            obs_noise_std=float(e.get("obs_noise_std", 0.0)),
            zero_out_far=bool(e.get("zero_out_far", False)),
            zero_out_far_distance=float(e.get("zero_out_far_distance", 5.0)),
            occlusion_prob=float(e.get("occlusion_prob", 0.0)),
            occlusion_frac=float(e.get("occlusion_frac", 0.25)),
            num_amp_obs_steps=int(e.get("num_amp_obs_steps", 10)),
            amp_obs_v=int(e.get("amp_obs_v", 1)),
            has_shape_obs_disc=bool(e.get("has_shape_obs_disc", False)),
            use_pallas_physics=bool(e.get("use_pallas_physics", True)),
            has_shape_obs=bool(e.get("has_shape_obs", False)),
            has_limb_weight_obs=bool(e.get("has_limb_weight_obs", False)),
            key_bodies=(
                tuple(e["key_bodies"]) if e.get("key_bodies") else DEFAULT_KEY_BODIES
            ),
            reset_bodies=(
                tuple(e["reset_bodies"])
                if e.get("reset_bodies")
                else DEFAULT_RESET_BODIES
            ),
            track_bodies=(
                tuple(e["track_bodies"]) if e.get("track_bodies") else None
            ),
            # domain randomization (≙ task.randomize + randomization_params)
            dr=_build_dr(e),
            **{
                k: float(rs[k])
                for rs in (e.get("reward_specs") or {},)
                for k in rs
            },
        )
        if task in im_plain:
            ec = EnvConfig(**common)
            if task == "HumanoidAMP":
                from pulse_tpu.env.humanoid_amp_getup import HumanoidAMPEnv

                im_env = HumanoidAMPEnv(
                    model, motion, ec,
                    termination_height=float(e.get("termination_height", 0.15)),
                )
            elif task in ("HumanoidImMCP", "HumanoidImMCPDemo"):
                from pulse_tpu.env.humanoid_im_mcp import HumanoidImMCPEnv

                pnn, pnn_params, rms = build_pnn_from_cfg(cfg, model, motion, ec)
                im_env = HumanoidImMCPEnv(
                    model, motion, ec, pnn=pnn, pnn_params=pnn_params,
                    obs_rms=rms,
                )
            else:
                im_env = HumanoidImEnv(model, motion, ec)
        else:
            from pulse_tpu.env.humanoid_im_getup import (
                GetupConfig,
                HumanoidImGetupEnv,
            )

            gc = GetupConfig(
                recovery_steps=int(e.get("recovery_steps", 90)),
                recovery_episode_prob=float(e.get("recovery_episode_prob", 0.3)),
                fall_init_prob=float(e.get("fall_init_prob", 0.1)),
                num_fall_states=int(e.get("num_fall_states", 256)),
                fall_settle_steps=int(e.get("fall_settle_steps", 60)),
                **common,
            )
            if task == "HumanoidAMPGetup":
                from pulse_tpu.env.humanoid_amp_getup import HumanoidAMPGetupEnv

                im_env = HumanoidAMPGetupEnv(
                    model, motion, gc,
                    termination_height=float(e.get("termination_height", 0.15)),
                )
            elif task == "HumanoidImMCPGetup":
                from pulse_tpu.env.humanoid_im_mcp import HumanoidImMCPGetupEnv

                pnn, pnn_params, rms = build_pnn_from_cfg(cfg, model, motion, gc)
                im_env = HumanoidImMCPGetupEnv(
                    model, motion, gc, pnn=pnn, pnn_params=pnn_params,
                    obs_rms=rms,
                )
            else:
                im_env = HumanoidImGetupEnv(model, motion, gc)
        if bool(e.get("shape_variation", False)):
            # per-env body shapes (≙ has_shape_variation, humanoid.py:918-1035)
            import jax as _jax

            smpl = None
            if str(e.get("smpl_model_path", "") or ""):
                from pulse_tpu.smpl.body_model import load_smpl_model

                smpl = load_smpl_model(str(e["smpl_model_path"]))
            im_env.enable_shape_variation(
                _jax.random.PRNGKey(int(cfg["seed"]) + 7),
                int(cfg["num_envs"]),
                smpl_model=smpl,
                beta_std=float(e.get("shape_beta_std", 1.0)),
            )
        if im_env.config.dr is not None:
            import jax as _jax

            im_env.randomize_physical_props(
                _jax.random.PRNGKey(int(cfg["seed"]) + 11), int(cfg["num_envs"])
            )
        if task == "HumanoidImZ":
            # latent-action imitation (≙ HumanoidImZ, humanoid_im.py:
            # HumanoidZ mixin over HumanoidIm): actions are z, decoded by
            # the frozen PULSE decoder
            return wrap_env_z(cfg, im_env)
        return im_env

    tc_kwargs = dict(
        episode_length=int(e["episode_length"]),
        termination_height=float(e.get("termination_height", 0.15)),
        enable_early_termination=bool(e["enable_early_termination"]),
    )
    if task in ("HumanoidSpeed", "HumanoidSpeedZ"):
        tc = TaskConfig(
            tar_speed_min=float(e.get("tar_speed_min", 0.0)),
            tar_speed_max=float(e.get("tar_speed_max", 5.0)),
            **tc_kwargs,
        )
        env = HumanoidSpeedEnv(model, motion, tc)
    elif task in ("HumanoidReach", "HumanoidReachZ"):
        tc = TaskConfig(reach_body=str(e.get("reach_body", "R_Hand")), **tc_kwargs)
        env = HumanoidReachEnv(model, motion, tc)
    elif task in ("HumanoidTraj", "HumanoidTrajZ"):
        tc = TaskConfig(**tc_kwargs)
        env = HumanoidTrajEnv(model, motion, tc)
    elif task in ("HumanoidStrike", "HumanoidStrikeZ"):
        from pulse_tpu.env.humanoid_strike import HumanoidStrikeEnv

        env = HumanoidStrikeEnv(model, motion, TaskConfig(**tc_kwargs))
    elif task in ("HumanoidPedestrianTerrain", "HumanoidPedestrianTerrainZ"):
        from pulse_tpu.env.humanoid_terrain import HumanoidPedestrianTerrainEnv

        env = HumanoidPedestrianTerrainEnv(model, motion, TaskConfig(**tc_kwargs))
    else:
        raise ValueError(f"unknown task {task!r}")

    if task.endswith("Z"):
        env = wrap_env_z(cfg, env)
    return env


def build_pnn_from_cfg(cfg, model, motion, env_config):
    """Frozen PNN primitives for the MCP composer envs.

    ≙ humanoid_im_mcp.py:28-42 (load_pnn from cfg.llc_checkpoint): with
    `env.pnn_checkpoint` (or `learning.teacher_pnn_checkpoint`) set, the
    reference .pth is imported (params + frozen running stats); otherwise a
    fresh PNN stands in so the pipeline runs end to end.
    Returns (pnn, params, obs_rms_or_None)."""
    from pulse_tpu.env import HumanoidImEnv
    from pulse_tpu.learning.pnn import PNN

    e, l = cfg["env"], cfg["learning"]
    ckpt = str(e.get("pnn_checkpoint", "") or l.get("teacher_pnn_checkpoint", "") or "")
    if ckpt:
        from pulse_tpu.utils.checkpoint import (
            import_pnn,
            import_running_mean_std,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(ckpt)["model"]
        pnn_params, info = import_pnn(sd)
        pnn = PNN(
            action_dim=info["action_dim"],
            num_primitives=info["num_primitives"],
            units=info["units"],
            activation=str(l.get("teacher_activation", "relu")),
            has_lateral=info["has_lateral"],
        )
        rms = import_running_mean_std(sd).freeze()
        print(f"frozen PNN imported from {ckpt} ({info})")
        return pnn, pnn_params, rms

    # smoke path: probe env gives the obs/action dims; fresh random PNN
    probe = HumanoidImEnv(model, motion, env_config)
    pnn = PNN(
        action_dim=probe.action_dim,
        num_primitives=int(e.get("num_prim", 3)),
        units=tuple(l.get("pnn_units", (512, 512))),
    )
    params = pnn.init(
        jax.random.PRNGKey(int(cfg["seed"]) + 13),
        jnp.zeros((1, probe.obs_dim)),
    )["params"]
    return pnn, params, None


def wrap_env_z(cfg, env):
    """Wrap a task env with the frozen PULSE decoder (≙ HumanoidZ mixin)."""
    from pulse_tpu.env.humanoid_z import FrozenZModel, ZActionWrapper
    from pulse_tpu.learning.networks import PulseVAE
    from pulse_tpu.learning.running_norm import RunningMeanStd
    from pulse_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

    latent_dim = int(cfg["env"].get("embedding_size", 32))
    net = PulseVAE(
        action_dim=env.action_dim, latent_dim=latent_dim,
        self_obs_dim=env.self_obs_dim,
    )
    ckpt_dir = cfg["env"].get("z_checkpoint", "")
    obs_dim = env.obs_dim
    if ckpt_dir and ckpt_dir.endswith((".pth", ".pt")):
        # reference torch checkpoint: rebuild the PulseVAE at the
        # checkpoint's own sizes and import weights + running stats
        # (≙ load_z_decoder/load_z_encoder on a rl-games .pth,
        # network_loader.py:76-176)
        from pulse_tpu.utils.checkpoint import (
            import_pulse_vae,
            import_running_mean_std,
            load_torch_checkpoint,
            pulse_vae_spec_from_torch,
        )

        ckpt = load_torch_checkpoint(ckpt_dir)
        sd = ckpt["model"]
        net = PulseVAE(**pulse_vae_spec_from_torch(sd))
        frozen = FrozenZModel(
            params=import_pulse_vae(sd),
            obs_rms=import_running_mean_std(sd).freeze(),
        )
        print(f"frozen z model imported from torch checkpoint {ckpt_dir}")
        return ZActionWrapper(env, net, frozen)
    if ckpt_dir:
        # checkpoint surgery: pull the frozen decoder/prior + input stats
        # out of the distill checkpoint (≙ load_z_decoder/load_z_encoder,
        # network_loader.py:76-176)
        import orbax.checkpoint as ocp
        from pulse_tpu.utils.checkpoint import latest_checkpoint

        path = latest_checkpoint(ckpt_dir) or ckpt_dir
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        rms = RunningMeanStd(
            mean=jnp.asarray(raw["obs_rms"]["mean"]),
            var=jnp.asarray(raw["obs_rms"]["var"]),
            count=jnp.asarray(raw["obs_rms"]["count"]),
        ).freeze()
        frozen = FrozenZModel(params=raw["params"], obs_rms=rms)
        print(f"frozen z model restored from {path}")
    else:
        # untrained decoder (functional smoke path when no checkpoint given)
        params = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)), jnp.zeros((1, latent_dim))
        )["params"]
        frozen = FrozenZModel(params=params, obs_rms=RunningMeanStd.create(obs_dim))
    return ZActionWrapper(env, net, frozen)


def build_agent_from_cfg(cfg, env):
    from pulse_tpu.learning.amp import AMPConfig
    from pulse_tpu.learning.amp_agent import AMPAgent
    from pulse_tpu.learning.distill import DistillAgent, DistillConfig
    from pulse_tpu.learning.networks import ActorCritic, PulseVAE
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig

    l = cfg["learning"]
    kind = l["agent"]
    num_envs = int(cfg["num_envs"])
    if kind in ("ppo", "amp"):
        ppo_cfg = PPOConfig(
            num_envs=num_envs,
            horizon_length=int(l["horizon_length"]),
            minibatch_size=int(l["minibatch_size"]),
            mini_epochs=int(l["mini_epochs"]),
            gamma=float(l["gamma"]),
            tau=float(l["tau"]),
            learning_rate=float(l["learning_rate"]),
            e_clip=float(l["e_clip"]),
            critic_coef=float(l["critic_coef"]),
            bounds_loss_coef=float(l["bounds_loss_coef"]),
            grad_norm=float(l["grad_norm"]),
            normalize_input=bool(l["normalize_input"]),
            normalize_value=bool(l["normalize_value"]),
            normalize_advantage=bool(l["normalize_advantage"]),
        )
        net = ActorCritic(
            action_dim=env.action_dim,
            actor_units=tuple(l["actor_units"]),
            critic_units=tuple(l["critic_units"]),
            init_sigma=float(l["init_sigma"]),
        )
        if kind == "ppo":
            return PPOAgent(env, ppo_cfg, net)
        amp_cfg = AMPConfig(
            disc_units=tuple(l["disc_units"]),
            disc_coef=float(l["disc_coef"]),
            disc_logit_reg=float(l["disc_logit_reg"]),
            disc_grad_penalty=float(l["disc_grad_penalty"]),
            disc_reward_scale=float(l["disc_reward_scale"]),
            disc_weight_decay=float(l["disc_weight_decay"]),
            amp_batch_size=int(l["amp_batch_size"]),
            amp_buffer_size=int(l["amp_buffer_size"]),
            task_reward_w=float(l["task_reward_w"]),
            disc_reward_w=float(l["disc_reward_w"]),
        )
        e = cfg["env"]
        return AMPAgent(
            env, ppo_cfg, amp_cfg, net,
            getup_update_epoch=int(e.get("getup_update_epoch", 0)),
            shape_resampling_interval=int(e.get("shape_resampling_interval", 0)),
        )
    if kind == "distill":
        dc = DistillConfig(
            num_envs=num_envs,
            horizon_length=int(l["horizon_length"]),
            minibatch_size=int(l["minibatch_size"]),
            mini_epochs=int(l["mini_epochs"]),
            kin_lr=float(l["kin_lr"]),
            grad_norm=float(l["grad_norm"]),
            kld_coefficient=float(l["kld_coefficient"]),
            kld_coefficient_min=float(l["kld_coefficient_min"]),
            kld_anneal_start=int(l["kld_anneal_start"]),
            kld_anneal_end=int(l["kld_anneal_end"]),
            ar1_coefficient=float(l["ar1_coefficient"]),
        )
        net = PulseVAE(
            action_dim=env.action_dim,
            latent_dim=int(l["latent_dim"]),
            self_obs_dim=env.self_obs_dim,
            encoder_units=tuple(l["encoder_units"]),
            prior_units=tuple(l["prior_units"]),
            decoder_units=tuple(l["decoder_units"]),
            # bf16 trunks (f32 params/heads): 2x MXU on the distill update;
            # .pth-imported eval nets stay f32 (see PulseVAE.dtype)
            dtype=None if bool(l.get("full_precision", False)) else jnp.bfloat16,
        )
        teacher = build_teacher_from_cfg(cfg, env)
        return DistillAgent(env, teacher, dc, net)
    raise ValueError(f"unknown agent {kind!r}")


def build_teacher_from_cfg(cfg, env):
    """Frozen teacher policy for distillation (≙ humanoid_im_distill.py
    teacher loaders / network_loader.py checkpoint surgery): load a trained
    PPO checkpoint's params + input stats and wrap them as a deterministic
    policy. Without a checkpoint, a fresh network stands in so the pipeline
    still runs end to end."""
    from pulse_tpu.learning.networks import ActorCritic

    l = cfg["learning"]
    pnn_ckpt = l.get("teacher_pnn_checkpoint", "")
    if pnn_ckpt:
        # PHC PNN + composer teacher from reference .pth checkpoints
        # (≙ humanoid_im_distill.py:57-61: load_pnn(check_points[0]) +
        # load_mcp_mlp(check_points[1], "composer"); the composer is the
        # reference's reloaded-with-activation variant)
        from pulse_tpu.learning.pnn import PNN, MCPComposer, compose_actions
        from pulse_tpu.utils.checkpoint import (
            import_mcp_composer,
            import_pnn,
            import_running_mean_std,
            load_torch_checkpoint,
        )

        pnn_sd = load_torch_checkpoint(pnn_ckpt)["model"]
        comp_ckpt = l.get("teacher_composer_checkpoint", "") or pnn_ckpt
        comp_sd = load_torch_checkpoint(comp_ckpt)["model"]
        pnn_params, info = import_pnn(pnn_sd)
        pnn = PNN(
            action_dim=info["action_dim"],
            num_primitives=info["num_primitives"],
            units=info["units"],
            activation=str(l.get("teacher_activation", "relu")),
            has_lateral=info["has_lateral"],
        )
        comp_params = import_mcp_composer(comp_sd)
        n_comp_units = len(comp_params["MLP_0"])
        comp = MCPComposer(
            num_primitives=info["num_primitives"],
            units=tuple(
                comp_params["MLP_0"][f"Dense_{i}"]["bias"].shape[0]
                for i in range(n_comp_units)
            ),
            activation=str(l.get("teacher_activation", "relu")),
            final=str(l.get("teacher_activation", "relu")),
        )
        rms = import_running_mean_std(pnn_sd)
        print(f"PNN teacher imported from {pnn_ckpt} ({info})")

        def teacher_fn(obs):
            obs_n = rms.normalize(obs)
            prims = pnn.apply({"params": pnn_params}, obs_n)
            w = comp.apply({"params": comp_params}, obs_n)
            return jnp.clip(compose_actions(w, prims), -1.0, 1.0)

        return teacher_fn

    net = ActorCritic(
        action_dim=env.action_dim,
        actor_units=tuple(l.get("teacher_actor_units", (2048, 1536, 1024))),
        critic_units=tuple(l.get("teacher_critic_units", (2048, 1536, 1024))),
    )
    ckpt = l.get("teacher_checkpoint", "")
    if ckpt:
        import orbax.checkpoint as ocp
        from pulse_tpu.utils.checkpoint import latest_checkpoint

        path = latest_checkpoint(ckpt) or ckpt
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        params = raw["params"]
        rms_mean = jnp.asarray(raw["obs_rms"]["mean"])
        rms_var = jnp.asarray(raw["obs_rms"]["var"])
        print(f"teacher restored from {path}")
    else:
        params = net.init(jax.random.PRNGKey(7), jnp.zeros((1, env.obs_dim)))["params"]
        rms_mean = jnp.zeros(env.obs_dim)
        rms_var = jnp.ones(env.obs_dim)

    def teacher_fn(obs):
        obs_n = jnp.clip((obs - rms_mean) / jnp.sqrt(rms_var + 1e-5), -5.0, 5.0)
        mu, _, _ = net.apply({"params": params}, obs_n)
        return jnp.clip(mu, -1.0, 1.0)

    return teacher_fn


def strip_env_state(ts):
    """Checkpoints hold model/optimizer/normalizer state only — env states
    (num_envs-dependent) and PMCP sampling weights (num_motions-dependent)
    are ephemeral (≙ rl-games save/restore scope). Fixed placeholder leaves
    keep the checkpoint tree env/motion-count-agnostic."""
    placeholder = jnp.zeros(1)

    def _strip(inner):
        out = inner.replace(env_state=placeholder)
        if getattr(inner, "motion_prob", None) is not None:
            out = out.replace(motion_prob=placeholder)
        return out

    if hasattr(ts, "ppo"):
        return ts.replace(ppo=_strip(ts.ppo))
    return _strip(ts)


def attach_env_state(restored, fresh):
    def _attach(r, f):
        out = r.replace(env_state=f.env_state)
        if getattr(f, "motion_prob", None) is not None:
            out = out.replace(motion_prob=f.motion_prob)
        return out

    if hasattr(restored, "ppo"):
        return restored.replace(ppo=_attach(restored.ppo, fresh.ppo))
    return _attach(restored, fresh)


def set_motion_prob(ts, prob):
    """Write new PMCP sampling weights into whichever train-state shape the
    agent uses — a pure device write; the jitted train step reuses its
    compiled executable (≙ update_sampling_prob being a tensor assignment,
    motion_lib_base.py:378-384)."""
    if hasattr(ts, "amp") and hasattr(ts, "distill"):   # JointTrainState
        return ts.replace(
            amp=ts.amp.replace(ppo=ts.amp.ppo.replace(motion_prob=prob)),
            distill=ts.distill.replace(motion_prob=prob),
        )
    if hasattr(ts, "ppo"):
        return ts.replace(ppo=ts.ppo.replace(motion_prob=prob))
    return ts.replace(motion_prob=prob)


def main(argv=None):
    from pulse_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from pulse_tpu.utils.config import load_config

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    np.random.seed(int(cfg["seed"]))

    out_dir = os.path.join(cfg["output_dir"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump(cfg, fh, indent=2, default=str)

    spec, model = build_model_from_cfg(cfg)
    motion = build_motion_from_cfg(cfg, spec)
    env = build_env_from_cfg(cfg, model, motion)
    agent = build_agent_from_cfg(cfg, env)

    ts = agent.init(jax.random.PRNGKey(int(cfg["seed"])))
    ckpt_dir = os.path.join(out_dir, "ckpt")
    epoch0 = 0
    if int(cfg["epoch"]) != 0:
        path = latest_checkpoint(ckpt_dir)
        if path:
            restored = restore_checkpoint(path, strip_env_state(ts))
            ts = attach_env_state(restored, ts)
            epoch0 = int(os.path.basename(path).split("_")[1])
            print(f"restored {path}")

    if cfg["test"]:
        return run_eval(cfg, env, agent, ts)

    # donate the train state: env states / params / optimizer buffers update
    # in place instead of being copied every epoch
    train = jax.jit(agent.train_epoch, donate_argnums=0)
    from pulse_tpu.utils.logger import MetricLogger

    logger = MetricLogger(
        out_dir, exp_name=cfg["exp_name"], use_wandb=bool(cfg.get("use_wandb", False))
    )
    t_start = time.time()
    t_window, e_window = t_start, epoch0   # windowed fps (excludes compile)
    steps_per_epoch = int(cfg["num_envs"]) * int(cfg["learning"]["horizon_length"])
    for epoch in range(epoch0, int(cfg["max_epochs"])):
        # host-side epoch schedule (getup reward weights, shape resampling —
        # ≙ pre_epoch, amp_agent.py:557-579); re-jit when it changed trace
        # constants (env config flip / model rebatch)
        if hasattr(agent, "pre_epoch"):
            ts = agent.pre_epoch(ts, epoch)
            if getattr(agent, "needs_retrace", False):
                train = jax.jit(agent.train_epoch, donate_argnums=0)
        ts, metrics = train(ts)
        if epoch % int(cfg["log_frequency"]) == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.time()
            metrics.update(
                time=round(now - t_start, 1),
                # fps over the last log window, so the first compile doesn't
                # poison the number; the first window still includes it
                fps=round(
                    steps_per_epoch * (epoch - e_window + 1) / max(now - t_window, 1e-6)
                ),
            )
            t_window, e_window = now, epoch + 1
            logger.log(metrics, epoch)
            print(
                f"epoch={epoch} "
                + " ".join(
                    f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in metrics.items()
                )
            )
        if (
            int(cfg["save_frequency"]) > 0
            and epoch > 0
            and epoch % int(cfg["save_frequency"]) == 0
        ):
            save_checkpoint(ckpt_dir, epoch, strip_env_state(ts))

        # periodic im_eval + PMCP hard-negative reweighting (≙ IMAmpAgent
        # eval feedback, im_amp.py:136-242 + update_hard_sampling_weight).
        # The live weights are a train-state leaf threaded into the env's
        # auto-resets, so the update is a device write — the compiled
        # train_epoch executable is reused, no retrace.
        ef = int(cfg.get("eval_frequency", 0))
        if ef > 0 and epoch > epoch0 and epoch % ef == 0 and hasattr(env, "reset_to"):
            result = run_eval(cfg, env, agent, ts)
            from pulse_tpu.motion.motion_lib import update_hard_sampling_weight
            import jax.numpy as _jnp

            prob = update_hard_sampling_weight(
                env.motion, _jnp.asarray(result.failed_motions)
            ).sampling_prob
            ts = set_motion_prob(ts, prob)
    save_checkpoint(ckpt_dir, int(cfg["max_epochs"]), strip_env_state(ts))


def _policy_fn(agent, ts):
    params = ts.ppo.params if hasattr(ts, "ppo") else ts.params
    obs_rms = ts.ppo.obs_rms if hasattr(ts, "ppo") else ts.obs_rms
    ppo_agent = agent.ppo if hasattr(agent, "ppo") else agent

    def policy_fn(obs):
        mu, _, _ = ppo_agent.network.apply(
            {"params": params}, obs_rms.normalize(obs)
        )
        return jnp.clip(mu, -1.0, 1.0)

    return policy_fn


def run_eval(cfg, env, agent, ts):
    """test=true: imitation envs get the im_eval motion sweep (success rate
    + MPJPE, ≙ im_amp_players.py); task envs — including Z-wrapped ones —
    get the episode-return player (≙ amp_players.py run loop)."""
    import dataclasses as _dc

    from pulse_tpu.eval import im_eval
    from pulse_tpu.eval.task_eval import task_eval

    policy_fn = _policy_fn(agent, ts)

    if not hasattr(env, "reset_to"):
        # downstream task env (possibly Z-wrapped): episode-return eval
        result = task_eval(env, policy_fn, batch_size=int(cfg["num_envs"]))
        print(json.dumps(_dc.asdict(result), indent=2))
        return result

    # imitation env: early termination off so mid-clip auto-resets don't
    # pollute the MPJPE accumulation (failure is latched separately).
    # with_config preserves subclass ctor args (termination_height, pnn, …)
    # and rewraps ZActionWrapper around the rebuilt inner env.
    if getattr(env.config, "enable_early_termination", False):
        env = env.with_config(
            _dc.replace(env.config, enable_early_termination=False)
        )

    result = im_eval(env, policy_fn, batch_size=int(cfg["num_envs"]))
    print(json.dumps(dataclass_to_dict(result), indent=2))
    return result


def dataclass_to_dict(d):
    import dataclasses as dc

    import numpy as _np

    out = dc.asdict(d)
    return {
        k: v.tolist() if isinstance(v, _np.ndarray) else v
        for k, v in out.items()
    }


if __name__ == "__main__":
    main()
