"""PHC progressive curriculum on the hard synthetic suite.

Runs the reference's quality recipe end to end (≙ the PNN/PMCP pipeline that
produces PHC's ~99% AMASS coverage):

  1. primitive 0: PPO imitation on ALL clips (≙ phc first-stage im training)
  2. eval -> failed set; hard-negative PMCP: sampling weights collapse onto
     the failed clips (≙ update_hard_sampling_weight,
     motion_lib_base.py:348-360) — a device write on our side (motion_prob
     train-state leaf), the compiled train step is reused
  3. primitive k+1: column k's weights copied as the init
     (≙ scripts/pmcp/forward_pmcp.py:55-59), trained on the failed set only
  4. composer: assemble the columns into a frozen PNN, train an MCP composer
     policy over them on ALL clips (≙ humanoid_im_mcp.py:44-92 +
     amp_network_mcp_builder.py)
  5. final eval of the composed policy on the full suite

All PPO column stages share ONE compiled train_epoch (same program — only
params/weights change), so the axon-tunnel compile cost is paid once for the
columns and once for the composer.

Stage snapshots (actor params + obs stats) are pickled under --out so a
tunnel flake can resume without retraining finished stages.

Usage:
  python tools/curriculum.py --epochs 1500 --hard_epochs 1500 \
      --composer_epochs 1000 --envs 2048 --out output/curriculum
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

# PULSE_PLATFORM=cpu runs the pipeline off-TPU (CI smoke); the container's
# sitecustomize pins the axon TPU plugin, so the config update is required —
# env vars alone don't re-pin (see CLAUDE.md)
if os.environ.get("PULSE_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["PULSE_PLATFORM"]
    jax.config.update("jax_platforms", os.environ["PULSE_PLATFORM"])

import jax.numpy as jnp


def pnn_params_from_actors(actor_params_list, n_units):
    """Assemble frozen PNN column params from per-stage ActorCritic params.

    ActorCritic layout: MLP_0/Dense_{i} actor trunk + Dense_0 mu head
    (networks.py:47-76) -> PNN layout col{c}_dense{i} + col{c}_out
    (pnn.py:34-60, no laterals)."""
    out = {}
    for c, p in enumerate(actor_params_list):
        trunk = p["MLP_0"]
        for li in range(n_units):
            out[f"col{c}_dense{li}"] = jax.tree.map(jnp.asarray, trunk[f"Dense_{li}"])
        out[f"col{c}_out"] = jax.tree.map(jnp.asarray, p["Dense_0"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500, help="primitive-0 epochs")
    ap.add_argument("--hard_epochs", type=int, default=1500, help="per hard column")
    ap.add_argument("--composer_epochs", type=int, default=1000)
    ap.add_argument("--max_columns", type=int, default=3)
    ap.add_argument(
        "--specialist_epochs", type=int, default=0,
        help="if >0: after the shared columns, train ONE column per clip "
        "that no column passes yet (one-hot PMCP mask, init from col0, "
        "early-stop on first pass) — the many-column limit of the PHC "
        "recipe, where each primitive ends up owning a skill",
    )
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pallas", choices=["on", "off"], default="on")
    ap.add_argument("--minibatch", type=int, default=16384,
                    help="reference default; lower only for CPU smokes")
    ap.add_argument(
        "--suite", choices=["hard", "graded"], default="hard",
        help="hard: the 6-clip v2 stress set; graded: the 30-clip family "
        "benchmark (6 families x 5 difficulty levels, make_graded_suite) — "
        "PMCP at an M where categorical reweighting matters",
    )
    ap.add_argument(
        "--max_specialists", type=int, default=8,
        help="cap on one-hot specialist columns (graded mode can have many "
        "union-failed clips)",
    )
    ap.add_argument(
        "--sharp_curriculum", action="store_true",
        help="train the sharp_turns specialist on the graded turn ladder "
        "(blend 0.8s -> 0.25s) with level-advancing PMCP instead of "
        "one-hot on the hardest clip directly — the round-4 one-hot "
        "specialist plateaued at 1.0-1.5 m drift (hard suite only)",
    )
    ap.add_argument(
        "--amp_getup_epochs", type=int, default=0,
        help="if >0: a getup/AMP column stage — AMPAgent in the "
        "HumanoidImGetupEnv fall-state curriculum with the reference's "
        "reward-weight schedule (style-only until epochs/3, then 50/50; "
        "amp_agent.py:557-579 semantics)",
    )
    ap.add_argument(
        "--composer_env", choices=["getup", "im"], default="getup",
        help="composer training env. getup: HumanoidImMCPGetupEnv, so "
        "fall/recovery states are in the composer's training distribution "
        "(the round-4 composer ignored its getup column: 657 mm where the "
        "specialist got 103; ≙ humanoid_im_mcp_getup.py) — eval is always "
        "on the plain im MCP env for comparable scores",
    )
    ap.add_argument(
        "--gate_temp", type=float, default=4.0,
        help="composer gate softmax temperature. PPO clips gate actions to "
        "[-1,1], so at temp 1 the softmax tops out at ~0.6 of one column "
        "(N=6) and the composer can never hand FULL control to a "
        "specialist — the round-4 composer's 4/6 ceiling. temp 4 makes "
        "+-1 logits near-one-hot (max weight ~0.997)",
    )
    ap.add_argument(
        "--gate_pretrain_rounds", type=int, default=150,
        help="if >0: before PPO, behavior-clone the composer gate to the "
        "ORACLE routing (one-hot of each clip's best column, known from the "
        "column evals) on states visited under that oracle. PPO then only "
        "fine-tunes — and is skipped entirely if the pretrained gate "
        "already reaches the column union",
    )
    ap.add_argument(
        "--spec_eval_every", type=int, default=500,
        help="specialist in-training eval cadence; lower values early-stop "
        "warm-started family rungs sooner (graded mode)",
    )
    ap.add_argument("--out", default="output/curriculum")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import dataclasses as dc

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.eval.im_eval import im_eval
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
    from pulse_tpu.motion import build_motion_data
    from pulse_tpu.motion.motion_lib import update_hard_sampling_weight
    from pulse_tpu.motion.synthetic import make_graded_suite, make_hard_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    if args.suite == "graded":
        clips, names, families = make_graded_suite(spec.skeleton)
        suite_label = "graded_v1"
    else:
        clips, names = make_hard_clips(spec.skeleton)
        families = None
        suite_label = "hard_synthetic_v2"
    motion = build_motion_data(spec.skeleton, clips)
    M = len(names)

    env = HumanoidImEnv(
        model, motion, EnvConfig(use_pallas_physics=(args.pallas == "on"))
    )
    eval_env = env.with_config(
        dc.replace(env.config, enable_early_termination=False)
    )
    actor_units = (2048, 1536, 1024)
    net = ActorCritic(action_dim=env.action_dim, actor_units=actor_units)
    agent = PPOAgent(
        env,
        PPOConfig(
            num_envs=args.envs,
            horizon_length=args.horizon,
            minibatch_size=args.minibatch,
            mini_epochs=6,
            learning_rate=2e-5,
        ),
        net,
    )
    train = jax.jit(agent.train_epoch, donate_argnums=0)
    steps_per_epoch = args.envs * args.horizon

    def run_stage(ts, epochs, tag, hard_mask=None, eval_every=500):
        """Train `epochs`; for hard columns (hard_mask set), run the
        in-training eval -> PMCP feedback loop every `eval_every` epochs
        (≙ IMAmpAgent.eval + update_hard_sampling_weight,
        im_amp.py:136-242): the sampling weights re-concentrate on the
        clips STILL failing (a device write — no retrace), and the column
        stops early once every hard clip passes."""
        t0 = time.time()
        for epoch in range(epochs):
            ts, metrics = train(ts)
            if epoch % 100 == 0:
                r = float(metrics["reward_mean"])
                fps = steps_per_epoch * (epoch + 1) / (time.time() - t0)
                print(f"[{tag}] epoch={epoch} reward={r:.4f} fps={fps:,.0f}",
                      flush=True)
            if (
                hard_mask is not None
                and epoch > 0
                and epoch % eval_every == 0
            ):
                r_mid = eval_policy(ts.params, ts.obs_rms, f"{tag}@{epoch}")
                still = r_mid.failed_motions & hard_mask
                if not still.any():
                    print(f"[{tag}] all hard clips pass at epoch {epoch} — "
                          "early stop", flush=True)
                    break
                hard = update_hard_sampling_weight(
                    env.motion, jnp.asarray(still)
                ).sampling_prob
                ts = ts.replace(motion_prob=jnp.array(hard))
        jax.block_until_ready(jax.tree.leaves(ts)[0])
        print(f"[{tag}] {epochs} epochs in {time.time() - t0:.0f}s", flush=True)
        return ts

    def eval_policy(params, obs_rms, tag, on_env=None):
        def policy_fn(obs):
            mu, _, _ = net.apply({"params": params}, obs_rms.normalize(obs))
            return jnp.clip(mu, -1.0, 1.0)

        r = im_eval(on_env or eval_env, policy_fn, batch_size=M)
        per = {
            n: ("ok" if not r.failed_motions[i] else "FAIL")
            + f" g={r.per_motion_mpjpe_g[i]:.0f}mm"
            for i, n in enumerate(names)
        }
        print(f"[{tag}] success {int(M - r.failed_motions.sum())}/{M} "
              f"pa={r.mpjpe_pa:.1f}mm {per}", flush=True)
        return r

    def result_json(r):
        return {
            "success": int(M - r.failed_motions.sum()),
            "mpjpe_g_mm": round(r.mpjpe_g, 2),
            "mpjpe_l_mm": round(r.mpjpe_l, 2),
            "mpjpe_pa_mm": round(r.mpjpe_pa, 2),
            "per_clip": {
                n: {
                    "success": bool(~r.failed_motions[i]),
                    "mpjpe_g_mm": round(float(r.per_motion_mpjpe_g[i]), 2),
                }
                for i, n in enumerate(names)
            },
        }

    # ---------------------------------------------------------------- #
    # column stages (resume from snapshots if present)
    # ---------------------------------------------------------------- #
    col_actors = []       # host copies of each column's actor-critic params
    col_rms = []          # matching obs stats
    col_evals = []

    def dump_partial(spec_names, composer_result=None):
        """Write stage results so far: a multi-hour graded run interrupted
        mid-flight still leaves a committable artifact (out/partial.json)."""
        if not col_evals:
            return
        partial = {
            "suite": suite_label,
            "status": "partial",
            "columns": [result_json(r) for r in col_evals],
            "specialists": list(spec_names),
            "composer": None if composer_result is None
            else result_json(composer_result),
            "column_union_success": int(
                M - np.logical_and.reduce(
                    [r.failed_motions for r in col_evals]
                ).sum()
            ),
        }
        with open(os.path.join(args.out, "partial.json"), "w") as fh:
            json.dump(partial, fh, indent=2)
    failed = np.ones(M, bool)
    ts = agent.init(jax.random.PRNGKey(args.seed))

    for col in range(args.max_columns):
        snap = os.path.join(args.out, f"col{col}.pkl")
        epochs = args.epochs if col == 0 else args.hard_epochs
        if os.path.exists(snap):
            with open(snap, "rb") as fh:
                saved = pickle.load(fh)
            params = jax.tree.map(jnp.asarray, saved["params"])
            rms = ts.obs_rms.replace(
                mean=jnp.asarray(saved["rms_mean"]),
                var=jnp.asarray(saved["rms_var"]),
                count=jnp.asarray(saved["rms_count"]),
            )
            ts = ts.replace(params=params, obs_rms=rms)
            print(f"[col{col}] restored snapshot {snap}", flush=True)
        else:
            if col > 0:
                # forward_pmcp: previous column's weights are the init, and
                # training is confined to the failed set via hard PMCP
                hard = update_hard_sampling_weight(
                    env.motion, jnp.asarray(failed)
                ).sampling_prob
                ts = ts.replace(
                    motion_prob=jnp.array(hard),
                    opt_state=agent.optimizer.init(ts.params),
                    epoch=jnp.zeros((), jnp.int32),
                )
            ts = run_stage(
                ts, epochs, f"col{col}",
                hard_mask=None if col == 0 else failed.copy(),
            )
            with open(snap, "wb") as fh:
                pickle.dump(
                    {
                        "params": jax.device_get(ts.params),
                        "rms_mean": jax.device_get(ts.obs_rms.mean),
                        "rms_var": jax.device_get(ts.obs_rms.var),
                        "rms_count": jax.device_get(ts.obs_rms.count),
                    },
                    fh,
                )
        col_actors.append(jax.device_get(ts.params))
        # host copy: train() donates its input train state, so keeping the
        # LIVE obs_rms arrays here would leave deleted buffers once the next
        # stage trains (caught by the CPU smoke of the specialist path)
        col_rms.append(jax.device_get(ts.obs_rms))
        r = eval_policy(
            jax.tree.map(jnp.asarray, col_actors[-1]), col_rms[-1], f"col{col}"
        )
        col_evals.append(r)
        dump_partial([])
        new_failed = r.failed_motions.copy()
        if col == 0:
            failed = new_failed
        else:
            # the next column attacks what EVERY column so far still fails
            failed = failed & new_failed
        if not failed.any():
            print(f"[col{col}] no remaining failures — stopping columns",
                  flush=True)
            break

    # ---------------------------------------------------------------- #
    # specialist columns: one per clip that NO column passes yet
    # (one-hot hard PMCP; init from the generalist col0 — it still has the
    # base locomotion skills the later intersection columns traded away)
    # ---------------------------------------------------------------- #
    def save_snap(path, ts_params, ts_rms):
        with open(path, "wb") as fh:
            pickle.dump(
                {
                    "params": jax.device_get(ts_params),
                    "rms_mean": jax.device_get(ts_rms.mean),
                    "rms_var": jax.device_get(ts_rms.var),
                    "rms_count": jax.device_get(ts_rms.count),
                },
                fh,
            )

    def train_sharp_ladder(ts):
        """Sharp-turn curriculum: train on the graded turn ladder (heading
        blend 0.8 s -> 0.25 s at fixed 1.6 m/s; the hardest level is
        bit-identical to v2 sharp_turns) with level-advancing sampling —
        60% of resets on the current level, 40% spread over the levels
        already passed. Advance when the current level's im_eval passes;
        stop when the hardest passes. ≙ the reference's answer to
        hard-clip plateaus: progressive exposure (getup schedule,
        humanoid_im_getup.py:67-74) + PMCP concentration, here along an
        explicit difficulty axis the synthetic generator controls."""
        t_clips, t_names, t_fams = make_graded_suite(spec.skeleton)
        ladder_ids = t_fams["turn"]
        ladder = build_motion_data(
            spec.skeleton, [t_clips[j] for j in ladder_ids]
        )
        L = ladder.num_motions
        env_t = HumanoidImEnv(model, ladder, env.config)
        eval_env_t = env_t.with_config(
            dc.replace(env_t.config, enable_early_termination=False)
        )
        agent_t = PPOAgent(env_t, agent.config, net)
        train_t = jax.jit(agent_t.train_epoch, donate_argnums=0)
        tts = agent_t.init(jax.random.PRNGKey(args.seed + 5))
        tts = tts.replace(
            params=ts.params, obs_rms=ts.obs_rms,
            opt_state=agent.optimizer.init(ts.params),
        )

        def ladder_prob(level):
            p = np.full(L, 1e-6)
            p[: level + 1] = 0.4 / (level + 1)
            p[level] += 0.6
            return jnp.asarray(p / p.sum())

        def ladder_eval(params, obs_rms, tag):
            def pol(obs):
                mu, _, _ = net.apply({"params": params}, obs_rms.normalize(obs))
                return jnp.clip(mu, -1.0, 1.0)

            r = im_eval(eval_env_t, pol, batch_size=L)
            stat = " ".join(
                f"{t_names[ladder_ids[j]]}:"
                + ("ok" if not r.failed_motions[j] else "FAIL")
                for j in range(L)
            )
            print(f"[{tag}] {stat}", flush=True)
            return r

        level = 0
        tts = tts.replace(motion_prob=ladder_prob(level))
        t0 = time.time()
        eval_every = 300
        for epoch in range(args.specialist_epochs):
            tts, metrics = train_t(tts)
            if epoch % 100 == 0:
                print(f"[spec_sharp_ladder] epoch={epoch} level={level} "
                      f"reward={float(metrics['reward_mean']):.4f} "
                      f"fps={steps_per_epoch*(epoch+1)/(time.time()-t0):,.0f}",
                      flush=True)
            if epoch > 0 and epoch % eval_every == 0:
                r_mid = ladder_eval(
                    tts.params, tts.obs_rms, f"spec_sharp_ladder@{epoch}"
                )
                passed = ~np.asarray(r_mid.failed_motions)
                if passed[L - 1]:
                    print(f"[spec_sharp_ladder] hardest level passes at "
                          f"epoch {epoch} — early stop", flush=True)
                    break
                # advance to the hardest contiguous level reached; never
                # retreat (a transient regression on an easy level should
                # not reset the ladder)
                while level < L - 1 and passed[level]:
                    level += 1
                tts = tts.replace(motion_prob=ladder_prob(level))
        jax.block_until_ready(jax.tree.leaves(tts)[0])
        ladder_eval(tts.params, tts.obs_rms, "spec_sharp_ladder/final")
        return tts

    spec_names = []
    if args.specialist_epochs > 0:
        union_failed = np.logical_and.reduce(
            [np.asarray(r.failed_motions) for r in col_evals]
        )
        failed_ids = list(np.flatnonzero(union_failed))
        fam_of = lvl_of = None
        if families is not None:
            # graded suite: process rungs easy -> hard within each family so
            # each specialist can warm-start from the previous rung's owner
            # — the generalized turn ladder (train_sharp_ladder is the
            # hard-suite special case of the same idea)
            fam_of = {i: f for f, idx in families.items() for i in idx}
            lvl_of = {
                i: k for f, idx in families.items() for k, i in enumerate(idx)
            }
            failed_ids.sort(key=lambda i: (fam_of[i], lvl_of[i]))

        def spec_init_source(i):
            """Artifact to warm-start clip i's specialist from: the column/
            specialist with the lowest drift on the immediately easier rung
            of i's family (preferring ones that PASS it); col0 otherwise."""
            if fam_of is None:
                return 0
            easier = [j for j in families[fam_of[i]] if lvl_of[j] < lvl_of[i]]
            if not easier:
                return 0
            j = easier[-1]
            return min(
                range(len(col_evals)),
                key=lambda c: (
                    bool(np.asarray(col_evals[c].failed_motions)[j]),
                    float(np.asarray(col_evals[c].per_motion_mpjpe_g)[j]),
                ),
            )

        n_spec = 0
        for i in failed_ids:
            if n_spec >= args.max_specialists:
                break
            name = names[i]
            # a specialist trained on an easier rung often cracks its
            # neighbors (same family, shared dynamics) — retest coverage
            # before paying for another stage
            if not all(np.asarray(r.failed_motions)[i] for r in col_evals):
                print(f"[spec_{name}] already covered by an earlier "
                      "column/specialist — skipping", flush=True)
                continue
            n_spec += 1
            use_ladder = args.sharp_curriculum and name == "sharp_turns"
            snap = os.path.join(
                args.out, f"spec_{name}{'_ladder' if use_ladder else ''}.pkl"
            )
            mask = np.zeros(M, bool)
            mask[i] = True
            if os.path.exists(snap):
                with open(snap, "rb") as fh:
                    saved = pickle.load(fh)
                ts = ts.replace(
                    params=jax.tree.map(jnp.asarray, saved["params"]),
                    obs_rms=ts.obs_rms.replace(
                        mean=jnp.asarray(saved["rms_mean"]),
                        var=jnp.asarray(saved["rms_var"]),
                        count=jnp.asarray(saved["rms_count"]),
                    ),
                )
                print(f"[spec_{name}] restored snapshot {snap}", flush=True)
            else:
                # fresh device upload per specialist: the previous
                # specialist's training donated the last upload's buffers
                src = spec_init_source(i)
                if src:
                    print(f"[spec_{name}] warm-start from column {src} "
                          f"(owns the easier rung)", flush=True)
                src_params = jax.tree.map(jnp.asarray, col_actors[src])
                src_rms = jax.tree.map(jnp.asarray, col_rms[src])
                ts = ts.replace(
                    params=src_params,
                    obs_rms=src_rms,
                    opt_state=agent.optimizer.init(src_params),
                    epoch=jnp.zeros((), jnp.int32),
                )
                if use_ladder:
                    tts = train_sharp_ladder(ts)
                    ts = ts.replace(params=tts.params, obs_rms=tts.obs_rms)
                else:
                    hard = update_hard_sampling_weight(
                        env.motion, jnp.asarray(mask)
                    ).sampling_prob
                    ts = ts.replace(motion_prob=jnp.array(hard))
                    ts = run_stage(
                        ts, args.specialist_epochs, f"spec_{name}",
                        hard_mask=mask, eval_every=args.spec_eval_every,
                    )
                save_snap(snap, ts.params, ts.obs_rms)
            col_actors.append(jax.device_get(ts.params))
            # host copy — the next specialist's training donates these buffers
            col_rms.append(jax.device_get(ts.obs_rms))
            col_evals.append(
                eval_policy(
                    jax.tree.map(jnp.asarray, col_actors[-1]), col_rms[-1],
                    f"spec_{name}",
                )
            )
            spec_names.append(name)
            dump_partial(spec_names)

    # ---------------------------------------------------------------- #
    # getup/AMP column stage: AMPAgent in the fall-state curriculum env
    # (≙ the reference's PULSE-training combo: im_getup fall-state
    # harvesting + AMP style reward with the getup reward-weight schedule,
    # humanoid_im_getup.py:82-210 + amp_agent.py:557-579)
    # ---------------------------------------------------------------- #
    from pulse_tpu.env.humanoid_im_getup import GetupConfig, HumanoidImGetupEnv
    from pulse_tpu.learning.amp import AMPConfig
    from pulse_tpu.learning.amp_agent import AMPAgent

    amp_getup_eval = None
    if args.amp_getup_epochs > 0:
        getup_cfg = GetupConfig(**dc.asdict(env.config))
        snap = os.path.join(args.out, "amp_getup.pkl")
        if os.path.exists(snap):
            with open(snap, "rb") as fh:
                saved = pickle.load(fh)
            a_params = jax.tree.map(jnp.asarray, saved["params"])
            a_rms = ts.obs_rms.replace(
                mean=jnp.asarray(saved["rms_mean"]),
                var=jnp.asarray(saved["rms_var"]),
                count=jnp.asarray(saved["rms_count"]),
            )
            print(f"[amp_getup] restored snapshot {snap}", flush=True)
        else:
            getup_env = HumanoidImGetupEnv(model, motion, getup_cfg)
            amp_agent = AMPAgent(
                getup_env, agent.config,
                AMPConfig(task_reward_w=0.5, disc_reward_w=0.5), net,
                getup_update_epoch=max(args.amp_getup_epochs // 3, 1),
            )
            col0_params = jax.tree.map(jnp.asarray, col_actors[0])
            col0_rms = jax.tree.map(jnp.asarray, col_rms[0])
            ats = amp_agent.init(jax.random.PRNGKey(args.seed + 11))
            ats = ats.replace(ppo=ats.ppo.replace(
                params=col0_params, obs_rms=col0_rms,
                opt_state=agent.optimizer.init(col0_params),
            ))
            amp_train = jax.jit(amp_agent.train_epoch, donate_argnums=0)
            t0 = time.time()
            for epoch in range(args.amp_getup_epochs):
                ats = amp_agent.pre_epoch(ats, epoch)
                if amp_agent.needs_retrace:
                    # the getup-phase flip changes trace constants
                    # (fall_init_prob 1.0 -> target) — one extra compile
                    amp_train = jax.jit(
                        amp_agent.train_epoch, donate_argnums=0
                    )
                ats, metrics = amp_train(ats)
                if epoch % 100 == 0:
                    print(
                        f"[amp_getup] epoch={epoch} "
                        f"reward={float(metrics['reward_mean']):.4f} "
                        f"task={float(metrics['task_reward_mean']):.4f} "
                        f"disc={float(metrics['disc_reward_mean']):.4f} "
                        f"fps={steps_per_epoch*(epoch+1)/(time.time()-t0):,.0f}",
                        flush=True,
                    )
            jax.block_until_ready(jax.tree.leaves(ats)[0])
            save_snap(snap, ats.ppo.params, ats.ppo.obs_rms)
            a_params = jax.tree.map(
                jnp.asarray, jax.device_get(ats.ppo.params)
            )
            a_rms = jax.device_get(ats.ppo.obs_rms)
            a_rms = jax.tree.map(jnp.asarray, a_rms)
        col_actors.append(jax.device_get(a_params))
        col_rms.append(jax.device_get(a_rms))
        amp_getup_eval = eval_policy(
            jax.tree.map(jnp.asarray, col_actors[-1]),
            jax.tree.map(jnp.asarray, col_rms[-1]), "amp_getup",
        )
        col_evals.append(amp_getup_eval)

    # ---------------------------------------------------------------- #
    # composer stage: frozen PNN over the columns, policy = mix weights
    # ---------------------------------------------------------------- #
    from pulse_tpu.env.humanoid_im_mcp import (
        HumanoidImMCPEnv,
        HumanoidImMCPGetupEnv,
    )
    from pulse_tpu.learning.pnn import PNN

    n_cols = len(col_actors)
    composer_result = None
    if n_cols > 1 and args.composer_epochs > 0:
        pnn = PNN(
            action_dim=env.action_dim,
            num_primitives=n_cols,
            units=actor_units,
            activation="silu",
            has_lateral=False,
            column_inputs=True,
        )
        pnn_params = pnn_params_from_actors(col_actors, len(actor_units))
        # every frozen column keeps the input normalizer it was trained
        # under: stacked [N, obs] RunningMeanStd leaves broadcast the
        # per-column normalize (PNN.column_inputs). The reference shares
        # ONE normalizer across columns, which is only exact when the
        # columns trained under the same stats — ours train sequentially.
        frozen_rms = col_rms[-1].replace(
            mean=jnp.stack([r.mean for r in col_rms]),
            var=jnp.stack([r.var for r in col_rms]),
        ).freeze()
        if args.composer_env == "getup":
            # fall/recovery states in the composer's training distribution:
            # the composer must learn WHEN to hand control to its getup
            # column, which it only sees if episodes start fallen and get a
            # termination-grace window (≙ humanoid_im_mcp_getup.py:31)
            mcp_env = HumanoidImMCPGetupEnv(
                model, motion,
                GetupConfig(
                    **dc.asdict(env.config),
                    fall_init_prob=0.3, recovery_episode_prob=0.3,
                ),
                pnn=pnn, pnn_params=pnn_params, obs_rms=frozen_rms,
                gate_temp=args.gate_temp,
            )
        else:
            mcp_env = HumanoidImMCPEnv(
                model, motion, env.config, pnn=pnn, pnn_params=pnn_params,
                obs_rms=frozen_rms, gate_temp=args.gate_temp,
            )
        comp_net = ActorCritic(
            action_dim=n_cols, actor_units=(512, 256), critic_units=(512, 256)
        )
        comp_agent = PPOAgent(
            mcp_env,
            PPOConfig(
                num_envs=args.envs,
                horizon_length=args.horizon,
                minibatch_size=args.minibatch,
                mini_epochs=6,
                learning_rate=2e-5,
            ),
            comp_net,
        )
        comp_train = jax.jit(comp_agent.train_epoch, donate_argnums=0)
        cts = comp_agent.init(jax.random.PRNGKey(args.seed + 1))
        # scoring is ALWAYS on the plain im MCP env (deterministic clip
        # sweep, no fall inits) so composer numbers stay comparable across
        # --composer_env choices and to the column rows
        mcp_eval_env = HumanoidImMCPEnv(
            model, motion,
            dc.replace(env.config, enable_early_termination=False),
            pnn=pnn, pnn_params=pnn_params, obs_rms=frozen_rms,
            gate_temp=args.gate_temp,
        )
        # what the composer can possibly reach: clips some column passes
        passable = ~np.logical_and.reduce(
            [np.asarray(r.failed_motions) for r in col_evals]
        )

        def eval_composer(params, obs_rms, tag):
            def pol(obs):
                mu, _, _ = comp_net.apply(
                    {"params": params}, obs_rms.normalize(obs)
                )
                return jnp.clip(mu, -1.0, 1.0)

            r = im_eval(mcp_eval_env, pol, batch_size=M)
            print(f"[{tag}] success {int(M - r.failed_motions.sum())}/{M} "
                  f"pa={r.mpjpe_pa:.1f}mm", flush=True)
            return r

        def gate_pretrain(cts):
            """BC the gate to the oracle routing (each clip's best column).

            The representable optimum under the [-1,1] action clip is
            logits = 2*onehot(best_col) - 1 (near-one-hot after gate_temp
            scaling); states are collected ON-ORACLE (the oracle gate
            drives the scoring env), so BC sees exactly the states the
            routed specialists visit. The reference trains this routing
            with RL alone (humanoid_im_mcp.py); with the per-clip-best
            assignment already known from the column evals, supervised
            routing + a PPO fine-tune is strictly cheaper.
            """
            import optax

            fails = np.stack([np.asarray(r.failed_motions) for r in col_evals])
            drift = np.stack(
                [np.asarray(r.per_motion_mpjpe_g) for r in col_evals]
            )
            best_col = np.argmin(drift + 1e9 * fails, axis=0)  # [M]
            print("[gate_pretrain] oracle routing: "
                  + ", ".join(f"{names[i]}->col{best_col[i]}" for i in range(M)),
                  flush=True)
            target_table = jnp.asarray(
                2.0 * np.eye(n_cols)[best_col] - 1.0, dtype=jnp.float32
            )  # [M, n_cols]
            opt = optax.adam(1e-3)
            opt_state = opt.init(cts.params)
            H = 32

            @jax.jit
            def round_fn(states, params, opt_state, rms):
                def body(st, _):
                    a = target_table[st.motion_id]
                    return mcp_eval_env.step(st, a), (st.obs, a)

                states, (obs, tgt) = jax.lax.scan(
                    body, states, None, length=H
                )
                obs = obs.reshape(-1, obs.shape[-1])
                tgt = tgt.reshape(-1, n_cols)
                rms = rms.update(obs)

                def loss_fn(p):
                    mu, _, _ = comp_net.apply(
                        {"params": p}, rms.normalize(obs)
                    )
                    return jnp.mean((mu - tgt) ** 2)

                loss, g = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(g, opt_state)
                return (
                    states, optax.apply_updates(params, updates),
                    opt_state, rms, loss,
                )

            keys = jax.random.split(
                jax.random.PRNGKey(args.seed + 2), args.envs
            )
            states = mcp_eval_env.reset(keys)
            params, rms = cts.params, cts.obs_rms
            t0 = time.time()
            for i in range(args.gate_pretrain_rounds):
                states, params, opt_state, rms, loss = round_fn(
                    states, params, opt_state, rms
                )
                if i % 25 == 0 or i == args.gate_pretrain_rounds - 1:
                    print(f"[gate_pretrain] round={i} "
                          f"bc_loss={float(loss):.4f} "
                          f"({time.time() - t0:.0f}s)", flush=True)
            return cts.replace(params=params, obs_rms=rms)

        # keyed by column count AND protocol: a rerun that adds specialist
        # columns must train a fresh composer, not restore the narrower
        # one. v2: composer-stage PMCP (loop below); v3: + getup training
        # env; v4: + gate_temp routing and oracle-routing BC pretrain
        comp_v = "v4" if args.composer_env == "getup" else "v4im"
        snap = os.path.join(args.out, f"composer{n_cols}{comp_v}.pkl")
        if os.path.exists(snap):
            with open(snap, "rb") as fh:
                saved = pickle.load(fh)
            cts = cts.replace(
                params=jax.tree.map(jnp.asarray, saved["params"]),
                obs_rms=cts.obs_rms.replace(
                    mean=jnp.asarray(saved["rms_mean"]),
                    var=jnp.asarray(saved["rms_var"]),
                    count=jnp.asarray(saved["rms_count"]),
                ),
            )
            print(f"[composer] restored snapshot {snap}", flush=True)
        else:
            # keep the best-by-eval gate across pretrain/mid/final: the PPO
            # fine-tune starts from a fresh (random) value head, so its
            # first epochs can DEGRADE a good pretrained gate on noisy
            # advantages — the shipped artifact must never be worse than
            # the best point we measured
            best = {"key": None}

            def consider(r, params, rms):
                key = (
                    int(np.asarray(r.failed_motions).sum()),
                    float(r.mpjpe_pa),
                )
                if best["key"] is None or key < best["key"]:
                    best.update(
                        key=key,
                        params=jax.device_get(params),
                        rms=jax.device_get(rms),
                    )

            skip_ppo = False
            if args.gate_pretrain_rounds > 0:
                cts = gate_pretrain(cts)
                r0 = eval_composer(
                    cts.params, cts.obs_rms, "composer/pretrained"
                )
                consider(r0, cts.params, cts.obs_rms)
                skip_ppo = not (np.asarray(r0.failed_motions) & passable).any()
                if skip_ppo:
                    print("[composer] pretrained gate reaches the column "
                          "union — skipping PPO fine-tune", flush=True)
            t0 = time.time()
            for epoch in range(0 if skip_ppo else args.composer_epochs):
                cts, metrics = comp_train(cts)
                if epoch % 100 == 0:
                    r = float(metrics["reward_mean"])
                    fps = steps_per_epoch * (epoch + 1) / (time.time() - t0)
                    print(f"[composer] epoch={epoch} reward={r:.4f} "
                          f"fps={fps:,.0f}", flush=True)
                # composer-stage PMCP: mid-training eval -> concentrate
                # composer training on clips where the BLEND still fails a
                # clip some column can solve (same device-write feedback as
                # the column stages; the composer's job is exactly the
                # column-union, so it should spend its budget there)
                if epoch > 0 and epoch % 250 == 0:
                    r_mid = eval_composer(
                        cts.params, cts.obs_rms, f"composer@{epoch}"
                    )
                    consider(r_mid, cts.params, cts.obs_rms)
                    gap = np.asarray(r_mid.failed_motions) & passable
                    if not gap.any():
                        print(f"[composer] reaches the column union at "
                              f"epoch {epoch} — early stop", flush=True)
                        break
                    hard = update_hard_sampling_weight(
                        env.motion, jnp.asarray(gap)
                    ).sampling_prob
                    # 50/50 hard/uniform: unlike a column, the composer must
                    # keep ALL clips working while it closes the gap
                    cts = cts.replace(
                        motion_prob=0.5 * jnp.array(hard) + 0.5 / M
                    )
            if not skip_ppo and args.composer_epochs > 0:
                r_end = eval_composer(cts.params, cts.obs_rms, "composer/end")
                consider(r_end, cts.params, cts.obs_rms)
            if best["key"] is not None:
                cts = cts.replace(
                    params=jax.tree.map(jnp.asarray, best["params"]),
                    obs_rms=jax.tree.map(jnp.asarray, best["rms"]),
                )
                print(f"[composer] shipping best measured gate: "
                      f"{M - best['key'][0]}/{M} pa={best['key'][1]:.1f}mm",
                      flush=True)
            jax.block_until_ready(jax.tree.leaves(cts)[0])
            with open(snap, "wb") as fh:
                pickle.dump(
                    {
                        "params": jax.device_get(cts.params),
                        "rms_mean": jax.device_get(cts.obs_rms.mean),
                        "rms_var": jax.device_get(cts.obs_rms.var),
                        "rms_count": jax.device_get(cts.obs_rms.count),
                    },
                    fh,
                )

        composer_result = eval_composer(cts.params, cts.obs_rms, "composer")

    if composer_result is not None:
        dump_partial(spec_names, composer_result)

    # ---------------------------------------------------------------- #
    # report
    # ---------------------------------------------------------------- #
    out = {
        "suite": suite_label,
        "pallas": args.pallas,
        "envs": args.envs,
        "seed": args.seed,
        "epochs": {
            "col0": args.epochs,
            "hard": args.hard_epochs,
            "composer": args.composer_epochs,
            "amp_getup": args.amp_getup_epochs,
        },
        "composer_env": args.composer_env,
        "sharp_curriculum": bool(args.sharp_curriculum),
        "specialists": spec_names,
        "amp_getup": None if amp_getup_eval is None else result_json(amp_getup_eval),
        "columns": [result_json(r) for r in col_evals],
        "composer": None if composer_result is None else result_json(composer_result),
        # the suite score: the best single final artifact (composed policy
        # when trained, else the best column — NOT the last entry, which
        # with specialists on is a one-clip column that forgets the rest)
        "final": result_json(
            composer_result
            or min(col_evals, key=lambda r: (r.failed_motions.sum(), r.mpjpe_pa))
        ),
        # union coverage across columns — what the composer has to reach
        "column_union_success": int(
            M - np.logical_and.reduce([r.failed_motions for r in col_evals]).sum()
        ),
    }
    if families is not None:
        # per-family success floors: which difficulty level each family's
        # coverage reaches in the final artifact (regressions localize)
        fr = out["final"]["per_clip"]
        out["per_family"] = {
            fam: {
                "passed": sum(fr[names[i]]["success"] for i in idx),
                "levels": {names[i]: fr[names[i]]["success"] for i in idx},
            }
            for fam, idx in families.items()
        }
    print(json.dumps(out, indent=2))
    with open(os.path.join(args.out, "curriculum.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
