"""Imitation evaluation: per-clip success rate + MPJPE metrics over the
whole motion database.

≙ phc/learning/im_amp.py:136-363 (in-training eval) and
im_amp_players.py:59-190 (player eval): iterate the motion DB num_envs at a
time from t=0, drive the policy deterministically, mark a clip failed if any
tracked-body mean distance exceeds 0.5 m at any step, and accumulate MPJPE-g
(global, mm), MPJPE-l (root-relative, mm), MPJPE-pa (procrustes-aligned, on
host), plus acceleration/velocity error metrics. The per-step loop is a
lax.scan — the whole eval of one batch is a single device program.

The returned per-motion failure mask feeds MotionLib PMCP reweighting
(update_hard_sampling_weight), closing the reference's hard-negative mining
loop (im_amp.py:126-132).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.motion.motion_lib import get_motion_state


@dataclasses.dataclass
class EvalResult:
    success_rate: float
    mpjpe_g: float          # mm
    mpjpe_l: float          # mm
    mpjpe_pa: float         # mm
    vel_dist: float         # mm/frame
    accel_dist: float       # mm/frame^2
    failed_motions: np.ndarray  # [M] bool
    # per-motion means (mm), for per-clip benchmark tables
    # (tools/bench_quality.py); same accumulators as the aggregate
    per_motion_mpjpe_g: np.ndarray | None = None  # [M]
    per_motion_mpjpe_l: np.ndarray | None = None  # [M]
    # scored (pre-reset, in-clip) steps per motion — pins the boundary
    # semantics: a clip of exactly N control steps scores N-1 comparisons
    # because the env's auto-reset consumes the final one
    per_motion_steps: np.ndarray | None = None  # [M]


def _procrustes_err_jnp(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Batched per-frame similarity-transform alignment error, in-graph.

    pred/gt [..., J, 3] -> [...]. ≙ the p-mpjpe of the reference's
    compute_metrics_lite (im_amp_players.py:147-157), computed for EVERY env
    and frame instead of a host-side subsample."""
    mu_p = pred.mean(axis=-2, keepdims=True)
    mu_g = gt.mean(axis=-2, keepdims=True)
    X = pred - mu_p
    Y = gt - mu_g
    H = jnp.einsum("...ji,...jk->...ik", X, Y)
    U, S, Vt = jnp.linalg.svd(H, full_matrices=False)
    d = jnp.sign(
        jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", Vt.swapaxes(-1, -2), U.swapaxes(-1, -2)))
    )
    D = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )  # diag(1, 1, det-sign)
    R = jnp.einsum(
        "...ij,...j,...jk->...ik", Vt.swapaxes(-1, -2), D, U.swapaxes(-1, -2)
    )
    var_p = jnp.sum(X**2, axis=(-1, -2))
    scale = jnp.sum(S * D, axis=-1) / jnp.maximum(var_p, 1e-9)
    aligned = scale[..., None, None] * jnp.einsum("...jk,...ik->...ji", X, R) + mu_g
    return jnp.linalg.norm(aligned - gt, axis=-1).mean(-1)


def _procrustes_aligned_err(pred: np.ndarray, gt: np.ndarray) -> float:
    """Per-frame similarity-transform alignment (host, numpy). [N, J, 3]."""
    errs = []
    for p, g in zip(pred, gt):
        mu_p, mu_g = p.mean(0), g.mean(0)
        pc, gc = p - mu_p, g - mu_g
        H = pc.T @ gc
        U, S, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        D = np.diag([1.0, 1.0, d])
        R = Vt.T @ D @ U.T
        var_p = (pc**2).sum()
        scale = (S * np.diag(D)).sum() / max(var_p, 1e-9)
        aligned = scale * pc @ R.T + mu_g
        errs.append(np.linalg.norm(aligned - g, axis=-1).mean())
    return float(np.mean(errs)) if errs else 0.0


def im_eval(
    env,
    policy_fn,
    batch_size: int = 64,
    termination_distance: float = 0.5,
    collect_pa: bool = True,
    mesh=None,
) -> EvalResult:
    """policy_fn: obs [B, O] -> deterministic action [B, A].

    With `mesh`, the eval batch's motion ids are placed sharded over the
    mesh's data axis, so GSPMD partitions the whole rollout scan across
    devices (the sharded counterpart of the reference's per-rank eval split,
    im_amp.py:136-242 under Horovod)."""
    motion = env.motion
    M = int(motion.num_motions)
    dt = env.model.config.control_dt
    max_steps = int(np.ceil(float(jnp.max(motion.motion_lengths)) / dt))
    reset_ids = env.reset_body_ids

    def eval_batch(motion_ids: jax.Array, key: jax.Array):
        B = motion_ids.shape[0]
        keys = jax.random.split(key, B)
        state = env.reset_to(keys, motion_ids, jnp.zeros(B))
        lengths = motion.motion_lengths[motion_ids]

        def scan_step(carry, i):
            state, failed, sums, prev_vel = carry
            action = policy_fn(state.obs)
            state = env.step(state, action)
            # local clock: clips all start at t=0 (robust to any env-internal
            # auto-reset; pass the env with early termination disabled)
            t = (i.astype(jnp.float32) + 1.0) * dt
            t_b = jnp.broadcast_to(t, (B,))
            # STRICT inequality: the env auto-resets (RSI) on the step where
            # its post-step clock reaches the clip length (humanoid_im.py
            # pass_time `t >= length`), and the env clock is bit-identical to
            # this one (start_time 0 + progress*control_dt). Scoring that
            # post-reset state charged the policy a phantom drift equal to
            # the clip's total travel — crouch_walk sat at 63 mm mean with a
            # single 2.7 m "spike" at the last step (tools/drift_profile.py)
            # and failed the 0.5 m criterion on it.
            active = t_b < lengths  # still within the clip, pre-reset
            ref = get_motion_state(motion, motion_ids, t_b)

            body_pos = state.physics.body_pos
            ref_pos = ref["rg_pos"]
            track_dist = jnp.mean(
                jnp.linalg.norm(
                    body_pos[:, reset_ids] - ref_pos[:, reset_ids], axis=-1
                ),
                axis=-1,
            )
            failed = failed | (active & (track_dist > termination_distance))

            jpe_g = jnp.linalg.norm(body_pos - ref_pos, axis=-1).mean(-1)
            local = body_pos - body_pos[:, :1]
            ref_local = ref_pos - ref_pos[:, :1]
            jpe_l = jnp.linalg.norm(local - ref_local, axis=-1).mean(-1)
            vel_d = jnp.linalg.norm(
                state.physics.body_vel - ref["body_vel"], axis=-1
            ).mean(-1)
            # acceleration distance: finite-difference accel error (mm/frame^2)
            sim_acc = state.physics.body_vel - prev_vel["sim"]
            ref_acc = ref["body_vel"] - prev_vel["ref"]
            acc_d = jnp.linalg.norm(sim_acc - ref_acc, axis=-1).mean(-1)
            af = active.astype(jnp.float32)
            af_acc = af * (i > 0)
            # procrustes-aligned error for EVERY env/frame, in-graph
            # (≙ compute_metrics_lite over all eval envs,
            # im_amp_players.py:147-157 — round 1 subsampled the first env)
            jpe_pa = (
                _procrustes_err_jnp(body_pos, ref_pos)
                if collect_pa
                else jnp.zeros_like(jpe_g)
            )
            sums = {
                "g": sums["g"] + jpe_g * af,
                "l": sums["l"] + jpe_l * af,
                "pa": sums["pa"] + jpe_pa * af,
                "vel": sums["vel"] + vel_d * af,
                "acc": sums["acc"] + acc_d * af_acc,
                "n": sums["n"] + af,
            }
            prev_vel = {"sim": state.physics.body_vel, "ref": ref["body_vel"]}
            return (state, failed, sums, prev_vel), None

        init = (
            state,
            jnp.zeros(B, bool),
            {k: jnp.zeros(B) for k in ("g", "l", "pa", "vel", "acc", "n")},
            {
                "sim": state.physics.body_vel,
                "ref": state.physics.body_vel,
            },
        )
        (state, failed, sums, _), _ = jax.lax.scan(
            scan_step, init, jnp.arange(max_steps)
        )
        return failed, sums

    eval_batch_j = jax.jit(eval_batch)

    failed_all = np.zeros(M, bool)
    per_g = np.zeros(M)
    per_l = np.zeros(M)
    per_n = np.zeros(M)
    g_sum = l_sum = pa_sum = vel_sum = acc_sum = n_sum = 0.0
    key = jax.random.PRNGKey(0)
    for start in range(0, M, batch_size):
        ids = np.arange(start, min(start + batch_size, M))
        pad = batch_size - len(ids)
        ids_p = np.concatenate([ids, np.full(pad, ids[-1])]) if pad else ids
        key, k = jax.random.split(key)
        ids_dev = jnp.asarray(ids_p)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            ids_dev = jax.device_put(
                ids_dev, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            )
        failed, sums = eval_batch_j(ids_dev, k)
        failed = np.asarray(failed)[: len(ids)]
        failed_all[ids] = failed
        per_n[ids] = np.asarray(sums["n"][: len(ids)])
        n_b = np.maximum(per_n[ids], 1.0)
        per_g[ids] = 1000.0 * np.asarray(sums["g"][: len(ids)]) / n_b
        per_l[ids] = 1000.0 * np.asarray(sums["l"][: len(ids)]) / n_b
        g_sum += float(jnp.sum(sums["g"][: len(ids)]))
        l_sum += float(jnp.sum(sums["l"][: len(ids)]))
        pa_sum += float(jnp.sum(sums["pa"][: len(ids)]))
        vel_sum += float(jnp.sum(sums["vel"][: len(ids)]))
        acc_sum += float(jnp.sum(sums["acc"][: len(ids)]))
        n_sum += float(jnp.sum(sums["n"][: len(ids)]))

    n_sum = max(n_sum, 1.0)
    return EvalResult(
        success_rate=float(1.0 - failed_all.mean()),
        mpjpe_g=1000.0 * g_sum / n_sum,
        mpjpe_l=1000.0 * l_sum / n_sum,
        mpjpe_pa=1000.0 * pa_sum / n_sum,
        vel_dist=1000.0 * vel_sum / n_sum,
        accel_dist=1000.0 * acc_sum / n_sum,
        failed_motions=failed_all,
        per_motion_mpjpe_g=per_g,
        per_motion_mpjpe_l=per_l,
        per_motion_steps=per_n,
    )
