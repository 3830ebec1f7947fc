"""Pallas TPU kernels for the post-physics half of the imitation env step:
imitation reward + AMP discriminator obs (pre-merge state) and the
self-obs + task-obs observation (post-merge state).

Why: after the physics mega-kernel (physics/substep_pallas.py) the env step
was still ~90% XLA fusions — profiling at 3072 envs showed ~1.5 ms/step of
obs/amp/reward/auto-reset ops around a 0.15 ms physics kernel
(tools/profile_step.py, CLAUDE.md perf log). Those ops are a few hundred
tiny elementwise kernels over [B, 24, k] tensors; fusing each stage into
one VMEM-resident Pallas kernel removes the HBM roundtrips between them.

Three kernels over the step:

  * `pallas_step_reward_amp` — THE hot path: the physics mega-kernel with
    the imitation reward (+ per-term raws), termination distances, and AMP
    obs row fused in via substep_pallas._build_kernel's `extra` hook. The
    reward/AMP stage is a function of the PRE-auto-reset stepped state
    (≙ the _finish_step stage before the reset merge:
    kernels.compute_imitation_reward, compute_humanoid_im_reset's
    distance, build_amp_observations_smpl), and the ref motion state at
    the post-step time depends only on (motion_id, progress) — so it is
    gathered before physics and the stage consumes the stepped body state
    in VMEM, saving the custom-call boundary + repack between the physics
    and reward kernels (~part of the 0.35 ms/step of boundary copies in
    the round-3 profile at 3072 envs).
  * `pallas_reward_amp` — the same stage standalone (on an already-stepped
    state); kept for independent golden-testing and for callers that step
    physics elsewhere.
  * `pallas_observe` — self obs (v1) + imitation task obs (v6, T=1) of the
    POST-merge state (≙ kernels.compute_humanoid_self_obs_max +
    compute_imitation_observations_v6 on the merged state).

The auto-reset select stays in XLA (it is a pure data movement the
compiler fuses well, and fresh-state rows come from motion-table gathers
the kernel could not do).

Math notes:
  * dof_to_obs_smpl(quat_to_exp_map(jrot)) == tan_norm(jrot) exactly: the
    exp-map roundtrip returns ±jrot and tan-norm is sign-invariant, so the
    disc dof obs needs no acos at all.
  * heading quats need no atan2/sin/cos: with (cos h, sin h) read off the
    rotated +x axis, the half-angle identities give the z-rotation quat
    [0, 0, ±sqrt((1-c)/2), sqrt((1+c)/2)] branch-free.

Layout follows substep_pallas: a grid block is ENVS_PER_BLOCK=1024 envs as
an [8, 128] f32 tile per scalar row; inputs/outputs are row-concatenated
[NB, R, 8, 128] arrays. Like the physics kernel, env constants (key/reset
body indices, reward k/w, obs flags) are baked into the trace.

Reference surfaces: phc/env/tasks/humanoid_im.py:1328-1378 (obs v6),
1543-1574 (reward), 1600-1628 (termination); humanoid.py:1676-1731
(self obs); humanoid_amp.py:924-1017 (AMP obs v1/v2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pulse_tpu.physics.substep_pallas import (
    ENVS_PER_BLOCK,
    _acos,
    _normalize_angle,
    _pack,
    _qconj,
    _qmul,
    _qrot,
    _unpack,
    _v_sub,
)

_EPS = 1e-9


# --------------------------------------------------------------------------- #
# tile helpers (quantities are python lists of [8, 128] tiles)
# --------------------------------------------------------------------------- #

def _heading_inv_sz(q):
    """(s, w) of the INVERSE heading quat [0, 0, s, w] for root quat q.

    ops/quat.py:291-307 semantics: heading h = atan2 of the rotated +x
    axis's xy; the inverse heading quat is a -h z-rotation. Computed
    branch-free from half-angle identities (no atan2 on Mosaic)."""
    x, y, z, w = q
    rx = 1.0 - 2.0 * (y * y + z * z)   # qrot(q, +x).x = cos h * |xy|
    ry = 2.0 * (x * y + w * z)         # qrot(q, +x).y = sin h * |xy|
    n = jnp.sqrt(rx * rx + ry * ry)
    deg = n < 1e-6                     # +x rotated to vertical: heading 0
    nz = jnp.maximum(n, 1e-6)
    absy = jnp.abs(ry)
    # cos(h/2) = sqrt((n+rx)/2n), sin(h/2) = sqrt((n-rx)/2n): whichever of
    # n±rx is small suffers cancellation, so rewrite it via
    # n - |rx| = ry^2 / (n + |rx|), which is exact and relatively accurate.
    # (Naively, envs facing -x — heading near pi — lost ~3 digits of
    # cos(h/2) and the whole heading-local obs drifted ~1e-3.)
    big = jnp.maximum(nz + jnp.abs(rx), 1e-12)          # n + |rx|, safe
    small = absy / jnp.sqrt(2.0 * nz * big)             # sqrt((n-|rx|)/2n)
    large = jnp.sqrt(big / (2.0 * nz))                  # sqrt((n+|rx|)/2n)
    wh = jnp.where(rx >= 0, large, small)               # cos(h/2) >= 0
    sh = jnp.where(rx >= 0, small, large)               # |sin(h/2)|
    sh = jnp.where(ry < 0, -sh, sh)                     # sign(sin(h/2)) = sign(sin h)
    wh = jnp.where(deg, 1.0, wh)
    sh = jnp.where(deg, 0.0, sh)
    return -sh, wh                      # inverse: z-rotation by -h


def _hz_mul(s, w, q):
    """quat_mul([0,0,s,w], q) — left-multiply by a z-rotation quat."""
    x, y, z, qw = q
    return [
        w * x - s * y,
        w * y + s * x,
        w * z + s * qw,
        w * qw - s * z,
    ]


def _hz_rot(s, w, v):
    """Rotate vec3 by the z-rotation quat [0,0,s,w]."""
    c2 = w * w - s * s       # cos(angle)
    s2 = 2.0 * w * s         # sin(angle)
    return [c2 * v[0] - s2 * v[1], s2 * v[0] + c2 * v[1], v[2]]


def _tan_norm(q):
    """quat_to_tan_norm (ops/quat.py:160-169): [rotated +x, rotated +z].
    Sign-invariant in q."""
    x, y, z, w = q
    return [
        1.0 - 2.0 * (y * y + z * z),
        2.0 * (x * y + w * z),
        2.0 * (x * z - w * y),
        2.0 * (x * z + w * y),
        2.0 * (y * z - w * x),
        1.0 - 2.0 * (x * x + y * y),
    ]


def _quat_angle(q):
    """quat_angle (ops/quat.py:111-131): normalize_angle(2*acos(clip(w)))."""
    w = jnp.clip(q[3], -1.0, 1.0)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    return _normalize_angle(2.0 * _acos(w, sin_half))


# --------------------------------------------------------------------------- #
# row layouts
# --------------------------------------------------------------------------- #

def _body_rows(J):
    """Rows of the body-state block: pos 3J | rot 4J | vel 3J | ang 3J."""
    n = 0
    r = {}
    for name, k in [("pos", 3 * J), ("rot", 4 * J), ("vel", 3 * J), ("ang", 3 * J)]:
        r[name] = n
        n += k
    return r, n


def _read_bodies(rd, r0, J):
    """Read the body-state block into per-body tile lists."""
    pos = [[rd(r0["pos"] + 3 * b + k) for k in range(3)] for b in range(J)]
    rot = [[rd(r0["rot"] + 4 * b + k) for k in range(4)] for b in range(J)]
    vel = [[rd(r0["vel"] + 3 * b + k) for k in range(3)] for b in range(J)]
    ang = [[rd(r0["ang"] + 3 * b + k) for k in range(3)] for b in range(J)]
    return pos, rot, vel, ang


def amp_obs_dim(J: int, num_key: int, amp_v: int, root_height: bool) -> int:
    D = 3 * (J - 1)
    return (
        (1 if root_height else 0)
        + 6 + 3 + 3 + 2 * D + D + 3 * num_key
        + (3 * num_key if amp_v == 2 else 0)
    )


# --------------------------------------------------------------------------- #
# kernel R: reward + termination distances + AMP obs (pre-merge state)
# --------------------------------------------------------------------------- #

def _reward_amp_tiles(e, pos, rot, vel, ang, jrot, jom, rpos, rrot, rvel, rang):
    """Shared tile math for the reward/termination/AMP stage: given the
    stepped world body state (pos/rot/vel/ang per body), the joint state
    (jrot/jom per non-root joint), and the reference body state, return
    the output tile list [reward, raw4..., dist_mean, dist_max, amp...].
    Used by both the standalone reward/AMP kernel and the fused
    physics+reward kernel (pallas_step_reward_amp)."""
    J = e["J"]
    Jm1 = J - 1

    # --- imitation reward (kernels.compute_imitation_reward) --------- #
    zero = pos[0][0] * 0.0
    pos_sq = zero
    vel_sq = zero
    ang_sq = zero
    rot_sq = zero
    for b in range(J):
        dp = _v_sub(rpos[b], pos[b])
        pos_sq = pos_sq + dp[0] * dp[0] + dp[1] * dp[1] + dp[2] * dp[2]
        dv = _v_sub(rvel[b], vel[b])
        vel_sq = vel_sq + dv[0] * dv[0] + dv[1] * dv[1] + dv[2] * dv[2]
        da = _v_sub(rang[b], ang[b])
        ang_sq = ang_sq + da[0] * da[0] + da[1] * da[1] + da[2] * da[2]
        a = _quat_angle(_qmul(rrot[b], _qconj(rot[b])))
        rot_sq = rot_sq + a * a
    inv3J = 1.0 / (3.0 * J)
    invJ = 1.0 / J
    r_pos = jnp.exp(-e["k_pos"] * pos_sq * inv3J)
    r_rot = jnp.exp(-e["k_rot"] * rot_sq * invJ)
    r_vel = jnp.exp(-e["k_vel"] * vel_sq * inv3J)
    r_ang = jnp.exp(-e["k_ang_vel"] * ang_sq * inv3J)
    reward = (
        e["w_pos"] * r_pos + e["w_rot"] * r_rot
        + e["w_vel"] * r_vel + e["w_ang_vel"] * r_ang
    )

    # --- termination distances over the reset-body subset ------------ #
    dsum = zero
    dmax = zero
    for b in e["reset_ids"]:
        dp = _v_sub(pos[b], rpos[b])
        d = jnp.sqrt(dp[0] * dp[0] + dp[1] * dp[1] + dp[2] * dp[2])
        dsum = dsum + d
        dmax = jnp.maximum(dmax, d)
    dmean = dsum * (1.0 / len(e["reset_ids"]))

    # --- AMP obs (build_amp_observations_smpl / _v2) ---------------- #
    root_pos, root_rot = pos[0], rot[0]
    s, w = _heading_inv_sz(root_rot)
    if e["local_root_obs"]:
        rr_obs = _tan_norm(_hz_mul(s, w, root_rot))
    else:
        rr_obs = _tan_norm(root_rot)
    lvel = _hz_rot(s, w, vel[0])
    lang = _hz_rot(s, w, ang[0])

    amp = []
    if e["root_height_obs"]:
        amp.append(root_pos[2])
    amp += rr_obs + lvel + lang
    for j in range(Jm1):       # dof tan-norm == tan_norm(jrot) (module doc)
        amp += _tan_norm(jrot[j])
    for j in range(Jm1):       # dof_vel = local joint omega
        amp += jom[j]
    key_local = []
    key_lvel = []
    for b in e["key_ids"]:
        key_local += _hz_rot(s, w, _v_sub(pos[b], root_pos))
        if e["amp_v"] == 2:
            key_lvel += _hz_rot(s, w, vel[b])
    amp += key_local + key_lvel

    return [reward, r_pos, r_rot, r_vel, r_ang, dmean, dmax] + amp


def _ra_out_dim(e):
    n_amp = amp_obs_dim(
        e["J"], len(e["key_ids"]), e["amp_v"], e["root_height_obs"]
    )
    return 1 + 4 + 2 + n_amp  # reward | raw4 | dist_mean,dist_max | amp


def _read_ref_block(rd, rref_base, rref, J):
    def rdr(name, width, b, k):
        return rd(rref_base + rref[name] + width * b + k)

    rpos = [[rdr("pos", 3, b, k) for k in range(3)] for b in range(J)]
    rrot = [[rdr("rot", 4, b, k) for k in range(4)] for b in range(J)]
    rvel = [[rdr("vel", 3, b, k) for k in range(3)] for b in range(J)]
    rang = [[rdr("ang", 3, b, k) for k in range(3)] for b in range(J)]
    return rpos, rrot, rvel, rang


def _build_reward_amp_kernel(e):
    J = e["J"]
    Jm1 = J - 1
    rbody, nb = _body_rows(J)
    # input: stepped body state | joint_rot | joint_omega | ref body state
    r_jrot = nb
    r_jom = r_jrot + 4 * Jm1
    rref_base = r_jom + 3 * Jm1
    rref, nref = _body_rows(J)
    n_in = rref_base + nref
    n_out = _ra_out_dim(e)

    def kernel(in_ref, out_ref):
        def rd(r):
            return in_ref[0, r]

        pos, rot, vel, ang = _read_bodies(rd, rbody, J)
        jrot = [[rd(r_jrot + 4 * j + k) for k in range(4)] for j in range(Jm1)]
        jom = [[rd(r_jom + 3 * j + k) for k in range(3)] for j in range(Jm1)]
        rpos, rrot, rvel, rang = _read_ref_block(rd, rref_base, rref, J)
        out = _reward_amp_tiles(
            e, pos, rot, vel, ang, jrot, jom, rpos, rrot, rvel, rang
        )
        for r, val in enumerate(out):
            out_ref[0, r] = val

    return kernel, n_in, n_out


def pallas_reward_amp(
    env_consts: dict,
    physics,
    ref: dict,
    *,
    interpret: bool = False,
):
    """Batched reward/termination/AMP stage on the stepped (pre-merge) state.

    physics: PhysicsState with [B, ...] leaves (the physics kernel output).
    ref: get_motion_state dict at the post-step motion time, [B, J, ...].
    Returns (reward [B], reward_raw [B,4], dist_mean [B], dist_max [B],
    amp_obs [B, A])."""
    e = env_consts
    J = e["J"]
    B = physics.root_pos.shape[0]
    kernel, n_in, n_out = _build_reward_amp_kernel(e)

    rows_in = jnp.concatenate(
        [
            physics.body_pos.reshape(B, 3 * J),
            physics.body_rot.reshape(B, 4 * J),
            physics.body_vel.reshape(B, 3 * J),
            physics.body_ang_vel.reshape(B, 3 * J),
            physics.joint_rot.reshape(B, 4 * (J - 1)),
            physics.joint_omega.reshape(B, 3 * (J - 1)),
            ref["rg_pos"].reshape(B, 3 * J),
            ref["rb_rot"].reshape(B, 4 * J),
            ref["body_vel"].reshape(B, 3 * J),
            ref["body_ang_vel"].reshape(B, 3 * J),
        ],
        axis=1,
    ).astype(jnp.float32)
    rows_out = _call(kernel, rows_in, n_in, n_out, interpret)
    reward = rows_out[:, 0]
    raw = rows_out[:, 1:5]
    dmean = rows_out[:, 5]
    dmax = rows_out[:, 6]
    amp = rows_out[:, 7:]
    return reward, raw, dmean, dmax, amp


# --------------------------------------------------------------------------- #
# kernel S: physics substeps + reward/termination/AMP in ONE launch
# --------------------------------------------------------------------------- #

def _build_step_reward_amp_kernel(model_consts, e):
    """Fuse the reward/AMP stage into the physics mega-kernel via its
    `extra` hook: the ref body state rides in as extra input rows and the
    reward/raw/dist/amp tiles ride out after the physics outputs, computed
    while the stepped body state is still in VMEM."""
    from pulse_tpu.physics import substep_pallas as sp

    J = e["J"]
    rref, nref = _body_rows(J)

    def extra_fn(rd_extra, pos, rot, vel, ang, jrot, omega):
        rpos, rrot, rvel, rang = _read_ref_block(rd_extra, 0, rref, J)
        return _reward_amp_tiles(
            e, pos, rot, vel, ang, jrot, omega, rpos, rrot, rvel, rang
        )

    return sp._build_kernel(
        model_consts, extra=(nref, _ra_out_dim(e), extra_fn)
    )


def pallas_step_reward_amp(
    model,
    env_consts: dict,
    state,
    pd_target: jax.Array,
    ref: dict,
    *,
    interpret: bool = False,
):
    """One launch for the whole pre-merge env step: physics substeps, final
    FK, imitation reward, termination distances, and the AMP obs row —
    equivalent to pallas_physics_step followed by pallas_reward_amp, minus
    the custom-call boundary between them (the repack of the stepped body
    state was part of the ~0.35 ms/step of boundary copies in the round-3
    profile at 3072 envs). The ref motion state at the post-step time
    depends only on (motion_id, progress), so the caller gathers it BEFORE
    physics and it enters as kernel input rows.

    Returns (PhysicsState, reward [B], reward_raw [B,4], dist_mean [B],
    dist_max [B], amp_obs [B, A])."""
    from pulse_tpu.physics import substep_pallas as sp

    e = env_consts
    J = model.num_bodies
    Jm1 = J - 1
    B = state.root_pos.shape[0]
    if B % ENVS_PER_BLOCK != 0:
        raise ValueError(f"num_envs must be a multiple of {ENVS_PER_BLOCK}")
    c = sp._extract_consts(model)
    kernel, n_in, n_out = _build_step_reward_amp_kernel(c, e)

    rows_in = jnp.concatenate(
        [
            state.root_pos,
            state.root_rot,
            state.joint_rot.reshape(B, 4 * Jm1),
            state.root_vel6,
            state.joint_omega.reshape(B, 3 * Jm1),
            pd_target.reshape(B, 3 * Jm1),
            ref["rg_pos"].reshape(B, 3 * J),
            ref["rb_rot"].reshape(B, 4 * J),
            ref["body_vel"].reshape(B, 3 * J),
            ref["body_ang_vel"].reshape(B, 3 * J),
        ],
        axis=1,
    ).astype(jnp.float32)
    x = _pack(rows_in)
    NB = x.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, n_in, 8, 128), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, n_out, 8, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, n_out, 8, 128), jnp.float32),
        interpret=interpret,
    )(x)
    rows_out = _unpack(out)

    _, n_state = sp._row_layout(J)
    n_phys = n_state + 3 * J + 13 * J
    physics = sp.physics_state_from_rows(rows_out, J)
    ra = rows_out[:, n_phys:]
    return physics, ra[:, 0], ra[:, 1:5], ra[:, 5], ra[:, 6], ra[:, 7:]


def pallas_step_reward_amp_padded(
    model, env_consts, state, pd_target, ref, *, interpret=False
):
    """pallas_step_reward_amp for any batch size (pads to a tile multiple,
    mirroring pallas_physics_step_padded) — the per-shard body under DP."""
    B = state.root_pos.shape[0]
    Bp = ((B + ENVS_PER_BLOCK - 1) // ENVS_PER_BLOCK) * ENVS_PER_BLOCK
    if Bp == B:
        return pallas_step_reward_amp(
            model, env_consts, state, pd_target, ref, interpret=interpret
        )
    out = pallas_step_reward_amp(
        model,
        env_consts,
        _pad_batch(state, B, Bp),
        _pad_batch(pd_target, B, Bp),
        _pad_batch(ref, B, Bp),
        interpret=interpret,
    )
    return jax.tree.map(lambda x: x[:B], out)


def sharded_pallas_step_reward_amp(
    model, env_consts, mesh, state, pd_target, ref, *, interpret=False
):
    """shard_map wrapper: each device runs the fused step+reward kernel on
    its padded env shard (no collectives — see sharded_pallas_physics_step)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        functools.partial(
            pallas_step_reward_amp_padded, model, env_consts,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(state, pd_target, ref)


# --------------------------------------------------------------------------- #
# kernel O: self obs v1 + imitation task obs v6 (post-merge state)
# --------------------------------------------------------------------------- #

def _build_obs_kernel(e):
    J = e["J"]
    rbody, nb = _body_rows(J)
    rref, nref = _body_rows(J)
    rref_base = nb
    n_in = nb + nref
    n_self = (1 if e["root_height_obs"] else 0) + 3 * (J - 1) + 6 * J + 3 * J + 3 * J
    n_task = 24 * J
    n_out = n_self + n_task

    def kernel(in_ref, out_ref):
        def rd(r):
            return in_ref[0, r]

        pos, rot, vel, ang = _read_bodies(rd, rbody, J)

        def rdr(name, width, b, k):
            return rd(rref_base + rref[name] + width * b + k)

        rpos = [[rdr("pos", 3, b, k) for k in range(3)] for b in range(J)]
        rrot = [[rdr("rot", 4, b, k) for k in range(4)] for b in range(J)]
        rvel = [[rdr("vel", 3, b, k) for k in range(3)] for b in range(J)]
        rang = [[rdr("ang", 3, b, k) for k in range(3)] for b in range(J)]

        root_pos, root_rot = pos[0], rot[0]
        s, w = _heading_inv_sz(root_rot)

        # --- self obs (compute_humanoid_self_obs_max) -------------------- #
        self_parts = []
        if e["root_height_obs"]:
            self_parts.append(root_pos[2])
        for b in range(1, J):      # local body pos, root entry dropped
            self_parts += _hz_rot(s, w, _v_sub(pos[b], root_pos))
        for b in range(J):         # local body rot tan-norm
            if b == 0 and not e["local_root_obs"]:
                self_parts += _tan_norm(root_rot)
            else:
                self_parts += _tan_norm(_hz_mul(s, w, rot[b]))
        for b in range(J):
            self_parts += _hz_rot(s, w, vel[b])
        for b in range(J):
            self_parts += _hz_rot(s, w, ang[b])

        # --- task obs v6, T=1 (compute_imitation_observations_v6) -------- #
        # category-major like the XLA kernel's concat: diff_local_pos,
        # tan_norm(diff_local_rot), diff_local_vel, diff_local_ang_vel,
        # local_ref_pos, local_ref_rot
        task = [[], [], [], [], [], []]
        for b in range(J):
            task[0] += _hz_rot(s, w, _v_sub(rpos[b], pos[b]))
            diff_rot = _qmul(rrot[b], _qconj(rot[b]))
            # heading_inv * diff * heading: right-multiply by the (s,w)
            # conjugate = z-rotation by +h, i.e. [0,0,-s,w]
            dl = _hz_mul(s, w, diff_rot)
            hq = [dl[0] * 0.0, dl[0] * 0.0, -s, w]
            task[1] += _tan_norm(_qmul(dl, hq))
            task[2] += _hz_rot(s, w, _v_sub(rvel[b], vel[b]))
            task[3] += _hz_rot(s, w, _v_sub(rang[b], ang[b]))
            task[4] += _hz_rot(s, w, _v_sub(rpos[b], root_pos))
            task[5] += _tan_norm(_hz_mul(s, w, rrot[b]))

        out = self_parts
        for part in task:
            out += part
        for r, val in enumerate(out):
            out_ref[0, r] = val

    return kernel, n_in, n_out


def pallas_observe(
    env_consts: dict,
    physics,
    ref: dict,
    *,
    interpret: bool = False,
):
    """Batched observation stage on the post-merge state: [B, obs_dim]
    (self obs v1 ++ task obs v6 with T=1)."""
    e = env_consts
    J = e["J"]
    B = physics.root_pos.shape[0]
    kernel, n_in, n_out = _build_obs_kernel(e)
    rows_in = jnp.concatenate(
        [
            physics.body_pos.reshape(B, 3 * J),
            physics.body_rot.reshape(B, 4 * J),
            physics.body_vel.reshape(B, 3 * J),
            physics.body_ang_vel.reshape(B, 3 * J),
            ref["rg_pos"].reshape(B, 3 * J),
            ref["rb_rot"].reshape(B, 4 * J),
            ref["body_vel"].reshape(B, 3 * J),
            ref["body_ang_vel"].reshape(B, 3 * J),
        ],
        axis=1,
    ).astype(jnp.float32)
    return _call(kernel, rows_in, n_in, n_out, interpret)


# --------------------------------------------------------------------------- #
# shared pallas_call plumbing (pack rows -> tiles -> kernel -> rows)
# --------------------------------------------------------------------------- #

def _call(kernel, rows_in, n_in, n_out, interpret):
    B = rows_in.shape[0]
    if B % ENVS_PER_BLOCK != 0:
        raise ValueError(f"batch must be a multiple of {ENVS_PER_BLOCK}")
    x = _pack(rows_in)
    NB = x.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, n_in, 8, 128), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, n_out, 8, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, n_out, 8, 128), jnp.float32),
        interpret=interpret,
    )(x)
    return _unpack(out)


def _pad_batch(tree, B, Bp):
    def pad(x):
        reps = jnp.broadcast_to(x[:1], (Bp - B,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    return jax.tree.map(pad, tree)


def pallas_reward_amp_padded(env_consts, physics, ref, *, interpret=False):
    """pallas_reward_amp for any batch size (pads to a tile multiple,
    mirroring substep_pallas.pallas_physics_step_padded)."""
    B = physics.root_pos.shape[0]
    Bp = ((B + ENVS_PER_BLOCK - 1) // ENVS_PER_BLOCK) * ENVS_PER_BLOCK
    if Bp == B:
        return pallas_reward_amp(env_consts, physics, ref, interpret=interpret)
    out = pallas_reward_amp(
        env_consts,
        _pad_batch(physics, B, Bp),
        _pad_batch(ref, B, Bp),
        interpret=interpret,
    )
    return jax.tree.map(lambda x: x[:B], out)


def pallas_observe_padded(env_consts, physics, ref, *, interpret=False):
    B = physics.root_pos.shape[0]
    Bp = ((B + ENVS_PER_BLOCK - 1) // ENVS_PER_BLOCK) * ENVS_PER_BLOCK
    if Bp == B:
        return pallas_observe(env_consts, physics, ref, interpret=interpret)
    out = pallas_observe(
        env_consts,
        _pad_batch(physics, B, Bp),
        _pad_batch(ref, B, Bp),
        interpret=interpret,
    )
    return out[:B]


def _sharded(fn, mesh, axis_name="data"):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        # per-shard body, no collectives (see sharded_pallas_physics_step)
        check_vma=False,
    )


def sharded_pallas_reward_amp(env_consts, mesh, physics, ref, *, interpret=False):
    """shard_map wrapper: each device runs the kernel on its padded env
    shard — composes the reward/AMP stage with the DP mesh."""
    fn = _sharded(
        functools.partial(pallas_reward_amp_padded, env_consts, interpret=interpret),
        mesh,
    )
    return fn(physics, ref)


def sharded_pallas_observe(env_consts, mesh, physics, ref, *, interpret=False):
    fn = _sharded(
        functools.partial(pallas_observe_padded, env_consts, interpret=interpret),
        mesh,
    )
    return fn(physics, ref)


def env_consts_from(env) -> dict:
    """Bake the per-env constants both kernels need from a HumanoidImEnv."""
    cfg = env.config
    return dict(
        J=env.model.num_bodies,
        key_ids=[int(b) for b in np.asarray(env.key_body_ids)],
        reset_ids=[int(b) for b in np.asarray(env.reset_body_ids)],
        local_root_obs=bool(cfg.local_root_obs),
        root_height_obs=bool(cfg.root_height_obs),
        amp_v=int(cfg.amp_obs_v),
        k_pos=float(cfg.k_pos),
        k_rot=float(cfg.k_rot),
        k_vel=float(cfg.k_vel),
        k_ang_vel=float(cfg.k_ang_vel),
        w_pos=float(cfg.w_pos),
        w_rot=float(cfg.w_rot),
        w_vel=float(cfg.w_vel),
        w_ang_vel=float(cfg.w_ang_vel),
    )
