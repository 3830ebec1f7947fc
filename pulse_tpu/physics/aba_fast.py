"""Level-parallel articulated-body dynamics — the production hot path.

Numerically identical to pulse_tpu.physics.dynamics.aba (golden-tested
against it) but restructured for the TPU: instead of 24 sequential per-body
steps per pass, bodies are processed **by tree depth** (9 levels for the
SMPL humanoid), with every level a batched gather -> [L, ...] math ->
static-slice scatter. This cuts the XLA dependency chain ~3x and turns tiny
per-body ops into wider batched ops, which matters because the vmapped step
at thousands of envs is op-latency-bound, not FLOP-bound.

Sibling accumulation into shared parents (pass 2) uses segment_sum with
static ids.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.physics import spatial as sp
from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import PhysicsState


def aba_fast(
    model: Model,
    state: PhysicsState,
    joint_tau: jax.Array,
    f_ext_world: jax.Array,
    body_rot_world: jax.Array,
    h: float,
    d_extra: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Same contract as dynamics.aba (root accel [6], joint qdd [J-1, 3])."""
    J = model.num_bodies
    cfg = model.config
    g = jnp.asarray([0.0, 0.0, cfg.gravity])
    levels = model.levels

    # per-joint frame data, indexed by body (root row unused)
    q_pc = jnp.concatenate([q.quat_identity((1,)), state.joint_rot], axis=0)  # [J,4]
    r_off = model.local_translation                                           # [J,3]
    omega = jnp.concatenate([jnp.zeros((1, 3)), state.joint_omega], axis=0)   # [J,3]

    # ---- pass 1: velocities & bias (root -> leaves, by level) ------------- #
    v = jnp.zeros((J, 6)).at[0].set(state.root_vel6)
    for body_ids, parent_ids in levels[1:]:
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        vp = v[p]                                            # [L, 6]
        vJ = jnp.concatenate([omega[b], jnp.zeros((len(b), 3))], axis=-1)
        vi = sp.motion_to_child(q_pc[b], r_off[b], vp) + vJ
        v = v.at[b].set(vi)
    vJ_all = jnp.concatenate([omega, jnp.zeros((J, 3))], axis=-1)
    c_bias = sp.cross_motion(v, vJ_all)                      # [J, 6] (root row = 0)

    # ---- external + velocity-product bias forces (fully batched) ---------- #
    f_grav_w = model.body_mass[:, None] * g                  # [J, 3]
    com_w = q.quat_rotate(body_rot_world, model.body_com)
    n_w = f_ext_world[:, 0:3] + jnp.cross(com_w, f_grav_w)
    f_w = f_ext_world[:, 3:6] + f_grav_w
    f_body = sp.make(
        q.quat_rotate_inverse(body_rot_world, n_w),
        q.quat_rotate_inverse(body_rot_world, f_w),
    )
    Iv = sp.mul_inertia(model.spatial_inertia, v)
    pA = sp.cross_force(v, Iv) - f_body                      # [J, 6]
    IA = model.spatial_inertia                               # [J, 6, 6]

    # ---- pass 2: articulated inertia (leaves -> root, by level) ----------- #
    U_all = jnp.zeros((J, 6, 3))
    Dinv_all = jnp.zeros((J, 3, 3))
    u_all = jnp.zeros((J, 3))
    eye3 = jnp.eye(3)
    for body_ids, parent_ids in reversed(levels[1:]):
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        IA_b = IA[b]                                         # [L, 6, 6]
        U = IA_b[:, :, 0:3]                                  # [L, 6, 3]
        diag = model.joint_armature[b - 1][:, None, None] * eye3
        if d_extra is not None:
            diag = diag + jax.vmap(jnp.diag)(d_extra[b - 1])
        D = IA_b[:, 0:3, 0:3] + diag
        Dinv = sp.inv3(D)
        u = joint_tau[b - 1] - pA[b][:, 0:3]
        Ia = IA_b - U @ Dinv @ jnp.swapaxes(U, -1, -2)
        pa = (
            pA[b]
            + sp.mul_inertia(Ia, c_bias[b])
            + jnp.einsum("lij,lj->li", U, jnp.einsum("lij,lj->li", Dinv, u))
        )
        Ia_p = sp.inertia_to_parent(q_pc[b], r_off[b], Ia)
        pa_p = sp.force_to_parent(q_pc[b], r_off[b], pa)
        # siblings can share a parent -> segment-sum on static ids
        IA = IA + jax.ops.segment_sum(Ia_p, jnp.asarray(p), num_segments=J)
        pA = pA + jax.ops.segment_sum(pa_p, jnp.asarray(p), num_segments=J)
        U_all = U_all.at[b].set(U)
        Dinv_all = Dinv_all.at[b].set(Dinv)
        u_all = u_all.at[b].set(u)

    # ---- pass 3: accelerations (root -> leaves, by level) ----------------- #
    a = jnp.zeros((J, 6)).at[0].set(-sp.solve6_sym(IA[0], pA[0]))
    qdd = jnp.zeros((J, 3))
    for body_ids, parent_ids in levels[1:]:
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        a_p = sp.motion_to_child(q_pc[b], r_off[b], a[p]) + c_bias[b]
        qdd_b = jnp.einsum("lij,lj->li", Dinv_all[b], u_all[b]) - jnp.einsum(
            "lij,lj->li", Dinv_all[b], jnp.einsum("lji,lj->li", U_all[b], a_p)
        )
        a_b = a_p + jnp.concatenate([qdd_b, jnp.zeros((len(b), 3))], axis=-1)
        a = a.at[b].set(a_b)
        qdd = qdd.at[b].set(qdd_b)

    return a[0], qdd[1:]
