"""Pallas mega-kernel physics step: all substeps of one control period in a
single TPU kernel.

Why: the XLA-fused step at 3-4k envs is launch/copy-bound, not FLOP-bound —
profiling shows ~2200 kernel launches and ~28% of device time in pure copies
per control step (tools/profile_step.py). This kernel holds the whole
pipeline — FK, contacts, stable-PD torques, the three ABA passes, and
semi-implicit integration, times `steps_per_control` substeps, plus the
final kinematics refresh — in VMEM with zero HBM roundtrips in between.

Layout: a block is 1024 environments viewed as an (8 sublanes, 128 lanes)
tile; every per-env scalar is one [8, 128] f32 tile that fully occupies the
VPU. Per-body / per-contact quantities are python lists of tiles; the 24-body
topology, the spatial-inertia constants, and the contact-point table are
baked into the trace as python/numpy constants (the kernel is specialized to
one physics model — exactly like the XLA path, which also treats the model
as trace constants). The tree passes unroll per body: no gathers, no
scatters, no dynamic control flow anywhere.

Numerics mirror substep_fused.fused_substep op-for-op (golden-tested in
tests/test_pallas_substep.py); differences are float-add ordering in the
sibling accumulation (sequential adds instead of segment_sum).

Scope: plane contacts + stable-PD only (the training hot path). Terrain,
self-collision, per-env shape variation, and the explicit control modes fall
back to the XLA path (physics/step.py) — see env/humanoid_im.py wiring.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import PhysicsState

_MIN_THETA = 1e-5
_EPS = 1e-9
ENVS_PER_BLOCK = 1024  # 8 sublanes x 128 lanes


# --------------------------------------------------------------------------- #
# tile-math helpers: quantities are python lists of [8, 128] tiles (or python
# floats for constants — the helpers are generic over both)
# --------------------------------------------------------------------------- #

def _v_add(a, b):
    return [x + y for x, y in zip(a, b)]


def _v_sub(a, b):
    return [x - y for x, y in zip(a, b)]


def _v_scale(a, s):
    return [x * s for x in a]


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return [
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by + ay * bw + az * bx - ax * bz,
        aw * bz + az * bw + ax * by - ay * bx,
        aw * bw - ax * bx - ay * by - az * bz,
    ]


def _qunit(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    inv = 1.0 / jnp.maximum(n, _EPS)
    return [c * inv for c in q]


def _qconj(q):
    return [-q[0], -q[1], -q[2], q[3]]


def _qrot(q, v):
    """quat_rotate (ops/quat.py:76-87), expanded per component."""
    qv = q[:3]
    w = q[3]
    s = 2.0 * w * w - 1.0
    d = 2.0 * _dot3(qv, v)
    c = _cross(qv, v)
    return [
        v[0] * s + c[0] * (2.0 * w) + qv[0] * d,
        v[1] * s + c[1] * (2.0 * w) + qv[1] * d,
        v[2] * s + c[2] * (2.0 * w) + qv[2] * d,
    ]


def _qrot_inv(q, v):
    return _qrot(_qconj(q), v)


def _normalize_angle(t):
    return t - (2 * np.pi) * jnp.floor((t + np.pi) / (2 * np.pi))


def _expmap_to_quat(v):
    """ops/quat.py:140-153 semantics."""
    nsq = _dot3(v, v)
    mask = nsq > _MIN_THETA * _MIN_THETA
    angle = jnp.sqrt(jnp.where(mask, nsq, 1.0))
    inv = 1.0 / angle
    ax = [c * inv for c in v]
    angle = jnp.where(mask, _normalize_angle(angle), 0.0)
    ax = [
        jnp.where(mask, ax[0], 0.0),
        jnp.where(mask, ax[1], 0.0),
        jnp.where(mask, ax[2], 1.0),
    ]
    half = 0.5 * angle
    s = jnp.sin(half)
    return [ax[0] * s, ax[1] * s, ax[2] * s, jnp.cos(half)]


# atan(t)/t on [0,1] as an even polynomial in t (Chebyshev fit, deg 8 in
# t^2): neither acos (round-1 bench crash) nor atan2 has a Pallas TPU
# lowering, so acos is built from sqrt + this polynomial. Max error of the
# resulting acos over [-1, 1): 2.8e-8 — far below the 2e-4 golden tolerance.
_ATAN_COEFS = (
    0.9999999937528701,
    -0.33333137965746484,
    0.19993694134082154,
    -0.14211104507050326,
    0.1066748045234647,
    -0.07556885542373859,
    0.04327805716492581,
    -0.016413069596241673,
    0.0029327298936597215,
)


def _acos(w, sin_half):
    """acos(w) given sin_half = sqrt(1 - w^2) >= 0, via the half-angle
    identity acos(w) = 2*atan(s / (1 + w)) and argument reduction
    atan(u) = pi/2 - atan(1/u) for u > 1."""
    u = sin_half / jnp.maximum(1.0 + w, 1e-12)
    big = u > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(u, 1e-12), u)
    t2 = t * t
    r = jnp.full_like(t, _ATAN_COEFS[-1])
    for c in _ATAN_COEFS[-2::-1]:
        r = r * t2 + c
    a = r * t
    a = jnp.where(big, (np.pi / 2) - a, a)
    return 2.0 * a


def _quat_to_expmap(q):
    """ops/quat.py:111-137 semantics."""
    w = jnp.clip(q[3], -1.0, 1.0)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    angle = _normalize_angle(2.0 * _acos(w, sin_half))
    mask = sin_half > _MIN_THETA
    inv = 1.0 / jnp.where(mask, sin_half, 1.0)
    angle = jnp.where(mask, angle, 0.0)
    ax = [
        jnp.where(mask, q[0] * inv, 0.0),
        jnp.where(mask, q[1] * inv, 0.0),
        jnp.where(mask, q[2] * inv, 1.0),
    ]
    return [angle * ax[0], angle * ax[1], angle * ax[2]]


def _quat_to_matrix_conj(q):
    """Rotation matrix of conjugate(q) — the child-from-parent matrix E_t
    used by the inertia congruence (spatial.py:73-80)."""
    x, y, z, w = -q[0], -q[1], -q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]


# 3x3 matrices: nested lists (entries are tiles or floats)

def _m3_mul(a, b):
    return [
        [sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def _m3_vec(a, v):
    return [sum(a[i][k] * v[k] for k in range(3)) for i in range(3)]


def _m3_T(a):
    return [[a[j][i] for j in range(3)] for i in range(3)]


def _m3_add(a, b):
    return [[a[i][j] + b[i][j] for j in range(3)] for i in range(3)]


def _m3_sub(a, b):
    return [[a[i][j] - b[i][j] for j in range(3)] for i in range(3)]


def _inv3(m):
    """Adjugate-formula inverse (spatial.py:inv3)."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I_ = a * e - b * d
    det = a * A + b * D + c * G
    s = 1.0 / det
    return [[A * s, B * s, C * s], [D * s, E * s, F * s], [G * s, H * s, I_ * s]]


def _skew(r):
    """Skew matrix as nested lists — generic over float and tile entries."""
    return [
        [0.0, -r[2], r[1]],
        [r[2], 0.0, -r[0]],
        [-r[1], r[0], 0.0],
    ]


def _cross_motion(a, b):
    """(wa x wb, wa x vb + va x wb) — spatial.py:cross_motion."""
    wa, va = a[:3], a[3:]
    wb, vb = b[:3], b[3:]
    return _cross(wa, wb) + _v_add(_cross(wa, vb), _cross(va, wb))


def _cross_force(a, f):
    """(wa x n + va x fl, wa x fl) — spatial.py:cross_force."""
    wa, va = a[:3], a[3:]
    n, fl = f[:3], f[3:]
    return _v_add(_cross(wa, n), _cross(va, fl)) + _cross(wa, fl)


def _motion_to_child(q_pc, r, v6):
    wp, vp = v6[:3], v6[3:]
    wc = _qrot_inv(q_pc, wp)
    vc = _qrot_inv(q_pc, _v_add(vp, _cross(wp, r)))
    return wc + vc


def _force_to_parent(q_pc, r, f6):
    nc, fc = f6[:3], f6[3:]
    fp = _qrot(q_pc, fc)
    npar = _v_add(_qrot(q_pc, nc), _cross(r, fp))
    return npar + fp


def _mul_inertia_blocks(A, B, C, v6):
    """[[A,B],[B^T,C]] @ (w, v)."""
    w, v = v6[:3], v6[3:]
    top = _v_add(_m3_vec(A, w), _m3_vec(B, v))
    bot = _v_add(_m3_vec(_m3_T(B), w), _m3_vec(C, v))
    return top + bot


def _solve6_sym_blocks(A, B, C, rhs):
    """Schur-complement solve (spatial.py:solve6_sym) on (A, B, C) blocks."""
    r0, r1 = rhs[:3], rhs[3:]
    Ainv = _inv3(A)
    BtAinv = _m3_mul(_m3_T(B), Ainv)
    S = _m3_sub(C, _m3_mul(BtAinv, B))
    Sinv = _inv3(S)
    y = _v_sub(r1, _m3_vec(BtAinv, r0))
    x1 = _m3_vec(Sinv, y)
    x0 = _m3_vec(Ainv, _v_sub(r0, _m3_vec(B, x1)))
    return x0 + x1


def _inertia_to_parent_blocks(q_pc, r, A, B, C):
    """Congruence M^T I M with M = [[E, 0], [-E rx, E]] (spatial.py:
    motion_matrix_to_child/inertia_to_parent), in 3x3 blocks:
      X1 = E^T A + S^T B^T,  X2 = E^T B + S^T C
      A' = X1 E + X2 S,  B' = X2 E,  C' = E^T C E
    with E = child-from-parent rotation and S = -E rx."""
    E = _quat_to_matrix_conj(q_pc)
    rx = _skew(r)
    # S = -E @ rx (rx a constant or per-env tile vector)
    S = [
        [-(sum(E[i][k] * rx[k][j] for k in range(3))) for j in range(3)]
        for i in range(3)
    ]
    Et = _m3_T(E)
    St = _m3_T(S)
    X1 = _m3_add(_m3_mul(Et, A), _m3_mul(St, _m3_T(B)))
    X2 = _m3_add(_m3_mul(Et, B), _m3_mul(St, C))
    newA = _m3_add(_m3_mul(X1, E), _m3_mul(X2, S))
    newB = _m3_mul(X2, E)
    newC = _m3_mul(_m3_mul(Et, C), E)
    return newA, newB, newC


# --------------------------------------------------------------------------- #
# the kernel
# --------------------------------------------------------------------------- #

# input row layout
def _row_layout(J):
    Jm1 = J - 1
    n = 0
    rows = {}
    for name, k in [
        ("root_pos", 3),
        ("root_rot", 4),
        ("joint_rot", 4 * Jm1),
        ("root_vel6", 6),
        ("joint_omega", 3 * Jm1),
    ]:
        rows[name] = (n, n + k)
        n += k
    return rows, n


def _extract_consts(model: Model):
    """Pull all model data as nested python lists of floats (trace-time
    constants). Per-body entries use the same nested-list shapes the batched
    path fills with tiles (_model_tiles), so the kernel body is generic over
    shared-vs-per-env models."""
    cfg = model.config
    J = model.num_bodies

    def _leaf(x):
        """Drop a leading env axis if the caller handed a batched leaf (the
        constant path only needs the shared values; per-env leaves go
        through the model-rows input instead)."""
        return np.asarray(x)

    I6 = _leaf(model.spatial_inertia)
    lt = _leaf(model.local_translation)
    com = _leaf(model.body_com)
    cp_off = _leaf(model.cp_offset)
    dof_lo = _leaf(model.dof_lower).reshape(J - 1, 3)
    dof_hi = _leaf(model.dof_upper).reshape(J - 1, 3)
    return dict(
        J=J,
        levels=[([int(b) for b in bs], [int(p) for p in ps]) for bs, ps in model.levels],
        lt=[[float(x) for x in lt[b]] for b in range(J)],
        mass=[float(x) for x in _leaf(model.body_mass)],
        com=[[float(x) for x in com[b]] for b in range(J)],
        Iblocks=[
            (
                [[float(I6[i, r, k]) for k in range(3)] for r in range(3)],
                [[float(I6[i, r, 3 + k]) for k in range(3)] for r in range(3)],
                [[float(I6[i, 3 + r, 3 + k]) for k in range(3)] for r in range(3)],
            )
            for i in range(J)
        ],
        kp=[float(x) for x in _leaf(model.joint_kp)],
        kd=[float(x) for x in _leaf(model.joint_kd)],
        armature=[float(x) for x in _leaf(model.joint_armature)],
        dof_lower=[[float(x) for x in dof_lo[j]] for j in range(J - 1)],
        dof_upper=[[float(x) for x in dof_hi[j]] for j in range(J - 1)],
        cp_body=[int(b) for b in np.asarray(model.cp_body_static or model.cp_body)],
        cp_offset=[[float(x) for x in cp_off[i]] for i in range(cp_off.shape[0])],
        cp_radius=[float(x) for x in _leaf(model.cp_radius)],
        cp_friction=[float(x) for x in _leaf(model.cp_friction)],
        h=float(cfg.h),
        n_sub=int(cfg.steps_per_control),
        gravity=float(cfg.gravity),
        ks=float(cfg.contact_stiffness),
        kc=float(cfg.contact_damping),
        freg=float(cfg.friction_regularization),
        fmax=float(cfg.max_contact_force),
        wmax=float(cfg.max_angular_velocity),
        vmax=float(cfg.max_linear_velocity),
        lstiff=float(cfg.limit_stiffness),
        ldamp=float(cfg.limit_damping),
        taumax=float(cfg.torque_limit),
    )


def _substep_tiles(c, root_pos, root_rot, jrot, v6_root, omega, target_rot):
    """One 120 Hz substep on tile state. Mirrors substep_fused.fused_substep.
    Returns (root_pos', root_rot', jrot', v6_root', omega', contact[J] vec3,
    fk) where fk = (pos, rot, v) world/body quantities of the PRE-step state.
    """
    J = c["J"]
    h = c["h"]
    lt = c["lt"]

    # ---- FK + pass-1 velocities ---------------------------------------- #
    pos = [None] * J
    rot = [None] * J
    v = [None] * J
    pos[0], rot[0], v[0] = root_pos, root_rot, v6_root
    for body_ids, parent_ids in c["levels"][1:]:
        for b, p in zip(body_ids, parent_ids):
            q_pc = jrot[b - 1]
            rot[b] = _qunit(_qmul(rot[p], q_pc))
            pos[b] = _v_add(pos[p], _qrot(rot[p], list(lt[b])))
            vJ = omega[b - 1] + [0.0, 0.0, 0.0]
            v[b] = _v_add(_motion_to_child(q_pc, list(lt[b]), v[p]), vJ)
    c_bias = [None] * J
    c_bias[0] = [jnp.zeros_like(root_pos[0])] * 6
    for b in range(1, J):
        c_bias[b] = _cross_motion(v[b], omega[b - 1] + [0.0, 0.0, 0.0])

    w_world = [_qrot(rot[b], v[b][:3]) for b in range(J)]
    vl_world = [_qrot(rot[b], v[b][3:]) for b in range(J)]

    # ---- plane contacts -------------------------------------------------- #
    zero = jnp.zeros_like(root_pos[0])
    f_ext = [[zero] * 6 for _ in range(J)]
    net_contact = [[zero] * 3 for _ in range(J)]
    for i, bi in enumerate(c["cp_body"]):
        off = list(c["cp_offset"][i])
        arm = _qrot(rot[bi], off)
        p_w_z = pos[bi][2] + arm[2]
        depth = c["cp_radius"][i] - p_w_z
        in_contact = depth > 0.0
        vp = _v_add(vl_world[bi], _cross(w_world[bi], arm))
        vn = vp[2]
        fn = jnp.where(
            in_contact, jnp.maximum(c["ks"] * depth - c["kc"] * vn, 0.0), 0.0
        )
        fn = jnp.minimum(fn, c["fmax"])
        vt = [vp[0], vp[1], zero]
        vt_norm = jnp.sqrt(vp[0] * vp[0] + vp[1] * vp[1] + 1e-12)
        scale = jnp.minimum(vt_norm / c["freg"], 1.0)
        coef = -(c["cp_friction"][i] * fn * scale) / vt_norm
        f_w = [coef * vp[0], coef * vp[1], fn]
        n_w = _cross(arm, f_w)
        f_ext[bi] = _v_add(f_ext[bi], n_w + f_w)
        net_contact[bi] = _v_add(net_contact[bi], f_w)

    # ---- stable-PD torques (dynamics.spd_joint_torques) ------------------- #
    tau = [None] * (J - 1)
    d_extra = [None] * (J - 1)
    for j in range(J - 1):
        err = _quat_to_expmap(_qunit(_qmul(_qconj(jrot[j]), target_rot[j])))
        kp = c["kp"][j]
        kd = c["kd"][j]
        t = [
            kp * err[k] - (kp * h + kd) * omega[j][k] for k in range(3)
        ]
        dof = _quat_to_expmap(jrot[j])
        lim = []
        dex = []
        for k in range(3):
            excess = jnp.maximum(dof[k] - c["dof_upper"][j][k], 0.0) + jnp.minimum(
                dof[k] - c["dof_lower"][j][k], 0.0
            )
            active = excess != 0.0
            lt_k = -c["lstiff"] * excess - jnp.where(
                active, c["ldamp"] * omega[j][k], 0.0
            )
            lim.append(lt_k)
            dex.append(
                h * kd
                + jnp.where(active, h * (c["ldamp"] + h * c["lstiff"]), 0.0)
            )
        tau[j] = [
            jnp.clip(t[k] + lim[k], -c["taumax"], c["taumax"]) for k in range(3)
        ]
        d_extra[j] = dex

    # ---- bias forces ------------------------------------------------------ #
    pA = [None] * J
    IA = [None] * J  # (A, B, C) blocks
    for b in range(J):
        m = c["mass"][b]
        fg = [0.0, 0.0, m * c["gravity"]]
        com_w = _qrot(rot[b], list(c["com"][b]))
        n_tot = _v_add(f_ext[b][:3], _cross(com_w, fg))
        f_tot = [f_ext[b][3], f_ext[b][4], f_ext[b][5] + fg[2]]
        f_body = _qrot_inv(rot[b], n_tot) + _qrot_inv(rot[b], f_tot)
        A0, B0, C0 = c["Iblocks"][b]
        Iv = _mul_inertia_blocks(A0, B0, C0, v[b])
        pA[b] = _v_sub(_cross_force(v[b], Iv), f_body)
        IA[b] = (
            [[A0[i][k] + zero for k in range(3)] for i in range(3)],
            [[B0[i][k] + zero for k in range(3)] for i in range(3)],
            [[C0[i][k] + zero for k in range(3)] for i in range(3)],
        )

    # ---- ABA pass 2 (leaves -> root) -------------------------------------- #
    U_A = [None] * J  # pre-subtraction (A, B) blocks = the U columns
    U_B = [None] * J
    Dinv_all = [None] * J
    u_all = [None] * J
    for body_ids, parent_ids in reversed(c["levels"][1:]):
        for b, p in zip(body_ids, parent_ids):
            A, B, C = IA[b]
            j = b - 1
            D = [
                [
                    A[i][k]
                    + (
                        (c["armature"][j] + d_extra[j][i])
                        if i == k
                        else 0.0
                    )
                    for k in range(3)
                ]
                for i in range(3)
            ]
            Dinv = _inv3(D)
            u = [tau[j][k] - pA[b][k] for k in range(3)]
            # Ia = IA - U Dinv U^T in blocks (U = [A; B^T]):
            M1 = _m3_mul(A, Dinv)
            IaA = _m3_sub(A, _m3_mul(M1, A))
            IaB = _m3_sub(B, _m3_mul(M1, B))
            M2 = _m3_mul(Dinv, B)
            IaC = _m3_sub(C, _m3_mul(_m3_T(B), M2))
            # pa = pA + Ia c_bias + U (Dinv u)
            y = _m3_vec(Dinv, u)
            Uy = _v_add(_m3_vec(A, y), [0.0] * 3) + _m3_vec(_m3_T(B), y)
            pa = _v_add(_v_add(pA[b], _mul_inertia_blocks(IaA, IaB, IaC, c_bias[b])), Uy)
            q_pc = jrot[j]
            r_pc = c["lt"][b]
            ApA, ApB, ApC = _inertia_to_parent_blocks(q_pc, r_pc, IaA, IaB, IaC)
            pa_p = _force_to_parent(q_pc, list(r_pc), pa)
            PA, PB, PC = IA[p]
            IA[p] = (_m3_add(PA, ApA), _m3_add(PB, ApB), _m3_add(PC, ApC))
            pA[p] = _v_add(pA[p], pa_p)
            U_A[b], U_B[b] = A, B
            Dinv_all[b] = Dinv
            u_all[b] = u

    # ---- ABA pass 3 (root -> leaves) --------------------------------------- #
    a = [None] * J
    A0r, B0r, C0r = IA[0]
    a[0] = [-x for x in _solve6_sym_blocks(A0r, B0r, C0r, pA[0])]
    qdd = [None] * (J - 1)
    for body_ids, parent_ids in c["levels"][1:]:
        for b, p in zip(body_ids, parent_ids):
            j = b - 1
            a_p = _v_add(
                _motion_to_child(jrot[j], list(c["lt"][b]), a[p]), c_bias[b]
            )
            # U^T a_p = A a_w + B a_v
            Ut_ap = _v_add(_m3_vec(U_A[b], a_p[:3]), _m3_vec(U_B[b], a_p[3:]))
            qdd[j] = _m3_vec(Dinv_all[b], _v_sub(u_all[b], Ut_ap))
            a[b] = _v_add(a_p, qdd[j] + [0.0, 0.0, 0.0])

    # ---- integrate --------------------------------------------------------- #
    new_v6 = [v6_root[k] + h * a[0][k] for k in range(6)]
    new_v6 = [
        jnp.clip(new_v6[k], -c["wmax"], c["wmax"]) for k in range(3)
    ] + [jnp.clip(new_v6[3 + k], -c["vmax"], c["vmax"]) for k in range(3)]
    new_omega = [
        [
            jnp.clip(omega[j][k] + h * qdd[j][k], -c["wmax"], c["wmax"])
            for k in range(3)
        ]
        for j in range(J - 1)
    ]
    new_rot = _qunit(
        _qmul(root_rot, _expmap_to_quat([h * new_v6[k] for k in range(3)]))
    )
    dp = _qrot(root_rot, [new_v6[3], new_v6[4], new_v6[5]])
    new_pos = [root_pos[k] + h * dp[k] for k in range(3)]
    new_jrot = [
        _qunit(
            _qmul(jrot[j], _expmap_to_quat([h * new_omega[j][k] for k in range(3)]))
        )
        for j in range(J - 1)
    ]
    return new_pos, new_rot, new_jrot, new_v6, new_omega, net_contact


def _final_fk(c, root_pos, root_rot, jrot, v6_root, omega):
    """World body state of the new coords (≙ state.refresh_kinematics)."""
    J = c["J"]
    pos = [None] * J
    rot = [None] * J
    w = [None] * J
    vl = [None] * J
    pos[0], rot[0] = root_pos, root_rot
    w[0] = _qrot(root_rot, v6_root[:3])
    vl[0] = _qrot(root_rot, v6_root[3:])
    for body_ids, parent_ids in c["levels"][1:]:
        for b, p in zip(body_ids, parent_ids):
            rot[b] = _qunit(_qmul(rot[p], jrot[b - 1]))
            r = _qrot(rot[p], list(c["lt"][b]))
            pos[b] = _v_add(pos[p], r)
            vl[b] = _v_add(vl[p], _cross(w[p], r))
            w[b] = _v_add(w[p], _qrot(rot[b], omega[b - 1]))
    return pos, rot, vl, w


# per-env model row layout (the batched-model input): every per-body leaf
# that shape variation / physical-prop DR can vary becomes [8, 128] tiles
def _model_rows_layout(J, P):
    Jm1 = J - 1
    n = 0
    rows = {}
    for name, k in [
        ("lt", 3 * J),
        ("mass", J),
        ("com", 3 * J),
        ("Isym", 6 * J),        # unique entries of the symmetric A block
        ("kp", Jm1),
        ("kd", Jm1),
        ("armature", Jm1),
        ("dof_lower", 3 * Jm1),
        ("dof_upper", 3 * Jm1),
        ("cp_offset", 3 * P),
        ("cp_radius", P),
        ("cp_friction", P),
    ]:
        rows[name] = (n, n + k)
        n += k
    return rows, n


_ISYM_IDX = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def build_model_rows(batched_model: Model, B: int) -> jax.Array:
    """Flatten the per-env model leaves the kernel consumes into one
    [B, n_model] array (leaves without an env axis broadcast). This is what
    promotes shape variation / prop DR from trace constants to block inputs
    — the kernel stays compiled across resamples."""
    J = batched_model.num_bodies
    P = batched_model.cp_radius.shape[-1]

    def flat(x, ndim_shared):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == ndim_shared:
            x = jnp.broadcast_to(x[None], (B,) + x.shape)
        return x.reshape(B, -1)

    A = jnp.asarray(batched_model.spatial_inertia, jnp.float32)[..., :3, :3]
    Isym = jnp.stack([A[..., i, j] for i, j in _ISYM_IDX], axis=-1)  # [.., J, 6]
    parts = [
        flat(batched_model.local_translation, 2),
        flat(batched_model.body_mass, 1),
        flat(batched_model.body_com, 2),
        flat(Isym, 2),
        flat(batched_model.joint_kp, 1),
        flat(batched_model.joint_kd, 1),
        flat(batched_model.joint_armature, 1),
        flat(batched_model.dof_lower, 1),
        flat(batched_model.dof_upper, 1),
        flat(batched_model.cp_offset, 2),
        flat(batched_model.cp_radius, 1),
        flat(batched_model.cp_friction, 1),
    ]
    rows = jnp.concatenate(parts, axis=1)
    _, n_model = _model_rows_layout(J, P)
    assert rows.shape[1] == n_model, (rows.shape, n_model)
    return rows


def _model_tiles(c, mrd, lay):
    """Per-env model values as tiles, in the same nested-list shapes
    _extract_consts emits as floats — the kernel body is generic over both."""
    J = c["J"]
    Jm1 = J - 1
    P = len(c["cp_radius"])

    def vec3s(name, n):
        r0 = lay[name][0]
        return [[mrd(r0 + 3 * i + k) for k in range(3)] for i in range(n)]

    def scalars(name, n):
        r0 = lay[name][0]
        return [mrd(r0 + i) for i in range(n)]

    mass = scalars("mass", J)
    com = vec3s("com", J)
    i0 = lay["Isym"][0]
    Iblocks = []
    for b in range(J):
        s = [mrd(i0 + 6 * b + k) for k in range(6)]
        A = [[s[0], s[1], s[2]], [s[1], s[3], s[4]], [s[2], s[4], s[5]]]
        # B = m c×, C = m I (spatial.spatial_inertia structure about origin)
        cx = _skew(com[b])
        Bb = [[mass[b] * cx[i][k] for k in range(3)] for i in range(3)]
        Cb = [
            [mass[b] if i == k else 0.0 for k in range(3)] for i in range(3)
        ]
        Iblocks.append((A, Bb, Cb))
    return dict(
        lt=vec3s("lt", J),
        mass=mass,
        com=com,
        Iblocks=Iblocks,
        kp=scalars("kp", Jm1),
        kd=scalars("kd", Jm1),
        armature=scalars("armature", Jm1),
        dof_lower=vec3s("dof_lower", Jm1),
        dof_upper=vec3s("dof_upper", Jm1),
        cp_offset=vec3s("cp_offset", P),
        cp_radius=scalars("cp_radius", P),
        cp_friction=scalars("cp_friction", P),
    )


def _build_kernel(c, with_model_rows: bool = False, extra=None):
    """Build the mega-kernel. `extra` fuses a post-physics stage into the
    same kernel while the final state is still in VMEM: a tuple
    (n_extra_in, n_extra_out, fn) where fn(rd_extra, pos, rot, vel, ang,
    jrot, omega) reads extra input rows (appended after pd_target) via
    rd_extra and returns n_extra_out output tiles (appended after the
    physics outputs). Used by env/pallas_obs.py to fold the imitation
    reward + AMP obs stage into the physics step (saves one custom-call
    boundary and the repack of the stepped body state)."""
    J = c["J"]
    Jm1 = J - 1
    P = len(c["cp_radius"])
    rows, n_state = _row_layout(J)
    n_in = n_state + 3 * Jm1  # + pd_target
    n_phys_out = n_state + 3 * J + 13 * J  # + contact + world body state
    n_out = n_phys_out
    if extra is not None:
        n_extra_in, n_extra_out, extra_fn = extra
        n_in += n_extra_in
        n_out += n_extra_out

    def kernel(in_ref, *refs):
        if with_model_rows:
            model_ref, out_ref = refs
            lay, _ = _model_rows_layout(J, P)
            cv = {**c, **_model_tiles(c, lambda r: model_ref[0, r], lay)}
        else:
            (out_ref,) = refs
            cv = c
        c_ = cv

        def rd(r):
            return in_ref[0, r]

        root_pos = [rd(rows["root_pos"][0] + k) for k in range(3)]
        root_rot = [rd(rows["root_rot"][0] + k) for k in range(4)]
        jr0 = rows["joint_rot"][0]
        jrot = [[rd(jr0 + 4 * j + k) for k in range(4)] for j in range(Jm1)]
        v6 = [rd(rows["root_vel6"][0] + k) for k in range(6)]
        om0 = rows["joint_omega"][0]
        omega = [[rd(om0 + 3 * j + k) for k in range(3)] for j in range(Jm1)]
        pd = [[rd(n_state + 3 * j + k) for k in range(3)] for j in range(Jm1)]

        target_rot = [_expmap_to_quat(pd[j]) for j in range(Jm1)]

        zero = jnp.zeros_like(root_pos[0])
        acc = [[zero] * 3 for _ in range(J)]
        for _ in range(c_["n_sub"]):
            root_pos, root_rot, jrot, v6, omega, contact = _substep_tiles(
                c_, root_pos, root_rot, jrot, v6, omega, target_rot
            )
            for b in range(J):
                acc[b] = _v_add(acc[b], contact[b])
        inv_n = 1.0 / c_["n_sub"]

        pos, rot, vl, w = _final_fk(c_, root_pos, root_rot, jrot, v6, omega)

        def wr(r, val):
            out_ref[0, r] = val

        for k in range(3):
            wr(rows["root_pos"][0] + k, root_pos[k])
        for k in range(4):
            wr(rows["root_rot"][0] + k, root_rot[k])
        for j in range(Jm1):
            for k in range(4):
                wr(jr0 + 4 * j + k, jrot[j][k])
        for k in range(6):
            wr(rows["root_vel6"][0] + k, v6[k])
        for j in range(Jm1):
            for k in range(3):
                wr(om0 + 3 * j + k, omega[j][k])
        base = n_state
        for b in range(J):
            for k in range(3):
                wr(base + 3 * b + k, acc[b][k] * inv_n)
        base = n_state + 3 * J
        for b in range(J):
            for k in range(3):
                wr(base + 13 * b + k, pos[b][k])
            for k in range(4):
                wr(base + 13 * b + 3 + k, rot[b][k])
            for k in range(3):
                wr(base + 13 * b + 7 + k, vl[b][k])
            for k in range(3):
                wr(base + 13 * b + 10 + k, w[b][k])

        if extra is not None:
            base_extra = n_state + 3 * Jm1

            def rd_extra(r):
                return in_ref[0, base_extra + r]

            vals = extra_fn(rd_extra, pos, rot, vl, w, jrot, omega)
            assert len(vals) == n_extra_out
            for i, val in enumerate(vals):
                wr(n_phys_out + i, val)

    return kernel, n_in, n_out


# --------------------------------------------------------------------------- #
# host-side pack / unpack + public entry
# --------------------------------------------------------------------------- #

def _pack(x):  # [B, R] -> [NB, R, 8, 128]
    B, R = x.shape
    NB = B // ENVS_PER_BLOCK
    return x.reshape(NB, 8, 128, R).transpose(0, 3, 1, 2)


def _unpack(x):  # [NB, R, 8, 128] -> [B, R]
    NB, R = x.shape[0], x.shape[1]
    return x.transpose(0, 2, 3, 1).reshape(NB * ENVS_PER_BLOCK, R)


def supported(model: Model, num_envs: int | None = None) -> bool:
    """The kernel covers the training hot path only."""
    cfg = model.config
    ok = not cfg.self_collision and not model.has_terrain
    if num_envs is not None:
        ok = ok and num_envs % ENVS_PER_BLOCK == 0
    return ok


def pallas_physics_step(
    model: Model,
    state: PhysicsState,
    pd_target: jax.Array,
    *,
    model_rows: jax.Array | None = None,
    interpret: bool = False,
) -> PhysicsState:
    """Batched control step: state fields are [B, ...], pd_target [B, D].

    B must be a multiple of ENVS_PER_BLOCK (the env wrapper pads or falls
    back). With `model_rows` ([B, n_model] from build_model_rows), the
    per-env model leaves (masses/inertias/gains/limits/contact geometry —
    shape variation + prop DR) enter as block inputs instead of trace
    constants, so shape-varied training keeps the mega-kernel
    (round-3 VERDICT missing #5). Returns the advanced batched PhysicsState
    with refreshed world kinematics and substep-averaged contact forces,
    matching vmap(physics_step) (golden-tested)."""
    J = model.num_bodies
    Jm1 = J - 1
    B = state.root_pos.shape[0]
    if B % ENVS_PER_BLOCK != 0:
        raise ValueError(f"num_envs must be a multiple of {ENVS_PER_BLOCK}")
    c = _extract_consts(model)
    kernel, n_in, n_out = _build_kernel(c, with_model_rows=model_rows is not None)

    rows_in = jnp.concatenate(
        [
            state.root_pos,
            state.root_rot,
            state.joint_rot.reshape(B, 4 * Jm1),
            state.root_vel6,
            state.joint_omega.reshape(B, 3 * Jm1),
            pd_target.reshape(B, 3 * Jm1),
        ],
        axis=1,
    ).astype(jnp.float32)
    x = _pack(rows_in)
    NB = x.shape[0]

    inputs = [x]
    in_specs = [pl.BlockSpec((1, n_in, 8, 128), lambda i: (i, 0, 0, 0))]
    if model_rows is not None:
        n_model = model_rows.shape[1]
        inputs.append(_pack(model_rows.astype(jnp.float32)))
        in_specs.append(
            pl.BlockSpec((1, n_model, 8, 128), lambda i: (i, 0, 0, 0))
        )

    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_out, 8, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, n_out, 8, 128), jnp.float32),
        interpret=interpret,
    )(*inputs)
    rows_out = _unpack(out)
    return physics_state_from_rows(rows_out, J)


def physics_state_from_rows(rows_out: jax.Array, J: int) -> PhysicsState:
    """Slice the kernel's output rows [B, >= n_state + 3J + 13J] back into a
    PhysicsState (shared by pallas_physics_step and the fused step+reward
    entry in env/pallas_obs.py, which appends extra rows after these)."""
    B = rows_out.shape[0]
    Jm1 = J - 1
    rows_l, n_state = _row_layout(J)
    body = rows_out[:, n_state + 3 * J : n_state + 3 * J + 13 * J].reshape(
        B, J, 13
    )
    return PhysicsState(
        root_pos=rows_out[:, 0:3],
        root_rot=rows_out[:, 3:7],
        joint_rot=rows_out[:, 7 : 7 + 4 * Jm1].reshape(B, Jm1, 4),
        root_vel6=rows_out[:, rows_l["root_vel6"][0] : rows_l["root_vel6"][1]],
        joint_omega=rows_out[
            :, rows_l["joint_omega"][0] : rows_l["joint_omega"][1]
        ].reshape(B, Jm1, 3),
        body_pos=body[:, :, 0:3],
        body_rot=body[:, :, 3:7],
        body_vel=body[:, :, 7:10],
        body_ang_vel=body[:, :, 10:13],
        contact_force=rows_out[:, n_state : n_state + 3 * J].reshape(B, J, 3),
    )


def pallas_physics_step_padded(
    model: Model,
    state: PhysicsState,
    pd_target: jax.Array,
    model_rows: jax.Array | None = None,
    *,
    interpret: bool = False,
) -> PhysicsState:
    """pallas_physics_step for ANY batch size: pads the env axis up to the
    next ENVS_PER_BLOCK multiple (replicating row 0 — the pad lanes are
    dropped again) so the kernel composes with per-device shards whose size
    isn't a tile multiple (e.g. 3072 envs / 8 chips = 384/chip)."""
    B = pd_target.shape[0]
    Bp = ((B + ENVS_PER_BLOCK - 1) // ENVS_PER_BLOCK) * ENVS_PER_BLOCK
    if Bp == B:
        return pallas_physics_step(
            model, state, pd_target, model_rows=model_rows, interpret=interpret
        )

    def pad(x):
        reps = jnp.broadcast_to(x[:1], (Bp - B,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    out = pallas_physics_step(
        model, jax.tree.map(pad, state), pad(pd_target),
        model_rows=None if model_rows is None else pad(model_rows),
        interpret=interpret,
    )
    return jax.tree.map(lambda x: x[:B], out)


def sharded_pallas_physics_step(
    model: Model,
    mesh,
    state: PhysicsState,
    pd_target: jax.Array,
    model_rows: jax.Array | None = None,
    *,
    axis_name: str = "data",
    interpret: bool = False,
) -> PhysicsState:
    """shard_map wrapper: each device runs the mega-kernel on its own env
    shard (padded to a tile multiple), so the Pallas hot path composes with
    the DP mesh — GSPMD cannot partition a pallas_call by itself, which is
    why round 1 fell back to the XLA path whenever device_count > 1."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if model_rows is None:
        fn = shard_map(
            functools.partial(pallas_physics_step_padded, model, interpret=interpret),
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=P(axis_name),
            # pallas_call's out_shape has no varying-mesh-axes annotation; the
            # body is trivially per-shard (no collectives), so skip the check
            check_vma=False,
        )
        return fn(state, pd_target)
    fn = shard_map(
        functools.partial(pallas_physics_step_padded, model, interpret=interpret),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return fn(state, pd_target, model_rows)
