"""Spatial (6D) vector algebra for articulated dynamics, Featherstone style.

Spatial motion vectors are [..., 6] = (angular, linear); force vectors are
[..., 6] = (torque, force). Frames follow Featherstone's body-coordinate
convention: each body frame sits at its joint origin, and a frame transform is
given by (q, r) where q is the parent-from-child rotation (xyzw) and r the
child origin expressed in the parent frame.

Everything here is elementwise/batched jnp — no 6x6 materialization except
where a congruence transform genuinely needs it (articulated inertia), which
XLA maps onto small fused matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q


def ang(v: jax.Array) -> jax.Array:
    return v[..., 0:3]


def lin(v: jax.Array) -> jax.Array:
    return v[..., 3:6]


def make(w: jax.Array, v: jax.Array) -> jax.Array:
    return jnp.concatenate([w, v], axis=-1)


def cross_motion(a: jax.Array, b: jax.Array) -> jax.Array:
    """a x b for motion vectors: (w_a x w_b, w_a x v_b + v_a x w_b)."""
    return make(
        jnp.cross(ang(a), ang(b)),
        jnp.cross(ang(a), lin(b)) + jnp.cross(lin(a), ang(b)),
    )


def cross_force(a: jax.Array, f: jax.Array) -> jax.Array:
    """a x* f for force vectors: (w_a x n + v_a x f, w_a x f)."""
    return make(
        jnp.cross(ang(a), ang(f)) + jnp.cross(lin(a), lin(f)),
        jnp.cross(ang(a), lin(f)),
    )


# --------------------------------------------------------------------------- #
# frame transforms, parameterized by (q_pc = parent_from_child, r = child
# origin in parent frame)
# --------------------------------------------------------------------------- #

def motion_to_child(q_pc: jax.Array, r: jax.Array, v: jax.Array) -> jax.Array:
    """Transform a motion vector from parent coords to child coords."""
    w_p, v_p = ang(v), lin(v)
    w_c = q.quat_rotate_inverse(q_pc, w_p)
    v_c = q.quat_rotate_inverse(q_pc, v_p + jnp.cross(w_p, r))
    return make(w_c, v_c)


def force_to_parent(q_pc: jax.Array, r: jax.Array, f: jax.Array) -> jax.Array:
    """Transform a force vector from child coords to parent coords."""
    n_c, f_c = ang(f), lin(f)
    f_p = q.quat_rotate(q_pc, f_c)
    n_p = q.quat_rotate(q_pc, n_c) + jnp.cross(r, f_p)
    return make(n_p, f_p)


def motion_matrix_to_child(q_pc: jax.Array, r: jax.Array) -> jax.Array:
    """6x6 matrix M with v_child = M v_parent (for inertia congruence)."""
    E_t = q.quat_to_matrix(q.quat_conjugate(q_pc))  # rotation parent->child
    rx = skew(r)
    zero = jnp.zeros_like(E_t)
    top = jnp.concatenate([E_t, zero], axis=-1)
    bot = jnp.concatenate([-E_t @ rx, E_t], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_to_parent(q_pc: jax.Array, r: jax.Array, I_c: jax.Array) -> jax.Array:
    """Congruence-transform an articulated spatial inertia into the parent
    frame: I_p = M^T I_c M with M = motion_matrix_to_child.

    Note: a blocked-symmetric variant (ten 3x3 matmuls exploiting I's
    symmetry) was tried and benchmarked 30% SLOWER end-to-end on v5e — XLA's
    batched 6x6 dot lowering beats many tiny matmuls + slicing. Keep the
    direct form."""
    M = motion_matrix_to_child(q_pc, r)
    return jnp.swapaxes(M, -1, -2) @ I_c @ M


def skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def spatial_inertia(mass: jax.Array, com: jax.Array, inertia_com: jax.Array) -> jax.Array:
    """6x6 spatial inertia about the body-frame origin.

    I = [[I_com + m cx cx^T, m cx], [m cx^T, m 1]] with c the COM offset.
    """
    cx = skew(com)
    m = mass[..., None, None]
    top_left = inertia_com + m * (cx @ jnp.swapaxes(cx, -1, -2))
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def mul_inertia(I: jax.Array, v: jax.Array) -> jax.Array:
    """I @ v for a 6x6 spatial inertia and motion vector."""
    return jnp.einsum("...ij,...j->...i", I, v)


# --------------------------------------------------------------------------- #
# closed-form small-matrix solves. XLA lowers jnp.linalg.inv/solve to LU
# loops that are catastrophically slow for tiny batched matrices on TPU;
# these are pure fused elementwise formulas instead.
# --------------------------------------------------------------------------- #

def inv3(m: jax.Array) -> jax.Array:
    """Batched 3x3 inverse via the adjugate formula."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
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
    inv_det = 1.0 / det
    out = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I_], axis=-1),
        ],
        axis=-2,
    )
    return out * inv_det[..., None, None]


def solve6_sym(M: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve M x = rhs for symmetric positive-definite 6x6 M via 2x2-block
    Schur complement with closed-form 3x3 inverses (fully elementwise)."""
    A = M[..., 0:3, 0:3]
    B = M[..., 0:3, 3:6]
    C = M[..., 3:6, 3:6]
    r0 = rhs[..., 0:3]
    r1 = rhs[..., 3:6]
    Ainv = inv3(A)
    BtAinv = jnp.einsum("...ji,...jk->...ik", B, Ainv)       # B^T A^-1
    S = C - jnp.einsum("...ij,...jk->...ik", BtAinv, B)      # Schur complement
    Sinv = inv3(S)
    y = r1 - jnp.einsum("...ij,...j->...i", BtAinv, r0)
    x1 = jnp.einsum("...ij,...j->...i", Sinv, y)
    x0 = jnp.einsum(
        "...ij,...j->...i", Ainv, r0 - jnp.einsum("...ij,...j->...i", B, x1)
    )
    return jnp.concatenate([x0, x1], axis=-1)
