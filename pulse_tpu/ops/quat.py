"""Batched quaternion / rigid-transform algebra in pure jnp.

Convention: quaternions are stored **xyzw** (vector part first, scalar last),
matching the Isaac-Gym/PULSE data layout so that observation kernels, motion
data, and pretrained-checkpoint semantics line up exactly with the reference
(cf. /root/reference/phc/utils/torch_utils.py:46-241 and
poselib/poselib/core/rotation3d.py). All functions operate on arbitrary
leading batch dimensions: inputs are [..., 4] / [..., 3] and everything is
elementwise-broadcast, so the whole module vmaps/jits trivially and fuses into
surrounding XLA programs (no scalar loops, no data-dependent control flow).

Transforms are 7-vectors [..., 7] = (quat_xyzw, translation_xyz), the same
packing poselib uses for its transform_* ops (rotation3d.py transform_mul /
transform_apply semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9
_MIN_THETA = 1e-5


# --------------------------------------------------------------------------- #
# construction / normalization
# --------------------------------------------------------------------------- #

def quat_identity(shape=()) -> jax.Array:
    """Identity quaternion(s) with the given batch shape."""
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_unit(q: jax.Array) -> jax.Array:
    """Normalize to unit length (safe at 0)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, _EPS)


def quat_positive(q: jax.Array) -> jax.Array:
    """Flip sign so the scalar (w) component is non-negative."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b for xyzw quaternions (batched)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_mul_norm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Product followed by normalization (keeps long chains unit-length)."""
    return quat_unit(quat_mul(a, b))


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse of a unit quaternion (= conjugate)."""
    return quat_conjugate(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q.

    Same formula as the reference's `my_quat_rotate`
    (phc/utils/torch_utils.py:46-55) but broadcast over any batch shape.
    """
    q_w = q[..., 3:4]
    q_vec = q[..., :3]
    a = v * (2.0 * q_w * q_w - 1.0)
    b = jnp.cross(q_vec, v) * q_w * 2.0
    c = q_vec * jnp.sum(q_vec * v, axis=-1, keepdims=True) * 2.0
    return a + b + c


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conjugate(q), v)


# --------------------------------------------------------------------------- #
# angle-axis / exponential map
# --------------------------------------------------------------------------- #

def normalize_angle(theta: jax.Array) -> jax.Array:
    """Wrap angle(s) to (-pi, pi]."""
    return theta - 2 * jnp.pi * jnp.floor((theta + jnp.pi) / (2 * jnp.pi))


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Unit quaternion from rotation angle(s) [...,] about unit axis [..., 3]."""
    half = 0.5 * angle[..., None]
    xyz = axis * jnp.sin(half)
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def quat_to_angle_axis(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Angle in (-pi, pi] and unit axis from a unit quaternion.

    Matches the reference semantics (torch_utils.py:58-78): near-identity
    rotations return angle 0 with axis +z.
    """
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    angle = normalize_angle(2.0 * jnp.arccos(w))
    safe_sin = jnp.where(sin_half > _MIN_THETA, sin_half, 1.0)
    axis = q[..., :3] / safe_sin[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    mask = sin_half > _MIN_THETA
    angle = jnp.where(mask, angle, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def quat_angle(q: jax.Array) -> jax.Array:
    """Rotation angle magnitude-signed in (-pi, pi] of a unit quaternion."""
    return quat_to_angle_axis(q)[0]


def quat_to_exp_map(q: jax.Array) -> jax.Array:
    """Exponential-map (angle*axis) coordinates [..., 3] of a unit quaternion."""
    angle, axis = quat_to_angle_axis(q)
    return angle[..., None] * axis


def exp_map_to_quat(exp_map: jax.Array) -> jax.Array:
    """Quaternion from exponential-map coordinates.

    Same edge handling as torch_utils.py:149-172 (zero map -> identity).
    """
    norm_sq = jnp.sum(exp_map * exp_map, axis=-1)
    mask = norm_sq > _MIN_THETA * _MIN_THETA
    # double-where: keep sqrt's input away from 0 so grads stay finite there
    angle = jnp.sqrt(jnp.where(mask, norm_sq, 1.0))
    axis = exp_map / angle[..., None]
    default_axis = jnp.zeros_like(exp_map).at[..., 2].set(1.0)
    angle = jnp.where(mask, normalize_angle(angle), 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return quat_from_angle_axis(angle, axis)


# --------------------------------------------------------------------------- #
# 6D tangent-normal representation
# --------------------------------------------------------------------------- #

def quat_to_tan_norm(q: jax.Array) -> jax.Array:
    """Rotation as [tangent(=rotated +x), normal(=rotated +z)] 6-vector.

    Matches torch_utils.py:101-113 (the observation rotation encoding).
    """
    ref_tan = jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0)
    ref_norm = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    tan = quat_rotate(q, ref_tan)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


def tan_norm_to_matrix(tan_norm: jax.Array) -> jax.Array:
    """Gram-Schmidt a (tan, norm) 6-vector back into a rotation matrix.

    Column layout matches torch_utils.py:117-129: R = [tan, norm x tan, norm].
    """
    tan = tan_norm[..., 0:3]
    norm = tan_norm[..., 3:6]
    tan_n = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), _EPS)
    norm_o = norm - jnp.sum(tan_n * norm, axis=-1, keepdims=True) * tan_n
    norm_n = norm_o / jnp.maximum(jnp.linalg.norm(norm_o, axis=-1, keepdims=True), _EPS)
    cross = jnp.cross(norm_n, tan_n)
    return jnp.stack([tan_n, cross, norm_n], axis=-1)


def tan_norm_to_quat(tan_norm: jax.Array) -> jax.Array:
    return matrix_to_quat(tan_norm_to_matrix(tan_norm))


# --------------------------------------------------------------------------- #
# matrix conversions
# --------------------------------------------------------------------------- #

def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] from unit xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """xyzw quaternion from rotation matrix, branch-free (Shepperd's method).

    Computes all four candidate quaternions scaled by 4q_i^2 and selects the
    numerically largest pivot with `where` — no data-dependent branching, so it
    vectorizes cleanly on the VPU.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # candidate squared magnitudes (>=0 up to fp error)
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # branch w: q = [m21-m12, m02-m20, m10-m01, qw2] / (2*sqrt(qw2))
    def _make(c2, a, b, c, d):
        s = 2.0 * jnp.sqrt(jnp.maximum(c2, _EPS))
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1)

    cand_w = _make(qw2, m21 - m12, m02 - m20, m10 - m01, qw2)
    cand_x = _make(qx2, qx2, m01 + m10, m02 + m20, m21 - m12)
    cand_y = _make(qy2, m01 + m10, qy2, m12 + m21, m02 - m20)
    cand_z = _make(qz2, m02 + m20, m12 + m21, qz2, m10 - m01)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    q = jnp.where(
        best == 0,
        cand_w,
        jnp.where(best == 1, cand_x, jnp.where(best == 2, cand_y, cand_z)),
    )
    return quat_positive(quat_unit(q))


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Quaternion from intrinsic XYZ Euler angles (Isaac-Gym convention)."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    qw = cy * cp * cr + sy * sp * sr
    qx = cy * cp * sr - sy * sp * cr
    qy = cy * sp * cr + sy * cp * sr
    qz = sy * cp * cr - cy * sp * sr
    return jnp.stack([qx, qy, qz, qw], axis=-1)


# --------------------------------------------------------------------------- #
# interpolation
# --------------------------------------------------------------------------- #

def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation with the reference's degenerate-case handling
    (torch_utils.py:176-197): near-parallel falls back to lerp midpointing and
    |cos| >= 1 returns q0. `t` broadcasts against the batch shape ([...,] or
    [..., 1])."""
    if t.ndim == q0.ndim - 1:
        t = t[..., None]
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)

    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    safe_sin = jnp.where(jnp.abs(sin_half) < 1e-3, 1.0, sin_half)
    ratio_a = jnp.sin((1.0 - t) * half) / safe_sin
    ratio_b = jnp.sin(t * half) / safe_sin
    out = ratio_a * q0 + ratio_b * q1
    out = jnp.where(jnp.abs(sin_half) < 1e-3, 0.5 * q0 + 0.5 * q1, out)
    out = jnp.where(cos_half >= 1.0, q0, out)
    return out


# --------------------------------------------------------------------------- #
# heading
# --------------------------------------------------------------------------- #

def calc_heading(q: jax.Array) -> jax.Array:
    """Yaw of the rotated +x axis on the xy plane (torch_utils.py:201-212)."""
    ref_dir = jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


# --------------------------------------------------------------------------- #
# rigid transforms: [..., 7] = (xyzw quat, xyz translation)
# --------------------------------------------------------------------------- #

def transform_identity(shape=()) -> jax.Array:
    t = jnp.zeros(tuple(shape) + (7,))
    return t.at[..., 3].set(1.0)


def transform_from_rotation_translation(rot: jax.Array, trans: jax.Array) -> jax.Array:
    return jnp.concatenate([rot, trans], axis=-1)


def transform_rotation(t: jax.Array) -> jax.Array:
    return t[..., 0:4]


def transform_translation(t: jax.Array) -> jax.Array:
    return t[..., 4:7]


def transform_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose transforms: (a*b).apply(x) == a.apply(b.apply(x)).

    Matches poselib transform_mul semantics used by FK
    (poselib/poselib/core/rotation3d.py, skeleton3d.py:389-409).
    """
    rot = quat_mul_norm(transform_rotation(a), transform_rotation(b))
    trans = quat_rotate(transform_rotation(a), transform_translation(b)) + transform_translation(a)
    return transform_from_rotation_translation(rot, trans)


def transform_inverse(t: jax.Array) -> jax.Array:
    inv_rot = quat_inverse(transform_rotation(t))
    inv_trans = -quat_rotate(inv_rot, transform_translation(t))
    return transform_from_rotation_translation(inv_rot, inv_trans)


def transform_apply(t: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(transform_rotation(t), v) + transform_translation(t)
