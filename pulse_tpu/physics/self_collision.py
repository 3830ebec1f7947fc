"""Self-collision: capsule-capsule narrowphase over a static filtered pair set.

≙ the reference's self-collision filter ints (humanoid.py:1015-1031 — PhysX
contact filtering by body pair) + PhysX's own capsule narrowphase. Every
geom becomes one capsule proxy (boxes use their long axis + a radius
bounding the cross-section); candidate pairs exclude parent/child and
grandparent relations; the compliant penalty acts along the closest-point
axis with equal-and-opposite spatial forces.

Static pair table -> one batched segment-segment distance kernel, fully
branch-free. Enabled via PhysicsConfig.self_collision.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.physics.model import Model


@functools.lru_cache(maxsize=8)
def _pair_table(parents: tuple):
    """All body pairs excluding self/parent/grandparent adjacency."""
    J = len(parents)

    def ancestors(i, k=2):
        out = set()
        p = parents[i]
        for _ in range(k):
            if p < 0:
                break
            out.add(p)
            p = parents[p]
        return out

    pairs = []
    for i in range(J):
        anc_i = ancestors(i)
        for j in range(i + 1, J):
            if j in anc_i or i in ancestors(j) or parents[i] == parents[j] == max(parents[i], -1) and parents[i] >= 0:
                continue
            if parents[j] == i or parents[i] == j:
                continue
            pairs.append((i, j))
    a = np.asarray([p[0] for p in pairs], np.int32)
    b = np.asarray([p[1] for p in pairs], np.int32)
    return a, b


def capsule_proxies(spec) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-body capsule proxy (endpoint offsets in body frame + radius)."""
    from pulse_tpu.assets.robot_spec import GeomType

    J = spec.num_bodies
    p0 = np.zeros((J, 3), np.float32)
    p1 = np.zeros((J, 3), np.float32)
    radius = np.zeros(J, np.float32)
    for g in range(len(spec.geom_body)):
        bidx = int(spec.geom_body[g])
        t = int(spec.geom_type[g])
        pos = spec.geom_pos[g]
        quat = spec.geom_quat[g]
        size = spec.geom_size[g]

        def rot(v):
            uv = np.cross(quat[:3], v)
            uuv = np.cross(quat[:3], uv)
            return v + 2.0 * (quat[3] * uv + uuv)

        if t == GeomType.SPHERE:
            a = b = pos
            r = size[0]
        elif t == GeomType.CAPSULE:
            axis = rot(np.asarray([0.0, 0.0, 1.0]))
            a, b = pos + size[1] * axis, pos - size[1] * axis
            r = size[0]
        else:  # box -> capsule along the longest axis
            long_ax = int(np.argmax(size))
            axis = rot(np.eye(3)[long_ax])
            a = pos + size[long_ax] * axis
            b = pos - size[long_ax] * axis
            other = [k for k in range(3) if k != long_ax]
            r = float(np.sqrt(size[other[0]] ** 2 + size[other[1]] ** 2) * 0.7)
        p0[bidx], p1[bidx], radius[bidx] = a, b, r
    return p0, p1, radius


def _segment_closest(a0, a1, b0, b1):
    """Closest points between segments [a0,a1] and [b0,b1] (batched)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-9, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-9), 0, 1), 0.0)
    t = jnp.where(e > 1e-9, jnp.clip((b * s + f) / jnp.maximum(e, 1e-9), 0, 1), 0.0)
    # re-clamp s for clamped t
    s = jnp.where(a > 1e-9, jnp.clip((b * t - c) / jnp.maximum(a, 1e-9), 0, 1), 0.0)
    pa = a0 + s[..., None] * d1
    pb = b0 + t[..., None] * d2
    return pa, pb


def self_collision_forces(
    model: Model,
    cap_p0: jax.Array,   # [J, 3] body-frame capsule endpoints
    cap_p1: jax.Array,
    cap_r: jax.Array,    # [J]
    body_pos: jax.Array,
    body_rot: jax.Array,
    body_vel: jax.Array,
    body_ang_vel: jax.Array,
) -> jax.Array:
    """World-frame spatial forces per body from self-contacts. [J, 6]."""
    cfg = model.config
    ia, ib = _pair_table(model.parents)
    J = model.num_bodies

    w_p0 = body_pos + q.quat_rotate(body_rot, cap_p0)
    w_p1 = body_pos + q.quat_rotate(body_rot, cap_p1)

    pa, pb = _segment_closest(w_p0[ia], w_p1[ia], w_p0[ib], w_p1[ib])
    delta = pa - pb
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
    pen = (cap_r[ia] + cap_r[ib]) - dist
    touching = pen > 0.0
    n = delta / dist[..., None]   # pushes body a away from body b

    va = body_vel[ia] + jnp.cross(body_ang_vel[ia], pa - body_pos[ia])
    vb = body_vel[ib] + jnp.cross(body_ang_vel[ib], pb - body_pos[ib])
    vn = jnp.sum((va - vb) * n, axis=-1)
    fmag = jnp.where(
        touching,
        jnp.maximum(cfg.contact_stiffness * pen - cfg.contact_damping * vn, 0.0),
        0.0,
    )
    f = fmag[..., None] * n

    f_ext = jnp.zeros((J, 6))
    f_ext = f_ext.at[ia, 3:6].add(f)
    f_ext = f_ext.at[ia, 0:3].add(jnp.cross(pa - body_pos[ia], f))
    f_ext = f_ext.at[ib, 3:6].add(-f)
    f_ext = f_ext.at[ib, 0:3].add(jnp.cross(pb - body_pos[ib], -f))
    return f_ext
