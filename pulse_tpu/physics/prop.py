"""Free rigid prop (box) dynamics + two-way humanoid contact.

The strike task needs a second actor — a target box the humanoid knocks over
(≙ humanoid_strike.py:17-375, target asset urdf/strike_target.urdf). Here a
prop is a single free rigid body integrated alongside the humanoid:

  - box-vs-ground contact at its 8 corners (same compliant model)
  - humanoid-vs-box contact: the humanoid's contact-point spheres against
    the box SDF, applying equal-and-opposite forces to both bodies

Everything is batched/jittable; PropState rides inside the env state.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.ops import quat as q
from pulse_tpu.physics.model import Model


@dataclasses.dataclass(frozen=True)
class PropSpec:
    half_extents: tuple = (0.25, 0.25, 0.9)   # strike-target-ish bar
    density: float = 100.0
    friction: float = 0.6

    @property
    def mass(self) -> float:
        hx, hy, hz = self.half_extents
        return self.density * 8.0 * hx * hy * hz

    @property
    def inertia_diag(self) -> np.ndarray:
        hx, hy, hz = self.half_extents
        m = self.mass
        return np.asarray(
            [
                m / 3.0 * (hy * hy + hz * hz),
                m / 3.0 * (hx * hx + hz * hz),
                m / 3.0 * (hx * hx + hy * hy),
            ],
            np.float32,
        )

    @property
    def corners(self) -> np.ndarray:
        hx, hy, hz = self.half_extents
        return np.asarray(
            [[sx * hx, sy * hy, sz * hz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float32,
        )


@struct.dataclass
class PropState:
    pos: jax.Array        # [3] world COM position
    rot: jax.Array        # [4] xyzw
    lin_vel: jax.Array    # [3] world
    ang_vel: jax.Array    # [3] world


def make_prop_state(pos, rot=None) -> PropState:
    return PropState(
        pos=jnp.asarray(pos),
        rot=jnp.asarray([0.0, 0.0, 0.0, 1.0]) if rot is None else jnp.asarray(rot),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.zeros(3),
    )


def _box_sdf_push(rel: jax.Array, half: jax.Array):
    """Signed distance + outward normal for point(s) in box frame.

    Inside the box: distance is negative, normal points along the closest
    face. rel [..., 3] -> (sdf [...], normal [..., 3])."""
    d = jnp.abs(rel) - half
    outside = jnp.maximum(d, 0.0)
    dist_out = jnp.linalg.norm(outside, axis=-1)
    dist_in = jnp.minimum(jnp.max(d, axis=-1), 0.0)
    sdf = dist_out + dist_in
    # outward normal: gradient direction
    face = jnp.argmax(d, axis=-1)
    inside_normal = jax.nn.one_hot(face, 3) * jnp.sign(rel)
    out_dir = outside * jnp.sign(rel)
    out_norm = out_dir / jnp.maximum(dist_out[..., None], 1e-9)
    normal = jnp.where((sdf > 0)[..., None], out_norm, inside_normal)
    return sdf, normal


def prop_step(
    model: Model,
    spec: PropSpec,
    prop: PropState,
    humanoid_body_pos: jax.Array,   # [J, 3]
    humanoid_body_rot: jax.Array,   # [J, 4]
    humanoid_body_vel: jax.Array,   # [J, 3]
    humanoid_body_ang_vel: jax.Array,  # [J, 3]
    h: float,
) -> tuple[PropState, jax.Array, jax.Array]:
    """One substep of the prop. Returns (new prop state,
    reaction spatial forces on humanoid bodies [J, 6] world,
    net contact force on the prop [3])."""
    cfg = model.config
    m = spec.mass
    I_diag = jnp.asarray(spec.inertia_diag)
    g = jnp.asarray([0.0, 0.0, cfg.gravity])

    force = m * g
    torque = jnp.zeros(3)

    # ---- corners vs ground ------------------------------------------- #
    corners_w = prop.pos + q.quat_rotate(prop.rot[None], jnp.asarray(spec.corners))
    depth = -corners_w[:, 2]
    vp = prop.lin_vel + jnp.cross(prop.ang_vel, corners_w - prop.pos)
    vn = vp[:, 2]
    fn = jnp.where(
        depth > 0,
        jnp.maximum(cfg.contact_stiffness * depth - cfg.contact_damping * vn, 0.0),
        0.0,
    )
    vt = vp.at[:, 2].set(0.0)
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    scale = jnp.minimum(vt_norm / cfg.friction_regularization, 1.0)
    ft = -(spec.friction * fn * scale / vt_norm)[:, None] * vt
    f_ground = ft.at[:, 2].add(fn)
    force = force + jnp.sum(f_ground, axis=0)
    torque = torque + jnp.sum(jnp.cross(corners_w - prop.pos, f_ground), axis=0)

    # ---- humanoid contact-point spheres vs box SDF -------------------- #
    b = model.cp_body
    p_w = humanoid_body_pos[b] + q.quat_rotate(
        humanoid_body_rot[b], model.cp_offset
    )
    rel = q.quat_rotate_inverse(prop.rot[None], p_w - prop.pos)
    sdf, n_local = _box_sdf_push(rel, jnp.asarray(spec.half_extents))
    pen = model.cp_radius - sdf                       # >0 touching
    n_w = q.quat_rotate(prop.rot[None], n_local)

    arm_h = p_w - humanoid_body_pos[b]
    v_h = humanoid_body_vel[b] + jnp.cross(humanoid_body_ang_vel[b], arm_h)
    v_prop = prop.lin_vel + jnp.cross(prop.ang_vel, p_w - prop.pos)
    v_rel_n = jnp.sum((v_h - v_prop) * n_w, axis=-1)
    fmag = jnp.where(
        pen > 0,
        jnp.maximum(cfg.contact_stiffness * pen - cfg.contact_damping * v_rel_n, 0.0),
        0.0,
    )
    f_on_h = fmag[:, None] * n_w                      # pushes humanoid outward

    # reaction on prop
    force = force - jnp.sum(f_on_h, axis=0)
    torque = torque - jnp.sum(jnp.cross(p_w - prop.pos, f_on_h), axis=0)

    # spatial reaction on humanoid bodies (about their origins)
    J = model.num_bodies
    f_ext_h = jnp.zeros((J, 6))
    f_ext_h = f_ext_h.at[b, 0:3].add(jnp.cross(arm_h, f_on_h))
    f_ext_h = f_ext_h.at[b, 3:6].add(f_on_h)

    # ---- integrate (semi-implicit, world-frame Euler rotation) -------- #
    lin_vel = prop.lin_vel + h * force / m
    # Euler's equation in body frame
    w_body = q.quat_rotate_inverse(prop.rot, prop.ang_vel)
    t_body = q.quat_rotate_inverse(prop.rot, torque)
    w_dot = (t_body - jnp.cross(w_body, I_diag * w_body)) / I_diag
    w_body = w_body + h * w_dot
    ang_vel = q.quat_rotate(prop.rot, w_body)
    pos = prop.pos + h * lin_vel
    rot = q.quat_mul_norm(prop.rot, q.exp_map_to_quat(h * w_body))

    new = PropState(pos=pos, rot=rot, lin_vel=lin_vel, ang_vel=ang_vel)
    return new, f_ext_h, jnp.sum(jnp.abs(f_on_h), axis=0)
