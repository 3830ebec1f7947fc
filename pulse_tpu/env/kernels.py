"""Observation / reward / termination kernels, batched over envs.

Each function re-derives the semantics of one of the reference's
@torch.jit.script kernels as a pure batched jnp function (citations inline).
They all broadcast over a leading env axis and fuse into the jitted env step.
Quaternions are xyzw; `upright=True` corresponds to the upright-start SMPL
humanoid (no base-rotation removal needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q


def dof_to_obs_smpl(dof_pos: jax.Array) -> jax.Array:
    """Exp-map dof triplets -> 6D tan-norm per joint
    (≙ humanoid.py:1436-1446 dof_to_obs_smpl). [..., D] -> [..., 2D]."""
    shape = dof_pos.shape
    em = dof_pos.reshape(shape[:-1] + (shape[-1] // 3, 3))
    tn = q.quat_to_tan_norm(q.exp_map_to_quat(em))
    return tn.reshape(shape[:-1] + (shape[-1] * 2,))


def compute_humanoid_self_obs_max(
    body_pos: jax.Array,      # [B, J, 3]
    body_rot: jax.Array,      # [B, J, 4]
    body_vel: jax.Array,      # [B, J, 3]
    body_ang_vel: jax.Array,  # [B, J, 3]
    local_root_obs: bool = True,
    root_height_obs: bool = True,
) -> jax.Array:
    """Max-coordinate self observation (≙ humanoid.py:1676-1731
    compute_humanoid_observations_smpl_max, upright path).

    Layout: [root_h?, local_body_pos(J-1)*3, local_body_rot J*6,
             local_body_vel J*3, local_body_ang_vel J*3] -> [B, 1+J*15-3].
    """
    B, J, _ = body_pos.shape
    root_pos = body_pos[:, 0]
    root_rot = body_rot[:, 0]
    heading_inv = q.calc_heading_quat_inv(root_rot)          # [B, 4]
    h_exp = heading_inv[:, None, :]                          # [B, 1, 4]

    local_body_pos = q.quat_rotate(h_exp, body_pos - root_pos[:, None, :])
    local_body_pos = local_body_pos.reshape(B, -1)[:, 3:]    # drop root

    local_body_rot = q.quat_mul(jnp.broadcast_to(h_exp, body_rot.shape), body_rot)
    local_body_rot_obs = q.quat_to_tan_norm(local_body_rot)
    if not local_root_obs:
        # override root entry with its global rotation (humanoid.py:1707-1709)
        root_rot_obs = q.quat_to_tan_norm(root_rot)
        local_body_rot_obs = local_body_rot_obs.at[:, 0].set(root_rot_obs)
    local_body_rot_obs = local_body_rot_obs.reshape(B, -1)

    local_body_vel = q.quat_rotate(h_exp, body_vel).reshape(B, -1)
    local_body_ang_vel = q.quat_rotate(h_exp, body_ang_vel).reshape(B, -1)

    parts = []
    if root_height_obs:
        parts.append(root_pos[:, 2:3])
    parts += [local_body_pos, local_body_rot_obs, local_body_vel, local_body_ang_vel]
    return jnp.concatenate(parts, axis=-1)


def compute_imitation_observations_v6(
    root_pos: jax.Array,       # [B, 3]
    root_rot: jax.Array,       # [B, 4]
    body_pos: jax.Array,       # [B, J, 3]
    body_rot: jax.Array,       # [B, J, 4]
    body_vel: jax.Array,       # [B, J, 3]
    body_ang_vel: jax.Array,   # [B, J, 3]
    ref_body_pos: jax.Array,   # [B, T, J, 3]
    ref_body_rot: jax.Array,   # [B, T, J, 4]
    ref_body_vel: jax.Array,   # [B, T, J, 3]
    ref_body_ang_vel: jax.Array,  # [B, T, J, 3]
) -> jax.Array:
    """Imitation task obs v6 (≙ humanoid_im.py:1328-1378): heading-local
    diffs of pos/rot/vel/angvel plus heading-local ref pos/rot, per future
    timestep. -> [B, T*J*24]."""
    B, T, J, _ = ref_body_pos.shape
    heading_inv = q.calc_heading_quat_inv(root_rot)[:, None, None, :]  # [B,1,1,4]
    heading = q.calc_heading_quat(root_rot)[:, None, None, :]

    diff_pos = ref_body_pos - body_pos[:, None]
    diff_local_pos = q.quat_rotate(heading_inv, diff_pos)

    diff_rot = q.quat_mul(ref_body_rot, q.quat_conjugate(body_rot[:, None]))
    diff_local_rot = q.quat_mul(q.quat_mul(heading_inv, diff_rot), heading)

    diff_vel = ref_body_vel - body_vel[:, None]
    diff_local_vel = q.quat_rotate(heading_inv, diff_vel)

    diff_ang_vel = ref_body_ang_vel - body_ang_vel[:, None]
    diff_local_ang_vel = q.quat_rotate(heading_inv, diff_ang_vel)

    local_ref_pos = q.quat_rotate(heading_inv, ref_body_pos - root_pos[:, None, None, :])
    local_ref_rot = q.quat_to_tan_norm(q.quat_mul(heading_inv, ref_body_rot))

    obs = jnp.concatenate(
        [
            diff_local_pos.reshape(B, T, -1),
            q.quat_to_tan_norm(diff_local_rot).reshape(B, T, -1),
            diff_local_vel.reshape(B, T, -1),
            diff_local_ang_vel.reshape(B, T, -1),
            local_ref_pos.reshape(B, T, -1),
            local_ref_rot.reshape(B, T, -1),
        ],
        axis=-1,
    )
    return obs.reshape(B, -1)


def compute_imitation_observations_v7(
    root_pos: jax.Array,
    root_rot: jax.Array,
    body_pos: jax.Array,
    body_vel: jax.Array,
    ref_body_pos: jax.Array,    # [B, T, J, 3]
    ref_body_vel: jax.Array,
) -> jax.Array:
    """Position-only imitation obs (≙ humanoid_im.py:1381-1413: no rotation
    information, 'leave IK for RL'). -> [B, T*J*9]."""
    B, T, J, _ = ref_body_pos.shape
    heading_inv = q.calc_heading_quat_inv(root_rot)[:, None, None, :]
    diff_local_pos = q.quat_rotate(heading_inv, ref_body_pos - body_pos[:, None])
    diff_local_vel = q.quat_rotate(heading_inv, ref_body_vel - body_vel[:, None])
    local_ref_pos = q.quat_rotate(heading_inv, ref_body_pos - root_pos[:, None, None, :])
    obs = jnp.concatenate(
        [
            diff_local_pos.reshape(B, T, -1),
            diff_local_vel.reshape(B, T, -1),
            local_ref_pos.reshape(B, T, -1),
        ],
        axis=-1,
    )
    return obs.reshape(B, -1)


def compute_imitation_observations_v8(
    root_pos: jax.Array,
    root_rot: jax.Array,
    body_pos: jax.Array,
    body_rot: jax.Array,
    body_vel: jax.Array,
    body_ang_vel: jax.Array,
    ref_body_pos: jax.Array,     # [B, T, J, 3]
    ref_body_rot: jax.Array,
    ref_body_vel: jax.Array,
    ref_body_ang_vel: jax.Array,
) -> jax.Array:
    """v8 (≙ humanoid_im.py:1415-1484): diffs only against the FIRST ref
    step; full local ref pos/rot/vel/angvel for every (incl. future) step.

    Golden-tested against the reference at time_steps == 1
    (test_reference_parity.py); the reference's time_steps > 1 branch is
    unreachable as written — `local_ref_body_vel[:, 1:].view(...)` raises on
    the non-contiguous slice (humanoid_im.py:1474) — so for T > 1 this is
    the natural extension (contiguous per-step layout)."""
    B, T, J, _ = ref_body_pos.shape
    heading_inv1 = q.calc_heading_quat_inv(root_rot)[:, None, :]     # [B,1,4]
    heading1 = q.calc_heading_quat(root_rot)[:, None, :]

    diff_pos = ref_body_pos[:, 0] - body_pos
    diff_rot = q.quat_mul(ref_body_rot[:, 0], q.quat_conjugate(body_rot))
    diff_local_pos = q.quat_rotate(heading_inv1, diff_pos)
    diff_local_rot = q.quat_mul(q.quat_mul(heading_inv1, diff_rot), heading1)
    diff_vel = q.quat_rotate(heading_inv1, ref_body_vel[:, 0] - body_vel)
    diff_ang_vel = q.quat_rotate(heading_inv1, ref_body_ang_vel[:, 0] - body_ang_vel)

    heading_invT = q.calc_heading_quat_inv(root_rot)[:, None, None, :]
    local_ref_pos = q.quat_rotate(heading_invT, ref_body_pos - root_pos[:, None, None, :])
    local_ref_rot = q.quat_to_tan_norm(q.quat_mul(heading_invT, ref_body_rot))
    local_ref_vel = q.quat_rotate(heading_invT, ref_body_vel)
    local_ref_ang_vel = q.quat_rotate(heading_invT, ref_body_ang_vel)

    parts = [
        diff_local_pos.reshape(B, -1),
        q.quat_to_tan_norm(diff_local_rot).reshape(B, -1),
        diff_vel.reshape(B, -1),
        diff_ang_vel.reshape(B, -1),
        local_ref_pos.reshape(B, -1),
        local_ref_rot.reshape(B, -1),
        local_ref_vel.reshape(B, -1),
        local_ref_ang_vel.reshape(B, -1),
    ]
    return jnp.concatenate(parts, axis=-1)


def compute_imitation_observations_v9(
    root_pos: jax.Array,
    root_rot: jax.Array,
    body_pos: jax.Array,
    body_rot: jax.Array,
    body_vel: jax.Array,
    body_ang_vel: jax.Array,
    ref_body_pos: jax.Array,     # [B, T, J, 3]
    ref_body_rot: jax.Array,
    ref_root_vel: jax.Array,     # [B, T, 3]
    ref_root_ang_vel: jax.Array,
) -> jax.Array:
    """v9 (≙ humanoid_im.py:1487-1540): full-body pos/rot diffs but root-only
    velocity diffs."""
    B, T, J, _ = ref_body_pos.shape
    heading_inv = q.calc_heading_quat_inv(root_rot)[:, None, None, :]
    heading = q.calc_heading_quat(root_rot)[:, None, None, :]

    diff_local_pos = q.quat_rotate(heading_inv, ref_body_pos - body_pos[:, None])
    diff_rot = q.quat_mul(ref_body_rot, q.quat_conjugate(body_rot[:, None]))
    diff_local_rot = q.quat_mul(q.quat_mul(heading_inv, diff_rot), heading)

    heading_inv_root = q.calc_heading_quat_inv(root_rot)[:, None, :]
    diff_root_vel = q.quat_rotate(heading_inv_root, ref_root_vel - body_vel[:, None, 0])
    diff_root_ang_vel = q.quat_rotate(
        heading_inv_root, ref_root_ang_vel - body_ang_vel[:, None, 0]
    )

    local_ref_pos = q.quat_rotate(heading_inv, ref_body_pos - root_pos[:, None, None, :])
    local_ref_rot = q.quat_to_tan_norm(q.quat_mul(heading_inv, ref_body_rot))

    obs = jnp.concatenate(
        [
            diff_local_pos.reshape(B, T, -1),
            q.quat_to_tan_norm(diff_local_rot).reshape(B, T, -1),
            diff_root_vel.reshape(B, T, -1),
            diff_root_ang_vel.reshape(B, T, -1),
            local_ref_pos.reshape(B, T, -1),
            local_ref_rot.reshape(B, T, -1),
        ],
        axis=-1,
    )
    return obs.reshape(B, -1)


def compute_imitation_reward(
    body_pos: jax.Array,          # [B, J, 3]
    body_rot: jax.Array,          # [B, J, 4]
    body_vel: jax.Array,          # [B, J, 3]
    body_ang_vel: jax.Array,      # [B, J, 3]
    ref_body_pos: jax.Array,
    ref_body_rot: jax.Array,
    ref_body_vel: jax.Array,
    ref_body_ang_vel: jax.Array,
    k_pos: float = 100.0,
    k_rot: float = 10.0,
    k_vel: float = 0.1,
    k_ang_vel: float = 0.1,
    w_pos: float = 0.5,
    w_rot: float = 0.3,
    w_vel: float = 0.1,
    w_ang_vel: float = 0.1,
) -> tuple[jax.Array, jax.Array]:
    """Imitation reward (≙ humanoid_im.py:1543-1574): w·exp(-k·MSE) terms.

    Default k/w match env_im reward_specs (humanoid_im.py:55)."""
    pos_dist = jnp.mean(jnp.mean((ref_body_pos - body_pos) ** 2, axis=-1), axis=-1)
    r_pos = jnp.exp(-k_pos * pos_dist)

    diff_rot = q.quat_mul(ref_body_rot, q.quat_conjugate(body_rot))
    angle = q.quat_angle(diff_rot)
    r_rot = jnp.exp(-k_rot * jnp.mean(angle**2, axis=-1))

    vel_dist = jnp.mean(jnp.mean((ref_body_vel - body_vel) ** 2, axis=-1), axis=-1)
    r_vel = jnp.exp(-k_vel * vel_dist)

    ang_vel_dist = jnp.mean(
        jnp.mean((ref_body_ang_vel - body_ang_vel) ** 2, axis=-1), axis=-1
    )
    r_ang_vel = jnp.exp(-k_ang_vel * ang_vel_dist)

    reward = w_pos * r_pos + w_rot * r_rot + w_vel * r_vel + w_ang_vel * r_ang_vel
    reward_raw = jnp.stack([r_pos, r_rot, r_vel, r_ang_vel], axis=-1)
    return reward, reward_raw


def compute_power_penalty(
    tau: jax.Array, dof_vel: jax.Array, coefficient: float = 0.0005
) -> jax.Array:
    """Energy penalty -c * sum |tau * qvel| (≙ humanoid_im.py:910-917)."""
    return -coefficient * jnp.sum(jnp.abs(tau * dof_vel), axis=-1)


def compute_humanoid_im_reset(
    progress: jax.Array,          # [B] int
    body_pos: jax.Array,          # [B, Jr, 3] tracked reset bodies
    ref_body_pos: jax.Array,      # [B, Jr, 3]
    pass_time: jax.Array,         # [B] bool
    termination_distance: float = 0.25,
    use_mean: bool = True,
    enable_early_termination: bool = True,
    disable_collision: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Imitation termination (≙ humanoid_im.py:1600-1628): fall when the
    (mean or max) tracked-body distance to the reference exceeds the
    threshold; reset on episode end."""
    dist = jnp.linalg.norm(body_pos - ref_body_pos, axis=-1)  # [B, Jr]
    if use_mean:
        fallen = jnp.mean(dist, axis=-1) > termination_distance
    else:
        fallen = jnp.any(dist > termination_distance, axis=-1)
    fallen = fallen & (progress > 1)
    if disable_collision or not enable_early_termination:
        fallen = jnp.zeros_like(fallen)
    terminated = fallen
    reset = pass_time | terminated
    return reset, terminated


def compute_humanoid_reset(
    progress: jax.Array,
    contact_force: jax.Array,      # [B, J, 3]
    body_pos: jax.Array,           # [B, J, 3]
    non_contact_body_ids: jax.Array,  # [Jn] bodies that must not touch ground
    termination_height: float,
    max_episode_length: int,
    enable_early_termination: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Generic fall termination (≙ humanoid.py:1572-1608): a non-foot body
    has contact force AND is below the termination height."""
    cf = contact_force[:, non_contact_body_ids]
    fall_contact = jnp.any(jnp.abs(cf) > 0.1, axis=(-2, -1))
    h = body_pos[:, non_contact_body_ids, 2]
    fall_height = jnp.any(h < termination_height, axis=-1)
    fallen = fall_contact & fall_height & (progress > 1)
    if not enable_early_termination:
        fallen = jnp.zeros_like(fallen)
    reset = (progress >= max_episode_length - 1) | fallen
    return reset, fallen


def build_amp_observations_smpl(
    root_pos: jax.Array,       # [B, 3]
    root_rot: jax.Array,       # [B, 4]
    root_vel: jax.Array,       # [B, 3]
    root_ang_vel: jax.Array,   # [B, 3]
    dof_pos: jax.Array,        # [B, D]
    dof_vel: jax.Array,        # [B, D]
    key_body_pos: jax.Array,   # [B, K, 3]
    local_root_obs: bool = True,
    root_height_obs: bool = True,
    shape_params: jax.Array | None = None,        # [B, 11] gender+betas
    limb_weight_params: jax.Array | None = None,  # [B, 10]
) -> jax.Array:
    """AMP discriminator observation (≙ humanoid_amp.py:924-969):
    [root_h?, root_rot 6, local vel 3+3, dof tan-norm 2D, dof_vel D, key pos
    3K, shape 11?, limb 10?] — the trailing channels iff has_shape_obs_disc /
    has_limb_weight_obs in the reference.
    """
    heading_inv = q.calc_heading_quat_inv(root_rot)
    root_rot_obs = q.quat_mul(heading_inv, root_rot) if local_root_obs else root_rot
    root_rot_obs = q.quat_to_tan_norm(root_rot_obs)

    local_root_vel = q.quat_rotate(heading_inv, root_vel)
    local_root_ang_vel = q.quat_rotate(heading_inv, root_ang_vel)

    local_key = q.quat_rotate(
        heading_inv[:, None, :], key_body_pos - root_pos[:, None, :]
    ).reshape(root_pos.shape[0], -1)

    dof_obs = dof_to_obs_smpl(dof_pos)

    parts = []
    if root_height_obs:
        parts.append(root_pos[:, 2:3])
    parts += [root_rot_obs, local_root_vel, local_root_ang_vel, dof_obs, dof_vel, local_key]
    if shape_params is not None:
        parts.append(shape_params)
    if limb_weight_params is not None:
        parts.append(limb_weight_params)
    return jnp.concatenate(parts, axis=-1)


def build_amp_observations_smpl_v2(
    root_pos: jax.Array,       # [B, 3]
    root_rot: jax.Array,       # [B, 4]
    root_vel: jax.Array,       # [B, 3]
    root_ang_vel: jax.Array,   # [B, 3]
    dof_pos: jax.Array,        # [B, D]
    dof_vel: jax.Array,        # [B, D]
    key_body_pos: jax.Array,   # [B, K, 3]
    key_body_vel: jax.Array,   # [B, K, 3]
    local_root_obs: bool = True,
    root_height_obs: bool = True,
    shape_params: jax.Array | None = None,        # [B, 11] gender+betas
    limb_weight_params: jax.Array | None = None,  # [B, 10]
) -> jax.Array:
    """AMP disc obs v2 (≙ build_amp_observations_smpl_v2,
    humanoid_amp.py:973-1017): v1 plus heading-local KEY-BODY VELOCITIES
    inserted after the key positions (before the shape/limb channels).
    Selected by amp_obs_v == 2 in the reference's AMP envs."""
    heading_inv = q.calc_heading_quat_inv(root_rot)
    root_rot_obs = q.quat_mul(heading_inv, root_rot) if local_root_obs else root_rot
    root_rot_obs = q.quat_to_tan_norm(root_rot_obs)

    local_root_vel = q.quat_rotate(heading_inv, root_vel)
    local_root_ang_vel = q.quat_rotate(heading_inv, root_ang_vel)

    local_key = q.quat_rotate(
        heading_inv[:, None, :], key_body_pos - root_pos[:, None, :]
    ).reshape(root_pos.shape[0], -1)
    local_key_vel = q.quat_rotate(
        heading_inv[:, None, :], key_body_vel
    ).reshape(root_pos.shape[0], -1)

    dof_obs = dof_to_obs_smpl(dof_pos)

    parts = []
    if root_height_obs:
        parts.append(root_pos[:, 2:3])
    parts += [
        root_rot_obs, local_root_vel, local_root_ang_vel, dof_obs, dof_vel,
        local_key, local_key_vel,
    ]
    if shape_params is not None:
        parts.append(shape_params)
    if limb_weight_params is not None:
        parts.append(limb_weight_params)
    return jnp.concatenate(parts, axis=-1)
