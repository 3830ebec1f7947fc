"""Device-resident motion library.

Re-designs the reference MotionLib (phc/utils/motion_lib_base.py:114-563) the
TPU way: all frames of all clips live concatenated in flat device arrays with
per-clip `length_starts` offsets, and every query — time-indexed two-frame
lerp/slerp state lookup, categorical clip sampling, PMCP weight updates — is a
pure jittable function of (MotionData, ids, times). Queries are pure gathers
plus elementwise blends, which XLA fuses into the surrounding env step; there
is no host round-trip anywhere on the hot path.

Frame layout per clip (computed once at load):
  gts  [F, J, 3]  global body positions        (FK of the clip)
  grs  [F, J, 4]  global body rotations (xyzw)
  gvs  [F, J, 3]  world linear velocities      (smoothed central difference)
  gavs [F, J, 3]  world angular velocities
  lrs  [F, J, 4]  local joint rotations
  dvs  [F, D]     dof velocities (local exp-map rate, finite difference,
                   ≙ motion_lib_base.py:56-70)
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.ops import quat as q
from pulse_tpu.kinematics.skeleton import (
    SkeletonTree,
    forward_kinematics,
    compute_angular_velocity,
    compute_linear_velocity,
)


@struct.dataclass
class MotionData:
    """Flat device-resident motion store (a pytree; shardable/donatable)."""

    gts: jax.Array      # [F, J, 3]
    grs: jax.Array      # [F, J, 4]
    gvs: jax.Array      # [F, J, 3]
    gavs: jax.Array     # [F, J, 3]
    lrs: jax.Array      # [F, J, 4]
    dvs: jax.Array      # [F, D]
    length_starts: jax.Array   # [M] first frame index of each clip
    motion_lengths: jax.Array  # [M] seconds
    motion_num_frames: jax.Array  # [M]
    motion_fps: jax.Array      # [M]
    motion_dt: jax.Array       # [M]
    sampling_prob: jax.Array   # [M] categorical clip-sampling distribution
    # per-clip body-shape conditioning (≙ motion_bodies/motion_limb_weights
    # in the reference's get_motion_state, motion_lib_base.py:434-517):
    # [gender, betas(10)] from the source pkl and the 10 limb length/mass
    # group sums; zeros for clips without shape data (synthetic store)
    shape_params: jax.Array = None    # [M, 11]
    limb_weights: jax.Array = None    # [M, 10]

    @property
    def num_motions(self) -> int:
        return self.length_starts.shape[0]

    @property
    def num_frames_total(self) -> int:
        return self.gts.shape[0]


# --------------------------------------------------------------------------- #
# loading
# --------------------------------------------------------------------------- #

def _compute_dof_vels(local_rot: jax.Array, fps: float) -> jax.Array:
    """Local joint angular velocity as exp-map rate (motion_lib_base.py:56-70).

    dof_vel[t] = exp_map(q_t^-1 * q_{t+1}) * fps, last frame repeated.
    """
    diff = q.quat_mul_norm(q.quat_inverse(local_rot[:-1]), local_rot[1:])
    vel = q.quat_to_exp_map(diff) * fps
    return jnp.concatenate([vel, vel[-1:]], axis=0)


def randomize_clip_heading(clip: dict, yaw: float) -> dict:
    """Rotate a whole clip by a random yaw about its start position
    (≙ the per-clip heading-rotation augmentation in
    motion_lib_smpl.py:131-140)."""
    import numpy as _np

    lr = _np.asarray(clip["local_rotation"]).copy()
    rt = _np.asarray(clip["root_translation"]).copy()
    c, s = _np.cos(yaw), _np.sin(yaw)
    qz = _np.asarray([0.0, 0.0, _np.sin(yaw / 2), _np.cos(yaw / 2)], _np.float32)
    # rotate root orientations
    x, y, z, w = lr[:, 0, 0], lr[:, 0, 1], lr[:, 0, 2], lr[:, 0, 3]
    qx, qy, qz_, qw = qz
    lr[:, 0, 0] = qw * x + qx * w + qy * z - qz_ * y
    lr[:, 0, 1] = qw * y + qy * w + qz_ * x - qx * z
    lr[:, 0, 2] = qw * z + qz_ * w + qx * y - qy * x
    lr[:, 0, 3] = qw * w - qx * x - qy * y - qz_ * z
    # rotate translations about the first frame's xy
    origin = rt[0, 0:2].copy()
    rel = rt[:, 0:2] - origin
    rt[:, 0] = origin[0] + c * rel[:, 0] - s * rel[:, 1]
    rt[:, 1] = origin[1] + s * rel[:, 0] + c * rel[:, 1]
    return {"fps": clip["fps"], "local_rotation": lr, "root_translation": rt}


def build_motion_data(
    tree: SkeletonTree,
    clips: Sequence[dict[str, Any]],
    sampling_prob: np.ndarray | None = None,
    random_heading_seed: int | None = None,
) -> MotionData:
    """Build the flat device store from per-clip kinematic data.

    Each clip dict: {"fps": float, "local_rotation": [T, J, 4] xyzw,
    "root_translation": [T, 3]}. FK + velocity computation run batched —
    clips are grouped by (T, fps) and each group runs as ONE jitted+vmapped
    device program (chunked to bound memory) — the analogue of the
    reference's multiprocess per-clip load (motion_lib_base.py:179-323).
    Per-clip eager dispatch does not scale: a 10k-clip AMASS-size store
    would mean ~1e6 device round-trips through the TPU tunnel.
    """
    if random_heading_seed is not None:
        rng = np.random.default_rng(random_heading_seed)
        clips = [
            randomize_clip_heading(c, rng.uniform(-np.pi, np.pi)) for c in clips
        ]

    def clip_tensors(lr, rt, fps):
        g_rot, g_pos = forward_kinematics(tree, lr, rt)
        gvs = compute_linear_velocity(g_pos, fps)
        gavs = compute_angular_velocity(g_rot, fps)
        dvs = _compute_dof_vels(lr[:, 1:], fps).reshape(lr.shape[0], -1)
        return g_pos, g_rot, gvs, gavs, dvs

    groups: dict[tuple[int, float], list[int]] = {}
    for i, clip in enumerate(clips):
        T = int(np.asarray(clip["local_rotation"]).shape[0])
        groups.setdefault((T, float(clip["fps"])), []).append(i)

    M = len(clips)
    per_clip: list[tuple | None] = [None] * M
    for (T, fps), idx in groups.items():
        batched = jax.jit(jax.vmap(lambda lr, rt: clip_tensors(lr, rt, fps)))
        # chunk so one dispatch stays a few hundred MB of intermediates
        chunk = max(1, (1 << 24) // max(T * tree.num_joints, 1))
        for lo in range(0, len(idx), chunk):
            ids = idx[lo : lo + chunk]
            lr = np.stack(
                [np.asarray(clips[i]["local_rotation"], np.float32) for i in ids]
            )
            rt = np.stack(
                [np.asarray(clips[i]["root_translation"], np.float32) for i in ids]
            )
            out = jax.device_get(batched(jnp.asarray(lr), jnp.asarray(rt)))
            for k, i in enumerate(ids):
                per_clip[i] = tuple(a[k] for a in out) + (lr[k],)

    gts_l, grs_l, gvs_l, gavs_l, dvs_l, lrs_l = map(list, zip(*per_clip))
    lengths, nframes, fps_l = [], [], []
    for clip in clips:
        T = int(np.asarray(clip["local_rotation"]).shape[0])
        fps = float(clip["fps"])
        nframes.append(T); fps_l.append(fps); lengths.append((T - 1) / fps)

    nframes = np.asarray(nframes, np.int32)
    starts = np.concatenate([[0], np.cumsum(nframes)[:-1]]).astype(np.int32)
    M = len(clips)
    prob = (
        np.full(M, 1.0 / M, np.float32)
        if sampling_prob is None
        else np.asarray(sampling_prob, np.float32)
    )
    shape_rows = np.stack(
        [
            np.asarray(c.get("shape_params", np.zeros(11)), np.float32)
            for c in clips
        ]
    )
    limb_rows = np.stack(
        [
            np.asarray(c.get("limb_weights", np.zeros(10)), np.float32)
            for c in clips
        ]
    )
    return MotionData(
        shape_params=jnp.asarray(shape_rows),
        limb_weights=jnp.asarray(limb_rows),
        # host-side concatenation + one upload per field: a device-side
        # concatenate over thousands of per-clip arrays is itself a huge trace
        gts=jnp.asarray(np.concatenate(gts_l)),
        grs=jnp.asarray(np.concatenate(grs_l)),
        gvs=jnp.asarray(np.concatenate(gvs_l)),
        gavs=jnp.asarray(np.concatenate(gavs_l)),
        lrs=jnp.asarray(np.concatenate(lrs_l)),
        dvs=jnp.asarray(np.concatenate(dvs_l)),
        length_starts=jnp.asarray(starts),
        motion_lengths=jnp.asarray(lengths, jnp.float32),
        motion_num_frames=jnp.asarray(nframes),
        motion_fps=jnp.asarray(fps_l, jnp.float32),
        motion_dt=jnp.asarray(1.0 / np.asarray(fps_l), jnp.float32),
        sampling_prob=jnp.asarray(prob),
    )


# --------------------------------------------------------------------------- #
# sampling
# --------------------------------------------------------------------------- #

def sample_motions(
    key: jax.Array, data: MotionData, n: int, prob: jax.Array | None = None
) -> jax.Array:
    """Categorical clip sampling by PMCP weights (motion_lib_base.py:395-398).

    `prob` overrides the store's baked-in distribution: threading the live
    PMCP weights ([M] device array) through the jitted train step makes
    update_{hard,soft}_sampling_weight a device write instead of a retrace
    (≙ motion_lib_base.py:378-384, where it is a plain tensor assignment)."""
    p = data.sampling_prob if prob is None else prob
    return jax.random.categorical(key, jnp.log(p + 1e-12), shape=(n,))


def sample_time(
    key: jax.Array, data: MotionData, motion_ids: jax.Array, truncate_time: float = 0.0
) -> jax.Array:
    """Uniform phase sampling over (possibly truncated) clip length."""
    phase = jax.random.uniform(key, motion_ids.shape)
    motion_len = jnp.maximum(data.motion_lengths[motion_ids] - truncate_time, 0.0)
    return phase * motion_len


def sample_time_interval(
    key: jax.Array, data: MotionData, motion_ids: jax.Array, truncate_time: float = 0.0
) -> jax.Array:
    """Time sampling snapped to the 30 Hz control grid (motion_lib_base.py:411-420)."""
    t = sample_time(key, data, motion_ids, truncate_time)
    dt = 1.0 / 30.0
    return jnp.floor(t / dt) * dt


# --------------------------------------------------------------------------- #
# state query
# --------------------------------------------------------------------------- #

def _calc_frame_blend(time, length, num_frames, dt):
    """Two-frame index + blend factor (motion_lib_base.py:546-556 semantics)."""
    phase = jnp.clip(time / jnp.maximum(length, 1e-6), 0.0, 1.0)
    time = jnp.maximum(time, 0.0)
    f0 = (phase * (num_frames - 1)).astype(jnp.int32)
    f1 = jnp.minimum(f0 + 1, num_frames - 1)
    blend = jnp.clip((time - f0.astype(time.dtype) * dt) / dt, 0.0, 1.0)
    return f0, f1, blend


def get_motion_state(
    data: MotionData,
    motion_ids: jax.Array,
    motion_times: jax.Array,
    offset: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Blended reference state at arbitrary times (motion_lib_base.py:434-517).

    Lerp for positions/velocities, slerp for rotations; dof_pos is the exp-map
    of the slerped local joint rotations. Everything is gathers + elementwise.
    """
    length = data.motion_lengths[motion_ids]
    num_frames = data.motion_num_frames[motion_ids]
    dt = data.motion_dt[motion_ids]
    f0, f1, blend = _calc_frame_blend(motion_times, length, num_frames, dt)
    f0l = f0 + data.length_starts[motion_ids]
    f1l = f1 + data.length_starts[motion_ids]

    b1 = blend[..., None]          # [B, 1]
    b2 = blend[..., None, None]    # [B, 1, 1]

    rg_pos = (1.0 - b2) * data.gts[f0l] + b2 * data.gts[f1l]
    if offset is not None:
        rg_pos = rg_pos + offset[..., None, :]
    body_vel = (1.0 - b2) * data.gvs[f0l] + b2 * data.gvs[f1l]
    body_ang_vel = (1.0 - b2) * data.gavs[f0l] + b2 * data.gavs[f1l]
    dof_vel = (1.0 - b1) * data.dvs[f0l] + b1 * data.dvs[f1l]

    local_rot = q.slerp(data.lrs[f0l], data.lrs[f1l], b2)
    rb_rot = q.slerp(data.grs[f0l], data.grs[f1l], b2)
    dof_pos = q.quat_to_exp_map(local_rot[..., 1:, :]).reshape(*motion_ids.shape, -1)

    return {
        "root_pos": rg_pos[..., 0, :],
        "root_rot": rb_rot[..., 0, :],
        "dof_pos": dof_pos,
        "root_vel": body_vel[..., 0, :],
        "root_ang_vel": body_ang_vel[..., 0, :],
        "dof_vel": dof_vel,
        "rg_pos": rg_pos,
        "rb_rot": rb_rot,
        "body_vel": body_vel,
        "body_ang_vel": body_ang_vel,
        "local_rot": local_rot,
    }


# --------------------------------------------------------------------------- #
# PMCP adaptive sampling (≙ motion_lib_base.py:348-384)
# --------------------------------------------------------------------------- #

def update_hard_sampling_weight(data: MotionData, failed_ids: jax.Array) -> MotionData:
    """Hard-negative mining: sample only clips that failed evaluation.

    failed_ids: [M] bool mask. If nothing failed, falls back to uniform.
    """
    any_failed = jnp.any(failed_ids)
    M = data.num_motions
    prob = jnp.where(failed_ids, 1.0, 0.0)
    prob = jnp.where(any_failed, prob / jnp.maximum(prob.sum(), 1e-9), jnp.full((M,), 1.0 / M))
    return data.replace(sampling_prob=prob)


def update_soft_sampling_weight(
    data: MotionData, termination_history: jax.Array
) -> MotionData:
    """Soft PMCP: weight clips by their termination counts; uniform if clean."""
    total = termination_history.sum()
    M = data.num_motions
    prob = jnp.where(
        total > 0,
        termination_history / jnp.maximum(total, 1e-9),
        jnp.full((M,), 1.0 / M),
    )
    return data.replace(sampling_prob=prob)
