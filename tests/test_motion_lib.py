"""MotionLib tests: frame blending, sampling, PMCP weights, FK consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu import ops
from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.kinematics import forward_kinematics
from pulse_tpu.motion import (
    build_motion_data,
    get_motion_state,
    make_synthetic_clips,
    sample_motions,
    sample_time,
    update_hard_sampling_weight,
    update_soft_sampling_weight,
)


def small_lib():
    tree = load_smpl_humanoid().skeleton
    clips = make_synthetic_clips(tree, num_clips=3, seconds=2.0)
    return tree, clips, build_motion_data(tree, clips)


class TestMotionData:
    def test_shapes(self):
        tree, clips, data = small_lib()
        F = sum(c["local_rotation"].shape[0] for c in clips)
        assert data.gts.shape == (F, 24, 3)
        assert data.grs.shape == (F, 24, 4)
        assert data.dvs.shape == (F, 69)
        assert data.num_motions == 3

    def test_state_at_frame_time_matches_fk(self):
        tree, clips, data = small_lib()
        ids = jnp.asarray([1, 1])
        times = jnp.asarray([0.0, 10 / 30.0])  # exact frame times
        st = get_motion_state(data, ids, times)
        lr = jnp.asarray(clips[1]["local_rotation"][[0, 10]])
        rt = jnp.asarray(clips[1]["root_translation"][[0, 10]])
        g_rot, g_pos = forward_kinematics(tree, lr, rt)
        np.testing.assert_allclose(st["rg_pos"], g_pos, atol=1e-4)
        dot = np.abs(np.sum(np.asarray(st["rb_rot"]) * np.asarray(g_rot), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)
        np.testing.assert_allclose(st["root_pos"], rt, atol=1e-4)

    def test_blend_halfway(self):
        tree, clips, data = small_lib()
        ids = jnp.asarray([0])
        dt = 1.0 / 30.0
        st0 = get_motion_state(data, ids, jnp.asarray([3 * dt]))
        st1 = get_motion_state(data, ids, jnp.asarray([4 * dt]))
        mid = get_motion_state(data, ids, jnp.asarray([3.5 * dt]))
        np.testing.assert_allclose(
            mid["rg_pos"], 0.5 * (st0["rg_pos"] + st1["rg_pos"]), atol=1e-4
        )

    def test_time_clamped_to_length(self):
        tree, clips, data = small_lib()
        ids = jnp.asarray([0])
        st_end = get_motion_state(data, ids, jnp.asarray([100.0]))
        last = clips[0]["root_translation"][-1]
        np.testing.assert_allclose(st_end["root_pos"][0], last, atol=1e-4)

    def test_dof_pos_matches_local_rot(self):
        tree, clips, data = small_lib()
        st = get_motion_state(data, jnp.asarray([2]), jnp.asarray([0.0]))
        lr = jnp.asarray(clips[2]["local_rotation"][0, 1:])
        want = ops.quat_to_exp_map(lr).reshape(-1)
        np.testing.assert_allclose(st["dof_pos"][0], want, atol=1e-4)

    def test_jit_get_state(self):
        tree, clips, data = small_lib()
        f = jax.jit(get_motion_state)
        st = f(data, jnp.asarray([0, 1, 2]), jnp.asarray([0.1, 0.5, 1.0]))
        assert st["rg_pos"].shape == (3, 24, 3)
        assert np.all(np.isfinite(np.asarray(st["rg_pos"])))


class TestSampling:
    def test_sample_motions_respects_prob(self):
        tree, clips, data = small_lib()
        data = data.replace(sampling_prob=jnp.asarray([0.0, 1.0, 0.0]))
        ids = sample_motions(jax.random.PRNGKey(0), data, 256)
        assert np.all(np.asarray(ids) == 1)

    def test_sample_time_range(self):
        tree, clips, data = small_lib()
        ids = sample_motions(jax.random.PRNGKey(1), data, 64)
        t = sample_time(jax.random.PRNGKey(2), data, ids)
        lengths = np.asarray(data.motion_lengths)[np.asarray(ids)]
        assert np.all(np.asarray(t) >= 0) and np.all(np.asarray(t) <= lengths + 1e-6)

    def test_pmcp_hard(self):
        tree, clips, data = small_lib()
        d2 = update_hard_sampling_weight(data, jnp.asarray([False, True, True]))
        np.testing.assert_allclose(d2.sampling_prob, [0.0, 0.5, 0.5], atol=1e-6)
        d3 = update_hard_sampling_weight(data, jnp.asarray([False, False, False]))
        np.testing.assert_allclose(d3.sampling_prob, np.full(3, 1 / 3), atol=1e-6)

    def test_pmcp_soft(self):
        tree, clips, data = small_lib()
        d2 = update_soft_sampling_weight(data, jnp.asarray([1.0, 3.0, 0.0]))
        np.testing.assert_allclose(d2.sampling_prob, [0.25, 0.75, 0.0], atol=1e-6)


class TestBatchedBuildGrouping:
    """The grouped (T, fps) batched build must preserve clip order exactly.

    Clips with mixed lengths and frame rates land in different vmap groups
    and are stitched back by index; a scramble here would silently corrupt
    every downstream gather (reference analogue: the per-clip multiprocess
    load order, motion_lib_base.py:179-323)."""

    def test_heterogeneous_clips_match_single_builds(self):
        tree = load_smpl_humanoid().skeleton
        a = make_synthetic_clips(tree, num_clips=2, seconds=1.0, fps=30.0, seed=0)
        b = make_synthetic_clips(tree, num_clips=1, seconds=1.5, fps=30.0, seed=1)
        c = make_synthetic_clips(tree, num_clips=2, seconds=1.0, fps=15.0, seed=2)
        # interleave so group ids are non-contiguous: [a0, c0, b0, a1, c1]
        clips = [a[0], c[0], b[0], a[1], c[1]]
        data = build_motion_data(tree, clips)
        F = sum(cl["local_rotation"].shape[0] for cl in clips)
        assert data.gts.shape[0] == F
        starts = np.asarray(data.length_starts)
        nframes = np.asarray(data.motion_num_frames)
        np.testing.assert_array_equal(
            nframes, [cl["local_rotation"].shape[0] for cl in clips]
        )
        np.testing.assert_array_equal(starts, np.cumsum([0, *nframes[:-1]]))
        for i, cl in enumerate(clips):
            single = build_motion_data(tree, [cl])
            sl = slice(int(starts[i]), int(starts[i]) + int(nframes[i]))
            for field in ("gts", "grs", "gvs", "gavs", "lrs", "dvs"):
                np.testing.assert_allclose(
                    np.asarray(getattr(data, field)[sl]),
                    np.asarray(getattr(single, field)),
                    atol=5e-3, rtol=1e-4,
                    err_msg=f"clip {i} field {field} scrambled by grouping",
                )
            np.testing.assert_allclose(
                float(data.motion_lengths[i]), float(single.motion_lengths[0])
            )
