"""Graded family suite: structure, v2 calibration pins, foot grounding.

The graded suite's committed value rests on two properties: (1) the levels
marked (=v2) are BIT-IDENTICAL to the corresponding make_hard_clips clip,
so graded results calibrate against the committed v2 targets, and (2) every
crouch level's feet sit at the ground (the v1 crouch bug class:
make_hard_clips docstring, clip 6)."""

import numpy as np
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.kinematics.skeleton import forward_kinematics
from pulse_tpu.motion.synthetic import make_graded_suite, make_hard_clips


@pytest.fixture(scope="module")
def suite():
    tree = load_smpl_humanoid().skeleton
    hard, hard_names = make_hard_clips(tree)
    graded, names, families = make_graded_suite(tree)
    return tree, hard, hard_names, graded, names, families


def test_structure(suite):
    _, _, _, graded, names, families = suite
    assert len(graded) == len(names) == 30
    assert sorted(families) == ["crouch", "getup", "jump", "run", "spin", "turn"]
    for fam, idx in families.items():
        assert len(idx) == 5, fam
        assert [names[i].startswith(fam) for i in idx] == [True] * 5
    # indices cover every clip exactly once
    all_idx = sorted(i for idx in families.values() for i in idx)
    assert all_idx == list(range(30))


V2_PINS = {
    "fast_run": "run_3.5ms",
    "spin": "spin_0.67rps",
    "jump": "jump_0.3m",
    "getup_supine": "getup_3s",
    "sharp_turns": "turn_0.25s",
    "crouch_walk": "crouch_1x",
}


def test_v2_calibration_levels_bit_identical(suite):
    _, hard, hard_names, graded, names, _ = suite
    for v2_name, graded_name in V2_PINS.items():
        a = hard[hard_names.index(v2_name)]
        b = graded[names.index(graded_name)]
        assert a["fps"] == b["fps"]
        np.testing.assert_array_equal(
            a["local_rotation"], b["local_rotation"], err_msg=v2_name
        )
        np.testing.assert_array_equal(
            a["root_translation"], b["root_translation"], err_msg=v2_name
        )


def test_crouch_levels_feet_grounded(suite):
    tree, _, _, graded, names, families = suite
    feet = [i for i, n in enumerate(tree.node_names)
            if "Ankle" in n or "Toe" in n or "Foot" in n]
    for i in families["crouch"]:
        c = graded[i]
        _, gpos = forward_kinematics(
            tree, c["local_rotation"], c["root_translation"]
        )
        lowest = np.median(np.asarray(gpos)[:, feet, 2].min(axis=1))
        assert abs(lowest - 0.02) < 0.02, (names[i], lowest)


def test_difficulty_monotone_turn_family(suite):
    """Harder turn levels have strictly larger peak heading-rate."""
    _, _, _, graded, names, families = suite
    rates = []
    for i in families["turn"]:
        c = graded[i]
        q = c["local_rotation"][:, 0]  # root quat xyzw, yaw-only
        yaw = 2 * np.arctan2(q[:, 2], q[:, 3])
        dyaw = np.abs(np.diff(np.unwrap(yaw))) * c["fps"]
        rates.append(dyaw.max())
    assert all(b > a for a, b in zip(rates, rates[1:])), rates
