"""Left/right mirroring: FK symmetry checks."""

import numpy as np
import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.kinematics import forward_kinematics
from pulse_tpu.motion import make_synthetic_clips
from pulse_tpu.motion.mirror import mirror_clip, mirror_index


class TestMirror:
    def test_index_swaps_lr(self):
        tree = load_smpl_humanoid().skeleton
        idx = mirror_index(tree)
        names = tree.node_names
        assert idx[names.index("L_Hip")] == names.index("R_Hip")
        assert idx[names.index("R_Wrist")] == names.index("L_Wrist")
        assert idx[names.index("Pelvis")] == names.index("Pelvis")

    def test_fk_mirror_symmetry(self):
        """Mirrored motion's FK must be the reflection of the original FK
        with left/right bodies swapped."""
        tree = load_smpl_humanoid().skeleton
        clip = make_synthetic_clips(tree, num_clips=1, seconds=0.5)[0]
        m = mirror_clip(tree, clip)

        _, pos = forward_kinematics(
            tree, jnp.asarray(clip["local_rotation"][5]),
            jnp.asarray(clip["root_translation"][5]),
        )
        _, pos_m = forward_kinematics(
            tree, jnp.asarray(m["local_rotation"][5]),
            jnp.asarray(m["root_translation"][5]),
        )
        idx = mirror_index(tree)
        reflected = np.asarray(pos).copy()
        reflected[:, 1] *= -1.0
        # the SMPL mean skeleton is not exactly bilaterally symmetric (bone
        # offsets differ by a few mm between sides), so mirroring is
        # approximate — exactly as in the reference's mirror augmentation
        np.testing.assert_allclose(np.asarray(pos_m), reflected[idx], atol=0.08)
        # and much closer than not mirroring at all
        err_mirror = np.abs(np.asarray(pos_m) - reflected[idx]).max()
        err_none = np.abs(np.asarray(pos_m) - np.asarray(pos)).max()
        assert err_mirror < err_none
