"""Pose streaming server/client roundtrip."""

import numpy as np

from pulse_tpu.utils.pose_server import PoseClient, PoseServer


class TestPoseServer:
    def test_roundtrip(self):
        server = PoseServer(port=0)
        client = PoseClient(port=server.port)
        import time

        time.sleep(0.3)  # let the server register the client
        frame = {"t": 0.0, "body_pos": np.zeros((3, 3)).tolist()}
        server.publish(frame)
        got = client.recv()
        assert got["t"] == 0.0
        assert len(got["body_pos"]) == 3

        client.send({"cmd": "pose", "root": [0, 0, 1]})
        time.sleep(0.3)
        cmd = server.poll_command()
        assert cmd is not None and cmd["cmd"] == "pose"
        client.close()
        server.close()

    def test_motion_switch_command(self):
        """The demo loop's clip-switch command (scripts/demo_server.py):
        a {"cmd": "motion"} request resets the env onto the chosen clip."""
        import time

        import jax
        import jax.numpy as jnp

        from pulse_tpu.assets import load_smpl_humanoid
        from pulse_tpu.env import EnvConfig, HumanoidImEnv
        from pulse_tpu.motion import build_motion_data
        from pulse_tpu.motion.synthetic import make_synthetic_clips
        from pulse_tpu.physics import PhysicsConfig, build_model

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig(substeps=1, control_freq_inv=1))
        clips = make_synthetic_clips(spec.skeleton, num_clips=3, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(model, motion, EnvConfig())

        server = PoseServer(port=0)
        client = PoseClient(port=server.port)
        time.sleep(0.3)
        client.send({"cmd": "motion", "id": 2, "time": 0.5})
        time.sleep(0.3)
        cmd = server.poll_command()
        assert cmd["cmd"] == "motion"

        # the handler from demo_server.py's loop
        mid = jnp.asarray([int(cmd.get("id", 0)) % int(env.motion.num_motions)])
        t0 = jnp.asarray([float(cmd.get("time", 0.0))])
        state = env.reset_to(jax.random.split(jax.random.PRNGKey(0), 1), mid, t0)
        assert int(state.motion_id[0]) == 2
        np.testing.assert_allclose(float(state.start_time[0]), 0.5)
        client.close()
        server.close()
