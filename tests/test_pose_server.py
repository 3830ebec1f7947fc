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
