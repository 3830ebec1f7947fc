"""Pose streaming server/client — the demo/server mode.

≙ the reference's websocket server mode (base_task.py:128-130,254-316
talk/video_stream threads) and the pose-driven demo clients
(scripts/demo/video_to_pose_server.py, scripts/ws_client.py): a background
TCP thread streams newline-delimited JSON frames (body positions/rotations)
to connected viewers, and can receive driving poses (e.g. from a video
pose-estimator) that the sim consumes as reference states.

Stdlib-only (socket + threading) so it works in hermetic environments.
"""

from __future__ import annotations

import json
import queue
import socket
import threading


class PoseServer:
    """Non-blocking broadcast server; call `publish(frame_dict)` per step."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8765):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        self._clients: list[socket.socket] = []
        self._inbox: "queue.Queue[dict]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self):
        self._sock.settimeout(0.25)
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            conn.setblocking(True)
            self._clients.append(conn)
            threading.Thread(
                target=self._recv_loop, args=(conn,), daemon=True
            ).start()

    def _recv_loop(self, conn: socket.socket):
        buf = b""
        while not self._stop.is_set():
            try:
                data = conn.recv(65536)
            except OSError:
                return
            if not data:
                return
            buf += data
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                try:
                    self._inbox.put(json.loads(line))
                except json.JSONDecodeError:
                    pass

    def publish(self, frame: dict) -> None:
        payload = (json.dumps(frame) + "\n").encode()
        dead = []
        for c in self._clients:
            try:
                c.sendall(payload)
            except OSError:
                dead.append(c)
        for c in dead:
            self._clients.remove(c)

    def poll_command(self) -> dict | None:
        """Latest driving pose/command from any client, if one arrived."""
        cmd = None
        while not self._inbox.empty():
            cmd = self._inbox.get_nowait()
        return cmd

    def close(self) -> None:
        self._stop.set()
        for c in self._clients:
            c.close()
        self._sock.close()


class PoseClient:
    """Blocking line-JSON client (≙ scripts/ws_client.py)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8765):
        self._sock = socket.create_connection((host, port))
        self._buf = b""

    def send(self, obj: dict) -> None:
        self._sock.sendall((json.dumps(obj) + "\n").encode())

    def recv(self) -> dict:
        while b"\n" not in self._buf:
            data = self._sock.recv(65536)
            if not data:
                raise ConnectionError("server closed")
            self._buf += data
        line, self._buf = self._buf.split(b"\n", 1)
        return json.loads(line)

    def close(self) -> None:
        self._sock.close()
