"""SIBR-compatible remote viewer protocol server.

Wire-format-compatible with ref:gaussian_renderer/network_gui.py:24-86:
non-blocking TCP listener; requests are 4-byte little-endian
length-prefixed JSON carrying resolution, fovs, view/projection matrices
(row-vector convention, Y/Z flipped) and training flags; replies are raw
HxWx3 bytes followed by a length-prefixed verification string.
"""

from __future__ import annotations

import json
import socket
from typing import Optional, Tuple

import numpy as np

from goi_tpu.core.camera import Camera


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self) -> bool:
        if self.conn is not None:
            return True
        try:
            self.conn, addr = self.listener.accept()
            self.conn.settimeout(None)
            print(f"\nConnected by {addr}")
            return True
        except (BlockingIOError, socket.timeout, OSError):
            return False

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self) -> Tuple[Optional[Camera], dict]:
        """Returns (camera or None, flags dict). Matches the reference's
        message fields and the Y/Z column flips
        (ref:network_gui.py:57-86)."""
        length = int.from_bytes(self._read_exact(4), "little")
        msg = json.loads(self._read_exact(length).decode("utf-8"))

        width = msg["resolution_x"]
        height = msg["resolution_y"]
        flags = {
            "train": bool(msg.get("train", False)),
            "shs_python": bool(msg.get("shs_python", False)),
            "rot_scale_python": bool(msg.get("rot_scale_python", False)),
            "keep_alive": bool(msg.get("keep_alive", True)),
            "scaling_modifier": msg.get("scaling_modifier", 1.0),
        }
        if width == 0 or height == 0:
            return None, flags

        # wire matrices are the transposed (row-vector) forms with the
        # SIBR viewer's Y/Z sign convention
        wv = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] = -wv[:, 1]
        wv[:, 2] = -wv[:, 2]
        fp = np.array(msg["view_projection_matrix"],
                      np.float32).reshape(4, 4)
        fp[:, 1] = -fp[:, 1]
        world_view = wv.T          # -> math (column-vector) W2C
        full_proj = fp.T
        import jax.numpy as jnp
        import math as _m
        cam = Camera(
            world_view=jnp.asarray(world_view),
            full_proj=jnp.asarray(full_proj),
            camera_center=jnp.asarray(
                np.linalg.inv(world_view)[:3, 3].astype(np.float32)),
            tan_fovx=jnp.float32(_m.tan(msg["fov_x"] * 0.5)),
            tan_fovy=jnp.float32(_m.tan(msg["fov_y"] * 0.5)),
            width=int(width), height=int(height),
        )
        return cam, flags

    def send(self, image: Optional[np.ndarray], verify: str) -> None:
        """image: (H, W, 3) uint8 or None (ref:network_gui.py:50-55)."""
        if image is not None:
            self.conn.sendall(np.ascontiguousarray(image).tobytes())
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def drop(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None

    def serve_step(self, render_fn, verify: str) -> dict:
        """One poll/serve iteration of the training-loop integration
        (ref:train.py:97-111): accepts a connection if pending, renders
        the requested view, replies, swallows socket errors by dropping
        the connection."""
        flags = {}
        if not self.try_connect():
            return flags
        try:
            cam, flags = self.receive()
            img = None
            if cam is not None:
                out = render_fn(cam, flags["scaling_modifier"])
                img = np.asarray(
                    np.clip(np.asarray(out) * 255, 0, 255)
                    .astype(np.uint8))
                if img.shape[0] == 3:
                    img = img.transpose(1, 2, 0)
            self.send(img, verify)
        except (ConnectionError, OSError, json.JSONDecodeError):
            self.drop()
        return flags
