"""TCP server speaking the SIBR remote-viewer protocol.

Server-side equivalent of the reference's gaussian_renderer/network_gui.py:
18-86 (plus the polling block at reference train.py:74-87), so the stock
SIBR remote viewer can watch TPU training live:

  wire in : [4-byte LE length][JSON] with camera pose/fov/flags; matrices
            arrive in the torch-3DGS transposed layout with columns 1,2
            negated — undone here to build our row-convention Camera.
  wire out: raw H*W*3 RGB bytes of the rendered frame, then
            [4-byte LE length][ascii training-state string].

State lives in a ViewerServer object instead of module globals, and the
render is a jitted call cached per viewer resolution.
"""

from __future__ import annotations

import json
import socket
import traceback

import numpy as np


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host, self.port = host, port
        self.conn = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    # --- low-level wire ops (reference network_gui.py:34-55) -----------
    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except Exception:
            pass
        return self.conn is not None

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def read(self) -> dict:
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def send(self, image_bytes: bytes | None, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """Parse one viewer message into (Camera|None, flags dict)."""
        from gslm_tpu.models.cameras import Camera

        msg = self.read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, {}
        flags = {
            "do_training": bool(msg["train"]),
            "keep_alive": bool(msg["keep_alive"]),
            "scaling_modifier": float(msg["scaling_modifier"]),
        }
        import jax.numpy as jnp
        import math

        # undo the torch layout: transpose + re-negate columns 1, 2
        wv_t = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv_t[:, 1] = -wv_t[:, 1]
        wv_t[:, 2] = -wv_t[:, 2]
        fp_t = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        fp_t[:, 1] = -fp_t[:, 1]
        world_view = wv_t.T
        campos = np.linalg.inv(world_view)[:3, 3]
        cam = Camera(world_view=jnp.asarray(world_view),
                     full_proj=jnp.asarray(fp_t.T),
                     campos=jnp.asarray(campos),
                     tanfovx=jnp.float32(math.tan(msg["fov_x"] * 0.5)),
                     tanfovy=jnp.float32(math.tan(msg["fov_y"] * 0.5)),
                     exposure_idx=jnp.int32(0), height=height, width=width)
        return cam, flags

    def disconnect(self):
        if self.conn is not None:
            try:
                self.conn.close()
            except Exception:
                pass
        self.conn = None

    # --- training-loop integration (reference train.py:74-87) ----------
    def poll(self, params, aux, bg, *, rcfg, active_sh_degree, source_path,
             training_done: bool = False):
        """Serve viewer frames until the viewer releases training — the
        reference's per-iteration polling block (train.py:74-87): render
        each requested pose; break back into training when the viewer asks
        for training and training isn't finished (or it dropped keep_alive).
        """
        import jax.numpy as jnp

        from gslm_tpu.renderer import render_jit

        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, flags = self.receive()
                img_bytes = None
                if cam is not None:
                    out = render_jit(params, cam, bg, config=rcfg,
                                     active_sh_degree=active_sh_degree,
                                     scaling_modifier=flags["scaling_modifier"],
                                     alive=aux.alive)
                    arr = np.asarray(jnp.clip(out.render, 0, 1) * 255
                                     ).astype(np.uint8).transpose(1, 2, 0)
                    img_bytes = memoryview(np.ascontiguousarray(arr))
                self.send(img_bytes, source_path)
                if flags.get("do_training", True) and (
                        not training_done or not flags.get("keep_alive", False)):
                    break
            except Exception:
                traceback.print_exc()
                self.disconnect()
