"""Wire-level protocol test for the legacy TCP bridge
(``cli/unity_server.py``), matching the reference client contract
(``/root/reference/python/src/unity.py:69-112``): the client sends one
window of 64 frames x 6 sparse joints x 7 little-endian float32
(pos x,y,z + quat w,x,y,z) and receives 22 joints x 4 float32 parent-local
wxyz rotations of the last reconstructed pose."""

import socket
import struct
import threading

import numpy as np
import pytest

from conftest import REFERENCE_MODEL

WINDOW = 64
N_SPARSE = 6
N_JOINTS = 22


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def sparse_window(example_bvh_path):
    """A reference-format window built from real motion: the sparse joints'
    local rotations (unit quats) + global root positions from example.bvh."""
    from dragposer_tpu import config as cfg
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH

    bvh = BVH().load(example_bvh_path)
    rots, pos, _, _, _ = encoding.info_from_bvh(bvh)
    sparse = cfg.VAE_PARAM["sparse_joints"]
    frames = slice(1000, 1000 + WINDOW)
    buf = np.zeros((WINDOW, N_SPARSE, 7), np.float32)
    buf[:, :, :3] = pos[frames][:, sparse, :]
    buf[:, :, 3:] = rots[frames][:, sparse, :]
    return buf


def test_unity_server_round_trip(example_bvh_path, sparse_window):
    from dragposer_tpu.cli import unity_server

    port = _free_port()
    server = threading.Thread(
        target=unity_server.serve,
        args=(REFERENCE_MODEL, example_bvh_path),
        kwargs={"port": port, "max_sessions": 1},
        daemon=True,
    )
    server.start()

    payload = sparse_window.astype("<f4").tobytes()
    assert len(payload) == WINDOW * N_SPARSE * 7 * 4  # unity.py:69-91 format

    reply = None
    deadline = 30.0
    import time

    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=5) as c:
                c.settimeout(120)  # first request compiles the VAE
                c.sendall(payload)
                want = N_JOINTS * 4 * 4
                data = b""
                while len(data) < want:
                    chunk = c.recv(want - len(data))
                    assert chunk, "server closed before full reply"
                    data += chunk
                reply = data
                break
        except ConnectionRefusedError:
            time.sleep(0.3)
    assert reply is not None, "could not connect to the server"
    assert len(reply) == N_JOINTS * 4 * 4  # exactly 22x4 floats, unity.py:112

    quats = np.asarray(struct.unpack(f"<{N_JOINTS * 4}f", reply),
                       np.float32).reshape(N_JOINTS, 4)
    assert np.isfinite(quats).all()
    # parent-local rotations of a decoded pose are unit quaternions
    norms = np.linalg.norm(quats, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-2)

    # wire parity against the in-process reconstruction path: the socket
    # layer must add nothing but (de)serialization
    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.unity_server import build_reconstructor

    reconstruct, skeleton = build_reconstructor(REFERENCE_MODEL,
                                                example_bvh_path)
    sparse = cfg.VAE_PARAM["sparse_joints"]
    pos = np.zeros((WINDOW, skeleton.n_joints, 3), np.float32)
    rot = np.zeros((WINDOW, skeleton.n_joints, 4), np.float32)
    rot[:, :, 0] = 1.0
    pos[:, sparse, :] = sparse_window[:, :, :3]
    rot[:, sparse, :] = sparse_window[:, :, 3:]
    want = np.asarray(reconstruct(pos, rot), np.float32)
    np.testing.assert_allclose(quats, want, rtol=1e-5, atol=1e-6)

    server.join(timeout=30)
    assert not server.is_alive()
