"""Serving daemon: one process owns the TPU engine; clients speak a tiny
binary protocol over a Unix domain socket.

This is the production deployment shape for the native ABI: the reference
embeds a Python interpreter inside the host process (``DragPoserDLL/
exportFunc.cpp``), which means every host (e.g. every Unity editor restart)
pays interpreter + JAX + XLA-compile startup, and two host processes cannot
share a chip.  Here the engine lives in ONE long-running daemon; the native
client library (``native/dragposer_client.cpp``) is a few KB of socket code
with no interpreter, so host startup is instant and N host processes share
the warm engine.

Wire format (little-endian):

    request  = u32 length | u8 opcode | payload
    response = u32 length | u8 status  | payload     (status 0 = ok)

``length`` counts the bytes after the length field.  Opcodes mirror the C
ABI (reference ``exportFunc.h:61-70``); see ``_OPS`` below.  Sessions are
identified by i64 handles; handles created on a connection are destroyed
when that connection closes (a crashed client cannot leak engine state).

Run:  python -m dragposer_tpu.runtime.server [--socket PATH]
                                             [--idle-timeout SECONDS]
"""

from __future__ import annotations

import argparse
import os
import selectors
import socket
import struct
import time


# opcode table (shared contract with native/dragposer_client.cpp)
OP_PING = 0
OP_INIT = 1
OP_DESTROY = 2
OP_SET_REF_SKELETON = 3
OP_LOAD_MODELS = 4
OP_SET_MASK_WEIGHTS = 5
OP_INIT_DRAG_MODEL = 6
OP_SET_OPTIM_PARAMS = 7
OP_SET_LAMBDAS = 8
OP_SET_GLOBAL_POS = 9
OP_DRAG_POSE = 10
# Batched offline evaluation: JSON request in, JSON result out.  The heavy
# lifting is the same engine the CLI uses (eval_drag.evaluate_batched with
# the pipelined ragged-batch runtime); engines are cached per
# (model_dir, config, temporal) so repeated jobs skip XLA compilation.
OP_EVAL_BATCH = 11

DEFAULT_SOCKET = "/tmp/dragposer_tpu.sock"

_engines: dict = {}


def _eval_batch(req: dict) -> dict:
    """Serve one batched evaluation job (see OP_EVAL_BATCH).

    Request keys: ``model_dir``, ``skeleton`` (BVH path), ``files`` (list of
    BVH paths), ``config`` (builtin name or config-JSON path, default
    6_trackers), ``use_temporal`` (default true), ``max_frames`` (optional),
    ``downsample_gt`` (default 1), ``save_dir`` (default "data").
    """
    import time as _time

    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_batched,
                                             resolve_config)
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    key = (req["model_dir"], req.get("config", "6_trackers"),
           bool(req.get("use_temporal", True)), req["skeleton"])
    if key not in _engines:
        bvh = BVH().load(req["skeleton"])
        rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
        sk = Skeleton.build(parents, offsets, bvh.names)
        engine, means, stds = build_engine(
            req["model_dir"], parents,
            resolve_config(req.get("config", "6_trackers")),
            use_temporal=bool(req.get("use_temporal", True)), skeleton=sk,
        )
        _engines[key] = (engine, means, stds, sk)
    engine, means, stds, sk = _engines[key]

    t0 = _time.time()
    results = evaluate_batched(
        engine, means, stds, sk, req["files"],
        max_frames=req.get("max_frames"),
        save_dir=req.get("save_dir", "data"),
        downsample_gt=int(req.get("downsample_gt", 1)),
        restarts=int(req.get("restarts", 1)),
    )
    return {
        "results": [
            {"file": f, "mpjpe": float(m), "mpeepe": float(e)}
            for f, (m, e) in zip(req["files"], results)
        ],
        "elapsed_s": _time.time() - t0,
    }


def _handle_request(capi, op: int, payload: bytes) -> bytes:
    """Dispatch one decoded request to the flat capi bridge."""
    if op == OP_PING:
        return b""
    if op == OP_EVAL_BATCH:
        import json

        return json.dumps(_eval_batch(json.loads(payload))).encode()
    if op == OP_INIT:
        return struct.pack("<q", capi.init())
    h = struct.unpack_from("<q", payload)[0]
    body = payload[8:]
    if op == OP_DESTROY:
        capi.destroy(h)
        return b""
    if op == OP_SET_REF_SKELETON:
        return struct.pack("<i", capi.set_reference_skeleton(
            h, body.decode("utf-8")))
    if op == OP_LOAD_MODELS:
        capi.load_models(h, body.decode("utf-8"))
        return b""
    if op == OP_SET_MASK_WEIGHTS:
        (j,) = struct.unpack_from("<i", body)
        mask = body[4 : 4 + 4 * j]
        weights = body[4 + 4 * j : 4 + 12 * j]
        return struct.pack("<i", capi.set_mask_and_weights(h, mask, weights))
    if op == OP_INIT_DRAG_MODEL:
        vals = struct.unpack_from("<7f", body)
        capi.init_drag_model(h, *vals)
        return b""
    if op == OP_SET_OPTIM_PARAMS:
        ep, er, mi, lr = struct.unpack_from("<ffif", body)
        capi.set_optim_params(h, ep, er, mi, lr)
        return b""
    if op == OP_SET_LAMBDAS:
        lr_, lt, w = struct.unpack_from("<ffi", body)
        capi.set_lambdas(h, lr_, lt, w)
        return b""
    if op == OP_SET_GLOBAL_POS:
        x, y, z = struct.unpack_from("<3f", body)
        capi.set_global_pos(h, x, y, z)
        return b""
    if op == OP_DRAG_POSE:
        (n_ee,) = struct.unpack_from("<i", body)
        pos = body[4 : 4 + 12 * n_ee]
        rot = body[4 + 12 * n_ee : 4 + 28 * n_ee]
        return capi.drag_pose(h, pos, rot, n_ee)
    raise ValueError(f"unknown opcode {op}")


class _Conn:
    """Per-connection receive buffer + handle ownership."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = b""
        self.handles: set[int] = set()


def serve(socket_path: str = DEFAULT_SOCKET, idle_timeout: float | None = None,
          ready_fd: int | None = None) -> None:
    # Import (and thereby pay jax startup) before accepting connections.
    from dragposer_tpu.runtime import capi

    try:
        os.unlink(socket_path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    srv.listen(16)
    srv.setblocking(False)

    if ready_fd is not None:  # tests: signal "listening" without polling
        os.write(ready_fd, b"1")
        os.close(ready_fd)

    sel = selectors.DefaultSelector()
    sel.register(srv, selectors.EVENT_READ, None)
    conns: dict[socket.socket, _Conn] = {}
    last_activity = time.monotonic()

    def close_conn(c: _Conn) -> None:
        sel.unregister(c.sock)
        del conns[c.sock]
        c.sock.close()
        for h in c.handles:  # crashed clients must not leak engine state
            capi.destroy(h)

    while True:
        events = sel.select(timeout=1.0)
        if not events and idle_timeout is not None and not conns \
                and time.monotonic() - last_activity > idle_timeout:
            break
        for key, _ in events:
            last_activity = time.monotonic()
            if key.data is None:  # the listening socket
                s, _ = srv.accept()
                s.setblocking(True)  # requests are handled synchronously
                c = _Conn(s)
                conns[s] = c
                sel.register(s, selectors.EVENT_READ, c)
                continue
            c: _Conn = key.data
            try:
                chunk = c.sock.recv(1 << 16)
            except ConnectionError:
                chunk = b""
            if not chunk:
                close_conn(c)
                continue
            c.buf += chunk
            while len(c.buf) >= 4:
                (length,) = struct.unpack_from("<I", c.buf)
                if len(c.buf) < 4 + length:
                    break
                op = c.buf[4]
                payload = c.buf[5 : 4 + length]
                c.buf = c.buf[4 + length :]
                try:
                    out = _handle_request(capi, op, payload)
                    if op == OP_INIT:
                        c.handles.add(struct.unpack("<q", out)[0])
                    elif op == OP_DESTROY:
                        c.handles.discard(struct.unpack_from("<q", payload)[0])
                    resp = struct.pack("<IB", len(out) + 1, 0) + out
                except Exception as e:  # report, never kill the daemon
                    msg = f"{type(e).__name__}: {e}".encode()
                    resp = struct.pack("<IB", len(msg) + 1, 1) + msg
                try:
                    c.sock.sendall(resp)
                except (BrokenPipeError, ConnectionError):
                    close_conn(c)
                    break

    srv.close()
    try:
        os.unlink(socket_path)
    except FileNotFoundError:
        pass


def main(argv=None):
    p = argparse.ArgumentParser(description="DragPoser-TPU serving daemon")
    p.add_argument("--socket", default=os.environ.get("DRAGPOSER_SOCKET",
                                                      DEFAULT_SOCKET))
    p.add_argument("--idle-timeout", type=float, default=None,
                   help="exit after this many seconds with no client "
                        "connected (auto-spawned daemons pass 300)")
    p.add_argument("--ready-fd", type=int, default=None,
                   help="fd to write one byte to once listening")
    args = p.parse_args(argv)
    serve(args.socket, idle_timeout=args.idle_timeout,
          ready_fd=args.ready_fd)


if __name__ == "__main__":
    main()
