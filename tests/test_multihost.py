"""Multi-host (DCN) data parallelism: 2 processes × 4 devices == 1 × 8.

Launches real separate processes joined by ``jax.distributed`` (CPU
coordination service — the same code path TPU pods use over DCN) and runs
the actual VAE training step; losses and the final parameter fingerprint
must match the single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scrubbed_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize gate
    env.pop("XLA_FLAGS", None)             # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_workers(num_processes, devices_per_process, outdir):
    port = _free_port()
    procs, outs = [], []
    for i in range(num_processes):
        out = os.path.join(outdir, f"result_{num_processes}p_{i}.json")
        outs.append(out)
        cmd = [sys.executable, WORKER,
               "--num-processes", str(num_processes),
               "--process-id", str(i),
               "--devices-per-process", str(devices_per_process),
               "--out", out]
        if num_processes > 1:
            cmd += ["--coordinator", f"127.0.0.1:{port}"]
        procs.append(subprocess.Popen(cmd, env=_scrubbed_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    results = []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout[-3000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_step_matches_single(tmp_path):
    single = _run_workers(1, 8, str(tmp_path))[0]
    assert single["global_devices"] == 8

    two = _run_workers(2, 4, str(tmp_path))
    assert all(r["global_devices"] == 8 for r in two)
    assert all(r["process_count"] == 2 for r in two)

    # every process observes the same (replicated) losses…
    np.testing.assert_allclose(two[0]["losses"], two[1]["losses"], rtol=1e-6)
    # …equal to the single-process run: the gradient all-reduce across
    # processes computes exactly the single-process gradient
    np.testing.assert_allclose(two[0]["losses"], single["losses"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["param_sq_norm"],
                               single["param_sq_norm"], rtol=1e-6)
