"""Native C-ABI library smoke (runs only when the library has been built).

Build with: ``cmake -S native -B build -G Ninja && cmake --build build``.
The smoke binary reproduces the reference debug executable's lifecycle
(DragPoserDLL/main.cpp): init → skeleton → models → 6-tracker mask →
optimizer params → drag_pose × 3 → destroy, repeated.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SMOKE = os.path.join(REPO, "build", "dragposer_smoke")
MODEL = os.path.join(REPO, "models", "model_scratch_example")
SKELETON = "/root/reference/python/data/example/eval/example.bvh"


@pytest.mark.skipif(not os.path.exists(SMOKE),
                    reason="native library not built (cmake -S native -B build)")
def test_native_smoke_lifecycle():
    env = dict(os.environ)
    env["DRAGPOSER_PYROOT"] = REPO
    env["JAX_PLATFORMS"] = "cpu"  # hermetic: no TPU dependency in tests
    out = subprocess.run(
        [SMOKE, MODEL, SKELETON, "2"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=REPO,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "smoke OK" in out.stdout
    assert out.stdout.count("end effectors: 6") == 2


REFCHECK = os.path.join(REPO, "build", "dragposer_smoke_refheader")


@pytest.mark.skipif(not os.path.exists(REFCHECK),
                    reason="refcheck binary not built (cmake -S native -B build)")
def test_abi_dropin_against_reference_header():
    """The same smoke lifecycle, but the client TU was compiled against the
    REFERENCE's unmodified exportFunc.h/utils.h declarations
    (DragPoserDLL/exportFunc.h:61-70) and linked against OUR library — the
    compile/link/run proof that libdragposer_tpu_native.so is a drop-in
    replacement (signatures, POD layouts, calling convention)."""
    env = dict(os.environ)
    env["DRAGPOSER_PYROOT"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [REFCHECK, MODEL, SKELETON, "1"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=REPO,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "smoke OK" in out.stdout
