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


def _need(binary: str):
    """Skip when the native build is absent — except under
    DRAGPOSER_REQUIRE_NATIVE=1 (set by tests/run_all.sh, which builds
    native/ first): there a missing binary is a FAILURE, so the L7
    drop-in proofs can never silently skip in the default runner."""
    if not os.path.exists(binary):
        msg = f"native binary missing: {binary} (cmake -S native -B build)"
        if os.environ.get("DRAGPOSER_REQUIRE_NATIVE"):
            pytest.fail(msg + " — required because DRAGPOSER_REQUIRE_NATIVE=1")
        pytest.skip(msg)


def test_native_smoke_lifecycle():
    _need(SMOKE)
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


def test_abi_dropin_against_reference_header():
    _need(REFCHECK)
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
