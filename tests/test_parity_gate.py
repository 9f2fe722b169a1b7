"""Gates on the full-clip parity artifact (PARITY.json).

Two layers, per the BASELINE accuracy bar ("MPJPE within 1% of the PyTorch
reference", enforced at full-clip scale where trajectory chaos averages out
— reference acceptance metric ``/root/reference/python/src/eval_drag.py:
249-252``):

* ``test_parity_artifact_current`` (fast, always on): PARITY.json passes
  the 1% bar on BOTH the anchor and pipelined columns AND certifies the
  engine sources as they exist right now (content hash).  A change to any
  certified source makes this test fail until ``tools/parity_matrix.py
  --reuse-ref`` is re-run — a full-clip regression can no longer ship
  behind a stale artifact.
* ``test_parity_full_clip`` (``-m slow``, opt-in): actually re-runs the
  certification (our side only, reference numbers reused) and asserts the
  regenerated artifact passes.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity_matrix import engine_sources_sha  # noqa: E402

ARTIFACT = os.path.join(REPO, "PARITY.json")


def _load():
    assert os.path.exists(ARTIFACT), \
        "PARITY.json missing — run tools/parity_matrix.py"
    with open(ARTIFACT) as f:
        return json.load(f)


def test_parity_artifact_current():
    art = _load()
    assert art["pass_1pct"], art
    assert art["max_rel_diff_mpjpe_working"] < 0.01
    assert art["max_rel_diff_mpjpe_pipelined_working"] < 0.01
    recorded = art.get("engine_sources_sha")
    assert recorded is not None, \
        "PARITY.json predates source certification — re-run " \
        "tools/parity_matrix.py --reuse-ref"
    assert recorded == engine_sources_sha(), (
        "engine sources changed since PARITY.json was generated — the "
        "full-clip parity certification is STALE.  Re-run "
        "`python tools/parity_matrix.py --reuse-ref` (re-measures our side "
        "against the stored reference numbers) and commit the artifact."
    )


def test_parity_degenerate_exclusion_is_evidenced():
    """The 3-tracker exclusion must be backed by committed seed-sweep data
    (tools/parity_sweep.py), not prose: either best-of-restarts beats the
    reference's best seed, or the two init-seed MPJPE distributions
    overlap."""
    art = _load()
    for name in art.get("excluded_degenerate", []):
        sweep = art.get(f"seed_sweep_{name}")
        assert sweep is not None, (
            f"config {name} is excluded from the 1% bar without committed "
            f"seed-sweep evidence — run tools/parity_sweep.py"
        )
        assert len(sweep["reference"]) >= 8 and len(sweep["ours"]) >= 8
        assert (sweep["restarts_beats_ref_best"]
                or sweep["distributions_overlap"]), sweep


@pytest.mark.slow
def test_parity_full_clip():
    """Re-certify our side on the full clip (anchor + pipelined columns,
    every config) against the stored reference numbers.  ~10 min on the
    real chip; run via ``tests/run_all.sh -m slow`` or
    ``pytest -m slow tests/test_parity_gate.py``."""
    art = _load()
    env = {**os.environ}
    env.pop("JAX_PLATFORMS", None)  # let the subprocess pick the real chip
    env.pop("XLA_FLAGS", None)  # drop conftest's virtual-device forcing
    if env.get("PALLAS_AXON_SAVED"):  # restore TPU tunnel (tests/run_all.sh)
        env["PALLAS_AXON_POOL_IPS"] = env["PALLAS_AXON_SAVED"]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_matrix.py"),
         "--frames", str(art["frames"]), "--reuse-ref"],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    art = _load()
    assert art["pass_1pct"], art
